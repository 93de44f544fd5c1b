"""Breakpoint clustering → SV calls (LUMPY's probabilistic integration).

[external knowledge: Layer et al. 2014 — evidence distributions intersect
multiplicatively within a cluster].  The reference pins: min total weight
4 (``-m``), trim 0 (``-r``), probability curves emitted under ``-P``
(bin/speedseq:1242-1243, 1312-1313).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from .evidence import BND, DEL, DUP, INV, Breakpoint


@dataclass
class SVCall:
    svtype: str
    tid1: int
    pos1: int
    strand1: int
    cipos: Tuple[int, int]
    cipos95: Tuple[int, int]
    prpos: np.ndarray           # normalized probability over cipos span
    tid2: int
    pos2: int
    strand2: int
    ciend: Tuple[int, int]
    ciend95: Tuple[int, int]
    prend: np.ndarray
    su: int
    pe: int
    sr: int
    sample_support: Dict[int, int]
    imprecise: bool


def _combine(
    items: List[Tuple[int, np.ndarray]],
    trim: float = 0.0,
) -> Tuple[int, Tuple[int, int], Tuple[int, int], np.ndarray]:
    """Multiply probability curves (log-sum) over their union support.

    ``trim`` is lumpy -r (bin/speedseq:1243, pinned default 0): interval
    edges whose probability falls below ``trim`` are dropped before the
    intervals/curves are emitted."""
    lo = min(s for s, p in items)
    hi = max(s + len(p) for s, p in items)
    acc = np.zeros(hi - lo)
    eps = 1e-12
    for s, p in items:
        cur = np.full(hi - lo, eps)
        cur[s - lo : s - lo + len(p)] = np.maximum(p, eps)
        acc += np.log(cur)
    acc -= acc.max()
    prob = np.exp(acc)
    prob /= prob.sum()
    if trim > 0.0:
        live = np.nonzero(prob >= trim)[0]
        if len(live):
            trimmed = np.zeros_like(prob)
            trimmed[live[0] : live[-1] + 1] = prob[live[0] : live[-1] + 1]
            prob = trimmed / trimmed.sum()
    pos = lo + int(np.argmax(prob))
    # 100% and 95% credible intervals relative to pos
    nz = np.nonzero(prob > 1e-9)[0]
    ci = (int(lo + nz[0] - pos), int(lo + nz[-1] - pos))
    order = np.argsort(prob)[::-1]
    csum = np.cumsum(prob[order])
    keep = order[: int(np.searchsorted(csum, 0.95)) + 1]
    ci95 = (int(lo + keep.min() - pos), int(lo + keep.max() - pos))
    # trim the emitted curve to the CI window
    prpos = prob[nz[0] : nz[-1] + 1]
    return pos, ci, ci95, prpos / prpos.sum()


def cluster_breakpoints(
    evidence: List[Breakpoint],
    min_weight: int = 4,      # lumpy -m (bin/speedseq:1242)
    trim: float = 0.0,        # lumpy -r (bin/speedseq:1243)
) -> List[SVCall]:
    groups: Dict[Tuple, List[Breakpoint]] = {}
    for bp in evidence:
        groups.setdefault(
            (bp.svtype, bp.tid1, bp.tid2, bp.strand1, bp.strand2), []
        ).append(bp)
    calls: List[SVCall] = []
    for key, items in groups.items():
        svtype, tid1, tid2, s1, s2 = key
        items.sort(key=lambda b: b.start1)
        cluster: List[Breakpoint] = []

        def flush():
            if not cluster:
                return
            w = sum(b.weight for b in cluster)
            # lumpy -m is minimum weight within a single sample
            # (bin/speedseq:1242): pooled cross-sample evidence alone must
            # not produce a call no sample individually supports
            per_sample: Dict[int, int] = {}
            for b in cluster:
                per_sample[b.sample] = per_sample.get(b.sample, 0) + b.weight
            if max(per_sample.values()) < min_weight:
                return
            pos1, ci1, ci195, pr1 = _combine(
                [(b.start1, b.prob1) for b in cluster], trim=trim
            )
            pos2, ci2, ci295, pr2 = _combine(
                [(b.start2, b.prob2) for b in cluster], trim=trim
            )
            if svtype != BND and pos2 < pos1:
                pos1, pos2 = pos2, pos1
                ci1, ci2 = ci2, ci1
                ci195, ci295 = ci295, ci195
                pr1, pr2 = pr2, pr1
            sr = sum(b.weight for b in cluster if b.is_split)
            pe = w - sr
            ss: Dict[int, int] = {}
            for b in cluster:
                ss[b.sample] = ss.get(b.sample, 0) + b.weight
            calls.append(
                SVCall(
                    svtype=svtype, tid1=tid1, pos1=pos1, strand1=s1,
                    cipos=ci1, cipos95=ci195, prpos=pr1,
                    tid2=tid2, pos2=pos2, strand2=s2,
                    ciend=ci2, ciend95=ci295, prend=pr2,
                    su=w, pe=pe, sr=sr, sample_support=ss,
                    imprecise=(sr == 0),
                )
            )

        cur_end1 = cur_lo2 = cur_hi2 = None
        for b in cluster_order(items):
            e1 = b.start1 + len(b.prob1)
            lo2, hi2 = b.start2, b.start2 + len(b.prob2)
            if (
                cluster
                and b.start1 < cur_end1
                and lo2 < cur_hi2
                and hi2 > cur_lo2
            ):
                cluster.append(b)
                cur_end1 = max(cur_end1, e1)
                cur_lo2 = min(cur_lo2, lo2)
                cur_hi2 = max(cur_hi2, hi2)
            else:
                flush()
                cluster = [b]
                cur_end1, cur_lo2, cur_hi2 = e1, lo2, hi2
        flush()
    calls.sort(key=lambda c: (c.tid1, c.pos1, c.tid2, c.pos2))
    return calls


def cluster_order(items: List[Breakpoint]) -> List[Breakpoint]:
    return sorted(items, key=lambda b: (b.start1, b.start2))
