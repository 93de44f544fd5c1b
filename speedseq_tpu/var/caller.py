"""Candidate alleles + genotype likelihoods + VCF records per window.

Bayesian diploid genotyping in the FreeBayes mold [external knowledge:
Garrison & Marth 2012; the reference pins only the CLI contract and the
downstream filter fields — QUAL / RPR / RPL at bin/speedseq:709, GL and
GT for somatic at :155-186].  GL math runs as one jitted JAX op over
(site-lane, genotype) arrays; everything producing those lanes is
vectorized numpy on host.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.vcf import VCFRecord
from .pileup import WindowPileup

_BASES = "ACGT"


@dataclass(frozen=True)
class CallerConfig:
    min_alternate_count: int = 2      # freebayes -C
    min_alternate_fraction: float = 0.2  # freebayes -F (somatic: 0.05)
    min_mapq: int = 1
    min_baseq: int = 3
    max_sites_per_batch: int = 512
    indel_q: int = 25                 # observation quality for indel support
    pooled_discrete: bool = False     # somatic mode (bin/speedseq:1059)


@jax.jit
def _gl_terms(support: jnp.ndarray, quals: jnp.ndarray) -> jnp.ndarray:
    """Per-read diploid genotype log10-likelihood terms.

    support: (S, R) int8 — 1 = ref obs, 2 = alt obs, 0 = not covering
    quals:   (S, R) float32 phred
    returns (S, R, 3) float32 log10 P(read | RR/RA/AA); 0 for non-covering
    reads (so callers can segment-sum by sample).
    """
    e = jnp.power(10.0, -quals / 10.0)
    p_ref = jnp.where(support == 1, 1.0 - e, e / 3.0)
    p_alt = jnp.where(support == 2, 1.0 - e, e / 3.0)
    cover = (support > 0)[..., None]
    eps = 1e-30
    p = jnp.stack(
        [p_ref, 0.5 * p_ref + 0.5 * p_alt, p_alt], axis=-1
    )
    return jnp.where(cover, jnp.log10(p + eps), 0.0)


def _pad_to(x: np.ndarray, axis: int, mult: int, fill=0):
    n = x.shape[axis]
    target = ((n + mult - 1) // mult) * mult
    if target == n:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - n)
    return np.pad(x, pad, constant_values=fill)


@dataclass
class SiteCall:
    offset: int          # window offset of the anchor base
    ref: str
    alt: str
    type: str            # snp / ins / del
    length: int
    # per-sample arrays (n_samples,)
    gt: np.ndarray       # 0 = 0/0, 1 = 0/1, 2 = 1/1
    gq: np.ndarray
    gl: np.ndarray       # (n_samples, 3)
    dp: np.ndarray
    ro: np.ndarray
    ao: np.ndarray
    qr: np.ndarray
    qa: np.ndarray
    qual: float
    rpl: int
    rpr: int
    saf: int
    sar: int


def _collect_sites(
    genome: np.ndarray, p: WindowPileup, n_samples: int, cfg: CallerConfig
):
    """Find candidate sites and build (support, qual, meta) lanes."""
    L = p.end - p.start
    ref_codes = genome[p.start : p.end]
    cand = []

    # ---- SNVs -----------------------------------------------------------
    counts = p.base_counts[:, :4]
    total = counts.sum(axis=1)
    ref_safe = np.minimum(ref_codes, 3)
    alt_counts = counts.copy()
    alt_counts[np.arange(L), ref_safe] = 0
    best_alt = np.argmax(alt_counts, axis=1)
    best_cnt = alt_counts[np.arange(L), best_alt]
    with np.errstate(divide="ignore", invalid="ignore"):
        frac = np.where(total > 0, best_cnt / np.maximum(total, 1), 0.0)
    snv_sites = np.nonzero(
        (best_cnt >= cfg.min_alternate_count)
        & (frac >= cfg.min_alternate_fraction)
        & (ref_codes < 4)
    )[0]
    for off in snv_sites:
        cand.append(
            dict(
                offset=int(off),
                ref=_BASES[ref_codes[off]],
                alt=_BASES[best_alt[off]],
                type="snp",
                length=1,
                alt_code=int(best_alt[off]),
                is_indel=False,
            )
        )

    # ---- indels ---------------------------------------------------------
    groups: Dict[Tuple[int, bool, int, str], List[int]] = {}
    for e in p.events:
        off = e.pos - p.start
        if 0 <= off < L:
            groups.setdefault((off, e.is_ins, e.length, e.seq), []).append(
                e.read_idx
            )
    for (off, is_ins, ln, seq), ridx in groups.items():
        depth = int(p.depth[off]) if off < L else 0
        if len(ridx) < cfg.min_alternate_count:
            continue
        if depth > 0 and len(ridx) / depth < cfg.min_alternate_fraction:
            continue
        anchor = ref_codes[off]
        if anchor >= 4:
            continue
        if is_ins:
            ref_al = _BASES[anchor]
            alt_al = ref_al + seq.upper()
            typ = "ins"
        else:
            if off + ln >= L or (ref_codes[off : off + ln + 1] >= 4).any():
                continue
            ref_al = "".join(_BASES[c] for c in ref_codes[off : off + ln + 1])
            alt_al = _BASES[anchor]
            typ = "del"
        # canonical left-aligned representation (vt norm semantics) for
        # emission; read support still keyed on the observed event offset
        from .normalize import left_align

        abs_pos, ref_n, alt_n = left_align(genome, p.start + off, ref_al, alt_al)
        cand.append(
            dict(
                offset=off, ref=ref_n, alt=alt_n, type=typ, length=ln,
                alt_reads=set(ridx), is_indel=True,
                emit_offset=abs_pos - p.start,
            )
        )
    # merge indel candidates that normalize to the same allele
    merged: Dict[Tuple, dict] = {}
    for c in cand:
        key = (c.get("emit_offset", c["offset"]), c["ref"], c["alt"])
        if key in merged and c["is_indel"] and merged[key]["is_indel"]:
            merged[key]["alt_reads"] |= c["alt_reads"]
        else:
            merged.setdefault(key, c)
    cand = list(merged.values())
    cand.sort(key=lambda c: (c.get("emit_offset", c["offset"]), c["type"]))
    return cand


def call_window(
    genome: np.ndarray,
    p: WindowPileup,
    n_samples: int,
    cfg: CallerConfig = CallerConfig(),
) -> List[SiteCall]:
    """Genotype all candidate sites of one window pileup."""
    cand = _collect_sites(genome, p, n_samples, cfg)
    if not cand:
        return []
    R = len(p.reads)
    S = len(cand)
    if R == 0:
        return []
    sample_of_read = np.array([si for _, si in p.reads], dtype=np.int32)
    strand_of_read = np.array(
        [1 if rec.is_reverse() else 0 for rec, _ in p.reads], dtype=np.int8
    )
    proj = np.stack(p.read_proj) if R else np.zeros((0, p.end - p.start), np.int8)
    rq = np.stack(p.read_qual)
    rpos = np.stack(p.read_rpos)

    support = np.zeros((S, R), np.int8)
    quals = np.zeros((S, R), np.float32)
    for s, c in enumerate(cand):
        off = c["offset"]
        col = proj[:, off]
        covered = col >= 0
        if not c["is_indel"]:
            is_alt = covered & (col == c["alt_code"])
            ref_code = "ACGT".index(c["ref"][0])
            is_ref = covered & (col == ref_code)
            support[s, is_ref] = 1
            support[s, is_alt] = 2
            quals[s] = rq[:, off]
        else:
            alt_reads = np.zeros(R, dtype=bool)
            for ri in c["alt_reads"]:
                alt_reads[ri] = True
            support[s, covered & ~alt_reads] = 1
            support[s, alt_reads] = 2
            quals[s] = cfg.indel_q
    quals = np.maximum(quals, 1.0)

    # device GL terms (padded to shape buckets to bound recompilation),
    # then per-sample segment sums on host
    out: List[SiteCall] = []
    sup_p = _pad_to(_pad_to(support, 0, 64), 1, 256)
    q_p = _pad_to(_pad_to(quals, 0, 64), 1, 256, fill=1.0)
    terms = np.asarray(_gl_terms(jnp.asarray(sup_p), jnp.asarray(q_p)))[
        :S, :R
    ]  # (S, R, 3)
    gl_all = np.zeros((S, n_samples, 3), np.float64)
    dp = np.zeros((S, n_samples), np.int32)
    ro = np.zeros((S, n_samples), np.int32)
    ao = np.zeros((S, n_samples), np.int32)
    qr = np.zeros((S, n_samples), np.int32)
    qa = np.zeros((S, n_samples), np.int32)
    for si in range(n_samples):
        m = sample_of_read == si
        sup_s = support[:, m]
        q_s = quals[:, m]
        gl = terms[:, m].sum(axis=1).astype(np.float64)
        gl_all[:, si] = gl - gl.max(axis=1, keepdims=True)
        dp[:, si] = (sup_s > 0).sum(axis=1)
        ro[:, si] = (sup_s == 1).sum(axis=1)
        ao[:, si] = (sup_s == 2).sum(axis=1)
        qr[:, si] = np.where(sup_s == 1, q_s, 0).sum(axis=1).astype(np.int32)
        qa[:, si] = np.where(sup_s == 2, q_s, 0).sum(axis=1).astype(np.int32)

    gt = np.argmax(gl_all, axis=2)  # (S, n_samples)
    sortgl = np.sort(gl_all, axis=2)
    gq = np.minimum(
        99, np.round(10.0 * (sortgl[:, :, 2] - sortgl[:, :, 1])).astype(np.int64)
    )
    # site QUAL: evidence for any non-ref genotype across samples
    qual = 10.0 * (gl_all.max(axis=2).sum(axis=1) - gl_all[:, :, 0].sum(axis=1))

    for s, c in enumerate(cand):
        alt_mask = support[s] == 2
        if not alt_mask.any():
            continue
        # read-placement balance (RPL/RPR, the vawk filter fields)
        rp = rpos[:, c["offset"]]
        rlen_half = np.array(
            [len(rec.seq) / 2 if rec.seq != "*" else 50 for rec, _ in p.reads]
        )
        rpl = int(np.sum(alt_mask & (rp >= 0) & (rp < rlen_half)))
        rpr = int(np.sum(alt_mask & (rp >= 0) & (rp >= rlen_half)))
        saf = int(np.sum(alt_mask & (strand_of_read == 0)))
        sar = int(np.sum(alt_mask & (strand_of_read == 1)))
        out.append(
            SiteCall(
                offset=c.get("emit_offset", c["offset"]),
                ref=c["ref"], alt=c["alt"], type=c["type"],
                length=c["length"], gt=gt[s], gq=gq[s], gl=gl_all[s],
                dp=dp[s], ro=ro[s], ao=ao[s], qr=qr[s], qa=qa[s],
                qual=float(max(0.0, qual[s])), rpl=rpl, rpr=rpr,
                saf=saf, sar=sar,
            )
        )
    return out


def site_to_vcf(
    call: SiteCall, chrom: str, window_start: int, n_samples: int
) -> VCFRecord:
    total_dp = int(call.dp.sum())
    total_ro = int(call.ro.sum())
    total_ao = int(call.ao.sum())
    ab = round(total_ao / max(1, total_ro + total_ao), 6)
    info = {
        "DP": total_dp,
        "RO": total_ro,
        "AO": total_ao,
        "AB": ab,
        "RPL": call.rpl,
        "RPR": call.rpr,
        "SAF": call.saf,
        "SAR": call.sar,
        "TYPE": call.type,
        "LEN": call.length,
        "NUMALT": 1,
    }
    gt_str = {0: "0/0", 1: "0/1", 2: "1/1"}
    samples = []
    for si in range(n_samples):
        samples.append(
            {
                "GT": gt_str[int(call.gt[si])],
                "GQ": int(call.gq[si]),
                "DP": int(call.dp[si]),
                "RO": int(call.ro[si]),
                "QR": int(call.qr[si]),
                "AO": int(call.ao[si]),
                "QA": int(call.qa[si]),
                "GL": [round(float(x), 2) for x in call.gl[si]],
            }
        )
    return VCFRecord(
        chrom=chrom,
        pos=window_start + call.offset,
        id=".",
        ref=call.ref,
        alt=[call.alt],
        qual=round(call.qual, 2),
        filter=".",
        info=info,
        format=["GT", "GQ", "DP", "RO", "QR", "AO", "QA", "GL"],
        samples=samples,
    )
