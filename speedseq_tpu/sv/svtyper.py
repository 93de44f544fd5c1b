"""Breakend genotyping (SVTyper-equivalent).

[external knowledge: Chiang et al. 2015 — Bayesian genotyping from
ref/alt read support at breakpoints].  Reference contract: ``svtyper -q
-i sv.vcf -B full.bam -S splitters.bam`` chained per sample
(bin/speedseq:1488-1505); the fast path relies on the MC/MQ mate tags our
aligner epilogue writes (README.md:170).
"""

from __future__ import annotations

from dataclasses import dataclass
from math import lgamma, log, log10
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..formats import bai as bai_mod
from ..formats.bam import BAMReader
from ..formats.sam import (
    FDUP, FMUNMAP, FPROPER_PAIR, FREVERSE, FSECONDARY, FSUPPLEMENTARY,
    FUNMAP, cigar_from_str, cigar_ref_len,
)
from .cluster import SVCall
from .evidence import BND, DEL, DUP, INV, InsertStats


@dataclass
class GenotypeResult:
    gt: str
    gq: int
    sq: float
    gl: List[float]
    dp: int
    ro: int
    ao: int
    rs: int   # ref splits (clean crossings)
    as_: int  # alt splits
    rp: int   # ref pairs
    ap: int   # alt pairs
    ab: float


def _log_choose(n: int, k: int) -> float:
    return lgamma(n + 1) - lgamma(k + 1) - lgamma(n - k + 1)


def genotype_from_counts(ref: int, alt: int, p_err: float = 1e-3) -> GenotypeResult:
    """Diploid GL from ref/alt observation counts (svtyper's bayesian
    allele-balance model)."""
    n = ref + alt
    gls = []
    for p_alt in (p_err, 0.5, 1.0 - p_err):
        ll = (
            _log_choose(n, alt)
            + alt * log(max(p_alt, 1e-12))
            + ref * log(max(1.0 - p_alt, 1e-12))
        ) / log(10)
        gls.append(ll)
    order = np.argsort(gls)[::-1]
    best, second = order[0], order[1]
    gt = {0: "0/0", 1: "0/1", 2: "1/1"}[int(best)]
    gq = int(min(99, round(10.0 * (gls[best] - gls[second]))))
    # SQ: phred-scaled P(variant) = posterior of non-ref genotypes
    m = max(gls)
    post = np.exp((np.array(gls) - m) * log(10))
    post /= post.sum()
    p_var = post[1] + post[2]
    sq = round(min(200.0, -10.0 * log10(max(1.0 - p_var, 1e-20))), 2)
    ab = round(alt / n, 2) if n else 0.0
    return GenotypeResult(
        gt=gt, gq=gq, sq=sq,
        gl=[round(g, 0) for g in gls],
        dp=n, ro=ref, ao=alt, rs=0, as_=0, rp=0, ap=0, ab=ab,
    )


class SVGenotyper:
    """Counts ref/alt support for SV calls in one sample's BAMs."""

    def __init__(self, full_bam: str, splitters_bam: Optional[str],
                 stats: InsertStats):
        import os

        self.rd = BAMReader(full_bam)
        if not os.path.exists(full_bam + ".bai"):
            bai_mod.build_bai(full_bam)
        self.idx = bai_mod.read_bai(full_bam + ".bai")
        self.stats = stats
        self.names = [n for n, _ in self.rd.header.refs]

    def close(self):
        self.rd.close()

    def _fetch(self, tid: int, beg: int, end: int):
        out = []
        for cb, ce in bai_mod.query_chunks(self.idx, tid, max(0, beg), end):
            self.rd.seek_virtual(cb)
            while self.rd._r.tell_virtual < ce:
                rec = self.rd.read_record()
                if rec is None:
                    break
                if rec.tid != tid or rec.pos >= end:
                    break
                if rec.end_pos() > beg:
                    out.append(rec)
        return out

    def genotype(self, call: SVCall, min_mapq: int = 1) -> GenotypeResult:
        """Count ref/alt support at both breakpoints.

        min_mapq defaults to 1 so MAPQ-0 multi-mappers piled on repeats
        don't count as evidence (svtyper excludes ambiguous placements).
        """
        stats = self.stats
        w = stats.max_normal
        slop = 6
        ref_n = alt_n = rs = as_ = rp = ap = 0
        for side, (tid, pos) in enumerate(
            [(call.tid1, call.pos1), (call.tid2, call.pos2)]
        ):
            recs = self._fetch(tid, pos - w, pos + w)
            for rec in recs:
                if rec.flag & (FUNMAP | FSECONDARY | FDUP | FSUPPLEMENTARY):
                    continue
                if rec.mapq < min_mapq:
                    continue
                # --- split-read evidence -----------------------------------
                sa = rec.get_tag("SA")
                clip_left = rec.cigar and rec.cigar[0][0] in (4, 5)
                clip_right = rec.cigar and rec.cigar[-1][0] in (4, 5)
                at_bp_end = abs(rec.end_pos() - pos) <= slop
                at_bp_start = abs(rec.pos - pos) <= slop
                if sa and (
                    (at_bp_end and clip_right) or (at_bp_start and clip_left)
                ):
                    alt_n += 1
                    as_ += 1
                    continue
                # --- clean crossing (ref split evidence) -------------------
                if rec.pos + slop <= pos <= rec.end_pos() - slop and not (
                    clip_left or clip_right
                ):
                    ref_n += 1
                    rs += 1
                    continue
                # --- pair evidence (count once, from breakpoint 1) ---------
                if side == 1 or rec.flag & FMUNMAP or rec.mtid < 0:
                    continue
                if (rec.tid, rec.pos) > (rec.mtid, rec.mpos):
                    continue
                rev1 = bool(rec.flag & FREVERSE)
                rev2 = bool(rec.flag & 0x20)
                span_alt = self._pair_supports(rec, rev1, rev2, call)
                if span_alt is True:
                    alt_n += 1
                    ap += 1
                elif span_alt is False:
                    ref_n += 1
                    rp += 1
        gr = genotype_from_counts(ref_n, alt_n)
        gr.rs, gr.as_, gr.rp, gr.ap = rs, as_, rp, ap
        return gr

    def _pair_supports(self, rec, rev1, rev2, call: SVCall):
        """True = pair supports the SV, False = supports ref, None = n/a."""
        stats = self.stats
        mc = rec.get_tag("MC")
        mend = rec.mpos + (
            cigar_ref_len(cigar_from_str(mc)) if mc else stats.read_len
        )
        span = mend - rec.pos
        wiggle = 4 * int(stats.std)
        if call.svtype == DEL:
            if rev1 or not rev2 or rec.tid != call.tid1:
                return None
            svlen = call.pos2 - call.pos1
            covers = (
                rec.end_pos() - 1 <= call.pos1 + wiggle
                and rec.mpos >= call.pos2 - wiggle
                and rec.pos < call.pos1
                and mend > call.pos2
            )
            if covers and span > stats.max_normal:
                return True
            if (
                rec.pos < call.pos1 < mend
                and span <= stats.max_normal
                and rec.flag & FPROPER_PAIR
            ):
                return False
            return None
        if call.svtype == DUP:
            if rev1 and not rev2:
                near1 = abs(rec.pos - call.pos1) < stats.max_normal
                near2 = abs(mend - call.pos2) < stats.max_normal
                if near1 and near2:
                    return True
            if (
                rec.pos < call.pos1 < mend
                and not rev1 and rev2
                and rec.flag & FPROPER_PAIR
            ):
                return False
            return None
        if call.svtype == INV:
            if rev1 == rev2:
                return True
            if rec.pos < call.pos1 < mend and rec.flag & FPROPER_PAIR:
                return False
            return None
        # BND: require both ends near their breakpoints with read
        # orientations matching the junction strands (a + breakend is
        # approached by a forward read, a - breakend by a reverse read)
        if rec.tid == call.tid1 and rec.mtid == call.tid2:
            near1 = abs(rec.pos - call.pos1) < stats.max_normal
            near2 = abs(rec.mpos - call.pos2) < stats.max_normal
            orient_ok = (rev1 == (call.strand1 == 1)) and (
                rev2 == (call.strand2 == 1)
            )
            if near1 and near2 and orient_ok:
                return True
        if rec.pos < call.pos1 < mend and rec.flag & FPROPER_PAIR:
            return False
        return None
