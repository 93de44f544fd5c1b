"""SAMBLASTER-equivalent epilogue: duplicate marking, splitter and
discordant extraction, mate tags.

Contract pinned by the reference driver (bin/speedseq:439):
``samblaster --excludeDups --addMateTags --maxSplitCount 2
--minNonOverlap 20 --splitterFile ... --discordantFile ...`` operating on
name-grouped alignments straight out of the aligner.  Semantics
[external knowledge: samblaster]:

- dup signature = (tid, unclipped 5' position, strand) of both ends,
  canonically ordered; first-seen wins; one-ended (orphan) signatures for
  pairs with an unmapped mate.
- splitters: reads whose primary+supplementary pieces overlap by
  < minNonOverlap on the query (≤ maxSplitCount pieces).
- discordants: read pairs that are not proper pairs (both ends mapped).
- ``--excludeDups`` removes duplicate reads from both side channels.
- side-channel records get SEQ/QUAL stripped to ``*`` — the reference
  pipes splitter/discordant SAM through ``gawk '$10="*";$11="*"'``
  (bin/speedseq:443-447) and we must match those bytes.
- ``--addMateTags`` writes MC (mate CIGAR) and MQ (mate MAPQ) on both
  primary ends.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..formats.sam import (
    FDUP,
    FMUNMAP,
    FPROPER_PAIR,
    FREVERSE,
    FSUPPLEMENTARY,
    FUNMAP,
    SAMRecord,
    cigar_to_str,
)


def unclipped_5p(pos: int, end_pos: int, strand: int, cigar) -> int:
    """Leftmost-unclipped position for fwd reads; rightmost-unclipped for
    reverse (samblaster's clipped-adjusted signature position)."""
    lead = cigar[0][1] if cigar and cigar[0][0] in (4, 5) else 0
    tail = cigar[-1][1] if cigar and cigar[-1][0] in (4, 5) else 0
    if strand == 0:
        return pos - lead
    return end_pos + tail


def mark_duplicates(
    tid1: np.ndarray, p5_1: np.ndarray, st1: np.ndarray, ok1: np.ndarray,
    tid2: np.ndarray, p5_2: np.ndarray, st2: np.ndarray, ok2: np.ndarray,
) -> np.ndarray:
    """Vectorized pair-level duplicate marking; returns bool (n_pairs,)
    True = duplicate.  First occurrence in input order wins (samblaster
    streaming first-seen semantics)."""
    n = len(tid1)
    if n == 0:
        return np.zeros(0, dtype=bool)
    ok1 = np.asarray(ok1, dtype=bool)
    ok2 = np.asarray(ok2, dtype=bool)
    # canonical ordering of the two ends
    a = np.stack([tid1, p5_1, st1], axis=1).astype(np.int64)
    b = np.stack([tid2, p5_2, st2], axis=1).astype(np.int64)
    swap = (a[:, 0] > b[:, 0]) | (
        (a[:, 0] == b[:, 0]) & (a[:, 1] > b[:, 1])
    )
    lo = np.where(swap[:, None], b, a)
    hi = np.where(swap[:, None], a, b)
    both = ok1 & ok2
    one = ok1 ^ ok2
    single = np.where(ok1[:, None], a, b)
    # key spaces kept disjoint: pair keys vs orphan keys
    key = np.zeros((n, 7), dtype=np.int64)
    key[both, 0] = 1
    key[both, 1:4] = lo[both]
    key[both, 4:7] = hi[both]
    key[one, 0] = 2
    key[one, 1:4] = single[one]
    dup = np.zeros(n, dtype=bool)
    for mask in (both, one):
        idx = np.nonzero(mask)[0]
        if len(idx) == 0:
            continue
        k = key[idx]
        # lexsort: last key is primary → columns major, input order as tie
        order = np.lexsort((idx,) + tuple(k[:, i] for i in range(6, -1, -1)))
        ks = k[order]
        first = np.ones(len(idx), dtype=bool)
        first[1:] = (ks[1:] != ks[:-1]).any(axis=1)
        d = ~first
        dup[idx[order]] = d
    return dup


def strip_seq(rec: SAMRecord) -> SAMRecord:
    """Reference side-channel stripping (gawk '$10="*";$11="*"',
    bin/speedseq:443-447)."""
    return SAMRecord(
        qname=rec.qname, flag=rec.flag, tid=rec.tid, pos=rec.pos,
        mapq=rec.mapq, cigar=list(rec.cigar), mtid=rec.mtid, mpos=rec.mpos,
        tlen=rec.tlen, seq="*", qual="*", tags=list(rec.tags),
    )


def make_sa_tag(tid_name: str, pos: int, strand: int, cigar, mapq: int, nm: int) -> str:
    """One SA-tag segment: rname,pos,strand,CIGAR,mapQ,NM; (SAM spec)."""
    return (
        f"{tid_name},{pos + 1},{'-' if strand else '+'},"
        f"{cigar_to_str(cigar)},{mapq},{nm};"
    )


def split_qualifies(
    prim_qbeg: int, prim_qend: int, supp_qbeg: int, supp_qend: int,
    min_non_overlap: int = 20,
) -> bool:
    """samblaster minNonOverlap rule: each piece must cover ≥20 query
    bases the other doesn't (bin/speedseq:242-243 defaults)."""
    ov = max(0, min(prim_qend, supp_qend) - max(prim_qbeg, supp_qbeg))
    return (
        (prim_qend - prim_qbeg) - ov >= min_non_overlap
        and (supp_qend - supp_qbeg) - ov >= min_non_overlap
    )
