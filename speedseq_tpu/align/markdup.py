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


class StreamDupMarker:
    """Streaming first-seen duplicate signatures (samblaster's hash-table
    semantic: one entry per unique signature lives for the whole run; reads
    themselves are never retained).  Signatures are optionally scoped by
    library id — samblaster runs per-library in the reference realign flow
    (bin/speedseq:1930-1973), so two pairs from different libraries are
    never duplicates of each other.
    """

    def __init__(self):
        self._pairs: set = set()
        self._orphans: set = set()
        # signatures added since the last drain_new() — the align
        # checkpoint journals only this delta (O(batch) per checkpoint)
        self._new_pairs: list = []
        self._new_orphans: list = []

    def mark_batch(
        self,
        tid1: np.ndarray, p5_1: np.ndarray, st1: np.ndarray, ok1: np.ndarray,
        tid2: np.ndarray, p5_2: np.ndarray, st2: np.ndarray, ok2: np.ndarray,
        lib: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Mark one batch against the running signature tables; returns
        bool (n,) True = duplicate.  Batch order = stream order."""
        n = len(tid1)
        dup = np.zeros(n, dtype=bool)
        if n == 0:
            return dup
        ok1 = np.asarray(ok1, dtype=bool)
        ok2 = np.asarray(ok2, dtype=bool)
        if lib is None:
            lib = np.zeros(n, dtype=np.int64)
        a = np.stack([tid1, p5_1, st1], axis=1).astype(np.int64)
        b = np.stack([tid2, p5_2, st2], axis=1).astype(np.int64)
        swap = (a[:, 0] > b[:, 0]) | ((a[:, 0] == b[:, 0]) & (a[:, 1] > b[:, 1]))
        lo = np.where(swap[:, None], b, a)
        hi = np.where(swap[:, None], a, b)
        both = ok1 & ok2
        one = ok1 ^ ok2
        single = np.where(ok1[:, None], a, b)
        pairs, orphans = self._pairs, self._orphans
        for i in np.nonzero(both)[0]:
            key = (int(lib[i]), int(lo[i, 0]), int(lo[i, 1]), int(lo[i, 2]),
                   int(hi[i, 0]), int(hi[i, 1]), int(hi[i, 2]))
            if key in pairs:
                dup[i] = True
            else:
                pairs.add(key)
                self._new_pairs.append(key)
        for i in np.nonzero(one)[0]:
            key = (int(lib[i]), int(single[i, 0]), int(single[i, 1]),
                   int(single[i, 2]))
            if key in orphans:
                dup[i] = True
            else:
                orphans.add(key)
                self._new_orphans.append(key)
        return dup

    # --------------------------------------------------- checkpoint API
    def drain_new(self) -> Tuple[list, list]:
        """New (pair, orphan) signatures since the previous drain; the
        caller appends them to its checkpoint journal."""
        np_, no_ = self._new_pairs, self._new_orphans
        self._new_pairs, self._new_orphans = [], []
        return np_, no_

    def replay(self, pair_keys, orphan_keys) -> None:
        """Re-add journaled signatures on resume."""
        self._pairs.update(pair_keys)
        self._orphans.update(orphan_keys)


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
