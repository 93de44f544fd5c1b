"""Pileup construction: BAM records → per-window count arrays.

Vectorized host-side projection of alignments onto reference coordinates
(the role of FreeBayes' pileup traversal [external knowledge]); produces
the count tensors the candidate generator and the device GL kernel
consume.

Storage is span-compact: each read stores only its covered window span
(reads cover ~read_len bases of a 100 kb window), so memory is
O(total aligned bases), not O(reads × window) — the dense per-read
projection matrix would cost ~3 GB per 100 kb window at 30X WGS.
Column lookups (`col`) gather one window offset across all covering
reads with pure numpy indexing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..formats.sam import FDUP, FSECONDARY, FSUPPLEMENTARY, FUNMAP, SAMRecord
from ..formats.fasta import encode_bases


@dataclass
class ReadEvent:
    """One indel event observed in a read."""

    pos: int          # ref pos (0-based); for ins: base before insertion
    is_ins: bool
    length: int
    seq: str          # inserted sequence (ins only)
    read_idx: int


@dataclass
class WindowPileup:
    """Per-window pileup tensors.

    base_counts:  (L, 5) int32 — A/C/G/T/N counts per ref offset
    qual_sums:    (L, 5) int32 — summed base qualities
    strand_counts:(L, 5, 2)    — per strand
    depth:        (L,) int32
    reads:        list of (record, sample_idx) kept for per-site support

    Span-compact per-read projection: read i covers window offsets
    [rstart[i], rend[i]); its bases/quals/read-positions live at
    flat_*[base_idx[i] : base_idx[i] + rend[i] - rstart[i]].
    """

    start: int
    end: int
    base_counts: np.ndarray
    qual_sums: np.ndarray
    strand_counts: np.ndarray
    depth: np.ndarray
    reads: List[Tuple[SAMRecord, int]]
    rstart: np.ndarray            # (R,) int32 window offsets
    rend: np.ndarray              # (R,) int32
    base_idx: np.ndarray          # (R,) int64 offsets into flat arrays
    flat_proj: np.ndarray         # int8 base code or -1
    flat_qual: np.ndarray         # int8
    flat_rpos: np.ndarray         # int32 offset in read or -1
    events: List[ReadEvent] = field(default_factory=list)

    def col(self, off: int):
        """Gather window offset `off` across all reads.

        Returns (proj, qual, rpos) each (R,): base code / qual /
        read-position, with -1 / 0 / -1 for reads not covering `off`.
        """
        R = len(self.rstart)
        proj = np.full(R, -1, np.int8)
        qual = np.zeros(R, np.int8)
        rpos = np.full(R, -1, np.int32)
        m = (self.rstart <= off) & (off < self.rend)
        if m.any():
            idx = self.base_idx[m] + (off - self.rstart[m])
            proj[m] = self.flat_proj[idx]
            qual[m] = self.flat_qual[idx]
            rpos[m] = self.flat_rpos[idx]
        return proj, qual, rpos

    def covers(self, lo: int, hi: int) -> np.ndarray:
        """(R,) bool — read span fully covers window offsets [lo, hi)."""
        return (self.rstart <= lo) & (self.rend >= hi)


SKIP_FLAGS = FUNMAP | FSECONDARY | FDUP  # freebayes default read filters


def project_read(rec: SAMRecord, start: int, end: int):
    """Project one alignment onto window [start, end).

    Returns (span_lo, proj, qual, rpos, events): compact arrays over the
    read's covered span (window offsets [span_lo, span_lo + len)), with
    base codes (-1 = deletion gap), plus indel events.
    """
    lo = max(rec.pos, start)
    hi = min(rec.end_pos(), end)
    if hi <= lo:
        return 0, None, None, None, []
    L = hi - lo
    proj = np.full(L, -1, dtype=np.int8)
    qual = np.zeros(L, dtype=np.int8)
    rpos = np.full(L, -1, dtype=np.int32)
    events = []
    seq = rec.seq
    quals = rec.qual
    has_qual = quals not in ("*", "")
    enc = encode_bases(seq.encode()) if seq not in ("*", "") else None
    qarr_full = (
        np.frombuffer(quals.encode(), np.uint8) - 33 if has_qual else None
    )
    ri = rec.pos  # ref cursor
    qi = 0        # query cursor
    for op, ln in rec.cigar:
        if op in (0, 7, 8):  # M/=/X
            a = max(ri, lo)
            b = min(ri + ln, hi)
            if a < b and enc is not None:
                off = a - ri
                proj[a - lo : b - lo] = enc[qi + off : qi + off + (b - a)]
                if has_qual:
                    qual[a - lo : b - lo] = np.minimum(
                        qarr_full[qi + off : qi + off + (b - a)], 60
                    )
                else:
                    qual[a - lo : b - lo] = 30
                rpos[a - lo : b - lo] = np.arange(qi + off, qi + off + (b - a))
            ri += ln
            qi += ln
        elif op == 1:  # I
            if start <= ri - 1 < end:
                events.append(
                    ReadEvent(ri - 1, True, ln, seq[qi : qi + ln] if enc is not None else "", -1)
                )
            qi += ln
        elif op == 2 or op == 3:  # D/N
            if op == 2 and start <= ri - 1 < end:
                events.append(ReadEvent(ri - 1, False, ln, "", -1))
            ri += ln
        elif op == 4:  # S
            qi += ln
        # H/P consume nothing
    return lo - start, proj, qual, rpos, events


def build_pileup(
    records: List[Tuple[SAMRecord, int]],
    start: int,
    end: int,
    min_mapq: int = 1,
    min_baseq: int = 3,
) -> WindowPileup:
    """Pileup over window [start, end) from (record, sample_idx) pairs."""
    L = end - start
    base_counts = np.zeros((L, 5), np.int32)
    qual_sums = np.zeros((L, 5), np.int32)
    strand_counts = np.zeros((L, 5, 2), np.int32)
    kept = []
    span_lo: List[int] = []
    projs, rquals, rposs = [], [], []
    events: List[ReadEvent] = []
    for rec, si in records:
        if rec.flag & SKIP_FLAGS or rec.mapq < min_mapq or not rec.cigar:
            continue
        if rec.flag & FSUPPLEMENTARY:
            continue
        lo, proj, qual, rpos, evs = project_read(rec, start, end)
        if proj is None:
            continue
        idx = len(kept)
        for e in evs:
            e.read_idx = idx
        cov = proj >= 0
        lowq = cov & (qual < min_baseq)
        proj[lowq] = -1
        cov = proj >= 0
        pos_idx = np.nonzero(cov)[0]
        bases = proj[pos_idx].astype(np.int64)
        np.add.at(base_counts, (pos_idx + lo, bases), 1)
        np.add.at(qual_sums, (pos_idx + lo, bases), qual[pos_idx])
        st = 1 if rec.is_reverse() else 0
        np.add.at(strand_counts, (pos_idx + lo, bases, st), 1)
        kept.append((rec, si))
        span_lo.append(lo)
        projs.append(proj)
        rquals.append(qual)
        rposs.append(rpos)
        events.extend(evs)
    R = len(kept)
    lens = np.array([len(p) for p in projs], np.int64)
    rstart = np.array(span_lo, np.int32) if R else np.zeros(0, np.int32)
    rend = (rstart + lens).astype(np.int32) if R else np.zeros(0, np.int32)
    base_idx = np.concatenate([[0], np.cumsum(lens)[:-1]]) if R else np.zeros(0, np.int64)
    return WindowPileup(
        start=start,
        end=end,
        base_counts=base_counts,
        qual_sums=qual_sums,
        strand_counts=strand_counts,
        depth=base_counts.sum(axis=1),
        reads=kept,
        rstart=rstart,
        rend=rend,
        base_idx=base_idx.astype(np.int64),
        flat_proj=np.concatenate(projs) if R else np.zeros(0, np.int8),
        flat_qual=np.concatenate(rquals) if R else np.zeros(0, np.int8),
        flat_rpos=np.concatenate(rposs) if R else np.zeros(0, np.int32),
        events=events,
    )
