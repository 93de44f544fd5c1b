"""Pileup construction: BAM records → per-window count arrays.

Vectorized host-side projection of alignments onto reference coordinates
(the role of FreeBayes' pileup traversal [external knowledge]); produces
the count tensors the candidate generator and the device GL kernel
consume.
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
    events:       indel events
    """

    start: int
    end: int
    base_counts: np.ndarray
    qual_sums: np.ndarray
    strand_counts: np.ndarray
    depth: np.ndarray
    reads: List[Tuple[SAMRecord, int]]
    read_proj: List[np.ndarray]   # per read: (L,) int8 base code or -1
    read_qual: List[np.ndarray]   # per read: (L,) int8 qual or 0
    read_rpos: List[np.ndarray]   # per read: (L,) int16 offset in read or -1
    events: List[ReadEvent] = field(default_factory=list)


SKIP_FLAGS = FUNMAP | FSECONDARY | FDUP  # freebayes default read filters


def project_read(rec: SAMRecord, start: int, end: int):
    """Project one alignment onto window [start, end).

    Returns (proj, qual, rpos, events): arrays of length end-start with
    base codes (-1 = not covered), plus indel events.
    """
    L = end - start
    proj = np.full(L, -1, dtype=np.int8)
    qual = np.zeros(L, dtype=np.int8)
    rpos = np.full(L, -1, dtype=np.int16)
    events = []
    seq = rec.seq
    quals = rec.qual
    has_qual = quals not in ("*", "")
    enc = encode_bases(seq.encode()) if seq not in ("*", "") else None
    ri = rec.pos  # ref cursor
    qi = 0        # query cursor
    for op, ln in rec.cigar:
        if op in (0, 7, 8):  # M/=/X
            a = max(ri, start)
            b = min(ri + ln, end)
            if a < b and enc is not None:
                off = a - ri
                proj[a - start : b - start] = enc[qi + off : qi + off + (b - a)]
                if has_qual:
                    qarr = np.frombuffer(
                        quals[qi + off : qi + off + (b - a)].encode(), np.uint8
                    ) - 33
                    qual[a - start : b - start] = np.minimum(qarr, 60)
                else:
                    qual[a - start : b - start] = 30
                rpos[a - start : b - start] = np.arange(qi + off, qi + off + (b - a))
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
    return proj, qual, rpos, events


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
    projs, rquals, rposs = [], [], []
    events: List[ReadEvent] = []
    for rec, si in records:
        if rec.flag & SKIP_FLAGS or rec.mapq < min_mapq or not rec.cigar:
            continue
        if rec.flag & FSUPPLEMENTARY:
            continue
        proj, qual, rpos, evs = project_read(rec, start, end)
        idx = len(kept)
        for e in evs:
            e.read_idx = idx
        cov = proj >= 0
        lowq = cov & (qual < min_baseq)
        proj = proj.copy()
        proj[lowq] = -1
        cov = proj >= 0
        pos_idx = np.nonzero(cov)[0]
        bases = proj[pos_idx].astype(np.int64)
        np.add.at(base_counts, (pos_idx, bases), 1)
        np.add.at(qual_sums, (pos_idx, bases), qual[pos_idx])
        st = 1 if rec.is_reverse() else 0
        np.add.at(strand_counts, (pos_idx, bases, st), 1)
        kept.append((rec, si))
        projs.append(proj)
        rquals.append(qual)
        rposs.append(rpos)
        events.extend(evs)
    return WindowPileup(
        start=start,
        end=end,
        base_counts=base_counts,
        qual_sums=qual_sums,
        strand_counts=strand_counts,
        depth=base_counts.sum(axis=1),
        reads=kept,
        read_proj=projs,
        read_qual=rquals,
        read_rpos=rposs,
        events=events,
    )
