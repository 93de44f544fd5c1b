"""Paired-end resolution: insert-size estimation + joint pair selection.

Reproduces the roles of (a) BWA-MEM's mem_pestat/mem_pair [external
knowledge] and (b) LUMPY's pairend_distro.py (reference Makefile:121,
insert mean/stdev estimation from sampled pairs) on the host over the
device-produced candidate tables.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from .core import Candidates
from .sw import SWParams

PEN_UNPAIRED = 17  # bwa -U default


@dataclass
class InsertDistro:
    mean: float
    std: float
    low: int    # proper-pair bounds (bwa: ±4 sigma)
    high: int

    @classmethod
    def estimate(
        cls,
        pos1: np.ndarray, strand1: np.ndarray, score1: np.ndarray,
        end1: np.ndarray,
        pos2: np.ndarray, strand2: np.ndarray, score2: np.ndarray,
        end2: np.ndarray,
        qlen: int,
        max_isize: int = 10000,
        fallback: Optional["InsertDistro"] = None,
    ) -> "InsertDistro":
        """From best single-end placements of a sample batch: FR pairs,
        two-round 4-sigma trimming (pairend_distro.py semantics).

        When fewer than 8 usable pairs exist, returns ``fallback`` (the
        previous rolling estimate) if given, else the bwa-ish default —
        so periodic re-estimation never regresses to the default on a
        sparse batch."""
        good = (
            (score1 > qlen // 2) & (score2 > qlen // 2)
            & (strand1 != strand2)
        )
        left = np.minimum(pos1, pos2)
        right = np.maximum(end1, end2)
        isize = right - left
        # FR orientation: leftmost read must be the forward one
        fwd_first = np.where(pos1 <= pos2, strand1 == 0, strand2 == 0)
        good &= fwd_first & (isize > 0) & (isize < max_isize)
        default = fallback or cls(mean=300.0, std=100.0, low=50, high=700)
        vals = isize[good].astype(np.float64)
        if len(vals) < 8:
            return default
        for _ in range(2):
            m, s = vals.mean(), max(vals.std(), 1.0)
            vals = vals[np.abs(vals - m) <= 4 * s]
            if len(vals) < 8:
                break
        m, s = float(vals.mean()), float(max(vals.std(), 1.0))
        return cls(mean=m, std=s, low=max(0, int(m - 4 * s)), high=int(m + 4 * s))

    def pair_penalty(self, isize: np.ndarray) -> np.ndarray:
        """Score penalty for a proper-orientation pair at given insert
        (approximates bwa's -4.343·log P(isize) term, capped so an
        in-distribution pair always beats the unpaired penalty)."""
        z = (isize - self.mean) / self.std
        return np.minimum(PEN_UNPAIRED + 8, 0.72 * z * z).astype(np.int32)


def joint_pair_select(
    c1: Candidates, c2: Candidates, distro: InsertDistro,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pick (k1, k2) per pair maximizing s1 + s2 - penalty.

    Proper orientation: opposite strands, forward read leftmost, insert in
    (0, ~8σ].  Returns (chosen_k1, chosen_k2, proper_flag).
    """
    pos1 = np.asarray(c1.pos)[:, :, None]      # (B, K, 1)
    pos2 = np.asarray(c2.pos)[:, None, :]      # (B, 1, K)
    end1 = np.asarray(c1.rend_pos)[:, :, None]
    end2 = np.asarray(c2.rend_pos)[:, None, :]
    st1 = np.asarray(c1.strand)[:, :, None]
    st2 = np.asarray(c2.strand)[:, None, :]
    s1 = np.asarray(c1.score)[:, :, None]
    s2 = np.asarray(c2.score)[:, None, :]

    left = np.minimum(pos1, pos2)
    right = np.maximum(end1, end2)
    isize = right - left
    fwd_first = np.where(pos1 <= pos2, st1 == 0, st2 == 0)
    proper = (
        (st1 != st2)
        & fwd_first
        & (isize > 0)
        & (isize <= distro.high + 4 * int(distro.std))
        & (s1 > 0)
        & (s2 > 0)
    )
    pen = np.where(proper, distro.pair_penalty(isize), PEN_UNPAIRED)
    total = np.where((s1 > 0) & (s2 > 0), s1 + s2 - pen,
                     np.maximum(s1, s2) - PEN_UNPAIRED)
    B, K, _ = total.shape
    flat = total.reshape(B, K * K)
    best = np.argmax(flat, axis=1)
    k1 = (best // K).astype(np.int32)
    k2 = (best % K).astype(np.int32)
    bidx = np.arange(B)
    prop = proper[bidx, k1, k2]
    # in-bounds proper check against the final distro window
    return k1, k2, prop


def is_proper(
    pos1, end1, strand1, pos2, end2, strand2, distro: InsertDistro,
    same_tid: bool = True,
) -> bool:
    """samblaster/bwa proper-pair predicate for final FLAG setting."""
    if not same_tid:
        return False
    left = min(pos1, pos2)
    right = max(end1, end2)
    isize = right - left
    if strand1 == strand2:
        return False
    if pos1 <= pos2:
        fwd_first = strand1 == 0
    else:
        fwd_first = strand2 == 0
    return bool(fwd_first and distro.low <= isize <= distro.high)
