"""Suffix array construction (host-side, vectorized numpy).

Prefix-doubling (Manber–Myers) with numpy lexsort — O(n log n) with fully
vectorized inner loops; practical to ~100 Mbp per call, which covers
per-chromosome construction of a human genome.  The reference's BWA builds
its SA with the IS algorithm in C [external knowledge]; the resulting array
is identical (the suffix array of a string is unique), which is what our
byte-exact .bwt/.sa conformance test against example/data proves.
"""

from __future__ import annotations

import numpy as np


def suffix_array(text: np.ndarray) -> np.ndarray:
    """Suffix array of ``text`` (integer codes ≥0) with an implicit
    sentinel smaller than every symbol appended at the end.

    Returns int64 array of length n+1; sa[0] == n (the sentinel suffix).
    """
    n = len(text)
    if n == 0:
        return np.zeros(1, dtype=np.int64)
    # rank with sentinel: shift codes by +1, sentinel = 0
    rank = np.zeros(n + 1, dtype=np.int64)
    rank[:n] = text.astype(np.int64) + 1
    sa = np.argsort(rank, kind="stable").astype(np.int64)
    # initial ranks from sorted order
    sorted_r = rank[sa]
    new_rank = np.empty(n + 1, dtype=np.int64)
    new_rank[sa] = np.cumsum(
        np.concatenate(([0], (sorted_r[1:] != sorted_r[:-1]).astype(np.int64)))
    )
    rank = new_rank
    k = 1
    while k <= n:
        if rank[sa[-1]] == n:  # all ranks distinct
            break
        # sort by (rank[i], rank[i+k]) using lexsort
        rank2 = np.full(n + 1, -1, dtype=np.int64)
        rank2[: n + 1 - k] = rank[k:]
        sa = np.lexsort((rank2, rank)).astype(np.int64)
        key1 = rank[sa]
        key2 = rank2[sa]
        changed = np.concatenate(
            ([0], ((key1[1:] != key1[:-1]) | (key2[1:] != key2[:-1])).astype(np.int64))
        )
        new_rank = np.empty(n + 1, dtype=np.int64)
        new_rank[sa] = np.cumsum(changed)
        rank = new_rank
        k *= 2
    return sa


def bwt_from_sa(text: np.ndarray, sa: np.ndarray):
    """(bwt_stored, primary): BWT with the sentinel row removed.

    ``primary`` is the rank of the full-string suffix (where the BWT char
    would be the sentinel); bwa stores the same (bwt_t::primary) and
    adjusts occ lookups by ``k -= (k >= primary)``.
    """
    n = len(text)
    prev = sa - 1  # text index preceding each suffix; -1 for suffix 0
    primary = int(np.nonzero(sa == 0)[0][0])
    keep = np.ones(n + 1, dtype=bool)
    keep[primary] = False
    return text[prev[keep]], primary
