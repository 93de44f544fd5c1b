"""Device-resident FM-index (FMD) arrays + batched JAX query ops.

TPU-native replacement for BWA's in-memory bwt_t [external knowledge:
FMD-index of Li 2012; behavior pinned by the byte-exact on-disk index we
build in bwt.py].  Layout choices made for XLA:

- ``occ_ckpt`` (n_blocks+1, 4) int32 and ``bwt`` (n_blocks, 8) uint32 are
  row-gathered per query: one 16 B + one 32 B HBM touch per occ lookup;
  counting is 2-bit pattern-match + ``lax.population_count`` on the VPU.
- SA is **position-sampled** (every 32nd text position marked in a rank
  bitmap with popcount checkpoints), unlike bwa's rank sampling whose LF
  walk has an unbounded tail: position sampling guarantees the walk hits
  a sample within 32 steps, so ``sa_lookup`` is a fixed 32-iteration
  ``fori_loop`` — no data-dependent trip counts anywhere.
- all rank math is int32 → genomes to ~1 Gbp per index shard (a human
  genome runs as chromosome-group shards; multi-chip shards *reads*, the
  index is replicated per device, mirroring how the reference replicates
  the BWA index per process).

Rank-space convention (matches bwa): conceptual BWT has seq_len+1 rows
including the sentinel row at ``primary``; stored arrays skip it and occ
adjusts with ``k -= (k > primary)``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .bwt import BWAIndex, OCC_INTERVAL

BASES_PER_WORD = 16
WORDS_PER_BLOCK = OCC_INTERVAL // BASES_PER_WORD  # 8
SA_POS_INTV = 32  # sample SA at text positions ≡ 0 (mod 32)


class FMIndex(NamedTuple):
    """Pytree of device arrays; replicate per device via jax.device_put."""

    count: jnp.ndarray        # (4,) int32 — C'[c] = 1 + L2[c]
    occ_ckpt: jnp.ndarray     # (n_blocks+1, 4) int32
    bwt: jnp.ndarray          # (n_blocks, 8) uint32, 16 bases/word, top-first
    sa_mark: jnp.ndarray      # (ceil((seq_len+1)/32),) uint32 bitmap, LSB-first
    sa_ckpt: jnp.ndarray      # same shape int32 — marked ranks in [0, 32w)
    sa_vals: jnp.ndarray      # (n_marked_pad,) int32 — SA values of marks
    sa_dense: Optional[jnp.ndarray]  # (seq_len+1,) int32 full SA (small
    # genomes only: one gather replaces the 32-step LF walk)
    ref: jnp.ndarray          # (l_pac_pad,) uint8 forward reference 0-3
    ref_pack: jnp.ndarray     # (ceil(l_pac/16),) uint32, 16 bases/word
    # (LSB-first 2-bit codes) — word-gather path for ref windows
    primary: jnp.ndarray      # () int32
    seq_len: jnp.ndarray      # () int32 = 2 * l_pac
    l_pac: jnp.ndarray        # () int32

    @classmethod
    def from_bwa(
        cls,
        idx: BWAIndex,
        sa_full: Optional[np.ndarray] = None,
        ref_pad_to: int = 128,
        dense_sa_max: int = 1 << 25,   # ≤ 32M ranks → keep the full SA
    ) -> "FMIndex":
        """Build device arrays from a BWAIndex.

        ``sa_full`` (the full suffix array, length seq_len+1) is used when
        available (our builder keeps it); otherwise it is reconstructed on
        host by one O(n) LF walk over the BWT.
        """
        n = int(idx.L2[4])
        n_blocks = (n + OCC_INTERVAL - 1) // OCC_INTERVAL
        words = np.zeros(n_blocks * WORDS_PER_BLOCK, dtype=np.uint32)
        words[: len(idx.bwt_words)] = idx.bwt_words

        if sa_full is None:
            sa_full = _reconstruct_sa(idx)
        mark = (sa_full % SA_POS_INTV) == 0
        n_ranks = n + 1
        n_words_sa = (n_ranks + 31) // 32
        mark_pad = np.zeros(n_words_sa * 32, dtype=bool)
        mark_pad[:n_ranks] = mark
        bits = mark_pad.reshape(-1, 32)
        sa_mark = np.zeros(n_words_sa, dtype=np.uint32)
        for b in range(32):
            sa_mark |= bits[:, b].astype(np.uint32) << b
        counts = bits.sum(axis=1)
        sa_ckpt = np.concatenate(([0], np.cumsum(counts[:-1]))).astype(np.int32)
        sa_vals = sa_full[mark].astype(np.int32)

        l_pac = idx.l_pac
        l_pad = ((l_pac + ref_pad_to - 1) // ref_pad_to) * ref_pad_to
        ref = np.full(max(l_pad, ref_pad_to), 4, dtype=np.uint8)
        ref[:l_pac] = idx.pac
        nw = (l_pac + 15) // 16
        codes16 = np.zeros(nw * 16, dtype=np.uint32)
        codes16[:l_pac] = idx.pac & 3
        ref_pack = np.zeros(nw, dtype=np.uint32)
        for t in range(16):
            ref_pack |= codes16[t::16] << np.uint32(2 * t)
        sa_dense = (
            jnp.asarray(sa_full.astype(np.int32))
            if n_ranks <= dense_sa_max
            else None
        )
        return cls(
            count=jnp.asarray(1 + idx.L2[:4], dtype=jnp.int32),
            occ_ckpt=jnp.asarray(idx.occ, dtype=jnp.int32),
            bwt=jnp.asarray(words.reshape(n_blocks, WORDS_PER_BLOCK)),
            sa_mark=jnp.asarray(sa_mark),
            sa_ckpt=jnp.asarray(sa_ckpt),
            sa_vals=jnp.asarray(sa_vals),
            sa_dense=sa_dense,
            ref=jnp.asarray(ref),
            ref_pack=jnp.asarray(ref_pack if nw else np.zeros(1, np.uint32)),
            primary=jnp.int32(idx.primary),
            seq_len=jnp.int32(n),
            l_pac=jnp.int32(l_pac),
        )


def _reconstruct_sa(idx: BWAIndex) -> np.ndarray:
    """Host-side SA reconstruction from the BWT via one LF walk (used when
    loading a foreign bwa index, where only rank samples exist)."""
    n = int(idx.L2[4])
    # unpack stored bwt codes
    words = idx.bwt_words
    n_words = len(words)
    codes = np.zeros(n_words * 16, dtype=np.uint8)
    for j in range(16):
        codes[j::16] = (words >> ((15 - j) * 2)) & 3
    codes = codes[:n]
    onehot = np.zeros((n + 1, 4), dtype=np.int64)
    onehot[1:][np.arange(n), codes] = 1
    occ_excl_stored = np.cumsum(onehot, axis=0)  # stored-prefix occ
    primary = idx.primary
    count = 1 + idx.L2[:4]
    sa = np.empty(n + 1, dtype=np.int64)
    r = 0
    # rank 0 = sentinel suffix (SA = n); walking LF visits SA values n-1..0
    sa[0] = n
    pos = n
    for _ in range(n):
        # LF(r): c = bwt char at conceptual row r (r != primary on this walk
        # until the very last step, which lands SA=0 at primary)
        rr = r - (r > primary)
        c = codes[rr]
        r = int(count[c] + occ_excl_stored[rr, c])
        pos -= 1
        sa[r] = pos
    return sa


def _word_count_all(words: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Count each base (0-3) among the first ``valid`` of 16 bases/word.

    words: (..., 8) uint32; valid: (..., 8) int32 in [0, 16]
    returns (..., 4) int32
    """
    full = valid >= 16
    nbits = (2 * valid).astype(jnp.uint32)
    shift = jnp.where(full, 0, 32 - nbits).astype(jnp.uint32)
    ones = jnp.where(
        full, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << nbits) - jnp.uint32(1)
    )
    mask = jnp.where(full, jnp.uint32(0xFFFFFFFF), ones << shift)
    w = words[..., None]  # (..., 8, 1)
    m = mask[..., None]
    patt = jnp.array(
        [0x00000000, 0x55555555, 0xAAAAAAAA, 0xFFFFFFFF], dtype=jnp.uint32
    )  # base code replicated in every 2-bit slot
    x = w ^ patt  # (..., 8, 4)
    slot_match = (~x) & ((~x) >> 1) & jnp.uint32(0x55555555)
    cnt = jax.lax.population_count(slot_match & m)
    return jnp.sum(cnt, axis=-2).astype(jnp.int32)  # (..., 4)


def occ_all(fm: FMIndex, k: jnp.ndarray) -> jnp.ndarray:
    """occ counts of all 4 bases in conceptual BWT rows [0, k).

    k: (...,) int32 ranks in [0, seq_len+1]; returns (..., 4) int32.
    Matches bwa bwt_occ4 semantics incl. the primary-row adjustment.
    """
    kk = k - (k > fm.primary).astype(jnp.int32)
    kk = jnp.clip(kk, 0, fm.seq_len)
    block = kk // OCC_INTERVAL
    within = kk - block * OCC_INTERVAL
    ckpt = fm.occ_ckpt[block]  # (..., 4)
    words = fm.bwt[jnp.clip(block, 0, fm.bwt.shape[0] - 1)]  # (..., 8)
    wi = jnp.arange(WORDS_PER_BLOCK, dtype=jnp.int32)
    valid = jnp.clip(within[..., None] - wi * BASES_PER_WORD, 0, BASES_PER_WORD)
    return ckpt + _word_count_all(words, valid)


def bwt_char(fm: FMIndex, k: jnp.ndarray) -> jnp.ndarray:
    """Base code of conceptual BWT row k (undefined at k == primary;
    callers must handle that row separately)."""
    kk = k - (k > fm.primary).astype(jnp.int32)
    kk = jnp.clip(kk, 0, fm.seq_len - 1)
    word = fm.bwt[kk // OCC_INTERVAL, (kk % OCC_INTERVAL) // BASES_PER_WORD]
    sh = ((15 - (kk % BASES_PER_WORD)) * 2).astype(jnp.uint32)
    return ((word >> sh) & 3).astype(jnp.int32)


class BiInterval(NamedTuple):
    """FMD bi-interval (k, l, s): k on the BWT, l on the mirror strand."""

    k: jnp.ndarray
    l: jnp.ndarray
    s: jnp.ndarray


def interval_init(fm: FMIndex, c: jnp.ndarray) -> BiInterval:
    """Bi-interval of the single-base string c (bwa bwt_set_intv)."""
    c_ = jnp.clip(c, 0, 3)
    hi_counts = jnp.concatenate([fm.count, (fm.seq_len + 1)[None]])
    lo = fm.count[c_]
    hi = hi_counts[c_ + 1]
    s = jnp.where(c < 4, hi - lo, jnp.int32(0))
    lc = fm.count[jnp.clip(3 - c, 0, 3)]
    return BiInterval(k=lo, l=jnp.where(c < 4, lc, lo), s=s)


def backward_ext_all(fm: FMIndex, iv: BiInterval):
    """All-4-bases backward extension (bwa bwt_extend, is_back=1).

    Returns BiInterval of arrays shaped (..., 4).
    """
    occ_lo = occ_all(fm, iv.k)         # (..., 4)
    occ_hi = occ_all(fm, iv.k + iv.s)  # (..., 4)
    cnt = occ_hi - occ_lo
    has_sentinel = (
        (fm.primary >= iv.k) & (fm.primary < iv.k + iv.s)
    ).astype(jnp.int32)
    ck = fm.count + occ_lo
    # l'[c] = l + sentinel_in_interval + Σ_{b>c} cnt[b]  (Li 2012 / bwt_extend)
    rev = jnp.flip(cnt, axis=-1)
    upper = jnp.flip(jnp.cumsum(rev, axis=-1) - rev, axis=-1)
    cl = (iv.l + has_sentinel)[..., None] + upper
    return BiInterval(k=ck, l=cl, s=cnt)


def backward_ext(fm: FMIndex, iv: BiInterval, c: jnp.ndarray) -> BiInterval:
    """Extend pattern by prepending base c; c == 4 gives an empty interval.
    Keeps the old interval fields when the extension empties (callers test
    ``s`` before consuming)."""
    all4 = backward_ext_all(fm, iv)
    c_ = jnp.clip(c, 0, 3)
    take = lambda a: jnp.take_along_axis(a, c_[..., None], axis=-1)[..., 0]
    ok = (c < 4) & (take(all4.s) > 0)
    return BiInterval(
        k=jnp.where(ok, take(all4.k), iv.k),
        l=jnp.where(ok, take(all4.l), iv.l),
        s=jnp.where(c < 4, take(all4.s), jnp.int32(0)),
    )


def forward_ext(fm: FMIndex, iv: BiInterval, c: jnp.ndarray) -> BiInterval:
    """Extend pattern by appending base c: backward-extend the mirror
    interval with complement(c), then swap (FMD symmetry)."""
    mirror = BiInterval(k=iv.l, l=iv.k, s=iv.s)
    ext = backward_ext(fm, mirror, jnp.where(c < 4, 3 - c, c))
    return BiInterval(k=ext.l, l=ext.k, s=ext.s)


def sa_lookup(fm: FMIndex, r: jnp.ndarray) -> jnp.ndarray:
    """SA value (position in the 2*l_pac FMD text) of rank r.

    Fast path: small genomes carry the full SA (one gather).  Fallback:
    fixed 32-iteration LF walk — every 32nd *text position* is marked and
    each LF step decrements the suffix position, so a mark is guaranteed
    within SA_POS_INTV steps.  r: (...,) int32 in [1, seq_len]; vectorized.
    """
    if fm.sa_dense is not None:
        return fm.sa_dense[jnp.clip(r, 0, fm.seq_len)]


    def is_marked(rr):
        w = fm.sa_mark[rr // 32]
        return ((w >> (rr % 32).astype(jnp.uint32)) & 1).astype(bool)

    def mark_rank(rr):
        """Index into sa_vals: marked ranks before rr."""
        w = fm.sa_mark[rr // 32]
        below = (jnp.uint32(1) << (rr % 32).astype(jnp.uint32)) - jnp.uint32(1)
        return fm.sa_ckpt[rr // 32] + jax.lax.population_count(w & below).astype(
            jnp.int32
        )

    def body(_, state):
        rr, steps, done = state
        hit = is_marked(rr) & ~done
        done2 = done | hit
        c = bwt_char(fm, rr)
        occs = occ_all(fm, rr)
        lf = fm.count[c] + jnp.take_along_axis(occs, c[..., None], axis=-1)[..., 0]
        rr2 = jnp.where(done2, rr, lf)
        steps2 = jnp.where(done2, steps, steps + 1)
        return rr2, steps2, done2

    # derive loop carries from r so their sharding "varying" status matches
    # the loop outputs under shard_map (scan-vma rule)
    steps0 = r * 0
    done0 = steps0 > 0
    r_f, steps, _ = jax.lax.fori_loop(0, SA_POS_INTV, body, (r, steps0, done0))
    return fm.sa_vals[mark_rank(r_f)] + steps


def get_ref_window(fm: FMIndex, start: jnp.ndarray, length: int) -> jnp.ndarray:
    """Gather forward-strand reference [start, start+length) as (..., L)
    uint8 base codes; out-of-range positions yield 4 (never matches)."""
    offs = jnp.arange(length, dtype=jnp.int32)
    pos = start[..., None] + offs
    inb = (pos >= 0) & (pos < fm.l_pac)
    vals = fm.ref[jnp.clip(pos, 0, fm.ref.shape[0] - 1)]
    return jnp.where(inb, vals, jnp.uint8(4))


def get_ref_window_packed(
    fm: FMIndex, start16: jnp.ndarray, length: int
) -> jnp.ndarray:
    """Word-gather variant of get_ref_window for 16-aligned starts.

    Gathers length/16 uint32 words (16 packed bases each) instead of
    ``length`` bytes — ~16× less gather volume (gathers cost ~20 ns/element
    on this TPU, docs/PERF_NOTES.md).  ``start16`` must be a multiple of 16;
    out-of-range positions yield 4 as in get_ref_window.
    """
    nw = (length + 15) // 16
    widx = start16[..., None] // 16 + jnp.arange(nw, dtype=jnp.int32)
    words = fm.ref_pack[jnp.clip(widx, 0, fm.ref_pack.shape[0] - 1)]
    sh = jnp.arange(16, dtype=jnp.uint32) * 2
    codes = (
        (words[..., None] >> sh) & jnp.uint32(3)
    ).astype(jnp.uint8)                       # (..., nw, 16)
    codes = codes.reshape(*start16.shape, nw * 16)[..., :length]
    offs = jnp.arange(length, dtype=jnp.int32)
    pos = start16[..., None] + offs
    inb = (pos >= 0) & (pos < fm.l_pac)
    return jnp.where(inb, codes, jnp.uint8(4))
