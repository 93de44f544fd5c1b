"""Direct-address k-mer seed index: the TPU-first seeding structure.

BWA seeds via FM-index SMEMs — a pointer-chasing structure optimized for
tiny RAM [external knowledge; the reference pins only the index files and
CLI, .gitmodules:16-18].  On TPU the memory/latency trade flips: HBM is
large, and FM extension costs ~L sequentially-dependent steps per read,
so seeding here is a dense hash-bucket table over fixed-k windows:

  bucket_start: (2^bits + 1,) int32  — prefix offsets per hash bucket
  positions:    (n_pos,) int32       — genome positions sorted by bucket
  fp:           (n_pos,) uint16      — per-entry key fingerprint

A query is ~10 XLA ops for the WHOLE batch, with gather volume ~C ints
per anchor: compute every read k-mer with k unrolled shift-adds (no
gathers), hash → two 1-wide gathers for bucket bounds, one (lanes, C)
gather of candidate positions + fingerprints, fingerprint compare, then a
top-`max_hits` select.  No sequential dependence on k or L anywhere.
Fingerprint collisions (~2e-5/candidate) produce junk seeds that lose in
chaining/SW scoring — exactness of final alignments is unaffected.

Memory is ~6 B/base + bucket table — a 1 Gbp genome shard fits a v5e
chip; whole-genome scale uses the same chromosome-group sharding as the
FM path (index/fm.py notes).  The FM index remains the byte-exact-parity
and low-memory path (align.seeding).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

MULT_LO = np.uint32(0x9E3779B1)  # bucket hash multipliers (Fibonacci)
MULT_HI = np.uint32(0x85EBCA6B)
FP_LO = np.uint32(0xC2B2AE35)    # decorrelated fingerprint multipliers
FP_HI = np.uint32(0x27D4EB2F)


class KmerIndex(NamedTuple):
    """Device arrays; k/bits ride along as () int32 (jit specializes on the
    static twins passed to the query functions)."""

    bucket_start: jnp.ndarray  # (2^bits + 1,) int32
    positions: jnp.ndarray     # (n_pos_pad,) int32
    fp: jnp.ndarray            # (n_pos_pad,) uint16 key fingerprints
    l_pac: jnp.ndarray         # () int32
    k: jnp.ndarray             # () int32
    bits: jnp.ndarray          # () int32


def _rolling_keys_np(pac: np.ndarray, k: int):
    n_pos = max(0, len(pac) - k + 1)
    lo = np.zeros(n_pos, dtype=np.uint32)
    hi = np.zeros(n_pos, dtype=np.uint32)
    base = pac.astype(np.uint32)
    for j in range(k):
        b = base[j : j + n_pos]
        hi = (hi << np.uint32(2)) | (lo >> np.uint32(30))
        lo = (lo << np.uint32(2)) | b
    return lo, hi


def build_kmer_index(pac: np.ndarray, k: int = 19, bits: int = 0) -> KmerIndex:
    """Host-side build from 0-3 base codes (one pass + one sort).

    bits=0 → auto (≈2× buckets per position).
    """
    pac = np.asarray(pac, dtype=np.uint8)
    l_pac = len(pac)
    n_pos = max(0, l_pac - k + 1)
    if bits <= 0:
        bits = max(8, min(26, int(np.ceil(np.log2(max(n_pos, 2) * 2)))))
    lo, hi = _rolling_keys_np(pac, k)
    bucket = (((lo * MULT_LO) ^ (hi * MULT_HI)) >> np.uint32(32 - bits)).astype(np.int64)
    fp_all = (((lo * FP_LO) ^ (hi * FP_HI)) >> np.uint32(16)).astype(np.uint16)
    order = np.argsort(bucket, kind="stable")
    counts = np.bincount(bucket, minlength=(1 << bits)).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    positions = order.astype(np.int32)
    fp = fp_all[order]
    if len(positions) == 0:
        positions = np.zeros(1, np.int32)
        fp = np.zeros(1, np.uint16)
    return KmerIndex(
        bucket_start=jnp.asarray(starts),
        positions=jnp.asarray(positions),
        fp=jnp.asarray(fp),
        l_pac=jnp.int32(l_pac),
        k=jnp.int32(k),
        bits=jnp.int32(bits),
    )


def _conv_word(x: jnp.ndarray, taps: int) -> jnp.ndarray:
    """Exact base-4 positional weighting via f32 convolution: out[p] =
    Σ_j x[p+j]·4^(taps-1-j).  taps ≤ 8 keeps values < 2^16 (f32-exact)."""
    B, L = x.shape
    w = (4.0 ** np.arange(taps - 1, -1, -1, dtype=np.float32)).reshape(1, 1, taps)
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32)[:, None, :], jnp.asarray(w),
        window_strides=(1,), padding="VALID")
    return y[:, 0, :].astype(jnp.int32)  # (B, L-taps+1)


def read_kmers(reads: jnp.ndarray, k: int):
    """(lo, hi) uint32 k-mer keys at every read position (B, L); positions
    whose window contains a non-ACGT code or runs past L are flagged.

    Keys are built from three exact f32 convolutions (8+8+(k-16) taps)
    instead of k sequential shift-ors — ~8 XLA kernels total.  Only
    16 < k ≤ 24 is supported (the aligner default is 19).
    """
    assert 16 < k <= 24, "read_kmers supports 17..24-mers"
    B, L = reads.shape
    r = jnp.clip(reads.astype(jnp.int32), 0, 4)
    bad_ind = (r > 3).astype(jnp.float32)
    rr = jnp.where(r > 3, 0, r)
    t2 = k - 16
    n_pos = L - k + 1
    w8 = _conv_word(rr, 8)                     # 8-base words at every p
    w0 = w8[:, :n_pos].astype(jnp.uint32)      # bases p..p+7   (16 bits)
    w1 = w8[:, 8 : 8 + n_pos].astype(jnp.uint32)   # bases p+8..p+15
    w2 = _conv_word(rr, t2)[:, 16 : 16 + n_pos].astype(jnp.uint32)
    # key layout matches _rolling_keys_np: hi = first (k-16) bases in its
    # low 2(k-16) bits, lo = last 16 bases
    sh_hi = 2 * k - 32                         # bits in hi
    hi = w0 >> jnp.uint32(16 - sh_hi)
    lo = (
        ((w0 & jnp.uint32((1 << (16 - sh_hi)) - 1)) << jnp.uint32(16 + 2 * t2))
        | (w1 << jnp.uint32(2 * t2))
        | w2
    )
    # bad: any non-ACGT inside the k-window
    nbad = jax.lax.conv_general_dilated(
        bad_ind[:, None, :], jnp.ones((1, 1, k), jnp.float32),
        window_strides=(1,), padding="VALID")[:, 0, :]
    bad = nbad[:, :n_pos] > 0
    # pad back to (B, L) so anchor slicing stays in-bounds
    pad = L - n_pos
    lo = jnp.pad(lo, ((0, 0), (0, pad)))
    hi = jnp.pad(hi, ((0, 0), (0, pad)))
    bad = jnp.pad(bad, ((0, 0), (0, pad)), constant_values=True)
    return lo, hi, bad


@functools.partial(
    jax.jit, static_argnames=("k", "stride", "max_hits", "max_scan", "max_occ")
)
def find_seeds_hash(
    kidx: KmerIndex,
    reads: jnp.ndarray,     # (B, L) int32/uint8 codes, 4 = N/pad
    lengths: jnp.ndarray,   # (B,) int32
    k: int = 19,
    stride: int = 8,
    max_hits: int = 4,
    max_scan: int = 8,      # bucket entries examined per anchor
    max_occ: int = 500,     # skip ultra-repetitive anchors (bwa -c analog)
):
    """Hash-bucket seeding over grid anchors, both strands.

    Returns a Seeds tuple (align.seeding.Seeds layout) with
    S = 2 * n_anchors * max_hits.  Seed length is fixed k; qpos for
    reverse-strand seeds is in the reverse-complemented read frame
    (matching the FMD path's convention).
    """
    from ..align.seeding import Seeds
    from ..align.core import revcomp_reads

    B, L = reads.shape
    reads = reads.astype(jnp.int32)
    n_anchor = max(1, (max(L - k, 0)) // stride + 1)
    anchors_np = np.minimum(
        np.arange(n_anchor, dtype=np.int32) * stride, max(L - k, 0))
    anchors = jnp.asarray(anchors_np)
    G = n_anchor
    reads_rc = revcomp_reads(reads, lengths)

    h32 = lambda lo, hi: (lo * jnp.uint32(0x9E3779B1)) ^ (hi * jnp.uint32(0x85EBCA6B))
    f32 = lambda lo, hi: (lo * jnp.uint32(0xC2B2AE35)) ^ (hi * jnp.uint32(0x27D4EB2F))
    shift = (jnp.uint32(32) - kidx.bits.astype(jnp.uint32))

    # anchor k-mer keys as ONE (B,L)@(L,4G) matmul on the MXU: each output
    # column is a positional base-4 sum over one anchor's window (8+8+t2
    # base words, all < 2^16 so f32 is exact).  Replaces per-position
    # convolutions over the whole read (~32 ms/strand → ~2 ms,
    # docs/PERF_NOTES.md).
    t2 = k - 16
    W_np = np.zeros((L, 4 * G), np.float32)
    for gi, a in enumerate(anchors_np):
        for j in range(t2):           # hi word: first k-16 bases
            W_np[a + j, gi] = 4.0 ** (t2 - 1 - j)
        for j in range(8):            # lo word 0: bases t2..t2+7
            W_np[a + t2 + j, G + gi] = 4.0 ** (7 - j)
        for j in range(8):            # lo word 1: bases t2+8..t2+15
            W_np[a + t2 + 8 + j, 2 * G + gi] = 4.0 ** (7 - j)
        for j in range(k):            # bad-base window count
            W_np[a + j, 3 * G + gi] = 1.0
    W = jnp.asarray(W_np)

    def anchor_keys(rd):
        r = jnp.clip(rd, 0, 4)
        badf = (r > 3).astype(jnp.float32)
        rf = jnp.where(r > 3, 0, r).astype(jnp.float32)
        prod = rf @ W[:, : 3 * G]                # (B, 3G)
        nbad = badf @ W[:, 3 * G :]              # (B, G)
        hi = prod[:, :G].astype(jnp.uint32)
        a0 = prod[:, G : 2 * G].astype(jnp.uint32)
        a1 = prod[:, 2 * G :].astype(jnp.uint32)
        lo = (a0 << jnp.uint32(16)) | a1
        return lo, hi, nbad > 0

    def one_strand(rd):
        a_lo, a_hi, bad = anchor_keys(rd)        # (B, G)
        anchor_ok = (
            ~bad
            & (anchors[None, :] + k <= lengths[:, None])
        )
        bkt = (h32(a_lo, a_hi) >> shift).astype(jnp.int32)
        q_fp = (f32(a_lo, a_hi) >> jnp.uint32(16)).astype(jnp.uint16)
        start = kidx.bucket_start[bkt]
        n_in_bucket = kidx.bucket_start[bkt + 1] - start
        anchor_ok = anchor_ok & (n_in_bucket <= max_occ)
        j = jnp.arange(max_scan, dtype=jnp.int32)
        cand_idx = jnp.clip(
            start[..., None] + j, 0, kidx.positions.shape[0] - 1)
        cand_live = anchor_ok[..., None] & (j < n_in_bucket[..., None])
        cand_pos = kidx.positions[cand_idx]      # (B, G, C)
        cand_fp = kidx.fp[cand_idx]
        ok = cand_live & (cand_fp == q_fp[..., None])
        # first max_hits verified candidates, bucket order preserved
        sel_key = (ok.astype(jnp.int32) << 8) - j  # verified first, low j first
        _, top = jax.lax.top_k(sel_key, max_hits)  # (B, G, H) indices into C
        hit_ok = jnp.take_along_axis(ok, top, axis=-1)
        hit_pos = jnp.where(
            hit_ok, jnp.take_along_axis(cand_pos, top, axis=-1), -1)
        n_ok = jnp.sum(ok, axis=-1)               # (B, G)
        return hit_pos, hit_ok, n_ok

    pos_f, ok_f, n_f = one_strand(reads)
    pos_r, ok_r, n_r = one_strand(reads_rc)

    def pack(hit_pos, hit_ok, n_ok, strand):
        qp = jnp.broadcast_to(anchors[None, :, None], hit_pos.shape)
        iv = jnp.broadcast_to(n_ok[..., None], hit_pos.shape)
        S = G * max_hits
        return (
            hit_pos.reshape(B, S),
            qp.reshape(B, S).astype(jnp.int32),
            jnp.full((B, S), k, jnp.int32),
            jnp.full((B, S), strand, jnp.int32),
            iv.reshape(B, S),
            hit_ok.reshape(B, S),
        )

    f = pack(pos_f, ok_f, n_f, 0)
    r = pack(pos_r, ok_r, n_r, 1)
    cat = lambda a, b: jnp.concatenate([a, b], axis=1)
    return Seeds(
        rpos=cat(f[0], r[0]),
        qpos=cat(f[1], r[1]),
        length=cat(f[2], r[2]),
        strand=cat(f[3], r[3]),
        interval_size=cat(f[4], r[4]),
        valid=cat(f[5], r[5]),
    )
