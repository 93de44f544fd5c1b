"""Batched SMEM seeding on the FMD index.

TPU-native reformulation of BWA-MEM's SMEM collection [external knowledge:
bwt_smem1 forward/backward two-pass; the reference pins only the CLI
contract, bin/speedseq:438].  Instead of BWA's data-dependent x-jumping
loop, we anchor at a fixed grid of read positions and compute, per anchor
p, the maximal exact match through p with the longest right extension:

    e(p) = furthest end of a match starting at p   (forward FMD extension)
    s(p) = furthest start extending [p, e(p))      (backward extension)

[s(p), e(p)) is provably an SMEM (right-maximality survives left
extension), and every SMEM whose "right-maximal anchor range" spans a grid
point is found.  With stride ≤ half the min seed length the missed SMEMs
are rare and redundant for chaining.  All loops are `while_loop`s over
fixed-shape (B, G) lane arrays with alive masks — no data-dependent
shapes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..index.fm import (
    FMIndex,
    BiInterval,
    backward_ext,
    forward_ext,
    interval_init,
    sa_lookup,
)


class Seeds(NamedTuple):
    """Per-read seed table, fixed shape (B, S) with S = n_grid * max_hits.

    Coordinates are strand-corrected: for reverse-strand hits qpos/rpos
    refer to the reverse-complemented read against the forward genome.
    """

    rpos: jnp.ndarray    # (B, S) int32 genome pos of seed start (fwd strand)
    qpos: jnp.ndarray    # (B, S) int32 read pos of seed start (strand frame)
    length: jnp.ndarray  # (B, S) int32 seed length
    strand: jnp.ndarray  # (B, S) int32 0=fwd 1=rev
    interval_size: jnp.ndarray  # (B, S) int32 occurrence count of the SMEM
    valid: jnp.ndarray   # (B, S) bool


def _grid(read_len: int, stride: int) -> jnp.ndarray:
    n = max(1, (read_len + stride - 1) // stride)
    return jnp.minimum(jnp.arange(n, dtype=jnp.int32) * stride, read_len - 1)


@functools.partial(
    jax.jit, static_argnames=("stride", "min_seed_len", "max_occ", "max_hits")
)
def find_seeds(
    fm: FMIndex,
    reads: jnp.ndarray,     # (B, L) int32/uint8 base codes, 4 = N/pad
    lengths: jnp.ndarray,   # (B,) int32
    stride: int = 8,
    min_seed_len: int = 19,  # bwa mem -k default
    max_occ: int = 500,      # bwa mem -c default (skip repetitive seeds)
    max_hits: int = 4,       # SA samples taken per SMEM
) -> Seeds:
    B, L = reads.shape
    reads = reads.astype(jnp.int32)
    starts = _grid(L, stride)  # (G,)
    G = starts.shape[0]
    # derive p from a read-dependent zero so its sharding "varying" status
    # matches loop-carried outputs under shard_map (scan-vma rule)
    p = starts[None, :] + jnp.zeros_like(lengths)[:, None]
    rlen = lengths[:, None]

    def read_base(offsets):
        """Gather reads[b, offsets[b,g]] with bounds masking → 4 outside."""
        safe = jnp.clip(offsets, 0, L - 1)
        vals = jnp.take_along_axis(reads, safe, axis=1)
        inb = (offsets >= 0) & (offsets < rlen)
        return jnp.where(inb, vals, jnp.int32(4))

    # ---- forward phase: extend right from each anchor -------------------
    c0 = read_base(p)
    iv0 = interval_init(fm, c0.reshape(-1))
    alive0 = (c0.reshape(-1) < 4) & (iv0.s > 0)
    qend0 = jnp.where(alive0, (p + 1).reshape(-1), p.reshape(-1))

    def fwd_cond(state):
        _, _, alive, j = state
        return (j < L) & jnp.any(alive)

    def fwd_body(state):
        iv, qend, alive, j = state
        c = read_base(p + j).reshape(-1)
        ext = forward_ext(fm, iv, c)
        ok = alive & (c < 4) & (ext.s > 0)
        iv2 = BiInterval(
            k=jnp.where(ok, ext.k, iv.k),
            l=jnp.where(ok, ext.l, iv.l),
            s=jnp.where(ok, ext.s, iv.s),
        )
        qend2 = jnp.where(ok, (p + j + 1).reshape(-1), qend)
        return iv2, qend2, ok, j + 1

    iv_f, qend, _, _ = jax.lax.while_loop(
        fwd_cond, fwd_body, (iv0, qend0, alive0, jnp.int32(1))
    )

    # ---- backward phase: extend left from [p, e) ------------------------
    def bwd_cond(state):
        _, _, alive, j = state
        return (j <= L) & jnp.any(alive)

    def bwd_body(state):
        iv, qbeg, alive, j = state
        c = read_base(p - j).reshape(-1)
        ext = backward_ext(fm, iv, c)
        ok = alive & (c < 4) & (ext.s > 0)
        iv2 = BiInterval(
            k=jnp.where(ok, ext.k, iv.k),
            l=jnp.where(ok, ext.l, iv.l),
            s=jnp.where(ok, ext.s, iv.s),
        )
        qbeg2 = jnp.where(ok, (p - j).reshape(-1), qbeg)
        return iv2, qbeg2, ok, j + 1

    alive_b = alive0
    iv_b, qbeg, _, _ = jax.lax.while_loop(
        bwd_cond, bwd_body, (iv_f, p.reshape(-1), alive_b, jnp.int32(1))
    )

    qbeg = qbeg.reshape(B, G)
    qend = qend.reshape(B, G)
    seed_len = qend - qbeg
    ivk = iv_b.k.reshape(B, G)
    ivs = iv_b.s.reshape(B, G)

    # dedup identical SMEMs found from consecutive anchors
    uniq = jnp.ones((B, G), dtype=bool)
    uniq = uniq.at[:, 1:].set(
        (qbeg[:, 1:] != qbeg[:, :-1]) | (qend[:, 1:] != qend[:, :-1])
    )
    smem_ok = (
        uniq
        & (seed_len >= min_seed_len)
        & (ivs > 0)
        & (ivs <= max_occ)
        & alive0.reshape(B, G)
    )

    # ---- resolve up to max_hits SA positions per SMEM -------------------
    h = jnp.arange(max_hits, dtype=jnp.int32)
    ranks = ivk[..., None] + h  # (B, G, H)
    hit_ok = smem_ok[..., None] & (h < jnp.minimum(ivs[..., None], max_hits))
    # avoid wasted SA walks on dead lanes: clamp rank to 1 (cheap lookup)
    safe_ranks = jnp.where(hit_ok, ranks, 1)
    tpos = sa_lookup(fm, safe_ranks.reshape(-1)).reshape(B, G, max_hits)

    slen = jnp.broadcast_to(seed_len[..., None], tpos.shape)
    qb = jnp.broadcast_to(qbeg[..., None], tpos.shape)
    is_rev = tpos >= fm.l_pac
    # forward-strand genome coordinates of the seed
    rpos_fwd = tpos
    rpos_rev = 2 * fm.l_pac - (tpos + slen)
    rpos = jnp.where(is_rev, rpos_rev, rpos_fwd)
    # strand-corrected read coordinates (position within revcomp read)
    qpos = jnp.where(is_rev, rlen[..., None] - (qb + slen), qb)
    # discard hits whose text span crosses the fwd/rev junction
    crosses = (~is_rev & (tpos + slen > fm.l_pac)) | (is_rev & (rpos < 0))
    ok = hit_ok & ~crosses

    S = G * max_hits
    return Seeds(
        rpos=rpos.reshape(B, S),
        qpos=qpos.reshape(B, S),
        length=slen.reshape(B, S),
        strand=is_rev.astype(jnp.int32).reshape(B, S),
        interval_size=jnp.broadcast_to(ivs[..., None], tpos.shape).reshape(B, S),
        valid=ok.reshape(B, S),
    )
