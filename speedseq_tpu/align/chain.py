"""Seed chaining: diagonal-binned grouping of seeds into candidate chains.

TPU-native take on BWA-MEM's chaining [external knowledge: mem_chain's
O(n log n) b-tree insertion; only the CLI contract is pinned by the
reference].  Seeds are sorted by (strand, diagonal, rpos) with a single
fixed-shape argsort; chain boundaries fall where the diagonal jumps by
more than ``band`` or strands differ; per-chain weights reduce via
segment ops.  Top-K chains come out as fixed-shape anchor records for the
extension stage.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .seeding import Seeds


class Chains(NamedTuple):
    """Top-K candidate chains per read; all (B, K)."""

    anchor_rpos: jnp.ndarray   # genome pos of the chain's longest seed
    anchor_qpos: jnp.ndarray   # read pos (strand frame) of that seed
    anchor_len: jnp.ndarray
    strand: jnp.ndarray
    weight: jnp.ndarray        # total seed bases in chain (approx score)
    valid: jnp.ndarray         # bool
    qspan_beg: jnp.ndarray     # min seed qpos in chain (strand frame)
    qspan_end: jnp.ndarray     # max seed qpos+len in chain


@functools.partial(jax.jit, static_argnames=("k", "band", "max_chain_gap"))
def chain_seeds(
    seeds: Seeds,
    read_len: int,
    k: int = 4,
    band: int = 100,          # bwa -w band width
    max_chain_gap: int = 10000,
) -> Chains:
    B, S = seeds.rpos.shape
    diag = seeds.rpos - seeds.qpos + read_len  # ≥ 0
    # sort key: invalid lanes to the end; strand above diagonal
    BIG = jnp.int32(2**30)
    key = jnp.where(
        seeds.valid,
        seeds.strand * BIG + diag,
        jnp.int32(2**31 - 1),
    )
    order = jnp.argsort(key, axis=1)
    take = lambda a: jnp.take_along_axis(a, order, axis=1)
    rpos = take(seeds.rpos)
    qpos = take(seeds.qpos)
    slen = take(seeds.length)
    strand = take(seeds.strand)
    valid = take(seeds.valid)
    dg = take(diag)

    prev_same = (
        (strand[:, 1:] == strand[:, :-1])
        & (jnp.abs(dg[:, 1:] - dg[:, :-1]) <= band)
        & (jnp.abs(rpos[:, 1:] - rpos[:, :-1]) <= max_chain_gap)
        & valid[:, 1:]
        & valid[:, :-1]
    )
    new_chain = jnp.concatenate(
        [jnp.ones((B, 1), dtype=jnp.int32), 1 - prev_same.astype(jnp.int32)],
        axis=1,
    )
    cid = jnp.cumsum(new_chain, axis=1) - 1  # (B, S) chain ids in [0, S)

    zero_invalid = lambda v: jnp.where(valid, v, 0)
    # chain weight: approximate non-overlapping coverage — sum of per-seed
    # query-novel bases (seed len minus overlap with previous seed in chain)
    qend_prev = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), (qpos + slen)[:, :-1]], axis=1
    )
    novel = jnp.where(
        new_chain == 1, slen, jnp.clip(qpos + slen - jnp.maximum(qpos, qend_prev), 0)
    )
    weight = jnp.zeros((B, S), jnp.int32).at[
        jnp.arange(B)[:, None], cid
    ].add(zero_invalid(novel))
    chain_valid = (
        jnp.zeros((B, S), jnp.int32)
        .at[jnp.arange(B)[:, None], cid]
        .add(valid.astype(jnp.int32))
        > 0
    )

    # anchor = longest seed in chain (scatter-max on (len<<12|slot))
    slot = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :], (B, S))
    packed = jnp.where(valid, slen * jnp.int32(4096) + slot, -1)
    best_packed = jnp.full((B, S), -1, jnp.int32).at[
        jnp.arange(B)[:, None], cid
    ].max(packed)
    anchor_slot = jnp.clip(best_packed % 4096, 0, S - 1)

    gat = lambda a: jnp.take_along_axis(a, anchor_slot, axis=1)
    a_rpos, a_qpos, a_len, a_strand = gat(rpos), gat(qpos), gat(slen), gat(strand)

    # per-chain query span (for split detection without a traceback)
    BIGQ = jnp.int32(1 << 20)
    qbeg_c = jnp.full((B, S), BIGQ, jnp.int32).at[
        jnp.arange(B)[:, None], cid
    ].min(jnp.where(valid, qpos, BIGQ))
    qend_c = jnp.zeros((B, S), jnp.int32).at[
        jnp.arange(B)[:, None], cid
    ].max(jnp.where(valid, qpos + slen, 0))

    # top-K chains by weight
    w_for_rank = jnp.where(chain_valid, weight, -1)
    topw, topi = jax.lax.top_k(w_for_rank, k)
    sel = lambda a: jnp.take_along_axis(a, topi, axis=1)
    return Chains(
        anchor_rpos=sel(a_rpos),
        anchor_qpos=sel(a_qpos),
        anchor_len=sel(a_len),
        strand=sel(a_strand),
        weight=topw,
        valid=topw > 0,
        qspan_beg=jnp.minimum(sel(qbeg_c), BIGQ - 1),
        qspan_end=sel(qend_c),
    )


@functools.partial(jax.jit, static_argnames=("k", "band"))
def chain_seeds_nms(
    seeds: Seeds,
    read_len: int,
    k: int = 4,
    band: int = 100,
) -> Chains:
    """Sort-free chaining for densely tiled seeds (the hash k-mer path).

    The argsort/segment formulation (chain_seeds) costs ~50 ms per 4k-read
    batch in XLA's TPU sort; with grid-anchored fixed-k seeds the chain
    structure is simpler — seeds on nearby diagonals of the same strand
    form one chain — so chaining reduces to k rounds of vectorized
    non-max suppression over the (S × S) same-diagonal mask (~31 M bool
    ops/round, pure VPU work, no gathers/sorts).

    Weight = min(query-span union, Σ seed lengths): exact coverage for
    stride ≤ seed-length tilings, never above the true coverage.
    """
    B, S = seeds.rpos.shape
    diag = seeds.rpos - seeds.qpos + read_len
    valid = seeds.valid
    slot = jnp.arange(S, dtype=jnp.int32)
    BIGQ = jnp.int32(1 << 20)

    same = (
        (jnp.abs(diag[:, :, None] - diag[:, None, :]) <= band)
        & (seeds.strand[:, :, None] == seeds.strand[:, None, :])
    )  # (B, S, S): static pair structure

    qp = seeds.qpos
    qe = seeds.qpos + seeds.length

    active = valid
    outs = []
    for _ in range(k):
        grp = same & active[:, None, :] & active[:, :, None]
        qbeg_i = jnp.min(jnp.where(grp, qp[:, None, :], BIGQ), axis=2)
        qend_i = jnp.max(jnp.where(grp, qe[:, None, :], 0), axis=2)
        tot_i = jnp.sum(jnp.where(grp, seeds.length[:, None, :], 0), axis=2)
        w_i = jnp.where(
            active, jnp.minimum(qend_i - qbeg_i, tot_i), -1
        )
        # deterministic pick: max weight, then lowest slot
        pick_key = w_i * jnp.int32(1 << 10) + (S - 1 - slot)[None, :]
        pick_key = jnp.where(active, pick_key, -1)
        best = jnp.argmax(pick_key, axis=1).astype(jnp.int32)  # (B,)
        bidx = jnp.arange(B)
        member = grp[bidx, best]                   # (B, S)
        # anchor = longest member seed (ties → lowest slot)
        apk = jnp.where(
            member, seeds.length * jnp.int32(1 << 10) + (S - 1 - slot), -1
        )
        aslot = jnp.argmax(apk, axis=1).astype(jnp.int32)
        ok = w_i[bidx, best] > 0
        outs.append((
            jnp.where(ok, seeds.rpos[bidx, aslot], -1),
            jnp.where(ok, seeds.qpos[bidx, aslot], 0),
            seeds.length[bidx, aslot],
            seeds.strand[bidx, aslot],
            jnp.where(ok, w_i[bidx, best], 0),
            ok,
            jnp.minimum(qbeg_i[bidx, best], BIGQ - 1),
            qend_i[bidx, best],
        ))
        active = active & ~member

    stack = lambda i: jnp.stack([o[i] for o in outs], axis=1)
    return Chains(
        anchor_rpos=stack(0),
        anchor_qpos=stack(1),
        anchor_len=stack(2),
        strand=stack(3),
        weight=stack(4),
        valid=stack(5),
        qspan_beg=stack(6),
        qspan_end=stack(7),
    )
