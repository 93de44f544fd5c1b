"""Mesh construction + the sharded production alignment step.

Replaces the reference's process-level parallelism (GNU parallel -j,
bin/speedseq:449,719) with a ``jax.sharding.Mesh`` data axis: read batches
are sharded over devices, the FM/k-mer indexes are replicated, per-shard
aligned-read counts reduce with ``psum`` over ICI.

The sharded step IS the production step: ``align.core.fused_align_packed``
(weight phase-1 → joint pair selection → split detection → phase-2
extension → packed outputs), so a multi-chip run exercises exactly the
same device graph as the single-chip pipeline and produces identical
records (tests/test_backend.py asserts 1-device vs 8-device equality).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.fm import FMIndex
from ..align.core import fused_align_packed


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    # LOCAL devices only: the multi-host design shards work per process
    # (host-exchange global state), so meshes must never span another
    # process's non-addressable devices under jax.distributed
    devs = jax.local_devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, *arrays, axis: str = "data"):
    """Place host arrays with batch dim sharded over the mesh axis."""
    out = []
    for a in arrays:
        spec = P(axis, *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out) if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. the FM-index) across the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


_step_cache: dict = {}


def _build_step(mesh: Mesh, axis: str, paired: bool, n_chains: int,
                min_seed_len: int, use_pallas: bool, has_kidx: bool):
    """Compile-cached shard_map'd fused step for one (mesh, config)."""
    key = (mesh, axis, paired, n_chains, min_seed_len, use_pallas, has_kidx)
    fn = _step_cache.get(key)
    if fn is not None:
        return fn

    E = 2 if paired else 1
    reads_specs = (P(axis), P(axis)) * E

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()) + reads_specs,
        out_specs=(
            P(None, None, axis),   # meta    (E, 11, B, S)
            P(None, axis),         # cigar16 (E, B, S, CIGAR_HEAD)
            P(None, axis),         # cigar   (E, B, S, MAX_OPS)
            P(),                   # overflow (pmax-reduced scalar)
            P(None, None, axis),   # stats   (E, 4, B, K)
            P(None, None, axis),   # xa_meta (E, 9, C)
            P(None, axis),         # xa_cig  (E, C, CIGAR_HEAD)
            P(),                   # n_aligned (psum-reduced scalar)
        ),
    )
    def step(fm_, kidx_, distro_, r1, l1, *rest):
        r2, l2 = (rest[0], rest[1]) if paired else (None, None)
        meta, cig16, cigar, overflow, stats, xa_meta, xa_cig = (
            fused_align_packed(
                fm_, r1, l1, r2, l2, distro=distro_,
                n_chains=n_chains, min_seed_len=min_seed_len,
                use_pallas=use_pallas, paired=paired,
                kidx=kidx_ if has_kidx else None,
            ))
        # XA lanes carry shard-local read rows: rebase to global batch rows
        base = jax.lax.axis_index(axis).astype(jnp.int32) * r1.shape[0]
        ri = xa_meta[:, 0]
        xa_meta = xa_meta.at[:, 0].set(jnp.where(ri >= 0, ri + base, -1))
        overflow = jax.lax.pmax(overflow, axis)
        # global aligned-read count over ICI (the reference's analog is
        # each pipe reporting to the driver's stdout); meta row 3 packs
        # strand<<16|score (core.fused_align_packed layout)
        n_aligned = jax.lax.psum(
            jnp.sum(((meta[:, 3, :, 0] & 0xFFFF) >= 30).astype(jnp.int32)),
            axis,
        )
        return meta, cig16, cigar, overflow, stats, xa_meta, xa_cig, n_aligned

    fn = jax.jit(step)
    _step_cache[key] = fn
    return fn


def distributed_fused_step(
    mesh: Mesh,
    fm: FMIndex,
    reads1: jnp.ndarray,
    lengths1: jnp.ndarray,
    reads2: Optional[jnp.ndarray] = None,
    lengths2: Optional[jnp.ndarray] = None,
    distro: Optional[jnp.ndarray] = None,
    kidx=None,
    n_chains: int = 4,
    min_seed_len: int = 19,
    use_pallas: bool = False,
    axis: str = "data",
):
    """One data-parallel production alignment step over the mesh.

    reads/lengths sharded on the batch dim (must divide the mesh size);
    fm/kidx/distro replicated.  Returns (meta, cigar16, cigar, overflow,
    stats, n_aligned) with the same packed layout as
    ``fused_align_packed`` — the host epilogue is shard-count agnostic.
    """
    paired = reads2 is not None
    if distro is None:
        distro = jnp.asarray([300.0, 100.0, 50.0, 700.0], jnp.float32)
    n_dev = mesh.devices.size
    assert reads1.shape[0] % n_dev == 0, (
        f"batch {reads1.shape[0]} not divisible by mesh size {n_dev}"
    )
    step = _build_step(
        mesh, axis, paired, n_chains, min_seed_len, use_pallas,
        kidx is not None,
    )
    args = (fm, kidx, distro, reads1, lengths1)
    if paired:
        args += (reads2, lengths2)
    return step(*args)


# ---------------------------------------------------------------------------
# device coordinate re-shard (SURVEY §2.3: "per-shard alignment results →
# all-to-all for coordinate re-sharding")
# ---------------------------------------------------------------------------

KEY_SENTINEL = np.int64(2 ** 62)


def coordinate_reshard(
    mesh: Mesh,
    keys: np.ndarray,        # (n_dev, n_local) int64 sort keys, SENTINEL pad
    rows: np.ndarray,        # (n_dev, n_local, W) int64 payload columns
    boundaries: np.ndarray,  # (n_dev - 1,) int64 range upper bounds
    cap: Optional[int] = None,
    axis: str = "data",
):
    """All-to-all re-shard of (key, payload-row) pairs to their genome-
    range owner shard — the ICI counterpart of the reference's
    files+sort global exchange (bin/speedseq:800-806) and of the
    process-level ``FileExchange.alltoall`` path (the fixed-width key /
    payload columns ride ``jax.lax.all_to_all`` collectives; record
    BYTES stay host-side and follow via the host transport keyed by the
    same routing).

    Returns (recv_keys (n_dev, n_dev, cap), recv_rows (…, W),
    recv_counts (n_dev, n_dev)): entry [d, p] = what shard d received
    from shard p, in shard-p intake order.  ``cap`` bounds the per
    (src, dst) bucket; overflow beyond cap is dropped and visible via
    recv_counts (callers size cap for their skew)."""
    n_dev = mesh.devices.size
    n_local = keys.shape[1]
    if cap is None:
        cap = n_local
    W = rows.shape[2]
    # the app runs 32-bit JAX; sort keys are genuine 64-bit
    # (tid<<33|pos<<1|rev plus the sentinel) so this program opts into
    # x64 locally
    enable_x64 = jax.enable_x64

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None, None), P()),
        out_specs=(P(axis, None, None), P(axis, None, None, None),
                   P(axis, None)),
    )
    def _kernel(k, r, b):
        k = k[0]                              # (n_local,)
        r = r[0]                              # (n_local, W)
        n = k.shape[0]
        tgt = jnp.searchsorted(b, k, side="right").astype(jnp.int32)
        live = k < KEY_SENTINEL
        tgt = jnp.where(live, tgt, n_dev)     # sentinel rows target "none"
        order = jnp.argsort(tgt, stable=True)
        tgt_s = tgt[order]
        counts = jnp.bincount(tgt_s, length=n_dev + 1)[:n_dev]
        starts = jnp.concatenate(
            [jnp.zeros(1, counts.dtype), jnp.cumsum(counts)])
        rank = jnp.arange(n) - starts[jnp.minimum(tgt_s, n_dev - 1)]
        ok = (tgt_s < n_dev) & (rank < cap)
        send_k = jnp.full((n_dev, cap), KEY_SENTINEL, jnp.int64)
        send_r = jnp.zeros((n_dev, cap, W), jnp.int64)
        # not-ok rows get out-of-bounds indices → scatter-dropped (an
        # in-bounds dummy index would race real writes at that slot)
        d_i = jnp.where(ok, tgt_s, n_dev)
        c_i = jnp.where(ok, rank, cap)
        send_k = send_k.at[d_i, c_i].set(k[order], mode="drop")
        send_r = send_r.at[d_i, c_i].set(r[order], mode="drop")
        send_c = jnp.minimum(counts, cap).astype(jnp.int32)
        recv_k = jax.lax.all_to_all(send_k, axis, 0, 0, tiled=True)
        recv_r = jax.lax.all_to_all(send_r, axis, 0, 0, tiled=True)
        recv_c = jax.lax.all_to_all(send_c, axis, 0, 0, tiled=True)
        return (recv_k.reshape(1, n_dev, cap),
                recv_r.reshape(1, n_dev, cap, W),
                recv_c.reshape(1, n_dev))

    with enable_x64():
        return jax.jit(_kernel)(
            jnp.asarray(keys, jnp.int64), jnp.asarray(rows, jnp.int64),
            jnp.asarray(boundaries, jnp.int64))
