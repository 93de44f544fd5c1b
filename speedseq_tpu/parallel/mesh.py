"""Mesh construction + sharded alignment step.

Replaces the reference's process-level parallelism (GNU parallel -j,
bin/speedseq:449,719) with a ``jax.sharding.Mesh`` data axis: read batches
are sharded over devices, the FM-index is replicated, per-shard stats
reduce with ``psum`` over ICI.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.fm import FMIndex
from ..align.core import Candidates, align_candidates
from ..align.sw import SWParams


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
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


class AlignStepStats(NamedTuple):
    n_aligned: jnp.ndarray   # () int32, global (psum over mesh)
    total_score: jnp.ndarray


def distributed_align_step(
    mesh: Mesh,
    fm: FMIndex,
    reads: jnp.ndarray,
    lengths: jnp.ndarray,
    n_chains: int = 4,
    axis: str = "data",
) -> Tuple[Candidates, AlignStepStats]:
    """One data-parallel alignment step over the mesh.

    reads/lengths sharded on the batch dim; fm replicated; returns
    per-shard candidates (still sharded) + psum-reduced global stats.
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(axis), P()),
    )
    def step(fm_, reads_, lengths_):
        cand = align_candidates(fm_, reads_, lengths_, n_chains=n_chains)
        best = jnp.max(cand.score, axis=1)
        stats = AlignStepStats(
            n_aligned=jax.lax.psum(
                jnp.sum((best >= 30).astype(jnp.int32)), axis
            ),
            total_score=jax.lax.psum(jnp.sum(best), axis),
        )
        return cand, stats

    fm_r = replicate(mesh, fm)
    reads_s, lengths_s = shard_batch(mesh, reads, lengths, axis=axis)
    return step(fm_r, reads_s, lengths_s)
