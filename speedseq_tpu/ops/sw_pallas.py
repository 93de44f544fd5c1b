"""Pallas TPU kernel: batched local affine-gap Smith-Waterman.

The aligner's speed-of-light inner loop (SURVEY.md §7 milestone A).  The
whole per-row DP — substitution scores, vertical gap state, the
prefix-max horizontal (deletion) state, best-cell tracking and packed
traceback direction bits — runs inside one kernel launch with all state
in VMEM/registers, instead of ~100 XLA scan steps each re-touching HBM.

Layout notes (Mosaic constraints shaped this):
- 8 query lanes per grid program on the sublane axis; ref window on the
  128-wide lane axis (Lr ≤ 256).
- query bases and per-lane lengths live in SMEM; per-row query bases are
  splatted into (8, Lr) registers via scalar selects (dynamic lane-dim
  vector indexing and (8,1)→(8,Lr) vector broadcasts are not legal).
- best-cell tracking stays full-width (8, Lr) and reduces once at the
  end, packed as (score, smallest i, smallest j) to reproduce XLA
  argmax tie-breaking.

Packed direction byte per cell: bits 0-1 = H source (0 stop, 1 diag,
2 ins, 3 del), bit 2 = insertion-run continue, bit 3 = deletion-run
continue; align/sw.py walks these in its batched traceback.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 8          # queries per grid program (sublane dim)
NEG = -(10 ** 6)


def _mk_kernel(Lq: int, Lr: int, params, with_dirs: bool):
    p_match, p_mis, p_open, p_ext = params
    oe = p_open + p_ext

    def kernel(qlen_ref, q_ref, ref_ref, *out_refs):
        if with_dirs:
            (score_ref, qend_ref, rend_ref, gscore_ref, grend_ref,
             dirs_ref) = out_refs
        else:
            (score_ref, qend_ref, rend_ref, gscore_ref, grend_ref) = out_refs
        ref = ref_ref[:].astype(jnp.int32)            # (8, Lr)

        def splat(read_scalar):
            """Per-lane scalars → (8, Lr) via 8 scalar selects.

            Seeded from an iota-derived zero so the result carries a
            natural (non-replicated) vector layout — Mosaic rejects
            replicated operands in the downstream roll/select chain.
            """
            row_id = jax.lax.broadcasted_iota(jnp.int32, (LANES, Lr), 0)
            acc = jax.lax.broadcasted_iota(jnp.int32, (LANES, Lr), 1) * 0
            for l in range(LANES):
                acc = jnp.where(row_id == l, read_scalar(l), acc)
            return acc

        qlen_full = splat(lambda l: qlen_ref[l, 0])   # (8, Lr)

        def body(i, carry):
            # carry is ONE (4*LANES, Lr) array: tuple carries holding
            # rolled vectors trip a Mosaic layout-unification bug
            H = carry[0:LANES]
            V = carry[LANES : 2 * LANES]
            best = carry[2 * LANES : 3 * LANES]
            gbest = carry[3 * LANES : 4 * LANES]
            # iotas created inside the loop body: capturing them from the
            # enclosing region gives them layouts Mosaic cannot unify
            # with the roll/select chain below
            col = jax.lax.broadcasted_iota(jnp.int32, (LANES, Lr), 1)
            qc = splat(lambda l: q_ref[l, i])         # (8, Lr) query base
            q_ok = qc < 4
            r_ok = ref < 4
            sub = jnp.where(
                q_ok & r_ok,
                jnp.where(ref == qc, p_match, -p_mis),
                jnp.int32(-1),
            )
            Hs = pltpu.roll(H, 1, 1)
            Hs = jnp.where(col == 0, 0, Hs)           # boundary column
            diag = Hs + sub
            Vn = jnp.maximum(V - p_ext, H - oe)
            vext = (V - p_ext >= H - oe).astype(jnp.int32)
            Ht = jnp.maximum(jnp.maximum(diag, Vn), 0)
            # deletion state: F[j] = prefmax_{<j}(Ht + e·col) - o - e·j
            m = Ht + p_ext * col
            x = m
            s = 1
            while s < Lr:
                xs = pltpu.roll(x, s, 1)
                x = jnp.maximum(x, jnp.where(col >= s, xs, NEG))
                s *= 2
            pm = pltpu.roll(x, 1, 1)
            pm = jnp.where(col == 0, NEG, pm)
            F = pm - p_open - p_ext * col
            Hn = jnp.maximum(Ht, F)
            pm_prev = jnp.where(col == 0, NEG, pltpu.roll(pm, 1, 1))
            fext = ((pm == pm_prev) & (col > 0)).astype(jnp.int32)
            d = jnp.zeros_like(Hn)
            d = jnp.where((Hn == F) & (Hn > 0), 3, d)
            d = jnp.where((Hn == Vn) & (Hn > 0), 2, d)
            d = jnp.where((Hn == diag) & (Hn > 0), 1, d)
            packed = d | (vext << 2) | (fext << 3)

            valid_row = i < qlen_full
            Hn = jnp.where(valid_row, Hn, 0)
            Vn = jnp.where(valid_row, Vn, NEG)
            packed = jnp.where(valid_row, packed, 0)
            if with_dirs:
                dirs_ref[pl.ds(i, 1), :, :] = packed.astype(jnp.uint8)[None]
            # (score, smallest i, smallest j) packing, reduced at the end
            cand = (Hn * (Lq + 1) + (Lq - i)) * Lr + (Lr - 1 - col)
            best = jnp.maximum(best, cand)
            gpk = Hn * Lr + (Lr - 1 - col)
            gbest = jnp.where(i == qlen_full - 1, gpk, gbest)
            return jnp.concatenate([Hn, Vn, best, gbest], axis=0)

        # iota-derived inits keep the loop-carry vector layouts natural
        # (splat-constant inits force a replicated carry layout that
        # Mosaic cannot reconcile with the body's roll/select chain)
        z = jax.lax.broadcasted_iota(jnp.int32, (LANES, Lr), 1) * 0
        carry0 = jnp.concatenate([z, z + NEG, z, z], axis=0)
        carry_f = jax.lax.fori_loop(0, Lq, body, carry0)
        best_f = carry_f[2 * LANES : 3 * LANES]
        gbest_f = carry_f[3 * LANES : 4 * LANES]
        best = jnp.max(best_f, axis=1, keepdims=True)      # (8, 1)
        gbest = jnp.max(gbest_f, axis=1, keepdims=True)
        rem = best % ((Lq + 1) * Lr)
        score_ref[:] = best // ((Lq + 1) * Lr)
        qend_ref[:] = Lq - rem // Lr + 1
        rend_ref[:] = Lr - 1 - rem % Lr + 1
        gscore_ref[:] = gbest // Lr
        grend_ref[:] = Lr - 1 - gbest % Lr + 1

    return kernel


@functools.partial(
    jax.jit, static_argnames=("params", "with_dirs", "interpret")
)
def sw_pallas(
    query: jnp.ndarray,   # (N, Lq) int32, N multiple of 8
    qlen: jnp.ndarray,    # (N,) int32
    ref: jnp.ndarray,     # (N, Lr) int32, Lr ≤ 256 (multiple of 128)
    params: Tuple[int, int, int, int] = (1, 4, 6, 1),
    with_dirs: bool = False,
    interpret: bool = False,
):
    """Run the DP kernel.  Returns (score, qend, rend, gscore, grend[,
    dirs_packed (Lq, N, Lr) uint8])."""
    N, Lq = query.shape
    Lr = ref.shape[1]
    assert N % LANES == 0 and Lr <= 256
    grid = (N // LANES,)
    out_shape = [
        jax.ShapeDtypeStruct((N, 1), jnp.int32)  # score/qend/rend/gscore/grend
        for _ in range(5)
    ]
    out_specs = [
        pl.BlockSpec((LANES, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(5)
    ]
    if with_dirs:
        out_shape.append(jax.ShapeDtypeStruct((Lq, N, Lr), jnp.uint8))
        out_specs.append(
            pl.BlockSpec(
                (Lq, LANES, Lr), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            )
        )
    outs = pl.pallas_call(
        _mk_kernel(Lq, Lr, params, with_dirs),
        grid=grid,
        in_specs=[
            pl.BlockSpec((LANES, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((LANES, Lq), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((LANES, Lr), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        out_specs=out_specs,
        interpret=interpret,
    )(
        qlen[:, None].astype(jnp.int32),
        query.astype(jnp.int32),
        ref.astype(jnp.int32),
    )
    score, qend, rend, gscore, grend = [o[:, 0] for o in outs[:5]]
    if with_dirs:
        return score, qend, rend, gscore, grend, outs[5]
    return score, qend, rend, gscore, grend
