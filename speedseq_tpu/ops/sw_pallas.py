"""Pallas TPU kernel: batched local affine-gap Smith-Waterman.

The aligner's speed-of-light inner loop (SURVEY.md §7 milestone A).  The
whole per-row DP — substitution scores, vertical gap state, the
prefix-max horizontal (deletion) state, best-cell tracking and packed
traceback direction bits — runs inside one kernel launch with all state
in VMEM/registers, instead of ~100 XLA scan steps each re-touching HBM.

The DP is BANDED in a moving diagonal frame: at query row i only ref
columns j ∈ [i, i+BAND) can hold a live alignment (window anchoring
guarantees the start offset ≤ PAD+16 = 60 and deletions are capped at
MAX_DEL = 64, so 60+64 < BAND = 128; align/core.py PAD).  Band state is
indexed by c = j - i, which makes the diagonal move a NO-OP (H_prev[c]
IS the diagonal neighbor), the vertical move a left-rotate, and the
in-row deletion prefix-max identical to the unbanded form — and halves
the vector width from the 256-column ref window to 128 lanes.

Layout notes (Mosaic constraints shaped this):
- LANES queries per grid program on the sublane axis; band on the
  128-wide lane axis — exactly one vreg column tile.
- query bases and per-lane lengths live in SMEM; per-row query bases are
  splatted into (LANES, BAND) registers via scalar selects (dynamic
  lane-dim vector indexing and vector broadcasts are not legal).
- the per-row ref slice ref[i:i+BAND] comes from one dynamic lane
  rotate of the (LANES, Lr) ref registers.
- best-cell tracking stays full-width and reduces once at the end,
  packed as (score, smallest i, smallest global j) to reproduce XLA
  argmax tie-breaking.

Packed direction byte per cell: bits 0-1 = H source (0 stop, 1 diag,
2 ins, 3 del), bit 2 = insertion-run continue, bit 3 = deletion-run
continue, bit 4 = mismatch (cigar kernel only).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 64         # queries per grid program (sublane dim).  Measured on
# the target chip (docs/PERF_NOTES.md): 8→235 ms, 16→150, 32→110, 64→88 ms
# per 16,384 (112×256) cigar lanes; 128 exceeds the VMEM dirs scratch.
# Outputs are LANES-invariant (verified bit-equal 8 vs 64).
BAND = 128         # diagonal band width (c = j - i ∈ [0, BAND))
MAX_DEL = 64       # deletion-state scan window: the prefix-max over the
# row is capped at 64 columns (6 roll steps) — exact for all deletions
# that fit the ±PAD ref-window slack (align/core.py); longer in-read
# deletions fall to the soft-clip/split path, as with bwa's band cap
# [external knowledge]
NEG = -(10 ** 6)


def _row_ops(i, H, V, ref, qc, qlen_full, p_match, p_mis, p_open, p_ext,
             Lq, Lr):
    """One banded DP row shared by both kernels.  H/V are the previous
    row in ITS band frame; returns (Hn, Vn, Ht-parts for dirs)."""
    oe = p_open + p_ext
    col = jax.lax.broadcasted_iota(jnp.int32, (LANES, BAND), 1)  # c
    # ref slice for this row: refw[c] = ref[i + c]
    shift = jax.lax.rem(Lr - i, Lr)
    refw = pltpu.roll(ref, shift, 1)[:, :BAND]
    refw = jnp.where(i + col < Lr, refw, jnp.int32(4))
    q_ok = qc < 4
    r_ok = refw < 4
    is_match = q_ok & r_ok & (refw == qc)
    sub = jnp.where(q_ok & r_ok, jnp.where(is_match, p_match, -p_mis),
                    jnp.int32(-1))
    # diagonal: H[i-1][j-1] lands at the SAME band index c
    diag = H + sub
    # vertical: H/V[i-1][j] sit at band index c+1 of the previous row
    # (left-rotate by 1 == right-rotate by BAND-1; pltpu.roll wants ≥ 0)
    Hv = jnp.where(col == BAND - 1, NEG, pltpu.roll(H, BAND - 1, 1))
    Vv = jnp.where(col == BAND - 1, NEG, pltpu.roll(V, BAND - 1, 1))
    Vn = jnp.maximum(Vv - p_ext, Hv - oe)
    vext = (Vv - p_ext >= Hv - oe).astype(jnp.int32)
    Ht = jnp.maximum(jnp.maximum(diag, Vn), 0)
    # deletion state within the row: F[c] = prefmax_{<c}(Ht + e·c) - o - e·c
    # (the e·i global-shift cancels, so band coords work unchanged)
    m = Ht + p_ext * col
    x = m
    s = 1
    while s < min(BAND, MAX_DEL):
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
    valid_row = i < qlen_full
    Hn = jnp.where(valid_row, Hn, 0)
    Vn = jnp.where(valid_row, Vn, NEG)
    return col, Hn, Vn, d, vext, fext, is_match, valid_row


def _mk_kernel(Lq: int, Lqp: int, Lr: int, params):
    """Score-only banded DP (no traceback state)."""
    p_match, p_mis, p_open, p_ext = params

    def kernel(qlen_ref, q_ref, ref_ref, score_ref, qend_ref, rend_ref,
               gscore_ref, grend_ref):
        ref = ref_ref[:].astype(jnp.int32)            # (LANES, Lr)
        q_all = q_ref[:].astype(jnp.int32)            # (LANES, Lqp) VMEM

        def splat(read_scalar):
            row_id = jax.lax.broadcasted_iota(jnp.int32, (LANES, BAND), 0)
            acc = jax.lax.broadcasted_iota(jnp.int32, (LANES, BAND), 1) * 0
            for l in range(LANES):
                acc = jnp.where(row_id == l, read_scalar(l), acc)
            return acc

        qlen_full = splat(lambda l: qlen_ref[l, 0])

        def body(i, carry):
            H = carry[0:LANES]
            V = carry[LANES : 2 * LANES]
            best = carry[2 * LANES : 3 * LANES]
            gbest = carry[3 * LANES : 4 * LANES]
            # q[:, i] via one lane-roll + lane-broadcast — the previous
            # per-row splat was 64 full-vector selects PER ROW (the
            # single biggest cost of the whole kernel)
            qc1 = pltpu.roll(q_all, jax.lax.rem(Lqp - i, Lqp), 1)[:, :1]
            qc = jnp.broadcast_to(qc1, (LANES, BAND))
            col, Hn, Vn, d, vext, fext, is_match, valid_row = _row_ops(
                i, H, V, ref, qc, qlen_full, p_match, p_mis, p_open, p_ext,
                Lq, Lr)
            jg = i + col                               # global ref column
            cand = (Hn * (Lq + 1) + (Lq - i)) * Lr + (Lr - 1 - jg)
            best = jnp.maximum(best, cand)
            gpk = Hn * Lr + (Lr - 1 - jg)
            gbest = jnp.where(i == qlen_full - 1, gpk, gbest)
            return jnp.concatenate([Hn, Vn, best, gbest], axis=0)

        z = jax.lax.broadcasted_iota(jnp.int32, (LANES, BAND), 1) * 0
        carry0 = jnp.concatenate([z, z + NEG, z, z], axis=0)
        carry_f = jax.lax.fori_loop(0, Lq, body, carry0)
        best = jnp.max(carry_f[2 * LANES : 3 * LANES], axis=1, keepdims=True)
        gbest = jnp.max(carry_f[3 * LANES : 4 * LANES], axis=1, keepdims=True)
        rem = best % ((Lq + 1) * Lr)
        score_ref[:] = best // ((Lq + 1) * Lr)
        qend_ref[:] = Lq - rem // Lr + 1
        rend_ref[:] = Lr - 1 - rem % Lr + 1
        gscore_ref[:] = gbest // Lr
        grend_ref[:] = Lr - 1 - gbest % Lr + 1

    return kernel


def _mk_cigar_kernel(Lq: int, Lqp: int, Lr: int, params, max_ops: int):
    """Banded DP + in-kernel traceback: directions stay in a VMEM scratch
    (never HBM) indexed (i, lane, c), the backtrack walk runs on the
    scalar core, and the cigar comes out as SMEM scalars — one launch
    replaces the Lq+Lr-iteration XLA traceback loop of
    align/sw.py:_traceback_packed (~190 ms → ~25 ms per 8k batch,
    docs/PERF_NOTES.md)."""
    p_match, p_mis, p_open, p_ext = params

    def kernel(qlen_ref, q_ref, ref_ref, score_ref, qend_ref, rend_ref,
               gscore_ref, grend_ref, ops_ref, lens_ref, nops_ref,
               qbeg_ref, rbeg_ref, nm_ref, dirs_ref):
        ref = ref_ref[:].astype(jnp.int32)            # (LANES, Lr)
        q_all = q_ref[:].astype(jnp.int32)            # (LANES, Lqp) VMEM

        def splat(read_scalar):
            row_id = jax.lax.broadcasted_iota(jnp.int32, (LANES, BAND), 0)
            acc = jax.lax.broadcasted_iota(jnp.int32, (LANES, BAND), 1) * 0
            for l in range(LANES):
                acc = jnp.where(row_id == l, read_scalar(l), acc)
            return acc

        qlen_full = splat(lambda l: qlen_ref[l, 0])

        def body(i, carry):
            H = carry[0:LANES]
            V = carry[LANES : 2 * LANES]
            best = carry[2 * LANES : 3 * LANES]
            gbest = carry[3 * LANES : 4 * LANES]
            runs = carry[4 * LANES : 5 * LANES]
            misrun = carry[5 * LANES : 6 * LANES]
            qc1 = pltpu.roll(q_all, jax.lax.rem(Lqp - i, Lqp), 1)[:, :1]
            qc = jnp.broadcast_to(qc1, (LANES, BAND))
            col, Hn, Vn, d, vext, fext, is_match, valid_row = _row_ops(
                i, H, V, ref, qc, qlen_full, p_match, p_mis, p_open, p_ext,
                Lq, Lr)
            mis = (~is_match).astype(jnp.int32)
            # diagonal-run bookkeeping: a diag move stays at the SAME band
            # column c, so run length / run mismatches are plain recurrent
            # updates — the traceback jumps whole match runs in one step
            # instead of walking ~Lq cells serially per lane
            is_d = d == 1
            runs_n = jnp.where(is_d, jnp.minimum(runs + 1, 127), 0)
            misrun_n = jnp.where(is_d, jnp.minimum(misrun + mis, 127), 0)
            packed = (
                d | (vext << 2) | (fext << 3)
                | (mis << 4)                  # bit 4: mismatch
                | (runs_n << 5)               # bits 5-11: diag run length
                | (misrun_n << 12)            # bits 12-18: run mismatches
            )
            packed = jnp.where(valid_row, packed, 0)
            dirs_ref[pl.ds(i, 1), :, :] = packed[None]
            jg = i + col
            cand = (Hn * (Lq + 1) + (Lq - i)) * Lr + (Lr - 1 - jg)
            best = jnp.maximum(best, cand)
            gpk = Hn * Lr + (Lr - 1 - jg)
            gbest = jnp.where(i == qlen_full - 1, gpk, gbest)
            return jnp.concatenate(
                [Hn, Vn, best, gbest, runs_n, misrun_n], axis=0)

        z = jax.lax.broadcasted_iota(jnp.int32, (LANES, BAND), 1) * 0
        carry0 = jnp.concatenate([z, z + NEG, z, z, z, z], axis=0)
        carry_f = jax.lax.fori_loop(0, Lq, body, carry0)
        best = jnp.max(carry_f[2 * LANES : 3 * LANES], axis=1, keepdims=True)
        gbest = jnp.max(carry_f[3 * LANES : 4 * LANES], axis=1, keepdims=True)
        rem = best % ((Lq + 1) * Lr)
        score_v = best // ((Lq + 1) * Lr)
        qend_v = Lq - rem // Lr + 1
        rend_v = Lr - 1 - rem % Lr + 1
        score_ref[:] = score_v
        qend_ref[:] = qend_v
        rend_ref[:] = rend_v
        gscore_ref[:] = gbest // Lr
        grend_ref[:] = Lr - 1 - gbest % Lr + 1

        # ---- per-lane scalar traceback over the VMEM dirs scratch --------
        # walk state is (i, j) in GLOBAL coords; the dirs cell for (i, j)
        # sits at band column c = j - i
        for l in range(LANES):
            bi = qend_v[l, 0] - 1
            bj = rend_v[l, 0] - 1

            def cond(st):
                i, j, mode, kop, cur_op, cur_len, nm, done, steps = st
                return (done == 0) & (steps < Lq + Lr)

            def step(st):
                i, j, mode, kop, cur_op, cur_len, nm, done, steps = st
                ii = jnp.clip(i, 0, Lq - 1)
                cc = jnp.clip(j - i, 0, BAND - 1)
                # dynamic lane-dim scalar loads are not legal in Mosaic —
                # load the (1, BAND) row and extract via masked reduce
                rowv = dirs_ref[ii, pl.ds(l, 1), :]        # (1, BAND)
                colv = jax.lax.broadcasted_iota(jnp.int32, (1, BAND), 1)
                p = jnp.sum(jnp.where(colv == cc, rowv, 0))
                d = p & 3
                ve = (p >> 2) & 1
                fe = (p >> 3) & 1
                oob = (i < 0) | (j < 0) | (j - i < 0) | (j - i >= BAND)
                d_eff = jnp.where(
                    mode == 1, 2,
                    jnp.where(mode == 2, 3, jnp.where(oob, 0, d)))
                fin = d_eff == 0
                op = jnp.where(d_eff == 1, 0, jnp.where(d_eff == 2, 1, 2))
                # diag moves jump the WHOLE run recorded in bits 5-11 (same
                # band column → precomputed in the DP), with the run's
                # mismatch count in bits 12-18
                step_len = jnp.where(
                    d_eff == 1, jnp.maximum((p >> 5) & 127, 1), 1)
                nm_add = jnp.where(d_eff == 1, (p >> 12) & 127, 1)
                # flush previous run when op changes
                change = (~fin) & (cur_len > 0) & (op != cur_op)
                kflush = jnp.clip(kop, 0, max_ops - 1)
                @pl.when(change | (fin & (cur_len > 0)))
                def _():
                    ops_ref[l, kflush] = cur_op
                    lens_ref[l, kflush] = cur_len
                kop2 = jnp.where(change | (fin & (cur_len > 0)), kop + 1, kop)
                cur_op2 = jnp.where(fin, cur_op, op)
                cur_len2 = jnp.where(
                    fin, 0, jnp.where(change, step_len, cur_len + step_len))
                nm2 = jnp.where(fin, nm, nm + nm_add)
                is_diag = (~fin) & (d_eff == 1)
                is_vert = (~fin) & (d_eff == 2)
                is_horiz = (~fin) & (d_eff == 3)
                i2 = jnp.where(
                    is_diag, i - step_len, jnp.where(is_vert, i - 1, i))
                j2 = jnp.where(
                    is_diag, j - step_len, jnp.where(is_horiz, j - 1, j))
                mode2 = jnp.where(
                    is_vert & (ve == 1), 1,
                    jnp.where(is_horiz & (fe == 1), 2, 0))
                mode2 = jnp.where(fin, mode, mode2)
                return (i2, j2, mode2, kop2, cur_op2, cur_len2, nm2,
                        jnp.where(fin, 1, 0), steps + 1)

            z32 = jnp.int32(0)
            st = (bi, bj, z32, z32, jnp.int32(-1), z32, z32, z32, z32)
            i_f, j_f, _, kop_f, _, _, nm_f, _, _ = jax.lax.while_loop(
                cond, step, st)
            n = jnp.clip(kop_f, 0, max_ops)
            nops_ref[l, 0] = n
            qbeg_ref[l, 0] = i_f + 1
            rbeg_ref[l, 0] = j_f + 1
            nm_ref[l, 0] = nm_f

            # reverse ops/lens[0:n] in place (walk emitted end→start)
            def rev(t, _):
                a = t
                b = n - 1 - t
                @pl.when(a < b)
                def _():
                    oa = ops_ref[l, a]
                    ob = ops_ref[l, b]
                    la = lens_ref[l, a]
                    lb = lens_ref[l, b]
                    ops_ref[l, a] = ob
                    ops_ref[l, b] = oa
                    lens_ref[l, a] = lb
                    lens_ref[l, b] = la
                return 0
            jax.lax.fori_loop(0, max_ops // 2, rev, 0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("params", "max_ops", "interpret")
)
def sw_pallas_cigar(
    query: jnp.ndarray,   # (N, Lq) int32, N multiple of LANES
    qlen: jnp.ndarray,    # (N,) int32
    ref: jnp.ndarray,     # (N, Lr) int32, Lr ≤ 256 (multiple of 128)
    params: Tuple[int, int, int, int] = (1, 4, 6, 1),
    max_ops: int = 48,
    interpret: bool = False,
):
    """Banded DP + traceback in one launch.  Returns (score, qbeg, qend,
    rbeg, rend, gscore, grend, ops, lens, n_ops, nm); ops/lens are
    (N, max_ops) int32 in alignment order (no clips), valid up to n_ops.
    Alignments are found within the diagonal band j - i ∈ [0, 128) —
    exactly the windows align/core.py anchors (see module docstring)."""
    N, Lq = query.shape
    Lr = ref.shape[1]
    assert N % LANES == 0 and Lr <= 256
    Lqp = ((Lq + 127) // 128) * 128       # 128-lane pad for the roll
    qpad = jnp.pad(query.astype(jnp.int32), ((0, 0), (0, Lqp - Lq)),
                   constant_values=4)
    grid = (N // LANES,)
    vm = lambda: pl.BlockSpec((LANES, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    sm = lambda w: pl.BlockSpec((LANES, w), lambda i: (i, 0), memory_space=pltpu.SMEM)
    out_shape = [jax.ShapeDtypeStruct((N, 1), jnp.int32) for _ in range(5)]
    out_specs = [vm() for _ in range(5)]
    out_shape += [
        jax.ShapeDtypeStruct((N, max_ops), jnp.int32),  # ops
        jax.ShapeDtypeStruct((N, max_ops), jnp.int32),  # lens
        jax.ShapeDtypeStruct((N, 1), jnp.int32),        # n_ops
        jax.ShapeDtypeStruct((N, 1), jnp.int32),        # qbeg
        jax.ShapeDtypeStruct((N, 1), jnp.int32),        # rbeg
        jax.ShapeDtypeStruct((N, 1), jnp.int32),        # nm
    ]
    out_specs += [sm(max_ops), sm(max_ops), sm(1), sm(1), sm(1), sm(1)]
    outs = pl.pallas_call(
        _mk_cigar_kernel(Lq, Lqp, Lr, params, max_ops),
        grid=grid,
        in_specs=[
            pl.BlockSpec((LANES, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((LANES, Lqp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, Lr), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((Lq, LANES, BAND), jnp.int32)],
        interpret=interpret,
    )(
        qlen[:, None].astype(jnp.int32),
        qpad,
        ref.astype(jnp.int32),
    )
    (score, qend, rend, gscore, grend,
     ops, lens, n_ops, qbeg, rbeg, nm) = outs
    return (
        score[:, 0], qbeg[:, 0], qend[:, 0], rbeg[:, 0], rend[:, 0],
        gscore[:, 0], grend[:, 0], ops, lens, n_ops[:, 0], nm[:, 0],
    )


@functools.partial(
    jax.jit, static_argnames=("params", "interpret")
)
def sw_pallas(
    query: jnp.ndarray,   # (N, Lq) int32, N multiple of LANES
    qlen: jnp.ndarray,    # (N,) int32
    ref: jnp.ndarray,     # (N, Lr) int32, Lr ≤ 256 (multiple of 128)
    params: Tuple[int, int, int, int] = (1, 4, 6, 1),
    interpret: bool = False,
):
    """Run the banded score-only DP kernel.  Returns (score, qend, rend,
    gscore, grend)."""
    N, Lq = query.shape
    Lr = ref.shape[1]
    assert N % LANES == 0 and Lr <= 256
    Lqp = ((Lq + 127) // 128) * 128
    qpad = jnp.pad(query.astype(jnp.int32), ((0, 0), (0, Lqp - Lq)),
                   constant_values=4)
    grid = (N // LANES,)
    out_shape = [
        jax.ShapeDtypeStruct((N, 1), jnp.int32)  # score/qend/rend/gscore/grend
        for _ in range(5)
    ]
    out_specs = [
        pl.BlockSpec((LANES, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(5)
    ]
    outs = pl.pallas_call(
        _mk_kernel(Lq, Lqp, Lr, params),
        grid=grid,
        in_specs=[
            pl.BlockSpec((LANES, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((LANES, Lqp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, Lr), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        out_specs=out_specs,
        interpret=interpret,
    )(
        qlen[:, None].astype(jnp.int32),
        qpad,
        ref.astype(jnp.int32),
    )
    score, qend, rend, gscore, grend = [o[:, 0] for o in outs[:5]]
    return score, qend, rend, gscore, grend
