"""Batched local affine-gap Smith-Waterman with full traceback (JAX).

The extension engine behind the aligner (BWA-MEM's ksw_extend role
[external knowledge]; the reference pins scoring via bwa defaults:
match 1, mismatch 4, gap open 6, gap extend 1).

Formulation chosen for the TPU vector unit: scan over query rows; within
a row the horizontal (deletion) gap state is an *exclusive prefix-max*
over the row, which is exact for affine gaps (a deletion opened from a
gap-derived cell is never optimal under concave gap costs) — so there is
no sequential inner loop over columns.  Traceback uses per-cell direction
codes plus the argmax source column of each deletion run, so D-runs are
replayed in one jump; insertion runs carry an extend bit (proper affine
state machine).

A Pallas fused kernel with the same contract lives in ops/sw_pallas.py;
this module is the portable reference implementation and the CPU test
path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

# CIGAR op codes (htslib sam.h): M=0 I=1 D=2 S=4
OP_M, OP_I, OP_D, OP_S = 0, 1, 2, 4

# plain int (weakly-typed in jnp ops): a module-level jnp.int32() would
# initialize the JAX backend at import time, before callers can pick a
# platform (parallel.multihost workers force CPU after import)
NEG = -(10**6)


class SWParams(NamedTuple):
    match: int = 1        # bwa -A
    mismatch: int = 4     # bwa -B
    gap_open: int = 6     # bwa -O
    gap_ext: int = 1      # bwa -E


class SWResult(NamedTuple):
    score: jnp.ndarray      # (N,) int32 best local score
    qbeg: jnp.ndarray       # (N,) int32 query start (inclusive)
    qend: jnp.ndarray       # (N,) int32 query end (exclusive)
    rbeg: jnp.ndarray       # (N,) int32 ref-window start (inclusive)
    rend: jnp.ndarray       # (N,) int32 ref-window end (exclusive)
    cigar_ops: jnp.ndarray  # (N, MAX_OPS) int8, -1 padding
    cigar_len: jnp.ndarray  # (N, MAX_OPS) int32
    n_ops: jnp.ndarray      # (N,) int32
    gscore: jnp.ndarray     # (N,) int32 best score reaching query end
    grend: jnp.ndarray      # (N,) int32 ref end (excl) of that global path


def _sub_scores(q: jnp.ndarray, r: jnp.ndarray, p: SWParams) -> jnp.ndarray:
    """Substitution score; any ambiguous base (4) scores -1 (bwa N rule)."""
    both = (q < 4) & (r < 4)
    return jnp.where(
        both,
        jnp.where(q == r, jnp.int32(p.match), jnp.int32(-p.mismatch)),
        jnp.int32(-1),
    )


def _pallas_ok() -> bool:
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("params", "max_ops"))
def _traceback_packed(
    dirs: jnp.ndarray,   # (Lq, N, Lr) uint8 packed direction bytes
    bi: jnp.ndarray,     # (N,) best row (0-based)
    bj: jnp.ndarray,     # (N,) best col (0-based)
    params: SWParams = SWParams(),
    max_ops: int = 48,
):
    """Batched traceback over the Pallas kernel's packed direction bytes.

    bits 0-1: H source (0 stop/1 diag/2 ins/3 del); bit 2: I-run
    continues upward; bit 3: D-run continues leftward.  Every iteration
    consumes exactly one query or ref base → Lq+Lr bound.
    """
    Lq, N, Lr = dirs.shape
    lanes = jnp.arange(N)
    zvec = bi * 0
    ops0 = jnp.full((N, max_ops), jnp.int8(-1)) + zvec[:, None].astype(jnp.int8)
    lens0 = jnp.zeros((N, max_ops), jnp.int32) + zvec[:, None]

    def body(_, state):
        i, j, mode, kop, ops, lens, done = state
        ii = jnp.clip(i, 0, Lq - 1)
        jj = jnp.clip(j, 0, Lr - 1)
        p = dirs[ii, lanes, jj].astype(jnp.int32)
        d = p & 3
        ve = (p >> 2) & 1
        fe = (p >> 3) & 1
        oob = (i < 0) | (j < 0)
        d_eff = jnp.where(
            mode == 1, 2, jnp.where(mode == 2, 3, jnp.where(oob, 0, d))
        )
        now_done = (d_eff == 0) | done
        is_diag = (d_eff == 1) & ~now_done
        is_vert = (d_eff == 2) & ~now_done
        is_horiz = (d_eff == 3) & ~now_done
        op = jnp.where(
            is_diag, jnp.int8(OP_M),
            jnp.where(is_vert, jnp.int8(OP_I), jnp.int8(OP_D)),
        )
        prev_k = jnp.clip(kop - 1, 0, max_ops - 1)
        prev_op = ops[lanes, prev_k]
        merge = (kop > 0) & (prev_op == op) & ~now_done
        write_k = jnp.where(merge, prev_k, jnp.clip(kop, 0, max_ops - 1))
        ops = ops.at[lanes, write_k].set(
            jnp.where(now_done, ops[lanes, write_k], op)
        )
        lens = lens.at[lanes, write_k].add(jnp.where(now_done, 0, 1))
        kop = jnp.where(now_done | merge, kop, kop + 1)
        mode2 = jnp.where(
            is_vert & (ve == 1), 1, jnp.where(is_horiz & (fe == 1), 2, 0)
        )
        i2 = jnp.where(is_diag | is_vert, i - 1, i)
        j2 = jnp.where(is_diag | is_horiz, j - 1, j)
        i2 = jnp.where(now_done, i, i2)
        j2 = jnp.where(now_done, j, j2)
        mode2 = jnp.where(now_done, mode, mode2)
        return i2, j2, mode2, kop, ops, lens, now_done

    state = (bi, bj, zvec, zvec, ops0, lens0, zvec > 0)
    i_f, j_f, _, n_ops, ops, lens, _ = jax.lax.fori_loop(
        0, Lq + Lr, body, state
    )
    idx = jnp.arange(max_ops)[None, :]
    src = n_ops[:, None] - 1 - idx
    src_c = jnp.clip(src, 0, max_ops - 1)
    ops_f = jnp.where(src >= 0, jnp.take_along_axis(ops, src_c, axis=1), -1)
    lens_f = jnp.where(src >= 0, jnp.take_along_axis(lens, src_c, axis=1), 0)
    return i_f + 1, j_f + 1, ops_f.astype(jnp.int8), lens_f, n_ops


def banded_sw_pallas(
    query: jnp.ndarray,
    qlen: jnp.ndarray,
    ref: jnp.ndarray,
    params: SWParams = SWParams(),
    max_ops: int = 48,
    interpret: bool = False,
    with_nm: bool = False,
):
    """Pallas-accelerated banded_sw: DP AND traceback in one launch
    (ops/sw_pallas.py sw_pallas_cigar — the packed-dirs HBM round trip and
    the Lq+Lr-step XLA traceback loop are gone).  With ``with_nm`` returns
    (SWResult, nm) where nm is the edit distance along the path."""
    from ..ops.sw_pallas import LANES, sw_pallas_cigar

    p = (params.match, params.mismatch, params.gap_open, params.gap_ext)
    n0 = query.shape[0]
    padn = (-n0) % LANES
    if padn:
        query = jnp.pad(query, ((0, padn), (0, 0)), constant_values=4)
        qlen = jnp.pad(qlen, (0, padn))
        ref = jnp.pad(ref, ((0, padn), (0, 0)), constant_values=4)
    (score, qbeg, qend, rbeg, rend, gscore, grend, ops, lens, n_ops,
     nm) = sw_pallas_cigar(
        query, qlen, ref, params=p, max_ops=max_ops, interpret=interpret
    )
    if padn:
        (score, qbeg, qend, rbeg, rend, gscore, grend, n_ops, nm) = (
            a[:n0] for a in
            (score, qbeg, qend, rbeg, rend, gscore, grend, n_ops, nm))
        ops, lens = ops[:n0], lens[:n0]
    res = SWResult(
        score=score, qbeg=qbeg, qend=qend, rbeg=rbeg, rend=rend,
        cigar_ops=ops.astype(jnp.int8), cigar_len=lens, n_ops=n_ops,
        gscore=gscore, grend=grend,
    )
    return (res, nm) if with_nm else res


def banded_sw_score_pallas(
    query: jnp.ndarray,
    qlen: jnp.ndarray,
    ref: jnp.ndarray,
    params: SWParams = SWParams(),
    interpret: bool = False,
) -> "SWScore":
    from ..ops.sw_pallas import LANES, sw_pallas

    p = (params.match, params.mismatch, params.gap_open, params.gap_ext)
    n0 = query.shape[0]
    padn = (-n0) % LANES
    if padn:
        query = jnp.pad(query, ((0, padn), (0, 0)), constant_values=4)
        qlen = jnp.pad(qlen, (0, padn))
        ref = jnp.pad(ref, ((0, padn), (0, 0)), constant_values=4)
    score, qend, rend, gscore, grend = sw_pallas(
        query, qlen, ref, params=p, interpret=interpret
    )
    if padn:
        score, qend, rend, gscore, grend = (
            a[:n0] for a in (score, qend, rend, gscore, grend))
    return SWScore(score=score, qend=qend, rend=rend, gscore=gscore, grend=grend)


class SWScore(NamedTuple):
    score: jnp.ndarray    # (N,) best local score
    qend: jnp.ndarray     # (N,) query end (exclusive) of the best cell
    rend: jnp.ndarray     # (N,) ref end (exclusive)
    gscore: jnp.ndarray   # (N,) best score in the last query row
    grend: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("params",))
def banded_sw_score(
    query: jnp.ndarray,   # (N, Lq) int32 codes
    qlen: jnp.ndarray,    # (N,) int32
    ref: jnp.ndarray,     # (N, Lr) int32 codes
    params: SWParams = SWParams(),
) -> SWScore:
    """Score-only local SW: same DP as banded_sw but carries only running
    maxima — no per-cell materialization, so it is the cheap first pass
    over all candidate chains."""
    N, Lq = query.shape
    Lr = ref.shape[1]
    p = params
    oe = p.gap_open + p.gap_ext
    qmask = jnp.arange(Lq)[None, :] < qlen[:, None]
    ecol = jnp.arange(Lr, dtype=jnp.int32)[None, :]
    zc = (qlen * 0)[:, None]
    H0 = jnp.zeros((N, Lr + 1), jnp.int32) + zc
    V0 = jnp.full((N, Lr + 1), NEG) + zc
    zv = qlen * 0
    best0 = (zv, zv, zv)          # score, qend, rend
    glast0 = (zv, zv)             # gscore, grend

    def row(carry, xs):
        Hp, Vp, best, glast, i = carry
        qc, is_valid_row = xs
        sub = _sub_scores(qc[:, None], ref, p)
        diag = sub + Hp[:, :-1]
        V = jnp.maximum(Vp[:, 1:] - p.gap_ext, Hp[:, 1:] - oe)
        Ht = jnp.maximum(jnp.maximum(diag, V), 0)
        g = Ht + p.gap_ext * ecol
        run = jax.lax.associative_scan(jnp.maximum, g * Lr + ecol, axis=1)
        run_ex = jnp.concatenate(
            [jnp.full((N, 1), -1, jnp.int32), run[:, :-1]], axis=1
        )
        gmax = jnp.where(run_ex >= 0, run_ex // Lr, NEG)
        F = gmax - p.gap_open - p.gap_ext * ecol
        H = jnp.maximum(Ht, F)
        H = jnp.where(is_valid_row[:, None], H, 0)
        V = jnp.where(is_valid_row[:, None], V, NEG)
        rowmax_j = jnp.argmax(H, axis=1).astype(jnp.int32)
        rowmax = jnp.take_along_axis(H, rowmax_j[:, None], axis=1)[:, 0]
        bs, bq, br = best
        better = rowmax > bs
        best2 = (
            jnp.where(better, rowmax, bs),
            jnp.where(better, i + 1, bq),
            jnp.where(better, rowmax_j + 1, br),
        )
        is_last = i == qlen - 1
        gs, gr = glast
        glast2 = (
            jnp.where(is_last, rowmax, gs),
            jnp.where(is_last, rowmax_j + 1, gr),
        )
        Hn = jnp.concatenate([jnp.zeros((N, 1), jnp.int32) + zc, H], axis=1)
        Vn = jnp.concatenate([jnp.full((N, 1), NEG) + zc, V], axis=1)
        return (Hn, Vn, best2, glast2, i + 1), None

    (_, _, best, glast, _), _ = jax.lax.scan(
        row, (H0, V0, best0, glast0, jnp.int32(0)), (query.T, qmask.T)
    )
    return SWScore(
        score=best[0], qend=best[1], rend=best[2],
        gscore=glast[0], grend=glast[1],
    )


@functools.partial(jax.jit, static_argnames=("params", "max_ops"))
def banded_sw(
    query: jnp.ndarray,   # (N, Lq) int32 codes (4 = N / padding)
    qlen: jnp.ndarray,    # (N,) int32
    ref: jnp.ndarray,     # (N, Lr) int32 codes (4 = out of range)
    params: SWParams = SWParams(),
    max_ops: int = 48,
) -> SWResult:
    """Local alignment of each query lane against its own ref window."""
    N, Lq = query.shape
    Lr = ref.shape[1]
    assert Lr <= 256, "deletion-run distances are stored as uint8"
    p = params
    oe = p.gap_open + p.gap_ext

    qmask = jnp.arange(Lq)[None, :] < qlen[:, None]  # (N, Lq)
    ecol = jnp.arange(Lr, dtype=jnp.int32)[None, :]

    # ---- forward DP over query rows ------------------------------------
    # (carries derived from qlen keep shard_map varying status consistent)
    zc = (qlen * 0)[:, None]
    H0 = jnp.zeros((N, Lr + 1), jnp.int32) + zc
    V0 = jnp.full((N, Lr + 1), NEG) + zc

    def row(carry, xs):
        Hp, Vp = carry  # previous row H / V, with leading 0-column
        qc, is_valid_row = xs
        sub = _sub_scores(qc[:, None], ref, p)         # (N, Lr)
        diag = sub + Hp[:, :-1]
        V = jnp.maximum(Vp[:, 1:] - p.gap_ext, Hp[:, 1:] - oe)
        vext = Vp[:, 1:] - p.gap_ext >= Hp[:, 1:] - oe  # I-run continues up
        Ht = jnp.maximum(jnp.maximum(diag, V), 0)
        # deletion gaps: F[j] = max_{i<j}(Ht[i] + e*i) - o - e*j, with argmax
        g = Ht + p.gap_ext * ecol                       # ≥ 0, small range
        packed = g * Lr + ecol                          # value-major packing
        run = jax.lax.associative_scan(jnp.maximum, packed, axis=1)
        run_ex = jnp.concatenate(
            [jnp.full((N, 1), -1, jnp.int32), run[:, :-1]], axis=1
        )
        gmax = jnp.where(run_ex >= 0, run_ex // Lr, NEG)
        gsrc = jnp.where(run_ex >= 0, run_ex % Lr, 0)
        F = gmax - p.gap_open - p.gap_ext * ecol
        H = jnp.maximum(Ht, F)
        # direction of H: 0 stop, 1 diag, 2 vert(I), 3 horiz(D);
        # tie priority diag > I > D (write low priority first)
        dirs = jnp.zeros((N, Lr), jnp.int8)
        dirs = jnp.where((H == F) & (H > 0), jnp.int8(3), dirs)
        dirs = jnp.where((H == V) & (H > 0), jnp.int8(2), dirs)
        dirs = jnp.where((H == diag) & (H > 0), jnp.int8(1), dirs)
        ddist = jnp.clip(ecol - gsrc, 0, 255).astype(jnp.uint8)
        H = jnp.where(is_valid_row[:, None], H, 0)
        V = jnp.where(is_valid_row[:, None], V, NEG)
        dirs = jnp.where(is_valid_row[:, None], dirs, jnp.int8(0))
        Hn = jnp.concatenate([jnp.zeros((N, 1), jnp.int32), H], axis=1)
        Vn = jnp.concatenate([jnp.full((N, 1), NEG), V], axis=1)
        return (Hn, Vn), (H, dirs, vext, ddist)

    xs = (query.T, qmask.T)
    (_, _), (Hrows, dir_rows, vext_rows, ddist_rows) = jax.lax.scan(
        row, (H0, V0), xs
    )
    Hl = jnp.transpose(Hrows, (1, 0, 2)).reshape(N, Lq * Lr)
    best_flat = jnp.argmax(Hl, axis=1).astype(jnp.int32)
    score = jnp.take_along_axis(Hl, best_flat[:, None], axis=1)[:, 0]
    bi = best_flat // Lr
    bj = best_flat % Lr

    last_row = jnp.clip(qlen - 1, 0, Lq - 1)
    Hlast = jnp.take_along_axis(
        jnp.transpose(Hrows, (1, 0, 2)), last_row[:, None, None], axis=1
    )[:, 0, :]
    grend_j = jnp.argmax(Hlast, axis=1).astype(jnp.int32)
    gscore = jnp.take_along_axis(Hlast, grend_j[:, None], axis=1)[:, 0]

    dirs = jnp.transpose(dir_rows, (1, 0, 2))    # (N, Lq, Lr)
    vexts = jnp.transpose(vext_rows, (1, 0, 2))
    ddists = jnp.transpose(ddist_rows, (1, 0, 2))

    # ---- traceback (affine state machine; mode 0 = H, 1 = in I-run) ----
    # carries derived from bi/bj keep shard_map "varying" status consistent
    zvec = bi * 0
    ops0 = jnp.full((N, max_ops), jnp.int8(-1)) + zvec[:, None].astype(jnp.int8)
    lens0 = jnp.zeros((N, max_ops), jnp.int32) + zvec[:, None]
    lanes = jnp.arange(N)

    def tb_body(_, state):
        i, j, mode, kop, ops, lens, done = state
        ii = jnp.clip(i, 0, Lq - 1)
        jj = jnp.clip(j, 0, Lr - 1)
        d = dirs[lanes, ii, jj]
        ve = vexts[lanes, ii, jj]
        dd = ddists[lanes, ii, jj].astype(jnp.int32)
        oob = (i < 0) | (j < 0)

        in_v = mode == 1
        d_eff = jnp.where(in_v, jnp.int8(2), jnp.where(oob, jnp.int8(0), d))
        now_done = (d_eff == 0) | done

        is_diag = (d_eff == 1) & ~now_done
        is_vert = (d_eff == 2) & ~now_done
        is_horiz = (d_eff == 3) & ~now_done

        op = jnp.where(
            is_diag, jnp.int8(OP_M), jnp.where(is_vert, jnp.int8(OP_I), jnp.int8(OP_D))
        )
        step_len = jnp.where(is_horiz, jnp.maximum(dd, 1), 1)

        prev_k = jnp.clip(kop - 1, 0, max_ops - 1)
        prev_op = ops[lanes, prev_k]
        merge = (kop > 0) & (prev_op == op) & ~now_done
        write_k = jnp.where(merge, prev_k, jnp.clip(kop, 0, max_ops - 1))
        ops = ops.at[lanes, write_k].set(
            jnp.where(now_done, ops[lanes, write_k], op)
        )
        lens = lens.at[lanes, write_k].add(jnp.where(now_done, 0, step_len))
        kop = jnp.where(now_done | merge, kop, kop + 1)

        # next mode: entering/continuing an I-run when the vertical state
        # extended; leaving it when this I was the gap open
        mode2 = jnp.where(is_vert & ve, jnp.int32(1), jnp.int32(0))
        i2 = jnp.where(is_diag | is_vert, i - 1, i)
        j2 = jnp.where(is_diag, j - 1, jnp.where(is_horiz, j - step_len, j))
        i2 = jnp.where(now_done, i, i2)
        j2 = jnp.where(now_done, j, j2)
        mode2 = jnp.where(now_done, mode, mode2)
        return i2, j2, mode2, kop, ops, lens, now_done

    state = (bi, bj, zvec, zvec, ops0, lens0, zvec > 0)
    i_f, j_f, _, n_ops, ops, lens, _ = jax.lax.fori_loop(
        0, Lq + Lr, tb_body, state
    )
    # ops/lens were built end→start; reverse the valid prefix
    idx = jnp.arange(max_ops)[None, :]
    src = n_ops[:, None] - 1 - idx
    src_c = jnp.clip(src, 0, max_ops - 1)
    ops_f = jnp.where(src >= 0, jnp.take_along_axis(ops, src_c, axis=1), -1)
    lens_f = jnp.where(src >= 0, jnp.take_along_axis(lens, src_c, axis=1), 0)

    return SWResult(
        score=score,
        qbeg=i_f + 1,
        qend=bi + 1,
        rbeg=j_f + 1,
        rend=bj + 1,
        cigar_ops=ops_f.astype(jnp.int8),
        cigar_len=lens_f,
        n_ops=n_ops,
        gscore=gscore,
        grend=grend_j + 1,
    )
