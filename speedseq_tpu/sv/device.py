"""Device-resident SV numerics: LUMPY clustering/curve math, SVTyper
counting+genotyping, and CNVnator depth ops as fused XLA programs.

Reference contracts: ``lumpy -B … -P -r 0 -m 4`` clustering + probability
curves (/root/reference/bin/speedseq:1473-1485,1242-1243,1312-1313), the
per-sample ``svtyper`` loop (:1488-1505), and the cnvnator wrapper
pipeline -tree/-his/-stat/-partition/-call (bin/cnvnator_wrapper.py:
75-235, mean-shift partition :128-135).

TPU-first design (SURVEY §2.1 #12/#14/#15): the host keeps BAM/VCF bytes,
SA-tag text parsing, and call-object assembly; every hot reduction runs
on the device —

- cluster membership: one ``lax.scan`` sweep over (group, start1, start2)
  sorted evidence with running-extent carry — the exact segmented sweep
  the host implementation walks in Python (sv/cluster.py);
- curve combination: the per-cluster log-product over the union support
  (LUMPY's multiplicative evidence integration) as a dense
  (evidence × span) scatter + ``segment_sum``, with argmax/CI/CI95
  reductions vectorized over all clusters at once;
- SVTyper: ALL breakpoints of a sample genotyped in ONE program — window
  membership, split/crossing/pair classification masks, count
  reductions, and the count→GL/GQ/SQ Bayesian math (the reference runs
  one svtyper process per sample that fetches per breakpoint);
- CNV: depth binning (segment_sum over global bin ids), GC-stratum
  correction, and an actual iterative mean-shift partitioner with
  depth-dependent signal bandwidth (CNVnator's model; the host fallback
  keeps the simpler similarity smoothing).

Multi-chip: breakpoints/sites are embarrassingly parallel (the reference
fans processes the same way), so the SVTyper program shard_maps the call
axis over the mesh data axis with record columns replicated.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Tuple

import numpy as np

try:  # the sv engine must keep working without jax (host fallback)
    import jax
    import jax.numpy as jnp

    _HAVE_JAX = True
except Exception:  # pragma: no cover
    _HAVE_JAX = False


def device_enabled() -> bool:
    return _HAVE_JAX and not os.environ.get("SSQ_SV_HOST")


def _bucket(n: int, mult: int) -> int:
    return max(mult, ((n + mult - 1) // mult) * mult)


def _pow2(n: int, lo: int = 8) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


# ---------------------------------------------------------------------------
# cluster sweep (lumpy evidence clustering, sv/cluster.py semantics)
# ---------------------------------------------------------------------------

if _HAVE_JAX:

    @jax.jit
    def _cluster_scan_jit(gid, s1, e1, lo2, hi2):
        """Cluster ids for evidence sorted by (gid, start1, start2).

        Carry = (prev_gid, running end1 max, running lo2 min, running hi2
        max, cluster counter): a new cluster starts when the group key
        changes or the item fails the 2-D overlap test against the
        running extents — byte-for-byte the host sweep in
        cluster_breakpoints."""

        def step(carry, x):
            pg, em, l2, h2, cid = carry
            g, s, e, lo, hi = x
            ov = (s < em) & (lo < h2) & (hi > l2)
            new = (g != pg) | ~ov
            cid = cid + new.astype(jnp.int32)
            em = jnp.where(new, e, jnp.maximum(em, e))
            l2 = jnp.where(new, lo, jnp.minimum(l2, lo))
            h2 = jnp.where(new, hi, jnp.maximum(h2, hi))
            return (g, em, l2, h2, cid), cid - 1

        init = (jnp.int32(-1), jnp.int32(-(2**31) + 1),
                jnp.int32(0), jnp.int32(0), jnp.int32(0))
        _, cids = jax.lax.scan(step, init, (gid, s1, e1, lo2, hi2))
        return cids

    @functools.partial(jax.jit, static_argnames=("n_seg", "Wmax"))
    def _combine_jit(cid, start, clen, curves, trim, n_seg, Wmax):
        """Batched _combine (sv/cluster.py): per-cluster log-product of
        member curves over the union support, then pos/CI/CI95.

        curves: (n, Dmax) f32 rows (member probability curves, padded);
        returns per-cluster (prob rows, lo, pos, ci, ci95, nz window)."""
        endb = start + clen
        big = jnp.int32(2**30)
        lo = jax.ops.segment_min(start, cid, num_segments=n_seg)
        hi = jax.ops.segment_max(endb, cid, num_segments=n_seg)
        lo = jnp.where(lo > big - 1, 0, lo)     # empty segments
        off = start - lo[cid]                    # (n,)
        col = jnp.arange(Wmax, dtype=jnp.int32)[None, :]
        rel = col - off[:, None]                 # (n, W)
        inside = (rel >= 0) & (rel < clen[:, None])
        eps = jnp.float32(1e-12)
        vals = jnp.take_along_axis(
            curves, jnp.clip(rel, 0, curves.shape[1] - 1), axis=1)
        logrow = jnp.where(inside,
                           jnp.log(jnp.maximum(vals, eps)), jnp.log(eps))
        acc = jax.ops.segment_sum(logrow, cid, num_segments=n_seg)  # (C, W)
        width = jnp.maximum(hi - lo, 1)
        live_col = col < width[:, None]
        acc = jnp.where(live_col, acc, -jnp.inf)
        acc = acc - jnp.max(acc, axis=1, keepdims=True)
        prob = jnp.where(live_col, jnp.exp(acc), 0.0)
        prob = prob / jnp.maximum(prob.sum(axis=1, keepdims=True), 1e-30)

        # lumpy -r trim: drop edges below the threshold, renormalize
        # (trim = 0 keeps everything, matching the host fast path)
        livemask = prob >= trim
        has = jnp.any(livemask, axis=1)
        first = jnp.min(jnp.where(livemask, col, Wmax), axis=1)
        last = jnp.max(jnp.where(livemask, col, -1), axis=1)
        keepm = (col >= first[:, None]) & (col <= last[:, None])
        tprob = jnp.where(keepm, prob, 0.0)
        tprob = tprob / jnp.maximum(tprob.sum(axis=1, keepdims=True), 1e-30)
        prob = jnp.where(has[:, None], tprob, prob)

        pos = lo + jnp.argmax(prob, axis=1).astype(jnp.int32)
        nzmask = prob > 1e-9
        nz0 = jnp.min(jnp.where(nzmask, col, Wmax), axis=1).astype(jnp.int32)
        nz1 = jnp.max(jnp.where(nzmask, col, -1), axis=1).astype(jnp.int32)
        ci_lo = lo + nz0 - pos
        ci_hi = lo + nz1 - pos
        # 95% credible interval: mass-ordered threshold (ties at the
        # boundary all kept — a superset of the host's stable-sort pick)
        sp = -jnp.sort(-prob, axis=1)
        csum = jnp.cumsum(sp, axis=1)
        k = jnp.sum(csum < 0.95, axis=1)
        thr = jnp.take_along_axis(sp, k[:, None], axis=1)[:, 0]
        keep95 = prob >= thr[:, None]
        c0 = jnp.min(jnp.where(keep95, col, Wmax), axis=1).astype(jnp.int32)
        c1 = jnp.max(jnp.where(keep95, col, -1), axis=1).astype(jnp.int32)
        # pack the 8 int columns into ONE array: each host leaf fetch
        # costs ~30 ms of relay latency (docs/PERF_NOTES.md r1 lesson)
        ints = jnp.stack(
            [lo, pos, ci_lo, ci_hi, lo + c0 - pos, lo + c1 - pos, nz0, nz1],
            axis=1)
        return prob, ints


class CombinedClusters(NamedTuple):
    """Host-side results of the device cluster+combine pass."""

    cids: np.ndarray        # (n,) cluster id per (sorted) evidence row
    n_clusters: int
    # per-cluster, for both breakpoint sides (index 0 = side1, 1 = side2)
    prob: Tuple[np.ndarray, np.ndarray]    # (C, W) rows
    lo: Tuple[np.ndarray, np.ndarray]
    pos: Tuple[np.ndarray, np.ndarray]
    ci: Tuple[np.ndarray, np.ndarray]      # (C, 2)
    ci95: Tuple[np.ndarray, np.ndarray]
    nz: Tuple[np.ndarray, np.ndarray]      # (C, 2) live curve window


if _HAVE_JAX:

    @functools.partial(jax.jit, static_argnames=("n_seg",))
    def _scan_extents_jit(g, s1, e1, s2, e2, n_seg):
        """Scan + per-cluster widths in ONE leaf (npad, 3):
        col 0 = cids (row-aligned), cols 1-2 = per-SEGMENT widths of
        side 1/2 (0 for empty segments) — the host only needs the max
        width to size the combine program, so no second fetch of
        extents is paid."""
        cids = _cluster_scan_jit(g, s1, e1, s2, e2)

        def width(start, endb):
            lo = jax.ops.segment_min(start, cids, num_segments=n_seg)
            hi = jax.ops.segment_max(endb, cids, num_segments=n_seg)
            return jnp.where(hi >= lo, hi - lo, 0)

        return jnp.stack([cids, width(s1, e1), width(s2, e2)], axis=1)

    @functools.partial(jax.jit,
                       static_argnames=("n_seg", "Wmax", "c_pad"))
    def _combine_both_jit(cids, s1, l1, cur1, s2, l2, cur2, trim,
                          n_seg, Wmax, c_pad):
        """Both sides' curve combinations in one program, packed into
        ONE leaf SLICED to the live cluster count: (c_pad, 16 + 2·Wmax)
        int32 = [ints₁ | ints₂ | bitcast(prob₁) | bitcast(prob₂)] —
        per-LEAF fetches cost ~30 ms of relay latency and clusters are
        5-50× fewer than evidence rows (docs/PERF_NOTES.md)."""
        p1, i1 = _combine_jit(cids, s1, l1, cur1, trim,
                              n_seg=n_seg, Wmax=Wmax)
        p2, i2 = _combine_jit(cids, s2, l2, cur2, trim,
                              n_seg=n_seg, Wmax=Wmax)
        bc = lambda p: jax.lax.bitcast_convert_type(p[:c_pad], jnp.int32)
        return jnp.concatenate(
            [i1[:c_pad], i2[:c_pad], bc(p1), bc(p2)], axis=1)


def cluster_and_combine(
    gid: np.ndarray,
    start1: np.ndarray, len1: np.ndarray, curves1: np.ndarray,
    start2: np.ndarray, len2: np.ndarray, curves2: np.ndarray,
    trim: float,
) -> CombinedClusters:
    """Run the device sweep + both per-side curve combinations.

    Inputs are evidence rows ALREADY sorted by (gid, start1, start2);
    curves are (n, Dmax) padded probability rows.  Two lean rounds:
    scan+widths (one small leaf), then both combines sliced to the
    cluster count (two small leaves)."""
    n = len(gid)
    npad = _bucket(n, 64)
    pad_i = lambda a, fill: np.pad(
        np.asarray(a, np.int32), (0, npad - n), constant_values=fill)
    g_p = pad_i(gid, 2**30)
    s1_p = pad_i(start1, 2**28)
    e1_p = pad_i(np.asarray(start1) + np.asarray(len1), 2**28 + 1)
    s2_p = pad_i(start2, 2**28)
    e2_p = pad_i(np.asarray(start2) + np.asarray(len2), 2**28 + 1)
    sx = np.asarray(_scan_extents_jit(g_p, s1_p, e1_p, s2_p, e2_p,
                                      n_seg=npad))
    cids = sx[:n, 0]
    C = int(cids[-1]) + 1 if n else 0
    c_pad = _bucket(max(C, 1), 64)
    w_need = int(max(sx[:C, 1].max() if C else 8,
                     sx[:C, 2].max() if C else 8, 8))
    Wmax = _pow2(w_need, 16)
    cur1_p = np.zeros((npad, curves1.shape[1]), np.float32)
    cur1_p[:n] = curves1
    cur2_p = np.zeros((npad, curves2.shape[1]), np.float32)
    cur2_p[:n] = curves2
    cids_p = pad_i(cids, npad - 1)
    packed = jax.device_get(_combine_both_jit(
        cids_p, pad_i(start1, 0), pad_i(len1, 1), jnp.asarray(cur1_p),
        pad_i(start2, 0), pad_i(len2, 1), jnp.asarray(cur2_p),
        jnp.float32(trim), n_seg=npad, Wmax=Wmax, c_pad=c_pad))
    ints = packed[:, :16]
    probs = np.ascontiguousarray(
        packed[:, 16:]).view(np.float32).reshape(c_pad, 2, Wmax)

    def unpack(prob, i8):
        i8 = i8[:C]
        return (prob[:C], i8[:, 0], i8[:, 1], i8[:, 2:4],
                i8[:, 4:6], i8[:, 6:8])

    p1, lo1, pos1, ci1, ci951, nz1_ = unpack(probs[:, 0], ints[:, :8])
    p2, lo2, pos2, ci2, ci952, nz2_ = unpack(probs[:, 1], ints[:, 8:])
    return CombinedClusters(
        cids=cids, n_clusters=C,
        prob=(p1, p2), lo=(lo1, lo2), pos=(pos1, pos2),
        ci=(ci1, ci2), ci95=(ci951, ci952), nz=(nz1_, nz2_),
    )


# ---------------------------------------------------------------------------
# SVTyper: fused window counting + count→GL genotyping over all calls
# ---------------------------------------------------------------------------

# svtype codes inside the kernel
SV_DEL, SV_DUP, SV_INV, SV_BND = 0, 1, 2, 3

if _HAVE_JAX:

    def _svtyper_kernel(
        idx, valid,
        # record columns (n,)
        r_pos, r_end, r_tid, r_mtid, r_mpos, r_mend,
        r_base, r_cl, r_cr, r_sa, r_rev1, r_rev2, r_proper, r_mateok,
        # call columns (C,)
        svcode, tid1, pos1, tid2, pos2, strand1, strand2,
        # scalars
        slop, w, wiggle, max_normal,
    ):
        """Counts + GL for all calls of one sample in one program.

        idx/valid: (C, 2, R) gather windows — [:, 0] is breakpoint 1,
        [:, 1] breakpoint 2 (svtyper.py _genotype_columnar semantics,
        identical integer counts).  The leading call axis is the shard
        axis under the mesh."""
        g = lambda a: a[idx]                          # (C, 2, R)
        posg, endg = g(r_pos), g(r_end)
        tidg, mtidg, mposg, mendg = g(r_tid), g(r_mtid), g(r_mpos), g(r_mend)
        clg, crg, sag = g(r_cl), g(r_cr), g(r_sa)
        rev1g, rev2g, properg = g(r_rev1), g(r_rev2), g(r_proper)
        baseg, mateokg = g(r_base), g(r_mateok)

        pos_cs = jnp.stack([pos1, pos2], axis=1)[:, :, None]   # (C, 2, 1)
        tid_cs = jnp.stack([tid1, tid2], axis=1)[:, :, None]
        base = (valid & baseg & (tidg == tid_cs)
                & (endg > pos_cs - w) & (posg < pos_cs + w))
        at_end = jnp.abs(endg - pos_cs) <= slop
        at_start = jnp.abs(posg - pos_cs) <= slop
        split_alt = base & sag & ((at_end & crg) | (at_start & clg))
        crossing = (base & ~split_alt
                    & (posg + slop <= pos_cs) & (pos_cs <= endg - slop)
                    & ~clg & ~crg)

        # ---- pair evidence: breakpoint-1 rows only ----------------------
        b1 = lambda a: a[:, 0, :]
        posb, endb, tidb = b1(posg), b1(endg), b1(tidg)
        mtidb, mposb, mendb = b1(mtidg), b1(mposg), b1(mendg)
        rev1b, rev2b, properb = b1(rev1g), b1(rev2g), b1(properg)
        cand = (b1(base) & ~b1(split_alt) & ~b1(crossing)
                & b1(mateokg)
                & ((tidb < mtidb) | ((tidb == mtidb) & (posb <= mposb))))
        p1c = pos1[:, None]
        p2c = pos2[:, None]
        span = mendb - posb
        crosses1 = (posb < p1c) & (p1c < mendb)
        same1 = tidb == tid1[:, None]

        covers = ((endb - 1 <= p1c + wiggle) & (mposb >= p2c - wiggle)
                  & (posb < p1c) & (mendb > p2c))
        del_alt = (cand & ~rev1b & rev2b & same1 & covers
                   & (span > max_normal))
        del_ref = (cand & ~del_alt & ~rev1b & rev2b & same1 & crosses1
                   & (span <= max_normal) & properb)
        dnear1 = jnp.abs(posb - p1c) < max_normal
        dnear2 = jnp.abs(mendb - p2c) < max_normal
        dup_alt = cand & rev1b & ~rev2b & dnear1 & dnear2
        dup_ref = cand & ~dup_alt & crosses1 & ~rev1b & rev2b & properb
        inv_alt = cand & (rev1b == rev2b)
        inv_ref = cand & ~inv_alt & crosses1 & properb
        bnear1 = jnp.abs(posb - p1c) < max_normal
        bnear2 = jnp.abs(mposb - p2c) < max_normal
        orient = ((rev1b == (strand1[:, None] == 1))
                  & (rev2b == (strand2[:, None] == 1)))
        bnd_alt = (cand & same1 & (mtidb == tid2[:, None])
                   & bnear1 & bnear2 & orient)
        bnd_ref = cand & ~bnd_alt & crosses1 & properb

        sc = svcode[:, None]
        alt_pair = jnp.where(
            sc == SV_DEL, del_alt, jnp.where(
                sc == SV_DUP, dup_alt, jnp.where(
                    sc == SV_INV, inv_alt, bnd_alt)))
        ref_pair = jnp.where(
            sc == SV_DEL, del_ref, jnp.where(
                sc == SV_DUP, dup_ref, jnp.where(
                    sc == SV_INV, inv_ref, bnd_ref)))

        f32 = jnp.float32
        as_c = split_alt.astype(f32).sum(axis=(1, 2)).astype(jnp.int32)
        rs_c = crossing.astype(f32).sum(axis=(1, 2)).astype(jnp.int32)
        ap_c = alt_pair.astype(f32).sum(axis=1).astype(jnp.int32)
        rp_c = ref_pair.astype(f32).sum(axis=1).astype(jnp.int32)
        alt_n = as_c + ap_c
        ref_n = rs_c + rp_c

        gl, gt, gq, sq, ab = _genotype_counts(ref_n, alt_n)
        # pack into ONE (C, 13) int32 leaf (floats bitcast) — per-leaf
        # host fetches cost ~30 ms of relay latency each
        ints = jnp.stack(
            [ref_n, alt_n, rs_c, as_c, rp_c, ap_c, gt, gq], axis=1)
        flts = jnp.concatenate(
            [gl, sq[:, None], ab[:, None]], axis=1)
        return jnp.concatenate(
            [ints, jax.lax.bitcast_convert_type(flts, jnp.int32)], axis=1)

    _svtyper_jit = jax.jit(_svtyper_kernel)

    def _genotype_counts(ref_n, alt_n, p_err: float = 1e-3):
        """Vectorized genotype_from_counts (svtyper.py), same rounding and
        same tie ordering (host argsort-descending prefers the later
        genotype index on ties)."""
        from jax.scipy.special import gammaln

        ref = ref_n.astype(jnp.float32)
        alt = alt_n.astype(jnp.float32)
        nn = ref + alt
        lc = gammaln(nn + 1) - gammaln(alt + 1) - gammaln(ref + 1)
        l10 = jnp.float32(np.log(10.0))
        pa = jnp.asarray([p_err, 0.5, 1.0 - p_err], jnp.float32)
        ll = (lc[..., None]
              + alt[..., None] * jnp.log(jnp.maximum(pa, 1e-12))[None, :]
              + ref[..., None] * jnp.log(jnp.maximum(1.0 - pa, 1e-12))[None, :]
              ) / l10                                        # (C, 3)
        rev = ll[..., ::-1]
        best = 2 - jnp.argmax(rev, axis=-1).astype(jnp.int32)
        masked = jnp.where(
            jnp.arange(3)[None, :] == best[:, None], -jnp.inf, ll)
        second = 2 - jnp.argmax(masked[..., ::-1], axis=-1).astype(jnp.int32)
        gbest = jnp.take_along_axis(ll, best[:, None], 1)[:, 0]
        gsec = jnp.take_along_axis(ll, second[:, None], 1)[:, 0]
        gq = jnp.minimum(99, jnp.round(10.0 * (gbest - gsec))).astype(jnp.int32)
        # stable log-space posterior of 0/0 (matches the host's log form)
        m = jnp.max(ll, axis=-1, keepdims=True)
        post = jnp.power(10.0, ll - m)
        log10_p0 = (ll[:, 0] - m[:, 0]) - jnp.log10(post.sum(axis=-1))
        sq = jnp.minimum(200.0, -10.0 * jnp.maximum(log10_p0, -20.0))
        ab = jnp.where(nn > 0, alt / jnp.maximum(nn, 1), 0.0)
        return ll, best, gq, sq, ab

    def _shard_pad(n: int, mult: int, n_dev: int) -> int:
        return _bucket(_bucket(n, mult), mult * n_dev)

    def svtyper_dispatch(idx, valid, rec_cols, call_cols, scalars,
                         mesh=None):
        """Pad the call axis and dispatch (optionally shard_mapped over
        the mesh data axis); returns the un-fetched device output pair.

        idx/valid: (C, 2, R); rec_cols: 14-tuple of (n,) record columns;
        call_cols: 7-tuple of (C,) call columns; scalars:
        (slop, w, wiggle, max_normal).  Deferred fetch lets the caller
        dispatch several R-tier batches and pay ONE host fetch round."""
        C = call_cols[0].shape[0]
        n_dev = mesh.devices.size if mesh is not None else 1
        Cp = _shard_pad(C, 8, n_dev)
        R = idx.shape[2]

        def padc(a, fill=0):
            return np.pad(np.asarray(a), (0, Cp - C), constant_values=fill)

        idx2 = np.zeros((Cp, 2, R), np.int32)
        val2 = np.zeros((Cp, 2, R), bool)
        idx2[:C] = idx
        val2[:C] = valid
        calls_p = tuple(padc(a) for a in call_cols)
        args = (idx2, val2) + tuple(rec_cols) + calls_p + tuple(
            np.int32(s) for s in scalars)
        if mesh is None:
            return _svtyper_jit(*args)
        return _svtyper_sharded(mesh, args)

    def svtyper_unpack(fetched, C):
        """Split one fetched (C, 13) packed leaf into the 11 columns."""
        ints = fetched[:C, :8]
        flts = np.ascontiguousarray(fetched[:C, 8:]).view(np.float32)
        return (ints[:, 0], ints[:, 1], ints[:, 2], ints[:, 3],
                ints[:, 4], ints[:, 5], flts[:, :3], ints[:, 6],
                ints[:, 7], flts[:, 3], flts[:, 4])

    def svtyper_batch_device(idx, valid, rec_cols, call_cols, scalars,
                             mesh=None):
        """Dispatch + fetch in one step (single-tier convenience)."""
        out = svtyper_dispatch(idx, valid, rec_cols, call_cols, scalars,
                               mesh=mesh)
        return svtyper_unpack(jax.device_get(out), call_cols[0].shape[0])

    def _svtyper_sharded(mesh, args):
        """shard_map over the call axis (breakpoints are independent —
        the reference's per-sample svtyper processes fan out the same
        way); record columns and scalars replicate."""
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map
        except ImportError:  # pragma: no cover
            from jax.experimental.shard_map import shard_map  # type: ignore
        import inspect

        kw = {}
        if "check_rep" in inspect.signature(shard_map).parameters:
            kw["check_rep"] = False
        c_axis = P("data")
        rep = P()
        in_specs = (c_axis, c_axis) + (rep,) * 14 + (c_axis,) * 7 + (rep,) * 4
        fn = shard_map(
            _svtyper_kernel, mesh=mesh,
            in_specs=in_specs, out_specs=c_axis, **kw)
        return jax.jit(fn)(*args)


# ---------------------------------------------------------------------------
# CNV: depth binning, GC correction, mean-shift partition
# ---------------------------------------------------------------------------

if _HAVE_JAX:

    @functools.partial(jax.jit, static_argnames=("n_bins",))
    def _depth_bins_jit(bin_idx, n_bins):
        return jax.ops.segment_sum(
            jnp.ones(bin_idx.shape, jnp.float32), bin_idx,
            num_segments=n_bins)

    @jax.jit
    def _gc_correct_jit(counts, strata, valid):
        """Per-1%-GC-stratum correction (cnvnator model): stratum mean →
        factor mean/stratum_mean for strata with ≥20 bins."""
        used = valid
        usedf = used.astype(jnp.float32)
        total = jnp.sum(counts * usedf)
        ncnt = jnp.sum(usedf)
        mean = total / jnp.maximum(ncnt, 1.0)
        ssum = jax.ops.segment_sum(counts * usedf, strata, num_segments=101)
        scnt = jax.ops.segment_sum(usedf, strata, num_segments=101)
        smean = ssum / jnp.maximum(scnt, 1.0)
        corr = jnp.where((scnt >= 20) & (smean > 0),
                         mean / jnp.maximum(smean, 1e-12), 1.0)
        corrected = counts * corr[strata] * usedf
        return corrected, mean

    @functools.partial(jax.jit, static_argnames=("h",))
    def _mean_shift_scale_jit(x, mean, h):
        """One mean-shift scale (bandwidth h bins), iterated to a fixed
        point: gradient of the kernel density in (position, signal)
        space → segment boundaries where attraction changes direction →
        bins replaced by their segment means.  Signal bandwidth is
        depth-dependent (Poisson: var ≈ depth), CNVnator's model
        [external knowledge: Abyzov 2011; contract
        bin/cnvnator_wrapper.py:128-135]."""
        n = x.shape[0]
        offs = jnp.arange(-h, h + 1, dtype=jnp.float32)
        posw = jnp.exp(-0.5 * (offs / (h / 2.0)) ** 2)

        def window(xv):
            xp = jnp.pad(xv, (h, h), mode="edge")
            return jnp.stack([xp[i:i + n] for i in range(2 * h + 1)], axis=1)

        def one(xv):
            win = window(xv)                              # (n, K)
            sig2 = jnp.maximum((xv[:, None] + win) * 0.5, mean * 0.125)
            wgt = posw[None, :] * jnp.exp(
                -0.5 * (win - xv[:, None]) ** 2 / sig2)
            grad = (wgt * offs[None, :]).sum(axis=1)      # (n,)
            # boundary between i-1 and i: i-1 pulled left, i pulled right
            gl = jnp.concatenate([jnp.zeros(1), grad[:-1]])
            b = ((gl < 0) & (grad > 0)).astype(jnp.int32)
            b = b.at[0].set(0)
            seg = jnp.cumsum(b)
            ssum = jax.ops.segment_sum(xv, seg, num_segments=n)
            scnt = jax.ops.segment_sum(jnp.ones_like(xv), seg, num_segments=n)
            return (ssum / jnp.maximum(scnt, 1.0))[seg]

        def cond(state):
            xv, xprev, it = state
            return (it < 30) & (jnp.max(jnp.abs(xv - xprev)) > 1e-3 * mean)

        def body(state):
            xv, _, it = state
            return one(xv), xv, it + 1

        x0 = one(x)
        xf, _, _ = jax.lax.while_loop(cond, body, (x0, x, jnp.int32(1)))
        return xf

    def mean_shift_partition(x: np.ndarray, mean: float,
                             scales=(2, 4, 8, 16, 32, 64, 128)) -> np.ndarray:
        """Multi-scale mean-shift partition of one chromosome's corrected
        depth profile (device)."""
        if len(x) == 0:
            return x
        xv = jnp.asarray(x, jnp.float32)
        m = jnp.float32(max(mean, 1e-9))
        for h in scales:
            if 2 * h + 1 >= len(x):
                break
            xv = _mean_shift_scale_jit(xv, m, h)
        return np.asarray(xv, np.float64)
