"""Device-resident site genotyping: the FreeBayes numeric core as one
jitted XLA program.

The reference fans freebayes processes over genome windows
(/root/reference/bin/speedseq:704-719); each process walks its pileup and
computes per-sample genotype likelihoods, best genotypes, and site QUAL in
C++ doubles.  Here the entire numeric core — per-read GL terms, per-sample
segment reductions, genotype masking/normalization, GQ, posterior QUAL,
and per-alt placement/strand balance — is a single fused device program
over (sites, reads) batch arrays:

  obs     (S, R) int8   read observation per site: -1 none, 0 ref, k alt k
  quals   (S, R) f32    phred observation quality
  sample  (R,)   int32  VCF sample column per read
  rpos    (S, R) int32  read-coordinate position at the site anchor (-1)
  strand  (R,)   int8   1 = reverse
  n_alts  (S,)   int32  live ALT count per site

Per-sample reductions are one-hot matmuls (MXU work, no host loops);
shapes are padded to fixed buckets so XLA compiles once per
(S-bucket, R-bucket, n_samples).  The host keeps only candidate/locus
construction (var.caller) and VCF text emission.

Multi-chip: sites are embarrassingly parallel (the reference's window
fan-out is too), so `genotype_sites_sharded` shard_maps the S axis over
the mesh data axis with reads replicated per shard.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .caller_space import GT_PAIRS, MAX_ALTS, N_GT

_PAIR_J = np.array([j for j, _ in GT_PAIRS], np.int32)
_PAIR_K = np.array([k for _, k in GT_PAIRS], np.int32)
_PAIR_MAX = np.maximum(_PAIR_J, _PAIR_K)
_PAIR_NONREF = ((_PAIR_J > 0).astype(np.int32)
                + (_PAIR_K > 0).astype(np.int32))


class SiteGenotypes(NamedTuple):
    """Device outputs (all numpy after fetch); M = n_samples, A = MAX_ALTS."""

    gl: np.ndarray       # (S, M, G) f32 max-normalized log10 GL
    gt_idx: np.ndarray   # (S, M) int32 best genotype index into GT_PAIRS
    gq: np.ndarray       # (S, M) int32
    qual: np.ndarray     # (S,) f32 phred posterior P(polymorphic)
    dp: np.ndarray       # (S, M) int32
    ro: np.ndarray       # (S, M) int32
    ao: np.ndarray       # (S, M, A) int32
    qr: np.ndarray       # (S, M) int32
    qa: np.ndarray       # (S, M, A) int32
    rpl: np.ndarray      # (S, A) int32
    rpr: np.ndarray      # (S, A) int32
    saf: np.ndarray      # (S, A) int32
    sar: np.ndarray      # (S, A) int32
    joint: "JointGenotypes | None" = None  # pooled-discrete extras


@functools.partial(jax.jit, static_argnames=("n_samples", "pooled"))
def _genotype_sites_jit(
    obs: jnp.ndarray,        # (S, R) int8
    quals: jnp.ndarray,      # (S, R) f32
    sample: jnp.ndarray,     # (S, R) int32 — per-site read columns
    rpos: jnp.ndarray,       # (S, R) int32
    strand: jnp.ndarray,     # (S, R) int8
    rlen_half: jnp.ndarray,  # (S, R) f32
    n_alts: jnp.ndarray,     # (S,) int32
    theta: jnp.ndarray,      # () f32
    lp_joint: jnp.ndarray,   # (G, G) f32 ESF joint prior (pooled mode)
    n_samples: int,
    pooled: bool = False,
):
    """R here is the per-site COMPACTED read axis (only covering reads,
    gathered by the host wrapper) — a window holds tens of thousands of
    reads but each site is covered by ~depth of them, so the dense
    (sites × all-window-reads) formulation wasted ~100-500× compute and
    HBM on obs==-1 columns."""
    S, R = obs.shape
    A = MAX_ALTS
    G = N_GT
    e = jnp.power(10.0, -quals / 10.0)                    # (S, R)
    alleles = jnp.arange(A + 1, dtype=obs.dtype)
    match = obs[..., None] == alleles                      # (S, R, A+1)
    p = jnp.where(match, (1.0 - e)[..., None], (e / 3.0)[..., None])
    cover = obs >= 0
    eps = jnp.float32(1e-30)
    pj = p[..., jnp.asarray(_PAIR_J)]                      # (S, R, G)
    pk = p[..., jnp.asarray(_PAIR_K)]
    terms = jnp.where(cover[..., None],
                      jnp.log10(0.5 * pj + 0.5 * pk + eps), 0.0)

    onehot = (sample[..., None] ==
              jnp.arange(n_samples)[None, None, :]).astype(jnp.float32)
    # per-sample GL: per-site matmul over the read axis (MXU)
    gl = jnp.einsum("srg,srm->smg", terms, onehot,
                    preferred_element_type=jnp.float32)    # (S, M, G)

    covf = cover.astype(jnp.float32)
    reff = (obs == 0).astype(jnp.float32)
    dp = jnp.einsum("sr,srm->sm", covf, onehot).astype(jnp.int32)
    ro = jnp.einsum("sr,srm->sm", reff, onehot).astype(jnp.int32)
    qr = jnp.einsum("sr,srm->sm", reff * quals, onehot).astype(jnp.int32)
    altf = (obs[..., None] ==
            (1 + jnp.arange(A, dtype=obs.dtype))).astype(jnp.float32)
    ao = jnp.einsum("sra,srm->sma", altf, onehot).astype(jnp.int32)
    qa = jnp.einsum("sra,srm->sma", altf * quals[..., None],
                    onehot).astype(jnp.int32)

    # per-alt placement / strand balance (pooled over samples)
    placed = altf * (rpos >= 0)[..., None].astype(jnp.float32)
    left = (rpos.astype(jnp.float32) < rlen_half)
    rpl = jnp.sum(placed * left[..., None].astype(jnp.float32),
                  axis=1).astype(jnp.int32)                 # (S, A)
    rpr = jnp.sum(placed, axis=1).astype(jnp.int32) - rpl
    fwd = (strand == 0).astype(jnp.float32)[..., None]
    saf = jnp.sum(altf * fwd, axis=1).astype(jnp.int32)
    sar = jnp.sum(altf, axis=1).astype(jnp.int32) - saf

    # genotype-space masking for each site's live ALT count
    invalid = jnp.asarray(_PAIR_MAX)[None, :] > n_alts[:, None]   # (S, G)
    neg = jnp.float32(-1e9)
    gl = jnp.where(invalid[:, None, :], neg, gl)
    gl_norm = gl - jnp.max(gl, axis=2, keepdims=True)

    gt_idx = jnp.argmax(gl_norm, axis=2).astype(jnp.int32)
    top2, _ = jax.lax.top_k(jnp.where(gl_norm < -1e8, -jnp.inf, gl_norm), 2)
    gq = jnp.minimum(
        99, jnp.round(10.0 * (top2[..., 0]
                              - jnp.maximum(top2[..., 1], -1e9)))
    ).astype(jnp.int32)

    # posterior QUAL under the site-heterozygosity prior
    lp = jnp.asarray(_PAIR_NONREF, jnp.float32) * jnp.log10(theta)  # (G,)
    w = jnp.where(gl_norm < -1e8, -jnp.inf, gl_norm + lp[None, None, :])
    wmax = jnp.max(w, axis=2, keepdims=True)
    logz = wmax[..., 0] + jnp.log10(
        jnp.sum(jnp.power(10.0, w - wmax), axis=2))
    log_p0 = (gl_norm[:, :, 0] + lp[0]) - logz             # (S, M)
    qual = jnp.minimum(1e5, -10.0 * jnp.sum(log_p0, axis=1))

    # pooled-discrete joint genotype combination over [normal, tumor]:
    # computed INSIDE the same program so somatic pays zero extra device
    # dispatches or host fetches (a separate joint program's 4 extra
    # leaf fetches per window were ~20% of somatic wall time on the
    # relay, docs/PERF_NOTES.md)
    if pooled:
        j_gn, j_gt, j_gq, j_qual = _pooled_joint_core(gl_norm, lp_joint)
        joint_i = jnp.concatenate(
            [j_gn[:, None], j_gt[:, None], j_gq], axis=1)   # (S, 4)
    else:
        S_ = gl_norm.shape[0]
        j_qual = jnp.zeros((S_,), jnp.float32)
        joint_i = jnp.zeros((S_, 4), jnp.int32)

    # pack into TWO leaves: per-LEAF host fetches cost ~10-30 ms of
    # relay latency (docs/PERF_NOTES.md) and this program runs once per
    # window.  f_out = [gl flat | site qual | joint qual]; i_out =
    # [i_sm flat | rpl rpr saf sar | joint gn gt gq2].
    i_sm = jnp.concatenate([
        gt_idx[..., None], gq[..., None], dp[..., None], ro[..., None],
        qr[..., None], ao, qa], axis=2)                     # (S, M, 5+2A)
    S_, M_ = i_sm.shape[0], i_sm.shape[1]
    f_out = jnp.concatenate(
        [gl_norm.reshape(S_, -1), qual[:, None], j_qual[:, None]], axis=1)
    i_out = jnp.concatenate(
        [i_sm.reshape(S_, -1), rpl, rpr, saf, sar, joint_i], axis=1)
    return f_out, i_out


def _pooled_joint_core(gl, lp):
    """Joint discrete [normal, tumor] genotype combination (traced body
    shared by the fused program and the standalone `_pooled_joint_jit`).

    gl: (S, 2, G) max-normalized log10 per-sample GLs (invalid genotype
    slots ≈ -1e9); lp: (G, G) log10 combination prior.  Evaluates the
    full G×G joint posterior — the discrete space freebayes
    --pooled-discrete searches (/root/reference/bin/speedseq:1059-1067)
    — instead of independent per-sample argmaxes."""
    S, _, G = gl.shape
    jl = gl[:, 0, :, None] + gl[:, 1, None, :] + lp[None]    # (S, G, G)
    flat = jl.reshape(S, G * G)
    best = jnp.argmax(flat, axis=1)
    gn = (best // G).astype(jnp.int32)
    gt = (best % G).astype(jnp.int32)
    m = jnp.max(flat, axis=1)
    logz = m + jnp.log10(jnp.sum(jnp.power(10.0, flat - m[:, None]), axis=1))

    def log10sumexp(x, axis):
        mm = jnp.max(x, axis=axis)
        return mm + jnp.log10(jnp.sum(
            jnp.power(10.0, x - jnp.expand_dims(mm, axis)), axis=axis))

    marg_n = log10sumexp(jl, 2)                              # (S, G)
    marg_t = log10sumexp(jl, 1)

    def gq_of(marg):
        top2, _ = jax.lax.top_k(marg, 2)
        return jnp.minimum(
            99, jnp.round(10.0 * (top2[..., 0] - top2[..., 1]))
        ).astype(jnp.int32)

    gq = jnp.stack([gq_of(marg_n), gq_of(marg_t)], axis=1)   # (S, 2)
    qual = jnp.minimum(1e5, -10.0 * (jl[:, 0, 0] - logz))
    return gn, gt, gq, qual


def _pad_axis(x: np.ndarray, axis: int, target: int, fill=0) -> np.ndarray:
    n = x.shape[axis]
    if n == target:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - n)
    return np.pad(x, pad, constant_values=fill)


def _bucket(n: int, mult: int) -> int:
    return max(mult, ((n + mult - 1) // mult) * mult)


def compact_site_reads(
    obs: np.ndarray,
    quals: np.ndarray,
    sample: np.ndarray,     # (R,) per-window-read sample column
    rpos: np.ndarray,
    strand: np.ndarray,     # (R,)
    rlen_half: np.ndarray,  # (R,)
):
    """Per-site read compaction: gather each site's covering reads to
    the front and truncate the read axis to the (128-bucketed) max
    coverage — a window's read set is 100-1000× larger than any one
    site's coverage (docs/PERF_NOTES.md r4).  Returns the 6 compacted
    (S, Rc) arrays."""
    obs = np.asarray(obs, np.int8)
    quals = np.asarray(quals, np.float32)
    rpos = np.asarray(rpos, np.int32)
    sample = np.asarray(sample, np.int32)
    strand = np.asarray(strand, np.int8)
    rlen_half = np.asarray(rlen_half, np.float32)
    S, R = obs.shape
    cover = obs >= 0
    n_cov = cover.sum(axis=1)
    max_cov = int(n_cov.max()) if S else 0
    Rc = min(R, _bucket(max(max_cov, 1), 128))
    # stable partition via row-major nonzero ranks — O(nnz): within
    # each site row, nonzero() yields covering reads in read order,
    # so a read's destination slot is its index minus the row start
    idx = np.zeros((S, Rc), np.int32)
    s_i, r_i = np.nonzero(cover)
    row_start = np.zeros(S, np.int64)
    np.cumsum(n_cov[:-1], out=row_start[1:])
    dst = np.arange(len(s_i), dtype=np.int64) - row_start[s_i]
    keepm = dst < Rc
    idx[s_i[keepm], dst[keepm]] = r_i[keepm]
    obs = np.take_along_axis(obs, idx, 1)
    # slots beyond a site's coverage gathered read 0's values —
    # force them back to "no observation"
    invalid = np.arange(Rc)[None, :] >= n_cov[:, None]
    obs[invalid] = -1
    quals = np.take_along_axis(quals, idx, 1)
    rpos = np.take_along_axis(rpos, idx, 1)
    rpos[invalid] = -1
    return (obs, quals, sample[idx], rpos, strand[idx], rlen_half[idx])


def slice_genotypes(g: "SiteGenotypes", lo: int, hi: int) -> "SiteGenotypes":
    """Site-axis slice of a (possibly multi-window batched) result."""
    joint = None
    if g.joint is not None:
        joint = JointGenotypes(
            gn=g.joint.gn[lo:hi], gt=g.joint.gt[lo:hi],
            gq=g.joint.gq[lo:hi], qual=g.joint.qual[lo:hi])
    return SiteGenotypes(
        gl=g.gl[lo:hi], gt_idx=g.gt_idx[lo:hi], gq=g.gq[lo:hi],
        qual=g.qual[lo:hi], dp=g.dp[lo:hi], ro=g.ro[lo:hi],
        ao=g.ao[lo:hi], qr=g.qr[lo:hi], qa=g.qa[lo:hi],
        rpl=g.rpl[lo:hi], rpr=g.rpr[lo:hi], saf=g.saf[lo:hi],
        sar=g.sar[lo:hi], joint=joint)


def genotype_sites(
    obs: np.ndarray,
    quals: np.ndarray,
    sample: np.ndarray,
    rpos: np.ndarray,
    strand: np.ndarray,
    rlen_half: np.ndarray,
    n_alts: np.ndarray,
    theta: float,
    n_samples: int,
    mesh=None,
    pooled: bool = False,
) -> SiteGenotypes:
    """Host wrapper: compact the read axis per site (only covering
    reads), bucket-pad, run the fused device program, slice back.

    ``sample``/``strand``/``rlen_half`` may be (R,) per-window-read
    arrays (compacted here together with obs) or pre-compacted (S, R)
    arrays.  ``mesh`` (parallel.mesh) shards the site axis over the
    data axis — the TPU counterpart of the reference's per-window
    process fan-out."""
    obs = np.asarray(obs, np.int8)
    quals = np.asarray(quals, np.float32)
    rpos = np.asarray(rpos, np.int32)
    sample = np.asarray(sample, np.int32)
    strand = np.asarray(strand, np.int8)
    rlen_half = np.asarray(rlen_half, np.float32)
    if sample.ndim == 1:
        obs, quals, sample, rpos, strand, rlen_half = compact_site_reads(
            obs, quals, sample, rpos, strand, rlen_half)
    S, R = obs.shape
    Sp = _bucket(S, 64)
    Rp = _bucket(R, 128)
    if mesh is not None:
        Sp = _bucket(Sp, 64 * mesh.devices.size)
    obs_p = _pad_axis(_pad_axis(obs, 0, Sp, -1), 1, Rp, -1).astype(np.int8)
    q_p = _pad_axis(_pad_axis(quals, 0, Sp, 1.0), 1, Rp, 1.0
                    ).astype(np.float32)
    rpos_p = _pad_axis(_pad_axis(rpos, 0, Sp, -1), 1, Rp, -1
                       ).astype(np.int32)
    sam_p = _pad_axis(_pad_axis(sample, 0, Sp, -1), 1, Rp, -1)
    str_p = _pad_axis(_pad_axis(strand, 0, Sp, 0), 1, Rp, 0)
    rl_p = _pad_axis(_pad_axis(rlen_half, 0, Sp, 1.0), 1, Rp, 1.0)
    na_p = _pad_axis(np.asarray(n_alts, np.int32), 0, Sp, MAX_ALTS)

    pooled = bool(pooled and n_samples == 2)
    lp = jnp.asarray(_esf_log_prior_table(float(theta))) if pooled else (
        jnp.zeros((N_GT, N_GT), jnp.float32))
    args = (obs_p, q_p, sam_p, rpos_p, str_p, rl_p, na_p,
            jnp.float32(theta), lp)
    if mesh is None:
        out = _genotype_sites_jit(*args, n_samples=n_samples, pooled=pooled)
    else:
        out = _genotype_sites_sharded(mesh, args, n_samples, pooled)
    f_out, i_out = jax.device_get(out)   # ONE fetch, 2 leaves
    A = MAX_ALTS
    G = N_GT
    M = n_samples
    f_out, i_out = f_out[:S], i_out[:S]
    gl = f_out[:, : M * G].reshape(S, M, G)
    qual = f_out[:, M * G]
    w = 5 + 2 * A
    i_sm = i_out[:, : M * w].reshape(S, M, w)
    i_sa = i_out[:, M * w : M * w + 4 * A]
    joint = None
    if pooled:
        j_i = i_out[:, M * w + 4 * A :]
        joint = JointGenotypes(
            gn=j_i[:, 0], gt=j_i[:, 1], gq=j_i[:, 2:4],
            qual=f_out[:, M * G + 1])
    return SiteGenotypes(
        gl=gl, gt_idx=i_sm[..., 0], gq=i_sm[..., 1], qual=qual,
        dp=i_sm[..., 2], ro=i_sm[..., 3], qr=i_sm[..., 4],
        ao=i_sm[..., 5:5 + A], qa=i_sm[..., 5 + A:5 + 2 * A],
        rpl=i_sa[:, :A], rpr=i_sa[:, A:2 * A],
        saf=i_sa[:, 2 * A:3 * A], sar=i_sa[:, 3 * A:],
        joint=joint,
    )


# ---------------------------------------------------------------------------
# pooled-discrete joint genotyping (somatic [normal, tumor])
# ---------------------------------------------------------------------------

class JointGenotypes(NamedTuple):
    gn: np.ndarray     # (S,) best normal genotype index (joint argmax)
    gt: np.ndarray     # (S,) best tumor genotype index
    gq: np.ndarray     # (S, 2) marginal genotype qualities
    qual: np.ndarray   # (S,) phred P(polymorphic) under the joint model


@functools.lru_cache(maxsize=8)
def _esf_log_prior_table(theta: float) -> np.ndarray:
    """(G, G) log10 prior over [normal, tumor] genotype combinations
    from the Ewens sampling formula on the pooled allele partition of
    the 4 chromosomes [external knowledge: freebayes models
    genotype-combination priors with the ESF; contract
    /root/reference/bin/speedseq:1059-1067 --pooled-discrete].

    For a combination whose pooled allele multiplicities are c_j with
    a_k = #{j : c_j = k}:  log10 P = Σ_j (log10 θ − log10 c_j)
    − Σ_k log10 a_k!  (the configuration-independent n!/θ_(n) factor
    cancels in argmax and normalization).  Unlike the factorized
    per-sample prior, this couples the samples: a shared alt allele
    (one allele, count 2) is favored over two distinct singleton alts
    (two θ factors)."""
    import math
    from collections import Counter

    G = N_GT
    lt = math.log10(theta)
    lp = np.zeros((G, G))
    for gn_i in range(G):
        for gt_i in range(G):
            cnt = Counter(list(GT_PAIRS[gn_i]) + list(GT_PAIRS[gt_i]))
            mult = Counter(cnt.values())
            v = sum(lt - math.log10(c) for c in cnt.values())
            v -= sum(math.log10(math.factorial(a)) for a in mult.values())
            lp[gn_i, gt_i] = v
    return lp.astype(np.float32)


@jax.jit
def _pooled_joint_jit(gl, lp):
    """Standalone jit over `_pooled_joint_core` (kept for consumers that
    already hold per-sample GLs; the var/somatic engine runs the joint
    inside the fused `_genotype_sites_jit` program instead)."""
    return _pooled_joint_core(gl, lp)


def pooled_joint_genotypes(gl: np.ndarray, theta: float) -> JointGenotypes:
    """Host wrapper over the joint kernel.  The site axis is padded to a
    64-bucket so XLA compiles once per bucket, not once per distinct
    window site count (a fresh compile per window made somatic ~5×
    slower than var on the relay)."""
    S = gl.shape[0]
    Sp = _bucket(S, 64)
    gl_p = _pad_axis(np.asarray(gl, np.float32), 0, Sp, 0.0)
    lp = jnp.asarray(_esf_log_prior_table(float(theta)))
    gn, gt, gq, qual = (np.asarray(x) for x in
                        _pooled_joint_jit(jnp.asarray(gl_p), lp))
    return JointGenotypes(
        gn=gn[:S], gt=gt[:S], gq=gq[:S], qual=qual[:S])


def _genotype_sites_sharded(mesh, args, n_samples: int,
                            pooled: bool = False):
    """shard_map over the site axis: sites to shards, reads replicated
    (the genomic-window fan-out of bin/speedseq:719 mapped onto the mesh;
    no cross-site communication exists in the model, so the only
    collective is the implicit output all-gather)."""
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map  # JAX ≥ 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map  # type: ignore

    obs_p, q_p, sam_p, rpos_p, str_p, rl_p, na_p, theta, lp = args
    s_axis = P("data")
    rep = P()
    kw = {}
    import inspect
    if "check_rep" in inspect.signature(shard_map).parameters:
        kw["check_rep"] = False
    fn = shard_map(
        functools.partial(_genotype_sites_jit, n_samples=n_samples,
                          pooled=pooled),
        mesh=mesh,
        # every per-read array is per-site compacted now → site-sharded
        in_specs=(s_axis, s_axis, s_axis, s_axis, s_axis, s_axis,
                  s_axis, rep, rep),
        out_specs=(s_axis,) * 2,
        **kw,
    )
    return jax.jit(fn)(obs_p, q_p, sam_p, rpos_p, str_p, rl_p, na_p,
                       theta, lp)
