"""Alignment orchestration: seeds → chains → SW extension → candidates.

Device side (jitted): seeding, chaining, batched SW extension over the
top-K chains per read.  Host side: candidate selection, MAPQ, pairing —
cheap O(B·K²) bookkeeping kept off the accelerator, mirroring how the
reference keeps BWA's pair logic on the CPU driver thread while the DP
inner loops dominate (bin/speedseq:438 contract).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..index.fm import FMIndex, get_ref_window, get_ref_window_packed
from .seeding import find_seeds
from .chain import chain_seeds, chain_seeds_nms
from .sw import banded_sw, SWParams, SWResult

PAD = 44  # ref-window slack each side of the chain anchor diagonal
# windows start 16-aligned (word-gather path, index.fm.get_ref_window_packed)
# so W carries +16 alignment slack; W = L + 2*PAD + 16 ≤ 256 up to L=151


class Candidates(NamedTuple):
    """Top-K alignment candidates per read; device arrays (B, K, ...)."""

    pos: jnp.ndarray       # (B, K) int32 leftmost genome pos (fwd strand)
    strand: jnp.ndarray    # (B, K) int32
    score: jnp.ndarray     # (B, K) int32 SW score (0 = no alignment)
    qbeg: jnp.ndarray      # (B, K) int32 strand-frame query start
    qend: jnp.ndarray      # (B, K)
    rend_pos: jnp.ndarray  # (B, K) int32 genome end pos (exclusive)
    cigar_ops: jnp.ndarray  # (B, K, MAX_OPS) int8
    cigar_len: jnp.ndarray  # (B, K, MAX_OPS) int32
    n_ops: jnp.ndarray     # (B, K)
    seed_cov: jnp.ndarray  # (B, K) chain weight (seed coverage)
    refwin: jnp.ndarray    # (B, K, W) uint8 ref window (for NM/MD on host)
    rstart: jnp.ndarray    # (B, K) int32 window genome start
    nm: jnp.ndarray        # (B, K) int32 edit distance from the kernel
    # traceback (-1 = unknown: host derives NM/MD from refwin)


def revcomp_reads(reads: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Per-read reverse complement honoring per-read length; padding 4."""
    B, L = reads.shape
    idx = lengths[:, None] - 1 - jnp.arange(L, dtype=jnp.int32)[None, :]
    safe = jnp.clip(idx, 0, L - 1)
    vals = jnp.take_along_axis(reads, safe, axis=1)
    comp = jnp.where(vals < 4, 3 - vals, vals)
    return jnp.where(idx >= 0, comp, jnp.int32(4))


@functools.partial(
    jax.jit,
    static_argnames=("n_chains", "stride", "min_seed_len", "max_hits", "params"),
)
def align_candidates(
    fm: FMIndex,
    reads: jnp.ndarray,    # (B, L) uint8/int32 codes
    lengths: jnp.ndarray,  # (B,) int32
    n_chains: int = 4,
    stride: int = 8,
    min_seed_len: int = 19,
    max_hits: int = 4,
    params: SWParams = SWParams(),
) -> Candidates:
    B, L = reads.shape
    reads = reads.astype(jnp.int32)
    seeds = find_seeds(
        fm, reads, lengths, stride=stride, min_seed_len=min_seed_len,
        max_hits=max_hits,
    )
    chains = chain_seeds(seeds, L, k=n_chains)
    K = n_chains
    W = L + 2 * PAD + 16

    reads_rc = revcomp_reads(reads, lengths)
    strand = chains.strand  # (B, K)
    q_fwd = jnp.broadcast_to(reads[:, None, :], (B, K, L))
    q_rc = jnp.broadcast_to(reads_rc[:, None, :], (B, K, L))
    queries = jnp.where(strand[..., None] == 1, q_rc, q_fwd).reshape(B * K, L)

    rstart = ((chains.anchor_rpos - chains.anchor_qpos - PAD) >> 4) << 4
    refwin = get_ref_window_packed(fm, rstart.reshape(-1), W)  # (B*K, W)

    qlen = jnp.broadcast_to(lengths[:, None], (B, K)).reshape(-1)
    sw = banded_sw(queries, qlen, refwin.astype(jnp.int32), params=params)

    valid = chains.valid.reshape(-1)
    score = jnp.where(valid, sw.score, 0).reshape(B, K)
    pos = (rstart.reshape(-1) + sw.rbeg).reshape(B, K)
    rend_pos = (rstart.reshape(-1) + sw.rend).reshape(B, K)
    return Candidates(
        pos=pos,
        strand=strand,
        score=score,
        qbeg=sw.qbeg.reshape(B, K),
        qend=sw.qend.reshape(B, K),
        rend_pos=rend_pos,
        cigar_ops=sw.cigar_ops.reshape(B, K, -1),
        cigar_len=sw.cigar_len.reshape(B, K, -1),
        n_ops=sw.n_ops.reshape(B, K),
        seed_cov=chains.weight,
        refwin=refwin.reshape(B, K, W),
        rstart=rstart,
        nm=jnp.full((B, K), -1, jnp.int32),
    )


class ScoredChains(NamedTuple):
    """Phase-1 output: chain candidates with SW scores but no traceback.

    All (B, K) device arrays; query spans are in strand frame.
    """

    pos: jnp.ndarray        # leftmost genome pos estimate (rend - aligned span)
    rend_pos: jnp.ndarray   # genome end pos (exclusive) of the best cell
    strand: jnp.ndarray
    score: jnp.ndarray
    anchor_rpos: jnp.ndarray
    anchor_qpos: jnp.ndarray
    qspan_beg: jnp.ndarray
    qspan_end: jnp.ndarray
    qend: jnp.ndarray       # query end (exclusive) of best cell
    valid: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_chains", "stride", "min_seed_len", "max_hits", "params", "use_pallas"
    ),
)
def score_candidates(
    fm: FMIndex,
    reads: jnp.ndarray,
    lengths: jnp.ndarray,
    n_chains: int = 4,
    stride: int = 8,
    min_seed_len: int = 19,
    max_hits: int = 4,
    params: SWParams = SWParams(),
    use_pallas: bool = False,
    kidx=None,
) -> ScoredChains:
    """Phase 1: seed → chain → score-only SW over all K chains/read.

    When ``kidx`` (index.kmer.KmerIndex) is given, seeding uses the dense
    hash-bucket k-mer index (~18× faster on-device than the FM SMEM loop,
    docs/PERF_NOTES.md); otherwise the FM path runs.
    """
    from .sw import banded_sw_score, banded_sw_score_pallas
    from ..index.kmer import find_seeds_hash

    B, L = reads.shape
    reads = reads.astype(jnp.int32)
    if kidx is not None:
        seeds = find_seeds_hash(
            kidx, reads, lengths, k=min_seed_len, stride=stride,
            max_hits=max_hits,
        )
        chains = chain_seeds_nms(seeds, L, k=n_chains)
    else:
        seeds = find_seeds(
            fm, reads, lengths, stride=stride, min_seed_len=min_seed_len,
            max_hits=max_hits,
        )
        chains = chain_seeds(seeds, L, k=n_chains)
    K = n_chains
    W = L + 2 * PAD + 16
    reads_rc = revcomp_reads(reads, lengths)
    strand = chains.strand
    q_fwd = jnp.broadcast_to(reads[:, None, :], (B, K, L))
    q_rc = jnp.broadcast_to(reads_rc[:, None, :], (B, K, L))
    queries = jnp.where(strand[..., None] == 1, q_rc, q_fwd).reshape(B * K, L)
    rstart = ((chains.anchor_rpos - chains.anchor_qpos - PAD) >> 4) << 4
    refwin = get_ref_window_packed(fm, rstart.reshape(-1), W)
    qlen = jnp.broadcast_to(lengths[:, None], (B, K)).reshape(-1)
    if use_pallas:
        Wp = ((W + 127) // 128) * 128
        refp = jnp.pad(
            refwin.astype(jnp.int32), ((0, 0), (0, Wp - W)), constant_values=4
        )
        sw = banded_sw_score_pallas(queries, qlen, refp, params=params)
    else:
        sw = banded_sw_score(
            queries, qlen, refwin.astype(jnp.int32), params=params
        )
    score = jnp.where(chains.valid.reshape(-1), sw.score, 0).reshape(B, K)
    rend_pos = (rstart.reshape(-1) + sw.rend).reshape(B, K)
    span = jnp.minimum(sw.qend, sw.rend)  # crude aligned-span floor
    pos_est = rend_pos - span.reshape(B, K)
    return ScoredChains(
        pos=jnp.maximum(pos_est, rstart),
        rend_pos=rend_pos,
        strand=strand,
        score=score,
        anchor_rpos=chains.anchor_rpos,
        anchor_qpos=chains.anchor_qpos,
        qspan_beg=chains.qspan_beg,
        qspan_end=chains.qspan_end,
        qend=sw.qend.reshape(B, K),
        valid=chains.valid,
    )


@functools.partial(jax.jit, static_argnames=("qlen",))
def device_estimate_distro(stats, fallback, qlen: int):
    """Insert-distro estimation ON DEVICE (mirrors
    pairing.InsertDistro.estimate: best FR placements, two-round 4σ
    trim, pairend_distro.py semantics).

    Returns a (4,) f32 [mean, std, low, high] that feeds the NEXT
    batch's fused step directly as a device array — the pipeline never
    waits on a host round-trip to estimate the distro, so batch 1's
    dispatch chains asynchronously behind batch 0's stats (the
    first-batch serialization this replaces cost ~0.9 s per run).
    ``fallback`` is returned when fewer than 8 usable pairs exist
    (previous rolling estimate)."""
    (pos1, str1, sc1, end1), (pos2, str2, sc2, end2) = stats
    b = jnp.arange(pos1.shape[0])
    k1 = jnp.argmax(sc1, axis=1)
    k2 = jnp.argmax(sc2, axis=1)
    p1, t1, s1, e1 = pos1[b, k1], str1[b, k1], sc1[b, k1], end1[b, k1]
    p2, t2, s2, e2 = pos2[b, k2], str2[b, k2], sc2[b, k2], end2[b, k2]
    good = (s1 > qlen // 2) & (s2 > qlen // 2) & (t1 != t2)
    left = jnp.minimum(p1, p2)
    right = jnp.maximum(e1, e2)
    isize = (right - left).astype(jnp.float32)
    fwd_first = jnp.where(p1 <= p2, t1 == 0, t2 == 0)
    good = good & fwd_first & (isize > 0) & (isize < 10000)

    def ms(mask):
        cnt = mask.sum()
        cf = jnp.maximum(cnt, 1).astype(jnp.float32)
        mf = mask.astype(jnp.float32)
        m = jnp.sum(isize * mf) / cf
        v = jnp.sum(((isize - m) ** 2) * mf) / cf
        return m, jnp.maximum(jnp.sqrt(v), 1.0), cnt

    m0, sd0, c0 = ms(good)
    mask1 = good & (jnp.abs(isize - m0) <= 4 * sd0)
    m1, sd1, _ = ms(mask1)
    mask2 = mask1 & (jnp.abs(isize - m1) <= 4 * sd1)
    m2, sd2, _ = ms(mask2)
    est = jnp.stack([
        m2, sd2,
        jnp.maximum(0.0, jnp.trunc(m2 - 4 * sd2)),
        jnp.trunc(m2 + 4 * sd2),
    ])
    return jnp.where(c0 >= 8, est, fallback)


@functools.partial(jax.jit, static_argnames=("params", "use_pallas"))
def extend_candidates(
    fm: FMIndex,
    reads: jnp.ndarray,
    lengths: jnp.ndarray,
    anchor_rpos: jnp.ndarray,   # (B, S) — selected chains (host-gathered)
    anchor_qpos: jnp.ndarray,   # (B, S)
    strand: jnp.ndarray,        # (B, S)
    params: SWParams = SWParams(),
    use_pallas: bool = False,
) -> Candidates:
    """Phase 2: full SW + traceback for the selected chains only."""
    B, L = reads.shape
    S = anchor_rpos.shape[1]
    reads = reads.astype(jnp.int32)
    W = L + 2 * PAD + 16
    reads_rc = revcomp_reads(reads, lengths)
    q_fwd = jnp.broadcast_to(reads[:, None, :], (B, S, L))
    q_rc = jnp.broadcast_to(reads_rc[:, None, :], (B, S, L))
    queries = jnp.where(strand[..., None] == 1, q_rc, q_fwd).reshape(B * S, L)
    rstart = ((anchor_rpos - anchor_qpos - PAD) >> 4) << 4
    refwin = get_ref_window_packed(fm, rstart.reshape(-1), W)
    qlen = jnp.broadcast_to(lengths[:, None], (B, S)).reshape(-1)
    if use_pallas:
        from .sw import banded_sw_pallas

        Wp = ((W + 127) // 128) * 128
        refp = jnp.pad(
            refwin.astype(jnp.int32), ((0, 0), (0, Wp - W)), constant_values=4
        )
        sw, nm = banded_sw_pallas(queries, qlen, refp, params=params,
                                  with_nm=True)
        nm = nm.reshape(B, S)
    else:
        sw = banded_sw(queries, qlen, refwin.astype(jnp.int32), params=params)
        nm = jnp.full((B, S), -1, jnp.int32)
    valid = (anchor_rpos >= 0).reshape(-1)
    score = jnp.where(valid, sw.score, 0).reshape(B, S)
    pos = (rstart.reshape(-1) + sw.rbeg).reshape(B, S)
    rend_pos = (rstart.reshape(-1) + sw.rend).reshape(B, S)
    return Candidates(
        pos=pos,
        strand=strand,
        score=score,
        qbeg=sw.qbeg.reshape(B, S),
        qend=sw.qend.reshape(B, S),
        rend_pos=rend_pos,
        cigar_ops=sw.cigar_ops.reshape(B, S, -1),
        cigar_len=sw.cigar_len.reshape(B, S, -1),
        n_ops=sw.n_ops.reshape(B, S),
        seed_cov=jnp.zeros((B, S), jnp.int32),
        refwin=refwin.reshape(B, S, W),
        rstart=rstart,
        nm=nm,
    )



@functools.partial(
    jax.jit,
    static_argnames=("n_chains", "stride", "min_seed_len", "max_hits"),
)
def weight_candidates(
    fm: FMIndex,
    reads: jnp.ndarray,
    lengths: jnp.ndarray,
    n_chains: int = 4,
    stride: int = 8,
    min_seed_len: int = 19,
    max_hits: int = 4,
    kidx=None,
) -> ScoredChains:
    """Phase 1 without any DP: chain weight (exact-match query coverage) as
    the selection score.  Seeds are exact matches, so weight·match is a
    tight upper bound on the chain's SW score for mostly-exact reads —
    good enough to pick pairs/primaries; the selected slots then get real
    scores + cigars from the single extension pass.  Cuts the phase-1
    SW kernel (~150 ms per 4k batch) out of the fused step entirely."""
    from ..index.kmer import find_seeds_hash

    B, L = reads.shape
    reads = reads.astype(jnp.int32)
    if kidx is not None:
        seeds = find_seeds_hash(
            kidx, reads, lengths, k=min_seed_len, stride=stride,
            max_hits=max_hits,
        )
        chains = chain_seeds_nms(seeds, L, k=n_chains)
    else:
        seeds = find_seeds(
            fm, reads, lengths, stride=stride, min_seed_len=min_seed_len,
            max_hits=max_hits,
        )
        chains = chain_seeds(seeds, L, k=n_chains)
    diag = chains.anchor_rpos - chains.anchor_qpos
    pos = diag + chains.qspan_beg
    rend = diag + chains.qspan_end
    score = jnp.where(chains.valid, chains.weight, 0)
    return ScoredChains(
        pos=pos,
        rend_pos=rend,
        strand=chains.strand,
        score=score,
        anchor_rpos=chains.anchor_rpos,
        anchor_qpos=chains.anchor_qpos,
        qspan_beg=chains.qspan_beg,
        qspan_end=chains.qspan_end,
        qend=chains.qspan_end,
        valid=chains.valid,
    )


def _device_choose(
    sc: ScoredChains,
    lengths: jnp.ndarray,
    chosen_k: Optional[jnp.ndarray],
    min_out_score: int = 30,
    mask_level: float = 0.5,
    match: int = 1,
):
    """Device-side candidate selection (mirrors choose_candidates)."""
    score, pos, rend = sc.score, sc.pos, sc.rend_pos
    B, K = score.shape
    bidx = jnp.arange(B)
    kp = chosen_k if chosen_k is not None else jnp.argmax(score, axis=1)
    sp = score[bidx, kp]
    posp = pos[bidx, kp][:, None]
    rendp = rend[bidx, kp][:, None]
    ovl = ~((rend <= posp) | (pos >= rendp))
    other = jnp.arange(K)[None, :] != kp[:, None]
    live = other & (score > 0)
    non_ovl = live & ~ovl
    sub = jnp.max(jnp.where(non_ovl, score, 0), axis=1)
    sub_n = jnp.sum(
        (non_ovl & (score >= (sp - 3 * match)[:, None])).astype(jnp.int32),
        axis=1,
    )
    qlen = lengths[:, None]
    ob = jnp.where(sc.strand == 1, qlen - sc.qspan_end, sc.qspan_beg)
    oe = jnp.where(sc.strand == 1, qlen - sc.qspan_beg, sc.qspan_end)
    pb = ob[bidx, kp][:, None]
    pe = oe[bidx, kp][:, None]
    qov = jnp.clip(jnp.minimum(pe, oe) - jnp.maximum(pb, ob), 0)
    shorter = jnp.maximum(1, jnp.minimum(pe - pb, oe - ob))
    split_ok = non_ovl & (score >= min_out_score) & (qov < mask_level * shorter)
    # slot 1 carries the best split piece when one exists, else the best
    # ref-disjoint query-overlapping secondary (→ host emits it as an XA
    # entry, bwa's secondary-alignment surface); the host tells them apart
    # from the extended cigars' query spans
    supp_score = jnp.where(split_ok, score, -1)
    sec_score = jnp.where(non_ovl & ~split_ok, score, -1)
    ks_split = jnp.argmax(supp_score, axis=1)
    ks_sec = jnp.argmax(sec_score, axis=1)
    has_split = supp_score[bidx, ks_split] > 0
    has_sec = sec_score[bidx, ks_sec] > 0
    ks = jnp.where(has_split, ks_split, ks_sec)
    has_supp = has_split | has_sec
    a_rpos = jnp.stack(
        [sc.anchor_rpos[bidx, kp],
         jnp.where(has_supp, sc.anchor_rpos[bidx, ks], -1)], axis=1
    )
    a_qpos = jnp.stack(
        [sc.anchor_qpos[bidx, kp],
         jnp.where(has_supp, sc.anchor_qpos[bidx, ks], 0)], axis=1
    )
    a_strand = jnp.stack(
        [sc.strand[bidx, kp],
         jnp.where(has_supp, sc.strand[bidx, ks], 0)], axis=1
    )
    # extra XA candidates: the chain table beyond slot 1 — non-overlapping
    # placements within 80% of the primary score (integer 5·s ≥ 4·sp form;
    # bwa's XA admission [external knowledge]), excluding the chosen and
    # slot-1 chains.  Compact-extended by the caller so XA can list up to
    # max_xa_hits placements and sub_n reflects the whole table.
    k_idx = jnp.arange(K)[None, :]
    is_slot1 = has_supp[:, None] & (k_idx == ks[:, None])
    xa_mask = (
        non_ovl & (score >= min_out_score)
        & (5 * score >= 4 * sp[:, None]) & ~is_slot1
    )
    return a_rpos, a_qpos, a_strand, sub, sub_n, xa_mask


def _device_pair_select(
    sc1: ScoredChains, sc2: ScoredChains, distro: jnp.ndarray,
    pen_unpaired: int = 17,
):
    """Device-side joint pair selection (mirrors pairing.joint_pair_select).

    distro: (4,) float32 [mean, std, low, high]."""
    # integer penalty math: float32 0.72·z² is FMA/fusion-sensitive — two
    # XLA compiles (e.g. fresh JIT vs a persisted AOT artifact) may round
    # the penalty differently and flip the pair argmax, breaking
    # cross-process record equality (tests/test_multihost.py).  The
    # floor-divide integer form is bit-stable everywhere.
    mean_i = jnp.round(distro[0]).astype(jnp.int32)
    # clamp keeps 100·std² inside int32 (overflow at std≥4634 would flip
    # the floor-divide sign and inflate pair scores); at std≥4000 the
    # z²-penalty is ≤1 for any |d|≤5000 anyway, so the clamp is lossless
    std_i = jnp.clip(jnp.round(distro[1]), 1, 4000).astype(jnp.int32)
    high_i = jnp.round(distro[3]).astype(jnp.int32)
    pos1 = sc1.pos[:, :, None]
    pos2 = sc2.pos[:, None, :]
    end1 = sc1.rend_pos[:, :, None]
    end2 = sc2.rend_pos[:, None, :]
    st1 = sc1.strand[:, :, None]
    st2 = sc2.strand[:, None, :]
    s1 = sc1.score[:, :, None]
    s2 = sc2.score[:, None, :]
    left = jnp.minimum(pos1, pos2)
    right = jnp.maximum(end1, end2)
    isize = (right - left).astype(jnp.int32)
    fwd_first = jnp.where(pos1 <= pos2, st1 == 0, st2 == 0)
    proper = (
        (st1 != st2) & fwd_first & (isize > 0)
        & (isize <= high_i + 4 * std_i) & (s1 > 0) & (s2 > 0)
    )
    # |d| clamp keeps 72·d² inside int32 (proper pairs have d ≪ 5000;
    # non-proper lanes never read z2_pen)
    d = jnp.clip(isize - mean_i, -5000, 5000)
    z2_pen = (72 * d * d) // (100 * std_i * std_i)   # ⌊0.72 z²⌋
    pen = jnp.where(
        proper,
        jnp.minimum(jnp.int32(pen_unpaired + 8), z2_pen),
        jnp.int32(pen_unpaired),
    )
    total = jnp.where(
        (s1 > 0) & (s2 > 0), s1 + s2 - pen,
        jnp.maximum(s1, s2) - pen_unpaired,
    )
    B, K, _ = total.shape
    flat = total.reshape(B, K * K)
    best = jnp.argmax(flat, axis=1).astype(jnp.int32)
    return best // K, best % K


def _mate_rescue(
    fm: FMIndex,
    cand,                     # Candidates of this end (post-extension)
    sc_self: ScoredChains,
    sc_other: ScoredChains,
    k_other: jnp.ndarray,     # (B,) mate's chosen candidate
    reads: jnp.ndarray,
    lengths: jnp.ndarray,
    distro: jnp.ndarray,      # (4,) [mean, std, low, high]
    params: SWParams,
    use_pallas: bool,
    min_out_score: int = 30,
):
    """bwa mem_matesw equivalent [external knowledge]: an end with NO seed
    chains whose mate aligned is Smith-Waterman-searched inside the mate's
    expected insert window, in the FR orientation opposite the mate.

    TPU shape: compact up to R = B//16 failed reads, extend each against 3
    window tiles (each extension window spans anchor ±PAD, so 3 tiles cover
    ~±130 bp around the insert-window center — best-effort for very wide
    distros), and scatter accepted hits back into slot 0."""
    from .sw import banded_sw_score, banded_sw_score_pallas

    B, L = reads.shape
    # rescue capacity: 1/32 of the batch per step (typical seed-failure
    # rates are <2%; overflow reads simply stay unmapped, as they would
    # without rescue)
    R = max(8, B // 32)
    bidx = jnp.arange(B)
    fail = jnp.max(sc_self.score, axis=1) <= 0
    mate_pos = sc_other.pos[bidx, k_other]
    mate_rend = sc_other.rend_pos[bidx, k_other]
    mate_strand = sc_other.strand[bidx, k_other]
    mate_ok = sc_other.score[bidx, k_other] > 0
    mask = fail & mate_ok
    # first-R compaction via cumsum scatter (cheaper than a top_k sort)
    csum = jnp.cumsum(mask.astype(jnp.int32)) - 1
    slot = jnp.where(mask & (csum < R), csum, R)      # R = dump slot
    idxs = jnp.zeros(R + 1, jnp.int32).at[slot].set(bidx)[:R]
    live = jnp.arange(R) < jnp.sum(mask.astype(jnp.int32))
    qlen_r = lengths[idxs]
    low, high = distro[2], distro[3]
    mp, mr, ms = mate_pos[idxs], mate_rend[idxs], mate_strand[idxs]
    # expected leftmost pos range of this read (FR orientation)
    lo_b = jnp.where(
        ms == 0, mp + low.astype(jnp.int32) - qlen_r,
        mr - high.astype(jnp.int32))
    hi_b = jnp.where(
        ms == 0, mp + high.astype(jnp.int32) - qlen_r,
        mr - low.astype(jnp.int32))
    lo_b = jnp.maximum(lo_b, 0)
    hi_b = jnp.maximum(hi_b, lo_b)
    t = (hi_b - lo_b).astype(jnp.float32)
    anchors = jnp.stack(
        [(lo_b + (t * f).astype(jnp.int32)) for f in (0.17, 0.5, 0.83)],
        axis=1,
    )                                                 # (R, 3)
    strand_r = jnp.broadcast_to((1 - ms)[:, None], (R, 3))
    reads_r = reads[idxs]
    # pass 1: score-only over the 3 window tiles (no traceback cost)
    W = L + 2 * PAD + 16
    reads_rc = revcomp_reads(reads_r, qlen_r)
    q3 = jnp.where(
        strand_r[..., None] == 1,
        jnp.broadcast_to(reads_rc[:, None, :], (R, 3, L)),
        jnp.broadcast_to(reads_r[:, None, :], (R, 3, L)),
    ).reshape(R * 3, L)
    rst3 = ((anchors - PAD) >> 4) << 4
    ref3 = get_ref_window_packed(fm, rst3.reshape(-1), W)
    ql3 = jnp.broadcast_to(qlen_r[:, None], (R, 3)).reshape(-1)
    if use_pallas:
        Wp = ((W + 127) // 128) * 128
        ref3p = jnp.pad(
            ref3.astype(jnp.int32), ((0, 0), (0, Wp - W)), constant_values=4)
        s3 = banded_sw_score_pallas(q3, ql3, ref3p, params=params)
    else:
        s3 = banded_sw_score(q3, ql3, ref3.astype(jnp.int32), params=params)
    score3 = s3.score.reshape(R, 3)
    jbest = jnp.argmax(score3, axis=1)                # (R,)
    ridx = jnp.arange(R)
    # pass 2: full traceback extension on the winning tile only
    resc = extend_candidates(
        fm, reads_r, qlen_r,
        anchors[ridx, jbest][:, None], jnp.zeros((R, 1), jnp.int32),
        strand_r[:, :1],
        params=params, use_pallas=use_pallas,
    )
    jbest = jnp.zeros(R, jnp.int32)
    rs = resc.score[ridx, jbest]
    accept = live & (rs >= min_out_score)
    # scatter accepted rescues into slot 0 of this end's candidates;
    # duplicate top_k padding lanes are masked by `accept`
    def put(dst, src):
        upd = jnp.where(accept, src, dst[idxs, 0])
        return dst.at[idxs, 0].set(upd)

    cand = cand._replace(
        pos=put(cand.pos, resc.pos[ridx, jbest]),
        strand=put(cand.strand, resc.strand[ridx, jbest]),
        score=put(cand.score, rs),
        qbeg=put(cand.qbeg, resc.qbeg[ridx, jbest]),
        qend=put(cand.qend, resc.qend[ridx, jbest]),
        rend_pos=put(cand.rend_pos, resc.rend_pos[ridx, jbest]),
        n_ops=put(cand.n_ops, resc.n_ops[ridx, jbest]),
        rstart=put(cand.rstart, resc.rstart[ridx, jbest]),
        nm=put(cand.nm, resc.nm[ridx, jbest]),
        cigar_ops=cand.cigar_ops.at[idxs, 0].set(
            jnp.where(accept[:, None], resc.cigar_ops[ridx, jbest],
                      cand.cigar_ops[idxs, 0])),
        cigar_len=cand.cigar_len.at[idxs, 0].set(
            jnp.where(accept[:, None], resc.cigar_len[ridx, jbest],
                      cand.cigar_len[idxs, 0])),
    )
    return cand


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_chains", "stride", "min_seed_len", "max_hits", "params",
        "use_pallas", "paired", "score_mode",
    ),
)
def fused_align_step(
    fm: FMIndex,
    reads1: jnp.ndarray,
    lengths1: jnp.ndarray,
    reads2: Optional[jnp.ndarray] = None,
    lengths2: Optional[jnp.ndarray] = None,
    distro: Optional[jnp.ndarray] = None,   # (4,) [mean, std, low, high]
    n_chains: int = 4,
    stride: int = 8,
    min_seed_len: int = 19,
    max_hits: int = 4,
    params: SWParams = SWParams(),
    use_pallas: bool = False,
    paired: bool = True,
    kidx=None,
    score_mode: str = "weight",  # "weight" (no phase-1 DP) | "sw"
):
    """One fully-fused device step: phase-1 scoring for both ends, joint
    pair selection, split detection, and phase-2 extension — a single
    dispatch + a single host transfer per batch (the relay's host↔device
    round trip is ~100 ms, so per-batch syncs dominate anything else)."""
    if score_mode == "weight":
        kw = dict(
            n_chains=n_chains, stride=stride, min_seed_len=min_seed_len,
            max_hits=max_hits, kidx=kidx,
        )
        phase1 = weight_candidates
    else:
        kw = dict(
            n_chains=n_chains, stride=stride, min_seed_len=min_seed_len,
            max_hits=max_hits, params=params, use_pallas=use_pallas,
            kidx=kidx,
        )
        phase1 = score_candidates
    sc1 = phase1(fm, reads1, lengths1, **kw)
    if paired and reads2 is not None:
        sc2 = phase1(fm, reads2, lengths2, **kw)
        if distro is None:
            distro = jnp.asarray([300.0, 100.0, 50.0, 700.0], jnp.float32)
        k1, k2 = _device_pair_select(sc1, sc2, distro)
    else:
        sc2, k1, k2 = None, None, None
    out = []
    for sc, reads, lengths, kk, other in (
        (sc1, reads1, lengths1, k1, (sc2, k2)),
        (sc2, reads2, lengths2, k2, (sc1, k1)),
    ):
        if sc is None:
            out.append(None)
            continue
        arp, aqp, ast, sub, sub_n, xa_mask = _device_choose(sc, lengths, kk)
        cand = extend_candidates(
            fm, reads, lengths, arp, aqp, ast,
            params=params, use_pallas=use_pallas,
        )
        if other[0] is not None:
            # mate rescue: seeds-free ends SW-searched in the mate window
            cand = _mate_rescue(
                fm, cand, sc, other[0], other[1], reads, lengths, distro,
                params, use_pallas,
            )
        xa = _extend_xa(fm, sc, xa_mask, reads, lengths, params, use_pallas)
        out.append((cand, sub, sub_n, sc, xa))
    return tuple(out)


class XACompact(NamedTuple):
    """Compacted extra-XA extension results (C lanes for the batch)."""

    read_idx: jnp.ndarray   # (C,) int32 row in the batch; -1 = dead lane
    pos: jnp.ndarray        # (C,)
    strand: jnp.ndarray
    score: jnp.ndarray
    qbeg: jnp.ndarray
    qend: jnp.ndarray
    rend_pos: jnp.ndarray
    nm: jnp.ndarray
    n_ops: jnp.ndarray
    cigar_ops: jnp.ndarray  # (C, MAX_OPS)
    cigar_len: jnp.ndarray


def _extend_xa(fm, sc, xa_mask, reads, lengths, params, use_pallas):
    """Compacted extension of extra XA chains: most reads have none, so
    the whole batch's XA work packs into C = B//8 lanes (the same
    first-fit compaction as mate rescue) and costs ~1/16 of the main
    extension; overflow chains are silently dropped (bwa caps XA at
    max_xa_hits anyway)."""
    B, K = xa_mask.shape
    C = max(8, B // 8)
    flat = xa_mask.reshape(-1)
    csum = jnp.cumsum(flat.astype(jnp.int32)) - 1
    slot = jnp.where(flat & (csum < C), csum, C)
    src = jnp.zeros(C + 1, jnp.int32).at[slot].set(
        jnp.arange(B * K, dtype=jnp.int32))[:C]
    live = jnp.arange(C) < jnp.minimum(
        jnp.sum(flat.astype(jnp.int32)), C)
    rd = src // K
    ch = src % K
    # NOTE: wrapping this extension in lax.cond(n_xa > 0, …) to skip
    # XA-free batches was tried and REGRESSED the step ~15% — the cond
    # boundary breaks XLA fusion/overlap around the extension, costing
    # more than the 1/16-lane XA work it saves.  Keep it unconditional.
    resc = extend_candidates(
        fm, reads[rd], lengths[rd],
        sc.anchor_rpos[rd, ch][:, None], sc.anchor_qpos[rd, ch][:, None],
        sc.strand[rd, ch][:, None],
        params=params, use_pallas=use_pallas,
    )
    score = resc.score[:, 0]
    live = live & (score >= 30)
    return XACompact(
        read_idx=jnp.where(live, rd, -1).astype(jnp.int32),
        pos=resc.pos[:, 0], strand=resc.strand[:, 0], score=score,
        qbeg=resc.qbeg[:, 0], qend=resc.qend[:, 0],
        rend_pos=resc.rend_pos[:, 0], nm=resc.nm[:, 0],
        n_ops=resc.n_ops[:, 0],
        cigar_ops=resc.cigar_ops[:, 0], cigar_len=resc.cigar_len[:, 0],
    )


# ------------------------------------------------------- packed device I/O

CIGAR_HEAD = 16  # ops in the always-fetched cigar head slice

# meta row indices for pack_fused/unpack_fused (single (R,B,S) i32 field set)
_META_FIELDS = (
    "pos", "strand", "score", "qbeg", "qend", "rend_pos", "n_ops", "rstart",
    "nm", "sub", "sub_n",
)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_chains", "stride", "min_seed_len", "max_hits", "params",
        "use_pallas", "paired", "score_mode",
    ),
)
def fused_align_packed(
    fm: FMIndex,
    reads1: jnp.ndarray,
    lengths1: jnp.ndarray,
    reads2: Optional[jnp.ndarray] = None,
    lengths2: Optional[jnp.ndarray] = None,
    distro: Optional[jnp.ndarray] = None,
    n_chains: int = 4,
    stride: int = 8,
    min_seed_len: int = 19,
    max_hits: int = 4,
    params: SWParams = SWParams(),
    use_pallas: bool = False,
    paired: bool = True,
    kidx=None,
    score_mode: str = "weight",
):
    """fused_align_step with outputs packed for ONE device→host fetch.

    The relay's per-array fetch latency (~0.2 s regardless of size) and
    ~30 MB/s bandwidth (docs/PERF_NOTES.md) dominate when the step returns
    ~30 leaves; this variant packs everything:

      meta:      (E, 11, B, S) int32 — rows per _META_FIELDS (sub/sub_n
                 broadcast over the slot dim)
      cigar16:   (E, B, S, CIGAR_HEAD) int16 — BAM-packed ``len<<4|op``
                 head slice, soft clips NOT included (host adds them from
                 qbeg/qend); always fetched
      cigar:     (E, B, S, MAX_OPS) int16 — the full cigar; fetched only
                 when ``overflow`` fires (rare)
      overflow:  () int32 — 1 iff some scoring lane has > CIGAR_HEAD ops
      stats:     (E, 4, B, K) int32 — phase-1 pos/strand/score/rend for
                 insert-distro estimation (fetched on estimation batches)

    E = 2 ends when paired else 1.  Host-side NM/MD fallback (non-pallas)
    slices the host reference (finalize_alignments host_ref).
    """
    res = fused_align_step(
        fm, reads1, lengths1, reads2, lengths2, distro=distro,
        n_chains=n_chains, stride=stride, min_seed_len=min_seed_len,
        max_hits=max_hits, params=params, use_pallas=use_pallas,
        paired=paired, kidx=kidx, score_mode=score_mode,
    )
    metas, cigars, stats, xa_metas, xa_cigs = [], [], [], [], []
    max_nops = jnp.int32(0)
    for end in res:
        if end is None:
            continue
        cand, sub, sub_n, sc, xa = end
        B, S = cand.pos.shape
        sub_b = jnp.broadcast_to(sub[:, None], (B, S))
        sub_n_b = jnp.broadcast_to(sub_n[:, None], (B, S))
        # 7 int32 rows instead of 11: the 8 sub-int16 fields (strand,
        # score, qbeg, qend, n_ops, nm, sub, sub_n — all < 2^15 in
        # magnitude; nm's -1 sentinel survives via the & 0xFFFF mask)
        # share int32 slots pairwise — meta is the largest leaf of the
        # per-batch fetch and the step is transfer-bound on the relay
        pk = lambda hi, lo: (hi << 16) | (lo & 0xFFFF)
        metas.append(jnp.stack([
            cand.pos, cand.rend_pos, cand.rstart,
            pk(cand.strand, cand.score),
            pk(cand.qbeg, cand.qend),
            pk(cand.n_ops, cand.nm),
            pk(sub_b, sub_n_b),
        ]))
        valid = (
            jnp.arange(cand.cigar_ops.shape[-1])[None, None, :]
            < cand.n_ops[..., None]
        )
        # int16 halves the dominant d2h payload: op len ≤ read length
        # (< 2^11), so len<<4|op fits in 15 bits
        packed = jnp.where(
            valid,
            (cand.cigar_len << 4) | cand.cigar_ops.astype(jnp.int32),
            0,
        ).astype(jnp.int16)
        cigars.append(packed)
        max_nops = jnp.maximum(
            max_nops, jnp.max(jnp.where(cand.score > 0, cand.n_ops, 0)))
        stats.append(jnp.stack([sc.pos, sc.strand, sc.score, sc.rend_pos]))
        # extra-XA lanes (compact): meta rows + head-truncated cigars
        live = xa.read_idx >= 0
        xa_metas.append(jnp.stack([
            xa.read_idx, xa.pos, xa.strand, xa.score, xa.qbeg, xa.qend,
            xa.rend_pos, xa.n_ops, xa.nm,
        ]))
        xv = (
            jnp.arange(xa.cigar_ops.shape[-1])[None, :]
            < xa.n_ops[:, None]
        )
        xa_cigs.append(jnp.where(
            xv, (xa.cigar_len << 4) | xa.cigar_ops.astype(jnp.int32), 0
        ).astype(jnp.int16)[:, :CIGAR_HEAD])
    cigar_full = jnp.stack(cigars)
    # two-tier cigar transfer: the relay moves ~30 MB/s, and real batches
    # almost never exceed CIGAR_HEAD ops — the host fetches the head slice
    # plus this overflow flag, and falls back to cigar_full only when some
    # scoring lane actually has a longer cigar
    overflow = (max_nops > CIGAR_HEAD).astype(jnp.int32)
    # kill head-overflowing XA lanes (rare; bwa caps XA length anyway)
    xa_meta = jnp.stack(xa_metas)
    xa_ok = xa_meta[:, 7] <= CIGAR_HEAD          # n_ops row
    xa_meta = xa_meta.at[:, 0].set(
        jnp.where(xa_ok, xa_meta[:, 0], -1))
    return (
        jnp.stack(metas), cigar_full[..., :CIGAR_HEAD], cigar_full,
        overflow, jnp.stack(stats), xa_meta, jnp.stack(xa_cigs),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_chains", "stride", "min_seed_len", "max_hits", "params",
        "use_pallas", "paired", "score_mode",
    ),
)
def fused_align_leaves(
    fm: FMIndex,
    reads1: jnp.ndarray,
    lengths1: jnp.ndarray,
    reads2: Optional[jnp.ndarray] = None,
    lengths2: Optional[jnp.ndarray] = None,
    distro: Optional[jnp.ndarray] = None,
    n_chains: int = 4,
    stride: int = 8,
    min_seed_len: int = 19,
    max_hits: int = 4,
    params: SWParams = SWParams(),
    use_pallas: bool = False,
    paired: bool = True,
    kidx=None,
    score_mode: str = "weight",
):
    """fused_align_packed with the per-batch fetch collapsed to TWO
    leaves: one int32 ([E,B,S,C header | meta | xa_meta | overflow]) and
    one int16 ([cigar16 | xa_cig]).  The relay pays ~30 ms of latency
    PER FETCHED LEAF (docs/PERF_NOTES.md), so the 5-leaf production
    fetch cost ~150 ms/batch of pure leaf latency.  cigar_full and
    stats stay separate (fetched only on overflow / distro-estimation
    batches).  Single-device path only — the mesh path keeps separate
    leaves for per-axis sharding."""
    meta, cig16, cigfull, ovf, stats, xam, xac = fused_align_packed(
        fm, reads1, lengths1, reads2, lengths2, distro=distro,
        n_chains=n_chains, stride=stride, min_seed_len=min_seed_len,
        max_hits=max_hits, params=params, use_pallas=use_pallas,
        paired=paired, kidx=kidx, score_mode=score_mode,
    )
    E, _, B, S = meta.shape
    C = xam.shape[2]
    hdr = jnp.asarray([E, B, S, C], jnp.int32)
    i32 = jnp.concatenate(
        [hdr, meta.reshape(-1), xam.reshape(-1), ovf.reshape(1)])
    i16 = jnp.concatenate([cig16.reshape(-1), xac.reshape(-1)])
    return i32, i16, cigfull, stats


def unpack_leaves(i32: np.ndarray, i16: np.ndarray):
    """(meta, xa_meta, overflow, cigar16, xa_cig) from the two fetched
    leaves of fused_align_leaves (self-describing header)."""
    E, B, S, C = (int(x) for x in i32[:4])
    at = 4
    meta = i32[at: at + E * 7 * B * S].reshape(E, 7, B, S)
    at += E * 7 * B * S
    xam = i32[at: at + E * 9 * C].reshape(E, 9, C)
    ovf = int(i32[-1])
    head = (len(i16) // (E * B * S + E * C))
    cig16 = i16[: E * B * S * head].reshape(E, B, S, head)
    xac = i16[E * B * S * head:].reshape(E, C, head)
    return meta, xam, ovf, cig16, xac


class PackedEnd(NamedTuple):
    """Host-side view of one end's packed fused output (numpy arrays)."""

    pos: np.ndarray
    strand: np.ndarray
    score: np.ndarray
    qbeg: np.ndarray
    qend: np.ndarray
    rend_pos: np.ndarray
    n_ops: np.ndarray
    rstart: np.ndarray
    nm: np.ndarray
    sub: np.ndarray      # (B,)
    sub_n: np.ndarray    # (B,)
    cigar_ops: np.ndarray   # (B, S, MAX_OPS) int32 op codes
    cigar_len: np.ndarray   # (B, S, MAX_OPS) int32 lengths


def unpack_fused(meta: np.ndarray, cigar: np.ndarray) -> list:
    """Split fetched packed arrays into per-end host views.

    meta rows: [pos, rend_pos, rstart, strand|score, qbeg|qend,
    n_ops|nm, sub|sub_n] with the paired rows holding two int16 fields
    per int32 (hi<<16 | lo&0xFFFF; lo sign restored via int16 view)."""
    out = []

    def hi(v):
        return (v >> 16).astype(np.int32)

    def lo(v):
        return (v & 0xFFFF).astype(np.uint16).astype(np.int16).astype(
            np.int32)

    for e in range(meta.shape[0]):
        m = meta[e]
        out.append(PackedEnd(
            pos=m[0], rend_pos=m[1], rstart=m[2],
            strand=hi(m[3]), score=lo(m[3]),
            qbeg=hi(m[4]), qend=lo(m[4]),
            n_ops=hi(m[5]), nm=lo(m[5]),
            sub=hi(m[6])[:, 0], sub_n=lo(m[6])[:, 0],
            cigar_ops=cigar[e] & 0xF,
            cigar_len=cigar[e].astype(np.int32) >> 4,
        ))
    return out


class PackedXA(NamedTuple):
    """Host view of one end's compacted extra-XA lanes."""

    read_idx: np.ndarray
    pos: np.ndarray
    strand: np.ndarray
    score: np.ndarray
    qbeg: np.ndarray
    qend: np.ndarray
    rend_pos: np.ndarray
    n_ops: np.ndarray
    nm: np.ndarray
    cigar_ops: np.ndarray
    cigar_len: np.ndarray


def unpack_xa(xa_meta: np.ndarray, xa_cig: np.ndarray) -> list:
    """Per-end host views of the packed extra-XA lanes."""
    out = []
    for e in range(xa_meta.shape[0]):
        m = xa_meta[e]
        out.append(PackedXA(
            read_idx=m[0], pos=m[1], strand=m[2], score=m[3], qbeg=m[4],
            qend=m[5], rend_pos=m[6], n_ops=m[7], nm=m[8],
            cigar_ops=xa_cig[e] & 0xF,
            cigar_len=xa_cig[e].astype(np.int32) >> 4,
        ))
    return out


# ---------------------------------------------------------------- host side

class HostAlignment(NamedTuple):
    """One selected alignment (host, numpy scalars)."""

    pos: int
    strand: int
    score: int
    sub_score: int
    sub_n: int
    mapq: int
    cigar: list          # [(op, len)] incl. soft clips, strand frame
    nm: int
    md: str
    end_pos: int
    aligned: bool


class Selection(NamedTuple):
    """Host-side phase-1 selection for the extend pass."""

    anchor_rpos: np.ndarray   # (B, 2) int32; -1 = empty slot
    anchor_qpos: np.ndarray
    strand: np.ndarray
    sub: np.ndarray           # (B,) suboptimal score for MAPQ
    sub_n: np.ndarray         # (B,)


def choose_candidates(
    sc: ScoredChains,
    lengths_np: np.ndarray,
    chosen_k: Optional[np.ndarray] = None,
    min_out_score: int = 30,
    mask_level: float = 0.5,
    match: int = 1,
) -> Selection:
    """Pick primary (+ optional split supplementary) chain per read from
    phase-1 scores; computes MAPQ sub-score stats."""
    score = np.asarray(sc.score)
    pos = np.asarray(sc.pos)
    rend = np.asarray(sc.rend_pos)
    strand = np.asarray(sc.strand)
    qb = np.asarray(sc.qspan_beg)
    qe = np.asarray(sc.qspan_end)
    arp = np.asarray(sc.anchor_rpos)
    aqp = np.asarray(sc.anchor_qpos)
    B, K = score.shape
    kp = chosen_k.astype(int) if chosen_k is not None else np.argmax(score, axis=1)
    bidx = np.arange(B)
    sp = score[bidx, kp]
    # ref-overlap with the chosen candidate
    ovl = ~(
        (rend <= pos[bidx, kp][:, None]) | (pos >= rend[bidx, kp][:, None])
    )
    other = np.ones((B, K), bool)
    other[bidx, kp] = False
    live = other & (score > 0)
    non_ovl = live & ~ovl
    sub = np.where(non_ovl, score, 0).max(axis=1)
    sub_n = (non_ovl & (score >= (sp - 3 * match)[:, None])).sum(axis=1)
    # split supplementary: query-span disjoint candidates (orig frame)
    qlen = lengths_np[:, None]
    ob = np.where(strand == 1, qlen - qe, qb)
    oe = np.where(strand == 1, qlen - qb, qe)
    pb = ob[bidx, kp][:, None]
    pe = oe[bidx, kp][:, None]
    qov = np.maximum(
        0, np.minimum(pe, oe) - np.maximum(pb, ob)
    )
    shorter = np.maximum(1, np.minimum(pe - pb, oe - ob))
    split_ok = non_ovl & (score >= min_out_score) & (qov < mask_level * shorter)
    supp_score = np.where(split_ok, score, -1)
    ks = np.argmax(supp_score, axis=1)
    has_supp = supp_score[bidx, ks] > 0
    sel_rpos = np.stack(
        [arp[bidx, kp], np.where(has_supp, arp[bidx, ks], -1)], axis=1
    ).astype(np.int32)
    sel_qpos = np.stack(
        [aqp[bidx, kp], np.where(has_supp, aqp[bidx, ks], 0)], axis=1
    ).astype(np.int32)
    sel_strand = np.stack(
        [strand[bidx, kp], np.where(has_supp, strand[bidx, ks], 0)], axis=1
    ).astype(np.int32)
    return Selection(sel_rpos, sel_qpos, sel_strand, sub, sub_n)


_MAPQ_COEF = 6.02  # bwa mem_approx_mapq_se constants [external knowledge]


def mapq_from_scores(
    score: int, sub: int, sub_n: int, qlen: int, min_seed_len: int = 19,
    params: SWParams = SWParams(), frac_rep: float = 0.0,
) -> int:
    """BWA-MEM approximate single-end MAPQ [external knowledge:
    mem_approx_mapq_se; reproduced to match bwa's mapq distribution]."""
    a, b = params.match, params.mismatch
    sub = max(sub, min_seed_len * a)
    if sub >= score:
        return 0
    l = qlen
    identity = 1.0 - float(l * a - score) / (a + b) / l
    if score == 0:
        return 0
    mapq_coef_len, mapq_coef_fac = 50.0, np.log(50.0)
    tmp = 1.0 if l < mapq_coef_len else mapq_coef_fac / np.log(l)
    tmp *= identity * identity
    mapq = int(_MAPQ_COEF * (score - sub) / a * tmp * tmp + 0.499)
    if sub_n > 0:
        mapq -= int(4.343 * np.log(sub_n + 1) + 0.499)
    mapq = max(0, min(60, mapq))
    return int(mapq * (1.0 - frac_rep) + 0.499)


def mapq_vec(
    score: np.ndarray, sub: np.ndarray, sub_n: np.ndarray, qlen: np.ndarray,
    min_seed_len: int = 19, params: SWParams = SWParams(),
) -> np.ndarray:
    """Vectorized mapq_from_scores over (B, S) arrays (same math; the
    scalar form costs ~0.5 s per 80k reads on the epilogue hot path)."""
    a, b = params.match, params.mismatch
    score = score.astype(np.float64)
    sub = np.maximum(sub, min_seed_len * a).astype(np.float64)
    # padded lanes have qlen 0; clamp (their mapq is masked to 0 anyway
    # via score==0)
    l = np.maximum(qlen.astype(np.float64), 1.0)
    if score.ndim == 2:
        l = l[:, None]
    identity = 1.0 - (l * a - score) / (a + b) / l
    tmp = np.where(l < 50.0, 1.0, np.log(50.0) / np.log(np.maximum(l, 2.0)))
    tmp = tmp * identity * identity
    mapq = (_MAPQ_COEF * (score - sub) / a * tmp * tmp + 0.499).astype(np.int64)
    pen = (4.343 * np.log(sub_n + 1.0) + 0.499).astype(np.int64)
    mapq = np.where(sub_n > 0, mapq - pen, mapq)
    mapq = np.where((sub >= score) | (score == 0), 0, mapq)
    return np.clip(mapq, 0, 60).astype(np.int32)


def _cigar_with_clips(ops, lens, n_ops, qbeg, qend, qlen):
    cig = []
    if qbeg > 0:
        cig.append((4, int(qbeg)))  # S
    for o, l in zip(ops[:n_ops], lens[:n_ops]):
        if l > 0:
            cig.append((int(o), int(l)))
    if qlen - qend > 0:
        cig.append((4, int(qlen - qend)))
    return cig


def _nm_md(cigar, query, refwin, qbeg, rbeg):
    """NM distance + MD string by walking the cigar (htslib MD contract)."""
    nm = 0
    md = []
    run = 0
    qi, ri = qbeg, rbeg
    for op, ln in cigar:
        if op == 0:  # M
            for t in range(ln):
                qv, rv = int(query[qi + t]), int(refwin[ri + t])
                if qv == rv and qv < 4:
                    run += 1
                else:
                    md.append(str(run))
                    md.append("ACGTN"[min(rv, 4)])
                    run = 0
                    nm += 1
            qi += ln
            ri += ln
        elif op == 1:  # I
            nm += ln
            qi += ln
        elif op == 2:  # D
            md.append(str(run))
            run = 0
            md.append("^" + "".join("ACGTN"[min(int(refwin[ri + t]), 4)] for t in range(ln)))
            nm += ln
            ri += ln
        # soft clips don't touch MD/NM
    md.append(str(run))
    return nm, "".join(md)


def finalize_alignments(
    cand,
    reads_np: np.ndarray,
    lengths_np: np.ndarray,
    sub: np.ndarray,
    sub_n: np.ndarray,
    params: SWParams = SWParams(),
    min_seed_len: int = 19,
    min_out_score: int = 30,
    host_ref: Optional[np.ndarray] = None,
) -> list:
    """Finalize the 2-slot extend output (slot 0 primary, slot 1 supp)
    into (HostAlignment, Optional[HostAlignment]) per read.

    ``cand`` is a Candidates (device fetch with refwin) or a PackedEnd
    (packed fetch).  When the kernel didn't supply NM (non-pallas path),
    NM/MD are recomputed on host — from cand.refwin if present, else from
    ``host_ref`` (the unpacked forward reference, BWAIndex.pac)."""
    pos = np.asarray(cand.pos)
    strand = np.asarray(cand.strand)
    score = np.asarray(cand.score)
    qbeg = np.asarray(cand.qbeg)
    qend = np.asarray(cand.qend)
    rend = np.asarray(cand.rend_pos)
    ops = np.asarray(cand.cigar_ops)
    lens = np.asarray(cand.cigar_len)
    n_ops = np.asarray(cand.n_ops)
    knm = np.asarray(cand.nm)
    # refwin is only transferred off-device when some lane lacks a kernel
    # NM (non-pallas path) — the (B,K,W) window is the largest d2h payload
    lazy: dict = {}

    def _refwin():
        if "rw" not in lazy:
            lazy["rw"] = np.asarray(cand.refwin)
            lazy["rs"] = np.asarray(cand.rstart)
        return lazy["rw"], lazy["rs"]

    B, S = score.shape
    # vectorized MAPQ: slot 0 uses the real sub/sub_n stats; supplementary
    # slots use sub=0/sub_n=0 (bwa treats supplementary pieces the same)
    sub_full = np.zeros((B, S), np.int64)
    sub_full[:, 0] = sub
    sub_n_full = np.zeros((B, S), np.int64)
    sub_n_full[:, 0] = sub_n
    mapq_all = mapq_vec(
        np.asarray(score), sub_full, sub_n_full, np.asarray(lengths_np),
        min_seed_len, params,
    )
    unaligned = HostAlignment(-1, 0, 0, 0, 0, 0, [], 0, "", -1, False)
    out = []
    for b in range(B):
        qlen = int(lengths_np[b])

        def fin(k, sb, sn):
            s = int(score[b, k])
            mapq = int(mapq_all[b, k])
            cig = _cigar_with_clips(
                ops[b, k], lens[b, k], int(n_ops[b, k]),
                int(qbeg[b, k]), int(qend[b, k]), qlen,
            )
            if knm[b, k] >= 0:
                nm, md = int(knm[b, k]), ""
            else:
                q = reads_np[b][:qlen].astype(np.int32)
                if strand[b, k] == 1:
                    qr = q[::-1]
                    q = np.where(qr < 4, 3 - qr, 4)
                if hasattr(cand, "refwin"):
                    refwin, rstart = _refwin()
                    win, ri = refwin[b, k], int(pos[b, k] - rstart[b, k])
                else:
                    p = int(pos[b, k])
                    win, ri = host_ref[p:int(rend[b, k])], 0
                nm, md = _nm_md(
                    [c for c in cig if c[0] != 4], q, win,
                    int(qbeg[b, k]), ri,
                )
            return HostAlignment(
                pos=int(pos[b, k]), strand=int(strand[b, k]), score=s,
                sub_score=sb, sub_n=sn, mapq=mapq, cigar=cig, nm=nm, md=md,
                end_pos=int(rend[b, k]), aligned=True,
            )

        if score[b, 0] < min_out_score:
            out.append((unaligned, None))
            continue
        prim = fin(0, int(sub[b]), int(sub_n[b]))
        supp = None
        if score.shape[1] > 1 and score[b, 1] >= min_out_score and pos[b, 1] >= 0:
            # ref-overlapping second piece is not a split
            if rend[b, 1] <= pos[b, 0] or pos[b, 1] >= rend[b, 0]:
                supp = fin(1, 0, 0)
        out.append((prim, supp))
    return out


def _orig_frame(qbeg: int, qend: int, strand: int, qlen: int) -> Tuple[int, int]:
    """Map a strand-frame query interval back to original-read coords."""
    if strand == 0:
        return qbeg, qend
    return qlen - qend, qlen - qbeg


def select_alignments(
    cand: Candidates,
    reads_np: np.ndarray,
    lengths_np: np.ndarray,
    chosen_k: Optional[np.ndarray] = None,
    params: SWParams = SWParams(),
    min_seed_len: int = 19,
    min_out_score: int = 30,   # bwa -T
    mask_level: float = 0.5,   # bwa query-overlap threshold for secondary
    find_splits: bool = True,
) -> list:
    """Finalize one primary (+ optional supplementary split) per read.

    Returns a list of (HostAlignment, Optional[HostAlignment]); primary has
    aligned=False for unmapped reads.  ``chosen_k`` overrides the
    per-read candidate choice (joint pair selection).
    """
    pos = np.asarray(cand.pos)
    strand = np.asarray(cand.strand)
    score = np.asarray(cand.score)
    qbeg = np.asarray(cand.qbeg)
    qend = np.asarray(cand.qend)
    rend = np.asarray(cand.rend_pos)
    ops = np.asarray(cand.cigar_ops)
    lens = np.asarray(cand.cigar_len)
    n_ops = np.asarray(cand.n_ops)
    knm = np.asarray(cand.nm)
    lazy: dict = {}

    def _refwin():
        if "rw" not in lazy:
            lazy["rw"] = np.asarray(cand.refwin)
            lazy["rs"] = np.asarray(cand.rstart)
        return lazy["rw"], lazy["rs"]

    B, K = score.shape

    def finalize(b, k, qlen, sub, sub_n):
        s = int(score[b, k])
        mapq = mapq_from_scores(s, sub, sub_n, qlen, min_seed_len, params)
        cig = _cigar_with_clips(
            ops[b, k], lens[b, k], int(n_ops[b, k]),
            int(qbeg[b, k]), int(qend[b, k]), qlen,
        )
        if knm[b, k] >= 0:
            nm, md = int(knm[b, k]), ""
        else:
            refwin, rstart = _refwin()
            q = reads_np[b][:qlen].astype(np.int32)
            if strand[b, k] == 1:
                qr = q[::-1]
                q = np.where(qr < 4, 3 - qr, 4)
            nm, md = _nm_md(
                [c for c in cig if c[0] != 4],
                q,
                refwin[b, k],
                int(qbeg[b, k]),
                int(pos[b, k] - rstart[b, k]),
            )
        return HostAlignment(
            pos=int(pos[b, k]), strand=int(strand[b, k]), score=s,
            sub_score=sub, sub_n=sub_n, mapq=mapq, cigar=cig, nm=nm, md=md,
            end_pos=int(rend[b, k]), aligned=True,
        )

    unaligned = HostAlignment(-1, 0, 0, 0, 0, 0, [], 0, "", -1, False)
    out = []
    for b in range(B):
        qlen = int(lengths_np[b])
        k_best = int(chosen_k[b]) if chosen_k is not None else int(np.argmax(score[b]))
        s_best = int(score[b, k_best])
        if s_best < min_out_score:
            out.append((unaligned, None))
            continue
        qb_best, qe_best = _orig_frame(
            int(qbeg[b, k_best]), int(qend[b, k_best]),
            int(strand[b, k_best]), qlen,
        )
        # suboptimal stats + split detection over the other candidates
        sub, sub_n = 0, 0
        supp_k, supp_score = -1, 0
        for k in range(K):
            if k == k_best or score[b, k] <= 0:
                continue
            sk = int(score[b, k])
            ref_overlap = not (
                rend[b, k] <= pos[b, k_best] or pos[b, k] >= rend[b, k_best]
            )
            if not ref_overlap:
                sub = max(sub, sk)
                if sk >= s_best - params.match * 3:
                    sub_n += 1
            if find_splits and sk >= min_out_score and not ref_overlap:
                qb, qe = _orig_frame(
                    int(qbeg[b, k]), int(qend[b, k]), int(strand[b, k]), qlen
                )
                ov = max(0, min(qe_best, qe) - max(qb_best, qb))
                shorter = min(qe_best - qb_best, qe - qb)
                if shorter > 0 and ov < mask_level * shorter and sk > supp_score:
                    supp_k, supp_score = k, sk
        prim = finalize(b, k_best, qlen, sub, sub_n)
        supp = None
        if supp_k >= 0:
            supp = finalize(b, supp_k, qlen, 0, 0)
        out.append((prim, supp))
    return out
