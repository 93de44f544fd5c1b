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

from ..index.fm import FMIndex, get_ref_window
from .seeding import find_seeds
from .chain import chain_seeds
from .sw import banded_sw, SWParams, SWResult

PAD = 48  # ref-window slack on each side of the chain anchor diagonal


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
    W = L + 2 * PAD

    reads_rc = revcomp_reads(reads, lengths)
    strand = chains.strand  # (B, K)
    q_fwd = jnp.broadcast_to(reads[:, None, :], (B, K, L))
    q_rc = jnp.broadcast_to(reads_rc[:, None, :], (B, K, L))
    queries = jnp.where(strand[..., None] == 1, q_rc, q_fwd).reshape(B * K, L)

    rstart = chains.anchor_rpos - chains.anchor_qpos - PAD  # (B, K)
    refwin = get_ref_window(fm, rstart.reshape(-1), W)  # (B*K, W)

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
    )


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
    refwin = np.asarray(cand.refwin)
    rstart = np.asarray(cand.rstart)
    B, K = score.shape

    def finalize(b, k, qlen, sub, sub_n):
        s = int(score[b, k])
        mapq = mapq_from_scores(s, sub, sub_n, qlen, min_seed_len, params)
        cig = _cigar_with_clips(
            ops[b, k], lens[b, k], int(n_ops[b, k]),
            int(qbeg[b, k]), int(qend[b, k]), qlen,
        )
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
