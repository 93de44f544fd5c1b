"""Candidate alleles + genotype likelihoods + VCF records per window.

Bayesian haplotype-based genotyping in the FreeBayes mold [external
knowledge: Garrison & Marth 2012; the reference pins the CLI contract —
``--min-repeat-entropy 1`` at bin/speedseq:707, ``--pooled-discrete
--min-alternate-fraction .05 --min-alternate-count 2`` at :1059-1067 —
and the downstream filter fields QUAL / RPR / RPL at :709, GL and GT for
somatic at :155-186].

Model features matching the reference engine:
- **multi-allelic loci**: up to ``max_alts`` ALT alleles per record
  (NUMALT > 1), genotyped jointly over all diploid allele pairs in VCF
  canonical order.
- **haplotype windows**: candidate alleles within ``haplotype_gap`` bp
  are evaluated jointly over the spanned reference window; reads vote
  for the haplotype they actually carry, so adjacent SNVs on one
  haplotype emit as a single MNP/complex allele.
- **min-repeat-entropy**: indel allele windows grow rightward until the
  spanned reference sequence reaches ``min_repeat_entropy`` bits of
  Shannon entropy, so indels in (interrupted) repeats are represented
  and evaluated over the whole repeat tract.
- **per-sample input thresholds**: ``min_alternate_count/fraction``
  admit a site when ANY single sample passes (freebayes -C/-F
  semantics); ``pooled_discrete`` additionally emits sites whose best
  genotypes are all hom-ref so the somatic SSC filter sees marginal
  evidence.
- **posterior QUAL**: phred-scaled posterior probability that the site
  is polymorphic under a site-heterozygosity prior, not an ad-hoc GL
  delta.

GL math runs as one jitted JAX op over (site-lane, read, genotype)
arrays; everything producing those lanes is vectorized numpy on host.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.vcf import VCFRecord
from .normalize import left_align
from .pileup import WindowPileup

_BASES = "ACGT"

_MAX_ALTS = 3
# diploid genotype pairs in VCF canonical order: index(j,k) = k(k+1)/2+j
_GT_PAIRS: List[Tuple[int, int]] = [
    (j, k) for k in range(_MAX_ALTS + 1) for j in range(k + 1)
]
_N_GT = len(_GT_PAIRS)  # 10


@dataclass(frozen=True)
class CallerConfig:
    min_alternate_count: int = 2      # freebayes -C
    min_alternate_fraction: float = 0.2  # freebayes -F (somatic: 0.05)
    min_mapq: int = 1
    min_baseq: int = 3
    max_sites_per_batch: int = 512
    indel_q: int = 25                 # observation quality for indel support
    pooled_discrete: bool = False     # somatic mode (bin/speedseq:1059)
    max_alts: int = _MAX_ALTS         # NUMALT cap per record
    haplotype_gap: int = 3            # join candidates within this many bp
    min_repeat_entropy: float = 1.0   # bits (bin/speedseq:707 pins 1)
    theta: float = 0.001              # site heterozygosity prior

    def __post_init__(self):
        # the genotype space (_GT_PAIRS, _gl_terms_multi, invalid-pair
        # mask) is built for _MAX_ALTS alts; a larger cap would silently
        # make allele _MAX_ALTS+1 ungenotypeable
        if self.max_alts > _MAX_ALTS:
            raise ValueError(
                f"max_alts={self.max_alts} exceeds the supported genotype "
                f"space ({_MAX_ALTS} alternate alleles)"
            )


@jax.jit
def _gl_terms(support: jnp.ndarray, quals: jnp.ndarray) -> jnp.ndarray:
    """Biallelic per-read diploid genotype log10-likelihood terms.

    support: (S, R) int8 — 1 = ref obs, 2 = alt obs, 0 = not covering
    quals:   (S, R) float32 phred
    returns (S, R, 3) float32 log10 P(read | RR/RA/AA); 0 for non-covering
    reads (so callers can segment-sum by sample).
    """
    e = jnp.power(10.0, -quals / 10.0)
    p_ref = jnp.where(support == 1, 1.0 - e, e / 3.0)
    p_alt = jnp.where(support == 2, 1.0 - e, e / 3.0)
    cover = (support > 0)[..., None]
    eps = 1e-30
    p = jnp.stack(
        [p_ref, 0.5 * p_ref + 0.5 * p_alt, p_alt], axis=-1
    )
    return jnp.where(cover, jnp.log10(p + eps), 0.0)


@jax.jit
def _gl_terms_multi(obs: jnp.ndarray, quals: jnp.ndarray) -> jnp.ndarray:
    """Multi-allelic per-read genotype log10-likelihood terms.

    obs:   (S, R) int8 — -1 = not covering, 0 = ref, k = alt allele k
    quals: (S, R) float32 phred
    returns (S, R, G) float32 log10 P(read | genotype) over the
    ``_GT_PAIRS`` diploid genotypes; 0 for non-covering reads.
    """
    e = jnp.power(10.0, -quals / 10.0)
    alleles = jnp.arange(_MAX_ALTS + 1, dtype=obs.dtype)
    match = obs[..., None] == alleles                    # (S, R, A+1)
    p = jnp.where(match, (1.0 - e)[..., None], (e / 3.0)[..., None])
    cover = (obs >= 0)[..., None]
    eps = 1e-30
    t = jnp.stack(
        [jnp.log10(0.5 * p[..., j] + 0.5 * p[..., k] + eps)
         for j, k in _GT_PAIRS],
        axis=-1,
    )
    return jnp.where(cover, t, 0.0)


def _pad_to(x: np.ndarray, axis: int, mult: int, fill=0):
    n = x.shape[axis]
    target = ((n + mult - 1) // mult) * mult
    if target == n:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - n)
    return np.pad(x, pad, constant_values=fill)


def seq_entropy_bits(codes: np.ndarray) -> float:
    """Shannon entropy (bits) of the base composition of `codes`."""
    if len(codes) == 0:
        return 0.0
    cnt = np.bincount(np.minimum(codes, 4).astype(np.int64), minlength=5)[:4]
    tot = cnt.sum()
    if tot == 0:
        return 0.0
    p = cnt[cnt > 0] / tot
    return float(-(p * np.log2(p)).sum())


def repeat_extend(
    genome: np.ndarray, pos: int, ref_len: int,
    min_entropy: float, cap: int = 64,
) -> int:
    """freebayes ``--min-repeat-entropy``: grow the allele window right
    until the spanned reference has ≥ `min_entropy` bits of entropy, so
    indels in (interrupted) repeats are represented over the full tract.
    Returns the window end (absolute genome position)."""
    end = pos + ref_len
    if min_entropy <= 0:
        return end
    limit = min(len(genome), pos + cap)
    while end < limit and seq_entropy_bits(genome[pos:end]) < min_entropy:
        end += 1
    return end


@dataclass
class SiteCall:
    """One genotyped locus (possibly multi-allelic / haplotype)."""

    offset: int          # window offset of the first REF base
    ref: str
    alts: List[str]
    types: List[str]     # per alt: snp / mnp / ins / del / complex
    lengths: List[int]
    # per-sample arrays
    gt: np.ndarray       # (n_samples, 2) allele indices, j <= k
    gq: np.ndarray       # (n_samples,)
    gl: np.ndarray       # (n_samples, G) over valid genotype pairs
    dp: np.ndarray       # (n_samples,)
    ro: np.ndarray
    ao: np.ndarray       # (n_samples, A)
    qr: np.ndarray
    qa: np.ndarray       # (n_samples, A)
    qual: float
    # per-alt placement/strand balance
    rpl: np.ndarray      # (A,)
    rpr: np.ndarray
    saf: np.ndarray
    sar: np.ndarray

    # biallelic conveniences for existing consumers
    @property
    def alt(self) -> str:
        return self.alts[0]

    @property
    def type(self) -> str:
        return self.types[0]

    @property
    def length(self) -> int:
        return self.lengths[0]


def _allele_type(ref: str, alt: str) -> Tuple[str, int]:
    if len(ref) == 1 and len(alt) == 1:
        return "snp", 1
    if len(ref) == len(alt):
        return "mnp", len(alt)
    if len(ref) == 1 and alt.startswith(ref):
        return "ins", len(alt) - len(ref)
    if len(alt) == 1 and ref.startswith(alt):
        return "del", len(ref) - len(alt)
    return "complex", max(len(ref), len(alt))


def _collect_atoms(
    genome: np.ndarray, p: WindowPileup, n_samples: int, cfg: CallerConfig,
    sample_of_read: np.ndarray,
):
    """Atomic candidate alleles with per-sample -C/-F admission.

    Returns a list of dicts sorted by span start:
      snp:   kind, off, alt_code, span
      indel: kind, off (left-aligned emit offset), ref, alt, alt_reads,
             span (repeat-entropy extended)
    """
    L = p.end - p.start
    ref_codes = genome[p.start : p.end]
    atoms = []

    # ---- SNVs: pooled-count prefilter, then per-sample -C/-F ------------
    counts = p.base_counts[:, :4]
    ref_safe = np.minimum(ref_codes, 3)
    alt_counts = counts.copy()
    alt_counts[np.arange(L), ref_safe] = 0
    cand_off = np.nonzero(
        (alt_counts.max(axis=1) >= cfg.min_alternate_count) & (ref_codes < 4)
    )[0]
    for off in cand_off:
        col, _, _ = p.col(int(off))
        covered = col >= 0
        for alt_code in np.nonzero(alt_counts[off] >= cfg.min_alternate_count)[0]:
            is_alt = covered & (col == alt_code)
            ok = False
            for si in range(n_samples):
                m = sample_of_read == si
                ac = int((is_alt & m).sum())
                dps = int((covered & m).sum())
                if ac >= cfg.min_alternate_count and dps > 0 and (
                    ac / dps >= cfg.min_alternate_fraction
                ):
                    ok = True
                    break
            if ok:
                atoms.append(
                    dict(
                        kind="snp", off=int(off), alt_code=int(alt_code),
                        count=int(alt_counts[off, alt_code]),
                        span=(int(off), int(off) + 1),
                    )
                )

    # ---- indels ---------------------------------------------------------
    groups: Dict[Tuple[int, bool, int, str], List[int]] = {}
    for e in p.events:
        off = e.pos - p.start
        if 0 <= off < L:
            groups.setdefault((off, e.is_ins, e.length, e.seq), []).append(
                e.read_idx
            )
    raw = []
    for (off, is_ins, ln, seq), ridx in groups.items():
        anchor = ref_codes[off]
        if anchor >= 4:
            continue
        if is_ins:
            ref_al = _BASES[anchor]
            alt_al = ref_al + seq.upper()
        else:
            if off + ln >= L or (ref_codes[off : off + ln + 1] >= 4).any():
                continue
            ref_al = "".join(_BASES[c] for c in ref_codes[off : off + ln + 1])
            alt_al = _BASES[anchor]
        # canonical left-aligned representation (vt norm semantics)
        abs_pos, ref_n, alt_n = left_align(genome, p.start + off, ref_al, alt_al)
        raw.append(
            dict(
                off=abs_pos - p.start, ref=ref_n, alt=alt_n,
                alt_reads=set(ridx),
            )
        )
    # merge events normalizing to the same allele
    merged: Dict[Tuple, dict] = {}
    for c in raw:
        key = (c["off"], c["ref"], c["alt"])
        if key in merged:
            merged[key]["alt_reads"] |= c["alt_reads"]
        else:
            merged[key] = c
    for c in merged.values():
        ridx = c["alt_reads"]
        if len(ridx) < cfg.min_alternate_count:
            continue
        off = c["off"]
        if not (0 <= off < L):
            continue
        alt_read_mask = np.zeros(len(p.reads), bool)
        for ri in ridx:
            alt_read_mask[ri] = True
        col, _, _ = p.col(off)
        covered = (col >= 0) | alt_read_mask
        ok = False
        for si in range(n_samples):
            m = sample_of_read == si
            ac = int((alt_read_mask & m).sum())
            dps = int((covered & m).sum())
            if ac >= cfg.min_alternate_count and dps > 0 and (
                ac / dps >= cfg.min_alternate_fraction
            ):
                ok = True
                break
        if not ok:
            continue
        span_end = repeat_extend(
            genome, p.start + off, len(c["ref"]), cfg.min_repeat_entropy
        ) - p.start
        span_end = min(span_end, L)
        atoms.append(
            dict(
                kind="indel", off=off, ref=c["ref"], alt=c["alt"],
                alt_reads=alt_read_mask, count=len(ridx),
                span=(off, max(span_end, off + len(c["ref"]))),
            )
        )
    atoms.sort(key=lambda a: (a["span"][0], a["span"][1], a["kind"]))
    return atoms


def _group_atoms(atoms: List[dict], gap: int) -> List[List[dict]]:
    """Cluster atoms whose spans fall within `gap` bp of each other
    (freebayes haplotype-window construction)."""
    out: List[List[dict]] = []
    cur: List[dict] = []
    cur_end = -(10 ** 9)
    for a in atoms:
        s, e = a["span"]
        if cur and s - cur_end < gap:
            cur.append(a)
            cur_end = max(cur_end, e)
        else:
            if cur:
                out.append(cur)
            cur = [a]
            cur_end = e
    if cur:
        out.append(cur)
    return out


@dataclass
class _Locus:
    """Pre-genotyping locus: alleles + per-read observations."""

    offset: int                  # window offset of first REF base
    ref: str
    alts: List[str]
    obs: np.ndarray              # (R,) int8 -1/0/1..A
    quals: np.ndarray            # (R,) float32
    anchor: int                  # representative offset for RPL/RPR


def _minimalize(offset: int, ref: str, alts: List[str]):
    """Trim shared suffix/prefix across REF and all ALTs (parsimony)."""
    # suffix
    while len(ref) > 1 and all(len(a) > 1 for a in alts) and all(
        a[-1] == ref[-1] for a in alts
    ):
        ref = ref[:-1]
        alts = [a[:-1] for a in alts]
    # prefix
    while len(ref) > 1 and all(len(a) > 1 for a in alts) and all(
        a[0] == ref[0] for a in alts
    ):
        ref = ref[1:]
        alts = [a[1:] for a in alts]
        offset += 1
    return offset, ref, alts


def _passes_per_sample(
    obs_alt: np.ndarray, obs_cov: np.ndarray,
    sample_of_read: np.ndarray, n_samples: int, cfg: CallerConfig,
) -> bool:
    for si in range(n_samples):
        m = sample_of_read == si
        ac = int((obs_alt & m).sum())
        dps = int((obs_cov & m).sum())
        if ac >= cfg.min_alternate_count and dps > 0 and (
            ac / dps >= cfg.min_alternate_fraction
        ):
            return True
    return False


def _build_simple_snv_locus(
    group: List[dict], ref_codes: np.ndarray, p: WindowPileup,
    cfg: CallerConfig,
) -> _Locus:
    """All atoms are SNVs at one offset → (multi-allelic) SNP locus."""
    off = group[0]["off"]
    col, q, _ = p.col(off)
    ref_code = int(ref_codes[off])
    order = sorted(group, key=lambda a: -a["count"])[: cfg.max_alts]
    alt_codes = [a["alt_code"] for a in order]
    obs = np.full(len(col), -1, np.int8)
    obs[col == ref_code] = 0
    for k, ac in enumerate(alt_codes, start=1):
        obs[col == ac] = k
    # bases that are neither ref nor a kept alt stay "covering but other":
    # they count against every genotype equally → mark non-covering
    return _Locus(
        offset=off,
        ref=_BASES[ref_code],
        alts=[_BASES[c] for c in alt_codes],
        obs=obs,
        quals=np.maximum(q.astype(np.float32), 1.0),
        anchor=off,
    )


def _build_indel_locus(
    atom: dict, p: WindowPileup, cfg: CallerConfig
) -> _Locus:
    off = atom["off"]
    col, q, _ = p.col(off)
    alt_reads = atom["alt_reads"]
    obs = np.full(len(col), -1, np.int8)
    obs[(col >= 0) & ~alt_reads] = 0
    obs[alt_reads] = 1
    quals = np.full(len(col), float(cfg.indel_q), np.float32)
    return _Locus(
        offset=off, ref=atom["ref"], alts=[atom["alt"]],
        obs=obs, quals=quals, anchor=off,
    )


def _build_haplotype_locus(
    group: List[dict], ref_codes: np.ndarray, p: WindowPileup,
    n_samples: int, cfg: CallerConfig, sample_of_read: np.ndarray,
) -> Optional[List[_Locus]]:
    """Joint evaluation over the group's spanned window: reads vote for
    the haplotype they carry.  Returns the loci to genotype (one complex
    locus, or per-atom fallback when no joint allele passes)."""
    w0 = min(a["span"][0] for a in group)
    w1 = max(a["span"][1] for a in group)
    w1 = min(w1, w0 + 128, len(ref_codes))
    if (ref_codes[w0:w1] >= 4).any():
        return None
    ref_hap = "".join(_BASES[c] for c in ref_codes[w0:w1])
    R = len(p.reads)

    snp_offs = sorted({a["off"] for a in group if a["kind"] == "snp"})
    indel_atoms = [a for a in group if a["kind"] == "indel"]

    # per-read haplotype observation
    cols = {o: p.col(o) for o in snp_offs}
    full_cover = p.covers(w0, w1)
    hap_of_read: List[Optional[str]] = [None] * R
    qual_of_read = np.full(R, float(cfg.indel_q), np.float32)

    indel_support = np.zeros(R, bool)
    for a in indel_atoms:
        ioff, iref, ialt = a["off"], a["ref"], a["alt"]
        hap = ref_hap[: ioff - w0] + ialt + ref_hap[ioff - w0 + len(iref):]
        for ri in np.nonzero(a["alt_reads"])[0]:
            if not indel_support[ri]:
                hap_of_read[ri] = hap
                indel_support[ri] = True

    if snp_offs:
        proj_mat = np.stack([cols[o][0] for o in snp_offs], axis=1)  # (R, K)
        qual_mat = np.stack([cols[o][1] for o in snp_offs], axis=1)
        covers_all = (proj_mat >= 0).all(axis=1) & full_cover
        for ri in np.nonzero(covers_all & ~indel_support)[0]:
            hap = list(ref_hap)
            for ki, o in enumerate(snp_offs):
                hap[o - w0] = _BASES[proj_mat[ri, ki]]
            hap_of_read[ri] = "".join(hap)
            qual_of_read[ri] = max(1.0, float(qual_mat[ri].min()))
    else:
        for ri in np.nonzero(full_cover & ~indel_support)[0]:
            hap_of_read[ri] = ref_hap
            qual_of_read[ri] = 30.0

    # tally candidate haplotypes
    hap_counts: Dict[str, int] = {}
    for h in hap_of_read:
        if h is not None and h != ref_hap:
            hap_counts[h] = hap_counts.get(h, 0) + 1
    covering = np.array([h is not None for h in hap_of_read])
    passing = []
    for h, c in sorted(hap_counts.items(), key=lambda kv: -kv[1]):
        is_h = np.array([x == h for x in hap_of_read])
        if _passes_per_sample(is_h, covering, sample_of_read, n_samples, cfg):
            passing.append(h)
        if len(passing) >= cfg.max_alts:
            break
    if not passing:
        # reads don't co-carry a joint allele → per-atom fallback
        return []

    obs = np.full(R, -1, np.int8)
    for ri, h in enumerate(hap_of_read):
        if h is None:
            continue
        if h == ref_hap:
            obs[ri] = 0
        elif h in passing:
            obs[ri] = passing.index(h) + 1
    off2, ref2, alts2 = _minimalize(w0, ref_hap, list(passing))
    return [
        _Locus(
            offset=off2, ref=ref2, alts=alts2, obs=obs,
            quals=qual_of_read, anchor=snp_offs[0] if snp_offs else w0,
        )
    ]


def _build_loci(
    genome: np.ndarray, p: WindowPileup, n_samples: int, cfg: CallerConfig,
    sample_of_read: np.ndarray,
) -> List[_Locus]:
    ref_codes = genome[p.start : p.end]
    atoms = _collect_atoms(genome, p, n_samples, cfg, sample_of_read)
    loci: List[_Locus] = []
    for group in _group_atoms(atoms, cfg.haplotype_gap):
        snp_offs = {a["off"] for a in group if a["kind"] == "snp"}
        only_snps = all(a["kind"] == "snp" for a in group)
        if only_snps and len(snp_offs) == 1:
            loci.append(_build_simple_snv_locus(group, ref_codes, p, cfg))
            continue
        if len(group) == 1 and group[0]["kind"] == "indel":
            loci.append(_build_indel_locus(group[0], p, cfg))
            continue
        res = _build_haplotype_locus(
            group, ref_codes, p, n_samples, cfg, sample_of_read
        )
        if res:
            loci.extend(res)
            continue
        # fallback: evaluate atoms independently (joint allele unsupported)
        by_off: Dict[int, List[dict]] = {}
        for a in group:
            if a["kind"] == "snp":
                by_off.setdefault(a["off"], []).append(a)
            else:
                loci.append(_build_indel_locus(a, p, cfg))
        for off, snps in sorted(by_off.items()):
            loci.append(_build_simple_snv_locus(snps, ref_codes, p, cfg))
    loci.sort(key=lambda l: l.offset)
    return loci


# log10 prior by number of non-ref alleles in the genotype
def _log_priors(theta: float) -> np.ndarray:
    lp = np.zeros(_N_GT)
    lt = np.log10(theta)
    for g, (j, k) in enumerate(_GT_PAIRS):
        m = (j > 0) + (k > 0)
        lp[g] = m * lt
    return lp


def call_window(
    genome: np.ndarray,
    p: WindowPileup,
    n_samples: int,
    cfg: CallerConfig = CallerConfig(),
) -> List[SiteCall]:
    """Genotype all candidate loci of one window pileup."""
    R = len(p.reads)
    if R == 0:
        return []
    sample_of_read = np.array([si for _, si in p.reads], dtype=np.int32)
    loci = _build_loci(genome, p, n_samples, cfg, sample_of_read)
    if not loci:
        return []
    S = len(loci)
    strand_of_read = np.array(
        [1 if rec.is_reverse() else 0 for rec, _ in p.reads], dtype=np.int8
    )
    rlen_half = np.array(
        [len(rec.seq) / 2 if rec.seq != "*" else 50 for rec, _ in p.reads]
    )

    obs = np.stack([l.obs for l in loci])                  # (S, R)
    quals = np.stack([l.quals for l in loci]).astype(np.float32)
    n_alts = np.array([len(l.alts) for l in loci])

    # device GL terms (padded to shape buckets to bound recompilation),
    # then per-sample segment sums on host
    obs_p = _pad_to(_pad_to(obs, 0, 64, fill=-1), 1, 256, fill=-1)
    q_p = _pad_to(_pad_to(quals, 0, 64), 1, 256, fill=1.0)
    terms = np.asarray(
        _gl_terms_multi(jnp.asarray(obs_p), jnp.asarray(q_p))
    )[:S, :R]                                              # (S, R, G)

    A_max = cfg.max_alts
    gl_all = np.zeros((S, n_samples, _N_GT), np.float64)
    dp = np.zeros((S, n_samples), np.int32)
    ro = np.zeros((S, n_samples), np.int32)
    ao = np.zeros((S, n_samples, A_max), np.int32)
    qr = np.zeros((S, n_samples), np.int32)
    qa = np.zeros((S, n_samples, A_max), np.int32)
    for si in range(n_samples):
        m = sample_of_read == si
        obs_s = obs[:, m]
        q_s = quals[:, m]
        gl = terms[:, m].sum(axis=1).astype(np.float64)
        gl_all[:, si] = gl
        dp[:, si] = (obs_s >= 0).sum(axis=1)
        ro[:, si] = (obs_s == 0).sum(axis=1)
        qr[:, si] = np.where(obs_s == 0, q_s, 0).sum(axis=1).astype(np.int32)
        for k in range(A_max):
            mk = obs_s == (k + 1)
            ao[:, si, k] = mk.sum(axis=1)
            qa[:, si, k] = np.where(mk, q_s, 0).sum(axis=1).astype(np.int32)

    # mask genotypes referencing alleles a locus doesn't have
    pair_max = np.array([max(j, k) for j, k in _GT_PAIRS])
    invalid = pair_max[None, :] > n_alts[:, None]          # (S, G)
    gl_all = np.where(invalid[:, None, :], -1e9, gl_all)
    gl_norm = gl_all - gl_all.max(axis=2, keepdims=True)

    gt_idx = np.argmax(gl_norm, axis=2)                    # (S, n_samples)
    sortgl = np.sort(np.where(gl_norm < -1e8, -np.inf, gl_norm), axis=2)
    gq = np.minimum(
        99,
        np.round(
            10.0 * (sortgl[:, :, -1] - np.maximum(sortgl[:, :, -2], -1e9))
        ).astype(np.int64),
    )

    # posterior QUAL: P(polymorphic) under the heterozygosity prior
    lp = _log_priors(cfg.theta)                            # (G,)
    w = gl_norm + lp[None, None, :]
    w = np.where(gl_norm < -1e8, -np.inf, w)
    wmax = w.max(axis=2, keepdims=True)
    logZ = wmax[..., 0] + np.log10(
        np.sum(np.power(10.0, w - wmax), axis=2)
    )
    log_p0 = (gl_norm[:, :, 0] + lp[0]) - logZ             # (S, n_samples)
    qual = np.minimum(1e5, -10.0 * log_p0.sum(axis=1))

    out: List[SiteCall] = []
    for s, l in enumerate(loci):
        A = len(l.alts)
        alt_any = (obs[s] >= 1) & (obs[s] <= A)
        if not alt_any.any():
            continue
        best_pairs = np.array([_GT_PAIRS[int(g)] for g in gt_idx[s]])
        if not cfg.pooled_discrete and not (best_pairs > 0).any():
            # freebayes emits only polymorphic loci; pooled-discrete mode
            # keeps hom-ref records so the SSC filter sees marginal GLs
            continue
        _, rq, rp = p.col(l.anchor)
        rpl = np.zeros(A, np.int32)
        rpr = np.zeros(A, np.int32)
        saf = np.zeros(A, np.int32)
        sar = np.zeros(A, np.int32)
        for k in range(A):
            mk = obs[s] == (k + 1)
            placed = mk & (rp >= 0)
            rpl[k] = int(np.sum(placed & (rp < rlen_half)))
            rpr[k] = int(np.sum(placed & (rp >= rlen_half)))
            # indel-supporting reads may not project at the anchor; count
            # them by strand regardless
            saf[k] = int(np.sum(mk & (strand_of_read == 0)))
            sar[k] = int(np.sum(mk & (strand_of_read == 1)))
        # valid-genotype GL slice for this locus's ploidy
        keep_g = [g for g, (j, k) in enumerate(_GT_PAIRS) if k <= A]
        types, lens = zip(*[_allele_type(l.ref, a) for a in l.alts])
        out.append(
            SiteCall(
                offset=l.offset, ref=l.ref, alts=list(l.alts),
                types=list(types), lengths=list(lens),
                gt=best_pairs, gq=gq[s],
                gl=gl_norm[s][:, keep_g],
                dp=dp[s], ro=ro[s], ao=ao[s, :, :A],
                qr=qr[s], qa=qa[s, :, :A],
                qual=float(max(0.0, qual[s])),
                rpl=rpl, rpr=rpr, saf=saf, sar=sar,
            )
        )
    return out


def site_to_vcf(
    call: SiteCall, chrom: str, window_start: int, n_samples: int
) -> VCFRecord:
    A = len(call.alts)
    total_dp = int(call.dp.sum())
    total_ro = int(call.ro.sum())
    total_ao = call.ao.sum(axis=0)                         # (A,)
    ab = [
        round(int(a) / max(1, total_ro + int(a)), 6) for a in total_ao
    ]

    def lst(x):
        vals = [int(v) if float(v).is_integer() else float(v) for v in x]
        return vals[0] if A == 1 else vals

    info = {
        "DP": total_dp,
        "RO": total_ro,
        "AO": lst(total_ao),
        "AB": ab[0] if A == 1 else ab,
        "RPL": lst(call.rpl),
        "RPR": lst(call.rpr),
        "SAF": lst(call.saf),
        "SAR": lst(call.sar),
        "TYPE": call.types[0] if A == 1 else call.types,
        "LEN": lst(call.lengths),
        "NUMALT": A,
    }
    samples = []
    for si in range(n_samples):
        j, k = int(call.gt[si][0]), int(call.gt[si][1])
        samples.append(
            {
                "GT": f"{j}/{k}",
                "GQ": int(call.gq[si]),
                "DP": int(call.dp[si]),
                "RO": int(call.ro[si]),
                "QR": int(call.qr[si]),
                "AO": lst(call.ao[si]),
                "QA": lst(call.qa[si]),
                "GL": [round(float(x), 2) for x in call.gl[si]],
            }
        )
    return VCFRecord(
        chrom=chrom,
        pos=window_start + call.offset,
        id=".",
        ref=call.ref,
        alt=list(call.alts),
        qual=round(call.qual, 2),
        filter=".",
        info=info,
        format=["GT", "GQ", "DP", "RO", "QR", "AO", "QA", "GL"],
        samples=samples,
    )
