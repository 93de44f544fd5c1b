"""WGS-shape stress test (VERDICT r4 item 8): a multi-chromosome
synthetic genome with an exclude-BED depth hotspot, driven through
align → var → somatic → sv end-to-end.

Everything else in the suite validates on a single 321 kb contig; this
is the test that exercises the cross-chromosome assumptions — multi-SQ
headers and BAI/window handling, per-chromosome window fan-out, packed
sort keys with tid > 0, exclude-BED masking of a pileup hotspot, and
SV calls on three different chromosomes.  Scale is bounded for the CPU
suite; docs/PERF_NOTES.md records the larger on-chip run.
"""

import gzip
import os
import time

import numpy as np
import pytest

from speedseq_tpu.align.pipeline import AlignConfig, align_fastq
from speedseq_tpu.formats.bam import read_bam
from speedseq_tpu.formats.fasta import decode_bases
from speedseq_tpu.utils import sim

CHROMS = (("chrA", 200_000), ("chrB", 150_000), ("chrC", 100_000))
HOT_LO, HOT_HI = 60_000, 90_000          # chrB pileup hotspot
READ_LEN = 100


def _write_fasta(path, chroms):
    with open(path, "w") as fh:
        for name, g in chroms:
            s = decode_bases(g).decode()
            fh.write(f">{name}\n")
            for i in range(0, len(s), 60):
                fh.write(s[i:i + 60] + "\n")


def _sim_sample(chrom_seqs, coverages, seed, extra=None):
    """Simulate pairs per chromosome (plus optional extra regions) and
    return concatenated (names, s1, q1, s2, q2)."""
    parts = []
    rng_tag = 0
    for (name, g), cov in zip(chrom_seqs, coverages):
        n = int(cov * len(g) / (2 * READ_LEN))
        nm, s1, q1, s2, q2, _ = sim.simulate_pairs(
            g, n, read_len=READ_LEN, seed=seed + rng_tag)
        parts.append(([f"{name}.{x}" for x in nm], s1, q1, s2, q2))
        rng_tag += 1
    for (g, cov, tag) in (extra or []):
        n = int(cov * len(g) / (2 * READ_LEN))
        nm, s1, q1, s2, q2, _ = sim.simulate_pairs(
            g, n, read_len=READ_LEN, seed=seed + 91)
        parts.append(([f"{tag}.{x}" for x in nm], s1, q1, s2, q2))
    names = [n for p in parts for n in p[0]]
    return (names, np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]),
            np.concatenate([p[3] for p in parts]),
            np.concatenate([p[4] for p in parts]))


@pytest.mark.slow
def test_wgs_shape_end_to_end(tmp_path):
    from speedseq_tpu.sv import SVConfig, run_sv
    from speedseq_tpu.sv.engine import SVSample
    from speedseq_tpu.var import run_var
    from speedseq_tpu.var.engine import VarConfig
    from speedseq_tpu.var.somatic import SomaticConfig, run_somatic

    rng = np.random.default_rng(42)
    chroms = [(n, rng.integers(0, 4, ln).astype(np.uint8))
              for n, ln in CHROMS]
    ref = str(tmp_path / "wgs.fa")
    _write_fasta(ref, chroms)

    # ---- normal sample: germline variants on every chromosome ---------
    germ = []
    for k, (name, g) in enumerate(chroms):
        hap, variants, coord = sim.mutate(
            g, np.random.default_rng(7 + k), snv_rate=0.001,
            indel_rate=0.0002)
        germ.append((name, g, hap, coord, variants))
    norm_parts = [(n, h) for n, _, h, _, _ in germ]
    names, s1, q1, s2, q2 = _sim_sample(
        [(n, g) for n, g, *_ in germ], [8, 8, 8], seed=1,
        extra=[(chroms[1][1][HOT_LO:HOT_HI], 40, "hot")])
    # diploid: half the reads from the mutated haplotype
    t0 = time.time()
    fq1, fq2 = str(tmp_path / "n1.fq"), str(tmp_path / "n2.fq")
    sim.to_fastq(fq1, fq2, names, s1, q1, s2, q2)
    # haplotype reads for het variants (per chrom)
    hn, hs1, hq1, hs2, hq2 = _sim_sample(
        [(n, h) for n, _, h, _, _ in germ], [8, 8, 8], seed=2)
    sim.to_fastq(str(tmp_path / "h1.fq"), str(tmp_path / "h2.fq"),
                 hn, hs1, hq1, hs2, hq2)
    os.system(f"cat {tmp_path}/h1.fq >> {fq1}")
    os.system(f"cat {tmp_path}/h2.fq >> {fq2}")

    outs_n = align_fastq(
        ref, fq1, fq2, out_prefix=str(tmp_path / "normal"),
        config=AlignConfig(batch_size=2048, sample="NORMAL"))
    align_dt = time.time() - t0
    n_pairs = len(names) + len(hn)

    # ---- tumor sample: SVs on three different chromosomes --------------
    gA, gB, gC = (g for _, g in chroms)
    DELp, DELl = 50_000, 3_000          # chrA deletion
    INVp, INVl = 110_000, 2_000         # chrB inversion
    DUPp, DUPl = 40_000, 1_500          # chrC tandem duplication
    mutA = np.concatenate([gA[:DELp], gA[DELp + DELl:]])
    mutB = np.concatenate([
        gB[:INVp], 3 - gB[INVp:INVp + INVl][::-1], gB[INVp + INVl:]])
    mutC = np.concatenate([
        gC[:DUPp + DUPl], gC[DUPp:DUPp + DUPl], gC[DUPp + DUPl:]])
    tn, ts1, tq1, ts2, tq2 = _sim_sample(
        [("chrA", mutA), ("chrB", mutB), ("chrC", mutC)], [10, 10, 10],
        seed=3)
    tf1, tf2 = str(tmp_path / "t1.fq"), str(tmp_path / "t2.fq")
    sim.to_fastq(tf1, tf2, tn, ts1, tq1, ts2, tq2)
    outs_t = align_fastq(
        ref, tf1, tf2, out_prefix=str(tmp_path / "tumor"),
        config=AlignConfig(batch_size=2048, sample="TUMOR", rg_id="T"))

    # ---- BAM integrity across chromosomes ------------------------------
    hdr, recs = read_bam(outs_n["bam"])
    assert [n for n, _ in hdr.refs] == [n for n, _ in CHROMS]
    tids = {r.tid for r in recs if r.tid >= 0}
    assert tids == {0, 1, 2}
    keyed = [(r.tid if r.tid >= 0 else 1 << 30, r.pos) for r in recs]
    assert keyed == sorted(keyed)
    assert os.path.exists(outs_n["bam"] + ".bai")
    # the hotspot really is hot: chrB depth in [HOT_LO, HOT_HI) ≫ rest
    hot_n = sum(1 for r in recs if r.tid == 1 and HOT_LO <= r.pos < HOT_HI)
    rest_n = sum(1 for r in recs if r.tid == 1) - hot_n
    hot_span, rest_span = HOT_HI - HOT_LO, CHROMS[1][1] - (HOT_HI - HOT_LO)
    assert hot_n / hot_span > 3 * (rest_n / rest_span)

    # ---- var: germline calls on every chromosome -----------------------
    t0 = time.time()
    vcf = run_var(ref, [outs_n["bam"]], str(tmp_path / "g.vcf.gz"),
                  config=VarConfig(window_size=60_000, threads=2))
    var_dt = time.time() - t0
    with gzip.open(vcf, "rt") as fh:
        vrecs = [l.split("\t") for l in fh if not l.startswith("#")]
    per_chrom = {c: sum(1 for r in vrecs if r[0] == c)
                 for c, _ in CHROMS}
    assert all(per_chrom[c] > 10 for c, _ in CHROMS), per_chrom
    assert os.path.exists(vcf + ".tbi")

    # ---- somatic over [normal, tumor] ----------------------------------
    t0 = time.time()
    som = run_somatic(ref, outs_n["bam"], outs_t["bam"],
                      str(tmp_path / "som.vcf.gz"),
                      config=SomaticConfig(threads=2))
    som_dt = time.time() - t0
    with gzip.open(som, "rt") as fh:
        slines = [l for l in fh if not l.startswith("#")]
    assert all("SSC=" in l for l in slines)
    assert os.path.exists(som[:-len(".vcf.gz")] + ".ped")

    # ---- sv with the hotspot excluded ----------------------------------
    excl = str(tmp_path / "exclude.bed")
    with open(excl, "w") as fh:
        fh.write(f"chrB\t{HOT_LO - 5000}\t{HOT_HI + 5000}\n")
    t0 = time.time()
    svout = run_sv(
        [SVSample("TUMOR", outs_t["bam"], outs_t["splitters.bam"],
                  outs_t["discordants.bam"])],
        str(tmp_path / "sv.vcf.gz"),
        SVConfig(exclude_bed=excl))
    sv_dt = time.time() - t0
    with gzip.open(svout, "rt") as fh:
        svrecs = [l.split("\t") for l in fh if not l.startswith("#")]
    found = {(r[0], next(kv.split("=")[1] for kv in r[7].split(";")
                         if kv.startswith("SVTYPE=")))
             for r in svrecs}
    assert ("chrA", "DEL") in found, found
    assert ("chrB", "INV") in found, found
    assert ("chrC", "DUP") in found, found
    # excluded hotspot produced no calls inside its mask
    for r in svrecs:
        if r[0] == "chrB":
            assert not (HOT_LO - 5000 <= int(r[1]) < HOT_HI + 5000), r[:3]

    total_bp = sum(ln for _, ln in CHROMS)
    print(f"[wgs-shape] {total_bp/1e3:.0f} kbp x3 chroms: "
          f"align {2*n_pairs/align_dt:.0f} reads/s, "
          f"var {total_bp/var_dt/1e3:.1f} kbp/s, "
          f"somatic {total_bp/som_dt/1e3:.1f} kbp/s, "
          f"sv {total_bp/sv_dt/1e3:.1f} kbp/s")
