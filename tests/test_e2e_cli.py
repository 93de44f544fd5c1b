"""Golden-path workflow test through the CLI, mirroring the reference's
example/run_speedseq.sh:1-31 (align → var → sv on one sample): the only
"test suite" the reference ships is that script plus expected artifact
names (README.md:40-45).  Here we drive the same artifact contract via
cli.main on simulated reads with planted SNVs and a deletion SV."""

import os

import numpy as np
import pytest

from speedseq_tpu import cli
from speedseq_tpu.formats.fasta import FastaFile, decode_bases
from speedseq_tpu.formats.vcf import read_vcf
from speedseq_tpu.utils import sim
from speedseq_tpu.var.normalize import left_align

REF = "/root/reference/example/data/human_g1k_v37_20_42220611-42542245.fasta"
DELp, DELl = 9000, 1800


@pytest.fixture(scope="module")
def workflow(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    os.chdir(d)
    g = FastaFile(REF).fetch_encoded("20_slice")[:16000]
    sub = str(d / "ref.fa")
    with open(sub, "w") as fh:
        s = decode_bases(g).decode()
        fh.write(">ref\n" + "\n".join(s[i:i + 60] for i in range(0, len(s), 60)) + "\n")
    rng = np.random.default_rng(5)
    hap, variants, coord = sim.mutate(g, rng, snv_rate=0.002, indel_rate=0.0)
    # plant a homozygous deletion on BOTH haplotypes (drop from ref & hap)
    g_del = np.concatenate([g[:DELp], g[DELp + DELl:]])
    # map hap coords: deletion region in hap coords via coord map inverse —
    # simplest: rebuild hap from g_del with the same variant list positions
    hap_del, variants2, coord2 = sim.mutate(g_del, np.random.default_rng(5),
                                            snv_rate=0.002, indel_rate=0.0)
    npairs = int(22 * len(g_del) / 200)
    names, s1, q1, s2, q2, _ = sim.simulate_pairs(
        g_del, npairs, read_len=100, seed=3,
        diploid_genome=hap_del, coord_map=coord2)
    sim.to_fastq(str(d / "r1.fq"), str(d / "r2.fq"), names, s1, q1, s2, q2)
    rc = cli.main([
        "align", "-o", str(d / "ex"),
        "-R", "@RG\\tID:ex\\tSM:EX\\tLB:lib1",
        "--batch-size", "256", sub, str(d / "r1.fq"), str(d / "r2.fq"),
    ])
    assert rc == 0
    return d, sub, g, g_del, variants2


def test_align_artifacts(workflow):
    d, sub, g_ref, g, variants = workflow
    # README.md:40-45 artifact contract
    for suffix in ("bam", "bam.bai", "splitters.bam", "splitters.bam.bai",
                   "discordants.bam", "discordants.bam.bai"):
        assert os.path.exists(str(d / f"ex.{suffix}")), suffix


def test_var_cli(workflow):
    d, sub, g_ref, g, variants = workflow
    rc = cli.main(["var", "-o", str(d / "ex"), sub, str(d / "ex.bam")])
    assert rc == 0
    assert os.path.exists(str(d / "ex.vcf.gz.tbi"))
    hdr, recs = read_vcf(str(d / "ex.vcf.gz"))
    assert hdr.samples == ["EX"]
    truth = set()
    for p, r, a in variants:
        # variants were planted in deleted-genome coordinates; the VCF is in
        # reference coordinates — positions past the deletion shift by DELl
        p_ref = p if p < DELp else p + DELl
        pn, rn, an = left_align(g_ref, p_ref, r, a)
        truth.add((pn, rn, an))
    called = {(r.pos, r.ref, r.alt[0]) for r in recs}
    tp = len(called & truth)
    assert tp / len(truth) >= 0.9, (tp, len(truth))
    assert tp / max(1, len(called)) >= 0.9


def test_sv_cli(workflow):
    d, sub, g_ref, g, variants = workflow
    rc = cli.main([
        "sv", "-o", str(d / "ex"), "-g", "-d", "-P",
        "-R", sub, "-B", str(d / "ex.bam"),
        "-S", str(d / "ex.splitters.bam"), "-D", str(d / "ex.discordants.bam"),
    ])
    assert rc == 0
    out = str(d / "ex.sv.vcf.gz")
    assert os.path.exists(out + ".tbi")
    hdr, recs = read_vcf(out)
    dels = [r for r in recs if r.info.get("SVTYPE") == "DEL"]
    assert dels, [r.info.get("SVTYPE") for r in recs]
    r = dels[0]
    assert abs(r.pos - DELp) <= 150
    assert abs(int(r.info["END"]) - DELp) <= DELl + 150
    # genotyped (+CN from -d)
    assert r.samples[0]["GT"] in ("0/1", "1/1")
    assert "CN" in r.format
