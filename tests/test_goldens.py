"""Frozen self-goldens for the e2e CLI workflow (VERDICT r3 item 8).

The reference's only test artifact contract is the example workflow's
output list (README.md:40-45).  Since its FASTQ blob is missing, we
freeze OUR OWN outputs on the deterministic simulated workload (seeds
pinned, CPU backend via conftest) as record-level golden files, so
refactors in later rounds cannot silently drift records.

Update path (intentional changes):
    SSQ_UPDATE_GOLDENS=1 python -m pytest tests/test_goldens.py
rewrites tests/goldens/*.txt; review the diff and commit.

Float VCF fields compare with tolerance (f32 kernel text can move in
the last digit across XLA builds); everything integer — positions,
flags, CIGARs, genotypes, counts — compares exactly.
"""

import gzip
import os

import numpy as np
import pytest

from speedseq_tpu.formats.bam import read_bam
from speedseq_tpu.formats.fasta import FastaFile, decode_bases
from speedseq_tpu.utils import sim
from speedseq_tpu import cli

REF = "/root/reference/example/data/human_g1k_v37_20_42220611-42542245.fasta"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
UPDATE = bool(os.environ.get("SSQ_UPDATE_GOLDENS"))


@pytest.fixture(scope="module")
def workflow(tmp_path_factory):
    """Deterministic align → var → sv run (pinned seeds, CPU backend)."""
    d = tmp_path_factory.mktemp("goldens")
    os.chdir(d)
    g = FastaFile(REF).fetch_encoded("20_slice")[:20000]
    sub = str(d / "ref.fa")
    with open(sub, "w") as fh:
        s = decode_bases(g).decode()
        fh.write(">ref\n" + "\n".join(
            s[i:i + 60] for i in range(0, len(s), 60)) + "\n")
    rng = np.random.default_rng(42)
    hap, variants, coord = sim.mutate(g, rng, snv_rate=0.002,
                                      indel_rate=0.0003)
    # plant a deletion SV for the sv module
    DELp, DELl = 12000, 1500
    g_del = np.concatenate([g[:DELp], g[DELp + DELl:]])
    hap_del, v2, c2 = sim.mutate(g_del, np.random.default_rng(42),
                                 snv_rate=0.002, indel_rate=0.0003)
    npairs = int(25 * len(g_del) / 200)
    names, s1, q1, s2, q2, _ = sim.simulate_pairs(
        g_del, npairs, read_len=100, seed=1234,
        diploid_genome=hap_del, coord_map=c2)
    sim.to_fastq(str(d / "r1.fq"), str(d / "r2.fq"), names, s1, q1, s2, q2)
    assert cli.main([
        "align", "-o", str(d / "g"),
        "-R", "@RG\\tID:g\\tSM:G\\tLB:lib1",
        "--batch-size", "512", sub, str(d / "r1.fq"), str(d / "r2.fq"),
    ]) == 0
    assert cli.main(["var", "-o", str(d / "g"), sub, str(d / "g.bam")]) == 0
    assert cli.main([
        "sv", "-o", str(d / "g"), "-g", "-B", str(d / "g.bam"),
        "-S", str(d / "g.splitters.bam"),
        "-D", str(d / "g.discordants.bam"), "-R", sub,
    ]) == 0
    return d


def _bam_dump(path):
    hdr, recs = read_bam(path)
    out = []
    for r in recs:
        aux = ";".join(
            f"{t}={v}" for t, _, v in sorted(r.tags or [],
                                             key=lambda x: x[0]))
        out.append(
            f"{r.qname}\t{r.flag}\t{r.tid}\t{r.pos}\t{r.mapq}\t"
            f"{r.cigar}\t{r.mtid}\t{r.mpos}\t{r.tlen}\t{r.seq}\t{aux}")
    return out


def _vcf_dump(path):
    with gzip.open(path, "rt") as fh:
        return [l.rstrip("\n") for l in fh if not l.startswith("#")]


def _check(name, lines, float_fields=False):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    gp = os.path.join(GOLDEN_DIR, name)
    if UPDATE or not os.path.exists(gp):
        with open(gp, "w") as fh:
            fh.write("\n".join(lines) + ("\n" if lines else ""))
        if UPDATE:
            pytest.skip(f"golden {name} rewritten")
        pytest.fail(
            f"golden {name} was missing — generated; review and commit it")
    want = open(gp).read().splitlines()
    if not float_fields:
        assert lines == want, _diff_msg(name, lines, want)
        return
    # VCF: structural fields exact, floats tolerant
    assert len(lines) == want.__len__(), _diff_msg(name, lines, want)
    for got_l, want_l in zip(lines, want):
        g_f, w_f = got_l.split("\t"), want_l.split("\t")
        assert len(g_f) == len(w_f), (got_l, want_l)
        # CHROM POS ID REF ALT exact; QUAL tolerant; FILTER exact
        assert g_f[:5] == w_f[:5], (got_l, want_l)
        assert g_f[6] == w_f[6], (got_l, want_l)
        _tol_field(g_f[5], w_f[5], got_l)
        # INFO + FORMAT columns: token-wise, numeric-tolerant
        for gi, wi in zip(g_f[7:], w_f[7:]):
            for gt_, wt_ in zip(gi.replace(";", ":").split(":"),
                                wi.replace(";", ":").split(":")):
                _tol_field(gt_, wt_, got_l)


def _tol_field(g, w, ctx):
    gk, _, gv = g.partition("=")
    wk, _, wv = w.partition("=")
    assert gk == wk, (g, w, ctx)
    if not gv:
        gv, wv = gk, wk
    for a, b in zip(gv.split(","), wv.split(",")):
        try:
            fa, fb = float(a), float(b)
        except ValueError:
            assert a == b, (g, w, ctx)
            continue
        assert abs(fa - fb) <= max(0.15, 0.02 * abs(fb)), (g, w, ctx)


def _diff_msg(name, got, want):
    import difflib

    d = list(difflib.unified_diff(want, got, "golden", "current", n=1))
    return f"{name} drifted ({len(want)} -> {len(got)} records):\n" + \
        "\n".join(d[:40])


def test_golden_bam(workflow):
    d = workflow
    _check("example.bam.txt", _bam_dump(str(d / "g.bam")))


def test_golden_splitters(workflow):
    d = workflow
    _check("example.splitters.bam.txt",
           _bam_dump(str(d / "g.splitters.bam")))


def test_golden_discordants(workflow):
    d = workflow
    _check("example.discordants.bam.txt",
           _bam_dump(str(d / "g.discordants.bam")))


def test_golden_vcf(workflow):
    d = workflow
    _check("example.vcf.txt", _vcf_dump(str(d / "g.vcf.gz")),
           float_fields=True)


def test_golden_sv_vcf(workflow):
    d = workflow
    _check("example.sv.vcf.txt", _vcf_dump(str(d / "g.sv.vcf.gz")),
           float_fields=True)
