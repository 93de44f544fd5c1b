"""Auxiliary subsystem tests: vawk-equivalent filtering, prefetch buffer,
checkpoint/resume, realign, CLI surface, config."""

import os
import subprocess
import sys

import numpy as np
import pytest

from speedseq_tpu.formats.fasta import FastaFile, decode_bases
from speedseq_tpu.formats.vcf import VCFRecord
from speedseq_tpu.formats.vcf_filter import compile_filter, filter_records
from speedseq_tpu.formats.bam import read_bam
from speedseq_tpu.utils.prefetch import prefetch, StageTimer
from speedseq_tpu.utils import sim
from speedseq_tpu.align.pipeline import AlignConfig, align_fastq
from speedseq_tpu.align.realign import realign, read_groups_by_library
from speedseq_tpu.config import SpeedseqConfig

REF = "/root/reference/example/data/human_g1k_v37_20_42220611-42542245.fasta"


def _rec(qual=50.0, info=None, samples=None, fmt=None):
    return VCFRecord(
        chrom="c", pos=9, id=".", ref="A", alt=["T"], qual=qual, filter=".",
        info=info or {}, format=fmt or [], samples=samples or [],
    )


def test_vawk_filter_reference_expression():
    # the exact speedseq var filter expression (bin/speedseq:709)
    pred = compile_filter("$6>=1 && I$RPR>0 && I$RPL>0")
    assert pred(_rec(qual=5, info={"RPR": 3, "RPL": 2}))
    assert not pred(_rec(qual=0.5, info={"RPR": 3, "RPL": 2}))
    assert not pred(_rec(qual=5, info={"RPR": 0, "RPL": 2}))
    assert not pred(_rec(qual=5, info={}))  # missing → 0 (awk semantics)


def test_vawk_filter_samples_and_arith():
    pred = compile_filter("S$0$DP > 10 && $2 == 10")
    r = _rec(fmt=["DP"], samples=[{"DP": "30"}])
    assert pred(r)
    r2 = _rec(fmt=["DP"], samples=[{"DP": "5"}])
    assert not pred(r2)
    # flags count as 1
    pred2 = compile_filter("I$IMPRECISE == 1")
    assert pred2(_rec(info={"IMPRECISE": True}))
    assert not pred2(_rec(info={}))
    # comma-lists use the first element (awk-ish)
    pred3 = compile_filter("I$AO >= 7")
    assert pred3(_rec(info={"AO": "7,2"}))


def test_vawk_filter_rejects_garbage():
    with pytest.raises(ValueError):
        compile_filter("__import__('os')")
    with pytest.raises(ValueError):
        compile_filter("$6 >= 1; DROP")


def test_prefetch_order_and_errors():
    assert list(prefetch(iter(range(100)), depth=3)) == list(range(100))

    def boom():
        yield 1
        raise RuntimeError("io failed")

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        next(it)


def test_stage_timer():
    t = StageTimer()
    with t.stage("x", items=10):
        pass
    assert "x" in t.report()


@pytest.fixture(scope="module")
def small_run(tmp_path_factory):
    d = tmp_path_factory.mktemp("aux")
    g = FastaFile(REF).fetch_encoded("20_slice")
    names, s1, q1, s2, q2, truth = sim.simulate_pairs(g, 60, read_len=100, seed=41)
    sim.to_fastq(str(d / "a1.fq"), str(d / "a2.fq"), names, s1, q1, s2, q2)
    return d, truth


def test_checkpoint_resume(small_run):
    d, truth = small_run
    cfg = AlignConfig(batch_size=32, checkpoint=True, checkpoint_every=1)
    outs = align_fastq(REF, str(d / "a1.fq"), str(d / "a2.fq"),
                       out_prefix=str(d / "ck"), config=cfg)
    # journal cleaned up on success
    assert not os.path.exists(str(d / "ck") + ".align.ckpt")
    hdr, recs = read_bam(outs["bam"])
    assert len(recs) >= 120


def test_realign_roundtrip(small_run):
    d, truth = small_run
    cfg = AlignConfig(batch_size=64, rg_string="@RG\\tID:rg9\\tSM:NA\\tLB:L9")
    outs = align_fastq(REF, str(d / "a1.fq"), str(d / "a2.fq"),
                       out_prefix=str(d / "orig"), config=cfg)
    routs = realign(REF, [outs["bam"]], str(d / "re"),
                    config=AlignConfig(batch_size=64))
    hdr, orig = read_bam(outs["bam"])
    hdr2, re_recs = read_bam(routs["bam"])
    # same primary placements after realignment
    def prim_pos(recs):
        return {
            (r.qname, r.flag & 0xC0): (r.tid, r.pos)
            for r in recs if not (r.flag & 0x900)
        }
    a, b = prim_pos(orig), prim_pos(re_recs)
    same = sum(1 for k in a if b.get(k) == a[k])
    assert same / len(a) >= 0.98
    # read groups carried through (bamheadrg semantics)
    assert any("rg9" in l for l in hdr2.text.splitlines() if l.startswith("@RG"))
    assert all(r.get_tag("RG") == "rg9" for r in re_recs[:10])


def test_realign_orphan_reads_not_dropped(small_run, tmp_path):
    # a truncated/odd BAM (mate missing for some pairs) must still realign
    # the orphaned ends as single-end reads instead of silently losing them
    from speedseq_tpu.formats.bam import BAMReader, BAMWriter

    d, truth = small_run
    cfg = AlignConfig(batch_size=64, rg_string="@RG\\tID:rg9\\tSM:NA")
    outs = align_fastq(REF, str(d / "a1.fq"), str(d / "a2.fq"),
                       out_prefix=str(tmp_path / "full"), config=cfg)
    hdr, recs = read_bam(outs["bam"])
    prim = [r for r in recs if not (r.flag & 0x900) and r.seq != "*"]
    qnames = sorted({r.qname for r in prim})
    drop_r2 = set(qnames[:7])  # orphan 7 pairs by dropping their read2
    odd = str(tmp_path / "odd.bam")
    with BAMReader(outs["bam"]) as rd:
        with BAMWriter(odd, rd.header) as w:
            for r in rd:
                if r.qname in drop_r2 and r.flag & 0x80:
                    continue
                w.write(r)
    routs = realign(REF, [odd], str(tmp_path / "re"),
                    config=AlignConfig(batch_size=64))
    hdr2, re_recs = read_bam(routs["bam"])
    out_qnames = {r.qname for r in re_recs if not (r.flag & 0x900)}
    assert drop_r2 <= out_qnames, drop_r2 - out_qnames
    # every input primary read (by qname+end) survives the round trip
    n_in = len({(r.qname, r.flag & 0xC0) for r in prim
                if not (r.qname in drop_r2 and r.flag & 0x80)})
    n_out = len({(r.qname, r.flag & 0xC0) for r in re_recs
                 if not (r.flag & 0x900)})
    assert n_out == n_in, (n_out, n_in)


def test_rg_library_grouping():
    txt = "@RG\tID:a\tSM:s\tLB:l1\n@RG\tID:b\tSM:s\tLB:l1\n@RG\tID:c\tSM:s\tLB:l2"
    libs = read_groups_by_library(txt)
    assert libs == {"l1": ["a", "b"], "l2": ["c"]}


def test_config_load(tmp_path):
    p = str(tmp_path / "ss.config")
    with open(p, "w") as fh:
        fh.write("# comment\nTHREADS=8\nBATCH_SIZE=256\nVERBOSE=true\n"
                 "ANNOTATIONS_DIR=/tmp/ann\nUNKNOWN_KEY=zzz\n")
    cfg = SpeedseqConfig.load(p)
    assert cfg.threads == 8 and cfg.batch_size == 256 and cfg.verbose
    assert cfg.annotations_dir == "/tmp/ann"
    with pytest.raises(FileNotFoundError):
        SpeedseqConfig.load("/nonexistent/path")
    default = SpeedseqConfig.load(None)
    assert default.windows_bed is None
    assert default.default_windows() and os.path.exists(default.default_windows())


def test_cli_help_and_dispatch():
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH", ""))
    out = subprocess.run(
        [sys.executable, "-m", "speedseq_tpu", "--help"],
        capture_output=True, text=True, env=env,
    )
    assert out.returncode == 0
    for sub in ("align", "var", "somatic", "sv", "realign"):
        assert sub in out.stdout
    # align requires -R (reference contract: "required")
    out2 = subprocess.run(
        [sys.executable, "-m", "speedseq_tpu", "align", "x.fa", "y.fq"],
        capture_output=True, text=True, env=env,
    )
    assert out2.returncode == 1 and "-R" in out2.stderr


# ---------------------------------------------------------------- extsort

def test_external_sorter_spill_byte_identity(tmp_path):
    """Spilled+merged output must be byte-identical to the in-memory
    single-sort path (the samtools external-sort equivalence,
    bam_sort.c:1650-1812)."""
    from speedseq_tpu.formats.extsort import ExternalBAMSorter
    from speedseq_tpu.formats.sam import SAMHeader, SAMRecord

    rng = np.random.default_rng(7)
    hdr = SAMHeader.build(refs=[("c1", 10000), ("c2", 10000)])
    recs = []
    for i in range(1000):
        tid = int(rng.integers(-1, 2))
        pos = int(rng.integers(0, 9000)) if tid >= 0 else -1
        flag = 16 if rng.integers(0, 2) else 0
        if tid < 0:
            flag |= 4
        recs.append(SAMRecord(
            qname=f"r{i}", flag=flag, tid=tid, pos=pos, mapq=30,
            cigar=[(0, 50)] if tid >= 0 else [], mtid=-1, mpos=-1, tlen=0,
            seq="A" * 50, qual="I" * 50, tags=[("NM", "i", 0)],
        ))
    p_mem = str(tmp_path / "mem.bam")
    p_ext = str(tmp_path / "ext.bam")
    with ExternalBAMSorter(p_mem, hdr, max_records=10**9) as s:
        s.add_many(recs)
    with ExternalBAMSorter(p_ext, hdr, max_records=64) as s:
        for r in recs:
            s.add(r)
    with open(p_mem, "rb") as a, open(p_ext, "rb") as b:
        assert a.read() == b.read()
    assert not os.path.exists(p_ext + ".sorttmp")


def test_align_bounded_memory_identity(small_run, tmp_path):
    """A run forced to spill tiny sort chunks produces output identical to
    the unbounded run (streaming pipeline end-to-end)."""
    d, truth = small_run
    big = align_fastq(REF, str(d / "a1.fq"), str(d / "a2.fq"),
                      out_prefix=str(tmp_path / "big"),
                      config=AlignConfig(batch_size=32))
    small = align_fastq(REF, str(d / "a1.fq"), str(d / "a2.fq"),
                        out_prefix=str(tmp_path / "small"),
                        config=AlignConfig(batch_size=32,
                                           sort_max_records=16))
    for k in ("bam", "splitters.bam", "discordants.bam"):
        with open(big[k], "rb") as a, open(small[k], "rb") as b:
            assert a.read() == b.read(), k


def test_checkpoint_resume_mid_run(small_run, tmp_path):
    """Kill after a few batches, resume, and match an uninterrupted run."""
    import pickle

    d, truth = small_run
    cfg = AlignConfig(batch_size=16, checkpoint=True, checkpoint_every=1,
                      sort_max_records=24)
    ref_out = align_fastq(REF, str(d / "a1.fq"), str(d / "a2.fq"),
                          out_prefix=str(tmp_path / "full"), config=cfg)

    # simulate a crash: run fully, then rewind the journal to segment 2
    # and delete outputs — resume must redo batches ≥2 identically
    pref = str(tmp_path / "resume")
    align_fastq(REF, str(d / "a1.fq"), str(d / "a2.fq"),
                out_prefix=pref, config=cfg)
    # rebuild a truncated journal (first 2 segments) by re-running with
    # checkpointing but interrupting via a wrapper iterator
    from speedseq_tpu.formats import fastq as fq
    from speedseq_tpu.align.pipeline import align_stream

    class Stop(Exception):
        pass

    def limited(it, n):
        for i, x in enumerate(it):
            if i >= n:
                raise Stop()
            yield x

    import shutil

    batches = fq.iter_batches(str(d / "a1.fq"), batch_size=16, max_len=151,
                              paired_with=str(d / "a2.fq"))
    for f in list(os.listdir(str(tmp_path))):
        p = str(tmp_path / f)
        if f.startswith("resume"):
            shutil.rmtree(p) if os.path.isdir(p) else os.unlink(p)
    try:
        align_stream(REF, limited(batches, 2), pref, cfg)
    except Stop:
        pass
    assert os.path.exists(pref + ".align.ckpt")
    # resume from the journal with the full input
    cfg2 = AlignConfig(batch_size=16, checkpoint=True, checkpoint_every=1,
                       sort_max_records=24, resume=True)
    outs = align_fastq(REF, str(d / "a1.fq"), str(d / "a2.fq"),
                       out_prefix=pref, config=cfg2)
    for k in ("bam", "splitters.bam", "discordants.bam"):
        with open(ref_out[k], "rb") as a, open(outs[k], "rb") as b:
            assert a.read() == b.read(), k


def test_packed_sort_keys_unmapped_last():
    """Packed int64 coordinate keys must order identically to the tuple
    key (tid, pos+1, rev) with unmapped (tid=-1) records last — a tid
    sentinel of 1<<30 shifted by 33 would overflow int64 into the sign
    bit and sort unmapped records first."""
    from speedseq_tpu.formats.extsort import packed_keys

    tid = np.array([0, 1, -1, 0, 1, -1], np.int32)
    pos = np.array([5, 2, 7, 5, 2, 1], np.int32)
    flag = np.array([0, 16, 0, 16, 0, 0], np.int64)
    keys = packed_keys(tid, pos, flag)
    order = np.argsort(keys, kind="stable")
    tuples = [
        ((t if t >= 0 else 1 << 40), p + 1, 1 if f & 16 else 0)
        for t, p, f in zip(tid, pos, flag)
    ]
    want = sorted(range(len(tuples)), key=lambda i: (tuples[i], i))
    assert list(order) == want
    assert keys.max() > 0  # no sign-bit overflow


def test_var_window_failure_tolerance(monkeypatch, tmp_path):
    """A failing window must not abort the run (the reference's `|| true`
    merge semantics, bin/speedseq:768,803) and must be counted."""
    import gzip

    from speedseq_tpu.formats.fasta import FastaFile
    from speedseq_tpu.utils import sim
    from speedseq_tpu.utils.metrics import metrics
    from speedseq_tpu.var import run_var
    from speedseq_tpu.var.engine import VarConfig
    from speedseq_tpu.var import caller as var_caller

    genome = FastaFile(REF).fetch_encoded("20_slice")
    names, s1, q1, s2, q2, t = sim.simulate_pairs(
        genome[:30000], 150, read_len=100, seed=31)
    d = tmp_path
    sim.to_fastq(str(d / "f1.fq"), str(d / "f2.fq"), names, s1, q1, s2, q2)
    outs = align_fastq(REF, str(d / "f1.fq"), str(d / "f2.fq"),
                       out_prefix=str(d / "ff"), config=AlignConfig(batch_size=256))
    real_prep = var_caller.prepare_window
    state = {"n": 0}

    def flaky(*a, **k):
        state["n"] += 1
        if state["n"] == 1:
            raise RuntimeError("injected window fault")
        return real_prep(*a, **k)

    monkeypatch.setattr(var_caller, "prepare_window", flaky)
    metrics.reset()
    out = run_var(REF, [outs["bam"]], str(d / "v.vcf.gz"),
                  config=VarConfig(window_size=10_000))
    assert os.path.exists(out)
    snap = metrics.snapshot()
    assert snap.get("var.windows_failed") == 1
    # the remaining windows still processed
    assert snap.get("var.windows", 0) >= 2
    # output is a valid (possibly empty) vcf.gz
    list(gzip.open(out, "rt"))


def test_metrics_counters():
    from speedseq_tpu.utils.metrics import Metrics

    m = Metrics()
    m.add("x")
    m.add("x", 2)
    with m.timer("t"):
        pass
    snap = m.snapshot()
    assert snap["x"] == 3 and "time.t" in snap
    assert "x: 3" in m.report()
    m.reset()
    assert m.snapshot() == {}


def test_bamutil_filter_and_group(tmp_path):
    """bamkit equivalents: bamfilterrg subset + bamgroupreads name-group
    (reference scripts at bin/speedseq:1885-1962 / .gitmodules:19-21)."""
    from speedseq_tpu.formats.bam import read_bam, write_bam
    from speedseq_tpu.formats.bamutil import (
        filter_read_groups, group_reads_by_name,
    )
    from speedseq_tpu.formats.sam import SAMHeader, SAMRecord

    hdr = SAMHeader.build(
        refs=[("c1", 5000)],
        read_groups=["@RG\tID:a\tSM:s1", "@RG\tID:b\tSM:s2"],
    )
    recs = []
    for i, (name, rg) in enumerate([
        ("r10", "a"), ("r2", "b"), ("r2", "b"), ("r1", "a"), ("r10", "a"),
    ]):
        flag = 0x40 if i % 2 == 0 else 0x80
        recs.append(SAMRecord(
            qname=name, flag=flag | 1, tid=0, pos=100 * i, mapq=40,
            cigar=[(0, 50)], mtid=-1, mpos=-1, tlen=0, seq="A" * 50,
            qual="I" * 50, tags=[("RG", "Z", rg)],
        ))
    src = str(tmp_path / "u.bam")
    write_bam(src, hdr, recs)

    out = str(tmp_path / "rg_a.bam")
    n = filter_read_groups(src, out, ["a"])
    assert n == 3
    h2, r2 = read_bam(out)
    assert all(r.get_tag("RG") == "a" for r in r2)
    assert "ID:b" not in h2.text and "ID:a" in h2.text

    gout = str(tmp_path / "grouped.bam")
    group_reads_by_name(src, gout)
    h3, r3 = read_bam(gout)
    names = [r.qname for r in r3]
    # natural-number order: r1 < r2 < r10 (lexicographic would put r10 first)
    assert names == ["r1", "r2", "r2", "r10", "r10"]
    # read1 precedes read2 within a name group
    fl = [(r.qname, bool(r.flag & 0x40)) for r in r3]
    assert fl[1] == ("r2", True) and fl[2] == ("r2", False)


def test_cli_default_annotation_resolution():
    """-w/-x 'default' resolve the shipped annotation BEDs through the
    config's annotations_dir (SURVEY §2 component 22)."""
    from speedseq_tpu.cli import _resolve_exclude, _resolve_windows
    from speedseq_tpu.config import SpeedseqConfig

    kcfg = SpeedseqConfig()
    w = _resolve_windows("default", kcfg)
    x = _resolve_exclude("default", kcfg)
    assert w and w.endswith("ceph18.b37.include.2014-01-15.bed")
    assert x and x.endswith("ceph18.b37.lumpy.exclude.2014-01-15.bed")
    assert os.path.exists(w) and os.path.exists(x)
    # explicit paths and None pass through untouched
    assert _resolve_windows(None, kcfg) == kcfg.windows_bed
    assert _resolve_windows("/tmp/custom.bed", kcfg) == "/tmp/custom.bed"
    # missing annotations dir fails loudly
    kcfg2 = SpeedseqConfig(annotations_dir="/nonexistent")
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        _resolve_windows("default", kcfg2)


# ---------------------------------------------------------------------------
# bundled functional annotation (var/annotate.py — VEP-surface from GFF)
# ---------------------------------------------------------------------------

def _annot_world(tmp_path):
    """Toy genome + GTF: one + strand coding gene, one - strand gene.

    chrom 'c' (120 bp):
      geneA (+): exons 21-50, 61-90; CDS 31-50, 61-80
      geneB (-): exon 96-110, CDS 96-110
    """
    from speedseq_tpu.var.annotate import Annotator

    # build a genome whose CDS translates cleanly: CDS A (40 bases)
    # = ATG GCT GCT ... ; place known codons at known offsets
    g = ["A"] * 120
    cdsA = "ATGGCTTGGAAACGTACGTACGTACGTACGTACGTACTAA"  # 40 bases: M A W K ...
    for i, ch in enumerate(cdsA[:20]):
        g[30 + i] = ch          # CDS part 1: 31-50 (1-based)
    for i, ch in enumerate(cdsA[20:]):
        g[60 + i] = ch          # CDS part 2: 61-80
    cdsB = "ATGTTTTAA"[::-1].translate(
        str.maketrans("ACGT", "TGCA"))  # revcomp → genome + strand text
    for i, ch in enumerate(cdsB):
        g[95 + i] = ch          # 96-104 on '-' strand reads ATG TTT TAA
    fa = str(tmp_path / "ann.fa")
    with open(fa, "w") as fh:
        fh.write(">c\n" + "".join(g) + "\n")
    gtf = str(tmp_path / "ann.gtf")
    with open(gtf, "w") as fh:
        fh.write("\n".join([
            'c\tx\ttranscript\t21\t90\t.\t+\t.\tgene_id "GA"; '
            'transcript_id "TA"; gene_name "ALPHA"; '
            'gene_biotype "protein_coding";',
            'c\tx\texon\t21\t50\t.\t+\t.\tgene_id "GA"; transcript_id "TA";',
            'c\tx\texon\t61\t90\t.\t+\t.\tgene_id "GA"; transcript_id "TA";',
            'c\tx\tCDS\t31\t50\t.\t+\t0\tgene_id "GA"; transcript_id "TA";',
            'c\tx\tCDS\t61\t80\t.\t+\t0\tgene_id "GA"; transcript_id "TA";',
            'c\tx\ttranscript\t96\t110\t.\t-\t.\tgene_id "GB"; '
            'transcript_id "TB"; gene_name "BETA";',
            'c\tx\texon\t96\t110\t.\t-\t.\tgene_id "GB"; transcript_id "TB";',
            'c\tx\tCDS\t96\t104\t.\t-\t0\tgene_id "GB"; transcript_id "TB";',
        ]) + "\n")
    return Annotator(gtf, fa)


def _cons(ann, pos1, ref, alt, feature=None):
    out = ann.csq("c", pos1 - 1, ref, [alt])
    assert out is not None
    for entry in out.split(","):
        f = entry.split("|")
        if feature is None or f[5] == feature:
            return f
    raise AssertionError(out)


def test_annotate_consequences(tmp_path):
    ann = _annot_world(tmp_path)
    # CDS A codon 2 = GCT (Ala) at genomic 34-36
    f = _cons(ann, 35, "C", "G", "TA")      # GCT→GGT: Ala→Gly missense
    assert f[0] == "missense_variant"
    assert f[1] == "gCt/gGt" and f[2] == "A/G"
    assert (f[3], f[4], f[10]) == ("GA", "ALPHA", "protein_coding")
    assert f[9] == "2"                       # protein position
    f = _cons(ann, 36, "T", "C", "TA")      # GCT→GCC still Ala
    assert f[0] == "synonymous_variant" and f[2] == "A"
    f = _cons(ann, 39, "G", "A", "TA")      # TGG(Trp)→TGA stop
    assert f[0] == "stop_gained" and f[2] == "W/*"
    f = _cons(ann, 32, "T", "C", "TA")      # ATG start codon hit
    assert f[0] == "start_lost"
    f = _cons(ann, 25, "A", "T", "TA")      # exon 1, before CDS
    assert f[0] == "5_prime_UTR_variant" and f[6] == "1/2"
    f = _cons(ann, 85, "A", "T", "TA")      # exon 2, after CDS
    assert f[0] == "3_prime_UTR_variant"
    f = _cons(ann, 55, "A", "T", "TA")      # intron
    assert f[0] == "intron_variant"
    f = _cons(ann, 51, "A", "T", "TA")      # first intron base
    assert f[0] == "splice_donor_variant"
    f = _cons(ann, 59, "A", "T", "TA")      # 2 bases before exon 2
    assert f[0] == "splice_acceptor_variant"
    f = _cons(ann, 35, "C", "CG", "TA")     # +1 bp in CDS
    assert f[0] == "frameshift_variant"
    f = _cons(ann, 35, "CTT", "C", "TA")    # hmm len diff 2 → frameshift
    assert f[0] == "frameshift_variant"
    f = _cons(ann, 16, "A", "T", "TA")      # 5 bp before transcript
    assert f[0] == "upstream_gene_variant"
    # minus-strand gene (CDS 96-104 on '-' reads ATG TTT TAA): exact
    # VEP-style codon/AA anchors on the reverse strand
    f = _cons(ann, 102, "C", "T", "TB")     # ATG→ATA: start codon hit
    assert f[0] == "start_lost"
    assert f[1] == "atG/atA" and f[9] == "1"
    f = _cons(ann, 99, "A", "G", "TB")      # TTT→TTC: Phe→Phe
    assert f[0] == "synonymous_variant" and f[2] == "F"
    f = _cons(ann, 98, "A", "C", "TB")      # TAA→GAA: *→E
    assert f[0] == "stop_lost" and f[2] == "*/E"
    # a chrom with no annotated genes at all
    out = ann.csq("chrEmpty", 0, "A", ["T"])
    assert out.split("|")[0] == "intergenic_variant"
    ann.close()


def test_annotate_symbolic_and_bnd_alts(tmp_path):
    """sv --gff route (ADVICE r4): symbolic alts must annotate by their
    affected SPAN (not as ref→ref 'synonymous') and BND bracket strings
    by the breakpoint base (not as 'frameshift')."""
    ann = _annot_world(tmp_path)

    def one(pos1, alt, end1=None):
        out = ann.csq("c", pos1 - 1, "N", [alt], end1=end1)
        for entry in out.split(","):
            f = entry.split("|")
            if f[5] == "TA" or f[0] == "intergenic_variant":
                return f
        raise AssertionError(out)

    # <DEL> spanning into CDS A → coding overlap, never synonymous
    f = one(31, "<DEL>", end1=55)
    assert f[0] == "coding_sequence_variant"
    assert f[1] == "" and f[2] == ""         # no codon fields for spans
    # <DUP> wholly inside the intron (53-59)
    f = one(53, "<DUP>", end1=59)
    assert f[0] == "intron_variant"
    # <DEL> over the 5' UTR exon bases only (22-29)
    f = one(22, "<DEL>", end1=29)
    assert f[0] == "5_prime_UTR_variant"
    # BND bracket alt: breakpoint base inside CDS → coding overlap,
    # never frameshift (the bracket string is not an allele sequence)
    f = one(35, "N[c:200[")
    assert f[0] == "coding_sequence_variant"
    f = one(55, "]c:10]N")
    assert f[0] == "intron_variant"
    ann.close()


def test_annotate_vcf_cli(tmp_path):
    """var --gff end-to-end: the output vcf.gz gains a CSQ header and
    per-record CSQ entries with the reference's pinned field count."""
    import gzip as _gz

    from speedseq_tpu.formats.vcf import VCFHeader, VCFRecord, VCFWriter
    from speedseq_tpu.var.annotate import annotate_vcf

    ann = _annot_world(tmp_path)   # writes ann.fa / ann.gtf
    ann.close()
    h = VCFHeader.build([("c", 120)], ["S"], source="t")
    h.add_format("GT", "1", "String", "Genotype")
    out = str(tmp_path / "x.vcf.gz")
    with VCFWriter(out, h) as w:
        w.write(VCFRecord(chrom="c", pos=34, id=".", ref="C", alt=["G"],
                          qual=50.0, filter=".", info={}, format=["GT"],
                          samples=[{"GT": "0/1"}]))
    annotate_vcf(out, str(tmp_path / "ann.gtf"), str(tmp_path / "ann.fa"))
    lines = [l for l in _gz.open(out, "rt")]
    assert any(l.startswith("##INFO=<ID=CSQ") for l in lines)
    body = [l for l in lines if not l.startswith("#")]
    assert "CSQ=" in body[0]
    csq = [kv for kv in body[0].split("\t")[7].split(";")
           if kv.startswith("CSQ=")][0][4:]
    first = csq.split(",")[0].split("|")
    assert len(first) == 11                  # pinned VEP field list
    assert first[0] == "missense_variant"
