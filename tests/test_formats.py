"""Format-layer conformance tests.

Vectors: the reference's vendored htslib test suite
(src/samtools-1.3.1/htslib-1.3.1/test/) and example/data FASTA+fai.
"""

import glob
import gzip
import io
import os

import numpy as np
import pytest

from speedseq_tpu.formats import bgzf, fasta, fastq, sam, bam, bai, vcf, bed, tabix


# --------------------------------------------------------------------- BGZF
def test_bgzf_roundtrip_small():
    data = b"hello bgzf world\n" * 100
    comp = bgzf.compress(data)
    assert comp.endswith(bgzf.BGZF_EOF)
    assert bgzf.decompress(comp) == data


def test_bgzf_roundtrip_multiblock():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=300_000, dtype=np.uint8).tobytes()
    comp = bgzf.compress(data)
    assert bgzf.decompress(comp) == data
    # every block ≤ 64 KiB compressed, payload ≤ 65280
    blocks = 0
    fh = io.BytesIO(comp)
    while True:
        try:
            payload, clen = bgzf._read_block(fh)
        except EOFError:
            break
        assert len(payload) <= bgzf.BGZF_BLOCK_SIZE
        assert clen <= 0x10000
        blocks += 1
    assert blocks >= 5  # 300k / 65280 + EOF


def test_bgzf_is_gzip_compatible():
    data = b"x" * 100000
    comp = bgzf.compress(data)
    assert gzip.decompress(comp) == data  # BGZF is valid multi-member gzip


def test_bgzf_virtual_offsets(tmp_path):
    p = str(tmp_path / "t.bgzf")
    with bgzf.BGZFWriter(p) as w:
        w.write(b"A" * 70000)
        voff = w.tell_virtual
        w.write(b"MARKER")
        w.write(b"B" * 100)
    r = bgzf.BGZFReader(p)
    r.seek_virtual(voff)
    assert r.read(6) == b"MARKER"
    r.close()


def test_bgzf_eof_marker_is_htslib_constant():
    # the 28-byte EOF block from htslib bgzf.c
    assert len(bgzf.BGZF_EOF) == 28
    assert bgzf.decompress(bgzf.BGZF_EOF) == b""


# ------------------------------------------------------------------- FASTA
def test_faidx_matches_reference_fai(example_fasta):
    recs = fasta.build_fai(example_fasta)
    with open(example_fasta + ".fai") as fh:
        expected = fh.read()
    got = "".join(
        f"{r.name}\t{r.length}\t{r.offset}\t{r.line_blen}\t{r.line_len}\n"
        for r in recs
    )
    assert got == expected


def test_fasta_fetch(example_fasta):
    fa = fasta.FastaFile(example_fasta)
    assert fa.names == ["20_slice"]
    assert fa.length("20_slice") == 321635
    seq = fa.fetch_bytes("20_slice", 0, 60)
    assert seq == b"GGATTTATTATATAGGCGAGGTGGTACTGTATTTCAAATCAGCATTGAAGAGATGAATTG"
    # crossing line boundaries
    s2 = fa.fetch_bytes("20_slice", 55, 65)
    assert s2 == fa.fetch_bytes("20_slice")[55:65]
    enc = fa.fetch_encoded("20_slice", 0, 4)
    assert list(enc) == [2, 2, 0, 3]  # GGAT
    fa.close()


def test_faidx_multiseq(tmp_path):
    p = str(tmp_path / "m.fa")
    with open(p, "w") as fh:
        fh.write(">a desc\nACGT\nACG\n>b\nTTTTTTTTTT\nTT\n")
    fa = fasta.FastaFile(p)
    assert fa.names == ["a", "b"]
    assert fa.fetch_bytes("a") == b"ACGTACG"
    assert fa.fetch_bytes("b", 8, 12) == b"TTTT"


# ------------------------------------------------------------------- FASTQ
def test_fastq_batches(tmp_path):
    p = str(tmp_path / "r.fq")
    with open(p, "w") as fh:
        for i in range(10):
            fh.write(f"@read{i} comment{i}\nACGTACGT\n+\nIIIIIIII\n")
    batches = list(fastq.iter_batches(p, batch_size=4, max_len=10))
    assert [b[0].n for b in batches] == [4, 4, 2]
    b0 = batches[0][0]
    assert b0.names[0] == "read0"
    assert b0.comments[0] == "comment0"
    assert b0.length[0] == 8
    assert list(b0.seq[0, :8]) == [0, 1, 2, 3, 0, 1, 2, 3]
    assert b0.seq[0, 8] == 4  # padding
    assert b0.qual[0, 0] == ord("I") - 33


def test_fastq_gz_and_interleaved(tmp_path):
    p = str(tmp_path / "r.fq.gz")
    with gzip.open(p, "wt") as fh:
        for i in range(6):
            fh.write(f"@frag{i//2}/{i%2+1}\nACGT\n+\nIIII\n")
    batches = list(fastq.iter_batches(p, batch_size=8, interleaved=True))
    r1, r2 = batches[0]
    assert r1.n == r2.n == 3
    # /1 and /2 mate markers are stripped (bwa read-name semantics)
    assert r1.names == ["frag0", "frag1", "frag2"]
    assert r2.names == ["frag0", "frag1", "frag2"]


# --------------------------------------------------------------------- SAM
@pytest.mark.parametrize(
    "name",
    ["ce#1.sam", "ce#2.sam", "ce#5b.sam", "ce#supp.sam", "ce#unmap.sam",
     "xx#pair.sam", "xx#rg.sam", "xx#tlen.sam", "auxf#values.sam",
     "c1#clip.sam", "c1#noseq.sam"],
)
def test_sam_text_roundtrip(htslib_test_dir, name):
    path = os.path.join(htslib_test_dir, name)
    header, records = sam.read_sam(path)
    with open(path) as fh:
        orig_lines = [l.rstrip("\n") for l in fh if not l.startswith("@")]
    for rec, orig in zip(records, orig_lines):
        assert rec.to_sam(header) == orig


def test_cigar_utils():
    c = sam.cigar_from_str("27M1D73M")
    assert c == [(0, 27), (2, 1), (0, 73)]
    assert sam.cigar_to_str(c) == "27M1D73M"
    assert sam.cigar_query_len(c) == 100
    assert sam.cigar_ref_len(c) == 101
    c2 = sam.cigar_from_str("10S80M5I10H")
    assert sam.cigar_query_len(c2) == 95
    assert sam.cigar_ref_len(c2) == 80


# --------------------------------------------------------------------- BAM
@pytest.mark.parametrize(
    "name",
    ["ce#1.sam", "ce#5b.sam", "ce#supp.sam", "auxf#values.sam",
     "xx#pair.sam", "c1#noseq.sam", "ce#unmap.sam"],
)
def test_bam_roundtrip_htslib_vectors(htslib_test_dir, name, tmp_path):
    path = os.path.join(htslib_test_dir, name)
    header, records = sam.read_sam(path)
    bam_path = str(tmp_path / "t.bam")
    bam.write_bam(bam_path, header, records)
    header2, records2 = bam.read_bam(bam_path)
    assert header2.refs == header.refs
    assert len(records2) == len(records)
    for a, b in zip(records, records2):
        assert a.to_sam(header) == b.to_sam(header2)


def test_bam_record_binary_roundtrip():
    r = sam.SAMRecord(
        qname="q1", flag=99, tid=0, pos=100, mapq=60,
        cigar=[(0, 50), (1, 2), (0, 48)], mtid=0, mpos=300, tlen=250,
        seq="A" * 100, qual="I" * 100,
        tags=[("RG", "Z", "rg1"), ("NM", "i", 2), ("AS", "i", 95)],
    )
    buf = bam.encode_record(r)
    r2 = bam.decode_record(buf)
    assert r2.qname == "q1" and r2.flag == 99 and r2.pos == 100
    assert r2.cigar == r.cigar
    assert r2.seq == r.seq and r2.qual == r.qual
    assert r2.get_tag("RG") == "rg1" and r2.get_tag("NM") == 2


def test_reg2bin():
    # values from the BAI spec binning scheme
    assert bam.reg2bin(0, 1) == 4681
    assert bam.reg2bin(0, 1 << 14) == 4681
    assert bam.reg2bin(0, (1 << 14) + 1) == 585
    assert bam.reg2bin(1 << 14, (1 << 14) + 1) == 4682
    assert bam.reg2bin(0, 1 << 29) == 0


# --------------------------------------------------------------------- BAI
def test_bai_build_and_query(tmp_path):
    header = sam.SAMHeader.build([("chr1", 1_000_000)], sort_order="coordinate")
    records = []
    for i in range(500):
        pos = i * 1000
        records.append(
            sam.SAMRecord(f"r{i}", 0, 0, pos, 60, [(0, 100)], -1, -1, 0,
                          "A" * 100, "I" * 100)
        )
    bam_path = str(tmp_path / "t.bam")
    bam.write_bam(bam_path, header, records)
    bai_path = bai.build_bai(bam_path)
    idx = bai.read_bai(bai_path)
    chunks = bai.query_chunks(idx, 0, 250_000, 260_000)
    assert chunks
    # verify query finds the right records
    with bam.BAMReader(bam_path) as rd:
        found = []
        for cb, ce in chunks:
            rd.seek_virtual(cb)
            while rd._r.tell_virtual < ce:
                rec = rd.read_record()
                if rec is None:
                    break
                if rec.pos < 260_000 and rec.end_pos() > 250_000:
                    found.append(rec.qname)
    assert set(f"r{i}" for i in range(250, 260)) <= set(found)


# --------------------------------------------------------------------- VCF
def test_vcf_roundtrip(tmp_path):
    h = vcf.VCFHeader.build([("20_slice", 321635)], ["NA12878"])
    h.add_info("DP", "1", "Integer", "Total read depth")
    h.add_format("GT", "1", "String", "Genotype")
    h.add_format("GL", "G", "Float", "Genotype likelihood")
    rec = vcf.VCFRecord(
        chrom="20_slice", pos=99, id=".", ref="A", alt=["G"], qual=222.0,
        filter=".", info={"DP": 30, "AB": 0.5},
        format=["GT", "GL"],
        samples=[{"GT": "0/1", "GL": [-10.0, 0.0, -12.5]}],
    )
    p = str(tmp_path / "t.vcf.gz")
    with vcf.VCFWriter(p, h) as w:
        w.write(rec)
    h2, recs = vcf.read_vcf(p)
    assert h2.samples == ["NA12878"]
    r = recs[0]
    assert r.pos == 99 and r.ref == "A" and r.alt == ["G"]
    assert r.info["DP"] == "30"
    assert r.samples[0]["GT"] == "0/1"
    line = rec.to_line()
    assert "GT:GL\t0/1:-10,0,-12.5" in line


# ------------------------------------------------------------------- tabix
def test_tabix_build_and_fetch(tmp_path):
    h = vcf.VCFHeader.build([("chr1", 10_000_000)], ["S"])
    p = str(tmp_path / "t.vcf.gz")
    with vcf.VCFWriter(p, h) as w:
        for i in range(2000):
            w.write(
                vcf.VCFRecord("chr1", i * 1000, ".", "A", ["T"], 50.0, ".",
                              {"DP": i}, ["GT"], [{"GT": "0/1"}])
            )
    tbi = tabix.build_tbi(p)
    lines = tabix.fetch_region(p, tbi, "chr1", 500_000, 505_000)
    poss = sorted(int(l.split(b"\t")[1]) for l in lines)
    assert poss == [500001, 501001, 502001, 503001, 504001]


# --------------------------------------------------------------------- BED
def test_bed_reference_annotations():
    ivs = bed.read_bed("/root/reference/annotations/ceph18.b37.include.2014-01-15.bed")
    assert len(ivs) == 34123  # README.md:153-155
    # reference windows are sorted most-expensive-first; our scheduler
    # reproduces that ordering property on arbitrary input
    sched = bed.longest_first(ivs)
    widths = [iv.end - iv.start for iv in sched]
    assert widths == sorted(widths, reverse=True)


def test_exclude_mask():
    ivs = [bed.BedInterval("chr1", 100, 200), bed.BedInterval("chr1", 150, 300),
           bed.BedInterval("chr2", 0, 50)]
    m = bed.ExcludeMask(ivs)
    assert list(m.contains("chr1", [99, 100, 250, 300])) == [False, True, True, False]
    assert m.overlaps("chr1", 290, 400)
    assert not m.overlaps("chr1", 300, 400)
    assert not m.overlaps("chr3", 0, 10)


# ---------------------------------------------------------------------------
# CRAM 3.0 reader conformance (htslib java-written vectors + SAM truth)
# ---------------------------------------------------------------------------

HTSLIB_TEST_DIR = (
    "/root/reference/src/samtools-1.3.1/htslib-1.3.1/test")


def _cram_vs_sam(cram, sam, fa):
    from speedseq_tpu.formats.cram import read_cram
    from speedseq_tpu.formats.sam import read_sam

    hdr, recs = read_cram(
        f"{HTSLIB_TEST_DIR}/{cram}",
        reference=(f"{HTSLIB_TEST_DIR}/{fa}" if fa else None))
    th, truth = read_sam(f"{HTSLIB_TEST_DIR}/{sam}")
    assert [n for n, _ in hdr.refs] == [n for n, _ in th.refs]
    assert len(recs) == len(truth)
    for a, b in zip(recs, truth):
        assert (a.qname, a.flag, a.tid, a.pos, a.mapq) == (
            b.qname, b.flag, b.tid, b.pos, b.mapq), (a.qname, b.qname)
        assert a.cigar == b.cigar, a.qname
        assert a.seq == b.seq and a.qual == b.qual, a.qname
        assert (a.mtid, a.mpos, a.tlen) == (b.mtid, b.mpos, b.tlen), a.qname
        assert sorted(a.tags) == sorted(b.tags), a.qname


def test_cram_ce5b_exact():
    """Mapped reads with mismatches/deletions/softclips/insertions and a
    SEQ=* secondary — every field must equal the SAM truth."""
    _cram_vs_sam("ce#5b_java.cram", "ce#5b.sam", "ce.fa")


def test_cram_large_aux_exact():
    """Paired reads with a large aux-tag surface (incl. mate linkage and
    TLEN reconstruction)."""
    _cram_vs_sam("xx#large_aux_java.cram", "xx#large_aux.sam", "xx.fa")


def test_cram_missing_required_ref_raises():
    """A reference-required CRAM without -R must fail loudly like htslib
    (ADVICE r4: silently filling match bases with N corrupted BAMs)."""
    from speedseq_tpu.formats.cram import read_cram

    with pytest.raises(ValueError, match="reference"):
        read_cram(f"{HTSLIB_TEST_DIR}/aux#aux_java.cram")


def test_cram_aux_types_decode():
    """Every aux tag type (A/i/f/Z/H/B with all array subtypes) decodes;
    allow_missing_ref opts into referenceless inspection (bases N)."""
    from speedseq_tpu.formats.cram import read_cram

    hdr, recs = read_cram(f"{HTSLIB_TEST_DIR}/aux#aux_java.cram",
                          allow_missing_ref=True)
    assert len(recs) == 2
    tags = {t: (typ, v) for t, typ, v in recs[1].tags}
    assert tags["Bi"] == ("B", ("i", [-2147483648, -2147483647, 0,
                                      2147483647]))
    assert tags["Bc"] == ("B", ("c", [-128, -127, 0, 127]))


def test_cram_to_bam_roundtrip():
    """CRAM → BAM conversion preserves every record through our BAM
    codec (the sv CRAM-input path)."""
    import tempfile

    from speedseq_tpu.formats.bam import read_bam
    from speedseq_tpu.formats.cram import cram_to_bam, is_cram
    from speedseq_tpu.formats.sam import read_sam

    assert is_cram(f"{HTSLIB_TEST_DIR}/ce#5b_java.cram")
    with tempfile.TemporaryDirectory() as d:
        out = f"{d}/ce.bam"
        cram_to_bam(f"{HTSLIB_TEST_DIR}/ce#5b_java.cram", out,
                    reference=f"{HTSLIB_TEST_DIR}/ce.fa")
        hdr, recs = read_bam(out)
        th, truth = read_sam(f"{HTSLIB_TEST_DIR}/ce#5b.sam")
        assert len(recs) == len(truth)
        for a, b in zip(recs, truth):
            assert (a.qname, a.flag, a.tid, a.pos, a.cigar, a.seq) == (
                b.qname, b.flag, b.tid, b.pos, b.cigar, b.seq)


def test_sam_bam_roundtrip_all_htslib_vectors(tmp_path):
    """Sweep EVERY SAM vector in the vendored htslib test dir through
    SAM-parse → BAM-write → BAM-read → SAM-text: field-exact on all 32
    fixtures (pads, bounds, unknown-length refs, large seqs, blank
    lines, unmapped variants, padded/depadded tags…)."""
    import glob

    from speedseq_tpu.formats.bam import BAMWriter, read_bam
    from speedseq_tpu.formats.sam import read_sam

    d = "/root/reference/src/samtools-1.3.1/htslib-1.3.1/test"
    skipped = []
    n_files = n_recs = 0
    for path in sorted(glob.glob(f"{d}/*.sam")):
        name = os.path.basename(path)
        try:
            hdr, recs = read_sam(path)
        except Exception as e:  # noqa: BLE001 — collect, assert below
            skipped.append((name, f"parse: {e}"))
            continue
        out = str(tmp_path / (name.replace("#", "_") + ".bam"))
        try:
            with BAMWriter(out, hdr) as w:
                w.write_batch(recs)
            hdr2, recs2 = read_bam(out)
        except Exception as e:  # noqa: BLE001
            skipped.append((name, f"roundtrip: {e}"))
            continue
        assert len(recs2) == len(recs), name
        for a, b in zip(recs, recs2):
            assert (a.qname, a.flag, a.tid, a.pos, a.mapq, a.cigar,
                    a.mtid, a.mpos, a.tlen, a.seq, a.qual) == (
                b.qname, b.flag, b.tid, b.pos, b.mapq, b.cigar,
                b.mtid, b.mpos, b.tlen, b.seq, b.qual), (name, a.qname)
            for ta, tb in zip(sorted(a.tags), sorted(b.tags)):
                assert ta[0] == tb[0], (name, a.qname, ta, tb)
                va, vb = ta[2], tb[2]
                if isinstance(va, float):
                    # BAM stores 'f' tags as float32 — text round-trips
                    # through the f32 value
                    assert np.float32(va) == np.float32(vb), (name, ta, tb)
                elif (isinstance(va, tuple) and va
                      and va[0] == "f"):
                    assert ([np.float32(x) for x in va[1]]
                            == [np.float32(x) for x in vb[1]]), (name, ta)
                else:
                    assert ta == tb, (name, a.qname, ta, tb)
        n_files += 1
        n_recs += len(recs)
    print(f"\n[conformance] {n_files} SAM vectors, {n_recs} records "
          f"round-tripped; skipped: {skipped}")
    assert not skipped, skipped
    assert n_files >= 30
