"""Native runtime (csrc/ssq_native.cc) conformance: byte-exact vs the pure
Python formats layer, round-trips, and gzip interop."""

import os
import struct
import subprocess

import numpy as np
import pytest

from speedseq_tpu import native
from speedseq_tpu.formats import bam, bam_cols, bgzf
from speedseq_tpu.formats.sam import SAMRecord

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")


def _py_bgzf_compress(data: bytes, level: int = 6) -> bytes:
    import io

    out = io.BytesIO()
    w = bgzf.BGZFWriter(out, level=level)
    w._native = None  # force sequential Python path
    w._batch_bytes = bgzf.BGZF_BLOCK_SIZE
    w.write(data)
    w.close()
    return out.getvalue()


@pytest.mark.parametrize("n", [0, 1, 100, 65280, 65281, 200_000, 1_000_003])
def test_bgzf_compress_byte_exact(n):
    rng = np.random.default_rng(n)
    data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    assert native.bgzf_compress(data) == _py_bgzf_compress(data)


def test_bgzf_decompress_roundtrip_and_crc():
    data = os.urandom(300_000) + b"ACGT" * 50_000
    comp = native.bgzf_compress(data)
    assert native.bgzf_decompress(comp) == data
    # corrupt a payload byte -> CRC failure
    bad = bytearray(comp)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError):
        native.bgzf_decompress(bytes(bad))


def test_bgzf_writer_batched_path_matches_python(tmp_path):
    data = os.urandom(500_000)
    p1, p2 = tmp_path / "a.gz", tmp_path / "b.gz"
    with bgzf.BGZFWriter(str(p1)) as w:  # native-batched
        for i in range(0, len(data), 7777):
            w.write(data[i : i + 7777])
    with open(p2, "wb") as fh:
        fh.write(_py_bgzf_compress(data))
    assert p1.read_bytes() == p2.read_bytes()
    assert bgzf.decompress(p1.read_bytes()) == data


def test_zcat_interop(tmp_path):
    data = b"the quick brown fox\n" * 10_000
    p = tmp_path / "x.gz"
    p.write_bytes(native.bgzf_compress(data))
    out = subprocess.run(["zcat", str(p)], capture_output=True, check=True)
    assert out.stdout == data


def _sample_records():
    return [
        SAMRecord("r/1", 99, 0, 1000, 60, [(0, 50), (1, 2), (0, 48)], 0,
                  1200, 300, "ACGT" * 25, "I" * 100,
                  [("MC", "Z", "100M"), ("NM", "i", 2)]),
        SAMRecord("r/2", 147, 0, 1200, 60, [(4, 10), (0, 90)], 0, 1000,
                  -300, "acgtnACGTN" * 10, "#" * 100,
                  [("XA", "Z", "chr1,+100,50M,2;")]),
        SAMRecord("un", 77, -1, -1, 0, [], -1, -1, 0, "ACG", "*", []),
        SAMRecord("star", 0, 0, 5, 0, [(0, 3)], -1, -1, 0, "*", "*",
                  [("ZB", "B", ("i", [1, -2, 3]))]),
        SAMRecord("mate_placed", 133, 2, 500, 0, [], 2, 500, 0, "AC", "AB", []),
    ]


def test_bam_encode_batch_byte_exact():
    recs = _sample_records()
    py = b"".join(
        struct.pack("<I", len(b)) + b for b in map(bam.encode_record, recs))
    assert bam_cols.encode_batch(recs) == py


def test_bam_decode_columns_roundtrip():
    recs = _sample_records()
    blob = bam_cols.encode_batch(recs)
    c = native.bam_decode(blob)
    assert c.n == len(recs)
    assert c.tid.tolist() == [r.tid for r in recs]
    assert c.pos.tolist() == [r.pos for r in recs]
    assert c.flag.tolist() == [r.flag for r in recs]
    assert c.mapq.tolist() == [r.mapq for r in recs]
    qn = bytes(c.qname_blob[: c.qname_off[-1]]).decode()
    assert qn == "".join(r.qname for r in recs)
    # cigars round-trip as len<<4|op words
    want = [w for r in recs for w in ((ln << 4) | op for op, ln in r.cigar)]
    assert c.cigar_blob[: c.cigar_off[-1]].tolist() == want


def test_bam_file_roundtrip_via_batch(tmp_path):
    from speedseq_tpu.formats.sam import SAMHeader

    header = SAMHeader.build([("chr1", 10_000), ("chr2", 5_000), ("c3", 9)])
    recs = _sample_records()
    p = tmp_path / "t.bam"
    bam.write_bam(str(p), header, recs)
    h2, back = bam.read_bam(str(p))
    assert [r.qname for r in back] == [r.qname for r in recs]
    assert [r.cigar for r in back] == [r.cigar for r in recs]
    assert [r.tags for r in back] == [r.tags for r in recs]
