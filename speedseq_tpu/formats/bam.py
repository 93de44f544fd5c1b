"""BAM binary codec over BGZF (htslib sam.c/bam equivalents).

Contracts reproduced from the reference's vendored htslib:
- record layout bam1_core_t/bam1_t: src/samtools-1.3.1/htslib-1.3.1/htslib/
  sam.h:148-181 (fixed core + qname/cigar/4-bit seq/qual/aux)
- bam_read1/bam_write1: src/.../sam.c:407,443
- 4-bit seq code table ``=ACMGRSVTWYHKDBN`` (seq_nt16_str, sam.c)
- reg2bin 14/5 binning: src/.../hts.c:1622
"""

from __future__ import annotations

import struct
from typing import BinaryIO, Iterator, List, Optional, Tuple

from .bgzf import BGZFReader, BGZFWriter
from .sam import SAMHeader, SAMRecord, cigar_ref_len

BAM_MAGIC = b"BAM\x01"
SEQ_NT16 = "=ACMGRSVTWYHKDBN"
_NT16_CODE = {c: i for i, c in enumerate(SEQ_NT16)}
_NT16_CODE.update({c.lower(): i for i, c in enumerate(SEQ_NT16) if c.isalpha()})
_NT16_CODE["N"] = 15


def reg2bin(beg: int, end: int) -> int:
    """BAI bin for [beg, end) (src/.../hts.c:1622 semantics)."""
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


def _encode_aux(tags) -> bytes:
    out = bytearray()
    for tag, ty, v in tags:
        out += tag.encode()
        if ty == "A":
            out += b"A" + (v[0] if isinstance(v, (bytes, bytearray)) else v).encode()[:1]
        elif ty in "cCsSiI" or ty == "i":
            # htslib sam_parse1 picks the smallest int representation
            iv = int(v)
            if iv < 0:
                if iv >= -128:
                    out += b"c" + struct.pack("<b", iv)
                elif iv >= -32768:
                    out += b"s" + struct.pack("<h", iv)
                else:
                    out += b"i" + struct.pack("<i", iv)
            else:
                if iv <= 255:
                    out += b"C" + struct.pack("<B", iv)
                elif iv <= 65535:
                    out += b"S" + struct.pack("<H", iv)
                else:
                    out += b"I" + struct.pack("<I", iv)
        elif ty == "f":
            out += b"f" + struct.pack("<f", float(v))
        elif ty == "Z":
            out += b"Z" + str(v).encode() + b"\x00"
        elif ty == "H":
            out += b"H" + str(v).encode() + b"\x00"
        elif ty == "B":
            sub, arr = v
            fmt = {"c": "b", "C": "B", "s": "h", "S": "H", "i": "i", "I": "I", "f": "f"}[sub]
            out += b"B" + sub.encode() + struct.pack("<i", len(arr))
            out += struct.pack(f"<{len(arr)}{fmt}", *arr)
        else:
            raise ValueError(f"unsupported aux type {ty}")
    return bytes(out)


def _decode_aux(buf: bytes) -> List[Tuple[str, str, object]]:
    tags = []
    i = 0
    n = len(buf)
    while i + 3 <= n:
        tag = buf[i : i + 2].decode()
        ty = chr(buf[i + 2])
        i += 3
        if ty == "A":
            tags.append((tag, "A", chr(buf[i])))
            i += 1
        elif ty in "cCsSiI":
            fmt = {"c": "<b", "C": "<B", "s": "<h", "S": "<H", "i": "<i", "I": "<I"}[ty]
            sz = struct.calcsize(fmt)
            tags.append((tag, "i", struct.unpack_from(fmt, buf, i)[0]))
            i += sz
        elif ty == "f":
            tags.append((tag, "f", struct.unpack_from("<f", buf, i)[0]))
            i += 4
        elif ty in "ZH":
            end = buf.index(b"\x00", i)
            tags.append((tag, ty, buf[i:end].decode()))
            i = end + 1
        elif ty == "B":
            sub = chr(buf[i])
            cnt = struct.unpack_from("<i", buf, i + 1)[0]
            fmt = {"c": "b", "C": "B", "s": "h", "S": "H", "i": "i", "I": "I", "f": "f"}[sub]
            sz = struct.calcsize(fmt)
            vals = list(struct.unpack_from(f"<{cnt}{fmt}", buf, i + 5))
            tags.append((tag, "B", (sub, vals)))
            i += 5 + cnt * sz
        else:
            raise ValueError(f"unsupported aux type {ty}")
    return tags


def encode_record(r: SAMRecord) -> bytes:
    """bam_write1-equivalent record encoding (without block_size prefix)."""
    qname_b = r.qname.encode() + b"\x00"
    n_cigar = len(r.cigar)
    seq = "" if r.seq in ("*", "") else r.seq
    l_seq = len(seq)
    if r.tid >= 0 and r.pos >= 0:
        rl = cigar_ref_len(r.cigar)
        bin_ = reg2bin(r.pos, r.pos + (rl if rl else 1))
    else:
        bin_ = reg2bin(-1, 0)
    core = struct.pack(
        "<iiBBHHHiiii",
        r.tid,
        r.pos,
        len(qname_b),
        r.mapq,
        bin_,
        n_cigar,
        r.flag,
        l_seq,
        r.mtid,
        r.mpos,
        r.tlen,
    )
    cig = struct.pack(f"<{n_cigar}I", *((ln << 4) | op for op, ln in r.cigar))
    sb = bytearray((l_seq + 1) // 2)
    for i, c in enumerate(seq):
        code = _NT16_CODE.get(c, 15)
        if i % 2 == 0:
            sb[i // 2] = code << 4
        else:
            sb[i // 2] |= code
    if r.qual in ("*", "") or not seq:
        qb = b"\xff" * l_seq
    else:
        qb = bytes((ord(c) - 33) & 0xFF for c in r.qual)
    aux = _encode_aux(r.tags)
    return core + qname_b + cig + bytes(sb) + qb + aux


def decode_record(buf: bytes) -> SAMRecord:
    (
        tid,
        pos,
        l_qname,
        mapq,
        _bin,
        n_cigar,
        flag,
        l_seq,
        mtid,
        mpos,
        tlen,
    ) = struct.unpack_from("<iiBBHHHiiii", buf, 0)
    off = 32
    qname = buf[off : off + l_qname - 1].decode()
    off += l_qname
    cigar = []
    for v in struct.unpack_from(f"<{n_cigar}I", buf, off):
        cigar.append((v & 0xF, v >> 4))
    off += 4 * n_cigar
    nseq = (l_seq + 1) // 2
    seq_chars = []
    for i in range(l_seq):
        b = buf[off + i // 2]
        code = (b >> 4) if i % 2 == 0 else (b & 0xF)
        seq_chars.append(SEQ_NT16[code])
    seq = "".join(seq_chars) if l_seq else "*"
    off += nseq
    qual_b = buf[off : off + l_seq]
    qual = (
        "*"
        if not l_seq or all(q == 0xFF for q in qual_b)
        else "".join(chr(q + 33) for q in qual_b)
    )
    off += l_seq
    tags = _decode_aux(buf[off:])
    return SAMRecord(qname, flag, tid, pos, mapq, cigar, mtid, mpos, tlen, seq, qual, tags)


class BAMWriter:
    def __init__(self, path_or_fh, header: SAMHeader, level: int = 6):
        self._w = BGZFWriter(path_or_fh, level=level)
        text = header.text.encode()
        buf = BAM_MAGIC + struct.pack("<i", len(text)) + text
        buf += struct.pack("<i", len(header.refs))
        for name, ln in header.refs:
            nb = name.encode() + b"\x00"
            buf += struct.pack("<i", len(nb)) + nb + struct.pack("<i", ln)
        self._w.write(buf)
        self.header = header

    @property
    def tell_virtual(self) -> int:
        return self._w.tell_virtual

    def write(self, r: SAMRecord) -> None:
        rec = encode_record(r)
        self._w.write(struct.pack("<i", len(rec)) + rec)

    def write_raw(self, rec: bytes) -> None:
        self._w.write(struct.pack("<i", len(rec)) + rec)

    def write_blob(self, blob) -> None:
        """Write pre-encoded block_size-prefixed record bytes verbatim
        (the columnar emission path: records already carry prefixes)."""
        self._w.write(bytes(blob))

    def write_batch(self, records: List[SAMRecord]) -> None:
        """Encode+write many records in one native call (byte-identical to
        looping write(); csrc ssq_bam_encode fast path)."""
        from .bam_cols import encode_batch

        self._w.write(encode_batch(records))

    def close(self) -> None:
        self._w.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class BAMReader:
    def __init__(self, path_or_fh):
        self._r = BGZFReader(path_or_fh)
        magic = self._r.read(4)
        if magic != BAM_MAGIC:
            raise ValueError("not a BAM file")
        l_text = struct.unpack("<i", self._r.read(4))[0]
        text = self._r.read(l_text).rstrip(b"\x00").decode()
        n_ref = struct.unpack("<i", self._r.read(4))[0]
        refs = []
        for _ in range(n_ref):
            l_name = struct.unpack("<i", self._r.read(4))[0]
            name = self._r.read(l_name)[:-1].decode()
            l_ref = struct.unpack("<i", self._r.read(4))[0]
            refs.append((name, l_ref))
        self.header = SAMHeader(text=text, refs=refs)

    def __iter__(self) -> Iterator[SAMRecord]:
        while True:
            r = self.read_record()
            if r is None:
                return
            yield r

    def read_record(self) -> Optional[SAMRecord]:
        raw = self._r.read(4)
        if len(raw) < 4:
            return None
        (block_size,) = struct.unpack("<i", raw)
        return decode_record(self._r.read(block_size))

    def read_raw(self) -> Optional[Tuple[bytes, int]]:
        """(record bytes, virtual offset at record start) for indexing."""
        voff = self._r.tell_virtual
        raw = self._r.read(4)
        if len(raw) < 4:
            return None
        (block_size,) = struct.unpack("<i", raw)
        return self._r.read(block_size), voff

    def seek_virtual(self, voff: int) -> None:
        self._r.seek_virtual(voff)

    def close(self) -> None:
        self._r.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_bam(path: str) -> Tuple[SAMHeader, List[SAMRecord]]:
    with BAMReader(path) as r:
        return r.header, list(r)


def write_bam(path: str, header: SAMHeader, records: List[SAMRecord]) -> None:
    with BAMWriter(path, header) as w:
        w.write_batch(records)
