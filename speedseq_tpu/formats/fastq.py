"""FASTQ(.gz) streaming reader producing padded device-ready batches.

The reference feeds BWA interleaved (``-p``) or paired FASTQ files
(bin/speedseq:438,468); realign keeps FASTQ comments for read-group
round-tripping (``bwa mem -C``, bin/speedseq:1961).  We reproduce both
entry points but emit fixed-shape numpy batches (the TPU pipeline's unit
of work) instead of a byte stream.
"""

from __future__ import annotations

import gzip
import io
from dataclasses import dataclass, field
from typing import Iterator, List, Optional, Tuple

import numpy as np

from .fasta import encode_bases


@dataclass
class ReadBatch:
    """A padded batch of reads: the device-facing unit of work.

    seq:    (n, max_len) uint8, A=0 C=1 G=2 T=3 N=4; padded with 4
    qual:   (n, max_len) uint8 phred scores, padded with 0
    length: (n,) int32
    names:  list of read names (host-side metadata)
    comments: optional FASTQ comments (for `-C` read-group retention)
    """

    seq: np.ndarray
    qual: np.ndarray
    length: np.ndarray
    names: List[str]
    comments: List[str] = field(default_factory=list)

    @property
    def n(self) -> int:
        return len(self.names)


def _open(path: str):
    fh = open(path, "rb")
    magic = fh.read(2)
    fh.seek(0)
    if magic == b"\x1f\x8b":
        return io.BufferedReader(gzip.GzipFile(fileobj=fh))  # type: ignore
    return fh


def _iter_line_blocks(path: str, n_lines: int) -> Iterator[List[bytes]]:
    """Yield lists of whole-record lines (len multiple of 4, ≤ n_lines).

    The stream is read in 4 MiB chunks and split into lines in one C
    pass; records are never materialized as per-record tuples (the
    per-record generator layers were ~1 s per 80k pairs of the e2e
    align pipeline)."""
    with _open(path) as fh:
        tail = b""
        buf: List[bytes] = []
        while True:
            chunk = fh.read(1 << 22)
            if not chunk:
                if tail.strip():
                    buf.append(tail)
                if len(buf) % 4:
                    raise ValueError("truncated FASTQ record")
                if buf:
                    yield buf
                return
            lines = (tail + chunk).split(b"\n")
            tail = lines.pop()
            buf.extend(l for l in lines if l)
            while len(buf) >= n_lines:
                yield buf[:n_lines]
                buf = buf[n_lines:]


def _parse_block(lines: List[bytes]):
    """4k-line block → (names, comments, seqs, quals) column lists."""
    hdrs = lines[0::4]
    seqs = lines[1::4]
    plus = lines[2::4]
    quals = lines[3::4]
    # CRLF normalization decided once per block (uniform line endings)
    if hdrs and (hdrs[0].endswith(b"\r") or quals[0].endswith(b"\r")):
        hdrs = [h.rstrip(b"\r") for h in hdrs]
        seqs = [s.rstrip(b"\r") for s in seqs]
        quals = [q.rstrip(b"\r") for q in quals]
    if any(not h.startswith(b"@") for h in hdrs):
        bad = next(h for h in hdrs if not h.startswith(b"@"))
        raise ValueError(f"bad FASTQ header: {bad[:50]!r}")
    m = len(seqs)
    lens = np.fromiter(map(len, seqs), np.int64, m)
    lens_q = np.fromiter(map(len, quals), np.int64, m)
    if any(not p.startswith(b"+") for p in plus) or not np.array_equal(
            lens, lens_q):
        raise ValueError("malformed FASTQ record")
    names: List[str] = []
    comments: List[str] = []
    for h in hdrs:
        body = h[1:]
        parts = body.split(None, 1)
        name = parts[0].decode()
        # bwa strips trailing /1 /2 mate markers from read names
        if len(name) > 2 and name[-2] == "/" and name[-1] in "12":
            name = name[:-2]
        names.append(name)
        comments.append(parts[1].decode() if len(parts) > 1 else "")
    return names, comments, seqs, quals, lens


def iter_records(path: str) -> Iterator[Tuple[str, str, bytes, bytes]]:
    """Yield (name, comment, seq_bytes, qual_bytes) per record (thin
    per-record view over the block reader)."""
    for block in _iter_line_blocks(path, 4096 * 4):
        yield from zip(*_parse_block(block)[:4])


def _batch(cols, max_len: int) -> ReadBatch:
    names, comments, seqs, quals, full_lens = cols
    n = len(names)
    full_lens = np.ascontiguousarray(full_lens, np.int64)
    # size the batch to the data: width = actual max read length rounded
    # up to 16 (bounds the number of distinct compiled shapes while not
    # paying kernel width for a 151 bp cap on 100 bp data)
    width = int(full_lens.max()) if n else 1
    width = min(max_len, ((max(width, 1) + 15) // 16) * 16)
    length = np.minimum(full_lens, width).astype(np.int32)
    cat_s = np.frombuffer(b"".join(seqs), np.uint8)
    cat_q = np.frombuffer(b"".join(quals), np.uint8)
    offs = np.zeros(n, np.int64)
    np.cumsum(full_lens[:-1], out=offs[1:])
    idx = offs[:, None] + np.arange(width)[None, :]
    valid = np.arange(width)[None, :] < length[:, None]
    idx = np.where(valid, idx, 0)
    seq = np.where(valid, encode_bases(cat_s)[idx] if len(cat_s)
                   else np.uint8(4), np.uint8(4))
    qual = np.where(valid, (cat_q[idx] - 33) if len(cat_q)
                    else np.uint8(0), np.uint8(0)).astype(np.uint8)
    return ReadBatch(seq.astype(np.uint8), qual, length, list(names),
                     list(comments))


def iter_batches(
    path: str,
    batch_size: int = 4096,
    max_len: int = 152,
    paired_with: Optional[str] = None,
    interleaved: bool = False,
) -> Iterator[Tuple[ReadBatch, Optional[ReadBatch]]]:
    """Yield (read1_batch, read2_batch|None).

    - two files (`paired_with`): batches are position-matched R1/R2
      (bin/speedseq:468 two-file mode)
    - `interleaved`: consecutive records pair up (bwa mem -p,
      bin/speedseq:438)
    - else: single-end, second element is None
    """
    if paired_with is not None:
        it1 = _iter_line_blocks(path, 4 * batch_size)
        it2 = _iter_line_blocks(paired_with, 4 * batch_size)
        while True:
            b1 = next(it1, None)
            b2 = next(it2, None)
            if b1 is None and b2 is None:
                return
            if b1 is None or b2 is None or len(b1) != len(b2):
                raise ValueError("paired FASTQ files have unequal lengths")
            yield (_batch(_parse_block(b1), max_len),
                   _batch(_parse_block(b2), max_len))
    elif interleaved:
        it = _iter_line_blocks(path, 8 * batch_size)
        carry: Optional[List[bytes]] = None
        while True:
            block = next(it, None)
            if block is None:
                if carry:
                    raise ValueError("odd record count in interleaved FASTQ")
                return
            if carry:
                block = carry + block
                carry = None
            if (len(block) // 4) % 2:
                carry = block[-4:]        # odd trailing record: next block
                block = block[:-4]
                if not block:
                    continue
            cols = _parse_block(block)
            yield (_batch(tuple(c[0::2] for c in cols), max_len),
                   _batch(tuple(c[1::2] for c in cols), max_len))
    else:
        it = _iter_line_blocks(path, 4 * batch_size)
        while True:
            block = next(it, None)
            if block is None:
                return
            yield _batch(_parse_block(block), max_len), None


def write_fastq(path: str, names, seqs, quals, comments=None) -> None:
    """Plain/interleaved FASTQ writer (bamtofastq.py equivalent output)."""
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "wt") as fh:
        for i, name in enumerate(names):
            c = f" {comments[i]}" if comments and comments[i] else ""
            fh.write(f"@{name}{c}\n{seqs[i]}\n+\n{quals[i]}\n")
