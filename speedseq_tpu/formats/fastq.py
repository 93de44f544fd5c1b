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


def iter_records(path: str) -> Iterator[Tuple[str, str, bytes, bytes]]:
    """Yield (name, comment, seq_bytes, qual_bytes) per record.

    Chunked: the stream is read in 4 MiB blocks and split into lines in
    one C pass (a per-record readline loop was the e2e pipeline's
    largest single host cost)."""
    with _open(path) as fh:
        tail = b""
        carry: List[bytes] = []
        while True:
            chunk = fh.read(1 << 22)
            if not chunk:
                if tail.strip() or carry:
                    lines = carry + ([tail] if tail.strip() else [])
                    if len(lines) % 4:
                        raise ValueError("truncated FASTQ record")
                    yield from _parse_lines(lines)
                return
            lines = (tail + chunk).split(b"\n")
            tail = lines.pop()
            lines = carry + [l for l in lines if l]
            nl = len(lines) - (len(lines) % 4)
            carry = lines[nl:]
            yield from _parse_lines(lines[:nl])


def _parse_lines(lines: List[bytes]):
    for i in range(0, len(lines), 4):
        hdr = lines[i].rstrip(b"\r")
        seq = lines[i + 1].rstrip(b"\r")
        plus = lines[i + 2]
        qual = lines[i + 3].rstrip(b"\r")
        if not hdr.startswith(b"@"):
            raise ValueError(f"bad FASTQ header: {hdr[:50]!r}")
        if not plus.startswith(b"+") or len(seq) != len(qual):
            raise ValueError("malformed FASTQ record")
        parts = hdr[1:].split(None, 1)
        name = parts[0].decode()
        # bwa strips trailing /1 /2 mate markers from read names
        if len(name) > 2 and name[-2] == "/" and name[-1] in "12":
            name = name[:-2]
        comment = parts[1].decode() if len(parts) > 1 else ""
        yield name, comment, seq, qual


def _batch(records, max_len: int) -> ReadBatch:
    n = len(records)
    # size the batch to the data: width = actual max read length rounded
    # up to 16 (bounds the number of distinct compiled shapes while not
    # paying kernel width for a 151 bp cap on 100 bp data)
    width = max((len(r[2]) for r in records), default=1)
    width = min(max_len, ((width + 15) // 16) * 16)
    # vectorized encode: one concatenated buffer + one table gather
    # (per-record encode_bases/frombuffer calls dominated _batch)
    full_lens = np.fromiter((len(r[2]) for r in records), np.int64, n)
    length = np.minimum(full_lens, width).astype(np.int32)
    cat_s = np.frombuffer(b"".join(r[2] for r in records), np.uint8)
    cat_q = np.frombuffer(b"".join(r[3] for r in records), np.uint8)
    offs = np.zeros(n, np.int64)
    np.cumsum(full_lens[:-1], out=offs[1:])
    idx = offs[:, None] + np.arange(width)[None, :]
    valid = np.arange(width)[None, :] < length[:, None]
    idx = np.where(valid, idx, 0)
    seq = np.where(valid, encode_bases(cat_s)[idx] if len(cat_s)
                   else np.uint8(4), np.uint8(4))
    qual = np.where(valid, (cat_q[idx] - 33) if len(cat_q)
                    else np.uint8(0), np.uint8(0)).astype(np.uint8)
    names = [r[0] for r in records]
    comments = [r[1] for r in records]
    return ReadBatch(seq.astype(np.uint8), qual, length, names, comments)


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
        it1, it2 = iter_records(path), iter_records(paired_with)
        while True:
            r1 = list(_take(it1, batch_size))
            r2 = list(_take(it2, batch_size))
            if not r1:
                return
            if len(r1) != len(r2):
                raise ValueError("paired FASTQ files have unequal lengths")
            yield _batch(r1, max_len), _batch(r2, max_len)
    elif interleaved:
        it = iter_records(path)
        while True:
            recs = list(_take(it, batch_size * 2))
            if not recs:
                return
            if len(recs) % 2:
                raise ValueError("odd record count in interleaved FASTQ")
            yield _batch(recs[0::2], max_len), _batch(recs[1::2], max_len)
    else:
        it = iter_records(path)
        while True:
            recs = list(_take(it, batch_size))
            if not recs:
                return
            yield _batch(recs, max_len), None


def _take(it, n):
    for _ in range(n):
        try:
            yield next(it)
        except StopIteration:
            return


def write_fastq(path: str, names, seqs, quals, comments=None) -> None:
    """Plain/interleaved FASTQ writer (bamtofastq.py equivalent output)."""
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "wt") as fh:
        for i, name in enumerate(names):
            c = f" {comments[i]}" if comments and comments[i] else ""
            fh.write(f"@{name}{c}\n{seqs[i]}\n+\n{quals[i]}\n")
