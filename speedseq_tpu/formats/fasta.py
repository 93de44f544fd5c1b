"""FASTA reader + faidx index (htslib faidx-equivalent).

Reference contract: src/samtools-1.3.1/htslib-1.3.1/faidx.c:41-47 — each
``.fai`` record is ``{name, len, offset, line_blen, line_len}`` tab-separated
(example/data/*.fai: ``20_slice\t321635\t10\t60\t61``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

# base encoding used across the engine: A=0 C=1 G=2 T=3, ambiguous=4
_ENCODE = np.full(256, 4, dtype=np.uint8)
for i, c in enumerate("ACGT"):
    _ENCODE[ord(c)] = i
    _ENCODE[ord(c.lower())] = i
DECODE = np.frombuffer(b"ACGTN", dtype=np.uint8)


@dataclass
class FaiRecord:
    name: str
    length: int
    offset: int       # file offset of first sequence byte
    line_blen: int    # bases per line
    line_len: int     # bytes per line incl. newline


def build_fai(path: str) -> List[FaiRecord]:
    """Scan a FASTA file and build faidx records (faidx.c fai_build core)."""
    records: List[FaiRecord] = []
    name = None
    length = 0
    offset = 0
    line_blen = 0
    line_len = 0
    first_line = True
    with open(path, "rb") as fh:
        pos = 0
        for raw in fh:
            n = len(raw)
            line = raw.rstrip(b"\r\n")
            if line.startswith(b">"):
                if name is not None:
                    records.append(
                        FaiRecord(name, length, offset, line_blen, line_len)
                    )
                name = line[1:].split()[0].decode()
                length = 0
                offset = pos + n
                first_line = True
            elif line:
                if first_line:
                    line_blen = len(line)
                    line_len = n
                    first_line = False
                length += len(line)
            pos += n
        if name is not None:
            records.append(FaiRecord(name, length, offset, line_blen, line_len))
    return records


def write_fai(records: List[FaiRecord], path: str) -> None:
    with open(path, "w") as fh:
        for r in records:
            fh.write(
                f"{r.name}\t{r.length}\t{r.offset}\t{r.line_blen}\t{r.line_len}\n"
            )


def read_fai(path: str) -> List[FaiRecord]:
    records = []
    with open(path) as fh:
        for line in fh:
            f = line.rstrip("\n").split("\t")
            records.append(
                FaiRecord(f[0], int(f[1]), int(f[2]), int(f[3]), int(f[4]))
            )
    return records


class FastaFile:
    """Random-access FASTA with faidx semantics."""

    def __init__(self, path: str):
        self.path = path
        import os

        fai_path = path + ".fai"
        if os.path.exists(fai_path):
            self.records = read_fai(fai_path)
        else:
            self.records = build_fai(path)
        self._by_name: Dict[str, FaiRecord] = {r.name: r for r in self.records}
        self._fh = open(path, "rb")

    @property
    def names(self) -> List[str]:
        return [r.name for r in self.records]

    def length(self, name: str) -> int:
        return self._by_name[name].length

    def fetch_bytes(self, name: str, start: int = 0, end: int | None = None) -> bytes:
        """Fetch [start, end) 0-based; uppercased sequence bytes."""
        r = self._by_name[name]
        if end is None or end > r.length:
            end = r.length
        start = max(0, start)
        if start >= end:
            return b""
        first_line = start // r.line_blen
        foffset = r.offset + first_line * r.line_len + start % r.line_blen
        last_line = (end - 1) // r.line_blen
        span = (last_line - first_line) * r.line_len + ((end - 1) % r.line_blen) + 1 - start % r.line_blen
        self._fh.seek(foffset)
        raw = self._fh.read(span)
        return raw.replace(b"\n", b"").replace(b"\r", b"").upper()

    def fetch_encoded(self, name: str, start: int = 0, end: int | None = None) -> np.ndarray:
        """Fetch as uint8 array with A=0 C=1 G=2 T=3 N/other=4."""
        seq = np.frombuffer(self.fetch_bytes(name, start, end), dtype=np.uint8)
        return _ENCODE[seq]

    def close(self) -> None:
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def encode_bases(seq: bytes | np.ndarray) -> np.ndarray:
    if isinstance(seq, (bytes, bytearray)):
        seq = np.frombuffer(bytes(seq), dtype=np.uint8)
    return _ENCODE[seq]


def decode_bases(codes: np.ndarray) -> bytes:
    return DECODE[np.minimum(codes, 4)].tobytes()
