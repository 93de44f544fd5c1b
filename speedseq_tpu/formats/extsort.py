"""Bounded-memory external coordinate sort for BAM emission.

Reproduces samtools' external merge sort semantics the host-runtime way
(reference: src/samtools-1.3.1/bam_sort.c:1650-1812 — chunk → sort →
temp files → k-way heap merge, heap at bam_sort.c:109-119; sort key
``tid<<32|(pos+1)<<1|is_rev`` at bam_sort.c:1612; bounded memory contract
at bin/speedseq:248,441 ``sambamba sort -m (M-2)G``).

Design differences from the reference (TPU-host idioms, not a port):
- records arrive as whole batches from the device epilogue, so chunk
  sorting is one ``np.lexsort`` over columnar key arrays + one native
  batch encode (csrc/ssq_native.cc) — no per-record comparator calls;
- temp chunks are headerless BGZF record streams (low compression level:
  they live minutes, not years);
- the k-way merge never decodes records: sort keys are parsed straight
  from the fixed bam1_t core offsets (refID @0, pos @4, flag @14;
  htslib/sam.h:148-181) of the raw record bytes.

The in-memory fast path (everything fits in one chunk) produces output
byte-identical to a single global stable sort + write.
"""

from __future__ import annotations

import heapq
import os
import struct
from typing import Iterator, List, Optional, Tuple

import numpy as np

from .bam import BAMWriter
from .bgzf import BGZFReader, BGZFWriter
from .sam import FREVERSE, SAMHeader, SAMRecord

# tid for unmapped records in the sort key: sorts after every real tid
# (samtools places unmapped reads last, bam_sort.c:1612 key with tid -1
# wrapping to UINT32_MAX in the packed uint64)
_TID_UNMAPPED = 1 << 30


def _key_arrays(records: List[SAMRecord]):
    n = len(records)
    tid = np.empty(n, np.int64)
    pos = np.empty(n, np.int64)
    rev = np.empty(n, np.int64)
    for i, r in enumerate(records):
        tid[i] = r.tid if r.tid >= 0 else _TID_UNMAPPED
        pos[i] = r.pos + 1
        rev[i] = 1 if (r.flag & FREVERSE) else 0
    return tid, pos, rev


def _sort_order(records: List[SAMRecord]) -> np.ndarray:
    tid, pos, rev = _key_arrays(records)
    # lexsort is stable: insertion order breaks ties, matching a single
    # global stable sort over the whole run
    return np.lexsort((rev, pos, tid))


class _ChunkStream:
    """Iterates (key_tuple, raw_record_bytes) from one spilled chunk."""

    def __init__(self, path: str):
        self._r = BGZFReader(path)
        self.path = path

    def __iter__(self) -> Iterator[Tuple[Tuple[int, int, int], bytes]]:
        read = self._r.read
        unpack = struct.unpack_from
        while True:
            hdr = read(4)
            if len(hdr) < 4:
                return
            (sz,) = struct.unpack("<i", hdr)
            raw = read(sz)
            tid, pos = unpack("<ii", raw, 0)
            (flag,) = unpack("<H", raw, 14)
            yield (
                (tid if tid >= 0 else _TID_UNMAPPED, pos + 1,
                 1 if flag & FREVERSE else 0),
                raw,
            )

    def close(self):
        self._r.close()


class ExternalBAMSorter:
    """Coordinate-sorting BAM writer with bounded resident memory.

    add()/add_many() buffer records; when the buffer reaches
    ``max_records`` it is key-sorted and spilled as a temp chunk.
    close() writes the final BAM: in-memory sort if nothing spilled,
    otherwise a k-way heap merge over all chunks.
    """

    def __init__(
        self,
        path: str,
        header: SAMHeader,
        max_records: int = 200_000,
        level: int = 6,
        tmpdir: Optional[str] = None,
        chunk_level: int = 1,
    ):
        self.path = path
        self.header = header
        self.max_records = max(1, int(max_records))
        self.level = level
        self.chunk_level = chunk_level
        self._tmpdir = tmpdir or (path + ".sorttmp")
        self._buf: List[SAMRecord] = []
        self._chunks: List[str] = []
        self._closed = False
        self.n_records = 0

    # ------------------------------------------------------------- intake
    def add(self, rec: SAMRecord) -> None:
        self._buf.append(rec)
        self.n_records += 1
        if len(self._buf) >= self.max_records:
            self.spill()

    def add_many(self, recs: List[SAMRecord]) -> None:
        self._buf.extend(recs)
        self.n_records += len(recs)
        if len(self._buf) >= self.max_records:
            self.spill()

    # -------------------------------------------------------------- spill
    def spill(self) -> None:
        """Sort + flush the current buffer to a temp chunk (also the
        checkpoint flush point: after spill, sorter state is just the
        chunk path list)."""
        if not self._buf:
            return
        order = _sort_order(self._buf)
        recs = [self._buf[i] for i in order]
        self._buf.clear()
        os.makedirs(self._tmpdir, exist_ok=True)
        cpath = os.path.join(self._tmpdir, f"chunk{len(self._chunks):05d}.bgz")
        w = BGZFWriter(cpath, level=self.chunk_level)
        from .bam_cols import encode_batch

        w.write(encode_batch(recs))
        w.close()
        self._chunks.append(cpath)

    # ----------------------------------------------------- checkpoint API
    def state(self) -> dict:
        """Resumable state (call spill() first so the buffer is empty)."""
        return {"chunks": list(self._chunks), "n_records": self.n_records}

    def restore(self, state: dict) -> None:
        self._chunks = [p for p in state["chunks"] if os.path.exists(p)]
        self.n_records = state["n_records"]

    # -------------------------------------------------------------- close
    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        if not self._chunks:
            # in-memory fast path
            order = _sort_order(self._buf)
            with BAMWriter(self.path, self.header, level=self.level) as w:
                w.write_batch([self._buf[i] for i in order])
            self._buf.clear()
            return
        self.spill()
        streams = [_ChunkStream(p) for p in self._chunks]
        with BAMWriter(self.path, self.header, level=self.level) as w:
            # decorate with (key, chunk_idx) so equal keys resolve in
            # chunk (= insertion) order — global stability
            iters = [
                ((key, ci, raw) for key, raw in s)
                for ci, s in enumerate(streams)
            ]
            write_raw = w.write_raw
            for _key, _ci, raw in heapq.merge(*iters):
                write_raw(raw)
        for s in streams:
            s.close()
            try:
                os.unlink(s.path)
            except OSError:
                pass
        try:
            os.rmdir(self._tmpdir)
        except OSError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
