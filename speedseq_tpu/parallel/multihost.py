"""Multi-host (multi-process) alignment scaffolding.

The reference is single-node by design (SURVEY §5: its "communication
backend" is POSIX pipes + files + text sort).  The TPU-native multi-host
story (SURVEY §2.3, BASELINE ≥80% 2-host scaling):

- **per-process input sharding**: FASTQ batches are assigned round-robin
  by batch index (process p takes global batches p, p+P, …), so the
  concatenation of all processes' streams in (wave, process) order equals
  the single-process stream order exactly.
- **device work**: each process runs the production fused align step on
  its local chips (`jax.distributed.initialize` via :func:`init_distributed`
  on a real pod; independent backends in the CPU test harness).
- **global duplicate marking**: samblaster's first-seen semantics must
  hold across hosts.  Each wave, processes allgather their batch's dup
  signatures and every process applies all P batches to an identical
  replicated signature table in (wave, process) order —
  :class:`WaveSyncDupMarker`.  The exchange transport is
  :class:`CollectiveExchange` (jax.distributed process_allgather — Gloo
  on CPU pods, ICI/DCN collectives on TPU pods) when jax.distributed is
  initialized, else the file-based :class:`FileExchange` (the analog of
  the reference's files-as-transport for shared-filesystem setups);
  payloads are packed int64 signature matrices, O(new signatures per
  batch).
- **deterministic global merge**: each process writes sorted per-process
  BAM triples; process 0 k-way merges them on the samtools coordinate
  key with process-order tie-breaking (bam_sort.c:109-119 heap semantics)
  and builds the BAI.

Record equality with the single-process run is asserted by
tests/test_multihost.py (2 subprocesses, CPU backends).
"""

from __future__ import annotations

import os
import pickle
import struct
import time
from typing import List, Optional

import numpy as np

from ..align.markdup import StreamDupMarker


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed bring-up for a real multi-host pod.  No-op when a
    single process / no coordinator is configured (the CPU test harness
    runs independent per-process backends instead)."""
    import jax

    if coordinator is None:
        coordinator = os.environ.get("SSQ_COORDINATOR")
    if coordinator is None or (num_processes or 1) <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


class FileExchange:
    """Filesystem allgather: write-one, read-all, per wave.

    Writes are atomic (tmp + rename); readers spin-wait with a timeout.
    This is deliberately the same transport class the reference uses for
    its global exchanges (files + sort, bin/speedseq:800-806) — on a TPU
    pod the shared FS or a DCN object store plays this role; the payload
    is tiny (new dup signatures per batch)."""

    def __init__(self, root: str, num_processes: int, process_id: int,
                 timeout: float = 300.0, run_id: Optional[str] = None):
        if run_id is None:
            # workers of one run share the launcher process, so a
            # ppid-derived default is identical across them but differs
            # between sequential runs — a CONSTANT default would let a
            # reused exchange_dir satisfy allgather with the previous
            # run's wave files (pass an explicit run_id in production)
            run_id = f"run{os.getppid()}"
        self.root = root
        self.P = num_processes
        self.pid = process_id
        self.timeout = timeout
        # run_id scopes every filename: reusing an exchange_dir across
        # runs can otherwise satisfy the allgather with stale payloads
        # from the previous run (silently corrupting global dup marking).
        # All processes of one run must pass the same run_id; a mismatch
        # fails loudly with TimeoutError instead of reading stale data.
        self.run_id = run_id
        os.makedirs(root, exist_ok=True)
        # hygiene: drop this process's leftovers from PRIOR runs only —
        # an age guard keeps a concurrent run sharing this exchange_dir
        # from having its live wave files deleted (ADVICE r4: two
        # concurrent runs deleted each other's files and stalled)
        prefix = f"{run_id}."
        now = time.time()
        for name in os.listdir(root):
            if not name.startswith(prefix) and name.endswith(f".p{process_id}"):
                try:
                    path = os.path.join(root, name)
                    if now - os.path.getmtime(path) > 600:
                        os.unlink(path)
                except OSError:
                    pass

    def _path(self, wave: int, pid: int) -> str:
        return os.path.join(self.root, f"{self.run_id}.w{wave:06d}.p{pid}")

    def allgather(self, wave: int, payload: bytes) -> List[bytes]:
        mine = self._path(wave, self.pid)
        self._write_atomic(mine, payload)
        return [self._read_wait(self._path(wave, p), wave, p)
                for p in range(self.P)]

    def alltoall(self, wave: int, payloads: List[bytes]) -> List[bytes]:
        """Send payloads[d] to process d; receive one payload from every
        process.  File layout: one file per (wave, src, dst) — the
        filesystem analog of a device all-to-all (SURVEY §2.3
        coordinate re-sharding row)."""
        assert len(payloads) == self.P
        for d, pl in enumerate(payloads):
            self._write_atomic(self._a2a_path(wave, self.pid, d), pl)
        return [self._read_wait(self._a2a_path(wave, p, self.pid), wave, p)
                for p in range(self.P)]

    def _a2a_path(self, wave: int, src: int, dst: int) -> str:
        return os.path.join(
            self.root, f"{self.run_id}.w{wave:06d}.s{src}.p{dst}")

    def _write_atomic(self, path: str, payload: bytes) -> None:
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(struct.pack("<q", len(payload)))
            fh.write(payload)
        os.replace(tmp, path)

    def _read_wait(self, path: str, wave: int, p: int) -> bytes:
        deadline = time.time() + self.timeout
        while True:
            try:
                with open(path, "rb") as fh:
                    (ln,) = struct.unpack("<q", fh.read(8))
                    data = fh.read(ln)
                if len(data) == ln:
                    return data
            except (FileNotFoundError, struct.error):
                pass
            if time.time() > deadline:
                raise TimeoutError(
                    f"exchange wave {wave}: process {p} missing")
            time.sleep(0.005)


_EMPTY = np.zeros(0, np.int64)


class CollectiveExchange:
    """jax.distributed allgather transport: the same wave interface as
    FileExchange, but payloads ride the interconnect collectives
    (Gloo on CPU pods, ICI/DCN on TPU pods) instead of a shared
    filesystem — the TPU-native communication backend SURVEY §2.3 maps
    the reference's files-as-transport onto.  Requires
    jax.distributed.initialize (init_distributed) to have run."""

    def __init__(self):
        import jax
        from jax.experimental import multihost_utils

        self._mh = multihost_utils
        self.P = jax.process_count()
        self.pid = jax.process_index()

    def allgather(self, wave: int, payload: bytes) -> List[bytes]:
        ln = np.asarray([len(payload)], np.int64)
        lens = np.asarray(self._mh.process_allgather(ln)).reshape(-1)
        m = max(int(lens.max()), 1) if len(lens) else 1
        buf = np.zeros(m, np.uint8)
        if payload:
            buf[: len(payload)] = np.frombuffer(payload, np.uint8)
        g = np.asarray(self._mh.process_allgather(buf)).reshape(self.P, m)
        return [g[p, : lens[p]].tobytes() for p in range(self.P)]

    def alltoall(self, wave: int, payloads: List[bytes]) -> List[bytes]:
        """All-to-all over the collective transport.  Implemented as an
        allgather of the concatenated per-destination payloads + local
        slicing — functionally exact on any backend; on a real TPU pod
        the device `jax.lax.all_to_all` path (parallel.mesh.
        coordinate_reshard) carries the bulk arrays over ICI instead."""
        assert len(payloads) == self.P
        cat = b"".join(payloads)
        lens = np.asarray([len(p) for p in payloads], np.int64)
        all_lens = np.asarray(self._mh.process_allgather(lens)
                              ).reshape(self.P, self.P)
        m = max(int(all_lens.sum(axis=1).max()), 1)
        buf = np.zeros(m, np.uint8)
        if cat:
            buf[: len(cat)] = np.frombuffer(cat, np.uint8)
        g = np.asarray(self._mh.process_allgather(buf)).reshape(self.P, m)
        out = []
        for src in range(self.P):
            off = int(all_lens[src, : self.pid].sum())
            out.append(g[src, off: off + int(all_lens[src, self.pid])]
                       .tobytes())
        return out


def make_exchange(exchange_dir: str, num_processes: int, process_id: int,
                  run_id: Optional[str] = None):
    """Collective transport when jax.distributed is up (real pods / the
    distributed CPU harness); filesystem transport otherwise."""
    import jax

    try:
        if jax.process_count() == num_processes and num_processes > 1:
            return CollectiveExchange()
    except Exception:
        pass
    return FileExchange(exchange_dir, num_processes, process_id,
                        run_id=run_id)


class WaveSyncDupMarker(StreamDupMarker):
    """Replicated-table duplicate marker: every process applies every
    process's batch signatures in (wave, process) order, so all tables
    stay identical and first-seen resolution equals the single-process
    stream order.

    Payloads are a packed (n, k) int64 signature matrix (no pickle):
    device-collective friendly and smaller than the pickled arrays."""

    def __init__(self, exchange):
        super().__init__()
        self.ex = exchange
        self.wave = 0

    def mark_batch(self, tid1, p5_1, st1, ok1, tid2, p5_2, st2, ok2,
                   lib=None):
        args = [np.asarray(a, np.int64) for a in
                (tid1, p5_1, st1, ok1, tid2, p5_2, st2, ok2)]
        if lib is not None:
            args.append(np.asarray(lib, np.int64))
        k = len(args)
        mat = (np.stack(args, axis=1) if args[0].size
               else np.zeros((0, k), np.int64))
        payload = bytes([k]) + mat.tobytes()
        peers = self.ex.allgather(self.wave, payload)
        self.wave += 1
        mine = None
        for p, pl in enumerate(peers):
            kp = pl[0]
            m = np.frombuffer(pl[1:], np.int64).reshape(-1, kp)
            cols = [m[:, i] for i in range(kp)]
            lib_p = cols[8] if kp > 8 else None
            d = super().mark_batch(*cols[:8], lib=lib_p)
            if p == self.ex.pid:
                mine = d
        return mine

    def finish(self, total_waves: int) -> None:
        """Participate in waves past this process's last batch (other
        processes may still be streaming)."""
        while self.wave < total_waves:
            self.mark_batch(_EMPTY, _EMPTY, _EMPTY, _EMPTY,
                            _EMPTY, _EMPTY, _EMPTY, _EMPTY)


def _shard_batches(batch_iter, num_processes: int, process_id: int):
    for bi, item in enumerate(batch_iter):
        if bi % num_processes == process_id:
            yield item


# ---------------------------------------------------------------------------
# coordinate re-sharding (SURVEY §2.3: "per-shard alignment results →
# all-to-all for coordinate re-sharding")
# ---------------------------------------------------------------------------

def coordinate_boundaries(refs, num_processes: int) -> np.ndarray:
    """(P-1,) packed-sort-key upper bounds splitting the genome into P
    contiguous, ~equal-bp ranges.  Keys are the samtools coordinate sort
    key ``tid<<33|(pos+1)<<1|rev`` (bam_sort.c:1612 semantics,
    formats/extsort.packed_keys); unmapped records (tid sentinel, max
    key) fall into the last range."""
    lens = np.asarray([ln for _, ln in refs], np.int64)
    cum = np.concatenate([[0], np.cumsum(lens)])
    total = int(cum[-1])
    bounds = []
    for k in range(1, num_processes):
        target = total * k // num_processes
        tid = int(np.searchsorted(cum, target, side="right") - 1)
        tid = min(tid, len(lens) - 1)
        pos = int(target - cum[tid])
        bounds.append((np.int64(tid) << 33) | (np.int64(pos + 1) << 1))
    return np.asarray(bounds, np.int64)


class ReshardingSorter:
    """Per-stream coordinate re-shard: every batch's record columns are
    routed to their genome-range owner over ``exchange.alltoall`` and
    each process sorts+compresses ONLY its own range into a headerless
    BGZF part.  The final BAM is assembled by concatenating the parts'
    BGZF members — sorting AND compression (the expensive host work)
    distribute across processes instead of funneling through process 0's
    k-way merge (SURVEY §2.3 communication row; the reference's analog
    is files + text sort, bin/speedseq:800-806,2007-2010).

    Wave protocol: every process calls ``add`` once per wave per stream
    (empty batches included — ``finish`` pads to ``total_waves``), so
    the per-(wave, stream) all-to-alls pair up across processes; within
    a wave the receive order is process rank, which equals single-stream
    batch order under round-robin input sharding — record order (and
    every tie) is identical to the single-process run."""

    skip_bai = True           # parts are headerless; BAI built post-assembly

    def __init__(self, part_path: str, header, exchange,
                 boundaries: np.ndarray, stream_idx: int,
                 total_waves: int, max_records: int = 200_000):
        from ..formats.extsort import ExternalBAMSorter

        self.ex = exchange
        self.bounds = boundaries
        self.stream = stream_idx
        self.total_waves = total_waves
        self.wave = 0
        self.part_path = part_path
        self.inner = ExternalBAMSorter(
            part_path, header, headerless=True, max_records=max_records)
        self.n_records = 0

    def add_columns(self, cols) -> None:
        if cols.n == 0:
            self._route(np.zeros(0, np.int64), np.zeros(0, np.int64),
                        np.zeros(0, np.uint8))
            return
        self._route(cols.sort_keys(),
                    cols.record_sizes().astype(np.int64),
                    np.frombuffer(cols.encode(), np.uint8))

    def _route(self, keys, sizes, blob) -> None:
        from ..formats.extsort import _gather_blob

        P = self.ex.P
        starts = np.zeros(len(sizes), np.int64)
        if len(sizes):
            np.cumsum(sizes[:-1], out=starts[1:])
        tgt = np.searchsorted(self.bounds, keys, side="right")
        payloads = []
        for d in range(P):
            sel = np.nonzero(tgt == d)[0]          # intake order preserved
            pb = _gather_blob(blob, starts, sizes, sel)
            payloads.append(
                struct.pack("<q", len(sel)) + keys[sel].tobytes()
                + sizes[sel].tobytes() + pb.tobytes())
        got = self.ex.alltoall(self.wave * 8 + self.stream, payloads)
        self.wave += 1
        for pl in got:                             # rank order = batch order
            (n,) = struct.unpack_from("<q", pl, 0)
            if not n:
                continue
            k = np.frombuffer(pl, np.int64, n, 8)
            sz = np.frombuffer(pl, np.int64, n, 8 + 8 * n)
            bl = np.frombuffer(pl, np.uint8, offset=8 + 16 * n)
            self.inner.add_keyed_blob(k.copy(), sz.copy(), bl.copy())
            self.n_records += n

    def finish(self) -> None:
        while self.wave < self.total_waves:
            self._route(np.zeros(0, np.int64), np.zeros(0, np.int64),
                        np.zeros(0, np.uint8))

    def close(self) -> None:
        self.finish()
        self.inner.close()


def _assemble_resharded(parts: List[str], header, out_path: str) -> None:
    """Concatenate headerless per-range BGZF parts (in range order) into
    one BAM: header member + each part minus its EOF marker + one EOF.
    BGZF members concatenate into a valid BGZF stream, so assembly is
    pure byte IO — no recompression on process 0."""
    from ..formats.bam import BAMWriter
    from ..formats.bgzf import BGZF_EOF

    hdr_tmp = out_path + ".hdr.tmp"
    BAMWriter(hdr_tmp, header).close()
    with open(out_path, "wb") as out:
        with open(hdr_tmp, "rb") as fh:
            data = fh.read()
        out.write(data[:-len(BGZF_EOF)]
                  if data.endswith(BGZF_EOF) else data)
        for p in parts:
            with open(p, "rb") as fh:
                data = fh.read()
            out.write(data[:-len(BGZF_EOF)]
                      if data.endswith(BGZF_EOF) else data)
        out.write(BGZF_EOF)
    os.unlink(hdr_tmp)


def align_fastq_multihost(
    reference: str,
    fq1: str,
    fq2: Optional[str],
    out_prefix: str,
    config,
    num_processes: int,
    process_id: int,
    exchange_dir: str,
    run_id: Optional[str] = None,
    reshard: bool = False,
) -> Optional[dict]:
    """One process's share of a multi-host align run.

    Every process calls this with its process_id; process 0 returns the
    final merged output paths, others return None.  ``run_id`` must be
    identical across processes of one run and fresh per run (it scopes
    the exchange files; see FileExchange).

    ``reshard=True`` switches the global exchange from "per-process
    sorted parts + process-0 k-way merge" to the coordinate re-shard
    (ReshardingSorter): every wave's records travel to their genome-
    range owner over the all-to-all, each process sorts+compresses only
    its range, and process 0 assembles the final BAMs by BGZF-member
    concatenation — the sort/compression funnel through process 0
    disappears (SURVEY §2.3 coordinate re-sharding row)."""
    from ..align.pipeline import align_stream
    from ..formats import fastq

    ex = make_exchange(exchange_dir, num_processes, process_id,
                       run_id=run_id)
    marker = WaveSyncDupMarker(ex)
    batches = list(fastq.iter_batches(
        fq1, batch_size=config.batch_size, max_len=config.max_read_len,
        paired_with=fq2, interleaved=False,
    ))
    total_waves = (len(batches) + num_processes - 1) // num_processes
    mine = [b for i, b in enumerate(batches) if i % num_processes == process_id]
    part_prefix = f"{out_prefix}.part{process_id}"
    factory = None
    hdr_box = {}
    if reshard:
        _STREAM_IDX = {"bam": 0, "splitters": 1, "discordants": 2}

        def factory(key, path, header):
            hdr_box["header"] = header
            return ReshardingSorter(
                f"{path}.rpart{process_id}", header, ex,
                coordinate_boundaries(header.refs, num_processes),
                _STREAM_IDX[key], total_waves,
                max_records=config.sort_max_records)

    align_stream(
        reference, iter(mine), part_prefix, config,
        paired=fq2 is not None, marker=marker, sorter_factory=factory,
        pre_close=lambda: marker.finish(total_waves),
    )
    # barrier: announce completion, wait for all parts
    ex.allgather(10**6, b"done")
    if process_id != 0:
        return None
    from ..formats.extsort import merge_sorted_bams
    from ..formats import bai

    outputs = {}
    for suffix, key in ((".bam", "bam"), (".splitters.bam", "splitters.bam"),
                        (".discordants.bam", "discordants.bam")):
        out = out_prefix + suffix
        if reshard:
            parts = [f"{out_prefix}.part{p}{suffix}.rpart{p}"
                     for p in range(num_processes)]
            _assemble_resharded(parts, hdr_box["header"], out)
        else:
            parts = [f"{out_prefix}.part{p}{suffix}"
                     for p in range(num_processes)]
            merge_sorted_bams(parts, out)
        bai.build_bai(out)
        outputs[key] = out
        for p in parts:
            for e in ("", ".bai"):
                try:
                    os.unlink(p + e)
                except OSError:
                    pass
    return outputs


def var_multihost(
    reference: str,
    bam_paths: List[str],
    output: str,
    num_processes: int,
    process_id: int,
    exchange_dir: str,
    run_id: Optional[str] = None,
    windows_bed: Optional[str] = None,
    config=None,
    somatic: bool = False,
) -> Optional[str]:
    """One process's share of a multi-host var (or somatic) run.

    Windows are assigned round-robin over the deterministic
    longest-first order (the reference fans freebayes windows over all
    cores the same way it fans align pipelines,
    /root/reference/bin/speedseq:719 vs :449); each process writes a
    sorted part, the exchange barrier synchronizes, and process 0
    performs the deterministic k-way merge into the final vcf.gz + tbi
    (record-for-record equal to a single-process run —
    tests/test_multihost.py).  ``somatic=True`` runs the
    pooled-discrete [normal, tumor] engine + SSC filter over the same
    window fan-out (the reference's somatic IS freebayes with its awk
    filter, bin/speedseq:1059-1077); bam_paths must then be
    [normal, tumor].  Prints per-process wall-clock and exchange/merge
    overhead: the scaling evidence a single-node environment can
    produce."""
    import time as _time

    from ..var.engine import VarConfig, run_var, build_var_header

    record_filter = None
    if somatic:
        from ..var.somatic import SomaticConfig, somatic_filter

        scfg = SomaticConfig()
        cfg = config or VarConfig(
            min_qual=0.0, caller=scfg.caller, apply_balance_filter=False)
        record_filter = somatic_filter(scfg)
    else:
        cfg = config or VarConfig()
    ex = make_exchange(exchange_dir, num_processes, process_id,
                       run_id=run_id)
    part = f"{output}.part{process_id}.vcfraw"
    t0 = _time.time()
    run_var(reference, bam_paths, output, windows_bed=windows_bed,
            config=cfg, record_filter=record_filter,
            _shard=(num_processes, process_id),
            _part_out=part)
    t_windows = _time.time() - t0
    t0 = _time.time()
    ex.allgather(0, b"done")             # barrier: all parts on disk
    if process_id != 0:
        t_ex = _time.time() - t0
        print(f"[var-mh] p{process_id}: windows {t_windows:.2f}s "
              f"exchange {t_ex:.2f}s", flush=True)
        return None
    import heapq

    from ..formats import tabix as tabix_mod
    from ..formats.bam import BAMReader
    from ..formats.vcf import VCFWriter

    def _iter_part(path: str):
        """Stream (key, raw line bytes) entries of one sorted part."""
        with open(path, "rb") as fh:
            while True:
                hdr = fh.read(28)
                if len(hdr) < 28:
                    return
                o, p_, w_, ln = struct.unpack("<qqqI", hdr)
                yield (o, p_, w_), fh.read(ln)

    with BAMReader(bam_paths[0]) as rd0:
        refs = rd0.header.refs
    # rebuild the header exactly as run_var does (same BAMs → same map)
    from ..var.engine import _sample_map

    readers = [BAMReader(p) for p in bam_paths]
    samples, _, _ = _sample_map(readers, bam_paths)
    for rd in readers:
        rd.close()
    header = build_var_header(refs, samples, somatic=somatic)
    if somatic and len(samples) == 2:
        from ..var.somatic import write_ped

        ped = (output[: -len(".vcf.gz")] + ".ped"
               if output.endswith(".vcf.gz") else output + ".ped")
        write_ped(ped, samples[1], samples[0])
    # streaming k-way heap merge of the sorted raw-byte parts: O(P·line)
    # memory instead of unpickling every process's record list into p0
    # RAM (the reference merges window files + text sort the same way,
    # bin/speedseq:800-806).  Equal keys cannot span parts (a window
    # lives on exactly one process), so stream order is deterministic.
    streams = [_iter_part(f"{output}.part{p}.vcfraw")
               for p in range(num_processes)]
    with VCFWriter(output, header) as w:
        for _, line in heapq.merge(*streams, key=lambda t: t[0]):
            w.write_line(line.decode())
    if output.endswith(".gz"):
        tabix_mod.build_tbi(output)
    for p in range(num_processes):
        try:
            os.unlink(f"{output}.part{p}.vcfraw")
        except OSError:
            pass
    t_merge = _time.time() - t0
    print(f"[var-mh] p0: windows {t_windows:.2f}s exchange+merge "
          f"{t_merge:.2f}s", flush=True)
    return output


def sv_multihost(
    samples,
    output: str,
    num_processes: int,
    process_id: int,
    exchange_dir: str,
    run_id: Optional[str] = None,
    config=None,
) -> Optional[str]:
    """One process's share of a multi-host sv run.

    Samples are assigned round-robin (``si % P == pid``) — the
    multi-process counterpart of the reference's per-sample svtyper /
    cnvnator loops (/root/reference/bin/speedseq:1490-1531).  Evidence
    collection and clustering are deterministic and replicated (they
    consume every sample's discordants/splitters); the per-sample
    SVTyper genotyping + CNV depth work — the dominant cost — shards.
    Results are exchanged as fixed-width f64 matrices over the same
    transport as the align/var exchanges; process 0 writes the final
    vcf.gz + tbi (record-identical to a single-process run,
    tests/test_multihost.py)."""
    from ..sv.engine import SVConfig, run_sv

    cfg = config or SVConfig()
    ex = make_exchange(exchange_dir, num_processes, process_id,
                       run_id=run_id)
    return run_sv(samples, output, cfg,
                  _shard=(num_processes, process_id), _exchange=ex)


def _sv_worker_main(argv: List[str]) -> int:
    """Subprocess entry for one process of a multi-process sv run.

    argv: output num_p pid exdir run_id sample_spec...
    where sample_spec = name:full:splitters:discordants"""
    if os.environ.get("SSQ_FORCE_CPU"):
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    output, num_p, pid, exdir, run_id = argv[:5]
    from ..sv.engine import SVConfig, SVSample

    cfg = SVConfig()
    samples = []
    for spec in argv[5:]:
        if spec.startswith("--depth="):
            # enable the CNV read-depth pass (-d) with this reference
            cfg = SVConfig(annotate_depth=True, reference=spec[8:])
            continue
        name, full, spl, disc = spec.split(":")
        samples.append(SVSample(name, full, spl, disc))
    init_distributed(num_processes=int(num_p), process_id=int(pid))
    out = sv_multihost(samples, output, int(num_p), int(pid), exdir,
                       run_id=run_id, config=cfg)
    if out is not None:
        print(out)
    return 0


def _var_worker_main(argv: List[str]) -> int:
    """Subprocess entry for one process of a multi-process var run."""
    if os.environ.get("SSQ_FORCE_CPU"):
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    (reference, bams, output, num_p, pid, exdir, run_id), rest = (
        argv[:7], argv[7:])
    init_distributed(num_processes=int(num_p), process_id=int(pid))
    from ..var.engine import VarConfig

    somatic = "somatic" in rest
    rest = [r for r in rest if r != "somatic"]
    cfg = None
    if rest:                       # optional window size override
        if somatic:
            from ..var.somatic import SomaticConfig

            cfg = VarConfig(
                min_qual=0.0, caller=SomaticConfig().caller,
                apply_balance_filter=False,
                window_size=int(rest[0]))
        else:
            cfg = VarConfig(window_size=int(rest[0]))
    out = var_multihost(
        reference, bams.split(","), output, int(num_p), int(pid), exdir,
        run_id=run_id, config=cfg, somatic=somatic,
    )
    if out is not None:
        print(out)
    return 0


def _worker_main(argv: List[str]) -> int:
    """Subprocess entry for one process of a multi-process run (the
    2-process CPU-mesh test harness spawns this; a real pod would launch
    one such process per host)."""
    import json

    if os.environ.get("SSQ_FORCE_CPU"):
        # the environment's sitecustomize pins JAX_PLATFORMS=axon; force
        # the CPU backend through BOTH the env var and jax.config before
        # any device query (see tests/conftest.py)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    (reference, fq1, fq2, out_prefix, num_p, pid, exdir, batch_size,
     insert), run_id = argv[:9], (argv[9] if len(argv) > 9 else None)
    reshard = len(argv) > 10 and argv[10] == "reshard"
    from ..align.pipeline import AlignConfig

    m, s, mx, mn = (float(x) for x in insert.split(","))
    cfg = AlignConfig(
        batch_size=int(batch_size),
        insert_override=(m, s, int(mx), int(mn)),
    )
    init_distributed(num_processes=int(num_p), process_id=int(pid))
    outs = align_fastq_multihost(
        reference, fq1, fq2 or None, out_prefix, cfg,
        int(num_p), int(pid), exdir, run_id=run_id, reshard=reshard,
    )
    if outs is not None:
        print(json.dumps(outs))
    return 0


if __name__ == "__main__":
    import sys

    if sys.argv[1:2] == ["var"]:
        raise SystemExit(_var_worker_main(sys.argv[2:]))
    if sys.argv[1:2] == ["sv"]:
        raise SystemExit(_sv_worker_main(sys.argv[2:]))
    if sys.argv[1:2] == ["align"]:
        raise SystemExit(_worker_main(sys.argv[2:]))
    raise SystemExit(_worker_main(sys.argv[1:]))
