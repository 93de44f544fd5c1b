"""speedseq align equivalent: FASTQ → sorted BAM + splitters + discordants.

Reproduces the reference align module (bin/speedseq:189-504): the 4-process
pipe ``bwa mem | samblaster | sambamba view | sambamba sort`` plus two FIFO
side pipelines collapse into one device graph + streaming host epilogue:

  device: seeding / chaining / pair selection / SW extension
          (core.fused_align_step — one dispatch per batch)
  host:   insert-distro estimation (rolling, per-chunk like bwa),
          MAPQ, NM/MD, streaming dup marking (samblaster hash-table
          semantics), splitter/discordant extraction, bounded-memory
          external coordinate sort (formats.extsort), BAM+BAI emission

Memory is bounded: each batch's records flow straight into the external
sorter (spilled sorted chunks + k-way merge, the samtools sort semantic,
src/samtools-1.3.1/bam_sort.c:1650-1812) — nothing per-read is retained
across batches except duplicate signatures (samblaster keeps the same).

Outputs: {out}.bam, {out}.splitters.bam, {out}.discordants.bam (+ .bai),
with splitter/discordant SEQ/QUAL stripped exactly like the reference's
gawk stage (bin/speedseq:443-447).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..formats import bam, bai, fastq
from ..formats.sam import (
    FDUP, FMREVERSE, FMUNMAP, FPAIRED, FPROPER_PAIR, FREAD1, FREAD2,
    FREVERSE, FSUPPLEMENTARY, FUNMAP, SAMHeader, SAMRecord, cigar_to_str,
)
from ..formats.fasta import decode_bases
from ..index.bwt import BWAIndex, build_index, load_index
from ..index.fm import FMIndex
from .core import (
    Candidates,
    HostAlignment,
    finalize_alignments,
    fused_align_packed,
    unpack_fused,
)
from .markdup import (
    StreamDupMarker, make_sa_tag, split_qualifies, strip_seq, unclipped_5p,
)
from .pairing import InsertDistro, joint_pair_select, is_proper
from .sw import _pallas_ok


@dataclass
class AlignConfig:
    batch_size: int = 512
    max_read_len: int = 151
    n_chains: int = 4
    min_seed_len: int = 19
    rg_id: str = "1"
    sample: str = "sample"
    rg_string: Optional[str] = None   # full @RG line override (bwa -R / -R)
    include_dups_in_side: bool = False  # speedseq -i (bin/speedseq:267-269)
    max_split_count: int = 2          # samblaster -c (bin/speedseq:242)
    min_non_overlap: int = 20         # samblaster -m (bin/speedseq:243)
    insert_override: Optional[Tuple[float, float, int, int]] = None
    # bwa -I mean,std,max,min (bin/speedseq:438; README.md:203-207)
    checkpoint: bool = False   # per-batch checkpoint journal (new feature:
    resume: bool = False       # the reference has none, SURVEY.md §5)
    checkpoint_every: int = 8
    seed_mode: str = "hash"    # "hash" (TPU-first k-mer index) | "fm"
    sort_max_records: int = 200_000  # external-sort chunk size (the
    # bounded-memory analog of sambamba sort -m, bin/speedseq:248,441)
    distro_update_every: int = 32    # batches between insert-distro
    # re-estimates (bwa re-estimates per chunk; README.md:203-207)
    verbose: bool = False

    def __post_init__(self):
        if self.rg_string:
            d = dict(
                f.split(":", 1)
                for f in self.rg_string.replace("\\t", "\t").split("\t")[1:]
                if ":" in f
            )
            self.rg_id = d.get("ID", self.rg_id)
            self.sample = d.get("SM", self.sample)


def _index_cache_path(reference: str) -> str:
    import hashlib

    st = os.stat(reference)
    key = hashlib.sha1(
        f"{os.path.abspath(reference)}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:16]
    d = os.path.join(os.path.expanduser("~"), ".cache", "speedseq_tpu")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"safull-{key}.npy")


_fm_cache: Dict[Tuple[str, str], tuple] = {}


def _load_fm(reference: str, seed_mode: str = "hash"):
    # process-level cache: repeat align runs against the same reference
    # (realign per-library loops, bench warm runs) skip the ~0.6 s
    # index/occ/k-mer rebuild (the reference's analog: bwa keeps its
    # index mapped per process)
    ck = (os.path.abspath(reference), seed_mode)
    hit = _fm_cache.get(ck)
    if hit is not None and hit[0] == os.stat(reference).st_mtime_ns:
        return hit[1]
    # auto `bwa index` behavior (bin/speedseq:386-391)
    if not os.path.exists(reference + ".bwt"):
        idx = build_index(reference)
    else:
        idx = load_index(reference)
    kidx = None
    if seed_mode == "hash":
        from ..index.kmer import build_kmer_index

        kidx = build_kmer_index(idx.pac)
    # the full SA reconstruction (one O(n) host LF walk) is the slow part
    # of loading a foreign bwa index — cache it on disk keyed by the
    # reference file identity
    sa_full = None
    cache = _index_cache_path(reference)
    if os.path.exists(cache):
        try:
            sa_full = np.load(cache)
        except Exception:
            sa_full = None
    if sa_full is None:
        from ..index.fm import _reconstruct_sa

        sa_full = _reconstruct_sa(idx)
        try:
            np.save(cache, sa_full)
        except Exception:
            pass
    out = (idx, FMIndex.from_bwa(idx, sa_full=sa_full), kidx)
    _fm_cache.clear()          # hold at most one reference's index
    _fm_cache[ck] = (os.stat(reference).st_mtime_ns, out)
    return out


def _phred(q: np.ndarray, length: int) -> str:
    return "".join(chr(min(int(x), 93) + 33) for x in q[:length])


_BASE_CHARS = np.frombuffer(b"ACGTN", dtype=np.uint8)


@dataclass
class _PairRow:
    """Host record of one read end (primary + optional supplementary).

    seq_rc/qual_r are the reverse-complemented/reversed forms, computed
    vectorized per batch (per-read Python revcomp was a top-3 epilogue
    cost, docs/PERF_NOTES.md)."""

    name: str
    seq: str
    qual: str
    seq_rc: str
    qual_r: str
    aln: HostAlignment
    supp: Optional[HostAlignment]
    tid: int
    rg: str = ""


def align_fastq(
    reference: str,
    fq1: str,
    fq2: Optional[str] = None,
    interleaved: bool = False,
    out_prefix: str = "out",
    config: AlignConfig = AlignConfig(),
) -> Dict[str, str]:
    """Run the full align module on FASTQ input; returns output paths."""
    cfg = config
    batches = fastq.iter_batches(
        fq1, batch_size=cfg.batch_size, max_len=cfg.max_read_len,
        paired_with=fq2, interleaved=interleaved,
    )
    paired = fq2 is not None or interleaved
    return align_stream(reference, batches, out_prefix, cfg, paired=paired)


def align_stream(
    reference: str,
    batch_iter,
    out_prefix: str,
    config: AlignConfig = AlignConfig(),
    rg_lines: Optional[List[str]] = None,
    paired: bool = True,
    marker: Optional[StreamDupMarker] = None,
    sorter_factory=None,
    pre_close=None,
) -> Dict[str, str]:
    """Align a stream of (ReadBatch, ReadBatch|None) pairs.

    ReadBatch.comments entries of the form ``RG:<id>`` carry per-read
    read groups (the realign module's bamheadrg.py semantics,
    bin/speedseq:1962); otherwise cfg.rg_id applies.

    ``sorter_factory(key, path, header) -> sorter`` replaces the default
    ExternalBAMSorter per output stream (the multi-host coordinate
    re-shard injects ReshardingSorters here); factory-made sorters are
    closed SEQUENTIALLY in a fixed stream order so any collective
    exchange they run during close stays order-consistent across
    processes.
    """
    t0 = time.time()
    cfg = config
    # profiler hook (SURVEY §5: tracing is a required addition over the
    # reference's stdout-echo-only observability): SSQ_JAX_TRACE=<dir>
    # captures a JAX/XLA profiler trace of the whole run
    trace_dir = os.environ.get("SSQ_JAX_TRACE")
    if trace_dir:
        import jax.profiler as _prof

        _prof.start_trace(trace_dir)
    idx, fm, kidx = _load_fm(reference, cfg.seed_mode)

    distro: Optional[InsertDistro] = None
    if cfg.insert_override is not None:
        m, s, mx, mn = cfg.insert_override
        distro = InsertDistro(mean=m, std=s, low=int(mn), high=int(mx))
    n_reads = 0
    use_pallas = _pallas_ok()

    header = SAMHeader.build(
        refs=list(zip(idx.names, idx.lengths)),
        read_groups=rg_lines if rg_lines else [_rg_line(cfg)],
        sort_order="coordinate",
        programs=[f"@PG\tID:speedseq_tpu\tPN:speedseq_tpu\tVN:0.1.0"],
    )
    from ..formats.extsort import ExternalBAMSorter

    mk = sorter_factory or (lambda key, path, hdr: ExternalBAMSorter(
        path, hdr, max_records=cfg.sort_max_records))
    sorters = {
        "bam": mk("bam", out_prefix + ".bam", header),
        "splitters": mk("splitters", out_prefix + ".splitters.bam", header),
        "discordants": mk(
            "discordants", out_prefix + ".discordants.bam", header),
    }
    # an injected marker carries cross-process replicated dup state
    # (parallel.multihost.WaveSyncDupMarker); default is process-local
    if marker is None:
        marker = StreamDupMarker()
    lib_of_rg = _lib_map(rg_lines, cfg)

    # checkpoint/resume (batch-granular; a capability the reference lacks —
    # its resumability is only whole-module artifact reuse, SURVEY.md §5).
    # The checkpoint is an append-only journal of O(batch)-sized segments:
    # new dup signatures since the previous segment + sorter chunk lists.
    import pickle

    ckpt_path = out_prefix + ".align.ckpt"
    done_batches = 0
    if cfg.resume and os.path.exists(ckpt_path):
        seg = None
        all_pairs: list = []
        all_orphans: list = []
        with open(ckpt_path, "rb") as fh:
            while True:
                try:
                    s = pickle.load(fh)
                except (EOFError, pickle.UnpicklingError):
                    break  # truncated tail segment: resume from the last
                all_pairs.extend(s["new_pairs"])
                all_orphans.extend(s["new_orphans"])
                seg = s
        if seg is not None:
            done_batches = seg["batch"]
            n_reads = seg["n_reads"]
            distro = seg["distro"]
            marker.replay(all_pairs, all_orphans)
            marker.drain_new()
            for k in sorters:
                sorters[k].restore(seg["sorters"][k])
            if cfg.verbose:
                print(
                    f"[align] resumed at batch {done_batches} "
                    f"({n_reads} reads)"
                )

    def _save_ckpt(bi):
        for s in sorters.values():
            s.spill()
        new_p, new_o = marker.drain_new()
        seg = {
            "batch": bi + 1, "n_reads": n_reads, "distro": distro,
            "new_pairs": new_p, "new_orphans": new_o,
            "sorters": {k: s.state() for k, s in sorters.items()},
        }
        with open(ckpt_path, "ab") as fh:
            pickle.dump(seg, fh)

    import jax
    import jax.numpy as jnp

    from ..utils.prefetch import prefetch

    distro_arr = None
    if distro is not None:
        distro_arr = jnp.asarray(
            [distro.mean, distro.std, distro.low, distro.high], jnp.float32
        )

    from concurrent.futures import ThreadPoolExecutor

    # multi-chip: shard the fused step over the mesh data axis (the
    # single-chip relay exposes 1 device; multi-chip slices and the
    # virtual CPU mesh take this path)
    mesh = None
    if jax.local_device_count() > 1:
        from ..parallel.mesh import make_mesh

        if cfg.batch_size % jax.local_device_count() == 0:
            mesh = make_mesh()

    # a 1-thread fetch pool lets the d2h transfer of batch i overlap the
    # host epilogue of batch i-1 (the relay transfer is ~0.3-0.7 s/batch)
    fetch_pool = ThreadPoolExecutor(max_workers=1)

    def _drain(item) -> None:
        """Consume one dispatched batch: one (already in-flight) fetch,
        then the host epilogue."""
        nonlocal distro, distro_arr, n_reads
        bi = item["bi"]
        batches = item["batches"]
        seqs_p, lens_p = item["seqs_p"], item["lens_p"]
        is_paired_batch = item["is_paired"]
        est_distro = item["est_distro"]
        from ..utils.metrics import metrics

        n = batches[0].n
        with metrics.timer("align.fetch_wait"):
            fetched = item["fut"].result()
        from .core import unpack_leaves, unpack_xa

        if item["packed"]:
            # single-device 2-leaf fetch (fused_align_leaves)
            meta_h, xam_h, ovf_h, cig, xac_h = unpack_leaves(
                fetched[0], fetched[1])
            dist_idx = 2
        else:
            meta_h, cig, ovf_h, xam_h, xac_h = (
                fetched[0], fetched[1], int(fetched[2]), fetched[3],
                fetched[4])
            dist_idx = 5
        if ovf_h:
            # rare: some lane exceeded the cigar head slice — pay one
            # extra fetch for the full (E, B, S, MAX_OPS) array
            cig = jax.device_get(item["cigfull"])
        ends = unpack_fused(meta_h, cig)
        xas = unpack_xa(xam_h, xac_h)
        if est_distro:
            # the distro was estimated ON DEVICE from this batch's stats
            # (core.device_estimate_distro); the fetch carries the 4
            # floats back only for the host epilogue + logging
            f = np.asarray(fetched[dist_idx], np.float64)
            distro = InsertDistro(
                mean=float(f[0]), std=float(f[1]),
                low=int(f[2]), high=int(f[3]))
            if cfg.verbose:
                print(
                    f"[align] insert distro mean={distro.mean:.1f} "
                    f"std={distro.std:.1f} bounds=[{distro.low},{distro.high}]"
                )

        # ---- streaming columnar epilogue: the whole batch becomes
        # struct-of-arrays record columns (align.emit) and flows straight
        # into the external sorter — no per-read Python objects (the
        # reference keeps this in C inside bwa/samblaster; we keep it in
        # numpy columns + native batch calls)
        batch_distro = distro or InsertDistro(
            mean=300.0, std=100.0, low=50, high=700)
        from .emit import build_batch_records

        with metrics.timer("align.emit"):
            cols = build_batch_records(
                ends, batches, idx, batch_distro, cfg, marker, lib_of_rg,
                xas=xas,
            )
        with metrics.timer("align.sort_intake"):
            sorters["bam"].add_columns(cols["bam"])
            sorters["splitters"].add_columns(cols["splitters"])
            sorters["discordants"].add_columns(cols["discordants"])
        n_reads += n * len(batches)
        metrics.add("align.batches")
        metrics.add("align.reads", n * len(batches))
        metrics.add("align.records.bam", cols["bam"].n)
        metrics.add("align.records.splitters", cols["splitters"].n)
        metrics.add("align.records.discordants", cols["discordants"].n)
        metrics.add("align.duplicates",
                    int((np.asarray(cols["bam"].flag) & FDUP != 0).sum()))
        if cfg.checkpoint and (bi + 1) % cfg.checkpoint_every == 0:
            _save_ckpt(bi)

    # dispatch-ahead double buffering: the device computes batch i+1 while
    # the host runs batch i's epilogue (JAX async dispatch) — the TPU-native
    # replacement for the reference's co-scheduled pipelines + mbuffer
    # (bin/speedseq:449,1960)
    from collections import deque

    drain_pool = ThreadPoolExecutor(max_workers=1)
    drain_futs: "deque" = deque()
    try:
        for bi, (b1, b2) in enumerate(prefetch(batch_iter)):
            if bi < done_batches:
                continue
            n = b1.n
            batches = [b1] + ([b2] if b2 is not None else [])
            seqs_p, lens_p = [], []
            for bb in batches:
                seqs_p.append(_pad_batch(bb.seq, cfg.batch_size))
                lens_p.append(_pad_batch(bb.length[:, None], cfg.batch_size)[:, 0])
            is_paired_batch = paired and b2 is not None
            # insert distro: estimated from the first batch and re-estimated
            # every distro_update_every batches (bwa's per-chunk re-estimation
            # contract, README.md:203-207); -I pins it (insert_override)
            # deterministic schedule (batch 0 and every Nth after): the drain
            # now runs on its own worker, so gating on the host `distro`
            # object would make the schedule depend on thread timing
            est_distro = (
                is_paired_batch and cfg.insert_override is None
                and bi % cfg.distro_update_every == 0
            )
            if mesh is not None:
                # multi-chip: the same fused graph sharded over the data axis
                # (parallel.mesh); packed outputs gather into identical host
                # arrays, so the epilogue is shard-count agnostic
                from ..parallel.mesh import distributed_fused_step

                res = distributed_fused_step(
                    mesh, fm,
                    seqs_p[0], lens_p[0],
                    seqs_p[1] if is_paired_batch else None,
                    lens_p[1] if is_paired_batch else None,
                    distro=distro_arr,
                    n_chains=cfg.n_chains,
                    min_seed_len=cfg.min_seed_len,
                    use_pallas=use_pallas,
                    kidx=kidx,
                )[:7]
                meta_d, cig16_d, cigfull_d, ovf_d, stats_d, xam_d, xac_d \
                    = res
                packed = False
            else:
                from .core import fused_align_leaves

                i32_d, i16_d, cigfull_d, stats_d = fused_align_leaves(
                    fm,
                    seqs_p[0], lens_p[0],
                    seqs_p[1] if is_paired_batch else None,
                    lens_p[1] if is_paired_batch else None,
                    distro=distro_arr,
                    n_chains=cfg.n_chains,
                    min_seed_len=cfg.min_seed_len,
                    use_pallas=use_pallas,
                    paired=is_paired_batch,
                    kidx=kidx,
                )
                packed = True
            if est_distro:
                # chain the distro estimate ON DEVICE: batch bi+1's dispatch
                # consumes this (4,) array as a plain input, so the whole
                # stream stays async — no host round-trip, no first-batch
                # drain (the old serialization cost ~0.9 s per run)
                from .core import device_estimate_distro

                fb = (distro_arr if distro_arr is not None
                      else jnp.asarray([300.0, 100.0, 50.0, 700.0],
                                       jnp.float32))
                distro_arr = device_estimate_distro(
                    stats_d, fb, qlen=cfg.max_read_len)
            if packed:
                fetch_args = (i32_d, i16_d) + (
                    (distro_arr,) if est_distro else ())
            else:
                fetch_args = (meta_d, cig16_d, ovf_d, xam_d, xac_d) + (
                    (distro_arr,) if est_distro else ())
            item = {
                "bi": bi, "batches": batches, "seqs_p": seqs_p, "lens_p": lens_p,
                "is_paired": is_paired_batch, "est_distro": est_distro,
                "cigfull": cigfull_d, "packed": packed,
                "fut": fetch_pool.submit(jax.device_get, fetch_args),
            }
            # 3-stage pipeline: main thread streams dispatches, the fetch
            # pool transfers, the 1-worker drain pool runs the ordered host
            # epilogue (dup marking is first-seen — order matters).  Bounded
            # look-ahead keeps at most 2 batches of fetched arrays live.
            drain_futs.append(drain_pool.submit(_drain, item))
            while len(drain_futs) > 2:
                drain_futs.popleft().result()
        while drain_futs:
            drain_futs.popleft().result()
    finally:
        # on an interrupting exception, still wait for already-submitted
        # drains (their checkpoint segments must land deterministically —
        # tests/test_aux.py mid-run resume) and release the pools; drain
        # errors here are secondary to the propagating exception
        while drain_futs:
            f = drain_futs.popleft()
            try:
                f.result()
            except Exception:
                pass
        drain_pool.shutdown(wait=True)
        fetch_pool.shutdown(wait=False)

    if os.path.exists(ckpt_path):
        os.remove(ckpt_path)

    # finalize the 3 outputs concurrently (sorter merge + BGZF write +
    # BAI build each) — the reference co-schedules exactly this with
    # `parallel -j 3` (bin/speedseq:491-495)
    def _close_one(key_suffix):
        key, suffix = key_suffix
        sorters[key].close()
        path = out_prefix + suffix
        if not getattr(sorters[key], "skip_bai", False):
            bai.build_bai(path)
        return suffix[1:], path

    if pre_close is not None:
        # multi-host hook: pad the dup-marker's exchange waves BEFORE the
        # sorters close — a trailing process's close-time all-to-all
        # padding must not precede its marker padding, or the lead
        # process (still inside a batch's marker allgather) deadlocks
        # against it
        pre_close()
    close_items = (
        ("bam", ".bam"),
        ("splitters", ".splitters.bam"),
        ("discordants", ".discordants.bam"),
    )
    if sorter_factory is not None:
        # fixed-order sequential close: factory sorters may run
        # collective exchanges while closing (see docstring)
        outputs = dict(map(_close_one, close_items))
    else:
        with ThreadPoolExecutor(max_workers=3) as close_pool:
            outputs = dict(close_pool.map(_close_one, close_items))
    if trace_dir:
        import jax.profiler as _prof

        _prof.stop_trace()
    if cfg.verbose:
        dt = time.time() - t0
        print(f"[align] {n_reads} reads in {dt:.1f}s ({n_reads/dt:.0f} reads/s)")
        from ..utils.metrics import metrics

        print(metrics.report(prefix="[align] "))
    return outputs


def _rg_line(cfg: AlignConfig) -> str:
    if cfg.rg_string:
        return cfg.rg_string.replace("\\t", "\t")
    return f"@RG\tID:{cfg.rg_id}\tSM:{cfg.sample}"


def _pad_batch(a: np.ndarray, n: int) -> np.ndarray:
    if a.shape[0] == n:
        return a
    pad = np.zeros((n - a.shape[0],) + a.shape[1:], dtype=a.dtype)
    if a.dtype == np.uint8 and a.ndim == 2:
        pad[:] = 4
    return np.concatenate([a, pad], axis=0)


def _lib_map(rg_lines: Optional[List[str]], cfg: AlignConfig) -> Dict[str, int]:
    """RG id → library index for duplicate-signature scoping (samblaster
    runs per-library in the reference realign flow, bin/speedseq:1930-1973).
    RGs sharing an LB value share a library index."""
    libs: Dict[str, int] = {}
    out: Dict[str, int] = {"": 0, cfg.rg_id: 0}
    if not rg_lines:
        return out
    for line in rg_lines:
        d = dict(
            f.split(":", 1)
            for f in line.replace("\\t", "\t").split("\t")[1:]
            if ":" in f
        )
        rid = d.get("ID")
        if rid is None:
            continue
        lb = d.get("LB", rid)
        out[rid] = libs.setdefault(lb, len(libs))
    return out


def assemble_records(
    rows1: List[_PairRow],
    rows2: Optional[List[_PairRow]],
    idx: BWAIndex,
    distro: InsertDistro,
    cfg: AlignConfig,
    marker: Optional[StreamDupMarker] = None,
    lib_of_rg: Optional[Dict[str, int]] = None,
):
    """Build SAM records with pair flags, mate tags, dup marks, and the
    splitter/discordant side channels.

    Called once per batch on the streaming path: ``marker`` carries the
    run-wide duplicate signature tables across calls (samblaster's
    streaming hash table); a fresh marker is made when none is given
    (single-shot use).  ``lib_of_rg`` scopes dup signatures per library.
    """
    paired = rows2 is not None
    n = len(rows1)
    main: List[SAMRecord] = []
    splitters: List[SAMRecord] = []
    discordants: List[SAMRecord] = []
    if marker is None:
        marker = StreamDupMarker()

    # offsets convert genome pos → (tid, chrom pos)
    offsets = np.asarray(idx.offsets + [idx.l_pac], dtype=np.int64)

    # ---- duplicate marking over pairs ----------------------------------
    lib = np.zeros(n, dtype=np.int64)
    if lib_of_rg:
        for i, r in enumerate(rows1):
            lib[i] = lib_of_rg.get(r.rg, 0)
    if paired:
        t1 = np.array([r.tid for r in rows1])
        t2 = np.array([r.tid for r in rows2])
        ok1 = np.array([r.aln.aligned for r in rows1])
        ok2 = np.array([r.aln.aligned for r in rows2])
        p5_1 = np.array(
            [
                unclipped_5p(r.aln.pos, r.aln.end_pos, r.aln.strand, r.aln.cigar)
                if r.aln.aligned else -1
                for r in rows1
            ]
        )
        p5_2 = np.array(
            [
                unclipped_5p(r.aln.pos, r.aln.end_pos, r.aln.strand, r.aln.cigar)
                if r.aln.aligned else -1
                for r in rows2
            ]
        )
        s1 = np.array([r.aln.strand for r in rows1])
        s2 = np.array([r.aln.strand for r in rows2])
        dup = marker.mark_batch(t1, p5_1, s1, ok1, t2, p5_2, s2, ok2, lib=lib)
        dup &= ok1 | ok2
    else:
        ok1 = np.array([r.aln.aligned for r in rows1])
        p5_1 = np.array(
            [
                unclipped_5p(r.aln.pos, r.aln.end_pos, r.aln.strand, r.aln.cigar)
                if r.aln.aligned else -1
                for r in rows1
            ]
        )
        t1 = np.array([r.tid for r in rows1])
        s1 = np.array([r.aln.strand for r in rows1])
        none = np.full(n, -1)
        dup = marker.mark_batch(
            t1, p5_1, s1, ok1, none, none, none, np.zeros(n, dtype=bool),
            lib=lib,
        )
        dup &= ok1

    # samblaster --maxSplitCount caps the number of split pieces a read
    # may have to enter the splitter file (bin/speedseq:242); this aligner
    # emits at most primary+1 supplementary = 2 pieces, so the cap gates
    # splitter emission entirely when set below 2
    split_ok = cfg.max_split_count >= 2
    for i in range(n):
        r1 = rows1[i]
        r2 = rows2[i] if paired else None
        recs = _pair_records(r1, r2, idx, distro, bool(dup[i]), cfg)
        for rec, is_split, is_disc in recs:
            main.append(rec)
            dup_ok = not (rec.flag & FDUP) or cfg.include_dups_in_side
            if is_split and dup_ok and split_ok:
                splitters.append(strip_seq(rec))
            if is_disc and dup_ok:
                discordants.append(strip_seq(rec))
    return main, splitters, discordants


def _pair_records(
    r1: _PairRow, r2: Optional[_PairRow], idx: BWAIndex,
    distro: InsertDistro, is_dup: bool, cfg: AlignConfig,
):
    """Emit (record, in_splitters, in_discordants) for one template."""
    offsets = np.asarray(idx.offsets + [idx.l_pac], dtype=np.int64)

    def cpos(a: HostAlignment):
        tid = int(np.searchsorted(offsets, a.pos, side="right") - 1)
        return tid, a.pos - int(offsets[tid])

    out = []
    ends = [(r1, r2, FREAD1), (r2, r1, FREAD2)] if r2 is not None else [(r1, None, 0)]
    # precompute chrom coords
    infos = {}
    for r, _, _ in ends:
        if r is not None and r.aln.aligned:
            tid, p = cpos(r.aln)
            infos[id(r)] = (tid, p, r.aln.end_pos - r.aln.pos + p)
    # proper-pair determination
    proper = False
    if r2 is not None and r1.aln.aligned and r2.aln.aligned:
        proper = is_proper(
            r1.aln.pos, r1.aln.end_pos, r1.aln.strand,
            r2.aln.pos, r2.aln.end_pos, r2.aln.strand,
            distro, same_tid=(r1.tid == r2.tid),
        )
    both_mapped = (
        r2 is not None and r1.aln.aligned and r2.aln.aligned
    )
    discordant = both_mapped and not proper

    for r, mate, read_flag in ends:
        if r is None:
            continue
        a = r.aln
        flag = read_flag
        if r2 is not None:
            flag |= FPAIRED
        if proper:
            flag |= FPROPER_PAIR
        if not a.aligned:
            flag |= FUNMAP
        if a.aligned and a.strand:
            flag |= FREVERSE
        if mate is not None:
            if not mate.aln.aligned:
                flag |= FMUNMAP
            elif mate.aln.strand:
                flag |= FMREVERSE
        if is_dup:
            flag |= FDUP

        if a.aligned:
            tid, pos, _end = infos[id(r)]
        elif mate is not None and mate.aln.aligned:
            tid, pos, _end = infos[id(mate)]
        else:
            tid, pos = -1, -1
        if mate is not None and mate.aln.aligned:
            mtid, mpos, _mend = infos[id(mate)]
        elif a.aligned and mate is not None:
            mtid, mpos = tid, pos  # mate unmapped: placed with this read
        else:
            mtid, mpos = (tid, pos) if not a.aligned else (-1, -1)
        if r2 is None:
            mtid, mpos = -1, -1

        tlen = 0
        if both_mapped and r.tid == mate.tid:
            left = min(a.pos, mate.aln.pos)
            right = max(a.end_pos, mate.aln.end_pos)
            if a.pos < mate.aln.pos or (a.pos == mate.aln.pos and read_flag == FREAD1):
                tlen = right - left
            else:
                tlen = -(right - left)

        seq = r.seq if not (a.aligned and a.strand) else r.seq_rc
        qual = r.qual if not (a.aligned and a.strand) else r.qual_r
        tags = []
        if a.aligned:
            # MD only when the host computed it (bwa mem itself emits no MD;
            # the pallas path reports NM from the traceback kernel)
            tags += ([("MD", "Z", a.md)] if a.md else [])
            tags += [("NM", "i", a.nm), ("AS", "i", a.score),
                     ("XS", "i", a.sub_score)]
        tags.append(("RG", "Z", r.rg or cfg.rg_id))
        if mate is not None and mate.aln.aligned:
            # samblaster --addMateTags contract (bin/speedseq:439)
            tags.append(("MC", "Z", cigar_to_str(mate.aln.cigar)))
            tags.append(("MQ", "i", mate.aln.mapq))
        # slot-1 candidate: a split piece (query-disjoint → SA tag +
        # supplementary record, samblaster splitter channel) or an XA
        # secondary (query-overlapping alternative placement, bwa's
        # XA:Z:chr,±pos,CIGAR,NM; emitted when within 80% of the primary
        # score [external knowledge: bwa mem XA contract])
        has_supp = a.aligned and r.supp is not None
        split_ok = False
        if has_supp:
            from .core import _orig_frame

            qlen = len(r.seq)
            pq = _cigar_qspan(a.cigar)
            sq = _cigar_qspan(r.supp.cigar)
            pb, pe = _orig_frame(pq[0], pq[1], a.strand, qlen)
            sb, se = _orig_frame(sq[0], sq[1], r.supp.strand, qlen)
            split_ok = split_qualifies(pb, pe, sb, se, cfg.min_non_overlap)
        has_split = has_supp and split_ok
        if has_split:
            stid, spos = cpos(r.supp)
            tags.append(
                (
                    "SA",
                    "Z",
                    make_sa_tag(
                        idx.names[stid], spos, r.supp.strand, r.supp.cigar,
                        r.supp.mapq, r.supp.nm,
                    ),
                )
            )
        elif has_supp and r.supp.score >= 0.8 * a.score:
            stid, spos = cpos(r.supp)
            tags.append((
                "XA", "Z",
                f"{idx.names[stid]},{'-' if r.supp.strand else '+'}"
                f"{spos + 1},{cigar_to_str(r.supp.cigar)},{r.supp.nm};",
            ))

        rec = SAMRecord(
            qname=r.name, flag=flag, tid=tid, pos=pos,
            mapq=a.mapq if a.aligned else 0,
            cigar=a.cigar if a.aligned else [],
            mtid=mtid, mpos=mpos, tlen=tlen, seq=seq, qual=qual, tags=tags,
        )
        out.append((rec, has_split, discordant))

        if has_split:
            stid, spos = cpos(r.supp)
            sflag = flag | FSUPPLEMENTARY
            if r.supp.strand:
                sflag |= FREVERSE
            else:
                sflag &= ~FREVERSE
            sseq = r.seq if not r.supp.strand else r.seq_rc
            squal = r.qual if not r.supp.strand else r.qual_r
            stags = [
                ("NM", "i", r.supp.nm),
                *([("MD", "Z", r.supp.md)] if r.supp.md else []),
                ("AS", "i", r.supp.score), ("RG", "Z", r.rg or cfg.rg_id),
                (
                    "SA", "Z",
                    make_sa_tag(
                        idx.names[tid], pos, a.strand, a.cigar, a.mapq, a.nm
                    ),
                ),
            ]
            srec = SAMRecord(
                qname=r.name, flag=sflag, tid=stid, pos=spos,
                mapq=r.supp.mapq, cigar=r.supp.cigar, mtid=mtid, mpos=mpos,
                tlen=0, seq=sseq, qual=squal, tags=stags,
            )
            out.append((srec, True, False))
    return out


def _cigar_qspan(cigar) -> Tuple[int, int]:
    """(qbeg, qend) covered by non-clip query ops, strand frame."""
    lead = cigar[0][1] if cigar and cigar[0][0] in (4, 5) else 0
    span = sum(l for op, l in cigar if op in (0, 1, 7, 8))
    return lead, lead + span


def sort_key(rec: SAMRecord) -> Tuple[int, int, int]:
    """samtools coordinate-sort key: tid<<32|(pos+1)<<1|is_rev
    (src/samtools-1.3.1/bam_sort.c:1612); unmapped (tid<0) last.
    The external sorter (formats.extsort) implements the same key
    columnarly; this scalar form is kept for tests/verification."""
    tid = rec.tid if rec.tid >= 0 else 1 << 30
    return (tid, rec.pos + 1, 1 if rec.flag & FREVERSE else 0)
