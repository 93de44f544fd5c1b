"""Read-depth CNV analysis (CNVnator-equivalent).

Reference contract (bin/cnvnator_wrapper.py:75-235, bin/annotate_rd.py):
``-tree`` (read placement) → ``-his`` (100 bp bin counts per chrom) →
``-stat`` → ``-partition`` (mean-shift) → ``-call``; plus ``-genotype``
returning normalized copy number for arbitrary intervals (annotate_rd.py:
294-296 uses it to add a CN FORMAT field to the SV VCF).

[external knowledge: Abyzov et al. 2011 for the algorithm].  Device path
(sv/device.py, used when JAX is available): read binning as one global
segment_sum, GC-stratum correction as segmented reductions, and an
actual iterative mean-shift partitioner with depth-dependent signal
bandwidth.  Host fallback bins in numpy and partitions with a simpler
neighborhood-smoothing pass; ROOT files are replaced by arrays either
way.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..formats.bam import BAMReader
from ..formats.fasta import FastaFile
from ..formats.sam import FDUP, FSECONDARY, FSUPPLEMENTARY, FUNMAP


@dataclass
class CNVCall:
    chrom: str
    start: int
    end: int
    kind: str          # "deletion" | "duplication"
    norm_rd: float     # normalized read depth (1.0 = diploid)


@dataclass
class DepthProfile:
    bin_size: int
    chroms: List[str]
    counts: Dict[str, np.ndarray]       # raw per-bin read counts
    corrected: Dict[str, np.ndarray]    # GC-corrected
    mean: float                         # global per-bin mean (autosome)

    @classmethod
    def from_bam(
        cls, bam_path: str, fasta_path: str, bin_size: int = 100
    ) -> "DepthProfile":
        """-tree/-his equivalents: bin read placements, GC-correct.

        Columnar when the native codec is available: the whole BAM
        decodes in one native call and midpoint binning is one
        scatter-add per chromosome; per-record fallback otherwise."""
        from .. import native

        fa = FastaFile(fasta_path)
        if native.available():
            from .columnar import end_positions, read_bam_columns

            refs, cols = read_bam_columns(bam_path)
            names = [n for n, _ in refs]
            counts = {
                n: np.zeros((l + bin_size - 1) // bin_size, np.float64)
                for n, l in refs
            }
            flags = cols.flag.astype(np.int64)
            keep = (
                ((flags & (FUNMAP | FSECONDARY | FSUPPLEMENTARY | FDUP))
                 == 0) & (cols.tid >= 0)
            )
            tid = cols.tid[keep].astype(np.int64)
            mid = (cols.pos[keep].astype(np.int64)
                   + end_positions(cols)[keep]) // 2
            b = mid // bin_size
            from . import device as dev

            nb_per = np.array([len(counts[n]) for n in names], np.int64)
            if dev.device_enabled() and len(tid):
                # one global scatter-add on the device (-his equivalent)
                offs = np.concatenate([[0], np.cumsum(nb_per)])
                gb = offs[tid] + b
                ok = (b >= 0) & (b < nb_per[tid])
                total = int(offs[-1])
                flat = np.asarray(dev._depth_bins_jit(
                    np.where(ok, gb, total).astype(np.int32),
                    n_bins=total + 1))[:total]
                for i, n in enumerate(names):
                    counts[n] = flat[offs[i]:offs[i + 1]].astype(np.float64)
            else:
                for t in np.unique(tid):
                    arr = counts[names[int(t)]]
                    bt = b[tid == t]
                    bt = bt[(bt >= 0) & (bt < len(arr))]
                    np.add.at(arr, bt, 1)
        else:
            with BAMReader(bam_path) as rd:
                refs = rd.header.refs
                counts = {
                    n: np.zeros((l + bin_size - 1) // bin_size, np.float64)
                    for n, l in refs
                }
                names = [n for n, _ in refs]
                for rec in rd:
                    if rec.flag & (FUNMAP | FSECONDARY | FSUPPLEMENTARY | FDUP):
                        continue
                    if rec.tid < 0:
                        continue
                    # -unique placement: count the read at its midpoint bin
                    mid = (rec.pos + rec.end_pos()) // 2
                    b = mid // bin_size
                    arr = counts[names[rec.tid]]
                    if 0 <= b < len(arr):
                        arr[b] += 1
        # GC per bin + stratified correction (cnvnator gc correction)
        gc_of: Dict[str, np.ndarray] = {}
        for n, l in refs:
            seq = fa.fetch_encoded(n)
            nb = (l + bin_size - 1) // bin_size
            pad = np.full(nb * bin_size, 4, np.uint8)
            pad[:l] = seq
            m = pad.reshape(nb, bin_size)
            valid = (m < 4).sum(axis=1)
            gcc = ((m == 1) | (m == 2)).sum(axis=1)
            with np.errstate(invalid="ignore", divide="ignore"):
                gc_of[n] = np.where(valid > 0, gcc / np.maximum(valid, 1), -1.0)
        allc = np.concatenate([counts[n] for n in names])
        allgc = np.concatenate([gc_of[n] for n in names])
        used = allgc >= 0
        strata = np.clip((allgc * 100).astype(int), 0, 100)
        from . import device as dev

        if dev.device_enabled() and len(allc):
            # segmented stratum reductions on the device (-stat + GC
            # correction in one program)
            corr_flat, mean_d = dev._gc_correct_jit(
                allc.astype(np.float32), strata.astype(np.int32), used)
            corr_flat = np.asarray(corr_flat, np.float64)
            mean = float(mean_d)
            corrected = {}
            off = 0
            for n in names:
                ln = len(counts[n])
                corrected[n] = corr_flat[off:off + ln]
                off += ln
        else:
            mean = float(allc[used].mean()) if used.any() else 0.0
            # per-GC-stratum means
            corr_factor = np.ones(101)
            for s in range(101):
                m_ = allc[used & (strata == s)]
                if len(m_) >= 20 and m_.mean() > 0:
                    corr_factor[s] = mean / m_.mean()
            corrected = {}
            for n in names:
                s = np.clip((gc_of[n] * 100).astype(int), 0, 100)
                corrected[n] = counts[n] * corr_factor[s] * (gc_of[n] >= 0)
        fa.close()
        return cls(
            bin_size=bin_size, chroms=names, counts=counts,
            corrected=corrected, mean=max(mean, 1e-9),
        )

    # ---- partition (-partition equivalent) ------------------------------
    def partition(self, chrom: str) -> np.ndarray:
        """Mean-shift partition (CNVnator -partition,
        bin/cnvnator_wrapper.py:128-135): on the device, the actual
        iterative mean-shift with depth-dependent signal bandwidth
        (sv/device.mean_shift_partition) — abrupt CNV boundaries stay
        sharp because the signal kernel decouples dissimilar depths.
        Host fallback: neighborhood similarity smoothing."""
        from . import device as dev

        x = self.corrected[chrom].copy()
        if len(x) == 0:
            return x
        if dev.device_enabled():
            return dev.mean_shift_partition(x, self.mean)
        sigma = max(np.sqrt(self.mean), 1.0)
        for h in (2, 4, 8, 16):
            k = 2 * h + 1
            pad = np.pad(x, h, mode="edge")
            win = np.lib.stride_tricks.sliding_window_view(pad, k)
            center = x[:, None]
            similar = np.abs(win - center) < 2.0 * sigma
            sums = np.where(similar, win, 0).sum(axis=1)
            cnts = similar.sum(axis=1)
            x = sums / np.maximum(cnts, 1)
        return x

    # ---- call (-call equivalent) ----------------------------------------
    def call(
        self, chrom: str, del_thresh: float = 0.75, dup_thresh: float = 1.25,
        min_bins: int = 3,
    ) -> List[CNVCall]:
        part = self.partition(chrom)
        norm = part / self.mean
        state = np.where(norm < del_thresh, -1, np.where(norm > dup_thresh, 1, 0))
        calls: List[CNVCall] = []
        i = 0
        n = len(state)
        while i < n:
            if state[i] == 0:
                i += 1
                continue
            j = i
            while j < n and state[j] == state[i]:
                j += 1
            if j - i >= min_bins:
                calls.append(
                    CNVCall(
                        chrom=chrom,
                        start=i * self.bin_size,
                        end=j * self.bin_size,
                        kind="deletion" if state[i] < 0 else "duplication",
                        norm_rd=float(norm[i:j].mean()),
                    )
                )
            i = j
        return calls

    def call_all(self) -> List[CNVCall]:
        out = []
        for c in self.chroms:
            out.extend(self.call(c))
        return out

    # ---- genotype (-genotype equivalent; annotate_rd.py:294-296) --------
    def genotype(self, chrom: str, start: int, end: int) -> float:
        """Copy number of [start, end): normalized depth × 2."""
        b0 = start // self.bin_size
        b1 = max(b0 + 1, (end + self.bin_size - 1) // self.bin_size)
        arr = self.corrected.get(chrom)
        if arr is None or len(arr) == 0:
            return 2.0
        seg = arr[b0 : min(b1, len(arr))]
        if len(seg) == 0:
            return 2.0
        return round(float(seg.mean() / self.mean * 2.0), 2)

    def write_calls_txt(self, path: str) -> None:
        """readdepth.txt output shape (cnvnator -call text columns)."""
        with open(path, "w") as fh:
            for c in self.call_all():
                size = c.end - c.start
                fh.write(
                    f"{c.kind}\t{c.chrom}:{c.start + 1}-{c.end}\t{size}\t"
                    f"{c.norm_rd:.6g}\t0\t0\t0\t0\n"
                )

    def write_calls_bed(self, path: str) -> None:
        """readdepth.bed output (cnvnator_wrapper.py bed conversion)."""
        with open(path, "w") as fh:
            for c in self.call_all():
                fh.write(
                    f"{c.chrom}\t{c.start}\t{c.end}\t{c.kind}\t{c.norm_rd:.4g}\n"
                )
