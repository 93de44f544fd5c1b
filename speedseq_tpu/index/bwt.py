"""BWA-compatible index build / load (.bwt .pac .sa .ann .amb).

The reference auto-runs ``bwa index $REF`` (bin/speedseq:386-391); this
module is its equivalent.  On-disk layout reverse-engineered from the real
bwa artifacts at example/data/*.fasta.* and reproduced byte-exactly:

- .pac  : forward-only 2-bit pack (see pack.py)
- .bwt  : u64 primary; u64 L2[1..4]; then interleaved blocks — per 128
          bases: 4×u64 occ counts then 8×u32 packed bases (16/word, first
          base in the top 2 bits); one trailing occ checkpoint
- .sa   : u64 primary; u64 L2[1..4]; u64 sa_intv=32; u64 seq_len;
          u64 sa[1..n_sa-1] (rank-space samples, rank k multiple of 32)
- .ann  : text — "l_pac n_seqs seed(=11)"; per seq "gi name anno" +
          "offset len n_amb"
- .amb  : text — "l_pac n_seqs n_holes"; per hole "offset len base"

The BWT covers forward + reverse-complement (FMD index, 2*l_pac), matching
bwa ≥0.6 semantics.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from ..formats.fasta import FastaFile
from .pack import write_pac, read_pac
from .suffix import suffix_array, bwt_from_sa

OCC_INTERVAL = 0x80  # 128, bwa bwt.h
SA_INTV = 32
BWA_SEED = 11  # bwa's fixed srand48 seed for ambiguous-base fill


@dataclass
class AmbHole:
    offset: int
    length: int
    base: str  # the original ambiguity code (usually 'N')


@dataclass
class BWAIndex:
    names: List[str]
    lengths: List[int]          # per-sequence lengths
    offsets: List[int]          # per-sequence start offsets in pac
    annos: List[str]            # per-sequence annotation strings
    holes: List[AmbHole]
    n_ambs: List[int]           # ambiguous-run count per sequence
    l_pac: int
    pac: np.ndarray             # (l_pac,) uint8 forward bases 0-3
    primary: int
    L2: np.ndarray              # (5,) int64 cumulative counts, L2[0]=0
    bwt_words: np.ndarray       # (n_base_words,) uint32 packed stored BWT
    occ: np.ndarray             # (n_occ, 4) int64 checkpoints every 128
    sa_intv: int
    sa_samples: np.ndarray      # (n_sa,) int64; sa_samples[0] unused (-1)

    @property
    def seq_len(self) -> int:
        return 2 * self.l_pac

    def tid_for_pos(self, pos: np.ndarray) -> np.ndarray:
        """Map pac coordinates to sequence ids (vectorized)."""
        bounds = np.asarray(self.offsets + [self.l_pac], dtype=np.int64)
        return np.searchsorted(bounds, np.asarray(pos), side="right") - 1


def _lrand48_fill(seed: int = BWA_SEED):
    """POSIX lrand48 stream (bwa fills N bases with lrand48()&3)."""
    x = (seed << 16) | 0x330E
    a, c, m = 0x5DEECE66D, 0xB, 1 << 48

    def nxt():
        nonlocal x
        x = (a * x + c) % m
        return x >> 17

    return nxt


def _pack_words(bwt_codes: np.ndarray) -> np.ndarray:
    """Pack base codes into uint32 words, 16/word, first base in top bits
    (bwa bwt_B0 layout: code k at shift ((15 - k%16)*2))."""
    n = len(bwt_codes)
    n_words = (n + 15) // 16
    padded = np.zeros(n_words * 16, dtype=np.uint32)
    padded[:n] = bwt_codes
    m = padded.reshape(-1, 16)
    words = np.zeros(n_words, dtype=np.uint32)
    for j in range(16):
        words |= m[:, j] << ((15 - j) * 2)
    return words


def _occ_checkpoints(bwt_codes: np.ndarray) -> np.ndarray:
    """(n_occ, 4) counts of each base in bwt[0:block*128] + final total."""
    n = len(bwt_codes)
    n_blocks = (n + OCC_INTERVAL - 1) // OCC_INTERVAL
    onehot = np.zeros((n, 4), dtype=np.int64)
    onehot[np.arange(n), bwt_codes] = 1
    csum = np.cumsum(onehot, axis=0)
    occ = np.zeros((n_blocks + 1, 4), dtype=np.int64)
    starts = np.arange(1, n_blocks) * OCC_INTERVAL
    occ[1:n_blocks] = csum[starts - 1]
    occ[n_blocks] = csum[-1] if n else 0
    return occ


def build_index(fasta_path: str, prefix: Optional[str] = None,
                write_files: bool = True) -> BWAIndex:
    """bwa index equivalent: FASTA → BWAIndex (+ the 5 index files)."""
    fa = FastaFile(fasta_path)
    names, lengths, offsets, annos, n_ambs = [], [], [], [], []
    holes: List[AmbHole] = []
    chunks = []
    rng = _lrand48_fill()
    off = 0
    for rec in fa.records:
        names.append(rec.name)
        lengths.append(rec.length)
        offsets.append(off)
        annos.append("(null)")
        enc = fa.fetch_encoded(rec.name)
        amb = enc >= 4
        seq_ambs = 0
        if amb.any():
            # record maximal ambiguous runs and fill with lrand48()&3
            idx = np.nonzero(amb)[0]
            run_start = idx[0]
            prev = idx[0]
            raw = np.frombuffer(fa.fetch_bytes(rec.name), dtype=np.uint8)
            for i in idx[1:].tolist() + [-1]:
                if i != prev + 1:
                    holes.append(
                        AmbHole(off + run_start, prev - run_start + 1,
                                chr(raw[run_start]))
                    )
                    seq_ambs += 1
                    if i >= 0:
                        run_start = i
                prev = i if i >= 0 else prev
            enc = enc.copy()
            for j in idx:
                enc[j] = rng() & 3
        n_ambs.append(seq_ambs)
        chunks.append(enc)
        off += rec.length
    fa.close()
    pac = np.concatenate(chunks) if chunks else np.zeros(0, dtype=np.uint8)
    l_pac = len(pac)

    # FMD text: forward + reverse complement (bwa ≥0.6 both-strand BWT)
    text = np.concatenate([pac, 3 - pac[::-1]]).astype(np.uint8)
    sa_full = suffix_array(text)
    bwt_codes, primary = bwt_from_sa(text, sa_full)
    L2 = np.zeros(5, dtype=np.int64)
    L2[1:] = np.cumsum(np.bincount(text, minlength=4))
    bwt_words = _pack_words(bwt_codes)
    occ = _occ_checkpoints(bwt_codes)

    n_sa = (len(text) + SA_INTV) // SA_INTV
    sa_samples = sa_full[np.arange(n_sa) * SA_INTV].astype(np.int64)
    sa_samples[0] = -1

    idx = BWAIndex(
        names=names, lengths=lengths, offsets=offsets, annos=annos,
        holes=holes, n_ambs=n_ambs, l_pac=l_pac, pac=pac, primary=primary,
        L2=L2, bwt_words=bwt_words, occ=occ, sa_intv=SA_INTV,
        sa_samples=sa_samples,
    )
    if write_files:
        write_index(idx, prefix or fasta_path)
    return idx


def _interleave(idx: BWAIndex) -> np.ndarray:
    """Merge occ checkpoints + base words into bwa's on-disk word stream."""
    out = []
    n = int(idx.L2[4])
    n_blocks = (n + OCC_INTERVAL - 1) // OCC_INTERVAL
    for b in range(n_blocks):
        out.append(np.frombuffer(idx.occ[b].astype("<u8").tobytes(), dtype="<u4"))
        w0 = b * 8
        out.append(idx.bwt_words[w0 : min(w0 + 8, len(idx.bwt_words))])
    out.append(np.frombuffer(idx.occ[n_blocks].astype("<u8").tobytes(), dtype="<u4"))
    return np.concatenate(out)


def write_index(idx: BWAIndex, prefix: str) -> None:
    # .pac
    write_pac(prefix + ".pac", idx.pac)
    # .bwt
    with open(prefix + ".bwt", "wb") as fh:
        fh.write(struct.pack("<Q", idx.primary))
        fh.write(idx.L2[1:5].astype("<u8").tobytes())
        fh.write(_interleave(idx).astype("<u4").tobytes())
    # .sa
    with open(prefix + ".sa", "wb") as fh:
        fh.write(struct.pack("<Q", idx.primary))
        fh.write(idx.L2[1:5].astype("<u8").tobytes())
        fh.write(struct.pack("<QQ", idx.sa_intv, idx.seq_len))
        fh.write(idx.sa_samples[1:].astype("<u8").tobytes())
    # .ann
    with open(prefix + ".ann", "w") as fh:
        fh.write(f"{idx.l_pac} {len(idx.names)} {BWA_SEED}\n")
        for i, name in enumerate(idx.names):
            fh.write(f"0 {name} {idx.annos[i]}\n")
            fh.write(f"{idx.offsets[i]} {idx.lengths[i]} {idx.n_ambs[i]}\n")
    # .amb
    with open(prefix + ".amb", "w") as fh:
        fh.write(f"{idx.l_pac} {len(idx.names)} {len(idx.holes)}\n")
        for h in idx.holes:
            fh.write(f"{h.offset} {h.length} {h.base}\n")


def _deinterleave(words: np.ndarray, seq_len: int):
    n_blocks = (seq_len + OCC_INTERVAL - 1) // OCC_INTERVAL
    occ = np.zeros((n_blocks + 1, 4), dtype=np.int64)
    base_words = []
    pos = 0
    for b in range(n_blocks):
        occ[b] = np.frombuffer(
            words[pos : pos + 8].astype("<u4").tobytes(), dtype="<u8"
        ).astype(np.int64)
        pos += 8
        nbase_words = min(8, (seq_len + 15) // 16 - b * 8)
        base_words.append(words[pos : pos + nbase_words])
        pos += nbase_words
    occ[n_blocks] = np.frombuffer(
        words[pos : pos + 8].astype("<u4").tobytes(), dtype="<u8"
    ).astype(np.int64)
    return np.concatenate(base_words), occ


def load_index(prefix: str) -> BWAIndex:
    """Load an existing BWA-format index (ours or real bwa's)."""
    with open(prefix + ".bwt", "rb") as fh:
        primary = struct.unpack("<Q", fh.read(8))[0]
        L2 = np.zeros(5, dtype=np.int64)
        L2[1:] = np.frombuffer(fh.read(32), dtype="<u8").astype(np.int64)
        words = np.frombuffer(fh.read(), dtype="<u4")
    seq_len = int(L2[4])
    bwt_words, occ = _deinterleave(words, seq_len)
    with open(prefix + ".sa", "rb") as fh:
        sa_primary = struct.unpack("<Q", fh.read(8))[0]
        fh.read(32)
        sa_intv, sa_seq_len = struct.unpack("<QQ", fh.read(16))
        body = np.frombuffer(fh.read(), dtype="<u8").astype(np.int64)
    assert sa_primary == primary and sa_seq_len == seq_len
    n_sa = (seq_len + sa_intv) // sa_intv
    sa_samples = np.empty(n_sa, dtype=np.int64)
    sa_samples[0] = -1
    sa_samples[1:] = body[: n_sa - 1]
    pac = read_pac(prefix + ".pac")
    names, lengths, offsets, annos, n_ambs = [], [], [], [], []
    with open(prefix + ".ann") as fh:
        l_pac, n_seqs, _seed = fh.readline().split()
        for _ in range(int(n_seqs)):
            f1 = fh.readline().split(None, 2)
            names.append(f1[1])
            annos.append(f1[2].strip() if len(f1) > 2 else "(null)")
            f2 = fh.readline().split()
            offsets.append(int(f2[0]))
            lengths.append(int(f2[1]))
            n_ambs.append(int(f2[2]))
    holes = []
    if os.path.exists(prefix + ".amb"):
        with open(prefix + ".amb") as fh:
            _, _, n_holes = fh.readline().split()
            for _ in range(int(n_holes)):
                f = fh.readline().split()
                holes.append(AmbHole(int(f[0]), int(f[1]), f[2]))
    return BWAIndex(
        names=names, lengths=lengths, offsets=offsets, annos=annos,
        holes=holes, n_ambs=n_ambs, l_pac=int(l_pac), pac=pac,
        primary=int(primary), L2=L2, bwt_words=bwt_words, occ=occ,
        sa_intv=int(sa_intv), sa_samples=sa_samples,
    )
