"""Paired-end read simulator with ground truth.

Stand-in for the reference's example workload (the 30X NA12878 FASTQ at
example/data is a missing blob, /root/reference/.MISSING_LARGE_BLOBS), and
the oracle for aligner-accuracy and variant-recall tests: we simulate reads
from the example chr20 slice with known positions, optionally over a mutated
haplotype with known SNVs/indels/SVs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

_BASES = "ACGT"


@dataclass
class SimTruth:
    names: List[str]
    pos1: np.ndarray       # 0-based leftmost ref pos of read1 alignment
    pos2: np.ndarray
    strand1: np.ndarray    # 0 = forward
    strand2: np.ndarray
    variants: List[Tuple[int, str, str]] = field(default_factory=list)
    # (pos0, ref_allele, alt_allele) applied to the sampled haplotype


def mutate(
    genome: np.ndarray,
    rng: np.random.Generator,
    snv_rate: float = 0.001,
    indel_rate: float = 0.0001,
    max_indel: int = 8,
) -> Tuple[np.ndarray, List[Tuple[int, str, str]], np.ndarray]:
    """Apply random SNVs/indels; returns (haplotype, variants, coord_map)
    where coord_map[i] = reference position of haplotype base i."""
    out = []
    variants = []
    coord = []
    i = 0
    n = len(genome)
    while i < n:
        r = rng.random()
        if r < snv_rate:
            ref = int(genome[i])
            alt = int((ref + 1 + rng.integers(0, 3)) % 4)
            variants.append((i, _BASES[ref], _BASES[alt]))
            out.append(alt)
            coord.append(i)
            i += 1
        elif r < snv_rate + indel_rate and 0 < i < n - max_indel - 1:
            ln = int(rng.integers(1, max_indel + 1))
            if rng.random() < 0.5:  # deletion of ln bases after i
                ref_allele = "".join(_BASES[int(b)] for b in genome[i - 1 : i + ln])
                variants.append((i - 1, ref_allele, ref_allele[0]))
                i += ln
            else:  # insertion of ln random bases after i-1
                ins = rng.integers(0, 4, size=ln)
                alt_allele = _BASES[int(genome[i - 1])] + "".join(
                    _BASES[int(b)] for b in ins
                )
                variants.append((i - 1, _BASES[int(genome[i - 1])], alt_allele))
                for b in ins:
                    out.append(int(b))
                    coord.append(-1)
        else:
            out.append(int(genome[i]))
            coord.append(i)
            i += 1
    return (
        np.array(out, dtype=np.uint8),
        variants,
        np.array(coord, dtype=np.int64),
    )


def simulate_pairs(
    genome: np.ndarray,
    n_pairs: int,
    read_len: int = 100,
    insert_mean: float = 320.0,
    insert_std: float = 50.0,
    error_rate: float = 0.002,
    seed: int = 0,
    base_qual: int = 35,
    name_prefix: str = "sim",
    diploid_genome: Optional[np.ndarray] = None,
    coord_map: Optional[np.ndarray] = None,
):
    """FR paired-end reads.  Returns (names, seq1, qual1, seq2, qual2, truth)
    with seqs as (n, read_len) uint8 codes.

    When ``diploid_genome`` is given, half the fragments are drawn from it
    (heterozygous sample); ``coord_map`` maps its coords back to reference.
    """
    rng = np.random.default_rng(seed)
    n = len(genome)
    seqs1 = np.empty((n_pairs, read_len), dtype=np.uint8)
    seqs2 = np.empty((n_pairs, read_len), dtype=np.uint8)
    pos1 = np.empty(n_pairs, dtype=np.int64)
    pos2 = np.empty(n_pairs, dtype=np.int64)
    strand1 = np.empty(n_pairs, dtype=np.int8)
    strand2 = np.empty(n_pairs, dtype=np.int8)
    names = [f"{name_prefix}_{i}" for i in range(n_pairs)]
    for i in range(n_pairs):
        use_alt = diploid_genome is not None and rng.random() < 0.5
        src = diploid_genome if use_alt else genome
        m = len(src)
        while True:
            isize = int(rng.normal(insert_mean, insert_std))
            if isize < read_len:
                continue
            start = int(rng.integers(0, max(1, m - isize)))
            break
        frag = src[start : start + isize]
        r1 = frag[:read_len].copy()
        r2 = (3 - frag[-read_len:][::-1]).copy()  # revcomp of the far end
        # read1 on forward strand of fragment; fragment itself on a random
        # genome strand
        flip = rng.random() < 0.5
        if use_alt and coord_map is not None:
            p_first = coord_map[start] if coord_map[start] >= 0 else start
            p_last = (
                coord_map[start + isize - read_len]
                if coord_map[start + isize - read_len] >= 0
                else start + isize - read_len
            )
        else:
            p_first, p_last = start, start + isize - read_len
        if not flip:
            pos1[i], strand1[i] = p_first, 0
            pos2[i], strand2[i] = p_last, 1
        else:
            r1, r2 = r2, r1
            pos1[i], strand1[i] = p_last, 1
            pos2[i], strand2[i] = p_first, 0
        # sequencing errors
        for r in (r1, r2):
            errs = np.nonzero(rng.random(read_len) < error_rate)[0]
            for e in errs:
                r[e] = (r[e] + 1 + rng.integers(0, 3)) % 4
        seqs1[i] = r1
        seqs2[i] = r2
    quals = np.full((n_pairs, read_len), base_qual, dtype=np.uint8)
    truth = SimTruth(names, pos1, pos2, strand1, strand2)
    return names, seqs1, quals.copy(), seqs2, quals.copy(), truth


def to_fastq(path1: str, path2: str, names, seqs1, quals1, seqs2, quals2):
    from ..formats.fastq import write_fastq
    from ..formats.fasta import decode_bases

    s1 = [decode_bases(s).decode() for s in seqs1]
    s2 = [decode_bases(s).decode() for s in seqs2]
    q1 = ["".join(chr(q + 33) for q in row) for row in quals1]
    q2 = ["".join(chr(q + 33) for q in row) for row in quals2]
    write_fastq(path1, names, s1, q1)
    write_fastq(path2, names, s2, q2)
