#!/usr/bin/env bash
# Example speedseq-tpu commands on a small slice of chromosome 20 —
# the TPU-native mirror of the reference's example/run_speedseq.sh
# (/root/reference/example/run_speedseq.sh:1-31).  The reference's
# 30X NA12878 FASTQ is a missing blob in this checkout, so reads are
# simulated from the slice at the same coverage; substitute your own
# FASTQ pair to run real data.
set -e

REF=/root/reference/example/data/human_g1k_v37_20_42220611-42542245.fasta
OUT=${1:-/tmp/speedseq_tpu_example}
mkdir -p "$OUT"
cd "$OUT"

# 0. Simulated 30X paired reads over the slice (stand-in for the
#    reference's NA12878.20slice.30X.fastq.gz, a missing blob)
python - << 'PY'
from speedseq_tpu.formats.fasta import FastaFile
from speedseq_tpu.utils.sim import simulate_pairs, to_fastq
g = FastaFile("/root/reference/example/data/"
              "human_g1k_v37_20_42220611-42542245.fasta").fetch_encoded("20_slice")
n = int(30 * len(g) / 200)              # 30X at 2x100 bp
names, s1, q1, s2, q2, _ = simulate_pairs(g, n, read_len=100, seed=1)
to_fastq("r1.fq", "r2.fq", names, s1, q1, s2, q2)
PY

# 1. Align (BWA-MEM-equivalent; interleaved -p works too)
python -m speedseq_tpu align \
    -o example \
    -R "@RG\tID:NA12878\tSM:NA12878\tLB:lib1" \
    "$REF" r1.fq r2.fq

# 2. Detect SNVs and indels (FreeBayes-equivalent)
python -m speedseq_tpu var \
    -o example \
    "$REF" \
    example.bam

# 3. Detect SVs (LUMPY+SVTyper+CNVnator-equivalent)
python -m speedseq_tpu sv \
    -o example \
    -B example.bam \
    -S example.splitters.bam \
    -D example.discordants.bam \
    -R "$REF"

# 4. Realign from BAM (per-library regrouping, bwa -C semantics)
python -m speedseq_tpu realign \
    -o example.realign \
    "$REF" \
    example.bam

ls -l example*
