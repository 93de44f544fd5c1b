"""Host-side byte-level IO layer (htslib-equivalent formats).

Everything device-side in speedseq_tpu works on arrays; this package is the
only code that touches file bytes.  Formats reproduced (reference locations
cited per-module):  BGZF, BAM, SAM text, BAI, FASTA/faidx, FASTQ, VCF,
tabix, BED.
"""

from . import bgzf, fasta, fastq, sam, bam, bai, vcf, bed  # noqa: F401
