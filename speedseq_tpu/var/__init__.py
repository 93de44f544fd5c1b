"""SNV/indel calling over genomic-window shards (FreeBayes-equivalent).

Reference contract (bin/speedseq:506-833):
``freebayes -f ref --region chr:start..end --min-repeat-entropy 1`` per
window, piped through ``vawk '$6>=QUAL && I$RPR>0 && I$RPL>0'``, windows
merged by coordinate sort, bgzip + tabix.  Somatic mode
(bin/speedseq:835-1203) is the same engine with ``--pooled-discrete``
over [normal, tumor] plus the driver's SSC filter (bin/speedseq:155-186).

Pipeline here: pileup (host, vectorized numpy) → candidate alleles →
batched genotype-likelihood math (jitted JAX over site×genotype lanes) →
VCF emission with the reference's INFO/FORMAT surface (DP/RO/AO/RPL/RPR/
SAF/SAR/AB/TYPE, GT:GQ:DP:RO:QR:AO:QA:GL).
"""

from .caller import call_window, CallerConfig  # noqa: F401
from .engine import run_var  # noqa: F401
