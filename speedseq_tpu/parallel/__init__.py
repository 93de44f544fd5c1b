"""Device-mesh parallelism: the TPU-native replacement for the reference's
GNU parallel + FIFO plumbing (SURVEY.md §2.3).

- read batches are data-parallel over the mesh ``data`` axis via
  ``distributed_fused_step`` — the SAME device graph as the single-chip
  pipeline (align.core.fused_align_packed), so shard count never changes
  output records (the analog of BWA's ``-t`` threads + the 3 co-scheduled
  pipes, bin/speedseq:437-449)
- the FM/k-mer indexes are replicated per device (the reference replicates
  the BWA index per process)
- per-shard aligned-read counts reduce with ``psum`` over ICI
- variant-calling windows fan out on host executors (var.engine), the
  analog of the 34,123 depth-balanced BED windows at bin/speedseq:677-719.
"""

from .mesh import (  # noqa: F401
    distributed_fused_step,
    make_mesh,
    replicate,
    shard_batch,
)
