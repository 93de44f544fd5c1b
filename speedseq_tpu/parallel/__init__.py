"""Device-mesh parallelism: the TPU-native replacement for the reference's
GNU parallel + FIFO plumbing (SURVEY.md §2.3).

- reads are data-parallel over the mesh ``data`` axis (the analog of
  BWA's ``-t`` threads + the 3 co-scheduled pipes, bin/speedseq:437-449)
- the FM-index is replicated per device (the reference replicates the BWA
  index per process)
- genomic windows shard the variant-calling stage (the analog of the
  34,123 depth-balanced BED windows, bin/speedseq:677-719)
- merges ride XLA collectives instead of files+sort.
"""

from .mesh import (  # noqa: F401
    make_mesh,
    distributed_align_step,
    shard_batch,
)
