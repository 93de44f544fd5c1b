"""speedseq_tpu — a TPU-native whole-genome analysis engine.

A from-scratch reimplementation of the capabilities of hall-lab/speedseq
(reference: /root/reference/bin/speedseq) designed TPU-first:

- ``formats/``  host-side byte-level IO: BGZF, BAM, SAM, VCF, FASTA/faidx,
  FASTQ, BAI, tabix (htslib-equivalent; see reference
  src/samtools-1.3.1/htslib-1.3.1/).
- ``index/``    BWA-compatible FM-index construction + device-resident
  FM-index arrays (occ checkpoints, sampled SA, 2-bit pac).
- ``align/``    BWA-MEM-style seed-and-extend alignment as jitted JAX +
  Pallas kernels, with SAMBLASTER-style dup marking and splitter /
  discordant extraction fused as an epilogue.
- ``var/``      FreeBayes-style SNV/indel genotyping over genomic windows.
- ``sv/``       LUMPY-style SV breakpoint clustering + SVTyper genotyping +
  CNVnator-style read-depth CNV.
- ``parallel/`` device-mesh sharding (data-parallel read batches, genomic
  window shards) replacing the reference's GNU parallel + FIFO plumbing.
"""

__version__ = "0.1.0"


def _setup_jax_cache():
    """Persistent XLA compilation cache: CLI subcommands are separate
    processes (like the reference's separate binaries), so without this
    every run pays ~25 s of recompiles.  Opt out with SSQ_NO_JAX_CACHE."""
    import os

    if os.environ.get("SSQ_NO_JAX_CACHE"):
        return
    try:
        import jax

        d = os.path.join(
            os.path.expanduser("~"), ".cache", "speedseq_tpu", "jaxcache"
        )
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_setup_jax_cache()
