"""BWA-MEM-style seed-and-extend alignment, TPU-native.

Pipeline (reference contract: ``bwa mem`` invocation at bin/speedseq:438
and the SAMBLASTER/sambamba stages at :439-448, collapsed here into one
jitted graph + host IO epilogue):

  seeding.find_seeds   — FMD SMEM seeding (batched, grid-anchored)
  chain.chain_seeds    — diagonal-binned seed chaining
  sw.banded_sw         — local affine-gap Smith-Waterman + traceback
  core.align_batch     — orchestration: extension, MAPQ, pairing
  markdup              — SAMBLASTER-equivalent dup marking + splitter/
                         discordant extraction epilogue
  pipeline             — FASTQ→BAM triple driver (speedseq align equiv)
"""
