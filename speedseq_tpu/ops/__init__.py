"""Pallas TPU kernels for the hot compute paths.

- sw_pallas: banded affine Smith-Waterman DP (score-only and full
  direction-emitting variants) — one kernel launch per batch instead of
  one XLA loop step per query row.
"""
