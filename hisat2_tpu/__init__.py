"""hisat2_tpu — a TPU-native HISAT2-class graph genome aligner.

Built from scratch in JAX/XLA/Pallas. The reference design (HISAT2 v2.2.3,
C++/pthreads/SSE) is documented in SURVEY.md; this package re-architects it
TPU-first:

  * the FM/GFM index lives as device-resident bit-packed arrays,
  * LF-mapping backward search runs as a batched wavefront over thousands of
    reads at once (ops/search.py),
  * Occ/rank is computed with popcount over 2-bit-packed BWT words
    (ops/rank.py, Pallas kernel in ops/pallas_rank.py),
  * seed extension uses a batched affine-gap DP kernel (ops/sw.py) instead of
    the reference's SSE striped Smith-Waterman,
  * multi-chip scaling is data-parallel over a jax.sharding.Mesh
    (parallel/mesh.py) with the index replicated in HBM.

Layout mirrors the reference's layer map (SURVEY.md §1):
  utils/    — L0 primitives (alphabet, packing, option functions)
  io/       — L5 read I/O + SAM output, L8 annotation parsers
  index/    — L2/L3 index data structures + construction
  ops/      — device kernels (rank, search, locate, DP)
  align/    — L4 alignment engine (pipeline, scoring, reporting, PE)
  parallel/ — multi-device sharding (reference has none; SURVEY.md §2.6)
  cli/      — L6/L7 command-line drivers
"""

__version__ = "0.1.0"
