"""hisat2_tpu — a TPU-native HISAT2-class graph genome aligner.

Built from scratch in JAX/XLA (+ C++ host hotspots). The reference design
(HISAT2 v2.2.3, C++/pthreads/SSE) is documented in SURVEY.md; this package
re-architects it TPU-first:

  * the FM index lives as device-resident bit-packed arrays with Occ
    checkpoints interleaved into 48-byte "sides" (ops/rank.py),
  * search/verify/DP/junction stages run as batched wavefronts fused into
    ONE device dispatch per read batch (align/pipeline._stage_align_fused),
  * SNP-aware ("graph") alignment uses variant patch fragments + a dense
    SNV overlay instead of a GBWT (index/graph_index.py),
  * spliced alignment is a closed-form junction kernel over diagonal pairs
    with a deterministic cross-batch splice-site DB (ops/splice.py),
  * the common-case SAM record is formatted by native C++
    (native/samfmt.cpp) from device-computed columns (align/emit.py),
  * multi-chip scaling is data-parallel over a jax.sharding.Mesh with the
    index replicated in HBM (parallel/mesh.py).

Layout mirrors the reference's layer map (SURVEY.md §1):
  utils/    — L0 primitives (alphabet, packing, metrics)
  io/       — L5 read I/O + SAM output, L8 annotation parsers
  index/    — L2/L3 index data structures + construction (+ SA-IS, repeats)
  ops/      — device kernels (rank, search, verify/extend, DP, splice)
  align/    — L4 alignment engine (pipeline, scoring, paired, MAPQ, emit)
  parallel/ — multi-device sharding (reference has none; SURVEY.md §2.6)
  cli/      — L6 drivers (build / align / inspect / repeat)
  tools/    — L8 genomics tooling (GTF/VCF extractors, simulator, stats)
  native/   — C++ components (SA-IS suffix sort, SAM formatter)
  api.py    — L7 ht2lib-equivalent embedding API
"""

__version__ = "0.1.0"
