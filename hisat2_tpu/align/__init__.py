"""L4 alignment engine: scoring, extension, DP, paired-end policy, MAPQ,
reporting (reference hi_aligner.h / spliced_aligner.h / aln_sink.h roles)."""
