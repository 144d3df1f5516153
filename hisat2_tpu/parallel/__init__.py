"""Multi-device scaling (SURVEY.md §2.6 P8 — the reference is single-node
pthreads; here reads are data-parallel over a jax.sharding.Mesh with the
index replicated in every chip's HBM)."""
