"""Batched ungapped candidate verification/scoring.

Equivalent role to the reference's GenomeHit::extend (hi_aligner.h:431,
SURVEY.md "HOT LOOP 2"): given candidate (read, joined-offset) pairs from
SA-range expansion, score the read laid directly on the text — match 0 /
qual-scaled mismatch / N penalty — and check the candidate doesn't cross a
fragment boundary (joinedToTextOff validity, gfm.h:5527).

TPU design: candidates are a dense (B, K) grid; each lane gathers its text
window from the 2-bit-packed joined text and the whole score is a masked
sum over the read axis — pure VPU work, no control flow.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from . import rank as _rank

NEG_INF = -(1 << 30)  # plain int: usable both in jnp ops and host code


@partial(jax.jit, static_argnames=())
def verify_ungapped(idx: dict, sctab: dict,
                    seqs: jax.Array, quals: jax.Array, lens: jax.Array,
                    cand_pos: jax.Array, cand_valid: jax.Array):
    """Score each candidate placement without gaps.

    seqs (B, L) int codes 0..4; quals (B, L) phred; lens (B,) int32;
    cand_pos (B, K) joined-text start offsets; cand_valid (B, K) bool.

    Returns dict:
      score (B, K) int32 — ungapped alignment score (NEG_INF if invalid)
      nmm   (B, K) int32 — mismatch count
      nns   (B, K) int32 — read-N + ref-N position count
      valid (B, K) bool  — in-range & single-fragment & was requested
    """
    B, L = seqs.shape
    K = cand_pos.shape[1]
    seqs = seqs.astype(jnp.int32)
    lens = lens.astype(jnp.int32)

    # fragment-boundary check: start & end in the same fragment
    frag = _rank.searchsorted_right(idx["frag_joined"], cand_pos) - 1
    frag = jnp.clip(frag, 0, idx["frag_joined"].shape[0] - 1)
    fstart = idx["frag_joined"][frag]
    fend = idx["frag_end"][frag]
    inb = (cand_pos >= fstart) & (cand_pos + lens[:, None] <= fend)
    valid = cand_valid & inb & (cand_pos >= 0)

    # gather text windows: (B, K, L)
    ref = _rank.text_window(idx, cand_pos.reshape(-1), L).reshape(B, K, L)

    rd = seqs[:, None, :]                      # (B, 1, L)
    q = jnp.clip(quals.astype(jnp.int32), 0, 63)[:, None, :]
    in_read = (jnp.arange(L, dtype=jnp.int32)[None, None, :]
               < lens[:, None, None])
    rd_n = rd >= 4
    rf_n = ref >= 4
    isn = (rd_n | rf_n) & in_read
    mm = (rd != ref) & ~rd_n & ~rf_n & in_read
    mtch = (rd == ref) & ~rd_n & in_read

    if "snv_packed" in idx:
        # graph mode: a mismatch whose read base is a known alt allele is a
        # free SNP edit (reference graph alignment: ALT-compatible bases
        # cost nothing, excluded from NM/XM — golden-checked vs
        # hisat2-align-s on an --snp index)
        ov = _rank.nib4_window(idx, cand_pos.reshape(-1), L).reshape(B, K, L)
        snp_free = mm & ((ov == rd + 1) | (ov == 15))
        mm = mm & ~snp_free
        mtch = mtch | snp_free

    from ..align.scoring import mm_pen_of, sc_pen_of
    mm_pen = mm_pen_of(sctab, q)               # (B, 1, L) arithmetic ramp
    s = (jnp.where(mtch, sctab["match_bonus"], 0)
         - jnp.where(mm, mm_pen, 0)
         - jnp.where(isn, sctab["n_pen"], 0))  # per-position score (B, K, L)

    # Soft-clip-aware score (reference allows 5'/3' soft clips even in its
    # default mode, penalty --sp 1,2 qual-scaled, MANUAL.markdown:133):
    #   score = max_{c5,c3} sum_{i in [c5, len-c3)} s(i) - sum_clipped scp(i)
    # = max-subarray of g(i) = s(i) + scp(i), minus total clip penalty —
    # one cumsum + cummax along the read axis, no search loop.
    scp = jnp.where(in_read, sc_pen_of(sctab, q), 0)
    g = s + scp                                # (B, K, L) via broadcast
    P = jnp.cumsum(g, axis=2)                  # P[k] = prefix sum incl. k
    minP = jnp.minimum(0, lax.cummin(P, axis=2))
    best_sub = jnp.maximum(0, (P - jnp.concatenate(
        [jnp.zeros_like(minP[..., :1]), minP[..., :-1]], axis=2)).max(axis=2))
    score = best_sub - scp.sum(axis=2)

    return dict(
        score=jnp.where(valid, score, NEG_INF),
        nmm=mm.sum(axis=2).astype(jnp.int32),
        nns=isn.sum(axis=2).astype(jnp.int32),
        valid=valid,
    )
