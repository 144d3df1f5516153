"""Pallas TPU kernel: batched affine-gap DP (score only).

Equivalent role to the reference's SSE striped Smith-Waterman fill
(aligner_swsse_loc_u8.cpp / aligner_sw.h:452 — SURVEY.md P2), re-done as a
TPU kernel: CANDIDATES are the lane axis, reference-window columns are the
sublane axis, and the read-position recurrence runs as an in-register
fori_loop inside ONE kernel launch. The XLA lax.scan formulation
(ops/sw.py dp_score_batch) pays per-step loop overhead ~100x the VPU work
of a row; here the whole (C, L, W) problem is a single launch with all
state in VMEM/registers.

Layout choice: per-row reads (read char / penalty / clip prefix at
position i) are dynamic slices on the SUBLANE axis of transposed (L, C)
inputs — Mosaic lowers those natively, while lane-axis dynamic slices of
width 1 do not vectorize — and the sliced (1, TC) rows broadcast directly
against the (WP, TC) DP state.

Same mode as dp_score_batch: global in the read with soft clips
(penalty-bearing, reference --sp), free end gaps in the reference window.
The within-row read-gap (E) dependency closes with the running-max
identity  E[j] = cummax_k(G[k] + ext*k) - open - ext*(j-1); the cummax is
a log2(W)-step shift-max cascade over sublanes.

Cell-exact vs dp_score_batch (tested): rows beyond the real W+1 grid are
masked to -inf every step so the padded height cannot admit alignments
the XLA window would not.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

NEG = -(1 << 28)

_TC = 512          # candidate lanes per grid program


def _cummax_sub(x: jax.Array, height: int) -> jax.Array:
    """Inclusive running max along the sublane (first) axis via log-step
    shift-max."""
    s = 1
    while s < height:
        shifted = jnp.concatenate(
            [jnp.full((s,) + x.shape[1:], NEG, x.dtype), x[:-s]], axis=0)
        x = jnp.maximum(x, shifted)
        s <<= 1
    return x


def _shift_down(x: jax.Array, fill: int) -> jax.Array:
    return jnp.concatenate(
        [jnp.full((1,) + x.shape[1:], fill, x.dtype), x[:-1]], axis=0)


def _dp_kernel(rd_ref, pen_ref, ref_ref, scp_ref, len_ref, out_ref,
               *, L, W, WP, match_bonus, n_pen, rd_open, rd_ext,
               rf_open, rf_ext):
    import jax.experimental.pallas as pl
    refp = ref_ref[...]                 # (WP, TC) ref char at row j-1
    rdl = len_ref[...]                  # (1, TC)
    TC = refp.shape[1]

    jrows = lax.broadcasted_iota(jnp.int32, (WP, TC), 0)      # 0..WP-1
    real = jrows <= W                                          # rows 0..W
    scp_tot = scp_ref[L:L + 1, :]                              # (1, TC)

    H = jnp.where(real, 0, NEG)                                # H[0][j] = 0
    F = jnp.full((WP, TC), NEG, jnp.int32)
    best = -scp_tot

    def row(i, carry):
        H, F, best = carry
        rc = rd_ref[pl.ds(i, 1), :]                            # (1, TC)
        pc = pen_ref[pl.ds(i, 1), :]
        isn = (rc >= 4) | (refp >= 4)
        mm = (rc != refp) & ~isn
        s = jnp.where(mm, -pc, jnp.where(isn, -n_pen, match_bonus))
        col0 = -(rf_open + i * rf_ext)
        diag = _shift_down(H, NEG) + s
        Fn = jnp.maximum(H - rf_open, F - rf_ext)
        G = jnp.maximum(diag, Fn)
        G = jnp.where(jrows == 0, col0, G)
        G = jnp.where(real, G, NEG)
        M = _cummax_sub(G + rd_ext * jrows, WP)
        E = _shift_down(M, NEG) - rd_open - rd_ext * (jrows - 1)
        Hn = jnp.maximum(G, E)
        Hn = jnp.where(jrows == 0, col0, Hn)
        # 5' soft clip: restart after clipping read[0:i+1]
        clip5 = -scp_ref[pl.ds(i + 1, 1), :]                   # (1, TC)
        Hn = jnp.maximum(Hn, clip5)
        Hn = jnp.where(real, Hn, NEG)
        Fn = jnp.where(jrows == 0, col0, Fn)
        Fn = jnp.where(real, Fn, NEG)
        act = i < rdl                                           # (1, TC)
        Hn = jnp.where(act, Hn, H)
        Fn = jnp.where(act, Fn, F)
        # 3' soft clip: end alignment at read position i+1
        tail = scp_tot + clip5          # = scp_tot - scp[i+1]
        bn = jnp.maximum(best, Hn.max(axis=0, keepdims=True) - tail)
        return Hn, Fn, bn

    H, F, best = lax.fori_loop(0, L, row, (H, F, best))
    out_ref[...] = jnp.maximum(best, H.max(axis=0, keepdims=True))


@functools.partial(
    jax.jit, static_argnames=("match_bonus", "n_pen", "rd_open", "rd_ext",
                              "rf_open", "rf_ext", "interpret"))
def dp_score_pallas(rd, pen, rdlens, ref, scp_cum, *, match_bonus, n_pen,
                    rd_open, rd_ext, rf_open, rf_ext, interpret=False):
    """Batched DP scores. rd (C, L) codes, pen (C, L) per-position
    mismatch penalties (qual-scaled, precomputed), rdlens (C,),
    ref (C, W) codes, scp_cum (C, L+1) cumulative soft-clip penalties
    (scp_cum[:, j] = clip cost of rd[0:j)). Returns (C,) int32 scores.
    Scoring constants are static (one compile per scoring config).
    """
    from jax.experimental import pallas as pl

    C, L = rd.shape
    W = ref.shape[1]
    WP = -(-(W + 1) // 8) * 8
    TC = min(_TC, max(128, -(-C // 128) * 128))
    Cp = -(-C // TC) * TC
    padc = Cp - C

    def padt(x, fill):
        # transpose to (rows, C) and pad the lane axis
        return jnp.pad(x.T.astype(jnp.int32), ((0, 0), (0, padc)),
                       constant_values=fill)

    rd_t = padt(rd, 4)                                   # (L, Cp)
    pen_t = padt(pen, 0)
    # row j holds ref char j-1 (DP row j consumes ref[j-1])
    ref_t = jnp.pad(ref.T.astype(jnp.int32),
                    ((1, WP - W - 1), (0, padc)), constant_values=4)
    scp_t = padt(scp_cum, 0)                             # (L+1, Cp)
    len_t = jnp.pad(rdlens.astype(jnp.int32), (0, padc))[None, :]

    kern = functools.partial(
        _dp_kernel, L=L, W=W, WP=WP, match_bonus=match_bonus, n_pen=n_pen,
        rd_open=rd_open, rd_ext=rd_ext, rf_open=rf_open, rf_ext=rf_ext)
    out = pl.pallas_call(
        kern,
        grid=(Cp // TC,),
        in_specs=[
            pl.BlockSpec((L, TC), lambda i: (0, i)),
            pl.BlockSpec((L, TC), lambda i: (0, i)),
            pl.BlockSpec((WP, TC), lambda i: (0, i)),
            pl.BlockSpec((L + 1, TC), lambda i: (0, i)),
            pl.BlockSpec((1, TC), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((1, TC), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, Cp), jnp.int32),
        interpret=interpret,
    )(rd_t, pen_t, ref_t, scp_t, len_t)
    return out[0, :C]
