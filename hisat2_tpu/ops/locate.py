"""SA-row -> joined-text-offset resolution.

Equivalent role to the reference's GroupWalk2S (group_walk.h:1411) +
joinedToTextOff (gfm.h:5527). The reference walks rows left via LF until a
sampled row is hit (offrate 4/16); our round-1 index stores the full SA
(offrate-0 equivalent — the small-example index in evaluation/tests uses
--offrate 0 too), so resolution is one gather. A sampled-SA walk-left kernel
is the planned memory optimization for Gbp genomes; walk_left below is its
building block and is used by inspect (reconstruct text from the index).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from . import rank as _rank


def locate_rows(idx: dict, rows: jax.Array) -> jax.Array:
    """SA values for row indices (any shape). Rows out of range are clipped —
    callers mask with their own validity bits.

    Full-SA indexes gather directly; sampled-SA indexes (--offrate k,
    reference walkLeft gfm.h:5658 + _offs semantics) LF-walk each row to
    the nearest marked row (<= 2^k - 1 fixed steps, masked) and add the
    walked distance."""
    m = idx["ccount"][4]
    rows = jnp.clip(rows, 0, m - 1)
    if "samp_bits" not in idx:
        return idx["sa"][rows]
    ival = idx["samp_ival"]          # python int (static under jit)

    def marked(r):
        w = idx["samp_bits"][r >> 5]
        return ((w >> (r & 31).astype(jnp.uint32)) & 1) == 1

    def body(_, st):
        r, steps = st
        done = marked(r)
        c = _rank.bwt_char(idx, r)
        nr = _rank.lf(idx, r, c)
        return (jnp.where(done, r, nr),
                steps + jnp.where(done, 0, 1).astype(jnp.int32))

    r0 = rows.astype(jnp.int32)
    r, steps = lax.fori_loop(0, ival - 1, body,
                             (r0, jnp.zeros_like(r0)))
    # rank of marked row r among marked rows: checkpoint + in-block popcount
    blk = r >> 9
    base = idx["samp_rank"][blk]
    w0 = (blk << 4)                                     # 16 words per block
    wix = w0[..., None] + jnp.arange(16, dtype=jnp.int32)
    words = idx["samp_bits"][jnp.clip(wix, 0,
                                      idx["samp_bits"].shape[0] - 1)]
    within = r - (blk << 9)                             # bits before r
    nbits = jnp.clip(within[..., None] - 32 * jnp.arange(16, dtype=jnp.int32),
                     0, 32)
    mask = jnp.where(nbits >= 32, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << jnp.minimum(
                         nbits, 31).astype(jnp.uint32)) - 1)
    cnt = lax.population_count(words & mask).sum(axis=-1).astype(jnp.int32)
    srank = base + cnt
    return idx["samp_vals"][jnp.clip(srank, 0,
                                     idx["samp_vals"].shape[0] - 1)] + steps


def expand_range(idx: dict, top: jax.Array, bot: jax.Array, max_locs: int
                 ) -> tuple[jax.Array, jax.Array]:
    """First max_locs joined offsets of interval [top, bot).

    Returns (offsets (..., max_locs) int32, valid mask). Deterministic: rows
    taken in SA order.
    """
    rows = top[..., None] + jnp.arange(max_locs, dtype=jnp.int32)
    valid = rows < bot[..., None]
    return locate_rows(idx, rows), valid


def lf_walk_left(idx: dict, row: jax.Array, steps: int) -> jax.Array:
    """Apply LF `steps` times from each row (batched). Stops (stays) at the
    '$' row. Used by inspect to rebuild the text, and later by the sampled-SA
    locator (reference walkLeft, gfm.h:5658)."""
    def body(_, r):
        at_z = r == idx["zoff"]
        c = _rank.bwt_char(idx, r)
        nr = _rank.lf(idx, r, c)
        return jnp.where(at_z, r, nr)
    return lax.fori_loop(0, steps, body, row)
