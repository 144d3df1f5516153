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
    callers mask with their own validity bits."""
    m = idx["ccount"][4]
    return idx["sa"][jnp.clip(rows, 0, m - 1)]


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
