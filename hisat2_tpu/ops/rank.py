"""Occ/rank and LF-mapping primitives over the 2-bit-packed BWT.

Equivalent role to the reference's countBt2Side/mapLF (gfm.h:2958,3681):
rank(c, i) = Occ checkpoint at i's 128-symbol block + popcount of symbol
matches in the block prefix. The reference uses POPCNT/LUTs per thread
(gfm.h:62-73, ccnt_lut.cpp); here every operation is batched over a read
wavefront: gathers fetch each lane's checkpoint row + 8 BWT words, and the
match-count is a handful of elementwise bit ops + lax.population_count on the
VPU.

All row indices are int32 (m < 2^31 — matches the reference's "small" .ht2
index; 64-bit rows are a follow-up for Gbp-scale graph indexes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..index.fm_index import OCC_BLOCK, WORDS_PER_BLOCK

_LOG2_BLOCK = OCC_BLOCK.bit_length() - 1      # 7
_M55 = jnp.uint32(0x55555555)
_WORD_SYMS = 16                                # 2-bit symbols per uint32


def count_eq_packed(words: jax.Array, c: jax.Array, nsym: jax.Array) -> jax.Array:
    """#symbols == c among the first nsym 2-bit symbols of each uint32 word.

    words uint32 [...]; c int in 0..3 broadcastable; nsym in [0, 16].
    """
    pattern = c.astype(jnp.uint32) * _M55
    x = words ^ pattern
    y = (x | (x >> jnp.uint32(1))) & _M55     # pair-low bit set iff mismatch
    match = (~y) & _M55                        # pair-low bit set iff match
    nbits = (2 * nsym).astype(jnp.uint32)
    mask = jnp.where(nbits >= 32, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << jnp.minimum(nbits, jnp.uint32(31))) - 1)
    return lax.population_count(match & mask).astype(jnp.int32)


def rank(idx: dict, c: jax.Array, i: jax.Array) -> jax.Array:
    """rank(c, i): #occurrences of symbol c in bwt[0:i).

    c, i: int32 arrays of identical shape. One 48-byte contiguous HBM
    gather per lane: the side row holds the block's 4 Occ checkpoints and
    its 8 BWT words (fm_index.device "sides" — the reference's cache-line
    side layout, gfm.h:2958, recast for HBM DMA efficiency). Corrects for
    the '$' row (stored as symbol 0 at zoff), mirroring _zOffs handling
    (gfm.h:2431).
    """
    c = c.astype(jnp.int32)
    i = i.astype(jnp.int32)
    sides = idx["sides"]
    nblocks = sides.shape[0]
    blk = jnp.minimum(i >> _LOG2_BLOCK, nblocks - 1)
    side = sides[blk]                                     # (..., 12)
    # 4-way select of the checkpoint (minor-axis gathers are slow on TPU)
    base = jnp.where(
        c == 0, side[..., 0],
        jnp.where(c == 1, side[..., 1],
                  jnp.where(c == 2, side[..., 2], side[..., 3]))
    ).astype(jnp.int32)
    within = i - (blk << _LOG2_BLOCK)                     # 0..128
    w = jnp.arange(WORDS_PER_BLOCK, dtype=jnp.int32)
    words = side[..., 4:]
    nsym = jnp.clip(within[..., None] - _WORD_SYMS * w, 0, _WORD_SYMS)
    cnt = count_eq_packed(words, c[..., None], nsym).sum(axis=-1)
    dollar_fix = ((c == 0) & (i > idx["zoff"])).astype(jnp.int32)
    return base + cnt - dollar_fix


def lf(idx: dict, i: jax.Array, c: jax.Array) -> jax.Array:
    """LF-mapping: row of T'[SA[i]-1] when bwt[i]==c; the backward-search step
    (reference mapLF, gfm.h:3681)."""
    return idx["ccount"][c] + rank(idx, c, i)


def lf_step_interval(idx: dict, top: jax.Array, bot: jax.Array,
                     c: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Extend an SA interval [top, bot) left by symbol c (c in 0..3).
    Both bounds rank in one fused gather batch (half the HBM round-trips
    of ranking top and bot separately)."""
    base = idx["ccount"][c]
    tb = jnp.stack([top, bot])
    r = rank(idx, jnp.broadcast_to(c, tb.shape), tb)
    return base + r[0], base + r[1]


def gather_slices(arr2d: jax.Array, starts: jax.Array, size: int,
                  starts2: jax.Array | None = None) -> jax.Array:
    """Contiguous (size,)-windows of a row-blocked 1-D array at per-lane
    element offsets.

    arr2d is the array viewed as (nrows, RW) with RW a power of two
    >= size (callers pre-reshape once at index build). Each window is
    fetched as TWO whole-row gathers (rows r, r+1) — plain major-axis
    gathers run at ~90M lanes/s on TPU while gathers with slice_sizes or
    vmapped dynamic_slice fall off the fast path — then aligned to the
    element offset with a log-step shift cascade on the VPU
    (`_shift_words`)."""
    RW = arr2d.shape[1]
    r = (starts // RW).astype(jnp.int32)
    w = jnp.concatenate([arr2d[r], arr2d[jnp.minimum(r + 1,
                                                     arr2d.shape[0] - 1)]],
                        axis=-1)
    return _shift_words(w, (starts % RW).astype(jnp.int32), size)


def gather_rows2(rows: jax.Array, r: jax.Array) -> jax.Array:
    """Rows r and r+1 of a 2-D array, concatenated -> (..., 2*W).
    Two plain gather lanes per query."""
    r = jnp.clip(r.astype(jnp.int32), 0, rows.shape[0] - 2)
    return jnp.concatenate([rows[r], rows[r + 1]], axis=-1)


def _shift_right_fill(x: jax.Array, sh: jax.Array, fill: int) -> jax.Array:
    """Per-lane RIGHT shift of the minor axis by sh (>= 0), filling with
    `fill` on the left — log-step selects, no gather. Used to honor
    negative window starts (chromosome-start windows pad with N instead
    of re-anchoring at 0)."""
    L = x.shape[-1]
    b = 1
    while b < L:
        shifted = jnp.concatenate(
            [jnp.full(x.shape[:-1] + (b,), fill, x.dtype), x[..., :-b]],
            axis=-1)
        x = jnp.where(((sh[..., None] >> (b.bit_length() - 1)) & 1) != 0,
                      shifted, x)
        b <<= 1
    return x


def _shift_words(w: jax.Array, ws: jax.Array, keep: int) -> jax.Array:
    """w (..., NW) uint32; per-lane left-shift of the word axis by ws
    (0 <= ws < NW), returning the first `keep` words — log-step static
    slicing instead of a per-element minor-axis gather."""
    NW = w.shape[-1]
    b = 1
    while b < NW:
        shifted = jnp.concatenate(
            [w[..., b:], jnp.zeros_like(w[..., :b])], axis=-1)
        w = jnp.where((ws[..., None] & b) != 0, shifted, w)
        b <<= 1
    return w[..., :keep]


def searchsorted_right(table: jax.Array, q: jax.Array,
                       cap: int = 128) -> jax.Array:
    """`jnp.searchsorted(table, q, side="right")` with a fast path for
    SMALL tables: jnp.searchsorted lowers to a while-loop binary search
    (log F sequential full passes over the query tensor — the while ops
    were the single largest line in the dispatch profile), while a
    broadcast compare-sum is ONE fused pass when F is small (fragment
    tables are one entry per chromosome fragment)."""
    F = table.shape[0]
    if F == 0:
        return jnp.zeros(q.shape, jnp.int32)
    if F <= cap:
        return (table <= q[..., None]).sum(axis=-1).astype(jnp.int32)
    return jnp.searchsorted(table, q, side="right").astype(jnp.int32)


def packed_char(packed: jax.Array, pos: jax.Array) -> jax.Array:
    """Symbol at position pos of a 2-bit packed array (BWT or text)."""
    word = packed[pos >> 4]
    shift = (2 * (pos & 15)).astype(jnp.uint32)
    return ((word >> shift) & jnp.uint32(3)).astype(jnp.int32)


def nib4_window(idx: dict, start: jax.Array, length: int) -> jax.Array:
    """SNV-overlay window: 4-bit nibbles over the primary text (graph
    index), same shift-aligned gather pattern as text_window. Positions
    outside [0, primary_n) come back 0 (no SNV)."""
    start = start.astype(jnp.int32)
    nw = (length + 7) // 8
    packed = idx["snv_packed"]
    if "snv_rows_ov" in idx and length <= 113:
        # padded by 128 leading zero chars (16 words) — see text_rows_ov
        rows = idx["snv_rows_ov"]
        q = jnp.clip(start, -128, None) + 128
        r = jnp.clip(q >> 7, 0, rows.shape[0] - 1)
        w32 = rows[r]                                       # (..., 32)
        base = q >> 3
        sh = (4 * (q & 7)).astype(jnp.uint32)
        words = _shift_words(w32, base & 15, nw + 1)
        fill_sh = None
    elif "snv_rows" in idx and length <= 256:
        cs = jnp.clip(start, 0, None)
        base = cs >> 3
        sh = (4 * (cs & 7)).astype(jnp.uint32)
        w64 = gather_rows2(idx["snv_rows"], cs >> 8)        # (..., 64)
        words = _shift_words(w64, base & 31, nw + 1)
        fill_sh = cs - start
    else:
        cs = jnp.clip(start, 0, None)
        base = cs >> 3
        sh = (4 * (cs & 7)).astype(jnp.uint32)
        widx = base[..., None] + jnp.arange(nw + 1, dtype=jnp.int32)
        words = packed[jnp.clip(widx, 0, packed.shape[0] - 1)]
        fill_sh = cs - start
    lo = words[..., :nw] >> sh[..., None]
    hi = jnp.where(sh[..., None] == 0, jnp.uint32(0),
                   words[..., 1:] << (jnp.uint32(32) - sh)[..., None])
    aligned = lo | hi
    shifts = (4 * jnp.arange(8, dtype=jnp.uint32))
    nibs = ((aligned[..., None] >> shifts) & jnp.uint32(15)).astype(jnp.int32)
    out = nibs.reshape(*nibs.shape[:-2], nw * 8)[..., :length]
    if fill_sh is not None:
        out = _shift_right_fill(out, fill_sh, 0)
    pos = start[..., None] + jnp.arange(length, dtype=jnp.int32)
    inb = (pos >= 0) & (pos < idx["primary_n"])
    return jnp.where(inb, out, 0)


def bwt_char(idx: dict, r: jax.Array) -> jax.Array:
    """BWT symbol at row r (callers must special-case r == zoff)."""
    return packed_char(idx["bwt_packed"], r)


def text_window(idx: dict, start: jax.Array, length: int) -> jax.Array:
    """Joined-text window [start, start+length) as int32 codes; positions
    outside [0, n) come back as 4 (N). start: (...,) int32; result (..., length).
    BitPairReference::getStretch equivalent (reference.h:108).

    HBM-friendly: for windows up to 256 chars (every aligner window), ONE
    gather lane fetches the two consecutive 16-word rows covering the
    window from a (nr, 16) row view of the packed text; word alignment is
    log-step shifting on the VPU (`_shift_words`). Larger windows fall
    back to a per-word gather.
    """
    start = start.astype(jnp.int32)
    nw = (length + 15) // 16
    packed = idx["text_packed"]
    if "text_rows_ov" in idx and length <= 128:
        # 50%-overlapping rows, PADDED by 128 leading zero chars: whole
        # window inside ONE row -> a single gather lane, and negative
        # starts (chromosome-start DP windows) align for free — padded
        # coordinate q = start + 128 is non-negative for every window
        # that overlaps the text (length <= 128), so no post-hoc
        # char-shift cascade is needed.
        rows = idx["text_rows_ov"]
        q = jnp.clip(start, -128, None) + 128
        r = jnp.clip(q >> 7, 0, rows.shape[0] - 1)
        w16 = rows[r]                                       # (..., 16)
        base = q >> 4
        sh = (2 * (q & 15)).astype(jnp.uint32)
        words = _shift_words(w16, base & 7, nw + 1)
        fill_sh = None
    elif "text_rows" in idx and length <= 256:
        cs = jnp.clip(start, 0, None)
        base = cs >> 4
        sh = (2 * (cs & 15)).astype(jnp.uint32)
        w32 = gather_rows2(idx["text_rows"], cs >> 8)       # (..., 32)
        words = _shift_words(w32, base & 15, nw + 1)
        fill_sh = cs - start
    else:
        cs = jnp.clip(start, 0, None)
        base = cs >> 4
        sh = (2 * (cs & 15)).astype(jnp.uint32)
        widx = base[..., None] + jnp.arange(nw + 1, dtype=jnp.int32)
        words = packed[jnp.clip(widx, 0, packed.shape[0] - 1)]  # (..., nw+1)
        fill_sh = cs - start
    # align to the window start entirely with per-lane shifts (no gather):
    # aligned[w] = words[w] >> sh | words[w+1] << (32-sh)
    lo = words[..., :nw] >> sh[..., None]
    hi_sh = (jnp.uint32(32) - sh)[..., None]
    hi = jnp.where(sh[..., None] == 0, jnp.uint32(0),
                   words[..., 1:] << hi_sh)
    aligned = lo | hi                                       # (..., nw)
    shifts = (2 * jnp.arange(16, dtype=jnp.uint32))
    chars = ((aligned[..., None] >> shifts) & jnp.uint32(3)).astype(jnp.int32)
    out = chars.reshape(*chars.shape[:-2], nw * 16)[..., :length]
    if fill_sh is not None:
        # negative starts on the non-padded views: content was anchored
        # at 0 — shift right so every in-bounds position holds ITS
        # character (advisor r1 finding)
        out = _shift_right_fill(out, fill_sh, 4)
    pos = start[..., None] + jnp.arange(length, dtype=jnp.int32)
    inb = (pos >= 0) & (pos < idx["n"])
    return jnp.where(inb, out, 4)
