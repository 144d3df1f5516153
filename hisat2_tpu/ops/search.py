"""Batched FM backward search: exact intervals + maximal partial hits.

Equivalent role to the reference's HI_Aligner::partialSearch
(hi_aligner.h:6361-6420): walk each read right-to-left through the index via
LF steps, emitting maximal exact-match segments (BWTHit, hi_aligner.h:107)
that partition the read; each segment carries the SA interval of its final
(longest) match. The ftab seeds the first k characters in one lookup
(gfm.h _ftab, MANUAL.markdown:2023-2030).

TPU design: one fixed-trip fori_loop over read positions, all reads advancing
in lockstep as a masked wavefront; dead lanes (consumed reads) ride along.
Hits land in fixed-size per-read buffers via drop-mode scatters. No
data-dependent shapes anywhere, so the whole thing jits once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from . import rank as _rank

MAX_HITS = 16  # per-read segment buffer (100bp reads rarely exceed ~6)


def exact_interval(idx: dict, seqs: jax.Array, lens: jax.Array
                   ) -> tuple[jax.Array, jax.Array]:
    """SA interval of each full read (exact match), batched.

    seqs: (B, L) int codes 0..4 (N kills the interval); lens: (B,).
    Returns (top, bot) int32 (B,); empty match iff bot <= top.
    """
    B, L = seqs.shape
    m = idx["ccount"][4]
    seqs = seqs.astype(jnp.int32)
    lens = lens.astype(jnp.int32)

    def body(j, tb):
        top, bot = tb
        pos = lens - 1 - j
        active = (j < lens) & (bot > top)
        c = seqs[jnp.arange(B), jnp.clip(pos, 0, L - 1)]
        cc = jnp.minimum(c, 3)
        ntop, nbot = _rank.lf_step_interval(idx, top, bot, cc)
        dead = c >= 4
        ntop = jnp.where(dead, 1, ntop)
        nbot = jnp.where(dead, 0, nbot)
        return (jnp.where(active, ntop, top), jnp.where(active, nbot, bot))

    top0 = jnp.zeros(B, jnp.int32)
    bot0 = jnp.full(B, m, jnp.int32)
    return lax.fori_loop(0, L, body, (top0, bot0))


def _partial_search_one(idx: dict, seq: jax.Array, length: jax.Array,
                        max_hits: int):
    """Maximal-segment search for one read (vmapped over the batch).

    Returns per-hit arrays of shape (max_hits,):
      h_top/h_bot — SA interval of the segment's full match
      h_off       — leftmost read offset of the segment
      h_len       — segment length
    and n_hits (scalar). Segments partition [0, length) right-to-left,
    skipping N positions, mirroring ReadBWTHit (hi_aligner.h:215): on an
    extension failure the failing base starts the next segment.
    """
    L = seq.shape[0]
    m = idx["ccount"][4]
    seq = seq.astype(jnp.int32)

    h_top = jnp.zeros(max_hits, jnp.int32)
    h_bot = jnp.zeros(max_hits, jnp.int32)
    h_off = jnp.zeros(max_hits, jnp.int32)
    h_len = jnp.zeros(max_hits, jnp.int32)

    def record(bufs, nh, top, bot, pos, end, do):
        """Store segment [pos+1, end] with interval [top,bot) if do."""
        ht, hb, ho, hl = bufs
        slot = jnp.where(do, nh, max_hits)
        ht = ht.at[slot].set(top, mode="drop")
        hb = hb.at[slot].set(bot, mode="drop")
        ho = ho.at[slot].set(pos + 1, mode="drop")
        hl = hl.at[slot].set(end - pos, mode="drop")
        return (ht, hb, ho, hl), nh + do.astype(jnp.int32)

    def body(j, st):
        top, bot, end, nh, bufs = st
        pos = length - 1 - j
        active = j < length
        c = seq[jnp.clip(pos, 0, L - 1)]
        isn = c >= 4
        cc = jnp.minimum(c, 3)
        ntop, nbot = _rank.lf_step_interval(idx, top, bot, cc)
        fail = isn | (nbot <= ntop)
        have = end > pos  # current segment is non-empty
        rec = active & fail & have
        bufs, nh = record(bufs, nh, top, bot, pos, end, rec)
        # restart: non-N failing base is consumed against the full interval
        rtop = jnp.where(isn, jnp.int32(0), idx["ccount"][cc])
        rbot = jnp.where(isn, m, idx["ccount"][cc + 1])
        top2 = jnp.where(fail, rtop, ntop)
        bot2 = jnp.where(fail, rbot, nbot)
        end2 = jnp.where(fail, jnp.where(isn, pos - 1, pos), end)
        # pathological: base absent from genome entirely
        gone = bot2 <= top2
        top2 = jnp.where(gone, 0, top2)
        bot2 = jnp.where(gone, m, bot2)
        end2 = jnp.where(gone, pos - 1, end2)
        top = jnp.where(active, top2, top)
        bot = jnp.where(active, bot2, bot)
        end = jnp.where(active, end2, end)
        return top, bot, end, nh, bufs

    st0 = (jnp.int32(0), m.astype(jnp.int32), length.astype(jnp.int32) - 1,
           jnp.int32(0), (h_top, h_bot, h_off, h_len))
    top, bot, end, nh, bufs = lax.fori_loop(0, L, body, st0)
    # final segment covers [0, end]
    bufs, nh = record(bufs, nh, top, bot, jnp.int32(-1), end,
                      (end >= 0) & (bot > top))
    h_top, h_bot, h_off, h_len = bufs
    return h_top, h_bot, h_off, h_len, nh


@partial(jax.jit, static_argnames=("max_hits",))
def partial_search(idx: dict, seqs: jax.Array, lens: jax.Array,
                   max_hits: int = MAX_HITS):
    """Batched maximal-segment search. seqs (B, L), lens (B,).

    Returns dict of (B, max_hits) arrays top/bot/off/len + (B,) n_hits.
    """
    f = jax.vmap(lambda s, l: _partial_search_one(idx, s, l, max_hits),
                 in_axes=(0, 0))
    h_top, h_bot, h_off, h_len, nh = f(seqs, lens.astype(jnp.int32))
    return dict(top=h_top, bot=h_bot, off=h_off, len=h_len, n=nh)


from .rank import gather_slices


@partial(jax.jit, static_argnames=("n_seeds", "locs_per_seg", "stride"))
def table_lookup(idx: dict, seqs: jax.Array, lens: jax.Array,
                 n_seeds: int = 8, locs_per_seg: int = 8,
                 stride: int = 0):
    """Seed via the direct-address k-mer table (index/seed_table.py).

    Replaces seed_search + expand_range (the reference's partialSearch +
    GroupWalk chain) with TWO dependent gather rounds: bucket bounds at the
    seed's kmer code, then one contiguous position slice per seed. Seed
    kmer codes for EVERY read offset are computed in-register by kt
    shifted multiply-adds (no gather), then the n_seeds stride offsets are
    selected along the (small, static) read axis.

    stride > 0: fixed-stride offsets (0, stride, 2*stride, ...) for the
    dense/sensitive pass; stride == 0: n_seeds offsets spread evenly over
    [0, len - kt].

    Returns dict: locs (R, S, locs_per_seg) int32 kmer-start positions,
    lvalid (same shape) bool, off (R, S) int32 read offsets, and
    exhausted (R,) bool — True when no bucket overflowed locs_per_seg.
    """
    R, L = seqs.shape
    # kt from the (static) table shape: |st_starts| = 4^kt + 1. (idx dict
    # values are traced under jit, so the int in the dict can't be used.)
    import math
    kt = round(math.log(idx["st_starts"].shape[0] - 1, 4))
    lens = lens.astype(jnp.int32)
    c = jnp.minimum(seqs.astype(jnp.int32), 3)
    isn = (seqs >= 4).astype(jnp.int32)
    # rolling kt-mer codes for every read offset, with an N-in-window
    # flag riding bit 28 (codes < 4^13 = 2^26): ONE take_along_axis
    # element gather instead of two — element gathers run at issue rate
    # and were two of the top-five ops in the dispatch profile
    NB = jnp.int32(1 << 28)
    codes = jnp.zeros((R, L), jnp.int32)
    nn = jnp.zeros((R, L), jnp.bool_)
    isn_b = isn > 0
    for j in range(kt):
        w = 4 ** (kt - 1 - j)
        if j == 0:
            codes = codes + c * w
            nn = nn | isn_b
        else:
            codes = codes + jnp.pad(c[:, j:], ((0, 0), (0, j))) * w
            nn = nn | jnp.pad(isn_b[:, j:], ((0, 0), (0, j)))
    codes = codes + nn.astype(jnp.int32) * NB
    nbuckets0 = idx["st_starts"].shape[0] - 1
    pair_mode = idx["st_pos_rows"].size / max(nbuckets0, 1) > 3.0
    # stride-sampled table (fm_index.st_stride; the value rides the
    # marker array's STATIC shape): only positions % St == 0 are stored,
    # so seed offsets jitter over the residues — a read on diagonal d
    # finds seed o iff (d + o) % St == 0, and covering all residues
    # keeps every diagonal reachable with ~n_seeds/St effective seeds
    St = idx["st_stride_m"].shape[0] if "st_stride_m" in idx else 1
    kt2 = kt if St == 1 else -(-kt // St) * St   # 2nd kmer offset, % St == 0
    span = jnp.maximum(lens - (kt + kt2 if pair_mode else kt), 0)
    s_ix = jnp.arange(n_seeds, dtype=jnp.int32)
    if stride > 0:
        offs = jnp.minimum(s_ix[None, :] * stride, span[:, None])
    else:
        offs = (s_ix[None, :] * span[:, None]) // max(n_seeds - 1, 1)
    if St > 1:
        # force o_k ≡ k (mod St): ANY St consecutive seeds then cover
        # every residue, so even a short exon touched by only the first
        # few seeds keeps all its diagonals reachable (plain +k%St keeps
        # the base offsets' own residues, which can alias for the first
        # seeds of a read and lose short-near-exon junction diagonals)
        offs = jnp.minimum(offs + (s_ix[None, :] - offs) % St,
                           span[:, None])
    csel = jnp.take_along_axis(codes, offs, 1)              # (R, S)
    n_sel = csel >= NB
    code_sel = csel & (NB - 1)
    if "st_pairs" in idx:
        # (4^kt, 2) [start, end] pair rows: ONE row gather replaces two
        # element gathers (start and end lived in separate kernels)
        s01 = idx["st_pairs"][code_sel]                     # (R, S, 2)
        s0, s1 = s01[..., 0], s01[..., 1]
    else:
        s0 = idx["st_starts"][code_sel]
        s1 = idx["st_starts"][code_sel + 1]
    cnt = s1 - s0

    # bucket load decides the mode statically: Gbp-scale shards overflow
    # kt<=13 buckets (load ~n/4^kt), so seeds become TWO consecutive
    # kt-mers whose position lists intersect on the same diagonal — a
    # 2kt-bp effective seed with the same two-gather-round structure
    if pair_mode:
        SLOT = min(48, idx["st_pos_rows"].shape[1] * 2 - 31)
        usable = (lens >= kt + kt2)[:, None] & ~n_sel
        csel2 = jnp.take_along_axis(codes, jnp.minimum(offs + kt2, L - 1), 1)
        n2 = csel2 >= NB
        code2 = csel2 & (NB - 1)
        usable &= ~n2 & (offs + kt + kt2 <= lens[:, None])
        if "st_pairs" in idx:
            t01 = idx["st_pairs"][code2]
            t0, t1 = t01[..., 0], t01[..., 1]
        else:
            t0 = idx["st_starts"][code2]
            t1 = idx["st_starts"][code2 + 1]
        cntB = t1 - t0
        A = gather_slices(idx["st_pos_rows"], s0, SLOT)      # (R, S, SLOT)
        Bp = gather_slices(idx["st_pos_rows"], t0, SLOT) - kt2
        ia = jnp.arange(SLOT, dtype=jnp.int32)
        va = ia[None, None, :] < cnt[..., None]
        vb = ia[None, None, :] < cntB[..., None]
        hit = ((A[..., :, None] == Bp[..., None, :])
               & va[..., :, None] & vb[..., None, :]).any(-1)  # (R,S,SLOT)
        key = jnp.where(hit, ia[None, None, :], jnp.int32(1 << 20))
        sel = jnp.sort(key, axis=-1)[..., :locs_per_seg]
        lvalid = (sel < (1 << 20)) & usable[..., None]
        locs = jnp.take_along_axis(A, jnp.minimum(sel, SLOT - 1), axis=-1)
        exhausted = jnp.all(
            jnp.where(usable, (cnt <= SLOT) & (cntB <= SLOT), True), axis=1)
        return dict(locs=locs, lvalid=lvalid, off=offs, exhausted=exhausted)

    usable = (lens >= kt)[:, None] & ~n_sel
    locs = gather_slices(idx["st_pos_rows"], s0, locs_per_seg)  # (R, S, locs)
    lvalid = (jnp.arange(locs_per_seg, dtype=jnp.int32)[None, None, :]
              < cnt[..., None]) & usable[..., None]
    exhausted = jnp.all(jnp.where(usable, cnt <= locs_per_seg, True), axis=1)
    return dict(locs=locs, lvalid=lvalid, off=offs, exhausted=exhausted)


@partial(jax.jit, static_argnames=("seed_len", "n_seeds", "ftab_k"))
def seed_search(idx: dict, seqs: jax.Array, lens: jax.Array,
                seed_len: int = 22, n_seeds: int = 8, ftab_k: int = 10):
    """Fixed-length stride-seed search (the reference's *multiseed* policy,
    SEED=0,22 IVAL presets — vs partial_search's maximal segments).

    TPU rationale: backward search is sequential in pattern length, and
    the wavefront's wall-clock is dominated by that dependency chain. With
    n_seeds fixed 22bp seeds per read, every (read, seed) lane is
    independent, the first ftab_k characters resolve in ONE ftab gather
    (gfm.h _ftab role), and only seed_len - ftab_k LF steps remain —
    ~12 sequential rank rounds instead of ~100.

    seqs (B, L) codes, lens (B,). Returns dict of (B, n_seeds) arrays
    top/bot/off/len + n (B,) — same contract as partial_search so the
    candidate stage is agnostic to the seeder.
    """
    B, L = seqs.shape
    k = ftab_k
    seqs = seqs.astype(jnp.int32)
    lens = lens.astype(jnp.int32)

    # seed offsets: evenly spread over [0, len - seed_len]
    s_ix = jnp.arange(n_seeds, dtype=jnp.int32)
    span = jnp.maximum(lens - seed_len, 0)
    offs = jnp.where(
        n_seeds > 1,
        (s_ix[None, :] * span[:, None]) // max(n_seeds - 1, 1),
        jnp.zeros((B, n_seeds), jnp.int32))                      # (B, S)
    usable = (lens >= seed_len)[:, None]   # every slot once the read fits

    # gather the seed characters: (B, S, seed_len)
    pos = offs[:, :, None] + jnp.arange(seed_len, dtype=jnp.int32)
    ch = jnp.take_along_axis(seqs[:, None, :].repeat(n_seeds, 1),
                             jnp.clip(pos, 0, L - 1), axis=2)
    has_n = (ch >= 4).any(axis=2)
    ch = jnp.minimum(ch, 3)

    # ftab jump on the seed's LAST k characters (backward search starts
    # from the pattern suffix)
    tailk = ch[:, :, seed_len - k:]
    weights = 4 ** jnp.arange(k - 1, -1, -1, dtype=jnp.int32)
    code = (tailk * weights[None, None, :]).sum(axis=2)
    tb = idx["ftab"][code]                                       # (B, S, 2)
    top, bot = tb[..., 0], tb[..., 1]

    def body(j, st):
        top, bot = st
        c = ch[:, :, seed_len - k - 1 - j]
        ntop, nbot = _rank.lf_step_interval(idx, top, bot, c)
        alive = bot > top
        return (jnp.where(alive, ntop, top), jnp.where(alive, nbot, bot))

    top, bot = lax.fori_loop(0, seed_len - k, body, (top, bot))
    dead = has_n | ~usable
    top = jnp.where(dead, 1, top)
    bot = jnp.where(dead, 0, bot)
    return dict(top=top, bot=bot, off=offs,
                len=jnp.where(dead, 0, seed_len).astype(jnp.int32),
                n=jnp.full(B, n_seeds, jnp.int32))
