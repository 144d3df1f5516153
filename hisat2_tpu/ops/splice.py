"""Batched splice-junction stitching kernel.

Equivalent role to the reference's SplicedAligner::hybridSearch_recur
(spliced_aligner.h:331) + SpliceSiteDB signal checks (splice_site.cpp
donor/acceptor scoring): given a candidate *pair* of exon diagonals
(posA upstream, posB downstream, intron = posB - posA), find the read
offset where the alignment switches diagonals, maximizing per-position
match score + splice-motif bonus, under the reference's anchor/penalty
policy (tp.h: min anchor 7 canonical / 14 non-canonical; canonical
GT..AG penalty 0, non-canonical 12; intron-length penalty G,-8,1 —
hisat2.cpp:493-497).

TPU design: one lane per (read, diagonal-pair); the junction offset
search is a closed-form argmax over prefix/suffix score sums — no
recursion, no per-lane control flow. The reference walks local FM indexes
per thread; here every pair is three window fetches + cumsums.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from . import rank as _rank
from ..align.scoring import mm_pen_of as _mm_pen_of, sc_pen_of as _sc_pen_of

NEG = -(1 << 28)

CANON_PEN = 0
NONCANON_PEN = 12
MIN_ANCHOR_CANON = 7
MIN_ANCHOR_NONCANON = 14


def _intron_len_pen(delta):
    """G,-8,1 intron-length penalty: max(0, -8 + ln(len))."""
    return jnp.maximum(0, (-8.0 + jnp.log(delta.astype(jnp.float32)))
                       ).astype(jnp.int32)


@jax.jit
def junction_score(idx: dict, sctab: dict,
                   rd: jax.Array, q: jax.Array, rdlens: jax.Array,
                   posA: jax.Array, posB: jax.Array,
                   known_left: jax.Array, known_right: jax.Array):
    """Score the best junction for each (read, diagonal-pair) lane.

    rd (C, L) codes in alignment orientation; q (C, L); rdlens (C,);
    posA/posB (C,) joined positions of the two exon diagonals
    (posB > posA); known_left/known_right: known splice sites sorted
    lexicographically by (left, right), possibly empty.

    Returns dict with per-lane:
      score   — total alignment score (mismatches + splice penalties)
      j       — junction read offset (read[0:j] on A, read[j:] on B)
      strand  — 1 '+', 2 '-', 0 none
      canon   — motif class: 2 canonical, 1 known, 0 non-canonical
    """
    C, L = rd.shape
    rd = rd.astype(jnp.int32)
    q = jnp.clip(q.astype(jnp.int32), 0, 63)
    rdlens = rdlens.astype(jnp.int32)
    delta = posB - posA

    # windows widened to cover the splice-signal model's 9bp donor /
    # 15bp acceptor contexts on either strand (align/splice_model.py)
    winA = _rank.text_window(idx, posA, L + 16)     # text[posA + k]
    winB_ext = _rank.text_window(idx, posB - 16, L + 18)  # text[posB-16+k]
    winB = winB_ext[:, 16:16 + L]                   # aligned to read offsets

    ar = jnp.arange(L, dtype=jnp.int32)[None, :]
    in_read = ar < rdlens[:, None]

    def pos_scores(win, ov):
        isn = ((rd >= 4) | (win >= 4)) & in_read
        mm = (rd != win) & ~isn & in_read
        if ov is not None:   # graph mode: known alt alleles are free
            mm = mm & ~((ov == rd + 1) | (ov == 15))
        s = -jnp.where(mm, _mm_pen_of(sctab, q), 0) \
            - jnp.where(isn, sctab["n_pen"], 0) \
            + jnp.where(~mm & ~isn & in_read, sctab["match_bonus"], 0)
        return s

    if "snv_packed" in idx:
        ovA = _rank.nib4_window(idx, posA, L)
        ovB = _rank.nib4_window(idx, posB, L)
    else:
        ovA = ovB = None
    sA = pos_scores(winA[:, :L], ovA)
    sB = pos_scores(winB, ovB)
    # clip-aware prefix/suffix (reference allows soft clips at the outer
    # read ends of a spliced alignment too, e.g. 1S98M200N1M):
    #   prefix[j] = max_{c5<=j} sum sA[c5:j] - SCP[c5]  (cummin trick)
    #   suffix[j] = max_{e>=j}  sum sB[j:e]  - (SCP[L]-SCP[e])
    scp = jnp.where(in_read, _sc_pen_of(sctab, q), 0)
    SCP = jnp.concatenate(
        [jnp.zeros((C, 1), jnp.int32), jnp.cumsum(scp, axis=1)], axis=1)
    A = jnp.concatenate(
        [jnp.zeros((C, 1), jnp.int32), jnp.cumsum(sA, axis=1)], axis=1)
    prefix = A - lax.cummin(A + SCP, axis=1)
    SB = jnp.concatenate(
        [jnp.zeros((C, 1), jnp.int32), jnp.cumsum(sB, axis=1)], axis=1)
    sufsum = SB[:, -1:] - SB                          # sum sB[j:]
    tailclip = SCP[:, -1:] - SCP
    # max over e>=j of (sufsum[j]-sufsum[e]) - tailclip[e]
    suffix = sufsum - lax.cummin((sufsum + tailclip)[:, ::-1], axis=1)[:, ::-1]
    base = prefix + suffix                           # (C, L+1), junction at j

    jcol = jnp.arange(L + 1, dtype=jnp.int32)[None, :]
    # splice motifs at junction j: intron = [posA+j, posB+j)
    don1 = jnp.take_along_axis(winA, jnp.minimum(jcol, L + 15), axis=1)
    don2 = jnp.take_along_axis(winA, jnp.minimum(jcol + 1, L + 15), axis=1)
    acc1 = jnp.take_along_axis(winB_ext, jnp.minimum(jcol + 14, L + 17),
                               axis=1)
    acc2 = jnp.take_along_axis(winB_ext, jnp.minimum(jcol + 15, L + 17),
                               axis=1)
    # + strand: GT...AG;  - strand: CT...AC  (G=2,T=3,A=0,C=1)
    plus = (don1 == 2) & (don2 == 3) & (acc1 == 0) & (acc2 == 2)
    minus = (don1 == 1) & (don2 == 3) & (acc1 == 0) & (acc2 == 1)
    canonical = plus | minus

    # known splice sites: (left, right) = (posA+j-1, posB+j); lower-bound
    # by left then probe a few successive entries (duplicate lefts)
    if known_left.shape[0] > 0:
        left = posA[:, None] + jcol - 1
        right = posB[:, None] + jcol
        ki = jnp.searchsorted(known_left, left)
        known = jnp.zeros(left.shape, bool)
        for dpr in range(4):
            kk = jnp.clip(ki + dpr, 0, known_left.shape[0] - 1)
            known |= (known_left[kk] == left) & (known_right[kk] == right)
    else:
        known = jnp.zeros_like(canonical)

    ilp = _intron_len_pen(delta)[:, None]
    pen_canon = ilp + CANON_PEN
    pen_non = ilp + NONCANON_PEN

    anchor_ok = lambda a: (jcol >= a) & (jcol <= rdlens[:, None] - a)
    cand_known = jnp.where(known & anchor_ok(1), base - ilp, NEG)
    cand_canon = jnp.where(canonical & anchor_ok(MIN_ANCHOR_CANON),
                           base - pen_canon, NEG)
    cand_non = jnp.where(anchor_ok(MIN_ANCHOR_NONCANON), base - pen_non, NEG)
    allc = jnp.maximum(jnp.maximum(cand_known, cand_canon), cand_non)

    best_j = jnp.argmax(allc, axis=1).astype(jnp.int32)
    best = jnp.take_along_axis(allc, best_j[:, None], axis=1)[:, 0]
    bknown = jnp.take_along_axis(known, best_j[:, None], axis=1)[:, 0]
    bcanon = jnp.take_along_axis(canonical, best_j[:, None], axis=1)[:, 0]
    bplus = jnp.take_along_axis(plus, best_j[:, None], axis=1)[:, 0]
    # lanes with invalid deltas are dead
    ok = (delta >= 20) & (best > NEG // 2)
    strand = jnp.where(bplus | (bknown & ~bcanon), 1, 2)

    # per-side mismatch counts at the chosen junction (anchor purity
    # feeds the reference's shorter_anchor/intron-length acceptance,
    # hi_aligner.h:3753-3767)
    mmA = ((rd != winA[:, :L]) | (rd >= 4) | (winA[:, :L] >= 4)) & in_read
    mmB = ((rd != winB) | (rd >= 4) | (winB >= 4)) & in_read
    MA = jnp.concatenate([jnp.zeros((C, 1), jnp.int32),
                          jnp.cumsum(mmA.astype(jnp.int32), axis=1)], axis=1)
    MB = jnp.concatenate([jnp.zeros((C, 1), jnp.int32),
                          jnp.cumsum(mmB.astype(jnp.int32), axis=1)], axis=1)
    mmL = jnp.take_along_axis(MA, best_j[:, None], 1)[:, 0]
    mmR = (jnp.take_along_axis(MB, rdlens[:, None], 1)
           - jnp.take_along_axis(MB, best_j[:, None], 1))[:, 0]

    # splice-signal probscore at the chosen junction (splice_model PWM;
    # '-' junctions score the reverse-complemented windows)
    from ..align import splice_model as _sm
    dlo = jnp.asarray(_sm.DONOR_LOGODDS)     # (4, 9)
    alo = jnp.asarray(_sm.ACCEPTOR_LOGODDS)  # (4, 15)
    md = jnp.arange(_sm.DONOR_LEN, dtype=jnp.int32)[None, :]
    ma = jnp.arange(_sm.ACCEPTOR_LEN, dtype=jnp.int32)[None, :]
    j1 = best_j[:, None]
    dp_idx = jnp.clip(j1 - 3 + md, 0, L + 15)            # winA, + strand
    ap_idx = jnp.clip(2 + j1 + ma, 0, L + 17)            # winB_ext, +
    dm_idx = jnp.clip(18 + j1 - md, 0, L + 17)           # winB_ext, -
    am_idx = jnp.clip(j1 + 13 - ma, 0, L + 15)           # winA, -
    # N bases: reference maps base>3 -> 0 BEFORE any complement
    # (hi_aligner.h:1672 `if(base > 3) base = 0`)
    fixn = lambda w: jnp.where(w > 3, 0, w)
    dplus = fixn(jnp.take_along_axis(winA, dp_idx, 1))
    aplus = fixn(jnp.take_along_axis(winB_ext, ap_idx, 1))
    dmin = 3 - fixn(jnp.take_along_axis(winB_ext, dm_idx, 1))
    amin = 3 - fixn(jnp.take_along_axis(winA, am_idx, 1))
    use_plus = bplus[:, None]
    dwin = jnp.where(use_plus, dplus, dmin)
    awin = jnp.where(use_plus, aplus, amin)
    s_sig = jnp.zeros((C,), jnp.float32)
    for b in range(4):
        s_sig = s_sig + jnp.where(dwin == b, dlo[b][None, :], 0.0).sum(1)
        s_sig = s_sig + jnp.where(awin == b, alo[b][None, :], 0.0).sum(1)
    pscore = 1.0 / (1.0 + jnp.exp(-s_sig))

    return dict(
        score=jnp.where(ok, best, NEG),
        j=best_j,
        strand=jnp.where(ok, strand, 0).astype(jnp.int32),
        canon=jnp.where(bknown, 1, jnp.where(bcanon, 2, 0)).astype(jnp.int32),
        probscore=pscore,
        mmL=mmL.astype(jnp.int32),
        mmR=mmR.astype(jnp.int32),
    )


@jax.jit
def junction_score_packed(idx: dict, sctab: dict, rd, q, rdlens,
                          posA, posB, known_left, known_right):
    """junction_score with the seven per-lane outputs packed into ONE
    (C, 7) int32 tensor (probscore float32 bit-cast into column 4) — a
    single device->host fetch instead of seven tunnel syncs."""
    r = junction_score(idx, sctab, rd, q, rdlens, posA, posB,
                       known_left, known_right)
    return jnp.stack(
        [r["score"], r["j"], r["strand"], r["canon"],
         lax.bitcast_convert_type(r["probscore"], jnp.int32),
         r["mmL"], r["mmR"]], axis=1)
