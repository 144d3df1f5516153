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
    # splice motifs at junction j: intron = [posA+j, posB+j). The per-j
    # motif reads are STATIC slices of the fetched windows (a
    # take_along_axis here is a multi-million-lane gather — measured 4x
    # ~35ms/launch at 32K lanes)
    don1 = winA[:, 0:L + 1]
    don2 = winA[:, 1:L + 2]
    acc1 = winB_ext[:, 14:L + 15]
    acc2 = winB_ext[:, 15:L + 16]
    # + strand: GT...AG;  - strand: CT...AC  (G=2,T=3,A=0,C=1)
    plus = (don1 == 2) & (don2 == 3) & (acc1 == 0) & (acc2 == 2)
    minus = (don1 == 1) & (don2 == 3) & (acc1 == 0) & (acc2 == 1)
    canonical = plus | minus

    # known splice sites: (left, right) = (posA+j-1, posB+j) — ONE
    # searchsorted per LANE at posA, then probe the next 12 sites and
    # scatter their implied junction offsets into the (C, L+1) mask
    # (the per-(lane, j) searchsorted was a ~10M-lane gather ladder)
    if known_left.shape[0] > 0:
        base_l = jnp.searchsorted(known_left, posA)            # (C,)
        known = jnp.zeros((rd.shape[0], L + 1), bool)
        nk = known_left.shape[0]
        for dpr in range(12):
            kk = jnp.clip(base_l + dpr, 0, nk - 1)
            l_p = known_left[kk]
            r_p = known_right[kk]
            jv = (l_p - posA + 1).astype(jnp.int32)            # (C,)
            okp = (l_p < posA + L) & (r_p == posB + jv) \
                & (jv >= 0) & (jv <= L)
            known |= okp[:, None] & (jcol == jv[:, None])
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


def _max_intron_len_dev(anchor, min_anchor):
    """jnp port of splice_model.max_intron_len (hi_aligner.h:48)."""
    a = jnp.maximum(anchor, 2)
    shift = jnp.clip(2 * a - 4, 13, 30)
    return jnp.where(anchor >= min_anchor, jnp.int32(1) << shift, 0)


def _max_intron_len_noncan_dev(anchor, min_anchor=14):
    a = jnp.maximum(anchor, 5)
    shift = jnp.minimum(2 * a - 10, 30)
    return jnp.where(anchor >= min_anchor, jnp.int32(1) << shift, 0)


def _probscore_thresh_dev(il):
    """jnp port of splice_model.probscore_thresh (hi_aligner.h:3778-3784),
    including the 0.99 tier for introns >= 2^16."""
    t = jnp.full(il.shape, 0.8, jnp.float32)
    t = jnp.where(il >> 12 != 0, 0.88, t)
    t = jnp.where(il >> 13 != 0, 0.91, t)
    t = jnp.where(il >> 14 != 0, 0.94, t)
    t = jnp.where(il >> 15 != 0, 0.97, t)
    t = jnp.where(il >> 16 != 0, 0.99, t)
    return t


def _gate_pack(r, rdlens, posA, posB, minsc_i, minsc_s, max_intron,
               dta: bool):
    """Acceptance gates (hi_aligner.h:3753-3786) on a junction_score
    result dict -> (C, 3) int16 pack [score, j, flags], flags =
    strand | canon<<2 | accept<<4 | partial<<5."""
    score, j, strand, canon = r["score"], r["j"], r["strand"], r["canon"]
    delta = posB - posA
    min_sc = jnp.ceil(minsc_i + minsc_s
                      * rdlens.astype(jnp.float32)).astype(jnp.int32)
    alive = strand != 0
    below = score < min_sc
    part = alive & below & (canon != 0) & (score > NEG // 2)
    aL = j - 2 * r["mmL"]
    aR = rdlens - j - 2 * r["mmR"]
    shorter = jnp.maximum(jnp.minimum(aL, aR), 1)
    lim_c = _max_intron_len_dev(shorter, MIN_ANCHOR_CANON)
    lim_n = _max_intron_len_noncan_dev(shorter)
    ok = jnp.ones(score.shape, bool)
    is_can = canon == 2
    gate_c = lim_c < max_intron
    ok &= ~(is_can & gate_c & (delta > lim_c))
    ok &= ~(is_can & gate_c
            & (r["probscore"] < _probscore_thresh_dev(delta)))
    is_non = canon == 0
    ok &= ~(is_non & (lim_n < max_intron) & (delta > lim_n))
    if dta:
        anchor = jnp.minimum(j, rdlens - j)
        ok &= ~(is_can & (anchor < 14))
    accept = alive & ~below & ok
    flags = (strand | (canon << 2) | (accept.astype(jnp.int32) << 4)
             | (part.astype(jnp.int32) << 5))
    return jnp.stack(
        [jnp.clip(score, -32768, 32767), j, flags], axis=1
    ).astype(jnp.int16)


def _gather_oriented(seqs2, quals2, lens2, rows, lfw):
    """Per-lane alignment-orientation reads by ROW GATHER from the
    device-resident oriented batch (pipeline._with_revcomp layout:
    rows [0:B) forward, [B:2B) reverse-complement, tails padded with 4).
    Replaces the host-built (C, L) rd/q uploads — ~100MB/batch over the
    tunnel was the RNA path's dominant cost (r4 profile)."""
    B = seqs2.shape[0] // 2
    rowidx = rows + jnp.where(lfw, 0, B).astype(rows.dtype)
    rd = seqs2[rowidx]
    q = jnp.clip(quals2[rowidx], 0, 63)
    rl = lens2[rows]
    return rd, q, rl


@jax.jit
def junction_score_packed_rows(idx: dict, sctab: dict, seqs2, quals2,
                               lens2, rows, lfw, jstart, seglen,
                               posA, posB, known_left, known_right):
    """Second-pass junction scoring over RESIDUAL read segments
    [jstart, jstart+seglen), gathered+shifted on device: the
    (C, L) segment construction and upload move off the host."""
    from . import rank as _rank
    rd, q, _rl = _gather_oriented(seqs2, quals2, lens2, rows, lfw)
    C, L = rd.shape
    jstart = jstart.astype(jnp.int32)
    seglen = seglen.astype(jnp.int32)
    dbl = jnp.concatenate([rd, jnp.full((C, L), 4, rd.dtype)], axis=1)
    dblq = jnp.concatenate([q, jnp.zeros((C, L), q.dtype)], axis=1)
    rd2 = _rank._shift_words(dbl, jstart, L)
    q2 = _rank._shift_words(dblq, jstart, L)
    inseg = jnp.arange(L, dtype=jnp.int32)[None, :] < seglen[:, None]
    rd2 = jnp.where(inseg, rd2, 4)
    q2 = jnp.where(inseg, q2, 0)
    r = junction_score(idx, sctab, rd2, q2, seglen, posA, posB,
                       known_left, known_right)
    return jnp.stack(
        [r["score"], r["j"], r["strand"], r["canon"],
         lax.bitcast_convert_type(r["probscore"], jnp.int32),
         r["mmL"], r["mmR"]], axis=1)


@partial(jax.jit, static_argnames=("AB", "dta", "W", "NC", "tiles"))
def rescue_fused(idx: dict, sctab: dict, seqs2, quals2, lens2,
                 rows, lfw, posA, posB,            # seeded lanes (PB,)
                 srow, sfw, spos, slive,           # scan rows (SBk,)
                 known_left, known_right, minsc_i, minsc_s,
                 max_intron, min_intron, margin, AB: int,
                 dta: bool = False, W: int = 65536, NC: int = 4,
                 tiles: int = 1):
    """One-dispatch splice rescue: score+gate the seeded diagonal-pair
    lanes, then run the anchor scan ONLY for scan rows whose seeded lanes
    all failed acceptance (device top-k compaction to AB rows — in steady
    state nearly every junction is known and the scan pool shrinks to the
    novel tail), score+gate the scan-hit lanes, and return everything in
    one result set:

      pack1 (PB, 3) int16   — seeded-lane [score, j, flags]
      pack2 (2*AB*NC, 3)    — scan-lane   [score, j, flags]
      desc2 (2*AB*NC, 4) i32 — scan-lane (row, posA, posB, fw)

    Replaces the junction_gated_rows + anchor_scan_rows round trips (two
    tunnel syncs + a fixed-size scan over every triggered row)."""
    r1d, q1, rl1 = _gather_oriented(seqs2, quals2, lens2, rows, lfw)
    r1 = junction_score(idx, sctab, r1d, q1, rl1, posA, posB,
                        known_left, known_right)
    pack1 = _gate_pack(r1, rl1, posA, posB, minsc_i, minsc_s,
                       max_intron, dta)
    # per-read best ACCEPTED seeded-lane score (scatter-max over B): the
    # scan pool keeps rows whose seeded junctions left score on the table
    # (margin mirrors the host splice trigger), not just unaccepted rows
    B = seqs2.shape[0] // 2
    acc1 = (pack1[:, 2].astype(jnp.int32) >> 4) & 1
    sc1 = jnp.where(acc1 == 1, pack1[:, 0].astype(jnp.int32), NEG)
    row_jbest = jnp.full((B,), NEG, jnp.int32).at[rows].max(sc1)
    perfect = sctab["match_bonus"] * lens2[:B].astype(jnp.int32)
    need = slive & (row_jbest[srow] < perfect[srow] - margin)
    # compact scan rows to AB slots (ascending srow order, rank gather)
    nv, sel = lax.top_k(need.astype(jnp.int32), AB)
    sel = jnp.clip(sel, 0, srow.shape[0] - 1)
    arow = srow[sel]
    afw = sfw[sel]
    apos = spos[sel]
    avalid = nv > 0
    # two scan directions per compacted row
    row2 = jnp.concatenate([arow, arow])
    fw2 = jnp.concatenate([afw, afw])
    pos2 = jnp.concatenate([apos, apos])
    down2 = jnp.concatenate([jnp.ones(AB, bool), jnp.zeros(AB, bool)])
    valid2 = jnp.concatenate([avalid, avalid])
    rd2, _q2, rl2 = _gather_oriented(seqs2, quals2, lens2, row2, fw2)
    scan = anchor_scan(idx, rd2, rl2, pos2, down2, min_intron,
                       W=W, NC=NC, tiles=tiles,
                       live=valid2)                      # (2AB, NC, 2)
    mate = scan[:, :, 0]
    ok = (scan[:, :, 1] > 0) & valid2[:, None]
    # lane set from scan hits: down rows -> (pos, mate), up -> (mate, pos)
    pA2 = jnp.where(down2[:, None], pos2[:, None], mate)
    pB2 = jnp.where(down2[:, None], mate, pos2[:, None])
    rowsl = jnp.repeat(row2, NC)
    fwl = jnp.repeat(fw2, NC)
    pAl = pA2.reshape(-1)
    pBl = pB2.reshape(-1)
    okl = ok.reshape(-1)
    # dead lanes get pB = pA (delta 0 -> gated off in junction_score)
    pBl = jnp.where(okl, pBl, pAl)
    r2d, q2g, rl2g = _gather_oriented(seqs2, quals2, lens2, rowsl, fwl)
    r2 = junction_score(idx, sctab, r2d, q2g, rl2g, pAl, pBl,
                        known_left, known_right)
    pack2 = _gate_pack(r2, rl2g, pAl, pBl, minsc_i, minsc_s,
                       max_intron, dta)
    # kill lanes that weren't real scan hits
    pack2 = pack2.at[:, 2].set(jnp.where(okl, pack2[:, 2], 0))
    desc2 = jnp.stack([rowsl, pAl, pBl, fwl.astype(jnp.int32)], axis=1)
    return pack1, pack2, desc2


def _lane_enum(mrows, lens_rows, kleft, kright, krs, klr,
               min_intron, max_intron, PJ: int):
    """Device mirror of pipeline._junction_lanes: per compacted trigger
    row, enumerate known-site-implied diagonal pairs (8 rank variants per
    grid candidate) + same-orientation candidate-pair diagonals from the
    (TB, K2, 3) merged grid, dedup (pa, pb, fw) keeping the lowest rank,
    and keep the PJ lowest-rank lanes per row.

    Returns (pa, pb, fa, ok) each (TB, PJ)."""
    TB, K2, _ = mrows.shape
    sc = mrows[:, :, 0]
    pos = mrows[:, :, 1]
    fwv = (mrows[:, :, 2] & 1) == 1
    live = sc > NEG // 2
    # first-occurrence dedup of (pos, fw) per row, in column order
    samep = (pos[:, :, None] == pos[:, None, :]) \
        & (fwv[:, :, None] == fwv[:, None, :])
    earlier = jnp.tril(jnp.ones((K2, K2), bool), -1)
    live &= ~(samep & earlier[None]).any(axis=2)

    BIGP = jnp.int32(0x7FFFFFFF)
    BIGR = jnp.int32(1 << 24)
    pas, pbs, fas, rks = [], [], [], []

    def add(pa, pb, fa, ok, rank):
        pas.append(jnp.where(ok, pa, BIGP))
        pbs.append(jnp.where(ok, pb, BIGP))
        fas.append(fa & ok)
        rks.append(jnp.where(ok, rank, BIGR))

    if kleft.shape[0] > 0:
        nk = kleft.shape[0]
        rlen = lens_rows[:, None].astype(jnp.int32)
        lo = jnp.searchsorted(kleft, pos).astype(jnp.int32)
        hi = jnp.searchsorted(kleft, pos + rlen - 1).astype(jnp.int32)
        lo2 = jnp.searchsorted(krs, pos).astype(jnp.int32)
        hi2 = jnp.searchsorted(krs, pos + rlen).astype(jnp.int32)
        cidx = jnp.arange(K2, dtype=jnp.int32)[None, :]
        for s in range(4):
            # upstream anchor: known left site inside [pa, pa+rl-1)
            ok = live & (lo + s < hi)
            si = jnp.minimum(lo + s, nk - 1)
            pb = kright[si] - (kleft[si] - pos + 1)
            ok &= pb > pos
            add(pos, pb, fwv, ok, cidx * 8 + s)
            # downstream anchor: known right site inside [pa, pa+rl)
            ok = live & (lo2 + s < hi2)
            si = jnp.minimum(lo2 + s, nk - 1)
            intron = krs[si] - klr[si] - 1
            pa2 = pos - intron
            ok &= pa2 < pos
            add(pa2, pos, fwv, ok, cidx * 8 + 4 + s)
    # candidate-pair diagonals (same orientation, intron-range delta)
    d = pos[:, None, :] - pos[:, :, None]               # pb - pa
    okcc = (live[:, :, None] & live[:, None, :]
            & (fwv[:, :, None] == fwv[:, None, :])
            & (d >= min_intron) & (d <= max_intron))
    ci = jnp.arange(K2, dtype=jnp.int32)
    rankcc = 8 * K2 + ci[:, None] * K2 + ci[None, :]
    add(jnp.broadcast_to(pos[:, :, None], (TB, K2, K2)).reshape(TB, -1),
        jnp.broadcast_to(pos[:, None, :], (TB, K2, K2)).reshape(TB, -1),
        jnp.broadcast_to(fwv[:, :, None], (TB, K2, K2)).reshape(TB, -1),
        okcc.reshape(TB, -1),
        jnp.broadcast_to(rankcc[None], (TB, K2, K2)).reshape(TB, -1))

    PA = jnp.concatenate(pas, axis=1)
    PB = jnp.concatenate(pbs, axis=1)
    FA = jnp.concatenate(fas, axis=1).astype(jnp.int32)
    RK = jnp.concatenate(rks, axis=1)
    # dedup (pa, pb, fa) keeping lowest rank: group by sort, mark
    # non-first members dead
    spa, spb, sfa, srk = lax.sort((PA, PB, FA, RK), dimension=1,
                                  num_keys=4)
    dup = jnp.concatenate(
        [jnp.zeros((TB, 1), bool),
         (spa[:, 1:] == spa[:, :-1]) & (spb[:, 1:] == spb[:, :-1])
         & (sfa[:, 1:] == sfa[:, :-1])], axis=1)
    srk = jnp.where(dup, BIGR, srk)
    # PJ lowest-rank lanes per row (host cap: pairs_per_read in rank
    # order), carrying the descriptors
    fr, fpa, fpb, ffa = lax.sort((srk, spa, spb, sfa), dimension=1,
                                 num_keys=1)
    pa = fpa[:, :PJ]
    pb = fpb[:, :PJ]
    fa = ffa[:, :PJ] > 0
    ok = fr[:, :PJ] < BIGR
    return pa, pb, fa, ok


def spliced_stage(idx: dict, sctab: dict, merged, st, need_base, nNs,
                  B: int, kleft, kright, krs, klr, minsc_i, minsc_s,
                  nceil_i, nceil_s, margin, min_intron, max_intron,
                  TB: int, PJ: int, AB: int, NC: int, NL: int,
                  dta: bool, tiles: int = 1):
    """Splice pass-1 INSIDE the main fused dispatch (replaces the
    separate rescue round trip): trigger mirror of the host rescue mask,
    TB-row compaction, device lane enumeration (_lane_enum), junction
    scoring + acceptance gates, device-compacted anchor scan for rows
    whose seeded junctions left score on the table, and compaction of
    accepted/partial lanes to an NL-lane result:

      sp32 (NL, 2) int32: [posA, posB]   (split widths: tunnel bytes)
      sp16 (NL, 5) int16: [row, fw, score, j, flags]
      need    (B,) bool — updated slow-row prediction (rows with lanes
              join the grid-shipping pool: second pass / ladder rows)
      cov     (B,) int8 — coverage bits: 1 = device trigger mirror,
              2 = triggered but dropped by a bucket (TB/AB overflow) —
              the host re-runs its legacy rescue for those rows only
      nsel    () int32 — total accepted/partial lanes BEFORE the NL cap
              (host falls back wholesale when nsel > NL)

    flags == 0 marks padding. Novel-site publication and the known-site
    second pass stay host-side (align/emit.py)."""
    lens_b = st["lens2"][:B].astype(jnp.int32)
    best = merged[:, 0, 0]
    p0 = merged[:, 0, 1]
    perfect = sctab["match_bonus"] * lens_b
    min_sc = jnp.ceil(minsc_i + minsc_s
                      * lens_b.astype(jnp.float32)).astype(jnp.int32)
    filt = (lens_b == 0) | (nNs.astype(jnp.float32)
                            > nceil_i + nceil_s
                            * lens_b.astype(jnp.float32))
    aligned = (best >= min_sc) & ~filt
    if kleft.shape[0] > 0:
        kspan = ((jnp.searchsorted(kleft, p0 + lens_b - 1)
                  > jnp.searchsorted(kleft, p0 + 1))
                 | (jnp.searchsorted(krs, p0 + lens_b - 1)
                    > jnp.searchsorted(krs, p0 + 1)))
    else:
        kspan = jnp.zeros(best.shape, bool)
    emit_trig = aligned & ((best < perfect - margin) | kspan)
    slow = need_base | emit_trig | ~aligned
    allowed = slow & ~filt
    trig = allowed & ((best < perfect) | kspan)
    # TB compaction ranks triggered rows by their best contiguous score:
    # junction reads sit a few penalties under perfect while hopeless
    # rows (e.g. reads whose true locus is in ANOTHER genome shard) sit
    # far below — under multi-shard trigger pressure the overflow falls
    # on the hopeless tail instead of arbitrary row order (Gbp 2-shard
    # runs overflowed ~25% of junction rows by row order)
    tkey = jnp.where(trig, best - jnp.int32(NEG), jnp.int32(0))
    tv, trows = lax.top_k(tkey, TB)
    trows = jnp.clip(trows, 0, B - 1)
    tvalid = tv > 0
    mrows = merged[trows]
    pa, pb, fa, lok = _lane_enum(mrows, lens_b[trows], kleft, kright,
                                 krs, klr, min_intron, max_intron, PJ)
    lok &= tvalid[:, None]
    # compact REAL lanes to LB slots before scoring: the (TB, PJ) grid
    # is ~70% dead padding (most rows carry 1-3 lanes), and the junction
    # kernel's window fetches + cumsums are the stage's dominant cost.
    # Rows whose lanes overflow LB re-run on the host legacy path.
    LB = 6 * TB
    rows_f = jnp.repeat(trows, PJ)
    okf = lok.reshape(-1)
    lvc, lic = lax.top_k(okf.astype(jnp.int32), LB)
    lic = jnp.clip(lic, 0, okf.shape[0] - 1)
    okl = lvc > 0
    rowsl = rows_f[lic]
    pal = jnp.where(okl, pa.reshape(-1)[lic], 0)
    pbl = jnp.where(okl, pb.reshape(-1)[lic], 0)
    fal = fa.reshape(-1)[lic]
    pbl = jnp.where(okl, pbl, pal)      # dead lanes: delta 0 -> gated off
    lrank = jnp.cumsum(okf.astype(jnp.int32)) - 1
    lane_lost = jnp.zeros((B,), bool).at[rows_f].max(okf & (lrank >= LB))
    seqs2, quals2, lens2 = st["seqs2"], st["quals2"], st["lens2"]
    rd1, q1, rl1 = _gather_oriented(seqs2, quals2, lens2, rowsl, fal)
    r1 = junction_score(idx, sctab, rd1, q1, rl1, pal, pbl,
                        kleft, kright)
    pack1 = _gate_pack(r1, rl1, pal, pbl, minsc_i, minsc_s,
                       max_intron, dta)
    pack1 = pack1.at[:, 2].set(jnp.where(okl, pack1[:, 2], 0))

    # anchor scan for rows whose best ACCEPTED seeded junction still
    # leaves score on the table (same pool rule as rescue_fused)
    acc1 = (pack1[:, 2].astype(jnp.int32) >> 4) & 1
    sc1 = jnp.where(acc1 == 1, pack1[:, 0].astype(jnp.int32), NEG)
    row_jbest = jnp.full((B,), NEG, jnp.int32).at[rowsl].max(sc1)
    live0 = (mrows[:, 0, 0] > NEG // 2) & tvalid
    sneed = live0 & (row_jbest[trows] < (perfect - margin)[trows])
    nv, sels = lax.top_k(sneed.astype(jnp.int32), AB)
    sels = jnp.clip(sels, 0, TB - 1)
    arow = trows[sels]
    afw = (mrows[sels, 0, 2] & 1) == 1
    apos = mrows[sels, 0, 1]
    avalid = nv > 0
    row2 = jnp.concatenate([arow, arow])
    fw2 = jnp.concatenate([afw, afw])
    pos2 = jnp.concatenate([apos, apos])
    down2 = jnp.concatenate([jnp.ones(AB, bool), jnp.zeros(AB, bool)])
    valid2 = jnp.concatenate([avalid, avalid])
    rd2, _q2, rl2 = _gather_oriented(seqs2, quals2, lens2, row2, fw2)
    scan = anchor_scan(idx, rd2, rl2, pos2, down2, min_intron, NC=NC,
                       tiles=tiles, live=valid2)
    mate = scan[:, :, 0]
    sok = (scan[:, :, 1] > 0) & valid2[:, None]
    pA2 = jnp.where(down2[:, None], pos2[:, None], mate)
    pB2 = jnp.where(down2[:, None], mate, pos2[:, None])
    rows2l = jnp.repeat(row2, NC)
    fw2l = jnp.repeat(fw2, NC)
    pA2l = pA2.reshape(-1)
    pB2l = pB2.reshape(-1)
    sokl = sok.reshape(-1)
    pB2l = jnp.where(sokl, pB2l, pA2l)
    rd3, q3, rl3 = _gather_oriented(seqs2, quals2, lens2, rows2l, fw2l)
    r2 = junction_score(idx, sctab, rd3, q3, rl3, pA2l, pB2l,
                        kleft, kright)
    pack2 = _gate_pack(r2, rl3, pA2l, pB2l, minsc_i, minsc_s,
                       max_intron, dta)
    # scan lanes: only fully-accepted junctions count (no partials —
    # their far diagonal is an 8-mer guess, pipeline._splice_rescue note).
    # Bit 6 tags them: rows that fall OUT of device coverage keep their
    # scan lanes (the host cleanup rescue re-enumerates seeded lanes but
    # has no anchor scan).
    fl2 = pack2[:, 2].astype(jnp.int32)
    fl2 = jnp.where(sokl & (((fl2 >> 4) & 1) == 1),
                    (fl2 & ~0x20) | 0x40, 0)
    pack2 = pack2.at[:, 2].set(fl2.astype(jnp.int16))

    # compact accepted/partial lanes to NL (lane order preserved:
    # seeded row-major first, scan lanes after)
    all_row = jnp.concatenate([rowsl, rows2l])
    all_pa = jnp.concatenate([pal, pA2l])
    all_pb = jnp.concatenate([pbl, pB2l])
    all_fa = jnp.concatenate([fal, fw2l])
    all_pack = jnp.concatenate([pack1, pack2]).astype(jnp.int32)
    sel_mask = (all_pack[:, 2] >> 4) & 3 != 0
    lv, li = lax.top_k(sel_mask.astype(jnp.int32), NL)
    li = jnp.clip(li, 0, all_row.shape[0] - 1)
    # split-width pack (tunnel bytes): positions need 32 bits, the rest
    # fit 16 — (NL, 2) int32 + (NL, 5) int16
    sp32 = jnp.stack([all_pa[li], all_pb[li]], axis=1)
    sp16 = jnp.stack(
        [all_row[li], all_fa[li].astype(jnp.int32),
         all_pack[li, 0], all_pack[li, 1],
         jnp.where(lv > 0, all_pack[li, 2], 0)], axis=1).astype(jnp.int16)
    # ---- fused pass 2: chain a second junction on either side of each
    # row's best accepted lane (device mirror of
    # pipeline._splice_second_pass's enumeration + junction gates; the
    # reference recurses, spliced_aligner.h:331). Chain SCORING and
    # attachment stay host-side (vectorized _score_segs_rows) — the
    # device ships gated candidate chain lanes with the fastpack, so the
    # steady-state second pass costs no extra round trip.
    NLn = sp16.shape[0]
    idxv = jnp.arange(NLn, dtype=jnp.int32)
    l_row = jnp.clip(all_row[li], 0, B - 1)
    l_pa = all_pa[li]
    l_pb = all_pb[li]
    l_fa = all_fa[li]
    l_sc = all_pack[li, 0]
    l_j = all_pack[li, 1]
    l_fl = jnp.where(lv > 0, all_pack[li, 2], 0)
    l_valid = l_fl != 0
    l_acc = ((l_fl >> 4) & 1) == 1
    l_part = ((l_fl >> 5) & 1) == 1
    l_canon = (l_fl >> 2) & 3
    l_strand = l_fl & 3
    l_rl = lens_b[l_row]
    # winner lane per row: max (score, canon==1) then earliest lane
    wkey = jnp.where(l_valid & l_acc,
                     ((l_sc + 32768) << 1) | (l_canon == 1), -1)
    row_w = jnp.full((B,), -1, jnp.int32).at[l_row].max(wkey)
    is_w = l_valid & l_acc & (wkey >= 0) & (wkey == row_w[l_row])
    wfirst = jnp.full((B,), -1, jnp.int32).at[l_row].max(
        jnp.where(is_w, NLn - idxv, -1))
    is_w &= (NLn - idxv) == wfirst[l_row]
    # winner keeps pass-2 eligibility below perfect-margin, or when a
    # KNOWN left site falls in either residual diagonal's span
    w_sc = jnp.full((B,), NEG, jnp.int32).at[l_row].max(
        jnp.where(is_w, l_sc, NEG))
    keep_w = w_sc < (perfect - margin)
    if kleft.shape[0] > 0:
        kres = ((jnp.searchsorted(kleft, l_pa + l_rl)
                 > jnp.searchsorted(kleft, l_pa))
                | (jnp.searchsorted(kleft, l_pb + l_rl)
                   > jnp.searchsorted(kleft, l_pb)))
        keep_w = keep_w | (jnp.zeros((B,), bool).at[l_row].max(
            is_w & kres) & (w_sc < perfect))
    # top-2 partial lanes per row (host: first-4 in lane order sorted by
    # score, top 2 — mirrored as best-2 by (score, earliest))
    pkey = jnp.where(l_valid & l_part,
                     ((l_sc + 32768) << 14) | (NLn - 1 - idxv), -1)
    p1 = jnp.full((B,), -1, jnp.int32).at[l_row].max(pkey)
    is_p1 = (pkey >= 0) & (pkey == p1[l_row])
    pkey2 = jnp.where(is_p1, -1, pkey)
    p2m = jnp.full((B,), -1, jnp.int32).at[l_row].max(pkey2)
    is_p2 = (pkey2 >= 0) & (pkey2 == p2m[l_row])
    base_ok = (is_w & keep_w[l_row]) | is_p1 | is_p2
    # enumerate (base lane x live merged diagonal) chain candidates
    mrows2 = merged[l_row]                       # (NL, K2, 3)
    pd_g = mrows2[:, :, 1]
    fd_g = (mrows2[:, :, 2] & 1) == 1
    live_g = mrows2[:, :, 0] > NEG // 2
    dL = l_pa[:, None] - pd_g
    dR = pd_g - l_pb[:, None]
    sameo = live_g & (fd_g == l_fa[:, None]) & base_ok[:, None]
    okL_g = sameo & (dL >= min_intron) & (dL <= max_intron) \
        & (l_j >= 2)[:, None]
    okR_g = sameo & ~okL_g & (dR >= min_intron) & (dR <= max_intron) \
        & (l_j <= l_rl - 2)[:, None]
    ok_g = okL_g | okR_g
    K2g = pd_g.shape[1]
    L2B = min(2 * TB, NLn * K2g)
    okf2 = ok_g.reshape(-1)
    lv2, li2 = lax.top_k(okf2.astype(jnp.int32), L2B)
    li2 = jnp.clip(li2, 0, okf2.shape[0] - 1)
    ok2v = lv2 > 0
    c_base = jnp.clip(li2 // K2g, 0, NLn - 1)
    c_isL = okL_g.reshape(-1)[li2]
    c_pd = pd_g.reshape(-1)[li2]
    c_row = l_row[c_base]
    c_fa = l_fa[c_base]
    c_j = l_j[c_base]
    c_rl = l_rl[c_base]
    c_start = jnp.where(c_isL, 0, c_j)
    c_seglen = jnp.where(c_isL, c_j, c_rl - c_j)
    c_pA = jnp.where(ok2v, jnp.where(c_isL, c_pd, l_pb[c_base] + c_j), 0)
    c_pB = jnp.where(ok2v, jnp.where(c_isL, l_pa[c_base], c_pd + c_j),
                     c_pA)
    lrank2 = jnp.cumsum(okf2.astype(jnp.int32)) - 1
    lane_lost2 = jnp.zeros((B,), bool).at[jnp.repeat(l_row, K2g)].max(
        okf2 & (lrank2 >= L2B))
    # residual-segment junction scoring (shift-by-start, mask seglen)
    rdc, qc, _rlc = _gather_oriented(seqs2, quals2, lens2, c_row, c_fa)
    Lr = rdc.shape[1]
    dblr = jnp.concatenate([rdc, jnp.full_like(rdc, 4)], axis=1)
    dblq = jnp.concatenate([qc, jnp.zeros_like(qc)], axis=1)
    rd2s = _rank._shift_words(dblr, c_start.astype(jnp.int32), Lr)
    q2s = _rank._shift_words(dblq, c_start.astype(jnp.int32), Lr)
    inseg = jnp.arange(Lr, dtype=jnp.int32)[None, :] < c_seglen[:, None]
    rd2s = jnp.where(inseg, rd2s, 4)
    q2s = jnp.where(inseg, q2s, 0)
    r2p = junction_score(idx, sctab, rd2s, q2s, c_seglen.astype(jnp.int32),
                         c_pA.astype(jnp.int32), c_pB.astype(jnp.int32),
                         kleft, kright)
    # host pass-2 gates (pipeline._splice_second_pass okv)
    j2c = r2p["j"]
    ok2 = ok2v & (r2p["strand"] != 0) & (r2p["score"] > NEG // 2)
    ok2 &= r2p["strand"] == l_strand[c_base]
    ok2 &= (j2c > 0) & (j2c < c_seglen)
    delta2 = c_pB - c_pA
    shorter2 = jnp.maximum(jnp.minimum(j2c, c_seglen - j2c), 1)
    lim_c2 = _max_intron_len_dev(shorter2, MIN_ANCHOR_CANON)
    lim_n2 = _max_intron_len_noncan_dev(shorter2)
    is_can2 = r2p["canon"] == 2
    gate_c2 = lim_c2 < max_intron
    ok2 &= ~(is_can2 & gate_c2 & (delta2 > lim_c2))
    ok2 &= ~(is_can2 & gate_c2
             & (r2p["probscore"] < _probscore_thresh_dev(delta2)))
    is_non2 = r2p["canon"] == 0
    ok2 &= ~(is_non2 & (lim_n2 < max_intron) & (delta2 > lim_n2))
    # ship gated chain lanes (chain scoring + comparison on host)
    L2S = min(max(256, TB // 4), L2B)
    sv2, si2 = lax.top_k(ok2.astype(jnp.int32), L2S)
    si2 = jnp.clip(si2, 0, ok2.shape[0] - 1)
    live_s = sv2 > 0
    fl2s = (r2p["strand"][si2] | (r2p["canon"][si2] << 2)
            | (c_isL[si2].astype(jnp.int32) << 4) | (1 << 5))
    sp32b = jnp.stack([c_pA[si2], c_pB[si2]], axis=1)
    sp16b = jnp.stack(
        [c_row[si2], c_base[si2], j2c[si2],
         jnp.clip(r2p["score"][si2], -32768, 32767),
         jnp.where(live_s, fl2s, 0)], axis=1).astype(jnp.int16)
    srank2 = jnp.cumsum(ok2.astype(jnp.int32)) - 1
    lane_lost2 = lane_lost2 | jnp.zeros((B,), bool).at[c_row].max(
        ok2 & (srank2 >= L2S))
    nsel2 = ok2.sum().astype(jnp.int32)

    # grid shipping: rows with any accepted/partial lane (second pass +
    # ladder) join the slow pool; so do all host-slow rows
    has_lane = jnp.zeros((B,), jnp.int32).at[all_row].max(
        sel_mask.astype(jnp.int32))
    need = slow | (has_lane == 1)
    # coverage report: TB-overflow rows (trigger rank >= TB) re-run on
    # the host legacy path. Scan-pool overflow past AB is dropped like
    # the legacy path's own AB compaction drops it (rescue_fused top_k)
    # — the scan is a bounded-sensitivity heuristic on both paths.
    in_tb = jnp.zeros((B,), bool).at[trows].max(tvalid)
    uncov = (trig & ~in_tb) | lane_lost | lane_lost2
    nsel = sel_mask.sum().astype(jnp.int32)
    cov = (trig.astype(jnp.int8) | (uncov.astype(jnp.int8) << 1))
    return sp32, sp16, need, cov, nsel, sp32b, sp16b, nsel2


@partial(jax.jit, static_argnames=("W", "A", "NC", "tiles"))
def anchor_scan(idx: dict, rd, rdlens, pos, down,
                min_intron, W: int = 65536, A: int = 8, NC: int = 4,
                tiles: int = 1, live=None):
    """Find candidate FAR-exon diagonals for a novel junction whose far
    anchor was too short to seed — the batched equivalent of the
    reference's localGFMSearch over the neighboring LocalGFMs
    (hi_aligner.h:6751, `_minK_local = 8` at hi_aligner.h:3979-3985):
    exact-match the read's far-end A-mer anchor against the
    intron-reachable window next to a seeded exon diagonal, by
    bit-parallel compare over the 2-bit packed text (16 sub-word shifts
    per 32-bit word — no per-position gather).

    rd (S, L) codes in alignment orientation; rdlens (S,); pos (S,)
    seeded diagonal (joined pos of read[0] on the seeded exon);
    down (S,) bool — True: the seeded exon is UPSTREAM, the anchor is
    the read's LAST A bases and matches give posB-diagonal candidates;
    False: seeded exon DOWNSTREAM, anchor is the FIRST A bases, matches
    give posA diagonals.

    `tiles` consecutive W-char windows extend the reach to tiles*W
    (8 x 64K covers the 500Kbp --max-intronlen default, the reference's
    prev/nextLocalGFM hop range, hgfm.h:1724-1740); candidates merge
    across tiles nearest-first, mirroring the reference's inside-out
    window walk.

    Returns (mate_diag (S, NC) int32, valid (S, NC) bool). DOWN scans
    prefer the NEAREST (shortest-intron) matches, UP scans the nearest
    upstream — the intron-length penalty G,-8,1 makes those the likely
    winners, and the junction kernel re-gates everything downstream.
    """
    S, L = rd.shape
    NW = W // 16
    rdlens = rdlens.astype(jnp.int32)
    pos = pos.astype(jnp.int32)
    mi = min_intron.astype(jnp.int32)

    # anchor code (little-endian 2-bit, matching text word packing)
    ar = jnp.arange(A, dtype=jnp.int32)
    tail_off = jnp.maximum(rdlens - A, 0)
    offs = jnp.where(down[:, None], tail_off[:, None] + ar[None, :],
                     ar[None, :])
    ach = jnp.take_along_axis(rd.astype(jnp.int32),
                              jnp.clip(offs, 0, L - 1), 1)   # (S, A)
    has_n = (ach >= 4).any(axis=1) | (rdlens < A + MIN_ANCHOR_CANON)
    acode = (jnp.clip(ach, 0, 3)
             * (4 ** ar)[None, :]).sum(axis=1).astype(jnp.uint32)

    rows = idx["text_rows"]
    wi = jnp.arange(NW, dtype=jnp.int32)[None, :]

    def scan_tile(t, pos_v, down_v, rdl_v, acode_v):
        """Per-tile top-NC over a row subset: (key (Sv, NC)
        nearest-first, mpos (Sv, NC))."""
        Sv = pos_v.shape[0]
        # window start (joined chars): DOWN matches live at
        # matchpos = posB + (rl - A), posB >= pos + min_intron + t*W;
        # UP matches at matchpos = posA >= pos - min_intron - (t+1)*W
        ws_down = pos_v + mi + rdl_v - A + t * W
        ws_up = pos_v - mi - (t + 1) * W
        ws = jnp.where(down_v, ws_down, ws_up)
        wsc = jnp.clip(ws, 0, None)
        base = wsc >> 4                                      # first word
        r0 = jnp.clip(base >> 4, 0, rows.shape[0] - 1)
        nrow = NW // 16 + 2
        ridx2 = jnp.clip(r0[:, None] + jnp.arange(nrow, dtype=jnp.int32),
                         0, rows.shape[0] - 1)
        wmat = rows[ridx2].reshape(Sv, nrow * 16)            # (Sv, words)
        woff = base & 15                                     # word in row0
        # align the word axis to the window start (log-step shift), then
        # compute the 16-bit value at every char offset: 16 shifts/word
        w0 = _rank._shift_words(wmat, woff, NW + 1)
        sh = (2 * jnp.arange(16, dtype=jnp.uint32))[None, None, :]
        lo = (w0[:, :NW, None] >> sh)
        hi = jnp.where(sh == 0, jnp.uint32(0),
                       (w0[:, 1:NW + 1, None] << (jnp.uint32(32) - sh)))
        vals = (lo | hi) & jnp.uint32(0xFFFF)                # (Sv, NW, 16)
        hitm = vals == acode_v[:, None, None]
        hit_any = hitm.any(axis=2)                           # (Sv, NW)
        # sub-position: first matching shift in the word (nearest for
        # DOWN); for UP prefer the last (largest matchpos)
        first_s = jnp.argmax(hitm, axis=2).astype(jnp.int32)
        last_s = 15 - jnp.argmax(hitm[:, :, ::-1],
                                 axis=2).astype(jnp.int32)
        sub = jnp.where(down_v[:, None], first_s, last_s)
        # nearest-first key: DOWN = smallest word of the nearest tile;
        # UP = largest word of the nearest tile (tile 0 is nearest in
        # both directions)
        key = jnp.where(hit_any,
                        jnp.where(down_v[:, None], -(t * NW + wi),
                                  -(t * NW + (NW - 1 - wi))),
                        jnp.int32(-(1 << 30)))
        kv, kw = lax.top_k(key, NC)
        kw = jnp.clip(kw, 0, NW - 1)
        # positions anchor at the word boundary 16*base (the shift
        # cascade aligns words, not chars; wsc may sit mid-word)
        mpos_t = ((base << 4)[:, None] + 16 * kw
                  + jnp.take_along_axis(sub, kw, 1))
        return kv, mpos_t

    kv, mpos = scan_tile(0, pos, down, rdlens, acode)
    if tiles > 1:
        # deeper tiles (reach up to tiles*W, the 500Kbp max-intron range)
        # run under ONE lax.cond wrapping a fori_loop (compiled once, not
        # unrolled): in steady state every LIVE scan row resolves in tile
        # 0 and the deep branch never executes, so the extended reach
        # costs nothing on the hot path. (A compacted-subset variant
        # measured no faster on chip and its scatter-in-cond program
        # segfaulted the XLA CPU compiler in long test sessions.)
        found0 = (kv[:, 0] > -(1 << 29)) | has_n
        if live is not None:
            found0 = found0 | ~live

        def deep(kv_mpos):
            def body(t, carry):
                kvc, mpc = carry
                k_t, m_t = scan_tile(t, pos, down, rdlens, acode)
                ka = jnp.concatenate([kvc, k_t], axis=1)     # (S, 2NC)
                ma = jnp.concatenate([mpc, m_t], axis=1)
                kv2, ke = lax.top_k(ka, NC)
                return kv2, jnp.take_along_axis(ma, ke, 1)
            return lax.fori_loop(1, tiles, body, kv_mpos)

        kv, mpos = lax.cond(~found0.all(), deep,
                            lambda c: c, (kv, mpos))
    kvalid = kv > -(1 << 29)
    # mate diagonal from match position
    mate = jnp.where(down[:, None], mpos - (rdlens - A)[:, None], mpos)
    # same-fragment + intron-range guards (the kernel re-gates; these
    # keep cross-chromosome garbage out of the lane set)
    fr = _rank.searchsorted_right(idx["frag_joined"], pos) - 1
    frc = jnp.clip(fr, 0, idx["frag_joined"].shape[0] - 1)
    fs, fe = idx["frag_joined"][frc], idx["frag_end"][frc]
    inb = (mpos >= fs[:, None]) & (mpos + A <= fe[:, None])
    delta = jnp.where(down[:, None], mate - pos[:, None],
                      pos[:, None] - mate)
    ok = (kvalid & inb & ~has_n[:, None] & (fr >= 0)[:, None]
          & (delta >= mi))
    return jnp.stack([mate, ok.astype(jnp.int32)], axis=2).astype(jnp.int32)
