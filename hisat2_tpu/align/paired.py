"""Paired-end alignment: concordance policy, pair selection, SAM emission.

Equivalent role to the reference's pe.{h,cpp} (PairedEndPolicy: FR/RF/FF
orientations, insert min/max, pe.h:43-95) + the concordant -> discordant ->
mixed fallback logic of AlnSinkWrap::finishRead (aln_sink.h:1939).

Design: both mates run the shared batched device stages; pairing happens
host-side over each mate's small top-K candidate list (NumPy broadcast over
the K1 x K2 combo grid — the reference instead does per-thread mate rescue
DP, which lands here in a later phase).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..io.reads import ReadBatch
from ..io import sam as samio
from . import mapq as _mapq
from .pipeline import Aligner, Alignment, ReadResult, NEG_INF


@dataclass
class PairResult:
    """Outcome for one read pair."""
    kind: str = "unal"            # 'concordant' | 'discordant' | 'mixed' | 'unal'
    aln1: Alignment | None = None
    aln2: Alignment | None = None
    best: int = NEG_INF           # summed pair score
    secbest: int | None = None
    res1: ReadResult | None = None  # per-mate fallbacks (mixed mode)
    res2: ReadResult | None = None


def _concordant(o1_fw, o1_pos, len1, o2_fw, o2_pos, len2,
                minins: int, maxins: int, mode: str) -> tuple[bool, int]:
    """Check one candidate combo for concordance; returns (ok, tlen).

    mode 'fr' (default): upstream mate forward, downstream mate reverse
    (pe.h PE_POL_FR). 'rf' and 'ff' mirror the reference's other policies.
    """
    if o1_pos <= o2_pos:
        up_fw, dn_fw = o1_fw, o2_fw
        frag = max(o2_pos + len2, o1_pos + len1) - o1_pos
    else:
        up_fw, dn_fw = o2_fw, o1_fw
        frag = max(o1_pos + len1, o2_pos + len2) - o2_pos
    if mode == "fr":
        ok = up_fw and not dn_fw
    elif mode == "rf":
        ok = (not up_fw) and dn_fw
    else:  # ff
        ok = o1_fw == o2_fw
    return ok and minins <= frag <= maxins, frag


def _concordant_grid(m1, m2, b1, b2, o, scoring):
    """Vectorized concordance over the full (B, K, K) candidate grid:
    best combo + second-best distinct-locus total per pair, all NumPy."""
    s1, s2 = m1["score"], m2["score"]           # (B, K)
    B, K = s1.shape
    l1 = b1.lens.astype(np.int64)
    l2 = b2.lens.astype(np.int64)
    min1 = np.ceil(scoring.score_min.I + scoring.score_min.S * l1)
    min2 = np.ceil(scoring.score_min.I + scoring.score_min.S * l2)
    v1 = s1 >= min1[:, None]
    v2 = s2 >= min2[:, None]
    p1 = m1["pos"].astype(np.int64)
    p2 = m2["pos"].astype(np.int64)
    f1, f2 = m1["fw"], m2["fw"]
    P1 = p1[:, :, None]
    P2 = p2[:, None, :]
    E1 = l1[:, None, None]
    E2 = l2[:, None, None]
    left1 = P1 <= P2
    up_fw = np.where(left1, f1[:, :, None], f2[:, None, :])
    dn_fw = np.where(left1, f2[:, None, :], f1[:, :, None])
    frag = np.maximum(P2 + E2, P1 + E1) - np.minimum(P1, P2)
    if o.fr == "fr":
        okdir = up_fw & ~dn_fw
    elif o.fr == "rf":
        okdir = ~up_fw & dn_fw
    else:
        okdir = f1[:, :, None] == f2[:, None, :]
    ok = (okdir & (frag >= o.minins) & (frag <= o.maxins)
          & v1[:, :, None] & v2[:, None, :])
    total = np.where(ok, s1[:, :, None] + s2[:, None, :],
                     np.int64(NEG_INF))
    flat = total.reshape(B, -1)
    bi = np.argmax(flat, axis=1)
    best = flat[np.arange(B), bi]
    has = best > NEG_INF // 2
    t1, t2 = bi // K, bi % K
    bp1 = p1[np.arange(B), t1]
    bp2 = p2[np.arange(B), t2]
    same = ((p1 == bp1[:, None])[:, :, None]
            & (p2 == bp2[:, None])[:, None, :]).reshape(B, -1)
    sec = np.where(same, np.int64(NEG_INF), flat).max(axis=1)
    return dict(has=has, t1=t1, t2=t2, total=best, sec=sec)


def align_pairs(aligner: Aligner, b1: ReadBatch, b2: ReadBatch
                ) -> list[PairResult]:
    o = aligner.opts
    B = len(b1)
    if o.seed_mode:
        m1, _ = aligner.device_align_fused(b1)
        m2, _ = aligner.device_align_fused(b2)
    else:
        st1, dp1 = aligner._device_align(b1)
        st2, dp2 = aligner._device_align(b2)
        m1 = aligner._merged_host(st1, dp1, B)
        m2 = aligner._merged_host(st2, dp2, B)
    if o.spliced:
        n_ss = len(aligner.ssdb)
        aligner._splice_rescue(b1, m1)
        aligner._splice_rescue(b2, m2)
        if len(aligner.ssdb) != n_ss:   # second pass with shared sites (P5)
            aligner._splice_rescue(b1, m1)
            aligner._splice_rescue(b2, m2)

    def mate_cands(m, batch, i, min_sc, rdlen):
        """Per-mate candidate dicts (regular + spliced), best first."""
        cs = []
        for s, p, fw, gapped, *_ in aligner._ranked_candidates(
                m, i, min_sc, limit=o.top_cands):
            cs.append(dict(score=s, pos=p, fw=fw, kind="reg", gapped=gapped,
                           extent=rdlen))
        for c in m.get("splice", {}).get(i, []):
            if c["score"] >= min_sc:
                cs.append(dict(score=c["score"], pos=c["posA"], fw=c["fw"],
                               kind="spl", c=c, extent=rdlen + c["delta"]))
        # ties: known-site junctions beat contiguous placements
        cs.sort(key=lambda x: (-x["score"],
                               0 if (x["kind"] == "spl"
                                     and x["c"]["canon"] == 1) else 1))
        return cs[:o.top_cands]

    def finalize(batch, i, c, rdlen):
        if c["kind"] == "spl":
            return aligner._finalize_spliced(i, batch, c["c"], rdlen)
        return aligner._finalize(i, batch, c["score"], c["pos"], c["fw"],
                                 c["gapped"], rdlen)

    # ---- vectorized concordance over the full (B, K, K) combo grid ----
    # (reads with spliced candidates drop to the per-read grid below; the
    # all-REG common case never runs Python per combo)
    grid = _concordant_grid(m1, m2, b1, b2, o, aligner.scoring)

    out: list[PairResult] = []
    rescue: list[tuple] = []
    spl1 = m1.get("splice", {})
    spl2 = m2.get("splice", {})
    for i in range(B):
        l1, l2 = int(b1.lens[i]), int(b2.lens[i])
        min1 = aligner.scoring.min_score(l1)
        min2 = aligner.scoring.min_score(l2)
        has_spl = (i in spl1) or (i in spl2)

        if grid is not None and not has_spl:
            combos = []
            if grid["has"][i]:
                t1, t2 = int(grid["t1"][i]), int(grid["t2"][i])
                mk = lambda m, t, rdlen: dict(
                    score=int(m["score"][i, t]), pos=int(m["pos"][i, t]),
                    fw=bool(m["fw"][i, t]), kind="reg",
                    gapped=bool(m["gapped"][i, t]), extent=rdlen)
                combos = [(int(grid["total"][i]), mk(m1, t1, l1),
                           mk(m2, t2, l2))]
                if grid["sec"][i] > NEG_INF // 2:
                    combos.append((int(grid["sec"][i]),
                                   dict(pos=-1), dict(pos=-1)))
            c1 = c2 = None
        else:
            c1 = mate_cands(m1, b1, i, min1, l1)
            c2 = mate_cands(m2, b2, i, min2, l2)
            combos = []
            for x1 in c1:
                for x2 in c2:
                    ok, frag = _concordant(x1["fw"], x1["pos"], x1["extent"],
                                           x2["fw"], x2["pos"], x2["extent"],
                                           o.minins, o.maxins, o.fr)
                    if ok:
                        combos.append((x1["score"] + x2["score"], x1, x2))
            combos.sort(key=lambda x: -x[0])

        pr = PairResult()
        if combos:
            total, w1, w2 = combos[0]
            a1 = finalize(b1, i, w1, l1)
            a2 = finalize(b2, i, w2, l2)
            if a1 is not None and a2 is not None and a1.tidx == a2.tidx:
                pr.kind = "concordant"
                pr.aln1, pr.aln2 = a1, a2
                pr.best = total
                # second-best distinct concordant pair
                for t, x1, x2 in combos[1:]:
                    if (x1["pos"], x2["pos"]) != (w1["pos"], w2["pos"]):
                        pr.secbest = t
                        break
                out.append(pr)
                continue
        if c1 is None:
            c1 = mate_cands(m1, b1, i, min1, l1)
            c2 = mate_cands(m2, b2, i, min2, l2)
        # ---- discordant: both mates unique ----
        if (not o.no_discordant and len(c1) >= 1 and len(c2) >= 1
                and (len(c1) == 1 or c1[0]["score"] > c1[1]["score"])
                and (len(c2) == 1 or c2[0]["score"] > c2[1]["score"])):
            a1 = finalize(b1, i, c1[0], l1)
            a2 = finalize(b2, i, c2[0], l2)
            if a1 is not None and a2 is not None:
                pr.kind = "discordant"
                pr.aln1, pr.aln2 = a1, a2
                pr.best = c1[0]["score"] + c2[0]["score"]
                out.append(pr)
                continue
        # ---- mate rescue candidates: one mate anchored, other missing ----
        if c1 and not c2:
            rescue.append((i, 1, c1[0]))
        elif c2 and not c1:
            rescue.append((i, 2, c2[0]))
        # ---- mixed: report mates individually ----
        if not o.no_mixed:
            pr.kind = "mixed"
            pr.res1 = _mate_result(aligner, b1, i, c1, min1, l1, finalize)
            pr.res2 = _mate_result(aligner, b2, i, c2, min2, l2, finalize)
            if not pr.res1.aligned and not pr.res2.aligned:
                pr.kind = "unal"
        out.append(pr)

    if rescue:
        _rescue_mates(aligner, b1, b2, out, rescue, finalize)
    return out


def _rescue_mates(aligner, b1, b2, results, rescue, finalize) -> None:
    """Mate rescue (reference HI_Aligner::alignMate, hi_aligner.h:4107):
    DP the unaligned mate against the window the paired-end policy implies
    from its anchored partner; a passing score upgrades the pair to
    concordant. Batched: one device DP call over all rescue lanes."""
    import jax.numpy as jnp
    from ..ops import sw as _sw
    from .pipeline import _rank_text_window
    o = aligner.opts
    sc = aligner.scoring
    lanes = []
    L = max(b1.seqs.shape[1], b2.seqs.shape[1])
    W = min(o.maxins, 1000) + L
    for i, anchored, ac in rescue[:512]:
        tb = b2 if anchored == 1 else b1
        rdlen = int(tb.lens[i])
        if rdlen == 0:
            continue
        # FR policy: mate opposite orientation, downstream of a fw anchor /
        # upstream of an rc anchor
        if ac["fw"]:
            wstart = ac["pos"]
            mate_fw = False
        else:
            wstart = ac["pos"] + ac["extent"] - W
            mate_fw = True
        lanes.append((i, anchored, ac, wstart, mate_fw, rdlen))
    if not lanes:
        return
    P = len(lanes)
    bucket = 32
    while bucket < P:
        bucket *= 2
    lanes_p = lanes + [lanes[0]] * (bucket - P)
    rd = np.full((bucket, L), 4, np.int64)
    q = np.full((bucket, L), 40, np.int64)
    rls = np.zeros(bucket, np.int32)
    wstarts = np.zeros(bucket, np.int32)
    from ..utils import alphabet
    for k, (i, anchored, ac, wstart, mate_fw, rdlen) in enumerate(lanes_p):
        tb = b2 if anchored == 1 else b1
        s = tb.seqs[i, :rdlen].astype(np.uint8)
        qq = np.clip(tb.quals[i, :rdlen].astype(np.int64), 0, 63)
        if not mate_fw:
            s = alphabet.revcomp(s)
            qq = qq[::-1].copy()
        rd[k, :rdlen] = s
        q[k, :rdlen] = qq
        rls[k] = rdlen
        wstarts[k] = wstart
    win = _rank_text_window(aligner.idx, jnp.asarray(wstarts), W)
    scores = np.asarray(_sw.dp_score_batch(
        aligner.sctab, jnp.asarray(rd), jnp.asarray(q), jnp.asarray(rls),
        win))[:P]

    for k, (i, anchored, ac, wstart, mate_fw, rdlen) in enumerate(lanes):
        min_sc = sc.min_score(rdlen)
        if scores[k] < min_sc:
            continue
        # host traceback against the window for the exact placement
        window = aligner.fm.ref.get_stretch(int(wstart), W)
        s2, ref_start, cigar, mds = _sw.dp_traceback(
            sc, rd[k, :rdlen].astype(np.uint8), q[k, :rdlen], window)
        jpos = int(wstart) + ref_start
        from .pipeline import Alignment
        span = sum(n for op, n in cigar if op in ("M", "D"))
        md, nm = samio.make_md(rd[k, :rdlen].astype(np.uint8),
                               window[ref_start:ref_start + span], cigar)
        a_resc = Alignment(joined_pos=jpos, fw=mate_fw, score=int(s2),
                           cigar=cigar, nmm=len(mds), md=md, nm=nm,
                           gap_opens=sum(1 for op, n in cigar
                                         if op in ("I", "D")),
                           gap_exts=sum(n - 1 for op, n in cigar
                                        if op in ("I", "D")))
        loc = aligner.fm.ref.joined_to_text(jpos, a_resc.ref_span)
        if loc is None:
            continue
        a_resc.tidx, a_resc.toff = loc
        ab = b1 if anchored == 1 else b2
        a_anchor = finalize(ab, i, ac, int(ab.lens[i]))
        if a_anchor is None or a_anchor.tidx != a_resc.tidx:
            continue
        ok, _frag = _concordant(
            a_anchor.fw, a_anchor.joined_pos, ac["extent"],
            a_resc.fw, a_resc.joined_pos, a_resc.ref_span,
            aligner.opts.minins, aligner.opts.maxins, aligner.opts.fr)
        if not ok:
            continue
        pr = results[i]
        pr.kind = "concordant"
        if anchored == 1:
            pr.aln1, pr.aln2 = a_anchor, a_resc
        else:
            pr.aln1, pr.aln2 = a_resc, a_anchor
        pr.best = ac["score"] + int(s2)
        pr.secbest = None
        pr.res1 = pr.res2 = None


def _mate_result(aligner, batch, i, cands, min_sc, rdlen, finalize
                 ) -> ReadResult:
    from .pipeline import _dedup_alns
    res = ReadResult()
    valid = [c for c in cands if c["score"] >= min_sc]
    if not valid:
        return res
    res.best = valid[0]["score"]
    if len(valid) > 1:
        res.secbest = valid[1]["score"]
    for c in valid[: aligner.opts.khits + 1]:
        a = finalize(batch, i, c, rdlen)
        if a is not None:
            res.alns.append(a)
    if not res.alns:
        return ReadResult()
    _dedup_alns(res, aligner.opts.khits)
    return res


def pairs_to_sam(b1: ReadBatch, b2: ReadBatch, results: list[PairResult],
                 aligner: Aligner, writer: samio.SamWriter) -> dict:
    sc = aligner.scoring
    ref = aligner.fm.ref
    stats = dict(pairs=0, conc_uniq=0, conc_multi=0, disc=0,
                 mixed_al=0, unal=0, mates_al=0,
                 mate_un=0, mate_uniq=0, mate_multi=0)

    def qstr(b, i, ln):
        return (b.quals[i, :ln].astype(np.uint8) + 33).tobytes().decode("ascii")

    for i, pr in enumerate(results):
        stats["pairs"] += 1
        l1, l2 = int(b1.lens[i]), int(b2.lens[i])
        name = b1.names[i]
        seq1, seq2 = b1.seqs[i, :l1], b2.seqs[i, :l2]
        q1, q2 = qstr(b1, i, l1), qstr(b2, i, l2)
        rdid = int(b1.rdids[i])

        if pr.kind in ("concordant", "discordant"):
            conc = pr.kind == "concordant"
            if conc:
                if pr.secbest is not None and pr.secbest == pr.best:
                    stats["conc_multi"] += 1
                else:
                    stats["conc_uniq"] += 1
            else:
                stats["disc"] += 1
            a1, a2 = pr.aln1, pr.aln2
            perfect = sc.perfect_score(l1) + sc.perfect_score(l2)
            minsc = sc.min_score(l1) + sc.min_score(l2)
            mq = _mapq.mapq_v2(pr.best, pr.secbest, perfect, minsc,
                               local=sc.local)
            # TLEN spans the *unclipped* fragment (reference setMateParams
            # includes soft-clipped bases in the template length)
            def clips(a):
                c5 = a.cigar[0][1] if a.cigar and a.cigar[0][0] == "S" else 0
                c3 = a.cigar[-1][1] if a.cigar and a.cigar[-1][0] == "S" else 0
                return c5, c3
            c15, c13 = clips(a1)
            c25, c23 = clips(a2)
            left = min(a1.toff - c15, a2.toff - c25)
            right = max(a1.toff + a1.ref_span + c13, a2.toff + a2.ref_span + c23)
            # template-length adjustment: introns don't count toward TLEN
            # (reference setMateParams with templateLenAdjustment; shared
            # splice sites between mates count once)
            introns = set()
            for a in (a1, a2):
                r = a.toff
                for op, n in a.cigar:
                    if op == "N":
                        introns.add((r, n))
                    if op in ("M", "D", "N", "=", "X"):
                        r += n
            # known/discovered introns between the mates also shrink TLEN
            # (reference setMateParams consults SpliceSiteDB for the gap)
            inner_l = min(a1.toff + a1.ref_span, a2.toff + a2.ref_span)
            inner_r = max(a1.toff, a2.toff)
            if inner_r > inner_l and len(aligner.ssdb):
                kl, kr = aligner.ssdb.lefts_rights()
                jl = aligner.fm.ref.text_to_joined(a1.tidx, inner_l)
                if jl is not None:
                    goff = inner_l - jl   # joined = text - goff on this frag
                    lo = np.searchsorted(kl, inner_l - goff)
                    hi = np.searchsorted(kl, inner_r - goff)
                    for si in range(lo, hi):
                        if kr[si] <= inner_r - goff:
                            introns.add((int(kl[si]) + goff + 1,
                                         int(kr[si] - kl[si] - 1)))
            tl = right - left - sum(n for _, n in introns)
            t1 = tl if a1.toff <= a2.toff else -tl
            yt = "CP" if conc else "DP"
            lines = []
            for mate1, a, other, t, seq, q in (
                    (True, a1, a2, t1, seq1, q1),
                    (False, a2, a1, -t1, seq2, q2)):
                rec = samio.SamAlignment(
                    rname=ref.names[a.tidx], pos=a.toff, fw=a.fw, mapq=mq,
                    cigar=a.cigar, score=a.score, nmm=a.nmm,
                    gap_opens=a.gap_opens, gap_exts=a.gap_exts, md=a.md,
                    nm=a.nm, yt=yt, nh=1, paired=True, mate1=mate1,
                    xs_strand=a.xs_strand,
                    proper_pair=conc, mate_mapped=True,
                    mate_rname=ref.names[other.tidx], mate_pos=other.toff,
                    mate_fw=other.fw, tlen=t)
                lines.append(samio.format_aligned(name, seq, q, rec))
            stats["mates_al"] += 2
            writer.emit(rdid, lines)
            continue

        # mixed / unal
        r1 = pr.res1 or ReadResult()
        r2 = pr.res2 or ReadResult()
        if r1.aligned or r2.aligned:
            stats["mixed_al"] += 1
        else:
            stats["unal"] += 1
        lines = []
        for mate1, res, other, seq, q, ln in (
                (True, r1, r2, seq1, q1, l1), (False, r2, r1, seq2, q2, l2)):
            oa = other.alns[0] if other.aligned else None
            if not res.aligned:
                stats["mate_un"] += 1
            elif len(res.alns) > 1 or (res.secbest is not None
                                       and res.secbest == res.best):
                stats["mate_multi"] += 1
            else:
                stats["mate_uniq"] += 1
            if res.aligned:
                stats["mates_al"] += 1
                a = res.alns[0]
                mq = _mapq.mapq_v2(res.best, res.secbest,
                                   sc.perfect_score(ln), sc.min_score(ln),
                                   local=sc.local)
                rec = samio.SamAlignment(
                    rname=ref.names[a.tidx], pos=a.toff, fw=a.fw, mapq=mq,
                    cigar=a.cigar, score=a.score, nmm=a.nmm,
                    gap_opens=a.gap_opens, gap_exts=a.gap_exts, md=a.md,
                    nm=a.nm, zs=res.secbest, yt="UP", nh=len(res.alns),
                    xs_strand=a.xs_strand,
                    paired=True, mate1=mate1,
                    mate_mapped=oa is not None,
                    mate_rname=ref.names[oa.tidx] if oa else None,
                    mate_pos=oa.toff if oa else 0,
                    mate_fw=oa.fw if oa else True, tlen=0)
                lines.append(samio.format_aligned(name, seq, q, rec))
            else:
                lines.append(samio.format_unaligned(
                    name, seq, q, paired=True, mate1=mate1,
                    mate_mapped=oa is not None,
                    mate_rname=ref.names[oa.tidx] if oa else "*",
                    mate_pos=oa.toff if oa else 0,
                    mate_fw=oa.fw if oa else True,
                    yt="UP", yf=res.filtered))
        writer.emit(rdid, lines)
    return stats
