"""Fused align + SAM emission (single-end fast path).

Ungapped, unspliced reads — including MULTI-mapped ones (real genomes are
~15-20% repetitive, so multireads must ride the fast path too) — skip all
per-read Python: the device finalizes the top-k candidates of every read
(`_stage_fin_rows`: clips/score/mismatch columns), the host selects and
flattens reportable records with NumPy column ops, and the native C++
batch formatter (`native/samfmt.cpp` format_se_batch2) turns the column
arrays into SAM lines — primary + secondary records, NH/ZS/MAPQ included.
Only odd reads (gapped, spliced, filtered, fragment-boundary, >8
mismatches, candidate overflow) drop to the per-read ReadResult path.
Output byte-order matches results_to_sam (read order).
"""

from __future__ import annotations

import numpy as np

from ..io.reads import ReadBatch
from ..io import sam as samio
from . import mapq as _mapq
from .pipeline import Aligner, ReadResult, _stage_primary_fin

_DEC_ASCII = np.frombuffer(b"ACGTN", dtype=np.uint8)
# ASCII complement table for reverse-complementing SEQ strings directly
_COMP_ASCII = np.arange(256, dtype=np.uint8)
for _a, _b in ((65, 84), (67, 71), (71, 67), (84, 65)):  # A<->T C<->G
    _COMP_ASCII[_a] = _b
INT32_MIN = np.int32(-(1 << 31))
MAX_FAST_MM = 8


class _MapqCache:
    """Memoized MAPQ v2: scores are small ints, so per-batch distinct
    (best, secbest, len, exhausted) tuples number in the dozens."""

    def __init__(self, scoring):
        self.sc = scoring
        self.cache: dict[tuple, int] = {}

    def get(self, best: int, secbest, rdlen: int, exhausted: bool) -> int:
        key = (best, secbest, rdlen, exhausted)
        v = self.cache.get(key)
        if v is None:
            v = _mapq.mapq_v2(best, secbest, self.sc.perfect_score(rdlen),
                              self.sc.min_score(rdlen), local=self.sc.local,
                              exhausted=exhausted)
            self.cache[key] = v
        return v


def align_and_emit(al: Aligner, batch: ReadBatch, writer) -> dict:
    """Align one SE batch and emit SAM; returns the summary-stats dict."""
    lib = _samfmt()
    if lib is None:
        from .pipeline import results_to_sam
        results = al.align_batch(batch)
        return results_to_sam(batch, results, al, writer)

    B = len(batch)
    if al.opts.seed_mode:
        merged, fin = al.device_align_fused(batch)      # fin (B, KF, D)
    else:
        st, dp = al._device_align(batch)
        merged = al._merged_host(st, dp, B)
        import jax.numpy as jnp
        fin = np.asarray(_stage_primary_fin(
            al.idx, al.sctab, st["seqs2"], st["quals2"], st["lens2"],
            jnp.asarray(merged["pos"][:, 0].astype(np.int32)),
            jnp.asarray(merged["fw"][:, 0]), B))[:, None, :]
    if al.opts.spliced:
        n_ss = len(al.ssdb)
        al._splice_rescue(batch, merged)
        if len(al.ssdb) != n_ss:
            al._splice_rescue(batch, merged)

    sc = al.scoring
    lens = batch.lens.astype(np.int64)
    L = batch.seqs.shape[1]
    min_scs = np.ceil(sc.score_min.I + sc.score_min.S * lens).astype(np.int64)
    nNs = ((batch.seqs >= 4)
           & (np.arange(L)[None, :] < lens[:, None])).sum(axis=1)
    max_ns = sc.n_ceil.I + sc.n_ceil.S * lens
    filtered = (lens == 0) | (nNs > max_ns)

    msc, mpos = merged["score"], merged["pos"]
    mfw, mgap = merged["fw"], merged["gapped"]
    exh = merged.get("exhausted")
    if exh is None:
        exh = np.zeros(B, bool)
    spl = merged.get("splice", {})
    K2 = msc.shape[1]
    KF = fin.shape[1]
    khits = al.opts.khits
    aligned = ~filtered & (msc[:, 0] >= min_scs)

    # distinct-placement dedup across the merged top-K2 (same (pos, fw)
    # can reach the list via seed and DP routes)
    dup = np.zeros((B, K2), bool)
    for t in range(1, K2):
        eq = (mpos[:, :t] == mpos[:, t:t + 1]) & (mfw[:, :t] == mfw[:, t:t + 1])
        dup[:, t] = eq.any(axis=1)
    valid = (msc >= min_scs[:, None]) & ~dup
    nvalid = valid.sum(axis=1)
    nrep = np.minimum(nvalid, khits)

    # column index of the j-th valid entry per read
    vrank = np.where(valid, np.cumsum(valid, axis=1) - 1, K2 + 1)
    KFu = min(KF, khits)
    sel = np.full((B, KFu), K2, np.int64)
    for j in range(KFu):
        hit = vrank == j
        has = hit.any(axis=1)
        sel[has, j] = np.argmax(hit[has], axis=1)
    # 2nd distinct valid column (secbest for MAPQ/ZS, independent of -k)
    hit2 = vrank == 1
    sel2 = np.where(hit2.any(axis=1), np.argmax(hit2, axis=1), K2)

    # fast eligibility: every reported record is an ungapped, <=8-mismatch,
    # fragment-contained finalized candidate within the fin window
    fast = aligned & (nrep <= KFu)
    in_rep = (np.arange(KFu)[None, :] < nrep[:, None])
    selc = np.minimum(sel, K2 - 1)
    rows_all = np.arange(B)[:, None]
    fast &= ~(in_rep & (sel >= KF)).any(axis=1)
    fast &= ~(in_rep & mgap[rows_all, selc]).any(axis=1)
    F_c5 = np.take_along_axis(fin[:, :, 0], np.minimum(sel, KF - 1), 1)
    F_c3 = np.take_along_axis(fin[:, :, 1], np.minimum(sel, KF - 1), 1)
    F_nmm_all = np.take_along_axis(fin[:, :, 4], np.minimum(sel, KF - 1), 1)
    fast &= ~(in_rep & (F_nmm_all > MAX_FAST_MM)).any(axis=1)
    if al.opts.zs_tags and al.overlay is not None:
        fast[:] = False            # Zs tags come from the per-read path
    if spl:
        fast[np.fromiter(spl.keys(), dtype=np.int64)] = False

    # fragment containment of every reported record
    ref = al.fm.ref
    rpos = mpos[rows_all, selc]
    astart = rpos + F_c5
    span = lens[:, None] - F_c5 - F_c3
    f = np.searchsorted(ref.frag_joined, astart, side="right") - 1
    okf = (f >= 0) & (span > 0)
    fc = np.clip(f, 0, len(ref.frag_joined) - 1)
    okf &= astart + span <= ref.frag_joined[fc] + ref.frag_len[fc]
    fast &= ~(in_rep & ~okf).any(axis=1)

    mqc = _MapqCache(sc)
    stats = dict(reads=B, unal=0, uniq=0, multi=0)

    fbuf = b""
    read_end = np.zeros(B, np.int64)   # fbuf end offset per fast read
    frows = np.flatnonzero(fast)
    if frows.size:
        # flatten (read, k) -> records
        nr = nrep[frows]
        rec_read = np.repeat(frows, nr)                     # global read idx
        rec_lidx = np.repeat(np.arange(frows.size), nr)     # local fast idx
        rec_k = np.arange(rec_read.size) - np.repeat(
            np.concatenate([[0], np.cumsum(nr)[:-1]]), nr)
        col = sel[rec_read, rec_k]
        finc = fin[rec_read, col]
        c5 = finc[:, 0].astype(np.int32)
        c3 = finc[:, 1].astype(np.int32)
        nmm = finc[:, 3].astype(np.int32)
        nmm_all = finc[:, 4].astype(np.int32)
        score = msc[rec_read, col].astype(np.int32)
        fw = mfw[rec_read, col]
        pos = mpos[rec_read, col]
        mid = (lens[rec_read] - c5 - c3).astype(np.int32)
        astart_r = astart[rec_read, rec_k]
        fc_r = fc[rec_read, rec_k]
        tidx = ref.frag_tidx[fc_r].astype(np.int32)
        toff = (ref.frag_toff[fc_r] + astart_r
                - ref.frag_joined[fc_r])
        flag = (np.where(fw, 0, 16) | np.where(rec_k > 0, 256, 0)
                ).astype(np.int32)
        nh = np.repeat(nr, nr).astype(np.int32)
        # best/secbest per read -> MAPQ (primary) / 255 (secondary), ZS
        has_sec = nvalid[frows] >= 2
        best = msc[frows, 0]
        sec_col = np.minimum(sel2[frows], K2 - 1)
        secbest = np.where(has_sec, msc[frows, sec_col], INT32_MIN)
        # MAPQ: the reference's exhausted flag is never set in hisat2
        # (hisat2.cpp:3259,3461 init false, never assigned true), so the
        # 60 fast path (unique.h:212) fails only on an equal-scoring
        # second-best; only those need the table (vectorized fast path +
        # memoized scalar calls for the rare rest)
        mapq_read = np.full(frows.size, 60, np.int32)
        need_tab = has_sec & (secbest == best)
        for j in np.flatnonzero(need_tab):
            mapq_read[j] = mqc.get(int(best[j]), int(secbest[j]),
                                   int(lens[frows][j]), False)
        mapq = np.where(rec_k == 0, mapq_read[rec_lidx], 255).astype(np.int32)
        zs = np.where(has_sec[rec_lidx], secbest[rec_lidx].astype(np.int64),
                      int(INT32_MIN)).astype(np.int32)

        # mismatch (col, refchar) pairs from the device kernel
        mc = finc[:, 5:5 + MAX_FAST_MM].astype(np.int32)
        mch = finc[:, 5 + MAX_FAST_MM:5 + 2 * MAX_FAST_MM].astype(np.int64)
        cnt = nmm_all.astype(np.int64)
        mm_off = np.zeros(rec_read.size + 1, np.int64)
        np.cumsum(cnt, out=mm_off[1:])
        selm = np.arange(MAX_FAST_MM)[None, :] < cnt[:, None]
        mm_cols2 = (mc[selm] - np.repeat(c5, cnt)).astype(np.int32)
        mm_ref2 = np.ascontiguousarray(_DEC_ASCII[np.clip(mch[selm], 0, 4)])

        fbuf, rec_ends = _format_records(
            al, batch, frows, rec_read, flag, tidx, toff, mapq, c5, mid, c3,
            score, nmm, zs, nh, mm_cols2, mm_ref2, mm_off)
        last_rec = np.cumsum(nr) - 1
        read_end[frows] = rec_ends[last_rec]

        stats["uniq"] += int((nvalid[frows] == 1).sum())
        stats["multi"] += int((nvalid[frows] >= 2).sum())

    # ---- slow reads ----
    slow = np.flatnonzero(~fast)
    slow_out: dict[int, list] = {}
    plans: dict[int, list] = {}
    ug_items: list[tuple[int, int, bool]] = []
    for i in slow:
        i = int(i)
        if filtered[i]:
            continue
        entries = [("reg", s, p, f, g) for s, p, f, g, _, _
                   in al._ranked_candidates(merged, i, int(min_scs[i]))]
        if i in spl:
            entries += [("spl", c["score"], c["posA"], c["fw"], c)
                        for c in spl[i] if c["score"] >= min_scs[i]]
            # ties: known-site junctions beat contiguous alignments
            entries.sort(key=lambda e: (-e[1], 0 if (e[0] == "spl"
                                                     and e[4]["canon"] == 1)
                                        else 1))
        entries = entries[: al.opts.khits + 1]
        plans[i] = entries
        for kind, s, p, f, g in entries:
            if kind == "reg" and not g:
                ug_items.append((i, int(p), bool(f)))
    lookup: dict[tuple, object] = {}
    if ug_items:
        ridx = np.asarray([x[0] for x in ug_items])
        upos = np.asarray([x[1] for x in ug_items])
        ufw = np.asarray([x[2] for x in ug_items])
        alns = al._finalize_ungapped_list(batch, ridx, upos, ufw, lens[ridx])
        for (i, p, f), a in zip(ug_items, alns):
            lookup[(i, p, f)] = a

    from .pipeline import _dedup_alns
    for i in slow:
        i = int(i)
        if filtered[i]:
            res = ReadResult(filtered="NS" if lens[i] else "LN")
        else:
            res = ReadResult()
            entries = plans.get(i, [])
            if entries:
                res.best = entries[0][1]
                if len(entries) > 1:
                    res.secbest = entries[1][1]
                for kind, s, p, f, g in entries:
                    if kind == "spl":
                        a = al._finalize_spliced(i, batch, g, int(lens[i]))
                    elif g:
                        a = al._finalize(i, batch, s, p, f, True,
                                         int(lens[i]))
                    else:
                        a = lookup.get((i, p, f))
                    if a is not None:
                        res.alns.append(a)
                if res.alns:
                    _dedup_alns(res, al.opts.khits)
                else:
                    res = ReadResult()
        lines = _format_slow(al, batch, i, res, sc)
        if not res.aligned:
            stats["unal"] += 1
        elif len(res.alns) > 1 or (res.secbest is not None
                                   and res.secbest >= min_scs[i]):
            stats["multi"] += 1
        else:
            stats["uniq"] += 1
        slow_out[i] = lines

    # ---- emit in read order: contiguous fast slices + slow interleave ----
    w = writer.out.write
    if not slow_out:
        if fbuf:
            w(fbuf.decode("ascii"))
        return stats
    text = fbuf.decode("ascii") if fbuf else ""
    # prefix-max of fast end offsets: fast output before read i ends at
    # last_end[i - 1] (read_end is monotone over fast reads)
    last_end = np.maximum.accumulate(np.where(fast, read_end, 0))
    prev_end = 0
    for i in sorted(slow_out):
        if text and i > 0:
            end = int(last_end[i - 1])
            if end > prev_end:
                w(text[prev_end:end])
                prev_end = end
        for ln in slow_out[i]:
            w(ln)
    if text and prev_end < len(text):
        w(text[prev_end:])
    return stats


def _samfmt():
    try:
        from ..native import samfmt_lib
        return samfmt_lib()
    except Exception:
        return None


def _format_records(al, batch, frows, rec_read, flag, tidx, toff, mapq,
                    c5, mid, c3, score, nmm, zs, nh,
                    mm_cols, mm_ref, mm_off):
    """Column arrays -> native formatter. frows: fast read indices (name/
    seq data is per read); rec_*: per-record arrays with read indices."""
    ref = al.fm.ref
    Nf = frows.size
    lens = batch.lens.astype(np.int64)[frows]

    # per-read name buffer
    name_parts = [batch.names[int(i)].encode("ascii")[:255] for i in frows]
    name_lens = np.fromiter((len(x) for x in name_parts), np.int64, Nf)
    name_off = np.zeros(Nf + 1, np.int64)
    np.cumsum(name_lens, out=name_off[1:])
    name_buf = np.frombuffer(b"".join(name_parts), np.uint8)

    # per-read SEQ/QUAL in both orientations (packed by true length)
    raw = batch.seqs[frows]
    Lp = raw.shape[1]
    ar = np.arange(Lp)
    in_read = ar[None, :] < lens[:, None]
    seq_f = _DEC_ASCII[np.clip(raw, 0, 4)]
    qual_f = (np.clip(batch.quals[frows], 0, 93) + 33).astype(np.uint8)
    rcidx = np.clip(lens[:, None] - 1 - ar[None, :], 0, Lp - 1)
    seq_r = _COMP_ASCII[np.take_along_axis(seq_f, rcidx, 1)]
    qual_r = np.take_along_axis(qual_f, rcidx, 1)
    seq_off = np.zeros(Nf + 1, np.int64)
    np.cumsum(lens, out=seq_off[1:])
    sf = np.ascontiguousarray(seq_f[in_read])
    qf = np.ascontiguousarray(qual_f[in_read])
    sr = np.ascontiguousarray(seq_r[in_read])
    qr = np.ascontiguousarray(qual_r[in_read])

    # map global read idx -> local fast idx for the C indirection
    l_of = np.zeros(int(frows.max()) + 1 if Nf else 1, np.int64)
    l_of[frows] = np.arange(Nf)
    read_of = l_of[rec_read].astype(np.int32)

    # reference names
    rn_parts = [n.encode("ascii") for n in ref.names]
    rn_off = np.zeros(len(rn_parts) + 1, np.int64)
    np.cumsum([len(x) for x in rn_parts], out=rn_off[1:])
    rn_buf = np.frombuffer(b"".join(rn_parts), np.uint8)
    rn_lens = np.diff(rn_off)

    # exact-ish capacity from true lengths (no heuristic; ADVICE r1 #1)
    nrec = rec_read.size
    per_rec = (210 + name_lens[read_of] + rn_lens[tidx]
               + 2 * lens[read_of] + 12 * np.diff(mm_off))
    cap = int(per_rec.sum()) + 1024

    import ctypes
    lib = _samfmt()
    out = ctypes.create_string_buffer(cap)
    ends = np.zeros(nrec, np.int64)
    total = lib.format_se_batch2(
        np.int32(nrec), read_of, flag,
        np.ascontiguousarray(tidx.astype(np.int32)),
        np.ascontiguousarray((toff + 1).astype(np.int32)),
        mapq, c5, mid, c3, score, nmm, nmm, zs, nh,
        np.ascontiguousarray(name_buf), name_off,
        sf, qf, sr, qr, seq_off,
        np.ascontiguousarray(mm_cols), mm_ref, mm_off,
        np.ascontiguousarray(rn_buf), rn_off,
        out, np.int64(cap), ends)
    assert total >= 0, "SAM buffer overflow despite exact sizing"
    return out.raw[:total], ends


def _format_slow(al, batch, i, res: ReadResult, sc) -> list[str]:
    ref = al.fm.ref
    name = batch.names[i]
    rdlen = int(batch.lens[i])
    seq = batch.seqs[i, :rdlen]
    qual = (batch.quals[i, :rdlen].astype(np.uint8) + 33
            ).tobytes().decode("ascii")
    if not res.aligned:
        return [samio.format_unaligned(name, seq, qual, yf=res.filtered)]
    # exhausted deliberately not passed: the reference's exhaustive[] flag
    # is initialized false and never set (hisat2.cpp:3259,3461), so its
    # MAPQ 60 fast path (unique.h:212) only fails on equal second-best
    mq = _mapq.mapq_v2(res.best, res.secbest, sc.perfect_score(rdlen),
                       sc.min_score(rdlen), local=sc.local)
    nh = len(res.alns)
    lines = []
    for k, aln in enumerate(res.alns):
        rec = samio.SamAlignment(
            rname=(aln.rname_override if aln.rname_override is not None
                   else ref.names[aln.tidx]),
            pos=aln.toff, fw=aln.fw,
            mapq=mq if k == 0 else 255, cigar=aln.cigar, score=aln.score,
            nmm=aln.nmm, gap_opens=aln.gap_opens, gap_exts=aln.gap_exts,
            md=aln.md, nm=aln.nm,
            zs=res.secbest if res.secbest is not None else None,
            xs_strand=aln.xs_strand, zs_snps=aln.zs_snps,
            nh=(aln.nh_override if aln.nh_override is not None else nh),
            secondary=k > 0)
        lines.append(samio.format_aligned(name, seq, qual, rec))
    return lines
