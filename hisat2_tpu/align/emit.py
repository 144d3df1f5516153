"""Fused align + SAM emission (single-end fast path).

Unique, ungapped, unspliced reads — the overwhelming majority — skip all
per-read Python: primary-candidate finalization (clips/score/mismatch
columns) runs on device (`_stage_primary_fin`), and the native C++ batch
formatter (`native/samfmt.cpp`) turns the column arrays into SAM lines.
Only odd reads (multi-mapped, gapped, spliced, filtered,
fragment-boundary, >8 mismatches) drop to the per-read ReadResult path.
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


def align_and_emit(al: Aligner, batch: ReadBatch, writer) -> dict:
    """Align one SE batch and emit SAM; returns the summary-stats dict."""
    lib = _samfmt()
    if lib is None:
        from .pipeline import results_to_sam
        results = al.align_batch(batch)
        return results_to_sam(batch, results, al, writer)

    B = len(batch)
    if al.opts.seed_mode:
        merged, fin_packed = al.device_align_fused(batch)
    else:
        import jax.numpy as jnp
        st, dp = al._device_align(batch)
        merged = al._merged_host(st, dp, B)
        fin_packed = None
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
    spl = merged.get("splice", {})
    aligned = ~filtered & (msc[:, 0] >= min_scs)
    nvalid = (msc >= min_scs[:, None]).sum(axis=1)

    fast = aligned & (nvalid == 1) & ~mgap[:, 0]
    if al.opts.zs_tags and al.overlay is not None:
        fast[:] = False            # Zs tags come from the per-read path
    if spl:
        fast[np.fromiter(spl.keys(), dtype=np.int64)] = False

    fbuf = b""
    ends = np.zeros(0, np.int64)
    fast_idx: dict[int, int] = {}
    if fast.any():
        if fin_packed is None:
            import jax.numpy as jnp
            fin_packed = np.asarray(_stage_primary_fin(
                al.idx, al.sctab, st["seqs2"], st["quals2"], st["lens2"],
                jnp.asarray(mpos[:, 0].astype(np.int32)),
                jnp.asarray(mfw[:, 0]), B))
        packed = fin_packed
        F = dict(c5=packed[:, 0], c3=packed[:, 1], score=packed[:, 2],
                 nmm=packed[:, 3], nmm_all=packed[:, 4],
                 mcols=packed[:, 5:5 + MAX_FAST_MM],
                 mchars=packed[:, 5 + MAX_FAST_MM:5 + 2 * MAX_FAST_MM])
        fast &= F["nmm_all"] <= MAX_FAST_MM
        # fragment containment
        ref = al.fm.ref
        astart = mpos[:, 0] + F["c5"]
        span = lens - F["c5"] - F["c3"]
        f = np.searchsorted(ref.frag_joined, astart, side="right") - 1
        okf = (f >= 0) & (span > 0)
        fc = np.clip(f, 0, len(ref.frag_joined) - 1)
        okf &= astart + span <= ref.frag_joined[fc] + ref.frag_len[fc]
        fast &= okf
        rows = np.flatnonzero(fast)
        if rows.size:
            tidx = ref.frag_tidx[fc[rows]]
            toff = ref.frag_toff[fc[rows]] + astart[rows] \
                - ref.frag_joined[fc[rows]]
            fbuf, ends = _format_fast(al, batch, rows, F, mfw, tidx, toff)
            for j, i in enumerate(rows):
                fast_idx[int(i)] = j

    stats = dict(reads=B, unal=0, uniq=0, multi=0)
    out_parts: list[tuple] = []

    # ---- slow reads: collect candidates, batch-finalize ungapped ones ----
    slow = [i for i in range(B) if i not in fast_idx]
    plans: dict[int, list] = {}
    ug_items: list[tuple[int, int, bool]] = []
    for i in slow:
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
    for i in range(B):
        j = fast_idx.get(i)
        if j is not None:
            stats["uniq"] += 1
            s = int(ends[j - 1]) if j > 0 else 0
            out_parts.append(("f", s, int(ends[j])))
            continue
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
        out_parts.append(("s", lines))

    # emit, merging contiguous fast slices
    w = writer.out.write
    run_s = run_e = None
    for part in out_parts:
        if part[0] == "f":
            if run_s is None:
                run_s, run_e = part[1], part[2]
            elif part[1] == run_e:
                run_e = part[2]
            else:
                w(fbuf[run_s:run_e].decode("ascii"))
                run_s, run_e = part[1], part[2]
        else:
            if run_s is not None:
                w(fbuf[run_s:run_e].decode("ascii"))
                run_s = None
            for ln in part[1]:
                w(ln)
    if run_s is not None:
        w(fbuf[run_s:run_e].decode("ascii"))
    return stats


def _samfmt():
    try:
        from ..native import samfmt_lib
        return samfmt_lib()
    except Exception:
        return None


def _format_fast(al, batch, rows, F, mfw, tidx, toff):
    """Column arrays -> native formatter. rows: read indices on the fast
    path; F: device finalization arrays (full B); tidx/toff per row."""
    N = rows.size
    ref = al.fm.ref
    lens = batch.lens.astype(np.int64)[rows]
    fw = mfw[rows, 0]
    flag = np.where(fw, 0, 16).astype(np.int32)
    rname = tidx.astype(np.int32)
    pos1 = (toff + 1).astype(np.int32)
    mapq = np.full(N, 60, np.int32)     # unique & not exhausted -> 60
    c5 = F["c5"][rows].astype(np.int32)
    c3 = F["c3"][rows].astype(np.int32)
    mid = (lens - c5 - c3).astype(np.int32)
    score = F["score"][rows].astype(np.int32)
    nmm = F["nmm"][rows].astype(np.int32)
    zs = np.full(N, INT32_MIN, np.int32)
    nh = np.ones(N, np.int32)

    # names
    name_parts = [batch.names[int(i)].encode("ascii")[:255] for i in rows]
    name_off = np.zeros(N + 1, np.int64)
    np.cumsum([len(x) for x in name_parts], out=name_off[1:])
    name_buf = np.frombuffer(b"".join(name_parts), np.uint8)

    # oriented SEQ/QUAL: decode raw reads to ASCII, flip rc rows
    raw = batch.seqs[rows]
    ar = np.arange(raw.shape[1])
    in_read = ar[None, :] < lens[:, None]
    seq_ascii = _DEC_ASCII[np.clip(raw, 0, 4)]
    qual_ascii = (np.clip(batch.quals[rows], 0, 93) + 33).astype(np.uint8)
    rc_rows = np.flatnonzero(~fw)
    if rc_rows.size:
        rcidx = np.clip(lens[rc_rows, None] - 1 - ar[None, :], 0,
                        raw.shape[1] - 1)
        seq_ascii[rc_rows] = _COMP_ASCII[
            np.take_along_axis(seq_ascii[rc_rows], rcidx, 1)]
        qual_ascii[rc_rows] = np.take_along_axis(qual_ascii[rc_rows], rcidx, 1)
    seq_buf = np.ascontiguousarray(seq_ascii[in_read])
    qual_buf = np.ascontiguousarray(qual_ascii[in_read])
    seq_off = np.zeros(N + 1, np.int64)
    np.cumsum(lens, out=seq_off[1:])

    # mismatch (col, refchar) pairs from the device kernel
    mc = F["mcols"][rows]                       # (N, max_mm)
    mch = F["mchars"][rows]
    cnt = F["nmm_all"][rows].astype(np.int64)
    mm_off = np.zeros(N + 1, np.int64)
    np.cumsum(cnt, out=mm_off[1:])
    sel = np.arange(mc.shape[1])[None, :] < cnt[:, None]
    mm_cols2 = (mc[sel] - np.repeat(c5, cnt)).astype(np.int32)
    mm_ref2 = np.ascontiguousarray(_DEC_ASCII[np.clip(mch[sel], 0, 4)])

    # reference names
    rn_parts = [n.encode("ascii") for n in ref.names]
    rn_off = np.zeros(len(rn_parts) + 1, np.int64)
    np.cumsum([len(x) for x in rn_parts], out=rn_off[1:])
    rn_buf = np.frombuffer(b"".join(rn_parts), np.uint8)

    import ctypes
    cap = int(N * (320 + int(lens.max()) * 2) + 1024)
    out = ctypes.create_string_buffer(cap)
    ends = np.zeros(N, np.int64)
    lib = _samfmt()
    total = lib.format_se_batch(
        np.int32(N), flag, rname, pos1, mapq, c5, mid, c3,
        score, nmm, nmm, zs, nh,
        np.ascontiguousarray(name_buf), name_off,
        seq_buf, qual_buf, seq_off,
        mm_cols2, mm_ref2, mm_off,
        np.ascontiguousarray(rn_buf), rn_off,
        out, ends)
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
    mq = _mapq.mapq_v2(res.best, res.secbest, sc.perfect_score(rdlen),
                       sc.min_score(rdlen), local=sc.local)
    nh = len(res.alns)
    lines = []
    for k, aln in enumerate(res.alns):
        rec = samio.SamAlignment(
            rname=ref.names[aln.tidx], pos=aln.toff, fw=aln.fw,
            mapq=mq if k == 0 else 255, cigar=aln.cigar, score=aln.score,
            nmm=aln.nmm, gap_opens=aln.gap_opens, gap_exts=aln.gap_exts,
            md=aln.md, nm=aln.nm,
            zs=res.secbest if res.secbest is not None else None,
            xs_strand=aln.xs_strand, zs_snps=aln.zs_snps,
            nh=nh, secondary=k > 0)
        lines.append(samio.format_aligned(name, seq, qual, rec))
    return lines
