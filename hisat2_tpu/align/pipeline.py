"""End-to-end DNA alignment pipeline (unspliced).

Equivalent role to the reference's HI_Aligner::go for DNA
(hi_aligner.h:4048: nextBWT -> partialSearch -> align -> hybridSearch ->
getGenomeCoords -> extend/DP -> report), re-architected as a fixed sequence
of batched device stages over a read wavefront:

  1. both orientations of every read          (2B, L)
  2. maximal-segment backward search          ops/search.partial_search
  3. SA-range expansion -> candidate loci     ops/locate.expand_range
  4. dedup + ungapped verify/score            ops/extend.verify_ungapped
  5. top-K select per orientation             lax.top_k
  6. gapped DP rescue for imperfect rows      ops/sw.dp_score_batch
  7. host: best/secbest merge, CIGAR/MD, MAPQ, SAM fields

Stages 1-6 are jit-compiled once per (B, L) shape; the host only sees a few
small per-read arrays (top candidate positions/scores) plus the text windows
of the winners.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..index.fm_index import FMIndex
from ..io.reads import ReadBatch
from ..io import sam as samio
from ..ops import search as _search, locate as _locate, extend as _extend, sw as _sw
from ..ops.extend import NEG_INF
from ..utils import alphabet
from . import mapq as _mapq
from .scoring import Scoring, DEFAULT_SCORING


@dataclass
class AlignerOpts:
    khits: int = 5                 # -k: max alignments reported per read
    max_seeds: int = 16            # segments used per orientation
    locs_per_seg: int = 8          # SA rows expanded per segment
    top_cands: int = 16            # candidates kept after ungapped ranking
    dp_pad: int = 16               # ref-window padding each side for DP
    no_dp: bool = False            # disable gapped rescue
    minins: int = 0                # -I
    maxins: int = 1000             # -X
    fr: str = "fr"                 # --fr/--rf/--ff
    no_mixed: bool = False
    no_discordant: bool = False


@dataclass
class Alignment:
    """One resolved alignment on the joined text (host-side)."""
    joined_pos: int
    fw: bool
    score: int
    cigar: list[tuple[str, int]] = field(default_factory=list)
    nmm: int = 0
    gap_opens: int = 0
    gap_exts: int = 0
    md: str = ""
    nm: int = 0
    n_refns: int = 0
    tidx: int = -1
    toff: int = -1

    @property
    def ref_span(self) -> int:
        return sum(n for op, n in self.cigar if op in ("M", "D", "N", "=", "X"))


@dataclass
class ReadResult:
    """Alignment outcome for one read: primary + secondaries + MAPQ info."""
    alns: list[Alignment] = field(default_factory=list)   # best first
    best: int = NEG_INF
    secbest: int | None = None
    filtered: str | None = None    # YF:Z code (e.g. 'NS')

    @property
    def aligned(self) -> bool:
        return bool(self.alns)


# ---------------------------------------------------------------------------
# Device stages
# ---------------------------------------------------------------------------

def _with_revcomp(seqs: jax.Array, quals: jax.Array, lens: jax.Array):
    """(B, L) -> (2B, L): rows [0:B) forward, [B:2B) reverse-complement."""
    B, L = seqs.shape
    pos = jnp.arange(L, dtype=jnp.int32)
    rev = lens[:, None] - 1 - pos[None, :]
    ok = rev >= 0
    gat = jnp.clip(rev, 0, L - 1)
    rc = jnp.where(ok, jnp.take_along_axis(seqs.astype(jnp.int32), gat, 1), 4)
    comp = jnp.array([3, 2, 1, 0, 4], jnp.int32)
    rc = comp[jnp.clip(rc, 0, 4)]
    rq = jnp.where(ok, jnp.take_along_axis(quals.astype(jnp.int32), gat, 1), 0)
    return (jnp.concatenate([seqs.astype(jnp.int32), rc]),
            jnp.concatenate([quals.astype(jnp.int32), rq]),
            jnp.concatenate([lens, lens]))


@partial(jax.jit, static_argnames=("max_seeds", "locs_per_seg", "top_cands",
                                   "min_seg_len"))
def _stage_candidates(idx: dict, sctab: dict, seqs, quals, lens,
                      max_seeds: int, locs_per_seg: int, top_cands: int,
                      min_seg_len: int = 3):
    """Stages 1-5: orientations, search, expand, dedup, verify, top-K.

    Returns per orientation-row (R = 2B): top candidate positions (R, T),
    scores (R, T), nmm (R, T), plus exhausted flags (R,) — True when every
    segment's SA interval fit within locs_per_seg (candidate set complete).
    """
    seqs2, quals2, lens2 = _with_revcomp(seqs, quals, lens)
    R, L = seqs2.shape

    hits = _search.partial_search(idx, seqs2, lens2, max_hits=max_seeds)
    # candidate start = SA[row] - segment read-offset
    locs, lvalid = _locate.expand_range(idx, hits["top"], hits["bot"],
                                        locs_per_seg)        # (R, S, locs)
    seg_ok = (jnp.arange(max_seeds, dtype=jnp.int32)[None, :]
              < hits["n"][:, None])                          # (R, S)
    # anchor length floor: the reference's _minK = ceil(log4 |genome|)
    # (hi_aligner.h:3979) — shorter matches occur by chance everywhere and
    # only waste candidate budget
    seg_ok &= hits["len"] >= min_seg_len
    cand = locs - hits["off"][:, :, None]
    valid = lvalid & seg_ok[:, :, None]
    cand = cand.reshape(R, -1)
    valid = valid.reshape(R, -1)
    width = hits["bot"] - hits["top"]
    exhausted = jnp.all(jnp.where(seg_ok, width <= locs_per_seg, True), axis=1)

    # dedup identical positions (sort asc; invalid -> +inf sentinel), then
    # compact: only the first `verify_cands` distinct loci are verified —
    # rows with more are repetitive and capped (the reference similarly
    # bounds exploration per read, hisat2.cpp:3480-3513)
    big = jnp.int32(1 << 30)
    key = jnp.where(valid, cand, big)
    skey = jnp.sort(key, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((R, 1), bool), skey[:, 1:] == skey[:, :-1]], axis=1)
    skey = jnp.where(dup, big, skey)
    verify_cands = min(3 * top_cands, skey.shape[1])
    skey = jnp.sort(skey, axis=1)[:, :verify_cands]
    vcand = skey
    vvalid = skey < big

    res = _extend.verify_ungapped(idx, sctab, seqs2, quals2, lens2,
                                  vcand, vvalid)
    T = top_cands
    sc_top, ti = lax.top_k(res["score"], T)
    pos_top = jnp.take_along_axis(vcand, ti, 1)
    nmm_top = jnp.take_along_axis(res["nmm"], ti, 1)
    return dict(pos=pos_top, score=sc_top, nmm=nmm_top, exhausted=exhausted,
                seqs2=seqs2, quals2=quals2, lens2=lens2)


@partial(jax.jit, static_argnames=("dp_pad",))
def _stage_dp(idx: dict, sctab: dict, seqs2, quals2, lens2,
              pos_top, dp_rows, dp_pad: int):
    """Stage 6: gapped DP scores for the top candidates of (pre-compacted)
    rows. pos_top (R', T); dp_rows (R',) bool mask. Returns (R', T) scores."""
    R, L = seqs2.shape
    T = pos_top.shape[1]
    W = L + 2 * dp_pad
    wstart = pos_top - dp_pad                                   # (R', T)
    ref = _rank_text_window(idx, wstart.reshape(-1), W)         # (R'*T, W)
    rd = jnp.repeat(seqs2, T, axis=0)
    q = jnp.repeat(quals2, T, axis=0)
    rl = jnp.repeat(lens2, T)
    score = _sw.dp_score_batch(sctab, rd, q, rl, ref).reshape(R, T)
    return jnp.where(dp_rows[:, None], score, NEG_INF)


def _rank_text_window(idx, start, length):
    from ..ops import rank as _rank
    return _rank.text_window(idx, start, length)


# ---------------------------------------------------------------------------
# Host-side finalization
# ---------------------------------------------------------------------------

class Aligner:
    """Batched aligner over a built FM index (DNA / --no-spliced-alignment)."""

    def __init__(self, fm: FMIndex, scoring: Scoring = DEFAULT_SCORING,
                 opts: AlignerOpts | None = None):
        self.fm = fm
        self.scoring = scoring
        self.opts = opts or AlignerOpts()
        self.idx = fm.device
        self.sctab = scoring.device_tables()
        # reference _minK: minimum anchor = ceil(log4 |genome|), >= 8
        self.min_seg_len = max(8, int(np.ceil(np.log(max(fm.n, 4))
                                              / np.log(4))))

    # ---- device orchestration ----

    def _device_align(self, batch: ReadBatch):
        o = self.opts
        B = len(batch)
        seqs = jnp.asarray(batch.seqs)
        quals = jnp.asarray(batch.quals)
        lens = jnp.asarray(batch.lens)
        st = _stage_candidates(self.idx, self.sctab, seqs, quals, lens,
                               o.max_seeds, o.locs_per_seg, o.top_cands,
                               self.min_seg_len)
        dp_sc = None
        if not o.no_dp:
            # Gapped rescue only for reads that would otherwise go
            # unaligned: an indel read's ungapped score collapses (every
            # position past the gap mismatches), while mismatch-only reads
            # keep a passing score and never need DP. Triggered rows are
            # compacted into a fixed-size buffer so the expensive DP shape
            # stays static and small.
            row_best = np.asarray(st["score"].max(axis=1))
            read_best = np.maximum(row_best[:B], row_best[B:])
            min_scs = np.ceil(self.scoring.score_min.I
                              + self.scoring.score_min.S
                              * batch.lens).astype(np.int64)
            need_read = read_best < min_scs
            if need_read.any():
                rows = np.concatenate([np.flatnonzero(need_read),
                                       np.flatnonzero(need_read) + B])
                budget = max(64, B // 8)
                rows = rows[:2 * budget]
                pad = (-rows.size) % 64
                rows_p = np.pad(rows, (0, pad))          # repeat row 0: harmless
                ridx = jnp.asarray(rows_p, jnp.int32)
                dp_rows = _stage_dp(
                    self.idx, self.sctab,
                    st["seqs2"][ridx], st["quals2"][ridx], st["lens2"][ridx],
                    st["pos"][ridx],
                    jnp.ones(rows_p.size, bool), o.dp_pad)
                dp_full = np.full(st["score"].shape, NEG_INF, np.int64)
                dp_full[rows] = np.asarray(dp_rows)[:rows.size]
                dp_sc = dp_full
        return st, dp_sc

    # ---- host finalization ----

    def align_batch(self, batch: ReadBatch) -> list[ReadResult]:
        B = len(batch)
        st, dp_sc = self._device_align(batch)
        pos = np.asarray(st["pos"])            # (2B, T)
        un_sc = np.asarray(st["score"])
        dp = np.asarray(dp_sc) if dp_sc is not None else None
        merged = self._merge_candidates(B, pos, un_sc, dp)

        lens = batch.lens
        min_scs = np.ceil(self.scoring.score_min.I
                          + self.scoring.score_min.S * lens).astype(np.int64)
        nNs = ((batch.seqs >= 4)
               & (np.arange(batch.seqs.shape[1])[None, :] < lens[:, None])
               ).sum(axis=1)
        max_ns = (self.scoring.n_ceil.I + self.scoring.n_ceil.S * lens)

        results = []
        for i in range(B):
            rdlen = int(lens[i])
            if rdlen == 0 or nNs[i] > max_ns[i]:
                results.append(ReadResult(filtered="NS" if rdlen else "LN"))
                continue
            cands = self._ranked_candidates(merged, i, int(min_scs[i]))
            results.append(self._select(i, batch, cands, int(min_scs[i]), rdlen))
        return results

    def _merge_candidates(self, B, pos, un_sc, dp):
        """Vectorized merge of fw/rc candidate grids into per-read ranked
        arrays (host NumPy; replaces a per-read Python loop)."""
        T = pos.shape[1]
        sc = un_sc if dp is None else np.maximum(un_sc, dp)
        gapped = (np.zeros_like(sc, bool) if dp is None else dp > un_sc)
        # (2B, T) -> (B, 2T): forward block then rc block per read
        cat = lambda a: np.concatenate([a[:B], a[B:]], axis=1)
        sc2, pos2, gap2 = cat(sc), cat(pos), cat(gapped)
        fw2 = np.zeros((B, 2 * T), bool)
        fw2[:, :T] = True
        order = np.argsort(-sc2, axis=1, kind="stable")
        return dict(score=np.take_along_axis(sc2, order, 1),
                    pos=np.take_along_axis(pos2, order, 1),
                    fw=np.take_along_axis(fw2, order, 1),
                    gapped=np.take_along_axis(gap2, order, 1))

    def _ranked_candidates(self, merged, i, min_sc, limit=None):
        """Candidate tuples for read i, best-first, scores >= min_sc,
        deduped by (pos, fw)."""
        limit = limit or (self.opts.khits + 2)
        out = []
        seen = set()
        sc = merged["score"][i]
        for t in range(sc.shape[0]):
            s = int(sc[t])
            if s < min_sc:
                break  # sorted desc
            key = (int(merged["pos"][i, t]), bool(merged["fw"][i, t]))
            if key in seen:
                continue
            seen.add(key)
            out.append((s, key[0], key[1], bool(merged["gapped"][i, t]), i, t))
            if len(out) >= limit:
                break
        return out

    def _select(self, i, batch, cands, min_sc, rdlen) -> ReadResult:
        res = ReadResult()
        valid = [c for c in cands if c[0] >= min_sc]
        if not valid:
            return res
        res.best = valid[0][0]
        if len(valid) > 1:
            res.secbest = valid[1][0]
        for s, p, fw, gapped, row, t in valid[: self.opts.khits]:
            aln = self._finalize(i, batch, s, p, fw, gapped, rdlen)
            if aln is not None:
                res.alns.append(aln)
        if not res.alns:
            return ReadResult()
        return res

    def _finalize(self, i, batch, score, pos, fw, gapped, rdlen) -> Alignment | None:
        """Build CIGAR/MD for one winning candidate (host, NumPy)."""
        ref = self.fm.ref
        rd = batch.seqs[i, :rdlen].astype(np.uint8)
        q = batch.quals[i, :rdlen].astype(np.int32)
        if not fw:
            rd = alphabet.revcomp(rd)
            q = q[::-1].copy()
        if not gapped:
            window = ref.get_stretch(pos, rdlen)
            c5, c3, sub_score = _best_clip(self.scoring, rd, q, window)
            mid = rdlen - c5 - c3
            if mid <= 0:
                return None
            cigar = ([("S", c5)] if c5 else []) + [("M", mid)] \
                + ([("S", c3)] if c3 else [])
            md, nm = samio.make_md(rd[c5:rdlen - c3], window[c5:rdlen - c3],
                                   [("M", mid)])
            a_rd, a_rf = rd[c5:rdlen - c3], window[c5:rdlen - c3]
            mmmask = (a_rd != a_rf) | (a_rd >= 4) | (a_rf >= 4)
            aln = Alignment(joined_pos=pos + c5, fw=fw, score=score,
                            cigar=cigar, nmm=int(mmmask.sum()), md=md, nm=nm)
        else:
            pad = self.opts.dp_pad
            wstart = pos - pad
            W = rdlen + 2 * pad
            window = ref.get_stretch(wstart, W)
            s, ref_start, cigar, mds = _sw.dp_traceback(self.scoring, rd, q, window)
            jpos = wstart + ref_start
            span = sum(n for op, n in cigar if op in ("M", "D"))
            md, nm = samio.make_md(rd, window[ref_start:ref_start + span], cigar)
            nmm = len(mds)
            gap_opens = sum(1 for op, n in cigar if op in ("I", "D"))
            gap_exts = sum(n - 1 for op, n in cigar if op in ("I", "D"))
            aln = Alignment(joined_pos=jpos, fw=fw, score=s, cigar=cigar,
                            nmm=nmm, gap_opens=gap_opens, gap_exts=gap_exts,
                            md=md, nm=nm)
        loc = ref.joined_to_text(aln.joined_pos, aln.ref_span)
        if loc is None:
            return None
        aln.tidx, aln.toff = loc
        return aln


def _best_clip(scoring, rd: np.ndarray, q: np.ndarray, window: np.ndarray
               ) -> tuple[int, int, int]:
    """Optimal 5'/3' soft-clip lengths for an ungapped placement (host
    mirror of the max-subarray scorer in ops/extend.py). Returns
    (clip5, clip3, score)."""
    L = rd.size
    mm_pens = scoring.mm_pens()
    scp = scoring.sc_pens()[np.clip(q, 0, 63)].astype(np.int64)
    isn = (rd >= 4) | (window >= 4)
    mm = (rd != window) & ~isn
    s = np.where(mm, -mm_pens[np.clip(q, 0, 63)], 0)
    s = np.where(isn, -scoring.n_pen, s)
    s = s + np.where(~mm & ~isn, scoring.match_bonus, 0)
    g = s + scp
    P = np.concatenate([[0], np.cumsum(g)])
    pref_min = np.minimum.accumulate(P)
    ends = P[1:] - pref_min[:-1]
    # ties broken toward fewer clipped bases (reference keeps full length
    # when a clip doesn't strictly beat the mismatch it removes)
    k = L - 1 - int(np.argmax(ends[::-1]))
    best = int(ends[k])
    if best <= 0:   # fully-clipped degenerate
        return 0, 0, int(s.sum())
    start = int(np.argmin(P[:k + 1]))
    score = best - int(scp.sum())
    return start, L - (k + 1), score


# ---------------------------------------------------------------------------
# SAM emission (single-end)
# ---------------------------------------------------------------------------

def results_to_sam(batch: ReadBatch, results: list[ReadResult],
                   aligner: Aligner, writer: samio.SamWriter) -> dict:
    """Emit SAM lines for a single-end batch; returns summary counts."""
    sc = aligner.scoring
    ref = aligner.fm.ref
    stats = dict(reads=0, unal=0, uniq=0, multi=0)
    for i, res in enumerate(results):
        stats["reads"] += 1
        name = batch.names[i]
        rdlen = int(batch.lens[i])
        seq = batch.seqs[i, :rdlen]
        qual = "".join(chr(int(x) + 33) for x in batch.quals[i, :rdlen])
        if not res.aligned:
            stats["unal"] += 1
            writer.emit(int(batch.rdids[i]), [samio.format_unaligned(
                name, seq, qual, yf=res.filtered)])
            continue
        if len(res.alns) > 1 or (res.secbest is not None
                                 and res.secbest >= sc.min_score(rdlen)):
            stats["multi"] += 1
        else:
            stats["uniq"] += 1
        mq = _mapq.mapq_v2(res.best, res.secbest, sc.perfect_score(rdlen),
                           sc.min_score(rdlen), local=sc.local)
        lines = []
        nh = len(res.alns)
        for k, aln in enumerate(res.alns):
            rec = samio.SamAlignment(
                rname=ref.names[aln.tidx], pos=aln.toff, fw=aln.fw,
                mapq=mq if k == 0 else 255, cigar=aln.cigar, score=aln.score,
                nmm=aln.nmm, gap_opens=aln.gap_opens, gap_exts=aln.gap_exts,
                md=aln.md, nm=aln.nm,
                zs=res.secbest if res.secbest is not None else None,
                nh=nh, secondary=k > 0)
            lines.append(samio.format_aligned(name, seq, qual, rec))
        writer.emit(int(batch.rdids[i]), lines)
    return stats
