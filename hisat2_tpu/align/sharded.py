"""Alignment over a genome-sharded index (index/sharded.py).

Single-chip mode streams shards: every read batch's device stage runs
against shard k (one shard's arrays resident in HBM at a time), fastpacks
and candidate grids are collected per shard, and the per-read results
merge in GLOBAL coordinates before the shared finishing path emits SAM.
On a multi-chip mesh the same merge runs across devices instead of
passes (parallel/mesh.py holds one shard per device and all-gathers the
per-shard fastpacks).

Merge policy: the winning shard's report list is used verbatim when only
one shard places the read (the overwhelming case); reads hit by several
shards fall to the exact per-read path over the concatenated candidate
grids (cross-shard multireads must interleave reports by score).
"""

from __future__ import annotations

import numpy as np

from ..index.sharded import ShardedIndex
from ..io.reads import ReadBatch
from .pipeline import Aligner, AlignerOpts, NEG_INF, FASTPACK_REP
from .scoring import Scoring, DEFAULT_SCORING


class _ShardSSView:
    """Shard-local device view of the GLOBAL splice-site DB: the fused
    splice stage bakes site tables into each per-shard dispatch, in that
    shard's local coordinates. Mirrors SpliceSiteDB.device_arrays4's
    padding (power-of-two cap, INT32_MAX sentinels)."""

    def __init__(self, db, base: int, length: int):
        self.db = db
        self.base = int(base)
        self.length = int(length)
        self._cache = None
        self._cache_v = -1

    def version(self) -> int:
        return self.db.version()

    def __len__(self) -> int:
        return len(self.db)

    def device_arrays4(self):
        if self._cache is not None and self._cache_v == self.db.version():
            return self._cache
        self._cache_v = self.db.version()
        import jax.numpy as jnp
        arr = self.db._sorted_pairs()
        inb = ((arr[:, 0] >= self.base)
               & (arr[:, 1] < self.base + self.length))
        loc = arr[inb] - self.base
        n = loc.shape[0]
        cap = 1024
        while cap < n:
            cap *= 2
        big = np.int32(0x7FFFFFFF)
        pads = np.full((4, cap), big, np.int32)
        pads[0, :n] = loc[:, 0]
        pads[1, :n] = loc[:, 1]
        order = np.argsort(loc[:, 1], kind="stable")
        pads[2, :n] = loc[order, 1]
        pads[3, :n] = loc[order, 0]
        self._cache = tuple(jnp.asarray(p) for p in pads)
        return self._cache

    def device_arrays(self):
        return self.device_arrays4()[:2]


class ShardedAligner:
    def __init__(self, sh: ShardedIndex, scoring: Scoring = DEFAULT_SCORING,
                 opts: AlignerOpts | None = None):
        self.sh = sh
        self.scoring = scoring
        self.opts = opts or AlignerOpts()
        # fast-path packs carry positions in two 16-bit lanes; genomes
        # whose joined length exceeds 2^32 would wrap silently — refuse
        # loudly (slow-path grids are int64 and unaffected)
        total_len = int(sh.bases[-1]) + int(sh.shards[-1].ref.n)
        if total_len >= (1 << 32):
            raise ValueError(
                f"sharded fast-path positions are 32-bit: joined genome "
                f"length {total_len} exceeds 2^32 (split the reference "
                f"or raise the pack position width)")
        self.host = Aligner.host_only(sh.ref, scoring, self.opts)
        if getattr(sh, "snps", None) is not None:
            # graph mode: the host finalization path needs the GLOBAL SNV
            # overlay (free alt-allele mismatches, Zs edits) and SNP table
            from ..io.annotations import SNP_DEL, SNP_INS
            self.host.overlay = sh.snv_overlay
            self.host.snps = sh.snps
            for si in range(len(sh.snps)):
                t = int(sh.snps.types[si])
                if t == SNP_DEL:
                    self.host._del_snps.add((int(sh.snps.jpos[si]),
                                             int(sh.snps.lens[si])))
                elif t == SNP_INS:
                    self.host._ins_snps[int(sh.snps.jpos[si])] = \
                        sh.snps.ins_seqs[si]
        self._active: Aligner | None = None
        self._active_i = -1
        # resident-shard cache: a shard's arrays upload ONCE and stay in
        # HBM while the estimated total fits the budget — re-uploading
        # 4-5GB per shard switch over the tunnel cost ~150s per pass at
        # Gbp scale (the round-5 flagship's entire throughput gap).
        # HISAT2_TPU_HBM_GB overrides (v5e default leaves ~4GB headroom
        # for dispatch temporaries + executables).
        import os as _os
        self._resident: dict[int, Aligner] = {}
        self._hbm_budget = int(float(
            _os.environ.get("HISAT2_TPU_HBM_GB", "8")) * (1 << 30))

    def _shard_dev_bytes(self, i: int) -> int:
        """Estimated HBM residency of shard i's index arrays."""
        fm = self.sh.shards[i]
        tot = int(fm.text_packed.nbytes)
        if fm.st_pos is not None:
            tot += int(fm.st_pos.nbytes)
        if fm.st_starts is not None:
            tot += int(fm.st_starts.nbytes)
            if fm.st_starts.size <= (1 << 24) + 1:
                tot += 2 * int(fm.st_starts.nbytes)   # st_pairs rows
        if getattr(fm, "snv_overlay", None) is not None:
            tot += int(fm.n) // 2                 # 4-bit packed overlay
        return tot + (64 << 20)

    def _activate(self, i: int) -> Aligner:
        """Bring shard i's arrays into HBM, keeping previously activated
        shards resident while the budget allows (evict oldest first)."""
        if i in self._resident:
            self._active = self._resident[i]
            self._active_i = i
            return self._active
        need = self._shard_dev_bytes(i)
        used = sum(self._shard_dev_bytes(j) for j in self._resident)
        while self._resident and used + need > self._hbm_budget:
            j, al_old = next(iter(self._resident.items()))
            del self._resident[j]
            al_old.idx = None
            self.sh.shards[j].__dict__.pop("device", None)
            used -= self._shard_dev_bytes(j)
            import gc
            gc.collect()
        al = Aligner(self.sh.shards[i], self.scoring, self.opts)
        if self.opts.spliced:
            # fused splice stage sees the GLOBAL site DB through a
            # shard-local coordinate view
            al.ssdb = _ShardSSView(
                self.host.ssdb, self.sh.bases[i],
                int(self.sh.shards[i].n))
        self._resident[i] = al
        self._active = al
        self._active_i = i
        return al

    def align_and_emit(self, batches: list[ReadBatch], writer) -> dict:
        """Two-pass (pass per shard) SE alignment + SAM emission for a
        list of batches; returns merged summary stats. In spliced (RNA)
        mode each shard's fused dispatch also runs splice pass-1 against
        its local text (shard-local site-table view), and the lanes merge
        into global coordinates for the host finish — residual junction
        work scores on the host NumPy mirror (ops/splice_host)."""
        from . import emit as _emit

        S = len(self.sh)
        spliced = self.opts.spliced
        ssv0 = self.host.ssdb.version()
        per_shard_fp: list[list[np.ndarray]] = [[] for _ in range(S)]
        per_shard_mg: list[list[np.ndarray]] = [[] for _ in range(S)]
        per_shard_ex: list[list[dict]] = [[] for _ in range(S)]
        for s in range(S):
            al = self._activate(s)
            pend = []
            for b in batches:
                out = al.device_align_fast(b)
                fp_dev, merged_dev = out[:2]
                ex = out[2] if len(out) > 2 else {}
                try:
                    merged_dev.copy_to_host_async()
                except Exception:
                    pass
                pend.append((fp_dev, merged_dev, ex))
            for fp_dev, merged_dev, ex in pend:
                per_shard_fp[s].append(np.asarray(fp_dev))
                per_shard_mg[s].append(np.asarray(merged_dev))
                per_shard_ex[s].append(
                    {k: np.asarray(ex[k]) for k in
                     ("splanes32", "splanes16", "spl_cov", "spl_nsel",
                      "splanes32b", "splanes16b", "spl_nsel2")
                     if k in ex} if spliced else {})

        totals: dict = {}
        for bi, b in enumerate(batches):
            fp, force_slow, merged = self._merge_shard_results(
                [per_shard_fp[s][bi] for s in range(S)],
                [per_shard_mg[s][bi] for s in range(S)])
            slow_pack = (self._merge_splice_lanes(
                [per_shard_ex[s][bi] for s in range(S)], ssv0)
                if spliced else None)
            if self.opts.tmo:
                # --tmo re-derives best/secbest from the surviving
                # (known-junction-spliced) candidates, so it flows
                # through the exact ReadResult path (results_to_sam
                # applies tmo_filter_result per read)
                from .pipeline import results_to_sam
                if spliced:
                    dl = None
                    if slow_pack is not None:
                        dl = (slow_pack["splanes32"],
                              slow_pack["splanes16"],
                              slow_pack["spl_cov"],
                              int(slow_pack["spl_nsel"]),
                              int(slow_pack["spl_ssv"]),
                              slow_pack.get("splanes32b"),
                              slow_pack.get("splanes16b"),
                              int(slow_pack.get("spl_nsel2", 0)))
                    n0 = len(self.host.ssdb)
                    self.host._splice_rescue(b, merged, dev_lanes=dl)
                    if len(self.host.ssdb) != n0:
                        self.host._splice_rescue(b, merged)
                res = self.host._finalize_results(b, merged)
                st = results_to_sam(b, res, self.host, writer)
            else:
                st = _emit._finish_fastpack(self.host, b, fp, None,
                                            writer,
                                            force_slow=force_slow,
                                            merged_full=merged,
                                            slow_pack=slow_pack)
            for k, v in st.items():
                totals[k] = totals.get(k, 0) + v
        return totals

    def _merge_splice_lanes(self, exs: list[dict], ssv0: int
                            ) -> dict | None:
        """Globalize + concatenate per-shard fused splice lanes.
        Returns a slow_pack dict for emit._finish_fastpack (splanes32/16,
        spl_cov, spl_nsel, spl_ssv) or None when any shard lacked lanes
        or overflowed its NL cap (wholesale host fallback)."""
        if not exs or any("splanes16" not in ex for ex in exs):
            return None
        sp32s, sp16s = [], []
        sp32bs, sp16bs = [], []
        cov0 = np.zeros_like(np.asarray(exs[0]["spl_cov"]))
        cov1 = np.zeros_like(cov0)
        off = 0
        for s, ex in enumerate(exs):
            if int(ex["spl_nsel"]) > ex["splanes16"].shape[0]:
                return None
            base = int(self.sh.bases[s])
            sp16 = ex["splanes16"].astype(np.int64)
            live = sp16[:, 4] != 0
            remap = np.cumsum(live) - 1 + off     # old NL idx -> merged
            sp16s.append(sp16[live])
            sp32s.append(ex["splanes32"].astype(np.int64)[live] + base)
            if "splanes16b" in ex:
                s16b = ex["splanes16b"].astype(np.int64)
                lb = s16b[:, 4] != 0
                s16b = s16b[lb]
                s16b[:, 1] = remap[np.clip(s16b[:, 1], 0, live.size - 1)]
                sp16bs.append(s16b)
                sp32bs.append(ex["splanes32b"].astype(np.int64)[lb]
                              + base)
            off += int(live.sum())
            cov = np.asarray(ex["spl_cov"])
            cov0 |= cov & 1
            cov1 |= cov & 2
        sp16c = np.concatenate(sp16s)
        sp32c = np.concatenate(sp32s)
        out = dict(splanes32=sp32c, splanes16=sp16c,
                   spl_cov=(cov0 | cov1).astype(np.int8),
                   spl_nsel=np.int64(sp16c.shape[0]),
                   spl_ssv=np.int64(ssv0))
        if sp16bs and len(sp16bs) == len(exs):
            out["splanes16b"] = np.concatenate(sp16bs)
            out["splanes32b"] = np.concatenate(sp32bs)
            out["spl_nsel2"] = np.int64(out["splanes16b"].shape[0])
        return out

    def _merge_grids(self, mgs: list[np.ndarray]) -> dict:
        """Per-shard (B, K2, 3) candidate grids -> one global-coordinate
        merged dict sorted by score (the grid half of
        _merge_shard_results)."""
        bases = np.asarray(self.sh.bases, np.int64)
        msc = np.concatenate([m[:, :, 0].astype(np.int64) for m in mgs], 1)
        mpos = np.concatenate(
            [m[:, :, 1].astype(np.int64) + bases[s]
             for s, m in enumerate(mgs)], 1)
        mfl = np.concatenate([m[:, :, 2] for m in mgs], 1)
        order = np.argsort(-msc, axis=1, kind="stable")
        return dict(
            score=np.take_along_axis(msc, order, 1),
            pos=np.take_along_axis(mpos, order, 1),
            fw=np.take_along_axis((mfl & 1) > 0, order, 1),
            gapped=np.take_along_axis((mfl & 2) > 0, order, 1))

    def align_and_emit_pe_rna(self, pair_batches, writer) -> dict:
        """Paired-end SPLICED alignment over a sharded index: each mate
        runs the per-shard fused spliced dispatch (SE core + splice
        pass-1); grids and junction lanes merge into global coordinates,
        and the host pairing ladder (paired.align_pairs over premerged
        grids + host splice rescue) resolves concordance — junctions and
        mate windows are intra-chromosome, hence intra-shard, so every
        shard's candidate search is complete."""
        from . import paired as _paired

        S = len(self.sh)
        ssv0 = self.host.ssdb.version()
        per: list[list[tuple]] = [[] for _ in range(S)]
        keys = ("splanes32", "splanes16", "spl_cov", "spl_nsel",
                      "splanes32b", "splanes16b", "spl_nsel2")
        for s in range(S):
            al = self._activate(s)
            pend = []
            for b1, b2 in pair_batches:
                _fp1, mg1, ex1 = al.device_align_fast(b1)
                _fp2, mg2, ex2 = al.device_align_fast(b2)
                for d in (mg1, mg2):
                    try:
                        d.copy_to_host_async()
                    except Exception:
                        pass
                pend.append((mg1, mg2, ex1, ex2))
            for mg1, mg2, ex1, ex2 in pend:
                per[s].append((
                    np.asarray(mg1), np.asarray(mg2),
                    {k: np.asarray(ex1[k]) for k in keys if k in ex1},
                    {k: np.asarray(ex2[k]) for k in keys if k in ex2}))

        from . import paired_rna as _prna
        totals: dict = {}
        for bi, (b1, b2) in enumerate(pair_batches):
            m1 = self._merge_grids([per[s][bi][0] for s in range(S)])
            m2 = self._merge_grids([per[s][bi][1] for s in range(S)])
            dls = []
            for mi in (2, 3):
                sp = self._merge_splice_lanes(
                    [per[s][bi][mi] for s in range(S)], ssv0)
                dls.append(None if sp is None else (
                    sp["splanes32"], sp["splanes16"], sp["spl_cov"],
                    int(sp["spl_nsel"]), int(sp["spl_ssv"]),
                    sp.get("splanes32b"), sp.get("splanes16b"),
                    int(sp.get("spl_nsel2", 0))))
            if self.opts.tmo:
                # --tmo: the pair ladder + pairs_to_sam apply
                # _tmo_filter_pair (alt-pair fallback, mixed demotion)
                res = _paired.align_pairs(self.host, b1, b2,
                                          premerged=(m1, m2),
                                          dev_lanes=tuple(dls))
                st = _paired.pairs_to_sam(b1, b2, res, self.host, writer)
            else:
                _prna.rescue_pair_rna(self.host, b1, b2, m1, m2,
                                      dev_lanes=tuple(dls))
                bcat = _prna._concat_pair(b1, b2)
                st = _prna.pair_finish_rna(self.host, b1, b2, bcat, m1,
                                           m2, writer)
            for k, v in st.items():
                totals[k] = totals.get(k, 0) + v
        return totals

    def align_and_emit_pe(self, pair_batches: list[tuple[ReadBatch,
                                                         ReadBatch]],
                          writer) -> dict:
        """Two-pass (pass per shard) paired-end alignment + SAM emission.

        Each shard runs the full packed PE step (both mates + concordance
        grid) in shard-local coordinates; mates of a genuine pair share a
        chromosome, hence a shard, so every shard's concordance search is
        complete. Host merge mirrors parallel/mesh._merge_pe_pack_device:
        best-total shard wins, position lanes rebase to global, other
        shards' best folds into secbest, per-mate aux bits OR. Pairs hit
        by several shards fall to the exact per-read path over the
        concatenated candidate grids (reference .ht2l role,
        MANUAL.markdown:221-231)."""
        from . import paired as _paired
        from . import emit as _emit

        if self.opts.spliced:
            return self.align_and_emit_pe_rna(pair_batches, writer)

        S = len(self.sh)
        KP = max(8, self.opts.khits + 3)
        per: list[list[tuple]] = [[] for _ in range(S)]
        for s in range(S):
            al = self._activate(s)
            pend = []
            for b1, b2 in pair_batches:
                out = _paired.stage_pe_packed(al, b1, b2, KP)
                if out is None:
                    raise ValueError(
                        "sharded paired-end alignment currently requires "
                        "constant per-read qualities (FASTA input, -f, or "
                        "FASTQ with uniform quality strings); this batch "
                        "has varying quality values")
                pack, m1, m2, pt = out[:4]
                for d in (m1, m2, pt):
                    try:
                        d.copy_to_host_async()
                    except Exception:
                        pass
                wire_meta = out[4].get("_wire") if len(out) > 4 else None
                pend.append((pack, m1, m2, pt, wire_meta))
            for t in pend:
                arrs = [np.asarray(x) for x in t[:4]]
                if arrs[0].dtype == np.uint32:
                    from ..ops import wire as _wire
                    Lw, nvb = t[4]
                    arrs[0] = _wire.pe_pack_decode(arrs[0], Lw, Lw, nvb)
                per[s].append(tuple(arrs))

        totals: dict = {}
        for bi, (b1, b2) in enumerate(pair_batches):
            pack, fslow, m1g, m2g, ptg = self._merge_pe_shards(
                [per[s][bi] for s in range(S)])
            st = _emit._finish_pe_pack(self.host, b1, b2,
                                       (pack, m1g, m2g, ptg), writer,
                                       force_slow=fslow)
            for k, v in st.items():
                totals[k] = totals.get(k, 0) + v
        return totals

    def _merge_pe_shards(self, souts):
        """NumPy analogue of parallel/mesh._merge_pe_pack_device + the
        mesh step's grid globalization: per-shard (pack, m1, m2, pt) ->
        (pack_global int16, force_slow, m1_all, m2_all, pt_all) with
        positions in global coordinates and pair-top indices remapped
        into the concatenated candidate grids."""
        from .paired import (PEPACK_MATE, PEPACK_REP, PEPACK_HDR,
                             pepack_nr)
        S = len(souts)
        bases = np.asarray(self.sh.bases, np.int64)
        pk = np.stack([t[0] for t in souts]).astype(np.int64)   # (S, B, W)
        _, B, W = pk.shape
        NR = pepack_nr(W)
        nv = pk[:, :, 0]
        best = pk[:, :, 1]
        win = np.argmax(np.where(nv > 0, best, np.int64(-32768)), axis=0)
        hits = (nv > 0).sum(axis=0)
        fp = np.take_along_axis(pk, win[None, :, None], axis=0)[0].copy()
        base_w = bases[win].astype(np.uint64)
        for k in range(NR):
            rb = PEPACK_HDR + PEPACK_REP * k
            for m in range(2):
                b0 = rb + 1 + m * PEPACK_MATE
                lo = fp[:, b0].astype(np.uint16).astype(np.uint64)
                hi = fp[:, b0 + 1].astype(np.uint16).astype(np.uint64)
                pos = (lo | (hi << 16)) + base_w
                fp[:, b0] = (pos & 0xFFFF).astype(np.int64)
                fp[:, b0 + 1] = ((pos >> 16) & 0xFFFF).astype(np.int64)
        aux = pk[:, :, W - 1]
        fp[:, W - 1] = ((aux & 1).max(axis=0)
                        | (((aux >> 1) & 1).max(axis=0) << 1))
        masked = np.where(nv > 0, best, np.int64(-32768)).copy()
        masked[win, np.arange(B)] = -32768
        fp[:, 2] = np.maximum(fp[:, 2], masked.max(axis=0))
        pack = (fp.astype(np.uint64) & 0xFFFF).astype(
            np.uint16).view(np.int16)

        K2 = souts[0][1].shape[1]
        m1s, m2s, pts = [], [], []
        for s, t in enumerate(souts):
            m1 = t[1].astype(np.int64)
            m1[:, :, 1] += bases[s]
            m1s.append(m1)
            m2 = t[2].astype(np.int64)
            m2[:, :, 1] += bases[s]
            m2s.append(m2)
            p = t[3].astype(np.int64)
            p[:, :, 1] += s * K2
            p[:, :, 2] += s * K2
            pts.append(p)
        m1_all = np.concatenate(m1s, axis=1)
        m2_all = np.concatenate(m2s, axis=1)
        ptm = np.concatenate(pts, axis=1)
        order = np.argsort(-ptm[:, :, 0], axis=1, kind="stable")
        ptm = np.take_along_axis(ptm, order[:, :, None], axis=1)
        return pack, hits >= 2, m1_all, m2_all, ptm

    def _merge_shard_results(self, fps, mgs):
        """Combine per-shard fastpacks + candidate grids into global
        coordinates. Returns (fp_global, force_slow, merged_full)."""
        S = len(fps)
        bases = np.asarray(self.sh.bases, np.int64)
        B = fps[0].shape[0]
        KF = (fps[0].shape[1] - 4) // FASTPACK_REP
        nv = np.stack([fp[:, 0].astype(np.int64) for fp in fps])   # (S, B)
        best = np.stack([fp[:, 1].astype(np.int64) for fp in fps])
        win = np.argmax(np.where(nv > 0, best, np.int64(-32768)),
                        axis=0)                                     # (B,)
        hits = (nv > 0).sum(axis=0)
        fp = np.take_along_axis(np.stack(fps), win[None, :, None],
                                axis=0)[0].copy()
        # shard-local -> global positions in the report lanes
        for k in range(KF):
            b0 = 4 + FASTPACK_REP * k
            lo = fp[:, b0].astype(np.uint16).astype(np.uint64)
            hi = fp[:, b0 + 1].astype(np.uint16).astype(np.uint64)
            pos = (lo | (hi << 16)) + bases[win].astype(np.uint64)
            fp[:, b0] = (pos & 0xFFFF).astype(np.uint16).astype(np.int16)
            fp[:, b0 + 1] = ((pos >> 16) & 0xFFFF).astype(
                np.uint16).astype(np.int16)
        # cross-shard second best can beat the winner's own secbest
        if S > 1:
            masked = np.where(nv > 0, best, np.int64(-32768)).copy()
            masked[win, np.arange(B)] = -32768
            other_best = masked.max(axis=0)
            secb = fp[:, 2].astype(np.int64)
            fp[:, 2] = np.maximum(secb, other_best).astype(np.int16)
        force_slow = hits >= 2

        # merged grids in global coordinates for the per-read path
        msc = np.concatenate([m[:, :, 0].astype(np.int64) for m in mgs], 1)
        mpos = np.concatenate(
            [m[:, :, 1].astype(np.int64).view(np.int64) + bases[s]
             for s, m in enumerate(mgs)], 1)
        mfl = np.concatenate([m[:, :, 2] for m in mgs], 1)
        order = np.argsort(-msc, axis=1, kind="stable")
        merged = dict(
            score=np.take_along_axis(msc, order, 1),
            pos=np.take_along_axis(mpos, order, 1),
            fw=np.take_along_axis((mfl & 1) > 0, order, 1),
            gapped=np.take_along_axis((mfl & 2) > 0, order, 1))
        return fp, force_slow, merged
