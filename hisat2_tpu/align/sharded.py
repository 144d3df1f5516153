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


class ShardedAligner:
    def __init__(self, sh: ShardedIndex, scoring: Scoring = DEFAULT_SCORING,
                 opts: AlignerOpts | None = None):
        self.sh = sh
        self.scoring = scoring
        self.opts = opts or AlignerOpts()
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

    def _activate(self, i: int) -> Aligner:
        """Bring shard i's arrays into HBM (dropping the previous shard)."""
        if self._active_i == i:
            return self._active
        if self._active is not None:
            # drop cached device arrays so HBM frees before the next upload
            self._active.idx = None
            self.sh.shards[self._active_i].__dict__.pop("device", None)
            self._active = None
            import gc
            gc.collect()
        self._active = Aligner(self.sh.shards[i], self.scoring, self.opts)
        self._active_i = i
        return self._active

    def align_and_emit(self, batches: list[ReadBatch], writer) -> dict:
        """Two-pass (pass per shard) SE alignment + SAM emission for a
        list of batches; returns merged summary stats."""
        from . import emit as _emit

        S = len(self.sh)
        per_shard_fp: list[list[np.ndarray]] = [[] for _ in range(S)]
        per_shard_mg: list[list[np.ndarray]] = [[] for _ in range(S)]
        for s in range(S):
            al = self._activate(s)
            pend = []
            for b in batches:
                fp_dev, merged_dev = al.device_align_fast(b)[:2]
                try:
                    merged_dev.copy_to_host_async()
                except Exception:
                    pass
                pend.append((fp_dev, merged_dev))
            for fp_dev, merged_dev in pend:
                per_shard_fp[s].append(np.asarray(fp_dev))
                per_shard_mg[s].append(np.asarray(merged_dev))

        totals: dict = {}
        for bi, b in enumerate(batches):
            fp, force_slow, merged = self._merge_shard_results(
                [per_shard_fp[s][bi] for s in range(S)],
                [per_shard_mg[s][bi] for s in range(S)])
            st = _emit._finish_fastpack(self.host, b, fp, None, writer,
                                        force_slow=force_slow,
                                        merged_full=merged)
            for k, v in st.items():
                totals[k] = totals.get(k, 0) + v
        return totals

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
