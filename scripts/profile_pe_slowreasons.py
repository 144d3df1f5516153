#!/usr/bin/env python
"""Count why PE pairs fall off the packed fast path."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as B


def main():
    B._enable_compile_cache()
    from hisat2_tpu.align.pipeline import Aligner
    from hisat2_tpu.align import paired as P
    from hisat2_tpu.align.paired import PEPACK_MATE, PEPACK_MM

    fm = B._get_index()
    al = Aligner(fm)
    PB = B.BATCH // 2
    b1, b2 = B._make_pairs(fm, PB, seed=301)
    o = al.opts
    print("khits:", o.khits, "top_cands:", o.top_cands)
    out = P.stage_pe_packed(al, b1, b2, KP=max(8, o.khits + 3))
    fp = np.asarray(out[0])
    B_ = len(b1)
    nvalid = fp[:, 0].astype(np.int64)
    flags = fp[:, 3].astype(np.int64)
    khits = o.khits
    nrep = np.minimum(nvalid, khits)
    conc = nvalid >= 1
    print("pairs:", B_)
    print("no concordant:", int((~conc).sum()))
    print("nvalid hist:", np.bincount(np.minimum(nvalid, 8)).tolist())
    over = conc & (nrep > 2)
    print("conc but nrep>2 (slow):", int(over.sum()))
    l1 = b1.lens.astype(np.int64)
    l2 = b2.lens.astype(np.int64)
    ref = al.fm.ref

    gap_slow = np.zeros(B_, bool)
    mm_slow = np.zeros(B_, bool)
    contain_slow = np.zeros(B_, bool)
    for k in (0, 1):
        inrep = nrep > k
        for m, lm in ((0, l1), (1, l2)):
            b0 = 4 + 2 * PEPACK_MATE * k + PEPACK_MATE * m
            lo = fp[:, b0].astype(np.uint16).astype(np.uint32)
            hi = fp[:, b0 + 1].astype(np.uint16).astype(np.uint32)
            pos = (lo | (hi << 16)).astype(np.int64)
            c5 = fp[:, b0 + 2].astype(np.int64)
            c3 = fp[:, b0 + 3].astype(np.int64)
            nmm_all = fp[:, b0 + 5].astype(np.int64)
            gapped = (flags >> (4 * k + 2 * m + 1)) & 1 > 0
            gap_slow |= inrep & gapped
            mm_slow |= inrep & (nmm_all > PEPACK_MM)
    base = conc & (nrep <= 2)
    print("gapped slow (of nrep<=2):", int((base & gap_slow).sum()))
    print("mm>4 slow (of nrep<=2):", int((base & mm_slow & ~gap_slow).sum()))
    fast = base & ~gap_slow & ~mm_slow
    print("fast after gap/mm:", int(fast.sum()),
          " -> slow total:", int(B_ - fast.sum()))


if __name__ == "__main__":
    main()
