#!/usr/bin/env python
"""Per-phase timestamps inside the pipelined PE stream."""
from __future__ import annotations

import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B


def main():
    B._enable_compile_cache()
    from hisat2_tpu.align.pipeline import Aligner
    from hisat2_tpu.align import emit as E
    from hisat2_tpu.io import sam as samio

    fm = B._get_index()
    al = Aligner(fm)
    PB = B.BATCH // 2
    NB = int(os.environ.get("PROF_NBATCH", "6"))
    pbatches = [B._make_pairs(fm, PB, seed=300 + k) for k in range(NB)]

    writer = samio.SamWriter(io.StringIO(), fm.ref.names,
                             [int(x) for x in fm.ref.tlens], no_head=True)
    # warm
    h = E.submit_pe(al, *pbatches[0])
    E.finish_pe(al, h, writer)

    t00 = time.perf_counter()
    pending = None
    for k in range(NB):
        b1, b2 = pbatches[k]
        t0 = time.perf_counter()
        h = E.submit_pe(al, b1, b2)
        t1 = time.perf_counter()
        tp = tx = 0.0
        if pending is not None:
            import numpy as np
            tp0 = time.perf_counter()
            np.asarray(pending[3][0])          # pack copy wait
            tp = time.perf_counter() - tp0
            tx0 = time.perf_counter()
            for v in (pending[3][4] or {}).values():
                np.asarray(v)                  # extras copy wait
            tx = time.perf_counter() - tx0
            E.finish_pe(al, pending, writer)
        t2 = time.perf_counter()
        print(f"batch {k}: submit={t1-t0:.3f}s pack_wait={tp:.3f}s "
              f"extras_wait={tx:.3f}s finish_prev={t2-t1-tp-tx:.3f}s",
              flush=True)
        pending = h
    t3 = time.perf_counter()
    E.finish_pe(al, pending, writer)
    t4 = time.perf_counter()
    print(f"last finish={t4-t3:.3f}s total={t4-t00:.3f}s "
          f"rps={2*PB*NB/(t4-t00):,.0f}", flush=True)


if __name__ == "__main__":
    main()
