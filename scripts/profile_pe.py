#!/usr/bin/env python
"""Per-stage PE throughput profile on the bench config.

Times submit_pe (device dispatch) vs finish_pe (host consume+format)
per batch, plus a breakdown of the finish path, to locate the PE
bottleneck on the real chip.
"""
from __future__ import annotations

import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as B


def main():
    B._enable_compile_cache()
    from hisat2_tpu.align.pipeline import Aligner
    from hisat2_tpu.align import emit as E
    from hisat2_tpu.io import sam as samio
    import jax

    fm = B._get_index()
    al = Aligner(fm)
    PB = B.BATCH // 2
    NB = int(os.environ.get("PROF_NBATCH", "4"))
    pbatches = [B._make_pairs(fm, PB, seed=300 + k) for k in range(NB)]

    buf = io.StringIO()
    writer = samio.SamWriter(buf, fm.ref.names,
                             [int(x) for x in fm.ref.tlens], no_head=True)
    # warm
    h = E.submit_pe(al, *pbatches[0])
    print("handle kind:", h[0], flush=True)
    E.finish_pe(al, h, writer)

    for k in range(NB):
        b1, b2 = pbatches[k]
        t0 = time.perf_counter()
        h = E.submit_pe(al, b1, b2)
        t1 = time.perf_counter()
        if h[0] == "fast":
            # block on device outputs to separate device time from host time
            jax.block_until_ready(h[3][0])
        t2 = time.perf_counter()
        buf = io.StringIO()
        writer = samio.SamWriter(buf, fm.ref.names,
                                 [int(x) for x in fm.ref.tlens], no_head=True)
        st = E.finish_pe(al, h, writer)
        t3 = time.perf_counter()
        print(f"batch {k}: kind={h[0]} submit={t1-t0:.3f}s "
              f"device_wait={t2-t1:.3f}s finish={t3-t2:.3f}s "
              f"total={t3-t0:.3f}s rps={2*PB/(t3-t0):,.0f} stats={st}",
              flush=True)


if __name__ == "__main__":
    main()
