#!/usr/bin/env python
"""Per-stage time breakdown for the SE and PE streaming paths on the
live device. Not a test — a tuning tool (see STATUS.md perf notes)."""
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402

import bench  # noqa: E402


def main():
    bench._enable_compile_cache()
    from hisat2_tpu.align.pipeline import Aligner
    from hisat2_tpu.align import emit
    from hisat2_tpu.io import sam as samio

    fm = bench._get_index()
    al = Aligner(fm)
    B = bench.BATCH
    NB = bench.NBATCH
    mode = sys.argv[1] if len(sys.argv) > 1 else "se"

    if mode == "se":
        batches = [bench._make_reads(fm, B, seed=100 + k) for k in range(NB)]
        buf = io.StringIO()
        writer = samio.SamWriter(buf, fm.ref.names,
                                 [int(x) for x in fm.ref.tlens], no_head=True)
        emit.align_and_emit(al, batches[0], writer)   # warm
        al.metrics.__init__()
        buf = io.StringIO()
        writer = samio.SamWriter(buf, fm.ref.names,
                                 [int(x) for x in fm.ref.tlens], no_head=True)
        # instrument submit vs finish wall time
        t_sub = t_fin = 0.0
        t0 = time.perf_counter()
        from collections import deque
        pending = deque()
        for b in batches:
            ts = time.perf_counter()
            h = emit.submit_se(al, b)
            t_sub += time.perf_counter() - ts
            pending.append(h)
            if len(pending) > 2:
                ts = time.perf_counter()
                emit.finish_se(al, pending.popleft(), writer)
                t_fin += time.perf_counter() - ts
        while pending:
            ts = time.perf_counter()
            emit.finish_se(al, pending.popleft(), writer)
            t_fin += time.perf_counter() - ts
        dt = time.perf_counter() - t0
        m = al.metrics
        print(f"SE: {NB*B/dt:.0f} reads/s total={dt:.3f}s "
              f"submit={t_sub:.3f}s finish={t_fin:.3f}s")
        print(f"  metrics: t_fetch={m.t_fetch:.3f} t_gather={m.t_gather:.3f} "
              f"t_host={m.t_host:.3f} t_pack={getattr(m,'t_pack',0):.3f}")
    else:
        PB = B // 2
        pbatches = [bench._make_pairs(fm, PB, seed=300 + k) for k in range(NB)]
        buf = io.StringIO()
        writer = samio.SamWriter(buf, fm.ref.names,
                                 [int(x) for x in fm.ref.tlens], no_head=True)
        emit.align_and_emit_pe_stream(al, pbatches[:1], writer)
        al.metrics.__init__()
        buf = io.StringIO()
        writer = samio.SamWriter(buf, fm.ref.names,
                                 [int(x) for x in fm.ref.tlens], no_head=True)
        t_sub = t_fin = 0.0
        from collections import deque
        pending = deque()
        t0 = time.perf_counter()
        for b1, b2 in pbatches:
            ts = time.perf_counter()
            h = emit.submit_pe(al, b1, b2)
            t_sub += time.perf_counter() - ts
            pending.append(h)
            if len(pending) > 2:
                ts = time.perf_counter()
                emit.finish_pe(al, pending.popleft(), writer)
                t_fin += time.perf_counter() - ts
        while pending:
            ts = time.perf_counter()
            emit.finish_pe(al, pending.popleft(), writer)
            t_fin += time.perf_counter() - ts
        dt = time.perf_counter() - t0
        m = al.metrics
        print(f"PE: {2*NB*PB/dt:.0f} reads/s total={dt:.3f}s "
              f"submit={t_sub:.3f}s finish={t_fin:.3f}s")
        print(f"  metrics: t_fetch={m.t_fetch:.3f} t_gather={m.t_gather:.3f} "
              f"t_host={m.t_host:.3f}")
        for k in sorted(vars(m)):
            if k.startswith("t_pe"):
                print(f"  {k}={getattr(m,k):.3f}")


if __name__ == "__main__":
    main()
