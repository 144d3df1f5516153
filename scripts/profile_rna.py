#!/usr/bin/env python
"""Steady-state stage timing for the RNA (spliced) path: wraps the hot
Aligner/emit stages with perf_counter probes and prints per-batch wall
milliseconds after warmup. Drives the same simulated-transcript config
as scripts/bench_rna.py."""
from __future__ import annotations

import io
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as B
import importlib.util

spec = importlib.util.spec_from_file_location(
    "bench_rna", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_rna.py"))
R = importlib.util.module_from_spec(spec)
spec.loader.exec_module(R)

TIMES = defaultdict(float)
COUNTS = defaultdict(int)
ACTIVE = {"on": False}


def wrap(obj, name, label=None):
    fn = getattr(obj, name)
    lb = label or name

    def run(*a, **kw):
        if not ACTIVE["on"]:
            return fn(*a, **kw)
        t0 = time.perf_counter()
        try:
            return fn(*a, **kw)
        finally:
            TIMES[lb] += time.perf_counter() - t0
            COUNTS[lb] += 1
    setattr(obj, name, run)


def main():
    B._enable_compile_cache()
    from hisat2_tpu.align.pipeline import Aligner
    from hisat2_tpu.align import emit, pipeline
    from hisat2_tpu.io import sam as samio
    from hisat2_tpu.index.fm_index import build_fm_index, FMIndex
    from hisat2_tpu.io.reference import reference_from_seqs
    from hisat2_tpu.utils import alphabet
    from hisat2_tpu.ops import splice as spl_ops

    rng = np.random.default_rng(11)
    cache = "/tmp/hisat2_tpu_rna_idx"
    genome = np.asarray(rng.integers(0, 4, 10 ** 6), np.uint8)
    genes = R.make_genes(genome, rng)
    if os.path.exists(cache + ".npz"):
        fm = FMIndex.load(cache)
        assert (fm.ref.joined == genome).all()
    else:
        fm = build_fm_index(reference_from_seqs(
            {"chrR": alphabet.decode(genome)}))
        fm.save(cache)
    NB = int(os.environ.get("RNA_NBATCH", "4"))
    BS = int(os.environ.get("RNA_BATCH", "8192"))
    batches = [R.make_rna_reads(fm, genes, BS, rng) for _ in range(NB)]

    wrap(Aligner, "device_align_fast")
    wrap(Aligner, "_splice_rescue")
    wrap(Aligner, "_splice_second_pass")
    wrap(Aligner, "_spliced_fin_rows")
    wrap(Aligner, "_finalize_results")
    wrap(Aligner, "gather_merged_async")
    wrap(emit, "_finish_fastpack")
    wrap(emit, "_format_records", "fmt_records_vec")
    if hasattr(spl_ops, "junction_score_packed_rows"):
        wrap(spl_ops, "junction_score_packed_rows", "junc2_dev")
    if hasattr(spl_ops, "junction_gated"):
        wrap(spl_ops, "junction_gated", "junc_gated_dev")

    al = Aligner(fm)
    al.opts.spliced = True
    buf = io.StringIO()
    w = samio.SamWriter(buf, fm.ref.names, [int(x) for x in fm.ref.tlens],
                        no_head=True)
    emit.align_and_emit_stream(al, [b for b, _ in batches[:2]], w)

    al2 = Aligner(fm)
    al2.opts.spliced = True
    buf = io.StringIO()
    w = samio.SamWriter(buf, fm.ref.names, [int(x) for x in fm.ref.tlens],
                        no_head=True)
    ACTIVE["on"] = True
    t0 = time.perf_counter()
    emit.align_and_emit_stream(al2, [b for b, _ in batches], w)
    dt = time.perf_counter() - t0
    n = sum(len(b) for b, _ in batches)
    print(f"total {dt*1000:.0f} ms for {NB} batches x {BS} "
          f"({n/dt:.0f} reads/s)")
    for k in sorted(TIMES, key=lambda k: -TIMES[k]):
        print(f"  {k:26s} {TIMES[k]*1000/NB:8.1f} ms/batch  "
              f"x{COUNTS[k]/NB:.1f}")


if __name__ == "__main__":
    main()
