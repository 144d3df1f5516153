#!/usr/bin/env python
"""Phase profile of the vectorized spliced PE path (paired_rna): wall
time per finish phase + submit, on whatever backend is live."""
from __future__ import annotations

import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as B
import importlib.util

_spec = importlib.util.spec_from_file_location(
    "bench_rna_pe", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_rna_pe.py"))
P = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(P)
R = P.R

T = {}


def timed(name, fn):
    def wrap(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        T[name] = T.get(name, 0.0) + time.perf_counter() - t0
        return out
    return wrap


def main():
    B._enable_compile_cache()
    from hisat2_tpu.align.pipeline import Aligner
    from hisat2_tpu.align import emit, paired_rna as prna, paired
    from hisat2_tpu.io import sam as samio
    from hisat2_tpu.index.fm_index import build_fm_index, FMIndex
    from hisat2_tpu.io.reference import reference_from_seqs
    from hisat2_tpu.utils import alphabet

    rng = np.random.default_rng(11)
    cache = "/tmp/hisat2_tpu_rna_idx"
    genome = np.asarray(rng.integers(0, 4, 10 ** 6), np.uint8)
    genes = R.make_genes(genome, rng)
    if os.path.exists(cache + ".npz"):
        fm = FMIndex.load(cache)
    else:
        fm = build_fm_index(reference_from_seqs(
            {"chrR": alphabet.decode(genome)}))
        fm.save(cache)
    NB = int(os.environ.get("RNA_NBATCH", "8"))
    BS = int(os.environ.get("RNA_BATCH", "8192"))
    batches = [P.make_rna_pairs(fm, genes, BS, rng) for _ in range(NB)]

    # instrument
    prna._rna_rescue_rounds = timed("rescue", prna._rna_rescue_rounds)
    prna._fin_mate_records = timed("fin", prna._fin_mate_records)
    prna._pair_grid = timed("grid", prna._pair_grid)
    prna._augmented_mate = timed("aug", prna._augmented_mate)
    paired._pair_result_one = timed("ladder", paired._pair_result_one)
    emit._format_pe_records = timed("format", emit._format_pe_records)
    sub0 = prna.submit_pe_rna
    fin0 = prna.finish_pe_rna
    prna.submit_pe_rna = timed("submit", sub0)

    nslow = [0]
    orig_fin = fin0

    def fin_count(al, handle, writer):
        t0 = time.perf_counter()
        st = orig_fin(al, handle, writer)
        T["finish_total"] = T.get("finish_total", 0.) + time.perf_counter() - t0
        return st
    prna.finish_pe_rna = fin_count

    def run(al):
        buf = io.StringIO()
        w = samio.SamWriter(buf, fm.ref.names,
                            [int(x) for x in fm.ref.tlens], no_head=True)
        emit.align_and_emit_pe_stream(
            al, [(b1, b2) for b1, b2, _ in batches], w)
        return buf

    al = Aligner(fm)
    al.opts.spliced = True
    run(al)                                    # warm
    T.clear()
    al2 = Aligner(fm)
    al2.opts.spliced = True
    t0 = time.perf_counter()
    run(al2)
    dt = time.perf_counter() - t0
    n = sum(len(b1) + len(b2) for b1, b2, _ in batches)
    print(f"total {dt:.2f}s  {n/dt:.0f} reads/s  ({n} reads, {NB} batches)")
    for k in sorted(T, key=lambda x: -T[x]):
        print(f"  {k:14s} {T[k]:7.2f}s  {100*T[k]/dt:5.1f}%")
    m = al2.metrics
    for f in ("t_pack", "t_fetch", "t_host"):
        print(f"  metrics.{f}: {getattr(m, f, 0):.2f}s")


if __name__ == "__main__":
    main()
