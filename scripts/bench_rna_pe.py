#!/usr/bin/env python
"""Paired-end RNA (spliced) throughput bench: FR pairs sampled from
simulated transcripts over the same planted-gene genome as bench_rna.py,
aligned in spliced PE mode (fused per-mate dispatch + pairing ladder +
splice rescue). Prints one JSON line."""
from __future__ import annotations

import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as B
import importlib.util

_spec = importlib.util.spec_from_file_location(
    "bench_rna", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_rna.py"))
R = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(R)

RDLEN = 100


def make_rna_pairs(fm, genes, n, rng):
    """FR pairs from spliced transcripts: mate1 at a transcript offset,
    mate2 RC ~150bp downstream on the same transcript. Truth = mate1
    (start_joined, njunc)."""
    from hisat2_tpu.io.reads import Read, batchify
    from hisat2_tpu.utils import alphabet

    joined = fm.ref.joined
    r1s, r2s, truth = [], [], []
    for i in range(n):
        exons = genes[int(rng.integers(0, len(genes)))]
        jmap = np.concatenate([np.arange(s, s + l) for s, l in exons])
        gap = int(rng.integers(60, 220))
        need = 2 * RDLEN + gap
        if jmap.size < need + 1:
            continue
        toff = int(rng.integers(0, jmap.size - need))
        jp1 = jmap[toff:toff + RDLEN]
        jp2 = jmap[toff + RDLEN + gap:toff + need]
        s1 = joined[jp1].copy()
        s2 = joined[jp2].copy()
        for s in (s1, s2):
            mm = rng.random(RDLEN) < 0.01
            s[mm] = (s[mm] + rng.integers(1, 4, int(mm.sum()))) % 4
        s2 = alphabet.revcomp(s2)
        rid = len(r1s)
        nj1 = int((np.diff(jp1) != 1).sum())
        r1s.append(Read(f"p{i}_{int(jp1[0])}_{nj1}", s1,
                        np.full(RDLEN, 40, np.int8), rid))
        r2s.append(Read(f"p{i}_{int(jp1[0])}_{nj1}", s2,
                        np.full(RDLEN, 40, np.int8), rid))
        truth.append((int(jp1[0]), nj1))
    return (batchify(r1s, pad_to=104), batchify(r2s, pad_to=104), truth)


def main():
    B._enable_compile_cache()
    from hisat2_tpu.align.pipeline import Aligner
    from hisat2_tpu.align import emit
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
        assert (fm.ref.joined == genome).all(), "stale RNA index cache"
    else:
        fm = build_fm_index(reference_from_seqs(
            {"chrR": alphabet.decode(genome)}))
        fm.save(cache)
    NB = int(os.environ.get("RNA_NBATCH", "4"))
    BS = int(os.environ.get("RNA_BATCH", "8192"))
    batches = [make_rna_pairs(fm, genes, BS, rng) for _ in range(NB)]

    def run(al):
        buf = io.StringIO()
        w = samio.SamWriter(buf, fm.ref.names,
                            [int(x) for x in fm.ref.tlens], no_head=True)
        emit.align_and_emit_pe_stream(
            al, [(b1, b2) for b1, b2, _ in batches], w)
        return buf

    al = Aligner(fm)
    al.opts.spliced = True
    run(al)                                    # warm (shapes + sites)
    al2 = Aligner(fm)
    al2.opts.spliced = True
    t0 = time.perf_counter()
    buf = run(al2)
    dt = time.perf_counter() - t0
    n = sum(len(b1) + len(b2) for b1, b2, _ in batches)

    truth = {}
    for _b1, _b2, t in batches:
        pass
    ok = bad = junc_ok = junc_bad = conc = 0
    for ln in buf.getvalue().splitlines():
        f = ln.split("\t")
        flag = int(f[1])
        if flag & 256 or not (flag & 64):      # primary mate1 only
            continue
        name = f[0]
        start, njunc = (int(x) for x in name.split("_")[1:3])
        if flag & 2:
            conc += 1
        if flag & 4:
            bad += 1
            continue
        tidx, toff = None, int(f[3]) - 1
        ngap = f[5].count("N")
        near = abs(toff - start) <= 40         # clip slack
        if njunc > 0:
            junc_ok += near and ngap >= 1
            junc_bad += not (near and ngap >= 1)
        else:
            ok += near
            bad += not near
    print(json.dumps({
        "metric": "rna_pe_reads_per_sec_1chip",
        "value": round(n / dt, 1), "unit": "reads/s",
        "pairs": n // 2, "concordant": conc,
        "exonic_correct": ok, "exonic_wrong": bad,
        "junction_correct": junc_ok, "junction_wrong": junc_bad}))


if __name__ == "__main__":
    main()
