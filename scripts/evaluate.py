#!/usr/bin/env python
"""Accuracy + speed scoreboard vs the reference hisat2 binary.

Equivalent role to the reference's evaluation/ framework
(generate_reads.py + calculate_read_cost.py): simulate reads with known
truth from a reference FASTA, run BOTH aligners on identical inputs,
score placement correctness and throughput, and emit EVAL_r{N}.json.

Reference binaries are built from /root/reference into /tmp on demand
(they are not redistributed with this repo). Default config: the bundled
22_20-21M example slice, 100bp SE + PE, ~1% mismatches,
--no-spliced-alignment (BASELINE.json config #1).

Usage: python scripts/evaluate.py [--reads 32000] [--out EVAL_r02.json]
"""

import argparse
import io
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as _bench

EXAMPLE_FA = "/root/reference/example/reference/22_20-21M.fa"
REF_BUILD_DIR = "/tmp/hisat2_ref_build"


def ensure_ref_binaries():
    b = f"{REF_BUILD_DIR}/hisat2-align-s"
    if os.path.exists(b):
        return b
    os.makedirs(REF_BUILD_DIR, exist_ok=True)
    subprocess.run(f"cp -r /root/reference/* {REF_BUILD_DIR}/", shell=True,
                   check=True)
    subprocess.run(["make", "-C", REF_BUILD_DIR, "hisat2-align-s",
                    "hisat2-build-s", "-j", "4"], check=True,
                   capture_output=True, timeout=1800)
    return b


def score_sam(path_or_text, truth, pe=False):
    """% aligned + % of primary records within 3bp of truth."""
    lines = (open(path_or_text) if os.path.exists(str(path_or_text))
             else io.StringIO(path_or_text))
    prim = correct = aligned = 0
    for line in lines:
        if line.startswith("@"):
            continue
        f = line.split("\t")
        flag = int(f[1])
        if flag & 256:
            continue
        prim += 1
        if flag & 4:
            continue
        aligned += 1
        name = f[0]
        key = name if not pe else (name, 1 if flag & 64 else 2)
        t = truth.get(key)
        if t is not None and abs(int(f[3]) - 1 - t) <= 3:
            correct += 1
    return prim, aligned, correct


def main():
    _bench._enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default=EXAMPLE_FA)
    ap.add_argument("--reads", type=int, default=32768)
    ap.add_argument("--out", default="EVAL_r02.json")
    args = ap.parse_args()

    from hisat2_tpu.io.reference import load_reference
    from hisat2_tpu.index.fm_index import build_fm_index, FMIndex
    from hisat2_tpu.align.pipeline import Aligner
    from hisat2_tpu.align.emit import (align_and_emit_stream,
                                       align_and_emit_pe_stream)
    from hisat2_tpu.utils import alphabet
    from hisat2_tpu.io.reads import Read, batchify
    from hisat2_tpu.io import sam as samio

    refbin = ensure_ref_binaries()
    buildbin = refbin.replace("align", "build")
    refidx = "/tmp/hisat2_eval_refidx"
    if not os.path.exists(refidx + ".1.ht2"):
        subprocess.run([buildbin, args.reference, refidx], check=True,
                       capture_output=True, timeout=1200)

    # round reads to whole batches: a ragged tail batch has its own
    # compile shapes and would put a fresh tunnel compile inside the
    # timed region (~60s — the round-5 EVAL numbers were 400x off)
    args.reads -= args.reads % 16384
    ref = load_reference(args.reference)
    cache = "/tmp/hisat2_tpu_bench_idx"
    fm = None
    if os.path.exists(cache + ".npz"):
        try:
            fm = FMIndex.load(cache)
            if not fm.st_k:
                fm = None
        except Exception:
            fm = None
    if fm is None:
        fm = build_fm_index(ref)
        fm.save(cache)
    joined = fm.ref.joined
    rng = np.random.default_rng(7)
    n = args.reads
    rdlen = 100
    results = {}

    # ---------------- SE ----------------
    starts = rng.integers(0, joined.size - rdlen, n)
    truth = {}
    reads = []
    qual = "I" * rdlen
    fq = "/tmp/eval_se.fq"
    with open(fq, "w") as fh:
        for i in range(n):
            st = int(starts[i])
            s = joined[st:st + rdlen].copy()
            mm = rng.random(rdlen) < 0.01
            s[mm] = (s[mm] + rng.integers(1, 4, int(mm.sum()))) % 4
            if i % 2:
                s = alphabet.revcomp(s)
            name = f"s{i}"
            truth[name] = st
            reads.append(Read(name, s, np.full(rdlen, 40, np.int8), i))
            fh.write(f"@{name}\n{alphabet.decode(s)}\n+\n{qual}\n")
    batches = [batchify(reads[i:i + 16384], pad_to=104)
               for i in range(0, n, 16384)]

    al = Aligner(fm)
    buf = io.StringIO()
    w = samio.SamWriter(buf, fm.ref.names, [int(x) for x in fm.ref.tlens],
                        no_head=True)
    align_and_emit_stream(al, batches[:1], w)        # warm
    buf = io.StringIO()
    w = samio.SamWriter(buf, fm.ref.names, [int(x) for x in fm.ref.tlens],
                        no_head=True)
    t0 = time.perf_counter()
    align_and_emit_stream(al, batches, w)
    dt = time.perf_counter() - t0
    prim, aligned, correct = score_sam(buf.getvalue(), truth)
    results["tpu_se"] = dict(reads_per_s=round(n / dt, 1),
                             pct_aligned=round(100 * aligned / prim, 2),
                             pct_correct=round(100 * correct / prim, 2))

    cmd = [refbin, "-x", refidx, "-U", fq, "-p", "4",
           "--no-spliced-alignment", "-S", "/tmp/eval_se_ref.sam"]
    subprocess.run(cmd, check=True, capture_output=True, timeout=900)
    t0 = time.perf_counter()
    subprocess.run(cmd, check=True, capture_output=True, timeout=900)
    dt = time.perf_counter() - t0
    prim, aligned, correct = score_sam("/tmp/eval_se_ref.sam", truth)
    results["ref_se"] = dict(reads_per_s=round(n / dt, 1),
                             pct_aligned=round(100 * aligned / prim, 2),
                             pct_correct=round(100 * correct / prim, 2))

    # ---------------- PE ----------------
    npairs = n // 2
    ins = 300
    starts = rng.integers(0, joined.size - ins, npairs)
    truth = {}
    b1l, b2l = [], []
    f1p, f2p = "/tmp/eval_pe_1.fq", "/tmp/eval_pe_2.fq"
    with open(f1p, "w") as f1, open(f2p, "w") as f2:
        for i in range(npairs):
            st = int(starts[i])
            frag = joined[st:st + ins]
            r1 = frag[:rdlen].copy()
            r2 = alphabet.revcomp(frag[-rdlen:])
            for r in (r1, r2):
                mm = rng.random(rdlen) < 0.01
                r[mm] = (r[mm] + rng.integers(1, 4, int(mm.sum()))) % 4
            name = f"p{i}"
            truth[(name, 1)] = st
            truth[(name, 2)] = st + ins - rdlen
            q = np.full(rdlen, 40, np.int8)
            b1l.append(Read(name, r1, q, i))
            b2l.append(Read(name, r2, q, i))
            f1.write(f"@{name}\n{alphabet.decode(r1)}\n+\n{qual}\n")
            f2.write(f"@{name}\n{alphabet.decode(r2)}\n+\n{qual}\n")
    pb = [(batchify(b1l[i:i + 8192], pad_to=104),
           batchify(b2l[i:i + 8192], pad_to=104))
          for i in range(0, npairs, 8192)]

    buf = io.StringIO()
    w = samio.SamWriter(buf, fm.ref.names, [int(x) for x in fm.ref.tlens],
                        no_head=True)
    align_and_emit_pe_stream(al, pb[:1], w)
    buf = io.StringIO()
    w = samio.SamWriter(buf, fm.ref.names, [int(x) for x in fm.ref.tlens],
                        no_head=True)
    t0 = time.perf_counter()
    align_and_emit_pe_stream(al, pb, w)
    dt = time.perf_counter() - t0
    prim, aligned, correct = score_sam(buf.getvalue(), truth, pe=True)
    results["tpu_pe"] = dict(reads_per_s=round(2 * npairs / dt, 1),
                             pct_aligned=round(100 * aligned / prim, 2),
                             pct_correct=round(100 * correct / prim, 2))

    cmd = [refbin, "-x", refidx, "-1", f1p, "-2", f2p, "-p", "4",
           "--no-spliced-alignment", "-S", "/tmp/eval_pe_ref.sam"]
    subprocess.run(cmd, check=True, capture_output=True, timeout=900)
    t0 = time.perf_counter()
    subprocess.run(cmd, check=True, capture_output=True, timeout=900)
    dt = time.perf_counter() - t0
    prim, aligned, correct = score_sam("/tmp/eval_pe_ref.sam", truth,
                                       pe=True)
    results["ref_pe"] = dict(reads_per_s=round(2 * npairs / dt, 1),
                             pct_aligned=round(100 * aligned / prim, 2),
                             pct_correct=round(100 * correct / prim, 2))

    results["config"] = dict(reference=args.reference, reads=n,
                             rdlen=rdlen, mismatch_rate=0.01,
                             ref_threads=4)
    print(json.dumps(results, indent=2))
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
