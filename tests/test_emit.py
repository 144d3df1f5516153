"""The native fast-path emitter must produce byte-identical SAM to the
Python ReadResult path on a mixed batch (unique / multi / mismatch /
gapped / unaligned / N-filtered reads)."""

import io

import numpy as np
import pytest

from hisat2_tpu.align.pipeline import Aligner, results_to_sam
from hisat2_tpu.align.emit import align_and_emit, _samfmt
from hisat2_tpu.index.fm_index import build_fm_index
from hisat2_tpu.io import sam as samio
from hisat2_tpu.io.reads import Read, batchify
from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.utils import alphabet


def test_native_formatter_available():
    assert _samfmt() is not None, "samfmt.cpp failed to build"


def test_emit_matches_python_path():
    rng = np.random.default_rng(31)
    codes = rng.integers(0, 4, 60000).astype(np.uint8)
    # plant a duplicate region for multi-mapping
    codes[40000:40500] = codes[10000:10500]
    ref = reference_from_seqs({"chrE": alphabet.decode(codes)})
    al = Aligner(build_fm_index(ref, ftab_k=6))

    reads = []
    k = 0
    for i in range(60):
        p = int(rng.integers(0, 59000))
        s = codes[p:p + 100].copy()
        kind = i % 6
        if kind == 1:
            mm = rng.integers(0, 100, 2)
            s[mm] = (s[mm] + 1) % 4
        elif kind == 2:
            s = alphabet.revcomp(s)
        elif kind == 3:   # gapped
            s = np.concatenate([s[:50], s[53:], codes[p + 100:p + 103]])
        elif kind == 4:   # multi (duplicate region)
            s = codes[10100 + (i % 3) * 37:10200 + (i % 3) * 37].copy()
        elif kind == 5 and i == 5:   # junk
            s = rng.integers(0, 4, 100).astype(np.uint8)
        q = rng.integers(20, 41, s.size).astype(np.int8)
        reads.append(Read(f"m{i}", s, q, k))
        k += 1
    batch = batchify(reads)

    def run(fn):
        buf = io.StringIO()
        w = samio.SamWriter(buf, al.fm.ref.names, [60000], no_head=True)
        stats = fn(w)
        return buf.getvalue(), stats

    out_py, st_py = run(lambda w: results_to_sam(
        batch, al.align_batch(batch), al, w))
    out_c, st_c = run(lambda w: align_and_emit(al, batch, w))
    if out_py != out_c:
        a, b = out_py.splitlines(), out_c.splitlines()
        for x, y in zip(a, b):
            if x != y:
                raise AssertionError(f"PY: {x}\nC : {y}")
        assert len(a) == len(b)
    assert st_py == st_c


def test_emit_high_multimap_bucket():
    """Reads with >= 3 placements flow through the compacted multi-report
    bucket (_stage_fastpack MB extras) and must match the Python path."""
    rng = np.random.default_rng(37)
    codes = rng.integers(0, 4, 40000).astype(np.uint8)
    rep = codes[5000:5800].copy()
    for at in (15000, 25000, 35000):       # 4 copies total
        codes[at:at + 800] = rep
    ref = reference_from_seqs({"chrH": alphabet.decode(codes)})
    al = Aligner(build_fm_index(ref, ftab_k=6))

    reads = []
    for i in range(48):
        if i % 2 == 0:
            p = 5000 + int(rng.integers(0, 700))     # inside the repeat
        else:
            p = int(rng.integers(0, 39000))
        s = codes[p:p + 100].copy()
        if i % 5 == 0:
            mm = rng.integers(0, 100, 1)
            s[mm] = (s[mm] + 1) % 4
        q = np.full(s.size, 35, np.int8)             # constant quals: packed
        reads.append(Read(f"h{i}", s, q, i))
    batch = batchify(reads)

    def run(fn):
        buf = io.StringIO()
        w = samio.SamWriter(buf, al.fm.ref.names, [40000], no_head=True)
        stats = fn(w)
        return buf.getvalue(), stats

    out_py, st_py = run(lambda w: results_to_sam(
        batch, al.align_batch(batch), al, w))
    out_c, st_c = run(lambda w: align_and_emit(al, batch, w))
    a, b = out_py.splitlines(), out_c.splitlines()
    for x, y in zip(a, b):
        assert x == y, f"PY: {x}\nC : {y}"
    assert len(a) == len(b)
    assert st_py == st_c
    assert any("\tNH:i:4" in ln for ln in b), \
        "no 4-way multimapped read exercised the bucket path"
