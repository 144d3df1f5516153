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
