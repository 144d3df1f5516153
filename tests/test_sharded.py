"""Genome-sharded alignment (int32-per-shard replacement for the
reference's 64-bit .ht2l large-index path): output must match the
single-index aligner byte for byte."""

import io

import numpy as np
import pytest

from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.index.fm_index import build_fm_index
from hisat2_tpu.index.sharded import build_sharded
from hisat2_tpu.align.sharded import ShardedAligner
from hisat2_tpu.align.pipeline import Aligner
from hisat2_tpu.align.emit import align_and_emit, _samfmt
from hisat2_tpu.utils import alphabet
from hisat2_tpu.io import sam as samio
from hisat2_tpu.io.reads import Read, batchify


@pytest.mark.skipif(_samfmt() is None, reason="native formatter unavailable")
def test_sharded_matches_single():
    rng = np.random.default_rng(21)
    chroms = {f"chr{k}": alphabet.decode(
        rng.integers(0, 4, 15000).astype(np.uint8)) for k in range(1, 4)}
    ref = reference_from_seqs(chroms)
    fm = build_fm_index(ref)
    sh = build_sharded(ref, max_bases=16000)   # forces 3 shards
    assert len(sh) == 3

    joined = ref.joined
    reads = []
    for i in range(256):
        st = int(rng.integers(0, joined.size - 80))
        s = joined[st:st + 80].copy()
        mm = rng.random(80) < 0.02
        s[mm] = (s[mm] + rng.integers(1, 4, int(mm.sum()))) % 4
        if rng.random() < 0.5:
            s = alphabet.revcomp(s)
        reads.append(Read(f"s{i}_{st}", s, np.full(80, 40, np.int8), i))
    batch = batchify(reads, pad_to=80)

    b1 = io.StringIO()
    w1 = samio.SamWriter(b1, ref.names, [int(x) for x in ref.tlens],
                         no_head=True)
    st1 = align_and_emit(Aligner(fm), batch, w1)

    b2 = io.StringIO()
    w2 = samio.SamWriter(b2, ref.names, [int(x) for x in ref.tlens],
                         no_head=True)
    st2 = ShardedAligner(sh).align_and_emit([batch], w2)

    a = b1.getvalue().splitlines()
    b = b2.getvalue().splitlines()
    assert len(a) == len(b)
    ndiff = sum(1 for x, y in zip(a, b) if x != y)
    assert ndiff == 0, [(x, y) for x, y in zip(a, b) if x != y][:3]
    assert st1 == st2
