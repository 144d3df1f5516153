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


@pytest.mark.skipif(_samfmt() is None, reason="native formatter unavailable")
def test_sharded_pe_matches_single():
    """Paired-end over a genome-sharded index: the host shard merge
    (align/sharded._merge_pe_shards) must reproduce the single-index
    packed PE path byte for byte — concordant fast path, cross-shard
    secbest folding, and slow pairs (mixed/discordant/rescue) through
    the merged global grids."""
    from hisat2_tpu.align import paired as _paired
    from hisat2_tpu.align.emit import _finish_pe_pack

    rng = np.random.default_rng(77)
    chroms = {f"chr{k}": alphabet.decode(
        rng.integers(0, 4, 15000).astype(np.uint8)) for k in range(1, 4)}
    ref = reference_from_seqs(chroms)
    fm = build_fm_index(ref)
    sh = build_sharded(ref, max_bases=16000)
    assert len(sh) == 3

    joined = ref.joined
    rdlen, frag = 72, 220
    r1l, r2l = [], []
    for i in range(128):
        st = int(rng.integers(0, joined.size - frag))
        fragc = joined[st:st + frag]
        m1 = fragc[:rdlen].copy()
        m2 = alphabet.revcomp(fragc[-rdlen:]).copy()
        for r in (m1, m2):
            mm = rng.random(rdlen) < 0.01
            r[mm] = (r[mm] + rng.integers(1, 4, int(mm.sum()))) % 4
        q = np.full(rdlen, 40, np.int8)
        r1l.append(Read(f"p{i}_{st}", m1, q, i))
        r2l.append(Read(f"p{i}_{st}", m2, q, i))
    # a few unpairable mates (random junk mate 2) exercise the slow path
    for i in range(128, 136):
        st = int(rng.integers(0, joined.size - rdlen))
        m1 = joined[st:st + rdlen].copy()
        m2 = rng.integers(0, 4, rdlen).astype(m1.dtype)
        q = np.full(rdlen, 40, np.int8)
        r1l.append(Read(f"p{i}_{st}", m1, q, i))
        r2l.append(Read(f"p{i}_{st}", m2, q, i))
    pb1 = batchify(r1l, pad_to=rdlen)
    pb2 = batchify(r2l, pad_to=rdlen)

    al_full = Aligner(fm)
    out_full = _paired.stage_pe_packed(al_full, pb1, pb2,
                                       KP=max(8, al_full.opts.khits + 3))
    s1 = io.StringIO()
    w1 = samio.SamWriter(s1, ref.names, [int(x) for x in ref.tlens],
                         no_head=True)
    st1 = _finish_pe_pack(al_full, pb1, pb2, out_full, w1)

    s2 = io.StringIO()
    w2 = samio.SamWriter(s2, ref.names, [int(x) for x in ref.tlens],
                         no_head=True)
    st2 = ShardedAligner(sh).align_and_emit_pe([(pb1, pb2)], w2)

    a = s1.getvalue().splitlines()
    b = s2.getvalue().splitlines()
    assert len(a) == len(b)
    ndiff = sum(1 for x, y in zip(a, b) if x != y)
    assert ndiff == 0, [(x, y) for x, y in zip(a, b) if x != y][:3]
    assert st1 == st2
