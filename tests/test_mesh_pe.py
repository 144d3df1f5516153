"""Paired-end fused pipeline over an 8-device mesh.

(a) (8 dp x 1 shard): the dp-parallel PE mesh step must reproduce the
single-device packed PE path's SAM byte for byte (the all-gather/merge
degenerates, leaving pure data parallelism — reference's per-thread
pairing loop, hisat2.cpp:3679).
(b) (4 dp x 2 shards): the device-side shard merge of PE packs must
agree with merging the two single-shard runs on the host.
"""

import io

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.index.fm_index import build_fm_index
from hisat2_tpu.index.sharded import build_sharded
from hisat2_tpu.align.pipeline import Aligner
from hisat2_tpu.align.sharded import ShardedAligner
from hisat2_tpu.align import paired as _paired
from hisat2_tpu.align.emit import _samfmt, _finish_pe_pack
from hisat2_tpu.utils import alphabet
from hisat2_tpu.io import sam as samio
from hisat2_tpu.io.reads import Read, batchify
from hisat2_tpu.parallel.mesh import (
    make_mesh, stack_shard_indexes, fused_pe_sharded, shard_batch)


def _make_pairs(rng, joined, B, rdlen=72, frag=220):
    r1l, r2l = [], []
    for i in range(B):
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
    return (batchify(r1l, pad_to=rdlen), batchify(r2l, pad_to=rdlen))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.skipif(_samfmt() is None, reason="native formatter unavailable")
def test_mesh_pe_dp_byte_identical():
    rng = np.random.default_rng(44)
    ref = reference_from_seqs({"chrP": alphabet.decode(
        rng.integers(0, 4, 30000).astype(np.uint8))})
    fm = build_fm_index(ref)
    al = Aligner(fm)
    B = 64
    b1, b2 = _make_pairs(rng, ref.joined, B)

    out = _paired.stage_pe_packed(al, b1, b2, KP=max(8, al.opts.khits + 3))
    s1 = io.StringIO()
    w1 = samio.SamWriter(s1, ref.names, [int(x) for x in ref.tlens],
                         no_head=True)
    st1 = _finish_pe_pack(al, b1, b2, out, w1)

    mesh = make_mesh(8, n_shards=1)
    idx_stack = stack_shard_indexes([fm], mesh)
    fn = fused_pe_sharded(mesh, al, [0], idx_stack, B, b1.seqs.shape[1])
    sw1, nw1, q1, qc1, l1 = b1.packed()
    sw2, nw2, q2, qc2, l2 = b2.packed()
    assert q1 is None and q2 is None and qc1 == qc2
    sw1, nw1, l1d, sw2, nw2, l2d = shard_batch(
        mesh, sw1, nw1, l1, sw2, nw2, l2)
    pack, fslow, m1g, m2g, ptg, conc = fn(
        al.sctab, sw1, nw1, l1d, sw2, nw2, l2d, jnp.int32(qc1))
    pack = np.asarray(pack)
    s2 = io.StringIO()
    w2 = samio.SamWriter(s2, ref.names, [int(x) for x in ref.tlens],
                         no_head=True)
    st2 = _finish_pe_pack(al, b1, b2,
                          (pack, np.asarray(m1g), np.asarray(m2g),
                           np.asarray(ptg)),
                          w2, force_slow=np.asarray(fslow))

    a, b = s1.getvalue().splitlines(), s2.getvalue().splitlines()
    assert len(a) == len(b)
    assert sum(1 for x, y in zip(a, b) if x != y) == 0, \
        [(x, y) for x, y in zip(a, b) if x != y][:3]
    assert st1 == st2
    assert int(conc) == st2["conc_uniq"] + st2["conc_multi"]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.skipif(_samfmt() is None, reason="native formatter unavailable")
def test_mesh_pe_sharded_merge_consistent():
    rng = np.random.default_rng(45)
    chroms = {f"chr{k}": alphabet.decode(
        rng.integers(0, 4, 15000).astype(np.uint8)) for k in (1, 2)}
    ref = reference_from_seqs(chroms)
    sh = build_sharded(ref, max_bases=16000)
    assert len(sh) == 2
    B = 32
    b1, b2 = _make_pairs(rng, ref.joined, B, frag=200)

    mesh = make_mesh(8, n_shards=2)
    idx_stack = stack_shard_indexes(sh.shards, mesh)
    sa = ShardedAligner(sh)
    al0 = sa._activate(0)
    fn = fused_pe_sharded(mesh, al0, sh.bases, idx_stack, B,
                          b1.seqs.shape[1])
    sw1, nw1, q1, qc1, l1 = b1.packed()
    sw2, nw2, q2, qc2, l2 = b2.packed()
    sw1, nw1, l1d, sw2, nw2, l2d = shard_batch(
        mesh, sw1, nw1, l1, sw2, nw2, l2)
    pack, fslow, m1g, m2g, ptg, conc = fn(
        al0.sctab, sw1, nw1, l1d, sw2, nw2, l2d, jnp.int32(qc1))
    pack = np.asarray(pack)

    s2 = io.StringIO()
    w2 = samio.SamWriter(s2, ref.names, [int(x) for x in ref.tlens],
                         no_head=True)
    st2 = _finish_pe_pack(sa.host, b1, b2,
                          (pack, np.asarray(m1g), np.asarray(m2g),
                           np.asarray(ptg)),
                          w2, force_slow=np.asarray(fslow))

    # oracle: the single-device FULL-genome packed path on the same batch
    # (mates score-floor-unalignable there stay mixed in both)
    fm_full = build_fm_index(ref)
    al_full = Aligner(fm_full)
    out_full = _paired.stage_pe_packed(al_full, b1, b2,
                                       KP=max(8, al_full.opts.khits + 3))
    s1 = io.StringIO()
    w1 = samio.SamWriter(s1, ref.names, [int(x) for x in ref.tlens],
                         no_head=True)
    st1 = _finish_pe_pack(al_full, b1, b2, out_full, w1)
    for key in ("conc_uniq", "conc_multi", "mixed_al", "unal", "disc"):
        assert st2[key] == st1[key], (key, st1, st2)

    # every concordant placement from the sharded mesh must be correct
    n_conc = ok = 0
    cum = np.cumsum([0] + [int(x) for x in ref.tlens])
    for line in s2.getvalue().splitlines():
        f = line.split("\t")
        flag = int(f[1])
        if flag & 256 or not flag & 0x40:
            continue
        if flag & 0x2:
            n_conc += 1
            truth = int(f[0].rsplit("_", 1)[1])
            gpos = int(cum[ref.names.index(f[2])] + int(f[3]) - 1)
            if abs(gpos - truth) <= 3:
                ok += 1
    assert n_conc == st2["conc_uniq"] + st2["conc_multi"]
    assert ok == n_conc
    assert int(conc) == st2["conc_uniq"] + st2["conc_multi"]
