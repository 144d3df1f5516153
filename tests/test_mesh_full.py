"""Full fused pipeline over an 8-device mesh (4 dp x 2 genome shards):
device-side all-gather + merge must reproduce the single-device sharded
aligner's SAM byte for byte, and the psum'd counters must match."""

import io

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.index.sharded import build_sharded
from hisat2_tpu.align.sharded import ShardedAligner
from hisat2_tpu.align.emit import _samfmt, _finish_fastpack
from hisat2_tpu.align.pipeline import NEG_INF
from hisat2_tpu.utils import alphabet
from hisat2_tpu.io import sam as samio
from hisat2_tpu.io.reads import Read, batchify
from hisat2_tpu.parallel.mesh import (
    make_mesh, stack_shard_indexes, fused_se_sharded, shard_batch)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.skipif(_samfmt() is None, reason="native formatter unavailable")
def test_mesh_full_pipeline_matches_single_device():
    rng = np.random.default_rng(33)
    chroms = {f"chr{k}": alphabet.decode(
        rng.integers(0, 4, 15000).astype(np.uint8)) for k in (1, 2)}
    ref = reference_from_seqs(chroms)
    sh = build_sharded(ref, max_bases=16000)
    assert len(sh) == 2

    joined = ref.joined
    B = 64
    reads = []
    for i in range(B):
        st = int(rng.integers(0, joined.size - 80))
        s = joined[st:st + 80].copy()
        mm = rng.random(80) < 0.02
        s[mm] = (s[mm] + rng.integers(1, 4, int(mm.sum()))) % 4
        if rng.random() < 0.5:
            s = alphabet.revcomp(s)
        reads.append(Read(f"m{i}_{st}", s, np.full(80, 40, np.int8), i))
    batch = batchify(reads, pad_to=80)

    # single-device sharded reference output
    sa = ShardedAligner(sh)
    b1 = io.StringIO()
    w1 = samio.SamWriter(b1, ref.names, [int(x) for x in ref.tlens],
                         no_head=True)
    st1 = sa.align_and_emit([batch], w1)

    # mesh: full fused step, 4 dp x 2 shards
    mesh = make_mesh(8, n_shards=2)
    idx_stack = stack_shard_indexes(sh.shards, mesh)
    al0 = sa._activate(0)
    fn = fused_se_sharded(mesh, al0, sh.bases, idx_stack, B,
                          batch.seqs.shape[1])
    seq_w, n_w, quals, qconst, lens = batch.packed()
    assert quals is None
    seq_w, n_w, lens_d = shard_batch(mesh, seq_w, n_w, lens)
    fp, multi, mall, aligned_total, multi_total = fn(
        al0.sctab, seq_w, n_w, jnp.int32(qconst), lens_d)

    fp = np.asarray(fp)
    multi = np.asarray(multi)
    mall = np.asarray(mall)
    merged_full = dict(score=mall[:, :, 0].astype(np.int64),
                       pos=mall[:, :, 1].astype(np.int64),
                       fw=(mall[:, :, 2] & 1) > 0,
                       gapped=(mall[:, :, 2] & 2) > 0)
    b2 = io.StringIO()
    w2 = samio.SamWriter(b2, ref.names, [int(x) for x in ref.tlens],
                         no_head=True)
    st2 = _finish_fastpack(sa.host, batch, fp, None, w2,
                           force_slow=multi, merged_full=merged_full)

    a = b1.getvalue().splitlines()
    b = b2.getvalue().splitlines()
    assert len(a) == len(b)
    ndiff = sum(1 for x, y in zip(a, b) if x != y)
    assert ndiff == 0, [(x, y) for x, y in zip(a, b) if x != y][:3]
    assert st1 == st2
    # psum'd counters match host stats
    assert int(aligned_total) == B - st2["unal"]
