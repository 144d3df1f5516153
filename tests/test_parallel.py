"""Pure data-parallel mesh (single genome shard, 8 dp devices): the full
fused step must recover exact sampled reads, and the psum'd counters must
see the whole batch. (The 2-D dp x shard mesh is covered by
tests/test_mesh_full.py.)"""

import numpy as np
import jax
import pytest

from hisat2_tpu.index.sharded import build_sharded
from hisat2_tpu.align.sharded import ShardedAligner
from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.io.reads import Read, batchify
from hisat2_tpu.parallel.mesh import (
    make_mesh, stack_shard_indexes, fused_se_sharded, shard_batch)
from hisat2_tpu.utils import alphabet


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_mesh_exact_reads():
    import jax.numpy as jnp
    rng = np.random.default_rng(55)
    codes = rng.integers(0, 4, 30000).astype(np.uint8)
    ref = reference_from_seqs({"chrM": alphabet.decode(codes)})
    sh = build_sharded(ref)          # single shard
    assert len(sh) == 1

    B, L = 64, 64
    starts = rng.integers(0, codes.size - L, B)
    reads = [Read(f"d{i}", codes[s:s + L].copy(),
                  np.full(L, 40, np.int8), i)
             for i, s in enumerate(starts)]
    batch = batchify(reads, pad_to=L)

    mesh = make_mesh(8, n_shards=1)
    idx_stack = stack_shard_indexes(sh.shards, mesh)
    sa = ShardedAligner(sh)
    al0 = sa._activate(0)
    fn = fused_se_sharded(mesh, al0, sh.bases, idx_stack, B, L)
    seq_w, n_w, quals, qconst, lens = batch.packed()
    seq_w, n_w, lens_d = shard_batch(mesh, seq_w, n_w, lens)
    fp, multi, mall, aligned_total, multi_total = fn(
        al0.sctab, seq_w, n_w, jnp.int32(qconst), lens_d)
    fp = np.asarray(fp)
    assert int(np.asarray(aligned_total)) == B
    assert (fp[:, 1] == 0).all()     # exact reads score 0 end-to-end
    lo = fp[:, 4].astype(np.uint16).astype(np.uint32)
    hi = fp[:, 5].astype(np.uint16).astype(np.uint32)
    pos = (lo | (hi << 16)).astype(np.int64)
    assert (pos == starts).all()
