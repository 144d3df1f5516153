"""Multi-device data-parallel alignment over the virtual 8-device CPU mesh
(the production sharding layout: reads sharded along dp, index replicated;
SURVEY.md §2.6 P8)."""

import numpy as np
import jax
import pytest

from hisat2_tpu.align.pipeline import Aligner
from hisat2_tpu.index.fm_index import build_fm_index
from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.parallel.mesh import (
    make_mesh, replicate_index, shard_batch, sharded_candidate_fn)
from hisat2_tpu.utils import alphabet


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_candidates_match_single_device():
    import jax.numpy as jnp
    rng = np.random.default_rng(55)
    codes = rng.integers(0, 4, 30000).astype(np.uint8)
    ref = reference_from_seqs({"chrM": alphabet.decode(codes)})
    al = Aligner(build_fm_index(ref, ftab_k=6))

    B, L = 64, 64
    starts = rng.integers(0, codes.size - L, B)
    seqs = np.stack([codes[s:s + L] for s in starts])
    quals = np.full((B, L), 40, np.int8)
    lens = np.full(B, L, np.int32)

    mesh = make_mesh(8)
    idx_r = replicate_index(al.idx, mesh)
    s_sh, q_sh, l_sh = shard_batch(mesh, jnp.asarray(seqs),
                                   jnp.asarray(quals), jnp.asarray(lens))
    fn = sharded_candidate_fn(mesh, 8, 4, 8)
    pos, score = fn(idx_r, al.sctab, s_sh, q_sh, l_sh)
    pos, score = np.asarray(pos), np.asarray(score)
    # every read was sampled exactly -> a zero-score candidate at its origin
    assert (score[:B].max(axis=1) == 0).all()
    best = pos[np.arange(B), score[:B].argmax(axis=1)]
    assert (best == starts).all()
