"""Multi-device fused RNA dispatch: the spliced SE step (device splice
pass-1 lanes) under a (dp, shard) mesh — junction lanes must come back
in GLOBAL coordinates with the planted junctions accepted (the mesh
mirror of the single-chip fused dispatch that test_spliced.py covers)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.index.sharded import build_sharded
from hisat2_tpu.align.sharded import ShardedAligner
from hisat2_tpu.utils import alphabet
from hisat2_tpu.io.reads import Read, batchify
from hisat2_tpu.parallel.mesh import (make_mesh, stack_shard_indexes,
                                      fused_rna_sharded, shard_batch)


def _plant_junction(g, ie, ilen):
    g[ie:ie + 2] = [2, 3]                 # GT
    g[ie + ilen - 2:ie + ilen] = [0, 2]   # AG


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_fused_rna_sharded_lanes():
    rng = np.random.default_rng(3)
    n_shards = 2
    L = 64
    chroms = {}
    juncs = {}                            # chrom -> (ie, ilen)
    raw = {}
    for k in range(1, n_shards + 1):
        g = rng.integers(0, 4, 12000).astype(np.uint8)
        ie, ilen = 5000, 700
        _plant_junction(g, ie, ilen)
        chroms[f"chr{k}"] = alphabet.decode(g)
        juncs[f"chr{k}"] = (ie, ilen)
        raw[f"chr{k}"] = g
    ref = reference_from_seqs(chroms)
    sh = build_sharded(ref, max_bases=13000)
    assert len(sh) == n_shards

    mesh = make_mesh(4, n_shards=n_shards)
    idx_stack = stack_shard_indexes(sh.shards, mesh)
    sa = ShardedAligner(sh)
    al0 = sa._activate(0)
    al0.opts.spliced = True

    ndp = 4 // n_shards
    B = 16 * ndp
    reads = []
    truth = []                            # global (posA, posB) per read
    for i in range(B):
        ci = 1 + i % n_shards
        g = raw[f"chr{ci}"]
        base = (ci - 1) * 12000
        ie, ilen = juncs[f"chr{ci}"]
        if i < B // 2:
            # junction read: 32bp each side of the planted intron
            s = np.concatenate([g[ie - 32:ie], g[ie + ilen:ie + ilen + 32]])
            truth.append((base + ie - 32, base + ie + ilen - 32))
        else:
            st = int(rng.integers(0, 8000))
            s = g[st:st + L].copy()
            truth.append(None)
        reads.append(Read(f"r{i}", s.copy(), np.full(L, 40, np.int8), i))
    batch = batchify(reads, pad_to=L)

    kss = al0.ssdb.device_arrays4()
    fn = fused_rna_sharded(mesh, al0, sh.bases, idx_stack, B, L, kss)
    seq_w, n_w, quals, qconst, lens = batch.packed()
    seq_w, n_w, lens_d = shard_batch(mesh, seq_w, n_w, lens)
    fp, multi, l32, l16, cov, aligned_total = fn(
        al0.sctab, seq_w, n_w, jnp.int32(qconst), lens_d)
    l32 = np.asarray(l32)
    l16 = np.asarray(l16)
    cov = np.asarray(cov)

    # exonic exact reads all align through the merged fastpack
    fp = np.asarray(fp)
    for i in range(B // 2, B):
        assert fp[i, 0] >= 1, f"exonic read {i} unaligned"

    # lanes are (B*ndp-local): row ids in l16[:,0] are dp-local; fold
    # dp blocks back to global read ids
    NLtot = l32.shape[0] // ndp
    hits = {}
    for d in range(ndp):
        blk32 = l32[d * NLtot:(d + 1) * NLtot]
        blk16 = l16[d * NLtot:(d + 1) * NLtot]
        live = blk16[:, 4] != 0
        accept = ((blk16[:, 4].astype(np.int64) >> 4) & 1) > 0
        for t in np.flatnonzero(live & accept):
            gi = d * (B // ndp) + int(blk16[t, 0])
            hits.setdefault(gi, set()).add(
                (int(blk32[t, 0]), int(blk32[t, 1])))
    found = 0
    for i in range(B // 2):
        if i in hits and any(pb - pa == truth[i][1] - truth[i][0]
                             for pa, pb in hits[i]):
            found += 1
    assert found >= (B // 2) * 3 // 4, (found, B // 2, hits)
