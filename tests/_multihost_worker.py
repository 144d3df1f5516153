"""Worker for test_multihost.py: one of two jax.distributed processes.

Round-based spliced alignment over a shared synthetic genome:
  round 1 — each process aligns reads crossing ITS OWN planted junction
            (long anchors, discoverable without help);
  sync    — novel sites exchange (multihost.sync_splice_sites);
  round 2 — each process aligns SHORT-anchor reads over the OTHER
            process's junction: only known-site-implied lanes can place
            them, proving the cross-host merge feeds later rounds (the
            reference's cross-thread SpliceSiteDB sharing, P5).
Also runs the fused SE step once over the GLOBAL (2-host) mesh and
psums the aligned count across hosts (P8)."""

import hashlib
import io
import os
import sys

pid = int(sys.argv[1])
coord = sys.argv[2]

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.environ.get("PYTHONPATH", "."))

from hisat2_tpu.parallel import multihost as mh

mh.init_distributed(coord, 2, pid)

import numpy as np
import jax.numpy as jnp

from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.index.fm_index import build_fm_index
from hisat2_tpu.align.pipeline import Aligner
from hisat2_tpu.align import emit
from hisat2_tpu.io import sam as samio
from hisat2_tpu.io.reads import Read, batchify
from hisat2_tpu.utils import alphabet

# shared genome: one planted junction per process
rng = np.random.default_rng(5)
g = rng.integers(0, 4, 60000).astype(np.uint8)
IE = {0: 20000, 1: 40000}
ILEN = 900
for e in IE.values():
    g[e:e + 2] = [2, 3]
    g[e + ILEN - 2:e + ILEN] = [0, 2]
fm = build_fm_index(reference_from_seqs({"chrM": alphabet.decode(g)}))

al = Aligner(fm)
al.opts.spliced = True


def junction_read(ie, far, name, rid):
    s = np.concatenate([g[ie - (100 - far):ie], g[ie + ILEN:ie + ILEN + far]])
    return Read(name, s.copy(), np.full(100, 40, np.int8), rid)


def run_batch(reads):
    b = batchify(reads, pad_to=104)
    buf = io.StringIO()
    w = samio.SamWriter(buf, fm.ref.names, [int(x) for x in fm.ref.tlens],
                        no_head=True)
    emit.align_and_emit(al, b, w)
    return buf.getvalue()


# round 1: own junction, long anchors (discoverable)
mine = IE[pid]
other = IE[1 - pid]
r1 = [junction_read(mine, 40 + i, f"p{pid}r1_{i}", i) for i in range(8)]
sam1 = run_batch(r1)

adopted = mh.sync_splice_sites(al.ssdb)

# round 2: OTHER process's junction with 2bp far anchors — placeable
# only through the site the other process published
r2 = [junction_read(other, 2, f"p{pid}r2_{i}", i) for i in range(4)]
sam2 = run_batch(r2)
cross_spliced = sum(1 for ln in sam2.splitlines()
                    if f"{ILEN}N" in ln.split("\t")[5])

# global-mesh fused SE step: each process contributes 32 exact reads;
# psum'd aligned count must see all 64 (P8)
from hisat2_tpu.align.pipeline import _stage_align_packed
from jax.sharding import PartitionSpec as P

mesh = mh.global_mesh(n_shards=1)
B, L = 64, 64
reads = []
for i in range(32):
    st = int(rng.integers(0, g.size - L))
    reads.append(Read(f"g{pid}_{i}", g[st:st + L].copy(),
                      np.full(L, 40, np.int8), i))
bloc = batchify(reads, pad_to=L)
seq_w, n_w, _q, qconst, lens = bloc.packed()
seq_wg, n_wg, lens_g = mh.shard_batch_global(mesh, seq_w, n_w, lens)

o = al.opts
sc = al.scoring
K2 = min(2 * o.top_cands, max(8, o.khits + 3))
Bl = B // mesh.shape["dp"]


def local(idx, sctab, sw, nw, qc, ls):
    fp, _m = _stage_align_packed(
        idx, sctab, sw, nw, None, qc, ls,
        jnp.float32(sc.score_min.I), jnp.float32(sc.score_min.S),
        jnp.int32(min(sc.read_gap_open(), sc.ref_gap_open())),
        Bl, L, o.max_seeds, o.n_seeds, o.locs_per_seg, o.top_cands,
        al.min_seg_len, fm.ftab_k, K2, 1,
        min(Bl, max(32, Bl // 8)), min(Bl, max(64, Bl // 8)),
        o.dp_pad, o.no_dp, o.nofw, o.norc, al.seeder, al.fb_seeder,
        al.sc_const)
    return jax.lax.psum((fp[:, 0] >= 1).sum(), "dp")


f = jax.jit(jax.shard_map(
    local, mesh=mesh,
    in_specs=(P(), P(), P("dp"), P("dp"), P(), P("dp")),
    out_specs=P(), check_vma=False))
tot = int(np.asarray(f(al.idx, al.sctab, seq_wg, n_wg,
                       jnp.int32(qconst), lens_g)))

sites = ";".join(f"{k[0]},{k[1]}" for k in sorted(al.ssdb.novel))
sam_digest = hashlib.sha1((sam1 + sam2).encode()).hexdigest()
print(f"RESULT {pid} adopted {adopted}", flush=True)
print(f"RESULT {pid} cross_spliced {cross_spliced}", flush=True)
print(f"RESULT {pid} sites {hashlib.sha1(sites.encode()).hexdigest()}",
      flush=True)
print(f"RESULT {pid} global_aligned {tot}", flush=True)
print(f"RESULT {pid} sam {pid}:{sam_digest}", flush=True)
