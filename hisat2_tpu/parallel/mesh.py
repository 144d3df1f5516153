"""Data-parallel alignment over a device mesh.

The reference's unit of parallelism is a pthread pulling one read at a time
from a locked PatternSource (hisat2.cpp:3679-3696). The TPU-native unit is a
*device*: read batches shard across the mesh's data-parallel axis, the FM
index arrays are replicated into every chip's HBM (6.2GB GRCh38+SNP fits,
SURVEY.md §6), and the only collectives are the implicit all-gather of the
top-candidate outputs and psum of summary counters — both tiny next to the
per-device search work, so scaling is embarrassingly linear over ICI.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("dp",))


def replicate_index(idx: dict, mesh: Mesh) -> dict:
    """Place every index array on all devices (replicated sharding)."""
    repl = NamedSharding(mesh, P())
    out = {}
    for k, v in idx.items():
        if isinstance(v, jax.Array):
            out[k] = jax.device_put(v, repl)
        else:
            out[k] = v
    return out


def shard_batch(mesh: Mesh, *arrays):
    """Shard read-batch arrays along the dp axis (batch must divide evenly;
    callers pad the final batch)."""
    sh = NamedSharding(mesh, P("dp"))
    return tuple(jax.device_put(a, sh) for a in arrays)


def sharded_candidate_fn(mesh: Mesh, max_seeds: int, locs_per_seg: int,
                         top_cands: int):
    """jit-compiled candidate stage with explicit dp shardings.

    Returns fn(idx, sctab, seqs, quals, lens) -> (pos, score) where inputs
    are sharded along the batch axis and the index is replicated.
    """
    from ..align.pipeline import _stage_candidates

    batch_sh = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())

    def step(idx, sctab, seqs, quals, lens):
        st = _stage_candidates(idx, sctab, seqs, quals, lens,
                               max_seeds, locs_per_seg, top_cands)
        return st["pos"], st["score"]

    return jax.jit(
        step,
        in_shardings=(None, None, batch_sh, batch_sh, batch_sh),
        out_shardings=(batch_sh, batch_sh),
    )
