"""Multi-host (multi-process) data path: jax.distributed init, a global
process-spanning mesh, and the deterministic cross-host novel-splice-
site merge.

The reference is single-node; its only cross-worker mutable state is
the SpliceSiteDB, shared between pthreads under a mutex with a read-id
skew window (hisat2.cpp:3285-3308, SURVEY §2.6 P5). The multi-host
equivalent is ROUND-BASED: every process aligns its own read shard for
one batch round against a frozen site table, then all processes
exchange their newly discovered sites (process_allgather over DCN) and
merge them in sorted order — deterministic regardless of process count
or timing, unlike the reference's skew-window races (P8: the reference
has no distributed backend at all; multi-node users run independent
processes with no sharing)."""

from __future__ import annotations

import numpy as np


def init_distributed(coordinator: str, num_processes: int,
                     process_id: int) -> None:
    """jax.distributed over DCN (CPU test rig: two processes with
    xla_force_host_platform_device_count virtual devices each)."""
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(n_shards: int = 1):
    """(dp, shard) mesh over ALL processes' devices (dp spans hosts —
    read batches shard across hosts; genome shards live within a host's
    column so index traffic stays on ICI)."""
    import jax
    from jax.sharding import Mesh
    devices = jax.devices()
    n = len(devices)
    assert n % n_shards == 0, (n, n_shards)
    arr = np.asarray(devices).reshape(n // n_shards, n_shards)
    return Mesh(arr, axis_names=("dp", "shard"))


def shard_batch_global(mesh, *arrays):
    """Per-process local batch slices -> global dp-sharded arrays (each
    process contributes its own reads; jax assembles the global array
    without replicating read data across hosts)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    ndp_local = mesh.local_mesh.shape["dp"]
    ndp = mesh.shape["dp"]
    out = []
    for a in arrays:
        a = np.asarray(a)
        gshape = (a.shape[0] * (ndp // ndp_local),) + a.shape[1:]
        out.append(jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("dp")), a, gshape))
    return tuple(out)


def sync_splice_sites(ssdb) -> int:
    """Exchange + merge novel splice sites across processes (one round
    of the P5 cross-host merge). Every process ends with the identical
    union, applied in sorted (left, right) order so downstream site
    tables are deterministic. Returns the number of sites adopted from
    other processes."""
    from jax.experimental import multihost_utils as mhu

    local = sorted(ssdb.novel)
    rows = np.zeros((len(local), 3), np.int64)
    for i, k in enumerate(local):
        s = ssdb.strands.get(k, ".")
        rows[i] = (k[0], k[1], 1 if s == "+" else (-1 if s == "-" else 0))
    # pad to the global max count (allgather needs uniform shapes)
    n = np.asarray([rows.shape[0]], np.int64)
    counts = np.asarray(mhu.process_allgather(n)).reshape(-1)
    cap = int(counts.max()) if counts.size else 0
    if cap == 0:
        return 0
    pad = np.full((cap, 3), -1, np.int64)
    pad[:rows.shape[0]] = rows
    allr = np.asarray(mhu.process_allgather(pad)).reshape(-1, 3)
    allr = allr[allr[:, 0] >= 0]
    order = np.lexsort((allr[:, 1], allr[:, 0]))
    adopted = 0
    for li, ri, sc in allr[order]:
        k = (int(li), int(ri))
        if k in ssdb.novel or k in ssdb.known:
            continue
        ssdb.add_novel(int(li), int(ri),
                       "+" if sc > 0 else ("-" if sc < 0 else "."))
        adopted += 1
    return adopted
