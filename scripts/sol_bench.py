#!/usr/bin/env python
"""Speed-of-light microbenchmarks for the hot device ops (VERDICT r1 #1):
achieved bytes/s and op-rate vs the chip's HBM peak, one JSON line per
kernel. Run on the real TPU; CPU runs report the same metrics unscaled.

Kernels measured (matching the reference's hot loops):
  rank        — popcount Occ over packed BWT sides (gfm.h:2958 role)
  textwin     — candidate text-window fetch (verify's gather, HOT op)
  seedtab     — direct-address seed-table lookup (partialSearch role)
  dp_pallas   — affine-gap DP kernel (aligner_swsse_*.cpp role)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# v5e (TPU v5 lite) HBM peak ~819 GB/s; v5p ~2765 GB/s
HBM_PEAK = {"TPU v5 lite": 819e9, "TPU v5p": 2765e9}


def _t(f, *a, n=10):
    import jax
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    rs = [f(*a) for _ in range(n)]
    jax.block_until_ready(rs)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    import bench as B
    B._enable_compile_cache()
    from hisat2_tpu.align.pipeline import Aligner
    from hisat2_tpu.ops import rank as R, extend as E, search as S

    dev = jax.devices()[0]
    peak = HBM_PEAK.get(dev.device_kind, 819e9)
    fm = B._get_index()
    al = Aligner(fm)
    idx = al.idx
    rng = np.random.default_rng(0)
    out = []

    # --- rank: batched Occ(count) over packed sides ---
    Q = 1 << 20
    rows = jnp.asarray(rng.integers(0, fm.m - 2, Q), jnp.int32)
    chars = jnp.asarray(rng.integers(0, 4, Q), jnp.int32)
    rank2 = jax.jit(lambda r, c: R.rank(idx, r, c))
    try:
        dt = _t(rank2, rows, chars)
        bytes_touched = Q * 48         # one 48B side per query
        out.append(dict(kernel="rank", queries_per_s=Q / dt,
                        bytes_per_s=bytes_touched / dt,
                        frac_hbm_peak=bytes_touched / dt / peak))
    except Exception as e:  # pragma: no cover
        out.append(dict(kernel="rank", error=str(e)[:80]))

    # --- textwin: verify's window fetch + compare ---
    W = 104
    NQ = 1 << 19
    starts = jnp.asarray(rng.integers(0, fm.ref.joined.size - W, NQ),
                         jnp.int32)
    tw = jax.jit(lambda s: R.text_window(idx, s, W).sum(axis=-1,
                                                        dtype=jnp.int32))
    dt = _t(tw, starts)
    bytes_touched = NQ * 2 * 16 * 4    # two 16-word text rows per window
    out.append(dict(kernel="textwin", windows_per_s=NQ / dt,
                    bases_per_s=NQ * W / dt,
                    bytes_per_s=bytes_touched / dt,
                    frac_hbm_peak=bytes_touched / dt / peak))

    # --- seedtab: direct-address kmer lookup ---
    Rr = 1 << 15
    L = 104
    seqs = jnp.asarray(rng.integers(0, 4, (Rr, L)), jnp.int8)
    lens = jnp.full(Rr, 100, jnp.int32)
    tl = jax.jit(lambda s, l: S.table_lookup(idx, s, l, n_seeds=8,
                                             locs_per_seg=8)["locs"])
    dt = _t(tl, seqs, lens)
    n_seed = Rr * 8
    out.append(dict(kernel="seedtab", seeds_per_s=n_seed / dt,
                    reads_per_s=Rr / dt))

    # --- dp_pallas: affine-gap DP scores ---
    try:
        from hisat2_tpu.ops.dp_pallas import dp_score_pallas
        NR = 4096
        W2 = L + 32
        rd = jnp.asarray(rng.integers(0, 4, (NR, L)), jnp.int32)
        pen = jnp.full((NR, L), 6, jnp.int32)
        rl = jnp.full(NR, 100, jnp.int32)
        ref = jnp.asarray(rng.integers(0, 4, (NR, W2)), jnp.int32)
        scp_cum = jnp.zeros((NR, L + 1), jnp.int32)
        f = jax.jit(lambda *a: dp_score_pallas(
            *a, match_bonus=0, n_pen=1, rd_open=5, rd_ext=3,
            rf_open=5, rf_ext=3))
        dt = _t(f, rd, pen, rl, ref, scp_cum)
        cells = NR * L * W2
        out.append(dict(kernel="dp_pallas", cells_per_s=cells / dt,
                        rows_per_s=NR / dt))
    except Exception as e:  # pragma: no cover
        out.append(dict(kernel="dp_pallas", error=str(e)[:80]))

    for o in out:
        o["device"] = dev.device_kind
        print(json.dumps(o))
    return 0


if __name__ == "__main__":
    sys.exit(main())
