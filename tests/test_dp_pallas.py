"""Pallas DP kernel vs the XLA lax.scan DP (ops/sw.py): score-exact on
random batches, including soft clips, gaps, Ns, and short reads.
Runs the kernel in interpret mode (CPU CI); on TPU the same code path is
exercised by the fused pipeline."""

import numpy as np
import jax.numpy as jnp
import pytest

from hisat2_tpu.align.scoring import Scoring
from hisat2_tpu.ops.sw import dp_score_batch
from hisat2_tpu.ops.dp_pallas import dp_score_pallas


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_xla(seed):
    rng = np.random.default_rng(seed)
    sc = Scoring()
    sctab = sc.device_tables()
    C, L, W = 24, 60, 92
    ref = rng.integers(0, 4, (C, W)).astype(np.int32)
    rd = np.empty((C, L), np.int32)
    lens = rng.integers(30, L + 1, C).astype(np.int32)
    for i in range(C):
        start = rng.integers(0, W - L + 1)
        rd[i] = ref[i, start:start + L]
        # mutations: mismatches, N, and a gap for some rows
        nmut = rng.integers(0, 6)
        for _ in range(nmut):
            p = rng.integers(0, lens[i])
            rd[i, p] = rng.integers(0, 5)
        if i % 3 == 0:  # deletion in read coordinates: shift tail
            d = int(rng.integers(1, 4))
            p = int(rng.integers(5, lens[i] - 5))
            tail = ref[i, start + p + d:min(start + L + d, W)]
            rd[i, p:p + tail.size] = tail
    quals = rng.integers(20, 41, (C, L)).astype(np.int32)

    want = np.asarray(dp_score_batch(sctab, jnp.asarray(rd),
                                     jnp.asarray(quals), jnp.asarray(lens),
                                     jnp.asarray(ref)))

    qc = np.clip(quals, 0, 63)
    pen = sc.mm_pens()[qc]
    in_read = np.arange(L)[None, :] < lens[:, None]
    scp = np.where(in_read, sc.sc_pens()[qc], 0)
    scp_cum = np.concatenate(
        [np.zeros((C, 1), np.int64), np.cumsum(scp, axis=1)], axis=1)
    got = np.asarray(dp_score_pallas(
        jnp.asarray(rd), jnp.asarray(pen), jnp.asarray(lens),
        jnp.asarray(ref), jnp.asarray(scp_cum),
        match_bonus=int(sc.match_bonus), n_pen=int(sc.n_pen),
        rd_open=int(sc.read_gap_open()), rd_ext=int(sc.read_gap_extend()),
        rf_open=int(sc.ref_gap_open()), rf_ext=int(sc.ref_gap_extend()),
        interpret=True))
    assert (got == want).all(), (got - want)
