"""Cross-check the host (NumPy) junction scorer against the device
kernel lane-for-lane (ops/splice_host.py vs ops/splice.py) — the sharded
RNA finish path scores residual lanes on the host, so both must agree on
score, junction offset, strand/canon class and acceptance flags."""

import numpy as np
import jax.numpy as jnp
import pytest

from hisat2_tpu.index.fm_index import build_fm_index
from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.align.scoring import DEFAULT_SCORING
from hisat2_tpu.ops import splice as dsp
from hisat2_tpu.ops import splice_host as hsp
from hisat2_tpu.utils import alphabet


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(77)
    g = np.asarray(rng.integers(0, 4, 40000), np.uint8)
    # plant canonical introns at fixed spots
    introns = []
    for start, ilen in ((2000, 300), (5000, 800), (9000, 2500),
                        (15000, 120), (21000, 5000)):
        g[start:start + 2] = [2, 3]
        g[start + ilen - 2:start + ilen] = [0, 2]
        introns.append((start, ilen))
    ref = reference_from_seqs({"chrH": alphabet.decode(g)})
    fm = build_fm_index(ref, ftab_k=6)
    return g, introns, fm


def _lanes(g, introns, rng, n=64, L=100):
    """Random lanes: half aligned to real junctions, half arbitrary
    diagonal pairs (garbage allowed — both scorers must agree anyway)."""
    rd = np.zeros((n, L), np.int64)
    q = np.full((n, L), 40, np.int64)
    rdl = np.full(n, L, np.int64)
    pA = np.zeros(n, np.int64)
    pB = np.zeros(n, np.int64)
    for i in range(n):
        if i % 2 == 0:
            start, ilen = introns[i % len(introns)]
            j = int(rng.integers(10, L - 10))
            a = start - j
            seq = np.concatenate([g[a:start], g[start + ilen:
                                                start + ilen + (L - j)]])
            mm = rng.random(L) < 0.02
            seq = seq.copy()
            seq[mm] = (seq[mm] + 1) % 4
            rd[i] = seq
            pA[i] = a
            pB[i] = a + ilen
        else:
            p = int(rng.integers(100, 30000))
            rd[i] = g[p:p + L]
            pA[i] = p
            pB[i] = p + int(rng.integers(25, 4000))
    return rd, q, rdl, pA, pB


def test_host_matches_device(setup):
    g, introns, fm = setup
    rng = np.random.default_rng(3)
    rd, q, rdl, pA, pB = _lanes(g, introns, rng)
    # known-site table covering two of the introns
    ks = sorted([(s - 1, s + l) for s, l in introns[:2]])
    kl = np.asarray([k[0] for k in ks], np.int64)
    kr = np.asarray([k[1] for k in ks], np.int64)
    sc = DEFAULT_SCORING

    rdev = dsp.junction_score(
        fm.device, sc.device_tables(), jnp.asarray(rd.astype(np.int32)),
        jnp.asarray(q.astype(np.int32)), jnp.asarray(rdl.astype(np.int32)),
        jnp.asarray(pA.astype(np.int32)), jnp.asarray(pB.astype(np.int32)),
        jnp.asarray(kl.astype(np.int32)), jnp.asarray(kr.astype(np.int32)))
    rhost = hsp.junction_score_host(
        fm.ref.joined.astype(np.int64), sc, rd, q, rdl, pA, pB, kl, kr)

    for f in ("score", "j", "strand", "canon", "mmL", "mmR"):
        np.testing.assert_array_equal(
            np.asarray(rdev[f]).astype(np.int64), rhost[f].astype(np.int64),
            err_msg=f"field {f}")
    live = rhost["score"] > dsp.NEG // 2
    np.testing.assert_allclose(np.asarray(rdev["probscore"])[live],
                               rhost["probscore"][live], atol=1e-4)

    pdev = np.asarray(dsp._gate_pack(
        rdev, jnp.asarray(rdl.astype(np.int32)),
        jnp.asarray(pA.astype(np.int32)), jnp.asarray(pB.astype(np.int32)),
        jnp.float32(sc.score_min.I), jnp.float32(sc.score_min.S),
        jnp.int32(500000), False)).astype(np.int64)
    phost = hsp.gate_pack_host(rhost, sc, rdl, pA, pB, 500000, False)
    np.testing.assert_array_equal(pdev[:, 1:], phost[:, 1:])
    np.testing.assert_array_equal(
        np.maximum(pdev[:, 0], -32768),     # device pack clips to int16
        np.maximum(np.clip(phost[:, 0], -32768, 32767), -32768))


def test_native_scorer_matches_numpy():
    """native/juncscore.cpp vs the NumPy mirror, lane-for-lane, with and
    without an SNV overlay and known sites."""
    from hisat2_tpu.ops import splice_host as sph
    from hisat2_tpu.align.scoring import DEFAULT_SCORING
    from hisat2_tpu import native
    if native.juncscore_lib() is None:
        import pytest
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(3)
    joined = rng.integers(0, 4, 100000).astype(np.uint8)
    C, L = 1500, 104
    rd = rng.integers(0, 5, (C, L)).astype(np.int64)
    q = rng.integers(10, 41, (C, L)).astype(np.int64)
    rdlens = rng.integers(40, L + 1, C).astype(np.int64)
    posA = rng.integers(100, 80000, C).astype(np.int64)
    posB = posA + rng.integers(18, 60000, C)
    kl = np.sort(rng.integers(100, 95000, 300))
    kr = kl + rng.integers(30, 50000, 300)
    order = np.lexsort((kr, kl))
    kl, kr = kl[order], kr[order]
    sc = DEFAULT_SCORING
    for ov in (None,
               rng.integers(0, 16, joined.size).astype(np.uint8)):
        r_np = sph.junction_score_host(joined, sc, rd, q, rdlens,
                                       posA, posB, kl, kr, overlay=ov)
        p_np = sph.gate_pack_host(r_np, sc, rdlens, posA, posB,
                                  524288, False)
        r_nat, p_nat = sph.junction_score_gate(
            joined, sc, rd, q, rdlens, posA, posB, kl, kr, ov,
            524288, False)
        for k in ("score", "j", "strand", "canon", "mmL", "mmR"):
            assert (np.asarray(r_np[k]) == np.asarray(r_nat[k])).all(), k
        assert np.abs(r_np["probscore"].astype(np.float64)
                      - r_nat["probscore"].astype(np.float64)).max() < 1e-5
        assert (p_np == p_nat).all()
