"""Paired-end alignment tests: concordance policy, TLEN, flags, fallbacks."""

import io

import numpy as np
import pytest

from hisat2_tpu.align.pipeline import Aligner
from hisat2_tpu.align.paired import align_pairs, pairs_to_sam, _concordant
from hisat2_tpu.index.fm_index import build_fm_index
from hisat2_tpu.io import sam as samio
from hisat2_tpu.io.reads import Read, batchify
from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.utils import alphabet


@pytest.fixture(scope="module")
def setup():
    r = np.random.default_rng(21)
    codes = r.integers(0, 4, size=60000).astype(np.uint8)
    ref = reference_from_seqs({"chrP": alphabet.decode(codes)})
    return codes, Aligner(build_fm_index(ref, ftab_k=6))


def _make_pairs(codes, rng, n, frag=300, rdlen=100):
    r1, r2, truth = [], [], []
    for i in range(n):
        p = int(rng.integers(0, codes.size - frag))
        m1 = codes[p:p + rdlen].copy()
        m2 = alphabet.revcomp(codes[p + frag - rdlen:p + frag])
        r1.append(Read(f"p{i}", m1, np.full(rdlen, 40), i))
        r2.append(Read(f"p{i}", m2, np.full(rdlen, 40), i))
        truth.append((p, p + frag - rdlen))
    return r1, r2, truth


def test_concordant_pairs(setup):
    codes, al = setup
    rng = np.random.default_rng(3)
    r1, r2, truth = _make_pairs(codes, rng, 20)
    b1, b2 = batchify(r1), batchify(r2)
    results = align_pairs(al, b1, b2)
    for pr, (p1, p2) in zip(results, truth):
        assert pr.kind == "concordant"
        assert pr.aln1.joined_pos == p1 and pr.aln1.fw
        assert pr.aln2.joined_pos == p2 and not pr.aln2.fw
        assert pr.best == 0


def test_pair_sam_flags_tlen(setup):
    codes, al = setup
    rng = np.random.default_rng(4)
    r1, r2, truth = _make_pairs(codes, rng, 5, frag=400)
    b1, b2 = batchify(r1), batchify(r2)
    results = align_pairs(al, b1, b2)
    buf = io.StringIO()
    w = samio.SamWriter(buf, al.fm.ref.names, [60000])
    stats = pairs_to_sam(b1, b2, results, al, w)
    assert stats["conc_uniq"] == 5
    recs = [l.split("\t") for l in buf.getvalue().splitlines()
            if not l.startswith("@")]
    assert len(recs) == 10
    for f in recs:
        flag = int(f[1])
        assert flag & 0x1 and flag & 0x2            # paired, proper
        assert abs(int(f[8])) == 400                # TLEN = fragment size
        assert f[6] == "="
        if flag & 0x40:   # mate1 fw, leftmost
            assert int(f[8]) == 400
        else:
            assert int(f[8]) == -400


def test_orientation_policy():
    # FR: upstream mate fw, downstream rc
    ok, frag = _concordant(True, 100, 100, False, 300, 100, 0, 1000, "fr")
    assert ok and frag == 300
    ok, _ = _concordant(False, 100, 100, True, 300, 100, 0, 1000, "fr")
    assert not ok
    ok, _ = _concordant(False, 100, 100, True, 300, 100, 0, 1000, "rf")
    assert ok
    # insert bounds
    ok, _ = _concordant(True, 100, 100, False, 2000, 100, 0, 1000, "fr")
    assert not ok


def test_mixed_fallback(setup):
    codes, al = setup
    rng = np.random.default_rng(5)
    m1 = codes[5000:5100].copy()
    junk = rng.integers(0, 4, size=100).astype(np.uint8)
    b1 = batchify([Read("x", m1, np.full(100, 40), 0)])
    b2 = batchify([Read("x", junk, np.full(100, 40), 0)])
    results = align_pairs(al, b1, b2)
    assert results[0].kind == "mixed"
    assert results[0].res1.aligned
    buf = io.StringIO()
    w = samio.SamWriter(buf, al.fm.ref.names, [60000])
    stats = pairs_to_sam(b1, b2, results, al, w)
    assert stats["mates_al"] == 1
    recs = [l.split("\t") for l in buf.getvalue().splitlines()
            if not l.startswith("@")]
    flags = sorted(int(f[1]) for f in recs)
    # one aligned (mate-unmapped set), one unmapped
    assert any(f & 0x4 for f in flags) and any(not (f & 0x4) for f in flags)


def test_mate_rescue(setup):
    """One mate seeds normally; the other is too mutated to seed but is
    recoverable by windowed DP near its partner (reference alignMate)."""
    codes, al = setup
    rng = np.random.default_rng(77)
    p = 20000
    m1 = codes[p:p + 100].copy()
    # mate2 carries two 1bp deletions that fragment every seed diagonal,
    # so direct search fails; windowed DP near the anchored mate finds it
    frag = codes[p + 200:p + 300]
    m2 = np.concatenate([frag[:11], frag[12:61], frag[62:]])  # two 1bp dels
    m2 = alphabet.revcomp(m2)
    b1 = batchify([Read("r", m1, np.full(100, 40), 0)])
    b2 = batchify([Read("r", m2, np.full(m2.size, 40), 0)])
    results = align_pairs(al, b1, b2)
    pr = results[0]
    assert pr.kind == "concordant"
    assert pr.aln1.toff == p
    assert pr.aln2 is not None and not pr.aln2.fw
    ops = [op for op, n in pr.aln2.cigar]
    assert "D" in ops


def test_rescue_ungapped_matches_traceback():
    """The vectorized ungapped rescue placement (paired._rescue_ungapped)
    must reproduce dp_traceback's score/position/cigar whenever the DP
    optimum is ungapped, and decline (so the caller falls back) when the
    optimum needs a gap."""
    from hisat2_tpu.align.scoring import Scoring
    from hisat2_tpu.ops import sw as _sw
    from hisat2_tpu.align.paired import _rescue_ungapped

    sc = Scoring()
    rng = np.random.default_rng(11)
    L, W, P = 104, 400, 12
    rd = np.full((P, L), 4, np.int64)
    q = np.full((P, L), 40, np.int64)
    rls = np.zeros(P, np.int32)
    windows, lanes = {}, []
    gapped_lanes = set()
    for k in range(P):
        rdlen = int(rng.integers(60, 101))
        win = rng.integers(0, 4, W).astype(np.uint8)
        t = int(rng.integers(0, W - rdlen))
        s = win[t:t + rdlen].copy()
        mm = rng.random(rdlen) < 0.03
        s[mm] = (s[mm] + 1) % 4
        if k % 4 == 3:          # plant a deletion -> gapped optimum
            s = np.concatenate([s[:rdlen // 2], s[rdlen // 2 + 3:],
                                win[t + rdlen:t + rdlen + 3]])
            gapped_lanes.add(k)
        rd[k, :rdlen] = s[:rdlen]
        rls[k] = rdlen
        windows[k] = win
        lanes.append((k, 1, None, 0, True, rdlen))
    scores = np.zeros(P, np.int64)
    tb = {}
    for k in range(P):
        rdlen = int(rls[k])
        tb[k] = _sw.dp_traceback(sc, rd[k, :rdlen].astype(np.uint8),
                                 q[k, :rdlen], windows[k])
        scores[k] = tb[k][0]
    ung = _rescue_ungapped(sc, rd, q, rls, lanes, windows, scores,
                           list(range(P)))
    n_ung = 0
    for k in range(P):
        s0, rs0, cig0, mds0 = tb[k]
        has_gap = any(op in "ID" for op, _n in cig0)
        if k in ung:
            s1, rs1, cig1, mds1 = ung[k]
            assert not has_gap
            assert s1 == s0
            assert rs1 == rs0, (k, cig0, cig1)
            assert cig1 == cig0
            assert mds1 == mds0
            n_ung += 1
        else:
            assert has_gap, (k, cig0)
    assert n_ung >= 6
