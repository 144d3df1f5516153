"""Repeat subsystem tests: discovery, persistence, expansion (the
reference's hisat2-repeat + ht2_repeat_expand contracts)."""

import numpy as np
import pytest

from hisat2_tpu.index.repeats import build_repeats, RepeatDB, lcp_array
from hisat2_tpu.index.suffix_array import build_suffix_array
from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.utils import alphabet


@pytest.fixture(scope="module")
def rep_setup():
    rng = np.random.default_rng(123)
    codes = rng.integers(0, 4, size=20000).astype(np.uint8)
    unit = rng.integers(0, 4, size=150).astype(np.uint8)
    # plant 6 forward copies + 2 reverse-complement copies
    spots = [1000, 3000, 5000, 8000, 11000, 14000]
    for p in spots:
        codes[p:p + 150] = unit
    rcspots = [16500, 18200]
    for p in rcspots:
        codes[p:p + 150] = alphabet.revcomp(unit)
    ref = reference_from_seqs({"chrX": alphabet.decode(codes)})
    return codes, unit, spots, rcspots, ref


def test_lcp_array():
    text = alphabet.encode("ABRACADABRA".replace("B", "C")
                           .replace("R", "G").replace("D", "T"))
    sa = build_suffix_array(text)
    lcp = lcp_array(text.astype(np.int64), sa)
    # adjacent suffixes sharing prefixes exist; validity: recompute naive
    n = text.size
    for i in range(1, sa.size):
        a, b = int(sa[i - 1]), int(sa[i])
        k = 0
        while a + k < n and b + k < n and text[a + k] == text[b + k]:
            k += 1
        assert lcp[i] == k


def test_repeat_discovery(rep_setup):
    codes, unit, spots, rcspots, ref = rep_setup
    db = build_repeats(ref, repeat_length=100, repeat_count=5)
    # coverage dedup collapses shifted sub-repeats into a handful of groups
    assert 1 <= len(db.repeats) <= 6
    big = max(db.repeats, key=lambda r: len(r.positions))
    assert len(big.positions) >= len(spots)
    all_pos = sorted(j for j, fw in big.positions)
    # every planted copy (either strand representation) is found
    for p in spots + rcspots:
        assert any(p <= q < p + 150 for q in all_pos), (p, all_pos)


def test_repeat_expand(rep_setup):
    codes, unit, spots, rcspots, ref = rep_setup
    db = build_repeats(ref, repeat_length=100, repeat_count=5)
    big = max(db.repeats, key=lambda r: len(r.positions))
    locs = db.expand(big.name, 10, 50)
    assert len(locs) >= 5
    for chr_id, direction, pos in locs:
        assert chr_id == 0
        # the expanded 50bp window must match the repeat subsequence
        sub = big.seq[10:60]
        g = ref.joined[pos:pos + 50]
        if direction == 0:
            assert np.array_equal(g, sub)
        else:
            assert np.array_equal(g, alphabet.revcomp(sub))


def test_repeat_save_load(rep_setup, tmp_path):
    codes, unit, spots, rcspots, ref = rep_setup
    db = build_repeats(ref, repeat_length=100, repeat_count=5)
    base = str(tmp_path / "rp")
    db.save(base)
    db2 = RepeatDB.load(base, ref)
    assert len(db2.repeats) == len(db.repeats)
    assert db2.expand(db.repeats[0].name, 0, 50) == \
        db.expand(db.repeats[0].name, 0, 50)


def test_repeat_aligner(rep_setup):
    """RepeatAligner places a repetitive read once on the repeat index and
    expands to every genomic copy (reference RFM + ht2_repeat_expand)."""
    from hisat2_tpu.align.pipeline import RepeatAligner
    from hisat2_tpu.index.fm_index import build_fm_index
    from hisat2_tpu.io.reads import Read, batchify

    codes, unit, spots, rcspots, ref = rep_setup
    db = build_repeats(ref, repeat_length=100, repeat_count=5)
    rep_ref = reference_from_seqs(
        {r.name: alphabet.decode(r.seq) for r in db.repeats})
    ra = RepeatAligner(build_fm_index(rep_ref, ftab_k=6), db)
    # a read from inside the planted repeat unit
    seq = codes[spots[0] + 20: spots[0] + 120]
    out = ra.align_repeats(batchify([Read("rp", seq, np.full(100, 40), 0)]))
    assert out[0] is not None
    name, off, fw, score, placements = out[0]
    assert len(placements) >= len(spots)
    # every placement's window matches the read (fw) or its rc
    for chr_id, direction, pos in placements:
        g = ref.joined[pos:pos + 100]
        if direction == 0 and fw:
            assert np.array_equal(g, seq)


def test_kmer_classifier(rep_setup):
    from hisat2_tpu.index.repeats import build_kmer_table, classify_repetitive
    codes, unit, spots, rcspots, ref = rep_setup
    db = build_repeats(ref, repeat_length=100, repeat_count=5)
    tab = build_kmer_table(db)
    assert tab.size > 0
    rng = np.random.default_rng(0)
    B, L = 64, 80
    seqs = np.zeros((B, L), np.uint8)
    want = np.zeros(B, bool)
    for i in range(B):
        if i % 2 == 0:          # read inside a planted repeat copy
            p = spots[i % len(spots)] + 10
            seqs[i] = codes[p:p + L]
            want[i] = True
        else:                   # unique-region read
            while True:
                p = int(rng.integers(0, codes.size - L))
                if not any(s - L < p < s + 150 for s in spots + rcspots):
                    break
            seqs[i] = codes[p:p + L]
        if i % 4 >= 2:          # half the reads reverse-complemented
            seqs[i] = alphabet.revcomp(seqs[i].copy())
    lens = np.full(B, L, np.int64)
    got = classify_repetitive(seqs, lens, tab)
    # every repeat read classified; unique reads not
    assert (got[want]).all(), "repeat reads missed by classifier"
    assert not got[~want].any(), "unique reads misclassified"
