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


def test_consensus_snp_copies():
    """SNP'd copies assemble into ONE consensus repeat covering every
    copy (reference SeedExt, repeat_builder.cpp:3947): an exact 100bp
    core extends over per-copy mismatches into the full 300bp unit."""
    rng = np.random.default_rng(9)
    codes = rng.integers(0, 4, size=40000).astype(np.uint8)
    unit = rng.integers(0, 4, size=300).astype(np.uint8)
    spots = list(range(2000, 2000 + 8 * 2000, 2000))
    for i, p in enumerate(spots):
        cp = unit.copy()
        # one SNP per copy OUTSIDE the shared exact core [100, 200)
        mpos = 20 + 25 * i if i < 4 else 210 + 20 * (i - 4)
        cp[mpos] = (cp[mpos] + 1) % 4
        codes[p:p + 300] = cp
    ref = reference_from_seqs({"chrC": alphabet.decode(codes)})
    db = build_repeats(ref, repeat_length=100, repeat_count=5)
    big = max(db.repeats, key=lambda r: len(r.seq))
    assert len(big.seq) >= 280, len(big.seq)    # consensus spans the unit
    assert len(big.positions) >= 8
    # consensus equals the original unit over the aligned span
    starts = sorted(j for j, fw in big.positions if fw)
    off = starts[0] - spots[0]
    want = codes[starts[0]:starts[0] + len(big.seq)]
    mism = int((big.seq != want).sum())
    assert mism <= 2, mism                      # per-copy SNPs vote out


def test_save_load_sa(tmp_path):
    """--save-sa / --load-sa round-trip (reference bit_packed_array
    role): a reloaded SA reproduces the identical repeat database."""
    from hisat2_tpu.cli.repeat import main as repeat_main
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 4, size=30000).astype(np.uint8)
    unit = rng.integers(0, 4, size=200).astype(np.uint8)
    for p in range(1000, 1000 + 6 * 3000, 3000):
        codes[p:p + 200] = unit
    fa = tmp_path / "g.fa"
    with open(fa, "w") as fh:
        fh.write(">c\n" + alphabet.decode(codes) + "\n")
    sa_file = str(tmp_path / "sa.npz")
    assert repeat_main([str(fa), str(tmp_path / "a"), "--no-index",
                        "--quiet", "--save-sa", sa_file]) == 0
    assert repeat_main([str(fa), str(tmp_path / "b"), "--no-index",
                        "--quiet", "--load-sa", sa_file]) == 0
    assert (tmp_path / "a.rep.fa").read_text() \
        == (tmp_path / "b.rep.fa").read_text()
    assert (tmp_path / "a.rep.info").read_text() \
        == (tmp_path / "b.rep.info").read_text()
