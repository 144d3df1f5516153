import numpy as np
import pytest

from hisat2_tpu.index.suffix_array import build_suffix_array, bwt_from_sa
from hisat2_tpu.index.fm_index import build_fm_index, FMIndex, OCC_BLOCK
from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.utils import alphabet as ab


def naive_sa(text):
    n = len(text)
    suffixes = sorted(range(n + 1), key=lambda i: tuple(text[i:]) if i < n else ())
    # sentinel suffix (empty) sorts first since tuples compare prefix-wise and
    # sentinel < everything; emulate by sorting with sentinel -1 appended
    t2 = list(text) + [-1]
    return sorted(range(n + 1), key=lambda i: t2[i:])


@pytest.mark.parametrize("n", [0, 1, 2, 10, 137, 1000])
def test_suffix_array_matches_naive(rng, n):
    text = rng.integers(0, 4, size=n).astype(np.uint8)
    sa = build_suffix_array(text)
    assert sa[0] == n
    np.testing.assert_array_equal(sa, naive_sa(list(text)))


def test_suffix_array_repetitive():
    text = ab.encode("ACAC" * 50 + "G" + "ACAC" * 50)
    sa = build_suffix_array(text)
    np.testing.assert_array_equal(sa, naive_sa(list(text)))


def test_bwt_and_zoff():
    text = ab.encode("ACGTACGT")
    sa = build_suffix_array(text)
    bwt, zoff = bwt_from_sa(text, sa)
    assert sa[zoff] == 0
    # reconstruct counts: bwt is a permutation of text (with $ cell zeroed)
    cnt_text = np.bincount(text, minlength=4)
    cnt_bwt = np.bincount(bwt, minlength=4)
    cnt_bwt[0] -= 1  # the $ cell stored as 0
    np.testing.assert_array_equal(cnt_text, cnt_bwt)


def test_occ_checkpoints(small_index):
    fm = small_index
    sa = fm.sa.astype(np.int64)
    text = fm.ref.joined
    prev = np.where(sa == 0, 0, sa - 1)
    bwt = text[prev].astype(np.uint8)
    bwt[fm.zoff] = 0
    for b in range(fm.occ.shape[0]):
        upto = min(b * OCC_BLOCK, bwt.size)
        np.testing.assert_array_equal(
            fm.occ[b], np.bincount(bwt[:upto], minlength=4).astype(np.int32))


def test_ccount(small_index):
    fm = small_index
    counts = np.bincount(fm.ref.joined, minlength=4)
    expect = np.concatenate([[1], 1 + np.cumsum(counts)])
    np.testing.assert_array_equal(fm.ccount, expect.astype(np.int32))


def test_ftab_intervals(small_index):
    fm = small_index
    k = fm.ftab_k
    text = fm.ref.joined.astype(np.int64)
    n = text.size
    # every row's interval must contain exactly the suffixes starting with p
    sa = fm.sa.astype(np.int64)
    rng = np.random.default_rng(0)
    for _ in range(20):
        p = rng.integers(0, 4 ** k)
        digits = [(p >> (2 * (k - 1 - j))) & 3 for j in range(k)]
        top, bot = fm.ftab[p]
        for r in range(int(top), int(bot)):
            s = sa[r]
            assert s + k <= n
            assert list(text[s:s + k]) == digits
        # count occurrences naively
        occ = sum(1 for i in range(n - k + 1)
                  if list(text[i:i + k]) == digits)
        assert bot - top == occ


def test_save_load_roundtrip(tmp_path, small_index):
    fm = small_index
    prefix = str(tmp_path / "idx")
    fm.save(prefix)
    fm2 = FMIndex.load(prefix)
    assert fm2.n == fm.n and fm2.zoff == fm.zoff and fm2.ftab_k == fm.ftab_k
    np.testing.assert_array_equal(fm2.bwt_packed, fm.bwt_packed)
    np.testing.assert_array_equal(fm2.sa, fm.sa)
    np.testing.assert_array_equal(fm2.ftab, fm.ftab)
    assert fm2.ref.names == fm.ref.names


class TestSampledSA:
    """--offrate sampled SA: walk-left locate matches the full SA and the
    whole pipeline still aligns (reference offrate/_offs semantics)."""

    def test_locate_matches_full(self):
        import jax.numpy as jnp
        import numpy as np
        from hisat2_tpu.index.fm_index import build_fm_index
        from hisat2_tpu.io.reference import reference_from_seqs
        from hisat2_tpu.ops import locate as L
        from hisat2_tpu.utils import alphabet
        rng = np.random.default_rng(17)
        codes = rng.integers(0, 4, 5000).astype(np.uint8)
        ref = reference_from_seqs({"c": alphabet.decode(codes)})
        full = build_fm_index(ref, ftab_k=5)
        samp = build_fm_index(ref, ftab_k=5, offrate=4)
        assert samp.samp_vals.size < full.sa.size // 8
        rows = jnp.asarray(rng.integers(0, full.m, 300).astype(np.int32))
        a = np.asarray(L.locate_rows(full.device, rows))
        b = np.asarray(L.locate_rows(samp.device, rows))
        assert np.array_equal(a, b)

    def test_pipeline_with_offrate(self, tmp_path):
        import numpy as np
        from hisat2_tpu.align.pipeline import Aligner
        from hisat2_tpu.index.fm_index import build_fm_index, FMIndex
        from hisat2_tpu.io.reads import Read, batchify
        from hisat2_tpu.io.reference import reference_from_seqs
        from hisat2_tpu.utils import alphabet
        rng = np.random.default_rng(18)
        codes = rng.integers(0, 4, 30000).astype(np.uint8)
        ref = reference_from_seqs({"c": alphabet.decode(codes)})
        fm = build_fm_index(ref, ftab_k=6, offrate=4)
        fm.save(str(tmp_path / "soff"))
        fm2 = FMIndex.load(str(tmp_path / "soff"))
        assert fm2.offrate == 4 and fm2.sa.size == 0
        al = Aligner(fm2)
        reads = []
        truth = []
        for i in range(30):
            p = int(rng.integers(0, 29000))
            s = codes[p:p + 100].copy()
            s[int(rng.integers(0, 100))] ^= 1
            reads.append(Read(f"s{i}", s, np.full(100, 40), i))
            truth.append(p)
        batch = batchify(reads)
        results = al.align_batch(batch)
        # sampled-SA results must equal the full-SA results exactly
        full = Aligner(build_fm_index(ref, ftab_k=6))
        results_full = full.align_batch(batch)
        for r4, r0 in zip(results, results_full):
            assert r4.aligned == r0.aligned
            if r4.aligned:
                assert r4.alns[0].joined_pos == r0.alns[0].joined_pos
                assert r4.alns[0].cigar == r0.alns[0].cigar
        ok = sum(1 for r, p in zip(results, truth)
                 if r.aligned and r.alns[0].joined_pos == p)
        assert ok >= 27
