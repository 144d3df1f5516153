import numpy as np
import jax.numpy as jnp

from hisat2_tpu.ops import rank as rnk
from hisat2_tpu.ops import search as srch
from hisat2_tpu.ops import locate as loc
from hisat2_tpu.utils import alphabet as ab


def py_occurrences(text, pat):
    """All start offsets of pat (codes) in text (codes)."""
    t = ab.decode(text)
    p = ab.decode(np.asarray(pat, np.uint8))
    out, i = [], t.find(p)
    while i != -1:
        out.append(i)
        i = t.find(p, i + 1)
    return sorted(out)


def test_rank_matches_naive(small_index):
    fm = small_index
    idx = fm.device
    text = fm.ref.joined
    sa = fm.sa.astype(np.int64)
    prev = np.where(sa == 0, 0, sa - 1)
    bwt = text[prev].astype(np.uint8)
    bwt[fm.zoff] = 0
    rng = np.random.default_rng(1)
    iq = rng.integers(0, fm.m + 1, size=256).astype(np.int32)
    for c in range(4):
        got = np.asarray(rnk.rank(idx, jnp.full(iq.shape, c, jnp.int32),
                                  jnp.asarray(iq)))
        want = np.array([np.count_nonzero(bwt[:i] == c) for i in iq])
        # correct for $ stored as 0
        if c == 0:
            want = want - (iq > fm.zoff)
        np.testing.assert_array_equal(got, want)


def test_exact_interval_counts(small_index):
    fm = small_index
    idx = fm.device
    text = fm.ref.joined
    rng = np.random.default_rng(2)
    B, L = 32, 24
    seqs = np.full((B, L), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    pats = []
    for b in range(B):
        ln = int(rng.integers(4, L + 1))
        if b % 3 == 0:  # genuine substring
            s = int(rng.integers(0, fm.n - ln))
            pat = text[s:s + ln].copy()
        else:  # random (may or may not occur)
            pat = rng.integers(0, 4, size=ln).astype(np.uint8)
        seqs[b, :ln] = pat
        lens[b] = ln
        pats.append(pat)
    top, bot = srch.exact_interval(idx, jnp.asarray(seqs), jnp.asarray(lens))
    top, bot = np.asarray(top), np.asarray(bot)
    for b in range(B):
        occ = py_occurrences(text, pats[b])
        assert max(0, bot[b] - top[b]) == len(occ), f"read {b}"
        if occ:
            offs = sorted(int(fm.sa[r]) for r in range(top[b], bot[b]))
            assert offs == occ


def test_exact_interval_with_n():
    from hisat2_tpu.io.reference import reference_from_seqs
    from hisat2_tpu.index.fm_index import build_fm_index
    ref = reference_from_seqs({"c": "ACGTACGTACGT"})
    fm = build_fm_index(ref, ftab_k=2)
    seqs = jnp.asarray(ab.encode("ACNT")[None, :].astype(np.uint8))
    top, bot = srch.exact_interval(fm.device, seqs, jnp.asarray([4], jnp.int32))
    assert int(bot[0]) <= int(top[0])


def test_partial_search_segments(small_index):
    fm = small_index
    idx = fm.device
    text = fm.ref.joined
    rng = np.random.default_rng(3)
    B, L = 16, 50
    seqs = np.zeros((B, L), np.uint8)
    lens = np.full(B, L, np.int32)
    starts = []
    for b in range(B):
        s = int(rng.integers(0, fm.n - L))
        read = text[s:s + L].copy()
        # plant one mismatch in the middle
        p = int(rng.integers(10, 40))
        read[p] = (read[p] + 1 + rng.integers(0, 3)) % 4
        seqs[b] = read
        starts.append((s, p))
    hits = srch.partial_search(idx, jnp.asarray(seqs), jnp.asarray(lens))
    n = np.asarray(hits["n"])
    off = np.asarray(hits["off"])
    hlen = np.asarray(hits["len"])
    top = np.asarray(hits["top"])
    bot = np.asarray(hits["bot"])
    for b in range(B):
        s, p = starts[b]
        # segments must partition the read
        segs = sorted((int(off[b, i]), int(hlen[b, i])) for i in range(n[b]))
        covered = []
        for o, l in segs:
            covered.extend(range(o, o + l))
        assert covered == list(range(L)), f"read {b}: {segs}"
        for i in range(n[b]):
            o, l = int(off[b, i]), int(hlen[b, i])
            seg = seqs[b, o:o + l]
            occ = py_occurrences(text, seg)
            assert int(bot[b, i] - top[b, i]) == len(occ)
            # the segment truly occurs at the planted locus when it avoids
            # the mismatch
            if p not in range(o, o + l):
                assert (s + o) in occ


def test_locate_and_walk_left(small_index):
    fm = small_index
    idx = fm.device
    rows = jnp.asarray(np.arange(1, 40, dtype=np.int32))
    offs = np.asarray(loc.locate_rows(idx, rows))
    np.testing.assert_array_equal(offs, fm.sa[1:40])
    # LF-walk left k steps lands on the row whose SA value is sa+k
    k = 5
    rows0 = np.asarray([r for r in range(1, 200) if fm.sa[r] >= k],
                       dtype=np.int32)[:32]
    walked = np.asarray(loc.lf_walk_left(idx, jnp.asarray(rows0), k))
    np.testing.assert_array_equal(fm.sa[walked], fm.sa[rows0] - k)


def test_stride_sampled_table_sensitivity():
    """Stride-sampled seed tables (Gbp memory diet, fm_index.st_stride):
    exact reads still align at full rate — seed-offset residue jitter
    keeps every diagonal reachable (ops/search.table_seed)."""
    import numpy as np
    from hisat2_tpu.io.reference import reference_from_seqs
    from hisat2_tpu.index.sharded import build_table_index
    from hisat2_tpu.align.pipeline import Aligner
    from hisat2_tpu.io.reads import Read, batchify
    from hisat2_tpu.utils import alphabet

    rng = np.random.default_rng(6)
    g = rng.integers(0, 4, 300000).astype(np.uint8)
    ref = reference_from_seqs({"cS": alphabet.decode(g)})
    reads = []
    for i in range(128):
        st = int(rng.integers(0, g.size - 100))
        s = g[st:st + 100].copy()
        if i % 3 == 0:
            mm = rng.random(100) < 0.01
            s[mm] = (s[mm] + 1) % 4
        if i % 2:
            s = alphabet.revcomp(s)
        reads.append(Read(f"s{i}_{st}", s, np.full(100, 40, np.int8), i))
    b = batchify(reads, pad_to=104)
    for stride in (2, 3, 4):
        fm = build_table_index(ref, table_stride=stride)
        assert fm.st_stride == stride
        al = Aligner(fm)
        res = al.align_batch(b)
        ok = sum(1 for i, r in enumerate(res)
                 if r.aligned and r.alns[0].toff
                 == int(reads[i].name.split("_")[1]))
        assert ok >= 126, (stride, ok)
