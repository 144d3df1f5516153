"""Spliced (RNA) alignment tests: junction stitching, canonical motifs,
known splice sites, XS:A strand, novel-site sharing across batches."""

import numpy as np
import pytest

# XLA:CPU has segfaulted compiling this module's heavy spliced programs
# late in long pytest sessions (dozens of executables already loaded);
# dropping earlier compiled executables before these tests avoids it.
@pytest.fixture(scope="module", autouse=True)
def _fresh_executable_cache():
    import jax
    jax.clear_caches()
    yield


from hisat2_tpu.align.pipeline import Aligner, AlignerOpts
from hisat2_tpu.index.fm_index import build_fm_index
from hisat2_tpu.io.reads import Read, batchify
from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.utils import alphabet


def _make_genome_with_introns(rng, n=60000):
    """Random genome with canonical GT..AG intron signals planted."""
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    introns = []
    for start in range(3000, n - 3000, 5000):
        ilen = int(rng.integers(200, 2000))
        if start + ilen + 200 >= n:
            continue
        # donor GT at intron start, acceptor AG at intron end
        codes[start] = 2      # G
        codes[start + 1] = 3  # T
        codes[start + ilen - 2] = 0  # A
        codes[start + ilen - 1] = 2  # G
        introns.append((start, ilen))
    return codes, introns


@pytest.fixture(scope="module")
def rna_setup():
    rng = np.random.default_rng(99)
    codes, introns = _make_genome_with_introns(rng)
    ref = reference_from_seqs({"chrR": alphabet.decode(codes)})
    fm = build_fm_index(ref, ftab_k=6)
    al = Aligner(fm, opts=AlignerOpts(spliced=True))
    return codes, introns, al


def _junction_read(codes, start, ilen, left=50, right=50):
    """Read spanning the junction: `left` bases before the intron,
    `right` bases after."""
    a = codes[start - left:start]
    b = codes[start + ilen:start + ilen + right]
    return np.concatenate([a, b])


def test_spliced_read_aligns(rna_setup):
    codes, introns, al = rna_setup
    start, ilen = introns[0]
    seq = _junction_read(codes, start, ilen)
    res = al.align_batch(batchify([Read("j0", seq, np.full(100, 40), 0)]))[0]
    assert res.aligned
    a = res.alns[0]
    assert a.cigar == [("M", 50), ("N", ilen), ("M", 50)]
    assert a.joined_pos == start - 50
    assert a.xs_strand == "+"
    # canonical: only the intron-length penalty applies
    exp = -max(0, int(-8 + np.log(ilen)))
    assert a.score == exp
    assert a.md == "100"


def test_spliced_asymmetric_junction(rna_setup):
    codes, introns, al = rna_setup
    start, ilen = introns[1]
    seq = _junction_read(codes, start, ilen, left=30, right=70)
    res = al.align_batch(batchify([Read("j1", seq, np.full(100, 40), 0)]))[0]
    assert res.aligned
    assert res.alns[0].cigar == [("M", 30), ("N", ilen), ("M", 70)]


def test_spliced_revcomp_read(rna_setup):
    codes, introns, al = rna_setup
    start, ilen = introns[2]
    seq = alphabet.revcomp(_junction_read(codes, start, ilen))
    res = al.align_batch(batchify([Read("jr", seq, np.full(100, 40), 0)]))[0]
    assert res.aligned
    a = res.alns[0]
    assert not a.fw
    assert a.cigar == [("M", 50), ("N", ilen), ("M", 50)]
    assert a.xs_strand == "+"   # transcript strand is genomic +


def test_spliced_with_mismatch(rna_setup):
    codes, introns, al = rna_setup
    start, ilen = introns[3]
    seq = _junction_read(codes, start, ilen).copy()
    seq[20] = (seq[20] + 1) % 4
    res = al.align_batch(batchify([Read("jm", seq, np.full(100, 40), 0)]))[0]
    assert res.aligned
    a = res.alns[0]
    assert a.cigar[1][0] == "N"
    assert a.nmm == 1


def test_known_splice_site_short_anchor(rna_setup):
    """With the site registered as known, even a 4bp anchor aligns
    (anchor floor drops to 1 for known sites, tp.h semantics)."""
    codes, introns, al = rna_setup
    start, ilen = introns[4]
    al.ssdb.add_known(start - 1, start + ilen, "+")
    seq = _junction_read(codes, start, ilen, left=96, right=4)
    res = al.align_batch(batchify([Read("jk", seq, np.full(100, 40), 0)]))[0]
    assert res.aligned
    assert res.alns[0].cigar == [("M", 96), ("N", ilen), ("M", 4)]


def test_novel_site_recorded(rna_setup):
    codes, introns, al = rna_setup
    start, ilen = introns[5]
    seq = _junction_read(codes, start, ilen)
    al.align_batch(batchify([Read("jn", seq, np.full(100, 40), 0)]))
    assert (start - 1, start + ilen) in al.ssdb.novel


def test_non_spliced_mode_ignores_junctions(rna_setup):
    codes, introns, al = rna_setup
    from hisat2_tpu.align.pipeline import Aligner as A, AlignerOpts as O
    al2 = A(al.fm, opts=O(spliced=False))
    start, ilen = introns[0]
    seq = _junction_read(codes, start, ilen)
    res = al2.align_batch(batchify([Read("nj", seq, np.full(100, 40), 0)]))[0]
    for a in res.alns:
        assert all(op != "N" for op, _ in a.cigar)


def test_tmo_reports_only_known_transcripts(rna_setup):
    """--tmo (reference hi_aligner.h:6126): only alignments spliced
    through KNOWN sites are reported; novel-junction and contiguous
    alignments come back unaligned."""
    import io
    from hisat2_tpu.align.pipeline import (Aligner as A, AlignerOpts as O,
                                           results_to_sam)
    from hisat2_tpu.io import sam as samio

    codes, introns, al = rna_setup
    al2 = A(al.fm, opts=O(spliced=True, tmo=True))
    s_known, il_known = introns[2]
    al2.ssdb.add_known(s_known - 1, s_known + il_known, "+")
    s_nov, il_nov = introns[3]
    reads = [
        Read("known", _junction_read(codes, s_known, il_known),
             np.full(100, 40), 0),
        Read("novel", _junction_read(codes, s_nov, il_nov),
             np.full(100, 40), 1),
        Read("contig", codes[9000:9100].copy(), np.full(100, 40), 2),
    ]
    batch = batchify(reads)
    results = al2.align_batch(batch)
    out = io.StringIO()
    w = samio.SamWriter(out, al.fm.ref.names,
                        [int(x) for x in al.fm.ref.tlens], no_head=True)
    st = results_to_sam(batch, results, al2, w)
    recs = {ln.split("\t")[0]: ln.split("\t") for ln in
            out.getvalue().splitlines()}
    assert not int(recs["known"][1]) & 4
    assert "N" in recs["known"][5]
    assert int(recs["novel"][1]) & 4
    assert int(recs["contig"][1]) & 4
    assert st["unal"] == 2


def test_novel_junction_short_far_anchor(rna_setup):
    """Novel junction whose FAR anchor (9bp) is shorter than the seed
    table's k-mer: undiscoverable from seeded diagonal pairs alone; the
    anchor-scan stage (ops/splice.anchor_scan, reference localGFMSearch
    role) must synthesize the far diagonal. No known sites involved."""
    codes, introns, al = rna_setup
    al.ssdb.clear() if hasattr(al.ssdb, "clear") else None
    # downstream-short case: 91bp on exon A, 9bp on exon B
    start, ilen = introns[1]
    seq = _junction_read(codes, start, ilen, left=91, right=9)
    res = al.align_batch(batchify([Read("sj1", seq, np.full(100, 40),
                                        0)]))[0]
    assert res.aligned
    a = res.alns[0]
    assert a.cigar == [("M", 91), ("N", ilen), ("M", 9)]
    assert a.joined_pos == start - 91
    # upstream-short case: 9bp on exon A, 91bp on exon B
    start2, ilen2 = introns[2]
    seq2 = _junction_read(codes, start2, ilen2, left=9, right=91)
    res2 = al.align_batch(batchify([Read("sj2", seq2, np.full(100, 40),
                                         1)]))[0]
    assert res2.aligned
    a2 = res2.alns[0]
    assert a2.cigar == [("M", 9), ("N", ilen2), ("M", 91)]
    assert a2.joined_pos == start2 - 9
