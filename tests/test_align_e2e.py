"""End-to-end DNA alignment pipeline tests against simulated reads with a
known ground truth — the same strategy as the reference's scripts/sim
harness (SURVEY.md §4.4): sample reads from a random genome, mutate them,
align, and independently check coordinates/CIGAR/score."""

import io

import numpy as np
import pytest

from hisat2_tpu.align.pipeline import Aligner, AlignerOpts, results_to_sam
from hisat2_tpu.align.scoring import Scoring, SimpleFunc
from hisat2_tpu.index.fm_index import build_fm_index
from hisat2_tpu.io import sam as samio
from hisat2_tpu.io.reads import Read, batchify
from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.utils import alphabet


@pytest.fixture(scope="module")
def genome_and_index():
    r = np.random.default_rng(11)
    codes = r.integers(0, 4, size=50000).astype(np.uint8)
    ref = reference_from_seqs({"chrS": alphabet.decode(codes)})
    fm = build_fm_index(ref, ftab_k=6)
    return codes, fm


def _sample_reads(codes, rng, n, rdlen=100, n_mm=0, revcomp_frac=0.5):
    reads, truth = [], []
    for i in range(n):
        p = int(rng.integers(0, codes.size - rdlen))
        seq = codes[p:p + rdlen].copy()
        for _ in range(n_mm):
            j = int(rng.integers(0, rdlen))
            seq[j] = (seq[j] + 1 + rng.integers(0, 3)) % 4
        fw = rng.random() > revcomp_frac
        out = seq if fw else alphabet.revcomp(seq)
        reads.append(Read(f"r{i}", out, np.full(rdlen, 40), i))
        truth.append((p, fw))
    return reads, truth


def test_exact_reads_align(genome_and_index):
    codes, fm = genome_and_index
    rng = np.random.default_rng(5)
    reads, truth = _sample_reads(codes, rng, 40)
    batch = batchify(reads)
    al = Aligner(fm)
    results = al.align_batch(batch)
    for res, (p, fw) in zip(results, truth):
        assert res.aligned
        assert res.alns[0].joined_pos == p
        assert res.alns[0].fw == fw
        assert res.alns[0].score == 0
        assert res.alns[0].cigar == [("M", 100)]


def test_mismatch_reads(genome_and_index):
    codes, fm = genome_and_index
    rng = np.random.default_rng(6)
    reads, truth = _sample_reads(codes, rng, 30, n_mm=3)
    batch = batchify(reads)
    results = Aligner(fm).align_batch(batch)
    n_ok = 0
    for res, (p, fw) in zip(results, truth):
        if res.aligned and res.alns[0].joined_pos == p:
            n_ok += 1
            assert res.alns[0].nmm <= 3
            assert res.alns[0].score >= -18
    assert n_ok >= 28  # a 3-mm read can occasionally lack a >=3bp seed


def test_gapped_reads(genome_and_index):
    codes, fm = genome_and_index
    rng = np.random.default_rng(7)
    reads, truth = [], []
    for i in range(12):
        p = int(rng.integers(0, codes.size - 130))
        gap = int(rng.integers(1, 6))
        if i % 2 == 0:  # deletion from read: skip `gap` ref bases
            seq = np.concatenate([codes[p:p + 50], codes[p + 50 + gap:p + 100 + gap]])
        else:           # insertion: novel bases in the middle
            ins = rng.integers(0, 4, size=gap).astype(np.uint8)
            seq = np.concatenate([codes[p:p + 50], ins, codes[p + 50:p + 100 - gap]])
        reads.append(Read(f"g{i}", seq, np.full(seq.size, 40), i))
        truth.append((p, gap, i % 2 == 0))
    batch = batchify(reads)
    results = Aligner(fm).align_batch(batch)
    for res, (p, gap, is_del) in zip(results, truth):
        assert res.aligned, f"gapped read at {p} unaligned"
        aln = res.alns[0]
        assert aln.joined_pos == p
        ops = [op for op, n in aln.cigar]
        assert ("D" in ops) == is_del
        assert ("I" in ops) == (not is_del)
        # gap cost: open(8) + (gap-1)*ext(3)
        assert aln.score == -(8 + (gap - 1) * 3)


def test_unalignable_read(genome_and_index):
    codes, fm = genome_and_index
    rng = np.random.default_rng(8)
    junk = rng.integers(0, 4, size=100).astype(np.uint8)
    # shuffle-within-windows so no 20bp stretch matches the genome
    reads = [Read("junk", junk, np.full(100, 40), 0)]
    results = Aligner(fm).align_batch(batchify(reads))
    if results[0].aligned:  # random 100-mer should not match 50kb genome
        assert results[0].alns[0].score < 0


def test_n_read_filter(genome_and_index):
    codes, fm = genome_and_index
    seq = codes[1000:1100].copy()
    seq[::3] = 4  # 34 Ns > n_ceil(100) = 15
    results = Aligner(fm).align_batch(
        batchify([Read("n", seq, np.full(100, 40), 0)]))
    assert not results[0].aligned
    assert results[0].filtered == "NS"


def test_sam_output(genome_and_index):
    codes, fm = genome_and_index
    rng = np.random.default_rng(9)
    reads, truth = _sample_reads(codes, rng, 10)
    batch = batchify(reads)
    al = Aligner(fm)
    results = al.align_batch(batch)
    buf = io.StringIO()
    w = samio.SamWriter(buf, fm.ref.names, [int(x) for x in fm.ref.tlens])
    results_to_sam(batch, results, al, w)
    lines = buf.getvalue().splitlines()
    hdr = [l for l in lines if l.startswith("@")]
    recs = [l.split("\t") for l in lines if not l.startswith("@")]
    assert any(l.startswith("@SQ\tSN:chrS") for l in hdr)
    assert len(recs) >= 10
    for f in recs:
        assert f[2] == "chrS"
        p, fw = truth[int(f[0][1:])]
        if not (int(f[1]) & samio.FLAG_SECONDARY):
            assert int(f[3]) == p + 1
            assert f[5] == "100M"
            assert int(f[4]) == 60  # unique in random genome
            assert "MD:Z:100" in "\t".join(f)


def test_mapq_values():
    from hisat2_tpu.align.mapq import mapq_v2
    # unique, no second-best -> 60
    assert mapq_v2(0, None, 0, -20) == 60
    # equal second-best, perfect -> 1
    assert mapq_v2(0, 0, 0, -20) == 1
    # equal second-best, low score -> 0
    assert mapq_v2(-15, -15, 0, -20) == 0
    # better than second-best -> 60 (not exhausted, not capped)
    assert mapq_v2(0, -12, 0, -20) == 60


def test_simple_func():
    f = SimpleFunc.parse("L,0,-0.2")
    assert f(100) == -20
    assert Scoring().min_score(100) == -20
    assert Scoring().max_ns(100) == 15
