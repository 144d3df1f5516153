"""Shape and content edge cases: tiny batches, single reads, odd lengths,
empty/short reads, reads at fragment boundaries, N-heavy genomes."""

import io

import numpy as np
import pytest

from hisat2_tpu.align.pipeline import Aligner, results_to_sam
from hisat2_tpu.align.emit import align_and_emit
from hisat2_tpu.index.fm_index import build_fm_index
from hisat2_tpu.io import sam as samio
from hisat2_tpu.io.reads import Read, batchify
from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.utils import alphabet


@pytest.fixture(scope="module")
def al():
    rng = np.random.default_rng(400)
    codes = rng.integers(0, 4, 30000).astype(np.uint8)
    s = alphabet.decode(codes)
    # multi-chromosome with an N gap (two fragments in chr2)
    seqs = {"c1": s[:10000],
            "c2": s[10000:18000] + "N" * 50 + s[18000:24000],
            "c3": s[24000:]}
    ref = reference_from_seqs(seqs)
    return Aligner(build_fm_index(ref, ftab_k=6)), codes


def test_single_read_batch(al):
    a, codes = al
    r = Read("one", codes[500:600], np.full(100, 40), 0)
    res = a.align_batch(batchify([r]))
    assert res[0].aligned and res[0].alns[0].toff == 500


@pytest.mark.parametrize("B", [1, 2, 3, 7])
def test_odd_batch_sizes(al, B):
    a, codes = al
    reads = [Read(f"b{i}", codes[1000 + 97 * i:1100 + 97 * i],
                  np.full(100, 40), i) for i in range(B)]
    res = a.align_batch(batchify(reads))
    assert all(r.aligned for r in res)


def test_variable_lengths(al):
    a, codes = al
    reads = [Read("a", codes[2000:2036], np.full(36, 40), 0),     # 36bp
             Read("b", codes[3000:3150], np.full(150, 40), 1),    # 150bp
             Read("c", codes[4000:4100], np.full(100, 40), 2)]
    res = a.align_batch(batchify(reads))
    assert res[0].aligned and res[0].alns[0].joined_pos == 2000
    assert res[1].aligned and res[1].alns[0].joined_pos == 3000
    assert res[2].aligned


def test_tiny_and_empty_reads(al):
    a, codes = al
    reads = [Read("tiny", codes[100:110], np.full(10, 40), 0),
             Read("empty", np.zeros(0, np.uint8), np.zeros(0, np.int8), 1),
             Read("ok", codes[5000:5100], np.full(100, 40), 2)]
    res = a.align_batch(batchify(reads))
    # tiny (below min anchor) and empty reads don't crash; ok read aligns
    assert res[2].aligned
    assert res[1].filtered is not None or not res[1].aligned


def test_cross_chromosome_and_fragment_rejection(al):
    a, codes = al
    # read spanning the c1/c2 chromosome boundary must not align as one
    span = codes[9950:10050]
    res = a.align_batch(batchify([Read("x", span, np.full(100, 40), 0)]))
    if res[0].aligned:
        aln = res[0].alns[0]
        # any reported alignment must sit inside one chromosome
        assert aln.ref_span <= 10000


def test_all_n_read(al):
    a, codes = al
    res = a.align_batch(batchify(
        [Read("n", np.full(100, 4, np.uint8), np.full(100, 40), 0)]))
    assert not res[0].aligned


def test_emit_odd_batch(al):
    a, codes = al
    reads = [Read(f"e{i}", codes[6000 + 11 * i:6100 + 11 * i],
                  np.full(100, 40), i) for i in range(3)]
    batch = batchify(reads)
    buf = io.StringIO()
    w = samio.SamWriter(buf, a.fm.ref.names,
                        [int(x) for x in a.fm.ref.tlens], no_head=True)
    stats = align_and_emit(a, batch, w)
    assert stats["reads"] == 3
    assert len([l for l in buf.getvalue().splitlines()]) >= 3
