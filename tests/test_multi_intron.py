"""Reads spanning TWO introns (short middle exon) must chain both
junctions — the reference recurses (spliced_aligner.h:331
hybridSearch_recur); here the junction kernel runs a second pass over
the residual segment (pipeline._splice_second_pass)."""

import numpy as np

from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.index.fm_index import build_fm_index
from hisat2_tpu.utils import alphabet
from hisat2_tpu.align.pipeline import Aligner, AlignerOpts
from hisat2_tpu.io.reads import Read, batchify


def _genome_with_gene(rng, n=40000, exon=45, intron=300):
    g = rng.integers(0, 4, n).astype(np.uint8)
    # canonical GT..AG introns after exon1 and exon2
    e1 = 10000
    i1 = e1 + exon
    e2 = i1 + intron
    i2 = e2 + exon
    e3 = i2 + intron
    g[i1:i1 + 2] = [2, 3]          # GT
    g[e2 - 2:e2] = [0, 2]          # AG
    g[i2:i2 + 2] = [2, 3]
    g[e3 - 2:e3] = [0, 2]
    return g, (e1, i1, e2, i2, e3, exon)


def test_two_junction_read():
    rng = np.random.default_rng(5)
    g, (e1, i1, e2, i2, e3, exon) = _genome_with_gene(rng)
    ref = reference_from_seqs({"chrG": alphabet.decode(g)})
    fm = build_fm_index(ref, ftab_k=6)
    # transcript = exon1 + exon2 + exon3
    tx = np.concatenate([g[e1:i1], g[e2:i2], g[e3:e3 + exon]])
    reads = []
    # reads spanning all three exons (each segment >= ~20bp)
    for k, off in enumerate((5, 10, 15, 20)):
        s = tx[off:off + 100]
        reads.append(Read(f"t{k}", s.copy(), np.full(100, 40, np.int8), k))
    batch = batchify(reads, pad_to=104)
    al = Aligner(fm, opts=AlignerOpts(spliced=True))
    results = al.align_batch(batch)
    ok = 0
    for k, res in enumerate(results):
        assert res.aligned, f"read t{k} unaligned"
        a = res.alns[0]
        n_introns = sum(1 for op, n in a.cigar if op == "N")
        if n_introns == 2:
            ok += 1
            spans = [n for op, n in a.cigar if op == "N"]
            assert spans == [e2 - i1, e3 - i2], (a.cigar, spans)
            # placement: read k starts at e1 + off
            assert a.toff == e1 + (5 + 5 * k), (k, a.toff, a.cigar)
    assert ok >= 3, f"only {ok}/4 reads chained two junctions"
