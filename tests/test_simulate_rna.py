"""GTF-driven RNA simulation (tools/simulate_reads --gtf): truth CIGARs
must project reads back onto the genome exactly, and the spliced aligner
scored against that truth must place almost everything correctly."""

import numpy as np
import pytest

from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.index.fm_index import build_fm_index
from hisat2_tpu.tools.simulate_reads import simulate_rna, _cigar_str
from hisat2_tpu.align.pipeline import Aligner, AlignerOpts
from hisat2_tpu.utils import alphabet
from hisat2_tpu.io.reads import Read, batchify


@pytest.fixture(scope="module")
def rna_setup():
    rng = np.random.default_rng(17)
    g = rng.integers(0, 4, 60000).astype(np.uint8)
    # two genes, canonical introns
    trans = {}
    exonsets = [
        [(5001, 5160), (5501, 5650), (6001, 6200)],
        [(20001, 20100), (20601, 20700), (21501, 21700)],
    ]
    for gi, exons in enumerate(exonsets):
        for s, e in exons:
            pass
        for k in range(1, len(exons)):
            d = exons[k - 1][1]          # donor: last exon base (1-based)
            a = exons[k][0]
            g[d:d + 2] = [2, 3]          # GT after exon end
            g[a - 3:a - 1] = [0, 2]      # AG before next exon
        trans[f"tx{gi}"] = ("chrR", "+", exons)
    ref = reference_from_seqs({"chrR": alphabet.decode(g)})
    return ref, trans, g


def test_rna_truth_projection(rna_setup):
    ref, trans, g = rna_setup
    rng = np.random.default_rng(1)
    for name, s1, s2, (tidx, gpos, fw, cig, _g2, _c2) in simulate_rna(
            ref, trans, rng, 50, 100, error_rate=0.0):
        # rebuild the read from the genome via the truth CIGAR
        out = []
        p = gpos
        for op, n in cig:
            if op == "M":
                out.append(g[p:p + n])
                p += n
            else:
                p += n
        want = np.concatenate(out)
        got = s1 if fw else alphabet.revcomp(s1)
        assert (got == want).all(), (name, _cigar_str(cig))


def test_rna_spliced_alignment_accuracy(rna_setup):
    ref, trans, g = rna_setup
    fm = build_fm_index(ref)
    al = Aligner(fm, opts=AlignerOpts(spliced=True))
    rng = np.random.default_rng(2)
    reads, truths = [], []
    for i, (name, s1, _s2, tr) in enumerate(simulate_rna(
            ref, trans, rng, 96, 100, error_rate=0.005)):
        reads.append(Read(name, s1, np.full(100, 40, np.int8), i))
        truths.append(tr)
    batch = batchify(reads, pad_to=104)
    res = al.align_batch(batch)
    ok = 0
    for r, (tidx, gpos, fw, cig, _a, _b) in zip(res, truths):
        if r.aligned and abs(r.alns[0].toff - gpos) <= 3:
            ok += 1
    assert ok >= 90, f"{ok}/96 spliced placements correct"
