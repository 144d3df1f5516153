"""Fused PE emit fast path vs the per-pair slow path: byte-identical SAM
on a repeat-bearing genome (multimapped pairs exercise -k secondary
concordant records, NH, ZS-less concordant tags, TLEN)."""

import io

import numpy as np
import pytest

from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.index.fm_index import build_fm_index
from hisat2_tpu.utils import alphabet
from hisat2_tpu.align.pipeline import Aligner
from hisat2_tpu.align.emit import align_and_emit_pe, _samfmt
from hisat2_tpu.align import paired as _paired
from hisat2_tpu.io import sam as samio
from hisat2_tpu.io.reads import Read, batchify


def _mk_pairs(joined, n, rng, rdlen=72, ins=200):
    b1, b2 = [], []
    for i in range(n):
        st = int(rng.integers(0, joined.size - ins))
        frag = joined[st:st + ins]
        r1 = frag[:rdlen].copy()
        r2 = alphabet.revcomp(frag[-rdlen:])
        for r in (r1, r2):
            mm = rng.random(rdlen) < 0.02
            r[mm] = (r[mm] + rng.integers(1, 4, int(mm.sum()))) % 4
        if rng.random() < 0.5:
            r1, r2 = alphabet.revcomp(r2), alphabet.revcomp(r1)
        q = np.full(rdlen, 35, np.int8)
        b1.append(Read(f"p{i}", r1, q, i))
        b2.append(Read(f"p{i}", r2, q, i))
    return batchify(b1, pad_to=80), batchify(b2, pad_to=80)


@pytest.mark.skipif(_samfmt() is None, reason="native formatter unavailable")
def test_pe_fast_matches_slow():
    rng = np.random.default_rng(11)
    seq = alphabet.decode(rng.integers(0, 4, 30000).astype(np.uint8))
    # plant a repeat so some pairs multimap
    seq = seq[:15000] + seq[4000:5200] + seq[15000:]
    ref = reference_from_seqs({"chrP": seq})
    fm = build_fm_index(ref, ftab_k=6)
    joined = fm.ref.joined
    b1, b2 = _mk_pairs(joined, 192, rng)

    al1 = Aligner(fm)
    buf1 = io.StringIO()
    w1 = samio.SamWriter(buf1, fm.ref.names, [int(x) for x in fm.ref.tlens],
                         no_head=True)
    st1 = align_and_emit_pe(al1, b1, b2, w1)

    al2 = Aligner(fm)
    buf2 = io.StringIO()
    w2 = samio.SamWriter(buf2, fm.ref.names, [int(x) for x in fm.ref.tlens],
                         no_head=True)
    res = _paired.align_pairs(al2, b1, b2)
    st2 = _paired.pairs_to_sam(b1, b2, res, al2, w2)

    assert st1 == st2
    a = buf1.getvalue().splitlines()
    b = buf2.getvalue().splitlines()
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x == y
    # at least one multimapped concordant pair must have exercised the
    # secondary-pair path for this test to mean anything
    assert st1["conc_multi"] >= 1
    assert any("\t323\t" in ln or "\t355\t" in ln or "\t339\t" in ln
               or "\t371\t" in ln or "\t403\t" in ln or "\t387\t" in ln
               for ln in a), "no secondary concordant record emitted"


@pytest.mark.skipif(_samfmt() is None, reason="native formatter unavailable")
def test_pe_fast_matches_slow_high_multimap():
    """Pairs with >=3 distinct placements flow through the compacted
    multi-report bucket (stage_pe_packed MB extras) and must still match
    the per-pair slow path byte for byte."""
    rng = np.random.default_rng(23)
    seq = alphabet.decode(rng.integers(0, 4, 24000).astype(np.uint8))
    rep = seq[3000:4200]
    # 4 copies of the repeat: pairs inside it have 4 concordant placements
    seq = seq[:12000] + rep + seq[12000:18000] + rep + seq[18000:] + rep
    ref = reference_from_seqs({"chrQ": seq})
    fm = build_fm_index(ref, ftab_k=6)
    joined = fm.ref.joined
    b1, b2 = _mk_pairs(joined, 160, rng)

    al1 = Aligner(fm)
    buf1 = io.StringIO()
    w1 = samio.SamWriter(buf1, fm.ref.names, [int(x) for x in fm.ref.tlens],
                         no_head=True)
    st1 = align_and_emit_pe(al1, b1, b2, w1)

    al2 = Aligner(fm)
    buf2 = io.StringIO()
    w2 = samio.SamWriter(buf2, fm.ref.names, [int(x) for x in fm.ref.tlens],
                         no_head=True)
    res = _paired.align_pairs(al2, b1, b2)
    st2 = _paired.pairs_to_sam(b1, b2, res, al2, w2)

    assert st1 == st2
    a = buf1.getvalue().splitlines()
    b = buf2.getvalue().splitlines()
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x == y
    assert any("\tNH:i:3" in ln or "\tNH:i:4" in ln for ln in a), \
        "no >=3-way multimapped pair exercised the bucket path"
