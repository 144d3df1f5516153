"""Sharded-index spliced (RNA) alignment: the per-shard fused splice
stage + global lane merge + host junction fallback must reproduce the
single-index spliced path (align/sharded.py RNA support — the flagship
snp_tran-at-Gbp composition, VERDICT r3 item 1)."""

import io

import numpy as np
import pytest

from hisat2_tpu.align.pipeline import Aligner, AlignerOpts
from hisat2_tpu.align.sharded import ShardedAligner
from hisat2_tpu.align import emit
from hisat2_tpu.index.fm_index import build_fm_index
from hisat2_tpu.index.sharded import build_sharded
from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.io.reads import Read, batchify
from hisat2_tpu.io import sam as samio
from hisat2_tpu.utils import alphabet


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(31)
    g1 = np.asarray(rng.integers(0, 4, 50000), np.uint8)
    g2 = np.asarray(rng.integers(0, 4, 50000), np.uint8)
    introns = []
    for g, chrom_base in ((g1, 0), (g2, 1)):
        for start, ilen in ((5000, 400), (20000, 1500)):
            g[start:start + 2] = [2, 3]
            g[start + ilen - 2:start + ilen] = [0, 2]
            introns.append((chrom_base, start, ilen))
    ref = reference_from_seqs({"c1": alphabet.decode(g1),
                               "c2": alphabet.decode(g2)})
    fm = build_fm_index(ref, ftab_k=6)
    sh = build_sharded(ref, max_bases=60000)   # c1 | c2 -> 2 shards
    assert len(sh) == 2
    return (g1, g2), introns, ref, fm, sh


def _reads(gs, introns, ref, rng, n=48, L=100):
    reads = []
    for i in range(n):
        cb, start, ilen = introns[i % len(introns)]
        g = gs[cb]
        j = int(rng.integers(15, L - 15))
        a = start - j
        seq = np.concatenate([g[a:start],
                              g[start + ilen:start + ilen + (L - j)]])
        if i % 3 == 2:
            seq = alphabet.revcomp(seq)
        reads.append(Read(f"r{i}", seq.copy(),
                          np.full(L, 40, np.int8), i))
    for i in range(n, n + 32):
        cb = i % 2
        p = int(rng.integers(0, 40000))
        reads.append(Read(f"p{i}", gs[cb][p:p + L].copy(),
                          np.full(L, 40, np.int8), i))
    return batchify(reads, pad_to=104)


def _emit_se(al_or_sal, batch, ref, sharded: bool):
    buf = io.StringIO()
    w = samio.SamWriter(buf, ref.names, [int(x) for x in ref.tlens],
                        no_head=True)
    if sharded:
        al_or_sal.align_and_emit([batch], w)
    else:
        emit.align_and_emit(al_or_sal, batch, w)
    recs = {}
    for ln in buf.getvalue().splitlines():
        f = ln.split("\t")
        if int(f[1]) & 256:
            continue
        recs[f[0]] = (int(f[1]) & 16, f[2], int(f[3]), f[5])
    return recs


def test_sharded_rna_se_matches_single(setup):
    gs, introns, ref, fm, sh = setup
    rng = np.random.default_rng(7)
    batch = _reads(gs, introns, ref, rng)

    al = Aligner(fm, opts=AlignerOpts(spliced=True))
    single = _emit_se(al, batch, ref, sharded=False)

    sal = ShardedAligner(sh, opts=AlignerOpts(spliced=True))
    shr = _emit_se(sal, batch, ref, sharded=True)

    assert set(single) == set(shr)
    for name in single:
        assert shr[name] == single[name], (
            f"{name}: sharded {shr[name]} != single {single[name]}")
    # junction reads actually got N CIGARs
    njunc = sum(1 for n, v in single.items()
                if n.startswith("r") and "N" in v[3])
    assert njunc >= 40


def test_sharded_snp_tran_composition(setup, tmp_path):
    """The flagship composition: sharded GRAPH (SNP) index x baked known
    splice sites x spliced reads carrying ALT alleles — the snp_tran
    config (reference make_grch38_snp_tran.sh) at shard scale. Output
    must match the single graph index byte-for-byte."""
    from hisat2_tpu.io.annotations import read_snps
    from hisat2_tpu.index.graph_index import build_graph_index

    gs, introns, ref, _fm, _sh = setup
    rng = np.random.default_rng(41)
    # SNVs sprinkled through exons near the introns
    lines = []
    i = 0
    for cb, start, ilen in introns:
        chrom = "c1" if cb == 0 else "c2"
        for off in (-40, -20, 25, 60):
            p = start + (off if off < 0 else ilen + off)
            alt = (int(gs[cb][p]) + 1) % 4
            lines.append(f"rs{i}\tsingle\t{chrom}\t{p}\t{'ACGT'[alt]}")
            i += 1
    sp = tmp_path / "t.snp"
    sp.write_text("\n".join(lines) + "\n")
    snps = read_snps(str(sp), ref)

    gfm = build_graph_index(ref, snps, ftab_k=6)
    sh = build_sharded(ref, max_bases=60000, snps=snps)
    known = np.asarray([[b * 50000 + s - 1, b * 50000 + s + l, 1]
                        for b, s, l in introns], np.int64)
    sh.known_ss = known

    # alt-allele junction reads (the alt base inside the upstream exon)
    L = 100
    reads = []
    for i in range(40):
        cb, start, ilen = introns[i % len(introns)]
        g = gs[cb].copy()
        p_alt = start - 20
        g[p_alt] = (g[p_alt] + 1) % 4          # read carries the ALT base
        j = int(rng.integers(25, 75))
        a = start - j
        seq = np.concatenate([g[a:start],
                              g[start + ilen:start + ilen + (L - j)]])
        reads.append(Read(f"s{i}", seq.copy(),
                          np.full(L, 40, np.int8), i))
    batch = batchify(reads, pad_to=104)

    def run(sharded: bool):
        buf = io.StringIO()
        w = samio.SamWriter(buf, ref.names, [int(x) for x in ref.tlens],
                            no_head=True)
        if sharded:
            sal = ShardedAligner(sh, opts=AlignerOpts(spliced=True))
            for jl, jr, _st in known:
                sal.host.ssdb.add_known(int(jl), int(jr), "+")
            sal.align_and_emit([batch], w)
        else:
            al = Aligner(gfm, opts=AlignerOpts(spliced=True))
            for jl, jr, _st in known:
                al.ssdb.add_known(int(jl), int(jr), "+")
            emit.align_and_emit(al, batch, w)
        recs = {}
        for ln in buf.getvalue().splitlines():
            f = ln.split("\t")
            if int(f[1]) & 256:
                continue
            recs[f[0]] = (int(f[1]) & 16, f[2], int(f[3]), f[5],
                          [x for x in f[11:] if x.startswith("NM:")])
        return recs

    shr = run(True)
    single = run(False)
    assert set(shr) == set(single)
    njunc = 0
    for name in single:
        assert shr[name] == single[name], (
            f"{name}: sharded {shr[name]} != single {single[name]}")
        if "N" in single[name][3]:
            njunc += 1
    assert njunc >= 36
    # the alt base scores free: junction reads with one ALT mismatch
    # must report NM:i:0 through the overlay
    nm0 = sum(1 for v in single.values()
              if "N" in v[3] and v[4] == ["NM:i:0"])
    assert nm0 >= 30


def test_sharded_rna_pe(setup):
    gs, introns, ref, fm, sh = setup
    rng = np.random.default_rng(13)
    L = 100
    r1s, r2s = [], []
    for i in range(32):
        cb, start, ilen = introns[i % len(introns)]
        g = gs[cb]
        j = int(rng.integers(15, L - 15))
        a = start - j
        m1 = np.concatenate([g[a:start],
                             g[start + ilen:start + ilen + (L - j)]])
        # mate 2 downstream of the junction, reverse-complemented (FR)
        m2start = start + ilen + 150
        m2 = alphabet.revcomp(g[m2start:m2start + L])
        r1s.append(Read(f"q{i}", m1.copy(), np.full(L, 40, np.int8), i))
        r2s.append(Read(f"q{i}", m2.copy(), np.full(L, 40, np.int8), i))
    b1 = batchify(r1s, pad_to=104)
    b2 = batchify(r2s, pad_to=104)

    def run(sharded: bool):
        buf = io.StringIO()
        w = samio.SamWriter(buf, ref.names, [int(x) for x in ref.tlens],
                            no_head=True)
        if sharded:
            sal = ShardedAligner(sh, opts=AlignerOpts(spliced=True))
            sal.align_and_emit_pe([(b1, b2)], w)
        else:
            al = Aligner(fm, opts=AlignerOpts(spliced=True))
            emit.align_and_emit_pe(al, b1, b2, w)
        by: dict = {}
        for ln in buf.getvalue().splitlines():
            f = ln.split("\t")
            flag = int(f[1])
            if flag & 256:
                continue
            by.setdefault(f[0], []).append(
                (flag, f[2], int(f[3]), f[5], f[8]))
        return by

    shr = run(True)
    single = run(False)
    assert set(shr) == set(single)
    njunc = 0
    for i in range(32):
        assert shr[f"q{i}"] == single[f"q{i}"], (
            f"q{i}: sharded {shr[f'q{i}']} != single {single[f'q{i}']}")
        recs = shr[f"q{i}"]
        assert len(recs) == 2
        if any("N" in r[3] for r in recs):
            njunc += 1
    assert njunc >= 30


def test_sharded_tmo_matches_single(setup):
    """--tmo over a sharded index: identical output to the single-index
    ladder under the same known-site table (transcriptome-only pairs,
    _tmo_filter_pair semantics)."""
    gs, introns, ref, fm, sh = setup
    rng = np.random.default_rng(19)
    L = 100
    r1s, r2s = [], []
    for i in range(24):
        cb, start, ilen = introns[i % len(introns)]
        g = gs[cb]
        j = int(rng.integers(15, L - 15))
        a = start - j
        m1 = np.concatenate([g[a:start],
                             g[start + ilen:start + ilen + (L - j)]])
        m2start = start + ilen + 150
        m2 = alphabet.revcomp(g[m2start:m2start + L])
        r1s.append(Read(f"t{i}", m1.copy(), np.full(L, 40, np.int8), i))
        r2s.append(Read(f"t{i}", m2.copy(), np.full(L, 40, np.int8), i))
    # exonic-only pairs: --tmo must drop them entirely
    for i in range(24, 32):
        cb = i % 2
        p0 = int(rng.integers(0, 40000))
        r1s.append(Read(f"t{i}", gs[cb][p0:p0 + L].copy(),
                        np.full(L, 40, np.int8), i))
        r2s.append(Read(f"t{i}",
                        alphabet.revcomp(gs[cb][p0 + 250:p0 + 250 + L]),
                        np.full(L, 40, np.int8), i))
    b1 = batchify(r1s, pad_to=104)
    b2 = batchify(r2s, pad_to=104)
    sites = [(cb * 50000 + start - 1, cb * 50000 + start + ilen)
             for cb, start, ilen in introns]

    def run(sharded: bool):
        opts = AlignerOpts(spliced=True, tmo=True,
                           no_temp_splicesite=True)
        buf = io.StringIO()
        w = samio.SamWriter(buf, ref.names, [int(x) for x in ref.tlens],
                            no_head=True)
        if sharded:
            sal = ShardedAligner(sh, opts=opts)
            for jl, jr in sites:
                sal.host.ssdb.add_known(jl, jr, "+")
            sal.align_and_emit_pe([(b1, b2)], w)
        else:
            al = Aligner(fm, opts=opts)
            for jl, jr in sites:
                al.ssdb.add_known(jl, jr, "+")
            from hisat2_tpu.align import paired as _paired
            res = _paired.align_pairs(al, b1, b2)
            _paired.pairs_to_sam(b1, b2, res, al, w)
        return buf.getvalue()

    single = run(False)
    sharded = run(True)
    assert sharded == single
    # --tmo keeps only known-junction-spliced mate-1 records; exonic
    # pairs come out unaligned
    for ln in single.splitlines():
        f = ln.split("\t")
        if int(f[1]) & 4:
            continue
        if int(f[1]) & 64:
            assert "N" in f[5], ln
