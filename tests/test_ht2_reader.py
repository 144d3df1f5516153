""".ht2 interop: read REFERENCE-built index files (checked-in fixtures in
tests/golden/ht2fix, built by hisat2-build-s from /tmp when available)
with io/ht2.py and verify text/BWT/SA-sample/names/ALTs round-trip.

Fixture contents (tests/golden/ht2fix/):
  g.fa          chrA (6000bp) + chrB (4000bp), seed 5
  g.snp/.haplotype/.ss/.exon   4 SNVs + 1 del + 1 ins on chrA (one
                phased pair), 2 splice sites + 2 exons on chrB
  lin.*.ht2     `hisat2-build-s --offrate 3 --ftabchars 4`
  snp.*.ht2     same + `--snp --haplotype --ss --exon` (graph index)
"""

import os

import numpy as np
import pytest

from hisat2_tpu.utils import alphabet

FIX = os.path.join(os.path.dirname(__file__), "golden", "ht2fix")
BUILD_BIN = "/tmp/hisat2_ref_build/hisat2-build-s"


def _fasta_seqs():
    seqs = {}
    name = None
    with open(os.path.join(FIX, "g.fa")) as fh:
        for line in fh:
            if line.startswith(">"):
                name = line[1:].strip()
                seqs[name] = []
            else:
                seqs[name].append(line.strip())
    return {k: "".join(v) for k, v in seqs.items()}


def test_ht2_roundtrip():
    from hisat2_tpu.io.ht2 import (read_ht2_primary, read_ht2_offs,
                                   read_ht2_reference, load_ht2)
    prefix = os.path.join(FIX, "lin")
    seqs = _fasta_seqs()
    hdr = read_ht2_primary(prefix)
    assert hdr["linear"]
    assert hdr["names"] == list(seqs)
    assert hdr["length"] == sum(len(v) for v in seqs.values())
    ref = read_ht2_reference(prefix, hdr["names"], hdr["plens"])
    want = np.concatenate([alphabet.encode(v) for v in seqs.values()])
    assert (ref.joined == want).all(), "reference text mismatch"

    # load_ht2 cross-checks the stored BWT against our rebuild internally
    fm = load_ht2(prefix)
    assert fm.n == hdr["length"]

    # SA sample: rebuild the reference's row->position map by LF-walking
    # the stored BWT from the last row (GFM::restore order: step j visits
    # the row of suffix len-j) and check offs[k] == SA[k << offRate]
    offs = read_ht2_offs(prefix)
    bwt = hdr["bwt"]
    z = int(hdr["zoffs"][0])
    n = bwt.size
    L = n - 1
    C = hdr["fchr"]
    occ = np.zeros((n + 1, 4), np.int64)
    for c in range(4):
        occ[1:, c] = np.cumsum(bwt == c)
    sa_rows = np.full(n, -1, np.int64)
    i = L
    for j in range(L):
        sa_rows[i] = L - j
        c = int(bwt[i])
        r = int(occ[i, c]) - (1 if (c == 0 and z < i) else 0)
        i = int(C[c]) + r
    sa_rows[i] = 0
    rows = np.arange(offs.size) << hdr["off_rate"]
    want = sa_rows[rows]
    eq = (offs == want)
    assert eq.all(), (offs[~eq][:5], want[~eq][:5])


def test_ht2_alignment():
    """Align reads against the loaded .ht2 index and check placements."""
    from hisat2_tpu.io.ht2 import load_ht2
    from hisat2_tpu.align.pipeline import Aligner
    from hisat2_tpu.io.reads import Read, batchify

    fm = load_ht2(os.path.join(FIX, "lin"))
    al = Aligner(fm)
    rng = np.random.default_rng(4)
    joined = fm.ref.joined
    reads, truth = [], []
    for i in range(64):
        st = int(rng.integers(0, joined.size - 80))
        s = joined[st:st + 80].copy()
        if i % 2:
            s = alphabet.revcomp(s)
        reads.append(Read(f"h{i}", s, np.full(80, 40, np.int8), i))
        truth.append(st)
    batch = batchify(reads, pad_to=80)
    res = al.align_batch(batch)
    ok = 0
    for i, r in enumerate(res):
        if r.aligned:
            jp = fm.ref.text_to_joined(r.alns[0].tidx, r.alns[0].toff)
            ok += jp == truth[i]
    assert ok >= 63, f"{ok}/64"


def test_ht2_graph_alts():
    """.7/.8 parse: SNVs/indels/haplotypes/splice sites/exons recovered
    from a reference-built --snp --ss --exon index (gfm.h:715-879)."""
    from hisat2_tpu.io.ht2 import (read_ht2_primary, read_ht2_alts,
                                   read_ht2_reference, alts_to_annotations)
    from hisat2_tpu.io.annotations import SNP_SGL, SNP_DEL, SNP_INS

    prefix = os.path.join(FIX, "snp")
    hdr = read_ht2_primary(prefix)
    assert not hdr["linear"]
    assert hdr["num_nodes"] > hdr["length"]    # graph has extra nodes
    raw = read_ht2_alts(prefix)
    ref = read_ht2_reference(prefix, hdr["names"], hdr["plens"])
    snps, ss, exons, ss_excl, haps = alts_to_annotations(raw, ref)

    assert snps.names[:4] == ["snv0", "snv1", "snv2", "snv3"]
    assert snps.jpos.tolist() == [500, 1200, 2500, 3300, 4000, 4500]
    assert snps.types.tolist() == [SNP_SGL] * 4 + [SNP_DEL, SNP_INS]
    assert snps.lens.tolist() == [1, 1, 1, 1, 3, 4]
    assert snps.ins_seqs[5].tolist() == [0, 1, 2, 3]       # ACGT
    ga = alphabet.encode(_fasta_seqs()["chrA"])
    for k, pos in enumerate([500, 1200, 2500, 3300]):
        assert int(snps.alt_codes[k]) == (int(ga[pos]) + 1) % 4
    # chrB joined offset = 6000
    assert ss.tolist() == [[7000, 7500, 1], [8200, 8900, -1]]
    assert exons.tolist() == [[6800, 7000, 1], [7500, 7700, 1]]
    assert haps == [[0, 1]]


def test_ht2_graph_alignment():
    """Load the graph .ht2 and align: an ALT-allele read scores 0
    (SNP-aware match) and a junction read uses the baked splice site."""
    import io
    from hisat2_tpu.io.ht2 import load_ht2
    from hisat2_tpu.align.pipeline import Aligner
    from hisat2_tpu.align import emit
    from hisat2_tpu.io import sam as samio
    from hisat2_tpu.io.reads import Read, batchify

    fm = load_ht2(os.path.join(FIX, "snp"))
    assert fm.known_ss is not None and fm.known_ss.shape[0] == 2
    g = fm.ref.joined
    r = g[460:560].copy()
    r[40] = (int(g[500]) + 1) % 4           # the indexed ALT allele
    j = np.concatenate([g[6951:7001], g[7500:7550]])   # baked junction
    b = batchify([Read("snp_read", r, np.full(100, 40, np.int8), 0),
                  Read("junc_read", j, np.full(100, 40, np.int8), 1)],
                 pad_to=104)
    al = Aligner(fm)
    al.opts.spliced = True
    for jl, jr, strand in fm.known_ss:
        al.ssdb.add_known(int(jl), int(jr), "+" if strand > 0 else "-")
    buf = io.StringIO()
    w = samio.SamWriter(buf, fm.ref.names, [int(x) for x in fm.ref.tlens],
                        no_head=True)
    emit.align_and_emit(al, b, w)
    recs = {ln.split("\t")[0]: ln.split("\t")
            for ln in buf.getvalue().splitlines()}
    snp = recs["snp_read"]
    assert snp[2] == "chrA" and snp[3] == "461" and snp[5] == "100M"
    assert "AS:i:0" in snp                   # ALT match costs nothing
    junc = recs["junc_read"]
    assert junc[2] == "chrB" and junc[3] == "952"
    assert junc[5] == "50M499N50M"


@pytest.mark.skipif(not os.path.exists(BUILD_BIN),
                    reason="reference hisat2-build-s not available")
def test_ht2_fresh_build_roundtrip(tmp_path):
    """Optional: rebuild the linear fixture live and re-verify (guards
    against fixture staleness when the binaries are present)."""
    import subprocess
    from hisat2_tpu.io.ht2 import load_ht2
    fa = os.path.join(FIX, "g.fa")
    subprocess.run([BUILD_BIN, "-f", "--offrate", "3", "--ftabchars", "4",
                    fa, str(tmp_path / "idx")],
                   check=True, capture_output=True, timeout=300)
    fm = load_ht2(str(tmp_path / "idx"))
    assert fm.n == 10000
