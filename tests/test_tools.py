"""Tests for the L8 tooling (extract_splice_sites/exons/snps, simulator,
read statistics) and the embedding API."""

import io
import os

import numpy as np
import pytest

GTF = """\
chr1\thavana\tgene\t100\t900\t.\t+\t.\tgene_id "G1"; transcript_id "T0";
chr1\thavana\texon\t100\t200\t.\t+\t.\tgene_id "G1"; transcript_id "T1";
chr1\thavana\texon\t300\t400\t.\t+\t.\tgene_id "G1"; transcript_id "T1";
chr1\thavana\texon\t600\t700\t.\t+\t.\tgene_id "G1"; transcript_id "T1";
chr1\thavana\texon\t100\t200\t.\t+\t.\tgene_id "G1"; transcript_id "T2";
chr1\thavana\texon\t600\t700\t.\t+\t.\tgene_id "G1"; transcript_id "T2";
chr2\thavana\texon\t50\t80\t.\t-\t.\tgene_id "G2"; transcript_id "T3";
chr2\thavana\texon\t90\t120\t.\t-\t.\tgene_id "G2"; transcript_id "T3";
"""


def test_extract_splice_sites():
    from hisat2_tpu.tools.extract_splice_sites import extract_splice_sites
    out = io.StringIO()
    n = extract_splice_sites(io.StringIO(GTF), out)
    lines = out.getvalue().splitlines()
    assert "chr1\t199\t299\t+" in lines
    assert "chr1\t399\t599\t+" in lines
    assert "chr1\t199\t599\t+" in lines   # T2 skips middle exon
    # chr2 exons 50-80 / 90-120: gap = 9 > 5 -> junction survives
    assert "chr2\t79\t89\t-" in lines
    assert n == len(lines)


def test_extract_exons():
    from hisat2_tpu.tools.extract_exons import extract_exons
    out = io.StringIO()
    extract_exons(io.StringIO(GTF), out)
    lines = out.getvalue().splitlines()
    assert "chr1\t99\t199\t+" in lines
    assert "chr1\t299\t399\t+" in lines


def test_extract_snps_vcf(tmp_path):
    from hisat2_tpu.tools.extract_snps import extract_snps_vcf
    vcf = tmp_path / "t.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "chr1\t100\trs1\tA\tG\t.\t.\t.\n"
        "chr1\t150\trs2\tAT\tA\t.\t.\t.\n"     # 1bp deletion
        "chr1\t170\trs3\tA\tACC\t.\t.\t.\n"    # CC insertion
        "chr1\t500\trs4\tA\tG,C\t.\t.\t.\n")   # multi-allelic
    n = extract_snps_vcf(str(vcf), str(tmp_path / "out"))
    snp_lines = (tmp_path / "out.snp").read_text().splitlines()
    assert "rs1\tsingle\tchr1\t99\tG" in snp_lines
    assert "rs2\tdeletion\tchr1\t150\t1" in snp_lines
    assert "rs3\tinsertion\tchr1\t170\tCC" in snp_lines
    assert sum(1 for l in snp_lines if l.startswith("rs4")) == 2
    assert n == 5
    # rs1/rs2/rs3 within 100bp -> one haplotype
    hap = (tmp_path / "out.haplotype").read_text()
    assert "rs1,rs2,rs3" in hap


def test_simulator_roundtrip(tmp_path):
    """Simulated reads align back to their true positions."""
    from hisat2_tpu.tools.simulate_reads import simulate
    from hisat2_tpu.io.reference import reference_from_seqs
    from hisat2_tpu.index.fm_index import build_fm_index
    from hisat2_tpu.align.pipeline import Aligner
    from hisat2_tpu.io.reads import Read, batchify
    from hisat2_tpu.utils import alphabet

    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, 30000).astype(np.uint8)
    ref = reference_from_seqs({"chrZ": alphabet.decode(codes)})
    reads, truth = [], []
    for i, (name, s, _, t) in enumerate(
            simulate(ref, rng, 30, 100, error_rate=0.01)):
        reads.append(Read(name, s, None, i))
        truth.append(t)
    al = Aligner(build_fm_index(ref, ftab_k=6))
    results = al.align_batch(batchify(reads))
    ok = sum(1 for res, (tidx, toff, fw) in zip(results, truth)
             if res.aligned and res.alns[0].toff == toff
             and res.alns[0].fw == fw)
    assert ok >= 28


def test_read_statistics(tmp_path):
    from hisat2_tpu.tools.read_statistics import read_stats
    fq = tmp_path / "r.fq"
    fq.write_text("".join(f"@r{i}\n{'ACGT' * 25}\n+\n{'I' * 100}\n"
                          for i in range(10)))
    stats = read_stats([str(fq)])
    assert stats == {100: 10}


def test_api_handle(tmp_path):
    import hisat2_tpu.api as ht2
    from hisat2_tpu.io.reference import reference_from_seqs
    from hisat2_tpu.index.fm_index import build_fm_index
    from hisat2_tpu.utils import alphabet

    rng = np.random.default_rng(2)
    codes = rng.integers(0, 4, 20000).astype(np.uint8)
    ref = reference_from_seqs({"chrA": alphabet.decode(codes)})
    fm = build_fm_index(ref, ftab_k=6)
    fm.save(str(tmp_path / "apidx"))
    h = ht2.init(str(tmp_path / "apidx"))
    assert h.get_refnames() == ["chrA"]
    assert h.get_reflens() == [20000]
    res = h.align([alphabet.decode(codes[500:600])])
    assert res[0].aligned and res[0].alns[0].joined_pos == 500
