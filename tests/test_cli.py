"""CLI round-trip smoke tests: build -> align -> inspect -> repeat, driven
through the argparse mains (the way users invoke them)."""

import os
import sys

import numpy as np
import pytest

from hisat2_tpu.utils import alphabet


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, 40000).astype(np.uint8)
    fa = d / "g.fa"
    with open(fa, "w") as fh:
        fh.write(">chrC\n")
        s = alphabet.decode(codes)
        for i in range(0, len(s), 70):
            fh.write(s[i:i + 70] + "\n")
    fq = d / "r.fq"
    with open(fq, "w") as fh:
        for i in range(50):
            p = int(rng.integers(0, 39000))
            fh.write(f"@c{i}_{p}\n{alphabet.decode(codes[p:p+100])}\n+\n"
                     f"{'I'*100}\n")
    snp = d / "g.snp"
    snp.write_text(f"rs1\tsingle\tchrC\t5000\t"
                   f"{alphabet.decode([(int(codes[5000])+1)%4])}\n")
    return d, codes


def test_build_align_inspect(workdir, capsys):
    d, codes = workdir
    from hisat2_tpu.cli.build import main as build_main
    from hisat2_tpu.cli.align import main as align_main
    from hisat2_tpu.cli.inspect import main as inspect_main
    assert build_main([str(d / "g.fa"), str(d / "idx"), "--quiet"]) == 0
    out = str(d / "out.sam")
    assert align_main(["-x", str(d / "idx"), "-U", str(d / "r.fq"),
                       "-S", out, "--quiet",
                       "--no-spliced-alignment"]) == 0
    recs = [l.split("\t") for l in open(out) if not l.startswith("@")]
    assert len(recs) == 50
    ok = sum(1 for f in recs
             if int(f[3]) - 1 == int(f[0].split("_")[1]))
    assert ok >= 49
    # inspect: names + summary + reconstruction
    assert inspect_main([str(d / "idx"), "-n"]) == 0
    assert "chrC" in capsys.readouterr().out
    assert inspect_main([str(d / "idx"), "-s"]) == 0
    assert "Sequence-1" in capsys.readouterr().out
    assert inspect_main([str(d / "idx")]) == 0
    fasta = capsys.readouterr().out
    body = "".join(fasta.splitlines()[1:])
    assert body == alphabet.decode(codes)


def test_build_snp_and_inspect_snp(workdir, capsys):
    d, codes = workdir
    from hisat2_tpu.cli.build import main as build_main
    from hisat2_tpu.cli.inspect import main as inspect_main
    assert build_main(["--snp", str(d / "g.snp"), str(d / "g.fa"),
                       str(d / "gidx"), "--quiet"]) == 0
    assert inspect_main([str(d / "gidx"), "--snp"]) == 0
    out = capsys.readouterr().out
    assert out.startswith("rs1\tsingle\tchrC\t5000")


def test_repeat_cli(workdir, capsys):
    d, codes = workdir
    from hisat2_tpu.cli.repeat import main as repeat_main
    # plant repeats first
    rng = np.random.default_rng(8)
    codes2 = rng.integers(0, 4, 30000).astype(np.uint8)
    unit = codes2[100:300].copy()
    for p in (1000, 4000, 9000, 14000, 20000):
        codes2[p:p + 200] = unit
    fa = d / "rep.fa"
    with open(fa, "w") as fh:
        fh.write(">chrR\n" + alphabet.decode(codes2) + "\n")
    assert repeat_main([str(fa), str(d / "rp"), "--repeat-length", "100",
                        "--repeat-count", "4", "--quiet"]) == 0
    assert os.path.exists(d / "rp.rep.fa")
    assert os.path.exists(d / "rp.rep.info")
    assert os.path.exists(str(d / "rp.rep") + ".npz")


def test_flag_surface(workdir):
    """--nofw/--norc/-u/-s/-5/-3/--rg-id round-trip through the CLI."""
    d, codes = workdir
    from hisat2_tpu.cli.align import main as align_main
    out = str(d / "flags.sam")
    assert align_main(["-x", str(d / "idx"), "-U", str(d / "r.fq"),
                       "-S", out, "--quiet", "--no-spliced-alignment",
                       "--norc", "-u", "10", "-s", "5", "-5", "2", "-3", "3",
                       "--rg-id", "grp1", "--rg", "SM:sample1"]) == 0
    lines = open(out).read().splitlines()
    assert any(l.startswith("@RG\tID:grp1\tSM:sample1") for l in lines)
    recs = [l.split("\t") for l in lines if not l.startswith("@")]
    assert len(recs) == 10                       # -u 10 after -s 5
    for f in recs:
        assert len(f[9]) == 95 or f[9] == "*"    # trimmed to 95bp
        assert not (int(f[1]) & 0x10) or f[2] == "*"   # --norc: no rc hits


def test_repeat_mode_align(workdir, tmp_path):
    """--repeat: multireads report against the repeat pseudo-reference."""
    import numpy as np
    from hisat2_tpu.cli.repeat import main as repeat_main
    from hisat2_tpu.cli.build import main as build_main
    from hisat2_tpu.cli.align import main as align_main
    rng = np.random.default_rng(12)
    codes = rng.integers(0, 4, 40000).astype(np.uint8)
    unit = codes[200:400].copy()
    for p in (2000, 8000, 15000, 22000, 30000, 36000):
        codes[p:p + 200] = unit
    fa = tmp_path / "rg.fa"
    fa.write_text(">chrRp\n" + alphabet.decode(codes) + "\n")
    idx = str(tmp_path / "rgidx")
    assert build_main([str(fa), idx, "--quiet"]) == 0
    assert repeat_main([str(fa), idx, "--repeat-length", "100",
                        "--repeat-count", "4", "--quiet"]) == 0
    fq = tmp_path / "rg.fq"
    with open(fq, "w") as fh:
        # a read from inside the repeat (multi-maps) + a unique read
        fh.write(f"@rep\n{alphabet.decode(codes[2020:2120])}\n+\n{'I'*100}\n")
        fh.write(f"@uni\n{alphabet.decode(codes[5000:5100])}\n+\n{'I'*100}\n")
    out = str(tmp_path / "rg.sam")
    assert align_main(["-x", idx, "-U", str(fq), "-S", out, "--quiet",
                       "--no-spliced-alignment", "--repeat"]) == 0
    recs = {l.split("\t")[0]: l.split("\t") for l in open(out)
            if not l.startswith("@")}
    assert recs["rep"][2].startswith("rpt_")       # repeat pseudo-ref
    assert recs["uni"][2] == "chrRp"               # unique stays genomic
    hdr = [l for l in open(out) if l.startswith("@SQ")]
    assert any("SN:rpt_" in l for l in hdr)


def test_build_ss_exon_inspect_roundtrip(workdir, capsys):
    """--ss/--exon bake into the index; inspect --ss/--ss-all/--exon print
    them back (reference hisat2_inspect.cpp:473-571 ALT round-trip)."""
    d, codes = workdir
    from hisat2_tpu.cli.build import main as build_main
    from hisat2_tpu.cli.inspect import main as inspect_main
    ss = d / "g.ss"
    ss.write_text("chrC\t1999\t2500\t+\nchrC\t7000\t7600\t-\n")
    exon = d / "g.exon"
    exon.write_text("chrC\t1500\t1999\t+\nchrC\t2501\t2800\t+\n")
    assert build_main(["--ss", str(ss), "--exon", str(exon),
                       str(d / "g.fa"), str(d / "tidx"), "--quiet"]) == 0
    assert inspect_main([str(d / "tidx"), "--ss"]) == 0
    assert capsys.readouterr().out == ss.read_text()
    assert inspect_main([str(d / "tidx"), "--ss-all"]) == 0
    assert capsys.readouterr().out == ss.read_text()
    assert inspect_main([str(d / "tidx"), "--exon"]) == 0
    assert capsys.readouterr().out == exon.read_text()


def test_tmo_cli(workdir):
    """--tmo end-to-end: a contiguous (unspliced) read is reported
    unaligned when transcriptome-mapping-only is on."""
    d, codes = workdir
    from hisat2_tpu.cli.align import main as align_main
    out = str(d / "tmo.sam")
    assert align_main(["-x", str(d / "idx"), "-U", str(d / "r.fq"),
                       "-S", out, "--quiet", "--tmo"]) == 0
    recs = [l.split("\t") for l in open(out) if not l.startswith("@")]
    assert len(recs) == 50
    assert all(int(f[1]) & 4 for f in recs)


def test_tmo_cli_pe(workdir):
    """PE --tmo: contiguous concordant pairs must be reported unaligned
    on the DEFAULT paired path (the fused/native formatter path used to
    bypass the tmo gate entirely)."""
    d, codes = workdir
    from hisat2_tpu.cli.align import main as align_main
    rng = np.random.default_rng(11)
    r1 = d / "p1.fq"
    r2 = d / "p2.fq"
    with open(r1, "w") as f1, open(r2, "w") as f2:
        for i in range(30):
            p = int(rng.integers(0, 38000))
            frag = codes[p:p + 300]
            s1 = alphabet.decode(frag[:100])
            s2 = alphabet.decode(3 - frag[-100:][::-1])   # revcomp mate
            f1.write(f"@p{i}\n{s1}\n+\n{'I'*100}\n")
            f2.write(f"@p{i}\n{s2}\n+\n{'I'*100}\n")
    out = str(d / "tmo_pe.sam")
    assert align_main(["-x", str(d / "idx"), "-1", str(r1), "-2", str(r2),
                       "-S", out, "--quiet", "--tmo"]) == 0
    recs = [l.split("\t") for l in open(out) if not l.startswith("@")]
    assert len(recs) == 60
    assert all(int(f[1]) & 4 for f in recs)


def test_policy_string():
    """Policy-string parser (presets.cpp:30-88 + SeedAlignmentPolicy):
    presets and -N/-L/-i/-D/-R components map onto opts/scoring."""
    from hisat2_tpu.align.policy import apply_policy, PRESETS
    from hisat2_tpu.align.pipeline import AlignerOpts
    from hisat2_tpu.align.scoring import DEFAULT_SCORING

    o = AlignerOpts()
    sc = apply_policy(PRESETS["very-sensitive"], o, DEFAULT_SCORING)
    assert o.verify_cands == 20          # DPS=20
    assert o.max_seeds == 24             # ROUNDS=3
    assert o.n_seeds > AlignerOpts().n_seeds   # IVAL=S,1,0.50 densifies

    o2 = AlignerOpts()
    sc2 = apply_policy("MA=2;MMP=C3;RDG=4,2;RFG=6,3;MIN=L,0,-0.3;"
                       "NCEIL=C,5;NP=C2", o2, DEFAULT_SCORING)
    assert sc2.match_bonus == 2
    assert sc2.mm_pen_max == sc2.mm_pen_min == 3
    assert (sc2.read_gap_const, sc2.read_gap_linear) == (4, 2)
    assert (sc2.ref_gap_const, sc2.ref_gap_linear) == (6, 3)
    assert sc2.score_min.S == -0.3
    assert sc2.n_ceil.type == "C" and sc2.n_ceil.I == 5
    assert sc2.n_pen == 2

    import pytest as _pt
    with _pt.raises(ValueError):
        apply_policy("BOGUS=1", AlignerOpts(), DEFAULT_SCORING)
