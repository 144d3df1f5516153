"""hisat2 aligner CLI (reference hisat2.cpp driver :3709 role).

Option surface follows the reference's main flags (MANUAL.markdown):
-x index, -U unpaired / -1 -2 paired, -f fasta, -S output, -k, -I/-X,
--fr/--rf/--ff, --no-mixed/--no-discordant, --no-head, --reorder,
--un/--al outputs, -p (accepted; batching replaces threads).
"""

from __future__ import annotations

import argparse
import itertools
import sys
import time


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="hisat2-tpu", description="TPU-native HISAT2-class aligner")
    ap.add_argument("-x", dest="index", required=True, help="index prefix")
    ap.add_argument("-U", dest="unpaired", default=None,
                    help="comma-separated unpaired read files")
    ap.add_argument("-1", dest="m1", default=None)
    ap.add_argument("-2", dest="m2", default=None)
    ap.add_argument("--12", dest="tab6", default=None,
                    help="tab6 interleaved input (reference --12)")
    ap.add_argument("-S", dest="output", default=None, help="SAM output file")
    ap.add_argument("-f", dest="fasta", action="store_true",
                    help="reads are FASTA")
    ap.add_argument("-q", dest="fastq", action="store_true",
                    help="reads are FASTQ (default)")
    ap.add_argument("-r", dest="raw", action="store_true",
                    help="reads are raw one-per-line")
    ap.add_argument("-c", dest="cmdline", action="store_true",
                    help="-U arguments are literal sequences")
    ap.add_argument("--qseq", action="store_true", help="QSEQ input")
    ap.add_argument("--sra-acc", default=None,
                    help="SRA accession (requires the NCBI NGS/VDB SDK, "
                         "not present in this build)")
    ap.add_argument("-F", dest="fasta_cont", default=None,
                    help="k:<int>,i:<int> continuous-FASTA windows")
    ap.add_argument("-k", dest="khits", type=int, default=5,
                    help="report up to <int> alignments per read")
    ap.add_argument("-I", "--minins", type=int, default=0)
    ap.add_argument("-X", "--maxins", type=int, default=1000)
    ap.add_argument("--fr", dest="orient", action="store_const", const="fr",
                    default="fr")
    ap.add_argument("--rf", dest="orient", action="store_const", const="rf")
    ap.add_argument("--ff", dest="orient", action="store_const", const="ff")
    ap.add_argument("--no-mixed", action="store_true")
    ap.add_argument("--no-discordant", action="store_true")
    ap.add_argument("--dovetail", action="store_true",
                    help="concordant pairs may dovetail")
    ap.add_argument("--no-contain", action="store_true",
                    help="one mate containing the other is not concordant")
    ap.add_argument("--no-overlap", action="store_true",
                    help="overlapping mates are not concordant")
    ap.add_argument("--omit-sec-seq", action="store_true",
                    help="print '*' SEQ/QUAL on secondary records")
    ap.add_argument("--tmo", "--transcriptome-mapping-only",
                    dest="tmo", action="store_true",
                    help="report only alignments within known transcripts")
    ap.add_argument("--remove-chrname", action="store_true",
                    help="strip 'chr' from reference names in output")
    ap.add_argument("--add-chrname", action="store_true",
                    help="prepend 'chr' to reference names in output")
    ap.add_argument("--qc-filter", action="store_true",
                    help="drop reads failing the QSEQ filter field")
    ap.add_argument("--no-spliced-alignment", action="store_true")
    ap.add_argument("--min-intronlen", type=int, default=20)
    ap.add_argument("--max-intronlen", type=int, default=500000)
    ap.add_argument("--known-splicesite-infile", default=None)
    ap.add_argument("--novel-splicesite-outfile", default=None)
    ap.add_argument("--novel-splicesite-infile", default=None)
    ap.add_argument("--no-temp-splicesite", action="store_true")
    ap.add_argument("--zs-tags", action="store_true",
                    help="emit Zs:Z SNP-edit tags (extension; the "
                         "reference binary omits them)")
    ap.add_argument("--dta", "--downstream-transcriptome-assembly",
                    action="store_true", dest="dta")
    ap.add_argument("--no-head", action="store_true")
    ap.add_argument("--reorder", action="store_true")
    ap.add_argument("--phred64", action="store_true")
    ap.add_argument("--solexa-quals", action="store_true",
                    help="qualities are Solexa scale (char - 64), "
                         "converted to phred (reference --solexa-quals)")
    ap.add_argument("--int-quals", action="store_true",
                    help="qualities are space-separated integers "
                         "(reference --int-quals)")
    ap.add_argument("--ignore-quals", action="store_true")
    ap.add_argument("-5", "--trim5", type=int, default=0,
                    help="trim <int> bases from 5' end")
    ap.add_argument("-3", "--trim3", type=int, default=0,
                    help="trim <int> bases from 3' end")
    ap.add_argument("-u", "--qupto", type=int, default=None,
                    help="align only the first <int> reads/pairs")
    ap.add_argument("-s", "--skip", type=int, default=0,
                    help="skip the first <int> reads/pairs")
    ap.add_argument("--nofw", action="store_true",
                    help="do not align forward version of the read")
    ap.add_argument("--norc", action="store_true",
                    help="do not align reverse-complement version")
    ap.add_argument("-a", "--all", dest="report_all", action="store_true",
                    help="report all alignments")
    ap.add_argument("--repeat", action="store_true",
                    help="report repetitive reads against the repeat index "
                         "(<index>.rep.*, built by hisat2-tpu-repeat)")
    ap.add_argument("--rg-id", default=None)
    ap.add_argument("--rg", action="append", default=[])
    ap.add_argument("--un", default=None, help="write unaligned reads here")
    ap.add_argument("--al", default=None, help="write aligned reads here")
    ap.add_argument("--un-conc", default=None,
                    help="write pairs that fail to align concordantly")
    ap.add_argument("--al-conc", default=None,
                    help="write concordantly-aligned pairs")
    # scoring options (reference function-valued options, simple_func.h)
    ap.add_argument("--score-min", default=None,
                    help="min score function, e.g. L,0,-0.2")
    ap.add_argument("--n-ceil", default=None, help="max Ns function")
    ap.add_argument("--mp", default=None, help="MX,MN mismatch penalties")
    ap.add_argument("--sp", default=None, help="MX,MN soft-clip penalties")
    ap.add_argument("--no-softclip", action="store_true")
    ap.add_argument("--np", dest="n_pen", type=int, default=None)
    ap.add_argument("--rdg", default=None, help="read gap open,extend")
    ap.add_argument("--rfg", default=None, help="ref gap open,extend")
    ap.add_argument("--pen-cansplice", type=int, default=None)
    ap.add_argument("--pen-noncansplice", type=int, default=None)
    # presets (accepted for compatibility; sensitivity knobs map to
    # candidate budgets)
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--sensitive", action="store_true")
    ap.add_argument("--very-sensitive", action="store_true")
    ap.add_argument("-N", type=int, default=None, metavar="MM",
                    help="seed mismatches (policy SEED=, presets.cpp)")
    ap.add_argument("-L", type=int, default=None, metavar="LEN",
                    help="seed length (policy SEEDLEN=)")
    ap.add_argument("-i", default=None, metavar="F,C,M",
                    help="seed interval function (policy IVAL=)")
    ap.add_argument("-D", type=int, default=None, metavar="N",
                    help="DP extension budget (policy DPS=)")
    ap.add_argument("-R", type=int, default=None, metavar="N",
                    help="re-seeding rounds (policy ROUNDS=)")
    ap.add_argument("--policy", default=None, metavar="STR",
                    help="raw semicolon policy string "
                         "(SEED=..;DPS=..;IVAL=.., presets.cpp:30-88)")
    ap.add_argument("--batch-size", type=int, default=2048,
                    help="reads per device batch")
    ap.add_argument("-p", "--threads", type=int, default=1,
                    help="accepted for compatibility (device batching)")
    ap.add_argument("-t", "--time", action="store_true")
    ap.add_argument("--met", type=float, default=1.0,
                    help="metrics emission interval (seconds)")
    ap.add_argument("--met-file", default=None)
    ap.add_argument("--met-stderr", action="store_true")
    ap.add_argument("--summary-file", default=None)
    ap.add_argument("--new-summary", action="store_true")
    ap.add_argument("--quiet", action="store_true")
    return ap


def _enable_compile_cache():
    """Persistent XLA compilation cache: alignment kernels recompile per
    (batch, read-length) shape; cache them across runs."""
    import os
    import jax
    try:
        d = os.path.expanduser("~/.cache/hisat2_tpu_jax")
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def main(argv=None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    # -A <file>: one invocation per line (reference hisat2_main.cpp:55-77)
    if argv and argv[0] in ("-A", "--arg-file") and len(argv) >= 2:
        import shlex
        rc = 0
        for line in open(argv[1]):
            line = line.strip()
            if line and not line.startswith("#"):
                rc |= main(shlex.split(line))
        return rc
    args = build_argparser().parse_args(argv)
    if args.sra_acc:
        # reference parity: binaries built without USE_SRA reject the
        # flag the same way (Makefile:110-118 compile-time gate)
        print("hisat2-tpu: --sra-acc requires the NCBI NGS/VDB SDK, which "
              "is not available in this build. Fetch the accession with "
              "prefetch/fasterq-dump and pass the FASTQ files instead.",
              file=sys.stderr)
        return 2
    _enable_compile_cache()
    from ..align.pipeline import Aligner, AlignerOpts, results_to_sam
    from ..align.paired import align_pairs, pairs_to_sam
    from ..align.scoring import Scoring
    from ..index.fm_index import FMIndex
    from ..io import sam as samio
    from ..io.reads import read_reads, read_tab6, batch_iter, batchify

    # quality scale (pat.h:96 PatternParams): one decode mode for all
    # readers
    qscale = ("int" if args.int_quals else
              "solexa" if args.solexa_quals else
              "phred64" if args.phred64 else "phred33")
    args.phred64 = qscale if qscale != "phred33" else False
    t0 = time.time()
    import os as _os0
    idx_pref = args.index
    if (not _os0.path.exists(idx_pref + ".meta.json")
            and not _os0.path.exists(idx_pref + ".1.ht2")
            and _os0.environ.get("HISAT2_INDEXES")):
        cand = _os0.path.join(_os0.environ["HISAT2_INDEXES"], idx_pref)
        if (_os0.path.exists(cand + ".meta.json")
                or _os0.path.exists(cand + ".1.ht2")):
            idx_pref = cand
    args.index = idx_pref
    sharded = None
    if _os0.path.exists(idx_pref + ".sharded.json"):
        # genome-sharded index (>2^31-bp references; reference .ht2l role)
        from ..index.sharded import ShardedIndex
        sharded = ShardedIndex.load(idx_pref)
        fm = type("_R", (), {})()      # name/ref carrier for the writer
        fm.ref = sharded.ref
        fm.known_ss = sharded.known_ss
        fm.known_exons = sharded.known_exons
    else:
        fm = FMIndex.load(args.index)
    if args.remove_chrname:
        fm.ref.names = [n[3:] if n.startswith("chr") else n
                        for n in fm.ref.names]
    elif args.add_chrname:
        fm.ref.names = [n if n.startswith("chr") else "chr" + n
                        for n in fm.ref.names]
    rep_aligner = None
    # repeat machinery activates automatically when a repeat index exists
    # next to the genome index (reference hisat2.cpp:3833-3901 loads
    # <idx>.rep.*.ht2 when present); --repeat switches REPORTING to
    # repeat-pseudo-reference coordinates
    import os as _os
    rep_base = args.index
    if _os.path.exists(rep_base + ".rep.npz"):
        from ..align.pipeline import RepeatAligner
        from ..index.repeats import RepeatDB
        rep_fm = FMIndex.load(rep_base + ".rep")
        rep_db = RepeatDB.load(rep_base, fm.ref)
        rep_aligner = RepeatAligner(rep_fm, rep_db)
        rep_aligner.report_repeat_coords = bool(args.repeat)
        kpath = rep_base + ".rep.kmer.npy"
        if _os.path.exists(kpath):
            import numpy as _np
            rep_aligner.kmer_table = _np.load(kpath)
        else:
            rep_aligner.kmer_table = None
        if not args.quiet:
            print(f"  repeat index: {len(rep_db.repeats)} repeats"
                  + ("" if rep_aligner.kmer_table is None else
                     f", {rep_aligner.kmer_table.size} classifier kmers"),
                  file=sys.stderr)
    elif args.repeat:
        print(f"warning: --repeat but {rep_base}.rep.npz not found",
              file=sys.stderr)
    from ..align.scoring import SimpleFunc
    from dataclasses import replace as _dc_replace
    sc = Scoring()
    kw = {}
    if args.score_min:
        kw["score_min"] = SimpleFunc.parse(args.score_min)
    if args.n_ceil:
        kw["n_ceil"] = SimpleFunc.parse(args.n_ceil)
    if args.mp:
        mx, mn = (int(x) for x in args.mp.split(","))
        kw["mm_pen_max"], kw["mm_pen_min"] = mx, mn
    if args.sp:
        mx, mn = (int(x) for x in args.sp.split(","))
        kw["sc_pen_max"], kw["sc_pen_min"] = mx, mn
    if args.no_softclip:
        kw["no_softclip"] = True
    if args.n_pen is not None:
        kw["n_pen"] = args.n_pen
    if args.rdg:
        o_, e_ = (int(x) for x in args.rdg.split(","))
        kw["read_gap_const"], kw["read_gap_linear"] = o_, e_
    if args.rfg:
        o_, e_ = (int(x) for x in args.rfg.split(","))
        kw["ref_gap_const"], kw["ref_gap_linear"] = o_, e_
    if args.pen_cansplice is not None:
        kw["canonical_splice_pen"] = args.pen_cansplice
    if args.pen_noncansplice is not None:
        kw["noncanonical_splice_pen"] = args.pen_noncansplice
    if kw:
        sc = _dc_replace(sc, **kw)

    if args.report_all:
        args.khits = 1 << 16
    opts = AlignerOpts(khits=args.khits, minins=args.minins,
                       maxins=args.maxins, fr=args.orient,
                       no_mixed=args.no_mixed,
                       no_discordant=args.no_discordant,
                       spliced=not args.no_spliced_alignment,
                       min_intron=args.min_intronlen,
                       max_intron=args.max_intronlen,
                       no_temp_splicesite=args.no_temp_splicesite,
                       dta=args.dta, zs_tags=args.zs_tags,
                       nofw=args.nofw, norc=args.norc,
                       dovetail=args.dovetail, no_contain=args.no_contain,
                       no_overlap=args.no_overlap,
                       omit_sec_seq=args.omit_sec_seq, tmo=args.tmo)
    if args.fast:
        opts.max_seeds, opts.locs_per_seg, opts.top_cands = 8, 4, 8
        opts.n_seeds, opts.verify_cands = 6, 8
    elif args.very_sensitive:
        opts.max_seeds, opts.locs_per_seg, opts.top_cands = 24, 16, 24
        opts.verify_cands = 24
    # two-pass policy parse (reference hisat2.cpp:1800): presets first,
    # then explicit seed-policy flags append and override
    polstr = ""
    from ..align.policy import apply_policy, PRESETS
    if args.very_sensitive:
        polstr = PRESETS["very-sensitive"]
    elif args.sensitive:
        polstr = PRESETS["sensitive"]
    elif args.fast:
        polstr = PRESETS["fast"]
    if args.N is not None:
        polstr += f";SEED={args.N}"
    if args.L is not None:
        polstr += f";SEEDLEN={args.L}"
    if args.i is not None:
        polstr += f";IVAL={args.i}"
    if args.D is not None:
        polstr += f";DPS={args.D}"
    if args.R is not None:
        polstr += f";ROUNDS={args.R}"
    if args.policy:
        polstr += ";" + args.policy
    if polstr.strip(";"):
        sc = apply_policy(polstr, opts, sc)
    if sharded is not None:
        from ..align.sharded import ShardedAligner
        if args.repeat or (args.tmo and args.no_spliced_alignment):
            print("hisat2-tpu: sharded indexes currently support -U / "
                  "-1 -2 / --12 input (spliced or not) with --un/--al/"
                  "--un-conc/--al-conc/--tmo; no --repeat output yet",
                  file=sys.stderr)
            return 2
        sal = ShardedAligner(sharded, sc, opts)
        al = sal.host
    else:
        sal = None
        al = Aligner(fm, sc, opts)
    # splice sites baked into a transcriptome-aware index (--ss at build)
    ks = getattr(fm, "known_ss", None)
    if ks is not None and getattr(ks, "size", 0):
        for jl, jr, strand in ks:
            al.ssdb.add_known(int(jl), int(jr),
                              "+" if strand > 0 else ("-" if strand < 0 else "."))
    for p in (args.known_splicesite_infile, args.novel_splicesite_infile):
        if p:
            n = al.ssdb.load_ss_file(p, fm.ref)
            if not args.quiet:
                print(f"  loaded {n} splice sites from {p}", file=sys.stderr)

    out = open(args.output, "w") if args.output else sys.stdout
    rg_line = None
    if args.rg_id:
        rg_line = "ID:" + args.rg_id
        for rg in args.rg:
            rg_line += "\t" + rg
    hdr_names = list(fm.ref.names)
    hdr_lens = [int(x) for x in fm.ref.tlens]
    if rep_aligner is not None:
        # repeat pseudo-references join the header (reference printHeader
        # includes repeat refs, sam.h:446)
        for rpt in rep_aligner.db.repeats:
            hdr_names.append(rpt.name)
            hdr_lens.append(len(rpt))
    writer = samio.SamWriter(
        out, hdr_names, hdr_lens,
        prog_args=" ".join(argv or sys.argv[1:]),
        rg_line=rg_line, no_head=args.no_head, reorder=args.reorder)

    fmt = ("fasta" if args.fasta else "raw" if args.raw
           else "qseq" if args.qseq else "fastq" if args.fastq else None)
    msink = None
    if args.met_file or args.met_stderr:
        from ..utils.metrics import MetricsSink
        msink = MetricsSink(al.metrics, args.met_file, args.met_stderr,
                            args.met)
    totals: dict[str, int] = {}

    def merge(s):
        for k, v in s.items():
            totals[k] = totals.get(k, 0) + v

    un_fh = open(args.un, "w") if args.un else None
    al_fh = open(args.al, "w") if args.al else None

    def write_unal_al(batch, results):
        """--un/--al outputs (the reference Perl wrapper's role)."""
        if un_fh is None and al_fh is None:
            return
        from ..utils import alphabet as _alpha
        for i, res in enumerate(results):
            fh = al_fh if res.aligned else un_fh
            if fh is None:
                continue
            ln = int(batch.lens[i])
            s = _alpha.decode(batch.seqs[i, :ln])
            q = (batch.quals[i, :ln].astype("uint8") + 33).tobytes().decode()
            fh.write(f"@{batch.names[i]}\n{s}\n+\n{q}\n")

    nreads = 0
    if args.unpaired or args.tab6:
        if args.tab6:
            def stream_tab6():
                for r1, r2 in itertools.chain(*[read_tab6(p, args.phred64)
                                                for p in args.tab6.split(",")]):
                    yield r1
                    yield r2
            stream = stream_tab6()
        elif args.cmdline:
            from ..io.reads import reads_from_cmdline
            stream = reads_from_cmdline(args.unpaired)
        elif args.fasta_cont:
            from ..io.reads import read_fasta_continuous
            kv = dict(p.split(":") for p in args.fasta_cont.split(","))
            stream = itertools.chain(*[
                read_fasta_continuous(p, int(kv.get("k", 32)),
                                      int(kv.get("i", 1)))
                for p in args.unpaired.split(",")])
        else:
            readers = [read_reads(p, fmt, args.phred64)
                       for p in args.unpaired.split(",")]
            stream = itertools.chain(*readers)
        from ..align.emit import align_and_emit, align_and_emit_stream
        stream = _reindex(stream, args.skip, args.qupto, args.trim5,
                          args.trim3, args.ignore_quals, args.qc_filter)
        if sal is not None:
            # sharded genome: shards stream through HBM per batch GROUP
            # (bounded read buffering), global-coordinate merge + emit.
            # --un/--al capture primary records off the emitted text in
            # read order (each read contributes exactly one primary).
            group: list = []

            def _emit_group(group):
                if un_fh is None and al_fh is None:
                    merge(sal.align_and_emit(group, writer))
                    return
                from ..align.emit import _TextShim
                shim = _TextShim()
                merge(sal.align_and_emit(group, shim))
                text = shim.out.getvalue()
                writer.out.write(text)
                flags = [int(ln.split("\t", 2)[1])
                         for ln in text.splitlines()
                         if ln and not ln.startswith("@")]
                prim = [f for f in flags if not f & 256]
                k = 0
                from ..utils import alphabet as _alpha
                for b in group:
                    for i in range(len(b)):
                        aligned = k < len(prim) and not (prim[k] & 4)
                        k += 1
                        fh = al_fh if aligned else un_fh
                        if fh is None:
                            continue
                        ln2 = int(b.lens[i])
                        sq = _alpha.decode(b.seqs[i, :ln2])
                        q = (b.quals[i, :ln2].astype("uint8")
                             + 33).tobytes().decode()
                        fh.write(f"@{b.names[i]}\n{sq}\n+\n{q}\n")

            for batch in batch_iter(stream, args.batch_size):
                group.append(batch)
                if len(group) >= 32:
                    _emit_group(group)
                    nreads += sum(len(b) for b in group)
                    group = []
            if group:
                _emit_group(group)
                nreads += sum(len(b) for b in group)
        elif args.un or args.al or rep_aligner is not None:
            for batch in batch_iter(stream, args.batch_size):
                results = al.align_batch(batch)
                if rep_aligner is not None:
                    _repeat_pass(rep_aligner, batch, results, al, args.khits)
                merge(results_to_sam(batch, results, al, writer))
                write_unal_al(batch, results)
                nreads += len(batch)
                if msink:
                    al.metrics.pairs = totals.get("pairs", 0)
                    al.metrics.conc_uniq = totals.get("conc_uniq", 0)
                    al.metrics.conc_multi = totals.get("conc_multi", 0)
                    al.metrics.disc = totals.get("disc", 0)
                    al.metrics.mixed_al = totals.get("mixed_al", 0)
                    al.metrics.aligned = (totals.get("uniq", 0)
                                          + totals.get("multi", 0))
                    al.metrics.unaligned = totals.get("unal", 0)
                    al.metrics.multi = totals.get("multi", 0)
                    msink.tick()
        else:
            # pipelined: batch k+1 dispatches before batch k's results
            # come back (device compute overlaps tunnel transfers)
            nb = 0

            def _tick(batch, st):
                nonlocal nreads, nb
                merge(st)
                nreads += len(batch)
                nb += 1
                if msink:
                    al.metrics.pairs = totals.get("pairs", 0)
                    al.metrics.conc_uniq = totals.get("conc_uniq", 0)
                    al.metrics.conc_multi = totals.get("conc_multi", 0)
                    al.metrics.disc = totals.get("disc", 0)
                    al.metrics.mixed_al = totals.get("mixed_al", 0)
                    al.metrics.aligned = (totals.get("uniq", 0)
                                          + totals.get("multi", 0))
                    al.metrics.unaligned = totals.get("unal", 0)
                    al.metrics.multi = totals.get("multi", 0)
                    msink.tick()

            align_and_emit_stream(al, batch_iter(stream, args.batch_size),
                                  writer, on_batch=_tick)
    elif args.m1 and args.m2:
        r1s = itertools.chain(*[read_reads(p, fmt, args.phred64)
                                for p in args.m1.split(",")])
        r2s = itertools.chain(*[read_reads(p, fmt, args.phred64)
                                for p in args.m2.split(",")])
        buf1, buf2 = [], []
        rdid = 0
        # -s/-u count pairs; -5/-3/--ignore-quals apply to both mates
        pairs = _reindex_pairs(zip(r1s, r2s), args.skip, args.qupto,
                               args.trim5, args.trim3, args.ignore_quals)
        if sal is not None:
            # sharded genome: shards stream through HBM per pair-batch
            # GROUP, global-coordinate PE merge + emit
            group: list = []

            def _flush_pair_group():
                nonlocal nreads, group
                if not group:
                    return
                try:
                    if args.un_conc or args.al_conc:
                        # classify pairs off the emitted YT:Z codes
                        # (primary mate-1 record per pair, pair order)
                        from ..align.emit import _TextShim
                        shim = _TextShim()
                        merge(sal.align_and_emit_pe(group, shim))
                        text = shim.out.getvalue()
                        writer.out.write(text)
                        kinds = []
                        for ln in text.splitlines():
                            f = ln.split("\t")
                            flag = int(f[1])
                            if flag & 256 or not (flag & 64 or flag & 4):
                                continue
                            if flag & 128 and not (flag & 64):
                                continue
                            kinds.append("concordant" if "YT:Z:CP" in ln
                                         else "other")
                        k = 0
                        from types import SimpleNamespace
                        for gb1, gb2 in group:
                            n = len(gb1)
                            prs = [SimpleNamespace(
                                kind=kinds[k + i]
                                if k + i < len(kinds) else "other")
                                for i in range(n)]
                            k += n
                            _write_conc(args, gb1, gb2, prs)
                    else:
                        merge(sal.align_and_emit_pe(group, writer))
                except ValueError as e:
                    print(f"hisat2-tpu: {e}", file=sys.stderr)
                    raise SystemExit(2)
                nreads += sum(2 * len(x[0]) for x in group)
                group = []

            for a, b in pairs:
                a.rdid = b.rdid = rdid
                rdid += 1
                buf1.append(a)
                buf2.append(b)
                if len(buf1) == args.batch_size:
                    group.append(_pad_pair(buf1, buf2, batchify))
                    buf1, buf2 = [], []
                    if len(group) >= 32:
                        _flush_pair_group()
            if buf1:
                group.append(_pad_pair(buf1, buf2, batchify))
            _flush_pair_group()
        elif args.un_conc or args.al_conc:
            for a, b in pairs:
                a.rdid = b.rdid = rdid
                rdid += 1
                buf1.append(a)
                buf2.append(b)
                if len(buf1) == args.batch_size:
                    _run_pair_batch(al, buf1, buf2, writer, merge,
                                    pairs_to_sam, batchify, align_pairs,
                                    args)
                    nreads += 2 * len(buf1)
                    buf1, buf2 = [], []
            if buf1:
                _run_pair_batch(al, buf1, buf2, writer, merge, pairs_to_sam,
                                batchify, align_pairs, args)
                nreads += 2 * len(buf1)
        else:
            # pipelined packed PE stream
            from ..align.emit import align_and_emit_pe_stream

            def pair_batches():
                nonlocal rdid
                bb1, bb2 = [], []
                for a, b in pairs:
                    a.rdid = b.rdid = rdid
                    rdid += 1
                    bb1.append(a)
                    bb2.append(b)
                    if len(bb1) == args.batch_size:
                        yield _pad_pair(bb1, bb2, batchify)
                        bb1, bb2 = [], []
                if bb1:
                    yield _pad_pair(bb1, bb2, batchify)

            def _tick(bb, st):
                nonlocal nreads
                merge(st)
                nreads += 2 * len(bb[0])

            align_and_emit_pe_stream(al, pair_batches(), writer,
                                     on_batch=_tick)
    else:
        print("error: provide -U or both -1 and -2", file=sys.stderr)
        return 1

    writer.flush()
    for _fh1, _fh2 in _conc_fhs.values():
        _fh1.close()
        _fh2.close()
    _conc_fhs.clear()
    if msink:
        msink.close()
    if args.novel_splicesite_outfile:
        al.ssdb.write_novel(args.novel_splicesite_outfile, fm.ref)
    for fh in (un_fh, al_fh):
        if fh:
            fh.close()
    if out is not sys.stdout:
        out.close()
    _print_summary(args, totals, nreads, time.time() - t0)
    return 0


def _reindex(stream, skip=0, upto=None, trim5=0, trim3=0,
             ignore_quals=False, qc_filter=False):
    """rdid assignment + -s/-u/-5/-3/--ignore-quals preprocessing."""
    import numpy as np
    n = 0
    for rdid, r in enumerate(stream):
        if rdid < skip:
            continue
        if upto is not None and n >= upto:
            return
        if trim5 or trim3:
            end = len(r.seq) - trim3
            r.seq = r.seq[trim5:end]
            if r.qual is not None:
                r.qual = r.qual[trim5:end]
        if ignore_quals and r.qual is not None:
            r.qual = np.full(len(r.seq), 30, r.qual.dtype)
        if qc_filter and not getattr(r, "qc_ok", True):
            # --qc-filter: QSEQ filter field 0 -> treat as length-0 read
            # (emitted unaligned with YF, reference qc-filter semantics)
            r.seq = r.seq[:0]
            if r.qual is not None:
                r.qual = r.qual[:0]
        r.rdid = rdid - skip
        n += 1
        yield r


def _reindex_pairs(pair_stream, skip=0, upto=None, trim5=0, trim3=0,
                   ignore_quals=False):
    """-s/-u/-5/-3/--ignore-quals preprocessing for paired input (counts
    are per PAIR; trims apply to both mates — hisat2.cpp option
    semantics; round-1 only applied these to -U input)."""
    import numpy as np
    n = 0
    for pid, (a, b) in enumerate(pair_stream):
        if pid < skip:
            continue
        if upto is not None and n >= upto:
            return
        for r in (a, b):
            if trim5 or trim3:
                end = len(r.seq) - trim3
                r.seq = r.seq[trim5:end]
                if r.qual is not None:
                    r.qual = r.qual[trim5:end]
            if ignore_quals and r.qual is not None:
                r.qual = np.full(len(r.seq), 30, r.qual.dtype)
        n += 1
        yield a, b


def _pad_pair(buf1, buf2, batchify):
    L = max(max(len(r) for r in buf1), max(len(r) for r in buf2))
    L = max(8, -(-L // 8) * 8)
    return batchify(buf1, pad_to=L), batchify(buf2, pad_to=L)


def _run_pair_batch(al, buf1, buf2, writer, merge, pairs_to_sam, batchify,
                    align_pairs, args=None):
    L = max(max(len(r) for r in buf1), max(len(r) for r in buf2))
    L = max(8, -(-L // 8) * 8)
    b1 = batchify(buf1, pad_to=L)
    b2 = batchify(buf2, pad_to=L)
    if args is not None and (args.un_conc or args.al_conc):
        results = align_pairs(al, b1, b2)
        merge(pairs_to_sam(b1, b2, results, al, writer))
        _write_conc(args, b1, b2, results)
    else:
        from ..align.emit import align_and_emit_pe
        merge(align_and_emit_pe(al, b1, b2, writer))


def _repeat_pass(rep_aligner, batch, results, al=None, khits: int = 5):
    """Repeat-index pass inside the normal path (reference
    hi_aligner.h:4151-4161 + 4274-4282): candidate reads — classified
    repetitive by the minimizer table when one exists, otherwise
    multimapped/failed — are placed once on the repeat index.

    Reporting: with --repeat (report_repeat_coords), a repeat-space
    record with NH = genomic placement count; otherwise (default) the
    placements expand to up to `khits` GENOMIC records, each re-finalized
    against its own genome copy."""
    import numpy as np
    from ..io.reads import batchify
    from ..align.pipeline import Alignment, ReadResult

    ktab = getattr(rep_aligner, "kmer_table", None)
    if ktab is not None and ktab.size:
        from ..index.repeats import classify_repetitive
        rep_mask = classify_repetitive(batch.seqs, batch.lens, ktab)
        cand = [i for i in np.flatnonzero(rep_mask)
                if (not results[i].aligned) or len(results[i].alns) > 1
                or (results[i].secbest is not None
                    and results[i].secbest == results[i].best)]
    else:
        cand = [i for i, r in enumerate(results)
                if (not r.aligned) or len(r.alns) > 1
                or (r.secbest is not None and r.secbest == r.best)]
    if not cand:
        return
    sub = batchify([batch.reads[i] for i in cand],
                   pad_to=batch.seqs.shape[1])
    rep_out = rep_aligner.align_repeats(sub)
    report_rep = getattr(rep_aligner, "report_repeat_coords", True)
    for k, i in enumerate(cand):
        ro = rep_out[k]
        if ro is None:
            continue
        name, off, fw, score, placements = ro
        if results[i].aligned and score < results[i].best:
            continue
        if report_rep or al is None:
            a = Alignment(joined_pos=off, fw=fw, score=score,
                          cigar=[("M", int(sub.lens[k]))],
                          md=str(int(sub.lens[k])), tidx=0, toff=off)
            a.rname_override = name
            a.nh_override = max(len(placements), 1)
            results[i] = ReadResult(alns=[a], best=score, secbest=None)
            continue
        # default mode: expand to genomic records (ht2_repeat_expand
        # contract), re-finalizing each placement against its own copy
        alns = []
        for tidx, strand, pos in placements[:khits]:
            jp = al.fm.ref.text_to_joined(tidx, pos)
            if jp is None:
                continue
            gfw = bool(fw) == (strand == 0)
            a = al._finalize(i, batch, score, jp, gfw, False,
                             int(batch.lens[i]))
            if a is not None:
                a.nh_override = len(placements)
                alns.append(a)
        if alns:
            results[i] = ReadResult(alns=alns, best=alns[0].score,
                                    secbest=alns[1].score
                                    if len(alns) > 1 else None)


_conc_fhs = {}


def _write_conc(args, b1, b2, results):
    """--un-conc/--al-conc: FASTQ pairs by concordant outcome (the
    reference Perl wrapper's role). <base>.1/.2 suffix convention."""
    from ..utils import alphabet

    def fhs(base):
        if base not in _conc_fhs:
            if "%" in base:
                p1, p2 = base.replace("%", "1"), base.replace("%", "2")
            else:
                root, dot, ext = base.rpartition(".")
                if dot:
                    p1, p2 = f"{root}.1.{ext}", f"{root}.2.{ext}"
                else:
                    p1, p2 = base + ".1", base + ".2"
            _conc_fhs[base] = (open(p1, "w"), open(p2, "w"))
        return _conc_fhs[base]

    for i, pr in enumerate(results):
        base = args.al_conc if pr.kind == "concordant" else args.un_conc
        if not base:
            continue
        f1, f2 = fhs(base)
        for fh, b in ((f1, b1), (f2, b2)):
            ln = int(b.lens[i])
            s = alphabet.decode(b.seqs[i, :ln])
            q = (b.quals[i, :ln].astype("uint8") + 33).tobytes().decode()
            fh.write(f"@{b.names[i]}\n{s}\n+\n{q}\n")


def _print_summary(args, t, nreads, dt):
    """Alignment summary in the reference's stderr format
    (MANUAL.markdown:174-206; --new-summary machine-readable form)."""
    dest = open(args.summary_file, "w") if args.summary_file else sys.stderr
    if args.quiet and not args.summary_file:
        return
    w = dest.write
    if args.new_summary:
        # machine-readable summary (reference --new-summary,
        # MANUAL.markdown --summary-file section)
        w("HISAT2-TPU summary stats:\n")
        if "pairs" in t:
            n = t.get("pairs", 0) or 1
            conc = t.get("conc_uniq", 0) + t.get("conc_multi", 0)
            w(f"\tTotal pairs: {t.get('pairs',0)}\n")
            w(f"\tAligned concordantly 0 time: {t.get('pairs',0)-conc} "
              f"({(t.get('pairs',0)-conc)/n*100:.2f}%)\n")
            w(f"\tAligned concordantly 1 time: {t.get('conc_uniq',0)} "
              f"({t.get('conc_uniq',0)/n*100:.2f}%)\n")
            w(f"\tAligned concordantly >1 times: {t.get('conc_multi',0)} "
              f"({t.get('conc_multi',0)/n*100:.2f}%)\n")
            w(f"\tAligned discordantly 1 time: {t.get('disc',0)} "
              f"({t.get('disc',0)/n*100:.2f}%)\n")
            w(f"\tOverall alignment rate: "
              f"{t.get('mates_al',0)/(2*n)*100:.2f}%\n")
        else:
            n = t.get("reads", 0) or 1
            w(f"\tTotal reads: {t.get('reads',0)}\n")
            w(f"\tAligned 0 time: {t.get('unal',0)} "
              f"({t.get('unal',0)/n*100:.2f}%)\n")
            w(f"\tAligned 1 time: {t.get('uniq',0)} "
              f"({t.get('uniq',0)/n*100:.2f}%)\n")
            w(f"\tAligned >1 times: {t.get('multi',0)} "
              f"({t.get('multi',0)/n*100:.2f}%)\n")
            w(f"\tOverall alignment rate: "
              f"{(n-t.get('unal',0))/n*100:.2f}%\n")
        if args.time:
            w(f"\tTime: {dt:.2f}s\n")
        if args.summary_file:
            dest.close()
        return
    if "pairs" in t:
        # exact reference stderr layout (MANUAL.markdown:174-206)
        n = t.get("pairs", 0) or 1
        conc = t.get("conc_uniq", 0) + t.get("conc_multi", 0)
        nc = t.get("pairs", 0) - conc
        disc = t.get("disc", 0)
        nboth = nc - disc
        mates = 2 * max(nboth, 0) or 1
        w(f"{t.get('pairs',0)} reads; of these:\n")
        w(f"  {t.get('pairs',0)} ({100.0:.2f}%) were paired; of these:\n")
        w(f"    {nc} ({nc/n*100:.2f}%) aligned concordantly 0 times\n")
        w(f"    {t.get('conc_uniq',0)} ({t.get('conc_uniq',0)/n*100:.2f}%)"
          f" aligned concordantly exactly 1 time\n")
        w(f"    {t.get('conc_multi',0)} ({t.get('conc_multi',0)/n*100:.2f}%)"
          f" aligned concordantly >1 times\n")
        w("    ----\n")
        w(f"    {nc} pairs aligned concordantly 0 times; of these:\n")
        w(f"      {disc} ({(disc/nc*100) if nc else 0.0:.2f}%)"
          f" aligned discordantly 1 time\n")
        w("    ----\n")
        w(f"    {nboth} pairs aligned 0 times concordantly or discordantly;"
          f" of these:\n")
        w(f"      {2*nboth} mates make up the pairs; of these:\n")
        w(f"        {t.get('mate_un',0)} ({t.get('mate_un',0)/mates*100:.2f}%)"
          f" aligned 0 times\n")
        w(f"        {t.get('mate_uniq',0)} "
          f"({t.get('mate_uniq',0)/mates*100:.2f}%) aligned exactly 1 time\n")
        w(f"        {t.get('mate_multi',0)} "
          f"({t.get('mate_multi',0)/mates*100:.2f}%) aligned >1 times\n")
        denom = 2 * n
        w(f"{t.get('mates_al',0)/denom*100:.2f}% overall alignment rate\n")
    else:
        n = t.get("reads", 0) or 1
        w(f"{t.get('reads',0)} reads; of these:\n")
        w(f"  {t.get('reads',0)} (100.00%) were unpaired; of these:\n")
        w(f"    {t.get('unal',0)} ({t.get('unal',0)/n*100:.2f}%) aligned 0 times\n")
        w(f"    {t.get('uniq',0)} ({t.get('uniq',0)/n*100:.2f}%) aligned exactly 1 time\n")
        w(f"    {t.get('multi',0)} ({t.get('multi',0)/n*100:.2f}%) aligned >1 times\n")
        w(f"{(n-t.get('unal',0))/n*100:.2f}% overall alignment rate\n")
    if args.time:
        w(f"Time: {dt:.2f}s\n")
    if args.summary_file:
        dest.close()


if __name__ == "__main__":
    sys.exit(main())
