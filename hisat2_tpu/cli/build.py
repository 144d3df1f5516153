"""hisat2-build equivalent (reference hisat2_build.cpp:668 driver).

Builds the native index (<prefix>.npz + <prefix>.meta.json — the role of the
eight .ht2 files, SURVEY.md §2.2) from FASTA, optionally ingesting SNP
(--snp) files for the graph index.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="hisat2-tpu-build",
        description="Build a hisat2_tpu index from FASTA reference(s).")
    ap.add_argument("reference", help="comma-separated FASTA file(s)")
    ap.add_argument("prefix", help="output index prefix")
    ap.add_argument("--ftabchars", type=int, default=10,
                    help="ftab k-mer length (auto-shrunk for tiny refs)")
    ap.add_argument("--snp", default=None, help="SNP file (hisat2 .snp format)")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args(argv)

    from ..index.fm_index import build_fm_index
    from ..io.reference import load_reference

    t0 = time.time()
    paths = args.reference.split(",")
    ref = load_reference(paths)
    if not args.quiet:
        print(f"  joined reference: {ref.n} bp in {len(ref.names)} sequence(s)",
              file=sys.stderr)
    if args.snp:
        from ..index.graph_index import build_graph_index
        from ..io.annotations import read_snps
        snps = read_snps(args.snp, ref)
        fm = build_graph_index(ref, snps, ftab_k=args.ftabchars)
    else:
        fm = build_fm_index(ref, ftab_k=args.ftabchars)
    fm.save(args.prefix)
    if not args.quiet:
        print(f"  index written to {args.prefix}.npz "
              f"({time.time()-t0:.1f}s)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
