"""L6/L7 command-line drivers: build / align / inspect
(reference hisat2_build.cpp, hisat2.cpp, hisat2_inspect.cpp roles).

Entry points:
    python -m hisat2_tpu.cli.build    <ref.fa[,...]> <index-prefix>
    python -m hisat2_tpu.cli.align    -x <prefix> {-U r.fq | -1 a -2 b} [-S out]
    python -m hisat2_tpu.cli.inspect  <prefix>
"""
