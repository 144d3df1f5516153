"""Native (C++) host-side components, built on demand with g++ and loaded
via ctypes (no pybind dependency):

  sais.cpp     — linear-time SA-IS suffix array construction
  samfmt.cpp   — batched SAM record formatting

The reference's equivalents are its C++ blockwise_sa/multikey_qsort stack
and sam.h record assembly; here C++ covers exactly the host-side hotspots
the Python/JAX pipeline can't vectorize.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig

_DIR = os.path.dirname(os.path.abspath(__file__))
_CACHE = os.path.join(os.path.expanduser("~"), ".cache", "hisat2_tpu_native")


def _build(name: str, src: str) -> str | None:
    """Compile <src>.cpp to a cached .so; returns path or None."""
    os.makedirs(_CACHE, exist_ok=True)
    src_path = os.path.join(_DIR, src)
    so_path = os.path.join(_CACHE, name + ".so")
    if (os.path.exists(so_path)
            and os.path.getmtime(so_path) >= os.path.getmtime(src_path)):
        return so_path
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-pthread",
             "-shared", "-fPIC", "-o", so_path, src_path],
            check=True, capture_output=True, timeout=300)
        return so_path
    except Exception:
        return None


_libs: dict[str, ctypes.CDLL | None] = {}


def load(name: str, src: str) -> ctypes.CDLL | None:
    if name not in _libs:
        path = _build(name, src)
        _libs[name] = ctypes.CDLL(path) if path else None
    return _libs[name]


def samfmt_lib() -> ctypes.CDLL | None:
    lib = load("samfmt", "samfmt.cpp")
    if lib is not None and not getattr(lib, "_configured", False):
        import numpy as np
        from numpy.ctypeslib import ndpointer
        i32 = ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64 = ndpointer(np.int64, flags="C_CONTIGUOUS")
        u8 = ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.format_se_batch.restype = ctypes.c_int64
        lib.format_se_batch.argtypes = [
            ctypes.c_int32,
            i32, i32, i32, i32,          # flag rname pos1 mapq
            i32, i32, i32,               # c5 mid c3
            i32, i32, i32, i32, i32,     # score nmm nm zs nh
            u8, i64,                     # name buf/off
            u8, u8, i64,                 # seq qual off
            i32, u8, i64,                # mm cols/ref/off
            u8, i64,                     # refname buf/off
            ctypes.c_char_p, i64]        # out, rec_ends
        lib.format_pe_batch.restype = ctypes.c_int64
        lib.format_pe_batch.argtypes = [
            ctypes.c_int32,
            i32, i32,                    # read_of flag
            i32, i32, i32,               # rname pos1 mapq
            i32, i32, i32,               # c5 mid c3
            i32, i32, i32,               # pnext tlen yt_code
            i32, i32, i32, i32, i32,     # score nmm nm zs nh
            u8, i64,                     # name buf/off (per read)
            u8, u8, u8, u8, i64,         # seq_f qual_f seq_r qual_r off
            i32, u8, i64,                # mm cols/ref/off (per record)
            u8, i64,                     # refname buf/off
            ctypes.c_char_p, ctypes.c_int64, i64,  # out, cap, rec_ends
            i32, i32, i32]               # m1, gapN, xs (spliced records)
        lib.format_se_batch2.restype = ctypes.c_int64
        lib.format_se_batch2.argtypes = [
            ctypes.c_int32,
            i32, i32,                    # read_of flag
            i32, i32, i32,               # rname pos1 mapq
            i32, i32, i32,               # c5 mid c3
            i32, i32, i32, i32, i32,     # score nmm nm zs nh
            u8, i64,                     # name buf/off (per read)
            u8, u8, u8, u8, i64,         # seq_f qual_f seq_r qual_r off
            i32, u8, i64,                # mm cols/ref/off (per record)
            u8, i64,                     # refname buf/off
            ctypes.c_char_p, ctypes.c_int64, i64,  # out, cap, rec_ends
            i32, i32, i32]               # m1, gapN, xs (spliced records)
        i16 = ndpointer(np.int16, flags="C_CONTIGUOUS")
        lib.format_se_batch3.restype = ctypes.c_int64
        lib.format_se_batch3.argtypes = [
            ctypes.c_int32, ctypes.c_int32,   # nrec, nthreads
            i32, i32,                    # read_of flag
            i32, i32, i32,               # rname pos1 mapq
            i32, i32, i32,               # c5 mid c3
            i32, i32, i32, i32,          # score nmm zs nh
            i16, i32, ctypes.c_int32,    # mm lanes/cnt/stride
            u8, i64,                     # name buf/off (per fast read)
            i32, u8, u8,                 # rows, seq codes, quals
            ctypes.c_int32, ctypes.c_int64, i32,   # qconst, Lp, lens
            u8, i64,                     # refname buf/off
            ctypes.c_char_p, ctypes.c_int64, i64,  # out, cap, rec_ends
            i32, i32, i32]               # m1, gapN, xs
        u32 = ndpointer(np.uint32, flags="C_CONTIGUOUS")
        lib.pack_reads_2bit.restype = ctypes.c_int32
        lib.pack_reads_2bit.argtypes = [
            ctypes.c_int32, ctypes.c_int64, ctypes.c_int32,  # B, L, nthreads
            u8, u8, i64,                 # seqs, quals, lens
            u32, u32]                    # seq_words, n_words
        lib.finish_se_native.restype = ctypes.c_int64
        lib.finish_se_native.argtypes = [
            ctypes.c_int32, ctypes.c_int64, ctypes.c_int32,  # B, Lp, nthreads
            i16, ctypes.c_int32, ctypes.c_int32,  # fp, fpw, KFB
            i32, i16, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # tier0
            i32, i16, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # tier1
            u8, u8, ctypes.c_int32,      # seq codes, quals, qconst
            i64, u8,                     # lens, yf_qc
            i64, i64, i64, i32, ctypes.c_int32,  # frag tables, nfrag
            u8, i64,                     # refname buf/off
            u8, i64,                     # name buf/off (per batch row)
            ctypes.c_double, ctypes.c_double,    # min I/S
            ctypes.c_double, ctypes.c_double,    # nceil I/S
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            # match_bonus, khits, KF, omit_sec
            u8, i64,                     # fast_out, read_end
            ctypes.c_char_p, ctypes.c_int64, i64,  # out, cap, stats
            i32, i16, i64]               # cols, mm_out, rec_ends scratch
        lib.finish_pe_native.restype = ctypes.c_int64
        lib.finish_pe_native.argtypes = [
            ctypes.c_int32, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32,              # B, Lp1, Lp2, nthreads
            i16, ctypes.c_int32, ctypes.c_int32,  # fp, fpw, NRB
            i32, i16, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            i32, i16, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            u8, u8, i64,                 # seq1, qual1, lens1
            u8, u8, i64,                 # seq2, qual2, lens2
            ctypes.c_int32,              # qconst
            i64, i64, i64, i32, ctypes.c_int32,  # frag tables, nfrag
            u8, i64,                     # refname buf/off
            u8, i64,                     # name buf/off (per pair)
            ctypes.c_double, ctypes.c_double,    # min I/S
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            # match_bonus, khits, NR, omit_sec
            u8,                          # force_slow
            u8, i64,                     # fast_out, pair_end
            ctypes.c_char_p, ctypes.c_int64, i64,  # out, cap, stats
            i32, i16, i64]               # cols, mm_out, rec_ends scratch
        lib.format_pe_mix.restype = ctypes.c_int64
        lib.format_pe_mix.argtypes = [
            ctypes.c_int32,              # nrec
            i32, i32, i32,               # pair mate flag
            i32, i32, i32,               # rname pos1 mapq
            i32, i32, i32,               # c5 mid c3
            i32, i32,                    # rnext pnext1
            i32, i32, i32, i32, i32,     # score zs nmm nh cnt
            i16, ctypes.c_int32,         # mm lanes, MMX
            u8, i64,                     # name buf/off (per pair)
            u8, u8, ctypes.c_int64, i32,  # seq1 qual1 Lp1 lens1(i32)
            u8, u8, ctypes.c_int64, i32,  # seq2 qual2 Lp2 lens2(i32)
            ctypes.c_int32,              # qconst
            u8, i64,                     # refname buf/off
            ctypes.c_char_p, ctypes.c_int64, i64]  # out, cap, rec_ends
        lib._configured = True
    return lib


def dpkernel_lib() -> ctypes.CDLL | None:
    lib = load("dpkernel", "dpkernel.cpp")
    if lib is not None and not getattr(lib, "_configured", False):
        import numpy as np
        from numpy.ctypeslib import ndpointer
        i32 = ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8 = ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.dp_traceback_one.restype = ctypes.c_int32
        lib.dp_traceback_one.argtypes = [
            u8, u8, ctypes.c_int32,            # rd qual L
            u8, ctypes.c_int32,                # ref W
            i32, i32,                          # mm_pens sc_pens
            ctypes.c_int32, ctypes.c_int32,    # match_bonus n_pen
            ctypes.c_int32, ctypes.c_int32,    # rd_open rd_ext
            ctypes.c_int32, ctypes.c_int32,    # rf_open rf_ext
            ctypes.POINTER(ctypes.c_int32),    # out_score
            ctypes.POINTER(ctypes.c_int32),    # out_ref_start
            u8, i32, ctypes.POINTER(ctypes.c_int32),   # cigar
            i32, ctypes.POINTER(ctypes.c_int32)]       # mds
        lib._configured = True
    return lib


def sais_lib() -> ctypes.CDLL | None:
    lib = load("sais", "sais.cpp")
    if lib is not None and not getattr(lib, "_configured", False):
        import numpy as np
        from numpy.ctypeslib import ndpointer
        lib.sais_u8_i32.argtypes = [
            ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int32, ctypes.c_int32]
        lib.sais_u8_i64.argtypes = [
            ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int64]
        lib.kasai_lcp_i64.restype = None
        lib.kasai_lcp_i64.argtypes = [
            ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64]
        lib._configured = True
    return lib


def kmersort_lib() -> ctypes.CDLL | None:
    lib = load("kmersort", "kmersort.cpp")
    if lib is not None and not getattr(lib, "_configured", False):
        import numpy as np
        from numpy.ctypeslib import ndpointer
        lib.kmer_table.restype = ctypes.c_int32
        lib.kmer_table.argtypes = [
            ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int32,
            ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int32, ctypes.c_int32]
        lib._configured = True
    return lib


def juncscore_lib() -> ctypes.CDLL | None:
    lib = load("juncscore", "juncscore.cpp")
    if lib is not None and not getattr(lib, "_configured", False):
        import numpy as np
        from numpy.ctypeslib import ndpointer
        i64 = ndpointer(np.int64, flags="C_CONTIGUOUS")
        i8 = ndpointer(np.int8, flags="C_CONTIGUOUS")
        u8 = ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32 = ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.junc_score_batch.restype = None
        lib.junc_score_batch.argtypes = [
            u8, ctypes.c_int64, ctypes.c_void_p,    # joined, n, overlay?
            i8, i8, i64,                            # rd q rdlens
            i64, i64, ctypes.c_int64, ctypes.c_int64,  # posA posB C L
            i64, i64, ctypes.c_int64,               # kleft kright nK
            i64, i64,                               # mm_pens sc_pens
            ctypes.c_int64, ctypes.c_int64,         # n_pen match_bonus
            ctypes.c_double, ctypes.c_double,       # smin I S
            ctypes.c_int64, ctypes.c_int32,         # max_intron dta
            ctypes.c_int64, ctypes.c_int64,         # canon/noncanon pen
            ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ndpointer(np.float64, flags="C_CONTIGUOUS"),  # donor/acceptor PWM
            i64, f32, ctypes.c_int32]               # out, out_ps, nthreads
        lib._configured = True
    return lib
