"""Native DP traceback (native/dpkernel.cpp) must be byte-identical to the
NumPy reference implementation in ops/sw.py — score, ref_start, CIGAR, and
mismatch list, including tie-break behavior (the reference splits DP fill
from backtrace the same way, aligner_sw.cpp / aligner_bt.cpp)."""

import numpy as np
import pytest

from hisat2_tpu.align.scoring import DEFAULT_SCORING as SC
from hisat2_tpu.ops import sw as _sw


def _numpy_traceback(*args):
    orig = _sw._dp_traceback_native
    _sw._dp_traceback_native = lambda *a: None
    try:
        return _sw.dp_traceback(*args)
    finally:
        _sw._dp_traceback_native = orig


@pytest.fixture(scope="module")
def lib_ok():
    from hisat2_tpu.native import dpkernel_lib
    if dpkernel_lib() is None:
        pytest.skip("native dpkernel unavailable")


def test_native_matches_numpy_randomized(lib_ok):
    rng = np.random.default_rng(42)
    for t in range(120):
        L = int(rng.integers(12, 105))
        W = L + int(rng.integers(2, 40))
        ref = rng.integers(0, 4, W).astype(np.uint8)
        st = int(rng.integers(0, W - L + 1))
        rd = ref[st:st + L].copy()
        for _ in range(int(rng.integers(0, 7))):
            p = int(rng.integers(0, rd.size))
            r = rng.random()
            if r < 0.5:
                rd[p] = (rd[p] + rng.integers(1, 4)) % 4
            elif r < 0.7:
                rd = np.delete(rd, p)
            elif r < 0.9:
                rd = np.insert(rd, p, rng.integers(0, 4))
            else:
                rd[p] = 4
        q = rng.integers(0, 41, rd.size).astype(np.int8)
        nat = _sw._dp_traceback_native(SC, rd, q, ref)
        ref_out = _numpy_traceback(SC, rd, q, ref)
        assert nat == ref_out, f"case {t}: {nat} != {ref_out}"


def test_native_matches_numpy_edge_windows(lib_ok):
    # clipped ends overhanging the window + all-N stretches
    rng = np.random.default_rng(7)
    for t in range(30):
        W = int(rng.integers(30, 60))
        L = int(rng.integers(20, W + 10))
        ref = rng.integers(0, 5, W).astype(np.uint8)   # with Ns
        rd = rng.integers(0, 4, L).astype(np.uint8)
        rd[: min(8, L)] = ref[: min(8, min(L, W))][: min(8, L)]
        q = np.full(L, 40, np.int8)
        nat = _sw._dp_traceback_native(SC, rd, q, ref)
        ref_out = _numpy_traceback(SC, rd, q, ref)
        assert nat == ref_out, f"case {t}: {nat} != {ref_out}"
