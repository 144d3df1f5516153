"""Host-side suffix array construction.

Equivalent role to the reference's blockwise_sa.h (Kärkkäinen blockwise
suffix sorting) + diff_sample + multikey_qsort (SURVEY.md §2.2). Blockwise
sorting is a memory optimization for 8GB desktops; on a TPU host we use a
vectorized NumPy prefix-doubling (Manber–Myers with radix ranking,
O(n log n)) which handles tens of Mbp comfortably. A C++ SA-IS builder for
Gbp-scale genomes is a planned follow-up (index/native/).
"""

from __future__ import annotations

import numpy as np


def _build_sais(text: np.ndarray) -> np.ndarray | None:
    """Native SA-IS over text+sentinel; None if the library is unavailable."""
    try:
        from ..native import sais_lib
        lib = sais_lib()
    except Exception:
        return None
    if lib is None:
        return None
    n = int(text.size)
    # shift symbols +1 and append the 0 sentinel (SA-IS contract)
    t = np.empty(n + 1, np.uint8)
    t[:n] = text.astype(np.uint8) + 1
    t[n] = 0
    if n + 1 < (1 << 31):
        sa = np.empty(n + 1, np.int32)
        lib.sais_u8_i32(t, sa, n + 1, 6)
        return sa.astype(np.int64)
    sa = np.empty(n + 1, np.int64)
    lib.sais_u8_i64(t, sa, n + 1, 6)
    return sa


def build_suffix_array(text: np.ndarray) -> np.ndarray:
    """Suffix array of text (uint8 codes 0..3) + implicit terminal sentinel.

    Returns SA of length n+1 over T' = text + '$' where '$' sorts before
    every symbol; SA[0] == n always (the sentinel suffix).

    Uses the native SA-IS builder (native/sais.cpp, linear time) when the
    toolchain is available; falls back to NumPy prefix doubling.
    """
    text = np.asarray(text)
    n = int(text.size)
    if n == 0:
        return np.zeros(1, dtype=np.int64)
    sa = _build_sais(text)
    if sa is not None:
        return sa
    text = text.astype(np.int64)
    # rank 0 reserved for the sentinel; symbols shifted +1
    rank = np.zeros(n + 1, dtype=np.int64)
    rank[:n] = text + 1
    k = 1
    idx = np.arange(n + 1, dtype=np.int64)
    while True:
        # key = (rank[i], rank[i+k]) with rank past end = 0 (sentinel region)
        second = np.zeros(n + 1, dtype=np.int64)
        second[: n + 1 - k] = rank[k:]
        order = np.lexsort((second, rank))
        # assign new ranks
        r_o, s_o = rank[order], second[order]
        new_group = np.empty(n + 1, dtype=np.int64)
        new_group[0] = 0
        new_group[1:] = np.cumsum(
            (r_o[1:] != r_o[:-1]) | (s_o[1:] != s_o[:-1]))
        new_rank = np.empty(n + 1, dtype=np.int64)
        new_rank[order] = new_group
        rank = new_rank
        if int(new_group[-1]) == n:  # all ranks distinct
            return order
        k *= 2
        if k > n + 1:  # defensive; distinctness must trigger first
            return order


def bwt_from_sa(text: np.ndarray, sa: np.ndarray) -> tuple[np.ndarray, int]:
    """BWT over text+'$' given its SA.

    Returns (bwt codes with the '$' cell stored as 0, zoff) where zoff is the
    row holding '$' (the reference tracks the same as _zOffs, gfm.h:2431).
    """
    text = np.asarray(text, dtype=np.uint8)
    sa = np.asarray(sa, dtype=np.int64)
    prev = sa - 1
    zoff = int(np.flatnonzero(sa == 0)[0])
    prev_clipped = np.where(sa == 0, 0, prev)
    bwt = text[prev_clipped].astype(np.uint8)
    bwt[zoff] = 0
    return bwt, zoff
