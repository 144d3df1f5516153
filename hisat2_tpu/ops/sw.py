"""Batched affine-gap alignment DP.

Equivalent role to the reference's SSE striped Smith-Waterman
(aligner_sw.{h,cpp} + aligner_swsse_*.cpp, SURVEY.md "HOT LOOP 3"), re-done
for TPU: instead of Farrar's striped 128-bit lanes per thread, the batch
axis (candidates) is the vector axis and the DP is a lax.scan over read
positions. The within-row horizontal gap dependency (read-gap/deletion)
is closed in O(W) with a running-max trick:

    E[i][j] = max_{k<j} ( G[i][k] - open - (j-1-k)*ext )
            = cummax_k ( G[i][k] + ext*k ) - open - ext*(j-1)

so each row is pure elementwise VPU work + one cummax — no sequential
inner loop, and the whole (C, L, W) problem is one fused XLA computation.

Mode: global in the read (end-to-end, reference default), free end gaps in
the reference window (candidate position is approximate). Score-only on
device; exact traceback for the handful of winning candidates runs host-side
(dp_traceback) with identical scoring — the reference similarly splits DP
fill from backtrace (aligner_bt.h).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

NEG = -(1 << 28)


def _subst(sctab, rd_c, q, rf_c, ov=None):
    """Substitution score of read char vs ref char (int32). `ov` is the
    SNV-overlay value at the ref position (graph mode): a mismatch whose
    read base is the known alt allele is free."""
    rd_n = rd_c >= 4
    rf_n = rf_c >= 4
    isn = rd_n | rf_n
    mm = (rd_c != rf_c) & ~isn
    if ov is not None:
        mm = mm & ~((ov == rd_c + 1) | (ov == 15))
    from ..align.scoring import mm_pen_of
    pen = jnp.where(mm, mm_pen_of(sctab, jnp.clip(q, 0, 63)), 0)
    pen = jnp.where(isn, sctab["n_pen"], pen)
    bonus = jnp.where(~mm & ~isn, sctab["match_bonus"], 0)
    return bonus - pen


@jax.jit
def dp_score_batch(sctab: dict, rd: jax.Array, quals: jax.Array,
                   rdlens: jax.Array, ref: jax.Array,
                   ov: jax.Array | None = None):
    """Affine-gap DP score with soft clips, batched over candidates.

    rd (C, L) codes 0..4, quals (C, L), rdlens (C,), ref (C, W) codes 0..4
    (N-padded outside the real window). 5'/3' soft clips carry the
    per-base sc_pens penalty (reference --sp): a 5' clip of i bases enters
    the DP as a floor of -SCP(i) on row i; a 3' clip ending at row i costs
    the remaining SCP(len)-SCP(i).
    Returns score (C,) int32.
    """
    C, L = rd.shape
    W = ref.shape[1]
    rd = rd.astype(jnp.int32)
    ref = ref.astype(jnp.int32)
    q = jnp.clip(quals.astype(jnp.int32), 0, 63)
    rdlens = rdlens.astype(jnp.int32)

    rd_open, rd_ext = sctab["rd_open"], sctab["rd_ext"]
    rf_open, rf_ext = sctab["rf_open"], sctab["rf_ext"]

    in_read = (jnp.arange(L, dtype=jnp.int32)[None, :] < rdlens[:, None])
    from ..align.scoring import sc_pen_of
    scp = jnp.where(in_read, sc_pen_of(sctab, q), 0)     # (C, L)
    scp_cum = jnp.cumsum(scp, axis=1)                     # SCP(i+1)
    scp_tot = scp_cum[:, -1]                              # SCP(len)

    jcols = jnp.arange(W + 1, dtype=jnp.int32)           # 0..W
    H0 = jnp.zeros((C, W + 1), jnp.int32)                # free leading ref gap
    F0 = jnp.full((C, W + 1), NEG, jnp.int32)
    best0 = -scp_tot                                      # fully clipped read

    def row(carry, i):
        H, F, best = carry                               # (C, W+1), (C,)
        rc = rd[:, i][:, None]                           # (C, 1)
        qc = q[:, i][:, None]
        s = _subst(sctab, rc, qc, ref, ov)               # (C, W)
        diag = H[:, :-1] + s                             # j=1..W
        Fn_tail = jnp.maximum(H[:, 1:] - rf_open, F[:, 1:] - rf_ext)
        col0 = -(rf_open + i * rf_ext)
        col0 = jnp.full((C, 1), col0, jnp.int32)
        G = jnp.concatenate([col0, jnp.maximum(diag, Fn_tail)], axis=1)
        M = lax.cummax(G + rd_ext * jcols[None, :], axis=1)
        E_tail = M[:, :-1] - rd_open - rd_ext * (jcols[1:][None, :] - 1)
        Hn = jnp.concatenate([col0, jnp.maximum(G[:, 1:], E_tail)], axis=1)
        # 5' soft clip: restart after clipping read[0:i+1]
        Hn = jnp.maximum(Hn, -scp_cum[:, i][:, None])
        Fn = jnp.concatenate([col0, Fn_tail], axis=1)
        act = (i < rdlens)[:, None]
        Hn = jnp.where(act, Hn, H)
        Fn = jnp.where(act, Fn, F)
        # 3' soft clip: end alignment at read position i+1
        tail = scp_tot - scp_cum[:, i]
        bn = jnp.maximum(best, Hn.max(axis=1) - tail)
        return (Hn, Fn, bn), None

    (H, _, best), _ = lax.scan(row, (H0, F0, best0),
                               jnp.arange(L, dtype=jnp.int32))
    return jnp.maximum(best, H.max(axis=1))


@jax.jit
def ungapped_place_batch(sctab: dict, rd: jax.Array, quals: jax.Array,
                         rdlens: jax.Array, ref: jax.Array):
    """Best ungapped (single-diagonal) placement per lane, on device.

    Scores every diagonal placement of the read in its window with the
    same substitution/soft-clip model as dp_score_batch: per diagonal the
    best clip pair is a max-subarray over A[i] = SCP(i) + cumsum(sub).
    Where the returned best equals the affine DP score, the optimum IS
    ungapped and no host traceback is needed (reference splits DP fill
    from backtrace similarly, aligner_bt.h).

    rd (C, L) codes 0..4, quals (C, L), rdlens (C,), ref (C, W).
    Returns (best, t0, i1, i2) each (C,) int32: score, window offset of
    read position 0 (may be negative — clipped ends can overhang), and
    the aligned read span [i1, i2).
    """
    C, L = rd.shape
    W = ref.shape[1]
    T = W + L + 1
    BAD = jnp.int32(-(10 ** 6))
    rd = rd.astype(jnp.int32)
    q = jnp.clip(quals.astype(jnp.int32), 0, 63)
    rdlens = rdlens.astype(jnp.int32)
    from ..align.scoring import mm_pen_of, sc_pen_of

    in_read = (jnp.arange(L, dtype=jnp.int32)[None, :] < rdlens[:, None])
    pens = mm_pen_of(sctab, q)                            # (C, L)
    scp = jnp.where(in_read, sc_pen_of(sctab, q), 0)
    scp_total = scp.sum(axis=1)
    # sentinel (code 5) pad: L columns each side so overhanging clipped
    # ends stay representable without any aligned base landing outside
    wp = jnp.full((C, W + 2 * L), 5, jnp.int32)
    wp = lax.dynamic_update_slice(wp, ref.astype(jnp.int32), (0, L))

    # Streaming Kadane over read positions: per (lane, diagonal) track
    # the prefix sum A, its running FIRST minimum (value + index), and
    # the best gain (A[i2] - min_{j<i2} A[j]) with first-max tie order —
    # O(C*T) state instead of the old (C, T, L) tensor that forced a
    # serialized lax.map over 128-lane chunks (it was the largest single
    # op in the PE dispatch profile). Strict comparisons reproduce the
    # argmax/argmin first-occurrence semantics of the dense version.
    NEG = jnp.int32(-(1 << 30))
    A = jnp.zeros((C, T), jnp.int32)           # A[0] = 0 (SCP[0] = 0)
    runmin = A                                 # min over A[0..i-1]
    rm_idx = jnp.zeros((C, T), jnp.int32)
    best = jnp.full((C, T), NEG, jnp.int32)
    b_i1 = jnp.zeros((C, T), jnp.int32)
    b_i2 = jnp.ones((C, T), jnp.int32)
    rdn = rd >= 4
    mbonus = sctab["match_bonus"]
    npen = sctab["n_pen"]
    for i in range(L):
        sv = lax.dynamic_slice_in_dim(wp, i, T, axis=1)   # (C, T)
        rc = rd[:, i][:, None]
        mm = sv != rc
        isn = (sv >= 4) | rdn[:, i][:, None]
        sub = jnp.where(mm & ~isn, -pens[:, i][:, None], 0)
        sub = sub + jnp.where(~mm & ~isn, mbonus, 0)
        sub = jnp.where(isn, -npen, sub)
        sub = jnp.where(sv == 5, BAD, sub)
        sub = jnp.where(in_read[:, i][:, None], sub, BAD)
        A2 = A + sub + scp[:, i][:, None]      # A[i+1] = A[i] + sub + scp
        cand = A2 - runmin
        upd = cand > best                      # strict: first max wins
        best = jnp.where(upd, cand, best)
        b_i2 = jnp.where(upd, i + 1, b_i2)
        b_i1 = jnp.where(upd, rm_idx, b_i1)
        newmin = A2 < runmin                   # strict: first min wins
        runmin = jnp.where(newmin, A2, runmin)
        rm_idx = jnp.where(newmin, i + 1, rm_idx)
        A = A2
    ti = jnp.argmax(best, axis=1).astype(jnp.int32)       # first max
    take = lambda a: jnp.take_along_axis(a, ti[:, None], 1)[:, 0]
    return ((take(best) - scp_total).astype(jnp.int32), ti - L,
            take(b_i1), take(b_i2))


# ---------------------------------------------------------------------------
# Host traceback (winners only)
# ---------------------------------------------------------------------------

def _dp_traceback_native(scoring, rd, qual, ref):
    """Native dp_traceback (dpkernel.cpp); None when the lib is absent."""
    try:
        from ..native import dpkernel_lib
        lib = dpkernel_lib()
    except Exception:
        lib = None
    if lib is None:
        return None
    import ctypes
    L, W = int(rd.size), int(ref.size)
    if L == 0 or W == 0:
        return None
    mm_pens = np.ascontiguousarray(scoring.mm_pens().astype(np.int32))
    sc_pens = np.ascontiguousarray(scoring.sc_pens().astype(np.int32))
    rd8 = np.ascontiguousarray(rd.astype(np.uint8))
    q8 = np.ascontiguousarray(np.clip(qual, 0, 63).astype(np.uint8))
    rf8 = np.ascontiguousarray(ref.astype(np.uint8))
    score = ctypes.c_int32()
    ref_start = ctypes.c_int32()
    ncig = ctypes.c_int32()
    nmds = ctypes.c_int32()
    cig_ops = np.zeros(L + W + 2, np.uint8)
    cig_lens = np.zeros(L + W + 2, np.int32)
    mds_buf = np.zeros(2 * L + 2, np.int32)
    rc = lib.dp_traceback_one(
        rd8, q8, np.int32(L), rf8, np.int32(W), mm_pens, sc_pens,
        np.int32(scoring.match_bonus), np.int32(scoring.n_pen),
        np.int32(scoring.read_gap_open()), np.int32(scoring.read_gap_extend()),
        np.int32(scoring.ref_gap_open()), np.int32(scoring.ref_gap_extend()),
        ctypes.byref(score), ctypes.byref(ref_start),
        cig_ops, cig_lens, ctypes.byref(ncig), mds_buf, ctypes.byref(nmds))
    if rc != 0:
        return None
    nc = int(ncig.value)
    cigar = [(chr(cig_ops[k]), int(cig_lens[k])) for k in range(nc)]
    nm = int(nmds.value)
    mds = [(int(mds_buf[2 * k]), int(mds_buf[2 * k + 1])) for k in range(nm)]
    return int(score.value), int(ref_start.value), cigar, mds


def dp_traceback(scoring, rd: np.ndarray, qual: np.ndarray, ref: np.ndarray):
    """Full DP + traceback for one (read, ref window) pair — NumPy.

    Same scoring/mode as dp_score_batch (soft clips included). Returns
    (score, ref_start, cigar, mds) where cigar is [(op, len), ...] with ops
    'S'/'M'/'I'/'D', ref_start is the 0-based window column where the
    aligned region begins, and mds is the list of (read_off,
    ref_off_in_window) mismatch positions (including N positions).

    Delegates to the native kernel (native/dpkernel.cpp, an exact mirror
    incl. tie-breaks) when available; this NumPy body is the reference
    implementation and fallback.
    """
    nat = _dp_traceback_native(scoring, rd, qual, ref)
    if nat is not None:
        return nat
    L, W = rd.size, ref.size
    mm_pens = scoring.mm_pens()
    sc_pens = scoring.sc_pens()
    rd_open, rd_ext = scoring.read_gap_open(), scoring.read_gap_extend()
    rf_open, rf_ext = scoring.ref_gap_open(), scoring.ref_gap_extend()

    rd_i = rd.astype(np.int32)
    rf_i = ref.astype(np.int32)
    q = np.clip(qual.astype(np.int32), 0, 63)
    isn = (rd_i[:, None] >= 4) | (rf_i[None, :] >= 4)
    mm = (rd_i[:, None] != rf_i[None, :]) & ~isn
    sub = np.where(mm, -mm_pens[q][:, None], 0)
    sub = np.where(isn, -scoring.n_pen, sub)
    sub = sub + np.where(~mm & ~isn, scoring.match_bonus, 0)
    scp = sc_pens[q].astype(np.int64)
    SCP = np.concatenate([[0], np.cumsum(scp)])        # SCP[i] = clip cost of rd[0:i)

    H = np.full((L + 1, W + 1), NEG, np.int64)
    E = np.full((L + 1, W + 1), NEG, np.int64)   # read gap (D): along j
    F = np.full((L + 1, W + 1), NEG, np.int64)   # ref gap (I): along i
    H[0, :] = 0
    # row-vectorized fill: the within-row E dependency closes with the
    # same running-max identity as the device kernel (dp_score_batch)
    jix = np.arange(W + 1, dtype=np.int64)
    for i in range(1, L + 1):
        col0 = max(-(rf_open + (i - 1) * rf_ext), -SCP[i])
        diag = H[i - 1, :-1] + sub[i - 1]
        Frow = np.maximum(H[i - 1] - rf_open, F[i - 1] - rf_ext)
        Frow[0] = col0
        G = np.empty(W + 1, np.int64)
        G[0] = col0
        G[1:] = np.maximum(diag, Frow[1:])
        M = np.maximum.accumulate(G + rd_ext * jix)
        Erow = np.full(W + 1, NEG, np.int64)
        Erow[1:] = M[:-1] - rd_open - rd_ext * (jix[1:] - 1)
        Hrow = np.maximum(np.maximum(G, Erow), -SCP[i])
        Hrow[0] = col0
        E[i] = Erow
        F[i] = Frow
        H[i] = Hrow

    # end: maximize H[i][j] - trailing clip; ties toward larger i (fewer
    # clipped bases), then smaller j (leftmost end)
    endmat = H - (SCP[L] - SCP)[:, None]
    flat = int(np.argmax(endmat[::-1]))
    i, j = np.unravel_index(flat, endmat.shape)
    i = L - i
    score = int(endmat[i, j])
    clip3 = L - i
    ops: list[str] = []
    mds: list[tuple[int, int]] = []
    state = "H"
    while i > 0:
        if state == "H":
            if j > 0 and H[i, j] == H[i - 1, j - 1] + sub[i - 1, j - 1]:
                ops.append("M")
                if mm[i - 1, j - 1] or isn[i - 1, j - 1]:
                    mds.append((i - 1, j - 1))
                i -= 1
                j -= 1
            elif H[i, j] == E[i, j]:
                state = "E"
            elif H[i, j] == F[i, j]:
                state = "F"
            elif H[i, j] == -SCP[i]:       # 5' clip start point (checked
                break                      # last: prefer real ops on ties)
            else:  # j == 0 boundary: leading ref-gap column
                state = "F"
        elif state == "E":
            ops.append("D")
            # close the gap when the open identity holds or the extension
            # identity fails (E is the closed-form optimum, not the
            # sequential matrix, so closure must be inferred)
            if (E[i, j] == H[i, j - 1] - rd_open or j <= 1
                    or E[i, j] != E[i, j - 1] - rd_ext):
                state = "H"
            j -= 1
        else:  # F
            ops.append("I")
            if j == 0:
                i -= 1
                state = "H"
                continue
            if (F[i, j] == H[i - 1, j] - rf_open or i <= 1
                    or F[i, j] != F[i - 1, j] - rf_ext):
                state = "H"
            i -= 1
    clip5 = i
    ref_start = j
    ops.reverse()
    cigar: list[tuple[str, int]] = []
    if clip5:
        cigar.append(("S", clip5))
    for op in ops:
        if cigar and cigar[-1][0] == op:
            cigar[-1] = (op, cigar[-1][1] + 1)
        else:
            cigar.append((op, 1))
    if clip3:
        cigar.append(("S", clip3))
    mds.reverse()
    return score, ref_start, cigar, mds
