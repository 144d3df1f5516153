"""Reader for the reference's .ht2 index files (small/32-bit, linear FM).

Layout per gfm.h readIntoMemory (gfm.h:5823-6440) and BitPairReference
(reference.cpp:73-150), little-endian `index_t = uint32` ("small" index;
MANUAL.markdown:221-231):

  .1.ht2  u32 1; u32 version; u32 len, gbwtLen, numNodes; i32 lineRate,
          linesPerSide, offRate, ftabChars; u32 eftabLen; i32 flags;
          u32 nPat; u32 plen[nPat]; u32 nFrag; u32 rstarts[3*nFrag];
          GBWT sides (numSides x 2^lineRate bytes, each = packed 2-bit
          BWT chars + 4 u32 checkpoints at the side end for linear FM);
          u32 nZOffs; u32 zOffs[]; u32 fchr[5]; u32 ftab[4^ftabChars+1];
          u32 eftab[eftabLen]; refnames ('\n'-separated, NUL-terminated)
  .2.ht2  u32 1; u32 offs[(numNodes + 2^offRate - 1) >> offRate]
          (row-sampled SA values)
  .3.ht2  u32 1; u32 nRecs; nRecs x {u32 off, u32 len, u8 first}
  .4.ht2  2-bit packed reference stretches (4 bases/byte, first base in
          the low bits)

The loader recovers the reference text + names and REBUILDS our native
device index from them (our layouts are TPU-specific); the raw BWT and
SA sample are also decoded so tests can verify the file was truly
understood (our recomputed BWT must equal the stored one).
"""

from __future__ import annotations

import os
import struct

import numpy as np

from .reference import JoinedReference


def _u32s(buf: bytes, off: int, n: int):
    return np.frombuffer(buf, np.uint32, count=n, offset=off), off + 4 * n


def read_ht2_primary(prefix: str) -> dict:
    """Parse <prefix>.1.ht2 fully (header, BWT chars, zOffs, fchr, ftab,
    refnames)."""
    with open(prefix + ".1.ht2", "rb") as fh:
        buf = fh.read()
    off = 0
    (one, version, length, gbwt_len, num_nodes), off = \
        np.frombuffer(buf, np.uint32, 5, off), 20
    assert one == 1, "big-endian .ht2 not supported"
    (line_rate, lines_per_side, off_rate, ftab_chars), off = \
        np.frombuffer(buf, np.int32, 4, off), off + 16
    (eftab_len,), off = _u32s(buf, off, 1)
    (flags,), off = np.frombuffer(buf, np.int32, 1, off), off + 4
    (npat,), off = _u32s(buf, off, 1)
    plens, off = _u32s(buf, off, int(npat))
    (nfrag,), off = _u32s(buf, off, 1)
    rstarts, off = _u32s(buf, off, 3 * int(nfrag))

    side_sz = 1 << int(line_rate)
    gbwt_sz = int(gbwt_len) // 4 + 1            # linear: 4 chars/byte
    side_gbwt_sz = side_sz - 16                 # 4 x u32 checkpoints
    num_sides = (gbwt_sz + side_gbwt_sz - 1) // side_gbwt_sz
    tot = num_sides * side_sz
    sides = np.frombuffer(buf, np.uint8, tot, off).reshape(
        num_sides, side_sz)
    off += tot
    packed = sides[:, :side_gbwt_sz].reshape(-1)
    codes = np.empty(packed.size * 4, np.uint8)
    for j in range(4):
        codes[j::4] = (packed >> (2 * j)) & 3
    bwt = codes[:int(gbwt_len)]

    (nz,), off = _u32s(buf, off, 1)
    zoffs, off = _u32s(buf, off, int(nz))
    fchr, off = _u32s(buf, off, 5)
    ftab, off = _u32s(buf, off, (1 << (2 * int(ftab_chars))) + 1)
    eftab, off = _u32s(buf, off, int(eftab_len))
    end = buf.index(b"\x00", off)
    names = [n for n in buf[off:end].decode().split("\n") if n]
    return dict(length=int(length), gbwt_len=int(gbwt_len),
                num_nodes=int(num_nodes), line_rate=int(line_rate),
                off_rate=int(off_rate), ftab_chars=int(ftab_chars),
                flags=int(flags), plens=plens.astype(np.int64),
                nfrag=int(nfrag), rstarts=rstarts.astype(np.int64),
                bwt=bwt, zoffs=zoffs.astype(np.int64),
                fchr=fchr.astype(np.int64), ftab=ftab, eftab=eftab,
                names=names)


def read_ht2_offs(prefix: str) -> np.ndarray:
    """.2.ht2: row-sampled SA values (offs[k] ~ SA[k << offRate])."""
    with open(prefix + ".2.ht2", "rb") as fh:
        buf = fh.read()
    one = struct.unpack("<I", buf[:4])[0]
    assert one == 1
    return np.frombuffer(buf, np.uint32, offset=4).astype(np.int64)


def read_ht2_reference(prefix: str, names: list[str],
                       plens: np.ndarray) -> JoinedReference:
    """.3/.4.ht2 -> JoinedReference (excluded-ambiguity fragment runs)."""
    with open(prefix + ".3.ht2", "rb") as fh:
        b3 = fh.read()
    one, nrecs = struct.unpack("<II", b3[:8])
    assert one == 1
    recs = []
    off = 8
    for _ in range(nrecs):
        o, l = struct.unpack_from("<II", b3, off)
        first = b3[off + 8] != 0
        recs.append((o, l, first))
        off += 9
    with open(prefix + ".4.ht2", "rb") as fh:
        b4 = np.frombuffer(fh.read(), np.uint8)
    total = sum(l for _, l, _ in recs)
    codes = np.empty(b4.size * 4, np.uint8)
    for j in range(4):
        codes[j::4] = (b4 >> (2 * j)) & 3
    joined = codes[:total]

    frag_joined, frag_toff, frag_tidx, frag_len = [], [], [], []
    tidx = -1
    toff = 0
    jpos = 0
    for o, l, first in recs:
        if first:
            tidx += 1
            toff = 0
        toff += o
        if l:
            frag_joined.append(jpos)
            frag_toff.append(toff)
            frag_tidx.append(tidx)
            frag_len.append(l)
        jpos += l
        toff += l
    return JoinedReference(
        names=list(names), tlens=np.asarray(plens, np.int64),
        joined=joined,
        frag_joined=np.asarray(frag_joined, np.int64),
        frag_toff=np.asarray(frag_toff, np.int64),
        frag_tidx=np.asarray(frag_tidx, np.int64),
        frag_len=np.asarray(frag_len, np.int64))


def load_ht2(prefix: str):
    """Load a reference-built .ht2 index into our native FMIndex: the
    text/names/fragments come from the files; the device structures are
    rebuilt in our layouts (the stored BWT is used to cross-check the
    rebuild — a mismatch means the files were misread)."""
    from ..index.fm_index import build_fm_index

    hdr = read_ht2_primary(prefix)
    ref = read_ht2_reference(prefix, hdr["names"], hdr["plens"])
    fm = build_fm_index(ref, ftab_k=hdr["ftab_chars"])
    # cross-validation: LF-invert the STORED BWT (GFM::restore semantics,
    # gfm.h) and compare against the .4 text tail — proves the side
    # layout/zoff/fchr were truly understood, not just the .3/.4 files
    if hdr["gbwt_len"] == fm.n + 1 and hdr["zoffs"].size == 1:
        k = min(fm.n, 50_000)
        tail = restore_text(hdr, steps=k)
        if not (tail == ref.joined[fm.n - k:]).all():
            raise ValueError(
                ".ht2 BWT cross-check failed — file misparsed?")
    return fm


def restore_text(hdr: dict, steps: int | None = None) -> np.ndarray:
    """LF-invert the stored BWT starting at the last row (the reference's
    GFM::restore): returns the LAST `steps` characters of the joined
    text (all of it when steps is None). The '$' sentinel is stored as
    an 'A' at row zoffs[0] and excluded from A-ranks (countBt2Side's
    z-adjustment, gfm.h:2969)."""
    bwt = hdr["bwt"]
    z = int(hdr["zoffs"][0])
    n = bwt.size
    L = n - 1
    steps = L if steps is None else min(steps, L)
    C = hdr["fchr"].astype(np.int64)
    occ = np.zeros((n + 1, 4), np.int64)
    for c in range(4):
        occ[1:, c] = np.cumsum(bwt == c)
    out = np.zeros(steps, np.uint8)
    i = L
    for j in range(steps):
        c = int(bwt[i])
        out[steps - j - 1] = c
        r = int(occ[i, c]) - (1 if (c == 0 and z < i) else 0)
        i = int(C[c]) + r
    return out
