"""Repeat discovery + repeat database.

Equivalent role to the reference's hisat2-repeat / repeat_builder.{h,cpp}
(RB_SubSA suffix grouping :4247, buildRepeatBase :4406, saveRepeats :4024)
+ repeat.h RepeatDB and ht2_repeat_expand (ht2_repeat.cpp:52):

  * find all sequences of length >= `repeat_length` occurring >=
    `repeat_count` times, via suffix-array + LCP runs (the reference walks
    its own suffix-array subset the same way);
  * write <base>.rep.fa + <base>.rep.info and keep an in-memory RepeatDB
    mapping each repeat to its genomic occurrence list;
  * expand(name, pos, len) -> [(chr_id, strand, pos), ...] — the ht2lib
    repeat-expansion contract.

The alignment path uses the repeat FM index (built over .rep.fa with the
ordinary builder) to place repetitive reads once, then expands
coordinates on demand instead of enumerating every genomic copy.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np

from ..io.reference import JoinedReference
from ..utils import alphabet
from .suffix_array import build_suffix_array


def lcp_array(text: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = LCP(suffix sa[i-1], suffix sa[i]); lcp[0]=0."""
    n = text.size
    sa = np.asarray(sa)
    rank = np.empty(sa.size, np.int64)
    rank[sa] = np.arange(sa.size)
    lcp = np.zeros(sa.size, np.int64)
    h = 0
    t = text
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = int(sa[r - 1])
            m = min(n - i, n - j)
            while h < m and t[i + h] == t[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


@dataclass
class Repeat:
    name: str
    seq: np.ndarray                       # consensus codes
    positions: list[tuple[int, bool]]     # (joined_pos, fw) occurrences

    def __len__(self) -> int:
        return int(self.seq.size)


@dataclass
class RepeatDB:
    repeats: list[Repeat] = field(default_factory=list)
    ref: JoinedReference | None = None

    def by_name(self, name: str) -> Repeat:
        for r in self.repeats:
            if r.name == name:
                return r
        raise KeyError(name)

    def expand(self, name: str, pos: int, length: int
               ) -> list[tuple[int, int, int]]:
        """Repeat-space alignment -> genomic placements
        [(chr_id, direction, pos)] (direction 0=+ 1=-), ht2_repeat.cpp:52."""
        rpt = self.by_name(name)
        out = []
        for jpos, fw in rpt.positions:
            if fw:
                g = jpos + pos
            else:
                g = jpos + (len(rpt) - pos - length)
            loc = self.ref.joined_to_text(g, length)
            if loc is not None:
                out.append((loc[0], 0 if fw else 1, loc[1]))
        return out

    # ---- persistence: .rep.fa / .rep.info (reference saveRepeats) ----

    def save(self, base: str) -> None:
        with open(base + ".rep.fa", "w") as fa, \
                open(base + ".rep.info", "w") as info:
            for r in self.repeats:
                fa.write(f">{r.name}\n{alphabet.decode(r.seq)}\n")
                coords = " ".join(
                    f"{j}:{'+' if fw else '-'}" for j, fw in r.positions)
                info.write(f"{r.name}\t{len(r)}\t{len(r.positions)}\t{coords}\n")

    @staticmethod
    def load(base: str, ref: JoinedReference) -> "RepeatDB":
        db = RepeatDB(ref=ref)
        seqs = {}
        name = None
        for line in open(base + ".rep.fa"):
            line = line.strip()
            if line.startswith(">"):
                name = line[1:]
                seqs[name] = ""
            elif name:
                seqs[name] += line
        for line in open(base + ".rep.info"):
            f = line.rstrip("\n").split("\t")
            name, length, cnt, coords = f[0], int(f[1]), int(f[2]), f[3]
            positions = []
            for c in coords.split():
                j, s = c.split(":")
                positions.append((int(j), s == "+"))
            db.repeats.append(Repeat(name, alphabet.encode(seqs[name]),
                                     positions))
        return db


# ---------------------------------------------------------------------------
# Repeat k-mer read pre-classifier (reference RB_KmerTable/RB_Minimizer,
# repeat_kmer.h:34,178-238): a read is "repetitive" iff ANY (w=5, k=31)
# minimizer of either strand appears among the repeat sequences'
# minimizers. The classification runs inside the NORMAL alignment path
# (hi_aligner.h:4274-4282) to route repetitive reads through the repeat
# index automatically.
# ---------------------------------------------------------------------------

KMER_W = 5
KMER_K = 31


def _kmers_u64(codes: np.ndarray, k: int) -> np.ndarray:
    """(B, L) base codes -> (B, L-k+1) packed uint64 k-mers (first base in
    the high bits, reference get_kmer/get_next_kmer); N counts as A
    (callers mask N-containing windows)."""
    c = np.where(codes > 3, 0, codes).astype(np.uint64)
    B, L = c.shape
    m = L - k + 1
    if m <= 0:
        return np.zeros((B, 0), np.uint64)
    km = np.zeros((B, m), np.uint64)
    for j in range(k):
        km |= c[:, j:j + m] << np.uint64(2 * (k - 1 - j))
    return km


def _minimizers(codes: np.ndarray, w: int, k: int) -> np.ndarray:
    km = _kmers_u64(codes, k)
    m = km.shape[1] - w + 1
    if m <= 0:
        return np.zeros((codes.shape[0], 0), np.uint64)
    mins = km[:, :m].copy()
    for d in range(1, w):
        np.minimum(mins, km[:, d:d + m], out=mins)
    return mins


def build_kmer_table(db: "RepeatDB", w: int = KMER_W, k: int = KMER_K
                     ) -> np.ndarray:
    """Sorted unique minimizer set of all repeat sequences."""
    out = []
    for r in db.repeats:
        if r.seq.size >= k + w - 1:
            out.append(_minimizers(r.seq[None, :], w, k)[0])
    if not out:
        return np.zeros(0, np.uint64)
    return np.unique(np.concatenate(out))


def classify_repetitive(seqs: np.ndarray, lens: np.ndarray,
                        table: np.ndarray, w: int = KMER_W,
                        k: int = KMER_K) -> np.ndarray:
    """(B,) bool: read (either strand) shares a minimizer with the repeat
    set. Vectorized host work (~20 probes/read)."""
    if table.size == 0:
        return np.zeros(seqs.shape[0], bool)
    B, L = seqs.shape
    # pad columns beyond each read's length with N so every out-of-read
    # window is excluded by the N mask below
    padded = np.where(np.arange(L)[None, :] < lens[:, None], seqs, 4)
    hit = np.zeros(B, bool)
    span = k + w - 1
    for strand in (0, 1):
        c = padded if strand == 0 else np.where(
            padded[:, ::-1] > 3, 4, 3 - padded[:, ::-1])
        mins = _minimizers(c, w, k)
        m = mins.shape[1]
        if m == 0:
            continue
        isn = (c > 3).astype(np.int32)
        cs = np.concatenate(
            [np.zeros((B, 1), np.int32), np.cumsum(isn, axis=1)], axis=1)
        hasn = (cs[:, span:span + m] - cs[:, :m]) > 0
        idx = np.searchsorted(table, mins)
        member = (idx < table.size) & (table[np.minimum(idx, table.size - 1)]
                                       == mins)
        hit |= (member & ~hasn).any(axis=1)
    return hit


def build_repeats(ref: JoinedReference, repeat_length: int = 100,
                  repeat_count: int = 5, max_repeats: int = 100000,
                  forward_only: bool = False) -> RepeatDB:
    """Find repeats of length >= repeat_length occurring >= repeat_count
    times (both strands unless forward_only, mirroring hisat2-repeat's
    default two-strand construction)."""
    fw_text = ref.joined
    if forward_only:
        text = fw_text
        n_fw = text.size
    else:
        rc = alphabet.revcomp(ref.joined)
        text = np.concatenate([fw_text, rc])
        n_fw = fw_text.size
    sa = build_suffix_array(text)
    lcp = lcp_array(text.astype(np.int64), sa)

    db = RepeatDB(ref=ref)
    m = sa.size
    i = 1
    rid = 0
    # shifted sub-repeats of an already-emitted repeat are redundant (the
    # reference merges them during seed extension / consensus building);
    # dedup by marking the text covered by accepted occurrences
    covered = np.zeros(text.size + 1, bool)
    while i < m and rid < max_repeats:
        if lcp[i] < repeat_length:
            i += 1
            continue
        # run of suffixes sharing >= repeat_length prefix
        j = i
        minlcp = lcp[i]
        while j < m and lcp[j] >= repeat_length:
            minlcp = min(minlcp, lcp[j])
            j += 1
        group = sa[i - 1:j]
        if group.size >= repeat_count:
            rlen = int(minlcp)
            starts = [int(g) for g in group if int(g) + rlen <= text.size]
            fresh = sum(int((~covered[g:g + rlen]).sum()) for g in starts)
            if fresh >= (len(starts) * rlen) // 2:
                positions = []
                for g in starts:
                    covered[g:g + rlen] = True
                    if g < n_fw:
                        positions.append((g, True))
                        if not forward_only:   # mark the rc twin too
                            covered[2 * n_fw - (g + rlen):2 * n_fw - g] = True
                    else:
                        fwpos = 2 * n_fw - (g + rlen)
                        positions.append((fwpos, False))
                        covered[max(0, fwpos):fwpos + rlen] = True
                if len(positions) >= repeat_count:
                    seq = text[starts[0]: starts[0] + rlen]
                    db.repeats.append(
                        Repeat(f"rpt_{rid}", seq.copy(), positions))
                    rid += 1
        i = j + 1
    return db
