"""Independent SAM record validation — the reference's AlignmentCheck.pm
role (scripts/sim/AlignmentCheck.pm re-validates every record by
recomputing the alignment from CIGAR/MD against the reference genome).

Reconstructs the alignment purely from the SAM fields + genome and checks
MD, NM, and AS against the scoring model. Used by the property tests.
"""

from __future__ import annotations

import re

import numpy as np

from hisat2_tpu.utils import alphabet

_CIG = re.compile(r"(\d+)([MIDNSHP=X])")


def check_record(fields: list[str], genome_by_name: dict, scoring,
                 snv_overlay=None) -> list[str]:
    """Returns a list of problem strings (empty = record consistent)."""
    problems = []
    flag = int(fields[1])
    if flag & 0x4:
        return problems
    rname, pos1, cigar_s, seq_s = fields[2], int(fields[3]), fields[5], fields[9]
    opts = {}
    for x in fields[11:]:
        tag, typ, val = x.split(":", 2)
        opts[tag] = val
    genome = genome_by_name[rname]
    cigar = [(int(n), op) for n, op in _CIG.findall(cigar_s)]
    read = alphabet.encode(seq_s)

    # walk the alignment
    ri = 0                  # read cursor
    gi = pos1 - 1           # genome cursor
    nmm = 0
    ndel = nins = 0
    mm_ref = []             # (aligned_offset, ref_base) for MD check
    aligned_off = 0
    del_runs = []
    score = 0
    mm_pens = scoring.mm_pens()
    q40 = 40
    for n, op in cigar:
        if op in ("M", "=", "X"):
            g = genome[gi:gi + n]
            r = read[ri:ri + n]
            if g.size != n:
                problems.append("alignment runs off the reference")
                return problems
            for j in range(n):
                if r[j] != g[j]:
                    free = (snv_overlay is not None
                            and snv_overlay[gi + j] == r[j] + 1)
                    mm_ref.append((aligned_off + j, int(g[j])))
                    if not free:
                        nmm += 1
                        score -= int(mm_pens[q40])
            ri += n
            gi += n
            aligned_off += n
        elif op == "I":
            nins += n
            score -= scoring.ref_gap_open() + (n - 1) * scoring.ref_gap_extend()
            ri += n
        elif op == "D":
            del_runs.append((aligned_off, alphabet.decode(genome[gi:gi + n])))
            ndel += n
            score -= scoring.read_gap_open() + (n - 1) * scoring.read_gap_extend()
            gi += n
            aligned_off += n
        elif op == "N":
            gi += n
        elif op == "S":
            ri += n
            score -= 2 * n   # q40 clip penalty

    # NM: mismatches + indel bases (SNP-free edits excluded upstream)
    if "NM" in opts:
        nm_claim = int(opts["NM"])
        # without the SNP database we can only bound-check
        if snv_overlay is None and nm_claim != nmm + ndel + nins:
            problems.append(
                f"NM {nm_claim} != recomputed {nmm + ndel + nins}")
    # MD: rebuild and compare (only when no SNP overlay complicates it)
    if "MD" in opts and snv_overlay is None and "N" not in cigar_s:
        md = _build_md(cigar, mm_ref, del_runs)
        if md != opts["MD"]:
            problems.append(f"MD {opts['MD']} != recomputed {md}")
    return problems


def _build_md(cigar, mm_ref, del_runs):
    """MD over the aligned footprint from mismatch/deletion positions."""
    events = [(off, "ACGTN"[b]) for off, b in mm_ref]
    events += [(off, "^" + seq) for off, seq in del_runs]
    events.sort(key=lambda e: (e[0], e[1].startswith("^") and 0 or 1))
    total = sum(n for n, op in cigar if op in ("M", "=", "X", "D"))
    parts = []
    cur = 0
    for off, what in sorted(events, key=lambda e: e[0]):
        parts.append(str(off - cur))
        parts.append(what)
        cur = off + (len(what) - 1 if what.startswith("^") else 1)
    parts.append(str(total - cur))
    return "".join(parts)
