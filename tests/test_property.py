"""Property/fuzz sweep with independent re-validation: random genomes,
randomly mutated reads (mismatches, indels, rc, Ns, truncation), aligned
end-to-end; every emitted record is independently reconstructed from
(POS, CIGAR, SEQ) against the genome and checked for MD/NM consistency —
the reference's randomized-sim strategy (SURVEY.md §4.4)."""

import io

import numpy as np
import pytest

from hisat2_tpu.align.pipeline import Aligner
from hisat2_tpu.align.emit import align_and_emit
from hisat2_tpu.index.fm_index import build_fm_index
from hisat2_tpu.io import sam as samio
from hisat2_tpu.io.reads import Read, batchify
from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.utils import alphabet
from samcheck import check_record


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_fuzz_records_consistent(seed):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, 50000).astype(np.uint8)
    ref = reference_from_seqs({"chrF": alphabet.decode(codes)})
    al = Aligner(build_fm_index(ref, ftab_k=6))

    reads = []
    for i in range(120):
        p = int(rng.integers(0, 49000))
        ln = int(rng.integers(60, 140))
        s = codes[p:p + ln].copy()
        kind = int(rng.integers(0, 6))
        if kind == 1:
            mm = rng.random(ln) < 0.03
            s[mm] = (s[mm] + rng.integers(1, 4, int(mm.sum()))) % 4
        elif kind == 2:
            k = int(rng.integers(10, ln - 10))
            d = int(rng.integers(1, 5))
            s = np.concatenate([s[:k], codes[p + k + d:p + ln + d]])
        elif kind == 3:
            k = int(rng.integers(10, ln - 10))
            d = int(rng.integers(1, 5))
            ins = rng.integers(0, 4, d).astype(np.uint8)
            s = np.concatenate([s[:k], ins, s[k:ln - d]])
        elif kind == 4:
            nn = rng.random(s.size) < 0.02
            s[nn] = 4
        if rng.random() < 0.5:
            s = alphabet.revcomp(s)
        q = rng.integers(10, 41, s.size).astype(np.int8)
        reads.append(Read(f"f{i}", s, q, i))
    batch = batchify(reads)
    buf = io.StringIO()
    w = samio.SamWriter(buf, ref.names, [50000], no_head=True)
    align_and_emit(al, batch, w)

    genome_by_name = {"chrF": codes}
    n_checked = 0
    for line in buf.getvalue().splitlines():
        f = line.split("\t")
        if int(f[1]) & 0x4:
            continue
        problems = check_record(f, genome_by_name, al.scoring)
        assert not problems, f"{f[0]} {f[5]}: {problems}"
        n_checked += 1
    assert n_checked >= 100
