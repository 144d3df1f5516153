"""Paired-kmer intersect seeding (high-load tables, Gbp shards): forced
here by a small kt so bucket load > 3 on a 200kb genome."""

import numpy as np

from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.index.sharded import build_table_index
from hisat2_tpu.align.pipeline import Aligner
from hisat2_tpu.utils import alphabet
from hisat2_tpu.io.reads import Read, batchify


def test_pair_mode_places_reads():
    rng = np.random.default_rng(3)
    ref = reference_from_seqs(
        {"chrZ": alphabet.decode(rng.integers(0, 4, 200_000).astype(np.uint8))})
    fm = build_table_index(ref, kt=7)         # load ~12 -> pair mode
    assert fm.st_pos.size > 3 * 4 ** fm.st_k
    al = Aligner(fm)
    assert al.seeder == "table"
    joined = ref.joined
    reads = []
    truth = []
    for i in range(128):
        st = int(rng.integers(0, joined.size - 100))
        s = joined[st:st + 100].copy()
        mm = rng.random(100) < 0.01
        s[mm] = (s[mm] + rng.integers(1, 4, int(mm.sum()))) % 4
        if i % 2:
            s = alphabet.revcomp(s)
        truth.append(st)
        reads.append(Read(f"p{i}", s, np.full(100, 40, np.int8), i))
    batch = batchify(reads, pad_to=104)
    results = al.align_batch(batch)
    ok = sum(1 for i, r in enumerate(results)
             if r.aligned and abs(r.alns[0].toff - truth[i]) <= 2)
    assert ok >= 126, f"{ok}/128 correct placements in pair mode"
