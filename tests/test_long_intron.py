"""Long-intron novel-junction discovery: introns beyond the old 64Kbp
anchor-scan window (the reference reaches ~500Kbp by hopping LocalGFMs,
hgfm.h:1724-1740; ops/splice.anchor_scan now tiles its 64K window up to
8x under a runtime-gated deep branch)."""

import io

import numpy as np
import pytest

from hisat2_tpu.index.fm_index import build_fm_index
from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.utils import alphabet
from hisat2_tpu.io.reads import Read, batchify


@pytest.mark.parametrize("ilen", [150_000, 380_000])
def test_long_intron_novel(ilen):
    from hisat2_tpu.align.pipeline import Aligner
    from hisat2_tpu.align import emit
    from hisat2_tpu.io import sam as samio

    rng = np.random.default_rng(17)
    n = ilen + 40_000
    g = rng.integers(0, 4, n).astype(np.uint8)
    ie = 20_000                       # intron [ie, ie+ilen)
    g[ie:ie + 2] = [2, 3]             # GT
    g[ie + ilen - 2:ie + ilen] = [0, 2]  # AG
    fm = build_fm_index(reference_from_seqs({"chrL": alphabet.decode(g)}))

    # junction reads: long near anchor, 12-20bp far anchor (too short to
    # seed, long enough that the nearest-first scan rarely collides)
    reads = []
    for i, far in enumerate((12, 16, 20)):
        s = np.concatenate([g[ie - (100 - far):ie],
                            g[ie + ilen:ie + ilen + far]])
        reads.append(Read(f"lj{i}_{far}", s.copy(),
                          np.full(100, 40, np.int8), i))
    # filler exact reads so the batch isn't all-trigger
    for i in range(3, 32):
        st = int(rng.integers(0, n - 100))
        reads.append(Read(f"f{i}", g[st:st + 100].copy(),
                          np.full(100, 40, np.int8), i))
    b = batchify(reads, pad_to=104)

    al = Aligner(fm)
    al.opts.spliced = True
    buf = io.StringIO()
    w = samio.SamWriter(buf, fm.ref.names, [int(x) for x in fm.ref.tlens],
                        no_head=True)
    emit.align_and_emit(al, b, w)
    recs = {ln.split("\t")[0]: ln.split("\t")
            for ln in buf.getvalue().splitlines()}
    found = 0
    for i, far in enumerate((12, 16, 20)):
        f = recs[f"lj{i}_{far}"]
        if f"{ilen}N" in f[5] and int(f[3]) == ie - (100 - far) + 1:
            found += 1
    # the 12bp far anchor can lose the nearest-first scan to a spurious
    # 8-mer; the longer anchors must land
    assert found >= 2, {k: v[5] for k, v in recs.items() if k.startswith("lj")}
