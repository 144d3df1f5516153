""".ht2 interop: build an index with the REFERENCE hisat2-build binary,
read it with io/ht2.py, and verify text/BWT/SA-sample/names round-trip.
Skips when the reference binaries aren't built in /tmp."""

import os
import subprocess

import numpy as np
import pytest

from hisat2_tpu.utils import alphabet

BUILD_BIN = "/tmp/hisat2_ref_build/hisat2-build-s"


@pytest.fixture(scope="module")
def ht2_index(tmp_path_factory):
    if not os.path.exists(BUILD_BIN):
        pytest.skip("reference hisat2-build-s not available")
    d = tmp_path_factory.mktemp("ht2")
    rng = np.random.default_rng(9)
    seqs = {}
    for name, n in (("chrA", 6000), ("chrB", 4000)):
        seqs[name] = alphabet.decode(rng.integers(0, 4, n).astype(np.uint8))
    fa = d / "g.fa"
    with open(fa, "w") as fh:
        for k, v in seqs.items():
            fh.write(f">{k}\n{v}\n")
    subprocess.run([BUILD_BIN, str(fa), str(d / "idx")],
                   check=True, capture_output=True, timeout=300)
    return d / "idx", seqs


def test_ht2_roundtrip(ht2_index):
    from hisat2_tpu.io.ht2 import (read_ht2_primary, read_ht2_offs,
                                   read_ht2_reference, load_ht2)
    prefix, seqs = ht2_index
    hdr = read_ht2_primary(str(prefix))
    assert hdr["names"] == list(seqs)
    assert hdr["length"] == sum(len(v) for v in seqs.values())
    ref = read_ht2_reference(str(prefix), hdr["names"], hdr["plens"])
    want = np.concatenate([alphabet.encode(v) for v in seqs.values()])
    assert (ref.joined == want).all(), "reference text mismatch"

    # load_ht2 cross-checks the stored BWT against our rebuild internally
    fm = load_ht2(str(prefix))
    assert fm.n == hdr["length"]

    # SA sample: rebuild the reference's row->position map by LF-walking
    # the stored BWT from the last row (GFM::restore order: step j visits
    # the row of suffix len-j) and check offs[k] == SA[k << offRate]
    offs = read_ht2_offs(str(prefix))
    bwt = hdr["bwt"]
    z = int(hdr["zoffs"][0])
    n = bwt.size
    L = n - 1
    C = hdr["fchr"]
    occ = np.zeros((n + 1, 4), np.int64)
    for c in range(4):
        occ[1:, c] = np.cumsum(bwt == c)
    sa_rows = np.full(n, -1, np.int64)
    i = L
    for j in range(L):
        sa_rows[i] = L - j
        c = int(bwt[i])
        r = int(occ[i, c]) - (1 if (c == 0 and z < i) else 0)
        i = int(C[c]) + r
    sa_rows[i] = 0
    step = 1 << hdr["off_rate"]
    rows = np.arange(offs.size) << hdr["off_rate"]
    want = sa_rows[rows]
    eq = (offs == want)
    assert eq.all(), (offs[~eq][:5], want[~eq][:5])


def test_ht2_alignment(ht2_index):
    """Align reads against the loaded .ht2 index and check placements."""
    from hisat2_tpu.io.ht2 import load_ht2
    from hisat2_tpu.align.pipeline import Aligner
    from hisat2_tpu.io.reads import Read, batchify

    prefix, seqs = ht2_index
    fm = load_ht2(str(prefix))
    al = Aligner(fm)
    rng = np.random.default_rng(4)
    joined = fm.ref.joined
    reads, truth = [], []
    for i in range(64):
        st = int(rng.integers(0, joined.size - 80))
        s = joined[st:st + 80].copy()
        if i % 2:
            s = alphabet.revcomp(s)
        reads.append(Read(f"h{i}", s, np.full(80, 40, np.int8), i))
        truth.append(st)
    batch = batchify(reads, pad_to=80)
    res = al.align_batch(batch)
    ok = 0
    for i, r in enumerate(res):
        if r.aligned:
            jp = fm.ref.text_to_joined(r.alns[0].tidx, r.alns[0].toff)
            ok += jp == truth[i]
    assert ok >= 63, f"{ok}/64"
