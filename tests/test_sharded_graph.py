"""Graph (SNP) indexes over genome shards: the sharded equivalent of the
reference's GRCh38+SNP large-index config (.ht2l graph mode,
MANUAL.markdown:221-231). Alt-allele reads must place exactly and score
the alt base free in every shard; output must match the single
(unsharded) graph index."""

import io

import numpy as np
import pytest

from hisat2_tpu.io.reference import reference_from_seqs
from hisat2_tpu.io.annotations import read_snps
from hisat2_tpu.index.graph_index import build_graph_index
from hisat2_tpu.index.sharded import build_sharded
from hisat2_tpu.align.sharded import ShardedAligner
from hisat2_tpu.align.pipeline import Aligner
from hisat2_tpu.align.emit import align_and_emit, _samfmt
from hisat2_tpu.utils import alphabet
from hisat2_tpu.io import sam as samio
from hisat2_tpu.io.reads import Read, batchify


@pytest.fixture(scope="module")
def graph_setup(tmp_path_factory):
    rng = np.random.default_rng(97)
    codes = {f"chr{k}": rng.integers(0, 4, 15000).astype(np.uint8)
             for k in range(1, 4)}
    ref = reference_from_seqs({k: alphabet.decode(v)
                               for k, v in codes.items()})
    lines = []
    i = 0
    for k in range(1, 4):
        for p in range(300, 14500, 700):
            alt = (int(codes[f"chr{k}"][p]) + 1) % 4
            lines.append(f"rs{i}\tsingle\tchr{k}\t{p}\t{'ACGT'[alt]}")
            i += 1
    d = tmp_path_factory.mktemp("shgraph")
    sp = d / "t.snp"
    sp.write_text("\n".join(lines) + "\n")
    snps = read_snps(str(sp), ref)
    return ref, snps, rng


def _reads(ref, snps, rng, n=192):
    joined = ref.joined
    reads = []
    jset = snps.jpos
    for i in range(n):
        st = int(rng.integers(0, joined.size - 80))
        s = joined[st:st + 80].copy()
        # plant the alt allele when a SNP falls inside the read
        inside = jset[(jset >= st) & (jset < st + 80)]
        for jp in inside[:2]:
            s[int(jp) - st] = int(
                snps.alt_codes[int(np.searchsorted(jset, jp))])
        if rng.random() < 0.5:
            s = alphabet.revcomp(s)
        reads.append(Read(f"g{i}_{st}", s, np.full(80, 40, np.int8), i))
    return batchify(reads, pad_to=80)


@pytest.mark.skipif(_samfmt() is None, reason="native formatter unavailable")
def test_sharded_graph_matches_single(graph_setup):
    ref, snps, rng = graph_setup
    sh = build_sharded(ref, max_bases=16000, snps=snps)
    assert len(sh) == 3
    assert all(s.patch_start.size == sh.shards[0].patch_start.size
               for s in sh.shards)          # harmonized

    fm = build_graph_index(ref, snps, ftab_k=6)
    batch = _reads(ref, snps, rng)

    b1 = io.StringIO()
    w1 = samio.SamWriter(b1, ref.names, [int(x) for x in ref.tlens],
                         no_head=True)
    st1 = align_and_emit(Aligner(fm), batch, w1)

    b2 = io.StringIO()
    w2 = samio.SamWriter(b2, ref.names, [int(x) for x in ref.tlens],
                         no_head=True)
    st2 = ShardedAligner(sh).align_and_emit([batch], w2)

    a = b1.getvalue().splitlines()
    b = b2.getvalue().splitlines()
    assert len(a) == len(b)
    diffs = [(x, y) for x, y in zip(a, b) if x != y]
    assert not diffs, diffs[:3]
    assert st1 == st2


@pytest.mark.skipif(_samfmt() is None, reason="native formatter unavailable")
def test_sharded_graph_alt_free(graph_setup):
    """A read carrying the alt allele in the LAST shard aligns at the
    exact position with NM 0 (the alt base costs nothing)."""
    ref, snps, rng = graph_setup
    sh = build_sharded(ref, max_bases=16000, snps=snps)
    # pick a SNP in the last shard
    base = sh.bases[-1]
    sel = int(np.flatnonzero(snps.jpos >= base)[3])
    jp = int(snps.jpos[sel])
    st = jp - 40
    s = ref.joined[st:st + 80].copy()
    s[40] = int(snps.alt_codes[sel])
    batch = batchify([Read("alt", s, np.full(80, 40, np.int8), 0)],
                     pad_to=80)
    buf = io.StringIO()
    w = samio.SamWriter(buf, ref.names, [int(x) for x in ref.tlens],
                        no_head=True)
    ShardedAligner(sh).align_and_emit([batch], w)
    rec = [l for l in buf.getvalue().splitlines()
           if not l.startswith("@")][0]
    f = rec.split("\t")
    assert int(f[1]) & 4 == 0
    # exact global placement on the right chromosome
    tidx = int(np.searchsorted(ref.frag_joined, st, side="right") - 1)
    exp_rname = ref.names[int(ref.frag_tidx[tidx])]
    assert f[2] == exp_rname
    assert "NM:i:0" in rec and "AS:i:0" in rec
