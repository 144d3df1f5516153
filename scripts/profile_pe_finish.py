#!/usr/bin/env python
"""cProfile the PE finish path (host consume+format) on one batch."""
from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B


def main():
    B._enable_compile_cache()
    from hisat2_tpu.align.pipeline import Aligner
    from hisat2_tpu.align import emit as E
    from hisat2_tpu.io import sam as samio
    import jax

    fm = B._get_index()
    al = Aligner(fm)
    PB = B.BATCH // 2
    b1, b2 = B._make_pairs(fm, PB, seed=301)

    def fresh_writer():
        return samio.SamWriter(io.StringIO(), fm.ref.names,
                               [int(x) for x in fm.ref.tlens], no_head=True)

    # warm
    h = E.submit_pe(al, b1, b2)
    E.finish_pe(al, h, fresh_writer())

    h = E.submit_pe(al, b1, b2)
    jax.block_until_ready(h[3][0])
    w = fresh_writer()
    pr = cProfile.Profile()
    pr.enable()
    E.finish_pe(al, h, w)
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(35)


if __name__ == "__main__":
    main()
