"""Embedding API — equivalent role to the reference's ht2lib C API
(hisat2lib/ht2.h: ht2_init, ht2_index_getrefnames, ht2_repeat_expand,
SURVEY.md §2.5) plus its Python wrapper (pymodule/ht2module.c).

The reference exposes a C handle over loaded GFM+RFM indexes; here the
handle is a thin object over the loaded FMIndex/GraphFMIndex (+ repeat
db when present), with the same operations:

    h = ht2.init("/path/to/index_prefix")
    h.get_refnames()                 -> ["chr1", ...]
    h.repeat_expand(name, pos, len)  -> [(chr_id, strand, pos), ...]
    h.align(reads)                   -> SAM-record strings (bonus: the
                                        reference has no align() in ht2lib)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Handle:
    fm: object
    aligner: object | None = None

    # ---- ht2_index_* ----

    def get_refnames(self) -> list[str]:
        return list(self.fm.ref.names)

    def get_reflens(self) -> list[int]:
        return [int(x) for x in self.fm.ref.tlens]

    # ---- ht2_repeat_* ----

    def repeat_expand(self, name: str, pos: int, length: int
                      ) -> list[tuple[int, int, int]]:
        """Expand a repeat-index alignment to genomic positions:
        [(chr_id, direction, pos), ...] (ht2_repeat.cpp:52 contract)."""
        rdb = getattr(self.fm, "repeat_db", None)
        if rdb is None:
            raise ValueError("index has no repeat database")
        return rdb.expand(name, pos, length)

    # ---- alignment (library embedding) ----

    def _get_aligner(self):
        if self.aligner is None:
            from .align.pipeline import Aligner
            self.aligner = Aligner(self.fm)
        return self.aligner

    def align(self, seqs: list[str], names: list[str] | None = None):
        """Align raw sequences; returns a list of ReadResult."""
        from .io.reads import Read, batchify
        from .utils import alphabet
        names = names or [f"r{i}" for i in range(len(seqs))]
        reads = [Read(n, alphabet.encode(s), None, i)
                 for i, (n, s) in enumerate(zip(names, seqs))]
        return self._get_aligner().align_batch(batchify(reads))


def init(prefix: str) -> Handle:
    """Load an index (ht2_init equivalent)."""
    from .index.fm_index import FMIndex
    return Handle(FMIndex.load(prefix))
