"""Read (FASTQ/FASTA/tab6/raw) input.

Equivalent role to the reference's pat.{h,cpp} PatternSource hierarchy
(SURVEY.md §2.4): FASTQ (default), FASTA (-f), raw (-r), cmdline (-c),
tab5/tab6 (--12). Where the reference hands one read at a time to each pthread
behind a lock, the TPU design consumes reads in large host batches that are
encoded/padded into dense (B, L) arrays for the device wavefront
(see batchify()).

Gzip/bzip2 inputs are decompressed transparently (the reference does this in
its Perl wrapper).
"""

from __future__ import annotations

import bz2
import gzip
import io
import os
from dataclasses import dataclass, field
from typing import Iterable, Iterator, Sequence

import numpy as np

from ..utils import alphabet


@dataclass
class Read:
    name: str
    seq: np.ndarray          # uint8 codes 0..4
    qual: np.ndarray | None  # phred scores (int), or None (FASTA)
    rdid: int = 0
    qc_ok: bool = True       # QSEQ filter field (--qc-filter)

    def __len__(self) -> int:
        return int(self.seq.size)

    @property
    def seq_str(self) -> str:
        return alphabet.decode(self.seq)

    @property
    def qual_str(self) -> str:
        if self.qual is None:
            return "I" * len(self)  # reference prints 'I's for FASTA reads
        return "".join(chr(q + 33) for q in self.qual)


def _open_text(path: str | os.PathLike) -> io.TextIOBase:
    path = os.fspath(path)
    if path.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"))
    if path.endswith(".bz2"):
        return io.TextIOWrapper(bz2.open(path, "rb"))
    return open(path, "rt")


# Solexa (pre-1.3 Illumina) quality -> phred (reference
# gen_solqual_lookup.pl / solexa_to_phred): p = 10*log10(1 + 10^(s/10))
_SOLEXA_TO_PHRED = np.asarray(
    [int(round(10 * np.log10(1 + 10 ** (s / 10.0))))
     for s in range(-10, 63)], np.int32)


def _parse_qual(qstr: str, qscale=False) -> np.ndarray:
    """Decode a quality string under `qscale`: False/"phred33" (default),
    True/"phred64", "solexa" (char-64 Solexa scale, converted to phred),
    or "int" (space-separated integers, reference --int-quals)."""
    if qscale == "int":
        q = np.asarray([int(x) for x in qstr.split()], np.int32)
        return np.clip(q, 0, 62)
    if qscale == "solexa":
        raw = np.frombuffer(qstr.encode("ascii"),
                            dtype=np.uint8).astype(np.int32) - 64
        return np.clip(_SOLEXA_TO_PHRED[np.clip(raw, -10, 62) + 10], 0, 62)
    off = 64 if (qscale is True or qscale == "phred64") else 33
    q = np.frombuffer(qstr.encode("ascii"), dtype=np.uint8).astype(np.int32) - off
    return np.clip(q, 0, 62)


def read_fastq(path, phred64=False, start_rdid: int = 0) -> Iterator[Read]:
    with _open_text(path) as fh:
        rdid = start_rdid
        while True:
            hdr = fh.readline()
            if not hdr:
                return
            hdr = hdr.strip()
            if not hdr:
                continue
            seq = fh.readline().strip()
            fh.readline()  # '+'
            qual = fh.readline().strip()
            yield Read(hdr[1:].split()[0], alphabet.encode(seq),
                       _parse_qual(qual, phred64), rdid)
            rdid += 1


def read_fasta(path, start_rdid: int = 0) -> Iterator[Read]:
    with _open_text(path) as fh:
        name, chunks, rdid = None, [], start_rdid
        for line in fh:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    yield Read(name, alphabet.encode("".join(chunks)), None, rdid)
                    rdid += 1
                name, chunks = line[1:].split()[0], []
            else:
                chunks.append(line)
        if name is not None:
            yield Read(name, alphabet.encode("".join(chunks)), None, rdid)


def read_tab6(path, phred64=False, start_rdid: int = 0) -> Iterator[tuple[Read, Read]]:
    """tab6: name1 seq1 qual1 name2 seq2 qual2 per line; tab5 omits name2
    (both mates share name1) — reference --12 accepts both."""
    with _open_text(path) as fh:
        rdid = start_rdid
        for line in fh:
            f = line.rstrip("\n").split("\t")
            if len(f) == 5:          # tab5: shared name
                f = [f[0], f[1], f[2], f[0], f[3], f[4]]
            if len(f) < 6:
                continue
            r1 = Read(f[0], alphabet.encode(f[1]), _parse_qual(f[2], phred64), rdid)
            r2 = Read(f[3], alphabet.encode(f[4]), _parse_qual(f[5], phred64), rdid)
            yield r1, r2
            rdid += 1


def read_raw(path, start_rdid: int = 0) -> Iterator[Read]:
    """Raw format (-r): one sequence per line, no names/quals."""
    with _open_text(path) as fh:
        rdid = start_rdid
        for line in fh:
            line = line.strip()
            if not line:
                continue
            yield Read(str(rdid), alphabet.encode(line), None, rdid)
            rdid += 1


def reads_from_cmdline(seqs: str, start_rdid: int = 0) -> Iterator[Read]:
    """Command-line reads (-c): comma-separated sequences."""
    for rdid, s in enumerate(seqs.split(","), start=start_rdid):
        if s:
            yield Read(str(rdid), alphabet.encode(s), None, rdid)


def read_qseq(path, phred64=True, start_rdid: int = 0
              ) -> Iterator[Read]:
    """Illumina QSEQ format (--qseq): tab-separated, seq in col 9, quals in
    col 10 (phred64), '.' means N (reference read_qseq.cpp)."""
    with _open_text(path) as fh:
        rdid = start_rdid
        for line in fh:
            f = line.rstrip("\n").split("\t")
            if len(f) < 10:
                continue
            name = "_".join(f[:7])
            seq = f[8].replace(".", "N")
            r = Read(name, alphabet.encode(seq),
                     _parse_qual(f[9], phred64), rdid)
            if len(f) > 10:
                r.qc_ok = f[10].strip() != "0"
            yield r
            rdid += 1


def read_reads(path, fmt: str | None = None, phred64=False,
               start_rdid: int = 0) -> Iterator[Read]:
    """Auto-dispatch on extension unless fmt given ('fastq'|'fasta')."""
    if fmt is None:
        p = os.fspath(path)
        for ext in (".gz", ".bz2"):
            if p.endswith(ext):
                p = p[: -len(ext)]
        fmt = "fasta" if p.endswith((".fa", ".fasta", ".mfa", ".fna", ".ffn")) else "fastq"
    if fmt == "fasta":
        return read_fasta(path, start_rdid)
    if fmt == "raw":
        return read_raw(path, start_rdid)
    if fmt == "qseq":
        return read_qseq(path, phred64, start_rdid)
    return read_fastq(path, phred64, start_rdid)


@dataclass
class ReadBatch:
    """Dense, device-ready batch of reads (the TPU unit of work).

    seqs:  (B, L) uint8 codes 0..4, padded with N(4)
    quals: (B, L) int8 phred, padded with 0
    lens:  (B,)   int32
    names/rdids kept host-side for SAM emission.
    """
    seqs: np.ndarray
    quals: np.ndarray
    lens: np.ndarray
    names: list[str] = field(default_factory=list)
    rdids: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    reads: list[Read] = field(default_factory=list)

    def __len__(self) -> int:
        return int(self.lens.size)

    def packed(self):
        """Transfer-packed form: (seq_words, n_words, quals_or_None,
        qual_const, lens).

        Host<->device moves through the tunnel run at only tens of MB/s
        with ~27ms per sync, so batch bytes are precious: sequences travel
        2-bit packed with a separate N bitmask (3 bits/base more compact
        than the uint8 codes), and a constant-quality batch (FASTA input,
        simulated reads) sends NO per-base qualities at all. The device
        unpack is a handful of VPU shift/mask ops
        (pipeline._unpack_reads)."""
        B, L = self.seqs.shape
        Lw = -(-L // 16)
        codes = np.minimum(self.seqs, 3).astype(np.uint32)
        pad16 = Lw * 16 - L
        if pad16:
            codes = np.pad(codes, ((0, 0), (0, pad16)))
        sh = (2 * np.arange(16, dtype=np.uint32))[None, None, :]
        seq_words = np.bitwise_or.reduce(
            codes.reshape(B, Lw, 16) << sh, axis=2).astype(np.uint32)
        Ln = -(-L // 32)
        isn = (self.seqs >= 4).astype(np.uint32)
        pad32 = Ln * 32 - L
        if pad32:
            isn = np.pad(isn, ((0, 0), (0, pad32)))
        shn = np.arange(32, dtype=np.uint32)[None, None, :]
        n_words = np.bitwise_or.reduce(
            isn.reshape(B, Ln, 32) << shn, axis=2).astype(np.uint32)
        in_read = np.arange(L)[None, :] < self.lens[:, None]
        qv = self.quals[in_read]
        if qv.size == 0 or (qv == qv[0]).all():
            return seq_words, n_words, None, int(qv[0]) if qv.size else 40, \
                self.lens
        return seq_words, n_words, self.quals, -1, self.lens


def batchify(reads: Sequence[Read], max_len: int | None = None,
             pad_to: int | None = None, default_qual: int = 40) -> ReadBatch:
    """Encode a list of reads into dense padded arrays.

    max_len truncates (reference caps reads too); pad_to forces the padded
    length (for static device shapes), else the max read length rounded up to
    a multiple of 8.
    """
    B = len(reads)
    L = max((len(r) for r in reads), default=1)
    if max_len is not None:
        L = min(L, max_len)
    if pad_to is not None:
        L = pad_to
    else:
        L = max(8, -(-L // 8) * 8)
    seqs = np.full((B, L), alphabet.N, dtype=np.uint8)
    quals = np.zeros((B, L), dtype=np.int8)
    lens = np.zeros(B, dtype=np.int32)
    names, rdids = [], np.zeros(B, dtype=np.int64)
    for i, r in enumerate(reads):
        n = min(len(r), L)
        seqs[i, :n] = r.seq[:n]
        quals[i, :n] = (r.qual[:n] if r.qual is not None
                        else np.full(n, default_qual, np.int8))
        lens[i] = n
        names.append(r.name)
        rdids[i] = r.rdid
    return ReadBatch(seqs, quals, lens, names, rdids, list(reads))


def batch_iter(reads: Iterable[Read], batch_size: int,
               pad_to: int | None = None) -> Iterator[ReadBatch]:
    buf: list[Read] = []
    for r in reads:
        buf.append(r)
        if len(buf) == batch_size:
            yield batchify(buf, pad_to=pad_to)
            buf = []
    if buf:
        yield batchify(buf, pad_to=pad_to)


def read_fasta_continuous(path, k: int, step: int = 1,
                          start_rdid: int = 0) -> Iterator[Read]:
    """-F k:<int>,i:<int> (reference pat.h FASTA_CONT): every `step`-th
    k-bp window of each sequence becomes a read named
    <seqname>_<offset>."""
    rdid = start_rdid
    for rec in read_fasta(path):
        codes = rec.seq
        for off in range(0, max(codes.size - k + 1, 0), step):
            yield Read(f"{rec.name}_{off}", codes[off:off + k], None, rdid)
            rdid += 1
