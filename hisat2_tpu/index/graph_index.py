"""SNP-aware ("graph") index: patched-fragment FM + SNV overlay.

Equivalent role to the reference's graph GFM/GBWT (gfm.h graph mode +
gbwt_graph.h RefGraph/PathGraph): align reads through known variants with
no penalty, reporting Zs:Z SNP edits.

TPU-first redesign (NOT a GBWT translation): the GBWT's mapGLF with F/M
bitvector rank/select is irregular pointer-chasing that maps poorly to a
batched wavefront. Instead:

  * the FM text is augmented with a short "patch" fragment per variant —
    flank + alt-allele + flank — so backward search finds seeds *through*
    any variant exactly as the graph index would (one alt per patch; the
    2F+len patch covers every read overlap of the variant given
    F >= read anchor length);
  * patch-region candidates translate back to primary-text diagonals with
    a per-patch shift (indels) before verification, so all downstream
    stages see only genomic coordinates;
  * scoring consults a dense 4-bit SNV overlay over the primary text:
    a mismatch whose read base equals a known alt allele costs nothing
    and is recorded as a SNP edit (ALT-compatible extension,
    hi_aligner.h GenomeHit::extend semantics).

Trade-off vs the reference: ~(2F+1)x|SNPs| extra indexed text (~20% of
genome at human SNP density) instead of the GBWT's F/M machinery — a
memory-for-regularity trade that keeps every hot op a dense batched
kernel. Haplotype-aware multi-SNP patches (reference .haplotype input)
layer on the same mechanism.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from functools import cached_property

import numpy as np

from ..io.annotations import SNPDB, SNP_SGL, SNP_DEL, SNP_INS
from ..io.reference import JoinedReference
from ..utils import alphabet
from .fm_index import FMIndex, build_fm_index, FORMAT_VERSION

DEFAULT_FLANK = 40


@dataclass
class GraphFMIndex(FMIndex):
    """FMIndex over the augmented text + variant metadata."""
    snps: SNPDB | None = None
    primary_n: int = 0
    patch_start: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    patch_ref: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    patch_vpos: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int32))
    patch_shift: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int32))
    patch_len: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int32))
    snv_overlay: np.ndarray = field(default_factory=lambda: np.zeros(0, np.uint8))
    # dense uint8 per primary position: 0 none, 1..4 alt+1, 15 multi

    @property
    def is_graph(self) -> bool:
        return True

    @cached_property
    def device(self) -> dict:
        import jax.numpy as jnp
        d = FMIndex.device.func(self)          # re-run base builder
        packed = _pack4(self.snv_overlay)
        nrn = -(-packed.size // 32)
        srows = np.zeros((nrn + 1, 32), np.uint32)
        srows.reshape(-1)[:packed.size] = packed
        d["snv_rows"] = jnp.asarray(srows)
        # 50%-overlapping row view (32 words at 16-word stride): overlay
        # windows <= 113 chars need ONE gather lane (see text_rows_ov).
        # Padded with 128 leading zero chars (16 words) so negative-start
        # windows come out aligned with no char-shift cascade (same
        # scheme as text_rows_ov).
        flat = np.zeros(16 + (nrn + 1) * 32, np.uint32)
        flat[16:16 + packed.size] = packed
        nro = max(1, -(-(packed.size + 16) // 16))
        sov = np.zeros((nro + 1, 32), np.uint32)
        for j in range(2):
            seg = flat[16 * j: 16 * (nro + j)].reshape(nro, 16)
            sov[:nro, 16 * j: 16 * (j + 1)] = seg
        d["snv_rows_ov"] = jnp.asarray(sov)
        d.update(
            primary_n=jnp.int32(self.primary_n),
            patch_start=jnp.asarray(self.patch_start.astype(np.int32)),
            patch_ref=jnp.asarray(self.patch_ref.astype(np.int32)),
            patch_vpos=jnp.asarray(self.patch_vpos),
            patch_shift=jnp.asarray(self.patch_shift),
            patch_len=jnp.asarray(self.patch_len),
            snv_packed=jnp.asarray(packed),
        )
        return d

    # ---------------- persistence ----------------

    def save(self, prefix: str) -> None:
        s = self.snps
        np.savez_compressed(
            prefix + ".npz",
            bwt_packed=self.bwt_packed, text_packed=self.text_packed,
            occ=self.occ, ccount=self.ccount, sa=self.sa, ftab=self.ftab,
            joined=self.ref.joined,
            frag_joined=self.ref.frag_joined, frag_toff=self.ref.frag_toff,
            frag_tidx=self.ref.frag_tidx, frag_len=self.ref.frag_len,
            tlens=self.ref.tlens,
            patch_start=self.patch_start, patch_ref=self.patch_ref,
            patch_vpos=self.patch_vpos, patch_shift=self.patch_shift,
            patch_len=self.patch_len, snv_overlay=self.snv_overlay,
            snp_types=s.types, snp_jpos=s.jpos, snp_lens=s.lens,
            snp_alt=s.alt_codes, snp_tpos=s.tpos,
            snp_names=np.asarray(s.names), snp_chroms=np.asarray(s.chroms),
            snp_ins=np.asarray([alphabet.decode(x) for x in s.ins_seqs]),
            known_ss=(self.known_ss if self.known_ss is not None
                      else np.zeros((0, 3), np.int64)),
            excluded_ss=(self.excluded_ss if self.excluded_ss is not None
                         else np.zeros((0, 3), np.int64)),
            st_starts=(self.st_starts if self.st_starts is not None
                       else np.zeros(0, np.int32)),
            st_pos=(self.st_pos if self.st_pos is not None
                    else np.zeros(0, np.int32)),
        )
        meta = dict(version=FORMAT_VERSION, n=self.n, zoff=self.zoff,
                    ftab_k=self.ftab_k, names=self.ref.names,
                    graph=True, primary_n=self.primary_n, st_k=self.st_k)
        with open(prefix + ".meta.json", "w") as fh:
            json.dump(meta, fh)

    @staticmethod
    def load(prefix: str) -> "GraphFMIndex":
        with open(prefix + ".meta.json") as fh:
            meta = json.load(fh)
        z = np.load(prefix + ".npz", allow_pickle=False)
        ref = JoinedReference(
            names=list(meta["names"]), tlens=z["tlens"], joined=z["joined"],
            frag_joined=z["frag_joined"], frag_toff=z["frag_toff"],
            frag_tidx=z["frag_tidx"], frag_len=z["frag_len"])
        snps = SNPDB(
            names=[str(x) for x in z["snp_names"]],
            types=z["snp_types"], jpos=z["snp_jpos"], lens=z["snp_lens"],
            alt_codes=z["snp_alt"],
            ins_seqs=[alphabet.encode(str(x)) for x in z["snp_ins"]],
            chroms=[str(x) for x in z["snp_chroms"]], tpos=z["snp_tpos"])
        return GraphFMIndex(
            ref=ref, n=meta["n"], zoff=meta["zoff"], ftab_k=meta["ftab_k"],
            bwt_packed=z["bwt_packed"], text_packed=z["text_packed"],
            occ=z["occ"], ccount=z["ccount"], sa=z["sa"], ftab=z["ftab"],
            snps=snps, primary_n=meta["primary_n"],
            patch_start=z["patch_start"], patch_ref=z["patch_ref"],
            patch_vpos=z["patch_vpos"], patch_shift=z["patch_shift"],
            patch_len=z["patch_len"], snv_overlay=z["snv_overlay"],
            known_ss=z["known_ss"] if "known_ss" in z else None,
            excluded_ss=(z["excluded_ss"] if "excluded_ss" in z
                         and z["excluded_ss"].size else None),
            st_k=meta.get("st_k", 0),
            st_starts=(z["st_starts"] if "st_starts" in z
                       and z["st_starts"].size else None),
            st_pos=(z["st_pos"] if "st_pos" in z
                    and z["st_pos"].size else None))


def _pack4(overlay: np.ndarray) -> np.ndarray:
    """Pack uint8 nibbles (values 0..15), 8 per uint32, LSB-first."""
    n = overlay.size
    nw = -(-max(n, 1) // 8)
    padded = np.zeros(nw * 8, np.uint32)
    padded[:n] = overlay
    lanes = padded.reshape(nw, 8)
    shifts = (4 * np.arange(8, dtype=np.uint32))[None, :]
    return np.bitwise_or.reduce(lanes << shifts, axis=1).astype(np.uint32)


def build_patches(text: np.ndarray, snps: SNPDB,
                  haplotypes: list[list[int]] | None = None,
                  flank: int = DEFAULT_FLANK):
    """Patch-fragment construction shared by the FM and table-only graph
    builders: returns (aug_text, patch arrays, snv overlay). Patch arrays
    are offsets into aug_text; overlay covers the primary text only."""
    n0 = int(text.size)
    chunks = [text]
    p_start, p_ref, p_vpos, p_shift, p_len = [], [], [], [], []
    cur = n0
    overlay = np.zeros(n0, np.uint8)
    for i in range(len(snps)):
        jp = int(snps.jpos[i])
        t = int(snps.types[i])
        ln = int(snps.lens[i])
        lo = max(0, jp - flank)
        left = text[lo:jp]
        if t == SNP_SGL:
            var = np.array([snps.alt_codes[i]], np.uint8)
            right = text[jp + 1: jp + 1 + flank]
            shift = 0
            overlay[jp] = (snps.alt_codes[i] + 1) if overlay[jp] == 0 else 15
        elif t == SNP_DEL:
            var = np.zeros(0, np.uint8)
            right = text[jp + ln: jp + ln + flank]
            shift = ln
        else:  # insertion
            var = snps.ins_seqs[i]
            right = text[jp: jp + flank]
            shift = -ln
        patch = np.concatenate([left, var, right])
        chunks.append(patch)
        p_start.append(cur)
        p_ref.append(lo)
        p_vpos.append(len(left) + (len(var) if t == SNP_INS else
                                   (1 if t == SNP_SGL else 0)))
        p_shift.append(shift)
        p_len.append(patch.size)
        cur += patch.size

    # haplotype patches: all variants of one phased group applied together
    for hap in (haplotypes or []):
        first = int(snps.jpos[hap[0]])
        lo = max(0, first - flank)
        parts = [text[lo:first]]
        shift = 0
        cursor = first
        ok = True
        for si in hap:
            jp = int(snps.jpos[si])
            if jp < cursor:
                ok = False
                break
            parts.append(text[cursor:jp])
            t = int(snps.types[si])
            ln = int(snps.lens[si])
            if t == SNP_SGL:
                parts.append(np.array([snps.alt_codes[si]], np.uint8))
                cursor = jp + 1
            elif t == SNP_DEL:
                cursor = jp + ln
                shift += ln
            else:
                parts.append(snps.ins_seqs[si])
                cursor = jp
                shift -= ln
        if not ok:
            continue
        parts.append(text[cursor:cursor + flank])
        patch = np.concatenate(parts)
        chunks.append(patch)
        p_start.append(cur)
        p_ref.append(lo)
        p_vpos.append(patch.size - min(flank, text.size - cursor))
        p_shift.append(shift)
        p_len.append(patch.size)
        cur += patch.size

    aug = np.concatenate(chunks)
    return (aug,
            np.asarray(p_start, np.int64), np.asarray(p_ref, np.int64),
            np.asarray(p_vpos, np.int32), np.asarray(p_shift, np.int32),
            np.asarray(p_len, np.int32), overlay)


def build_graph_index(ref: JoinedReference, snps: SNPDB, ftab_k: int = 10,
                      flank: int = DEFAULT_FLANK,
                      haplotypes: list[list[int]] | None = None
                      ) -> GraphFMIndex:
    """haplotypes: optional lists of SNP indices to co-apply in one patch
    (reference .haplotype input — phased variant combinations get their own
    indexed alt sequence, so a read carrying several nearby variants still
    seeds through all of them at once)."""
    text = ref.joined
    n0 = int(text.size)
    (aug, p_start, p_ref, p_vpos, p_shift, p_len,
     overlay) = build_patches(text, snps, haplotypes, flank)
    aug_ref = JoinedReference(
        names=ref.names, tlens=ref.tlens, joined=aug,
        frag_joined=ref.frag_joined, frag_toff=ref.frag_toff,
        frag_tidx=ref.frag_tidx, frag_len=ref.frag_len)
    base = build_fm_index(aug_ref, ftab_k=ftab_k)
    # keep the original (primary-only) reference for coordinates/verify —
    # but the packed text must cover the full augmented range for search;
    # verify windows only ever read primary positions, so re-point joined
    # to the primary slice while keeping text_packed augmented.
    prim_ref = JoinedReference(
        names=ref.names, tlens=ref.tlens, joined=text,
        frag_joined=ref.frag_joined, frag_toff=ref.frag_toff,
        frag_tidx=ref.frag_tidx, frag_len=ref.frag_len)
    return GraphFMIndex(
        ref=prim_ref, n=base.n, zoff=base.zoff, ftab_k=base.ftab_k,
        bwt_packed=base.bwt_packed, text_packed=base.text_packed,
        occ=base.occ, ccount=base.ccount, sa=base.sa, ftab=base.ftab,
        snps=snps, primary_n=n0,
        patch_start=p_start, patch_ref=p_ref, patch_vpos=p_vpos,
        patch_shift=p_shift, patch_len=p_len,
        snv_overlay=overlay,
        st_starts=base.st_starts, st_pos=base.st_pos, st_k=base.st_k)


def build_graph_table_index(ref: JoinedReference, snps: SNPDB,
                            haplotypes: list[list[int]] | None = None,
                            kt: int | None = None,
                            flank: int = DEFAULT_FLANK,
                            table_stride: int = 1) -> GraphFMIndex:
    """Seed-table-only graph index (the Gbp-shard builder): augmented
    text + patches + SNV overlay WITHOUT the FM components — the fused
    table-seeded pipeline never touches BWT/SA, and skipping the suffix
    array keeps GRCh38+SNP shard builds tractable (index/sharded.py)."""
    from .seed_table import build_seed_table, pick_kt

    text = ref.joined
    n0 = int(text.size)
    (aug, p_start, p_ref, p_vpos, p_shift, p_len,
     overlay) = build_patches(text, snps, haplotypes, flank)
    packed = alphabet.pack_2bit(aug)
    pad = (-packed.size) % 8
    if pad:
        packed = np.concatenate([packed, np.zeros(pad, np.uint32)])
    fm = GraphFMIndex(
        ref=ref, n=int(aug.size), zoff=0, ftab_k=1,
        bwt_packed=np.zeros(8, np.uint32),
        text_packed=packed,
        occ=np.zeros((2, 4), np.int32),
        ccount=np.asarray([1, 1, 1, 1, aug.size + 1], np.int32),
        sa=np.zeros(1, np.int32),
        ftab=np.zeros((4, 2), np.int32),
        snps=snps, primary_n=n0,
        patch_start=p_start, patch_ref=p_ref, patch_vpos=p_vpos,
        patch_shift=p_shift, patch_len=p_len,
        snv_overlay=overlay)
    if kt is None:
        kt = pick_kt(int(aug.size))
    fm.st_starts, fm.st_pos, fm.st_k = build_seed_table(
        aug, kt=kt, stride=table_stride)
    fm.st_stride = table_stride
    fm.table_only = True
    return fm
