"""Multi-device alignment: data-parallel reads x model-parallel genome
shards over a jax.sharding.Mesh.

The reference's unit of parallelism is a pthread pulling one read at a
time from a locked PatternSource (hisat2.cpp:3679-3696); its only
cross-thread state is the splice-site table and merged metrics. The
TPU-native layout (SURVEY.md §2.6 P1/P5/P8):

  * mesh axes ("dp", "shard"): read batches shard along dp; the genome
    shards (index/sharded.py — each <2^31 bases, shapes harmonized)
    distribute along shard, one shard's arrays per device column;
  * the FULL fused SE pipeline (unpack -> seed -> verify -> DP ->
    merge -> fastpack, pipeline._stage_align_packed) runs per device on
    its (reads-slice, shard) block;
  * per-shard fastpacks ALL-GATHER over the shard axis and merge to
    global coordinates ON DEVICE (same policy as the single-chip
    shard-streaming merge, align/sharded.py);
  * summary counters PSUM over dp, so every device (and the host) sees
    whole-batch totals without extra transfers.

Single-shard genomes degenerate to pure data parallelism (shard axis 1).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, devices=None,
              n_shards: int = 1) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    n = len(devices)
    assert n % n_shards == 0, (n, n_shards)
    arr = np.asarray(devices).reshape(n // n_shards, n_shards)
    return Mesh(arr, axis_names=("dp", "shard"))


def replicate_index(idx: dict, mesh: Mesh) -> dict:
    """Place every index array on all devices (replicated sharding)."""
    repl = NamedSharding(mesh, P())
    out = {}
    for k, v in idx.items():
        if isinstance(v, jax.Array):
            out[k] = jax.device_put(v, repl)
        else:
            out[k] = v
    return out


def stack_shard_indexes(shards, mesh: Mesh) -> dict:
    """Stack the (shape-harmonized) shard device dicts along a leading
    axis sharded over the mesh's shard axis — each device column holds
    exactly its own genome shard's arrays. Non-array config leaves are
    dropped (the table-seeded pipeline derives them from shapes)."""
    sh = NamedSharding(mesh, P("shard"))
    dicts = [s.device for s in shards]
    out = {}
    for k, v in dicts[0].items():
        if isinstance(v, (int, float)):
            continue
        out[k] = jax.device_put(jnp.stack([d[k] for d in dicts]), sh)
    return out


def shard_batch(mesh: Mesh, *arrays):
    """Shard read-batch arrays along the dp axis (batch must divide
    evenly; callers pad the final batch)."""
    sh = NamedSharding(mesh, P("dp"))
    return tuple(jax.device_put(jnp.asarray(a), sh) for a in arrays)


def _merge_fp_device(fps, bases, KF: int):
    """Device-side equivalent of align/sharded._merge_shard_results:
    fps (S, B, W) int16 -> (fp_global (B, W) int16, multi_hit (B,) bool).
    """
    from ..align.pipeline import FASTPACK_REP
    S, B, W = fps.shape
    fpi = fps.astype(jnp.int32)
    nv = fpi[:, :, 0]
    best = fpi[:, :, 1]
    win = jnp.argmax(jnp.where(nv > 0, best, -32768), axis=0)   # (B,)
    hits = (nv > 0).sum(axis=0)
    fp = jnp.take_along_axis(fpi, win[None, :, None], axis=0)[0]  # (B, W)
    base_w = bases[win]                                           # (B,)
    cols = [fp[:, :4]]
    for k in range(KF):
        b0 = 4 + FASTPACK_REP * k
        lo = fp[:, b0].astype(jnp.uint32) & 0xFFFF
        hi = fp[:, b0 + 1].astype(jnp.uint32) & 0xFFFF
        pos = (lo | (hi << 16)) + base_w.astype(jnp.uint32)
        cols.append(jnp.stack(
            [(pos & 0xFFFF).astype(jnp.int32),
             ((pos >> 16) & 0xFFFF).astype(jnp.int32)], axis=1))
        cols.append(fp[:, b0 + 2:b0 + FASTPACK_REP])
    out = jnp.concatenate(cols, axis=1)
    # cross-shard second best (beats the winner's in-shard secbest when a
    # different shard also places the read)
    masked = jnp.where(nv > 0, best, -32768)
    masked = masked.at[win, jnp.arange(B)].set(-32768)
    other_best = masked.max(axis=0)
    out = out.at[:, 2].set(jnp.maximum(out[:, 2], other_best))
    lo16 = ((out << 16) >> 16)       # wrap like int16 without changing bits
    return lo16.astype(jnp.int16), hits >= 2


def fused_se_sharded(mesh: Mesh, aligner, bases, idx_stack: dict,
                     B: int, L: int):
    """jit the FULL fused SE step over the (dp, shard) mesh.

    aligner: pipeline.Aligner of any one shard (all shards share shapes
    and statics). Returns fn(sctab, seq_words, n_words, qual_const,
    lens) -> (fp_global (B,W) int16 [dp-sharded], multi (B,) bool,
    merged_all (B, S*K2, 3) int32 [global coords, score-sorted],
    aligned_total, multi_total [replicated scalars via psum over dp]).
    Constant-quality batches only (the bench/validation configs).
    """
    from jax.sharding import PartitionSpec
    from ..align.pipeline import _stage_align_packed

    o = aligner.opts
    sc = aligner.scoring
    K2 = min(2 * o.top_cands, max(8, o.khits + 3))
    KF = max(1, min(o.khits, 5))
    ndp = mesh.shape["dp"]
    Bl = B // ndp
    bases_arr = jnp.asarray(np.asarray(bases, np.int64).astype(np.int32))

    def local(idx, sctab, seq_w, n_w, qconst, lens):
        idx = {k: v[0] for k, v in idx.items()}     # this device's shard
        fp, merged = _stage_align_packed(
            idx, sctab, seq_w, n_w, None, qconst, lens,
            jnp.float32(sc.score_min.I), jnp.float32(sc.score_min.S),
            jnp.int32(min(sc.read_gap_open(), sc.ref_gap_open())),
            Bl, L, o.max_seeds, o.n_seeds, o.locs_per_seg, o.top_cands,
            aligner.min_seg_len, aligner.fm.ftab_k, K2, KF,
            min(Bl, max(32, Bl // 8)), min(Bl, max(64, Bl // 8)),
            o.dp_pad, o.no_dp, o.nofw, o.norc,
            aligner.seeder, aligner.fb_seeder, aligner.sc_const)
        # record all-gather across genome shards (SURVEY P5/P8)
        fps = jax.lax.all_gather(fp, "shard")            # (S, Bl, W)
        mg = jax.lax.all_gather(merged, "shard")         # (S, Bl, K2, 3)
        fp_g, multi = _merge_fp_device(fps, bases_arr, KF)
        sc_g = mg[:, :, :, 0]
        pos_g = mg[:, :, :, 1] + bases_arr[:, None, None]
        fl_g = mg[:, :, :, 2]
        mall = jnp.moveaxis(jnp.stack([sc_g, pos_g, fl_g], axis=3),
                            0, 1).reshape(Bl, -1, 3)
        order = jnp.argsort(-mall[:, :, 0], axis=1, stable=True)
        mall = jnp.take_along_axis(mall, order[:, :, None], axis=1)
        # whole-batch summary counters: psum over the dp axis
        aligned_total = jax.lax.psum((fp_g[:, 0] >= 1).sum(), "dp")
        multi_total = jax.lax.psum((fp_g[:, 0] >= 2).sum(), "dp")
        return fp_g, multi, mall, aligned_total, multi_total

    idx_specs = {k: P("shard") for k in idx_stack}
    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(idx_specs, P(), P("dp"), P("dp"), P(), P("dp")),
        out_specs=(P("dp"), P("dp"), P("dp"), P(), P()),
        check_vma=False)
    jf = jax.jit(f)
    return lambda sctab, seq_w, n_w, qconst, lens: jf(
        idx_stack, sctab, seq_w, n_w, qconst, lens)


def fused_rna_sharded(mesh: Mesh, aligner, bases, idx_stack: dict,
                      B: int, L: int, kss):
    """jit the fused SPLICED SE step (SE core + device splice pass-1/2,
    pipeline._stage_align_packed with spliced=True) over the (dp, shard)
    mesh. Junction lanes all-gather across genome shards with posA/posB
    rebased to global coordinates, so the host splice rescue sees one
    global lane set per read — the multi-device mirror of the
    single-chip fused RNA dispatch (the reference's equivalent search is
    SplicedAligner::hybridSearch_recur, spliced_aligner.h:331, with
    cross-thread SpliceSiteDB sharing, hisat2.cpp:3285-3308).

    kss: ssdb.device_arrays4() known-site tuple (replicated; shard-local
    coordinate conversion happens inside via the shard base offset).
    Returns fn(sctab, seq_w, n_w, qconst, lens) -> (fp_global, multi,
    lanes32 (B, S*NL, 2) int32 [global coords], lanes16 (B is implicit;
    (S*NL, 5) int16 lane meta with row ids in dp-local space], cov (Bl,)
    int32, aligned_total)."""
    from ..align.pipeline import _stage_align_packed

    o = aligner.opts
    sc = aligner.scoring
    K2 = min(2 * o.top_cands, max(8, o.khits + 3))
    KF = max(1, min(o.khits, 5))
    ndp = mesh.shape["dp"]
    Bl = B // ndp
    TB = min(Bl, max(256, 5 * Bl // 8))
    SPL = (TB, o.pairs_per_read, min(TB, max(128, TB // 4)), 4,
           2 * TB, o.dta, max(1, min(8, -(-o.max_intron // 65536))))
    # splice-trigger margin for constant-quality-40 batches (the
    # pipeline's _spl_margin with qmin=40)
    from ..ops.splice import MIN_ANCHOR_CANON
    margin = MIN_ANCHOR_CANON * min(int(sc.sc_pens()[40]),
                                    int(sc.mm_pens()[40]))
    bases_arr = jnp.asarray(np.asarray(bases, np.int64).astype(np.int32))

    def local(idx, sctab, kss_l, seq_w, n_w, qconst, lens):
        idx = {k: v[0] for k, v in idx.items()}
        # known sites are global-coordinate; shift into this shard's
        # local frame (sentinel INT32_MAX rows stay past any local pos)
        ax = jax.lax.axis_index("shard")
        base = bases_arr[ax]
        kss_s = tuple(jnp.where(a == np.int32(0x7FFFFFFF), a, a - base)
                      for a in kss_l)
        fp, merged, extras = _stage_align_packed(
            idx, sctab, seq_w, n_w, None, qconst, lens,
            jnp.float32(sc.score_min.I), jnp.float32(sc.score_min.S),
            jnp.int32(min(sc.read_gap_open(), sc.ref_gap_open())),
            Bl, L, o.max_seeds, o.n_seeds, o.locs_per_seg, o.top_cands,
            aligner.min_seg_len, aligner.fm.ftab_k, K2, KF,
            min(Bl, max(32, Bl // 8)), min(Bl, max(64, Bl // 8)),
            o.dp_pad, o.no_dp, o.nofw, o.norc,
            aligner.seeder, aligner.fb_seeder, aligner.sc_const,
            SB=Bl, spliced=True,
            spl_margin=jnp.int32(margin),
            spl_kss=kss_s,
            spl_nceil=(jnp.float32(sc.n_ceil.I), jnp.float32(sc.n_ceil.S)),
            spl_introns=(jnp.int32(o.min_intron), jnp.int32(o.max_intron)),
            SPL=SPL)
        fps = jax.lax.all_gather(fp, "shard")
        fp_g, multi = _merge_fp_device(fps, bases_arr, KF)
        sp32 = extras["splanes32"]            # (NL, 2) posA/posB local
        sp16 = extras["splanes16"]            # (NL, 5) row/fw/score/j/fl
        live = (sp16[:, 4] != 0)[:, None]
        sp32g = jnp.where(live, sp32 + base, 0)
        l32 = jax.lax.all_gather(sp32g, "shard").reshape(-1, 2)
        l16 = jax.lax.all_gather(sp16, "shard").reshape(-1, 5)
        cov = jax.lax.all_gather(extras["spl_cov"], "shard")
        # a row is device-covered only if EVERY shard covered it (bit 0
        # set, overflow bit 1 clear on all shards)
        cov_all = ((cov & 1).min(axis=0)
                   | (((cov >> 1) & 1).max(axis=0) << 1))
        aligned_total = jax.lax.psum((fp_g[:, 0] >= 1).sum(), "dp")
        return fp_g, multi, l32, l16, cov_all, aligned_total

    idx_specs = {k: P("shard") for k in idx_stack}
    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(idx_specs, P(), P(), P("dp"), P("dp"), P(), P("dp")),
        out_specs=(P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P()),
        check_vma=False)
    jf = jax.jit(f)
    return lambda sctab, seq_w, n_w, qconst, lens: jf(
        idx_stack, sctab, kss, seq_w, n_w, qconst, lens)


def _merge_pe_pack_device(packs, bases):
    """Device merge of per-shard PE packs (paired.PEPACK layout):
    packs (S, B, W) int16 -> (pack_global (B, W) int16, force_slow (B,)).
    Mates of a genuine pair share a chromosome, hence a shard, so each
    shard's concordance search is complete; the merge picks the
    best-total shard, rebases the 4 position lanes, folds other shards'
    best into secbest, and ORs the per-mate aux bits."""
    from ..align.paired import (PEPACK_MATE, PEPACK_REP, PEPACK_HDR,
                                pepack_nr)
    S, B, W = packs.shape
    NR = pepack_nr(W)
    pk = packs.astype(jnp.int32)
    nv = pk[:, :, 0]
    best = pk[:, :, 1]
    win = jnp.argmax(jnp.where(nv > 0, best, -32768), axis=0)
    hits = (nv > 0).sum(axis=0)
    fp = jnp.take_along_axis(pk, win[None, :, None], axis=0)[0]
    base_w = bases[win]
    cols = [fp[:, :PEPACK_HDR]]
    for k in range(NR):
        rb = PEPACK_HDR + PEPACK_REP * k
        cols.append(fp[:, rb:rb + 1])          # per-report flag lane
        for m in range(2):
            b0 = rb + 1 + m * PEPACK_MATE
            lo = fp[:, b0].astype(jnp.uint32) & 0xFFFF
            hi = fp[:, b0 + 1].astype(jnp.uint32) & 0xFFFF
            pos = (lo | (hi << 16)) + base_w.astype(jnp.uint32)
            cols.append(jnp.stack(
                [(pos & 0xFFFF).astype(jnp.int32),
                 ((pos >> 16) & 0xFFFF).astype(jnp.int32)], axis=1))
            cols.append(fp[:, b0 + 2:b0 + PEPACK_MATE])
    aux = pk[:, :, W - 1]
    aux_or = (aux & 1).max(axis=0) | (((aux >> 1) & 1).max(axis=0) << 1)
    cols.append(aux_or[:, None])
    out = jnp.concatenate(cols, axis=1)
    masked = jnp.where(nv > 0, best, -32768)
    masked = masked.at[win, jnp.arange(B)].set(-32768)
    out = out.at[:, 2].set(jnp.maximum(out[:, 2], masked.max(axis=0)))
    lo16 = ((out << 16) >> 16)
    return lo16.astype(jnp.int16), hits >= 2


def fused_pe_sharded(mesh: Mesh, aligner, bases, idx_stack: dict,
                     B: int, L: int):
    """jit the FULL fused PE step over the (dp, shard) mesh (SE analogue:
    fused_se_sharded). Returns fn(sctab, sw1, nw1, l1, sw2, nw2, l2,
    qconst) -> (pack_global (B, PEPACK_W+1) int16 [dp-sharded],
    force_slow (B,) bool, m1_all/m2_all (B, S*K2, 3) int32 [global
    coords, UNSORTED so pair_top indices stay valid], pt_all
    (B, S*KP, 3) [t1/t2 remapped into the concatenated grids, sorted by
    total], conc_total [psum over dp]). Constant-quality batches only."""
    from ..align.paired import _stage_pe_packed_impl

    o = aligner.opts
    sc = aligner.scoring
    K2 = min(2 * o.top_cands, max(8, o.khits + 3))
    KP = max(8, o.khits + 3)
    ndp = mesh.shape["dp"]
    Bl = B // ndp
    bases_arr = jnp.asarray(np.asarray(bases, np.int64).astype(np.int32))

    def local(idx, sctab, sw1, nw1, l1, sw2, nw2, l2, qconst):
        idx = {k: v[0] for k, v in idx.items()}
        pack, m1, m2, pt = _stage_pe_packed_impl(
            idx, sctab, sw1, nw1, l1, sw2, nw2, l2, qconst,
            jnp.float32(sc.score_min.I), jnp.float32(sc.score_min.S),
            jnp.int32(min(sc.read_gap_open(), sc.ref_gap_open())),
            jnp.int32(o.minins), jnp.int32(o.maxins),
            Bl, L, o.max_seeds, o.n_seeds, o.locs_per_seg, o.top_cands,
            aligner.min_seg_len, aligner.fm.ftab_k, K2, KP,
            min(Bl, max(32, Bl // 8)), min(Bl, max(64, Bl // 8)),
            o.dp_pad, o.no_dp, o.nofw, o.norc,
            aligner.seeder, aligner.fb_seeder, aligner.sc_const, o.fr,
            (o.dovetail, o.no_contain, o.no_overlap),
            n_rep=max(2, min(o.khits, 5)))
        packs = jax.lax.all_gather(pack, "shard")        # (S, Bl, W+1)
        m1g = jax.lax.all_gather(m1, "shard")            # (S, Bl, K2, 3)
        m2g = jax.lax.all_gather(m2, "shard")
        ptg = jax.lax.all_gather(pt, "shard")            # (S, Bl, KP, 3)
        pack_g, force_slow = _merge_pe_pack_device(packs, bases_arr)

        def glob(mg):
            scg = mg[:, :, :, 0]
            posg = mg[:, :, :, 1] + bases_arr[:, None, None]
            return jnp.moveaxis(
                jnp.stack([scg, posg, mg[:, :, :, 2]], axis=3),
                0, 1).reshape(Bl, -1, 3)

        m1_all = glob(m1g)
        m2_all = glob(m2g)
        S = ptg.shape[0]
        offs = jnp.arange(S, dtype=jnp.int32)[:, None, None] * K2
        ptm = jnp.stack([ptg[:, :, :, 0], ptg[:, :, :, 1] + offs,
                         ptg[:, :, :, 2] + offs], axis=3)
        ptm = jnp.moveaxis(ptm, 0, 1).reshape(Bl, -1, 3)
        order = jnp.argsort(-ptm[:, :, 0], axis=1, stable=True)
        ptm = jnp.take_along_axis(ptm, order[:, :, None], axis=1)
        conc_total = jax.lax.psum((pack_g[:, 0] >= 1).sum(), "dp")
        return pack_g, force_slow, m1_all, m2_all, ptm, conc_total

    idx_specs = {k: P("shard") for k in idx_stack}
    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(idx_specs, P(), P("dp"), P("dp"), P("dp"),
                  P("dp"), P("dp"), P("dp"), P()),
        out_specs=(P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P()),
        check_vma=False)
    jf = jax.jit(f)
    return lambda sctab, sw1, nw1, l1, sw2, nw2, l2, qconst: jf(
        idx_stack, sctab, sw1, nw1, l1, sw2, nw2, l2, qconst)
