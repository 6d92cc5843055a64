"""Broadphase: grid-cell candidate pair generation, fully in-jit.

TPU-first replacement for the reference's three dynamic BVH trees + moved
proxy buffers + pair sets (ref: src/DynamicTree.cs, src/BroadPhase.cs:28-268).
Instead of maintaining an incremental spatial index we rebuild the candidate
set every step from two vectorized passes:

1. *grid pass*: shapes hashed by fat-AABB center into square cells whose size
   is the largest non-big shape extent, sorted by (row, column) cell key;
   each shape scans a forward same-row window and a row-above window of W
   sorted entries. Any overlapping non-big pair has center distance <= cell,
   hence sits in the same or adjacent cells and is covered exactly once.
   (An x-only sweep-and-prune window fails on tall stacks — a 140-row
   pyramid puts 280 interval starts inside one box's x-extent.)
2. *big-shape pass*: the B largest shapes (ground, containers, long chains)
   test against every shape — the analog of the reference keeping statics in
   their own tree; huge shapes would blow any local-window guarantee.

Pairs can only be missed when more than W shapes occupy a scanned cell span —
counted in `overflow` (Profile.overflow_pairs), never silent.

Fat AABBs use AABB_MARGIN like the reference (ref: src/Shape.cs:64-75), which
also provides the speculative-contact slack.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import math2d as m
from .constants import AABB_MARGIN, MAX_POLYGON_VERTICES
from .state import DYNAMIC, Capacity, WorldState

_LANES = jnp.arange(MAX_POLYGON_VERTICES)


def compute_shape_aabbs(state: WorldState, max_verts: int = 8):
    """World-space AABBs for all shapes from current body transforms
    (ref: include/Collision.cs ComputeAABB per geometry).

    max_verts (Capacity.max_verts): vertex lanes beyond the scene-wide max
    polygon width are sliced off before the rotate/reduce (halves the vector
    work for box-only scenes); the body transform rides ONE packed gather.

    LANE-MAJOR: all math runs on (S,) columns — a (S, V, 2) intermediate
    tiles its 2-wide minor dim to 128 lanes (64x pad), costing ~2 ms/step
    at 10k shapes. Vertex columns come from the precomputed static shape
    table when its width matches (Shapes.table, rebuilt on host mutation)."""
    sh = state.shapes
    b = state.bodies
    V = max(2, min(max_verts, sh.verts.shape[1]))
    pq = jnp.concatenate([b.origin, b.rot], axis=1)[sh.body]  # (S, 4)
    px, py = pq[:, 0], pq[:, 1]
    qc, qs = pq[:, 2], pq[:, 3]
    tbl = sh.table
    if tbl is not None and tbl.shape[1] == 4 * V + 14:
        vx = [tbl[:, 2 * i] for i in range(V)]
        vy = [tbl[:, 2 * i + 1] for i in range(V)]
        radius = tbl[:, 4 * V]
        count = tbl[:, 4 * V + 1]
    else:
        vx = [sh.verts[:, i, 0] for i in range(V)]
        vy = [sh.verts[:, i, 1] for i in range(V)]
        radius = sh.radius
        count = sh.count.astype(jnp.float32)
    lox = hix = qc * vx[0] - qs * vy[0] + px   # vertex 0 is always valid
    loy = hiy = qs * vx[0] + qc * vy[0] + py
    for i in range(1, V):
        ok = count > i
        # dead vertex lanes fall back to vertex 0 (no effect on min/max)
        wx = jnp.where(ok, qc * vx[i] - qs * vy[i] + px, lox)
        wy = jnp.where(ok, qs * vx[i] + qc * vy[i] + py, loy)
        lox = jnp.minimum(lox, wx)
        loy = jnp.minimum(loy, wy)
        hix = jnp.maximum(hix, wx)
        hiy = jnp.maximum(hiy, wy)
    return jnp.stack([lox - radius, loy - radius,
                      hix + radius, hiy + radius], axis=-1)  # (S, 4)


class PairBuffer(NamedTuple):
    """Fixed-capacity candidate pair set."""

    shape_a: jnp.ndarray   # (P,) i32 canonical (a < b by index)
    shape_b: jnp.ndarray   # (P,) i32
    valid: jnp.ndarray     # (P,) bool
    count: jnp.ndarray     # i32 number of valid pairs
    overflow: jnp.ndarray  # i32 pairs potentially dropped (diagnostic)


def _pair_should_collide(state: WorldState, sa, sb):
    """Per-candidate admissibility (ref: src/Shape.cs ShouldShapesCollide +
    body-type rules)."""
    sh = state.shapes
    b = state.bodies
    ba = sh.body[sa]
    bb = sh.body[sb]
    one_dynamic = (b.type[ba] == DYNAMIC) | (b.type[bb] == DYNAMIC)
    grp_a = sh.filter_group[sa]
    grp_b = sh.filter_group[sb]
    same_group = (grp_a == grp_b) & (grp_a != 0)
    group_pass = jnp.where(
        same_group, grp_a > 0,
        ((sh.filter_category[sa] & sh.filter_mask[sb]) != 0)
        & ((sh.filter_category[sb] & sh.filter_mask[sa]) != 0))
    alive_a = sh.enabled[sa] & b.enabled[ba] & ~sh.is_sensor[sa]
    alive_b = sh.enabled[sb] & b.enabled[bb] & ~sh.is_sensor[sb]
    return (ba != bb) & one_dynamic & group_pass & alive_a & alive_b


def find_pairs_incremental(state: WorldState, cap: Capacity, aabbs,
                           custom_filter=None):
    """Persistent-pair fast path (ref: src/BroadPhase.cs BufferMove/pairSet):
    reuse the stored pair buffer unless some alive shape's tight AABB escaped
    its stored fat AABB, aliveness changed, or a host mutator set `dirty`.

    The per-lane contact cache (state.contacts) rides along: on the keep
    branch it is already lane-aligned with the unchanged pair buffer; on a
    rebuild it is re-aligned to the new lanes via narrowphase.remap_cache
    (transient hash), which also reports orphaned touching pairs (for
    contact_end events) and hash-congestion drops.

    Returns (PairBuffer, new BroadphaseStore, cache, orphan_mask, drops).
    Under vmap the cond lowers to both branches; single-world TPU scenes at
    rest skip the entire pair search + remap (~25 ms/step at 10k shapes)."""
    from .narrowphase import remap_cache
    from .state import BroadphaseStore

    bp = state.broadphase
    sh = state.shapes
    b = state.bodies
    cache = state.contacts
    P = cache.key_a.shape[0]
    alive = sh.enabled & b.enabled[sh.body] & ~sh.is_sensor
    inside = ((aabbs[:, 0] >= bp.fat[:, 0]) & (aabbs[:, 1] >= bp.fat[:, 1])
              & (aabbs[:, 2] <= bp.fat[:, 2]) & (aabbs[:, 3] <= bp.fat[:, 3]))
    rebuild = (bp.dirty | jnp.any(alive & ~inside)
               | jnp.any(alive != bp.alive))

    def do(_):
        pb = find_pairs(state, cap, aabbs, custom_filter)
        fat = jnp.concatenate([aabbs[:, :2] - AABB_MARGIN,
                               aabbs[:, 2:] + AABB_MARGIN], -1)
        new_ka = jnp.where(pb.valid, pb.shape_a, -1)
        new_kb = jnp.where(pb.valid, pb.shape_b, -1)
        new_cache, orphan, drops = remap_cache(
            cache, new_ka, new_kb, cap.max_contact_pairs)
        return (pb.shape_a, pb.shape_b, pb.valid, pb.count, pb.overflow,
                fat, new_cache, orphan, drops)

    def keep(_):
        return (bp.shape_a, bp.shape_b, bp.valid, bp.count, bp.overflow,
                bp.fat, cache, jnp.zeros(P, bool), jnp.int32(0))

    sa, sb, valid, count, ovf, fat, cache2, orphan, drops = jax.lax.cond(
        rebuild, do, keep, None)
    new_bp = BroadphaseStore(
        fat=fat, alive=alive, shape_a=sa, shape_b=sb, valid=valid,
        count=count, overflow=ovf, dirty=jnp.asarray(False))
    return PairBuffer(sa, sb, valid, count, ovf), new_bp, cache2, orphan, drops


def find_pairs(state: WorldState, cap: Capacity, aabbs=None,
               custom_filter=None) -> PairBuffer:
    if aabbs is None:
        aabbs = compute_shape_aabbs(state)
    S = aabbs.shape[0]
    W = min(cap.sap_window, max(S - 1, 1))
    B = min(cap.big_shape_cap, max(S - 1, 1))
    P = cap.max_contact_pairs
    sh = state.shapes
    b = state.bodies

    alive = sh.enabled & b.enabled[sh.body] & ~sh.is_sensor
    fat_lo = aabbs[:, :2] - AABB_MARGIN
    fat_hi = aabbs[:, 2:] + AABB_MARGIN
    center = 0.5 * (fat_lo + fat_hi)
    extent = jnp.where(alive, jnp.maximum(fat_hi[:, 0] - fat_lo[:, 0],
                                          fat_hi[:, 1] - fat_lo[:, 1]),
                       -jnp.inf)

    # ---- big-shape pass ----------------------------------------------------
    # the B largest shapes test against everything; the grid cell size below
    # is then the largest remaining extent, which GUARANTEES grid coverage
    kb = min(B + 1, S)
    top_ext, bigs = jax.lax.top_k(extent, kb)
    cell = jnp.maximum(top_ext[kb - 1], 1e-3)  # widest non-big shape
    bigs = bigs[:min(B, S)]
    B = bigs.shape[0]
    big_valid = alive[bigs]
    # big shapes are EXCLUDED from the grid-window pass below, so each
    # big-small pair is emitted exactly once here; big-big pairs are
    # canonicalized to a < b (uniqueness by construction replaces the
    # dedupe sort, see the merge section)
    is_big = jnp.zeros(S, bool).at[bigs].set(big_valid)
    all_ids = jnp.arange(S)
    body_of = sh.body
    body_dyn = b.type[body_of] == DYNAMIC
    # (S, B) overlap of every shape vs every big — pure elementwise
    # broadcasting (no (B*S, small) materialization: a (N, 2) i32 array
    # tiles to (N, 128) on TPU, which OOMed HBM at 1024 replicated worlds).
    # Each shape then compacts to at most KB big partners via top_k: a
    # non-big shape sits under few wide shapes (its world's ground plane,
    # a container wall), while a big shape may touch thousands — so the
    # pair is always emitted from the NON-big (or lower-id big) side.
    blo = fat_lo[bigs]
    bhi = fat_hi[bigs]
    ok_sb = ((fat_lo[:, 0:1] <= bhi[None, :, 0]) & (blo[None, :, 0] <= fat_hi[:, 0:1])
             & (fat_lo[:, 1:2] <= bhi[None, :, 1]) & (blo[None, :, 1] <= fat_hi[:, 1:2])
             & alive[:, None] & big_valid[None, :]
             & (body_of[:, None] != body_of[bigs][None, :])
             & (body_dyn[:, None] | body_dyn[bigs][None, :])
             & (all_ids[:, None] != bigs[None, :])
             # big-big pairs emit once, from the lower shape id
             & (~is_big[:, None] | (all_ids[:, None] < bigs[None, :])))
    KB = min(8, B)
    scoreB = jnp.where(ok_sb, B - jnp.arange(B)[None, :], 0)
    topB, _ = jax.lax.top_k(scoreB, KB)                 # (S, KB)
    b_slot_ok = topB > 0
    b_partner = bigs[jnp.clip(B - topB, 0, B - 1)]      # (S, KB) big ids
    overflow_big = jnp.sum(jnp.maximum(
        jnp.sum(ok_sb, axis=1) - KB, 0)).astype(jnp.int32)

    # ---- grid-cell block-tile pass -----------------------------------------
    # NON-BIG shapes sorted by (row, column) cell key; overlapping non-big
    # pairs have center distance <= cell, so they sit in the same or adjacent
    # cells. Sorted by (row, col), every such partner of shape i lies at a
    # HIGHER sorted position within i's row span or the row-above span, so a
    # forward scan of the next T-1 sorted entries covers all of them and each
    # unordered pair is emitted exactly once (from its lower position).
    # Bigs are covered by the big-shape pass against everything.
    #
    # TPU cost note: gathers/scatters cost per-OP (~1.3ms at 40k rows), so
    # the pass gathers per-shape data into SORTED order once (one packed row
    # gather), builds each 128-row block's T-wide forward tile from STATIC
    # slices of the sorted table (zero gathers), compares (NBlk, 128, T)
    # elementwise, and compacts per-shape to K neighbor slots by rank-match
    # reductions (no mega-scatter). Only the final (S, K) pair scatter and
    # the id resolution pay per-row costs.
    alive_w = alive & ~is_big
    inv_c = 1.0 / cell
    xi = jnp.floor(center[:, 0] * inv_c).astype(jnp.int32)
    yi = jnp.floor(center[:, 1] * inv_c).astype(jnp.int32)
    key = jnp.where(alive_w, ((yi + 0x8000) << 16) | ((xi + 0x8000) & 0xFFFF),
                    jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(key)
    skey = key[order]

    BLK = 128
    T = max(256, ((cap.bp_tile + BLK - 1) // BLK) * BLK)  # forward tile width
    K = max(4, min(W, 16))        # per-shape neighbor slots (overflow counted)
    n_blk = (S + BLK - 1) // BLK
    S_pad = n_blk * BLK

    body_f = sh.body.astype(jnp.float32)
    dyn_f = (b.type[sh.body] == DYNAMIC).astype(jnp.float32)
    unsorted = jnp.concatenate([
        fat_lo, fat_hi,
        alive_w.astype(jnp.float32)[:, None],
        body_f[:, None], dyn_f[:, None],
    ], axis=1)
    # ONE row gather brings everything into sorted order; the row column
    # comes from skey (already sorted)
    srt = jnp.concatenate([
        unsorted[order][:, :4],
        (skey >> 16).astype(jnp.float32)[:, None],
        unsorted[order][:, 4:],
    ], axis=1)                                             # (S, 8)
    pad_rows = S_pad + T - S
    srt = jnp.concatenate(
        [srt, jnp.zeros((pad_rows, srt.shape[1]), jnp.float32)], axis=0)
    blocks = srt[:S_pad].reshape(n_blk, BLK, srt.shape[1])

    # tile for block bk = sorted rows [bk*BLK, bk*BLK + T): built from T/BLK
    # static slices of the padded sorted table — no gathers
    tiles = jnp.stack(
        [srt[k * BLK: k * BLK + S_pad].reshape(n_blk, BLK, srt.shape[1])
         for k in range(T // BLK)], axis=1).reshape(n_blk, T, srt.shape[1])

    bi = blocks[:, :, None, :]                             # (NBlk, 128, 1, 8)
    tj = tiles[:, None, :, :]                              # (NBlk, 1, T, 8)
    l_loc = jnp.arange(BLK)[None, :, None]
    t_loc = jnp.arange(T)[None, None, :]
    overlap = ((bi[..., 0] <= tj[..., 2]) & (tj[..., 0] <= bi[..., 2])
               & (bi[..., 1] <= tj[..., 3]) & (tj[..., 1] <= bi[..., 3]))
    row_ok = (tj[..., 4] == bi[..., 4]) | (tj[..., 4] == bi[..., 4] + 1)
    ok = (overlap & row_ok & (t_loc > l_loc)
          & (bi[..., 5] > 0) & (tj[..., 5] > 0)            # alive
          & (bi[..., 6] != tj[..., 6])                     # different body
          & ((bi[..., 7] > 0) | (tj[..., 7] > 0)))         # one dynamic

    # ---- coverage overflow -------------------------------------------------
    # guaranteed forward coverage is T - BLK positions (a row at local l
    # sees T - l ahead); if the entry T-BLK ahead is still within the
    # (row, x-1 .. row+1, x+1) key range, neighbors may lie beyond the tile
    def pad_shift(x, k, fill):
        k = min(k, x.shape[0])
        return jnp.concatenate(
            [x[k:], jnp.full((k,), fill, x.dtype)], 0)

    ahead = pad_shift(skey, T - BLK, jnp.iinfo(jnp.int32).max)
    overflow_shapes = jnp.sum((ahead <= skey + (1 << 16) + 1)
                              & (skey != jnp.iinfo(jnp.int32).max))

    # ---- per-shape K-slot compaction (reductions, no scatter) -------------
    rank = jnp.cumsum(ok, axis=2, dtype=jnp.int32) - 1     # (NBlk, 128, T)
    cnt = rank[:, :, -1] + 1                               # (NBlk, 128)
    t_glob = (jnp.arange(n_blk)[:, None, None] * BLK + t_loc)
    nbr = []
    for k in range(K):
        sel = ok & (rank == k)
        nbr.append(jnp.max(jnp.where(sel, t_glob, -1), axis=2))
    nbr = jnp.stack(nbr, axis=2).reshape(S_pad, K)         # sorted positions
    cnt = cnt.reshape(S_pad)
    overflow_shapes = overflow_shapes + jnp.sum(jnp.maximum(cnt - K, 0))
    cntK = jnp.minimum(cnt, K)

    # ---- global slots + ONE packed pair scatter ---------------------------
    base_w = jnp.cumsum(cntK) - cntK                       # exclusive, (S_pad,)
    count_win = base_w[-1] + cntK[-1]
    karange = jnp.arange(K)[None, :]
    tgt = jnp.where((karange < cntK[:, None]) & (nbr >= 0),
                    base_w[:, None] + karange, P)          # (S_pad, K)
    pos_i = jnp.broadcast_to(jnp.arange(S_pad)[:, None], (S_pad, K))
    pair_pos = jnp.stack([pos_i, jnp.maximum(nbr, 0)], axis=-1)
    pos_ab = jnp.full((P + 1, 2), -1, jnp.int32).at[
        tgt.reshape(-1)].set(pair_pos.reshape(-1, 2), mode="drop")[:P]

    rank_b = jnp.cumsum(b_slot_ok, axis=1) - 1
    cnt_b = jnp.sum(b_slot_ok, axis=1)                     # (S,)
    base_b = count_win + jnp.cumsum(cnt_b) - cnt_b
    slot_b = jnp.where(b_slot_ok, base_b[:, None] + rank_b, P)  # (S, KB)
    count = count_win + jnp.sum(cnt_b)

    ids_bg = jnp.stack([
        jnp.broadcast_to(all_ids[:, None], b_partner.shape),
        b_partner], axis=-1)                               # (S, KB, 2)
    id_ab = jnp.full((P + 1, 2), -1, jnp.int32).at[
        slot_b.reshape(-1)].set(ids_bg.reshape(-1, 2), mode="drop")[:P]

    # resolve: window lanes map sorted-position -> shape id; big lanes are
    # already shape ids
    from_win = pos_ab[:, 0] >= 0
    ord_pad = jnp.concatenate([order, jnp.zeros(S_pad + T - S, jnp.int32)])
    ids_win = ord_pad[jnp.clip(pos_ab, 0, S_pad - 1)]      # one (P, 2) gather
    raw_a = jnp.where(from_win, ids_win[:, 0], id_ab[:, 0])
    raw_b = jnp.where(from_win, ids_win[:, 1], id_ab[:, 1])
    pair_valid = from_win | (id_ab[:, 0] >= 0)
    shape_a = jnp.where(pair_valid, jnp.minimum(raw_a, raw_b), 0)
    shape_b = jnp.where(pair_valid, jnp.maximum(raw_a, raw_b), 0)

    # residual admissibility: alive/sensor/enabled/same-body/one-dynamic
    # checks already happened inside the block and big passes, so only the
    # 32-bit category/group filters remain (they cannot ride the f32 block
    # tables). Scenes with all-default filters skip them at trace time.
    if cap.has_filters:
        ftbl = jnp.stack([
            sh.filter_category, sh.filter_mask,
            jax.lax.bitcast_convert_type(sh.filter_group, jnp.uint32),
        ], axis=1)                                         # (S, 3) u32
        fr = ftbl[jnp.stack([shape_a, shape_b], axis=1)]   # one (P,2,3) gather
        cat_a, msk_a = fr[:, 0, 0], fr[:, 0, 1]
        cat_b, msk_b = fr[:, 1, 0], fr[:, 1, 1]
        grp_a = jax.lax.bitcast_convert_type(fr[:, 0, 2], jnp.int32)
        grp_b = jax.lax.bitcast_convert_type(fr[:, 1, 2], jnp.int32)
        same_group = (grp_a == grp_b) & (grp_a != 0)
        group_pass = jnp.where(
            same_group, grp_a > 0,
            ((cat_a & msk_b) != 0) & ((cat_b & msk_a) != 0))
        pair_valid = pair_valid & group_pass

    # exclusions from joints with collide_connected == False, applied on the
    # compacted (P, J) set (ref: src/Joint.cs:293 DestroyContactsBetweeenBodies)
    if cap.has_joint_exclusions:
        j = state.joints
        jex = j.enabled & ~j.collide_connected & (j.body_a >= 0)
        bab = body_of[jnp.stack([shape_a, shape_b], axis=1)]  # one gather
        ba = bab[:, 0]
        bb = bab[:, 1]
        hit = (
            ((ba[:, None] == j.body_a[None, :])
             & (bb[:, None] == j.body_b[None, :]))
            | ((ba[:, None] == j.body_b[None, :])
               & (bb[:, None] == j.body_a[None, :]))
        ) & jex[None, :]
        pair_valid = pair_valid & ~jnp.any(hit, axis=1)

    # user custom filter (ref: include/Types.cs:813 CustomFilterFcn, applied
    # in the pair query src/BroadPhase.cs:170-180): a trace-time jittable
    # (state, shape_a, shape_b) -> keep mask evaluated on the candidate set
    if custom_filter is not None:
        pair_valid = pair_valid & jnp.asarray(
            custom_filter(state, shape_a, shape_b), bool)

    overflow = (overflow_shapes + overflow_big
                + jnp.maximum(count - P, 0)).astype(jnp.int32)
    return PairBuffer(shape_a, shape_b, pair_valid,
                      jnp.minimum(count, P).astype(jnp.int32), overflow)
