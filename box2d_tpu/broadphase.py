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


def compute_shape_aabbs(state: WorldState):
    """World-space AABBs for all shapes from current body transforms
    (ref: include/Collision.cs ComputeAABB per geometry)."""
    sh = state.shapes
    b = state.bodies
    origin = b.origin  # (Nb, 2)
    p = origin[sh.body]      # (S, 2)
    q = b.rot[sh.body]       # (S, 2)
    wv = m.rot_vec(q[:, None, :], sh.verts) + p[:, None, :]   # (S, 8, 2)
    lane_ok = (_LANES[None, :] < sh.count[:, None])[..., None]
    lo = jnp.min(jnp.where(lane_ok, wv, jnp.inf), axis=1) - sh.radius[:, None]
    hi = jnp.max(jnp.where(lane_ok, wv, -jnp.inf), axis=1) + sh.radius[:, None]
    return jnp.concatenate([lo, hi], axis=-1)  # (S, 4)


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


def find_pairs_incremental(state: WorldState, cap: Capacity, aabbs):
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
        pb = find_pairs(state, cap, aabbs)
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


def find_pairs(state: WorldState, cap: Capacity, aabbs=None) -> PairBuffer:
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
    bg_a = jnp.broadcast_to(bigs[:, None], (B, S)).reshape(-1)
    bg_b = jnp.broadcast_to(all_ids[None, :], (B, S)).reshape(-1)
    bg_ok = (m.aabb_overlaps(
        jnp.concatenate([fat_lo[bigs][:, None, :].repeat(S, 1),
                         fat_hi[bigs][:, None, :].repeat(S, 1)], -1).reshape(-1, 4),
        jnp.concatenate([fat_lo[None, :, :].repeat(B, 0),
                         fat_hi[None, :, :].repeat(B, 0)], -1).reshape(-1, 4))
        & jnp.broadcast_to(big_valid[:, None], (B, S)).reshape(-1)
        & alive[bg_b] & (bg_a != bg_b)
        & (~is_big[bg_b] | (bg_a < bg_b)))

    # ---- grid-cell window pass ---------------------------------------------
    # NON-BIG shapes sorted by (row, column) cell key; overlapping non-big
    # pairs have center distance <= cell, so they sit in the same or adjacent
    # cells: forward same-row window + a row-above window cover all of them,
    # and each unordered pair is emitted exactly once (forward-only within a
    # row; row-above only from the lower shape). Bigs are covered by the
    # big-shape pass against everything.
    #
    # TPU cost note: random gathers run at ~3-9ns/element, so the pass
    # gathers the per-shape data into SORTED order once ((S,5) elements)
    # and then expresses the same-row window as W STATIC SHIFTS of the
    # sorted arrays — pure elementwise compares, zero gathers. Only the
    # row-above window (non-uniform start offsets) pays a gather, at W
    # lanes per shape.
    alive_w = alive & ~is_big
    inv_c = 1.0 / cell
    xi = jnp.floor(center[:, 0] * inv_c).astype(jnp.int32)
    yi = jnp.floor(center[:, 1] * inv_c).astype(jnp.int32)
    key = jnp.where(alive_w, ((yi + 0x8000) << 16) | ((xi + 0x8000) & 0xFFFF),
                    jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(key)
    skey = key[order]
    srow = skey >> 16
    s_box = jnp.concatenate([fat_lo, fat_hi], -1)[order]   # (S, 4) sorted
    s_alive = alive_w[order]

    def pad_shift(x, k, fill):
        # x shifted up by k with fill — a static slice + pad, not a gather
        return jnp.concatenate(
            [x[k:], jnp.full((k,) + x.shape[1:], fill, x.dtype)], 0)

    same_ok = []
    for k in range(1, W + 1):
        ok_k = (m.aabb_overlaps(s_box, pad_shift(s_box, k, 0.0))
                & (pad_shift(srow, k, -1) == srow)
                & s_alive & pad_shift(s_alive, k, False))
        same_ok.append(ok_k)
    same_ok = jnp.stack(same_ok, axis=1)                   # (S, W)
    pos = jnp.arange(S)
    same_b_pos = pos[:, None] + jnp.arange(1, W + 1)[None, :]

    up_key = skey + (1 << 16) - 1  # key(y+1, x-1)
    start_up = jnp.searchsorted(skey, up_key)
    raw_up = start_up[:, None] + jnp.arange(W)[None, :]
    cand_up = jnp.clip(raw_up, 0, S - 1)
    up_ok = (m.aabb_overlaps(s_box[:, None, :], s_box[cand_up])
             & (srow[cand_up] == srow[:, None] + 1)
             & (raw_up < S) & s_alive[:, None] & s_alive[cand_up])

    cand = jnp.concatenate([jnp.clip(same_b_pos, 0, S - 1), cand_up], axis=1)
    ov = jnp.concatenate([same_ok, up_ok], axis=1)         # (S, 2W)

    # ---- overflow detection ------------------------------------------------
    # window can only miss pairs when more than W shapes occupy the scanned
    # cell span; count same-row runs and row-above spans that exceed W
    run_end = jnp.searchsorted(skey, skey + 2)  # end of (y, x..x+1) span
    same_over = (run_end - pos - 1) > W
    up_end = jnp.searchsorted(skey, skey + (1 << 16) + 2)  # (y+1, x-1..x+1)
    up_over = (up_end - start_up) > W
    overflow_shapes = jnp.sum((same_over | up_over) & alive_w[order])

    # ---- compact -----------------------------------------------------------
    # every candidate is emitted EXACTLY once by construction (see the
    # uniqueness notes on the two passes above), so no dedupe sort is
    # needed. Compaction is two-level: a per-shape rank (axis-1 cumsum,
    # vectorized across rows) + one short (S,) cumsum for row bases —
    # a flat cumsum over all S*(2W+B) emission lanes costs multiple ms on
    # TPU. Window lanes carry SORTED positions; the map through `order`
    # happens after compaction, on P lanes instead of S*2W.
    rank_w = jnp.cumsum(ov, axis=1) - 1                    # (S, 2W)
    cnt_w = rank_w[:, -1] + 1          # == per-row total
    base_w = jnp.cumsum(cnt_w) - cnt_w                     # exclusive
    slot_w = jnp.where(ov, base_w[:, None] + rank_w, P)
    count_win = base_w[-1] + cnt_w[-1]

    flat_slot_w = slot_w.reshape(-1)
    pos_a_t = jnp.full((P,), -1, jnp.int32).at[flat_slot_w].set(
        jnp.broadcast_to(pos[:, None], cand.shape).reshape(-1), mode="drop")
    pos_b_t = jnp.full((P,), -1, jnp.int32).at[flat_slot_w].set(
        cand.reshape(-1), mode="drop")

    bg_ok2 = bg_ok.reshape(B, S)
    rank_b = jnp.cumsum(bg_ok2, axis=1) - 1
    cnt_b = rank_b[:, -1] + 1          # == per-row total
    base_b = count_win + jnp.cumsum(cnt_b) - cnt_b
    slot_b = jnp.where(bg_ok2, base_b[:, None] + rank_b, P).reshape(-1)
    count = count_win + jnp.sum(cnt_b)

    id_a_t = jnp.full((P,), -1, jnp.int32).at[slot_b].set(bg_a, mode="drop")
    id_b_t = jnp.full((P,), -1, jnp.int32).at[slot_b].set(bg_b, mode="drop")

    # resolve: window lanes map sorted-position -> shape id; big lanes are
    # already shape ids
    from_win = pos_a_t >= 0
    raw_a = jnp.where(from_win, order[jnp.clip(pos_a_t, 0, S - 1)], id_a_t)
    raw_b = jnp.where(from_win, order[jnp.clip(pos_b_t, 0, S - 1)], id_b_t)
    pair_valid = from_win | (id_a_t >= 0)
    shape_a = jnp.where(pair_valid, jnp.minimum(raw_a, raw_b), 0)
    shape_b = jnp.where(pair_valid, jnp.maximum(raw_a, raw_b), 0)

    pair_valid = pair_valid & _pair_should_collide(state, shape_a, shape_b)

    # exclusions from joints with collide_connected == False, applied on the
    # compacted (P, J) set (ref: src/Joint.cs:293 DestroyContactsBetweeenBodies)
    j = state.joints
    jex = j.enabled & ~j.collide_connected & (j.body_a >= 0)
    body = state.shapes.body
    ba = body[shape_a]
    bb = body[shape_b]
    hit = (
        ((ba[:, None] == j.body_a[None, :]) & (bb[:, None] == j.body_b[None, :]))
        | ((ba[:, None] == j.body_b[None, :]) & (bb[:, None] == j.body_a[None, :]))
    ) & jex[None, :]
    pair_valid = pair_valid & ~jnp.any(hit, axis=1)

    overflow = (overflow_shapes + jnp.maximum(count - P, 0)).astype(jnp.int32)
    return PairBuffer(shape_a, shape_b, pair_valid,
                      jnp.minimum(count, P).astype(jnp.int32), overflow)
