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


def _grid_cell(cap: Capacity, alive, fat_lo, fat_hi):
    """Grid cell size = widest NON-big fat extent, after demoting
    non-outlier bigs (keep in sync with the top_k + `genuine` demotion in
    find_pairs, which also needs the big ids)."""
    S = alive.shape[0]
    B = min(cap.big_shape_cap, max(S - 1, 1))
    extent = jnp.where(alive, jnp.maximum(fat_hi[:, 0] - fat_lo[:, 0],
                                          fat_hi[:, 1] - fat_lo[:, 1]),
                       -jnp.inf)
    kb = min(B + 1, S)
    top_ext, _ = jax.lax.top_k(extent, kb)
    cell0 = jnp.maximum(top_ext[kb - 1], 1e-3)
    genuine = top_ext[:B] > 2.0 * cell0
    return jnp.maximum(
        cell0, jnp.max(jnp.where(genuine, -jnp.inf, top_ext[:B]),
                       initial=-jnp.inf))


def _box_overlap(a, b):
    """(…, 4) fat-AABB overlap, broadcasting."""
    return ((a[..., 0] <= b[..., 2]) & (b[..., 0] <= a[..., 2])
            & (a[..., 1] <= b[..., 3]) & (b[..., 1] <= a[..., 3]))


def _compact_ids(mask, k):
    """First k set lanes of `mask`, ascending (ids, ok)."""
    n = mask.shape[0]
    big = jnp.int32(1 << 30)
    score = jnp.where(mask, jnp.arange(n, dtype=jnp.int32), big)
    neg, _ = jax.lax.top_k(-score, min(k, n))
    ids = -neg
    return jnp.clip(ids, 0, n - 1), ids < big


# per-escaped-shape slots for NEW pairs (a shape that just escaped its
# 0.05-margin fat box gains O(1) partners per step) and per-shape slots for
# new escaped-BIG partners; truncation is counted in Profile.overflow_pairs
# and forces a full rebuild next step (see `full` predicate)
_REPAIR_KE = 8
_REPAIR_KB = 4
_REPAIR_EB = 8   # max escaped grid-big shapes handled incrementally


def _repair_pairs(state: WorldState, cap: Capacity, bp, cache, fat_t,
                  esc, wide, custom_filter=None):
    """Incrementally repair the persistent pair buffer after a small set of
    shapes escaped their fat AABBs (ref: the O(moved) BufferMove/FindPairs
    path, src/BroadPhase.cs:56,197-268 — the reference never rebuilds the
    whole pair set either).

    Invariant maintained: valid lanes = exactly the fat-overlapping
    admissible pairs under the CURRENT fat boxes (guaranteed by the previous
    full build whenever its overflow == 0). Therefore:
      - pairs between two non-escaped shapes are untouched (their fat boxes
        did not change);
      - existing lanes with an escaped endpoint are re-tested and
        invalidated when the new fat boxes no longer overlap (orphaning
        touching pairs for contact_end events);
      - NEW pairs = overlap(new fat) & ~overlap(old fat) with at least one
        escaped endpoint — found exactly by two dense passes (escaped-small
        rows x all shapes; all shapes x escaped-big columns), deduped purely
        geometrically, then scattered into free lanes.
    Lane-stable: surviving pairs keep their lanes, so the lane-aligned
    contact cache (warm impulses, feature ids, colors) needs NO remap."""
    sh = state.shapes
    b = state.bodies
    S = fat_t.shape[0]
    P = bp.shape_a.shape[0]
    alive = bp.alive
    all_ids = jnp.arange(S, dtype=jnp.int32)
    fat_new = jnp.where(esc[:, None], fat_t, bp.fat)
    old_fat = bp.fat
    esc_big = esc & wide
    esc_small = esc & ~wide

    # ---- re-validate existing lanes with an escaped endpoint --------------
    ab = jnp.stack([bp.shape_a, bp.shape_b], axis=1)        # (P, 2)
    esc_ab = esc[ab]                                        # one (P,2) gather
    touched_lane = bp.valid & (esc_ab[:, 0] | esc_ab[:, 1])
    fr = fat_new[ab]                                        # one (P,2,4) gather
    still = _box_overlap(fr[:, 0], fr[:, 1])
    valid2 = bp.valid & (~touched_lane | still)
    inval = bp.valid & ~valid2
    orphan = inval & cache.touching

    body_of = sh.body
    dyn = b.type[body_of] == DYNAMIC

    # ---- pass A: escaped small shapes vs everything ------------------------
    E = min(cap.bp_repair_cap, S)
    eids, e_ok = _compact_ids(esc_small, E)
    E = eids.shape[0]
    ef_new = fat_new[eids]
    ef_old = old_fat[eids]
    e_body = body_of[eids]
    e_dyn = dyn[eids]
    now_a = _box_overlap(ef_new[:, None, :], fat_new[None, :, :])
    was_a = _box_overlap(ef_old[:, None, :], old_fat[None, :, :])
    ok_a = (now_a & ~was_a & e_ok[:, None] & alive[None, :]
            & (e_body[:, None] != body_of[None, :])
            & (e_dyn[:, None] | dyn[None, :])
            & (eids[:, None] != all_ids[None, :])
            # escaped-big partners are pass B's to emit
            & ~esc_big[None, :]
            # small-small both-escaped pairs emit once, from the lower id
            & (~esc_small[None, :] | (eids[:, None] < all_ids[None, :])))
    rank_a = jnp.cumsum(ok_a, axis=1, dtype=jnp.int32) - 1
    cnt_a = rank_a[:, -1] + 1
    nbr_a = jnp.stack(
        [jnp.max(jnp.where(ok_a & (rank_a == k), all_ids[None, :], -1),
                 axis=1) for k in range(_REPAIR_KE)], axis=1)  # (E, KE)
    ovf_repair = jnp.sum(jnp.maximum(cnt_a - _REPAIR_KE, 0))

    # ---- pass B: everything vs escaped big shapes ---------------------------
    gids, g_ok = _compact_ids(esc_big, _REPAIR_EB)
    EB = gids.shape[0]
    gf_new = fat_new[gids]
    gf_old = old_fat[gids]
    g_body = body_of[gids]
    g_dyn = dyn[gids]
    now_b = _box_overlap(fat_new[:, None, :], gf_new[None, :, :])
    was_b = _box_overlap(old_fat[:, None, :], gf_old[None, :, :])
    ok_b = (now_b & ~was_b & g_ok[None, :] & alive[:, None]
            & (body_of[:, None] != g_body[None, :])
            & (dyn[:, None] | g_dyn[None, :])
            & (all_ids[:, None] != gids[None, :])
            # big-big both-escaped pairs emit once, from the lower id side
            & (~esc_big[:, None] | (all_ids[:, None] < gids[None, :])))
    rank_b = jnp.cumsum(ok_b, axis=1, dtype=jnp.int32) - 1
    cnt_b = rank_b[:, -1] + 1
    nbr_b = jnp.stack(
        [jnp.max(jnp.where(ok_b & (rank_b == k), gids[None, :], -1),
                 axis=1) for k in range(_REPAIR_KB)], axis=1)  # (S, KB)
    ovf_repair = ovf_repair + jnp.sum(jnp.maximum(cnt_b - _REPAIR_KB, 0))

    # ---- compact candidates, filter, scatter into free lanes ---------------
    cand_a = jnp.concatenate(
        [jnp.broadcast_to(eids[:, None], nbr_a.shape).reshape(-1),
         all_ids.repeat(_REPAIR_KB)])
    cand_b = jnp.concatenate([nbr_a.reshape(-1), nbr_b.reshape(-1)])
    cand_ok = cand_b >= 0
    NEW = min(max(cap.bp_repair_cap, 128), cand_ok.shape[0], P)
    pos, new_ok = _compact_ids(cand_ok, NEW)
    na = cand_a[pos]
    nb_ = jnp.maximum(cand_b[pos], 0)
    lo = jnp.minimum(na, nb_)
    hi = jnp.maximum(na, nb_)

    # residual admissibility on the compacted candidates — mirrors the tail
    # of find_pairs (category/group filters, joint exclusions, custom hook)
    if cap.has_filters:
        cat = sh.filter_category
        msk = sh.filter_mask
        grp = sh.filter_group
        ga, gb = grp[lo], grp[hi]
        same_group = (ga == gb) & (ga != 0)
        group_pass = jnp.where(
            same_group, ga > 0,
            ((cat[lo] & msk[hi]) != 0) & ((cat[hi] & msk[lo]) != 0))
        new_ok = new_ok & group_pass
    if cap.has_joint_exclusions:
        j = state.joints
        jex = j.enabled & ~j.collide_connected & (j.body_a >= 0)
        ba = body_of[lo]
        bb = body_of[hi]
        hit = (((ba[:, None] == j.body_a[None, :])
                & (bb[:, None] == j.body_b[None, :]))
               | ((ba[:, None] == j.body_b[None, :])
                  & (bb[:, None] == j.body_a[None, :]))) & jex[None, :]
        new_ok = new_ok & ~jnp.any(hit, axis=1)
    if custom_filter is not None:
        new_ok = new_ok & jnp.asarray(custom_filter(state, lo, hi), bool)

    free_lanes, free_ok = _compact_ids(~valid2, NEW)
    # candidates beyond the free-lane supply are dropped (counted below; the
    # resulting overflow forces a full rebuild next step, which recovers them)
    slot_ok = new_ok & free_ok
    ovf_repair = (ovf_repair
                  + jnp.sum(new_ok & ~free_ok)
                  + jnp.maximum(jnp.sum(cand_ok) - NEW, 0))
    tgt = jnp.where(slot_ok, free_lanes, P)
    sa2 = bp.shape_a.at[tgt].set(lo, mode="drop")
    sb2 = bp.shape_b.at[tgt].set(hi, mode="drop")
    valid3 = valid2.at[tgt].set(True, mode="drop")
    # fresh lanes must not warm-match stale cache rows; invalidated lanes
    # must not warm-match their dead pair
    ka2 = jnp.where(inval, -1, cache.key_a).at[tgt].set(-1, mode="drop")
    kb2 = jnp.where(inval, -1, cache.key_b).at[tgt].set(-1, mode="drop")
    import dataclasses as _dc
    cache2 = _dc.replace(cache, key_a=ka2, key_b=kb2)
    count2 = jnp.sum(valid3).astype(jnp.int32)
    return (sa2, sb2, valid3, count2, ovf_repair.astype(jnp.int32),
            fat_new, cache2, orphan, jnp.int32(0))


def find_pairs_incremental(state: WorldState, cap: Capacity, aabbs,
                           custom_filter=None):
    """Persistent-pair fast path (ref: src/BroadPhase.cs BufferMove/pairSet):
    reuse the stored pair buffer unless some alive shape's tight AABB escaped
    its stored fat AABB, aliveness changed, or a host mutator set `dirty`.

    Three tiers (ref pays O(moved) per step, src/BroadPhase.cs:233-268):
      keep   — nothing escaped: reuse the buffer, zero work;
      repair — <= Capacity.bp_repair_cap shapes escaped (and <= 8 of them
               grid-big, and the last build had no overflow): lane-stable
               in-place repair (_repair_pairs), contact cache untouched;
      full   — dirty / aliveness changed / too many escapes / prior
               overflow: find_pairs + remap_cache re-alignment.

    Returns (PairBuffer, new BroadphaseStore, cache, orphan_mask, drops,
    kind) with kind 0/1/2 = keep/repair/full (Profile.pair_rebuild)."""
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
    esc = alive & ~inside
    n_esc = jnp.sum(esc)
    must_full = bp.dirty | jnp.any(alive != bp.alive)
    fat_t = jnp.concatenate([aabbs[:, :2] - AABB_MARGIN,
                             aabbs[:, 2:] + AABB_MARGIN], -1)

    def do_full(_):
        pb = find_pairs(state, cap, aabbs, custom_filter)
        new_ka = jnp.where(pb.valid, pb.shape_a, -1)
        new_kb = jnp.where(pb.valid, pb.shape_b, -1)
        new_cache, orphan, drops = remap_cache(
            cache, new_ka, new_kb, cap.max_contact_pairs)
        cell = _grid_cell(cap, alive, fat_t[:, :2], fat_t[:, 2:])
        return (pb.shape_a, pb.shape_b, pb.valid, pb.count, pb.overflow,
                fat_t, new_cache, orphan, drops, cell)

    def keep(_):
        return (bp.shape_a, bp.shape_b, bp.valid, bp.count, bp.overflow,
                bp.fat, cache, jnp.zeros(P, bool), jnp.int32(0), bp.cell)

    if cap.bp_repair_cap <= 0 or bp.cell is None:
        rebuild = must_full | (n_esc > 0)
        out = jax.lax.cond(rebuild, do_full, keep, None)
        kind = jnp.where(rebuild, 2, 0).astype(jnp.int32)
    else:
        # classify escaped shapes by CURRENT fat extent vs the stored grid
        # cell: wider-than-cell shapes may touch thousands of partners, so
        # they emit per-partner (pass B); more than _REPAIR_EB of those (or
        # a prior build overflow, which breaks the repair invariant) forces
        # a full rebuild. The 1.5 slack absorbs rotation: a grid-resident
        # shape's AABB extent was <= cell at build time, so any rotation
        # keeps it <= cell*sqrt(2) — without the slack, cell-sized boxes
        # tumbling at 45 deg misclassify as big and trip the _REPAIR_EB gate
        # every step (measured: tumbler-100 full-rebuilt 87/150 steps)
        ext_new = jnp.where(
            esc,
            jnp.maximum(fat_t[:, 2] - fat_t[:, 0], fat_t[:, 3] - fat_t[:, 1]),
            jnp.maximum(bp.fat[:, 2] - bp.fat[:, 0],
                        bp.fat[:, 3] - bp.fat[:, 1]))
        wide = ext_new > 1.5 * bp.cell
        n_big = jnp.sum(esc & wide)
        full = must_full | ((n_esc > 0)
                            & ((bp.overflow > 0)
                               | (n_esc > cap.bp_repair_cap)
                               | (n_big > _REPAIR_EB)))

        def not_full(_):
            return jax.lax.cond(
                n_esc > 0,
                lambda __: _repair_pairs(state, cap, bp, cache, fat_t,
                                         esc, wide, custom_filter)
                + (bp.cell,),
                keep, None)

        out = jax.lax.cond(full, do_full, not_full, None)
        kind = jnp.where(full, 2,
                         jnp.where(n_esc > 0, 1, 0)).astype(jnp.int32)

    sa, sb, valid, count, ovf, fat, cache2, orphan, drops, cell = out
    # a repair that dropped candidates broke the completeness invariant —
    # self-dirty so the NEXT step full-rebuilds even if nothing escapes
    # (an escaped shape can land and never escape again, which would
    # otherwise leave its dropped pair missing forever). Full-build
    # overflow does NOT dirty: rebuilding again cannot help window
    # truncation, and escapes already route it to the full branch.
    dirty_out = (kind == 1) & (ovf > 0)
    new_bp = BroadphaseStore(
        fat=fat, alive=alive, shape_a=sa, shape_b=sb, valid=valid,
        count=count, overflow=ovf, dirty=dirty_out, cell=cell)
    return (PairBuffer(sa, sb, valid, count, ovf), new_bp, cache2, orphan,
            drops, kind)


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
    cell0 = jnp.maximum(top_ext[kb - 1], 1e-3)  # widest non-big shape
    bigs = bigs[:min(B, S)]
    B = bigs.shape[0]
    # demote non-outlier "bigs" back to the grid: big_shape_cap is a CAP,
    # and top_k pads the big set with ordinary shapes when the scene has
    # fewer true outliers — a rotated container wall's AABB then overlaps
    # >KB of those fake bigs and the per-shape top_k silently drops pairs
    # (measured: tumbler's missing-pair source). A shape stays big only if
    # its extent clearly exceeds the provisional cell; demoted shapes
    # re-enter the grid and the cell grows to cover them (coverage
    # guarantee: two grid shapes overlapping have center distance
    # <= max(ext_a, ext_b) <= cell).
    genuine = top_ext[:B] > 2.0 * cell0
    cell = jnp.maximum(
        cell0, jnp.max(jnp.where(genuine, -jnp.inf, top_ext[:B]),
                       initial=-jnp.inf))
    big_valid = alive[bigs] & genuine
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
    # 15-bit row bias keeps the key POSITIVE: a 16-bit row bias (0x8000<<16)
    # sets the int32 sign bit for yi >= 0, which made rows >= 0 sort BEFORE
    # row -1 and broke the row-above scan exactly at the y=0 cell boundary
    # (the tumbler floor sits there — this was its silent pair-drop source).
    # Range: yi in [-16384, 16383] cells, xi in [-32768, 32767]; coords
    # beyond that wrap (same caveat the 16-bit column mask always had).
    key = jnp.where(alive_w,
                    (((yi + 0x4000) & 0x7FFF) << 16)
                    | ((xi + 0x8000) & 0xFFFF),
                    jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(key)
    skey = key[order]

    BLK = 128
    T = max(256, ((cap.bp_tile + BLK - 1) // BLK) * BLK)  # forward tile width
    K = max(4, min(W, 24))        # per-shape neighbor slots (overflow counted;
    #   dense churn piles >16 shapes into one scan span — measured on the
    #   tumbler — so the cap is 24, not 16)
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
