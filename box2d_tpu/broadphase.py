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
    all_ids = jnp.arange(S)
    bg_a = jnp.broadcast_to(bigs[:, None], (B, S)).reshape(-1)
    bg_b = jnp.broadcast_to(all_ids[None, :], (B, S)).reshape(-1)
    bg_ok = (m.aabb_overlaps(
        jnp.concatenate([fat_lo[bigs][:, None, :].repeat(S, 1),
                         fat_hi[bigs][:, None, :].repeat(S, 1)], -1).reshape(-1, 4),
        jnp.concatenate([fat_lo[None, :, :].repeat(B, 0),
                         fat_hi[None, :, :].repeat(B, 0)], -1).reshape(-1, 4))
        & jnp.broadcast_to(big_valid[:, None], (B, S)).reshape(-1)
        & alive[bg_b] & (bg_a != bg_b))

    # ---- grid-cell window pass ---------------------------------------------
    # shapes sorted by (row, column) cell key; overlapping non-big pairs have
    # center distance <= cell, so they sit in the same or adjacent cells:
    # forward same-row window + a row-above window cover all of them once.
    inv_c = 1.0 / cell
    xi = jnp.floor(center[:, 0] * inv_c).astype(jnp.int32)
    yi = jnp.floor(center[:, 1] * inv_c).astype(jnp.int32)
    key = jnp.where(alive, ((yi + 0x8000) << 16) | ((xi + 0x8000) & 0xFFFF),
                    jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(key)
    skey = key[order]
    srow = skey >> 16

    pos = jnp.arange(S)
    raw_same = pos[:, None] + jnp.arange(1, W + 1)[None, :]
    cand_same = jnp.clip(raw_same, 0, S - 1)
    up_key = skey + (1 << 16) - 1  # key(y+1, x-1)
    start_up = jnp.searchsorted(skey, up_key)
    raw_up = start_up[:, None] + jnp.arange(W)[None, :]
    cand_up = jnp.clip(raw_up, 0, S - 1)

    cand = jnp.concatenate([cand_same, cand_up], axis=1)  # (S, 2W)
    in_rng = jnp.concatenate([raw_same, raw_up], axis=1) < S
    row_ok = jnp.concatenate([
        srow[cand_same] == srow[:, None],
        srow[cand_up] == srow[:, None] + 1,
    ], axis=1)
    ia = jnp.broadcast_to(order[:, None], cand.shape)
    ib = order[cand]
    ov = (m.aabb_overlaps(
        jnp.concatenate([fat_lo[ia], fat_hi[ia]], -1),
        jnp.concatenate([fat_lo[ib], fat_hi[ib]], -1))
        & in_rng & row_ok & alive[ia] & alive[ib])
    win_a = ia.reshape(-1)
    win_b = ib.reshape(-1)
    win_ok = ov.reshape(-1)

    # ---- overflow detection ------------------------------------------------
    # window can only miss pairs when more than W shapes occupy the scanned
    # cell span; count same-row runs and row-above spans that exceed W
    run_end = jnp.searchsorted(skey, skey + 2)  # end of (y, x..x+1) span
    same_over = (run_end - pos - 1) > W
    up_end = jnp.searchsorted(skey, skey + (1 << 16) + 2)  # (y+1, x-1..x+1)
    up_over = (up_end - start_up) > W
    overflow_shapes = jnp.sum((same_over | up_over) & alive[order])

    # ---- merge, canonicalize, dedupe, filter -------------------------------
    all_a = jnp.concatenate([win_a, bg_a])
    all_b = jnp.concatenate([win_b, bg_b])
    all_ok = jnp.concatenate([win_ok, bg_ok])
    lo_id = jnp.minimum(all_a, all_b)
    hi_id = jnp.maximum(all_a, all_b)
    # int32 pair keys are exact for S < ~46000 shapes
    assert S < 46000, "pair keys need 64-bit for this many shapes"
    big_key = jnp.iinfo(jnp.int32).max
    key = jnp.where(all_ok, lo_id * S + hi_id, big_key)
    key = jnp.sort(key)
    uniq = key != jnp.concatenate([jnp.full((1,), -1, key.dtype), key[:-1]])
    valid = uniq & (key != big_key)

    posn = jnp.cumsum(valid) - 1
    count = jnp.sum(valid)
    out_key = jnp.full((P,), -1, jnp.int32)
    out_key = out_key.at[jnp.where(valid, posn, P)].set(key, mode="drop")
    pair_valid = out_key >= 0
    shape_a = jnp.where(pair_valid, out_key // S, 0)
    shape_b = jnp.where(pair_valid, out_key % S, 0)

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
