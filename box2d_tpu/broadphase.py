"""Broadphase: fat-AABB candidate pair generation, fully in-jit.

TPU-first replacement for the reference's three dynamic BVH trees + moved
proxy buffers + pair sets (ref: src/DynamicTree.cs, src/BroadPhase.cs:28-268):
instead of maintaining an incremental spatial index, we recompute a dense
(S, S) fat-AABB overlap mask every step and compact it with a per-shape
top-K neighbor cap. On TPU the N^2 vector test is cheaper than pointer
chasing for scene sizes in the tens of thousands, and the whole thing fuses
into a handful of XLA ops with static shapes.

A pair is kept when EITHER endpoint has room in its K-neighbor list, so a
single huge static shape (ground) touching hundreds of shapes still pairs
with all of them through their rows. Missed pairs require BOTH endpoints to
exceed K neighbors; the overflow counter in Profile surfaces that.

Fat AABBs use AABB_MARGIN like the reference (ref: src/Shape.cs:64-75,
src/Constants.cs:31), which also provides the speculative-contact slack.
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


def _should_collide(state: WorldState):
    """(S, S) static pair admissibility (ref: src/Shape.cs:44-62
    ShouldShapesCollide + body type rules in src/Body.cs ShouldBodiesCollide).
    """
    sh = state.shapes
    b = state.bodies
    body = sh.body
    same_body = body[:, None] == body[None, :]
    btype = b.type[body]
    one_dynamic = (btype[:, None] == DYNAMIC) | (btype[None, :] == DYNAMIC)

    grp = sh.filter_group
    same_group = (grp[:, None] == grp[None, :]) & (grp != 0)[:, None]
    group_pass = jnp.where(same_group, grp[:, None] > 0,
                           ((sh.filter_category[:, None] & sh.filter_mask[None, :]) != 0)
                           & ((sh.filter_category[None, :] & sh.filter_mask[:, None]) != 0))

    alive = (sh.enabled & b.enabled[body] & ~sh.is_sensor)
    ok = (
        ~same_body
        & one_dynamic
        & group_pass
        & alive[:, None]
        & alive[None, :]
    )
    return ok


class PairBuffer(NamedTuple):
    """Fixed-capacity candidate pair set."""

    shape_a: jnp.ndarray   # (P,) i32 canonical (a < b by index)
    shape_b: jnp.ndarray   # (P,) i32
    valid: jnp.ndarray     # (P,) bool
    count: jnp.ndarray     # i32 number of valid pairs
    overflow: jnp.ndarray  # i32 pairs dropped (diagnostic)


def find_pairs(state: WorldState, cap: Capacity, aabbs=None) -> PairBuffer:
    """Dense overlap mask -> per-row top-K -> dedupe -> compact."""
    if aabbs is None:
        aabbs = compute_shape_aabbs(state)
    S = aabbs.shape[0]
    K = min(cap.max_neighbors, S)
    P = cap.max_contact_pairs

    fat_lo = aabbs[:, :2] - AABB_MARGIN
    fat_hi = aabbs[:, 2:] + AABB_MARGIN
    overlap = (
        (fat_lo[:, None, 0] <= fat_hi[None, :, 0])
        & (fat_lo[None, :, 0] <= fat_hi[:, None, 0])
        & (fat_lo[:, None, 1] <= fat_hi[None, :, 1])
        & (fat_lo[None, :, 1] <= fat_hi[:, None, 1])
    )
    mask = overlap & _should_collide(state)  # symmetric

    # per-row top-K neighbor selection
    row_counts = jnp.sum(mask, axis=1)
    col = jnp.arange(S)[None, :]
    score = jnp.where(mask, S - col, 0)  # nonzero iff neighbor
    top_vals, _ = jax.lax.top_k(score, K)  # (S, K)
    has = top_vals > 0
    nbr = jnp.where(has, S - top_vals, 0)  # (S, K) neighbor index

    # canonicalize + dedupe via sort
    row = jnp.broadcast_to(jnp.arange(S)[:, None], (S, K))
    a = jnp.minimum(row, nbr).reshape(-1)
    bidx = jnp.maximum(row, nbr).reshape(-1)
    key = jnp.where(has.reshape(-1), a * S + bidx, jnp.iinfo(jnp.int32).max)
    key = jnp.sort(key)
    uniq = key != jnp.concatenate([jnp.full((1,), -1, key.dtype), key[:-1]])
    valid = uniq & (key != jnp.iinfo(jnp.int32).max)

    # compact into (P,)
    pos = jnp.cumsum(valid) - 1
    count = jnp.sum(valid)
    out_key = jnp.full((P,), -1, jnp.int32)
    out_key = out_key.at[jnp.where(valid, pos, P)].set(
        key.astype(jnp.int32), mode="drop")
    pair_valid = out_key >= 0
    shape_a = jnp.where(pair_valid, out_key // S, 0)
    shape_b = jnp.where(pair_valid, out_key % S, 0)

    # exclusions from joints with collide_connected == False, applied on the
    # compacted (P, J) set (ref: src/Joint.cs:293 DestroyContactsBetweeenBodies)
    j = state.joints
    jex = j.enabled & ~j.collide_connected & (j.body_a >= 0)
    body = state.shapes.body
    ba = body[shape_a]  # (P,)
    bb = body[shape_b]
    hit = (
        ((ba[:, None] == j.body_a[None, :]) & (bb[:, None] == j.body_b[None, :]))
        | ((ba[:, None] == j.body_b[None, :]) & (bb[:, None] == j.body_a[None, :]))
    ) & jex[None, :]
    pair_valid = pair_valid & ~jnp.any(hit, axis=1)

    # overflow diagnostics: dropped by per-row cap on BOTH ends, or by P
    pair_total = jnp.sum(row_counts) // 2
    overflow = jnp.maximum(pair_total - count, 0) + jnp.maximum(count - P, 0)

    return PairBuffer(shape_a, shape_b, pair_valid,
                      jnp.minimum(count, P).astype(jnp.int32),
                      overflow.astype(jnp.int32))
