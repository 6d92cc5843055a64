"""Continuous collision: fast-body flagging + TOI sweep + pose rollback.

Counterpart of ref: src/Solver.cs:224-401 (ContinuousQueryCallback /
SolveContinuous) and the fast-body gating in FinalizeBodiesTask (:445-449).

Redesign: instead of per-body BVH queries with callbacks, we compact the (few)
fast shapes into a fixed-capacity buffer, select the top-K overlap candidates
per fast shape by swept-AABB score, and run the batched conservative-
advancement TOI kernel over the (F, K) pair grid. Bodies with a hit get their
step advancement rolled back to the TOI fraction (velocities keep their
solved values; next step's contact solve handles the impact), exactly like
the reference (ref: :352-365).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import geometry as g
from . import math2d as m
from .broadphase import compute_shape_aabbs
from .constants import MAX_POLYGON_VERTICES
from .distance import Sweep, time_of_impact
from .state import DYNAMIC, IS_BULLET, STATIC, WorldState

_LANES = jnp.arange(MAX_POLYGON_VERTICES)


def continuous_pass(state: WorldState, bs, dt, fast_cap: int = 32,
                    cand_cap: int = 8):
    """Returns (per-body advancement fraction (Nb,) in [0, 1], overflow):
    overflow counts fast shapes beyond `fast_cap` plus TOI candidates beyond
    `cand_cap` — dropped lanes get no TOI this step (Profile.overflow_ccd).
    fast_cap is auto-sized by the builder to cover every bullet shape
    (Capacity.fast_cap)."""
    sh = state.shapes
    b = state.bodies
    nb = b.center.shape[0]
    S = sh.type.shape[0]

    # end-of-step pose
    c2 = b.center + bs.dp
    q2 = m.rot_normalize(m.rot_mul(bs.dq, b.rot))

    # fast-body gate (ref: src/Solver.cs:445-449)
    max_velocity = m.length(bs.v) + jnp.abs(bs.w) * b.max_extent
    fast_body = ((b.type == DYNAMIC) & b.awake & b.enabled
                 & (max_velocity * dt > 0.5 * b.min_extent)
                 & state.tuning.enable_continuous)
    bullet_body = fast_body & ((b.flags & IS_BULLET) != 0)

    fast_shape_mask = fast_body[sh.body] & sh.enabled & ~sh.is_sensor

    # target-existence gate: a non-bullet fast shape only ever sweeps vs
    # STATIC shapes, a bullet vs any non-bullet shape (ref:
    # src/Solver.cs:1238-1274 sweeps bullets vs all trees, fast bodies vs
    # the static tree). If the scene has no eligible target for a lane
    # (e.g. a kinematic-drum tumbler with no statics), TOI can never hit —
    # gating it out is exact and keeps the fast buffer for lanes that
    # actually need it (round-3 shed ~5 slots/step here for nothing).
    tgt_body0 = sh.body
    tgt_bullet0 = (b.flags[tgt_body0] & IS_BULLET) != 0
    base_ok0 = sh.enabled & b.enabled[tgt_body0] & ~sh.is_sensor & ~tgt_bullet0
    has_static_target = jnp.any(base_ok0 & (b.type[tgt_body0] == STATIC))
    has_any_target = jnp.any(base_ok0)
    shape_is_bullet = bullet_body[sh.body]
    fast_shape_mask = fast_shape_mask & jnp.where(
        shape_is_bullet, has_any_target, has_static_target)

    # whole-pass gate: no fast shape this step (settling scenes, most of a
    # pyramid's life) -> skip the compaction/top-k/TOI machinery entirely
    # (~1 ms at 10k shapes). Under vmap the cond lowers to a select — same
    # as the old always-on behavior.
    return jax.lax.cond(
        jnp.any(fast_shape_mask),
        lambda _: _continuous_impl(state, bs, dt, fast_cap, cand_cap,
                                   fast_shape_mask, bullet_body, c2, q2,
                                   max_velocity),
        lambda _: (jnp.ones(nb, jnp.float32), jnp.int32(0)),
        None)


def _continuous_impl(state: WorldState, bs, dt, fast_cap, cand_cap,
                     fast_shape_mask, bullet_body, c2, q2, max_velocity):
    sh = state.shapes
    b = state.bodies
    nb = b.center.shape[0]
    S = sh.type.shape[0]

    # compact fast shapes, highest tunneling risk first: a dropped slow-ish
    # lane is far less likely to tunnel than a dropped fast one (the old
    # lowest-shape-id order shed arbitrary lanes)
    fb_ = sh.body
    danger = max_velocity[fb_] * dt / jnp.maximum(b.min_extent[fb_], 1e-6)
    dq = jnp.clip((danger * 8.0).astype(jnp.int32), 0, (1 << 10) - 1)
    score = jnp.where(fast_shape_mask, (dq << 20) + (S - jnp.arange(S)), 0)
    top, _ = jax.lax.top_k(score, min(fast_cap, S))
    fs_valid = top > 0
    fs = jnp.where(fs_valid, S - (top & ((1 << 20) - 1)), 0)  # (F,) shape ids

    # swept AABB of each fast shape
    aabb1 = compute_shape_aabbs(state)  # start-of-step

    def end_aabb(s):
        p = c2[sh.body[s]] - m.rot_vec(q2[sh.body[s]], b.local_center[sh.body[s]])
        q = q2[sh.body[s]]
        wv = m.rot_vec(q[None, :], sh.verts[s]) + p[None, :]
        ok = (_LANES < sh.count[s])[:, None]
        lo = jnp.min(jnp.where(ok, wv, jnp.inf), axis=0) - sh.radius[s]
        hi = jnp.max(jnp.where(ok, wv, -jnp.inf), axis=0) + sh.radius[s]
        return jnp.concatenate([lo, hi])

    fs_aabb = jax.vmap(
        lambda s: m.aabb_union(aabb1[s], end_aabb(s)))(fs)  # (F, 4)

    # candidate targets per fast shape (ref: ContinuousQueryCallback filters)
    tgt_body = sh.body
    tgt_static = b.type[tgt_body] == STATIC
    tgt_bullet = (b.flags[tgt_body] & IS_BULLET) != 0
    base_ok = sh.enabled & b.enabled[tgt_body] & ~sh.is_sensor & ~tgt_bullet

    # (F, S) candidate mask with swept-AABB overlap
    def cand_mask(i):
        fshape = fs[i]
        fb = sh.body[fshape]
        is_bullet = bullet_body[fb]
        grp = sh.filter_group
        same_group = (grp == grp[fshape]) & (grp != 0)
        filt = jnp.where(
            same_group, grp > 0,
            ((sh.filter_category[fshape] & sh.filter_mask) != 0)
            & ((sh.filter_category & sh.filter_mask[fshape]) != 0))
        ok = (base_ok & (tgt_body != fb) & filt
              & (tgt_static | (is_bullet & (b.type[tgt_body] != STATIC)))
              & m.aabb_overlaps(aabb1, fs_aabb[i][None, :])
              & fs_valid[i])
        return ok

    F = fs.shape[0]
    cmask = jax.vmap(cand_mask)(jnp.arange(F))  # (F, S)
    cscore = jnp.where(cmask, S - jnp.arange(S)[None, :], 0)
    ctop, _ = jax.lax.top_k(cscore, min(cand_cap, S))  # (F, K)
    cvalid = ctop > 0
    cidx = jnp.where(cvalid, S - ctop, 0)  # (F, K) target shape ids

    # overflow accounting: fast shapes beyond the buffer + candidates beyond
    # the per-shape top-K (both would silently skip TOI otherwise)
    n_fast = jnp.sum(fast_shape_mask).astype(jnp.int32)
    ovf_fast = jnp.maximum(n_fast - jnp.sum(fs_valid).astype(jnp.int32), 0)
    ovf_cand = jnp.sum(jnp.maximum(
        jnp.sum(cmask, axis=1).astype(jnp.int32)
        - jnp.sum(cvalid, axis=1).astype(jnp.int32), 0))
    overflow = (ovf_fast + ovf_cand).astype(jnp.int32)

    # sweeps
    def body_sweep(bid):
        return Sweep(b.local_center[bid], b.center[bid], c2[bid],
                     b.rot[bid], q2[bid])

    # TOI depth is the bullet-scene cost (nested while loops: ~85% of the
    # bullet_barrage step, measured by differential bench) — so (a) the
    # whole (F, K) sweep is gated on candidate existence, and (b) the
    # fraction-0 core-proxy retry (rare) runs as a SECOND gated sweep
    # instead of unconditionally doubling every step's TOI depth.
    pair_valid = cvalid & fs_valid[:, None]

    def toi_one(fshape, tshape, valid):
        tb = sh.body[tshape]
        sweep_f = body_sweep(sh.body[fshape])
        sweep_t = body_sweep(tb)
        out = time_of_impact(
            sh.verts[tshape], sh.count[tshape], sh.radius[tshape], sweep_t,
            sh.verts[fshape], sh.count[fshape], sh.radius[fshape], sweep_f,
            jnp.float32(1.0))
        frac = out.fraction
        hit = (out.state == 2) & (frac > 0.0) & (frac < 1.0)
        retry = valid & (out.state == 2) & (frac == 0.0)
        return jnp.where(valid & hit, frac, 1.0), retry

    def toi_retry(fshape, tshape, valid):
        # fraction-0 retry with a core proxy (ref: :294-303)
        fb = sh.body[fshape]
        sweep_f = body_sweep(fb)
        sweep_t = body_sweep(sh.body[tshape])
        core_r = 0.25 * b.min_extent[fb]
        core = jnp.tile(sh.centroid[fshape][None, :],
                        (MAX_POLYGON_VERTICES, 1))
        out2 = time_of_impact(
            sh.verts[tshape], sh.count[tshape], sh.radius[tshape], sweep_t,
            core, 1, core_r, sweep_f, jnp.float32(1.0))
        hit2 = (out2.state == 2) & (out2.fraction > 0.0) & (
            out2.fraction < 1.0)
        return jnp.where(valid & hit2, out2.fraction, 1.0)

    def run_tois(_):
        fr1, retry = jax.vmap(jax.vmap(toi_one, in_axes=(None, 0, 0)))(
            fs, cidx, pair_valid)  # (F, K)
        fr2 = jax.lax.cond(
            jnp.any(retry),
            lambda __: jax.vmap(jax.vmap(toi_retry, in_axes=(None, 0, 0)))(
                fs, cidx, retry),
            lambda __: jnp.ones_like(fr1), None)
        # hit1 lanes have fr1 in (0,1) and no retry (fr2=1); retry-hit lanes
        # have fr1=1 and fr2 in (0,1): min() reproduces the old select chain
        return jnp.minimum(fr1, fr2)

    fracs = jax.lax.cond(
        jnp.any(pair_valid), run_tois,
        lambda _: jnp.ones(pair_valid.shape, jnp.float32), None)  # (F, K)

    per_fast = jnp.min(fracs, axis=1)  # (F,)
    # reduce to per-body
    body_frac = jnp.ones(nb + 1, jnp.float32)
    body_frac = body_frac.at[jnp.where(fs_valid, sh.body[fs], nb)].min(per_fast)
    return body_frac[:nb], overflow
