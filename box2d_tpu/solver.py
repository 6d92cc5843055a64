"""TGS-soft sub-stepping contact solver.

Behavioral port of the reference solver *math* with a TPU-native schedule:
- Softness / bias semantics: ref src/Solver.cs:10-26, src/ContactSolver.cs:195-224
- substep pipeline: integrate velocities -> warm start -> solve(bias) ->
  integrate positions -> relax(no bias), then restitution + store impulses:
  ref src/Solver.cs:599-727 (SolverTask)
- contact point math: ref src/ContactSolver.cs:40-350 (scalar overflow
  solver; the AVX/Neon/SSE lane-packed variants :362-3036 are exactly this
  math 8/4-wide — XLA vectorization subsumes them).

Scheduling redesign: instead of work-stealing blocks + atomic stage sync, each
Gauss-Seidel "color" pass is one masked vectorized sweep over the whole
contact buffer with conflict-free scatter-adds (coloring guarantees no two
contacts in a color share a dynamic body). Colors run sequentially inside a
`lax.fori_loop`; static bodies need no write masks because their inv-mass
terms zero all deltas.

Known port bugs fixed here (upstream Box2D v3 semantics):
- ref ContactSolver.cs:185,286: stateB loaded from indexA.
- ref ContactSolver.cs:301: restitution accumulation uses -normalImpulse.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import math2d as m
from .constants import MAX_ROTATION
from .narrowphase import ContactData
from .state import DYNAMIC, STATIC, Bodies, Tuning, WorldState


class BodySolverState(NamedTuple):
    """Hot per-body state during the solve (ref: src/Body.cs:119-136
    BodyState 8-float SIMD layout -> four dense arrays)."""

    v: jnp.ndarray   # (Nb, 2)
    w: jnp.ndarray   # (Nb,)
    dp: jnp.ndarray  # (Nb, 2) delta position this step
    dq: jnp.ndarray  # (Nb, 2) delta rotation this step (cos, sin)


class ContactConstraints(NamedTuple):
    """Prepared contact constraints, (P,) lanes with 2 points each
    (ref: src/ContactSolver.cs:9-37)."""

    body_a: jnp.ndarray
    body_b: jnp.ndarray
    normal: jnp.ndarray          # (P, 2)
    friction: jnp.ndarray
    restitution: jnp.ndarray
    tangent_speed: jnp.ndarray
    rolling_resistance: jnp.ndarray
    rolling_mass: jnp.ndarray
    soft_bias: jnp.ndarray       # per-contact softness (static vs dynamic)
    soft_mass: jnp.ndarray
    soft_imp: jnp.ndarray
    anchor_a: jnp.ndarray        # (P, 2, 2) COM-relative, world-oriented
    anchor_b: jnp.ndarray
    base_separation: jnp.ndarray  # (P, 2)
    normal_mass: jnp.ndarray     # (P, 2)
    tangent_mass: jnp.ndarray    # (P, 2)
    relative_velocity: jnp.ndarray  # (P, 2)
    point_mask: jnp.ndarray      # (P, 2) bool
    inv_mass_a: jnp.ndarray
    inv_mass_b: jnp.ndarray
    inv_i_a: jnp.ndarray
    inv_i_b: jnp.ndarray
    color: jnp.ndarray           # (P,) i32
    # accumulators
    normal_impulse: jnp.ndarray  # (P, 2)
    tangent_impulse: jnp.ndarray
    total_normal_impulse: jnp.ndarray
    rolling_impulse: jnp.ndarray  # (P,)


def prepare_contacts(state: WorldState, data: ContactData,
                     bs: BodySolverState, color, h, inv_h,
                     fresh_vw: bool = False) -> ContactConstraints:
    """ref: src/ContactSolver.cs:40-115 PrepareOverflowContacts.

    Body operands come from the packed rows narrow_phase already gathered
    (data.dyn_a/dyn_b) — zero additional gathers. fresh_vw=True re-gathers
    velocities (particle systems add impulses to bodies between the narrow
    phase and the solve, making the row velocities stale)."""
    tn = state.tuning
    man = data.manifold
    ba, bb = data.body_a, data.body_b
    da, db = data.dyn_a, data.dyn_b

    contact_hertz = jnp.minimum(tn.contact_hertz, 0.125 * inv_h)  # ref api/World.cs:78
    soft_c = m.softness(contact_hertz, tn.contact_damping_ratio, h)
    soft_s = m.softness(2.0 * contact_hertz, tn.contact_damping_ratio, h)

    ma = da[:, 9]
    mb = db[:, 9]
    ia = da[:, 10]
    ib = db[:, 10]
    is_static = (da[:, 11] != DYNAMIC) | (db[:, 11] != DYNAMIC)
    soft_bias = jnp.where(is_static, soft_s[0], soft_c[0])
    soft_mass = jnp.where(is_static, soft_s[1], soft_c[1])
    soft_imp = jnp.where(is_static, soft_s[2], soft_c[2])

    # optional mass-ratio contact softening for dynamic pairs (ref
    # ContactSolver.cs:524-533): a large mass mismatch scales hertz and
    # damping by ratio = max(0.5, m_small/m_big), softening the contact
    inv_lo = jnp.minimum(ma, mb)
    inv_hi = jnp.maximum(ma, mb)
    ratio = jnp.where(inv_lo == inv_hi, 1.0,
                      jnp.maximum(0.5, inv_lo / jnp.where(inv_hi > 0,
                                                          inv_hi, 1.0)))
    soft_r = m.softness(ratio * contact_hertz,
                        ratio * tn.contact_damping_ratio, h)
    softened = tn.enable_contact_softening & ~is_static
    soft_bias = jnp.where(softened, soft_r[0], soft_bias)
    soft_mass = jnp.where(softened, soft_r[1], soft_mass)
    soft_imp = jnp.where(softened, soft_r[2], soft_imp)

    k = ia + ib
    rolling_mass = jnp.where(k > 0, 1.0 / jnp.where(k > 0, k, 1.0), 0.0)

    normal = man.normal
    tangent = m.right_perp(normal)

    if fresh_vw:
        st = jnp.concatenate([bs.v, bs.w[:, None]], axis=1)
        sta = st[ba]
        stb = st[bb]
        va, wa = sta[:, :2], sta[:, 2]
        vb, wb = stb[:, :2], stb[:, 2]
    else:
        va, wa = da[:, 6:8], da[:, 8]
        vb, wb = db[:, 6:8], db[:, 8]

    ra = man.anchor_a  # (P, 2, 2)
    rb = man.anchor_b
    base_sep = man.separation - m.dot(rb - ra, normal[:, None, :])
    rn_a = m.cross(ra, normal[:, None, :])
    rn_b = m.cross(rb, normal[:, None, :])
    k_n = (ma + mb)[:, None] + ia[:, None] * rn_a**2 + ib[:, None] * rn_b**2
    normal_mass = jnp.where(k_n > 0, 1.0 / jnp.where(k_n > 0, k_n, 1.0), 0.0)
    rt_a = m.cross(ra, tangent[:, None, :])
    rt_b = m.cross(rb, tangent[:, None, :])
    k_t = (ma + mb)[:, None] + ia[:, None] * rt_a**2 + ib[:, None] * rt_b**2
    tangent_mass = jnp.where(k_t > 0, 1.0 / jnp.where(k_t > 0, k_t, 1.0), 0.0)

    vr_a = va[:, None, :] + m.cross_sv(wa[:, None], ra)
    vr_b = vb[:, None, :] + m.cross_sv(wb[:, None], rb)
    rel_v = m.dot(normal[:, None, :], vr_b - vr_a)

    warm = jnp.where(tn.enable_warm_starting, 1.0, 0.0)
    lane = jnp.arange(2)[None, :]
    point_mask = lane < man.point_count[:, None]

    return ContactConstraints(
        body_a=ba, body_b=bb, normal=normal, friction=data.friction,
        restitution=data.restitution, tangent_speed=data.tangent_speed,
        rolling_resistance=data.rolling_resistance, rolling_mass=rolling_mass,
        soft_bias=soft_bias, soft_mass=soft_mass, soft_imp=soft_imp,
        anchor_a=ra, anchor_b=rb, base_separation=base_sep,
        normal_mass=normal_mass, tangent_mass=tangent_mass,
        relative_velocity=rel_v, point_mask=point_mask,
        inv_mass_a=ma, inv_mass_b=mb, inv_i_a=ia, inv_i_b=ib, color=color,
        normal_impulse=warm * data.normal_impulse * point_mask,
        tangent_impulse=warm * data.tangent_impulse * point_mask,
        total_normal_impulse=jnp.zeros_like(data.normal_impulse),
        rolling_impulse=warm * data.rolling_impulse,
    )


# TPU scatters serialize badly, especially under vmap; for moderate sizes a
# one-hot matmul is the faster "scatter engine" (it runs on the MXU and sums
# conflicts exactly). Above the limit we fall back to XLA scatter-adds.
_MATMUL_LIMIT = 4_000_000


def _use_matmul(nb, ch):
    return nb * ch <= _MATMUL_LIMIT


def _one_hot(idx, nb):
    return (idx[:, None] == jnp.arange(nb)[None, :]).astype(jnp.float32)


def _gather(bs: BodySolverState, cc: ContactConstraints):
    nb = bs.v.shape[0]
    ch = cc.body_a.shape[0]
    if _use_matmul(nb, ch):
        # HIGHEST precision: TPU f32 matmuls default to bf16 passes, which
        # would corrupt body-state bits through every gather
        st = jnp.concatenate([bs.v, bs.w[:, None]], axis=1)  # (Nb, 3)
        sa = jnp.dot(_one_hot(cc.body_a, nb), st,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        sb = jnp.dot(_one_hot(cc.body_b, nb), st,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        return sa[:, :2], sa[:, 2], sb[:, :2], sb[:, 2]
    return (bs.v[cc.body_a], bs.w[cc.body_a], bs.v[cc.body_b], bs.w[cc.body_b])


def _scatter(bs: BodySolverState, cc: ContactConstraints, mask,
             va, wa, vb, wb, va0, wa0, vb0, wb0) -> BodySolverState:
    """Apply per-contact velocity deltas; conflict-free within a color."""
    mk = mask[:, None]
    dva = jnp.where(mk, va - va0, 0.0)
    dwa = jnp.where(mask, wa - wa0, 0.0)
    dvb = jnp.where(mk, vb - vb0, 0.0)
    dwb = jnp.where(mask, wb - wb0, 0.0)
    nb = bs.v.shape[0]
    ch = cc.body_a.shape[0]
    if _use_matmul(nb, ch):
        da = jnp.concatenate([dva, dwa[:, None]], axis=1)  # (ch, 3)
        db = jnp.concatenate([dvb, dwb[:, None]], axis=1)
        upd = (jnp.dot(_one_hot(cc.body_a, nb).T, da,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
               + jnp.dot(_one_hot(cc.body_b, nb).T, db,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST))
        return bs._replace(v=bs.v + upd[:, :2], w=bs.w + upd[:, 2])
    v = bs.v.at[cc.body_a].add(dva).at[cc.body_b].add(dvb)
    w = bs.w.at[cc.body_a].add(dwa).at[cc.body_b].add(dwb)
    return bs._replace(v=v, w=w)


def warm_start_color(bs: BodySolverState, cc: ContactConstraints,
                     mask) -> BodySolverState:
    """ref: src/ContactSolver.cs:116-164."""
    va0, wa0, vb0, wb0 = _gather(bs, cc)
    va, wa, vb, wb = va0, wa0, vb0, wb0
    normal = cc.normal
    tangent = m.right_perp(normal)
    for j in range(2):
        pj = (cc.normal_impulse[:, j, None] * normal
              + cc.tangent_impulse[:, j, None] * tangent)
        pj = jnp.where(cc.point_mask[:, j, None], pj, 0.0)
        ra = cc.anchor_a[:, j]
        rb = cc.anchor_b[:, j]
        wa = wa - cc.inv_i_a * m.cross(ra, pj)
        va = va - cc.inv_mass_a[:, None] * pj
        wb = wb + cc.inv_i_b * m.cross(rb, pj)
        vb = vb + cc.inv_mass_b[:, None] * pj
    wa = wa - cc.inv_i_a * cc.rolling_impulse
    wb = wb + cc.inv_i_b * cc.rolling_impulse
    return _scatter(bs, cc, mask, va, wa, vb, wb, va0, wa0, vb0, wb0)


def solve_color(bs: BodySolverState, cc: ContactConstraints, mask, use_bias,
                inv_h, contact_speed, relax_scale=None):
    """One Gauss-Seidel sweep over one color
    (ref: src/ContactSolver.cs:165-264 SolveOverflowContacts).

    relax_scale: optional (P,) per-contact impulse scale for the overflow
    color's mass-splitting (1/degree)."""
    va0, wa0, vb0, wb0 = _gather(bs, cc)
    va, wa, vb, wb = va0, wa0, vb0, wb0
    dqa = bs.dq[cc.body_a]
    dqb = bs.dq[cc.body_b]
    dp = bs.dp[cc.body_b] - bs.dp[cc.body_a]
    normal = cc.normal
    tangent = m.right_perp(normal)

    ni = cc.normal_impulse
    ti = cc.tangent_impulse
    tni = cc.total_normal_impulse
    scale = jnp.ones_like(cc.friction) if relax_scale is None else relax_scale

    total_normal = jnp.zeros_like(cc.friction)
    # normal impulses, point-sequential like the reference
    for j in range(2):
        ra = cc.anchor_a[:, j]
        rb = cc.anchor_b[:, j]
        ds = dp + m.rot_vec(dqb, rb) - m.rot_vec(dqa, ra)
        s = cc.base_separation[:, j] + m.dot(ds, normal)

        # speculative vs penetrating bias (ref: ContactSolver.cs:202-209)
        speculative = s > 0.0
        bias = jnp.where(
            speculative, s * inv_h,
            jnp.where(use_bias,
                      jnp.maximum(cc.soft_mass * cc.soft_bias * s, -contact_speed),
                      0.0))
        mass_scale = jnp.where(speculative, 1.0, jnp.where(use_bias, cc.soft_mass, 1.0))
        imp_scale = jnp.where(speculative, 0.0, jnp.where(use_bias, cc.soft_imp, 0.0))

        vr_a = va + m.cross_sv(wa, ra)
        vr_b = vb + m.cross_sv(wb, rb)
        vn = m.dot(vr_b - vr_a, normal)
        impulse = (-cc.normal_mass[:, j] * (mass_scale * vn + bias)
                   - imp_scale * ni[:, j]) * scale
        new_imp = jnp.maximum(ni[:, j] + impulse, 0.0)
        new_imp = jnp.where(cc.point_mask[:, j], new_imp, 0.0)
        impulse = new_imp - ni[:, j]
        ni = ni.at[:, j].set(new_imp)
        tni = tni.at[:, j].add(new_imp)
        total_normal = total_normal + new_imp

        p = impulse[:, None] * normal
        va = va - cc.inv_mass_a[:, None] * p
        wa = wa - cc.inv_i_a * m.cross(ra, p)
        vb = vb + cc.inv_mass_b[:, None] * p
        wb = wb + cc.inv_i_b * m.cross(rb, p)

    # friction impulses (ref: ContactSolver.cs:225-243)
    for j in range(2):
        ra = cc.anchor_a[:, j]
        rb = cc.anchor_b[:, j]
        vr_a = va + m.cross_sv(wa, ra)
        vr_b = vb + m.cross_sv(wb, rb)
        vt = m.dot(vr_b - vr_a, tangent) - cc.tangent_speed
        impulse = -cc.tangent_mass[:, j] * vt * scale
        max_f = cc.friction * ni[:, j]
        new_imp = jnp.clip(ti[:, j] + impulse, -max_f, max_f)
        new_imp = jnp.where(cc.point_mask[:, j], new_imp, 0.0)
        impulse = new_imp - ti[:, j]
        ti = ti.at[:, j].set(new_imp)

        p = impulse[:, None] * tangent
        va = va - cc.inv_mass_a[:, None] * p
        wa = wa - cc.inv_i_a * m.cross(ra, p)
        vb = vb + cc.inv_mass_b[:, None] * p
        wb = wb + cc.inv_i_b * m.cross(rb, p)

    # rolling resistance (ref: ContactSolver.cs:244-252)
    d_lambda = -cc.rolling_mass * (wb - wa) * scale
    max_lambda = cc.rolling_resistance * total_normal
    new_roll = jnp.clip(cc.rolling_impulse + d_lambda, -max_lambda, max_lambda)
    d_lambda = new_roll - cc.rolling_impulse
    wa = wa - cc.inv_i_a * d_lambda
    wb = wb + cc.inv_i_b * d_lambda

    cc = cc._replace(
        normal_impulse=jnp.where(mask[:, None], ni, cc.normal_impulse),
        tangent_impulse=jnp.where(mask[:, None], ti, cc.tangent_impulse),
        total_normal_impulse=jnp.where(mask[:, None], tni, cc.total_normal_impulse),
        rolling_impulse=jnp.where(mask, new_roll, cc.rolling_impulse),
    )
    bs = _scatter(bs, cc, mask, va, wa, vb, wb, va0, wa0, vb0, wb0)
    return bs, cc


def restitution_color(bs: BodySolverState, cc: ContactConstraints, mask,
                      threshold):
    """ref: src/ContactSolver.cs:265-322 (upstream-correct accumulation)."""
    va0, wa0, vb0, wb0 = _gather(bs, cc)
    va, wa, vb, wb = va0, wa0, vb0, wb0
    normal = cc.normal
    ni = cc.normal_impulse
    tni = cc.total_normal_impulse
    active_c = mask & (cc.restitution != 0.0)
    for j in range(2):
        apply = (active_c & cc.point_mask[:, j]
                 & (cc.relative_velocity[:, j] < -threshold)
                 & (cc.total_normal_impulse[:, j] > 0.0))
        ra = cc.anchor_a[:, j]
        rb = cc.anchor_b[:, j]
        vr_a = va + m.cross_sv(wa, ra)
        vr_b = vb + m.cross_sv(wb, rb)
        vn = m.dot(vr_b - vr_a, normal)
        impulse = -cc.normal_mass[:, j] * (
            vn + cc.restitution * cc.relative_velocity[:, j])
        new_imp = jnp.maximum(ni[:, j] + impulse, 0.0)
        impulse = jnp.where(apply, new_imp - ni[:, j], 0.0)
        ni = ni.at[:, j].set(jnp.where(apply, new_imp, ni[:, j]))
        tni = tni.at[:, j].add(jnp.where(apply, impulse, 0.0))

        p = impulse[:, None] * normal
        va = va - cc.inv_mass_a[:, None] * p
        wa = wa - cc.inv_i_a * m.cross(ra, p)
        vb = vb + cc.inv_mass_b[:, None] * p
        wb = wb + cc.inv_i_b * m.cross(rb, p)
    cc = cc._replace(
        normal_impulse=jnp.where(mask[:, None], ni, cc.normal_impulse),
        total_normal_impulse=jnp.where(mask[:, None], tni, cc.total_normal_impulse),
    )
    bs = _scatter(bs, cc, mask, va, wa, vb, wb, va0, wa0, vb0, wb0)
    return bs, cc


# ---------------------------------------------------------------------------
# body integration
# ---------------------------------------------------------------------------


def integrate_velocities(b: Bodies, bs: BodySolverState, tn: Tuning, h,
                         inv_dt) -> BodySolverState:
    """ref: src/Solver.cs:121-160 IntegrateVelocitiesTask."""
    active = (b.type == DYNAMIC) & b.awake & b.enabled
    lin_damp = 1.0 / (1.0 + h * b.linear_damping)
    ang_damp = 1.0 / (1.0 + h * b.angular_damping)
    g_scale = jnp.where(b.inv_mass > 0, b.gravity_scale, 0.0)
    dv = h * (b.inv_mass[:, None] * b.force + (g_scale[:, None] * tn.gravity))
    dw = h * b.inv_inertia * b.torque
    v = dv + lin_damp[:, None] * bs.v
    w = dw + ang_damp * bs.w

    max_w = MAX_ROTATION * inv_dt
    vv = m.dot(v, v)
    over = vv > tn.max_linear_speed**2
    ratio = tn.max_linear_speed / jnp.sqrt(jnp.where(over, vv, 1.0))
    v = jnp.where(over[:, None], ratio[:, None] * v, v)
    fast_rot_ok = (b.flags & 16) != 0  # ALLOW_FAST_ROTATION
    w_over = (w * w > max_w * max_w) & ~fast_rot_ok
    w = jnp.where(w_over, jnp.sign(w) * max_w, w)

    v, w = _apply_locks(b, v, w)
    return bs._replace(
        v=jnp.where(active[:, None], v, bs.v),
        w=jnp.where(active, w, bs.w),
    )


def _apply_locks(b: Bodies, v, w):
    v = v.at[:, 0].set(jnp.where((b.flags & 1) != 0, 0.0, v[:, 0]))
    v = v.at[:, 1].set(jnp.where((b.flags & 2) != 0, 0.0, v[:, 1]))
    w = jnp.where((b.flags & 4) != 0, 0.0, w)
    return v, w


def integrate_positions(b: Bodies, bs: BodySolverState, h) -> BodySolverState:
    """ref: src/Solver.cs:199-212 IntegratePositionsTask."""
    active = (b.type != STATIC) & b.awake & b.enabled
    v, w = _apply_locks(b, bs.v, bs.w)
    dp = bs.dp + h * v
    dq = m.rot_integrate(bs.dq, h * w)
    return BodySolverState(
        v=v, w=w,
        dp=jnp.where(active[:, None], dp, bs.dp),
        dq=jnp.where(active[:, None], dq, bs.dq),
    )


def finalize_bodies(state: WorldState, bs: BodySolverState, dt,
                    inv_dt, advance_fraction=None) -> WorldState:
    """ref: src/Solver.cs:402-503 FinalizeBodiesTask (commit transforms,
    sleep timers). advance_fraction (Nb,) rolls fast bodies back to their
    time of impact (ref: src/Solver.cs:352-365 SolveContinuous)."""
    b = state.bodies
    tn = state.tuning
    active = (b.type != STATIC) & b.awake & b.enabled
    if advance_fraction is None:
        center_end = b.center + bs.dp
        rot_end = m.rot_normalize(m.rot_mul(bs.dq, b.rot))
    else:
        t = advance_fraction
        center_end = b.center + t[:, None] * bs.dp
        rot_end = m.rot_nlerp(b.rot, m.rot_normalize(m.rot_mul(bs.dq, b.rot)), t)
    center = jnp.where(active[:, None], center_end, b.center)
    rot = jnp.where(active[:, None], rot_end, b.rot)

    speed = m.length(bs.v) + jnp.abs(bs.w) * b.max_extent
    max_dpos = m.length(bs.dp) + jnp.abs(bs.dq[:, 1]) * b.max_extent
    sleep_velocity = jnp.maximum(speed, 0.5 * inv_dt * max_dpos)
    can_sleep = tn.enable_sleep & ((b.flags & 32) != 0)  # ENABLE_SLEEP
    resting = can_sleep & (sleep_velocity <= b.sleep_threshold)
    sleep_time = jnp.where(active,
                           jnp.where(resting, b.sleep_time + dt, 0.0),
                           b.sleep_time)

    bodies = b.__class__(**{
        **{f: getattr(b, f) for f in b.__dataclass_fields__},
        "center": center, "rot": rot,
        "v": jnp.where(active[:, None], bs.v, b.v),
        "w": jnp.where(active, bs.w, b.w),
        "force": jnp.zeros_like(b.force),
        "torque": jnp.zeros_like(b.torque),
        "sleep_time": sleep_time,
    })
    return state.__class__(**{
        **{f: getattr(state, f) for f in state.__dataclass_fields__},
        "bodies": bodies,
    })
