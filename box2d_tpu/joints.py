"""Vectorized joint solver: distance, motor, prismatic, revolute, weld, wheel.

Behavioral port of the per-type joint math (ref: src/joints/*.cs +
src/Joint.cs:100-133) over (J,) lanes. Each joint type's prepare/warm-start/
solve pipeline is computed for all lanes and lane-selected by type tag;
scene-absent types are gated out at trace time (`types_present`). Joints share
graph colors with contacts, so each color pass is conflict-free.

Known port bugs fixed (upstream Box2D v3 semantics):
- ref DistanceJoint.cs:100 `iA = bodySimA.invMass` (should be invInertia).
- ref PrismaticJoint.cs:217,241 applies the stale 2-vector `impulse` member
  instead of the scalar delta; and the `speculativeDistance` limit gate
  zeroes impulses when limits are near (inverted); upstream has no gate.
- ref WheelJoint.cs:273 perp constraint Cdot uses axisA (should be perpA).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import math2d as m
from .state import (JOINT_DISTANCE, JOINT_MOTOR, JOINT_MOUSE,
                    JOINT_PRISMATIC, JOINT_REVOLUTE, JOINT_WELD, JOINT_WHEEL,
                    WorldState)


class JointConstraints(NamedTuple):
    color: jnp.ndarray
    active: jnp.ndarray
    type: jnp.ndarray
    body_a: jnp.ndarray
    body_b: jnp.ndarray
    # world-oriented frames relative to each COM (ref: RevoluteJoint.cs:88-91)
    fa_p: jnp.ndarray   # (J, 2)
    fa_q: jnp.ndarray   # (J, 2)
    fb_p: jnp.ndarray
    fb_q: jnp.ndarray
    delta_center: jnp.ndarray  # (J, 2)
    inv_mass_a: jnp.ndarray
    inv_mass_b: jnp.ndarray
    inv_i_a: jnp.ndarray
    inv_i_b: jnp.ndarray
    axial_mass: jnp.ndarray
    spring_soft: jnp.ndarray   # (J, 3) bias/mass/impulse scales
    angular_soft: jnp.ndarray  # (J, 3) weld/motor angular; weld linear falls
    constraint_soft: jnp.ndarray  # (J, 3)
    # impulse accumulators (named as in state.Joints)
    impulse: jnp.ndarray
    spring_impulse: jnp.ndarray
    spring_impulse2: jnp.ndarray
    motor_impulse: jnp.ndarray
    lower_impulse: jnp.ndarray
    upper_impulse: jnp.ndarray
    angular_impulse: jnp.ndarray


def joint_types_present(types) -> frozenset:
    return frozenset(int(t) for t in types if int(t) >= 0)


def prepare_joints(state: WorldState, bs, color, h, inv_h,
                   types_present: frozenset = frozenset()) -> JointConstraints:
    """ref: src/Joint.cs:125-129 + per-type Prepare."""
    jn = state.joints
    b = state.bodies
    ba = jnp.maximum(jn.body_a, 0)
    bb = jnp.maximum(jn.body_b, 0)
    active = jn.enabled & (jn.body_a >= 0) & (jn.type >= 0)

    rot_a = b.rot[ba]
    rot_b = b.rot[bb]
    fa_q = m.rot_mul(rot_a, jn.frame_a_q)
    fa_p = m.rot_vec(rot_a, jn.frame_a_p - b.local_center[ba])
    fb_q = m.rot_mul(rot_b, jn.frame_b_q)
    fb_p = m.rot_vec(rot_b, jn.frame_b_p - b.local_center[bb])
    delta_center = b.center[bb] - b.center[ba]

    ma, mb = b.inv_mass[ba], b.inv_mass[bb]
    ia, ib = b.inv_inertia[ba], b.inv_inertia[bb]

    # default axial mass: angular (revolute/weld/wheel motor)
    k_ang = ia + ib
    axial_ang = jnp.where(k_ang > 0, 1.0 / jnp.where(k_ang > 0, k_ang, 1.0), 0.0)
    # distance joint axial mass (ref: DistanceJoint.cs prepare)
    sep = fb_p - fa_p + delta_center
    axis = m.normalize(sep)
    cr_a = m.cross(fa_p, axis)
    cr_b = m.cross(fb_p, axis)
    k_dist = ma + mb + ia * cr_a**2 + ib * cr_b**2
    axial_dist = jnp.where(k_dist > 0, 1.0 / jnp.where(k_dist > 0, k_dist, 1.0), 0.0)
    axial_mass = jnp.where(jn.type == JOINT_DISTANCE, axial_dist, axial_ang)

    spring_soft = jnp.stack(m.softness(jn.hertz, jn.damping_ratio, h), axis=-1)
    # weld: zero hertz falls back to constraint softness
    c_hertz = jnp.minimum(jn.constraint_hertz, 0.25 * inv_h)
    constraint_soft = jnp.stack(
        m.softness(c_hertz, jn.constraint_damping_ratio, h), axis=-1)
    ang_soft = jnp.stack(
        m.softness(jn.angular_hertz, jn.angular_damping_ratio, h), axis=-1)
    is_weld = jn.type == JOINT_WELD
    spring_soft = jnp.where((is_weld & (jn.hertz == 0.0))[:, None],
                            constraint_soft, spring_soft)
    ang_soft = jnp.where((is_weld & (jn.angular_hertz == 0.0))[:, None],
                         constraint_soft, ang_soft)

    warm = jnp.where(state.tuning.enable_warm_starting, 1.0, 0.0)
    return JointConstraints(
        color=color, active=active, type=jn.type, body_a=ba, body_b=bb,
        fa_p=fa_p, fa_q=fa_q, fb_p=fb_p, fb_q=fb_q, delta_center=delta_center,
        inv_mass_a=ma, inv_mass_b=mb, inv_i_a=ia, inv_i_b=ib,
        axial_mass=axial_mass, spring_soft=spring_soft, angular_soft=ang_soft,
        constraint_soft=constraint_soft,
        impulse=warm * jn.impulse,
        spring_impulse=warm * jn.spring_impulse,
        spring_impulse2=warm * jn.spring_impulse2,
        motor_impulse=warm * jn.motor_impulse,
        lower_impulse=warm * jn.lower_impulse,
        upper_impulse=warm * jn.upper_impulse,
        angular_impulse=warm * jn.angular_impulse,
    )


def _scatter(bs, jc: JointConstraints, mask, va, wa, vb, wb, va0, wa0, vb0, wb0):
    from .solver import _scatter as _body_scatter

    return _body_scatter(bs, jc, mask, va, wa, vb, wb, va0, wa0, vb0, wb0)


def _anchors(bs, jc):
    dqa = bs.dq[jc.body_a]
    dqb = bs.dq[jc.body_b]
    ra = m.rot_vec(dqa, jc.fa_p)
    rb = m.rot_vec(dqb, jc.fb_p)
    d = bs.dp[jc.body_b] - bs.dp[jc.body_a] + jc.delta_center + (rb - ra)
    return dqa, dqb, ra, rb, d


def warm_start_joints_color(state, bs, jc: JointConstraints, mask,
                            types_present: frozenset = frozenset()):
    """Per-type warm starting (ref: per-joint WarmStart methods)."""
    mask = mask & jc.active
    va0 = bs.v[jc.body_a]
    wa0 = bs.w[jc.body_a]
    vb0 = bs.v[jc.body_b]
    wb0 = bs.w[jc.body_b]
    dqa, dqb, ra, rb, d = _anchors(bs, jc)
    ty = jc.type

    # linear impulse P and angular impulses LA/LB per type
    p = jnp.zeros_like(va0)
    la = jnp.zeros_like(wa0)
    lb = jnp.zeros_like(wa0)

    def sel(cond, pn, lan, lbn):
        return (jnp.where(cond[:, None], pn, p), jnp.where(cond, lan, la),
                jnp.where(cond, lbn, lb))

    if JOINT_DISTANCE in types_present:
        axis = m.normalize(d)
        axial = (jc.impulse[:, 0] + jc.lower_impulse - jc.upper_impulse
                 + jc.motor_impulse)
        pd = axial[:, None] * axis
        p, la, lb = sel(ty == JOINT_DISTANCE, pd, m.cross(ra, pd), m.cross(rb, pd))
    if JOINT_REVOLUTE in types_present:
        axial = (jc.spring_impulse + jc.motor_impulse + jc.lower_impulse
                 - jc.upper_impulse)
        pr = jc.impulse
        p, la, lb = sel(ty == JOINT_REVOLUTE, pr,
                        m.cross(ra, pr) + axial, m.cross(rb, pr) + axial)
    if JOINT_WELD in types_present:
        pw = jc.impulse
        p, la, lb = sel(ty == JOINT_WELD, pw,
                        m.cross(ra, pw) + jc.angular_impulse,
                        m.cross(rb, pw) + jc.angular_impulse)
    if JOINT_MOTOR in types_present:
        pm = jc.impulse + jc.spring_impulse2
        am = jc.angular_impulse + jc.spring_impulse
        p, la, lb = sel(ty == JOINT_MOTOR, pm,
                        m.cross(ra, pm) + am, m.cross(rb, pm) + am)
    if JOINT_MOUSE in types_present:
        pmo = jc.impulse
        zero = jnp.zeros_like(wa0)
        p, la, lb = sel(ty == JOINT_MOUSE, pmo, zero, m.cross(rb, pmo))
    if JOINT_PRISMATIC in types_present or JOINT_WHEEL in types_present:
        axis_a = m.rot_vec(dqa, m.rot_vec(jc.fa_q, _unit_x(ra)))
        perp_a = m.left_perp(axis_a)
        a1 = m.cross(ra + d, axis_a)
        a2 = m.cross(rb, axis_a)
        s1 = m.cross(ra + d, perp_a)
        s2 = m.cross(rb, perp_a)
        if JOINT_PRISMATIC in types_present:
            axial = (jc.spring_impulse + jc.motor_impulse + jc.lower_impulse
                     - jc.upper_impulse)
            pp = axial[:, None] * axis_a + jc.impulse[:, 0, None] * perp_a
            lap = axial * a1 + jc.impulse[:, 0] * s1 + jc.impulse[:, 1]
            lbp = axial * a2 + jc.impulse[:, 0] * s2 + jc.impulse[:, 1]
            p, la, lb = sel(ty == JOINT_PRISMATIC, pp, lap, lbp)
        if JOINT_WHEEL in types_present:
            axial = jc.spring_impulse + jc.lower_impulse - jc.upper_impulse
            pw = axial[:, None] * axis_a + jc.impulse[:, 0, None] * perp_a
            law = axial * a1 + jc.impulse[:, 0] * s1 + jc.motor_impulse
            lbw = axial * a2 + jc.impulse[:, 0] * s2 + jc.motor_impulse
            p, la, lb = sel(ty == JOINT_WHEEL, pw, law, lbw)

    va = va0 - jc.inv_mass_a[:, None] * p
    wa = wa0 - jc.inv_i_a * la
    vb = vb0 + jc.inv_mass_b[:, None] * p
    wb = wb0 + jc.inv_i_b * lb
    bs = _scatter(bs, jc, mask, va, wa, vb, wb, va0, wa0, vb0, wb0)
    return bs, jc


def _unit_x(like_vec):
    ux = jnp.zeros_like(like_vec)
    return ux.at[..., 0].set(1.0)


def _soft_limit(c, cdot, axial_mass, old_impulse, soft, use_bias, inv_h):
    """Shared lower/upper-limit impulse update (ref: RevoluteJoint.cs:160-198
    and the same pattern in every joint)."""
    bias = jnp.where(c > 0.0, c * inv_h,
                     jnp.where(use_bias, soft[:, 0] * c, 0.0))
    mass_scale = jnp.where(c > 0.0, 1.0, jnp.where(use_bias, soft[:, 1], 1.0))
    imp_scale = jnp.where(c > 0.0, 0.0, jnp.where(use_bias, soft[:, 2], 0.0))
    impulse = -mass_scale * axial_mass * (cdot + bias) - imp_scale * old_impulse
    new_impulse = jnp.maximum(old_impulse + impulse, 0.0)
    return new_impulse, new_impulse - old_impulse


def solve_joints_color(state, bs, jc: JointConstraints, mask, use_bias,
                       h, inv_h, relax_scale=None,
                       types_present: frozenset = frozenset()):
    """One Gauss-Seidel sweep over one color's joints."""
    if not types_present:
        return bs, jc
    mask = mask & jc.active
    va0 = bs.v[jc.body_a]
    wa0 = bs.w[jc.body_a]
    vb0 = bs.v[jc.body_b]
    wb0 = bs.w[jc.body_b]
    dqa, dqb, ra, rb, d = _anchors(bs, jc)
    ma, mb = jc.inv_mass_a, jc.inv_mass_b
    ia, ib = jc.inv_i_a, jc.inv_i_b
    ty = jc.type
    dpa = bs.dp[jc.body_a]
    dpb = bs.dp[jc.body_b]

    va, wa, vb, wb = va0, wa0, vb0, wb0
    upd = {}

    def pick(cond, name, new):
        old = getattr(jc, name) if name not in upd else upd[name]
        upd[name] = jnp.where(cond[:, None] if new.ndim == 2 else cond, new, old)

    def vsel(cond, van, wan, vbn, wbn):
        nonlocal va, wa, vb, wb
        c2 = cond[:, None]
        va = jnp.where(c2, van, va)
        wa = jnp.where(cond, wan, wa)
        vb = jnp.where(c2, vbn, vb)
        wb = jnp.where(cond, wbn, wb)

    soft_c = jc.constraint_soft

    # ---------------- distance (ref: DistanceJoint.cs:155-270) -----------
    if JOINT_DISTANCE in types_present:
        jn = state.joints
        axis, length = m.get_length_and_normalize(d)
        lva, lwa, lvb, lwb = va, wa, vb, wb
        imp = jc.impulse[:, 0]
        low_i, up_i, mot_i = jc.lower_impulse, jc.upper_impulse, jc.motor_impulse

        spring_mode = jn.enable_spring & ((jn.lower < jn.upper) | ~jn.enable_limit)

        # rigid branch
        vr = lvb - lva + (m.cross_sv(lwb, rb) - m.cross_sv(lwa, ra))
        cdot = m.dot(axis, vr)
        c = length - jn.length
        bias = jnp.where(use_bias, soft_c[:, 0] * c, 0.0)
        msc = jnp.where(use_bias, soft_c[:, 1], 1.0)
        isc = jnp.where(use_bias, soft_c[:, 2], 0.0)
        dimp_r = -msc * jc.axial_mass * (cdot + bias) - isc * imp
        imp_rigid = imp + dimp_r

        # spring branch
        d_spr = jnp.where(jn.hertz > 0, 1.0, 0.0)
        bias_s = jc.spring_soft[:, 0] * c
        dimp_s = (-jc.spring_soft[:, 1] * jc.axial_mass * (cdot + bias_s)
                  - jc.spring_soft[:, 2] * imp) * d_spr
        imp_spring = jnp.clip(imp + dimp_s, jn.lower_spring_force * h,
                              jn.upper_spring_force * h)
        dimp_s = imp_spring - imp

        use_spring = spring_mode
        dimp = jnp.where(use_spring, dimp_s, dimp_r)
        new_imp = jnp.where(use_spring, imp_spring, imp_rigid)
        p = dimp[:, None] * axis
        lva = lva - ma[:, None] * p
        lwa = lwa - ia * m.cross(ra, p)
        lvb = lvb + mb[:, None] * p
        lwb = lwb + ib * m.cross(rb, p)

        # limits (only in spring mode; ref :186-242)
        lim = use_spring & jn.enable_limit
        vr = lvb - lva + (m.cross_sv(lwb, rb) - m.cross_sv(lwa, ra))
        cdot_l = m.dot(axis, vr)
        new_low, dlow = _soft_limit(length - jn.lower, cdot_l, jc.axial_mass,
                                    low_i, soft_c, use_bias, inv_h)
        dlow = jnp.where(lim, dlow, 0.0)
        new_low = jnp.where(lim, new_low, low_i)
        p = dlow[:, None] * axis
        lva = lva - ma[:, None] * p
        lwa = lwa - ia * m.cross(ra, p)
        lvb = lvb + mb[:, None] * p
        lwb = lwb + ib * m.cross(rb, p)

        vr = lva - lvb + (m.cross_sv(lwa, ra) - m.cross_sv(lwb, rb))
        cdot_u = m.dot(axis, vr)
        new_up, dup = _soft_limit(jn.upper - length, cdot_u, jc.axial_mass,
                                  up_i, soft_c, use_bias, inv_h)
        dup = jnp.where(lim, dup, 0.0)
        new_up = jnp.where(lim, new_up, up_i)
        p = -dup[:, None] * axis
        lva = lva - ma[:, None] * p
        lwa = lwa - ia * m.cross(ra, p)
        lvb = lvb + mb[:, None] * p
        lwb = lwb + ib * m.cross(rb, p)

        # motor (ref :243-258)
        mot = use_spring & jn.enable_motor
        vr = lvb - lva + (m.cross_sv(lwb, rb) - m.cross_sv(lwa, ra))
        cdot_m = m.dot(axis, vr)
        dimp_m = jc.axial_mass * (jn.motor_speed - cdot_m)
        max_i = h * jn.max_motor_force
        new_mot = jnp.clip(mot_i + dimp_m, -max_i, max_i)
        dimp_m = jnp.where(mot, new_mot - mot_i, 0.0)
        new_mot = jnp.where(mot, new_mot, mot_i)
        p = dimp_m[:, None] * axis
        lva = lva - ma[:, None] * p
        lwa = lwa - ia * m.cross(ra, p)
        lvb = lvb + mb[:, None] * p
        lwb = lwb + ib * m.cross(rb, p)

        is_d = ty == JOINT_DISTANCE
        pick(is_d, "impulse", jnp.stack([new_imp, jc.impulse[:, 1]], axis=1))
        pick(is_d, "lower_impulse", new_low)
        pick(is_d, "upper_impulse", new_up)
        pick(is_d, "motor_impulse", new_mot)
        vsel(is_d, lva, lwa, lvb, lwb)

    # ---------------- revolute (ref: RevoluteJoint.cs:123-224) -----------
    if JOINT_REVOLUTE in types_present:
        jn = state.joints
        lva, lwa, lvb, lwb = va, wa, vb, wb
        qa = m.rot_mul(dqa, jc.fa_q)
        qb = m.rot_mul(dqb, jc.fb_q)
        rel_angle = m.rot_angle(m.rot_inv_mul(qa, qb))
        fixed_rot = ia + ib == 0.0

        # spring
        spr = jn.enable_spring & ~fixed_rot
        cspr = m.unwind_angle(rel_angle - jn.spring_target)
        dimp = (-jc.spring_soft[:, 1] * jc.axial_mass
                * ((lwb - lwa) + jc.spring_soft[:, 0] * cspr)
                - jc.spring_soft[:, 2] * jc.spring_impulse)
        dimp = jnp.where(spr, dimp, 0.0)
        new_spr = jc.spring_impulse + dimp
        lwa = lwa - ia * dimp
        lwb = lwb + ib * dimp

        # motor
        mot = jn.enable_motor & ~fixed_rot
        dimp = -jc.axial_mass * (lwb - lwa - jn.motor_speed)
        max_i = h * jn.max_motor_force
        new_mot = jnp.clip(jc.motor_impulse + dimp, -max_i, max_i)
        dimp = jnp.where(mot, new_mot - jc.motor_impulse, 0.0)
        new_mot = jnp.where(mot, new_mot, jc.motor_impulse)
        lwa = lwa - ia * dimp
        lwb = lwb + ib * dimp

        # limits
        lim = jn.enable_limit & ~fixed_rot
        new_low, dlow = _soft_limit(rel_angle - jn.lower, lwb - lwa,
                                    jc.axial_mass, jc.lower_impulse, soft_c,
                                    use_bias, inv_h)
        dlow = jnp.where(lim, dlow, 0.0)
        new_low = jnp.where(lim, new_low, jc.lower_impulse)
        lwa = lwa - ia * dlow
        lwb = lwb + ib * dlow
        new_up, dup = _soft_limit(jn.upper - rel_angle, lwa - lwb,
                                  jc.axial_mass, jc.upper_impulse, soft_c,
                                  use_bias, inv_h)
        dup = jnp.where(lim, dup, 0.0)
        new_up = jnp.where(lim, new_up, jc.upper_impulse)
        lwa = lwa + ia * dup
        lwb = lwb - ib * dup

        # point constraint (2x2)
        cdot = lvb + m.cross_sv(lwb, rb) - (lva + m.cross_sv(lwa, ra))
        sep = dpb - dpa + (rb - ra) + jc.delta_center
        bias = jnp.where(use_bias, 1.0, 0.0)[..., None] * soft_c[:, 0, None] * sep
        msc = jnp.where(use_bias, soft_c[:, 1], 1.0)
        isc = jnp.where(use_bias, soft_c[:, 2], 0.0)
        k11 = ma + mb + ra[:, 1] ** 2 * ia + rb[:, 1] ** 2 * ib
        k12 = -ra[:, 1] * ra[:, 0] * ia - rb[:, 1] * rb[:, 0] * ib
        k22 = ma + mb + ra[:, 0] ** 2 * ia + rb[:, 0] ** 2 * ib
        bx, by = m.solve22(k11, k12, k12, k22,
                           cdot[:, 0] + bias[:, 0], cdot[:, 1] + bias[:, 1])
        dimp2 = -msc[:, None] * jnp.stack([bx, by], axis=1) - isc[:, None] * jc.impulse
        new_lin = jc.impulse + dimp2
        lva = lva - ma[:, None] * dimp2
        lwa = lwa - ia * m.cross(ra, dimp2)
        lvb = lvb + mb[:, None] * dimp2
        lwb = lwb + ib * m.cross(rb, dimp2)

        is_r = ty == JOINT_REVOLUTE
        pick(is_r, "impulse", new_lin)
        pick(is_r, "spring_impulse", new_spr)
        pick(is_r, "motor_impulse", new_mot)
        pick(is_r, "lower_impulse", new_low)
        pick(is_r, "upper_impulse", new_up)
        vsel(is_r, lva, lwa, lvb, lwb)

    # ---------------- weld (ref: WeldJoint.cs:98-160) ---------------------
    if JOINT_WELD in types_present:
        jn = state.joints
        lva, lwa, lvb, lwb = va, wa, vb, wb
        qa = m.rot_mul(dqa, jc.fa_q)
        qb = m.rot_mul(dqb, jc.fb_q)
        rel_angle = m.rot_angle(m.rot_inv_mul(qa, qb))
        # angular
        ang_on = use_bias | (jn.angular_hertz > 0.0)
        bias = jnp.where(ang_on, jc.angular_soft[:, 0] * rel_angle, 0.0)
        msc = jnp.where(ang_on, jc.angular_soft[:, 1], 1.0)
        isc = jnp.where(ang_on, jc.angular_soft[:, 2], 0.0)
        dimp = (-msc * jc.axial_mass * (lwb - lwa + bias)
                - isc * jc.angular_impulse)
        new_ang = jc.angular_impulse + dimp
        lwa = lwa - ia * dimp
        lwb = lwb + ib * dimp
        # linear (2x2) — weld uses spring_soft which defaults to constraint
        lin_on = use_bias | (jn.hertz > 0.0)
        sep = dpb - dpa + (rb - ra) + jc.delta_center
        biasv = jnp.where(lin_on, 1.0, 0.0)[:, None] * jc.spring_soft[:, 0, None] * sep
        mscl = jnp.where(lin_on, jc.spring_soft[:, 1], 1.0)
        iscl = jnp.where(lin_on, jc.spring_soft[:, 2], 0.0)
        cdot = lvb + m.cross_sv(lwb, rb) - (lva + m.cross_sv(lwa, ra))
        k11 = ma + mb + ra[:, 1] ** 2 * ia + rb[:, 1] ** 2 * ib
        k12 = -ra[:, 1] * ra[:, 0] * ia - rb[:, 1] * rb[:, 0] * ib
        k22 = ma + mb + ra[:, 0] ** 2 * ia + rb[:, 0] ** 2 * ib
        bx, by = m.solve22(k11, k12, k12, k22,
                           cdot[:, 0] + biasv[:, 0], cdot[:, 1] + biasv[:, 1])
        dimp2 = -mscl[:, None] * jnp.stack([bx, by], axis=1) - iscl[:, None] * jc.impulse
        new_lin = jc.impulse + dimp2
        lva = lva - ma[:, None] * dimp2
        lwa = lwa - ia * m.cross(ra, dimp2)
        lvb = lvb + mb[:, None] * dimp2
        lwb = lwb + ib * m.cross(rb, dimp2)

        is_w = ty == JOINT_WELD
        pick(is_w, "impulse", new_lin)
        pick(is_w, "angular_impulse", new_ang)
        vsel(is_w, lva, lwa, lvb, lwb)

    # ---------------- motor (ref: MotorJoint.cs:122-215) ------------------
    if JOINT_MOTOR in types_present:
        jn = state.joints
        lva, lwa, lvb, lwb = va, wa, vb, wb
        qa = m.rot_mul(dqa, jc.fa_q)
        qb = m.rot_mul(dqb, jc.fb_q)
        rel_angle = m.rot_angle(m.rot_inv_mul(qa, qb))
        # angular spring
        aspr = (jn.max_spring_torque > 0.0) & (jn.angular_hertz > 0.0)
        bias = jc.angular_soft[:, 0] * rel_angle
        dimp = (-jc.angular_soft[:, 1] * jc.axial_mass * (lwb - lwa + bias)
                - jc.angular_soft[:, 2] * jc.spring_impulse)
        max_i = h * jn.max_spring_torque
        new_aspr = jnp.clip(jc.spring_impulse + dimp, -max_i, max_i)
        dimp = jnp.where(aspr, new_aspr - jc.spring_impulse, 0.0)
        new_aspr = jnp.where(aspr, new_aspr, jc.spring_impulse)
        lwa = lwa - ia * dimp
        lwb = lwb + ib * dimp
        # angular velocity drive
        avel = jn.max_velocity_torque > 0.0
        dimp = -jc.axial_mass * (lwb - lwa - jn.angular_velocity)
        max_i = h * jn.max_velocity_torque
        new_avel = jnp.clip(jc.angular_impulse + dimp, -max_i, max_i)
        dimp = jnp.where(avel, new_avel - jc.angular_impulse, 0.0)
        new_avel = jnp.where(avel, new_avel, jc.angular_impulse)
        lwa = lwa - ia * dimp
        lwb = lwb + ib * dimp

        k11 = ma + mb + ra[:, 1] ** 2 * ia + rb[:, 1] ** 2 * ib
        k12 = -ra[:, 1] * ra[:, 0] * ia - rb[:, 1] * rb[:, 0] * ib
        k22 = ma + mb + ra[:, 0] ** 2 * ia + rb[:, 0] ** 2 * ib

        # linear spring toward zero separation
        lspr = (jn.max_spring_force > 0.0) & (jn.hertz > 0.0)
        sep = dpb - dpa + (rb - ra) + jc.delta_center
        cdot = (lvb + m.cross_sv(lwb, rb) - (lva + m.cross_sv(lwa, ra))
                + jc.spring_soft[:, 0, None] * sep)
        bx, by = m.solve22(k11, k12, k12, k22, cdot[:, 0], cdot[:, 1])
        bvec = jnp.stack([bx, by], axis=1)
        dimp2 = (-jc.spring_soft[:, 1, None] * bvec
                 - jc.spring_soft[:, 2, None] * jc.spring_impulse2)
        new_lspr = jc.spring_impulse2 + dimp2
        max_i = h * jn.max_spring_force
        ln = m.length(new_lspr)
        over = ln > max_i
        new_lspr = jnp.where(over[:, None],
                             new_lspr * (max_i / jnp.where(ln > 0, ln, 1.0))[:, None],
                             new_lspr)
        dimp2 = jnp.where(lspr[:, None], new_lspr - jc.spring_impulse2, 0.0)
        new_lspr = jnp.where(lspr[:, None], new_lspr, jc.spring_impulse2)
        lva = lva - ma[:, None] * dimp2
        lwa = lwa - ia * m.cross(ra, dimp2)
        lvb = lvb + mb[:, None] * dimp2
        lwb = lwb + ib * m.cross(rb, dimp2)

        # linear velocity drive
        lvel = jn.max_velocity_force > 0.0
        cdot = (lvb + m.cross_sv(lwb, rb) - (lva + m.cross_sv(lwa, ra))
                - jn.linear_velocity)
        bx, by = m.solve22(k11, k12, k12, k22, cdot[:, 0], cdot[:, 1])
        dimp2 = -jnp.stack([bx, by], axis=1)
        new_lvel = jc.impulse + dimp2
        max_i = h * jn.max_velocity_force
        ln = m.length(new_lvel)
        over = ln > max_i
        new_lvel = jnp.where(over[:, None],
                             new_lvel * (max_i / jnp.where(ln > 0, ln, 1.0))[:, None],
                             new_lvel)
        dimp2 = jnp.where(lvel[:, None], new_lvel - jc.impulse, 0.0)
        new_lvel = jnp.where(lvel[:, None], new_lvel, jc.impulse)
        lva = lva - ma[:, None] * dimp2
        lwa = lwa - ia * m.cross(ra, dimp2)
        lvb = lvb + mb[:, None] * dimp2
        lwb = lwb + ib * m.cross(rb, dimp2)

        is_m = ty == JOINT_MOTOR
        pick(is_m, "impulse", new_lvel)
        pick(is_m, "spring_impulse", new_aspr)
        pick(is_m, "spring_impulse2", new_lspr)
        pick(is_m, "angular_impulse", new_avel)
        vsel(is_m, lva, lwa, lvb, lwb)

    # ---------------- prismatic + wheel (shared axis frame) ---------------
    if JOINT_PRISMATIC in types_present or JOINT_WHEEL in types_present:
        jn = state.joints
        axis_a = m.rot_vec(dqa, m.rot_vec(jc.fa_q, _unit_x(ra)))
        perp_a = m.left_perp(axis_a)
        translation = m.dot(axis_a, d)
        a1 = m.cross(ra + d, axis_a)
        a2 = m.cross(rb, axis_a)
        s1 = m.cross(ra + d, perp_a)
        s2 = m.cross(rb, perp_a)
        ka = ma + mb + ia * a1**2 + ib * a2**2
        ax_mass = jnp.where(ka > 0, 1.0 / jnp.where(ka > 0, ka, 1.0), 0.0)

        if JOINT_PRISMATIC in types_present:
            lva, lwa, lvb, lwb = va, wa, vb, wb
            qa = m.rot_mul(dqa, jc.fa_q)
            qb = m.rot_mul(dqb, jc.fb_q)
            rel_angle = m.rot_angle(m.rot_inv_mul(qa, qb))

            def adot(vb_, va_, wb_, wa_):
                return m.dot(axis_a, vb_ - va_) + a2 * wb_ - a1 * wa_

            # spring
            spr = jn.enable_spring
            cspr = translation - jn.spring_target
            dimp = (-jc.spring_soft[:, 1] * ax_mass
                    * (adot(lvb, lva, lwb, lwa) + jc.spring_soft[:, 0] * cspr)
                    - jc.spring_soft[:, 2] * jc.spring_impulse)
            dimp = jnp.where(spr, dimp, 0.0)
            new_spr = jc.spring_impulse + dimp
            p = dimp[:, None] * axis_a
            lva = lva - ma[:, None] * p
            lwa = lwa - ia * dimp * a1
            lvb = lvb + mb[:, None] * p
            lwb = lwb + ib * dimp * a2

            # motor
            mot = jn.enable_motor
            dimp = ax_mass * (jn.motor_speed - adot(lvb, lva, lwb, lwa))
            max_i = h * jn.max_motor_force
            new_mot = jnp.clip(jc.motor_impulse + dimp, -max_i, max_i)
            dimp = jnp.where(mot, new_mot - jc.motor_impulse, 0.0)
            new_mot = jnp.where(mot, new_mot, jc.motor_impulse)
            p = dimp[:, None] * axis_a
            lva = lva - ma[:, None] * p
            lwa = lwa - ia * dimp * a1
            lvb = lvb + mb[:, None] * p
            lwb = lwb + ib * dimp * a2

            # limits
            lim = jn.enable_limit
            new_low, dlow = _soft_limit(translation - jn.lower,
                                        adot(lvb, lva, lwb, lwa), ax_mass,
                                        jc.lower_impulse, soft_c, use_bias, inv_h)
            dlow = jnp.where(lim, dlow, 0.0)
            new_low = jnp.where(lim, new_low, jc.lower_impulse)
            p = dlow[:, None] * axis_a
            lva = lva - ma[:, None] * p
            lwa = lwa - ia * dlow * a1
            lvb = lvb + mb[:, None] * p
            lwb = lwb + ib * dlow * a2

            new_up, dup = _soft_limit(jn.upper - translation,
                                      -adot(lvb, lva, lwb, lwa), ax_mass,
                                      jc.upper_impulse, soft_c, use_bias, inv_h)
            dup = jnp.where(lim, dup, 0.0)
            new_up = jnp.where(lim, new_up, jc.upper_impulse)
            p = dup[:, None] * axis_a
            lva = lva + ma[:, None] * p
            lwa = lwa + ia * dup * a1
            lvb = lvb - mb[:, None] * p
            lwb = lwb - ib * dup * a2

            # perp + angle 2x2 block
            cdot1 = m.dot(perp_a, lvb - lva) + s2 * lwb - s1 * lwa
            cdot2 = lwb - lwa
            bias1 = jnp.where(use_bias, soft_c[:, 0] * m.dot(perp_a, d), 0.0)
            bias2 = jnp.where(use_bias, soft_c[:, 0] * rel_angle, 0.0)
            msc = jnp.where(use_bias, soft_c[:, 1], 1.0)
            isc = jnp.where(use_bias, soft_c[:, 2], 0.0)
            k11 = ma + mb + ia * s1**2 + ib * s2**2
            k12 = ia * s1 + ib * s2
            k22 = ia + ib
            k22 = jnp.where(k22 == 0.0, 1.0, k22)
            bx, by = m.solve22(k11, k12, k12, k22, cdot1 + bias1, cdot2 + bias2)
            dimp2 = -msc[:, None] * jnp.stack([bx, by], axis=1) - isc[:, None] * jc.impulse
            new_lin = jc.impulse + dimp2
            p = dimp2[:, 0, None] * perp_a
            la_ = dimp2[:, 0] * s1 + dimp2[:, 1]
            lb_ = dimp2[:, 0] * s2 + dimp2[:, 1]
            lva = lva - ma[:, None] * p
            lwa = lwa - ia * la_
            lvb = lvb + mb[:, None] * p
            lwb = lwb + ib * lb_

            is_p = ty == JOINT_PRISMATIC
            pick(is_p, "impulse", new_lin)
            pick(is_p, "spring_impulse", new_spr)
            pick(is_p, "motor_impulse", new_mot)
            pick(is_p, "lower_impulse", new_low)
            pick(is_p, "upper_impulse", new_up)
            vsel(is_p, lva, lwa, lvb, lwb)

        if JOINT_WHEEL in types_present:
            lva, lwa, lvb, lwb = va, wa, vb, wb
            fixed_rot = ia + ib == 0.0
            km = ia + ib
            motor_mass = jnp.where(km > 0, 1.0 / jnp.where(km > 0, km, 1.0), 0.0)
            kp = ma + mb + ia * s1**2 + ib * s2**2
            perp_mass = jnp.where(kp > 0, 1.0 / jnp.where(kp > 0, kp, 1.0), 0.0)

            def adot(vb_, va_, wb_, wa_):
                return m.dot(axis_a, vb_ - va_) + a2 * wb_ - a1 * wa_

            # motor (rotational)
            mot = jn.enable_motor & ~fixed_rot
            dimp = -motor_mass * (lwb - lwa - jn.motor_speed)
            max_i = h * jn.max_motor_force
            new_mot = jnp.clip(jc.motor_impulse + dimp, -max_i, max_i)
            dimp = jnp.where(mot, new_mot - jc.motor_impulse, 0.0)
            new_mot = jnp.where(mot, new_mot, jc.motor_impulse)
            lwa = lwa - ia * dimp
            lwb = lwb + ib * dimp

            # suspension spring
            spr = jn.enable_spring
            dimp = (-jc.spring_soft[:, 1] * ax_mass
                    * (adot(lvb, lva, lwb, lwa) + jc.spring_soft[:, 0] * translation)
                    - jc.spring_soft[:, 2] * jc.spring_impulse)
            dimp = jnp.where(spr, dimp, 0.0)
            new_spr = jc.spring_impulse + dimp
            p = dimp[:, None] * axis_a
            lva = lva - ma[:, None] * p
            lwa = lwa - ia * dimp * a1
            lvb = lvb + mb[:, None] * p
            lwb = lwb + ib * dimp * a2

            # limits
            lim = jn.enable_limit
            new_low, dlow = _soft_limit(translation - jn.lower,
                                        adot(lvb, lva, lwb, lwa), ax_mass,
                                        jc.lower_impulse, soft_c, use_bias, inv_h)
            dlow = jnp.where(lim, dlow, 0.0)
            new_low = jnp.where(lim, new_low, jc.lower_impulse)
            p = dlow[:, None] * axis_a
            lva = lva - ma[:, None] * p
            lwa = lwa - ia * dlow * a1
            lvb = lvb + mb[:, None] * p
            lwb = lwb + ib * dlow * a2

            new_up, dup = _soft_limit(jn.upper - translation,
                                      -adot(lvb, lva, lwb, lwa), ax_mass,
                                      jc.upper_impulse, soft_c, use_bias, inv_h)
            dup = jnp.where(lim, dup, 0.0)
            new_up = jnp.where(lim, new_up, jc.upper_impulse)
            p = dup[:, None] * axis_a
            lva = lva + ma[:, None] * p
            lwa = lwa + ia * dup * a1
            lvb = lvb - mb[:, None] * p
            lwb = lwb - ib * dup * a2

            # perpendicular point-on-line
            cdot = m.dot(perp_a, lvb - lva) + s2 * lwb - s1 * lwa
            bias = jnp.where(use_bias, soft_c[:, 0] * m.dot(perp_a, d), 0.0)
            msc = jnp.where(use_bias, soft_c[:, 1], 1.0)
            isc = jnp.where(use_bias, soft_c[:, 2], 0.0)
            dimp = -msc * perp_mass * (cdot + bias) - isc * jc.impulse[:, 0]
            new_perp = jc.impulse[:, 0] + dimp
            p = dimp[:, None] * perp_a
            lva = lva - ma[:, None] * p
            lwa = lwa - ia * dimp * s1
            lvb = lvb + mb[:, None] * p
            lwb = lwb + ib * dimp * s2

            is_wh = ty == JOINT_WHEEL
            pick(is_wh, "impulse",
                 jnp.stack([new_perp, jc.impulse[:, 1]], axis=1))
            pick(is_wh, "spring_impulse", new_spr)
            pick(is_wh, "motor_impulse", new_mot)
            pick(is_wh, "lower_impulse", new_low)
            pick(is_wh, "upper_impulse", new_up)
            vsel(is_wh, lva, lwa, lvb, lwb)

    # ---------------- mouse (soft target drag; upstream b2MouseJoint — the
    # reference excludes it from its build, ref Box2D.csproj:23-25) --------
    if JOINT_MOUSE in types_present:
        jn = state.joints
        lva, lwa, lvb, lwb = va, wa, vb, wb
        # target lives in frame_a_p (world); anchor on body B
        target = jc.fa_p + state.bodies.center[jc.body_a]  # frame A on ground
        anchor = state.bodies.center[jc.body_b] + rb
        c = (anchor + bs.dp[jc.body_b]) - target
        soft = jc.spring_soft
        cdot = lvb + m.cross_sv(lwb, rb)
        k11 = mb + rb[:, 1] ** 2 * ib
        k12 = -rb[:, 1] * rb[:, 0] * ib
        k22 = mb + rb[:, 0] ** 2 * ib
        bx, by = m.solve22(k11, k12, k12, k22,
                           cdot[:, 0] + soft[:, 0] * c[:, 0],
                           cdot[:, 1] + soft[:, 0] * c[:, 1])
        dimp2 = (-soft[:, 1, None] * jnp.stack([bx, by], axis=1)
                 - soft[:, 2, None] * jc.impulse)
        new_imp = jc.impulse + dimp2
        max_i = h * jn.max_velocity_force
        ln = m.length(new_imp)
        over = (ln > max_i) & (max_i > 0)
        new_imp = jnp.where(over[:, None],
                            new_imp * (max_i / jnp.where(ln > 0, ln, 1.0))[:, None],
                            new_imp)
        dimp2 = new_imp - jc.impulse
        lvb = lvb + mb[:, None] * dimp2
        lwb = lwb + ib * m.cross(rb, dimp2)
        is_mo = ty == JOINT_MOUSE
        pick(is_mo, "impulse", new_imp)
        vsel(is_mo, lva, lwa, lvb, lwb)

    # write back impulses for masked lanes only
    def commit(name):
        if name in upd:
            old = getattr(jc, name)
            new = upd[name]
            mk = mask[:, None] if old.ndim == 2 else mask
            return jnp.where(mk, new, old)
        return getattr(jc, name)

    jc = jc._replace(
        impulse=commit("impulse"),
        spring_impulse=commit("spring_impulse"),
        spring_impulse2=commit("spring_impulse2"),
        motor_impulse=commit("motor_impulse"),
        lower_impulse=commit("lower_impulse"),
        upper_impulse=commit("upper_impulse"),
        angular_impulse=commit("angular_impulse"),
    )
    bs = _scatter(bs, jc, mask, va, wa, vb, wb, va0, wa0, vb0, wb0)
    return bs, jc
