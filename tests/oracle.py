"""Scalar NumPy transliteration of the reference's TGS-soft solver.

This is an INDEPENDENT oracle for the solver/integration math, written
directly from the C# reference (not from the engine's JAX code): it consumes
the engine's narrow-phase output for its own trajectory and advances bodies
with plain per-contact scalar loops in reference stage order
(ref: src/Solver.cs:599-727 SolverTask):

    per substep: IntegrateVelocities (src/Solver.cs:121-160)
                 -> WarmStart (src/ContactSolver.cs:117-164)
                 -> Solve useBias=true (src/ContactSolver.cs:165-264)
                 -> IntegratePositions (src/Solver.cs:199-212)
                 -> Relax useBias=false
    then Restitution (src/ContactSolver.cs:265-322) and store.

Where the C# port deviates from upstream Box2D v3, the oracle (like the
engine) implements the upstream-correct semantics:
- SolveOverflowContacts/ApplyOverflowRestitution read stateB via indexA
  (ref: src/ContactSolver.cs:190,309 `states.Data + constraint.indexA`) —
  upstream uses indexB;
- ApplyOverflowRestitution clamps `Max(-normalImpulse + impulse, 0)`
  (ref: src/ContactSolver.cs:306) — upstream uses `+normalImpulse`;
- the overflow relax pass keeps useBias=true (ref: src/Solver.cs:668-670) —
  upstream relaxes without bias.

All math runs in float32 to match the engine's on-device precision.
"""

from __future__ import annotations

import dataclasses

import numpy as np

F = np.float32


def softness(hertz, zeta, h):
    """ref: src/Solver.cs:10-26."""
    hertz, zeta, h = F(hertz), F(zeta), F(h)
    if hertz == 0:
        return F(0), F(0), F(0)
    omega = F(2.0 * np.pi) * hertz
    a1 = F(2) * zeta + h * omega
    a2 = h * omega * a1
    a3 = F(1) / (F(1) + a2)
    return omega / a1, a2 * a3, a3  # biasRate, massScale, impulseScale


def _cross(a, b):
    return a[0] * b[1] - a[1] * b[0]


def _cross_sv(s, v):
    return np.array([-s * v[1], s * v[0]], F)


@dataclasses.dataclass
class OBody:
    inv_mass: F
    inv_inertia: F
    v: np.ndarray       # (2,)
    w: F
    dp: np.ndarray      # (2,) substep delta position
    dq: np.ndarray      # (2,) substep delta rotation (c, s)
    force: np.ndarray
    torque: F
    gravity_scale: F
    linear_damping: F
    angular_damping: F
    dynamic: bool


@dataclasses.dataclass
class OPoint:
    anchor_a: np.ndarray
    anchor_b: np.ndarray
    base_separation: F
    normal_mass: F
    tangent_mass: F
    relative_velocity: F
    normal_impulse: F
    tangent_impulse: F
    total_normal_impulse: F


@dataclasses.dataclass
class OContact:
    index_a: int
    index_b: int
    normal: np.ndarray
    friction: F
    restitution: F
    tangent_speed: F
    rolling_resistance: F
    rolling_mass: F
    rolling_impulse: F
    soft: tuple          # (biasRate, massScale, impulseScale)
    points: list


def prepare_contacts(bodies, raw, tuning, h, inv_h):
    """ref: src/ContactSolver.cs:40-115 PrepareOverflowContacts.

    raw: list of dicts with manifold data for touching pairs:
    {a, b, normal, anchors_a, anchors_b, separations, normal_impulses,
     tangent_impulses, rolling_impulse, friction, restitution,
     tangent_speed, rolling_resistance}."""
    contact_hertz = min(F(tuning["contact_hertz"]), F(0.125) * F(inv_h))
    zeta = F(tuning["contact_damping_ratio"])
    soft_c = softness(contact_hertz, zeta, h)
    soft_s = softness(2 * contact_hertz, zeta, h)
    warm = F(1.0) if tuning.get("enable_warm_starting", True) else F(0.0)

    out = []
    for c in raw:
        a, b_ = c["a"], c["b"]
        ba, bb = bodies[a], bodies[b_]
        ma, mb = ba.inv_mass, bb.inv_mass
        ia, ib = ba.inv_inertia, bb.inv_inertia
        is_static = (not ba.dynamic) or (not bb.dynamic)
        soft = soft_s if is_static else soft_c
        if tuning.get("enable_contact_softening", False) and not is_static:
            # ref: src/ContactSolver.cs:524-533
            lo, hi = min(ma, mb), max(ma, mb)
            ratio = F(1) if lo == hi else max(F(0.5), lo / hi)
            soft = softness(ratio * contact_hertz, ratio * zeta, h)
        k = ia + ib
        normal = np.asarray(c["normal"], F)
        tangent = np.array([normal[1], -normal[0]], F)  # RightPerp
        pts = []
        for j in range(len(c["anchors_a"])):
            ra = np.asarray(c["anchors_a"][j], F)
            rb = np.asarray(c["anchors_b"][j], F)
            base_sep = F(c["separations"][j]) - F((rb - ra) @ normal)
            rn_a, rn_b = _cross(ra, normal), _cross(rb, normal)
            k_n = ma + mb + ia * rn_a * rn_a + ib * rn_b * rn_b
            rt_a, rt_b = _cross(ra, tangent), _cross(rb, tangent)
            k_t = ma + mb + ia * rt_a * rt_a + ib * rt_b * rt_b
            vr_a = ba.v + _cross_sv(ba.w, ra)
            vr_b = bb.v + _cross_sv(bb.w, rb)
            pts.append(OPoint(
                anchor_a=ra, anchor_b=rb, base_separation=base_sep,
                normal_mass=F(1 / k_n) if k_n > 0 else F(0),
                tangent_mass=F(1 / k_t) if k_t > 0 else F(0),
                relative_velocity=F(normal @ (vr_b - vr_a)),
                normal_impulse=warm * F(c["normal_impulses"][j]),
                tangent_impulse=warm * F(c["tangent_impulses"][j]),
                total_normal_impulse=F(0)))
        out.append(OContact(
            index_a=a, index_b=b_, normal=normal,
            friction=F(c["friction"]), restitution=F(c["restitution"]),
            tangent_speed=F(c["tangent_speed"]),
            rolling_resistance=F(c["rolling_resistance"]),
            rolling_mass=F(1 / k) if k > 0 else F(0),
            rolling_impulse=warm * F(c["rolling_impulse"]),
            soft=soft, points=pts))
    return out


def integrate_velocities(bodies, gravity, h, inv_dt, max_linear_speed):
    """ref: src/Solver.cs:121-160 IntegrateVelocitiesTask."""
    from box2d_tpu.constants import MAX_ROTATION

    max_ang = F(MAX_ROTATION) * F(inv_dt)
    for b in bodies:
        if not b.dynamic:
            continue
        lin_damp = F(1) / (F(1) + h * b.linear_damping)
        ang_damp = F(1) / (F(1) + h * b.angular_damping)
        g_scale = b.gravity_scale if b.inv_mass > 0 else F(0)
        dv = h * b.inv_mass * b.force + h * g_scale * gravity
        dw = h * b.inv_inertia * b.torque
        v = dv + lin_damp * b.v
        w = dw + ang_damp * b.w
        if v @ v > max_linear_speed * max_linear_speed:
            v = v * (max_linear_speed / F(np.sqrt(v @ v)))
        if abs(w) > max_ang:
            w = w * (max_ang / abs(w))
        b.v, b.w = v.astype(F), F(w)


def integrate_positions(bodies, h):
    """ref: src/Solver.cs:199-212 IntegratePositionsTask +
    Rotation.Integrate (include/MathFunctions.cs:129-137)."""
    for b in bodies:
        if not b.dynamic:
            continue
        b.dp = (b.dp + h * b.v).astype(F)
        da = h * b.w
        c1 = b.dq[0] - da * b.dq[1]
        s1 = b.dq[1] + da * b.dq[0]
        mag = F(np.sqrt(c1 * c1 + s1 * s1))
        inv = F(1) / mag if mag > 0 else F(0)
        b.dq = np.array([c1 * inv, s1 * inv], F)


def warm_start(bodies, contacts):
    """ref: src/ContactSolver.cs:117-164 WarmStartOverflowContacts."""
    for c in contacts:
        ba, bb = bodies[c.index_a], bodies[c.index_b]
        normal = c.normal
        tangent = np.array([normal[1], -normal[0]], F)
        va, wa, vb, wb = ba.v.copy(), ba.w, bb.v.copy(), bb.w
        for p in c.points:
            imp = p.normal_impulse * normal + p.tangent_impulse * tangent
            wa -= ba.inv_inertia * _cross(p.anchor_a, imp)
            va = va - ba.inv_mass * imp
            wb += bb.inv_inertia * _cross(p.anchor_b, imp)
            vb = vb + bb.inv_mass * imp
        wa -= ba.inv_inertia * c.rolling_impulse
        wb += bb.inv_inertia * c.rolling_impulse
        if ba.dynamic:
            ba.v, ba.w = va.astype(F), F(wa)
        if bb.dynamic:
            bb.v, bb.w = vb.astype(F), F(wb)


def solve(bodies, contacts, inv_h, contact_speed, use_bias):
    """ref: src/ContactSolver.cs:165-264 SolveOverflowContacts
    (upstream-correct indexB; relax = use_bias False)."""
    for c in contacts:
        ba, bb = bodies[c.index_a], bodies[c.index_b]
        ma, mb = ba.inv_mass, bb.inv_mass
        ia, ib = ba.inv_inertia, bb.inv_inertia
        va, wa, vb, wb = ba.v.copy(), ba.w, bb.v.copy(), bb.w
        dqa, dqb = ba.dq, bb.dq
        dp = bb.dp - ba.dp
        normal = c.normal
        tangent = np.array([normal[1], -normal[0]], F)
        bias_rate, mass_sc, imp_sc = c.soft
        total_normal = F(0)
        for p in c.points:
            ra, rb = p.anchor_a, p.anchor_b
            rot_a = np.array([dqa[0] * ra[0] - dqa[1] * ra[1],
                              dqa[1] * ra[0] + dqa[0] * ra[1]], F)
            rot_b = np.array([dqb[0] * rb[0] - dqb[1] * rb[1],
                              dqb[1] * rb[0] + dqb[0] * rb[1]], F)
            ds = dp + rot_b - rot_a
            s = p.base_separation + F(ds @ normal)
            velocity_bias, mass_scale, impulse_scale = F(0), F(1), F(0)
            if s > 0:
                velocity_bias = s * inv_h
            elif use_bias:
                velocity_bias = max(mass_sc * bias_rate * s, -contact_speed)
                mass_scale, impulse_scale = mass_sc, imp_sc
            vr_a = va + _cross_sv(wa, ra)
            vr_b = vb + _cross_sv(wb, rb)
            vn = F((vr_b - vr_a) @ normal)
            impulse = (-p.normal_mass * (mass_scale * vn + velocity_bias)
                       - impulse_scale * p.normal_impulse)
            new_imp = max(p.normal_impulse + impulse, F(0))
            impulse = new_imp - p.normal_impulse
            p.normal_impulse = F(new_imp)
            p.total_normal_impulse = F(p.total_normal_impulse + new_imp)
            total_normal += new_imp
            pv = impulse * normal
            va = va - ma * pv
            wa -= ia * _cross(ra, pv)
            vb = vb + mb * pv
            wb += ib * _cross(rb, pv)
        for p in c.points:
            ra, rb = p.anchor_a, p.anchor_b
            vr_a = va + _cross_sv(wa, ra)
            vr_b = vb + _cross_sv(wb, rb)
            vt = F((vr_b - vr_a) @ tangent) - c.tangent_speed
            impulse = -p.tangent_mass * vt
            max_f = c.friction * p.normal_impulse
            new_imp = np.clip(p.tangent_impulse + impulse, -max_f, max_f)
            impulse = new_imp - p.tangent_impulse
            p.tangent_impulse = F(new_imp)
            pv = impulse * tangent
            va = va - ma * pv
            wa -= ia * _cross(ra, pv)
            vb = vb + mb * pv
            wb += ib * _cross(rb, pv)
        # rolling resistance (ref: src/ContactSolver.cs:244-252)
        d_lambda = -c.rolling_mass * (wb - wa)
        max_lambda = c.rolling_resistance * total_normal
        new_roll = np.clip(c.rolling_impulse + d_lambda,
                           -max_lambda, max_lambda)
        d_lambda = new_roll - c.rolling_impulse
        c.rolling_impulse = F(new_roll)
        wa -= ia * d_lambda
        wb += ib * d_lambda
        if ba.dynamic:
            ba.v, ba.w = va.astype(F), F(wa)
        if bb.dynamic:
            bb.v, bb.w = vb.astype(F), F(wb)


def apply_restitution(bodies, contacts, threshold):
    """ref: src/ContactSolver.cs:265-322 (upstream-correct clamp sign)."""
    for c in contacts:
        if c.restitution == 0:
            continue
        ba, bb = bodies[c.index_a], bodies[c.index_b]
        va, wa, vb, wb = ba.v.copy(), ba.w, bb.v.copy(), bb.w
        normal = c.normal
        for p in c.points:
            if p.relative_velocity > -threshold or p.total_normal_impulse == 0:
                continue
            ra, rb = p.anchor_a, p.anchor_b
            vr_a = va + _cross_sv(wa, ra)
            vr_b = vb + _cross_sv(wb, rb)
            vn = F((vr_b - vr_a) @ normal)
            impulse = -p.normal_mass * (vn + c.restitution * p.relative_velocity)
            new_imp = max(p.normal_impulse + impulse, F(0))
            impulse = new_imp - p.normal_impulse
            p.normal_impulse = F(new_imp)
            p.total_normal_impulse = F(p.total_normal_impulse + impulse)
            pv = impulse * normal
            va = va - ba.inv_mass * pv
            wa -= ba.inv_inertia * _cross(ra, pv)
            vb = vb + bb.inv_mass * pv
            wb += bb.inv_inertia * _cross(rb, pv)
        if ba.dynamic:
            ba.v, ba.w = va.astype(F), F(wa)
        if bb.dynamic:
            bb.v, bb.w = vb.astype(F), F(wb)


# ---------------------------------------------------------------------------
# joints: scalar transliterations of src/joints/RevoluteJoint.cs and
# src/joints/DistanceJoint.cs (the two oracle-covered types).
#
# Port deviation implemented upstream-correct (like the engine,
# box2d_tpu/joints.py header): ref DistanceJoint.cs:99-100 assigns
# `iA = bodySimA.invMass` — upstream Box2D v3 uses the inverse INERTIA.
# ---------------------------------------------------------------------------


def _rot_mul(q, r):
    return np.array([q[0] * r[0] - q[1] * r[1],
                     q[1] * r[0] + q[0] * r[1]], F)


def _inv_mul_rot(q, r):
    """InvMulRot (ref: include/MathFunctions.cs:158-162)."""
    return np.array([q[0] * r[0] + q[1] * r[1],
                     q[0] * r[1] - q[1] * r[0]], F)


def _rot_vec(q, v):
    return np.array([q[0] * v[0] - q[1] * v[1],
                     q[1] * v[0] + q[0] * v[1]], F)


def _unwind(a):
    """ref: include/MathFunctions.cs:164."""
    return F((a + np.pi) % (2 * np.pi) - np.pi)


def _mat22_solve(k11, k12, k22, b):
    """Mat22.Solve by Cramer (ref: include/MathFunctions.cs:196-217)."""
    det = k11 * k22 - k12 * k12
    if det == 0:
        return np.zeros(2, F)
    inv = F(1) / det
    return np.array([inv * (k22 * b[0] - k12 * b[1]),
                     inv * (k11 * b[1] - k12 * b[0])], F)


@dataclasses.dataclass
class OJoint:
    """One revolute or distance joint, prepared fresh each step.

    Static params come from the dict `d` (read from the engine's Joints
    state once); world frames/axial masses are recomputed in prepare."""
    kind: str
    index_a: int
    index_b: int
    d: dict
    # prepared per step:
    frame_a_p: np.ndarray = None
    frame_a_q: np.ndarray = None
    frame_b_p: np.ndarray = None
    frame_b_q: np.ndarray = None
    delta_center: np.ndarray = None
    axial_mass: F = F(0)
    spring_soft: tuple = (F(0), F(0), F(0))
    constraint_soft: tuple = (F(0), F(0), F(0))
    # extra prepared state for wheel/weld/motor:
    perp_mass: F = F(0)
    motor_mass: F = F(0)        # wheel rotational / weld+motor angular
    lin_soft: tuple = (F(0), F(0), F(0))
    ang_soft: tuple = (F(0), F(0), F(0))
    linear_mass: tuple = None   # motor joint 2x2 (k11, k12, k22)
    # persistent impulses:
    impulse: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(2, F))   # revolute linear / [dist,0]
    #   wheel: impulse[0] = perp; weld: linear vec2; motor: velocity vec2
    spring_impulse: F = F(0)    # motor: angular spring impulse
    spring_impulse2: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(2, F))   # motor linear spring vec2
    angular_impulse: F = F(0)   # weld angular / motor angular velocity
    motor_impulse: F = F(0)
    lower_impulse: F = F(0)
    upper_impulse: F = F(0)


def prepare_joints(bodies, center, rot, joints, tuning, h, inv_h):
    """ref: src/Joint.cs:125-130 PrepareJoint + per-type Prepare."""
    warm = F(1.0) if tuning.get("enable_warm_starting", True) else F(0.0)
    for j in joints:
        d = j.d
        a, b_ = j.index_a, j.index_b
        qa, qb = rot[a], rot[b_]
        j.frame_a_q = _rot_mul(qa, d["frame_a_q"])
        j.frame_a_p = _rot_vec(qa, d["frame_a_p"] - d["local_center_a"])
        j.frame_b_q = _rot_mul(qb, d["frame_b_q"])
        j.frame_b_p = _rot_vec(qb, d["frame_b_p"] - d["local_center_b"])
        j.delta_center = (center[b_] - center[a]).astype(F)
        ma, mb = bodies[a].inv_mass, bodies[b_].inv_mass
        ia, ib = bodies[a].inv_inertia, bodies[b_].inv_inertia
        c_hertz = min(F(d["constraint_hertz"]), F(0.25) * inv_h)
        j.constraint_soft = softness(c_hertz, d["constraint_damping_ratio"], h)
        j.spring_soft = softness(d["hertz"], d["damping_ratio"], h)
        if j.kind in ("revolute", "prismatic"):
            # prismatic axial mass depends on per-substep lever arms and is
            # recomputed inside solve (ref: PrismaticJoint.cs:166-169)
            k = ia + ib
            j.axial_mass = F(1) / k if k > 0 else F(0)
        elif j.kind == "wheel":
            # ref: WheelJoint.cs:113-127 Prepare
            ra, rb = j.frame_a_p, j.frame_b_p
            dv = j.delta_center + (rb - ra)
            axis = _rot_vec(j.frame_a_q, np.array([1, 0], F))
            perp = np.array([-axis[1], axis[0]], F)
            s1, s2 = _cross(dv + ra, perp), _cross(rb, perp)
            kp = ma + mb + ia * s1 * s1 + ib * s2 * s2
            j.perp_mass = F(1) / kp if kp > 0 else F(0)
            a1, a2 = _cross(dv + ra, axis), _cross(rb, axis)
            ka = ma + mb + ia * a1 * a1 + ib * a2 * a2
            j.axial_mass = F(1) / ka if ka > 0 else F(0)
            km = ia + ib
            j.motor_mass = F(1) / km if km > 0 else F(0)
        elif j.kind == "weld":
            # ref: WeldJoint.cs:69-74 Prepare — zero hertz falls back to
            # the rigid constraint softness
            ka = ia + ib
            j.axial_mass = F(1) / ka if ka > 0 else F(0)
            j.lin_soft = (j.constraint_soft if F(d["hertz"]) == 0 else
                          softness(d["hertz"], d["damping_ratio"], h))
            j.ang_soft = (j.constraint_soft
                          if F(d["angular_hertz"]) == 0 else
                          softness(d["angular_hertz"],
                                   d["angular_damping_ratio"], h))
        elif j.kind == "motor":
            # ref: MotorJoint.cs:82-90 Prepare
            ra, rb = j.frame_a_p, j.frame_b_p
            j.lin_soft = softness(d["hertz"], d["damping_ratio"], h)
            j.ang_soft = softness(d["angular_hertz"],
                                  d["angular_damping_ratio"], h)
            k11 = ma + mb + ra[1] * ra[1] * ia + rb[1] * rb[1] * ib
            k12 = -ra[1] * ra[0] * ia - rb[1] * rb[0] * ib
            k22 = ma + mb + ra[0] * ra[0] * ia + rb[0] * rb[0] * ib
            j.linear_mass = (F(k11), F(k12), F(k22))
            ka = ia + ib
            j.motor_mass = F(1) / ka if ka > 0 else F(0)
        else:  # distance (upstream-correct inverse inertia, see header)
            sep = j.frame_b_p - j.frame_a_p + j.delta_center
            ln = F(np.sqrt(sep @ sep))
            axis = sep / ln if ln > 0 else np.array([1, 0], F)
            cr_a, cr_b = _cross(j.frame_a_p, axis), _cross(j.frame_b_p, axis)
            k = ma + mb + ia * cr_a * cr_a + ib * cr_b * cr_b
            j.axial_mass = F(1) / k if k > 0 else F(0)
        j.impulse = (warm * j.impulse).astype(F)
        j.spring_impulse = F(warm * j.spring_impulse)
        j.spring_impulse2 = (warm * j.spring_impulse2).astype(F)
        j.angular_impulse = F(warm * j.angular_impulse)
        j.motor_impulse = F(warm * j.motor_impulse)
        j.lower_impulse = F(warm * j.lower_impulse)
        j.upper_impulse = F(warm * j.upper_impulse)


def warm_start_joints(bodies, joints):
    """ref: RevoluteJoint.cs:102-122 / DistanceJoint.cs:123-147."""
    for j in joints:
        ba, bb = bodies[j.index_a], bodies[j.index_b]
        ma, mb = ba.inv_mass, bb.inv_mass
        ia, ib = ba.inv_inertia, bb.inv_inertia
        ra = _rot_vec(ba.dq, j.frame_a_p)
        rb = _rot_vec(bb.dq, j.frame_b_p)
        if j.kind == "revolute":
            axial = (j.spring_impulse + j.motor_impulse
                     + j.lower_impulse - j.upper_impulse)
            P = j.impulse
            if ba.dynamic:
                ba.v = (ba.v - ma * P).astype(F)
                ba.w = F(ba.w - ia * (_cross(ra, P) + axial))
            if bb.dynamic:
                bb.v = (bb.v + mb * P).astype(F)
                bb.w = F(bb.w + ib * (_cross(rb, P) + axial))
        elif j.kind == "prismatic":
            # ref: PrismaticJoint.cs:116-148
            dv = bb.dp - ba.dp + j.delta_center + (rb - ra)
            axis = _rot_vec(ba.dq, _rot_vec(j.frame_a_q,
                                            np.array([1, 0], F)))
            a1 = _cross(ra + dv, axis)
            a2 = _cross(rb, axis)
            perp = np.array([-axis[1], axis[0]], F)      # LeftPerp
            s1 = _cross(ra + dv, perp)
            s2 = _cross(rb, perp)
            axial = (j.spring_impulse + j.motor_impulse
                     + j.lower_impulse - j.upper_impulse)
            P = axial * axis + j.impulse[0] * perp
            LA = axial * a1 + j.impulse[0] * s1 + j.impulse[1]
            LB = axial * a2 + j.impulse[0] * s2 + j.impulse[1]
            if ba.dynamic:
                ba.v = (ba.v - ma * P).astype(F)
                ba.w = F(ba.w - ia * LA)
            if bb.dynamic:
                bb.v = (bb.v + mb * P).astype(F)
                bb.w = F(bb.w + ib * LB)
        elif j.kind == "wheel":
            # ref: WheelJoint.cs:137-168
            dv = bb.dp - ba.dp + j.delta_center + (rb - ra)
            axis = _rot_vec(ba.dq, _rot_vec(j.frame_a_q,
                                            np.array([1, 0], F)))
            perp = np.array([-axis[1], axis[0]], F)
            a1, a2 = _cross(dv + ra, axis), _cross(rb, axis)
            s1, s2 = _cross(dv + ra, perp), _cross(rb, perp)
            axial = j.spring_impulse + j.lower_impulse - j.upper_impulse
            P = axial * axis + j.impulse[0] * perp
            LA = axial * a1 + j.impulse[0] * s1 + j.motor_impulse
            LB = axial * a2 + j.impulse[0] * s2 + j.motor_impulse
            if ba.dynamic:
                ba.v = (ba.v - ma * P).astype(F)
                ba.w = F(ba.w - ia * LA)
            if bb.dynamic:
                bb.v = (bb.v + mb * P).astype(F)
                bb.w = F(bb.w + ib * LB)
        elif j.kind == "weld":
            # ref: WeldJoint.cs:77-96
            P = j.impulse
            if ba.dynamic:
                ba.v = (ba.v - ma * P).astype(F)
                ba.w = F(ba.w - ia * (_cross(ra, P) + j.angular_impulse))
            if bb.dynamic:
                bb.v = (bb.v + mb * P).astype(F)
                bb.w = F(bb.w + ib * (_cross(rb, P) + j.angular_impulse))
        elif j.kind == "motor":
            # ref: MotorJoint.cs:99-120
            P = j.impulse + j.spring_impulse2
            ang = j.angular_impulse + j.spring_impulse
            if ba.dynamic:
                ba.v = (ba.v - ma * P).astype(F)
                ba.w = F(ba.w - ia * (_cross(ra, P) + ang))
            if bb.dynamic:
                bb.v = (bb.v + mb * P).astype(F)
                bb.w = F(bb.w + ib * (_cross(rb, P) + ang))
        else:
            ds = bb.dp - ba.dp + (rb - ra)
            sep = j.delta_center + ds
            ln = F(np.sqrt(sep @ sep))
            axis = sep / ln if ln > 0 else np.array([1, 0], F)
            axial = (j.impulse[0] + j.lower_impulse - j.upper_impulse
                     + j.motor_impulse)
            P = axial * axis
            if ba.dynamic:
                ba.v = (ba.v - ma * P).astype(F)
                ba.w = F(ba.w - ia * _cross(ra, P))
            if bb.dynamic:
                bb.v = (bb.v + mb * P).astype(F)
                bb.w = F(bb.w + ib * _cross(rb, P))


def solve_joint(bodies, j, h, inv_h, use_bias):
    """ref: RevoluteJoint.cs:123-235 Solve / DistanceJoint.cs:148-260."""
    ba, bb = bodies[j.index_a], bodies[j.index_b]
    ma, mb = ba.inv_mass, bb.inv_mass
    ia, ib = ba.inv_inertia, bb.inv_inertia
    va, wa, vb, wb = ba.v.copy(), ba.w, bb.v.copy(), bb.w
    d = j.d
    cs_bias, cs_mass, cs_imp = j.constraint_soft
    if j.kind == "revolute":
        qa = _rot_mul(ba.dq, j.frame_a_q)
        qb = _rot_mul(bb.dq, j.frame_b_q)
        rel_q = _inv_mul_rot(qa, qb)
        fixed_rot = ia + ib == 0
        if d["enable_spring"] and not fixed_rot:
            joint_angle = F(np.arctan2(rel_q[1], rel_q[0]))
            delta = _unwind(joint_angle - F(d["spring_target"]))
            s_bias, s_mass, s_imp = j.spring_soft
            cdot = wb - wa
            imp = (-s_mass * j.axial_mass * (cdot + s_bias * delta)
                   - s_imp * j.spring_impulse)
            j.spring_impulse = F(j.spring_impulse + imp)
            wa -= ia * imp
            wb += ib * imp
        if d["enable_motor"] and not fixed_rot:
            cdot = wb - wa - F(d["motor_speed"])
            imp = -j.axial_mass * cdot
            old = j.motor_impulse
            max_imp = h * F(d["max_motor_force"])
            j.motor_impulse = F(np.clip(old + imp, -max_imp, max_imp))
            imp = j.motor_impulse - old
            wa -= ia * imp
            wb += ib * imp
        if d["enable_limit"] and not fixed_rot:
            joint_angle = F(np.arctan2(rel_q[1], rel_q[0]))
            # lower
            C = joint_angle - F(d["lower"])
            bias, msc, isc = F(0), F(1), F(0)
            if C > 0:
                bias = C * inv_h
            elif use_bias:
                bias, msc, isc = cs_bias * C, cs_mass, cs_imp
            cdot = wb - wa
            old = j.lower_impulse
            imp = -msc * j.axial_mass * (cdot + bias) - isc * old
            j.lower_impulse = F(max(old + imp, 0))
            imp = j.lower_impulse - old
            wa -= ia * imp
            wb += ib * imp
            # upper
            C = F(d["upper"]) - joint_angle
            bias, msc, isc = F(0), F(1), F(0)
            if C > 0:
                bias = C * inv_h
            elif use_bias:
                bias, msc, isc = cs_bias * C, cs_mass, cs_imp
            cdot = wa - wb
            old = j.upper_impulse
            imp = -msc * j.axial_mass * (cdot + bias) - isc * old
            j.upper_impulse = F(max(old + imp, 0))
            imp = j.upper_impulse - old
            wa += ia * imp
            wb -= ib * imp
        # point-to-point 2x2 block (ref: RevoluteJoint.cs:200-224)
        ra = _rot_vec(ba.dq, j.frame_a_p)
        rb = _rot_vec(bb.dq, j.frame_b_p)
        cdot = (vb + _cross_sv(wb, rb)) - (va + _cross_sv(wa, ra))
        bias = np.zeros(2, F)
        msc, isc = F(1), F(0)
        if use_bias:
            sep = (bb.dp - ba.dp) + (rb - ra) + j.delta_center
            bias = (cs_bias * sep).astype(F)
            msc, isc = cs_mass, cs_imp
        k11 = ma + mb + ra[1] * ra[1] * ia + rb[1] * rb[1] * ib
        k12 = -ra[1] * ra[0] * ia - rb[1] * rb[0] * ib
        k22 = ma + mb + ra[0] * ra[0] * ia + rb[0] * rb[0] * ib
        bsol = _mat22_solve(F(k11), F(k12), F(k22), (cdot + bias).astype(F))
        imp = (-msc * bsol - isc * j.impulse).astype(F)
        j.impulse = (j.impulse + imp).astype(F)
        va = va - ma * imp
        wa -= ia * _cross(ra, imp)
        vb = vb + mb * imp
        wb += ib * _cross(rb, imp)
    elif j.kind == "prismatic":
        # ref: PrismaticJoint.cs:149-290, with the engine's documented
        # upstream fixes (box2d_tpu/joints.py header): the port applies the
        # stale `impulse` member at :217/:241 (should be the delta) and
        # gates limits on an inverted speculative-distance test; the oracle
        # implements the upstream semantics the engine uses.
        ra = _rot_vec(ba.dq, j.frame_a_p)
        rb = _rot_vec(bb.dq, j.frame_b_p)
        dv = bb.dp - ba.dp + j.delta_center + (rb - ra)
        axis = _rot_vec(ba.dq, _rot_vec(j.frame_a_q, np.array([1, 0], F)))
        qa = _rot_mul(ba.dq, j.frame_a_q)
        qb = _rot_mul(bb.dq, j.frame_b_q)
        rel_q = _inv_mul_rot(qa, qb)
        translation = F(axis @ dv)
        a1 = _cross(ra + dv, axis)
        a2 = _cross(rb, axis)
        k = ma + mb + ia * a1 * a1 + ib * a2 * a2
        axial_mass = F(1) / k if k > 0 else F(0)

        if d["enable_spring"]:
            s_bias, s_mass, s_imp = j.spring_soft
            C = translation - F(d["spring_target"])
            cdot = F(axis @ (vb - va)) + a2 * wb - a1 * wa
            imp = (-s_mass * axial_mass * (cdot + s_bias * C)
                   - s_imp * j.spring_impulse)
            j.spring_impulse = F(j.spring_impulse + imp)
            P = imp * axis
            va = va - ma * P
            wa -= ia * imp * a1
            vb = vb + mb * P
            wb += ib * imp * a2
        if d["enable_motor"]:
            cdot = F(axis @ (vb - va)) + a2 * wb - a1 * wa
            imp = axial_mass * (F(d["motor_speed"]) - cdot)
            old = j.motor_impulse
            max_imp = h * F(d["max_motor_force"])
            j.motor_impulse = F(np.clip(old + imp, -max_imp, max_imp))
            imp = j.motor_impulse - old
            P = imp * axis
            va = va - ma * P
            wa -= ia * imp * a1
            vb = vb + mb * P
            wb += ib * imp * a2
        if d["enable_limit"]:
            # lower
            C = translation - F(d["lower"])
            bias, msc, isc = F(0), F(1), F(0)
            if C > 0:
                bias = C * inv_h
            elif use_bias:
                bias, msc, isc = cs_bias * C, cs_mass, cs_imp
            cdot = F(axis @ (vb - va)) + a2 * wb - a1 * wa
            old = j.lower_impulse
            imp = -msc * axial_mass * (cdot + bias) - isc * old
            j.lower_impulse = F(max(old + imp, 0))
            imp = j.lower_impulse - old
            P = imp * axis
            va = va - ma * P
            wa -= ia * imp * a1
            vb = vb + mb * P
            wb += ib * imp * a2
            # upper
            C = F(d["upper"]) - translation
            bias, msc, isc = F(0), F(1), F(0)
            if C > 0:
                bias = C * inv_h
            elif use_bias:
                bias, msc, isc = cs_bias * C, cs_mass, cs_imp
            cdot = -(F(axis @ (vb - va)) + a2 * wb - a1 * wa)
            old = j.upper_impulse
            imp = -msc * axial_mass * (cdot + bias) - isc * old
            j.upper_impulse = F(max(old + imp, 0))
            imp = j.upper_impulse - old
            P = imp * axis
            va = va + ma * P
            wa += ia * imp * a1
            vb = vb - mb * P
            wb -= ib * imp * a2
        # perp + angle 2x2 block (ref :249-275)
        perp = np.array([-axis[1], axis[0]], F)          # LeftPerp
        s1 = _cross(ra + dv, perp)
        s2 = _cross(rb, perp)
        cdot1 = F(perp @ (vb - va)) + s2 * wb - s1 * wa
        cdot2 = wb - wa
        b1 = b2 = F(0)
        msc, isc = F(1), F(0)
        if use_bias:
            b1 = cs_bias * F(perp @ dv)
            b2 = cs_bias * F(np.arctan2(rel_q[1], rel_q[0]))
            msc, isc = cs_mass, cs_imp
        k11 = ma + mb + ia * s1 * s1 + ib * s2 * s2
        k12 = ia * s1 + ib * s2
        k22 = ia + ib
        if k22 == 0:
            k22 = F(1)
        bsol = _mat22_solve(F(k11), F(k12), F(k22),
                            np.array([cdot1 + b1, cdot2 + b2], F))
        imp2 = (-msc * bsol - isc * j.impulse).astype(F)
        j.impulse = (j.impulse + imp2).astype(F)
        P = imp2[0] * perp
        LA = imp2[0] * s1 + imp2[1]
        LB = imp2[0] * s2 + imp2[1]
        va = va - ma * P
        wa -= ia * LA
        vb = vb + mb * P
        wb += ib * LB
    elif j.kind == "wheel":
        # ref: WheelJoint.cs:169-274 Solve, with the engine's documented
        # upstream fix (joints.py header): the port's final point-on-line
        # Cdot uses axisA (:267) where upstream uses the perpendicular.
        d = j.d
        ra = _rot_vec(ba.dq, j.frame_a_p)
        rb = _rot_vec(bb.dq, j.frame_b_p)
        dv = bb.dp - ba.dp + j.delta_center + (rb - ra)
        axis = _rot_vec(ba.dq, _rot_vec(j.frame_a_q, np.array([1, 0], F)))
        fixed_rot = ia + ib == 0
        translation = F(axis @ dv)
        a1, a2 = _cross(dv + ra, axis), _cross(rb, axis)
        if d["enable_motor"] and not fixed_rot:
            cdot = wb - wa - F(d["motor_speed"])
            imp = -j.motor_mass * cdot
            old = j.motor_impulse
            max_imp = h * F(d["max_motor_force"])
            j.motor_impulse = F(np.clip(old + imp, -max_imp, max_imp))
            imp = j.motor_impulse - old
            wa -= ia * imp
            wb += ib * imp
        if d["enable_spring"]:
            s_bias, s_mass, s_imp = j.spring_soft
            cdot = F(axis @ (vb - va)) + a2 * wb - a1 * wa
            imp = (-s_mass * j.axial_mass * (cdot + s_bias * translation)
                   - s_imp * j.spring_impulse)
            j.spring_impulse = F(j.spring_impulse + imp)
            P = imp * axis
            va = va - ma * P
            wa -= ia * imp * a1
            vb = vb + mb * P
            wb += ib * imp * a2
        if d["enable_limit"]:
            # lower (ref :215-234)
            C = translation - F(d["lower"])
            bias, msc, isc = F(0), F(1), F(0)
            if C > 0:
                bias = C * inv_h
            elif use_bias:
                bias, msc, isc = cs_bias * C, cs_mass, cs_imp
            cdot = F(axis @ (vb - va)) + a2 * wb - a1 * wa
            old = j.lower_impulse
            imp = -msc * j.axial_mass * (cdot + bias) - isc * old
            j.lower_impulse = F(max(old + imp, 0))
            imp = j.lower_impulse - old
            P = imp * axis
            va = va - ma * P
            wa -= ia * imp * a1
            vb = vb + mb * P
            wb += ib * imp * a2
            # upper (ref :235-254)
            C = F(d["upper"]) - translation
            bias, msc, isc = F(0), F(1), F(0)
            if C > 0:
                bias = C * inv_h
            elif use_bias:
                bias, msc, isc = cs_bias * C, cs_mass, cs_imp
            cdot = F(axis @ (va - vb)) + a1 * wa - a2 * wb
            old = j.upper_impulse
            imp = -msc * j.axial_mass * (cdot + bias) - isc * old
            j.upper_impulse = F(max(old + imp, 0))
            imp = j.upper_impulse - old
            P = imp * axis
            va = va + ma * P
            wa += ia * imp * a1
            vb = vb - mb * P
            wb -= ib * imp * a2
        # point-on-line (ref :256-274, upstream perp Cdot)
        perp = np.array([-axis[1], axis[0]], F)
        bias, msc, isc = F(0), F(1), F(0)
        if use_bias:
            bias = cs_bias * F(perp @ dv)
            msc, isc = cs_mass, cs_imp
        s1, s2 = _cross(dv + ra, perp), _cross(rb, perp)
        cdot = F(perp @ (vb - va)) + s2 * wb - s1 * wa
        imp = -msc * j.perp_mass * (cdot + bias) - isc * j.impulse[0]
        j.impulse[0] = F(j.impulse[0] + imp)
        P = imp * perp
        va = va - ma * P
        wa -= ia * imp * s1
        vb = vb + mb * P
        wb += ib * imp * s2
    elif j.kind == "weld":
        # ref: WeldJoint.cs:97-160 Solve
        d = j.d
        lin_hertz = F(d["hertz"])
        ang_hertz = F(d["angular_hertz"])
        # angular lock / soft spring
        qa = _rot_mul(ba.dq, j.frame_a_q)
        qb = _rot_mul(bb.dq, j.frame_b_q)
        rel_q = _inv_mul_rot(qa, qb)
        joint_angle = F(np.arctan2(rel_q[1], rel_q[0]))
        bias, msc, isc = F(0), F(1), F(0)
        if use_bias or ang_hertz > 0:
            a_bias, a_mass, a_imp = j.ang_soft
            bias, msc, isc = a_bias * joint_angle, a_mass, a_imp
        cdot = wb - wa
        imp = -msc * j.axial_mass * (cdot + bias) - isc * j.angular_impulse
        j.angular_impulse = F(j.angular_impulse + imp)
        wa -= ia * imp
        wb += ib * imp
        # linear lock / soft spring (2x2)
        ra = _rot_vec(ba.dq, j.frame_a_p)
        rb = _rot_vec(bb.dq, j.frame_b_p)
        bias2 = np.zeros(2, F)
        msc, isc = F(1), F(0)
        if use_bias or lin_hertz > 0:
            l_bias, l_mass, l_imp = j.lin_soft
            sep = (bb.dp - ba.dp) + (rb - ra) + j.delta_center
            bias2 = (l_bias * sep).astype(F)
            msc, isc = l_mass, l_imp
        cdot2 = (vb + _cross_sv(wb, rb)) - (va + _cross_sv(wa, ra))
        k11 = ma + mb + ra[1] * ra[1] * ia + rb[1] * rb[1] * ib
        k12 = -ra[1] * ra[0] * ia - rb[1] * rb[0] * ib
        k22 = ma + mb + ra[0] * ra[0] * ia + rb[0] * rb[0] * ib
        bsol = _mat22_solve(F(k11), F(k12), F(k22),
                            (cdot2 + bias2).astype(F))
        imp2 = (-msc * bsol - isc * j.impulse).astype(F)
        j.impulse = (j.impulse + imp2).astype(F)
        va = va - ma * imp2
        wa -= ia * _cross(ra, imp2)
        vb = vb + mb * imp2
        wb += ib * _cross(rb, imp2)
    elif j.kind == "motor":
        # ref: MotorJoint.cs:121-217 Solve
        d = j.d
        if F(d["max_spring_torque"]) > 0 and F(d["angular_hertz"]) > 0:
            qa = _rot_mul(ba.dq, j.frame_a_q)
            qb = _rot_mul(bb.dq, j.frame_b_q)
            rel_q = _inv_mul_rot(qa, qb)
            c = F(np.arctan2(rel_q[1], rel_q[0]))
            a_bias, a_mass, a_imp = j.ang_soft
            cdot = wb - wa
            max_imp = h * F(d["max_spring_torque"])
            old = j.spring_impulse
            imp = (-a_mass * j.motor_mass * (cdot + a_bias * c)
                   - a_imp * old)
            j.spring_impulse = F(np.clip(old + imp, -max_imp, max_imp))
            imp = j.spring_impulse - old
            wa -= ia * imp
            wb += ib * imp
        if F(d["max_velocity_torque"]) > 0:
            cdot = wb - wa - F(d["angular_velocity"])
            imp = -j.motor_mass * cdot
            max_imp = h * F(d["max_velocity_torque"])
            old = j.angular_impulse
            j.angular_impulse = F(np.clip(old + imp, -max_imp, max_imp))
            imp = j.angular_impulse - old
            wa -= ia * imp
            wb += ib * imp
        ra = _rot_vec(ba.dq, j.frame_a_p)
        rb = _rot_vec(bb.dq, j.frame_b_p)
        if F(d["max_spring_force"]) > 0 and F(d["hertz"]) > 0:
            l_bias, l_mass, l_imp = j.lin_soft
            c2 = (bb.dp - ba.dp) + (rb - ra) + j.delta_center
            cdot2 = ((vb + _cross_sv(wb, rb)) - (va + _cross_sv(wa, ra))
                     + l_bias * c2)
            k11 = ma + mb + ra[1] * ra[1] * ia + rb[1] * rb[1] * ib
            k12 = -ra[1] * ra[0] * ia - rb[1] * rb[0] * ib
            k22 = ma + mb + ra[0] * ra[0] * ia + rb[0] * rb[0] * ib
            j.linear_mass = (F(k11), F(k12), F(k22))
            bsol = _mat22_solve(F(k11), F(k12), F(k22), cdot2.astype(F))
            old2 = j.spring_impulse2.copy()
            imp2 = (-l_mass * bsol - l_imp * old2).astype(F)
            j.spring_impulse2 = (old2 + imp2).astype(F)
            max_imp = h * F(d["max_spring_force"])
            ln = F(np.sqrt(j.spring_impulse2 @ j.spring_impulse2))
            if ln > max_imp:
                j.spring_impulse2 = (j.spring_impulse2 / ln
                                     * max_imp).astype(F)
            imp2 = (j.spring_impulse2 - old2).astype(F)
            va = va - ma * imp2
            wa -= ia * _cross(ra, imp2)
            vb = vb + mb * imp2
            wb += ib * _cross(rb, imp2)
        if F(d["max_velocity_force"]) > 0:
            cdot2 = ((vb + _cross_sv(wb, rb)) - (va + _cross_sv(wa, ra))
                     - np.asarray(d["linear_velocity"], F))
            k11, k12, k22 = j.linear_mass
            bsol = _mat22_solve(k11, k12, k22, cdot2.astype(F))
            old2 = j.impulse.copy()
            imp2 = (-bsol).astype(F)
            j.impulse = (old2 + imp2).astype(F)
            max_imp = h * F(d["max_velocity_force"])
            ln = F(np.sqrt(j.impulse @ j.impulse))
            if ln > max_imp:
                j.impulse = (j.impulse / ln * max_imp).astype(F)
            imp2 = (j.impulse - old2).astype(F)
            va = va - ma * imp2
            wa -= ia * _cross(ra, imp2)
            vb = vb + mb * imp2
            wb += ib * _cross(rb, imp2)
    else:  # distance
        ra = _rot_vec(ba.dq, j.frame_a_p)
        rb = _rot_vec(bb.dq, j.frame_b_p)
        ds = bb.dp - ba.dp + (rb - ra)
        sep = j.delta_center + ds
        length = F(np.sqrt(sep @ sep))
        axis = sep / length if length > 0 else np.array([1, 0], F)
        min_len, max_len = F(d["lower"]), F(d["upper"])
        if d["enable_spring"] and (min_len < max_len
                                   or not d["enable_limit"]):
            if d["hertz"] > 0:
                vr = (vb - va) + (_cross_sv(wb, rb) - _cross_sv(wa, ra))
                cdot = F(axis @ vr)
                C = length - F(d["length"])
                s_bias, s_mass, s_imp = j.spring_soft
                old = j.impulse[0]
                imp = (-s_mass * j.axial_mass * (cdot + s_bias * C)
                       - s_imp * old)
                lo = F(d["lower_spring_force"]) * h
                hi = F(d["upper_spring_force"]) * h
                j.impulse[0] = F(np.clip(old + imp, lo, hi))
                imp = j.impulse[0] - old
                P = imp * axis
                va = va - ma * P
                wa -= ia * _cross(ra, P)
                vb = vb + mb * P
                wb += ib * _cross(rb, P)
            if d["enable_limit"]:
                # lower (ref: DistanceJoint.cs:183-202)
                vr = (vb - va) + (_cross_sv(wb, rb) - _cross_sv(wa, ra))
                cdot = F(axis @ vr)
                C = length - min_len
                bias, msc, isc = F(0), F(1), F(0)
                if C > 0:
                    bias = C * inv_h
                elif use_bias:
                    bias, msc, isc = cs_bias * C, cs_mass, cs_imp
                old = j.lower_impulse
                imp = -msc * j.axial_mass * (cdot + bias) - isc * old
                j.lower_impulse = F(max(0, old + imp))
                imp = j.lower_impulse - old
                P = imp * axis
                va = va - ma * P
                wa -= ia * _cross(ra, P)
                vb = vb + mb * P
                wb += ib * _cross(rb, P)
                # upper (ref: DistanceJoint.cs:203-222)
                vr = (va - vb) + (_cross_sv(wa, ra) - _cross_sv(wb, rb))
                cdot = F(axis @ vr)
                C = max_len - length
                bias, msc, isc = F(0), F(1), F(0)
                if C > 0:
                    bias = C * inv_h
                elif use_bias:
                    bias, msc, isc = cs_bias * C, cs_mass, cs_imp
                old = j.upper_impulse
                imp = -msc * j.axial_mass * (cdot + bias) - isc * old
                j.upper_impulse = F(max(0, old + imp))
                imp = j.upper_impulse - old
                P = -imp * axis
                va = va - ma * P
                wa -= ia * _cross(ra, P)
                vb = vb + mb * P
                wb += ib * _cross(rb, P)
            if d["enable_motor"]:
                vr = (vb - va) + (_cross_sv(wb, rb) - _cross_sv(wa, ra))
                cdot = F(axis @ vr)
                imp = j.axial_mass * (F(d["motor_speed"]) - cdot)
                old = j.motor_impulse
                max_imp = h * F(d["max_motor_force"])
                j.motor_impulse = F(np.clip(old + imp, -max_imp, max_imp))
                imp = j.motor_impulse - old
                P = imp * axis
                va = va - ma * P
                wa -= ia * _cross(ra, P)
                vb = vb + mb * P
                wb += ib * _cross(rb, P)
        else:
            # rigid (ref: DistanceJoint.cs:238-255)
            vr = (vb - va) + (_cross_sv(wb, rb) - _cross_sv(wa, ra))
            cdot = F(axis @ vr)
            C = length - F(d["length"])
            bias, msc, isc = F(0), F(1), F(0)
            if use_bias:
                bias, msc, isc = cs_bias * C, cs_mass, cs_imp
            imp = -msc * j.axial_mass * (cdot + bias) - isc * j.impulse[0]
            j.impulse[0] = F(j.impulse[0] + imp)
            P = imp * axis
            va = va - ma * P
            wa -= ia * _cross(ra, P)
            vb = vb + mb * P
            wb += ib * _cross(rb, P)
    if ba.dynamic:
        ba.v, ba.w = va.astype(F), F(wa)
    if bb.dynamic:
        bb.v, bb.w = vb.astype(F), F(wb)


def solve_step(bodies, raw_contacts, tuning, dt, substeps,
               joints=None, center=None, rot=None):
    """Full reference solve (ref: src/Solver.cs:599-727): returns per-contact
    stored impulses. Mutates bodies (v, w, dp, dq). `joints` is a list of
    OJoint solved in the reference stage order (joints before contacts in
    each stage, ref: src/Solver.cs:624-682)."""
    dt = F(dt)
    h = dt / F(substeps)
    inv_h = F(1) / h if h > 0 else F(0)
    inv_dt = F(1) / dt if dt > 0 else F(0)
    gravity = np.asarray(tuning["gravity"], F)
    joints = joints or []
    if joints:
        prepare_joints(bodies, center, rot, joints, tuning, h, inv_h)
    contacts = prepare_contacts(bodies, raw_contacts, tuning, h, inv_h)
    for b in bodies:
        b.dp = np.zeros(2, F)
        b.dq = np.array([1, 0], F)
    for _ in range(substeps):
        integrate_velocities(bodies, gravity, h, inv_dt,
                             F(tuning["max_linear_speed"]))
        warm_start_joints(bodies, joints)
        warm_start(bodies, contacts)
        for j in joints:
            solve_joint(bodies, j, h, inv_h, True)
        solve(bodies, contacts, inv_h, F(tuning["contact_speed"]), True)
        integrate_positions(bodies, h)
        for j in joints:
            solve_joint(bodies, j, h, inv_h, False)
        solve(bodies, contacts, inv_h, F(tuning["contact_speed"]), False)
    apply_restitution(bodies, contacts, F(tuning["restitution_threshold"]))
    return contacts
