"""Reference-oracle trajectory drift tests (SURVEY.md §4(c)).

The oracle (tests/oracle.py) is a scalar NumPy transliteration of the
reference's TGS-soft solver, written from the C# source. Each oracle step
computes manifolds for the ORACLE's state via the engine's narrow phase
(manifolds are separately golden-tested in test_manifold.py), then advances
bodies with the scalar reference pipeline. The engine runs its own full
steps from the same initial state; trajectories must agree to <1e-3 over
hundreds of steps (BASELINE.json north-star drift bound).

Sleep and continuous collision are disabled — the oracle models the solver,
not those subsystems. The engine's Gauss-Seidel order across graph colors
can differ from the oracle's sequential order; the scenes below settle, so
ordering differences stay within the drift bound.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from box2d_tpu import geometry as g
from box2d_tpu import types as t
from box2d_tpu.api import World
from box2d_tpu.broadphase import compute_shape_aabbs, find_pairs
from box2d_tpu.narrowphase import classes_for_shape_types, narrow_phase

import oracle

F = np.float32


def _world(def_=None):
    return World(def_ or t.WorldDef(enable_sleep=False,
                                    enable_continuous=False))


def _box_drop(restitution=0.0, vx=0.0, drop=2.0):
    w = _world()
    ground = w.create_body(t.BodyDef(type=t.STATIC, position=(0.0, -0.5)))
    gd = t.ShapeDef()
    gd.material.restitution = restitution
    w.create_polygon_shape(ground, gd, g.box(20.0, 0.5))
    b = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0.0, drop),
                                linear_velocity=(vx, 0.0)))
    sd = t.ShapeDef(density=1.0)
    sd.material.restitution = restitution
    w.create_polygon_shape(b, sd, g.box(0.5, 0.5))
    return w


def _stack(n=3):
    w = _world()
    ground = w.create_body(t.BodyDef(type=t.STATIC, position=(0.0, -0.5)))
    w.create_polygon_shape(ground, t.ShapeDef(), g.box(20.0, 0.5))
    for i in range(n):
        b = w.create_body(t.BodyDef(type=t.DYNAMIC,
                                    position=(0.02 * (i % 2), 0.55 + 1.1 * i)))
        w.create_polygon_shape(b, t.ShapeDef(density=1.0), g.box(0.5, 0.5))
    return w


def _capsule_rest():
    w = _world()
    ground = w.create_body(t.BodyDef(type=t.STATIC, position=(0.0, -0.5)))
    w.create_polygon_shape(ground, t.ShapeDef(), g.box(20.0, 0.5))
    b = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0.0, 1.0),
                                angle=0.3))
    w.create_capsule_shape(b, t.ShapeDef(density=1.0),
                           (-0.5, 0.0), (0.5, 0.0), 0.25)
    return w


def _tuning_dict(state):
    tn = state.tuning
    return {
        "gravity": np.asarray(tn.gravity, F),
        "contact_hertz": float(tn.contact_hertz),
        "contact_damping_ratio": float(tn.contact_damping_ratio),
        "contact_speed": float(tn.contact_speed),
        "restitution_threshold": float(tn.restitution_threshold),
        "max_linear_speed": float(tn.max_linear_speed),
        "enable_warm_starting": bool(tn.enable_warm_starting),
        "enable_contact_softening": bool(tn.enable_contact_softening),
    }


def _oracle_joints(state):
    """Read static joint params from the engine's compiled Joints state into
    OJoint records (the oracle's math is independent; only the parameters
    are shared, mirroring how contacts consume the engine narrow phase)."""
    from box2d_tpu.state import (JOINT_DISTANCE, JOINT_MOTOR,
                                 JOINT_PRISMATIC, JOINT_REVOLUTE,
                                 JOINT_WELD, JOINT_WHEEL)

    jn = state.joints
    lc = np.asarray(state.bodies.local_center, F)
    out = []
    for i in range(int(np.asarray(jn.type).shape[0])):
        ty = int(np.asarray(jn.type[i]))
        if ty < 0:
            continue
        kind = {JOINT_REVOLUTE: "revolute",
                JOINT_DISTANCE: "distance",
                JOINT_PRISMATIC: "prismatic",
                JOINT_WHEEL: "wheel",
                JOINT_WELD: "weld",
                JOINT_MOTOR: "motor"}[ty]
        a, b = int(np.asarray(jn.body_a[i])), int(np.asarray(jn.body_b[i]))
        d = {k: np.asarray(getattr(jn, k)[i])
             for k in ("frame_a_p", "frame_a_q", "frame_b_p", "frame_b_q",
                       "constraint_hertz", "constraint_damping_ratio",
                       "hertz", "damping_ratio", "spring_target",
                       "enable_spring", "enable_limit", "enable_motor",
                       "lower", "upper", "motor_speed", "max_motor_force",
                       "length", "lower_spring_force", "upper_spring_force",
                       "angular_hertz", "angular_damping_ratio",
                       "linear_velocity", "angular_velocity",
                       "max_velocity_force", "max_velocity_torque",
                       "max_spring_force", "max_spring_torque")}
        d["local_center_a"] = lc[a]
        d["local_center_b"] = lc[b]
        out.append(oracle.OJoint(kind=kind, index_a=a, index_b=b, d=d))
    return out


def _run_oracle(w, steps, dt=1.0 / 60.0, substeps=4):
    """Advance a copy of the world with the scalar oracle solver; returns
    (Nb, 2) centers after `steps`."""
    state, cap = w.builder.build()
    classes = classes_for_shape_types(s["geom"].type for s in w.builder._shapes)

    @jax.jit
    def nf(center, rot, v, w_):
        b = dataclasses.replace(state.bodies, center=center, rot=rot,
                                v=v, w=w_)
        st = dataclasses.replace(state, bodies=b)
        aabbs = compute_shape_aabbs(st)
        pairs = find_pairs(st, cap, aabbs)
        data = narrow_phase(st, pairs, classes)
        return (data.key_a, data.key_b, data.body_a, data.body_b,
                data.manifold.point_count, data.manifold.normal,
                data.manifold.anchor_a, data.manifold.anchor_b,
                data.manifold.separation, data.manifold.ids,
                data.friction, data.restitution, data.tangent_speed,
                data.rolling_resistance)

    b0 = state.bodies
    nb = b0.center.shape[0]
    bodies = [
        oracle.OBody(
            inv_mass=F(b0.inv_mass[i]), inv_inertia=F(b0.inv_inertia[i]),
            v=np.asarray(b0.v[i], F).copy(), w=F(b0.w[i]),
            dp=np.zeros(2, F), dq=np.array([1, 0], F),
            force=np.zeros(2, F), torque=F(0),
            gravity_scale=F(b0.gravity_scale[i]),
            linear_damping=F(b0.linear_damping[i]),
            angular_damping=F(b0.angular_damping[i]),
            dynamic=int(b0.type[i]) == 2)
        for i in range(nb)
    ]
    center = np.asarray(b0.center, F).copy()
    rot = np.asarray(b0.rot, F).copy()
    tuning = _tuning_dict(state)
    joints = _oracle_joints(state)
    warm = {}       # (pair_key, feature_id) -> (ni, ti)
    warm_roll = {}  # pair_key -> rolling impulse

    for _ in range(steps):
        v = np.stack([b.v for b in bodies])
        w_ = np.array([b.w for b in bodies], F)
        (key_a, key_b, ba, bb, pc, normal, aa, ab, sep, ids, fr, re, ts, rr) = [
            np.asarray(x) for x in nf(center, rot, v, w_)]
        raw = []
        for lane in range(key_a.shape[0]):
            n_pts = int(pc[lane])
            if n_pts == 0:
                continue
            k = (int(key_a[lane]), int(key_b[lane]))
            raw.append({
                "a": int(ba[lane]), "b": int(bb[lane]),
                "normal": normal[lane],
                "anchors_a": [aa[lane, j] for j in range(n_pts)],
                "anchors_b": [ab[lane, j] for j in range(n_pts)],
                "separations": [sep[lane, j] for j in range(n_pts)],
                "normal_impulses": [
                    warm.get((k, int(ids[lane, j])), (0.0, 0.0))[0]
                    for j in range(n_pts)],
                "tangent_impulses": [
                    warm.get((k, int(ids[lane, j])), (0.0, 0.0))[1]
                    for j in range(n_pts)],
                "rolling_impulse": warm_roll.get(k, 0.0),
                "friction": fr[lane], "restitution": re[lane],
                "tangent_speed": ts[lane], "rolling_resistance": rr[lane],
                "_key": k, "_ids": [int(ids[lane, j]) for j in range(n_pts)],
            })
        contacts = oracle.solve_step(bodies, raw, tuning, dt, substeps,
                                     joints=joints, center=center, rot=rot)
        warm, warm_roll = {}, {}
        for rc, oc in zip(raw, contacts):
            for j, p in enumerate(oc.points):
                warm[(rc["_key"], rc["_ids"][j])] = (
                    float(p.normal_impulse), float(p.tangent_impulse))
            warm_roll[rc["_key"]] = float(oc.rolling_impulse)
        # finalize (ref: src/Solver.cs:422-423): commit transforms
        for i, b in enumerate(bodies):
            if not b.dynamic:
                continue
            center[i] += b.dp
            c0, s0 = rot[i]
            dc, ds = b.dq
            c1, s1 = dc * c0 - ds * s0, ds * c0 + dc * s0
            mag = np.sqrt(c1 * c1 + s1 * s1)
            rot[i] = np.array([c1 / mag, s1 / mag], F)
    return center


def _run_engine(w, steps, dt=1.0 / 60.0):
    w.compile()
    for _ in range(steps):
        w.step(dt)
    return np.asarray(w.state.bodies.center)


def _pendulum(motor=False, limit=False, spring=False):
    """Revolute pendulum: rod swinging from a static anchor (joint oracle,
    ref: src/joints/RevoluteJoint.cs:72-235)."""
    w = _world()
    anchor = w.create_body(t.BodyDef(type=t.STATIC, position=(0.0, 4.0)))
    rod = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(1.0, 4.0)))
    w.create_capsule_shape(rod, t.ShapeDef(density=1.0),
                           (-0.5, 0.0), (0.5, 0.0), 0.1)
    kw = {}
    if motor:
        kw = dict(enable_motor=True, max_motor_torque=3.0, motor_speed=1.0)
    if limit:
        kw.update(enable_limit=True, lower_angle=-0.7, upper_angle=0.7)
    if spring:
        kw.update(enable_spring=True, hertz=1.5, damping_ratio=0.3,
                  target_angle=0.4)
    w.create_joint(t.RevoluteJointDef(
        body_a=anchor, body_b=rod,
        local_anchor_a=(0.0, 0.0), local_anchor_b=(-0.5, 0.0), **kw))
    return w


def _slider(motor=False, spring=False):
    """Prismatic slider on a vertical rail under gravity (joint oracle,
    ref: src/joints/PrismaticJoint.cs:88-290)."""
    w = _world()
    rail = w.create_body(t.BodyDef(type=t.STATIC, position=(0.0, 4.0)))
    block = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0.0, 3.8),
                                    angle=0.1))
    w.create_polygon_shape(block, t.ShapeDef(density=1.0), g.box(0.3, 0.2))
    kw = dict(enable_limit=True, lower_translation=-1.5,
              upper_translation=0.2)
    if motor:
        kw.update(enable_motor=True, max_motor_force=30.0, motor_speed=0.5)
    if spring:
        kw.update(enable_spring=True, hertz=2.0, damping_ratio=0.3,
                  target_translation=-0.5)
    w.create_joint(t.PrismaticJointDef(
        body_a=rail, body_b=block, local_anchor_a=(0.0, 0.0),
        local_anchor_b=(0.0, 0.0), local_axis_a=(0.0, 1.0), **kw))
    return w


def _dist_bob(spring=False):
    """Distance-joint bob under gravity (joint oracle, ref:
    src/joints/DistanceJoint.cs:88-260)."""
    w = _world()
    anchor = w.create_body(t.BodyDef(type=t.STATIC, position=(0.0, 6.0)))
    bob = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(1.2, 5.0)))
    w.create_circle_shape(bob, t.ShapeDef(density=1.0), (0.0, 0.0), 0.2)
    kw = {}
    if spring:
        kw = dict(enable_spring=True, hertz=2.0, damping_ratio=0.4)
    w.create_joint(t.DistanceJointDef(
        body_a=anchor, body_b=bob, local_anchor_a=(0.0, 0.0),
        local_anchor_b=(0.0, 0.0), length=1.5, **kw))
    return w


def _wheel(motor=False, limit=False):
    """Wheel suspension: a wheel hanging from a static frame on a vertical
    axis spring (joint oracle, ref: src/joints/WheelJoint.cs:92-285)."""
    w = _world()
    frame = w.create_body(t.BodyDef(type=t.STATIC, position=(0.0, 2.0)))
    wheel = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0.15, 1.6)))
    w.create_circle_shape(wheel, t.ShapeDef(density=1.0), (0.0, 0.0), 0.3)
    kw = dict(enable_spring=True, hertz=3.0, damping_ratio=0.4)
    if motor:
        kw.update(enable_motor=True, max_motor_torque=2.0, motor_speed=2.0)
    if limit:
        kw.update(enable_limit=True, lower_translation=-0.6,
                  upper_translation=0.1)
    w.create_joint(t.WheelJointDef(
        body_a=frame, body_b=wheel, local_anchor_a=(0.0, 0.0),
        local_anchor_b=(0.0, 0.0), local_axis_a=(0.0, 1.0), **kw))
    return w


def _weld(soft=False):
    """Weld: a bar welded to a static post, starting offset so the weld
    pulls it back (joint oracle, ref: src/joints/WeldJoint.cs:40-160)."""
    w = _world()
    post = w.create_body(t.BodyDef(type=t.STATIC, position=(0.0, 3.0)))
    bar = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0.6, 2.8),
                                  angle=0.25))
    w.create_polygon_shape(bar, t.ShapeDef(density=1.0), g.box(0.5, 0.1))
    kw = {}
    if soft:
        kw = dict(linear_hertz=4.0, linear_damping_ratio=0.3,
                  angular_hertz=3.0, angular_damping_ratio=0.3)
    w.create_joint(t.WeldJointDef(
        body_a=post, body_b=bar, local_anchor_a=(0.0, 0.0),
        local_anchor_b=(-0.5, 0.0), **kw))
    return w


def _motor_joint():
    """Motor joint: a free box driven toward a target pose by spring +
    velocity drives (joint oracle, ref: src/joints/MotorJoint.cs:61-217)."""
    w = _world()
    frame = w.create_body(t.BodyDef(type=t.STATIC, position=(0.0, 2.0)))
    box = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0.8, 1.5),
                                  angle=0.4))
    w.create_polygon_shape(box, t.ShapeDef(density=1.0), g.box(0.3, 0.3))
    w.create_joint(t.MotorJointDef(
        body_a=frame, body_b=box,
        linear_velocity=(0.3, 0.0), angular_velocity=0.8,
        max_velocity_force=8.0, max_velocity_torque=2.0,
        linear_hertz=2.0, linear_damping_ratio=0.5, max_spring_force=15.0,
        angular_hertz=1.5, angular_damping_ratio=0.4,
        max_spring_torque=4.0))
    return w


@pytest.mark.parametrize("scene,steps,bound", [
    # single-contact scenes hold the 1000-step north-star bound
    # (BASELINE.json: <1e-3 drift over 1000 steps)
    ("drop", 1000, 1e-3), ("bounce", 1000, 1e-3), ("slide", 1000, 1e-3),
    ("capsule", 1000, 1e-3),
    # stacks have simultaneous contacts sharing a body: the engine's
    # color-parallel Gauss-Seidel visits them in a different order than the
    # oracle's sequential sweep, so the settling transient accumulates a few
    # mm before rest (single-contact scenes above hold the tight bound)
    ("stack2", 600, 1e-2), ("stack3", 600, 1e-2),
    # joint oracles (revolute + distance transliterations)
    ("pendulum", 1000, 1e-3), ("pendulum_motor", 1000, 1e-3),
    ("pendulum_spring", 1000, 1e-3),
    ("dist_rigid", 1000, 1e-3), ("dist_spring", 1000, 1e-3),
    ("slider", 1000, 1e-3), ("slider_motor", 1000, 1e-3),
    # wheel/weld/motor transliterations (WheelJoint.cs / WeldJoint.cs /
    # MotorJoint.cs)
    ("wheel", 1000, 1e-3), ("wheel_motor", 1000, 1e-3),
    ("weld_rigid", 1000, 1e-3), ("weld_soft", 1000, 1e-3),
    ("motor_joint", 1000, 1e-3),
])
def test_oracle_drift(scene, steps, bound):
    builders = {
        "drop": lambda: _box_drop(),
        "bounce": lambda: _box_drop(restitution=0.5),
        "slide": lambda: _box_drop(vx=4.0, drop=0.55),
        "stack2": lambda: _stack(2),
        "stack3": lambda: _stack(3),
        "capsule": _capsule_rest,
        "pendulum": _pendulum,
        "pendulum_motor": lambda: _pendulum(motor=True, limit=True),
        "pendulum_spring": lambda: _pendulum(spring=True),
        "dist_rigid": _dist_bob,
        "dist_spring": lambda: _dist_bob(spring=True),
        "slider": _slider,
        "slider_motor": lambda: _slider(motor=True, spring=True),
        "wheel": lambda: _wheel(limit=True),
        "wheel_motor": lambda: _wheel(motor=True, limit=True),
        "weld_rigid": _weld,
        "weld_soft": lambda: _weld(soft=True),
        "motor_joint": _motor_joint,
    }
    oracle_c = _run_oracle(builders[scene](), steps)
    engine_c = _run_engine(builders[scene](), steps)
    drift = np.max(np.abs(oracle_c - engine_c))
    assert drift < bound, f"{scene}: drift {drift}"


def _particle_scene(boxes, pts, radius):
    w = _world()
    tank = w.create_body(t.BodyDef(type=t.STATIC))
    for c, h in boxes:
        w.create_polygon_shape(tank, t.ShapeDef(),
                               g.box(h[0], h[1], center=c))
    ps = w.create_particle_system(radius=radius)
    for p in pts:
        ps.create_particle(p)
    w.compile()
    return w


def _run_both(boxes, pts, radius, steps):
    import oracle_particles as op

    w = _particle_scene(boxes, pts, radius)
    pw = op.PWorld(boxes, radius=radius)
    pos = np.asarray(pts, np.float32)
    vel = np.zeros_like(pos)
    for _ in range(steps):
        w.step(1 / 60)
        pos, vel = pw.step(pos, vel, 1 / 60)
    return np.asarray(w.state.particles.pos)[:len(pts)], pos


def test_particle_column_oracle_exact():
    """50-particle water column vs the scalar LiquidFun transliteration
    (tests/oracle_particles.py; ref particle/ParticleSystem.cs:1512-1915):
    the collapsing column matches the reference pipeline formula-for-formula
    over the first steps (summation-order float noise only — a collapsing
    column is chaotic, so per-particle bounds cannot survive longer)."""
    boxes = [((0.0, -0.25), (1.0, 0.25)),
             ((-1.0, 1.0), (0.25, 1.5)),
             ((1.0, 1.0), (0.25, 1.5))]
    radius = 0.05
    stride = 0.75 * 2 * radius
    pts = [(-0.5 + c * stride, 0.06 + r * stride)
           for r in range(10) for c in range(5)]
    eng, pos = _run_both(boxes, pts, radius, 2)
    drift = np.max(np.abs(eng - pos))
    assert drift < 1e-6, f"particle column early drift {drift}"


def test_particle_bed_oracle_drift():
    """Shallow 2-layer bed (laminar: settles hydrostatically, no splash):
    the 1000-step trajectory holds the 1e-2 drift bound vs the reference
    transliteration."""
    boxes = [((0.0, -0.25), (1.2, 0.25)),
             ((-1.2, 1.0), (0.25, 1.5)),
             ((1.2, 1.0), (0.25, 1.5))]
    radius = 0.05
    stride = 0.75 * 2 * radius
    pts = [(-0.9 + c * stride, 0.05 + r * stride)
           for r in range(2) for c in range(25)]
    eng, pos = _run_both(boxes, pts, radius, 1000)
    drift = np.max(np.abs(eng - pos))
    assert drift < 1e-2, f"particle bed drift {drift}"
