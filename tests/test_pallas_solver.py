"""The Pallas solver path vs the XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from box2d_tpu import scenes
from box2d_tpu.narrowphase import classes_for_shape_types
from box2d_tpu.world import _step


def test_pallas_solver_matches_xla_interpreted():
    from jax.experimental.pallas import tpu as pltpu

    w = scenes.pyramid(rows=3)
    state, cap = w.builder.build()
    classes = classes_for_shape_types(s["geom"].type for s in w.builder._shapes)

    step_x = jax.jit(lambda s: _step(s, jnp.float32(1 / 60), cap, classes, 4,
                                     frozenset(), (), False, None, False))
    step_p = jax.jit(lambda s: _step(s, jnp.float32(1 / 60), cap, classes, 4,
                                     frozenset(), (), False, None, True))
    sx = state
    sp = state
    with pltpu.force_tpu_interpret_mode():
        for _ in range(5):
            sx = step_x(sx)
            sp = step_p(sp)
    np.testing.assert_allclose(np.asarray(sp.bodies.center),
                               np.asarray(sx.bodies.center), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sp.bodies.v),
                               np.asarray(sx.bodies.v), atol=2e-3)


def test_tiled_pallas_solver_matches_xla_interpreted():
    """The HBM-streaming tiled kernel (mode 2) vs the XLA path.

    color_chunk=128 forces narrow windows so the active-window list, the
    window sweep loop, and the body-tile gather ranges are all exercised."""
    from jax.experimental.pallas import tpu as pltpu
    from box2d_tpu.state import Capacity

    w = scenes.pyramid(rows=4)
    nb = len(w.builder._bodies)
    ns = len(w.builder._shapes)
    cap = Capacity(max_bodies=nb, max_shapes=ns, max_joints=1,
                   max_contact_pairs=max(4 * ns, 64), color_chunk=128)
    state, cap = w.builder.build(cap)
    classes = classes_for_shape_types(s["geom"].type for s in w.builder._shapes)

    step_x = jax.jit(lambda s: _step(s, jnp.float32(1 / 60), cap, classes, 4,
                                     frozenset(), (), False, None, 0))
    step_t = jax.jit(lambda s: _step(s, jnp.float32(1 / 60), cap, classes, 4,
                                     frozenset(), (), False, None, 2))
    sx = state
    st = state
    with pltpu.force_tpu_interpret_mode():
        for _ in range(5):
            sx = step_x(sx)
            st = step_t(st)
    np.testing.assert_allclose(np.asarray(st.bodies.center),
                               np.asarray(sx.bodies.center), atol=1e-4)
    np.testing.assert_allclose(np.asarray(st.bodies.v),
                               np.asarray(sx.bodies.v), atol=2e-3)


def test_streamed_acc_tiled_solver_matches_xla_interpreted():
    """Mode 3 (streamed acc/idx blocks, every window visited with write-
    through on skipped ones) must reproduce the XLA path exactly like
    mode 2 does."""
    from jax.experimental.pallas import tpu as pltpu
    from box2d_tpu.state import Capacity

    w = scenes.pyramid(rows=4)
    nb = len(w.builder._bodies)
    ns = len(w.builder._shapes)
    cap = Capacity(max_bodies=nb, max_shapes=ns, max_joints=1,
                   max_contact_pairs=max(4 * ns, 64), color_chunk=128)
    state, cap = w.builder.build(cap)
    classes = classes_for_shape_types(s["geom"].type for s in w.builder._shapes)

    step_x = jax.jit(lambda s: _step(s, jnp.float32(1 / 60), cap, classes, 4,
                                     frozenset(), (), False, None, 0))
    step_t = jax.jit(lambda s: _step(s, jnp.float32(1 / 60), cap, classes, 4,
                                     frozenset(), (), False, None, 3))
    sx = state
    st = state
    with pltpu.force_tpu_interpret_mode():
        for _ in range(5):
            sx = step_x(sx)
            st = step_t(st)
    np.testing.assert_allclose(np.asarray(st.bodies.center),
                               np.asarray(sx.bodies.center), atol=1e-4)
    np.testing.assert_allclose(np.asarray(st.bodies.v),
                               np.asarray(sx.bodies.v), atol=2e-3)
    # warm-start impulses survive the streamed store
    np.testing.assert_allclose(np.asarray(st.contacts.normal_impulse),
                               np.asarray(sx.contacts.normal_impulse),
                               atol=2e-3)


def test_tiled_kernel_kinematic_beyond_dynamic_tiles():
    """A KINEMATIC body whose index lies in a body tile beyond every dynamic
    body's tile must still be gathered by the mode-2 kernel: the shifted-dq
    zero-read trick is exact only for static bodies, so window_metadata must
    bound tile ranges with ALL non-static endpoints (a kinematic platform
    read as zeros would be solved as stationary — no friction drag)."""
    from jax.experimental.pallas import tpu as pltpu
    from box2d_tpu import geometry as g
    from box2d_tpu import types as t
    from box2d_tpu.api import World
    from box2d_tpu.state import Capacity

    def build():
        w = World(t.WorldDef(gravity=(0.0, -10.0)))
        # body 0: the dynamic box riding the platform (tile 0)
        box = w.create_body(t.BodyDef(type=2, position=(0.0, 1.05)))
        w.create_polygon_shape(box, t.ShapeDef(material=t.SurfaceMaterial(friction=0.9)),
                               g.box(0.5, 0.5))
        # bodies 1..512: inert static padding to push the platform's lane
        # into body tile 1 (DEFAULT_BODY_TILE = 512)
        for i in range(512):
            w.create_body(t.BodyDef(type=0, position=(100.0 + i, -50.0)))
        # body 513: the kinematic conveyor platform, moving +x
        plat = w.create_body(t.BodyDef(type=1, position=(0.0, 0.0),
                                       linear_velocity=(2.0, 0.0)))
        w.create_polygon_shape(plat, t.ShapeDef(material=t.SurfaceMaterial(friction=0.9)),
                               g.box(20.0, 0.5))
        nb = len(w.builder._bodies)
        ns = len(w.builder._shapes)
        cap = Capacity(max_bodies=nb, max_shapes=ns, max_joints=1,
                       max_contact_pairs=64, color_chunk=128)
        state, cap = w.builder.build(cap)
        classes = classes_for_shape_types(
            s["geom"].type for s in w.builder._shapes)
        return state, cap, classes, box

    state, cap, classes, box = build()
    step_x = jax.jit(lambda s: _step(s, jnp.float32(1 / 60), cap, classes, 4,
                                     frozenset(), (), False, None, 0))
    step_t = jax.jit(lambda s: _step(s, jnp.float32(1 / 60), cap, classes, 4,
                                     frozenset(), (), False, None, 2))
    sx = state
    st = state
    with pltpu.force_tpu_interpret_mode():
        for _ in range(8):
            sx = step_x(sx)
            st = step_t(st)
    # the platform must drag the box: nonzero +x velocity on the XLA path,
    # and the tiled kernel must agree with it
    assert float(sx.bodies.v[box, 0]) > 0.05
    np.testing.assert_allclose(np.asarray(st.bodies.v[box]),
                               np.asarray(sx.bodies.v[box]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(st.bodies.center[box]),
                               np.asarray(sx.bodies.center[box]), atol=1e-4)


def _equiv_check(w, steps=6, substeps=4):
    """Run the XLA path vs the tiled kernel (mode 2) on a jointed scene in
    interpret mode and require matching trajectories + joint impulses."""
    from jax.experimental.pallas import tpu as pltpu
    from box2d_tpu.joints import joint_types_present

    state, cap = w.builder.build()
    classes = classes_for_shape_types(s["geom"].type for s in w.builder._shapes)
    jtypes = joint_types_present(j["_type"] for j in w.builder._joints)
    step_x = jax.jit(lambda s: _step(s, jnp.float32(1 / 60), cap, classes,
                                     substeps, jtypes, (), False, None, 0))
    step_t = jax.jit(lambda s: _step(s, jnp.float32(1 / 60), cap, classes,
                                     substeps, jtypes, (), False, None, 2))
    sx = state
    st = state
    with pltpu.force_tpu_interpret_mode():
        for _ in range(steps):
            sx = step_x(sx)
            st = step_t(st)
    np.testing.assert_allclose(np.asarray(st.bodies.center),
                               np.asarray(sx.bodies.center), atol=1e-4)
    np.testing.assert_allclose(np.asarray(st.bodies.v),
                               np.asarray(sx.bodies.v), atol=2e-3)
    np.testing.assert_allclose(np.asarray(st.joints.impulse),
                               np.asarray(sx.joints.impulse), atol=5e-3)
    np.testing.assert_allclose(np.asarray(st.joints.motor_impulse),
                               np.asarray(sx.joints.motor_impulse), atol=5e-3)


def test_joints_in_tiled_kernel_match_xla_ragdolls():
    """Revolute + prismatic + distance joints riding the mode-2 kernel's
    kind-pure windows must reproduce the XLA joint path
    (ref: src/Solver.cs:624-682 interleaves joints in the same stages)."""
    _equiv_check(scenes.joint_farm(ragdolls=2), steps=6)


def test_joints_in_tiled_kernel_match_xla_all_types():
    """Weld/wheel/motor/mouse + limits/springs/motors in one scene."""
    from box2d_tpu import geometry as g
    from box2d_tpu import types as t
    from box2d_tpu.api import World

    w = World(t.WorldDef(gravity=(0.0, -10.0)))
    ground = w.create_body(t.BodyDef(type=0, position=(0.0, -0.5)))
    w.create_polygon_shape(ground, t.ShapeDef(), g.box(50.0, 0.5))

    # weld pair tumbling under gravity
    a = w.create_body(t.BodyDef(type=2, position=(0.0, 5.0),
                                angular_velocity=2.0))
    w.create_polygon_shape(a, t.ShapeDef(), g.box(0.4, 0.4))
    b = w.create_body(t.BodyDef(type=2, position=(1.0, 5.0)))
    w.create_polygon_shape(b, t.ShapeDef(), g.box(0.4, 0.4))
    w.create_joint(t.WeldJointDef(body_a=a, body_b=b,
                                  local_anchor_a=(0.5, 0.0),
                                  local_anchor_b=(-0.5, 0.0)))

    # wheel with suspension spring + motor
    chassis = w.create_body(t.BodyDef(type=2, position=(5.0, 2.0)))
    w.create_polygon_shape(chassis, t.ShapeDef(), g.box(1.0, 0.25))
    wheel = w.create_body(t.BodyDef(type=2, position=(5.0, 1.0)))
    w.create_circle_shape(wheel, t.ShapeDef(), (0.0, 0.0), 0.4)
    w.create_joint(t.WheelJointDef(body_a=chassis, body_b=wheel,
                                   local_anchor_a=(0.0, -1.0),
                                   enable_motor=True, motor_speed=3.0,
                                   max_motor_torque=20.0,
                                   hertz=4.0, damping_ratio=0.7))

    # motor joint velocity drive
    puck = w.create_body(t.BodyDef(type=2, position=(-5.0, 3.0),
                                   gravity_scale=0.0))
    w.create_circle_shape(puck, t.ShapeDef(), (0.0, 0.0), 0.3)
    w.create_joint(t.MotorJointDef(body_a=ground, body_b=puck,
                                   linear_velocity=(1.0, 0.0),
                                   max_velocity_force=10.0,
                                   angular_velocity=1.0,
                                   max_velocity_torque=5.0))

    # mouse drag
    ball = w.create_body(t.BodyDef(type=2, position=(-8.0, 3.0)))
    w.create_circle_shape(ball, t.ShapeDef(), (0.0, 0.0), 0.3)
    w.create_joint(t.MouseJointDef(body_a=ground, body_b=ball,
                                   target=(-7.0, 4.0), hertz=4.0,
                                   damping_ratio=0.7, max_force=50.0))

    # distance spring with limits + motor (spring mode)
    p1 = w.create_body(t.BodyDef(type=2, position=(8.0, 4.0)))
    w.create_circle_shape(p1, t.ShapeDef(), (0.0, 0.0), 0.2)
    anchor2 = w.create_body(t.BodyDef(type=0, position=(8.0, 6.0)))
    w.create_joint(t.DistanceJointDef(body_a=anchor2, body_b=p1,
                                      length=1.5, enable_spring=True,
                                      hertz=3.0, damping_ratio=0.5,
                                      enable_limit=True, min_length=1.0,
                                      max_length=2.5, enable_motor=True,
                                      max_motor_force=5.0, motor_speed=0.2))
    _equiv_check(w, steps=6)


def test_tiled_kernel_halved_subwindows_match_xla_interpreted():
    """chunk=512 routes the contact-only tiled kernel onto PAIRED
    sub-windows (world.py halves=4: one grid step sweeps four 128-lane
    halves, each with its own gather-tile range). Must reproduce the XLA
    path like the plain w=128 kernel does."""
    from jax.experimental.pallas import tpu as pltpu
    from box2d_tpu.state import Capacity

    w = scenes.pyramid(rows=4)
    nb = len(w.builder._bodies)
    ns = len(w.builder._shapes)
    cap = Capacity(max_bodies=nb, max_shapes=ns, max_joints=1,
                   max_contact_pairs=max(4 * ns, 64), color_chunk=512,
                   max_colors=8)  # small grid: interpret mode is slow
    state, cap = w.builder.build(cap)
    classes = classes_for_shape_types(s["geom"].type for s in w.builder._shapes)

    step_x = jax.jit(lambda s: _step(s, jnp.float32(1 / 60), cap, classes, 4,
                                     frozenset(), (), False, None, 0))
    step_t = jax.jit(lambda s: _step(s, jnp.float32(1 / 60), cap, classes, 4,
                                     frozenset(), (), False, None, 2))
    sx = state
    st = state
    with pltpu.force_tpu_interpret_mode():
        for _ in range(4):
            sx = step_x(sx)
            st = step_t(st)
    np.testing.assert_allclose(np.asarray(st.bodies.center),
                               np.asarray(sx.bodies.center), atol=1e-4)
    np.testing.assert_allclose(np.asarray(st.bodies.v),
                               np.asarray(sx.bodies.v), atol=2e-3)


def test_tiled_kernel_five_subwindows_match_xla_interpreted():
    """chunk=640 routes the contact-only tiled kernel onto FIVE 128-lane
    sub-windows per grid step (world.py halves=5 — the shape pyramid-140's
    chunk=2560 takes after auto_chunk's 512-rounding). Must reproduce the
    XLA path like the halves=4 kernel does."""
    from jax.experimental.pallas import tpu as pltpu
    from box2d_tpu.state import Capacity

    w = scenes.pyramid(rows=4)
    nb = len(w.builder._bodies)
    ns = len(w.builder._shapes)
    cap = Capacity(max_bodies=nb, max_shapes=ns, max_joints=1,
                   max_contact_pairs=max(4 * ns, 64), color_chunk=640,
                   max_colors=8)  # small grid: interpret mode is slow
    state, cap = w.builder.build(cap)
    classes = classes_for_shape_types(s["geom"].type for s in w.builder._shapes)

    step_x = jax.jit(lambda s: _step(s, jnp.float32(1 / 60), cap, classes, 4,
                                     frozenset(), (), False, None, 0))
    step_t = jax.jit(lambda s: _step(s, jnp.float32(1 / 60), cap, classes, 4,
                                     frozenset(), (), False, None, 2))
    sx = state
    st = state
    with pltpu.force_tpu_interpret_mode():
        for _ in range(4):
            sx = step_x(sx)
            st = step_t(st)
    np.testing.assert_allclose(np.asarray(st.bodies.center),
                               np.asarray(sx.bodies.center), atol=1e-4)
    np.testing.assert_allclose(np.asarray(st.bodies.v),
                               np.asarray(sx.bodies.v), atol=2e-3)


def test_streamed_acc_single_window_matches_xla_interpreted():
    """nact == 1 exercises the streamed kernel's OTHER DMA path: with a
    single active window, consecutive visits hit the SAME layout slice
    (visit k+1's input is visit k's output), so the double-buffered
    prefetch is disabled and every visit must do a blocking self-fetch.
    One box resting on the ground = one contact = one color = one window."""
    from jax.experimental.pallas import tpu as pltpu
    from box2d_tpu import geometry as g
    from box2d_tpu import types as t
    from box2d_tpu.api import World
    from box2d_tpu.state import Capacity

    w = World(t.WorldDef(gravity=(0.0, -10.0)))
    ground = w.create_body(t.BodyDef(type=0, position=(0.0, -0.5)))
    w.create_polygon_shape(ground, t.ShapeDef(), g.box(5.0, 0.5))
    box = w.create_body(t.BodyDef(type=2, position=(0.0, 0.55)))
    w.create_polygon_shape(box, t.ShapeDef(density=1.0), g.box(0.5, 0.5))
    nb = len(w.builder._bodies)
    ns = len(w.builder._shapes)
    cap = Capacity(max_bodies=nb, max_shapes=ns, max_joints=1,
                   max_contact_pairs=64, color_chunk=128)
    state, cap = w.builder.build(cap)
    classes = classes_for_shape_types(s["geom"].type for s in w.builder._shapes)

    step_x = jax.jit(lambda s: _step(s, jnp.float32(1 / 60), cap, classes, 4,
                                     frozenset(), (), False, None, 0))
    step_t = jax.jit(lambda s: _step(s, jnp.float32(1 / 60), cap, classes, 4,
                                     frozenset(), (), False, None, 3))
    sx = state
    st = state
    with pltpu.force_tpu_interpret_mode():
        for _ in range(5):
            sx = step_x(sx)
            st = step_t(st)
    np.testing.assert_allclose(np.asarray(st.bodies.center),
                               np.asarray(sx.bodies.center), atol=1e-4)
    np.testing.assert_allclose(np.asarray(st.bodies.v),
                               np.asarray(sx.bodies.v), atol=2e-3)
    np.testing.assert_allclose(np.asarray(st.contacts.normal_impulse),
                               np.asarray(sx.contacts.normal_impulse),
                               atol=2e-3)
