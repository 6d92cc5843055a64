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
