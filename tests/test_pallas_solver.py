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
