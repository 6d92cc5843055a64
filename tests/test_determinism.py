import jax
import jax.numpy as jnp
import numpy as np

from box2d_tpu import scenes
from box2d_tpu.narrowphase import classes_for_shape_types
from box2d_tpu.world import _step


def test_bitwise_determinism():
    """Same initial state stepped twice gives bitwise-identical results
    (SURVEY.md §4(d): determinism tests)."""
    w = scenes.pyramid(rows=5)
    state, cap = w.builder.build()
    classes = classes_for_shape_types(s["geom"].type for s in w.builder._shapes)
    step = jax.jit(lambda s: _step(s, jnp.float32(1 / 60), cap, classes, 4))

    def run(n):
        s = state
        for _ in range(n):
            s = step(s)
        return np.asarray(s.bodies.center), np.asarray(s.bodies.v)

    c1, v1 = run(30)
    c2, v2 = run(30)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(v1, v2)


def test_tuning_change_no_recompile_effects():
    # changing traced tuning (gravity) must not change shapes/recompile paths
    w = scenes.pyramid(rows=3).compile()
    w.step(1 / 60)
    w.set_gravity((0.0, -3.0))
    w.step(1 / 60)
    assert np.isfinite(np.asarray(w.state.bodies.center)).all()
