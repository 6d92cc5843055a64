import jax.numpy as jnp
import numpy as np

from box2d_tpu import geometry as g
from box2d_tpu import math2d as m
from box2d_tpu.distance import segment_distance, shape_cast_pair, shape_distance

I2 = m.rot_identity()
Z2 = jnp.zeros(2)


def _box_proxy():
    bx = g.box(0.5, 0.5)
    return jnp.array(bx.verts)


def test_segment_distance_parallel():
    r = segment_distance(
        jnp.array([0.0, 0.0]), jnp.array([1.0, 0.0]),
        jnp.array([0.0, 1.0]), jnp.array([1.0, 1.0]),
    )
    assert np.allclose(r.distance_squared, 1.0, atol=1e-6)


def test_segment_distance_endpoints():
    r = segment_distance(
        jnp.array([0.0, 0.0]), jnp.array([1.0, 0.0]),
        jnp.array([3.0, 0.0]), jnp.array([4.0, 0.0]),
    )
    assert np.allclose(r.distance_squared, 4.0, atol=1e-6)
    assert r.fraction1 == 1.0 and r.fraction2 == 0.0


def test_gjk_box_box_separated():
    V = _box_proxy()
    out = shape_distance(V, 4, 0.0, V, 4, 0.0, Z2, I2, jnp.array([2.0, 0.0]), I2)
    assert np.allclose(out.distance, 1.0, atol=1e-5)
    assert np.allclose(out.normal, [1.0, 0.0], atol=1e-5)
    assert np.allclose(out.point_a, [0.5, -0.5], atol=1e-5) or np.allclose(
        out.point_a[0], 0.5, atol=1e-5
    )


def test_gjk_overlap_reports_zero():
    V = _box_proxy()
    out = shape_distance(V, 4, 0.0, V, 4, 0.0, Z2, I2, jnp.array([0.5, 0.0]), I2)
    assert out.distance == 0.0


def test_gjk_point_vs_box_corner():
    V = _box_proxy()
    P = jnp.tile(jnp.array([[0.0, 0.0]]), (8, 1))
    out = shape_distance(V, 4, 0.0, P, 1, 0.0, Z2, I2, jnp.array([3.0, 4.0]), I2)
    assert np.allclose(out.distance, np.hypot(2.5, 3.5), rtol=1e-5)


def test_gjk_with_radii():
    V = _box_proxy()
    out = shape_distance(V, 4, 0.1, V, 4, 0.2, Z2, I2, jnp.array([2.0, 0.0]), I2,
                         use_radii=True)
    assert np.allclose(out.distance, 0.7, atol=1e-5)


def test_gjk_rotated():
    V = _box_proxy()
    # B rotated 45 deg: its corner reaches sqrt(2)/2 toward A
    qb = m.rot_from_angle(np.pi / 4)
    out = shape_distance(V, 4, 0.0, V, 4, 0.0, Z2, I2, jnp.array([3.0, 0.0]), qb)
    assert np.allclose(out.distance, 3.0 - 0.5 - np.sqrt(2) / 2, atol=1e-4)


def test_shape_cast_hits():
    V = _box_proxy()
    out = shape_cast_pair(V, 4, 0.0, V, 4, 0.0, Z2, I2, jnp.array([3.0, 0.0]), I2,
                          jnp.array([-4.0, 0.0]), 1.0)
    assert bool(out.hit)
    # gap 2.0 over translation 4.0 => ~0.5 minus slop
    assert np.allclose(out.fraction, 0.5, atol=2e-3)
    assert np.allclose(out.normal, [1.0, 0.0], atol=1e-5)


def test_shape_cast_miss():
    V = _box_proxy()
    out = shape_cast_pair(V, 4, 0.0, V, 4, 0.0, Z2, I2, jnp.array([3.0, 0.0]), I2,
                          jnp.array([4.0, 0.0]), 1.0)
    assert not bool(out.hit)


def test_gjk_vmapped():
    import jax

    V = _box_proxy()
    offsets = jnp.stack([jnp.array([2.0 + i, 0.0]) for i in range(4)])
    f = jax.vmap(
        lambda off: shape_distance(V, 4, 0.0, V, 4, 0.0, Z2, I2, off, I2).distance
    )
    d = f(offsets)
    assert np.allclose(d, [1.0, 2.0, 3.0, 4.0], atol=1e-5)
