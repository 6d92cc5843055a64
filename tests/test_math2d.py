import jax.numpy as jnp
import numpy as np

from box2d_tpu import math2d as m


def test_rot_roundtrip():
    q = m.rot_from_angle(0.3)
    v = jnp.array([1.0, 2.0])
    assert np.allclose(m.inv_rot_vec(q, m.rot_vec(q, v)), v, atol=1e-6)


def test_rot_mul_matches_angle_sum():
    a, b = 0.4, -1.1
    q = m.rot_mul(m.rot_from_angle(a), m.rot_from_angle(b))
    assert np.allclose(m.rot_angle(q), a + b, atol=1e-6)


def test_rot_integrate_small_angle():
    q = m.rot_integrate(m.rot_identity(), jnp.float32(0.01))
    assert np.allclose(m.rot_angle(q), 0.01, atol=1e-5)
    # stays normalized
    assert np.allclose(q[0] ** 2 + q[1] ** 2, 1.0, atol=1e-6)


def test_transform_inverse():
    p = jnp.array([3.0, -2.0])
    q = m.rot_from_angle(0.7)
    v = jnp.array([0.5, 1.5])
    w = m.transform_point(p, q, v)
    assert np.allclose(m.inv_transform_point(p, q, w), v, atol=1e-5)


def test_inv_mul_transforms():
    pa, qa = jnp.array([1.0, 2.0]), m.rot_from_angle(0.3)
    pb, qb = jnp.array([-1.0, 0.5]), m.rot_from_angle(-0.9)
    xp, xq = m.inv_mul_transforms(pa, qa, pb, qb)
    v = jnp.array([0.2, 0.7])
    # A-local of (B-local point v) == inv(A) applied to world point
    world = m.transform_point(pb, qb, v)
    assert np.allclose(
        m.transform_point(xp, xq, v), m.inv_transform_point(pa, qa, world), atol=1e-5
    )


def test_cross_and_perps():
    v = jnp.array([2.0, 3.0])
    assert np.allclose(m.left_perp(v), [-3.0, 2.0])
    assert np.allclose(m.right_perp(v), [3.0, -2.0])
    assert np.allclose(m.cross(v, m.left_perp(v)), m.dot(v, v))


def test_solve22():
    x, y = m.solve22(
        jnp.float32(2.0), jnp.float32(1.0), jnp.float32(1.0), jnp.float32(3.0),
        jnp.float32(5.0), jnp.float32(10.0),
    )
    assert np.allclose([x, y], [1.0, 3.0], atol=1e-6)


def test_softness_reference_values():
    # Softness(30 Hz, 10.0, h=1/240) (ref: src/Solver.cs:10-26)
    h = 1.0 / 240.0
    omega = 2.0 * np.pi * 30.0
    a1 = 2.0 * 10.0 + h * omega
    a2 = h * omega * a1
    a3 = 1.0 / (1.0 + a2)
    br, ms, is_ = m.softness(30.0, 10.0, h)
    assert np.allclose(br, omega / a1, rtol=1e-6)
    assert np.allclose(ms, a2 * a3, rtol=1e-6)
    assert np.allclose(is_, a3, rtol=1e-6)
    # zero hertz disables
    br0, ms0, is0 = m.softness(0.0, 10.0, h)
    assert br0 == 0 and ms0 == 0 and is0 == 0


def test_aabb_ops():
    a = jnp.array([0.0, 0.0, 2.0, 2.0])
    b = jnp.array([1.0, 1.0, 3.0, 3.0])
    c = jnp.array([5.0, 5.0, 6.0, 6.0])
    assert bool(m.aabb_overlaps(a, b))
    assert not bool(m.aabb_overlaps(a, c))
    u = m.aabb_union(a, b)
    assert np.allclose(u, [0, 0, 3, 3])
    assert bool(m.aabb_contains(u, a))
