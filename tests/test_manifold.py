import jax
import jax.numpy as jnp
import numpy as np

from box2d_tpu import geometry as g
from box2d_tpu import manifold as mf
from box2d_tpu import math2d as m

I2 = m.rot_identity()
Z2 = jnp.zeros(2)
BOX = g.box(0.5, 0.5)
V, N = jnp.array(BOX.verts), jnp.array(BOX.normals)


def test_box_stack_two_points():
    man = mf.collide_polygons(V, N, 4, 0.0, Z2, I2, V, N, 4, 0.0,
                              jnp.array([0.0, 0.99]), I2)
    assert int(man.point_count) == 2
    assert np.allclose(man.normal, [0.0, 1.0], atol=1e-6)
    assert np.allclose(man.separation, [-0.01, -0.01], atol=1e-5)
    # contact points at the shared face corners
    xs = sorted([float(man.point[0, 0]), float(man.point[1, 0])])
    assert np.allclose(xs, [-0.5, 0.5], atol=1e-5)
    assert int(man.ids[0]) != int(man.ids[1])


def test_boxes_apart_no_manifold():
    man = mf.collide_polygons(V, N, 4, 0.0, Z2, I2, V, N, 4, 0.0,
                              jnp.array([0.0, 1.25]), I2)
    assert int(man.point_count) == 0


def test_boxes_speculative():
    man = mf.collide_polygons(V, N, 4, 0.0, Z2, I2, V, N, 4, 0.0,
                              jnp.array([0.0, 1.01]), I2)
    assert int(man.point_count) == 2
    assert np.all(np.asarray(man.separation) > 0.0)


def test_boxes_corner_vertex_case():
    # B offset diagonally so closest features are two corners
    man = mf.collide_polygons(V, N, 4, 0.0, Z2, I2, V, N, 4, 0.0,
                              jnp.array([1.005, 1.005]), I2)
    assert int(man.point_count) == 1
    assert np.allclose(man.normal, [np.sqrt(0.5), np.sqrt(0.5)], atol=1e-4)


def test_circles():
    man = mf.collide_circles(Z2, 0.5, Z2, I2, Z2, 0.5, jnp.array([0.9, 0.0]), I2)
    assert int(man.point_count) == 1
    assert np.allclose(man.normal, [1.0, 0.0])
    assert np.allclose(man.separation[0], -0.1, atol=1e-5)
    man2 = mf.collide_circles(Z2, 0.5, Z2, I2, Z2, 0.5, jnp.array([1.5, 0.0]), I2)
    assert int(man2.point_count) == 0


def test_capsule_circle_midline():
    man = mf.collide_capsule_circle(
        jnp.array([-0.5, 0.0]), jnp.array([0.5, 0.0]), 0.2, Z2, I2,
        Z2, 0.2, jnp.array([0.0, 0.39]), I2)
    assert int(man.point_count) == 1
    assert np.allclose(man.normal, [0.0, 1.0], atol=1e-5)
    assert np.allclose(man.separation[0], -0.01, atol=1e-5)


def test_polygon_circle_face_and_vertex():
    man = mf.collide_polygon_circle(V, N, 4, 0.0, Z2, I2, Z2, 0.5,
                                    jnp.array([0.0, 0.99]), I2)
    assert int(man.point_count) == 1
    assert np.allclose(man.normal, [0.0, 1.0], atol=1e-6)
    # vertex region: circle overlapping the corner diagonally
    man2 = mf.collide_polygon_circle(V, N, 4, 0.0, Z2, I2, Z2, 0.5,
                                     jnp.array([0.8, 0.8]), I2)
    assert int(man2.point_count) == 1
    assert np.allclose(man2.normal, [np.sqrt(0.5), np.sqrt(0.5)], atol=1e-4)
    assert np.allclose(man2.separation[0], np.hypot(0.3, 0.3) - 0.5, atol=1e-4)
    # too far past the corner: no contact
    man3 = mf.collide_polygon_circle(V, N, 4, 0.0, Z2, I2, Z2, 0.5,
                                     jnp.array([1.0, 1.0]), I2)
    assert int(man3.point_count) == 0


def test_capsules_parallel_two_points():
    a1, a2 = jnp.array([-0.5, 0.0]), jnp.array([0.5, 0.0])
    man = mf.collide_capsules(a1, a2, 0.2, Z2, I2, a1, a2, 0.2,
                              jnp.array([0.0, 0.39]), I2)
    assert int(man.point_count) == 2
    assert np.allclose(np.abs(man.normal), [0.0, 1.0], atol=1e-5)
    assert np.allclose(man.separation, [-0.01, -0.01], atol=1e-5)


def test_capsules_perpendicular_one_point():
    man = mf.collide_capsules(
        jnp.array([-0.5, 0.0]), jnp.array([0.5, 0.0]), 0.2, Z2, I2,
        jnp.array([0.0, -0.5]), jnp.array([0.0, 0.5]), 0.2,
        jnp.array([0.0, 0.89]), I2)
    assert int(man.point_count) == 1
    assert np.allclose(man.normal, [0.0, 1.0], atol=1e-4)
    assert np.allclose(man.separation[0], -0.01, atol=1e-4)


def test_capsule_vs_box_via_polygons():
    cap = g.capsule((-0.5, 0.0), (0.5, 0.0), 0.25)
    CV, CN = jnp.array(cap.verts), jnp.array(cap.normals)
    man = mf.collide_polygons(V, N, 4, 0.0, Z2, I2, CV, CN, 2, 0.25,
                              jnp.array([0.0, 0.74]), I2)
    assert int(man.point_count) == 2
    assert np.allclose(man.normal, [0.0, 1.0], atol=1e-5)
    assert np.allclose(man.separation, [-0.01, -0.01], atol=1e-4)


def _ground_chain():
    # wound so right_perp(edge) points up (collision side above)
    return (jnp.array([1.0, 0.0]), jnp.array([-1.0, 0.0]),
            jnp.array([2.0, 0.0]), jnp.array([-2.0, 0.0]))


def test_chain_circle_one_sided():
    p1, p2, g1, g2 = _ground_chain()
    above = mf.collide_chain_segment_circle(p1, p2, g1, g2, Z2, I2, Z2, 0.5,
                                            jnp.array([0.0, 0.49]), I2)
    assert int(above.point_count) == 1
    assert np.allclose(above.normal, [0.0, 1.0], atol=1e-4)
    below = mf.collide_chain_segment_circle(p1, p2, g1, g2, Z2, I2, Z2, 0.5,
                                            jnp.array([0.0, -0.49]), I2)
    assert int(below.point_count) == 0


def test_chain_polygon_resting():
    p1, p2, g1, g2 = _ground_chain()
    man = mf.collide_chain_segment_polygon(p1, p2, g1, g2, Z2, I2, V, N, 4, 0.0,
                                           jnp.array([0.0, 0.49]), I2)
    assert int(man.point_count) == 2
    assert np.allclose(man.normal, [0.0, 1.0], atol=1e-5)
    assert np.allclose(man.separation, [-0.01, -0.01], atol=1e-4)
    below = mf.collide_chain_segment_polygon(p1, p2, g1, g2, Z2, I2, V, N, 4, 0.0,
                                             jnp.array([0.0, -0.6]), I2)
    assert int(below.point_count) == 0


def test_manifolds_vmap():
    offs = jnp.stack([jnp.array([0.0, 0.99]), jnp.array([0.0, 1.25]),
                      jnp.array([0.0, 1.01])])
    f = jax.vmap(lambda o: mf.collide_polygons(V, N, 4, 0.0, Z2, I2,
                                               V, N, 4, 0.0, o, I2).point_count)
    counts = f(offs)
    assert list(np.asarray(counts)) == [2, 0, 2]


def test_collide_polygons_batched_matches_scalar():
    """The lane-major batched poly-poly kernel (used by the narrow phase)
    must reproduce the scalar collide_polygons exactly — every field,
    including zeroed gated-out lanes — on random rounded polygons,
    capsules-as-2-gons, and boxes at random poses."""
    import numpy as np
    from box2d_tpu import geometry as g

    rng = np.random.RandomState(7)
    P = 128
    V = 8

    def rand_geoms(n):
        out = []
        for _ in range(n):
            k = rng.choice([2, 3, 4, 5, 8])
            if k == 2:
                out.append(g.capsule(tuple(rng.uniform(-1, 1, 2)),
                                     tuple(rng.uniform(-1, 1, 2)), 0.1))
            elif k == 4:
                out.append(g.box(rng.uniform(0.2, 1.0),
                                 rng.uniform(0.2, 1.0)))
            else:
                out.append(g.polygon(
                    rng.uniform(-1, 1, (int(k) + 3, 2)).astype(np.float32),
                    radius=float(rng.uniform(0, 0.1))))
        return out

    def pack(lst):
        verts = np.zeros((P, V, 2), np.float32)
        norms = np.zeros((P, V, 2), np.float32)
        cnt = np.zeros(P, np.int32)
        rad = np.zeros(P, np.float32)
        for i, q in enumerate(lst):
            c = int(q.count)
            verts[i, :c] = np.asarray(q.verts)[:c]
            norms[i, :c] = np.asarray(q.normals)[:c]
            cnt[i] = c
            rad[i] = q.radius
        return (jnp.asarray(verts), jnp.asarray(norms), jnp.asarray(cnt),
                jnp.asarray(rad))

    va, na, ca, ra = pack(rand_geoms(P))
    vb, nb, cb, rb = pack(rand_geoms(P))
    ang = rng.uniform(0, 6.28, (2, P)).astype(np.float32)
    p_a = jnp.asarray(rng.uniform(-0.7, 0.7, (P, 2)).astype(np.float32))
    p_b = jnp.asarray(rng.uniform(-0.7, 0.7, (P, 2)).astype(np.float32))
    q_a = jnp.stack([jnp.cos(ang[0]), jnp.sin(ang[0])], axis=1)
    q_b = jnp.stack([jnp.cos(ang[1]), jnp.sin(ang[1])], axis=1)

    ref = jax.vmap(mf.collide_polygons)(va, na, ca, ra, p_a, q_a,
                                        vb, nb, cb, rb, p_b, q_b)
    bat = mf.collide_polygons_batched(va, na, ca, ra, p_a, q_a,
                                      vb, nb, cb, rb, p_b, q_b)
    for name in ref._fields:
        r = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(bat, name))
        if r.dtype.kind == "i":
            assert (r == b).all(), name
        else:
            np.testing.assert_allclose(b, r, atol=2e-5, err_msg=name)
