import numpy as np

from box2d_tpu import geometry as g


def test_box_mass():
    # unit box, density 1 => mass 1, I = (w^2+h^2)/12 = 1/6 about center
    md = g.compute_mass(g.box(0.5, 0.5), 1.0)
    assert np.allclose(md.mass, 1.0, rtol=1e-6)
    assert np.allclose(md.rotational_inertia, 1.0 / 6.0, rtol=1e-5)
    assert np.allclose(md.center, [0, 0], atol=1e-6)


def test_circle_mass():
    md = g.compute_mass(g.circle((1.0, 2.0), 0.5), 2.0)
    assert np.allclose(md.mass, 2.0 * np.pi * 0.25, rtol=1e-6)
    assert np.allclose(md.center, [1.0, 2.0])
    assert np.allclose(md.rotational_inertia, md.mass * 0.5 * 0.25, rtol=1e-6)


def test_capsule_mass():
    # upstream-correct: circle + 2r*length rectangle
    md = g.compute_mass(g.capsule((-0.5, 0), (0.5, 0), 0.25), 1.0)
    assert np.allclose(md.mass, np.pi * 0.0625 + 2 * 0.25 * 1.0, rtol=1e-5)


def test_hull_collinear_and_order():
    pts = [(0, 0), (1, 0), (2, 0), (2, 2), (0, 2), (1, 1)]  # collinear + interior
    hull = g.compute_hull(pts)
    assert len(hull) == 4
    # CCW: positive signed area
    area = 0.0
    for i in range(len(hull)):
        a, b = hull[i], hull[(i + 1) % len(hull)]
        area += a[0] * b[1] - b[0] * a[1]
    assert area > 0


def test_polygon_normals_outward():
    geom = g.polygon([(0, 0), (2, 0), (2, 1), (0, 1)])
    c = geom.centroid
    for i in range(geom.count):
        # normal points away from centroid
        assert (geom.verts[i] - c) @ geom.normals[i] > 0


def test_box_offset_rotation():
    geom = g.box(1.0, 0.5, center=(2.0, 0.0), angle=np.pi / 2)
    assert np.allclose(geom.centroid, [2.0, 0.0], atol=1e-6)
    # rotated box has extents swapped around its center
    v = geom.verts[: geom.count] - geom.centroid
    assert np.allclose(np.abs(v).max(axis=0), [0.5, 1.0], atol=1e-6)
