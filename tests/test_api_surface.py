"""Accessor-surface parity tests (ref: api/Body.cs, api/Shape.cs,
api/Joint.cs; the full function-by-function mapping is the README
"Reference API parity" table)."""

import numpy as np

from box2d_tpu import api, geometry as g, types as t


def _scene():
    w = api.World()
    ground = w.create_body(t.BodyDef(type=t.STATIC, position=(0.0, -0.5)))
    gs = w.create_polygon_shape(ground, t.ShapeDef(), g.box(5.0, 0.5))
    b = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0.0, 1.0)))
    s1 = w.create_polygon_shape(b, t.ShapeDef(density=1.0), g.box(0.3, 0.3))
    s2 = w.create_circle_shape(b, t.ShapeDef(density=1.0), (0.5, 0.0), 0.2)
    b2 = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(1.0, 1.0)))
    w.create_polygon_shape(b2, t.ShapeDef(density=1.0), g.box(0.2, 0.2))
    j = w.create_joint(t.RevoluteJointDef(body_a=b, body_b=b2,
                                          local_anchor_a=(0.5, 0.0),
                                          local_anchor_b=(-0.5, 0.0)))
    w.compile()
    return w, ground, gs, b, s1, s2, b2, j


def test_body_enumeration_and_mass():
    w, ground, gs, b, s1, s2, b2, j = _scene()
    assert sorted(w.body_shapes(b)) == sorted([s1, s2])
    assert w.body_joints(b) == [j] and w.body_joints(b2) == [j]
    assert w.shape_body(s1) == b
    md = w.body_mass_data(b)
    assert md[0] > 0
    w.set_mass_data(b, 2.0, (0.1, 0.0), 0.5)
    assert abs(w.body_mass_data(b)[0] - 2.0) < 1e-6
    w.apply_mass_from_shapes(b)
    assert abs(w.body_mass_data(b)[0] - md[0]) < 1e-5
    w.set_body_motion_locks(b, lock_rotation=True)
    assert w.body_motion_locks(b) == (False, False, True)
    w.set_bullet(b, True) or w.is_bullet(b)
    w.set_body_user_data(b, 42)
    assert w.body_user_data(b) == 42
    aabb = w.body_compute_aabb(b)
    assert aabb[2] > aabb[0] and aabb[3] > aabb[1]
    v = w.world_point_velocity(b, w.body_position(b))
    assert np.allclose(v, w.body_linear_velocity(b))


def test_shape_material_and_queries():
    w, ground, gs, b, s1, s2, b2, j = _scene()
    w.set_friction(s1, 0.9)
    assert abs(w.shape_friction(s1) - 0.9) < 1e-6
    w.set_restitution(s1, 0.4)
    assert abs(w.shape_restitution(s1) - 0.4) < 1e-6
    w.set_surface_material(s2, rolling_resistance=0.1, user_material=7)
    sm = w.shape_surface_material(s2)
    assert abs(sm["rolling_resistance"] - 0.1) < 1e-6
    assert sm["user_material"] == 7
    w.enable_shape_contact_events(s1, True)
    assert w.shape_filter(s1).category_bits == 1
    hit, frac, pt, nrm = w.shape_ray_cast(gs, (0.0, 2.0), (0.0, -3.0))
    assert hit and abs(pt[1]) < 1e-4 and nrm[1] > 0.9
    cp = w.shape_closest_point(gs, (0.3, 1.0))
    assert abs(cp[1]) < 1e-4 and abs(cp[0] - 0.3) < 1e-4
    # material setters feed the solver tables: a frictionless box slides
    # farther than a grippy one
    def slide(mu):
        ww = api.World()
        gnd = ww.create_body(t.BodyDef(type=t.STATIC, position=(0.0, -0.5)))
        ws = ww.create_polygon_shape(gnd, t.ShapeDef(), g.box(20.0, 0.5))
        bb = ww.create_body(t.BodyDef(type=t.DYNAMIC, position=(0.0, 0.55),
                                      linear_velocity=(4.0, 0.0)))
        ww.create_polygon_shape(bb, t.ShapeDef(density=1.0), g.box(0.3, 0.3))
        ww.compile()
        ww.set_friction(ws, mu)
        for _ in range(120):
            ww.step(1 / 60)
        return float(np.asarray(ww.state.bodies.center)[bb, 0])

    assert slide(0.05) > slide(0.9) + 0.5


def test_typed_joint_getters():
    w, ground, gs, b, s1, s2, b2, j = _scene()
    assert abs(w.revolute_joint_angle(j)) < 1e-5
    assert w.joint_linear_separation(j) < 1e-4
    assert abs(w.joint_angular_separation(j)) < 1e-5
    pa, qa, pb, qb = w.joint_local_frames(j)
    assert np.allclose(pa, [0.5, 0.0])
    a, bb_ = w.joint_bodies(j)
    assert (a, bb_) == (b, b2)
    w.set_joint_user_data(j, 9)
    assert w.joint_user_data(j) == 9

    # distance joint current length
    w2 = api.World()
    anchor = w2.create_body(t.BodyDef(type=t.STATIC, position=(0.0, 5.0)))
    bob = w2.create_body(t.BodyDef(type=t.DYNAMIC, position=(0.0, 3.5)))
    w2.create_circle_shape(bob, t.ShapeDef(density=1.0), (0.0, 0.0), 0.2)
    dj = w2.create_joint(t.DistanceJointDef(
        body_a=anchor, body_b=bob, local_anchor_a=(0.0, 0.0),
        local_anchor_b=(0.0, 0.0), length=1.5))
    w2.compile()
    assert abs(w2.distance_joint_current_length(dj) - 1.5) < 1e-5

    # prismatic translation
    w3 = api.World()
    rail = w3.create_body(t.BodyDef(type=t.STATIC, position=(0.0, 4.0)))
    blk = w3.create_body(t.BodyDef(type=t.DYNAMIC, position=(0.0, 3.4)))
    w3.create_polygon_shape(blk, t.ShapeDef(density=1.0), g.box(0.2, 0.2))
    pj = w3.create_joint(t.PrismaticJointDef(
        body_a=rail, body_b=blk, local_anchor_a=(0.0, 0.0),
        local_anchor_b=(0.0, 0.0), local_axis_a=(0.0, 1.0)))
    w3.compile()
    assert abs(w3.prismatic_joint_translation(pj) - (-0.6)) < 1e-5
