import jax.numpy as jnp
import numpy as np

from box2d_tpu import api, geometry as g, queries
from box2d_tpu import types as t


def _scene():
    w = api.World()
    ground = w.create_body(t.BodyDef(type=t.STATIC, position=(0, -0.5)))
    w.create_polygon_shape(ground, t.ShapeDef(), g.box(10, 0.5))
    box = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(3, 1)))
    w.create_polygon_shape(box, t.ShapeDef(), g.box(0.5, 0.5))
    ball = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(-3, 1)))
    w.create_circle_shape(ball, t.ShapeDef(), (0, 0), 0.5)
    w.compile()
    return w


def test_raycast_hits_box():
    w = _scene()
    r = queries.cast_ray_closest(w.state, (3.0, 5.0), (0.0, -10.0))
    assert bool(r.hit)
    assert int(r.shape) == 1  # the box shape
    assert np.allclose(np.asarray(r.point), [3.0, 1.5], atol=1e-3)
    assert np.allclose(np.asarray(r.normal), [0.0, 1.0], atol=1e-3)


def test_raycast_hits_circle():
    w = _scene()
    r = queries.cast_ray_closest(w.state, (-3.0, 5.0), (0.0, -10.0))
    assert bool(r.hit)
    assert int(r.shape) == 2
    assert np.allclose(np.asarray(r.point), [-3.0, 1.5], atol=1e-3)


def test_raycast_closest_of_many():
    w = _scene()
    # horizontal ray through both shapes hits the circle first
    r = queries.cast_ray_closest(w.state, (-8.0, 1.0), (16.0, 0.0))
    assert bool(r.hit) and int(r.shape) == 2
    r2 = queries.cast_ray_closest(w.state, (8.0, 1.0), (-16.0, 0.0))
    assert bool(r2.hit) and int(r2.shape) == 1


def test_raycast_miss():
    w = _scene()
    r = queries.cast_ray_closest(w.state, (0.0, 5.0), (0.0, 2.0))
    assert not bool(r.hit)


def test_overlap_aabb():
    w = _scene()
    mask = queries.overlap_aabb(w.state, (2.0, 0.0, 4.0, 2.0))
    assert bool(mask[1]) and not bool(mask[2])


def test_overlap_shape():
    w = _scene()
    probe = g.circle((0, 0), 1.0)
    mask = queries.overlap_shape(
        w.state, jnp.array(probe.verts), 1, 1.0,
        jnp.array([3.0, 1.0]), jnp.array([1.0, 0.0]))
    assert bool(mask[1]) and not bool(mask[2])


def test_cast_shape():
    w = _scene()
    probe = g.circle((0, 0), 0.3)
    r = queries.cast_shape_closest(
        w.state, jnp.array(probe.verts), 1, 0.3,
        jnp.array([3.0, 5.0]), jnp.array([1.0, 0.0]), (0.0, -10.0))
    assert bool(r.hit) and int(r.shape) == 1
    # circle bottom touches box top at y=1.5 => center at 1.8; started 5.0
    assert abs(float(r.fraction) - (5.0 - 1.8) / 10.0) < 0.01


def test_explosion_pushes_bodies():
    w = _scene()
    s0 = w.state
    s1 = queries.explode(s0, (0.0, 1.0), radius=5.0, impulse_per_length=2.0)
    # both dynamic bodies pushed outward along x
    assert float(s1.bodies.v[1, 0]) > 0.5
    assert float(s1.bodies.v[2, 0]) < -0.5
    # ground static: unchanged
    assert float(s1.bodies.v[0, 0]) == 0.0


def test_mover_planes():
    # one ground plane below: moving down gets clipped to horizontal
    normals = jnp.array([[0.0, 1.0]] + [[0.0, 0.0]] * 7)
    offsets = jnp.array([-0.2] + [0.0] * 7)  # 0.2 deep penetration
    limits = jnp.full(8, 1e8)
    valid = jnp.array([True] + [False] * 7)
    delta, push = queries.solve_planes((0.0, -1.0), normals, offsets, limits, valid)
    assert float(delta[1]) > -0.01  # pushed back out
    v = queries.clip_vector((1.0, -2.0), normals, push,
                            jnp.ones(8, bool), valid)
    assert abs(float(v[1])) < 1e-5 and abs(float(v[0]) - 1.0) < 1e-6


def test_sensor_begin_end_events():
    w = api.World()
    sensor_body = w.create_body(t.BodyDef(type=t.STATIC, position=(0, 1)))
    sd = t.ShapeDef(is_sensor=True, enable_sensor_events=True)
    w.create_polygon_shape(sensor_body, sd, g.box(1.0, 1.0))
    ball = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0, 6),
                                   gravity_scale=1.0))
    bd = t.ShapeDef(enable_sensor_events=True)
    w.create_circle_shape(ball, bd, (0, 0), 0.3)
    w.compile()
    begins = ends = 0
    for _ in range(180):
        w.step(1 / 60)
        begins += int(w.state.events.sensor_begin_count)
        ends += int(w.state.events.sensor_end_count)
    # ball falls through the sensor: one begin, one end
    assert begins == 1, f"begins={begins}"
    assert ends == 1, f"ends={ends}"


def test_cast_mover_stops_at_wall():
    """CastMover (ref: api/World.cs:568-626): a capsule mover casting into a
    wall returns the clipped fraction."""
    w = api.World()
    g_ = w.create_body(t.BodyDef(type=t.STATIC, position=(0.0, -0.5)))
    w.create_polygon_shape(g_, t.ShapeDef(), g.box(10.0, 0.5))
    wall = w.create_body(t.BodyDef(type=t.STATIC, position=(2.0, 1.0)))
    w.create_polygon_shape(wall, t.ShapeDef(), g.box(0.25, 1.0))
    w.compile()
    frac = w.cast_mover((0.0, 0.5), (0.0, 1.0), 0.3, (4.0, 0.0))
    # wall face at x=1.75, capsule radius 0.3 -> stop near x=1.45
    assert 0.30 < frac < 0.42, frac
    # casting away from the wall is free
    assert w.cast_mover((0.0, 0.5), (0.0, 1.0), 0.3, (-1.0, 0.0)) == 1.0


def test_cast_mover_encroached_can_slide():
    """canEncroach: a mover resting in light contact with the ground can
    still slide horizontally (fraction 1), instead of reporting 0."""
    w = api.World()
    g_ = w.create_body(t.BodyDef(type=t.STATIC, position=(0.0, -0.5)))
    w.create_polygon_shape(g_, t.ShapeDef(), g.box(10.0, 0.5))
    w.compile()
    # capsule bottom exactly on the ground surface
    frac = w.cast_mover((0.0, 0.3), (0.0, 1.0), 0.3, (2.0, 0.0))
    assert frac > 0.9, frac


def test_cast_ray_all_returns_sorted_hits():
    """All-hits ray cast (ref: api/World.cs:442-465): three circles along
    the ray come back fraction-ascending."""
    w = api.World()
    for x in (2.0, 4.0, 6.0):
        b = w.create_body(t.BodyDef(type=t.STATIC, position=(x, 0.0)))
        w.create_circle_shape(b, t.ShapeDef(), (0.0, 0.0), 0.5)
    w.compile()
    r = w.cast_ray_all((0.0, 0.0), (10.0, 0.0))
    assert len(r["fraction"]) == 3
    assert np.all(np.diff(r["fraction"]) > 0)
    np.testing.assert_allclose(r["point"][:, 0], [1.5, 3.5, 5.5], atol=1e-3)
    # max_hits truncates
    r2 = w.cast_ray_all((0.0, 0.0), (10.0, 0.0), max_hits=2)
    assert len(r2["fraction"]) == 2


def test_point_queries():
    """TestPoint / OverlapPoint (ref: include/Geometry.cs PointIn*)."""
    w = api.World()
    b = w.create_body(t.BodyDef(type=t.STATIC, position=(1.0, 2.0)))
    s_box = w.create_polygon_shape(b, t.ShapeDef(), g.box(0.5, 0.5))
    c = w.create_body(t.BodyDef(type=t.STATIC, position=(5.0, 0.0)))
    s_circ = w.create_circle_shape(c, t.ShapeDef(), (0.0, 0.0), 0.4)
    w.compile()
    assert w.test_point(s_box, (1.2, 2.2))
    assert not w.test_point(s_box, (1.8, 2.0))
    assert w.test_point(s_circ, (5.3, 0.0))
    assert not w.test_point(s_circ, (5.5, 0.0))
    mask = w.overlap_point((1.0, 2.0))
    assert mask[s_box] and not mask[s_circ]


def test_shape_aabb_getter():
    w = api.World()
    b = w.create_body(t.BodyDef(type=t.STATIC, position=(3.0, 1.0)))
    s = w.create_polygon_shape(b, t.ShapeDef(), g.box(0.5, 0.25))
    w.compile()
    lo_x, lo_y, hi_x, hi_y = w.shape_aabb(s)
    assert lo_x <= 2.5 + 1e-3 and hi_x >= 3.5 - 1e-3
    assert lo_y <= 0.75 + 1e-3 and hi_y >= 1.25 - 1e-3


def test_contact_data_readout():
    """ContactAPI.GetData analog (ref: api/Contact.cs:20-33): manifolds of
    touching pairs on current poses."""
    w = api.World()
    g_ = w.create_body(t.BodyDef(type=t.STATIC, position=(0.0, -0.5)))
    w.create_polygon_shape(g_, t.ShapeDef(), g.box(10.0, 0.5))
    bx = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0.0, 0.5)))
    w.create_polygon_shape(bx, t.ShapeDef(), g.box(0.5, 0.5))
    w.compile()
    for _ in range(30):
        w.step(1 / 60)
    d = w.contact_data()
    assert len(d["shape_a"]) >= 1
    # resting box-on-ground: upward normal, ~zero separation, 2 points
    i = 0
    assert abs(abs(d["normal"][i, 1]) - 1.0) < 1e-3
    assert d["point_count"][i] == 2
    assert np.all(d["separation"][i] < 1e-2)
    assert np.any(d["normal_impulse"][i] > 0)


def test_events_dropped_counter():
    """Events beyond event_capacity are COUNTED, not silently clamped."""
    from box2d_tpu.state import Capacity

    w = api.World()
    ev = t.ShapeDef(enable_contact_events=True)
    g_ = w.create_body(t.BodyDef(type=t.STATIC, position=(0.0, -0.5)))
    w.create_polygon_shape(g_, ev, g.box(50.0, 0.5))
    for i in range(8):
        b = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(i * 1.5, 0.55)))
        w.create_polygon_shape(b, ev, g.box(0.5, 0.5))
    cap = Capacity(max_bodies=16, max_shapes=16, max_joints=1,
                   max_contact_pairs=64, event_capacity=2)
    w.compile(cap)
    dropped = 0
    for _ in range(30):
        w.step(1 / 60)
        dropped += int(w.state.profile.events_dropped)
    # 8 boxes dropped 0.05 onto the ground -> >2 begin events in one step
    assert dropped > 0
    assert int(w.counters()["events_dropped"]) >= 0
