"""Entity lifecycle: runtime create/destroy with lane reclamation and
generation-checked handles (ref: include/ID.cs:4-50, api/Body.cs:109-164
DestroyBody, src/IDPool.cs free lists)."""

import numpy as np
import pytest

from box2d_tpu import geometry as g
from box2d_tpu import types as t
from box2d_tpu.api import World
from box2d_tpu.state import Capacity


def _ground_world(cap=None):
    w = World(t.WorldDef(enable_sleep=False))
    ground = w.create_body(t.BodyDef(type=t.STATIC, position=(0.0, -0.5)))
    w.create_polygon_shape(ground, t.ShapeDef(), g.box(20.0, 0.5))
    w.compile(cap)
    return w


def _cap(nb=32, ns=32, nj=8):
    return Capacity(max_bodies=nb, max_shapes=ns, max_joints=nj,
                    max_contact_pairs=256, max_verts=4)


def test_create_destroy_10k_within_fixed_capacity():
    """10k bodies created and destroyed through a 32-lane capacity: lanes
    recycle through the free list, generations bump, state stays finite."""
    w = _ground_world(_cap())
    live = []
    created = 0
    rng = np.random.default_rng(0)
    while created < 10_000:
        # fill up to 8 live boxes, then destroy them all
        for _ in range(8):
            b = w.create_body(t.BodyDef(
                type=t.DYNAMIC,
                position=(float(rng.uniform(-3, 3)),
                          float(rng.uniform(1.0, 3.0)))))
            w.create_polygon_shape(b, t.ShapeDef(density=1.0),
                                   g.box(0.2, 0.2))
            live.append(b)
            created += 1
        if created % 1000 == 0:
            w.step()
            assert np.all(np.isfinite(np.asarray(w.state.bodies.center)))
        for b in live:
            w.destroy_body(b)
        live.clear()
    assert created == 10_000
    # every spare lane came back to the free list
    assert len(w._free_bodies) == 32 - 1
    assert len(w._free_shapes) == 32 - 1


def test_stale_handle_raises():
    w = _ground_world(_cap())
    b = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0.0, 2.0)))
    s = w.create_shape(b, t.ShapeDef(density=1.0), g.box(0.2, 0.2))
    w.step()
    w.destroy_body(b)
    with pytest.raises(ValueError, match="stale or invalid body"):
        w.body_position(b)
    with pytest.raises(ValueError, match="stale or invalid body"):
        w.set_linear_velocity(b, (1.0, 0.0))
    with pytest.raises(ValueError, match="stale or invalid shape"):
        w.shape_aabb(s)
    # a new body reusing the lane gets a DIFFERENT handle
    b2 = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(1.0, 2.0)))
    assert b2 != b
    assert (b2 & World._LANE_MASK) == (b & World._LANE_MASK)  # same lane
    w.body_position(b2)  # new handle works
    with pytest.raises(ValueError):
        w.body_position(b)  # old one still stale


def test_runtime_spawn_falls_and_rests():
    w = _ground_world(_cap())
    for _ in range(5):
        w.step()
    b = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0.0, 2.0)))
    w.create_polygon_shape(b, t.ShapeDef(density=1.0), g.box(0.3, 0.3))
    for _ in range(180):
        w.step()
    y = w.body_position(b)[1]
    assert abs(y - 0.3) < 0.03, f"spawned box should rest on ground, y={y}"
    # mass data was recomputed from the runtime shape
    assert w.body_mass(b) == pytest.approx(0.6 * 0.6, rel=1e-5)
    w.destroy_body(b)
    for _ in range(5):
        w.step()
    assert np.all(np.isfinite(np.asarray(w.state.bodies.center)))


def test_runtime_spawn_joint_constrains():
    w = _ground_world(_cap())
    anchor = w.create_body(t.BodyDef(type=t.STATIC, position=(0.0, 4.0)))
    bob = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(1.0, 4.0)))
    w.create_circle_shape(bob, t.ShapeDef(density=1.0), (0.0, 0.0), 0.2)
    j = w.create_joint(t.DistanceJointDef(
        body_a=anchor, body_b=bob, local_anchor_a=(0.0, 0.0),
        local_anchor_b=(0.0, 0.0), length=1.0))
    for _ in range(120):
        w.step()
    d = np.hypot(*(w.body_position(bob) - np.array([0.0, 4.0])))
    assert abs(d - 1.0) < 0.05, f"distance joint not holding: {d}"
    w.destroy_joint(j)
    with pytest.raises(ValueError, match="stale or invalid joint"):
        w.destroy_joint(j)
    for _ in range(60):
        w.step()
    # without the joint the bob free-falls
    assert w.body_position(bob)[1] < 2.0


def test_runtime_chain_creation():
    """A chain created after compile() routes through the lane-spawning
    path, adds the chain pair classes (one-time step re-make), and
    collides one-sided like a builder-time chain."""
    w = World(t.WorldDef(enable_sleep=False))
    far = w.create_body(t.BodyDef(type=t.STATIC))
    w.create_circle_shape(far, t.ShapeDef(), (50.0, 50.0), 0.1)
    w.compile(Capacity(max_bodies=8, max_shapes=16, max_joints=1,
                       max_contact_pairs=64, max_verts=4))
    w.step()
    gb = w.create_body(t.BodyDef(type=t.STATIC, position=(0.0, 0.0)))
    ids = w.create_chain(gb, t.ChainDef(
        points=[(6.0, 0), (4.0, 0), (-4.0, 0), (-6.0, 0)], is_loop=False))
    assert len(ids) == 1  # open chain: n-3 colliding segments
    b = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0.0, 1.5)))
    w.create_circle_shape(b, t.ShapeDef(density=1.0), (0.0, 0.0), 0.25)
    for _ in range(150):
        w.step()
    assert abs(w.body_position(b)[1] - 0.25) < 0.02


def test_destroy_body_destroys_attached_joints():
    w = _ground_world(_cap())
    a = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0.0, 3.0)))
    w.create_circle_shape(a, t.ShapeDef(density=1.0), (0.0, 0.0), 0.2)
    b = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(1.0, 3.0)))
    w.create_circle_shape(b, t.ShapeDef(density=1.0), (0.0, 0.0), 0.2)
    w.create_joint(t.DistanceJointDef(
        body_a=a, body_b=b, local_anchor_a=(0.0, 0.0),
        local_anchor_b=(0.0, 0.0), length=1.0))
    w.step()
    w.destroy_body(a)
    # the joint lane was recycled along with the body
    assert len(w._free_joints) == 8
    for _ in range(10):
        w.step()
    assert np.all(np.isfinite(np.asarray(w.state.bodies.center)))
