import jax.numpy as jnp
import numpy as np

from box2d_tpu import api, geometry as g, math2d as m
from box2d_tpu import types as t
from box2d_tpu.distance import Sweep, time_of_impact, TOI_HIT, TOI_OVERLAPPED, TOI_SEPARATED


def test_toi_point_vs_box():
    bx = g.box(0.5, 0.5)
    V = jnp.array(bx.verts)
    I2 = m.rot_identity()
    static = Sweep(jnp.zeros(2), jnp.zeros(2), jnp.zeros(2), I2, I2)
    P = jnp.tile(jnp.array([[0.0, 0.0]]), (8, 1))
    bullet = Sweep(jnp.zeros(2), jnp.array([-5.0, 0.0]), jnp.array([5.0, 0.0]), I2, I2)
    out = time_of_impact(V, 4, 0.0, static, P, 1, 0.1, bullet, 1.0)
    assert int(out.state) == TOI_HIT
    assert abs(float(out.fraction) - 0.4405) < 0.002

    miss = Sweep(jnp.zeros(2), jnp.array([-5.0, 2.0]), jnp.array([5.0, 2.0]), I2, I2)
    out2 = time_of_impact(V, 4, 0.0, static, P, 1, 0.1, miss, 1.0)
    assert int(out2.state) == TOI_SEPARATED

    overlap = Sweep(jnp.zeros(2), jnp.zeros(2), jnp.array([5.0, 0.0]), I2, I2)
    out3 = time_of_impact(V, 4, 0.0, static, P, 1, 0.1, overlap, 1.0)
    assert int(out3.state) == TOI_OVERLAPPED


def test_bullet_does_not_tunnel_thin_wall():
    w = api.World()
    wall = w.create_body(t.BodyDef(type=t.STATIC, position=(10, 0)))
    w.create_polygon_shape(wall, t.ShapeDef(), g.box(0.05, 5.0))
    b = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0, 0),
                                linear_velocity=(200.0, 0.0), is_bullet=True,
                                gravity_scale=0.0))
    w.create_circle_shape(b, t.ShapeDef(density=5.0), (0, 0), 0.1)
    w.compile()
    for _ in range(30):
        w.step(1 / 60)
    assert w.body_position(b)[0] < 10.0


def test_fast_body_does_not_tunnel_ground():
    w = api.World()
    ground = w.create_body(t.BodyDef(type=t.STATIC, position=(0, -0.05)))
    w.create_polygon_shape(ground, t.ShapeDef(), g.box(50.0, 0.05))
    bx = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0, 10),
                                 linear_velocity=(0, -100.0)))
    w.create_polygon_shape(bx, t.ShapeDef(), g.box(0.2, 0.2))
    w.compile()
    for _ in range(60):
        w.step(1 / 60)
    assert w.body_position(bx)[1] > 0.0


def test_bullet_vs_dynamic_target():
    w = api.World()
    target = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(10, 0),
                                     gravity_scale=0.0))
    w.create_polygon_shape(target, t.ShapeDef(density=1.0), g.box(0.05, 2.0))
    b = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0, 0),
                                linear_velocity=(150.0, 0.0), is_bullet=True,
                                gravity_scale=0.0))
    w.create_circle_shape(b, t.ShapeDef(density=5.0), (0, 0), 0.1)
    w.compile()
    for _ in range(30):
        w.step(1 / 60)
    # bullet transfers momentum to the thin plate instead of passing through
    assert w.body_linear_velocity(target)[0] > 1.0
    assert w.body_position(b)[0] < w.body_position(target)[0] + 1.0


def test_bullet_barrage_scene():
    from box2d_tpu import scenes

    w = scenes.bullet_barrage(bullets=8).compile()
    for _ in range(60):
        w.step(1 / 60)
    assert bool(np.isfinite(np.asarray(w.state.bodies.center)).all())
    # no bullet beyond the last wall (x = 50 + margin)
    dyn = np.asarray(w.state.bodies.type) == t.DYNAMIC
    assert np.asarray(w.state.bodies.center)[dyn, 0].max() < 51.0
