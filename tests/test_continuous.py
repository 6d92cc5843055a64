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


def _np_sweep_xf(lc, c1, c2, q1, q2, tt):
    """Scalar GetSweepTransform (ref src/Distance.cs:8-18)."""
    p = (1.0 - tt) * c1 + tt * c2
    q = (1.0 - tt) * q1 + tt * q2
    q = q / np.hypot(q[0], q[1])
    rot = np.array([[q[0], -q[1]], [q[1], q[0]]], np.float64)
    return p - rot @ lc, rot


def _np_poly_distance(va, vb):
    """Independent convex polygon distance (0 when overlapping): min
    vertex-edge distance across both polygons, with an SAT overlap test."""
    def sat_separated(a, b):
        for poly in (a, b):
            n_ = len(poly)
            for i in range(n_):
                e = poly[(i + 1) % n_] - poly[i]
                ax = np.array([e[1], -e[0]])
                ax = ax / np.linalg.norm(ax)
                if (b @ ax).min() >= (a @ ax).max() - 1e-12 or \
                   (a @ ax).min() >= (b @ ax).max() - 1e-12:
                    return True
        return False

    def vert_edge(verts, poly):
        best = np.inf
        n_ = len(poly)
        for p in verts:
            for i in range(n_):
                a, b = poly[i], poly[(i + 1) % n_]
                e = b - a
                tt = np.clip((p - a) @ e / max(e @ e, 1e-30), 0.0, 1.0)
                best = min(best, np.linalg.norm(p - (a + tt * e)))
        return best

    if not sat_separated(va, vb):
        return 0.0
    return min(vert_edge(va, vb), vert_edge(vb, va))


def test_toi_vs_dense_scan_oracle():
    """Engine conservative-advancement TOI (ref src/Distance.cs:529-645)
    vs an INDEPENDENT dense time-scan ground truth: scan t in [0,1] at 4000
    samples with a from-scratch NumPy polygon distance; the first t where
    distance <= target must match the engine's hit fraction, and the engine
    must never miss a crossing (the bullet-vs-thin-wall anchor)."""
    from box2d_tpu.constants import LINEAR_SLOP

    rng = np.random.RandomState(7)
    box_a = np.array([[-0.1, -0.1], [0.1, -0.1], [0.1, 0.1], [-0.1, 0.1]])
    wall = np.array([[-0.02, -1.0], [0.02, -1.0], [0.02, 1.0], [-0.02, 1.0]])
    misses = hits = 0
    for k in range(40):
        # fast box flying toward (or past) a thin wall, with spin
        x0 = -3.0 + rng.uniform(-0.5, 0.5)
        y0 = rng.uniform(-1.6, 1.6)
        vx = rng.uniform(3.0, 8.0)
        vy = rng.uniform(-1.0, 1.0)
        ang = rng.uniform(0, 1.0)
        c1 = np.array([x0, y0])
        c2 = c1 + np.array([vx, vy])
        q1 = np.array([1.0, 0.0])
        a2 = rng.uniform(-0.6, 0.6)
        q2 = np.array([np.cos(a2), np.sin(a2)])
        lc = np.zeros(2)

        sweep_a = Sweep(jnp.zeros(2), jnp.asarray(c1, jnp.float32),
                        jnp.asarray(c2, jnp.float32),
                        jnp.asarray(q1, jnp.float32),
                        jnp.asarray(q2, jnp.float32))
        sweep_w = Sweep(jnp.zeros(2), jnp.zeros(2), jnp.zeros(2),
                        jnp.array([1.0, 0.0]), jnp.array([1.0, 0.0]))
        pad = lambda v: jnp.asarray(
            np.vstack([v, np.repeat(v[-1:], 8 - len(v), 0)]), jnp.float32)
        out = time_of_impact(pad(wall), 4, jnp.float32(0.0), sweep_w,
                             pad(box_a), 4, jnp.float32(0.0), sweep_a,
                             jnp.float32(1.0))
        target = max(LINEAR_SLOP, 0.0 - LINEAR_SLOP)

        # dense scan ground truth
        ts = np.linspace(0.0, 1.0, 4001)
        first = None
        for tt in ts:
            p, rot = _np_sweep_xf(lc, c1, c2, q1, q2, tt)
            va = (box_a @ rot.T) + p
            dist = _np_poly_distance(va, wall)
            if dist <= target:
                first = tt
                break
        state = int(out.state)
        frac = float(out.fraction)
        if first is None:
            # no crossing: engine must not report a hit before 1.0
            assert state != TOI_HIT or frac >= 0.999, (k, state, frac)
            misses += 1
        else:
            assert state in (TOI_HIT, TOI_OVERLAPPED), (k, state, first)
            hits += 1
            # conservative advancement stops at distance ~= target: its
            # fraction is <= the scan's crossing time, within tolerance
            assert frac <= first + 1e-3, (k, frac, first)
            assert frac >= first - 0.02, (k, frac, first)
    assert hits >= 10 and misses >= 3, (hits, misses)
