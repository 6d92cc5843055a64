import numpy as np

from box2d_tpu import api, geometry as g, scenes
from box2d_tpu import types as t
from box2d_tpu.particles import P_SPRING, P_VISCOUS, P_WALL, G_RIGID


def test_dam_break_settles_in_tank():
    w = scenes.dam_break(particles_target=300, radius=0.1).compile()
    for _ in range(240):
        w.step(1 / 60)
    pt = w.state.particles
    alive = np.asarray(pt.alive)
    pos = np.asarray(pt.pos)[alive]
    assert np.isfinite(pos).all()
    assert pos[:, 1].min() > -0.1      # no floor leak
    assert pos[:, 0].min() > -4.3      # no wall leak
    assert pos[:, 0].max() < 4.3
    assert pos[:, 1].max() < 2.5       # column collapsed


def test_particles_push_floating_box():
    # two-way coupling: fluid column collapses onto a light box, moves it
    w = api.World()
    tank = w.create_body(t.BodyDef(type=t.STATIC))
    w.create_polygon_shape(tank, t.ShapeDef(), g.box(6.0, 0.25, center=(0, -0.25)))
    box = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(1.5, 0.2)))
    w.create_polygon_shape(box, t.ShapeDef(density=0.2), g.box(0.2, 0.2))
    ps = w.create_particle_system(radius=0.08)
    ps.create_group_box(center=(-1.0, 1.0), half_w=0.8, half_h=1.0)
    w.compile()
    for _ in range(180):
        w.step(1 / 60)
    assert w.body_position(box)[0] > 1.6  # pushed along +x by the wave
    assert np.isfinite(np.asarray(w.state.bodies.center)).all()


def test_viscous_flag_damps_relative_motion():
    w = api.World()
    floor = w.create_body(t.BodyDef(type=t.STATIC))
    w.create_polygon_shape(floor, t.ShapeDef(), g.box(10.0, 0.25, center=(0, -0.25)))
    ps = w.create_particle_system(radius=0.1)
    ps.create_group_box(center=(0.0, 0.6), half_w=0.6, half_h=0.6,
                        flags=P_VISCOUS)
    w.compile()
    for _ in range(120):
        w.step(1 / 60)
    pos = np.asarray(w.state.particles.pos)
    assert np.isfinite(pos).all()


def test_wall_particles_do_not_move():
    w = api.World()
    ps = w.create_particle_system(radius=0.1)
    ps.create_group_box(center=(0.0, 1.0), half_w=0.3, half_h=0.3,
                        flags=P_WALL)
    w.compile()
    p0 = np.asarray(w.state.particles.pos).copy()
    for _ in range(60):
        w.step(1 / 60)
    np.testing.assert_allclose(np.asarray(w.state.particles.pos), p0, atol=1e-6)


def test_rigid_group_moves_rigidly():
    w = api.World()
    floor = w.create_body(t.BodyDef(type=t.STATIC))
    w.create_polygon_shape(floor, t.ShapeDef(), g.box(10.0, 0.25, center=(0, -0.25)))
    ps = w.create_particle_system(radius=0.1)
    ps.create_group_box(center=(0.0, 2.0), half_w=0.4, half_h=0.4,
                        group_flags=G_RIGID)
    w.compile()
    pt0 = np.asarray(w.state.particles.pos).copy()
    alive = np.asarray(w.state.particles.alive)
    d0 = np.linalg.norm(pt0[alive][0] - pt0[alive][-1])
    for _ in range(120):
        w.step(1 / 60)
    pt1 = np.asarray(w.state.particles.pos)
    d1 = np.linalg.norm(pt1[alive][0] - pt1[alive][-1])
    # internal distances preserved (rigid), but the group fell
    assert abs(d1 - d0) < 0.05
    assert pt1[alive][:, 1].mean() < pt0[alive][:, 1].mean() - 0.5


def test_spring_group_holds_shape():
    w = api.World()
    floor = w.create_body(t.BodyDef(type=t.STATIC))
    w.create_polygon_shape(floor, t.ShapeDef(), g.box(10.0, 0.25, center=(0, -0.25)))
    ps = w.create_particle_system(radius=0.1)
    ps.create_group_box(center=(0.0, 1.0), half_w=0.3, half_h=0.3,
                        flags=P_SPRING)
    w.compile()
    for _ in range(180):
        w.step(1 / 60)
    pos = np.asarray(w.state.particles.pos)[np.asarray(w.state.particles.alive)]
    assert np.isfinite(pos).all()
    # springs keep the blob coherent: extent stays near original 0.6
    ext = pos.max(axis=0) - pos.min(axis=0)
    assert ext[0] < 1.2 and ext[1] < 1.2


def test_join_particle_groups_creates_seam_springs():
    w = api.World()
    floor = w.create_body(t.BodyDef(type=t.STATIC))
    w.create_polygon_shape(floor, t.ShapeDef(),
                           g.box(10.0, 0.25, center=(0, -0.25)))
    ps = w.create_particle_system(radius=0.1)
    ga = ps.create_group_box(center=(-0.31, 1.0), half_w=0.3, half_h=0.3,
                             flags=P_SPRING)
    gb = ps.create_group_box(center=(0.31, 1.0), half_w=0.3, half_h=0.3,
                             flags=P_SPRING)
    w.compile()
    w.step(1 / 60)
    pt = w.state.particles
    pairs_before = pt.pair_a.shape[0]
    w.join_particle_groups(ga, gb)
    pt = w.state.particles
    # merged membership + seam springs added
    assert int(np.sum(np.asarray(pt.group) == gb)) == 0
    assert pt.pair_a.shape[0] > pairs_before
    for _ in range(60):  # retraces once, then runs
        w.step(1 / 60)
    pos = np.asarray(w.state.particles.pos)[np.asarray(w.state.particles.alive)]
    assert np.isfinite(pos).all()
    # the joined blob stays one coherent piece
    ext = pos.max(axis=0) - pos.min(axis=0)
    assert ext[0] < 2.0 and ext[1] < 1.2


def test_split_particle_group_labels_components():
    w = api.World()
    floor = w.create_body(t.BodyDef(type=t.STATIC))
    w.create_polygon_shape(floor, t.ShapeDef(),
                           g.box(10.0, 0.25, center=(0, -0.25)))
    ps = w.create_particle_system(radius=0.1)
    gid = ps.create_group_box(center=(0.0, 1.0), half_w=0.7, half_h=0.2)
    w.compile()
    # carve the blob in two with a region destroy, then split
    w.destroy_particles_in_aabb((-0.12, 0.0), (0.12, 2.0))
    gids = w.split_particle_group(gid)
    assert len(gids) == 2
    pt = w.state.particles
    grp = np.asarray(pt.group)[np.asarray(pt.alive)]
    xs = np.asarray(pt.pos)[np.asarray(pt.alive)][:, 0]
    # left and right halves carry different group ids
    assert len(set(grp[xs < -0.15])) == 1
    assert len(set(grp[xs > 0.15])) == 1
    assert set(grp[xs < -0.15]) != set(grp[xs > 0.15])
    for _ in range(30):
        w.step(1 / 60)
    assert np.isfinite(np.asarray(w.state.particles.pos)).all()


def test_destroyed_particle_severs_springs():
    w = api.World()
    floor = w.create_body(t.BodyDef(type=t.STATIC))
    w.create_polygon_shape(floor, t.ShapeDef(),
                           g.box(10.0, 0.25, center=(0, -0.25)))
    ps = w.create_particle_system(radius=0.1)
    ps.create_group_box(center=(0.0, 0.4), half_w=0.3, half_h=0.3,
                        flags=P_SPRING)
    w.compile()
    w.step(1 / 60)
    # kill the left half; survivors must not be yanked toward dead lanes
    w.destroy_particles_in_aabb((-1.0, 0.0), (0.0, 2.0))
    for _ in range(120):
        w.step(1 / 60)
    pt = w.state.particles
    alive = np.asarray(pt.alive)
    pos = np.asarray(pt.pos)[alive]
    vel = np.asarray(pt.vel)[alive]
    assert np.isfinite(pos).all()
    assert np.abs(vel).max() < 5.0  # no spring explosion from dead anchors


def test_stuck_particle_detection_in_narrow_slot():
    w = api.World()
    ground = w.create_body(t.BodyDef(type=t.STATIC))
    w.create_polygon_shape(ground, t.ShapeDef(),
                           g.box(2.0, 0.25, center=(0, -0.25)))
    # slot walls 0.18 apart: a radius-0.1 particle inside touches BOTH
    w.create_polygon_shape(ground, t.ShapeDef(),
                           g.box(0.25, 1.0, center=(-0.34, 1.0)))
    w.create_polygon_shape(ground, t.ShapeDef(),
                           g.box(0.25, 1.0, center=(0.34, 1.0)))
    ps = w.create_particle_system(radius=0.1)
    ps.create_group_box(center=(0.0, 1.2), half_w=0.04, half_h=0.25)
    # a free particle far from the slot: only ever 1 contact (the floor)
    free_idx = ps.create_particle((1.5, 0.05))
    w.compile()
    for _ in range(90):
        w.step(1 / 60)
    stuck = w.stuck_particles(threshold=10)
    # the wedged column reports as stuck; the free particle never does
    assert len(stuck) > 0
    assert free_idx not in set(stuck)
    pos = np.asarray(w.state.particles.pos)
    assert (np.abs(pos[stuck, 0]) < 0.1).all()


def test_barrier_line_blocks_falling_particles():
    from box2d_tpu.particles import P_BARRIER
    w = api.World()
    ground = w.create_body(t.BodyDef(type=t.STATIC))
    w.create_polygon_shape(ground, t.ShapeDef(),
                           g.box(3.0, 0.25, center=(0, -0.25)))
    # side walls so the liquid can't spill around the barrier's ends
    w.create_polygon_shape(ground, t.ShapeDef(),
                           g.box(0.25, 2.0, center=(-1.25, 1.5)))
    w.create_polygon_shape(ground, t.ShapeDef(),
                           g.box(0.25, 2.0, center=(1.25, 1.5)))
    ps = w.create_particle_system(radius=0.05)
    # one-particle-thin barrier line at y=1 (wall -> static segments)
    ps.create_group_box(center=(0.0, 1.0), half_w=1.1, half_h=0.05,
                        flags=P_BARRIER | P_WALL)
    # water column dropped from above
    ps.create_group_box(center=(0.0, 1.6), half_w=0.4, half_h=0.4)
    w.compile()
    for _ in range(180):
        w.step(1 / 60)
    pt = w.state.particles
    alive = np.asarray(pt.alive)
    flags = np.asarray(pt.flags)
    pos = np.asarray(pt.pos)
    water = alive & ((flags & P_BARRIER) == 0)
    assert np.isfinite(pos[water]).all()
    # nothing tunnels through the barrier line (the water column rests on
    # a ONE-PARTICLE-thin shelf; without the barrier pass it pours through)
    assert pos[water, 1].min() > 0.9


def test_particle_queries_and_byte_count():
    w = api.World()
    floor = w.create_body(t.BodyDef(type=t.STATIC))
    w.create_polygon_shape(floor, t.ShapeDef(),
                           g.box(10.0, 0.25, center=(0, -0.25)))
    ps = w.create_particle_system(radius=0.1)
    ps.create_group_box(center=(0.0, 1.0), half_w=0.5, half_h=0.5)
    w.compile()
    w.step(1 / 60)
    hits = w.overlap_particles((-0.2, 0.4), (0.2, 1.6))
    assert len(hits) > 0
    pos = np.asarray(w.state.particles.pos)
    assert (np.abs(pos[hits, 0]) <= 0.2 + 1e-6).all()
    # ray from the left hits the blob's left edge
    i, frac, point, normal = w.cast_ray_particles((-3.0, 1.0), (6.0, 0.0))
    assert i >= 0 and 0.0 < frac < 1.0
    assert point[0] < 0.0        # left half
    assert normal[0] < 0.0       # surface normal faces the ray
    # ray that misses everything
    i2, frac2, _, _ = w.cast_ray_particles((-3.0, 5.0), (6.0, 0.0))
    assert i2 == -1 and frac2 == 1.0
    assert w.byte_count() > 10000


def test_solid_group_depth_and_ejection():
    """ComputeDepth (ref :1002-1062): a solid group gets a nonzero interior
    depth field, and SolveSolid (ref :2200) ejects a foreign particle that
    overlaps the group."""
    from box2d_tpu.particles import G_SOLID

    w = api.World(t.WorldDef(gravity=(0.0, 0.0)))
    ps = w.create_particle_system(radius=0.1)
    ps.create_group_box(center=(0.0, 1.0), half_w=0.5, half_h=0.5,
                        group_flags=G_SOLID)
    # an intruder particle of a different group inside the solid block
    ps.create_particle(position=(0.0, 1.0), group=-1)
    w.compile()
    w.step(1 / 60)
    pt = w.state.particles
    depth = np.asarray(pt.depth)
    group = np.asarray(pt.group)
    assert depth[group == 0].max() > 0.0, "solid group depth stayed zero"
    for _ in range(30):
        w.step(1 / 60)
    pt = w.state.particles
    intruder = np.where(np.asarray(pt.group) < 0)[0][-1]
    v = np.asarray(pt.vel)[intruder]
    p = np.asarray(pt.pos)[intruder]
    # the ejection force must have pushed the intruder off dead center
    assert np.hypot(*v) > 1e-3 or np.hypot(p[0], p[1] - 1.0) > 0.05, (
        "intruder was not ejected from the solid group")


def test_rigid_damping_on_body_contact():
    """SolveRigidDamping (ref :1916-1977): a rigid group falling onto a
    static floor has its approach velocity damped through the group's rigid
    mass, and it must come to rest on the floor instead of bouncing off."""
    w = api.World()
    ground = w.create_body(t.BodyDef(type=t.STATIC, position=(0.0, -0.5)))
    w.create_polygon_shape(ground, t.ShapeDef(), g.box(8.0, 0.5))
    ps = w.create_particle_system(radius=0.1)
    ps.create_group_box(center=(0.0, 1.2), half_w=0.4, half_h=0.4,
                        group_flags=G_RIGID)
    w.compile()
    for _ in range(180):
        w.step(1 / 60)
    pt = w.state.particles
    pos = np.asarray(pt.pos)[np.asarray(pt.alive)]
    vel = np.asarray(pt.vel)[np.asarray(pt.alive)]
    assert pos[:, 1].min() > -0.1, "rigid group fell through the floor"
    assert np.abs(vel).max() < 1.0, f"rigid group still agitated: {np.abs(vel).max()}"


def test_block_culled_body_coupling_matches_dense():
    """Per-block shape culling (ParticleConfig.block_shape_slots): a flat
    batch of replicated tanks runs body coupling against each block's own
    top-K shapes instead of every world's walls. With enough slots (no
    cull overflow) the culled step must match the dense (n, Sb) path —
    float-tolerance only, since reductions run in a different shape order."""
    import jax

    w = scenes.replicate(scenes.dam_break(60), 9)
    w.compile()
    assert w._pcfg.max_body_shapes > w._pcfg.block_shape_slots, (
        "scene too small to exercise the culled path")
    w.run(15, 1 / 60)
    jax.block_until_ready(w.state.bodies.center)
    assert int(w.state.profile.overflow_particles) == 0, (
        "culling slots overflowed; auto-K undersized")
    pos_cull = np.asarray(w.state.particles.pos)
    alive = np.asarray(w.state.particles.alive)
    assert np.isfinite(pos_cull[alive]).all()

    w2 = scenes.replicate(scenes.dam_break(60), 9)
    w2.compile()
    w2._pcfg = w2._pcfg._replace(block_shape_slots=4096)  # force dense
    w2._remake_step()
    w2.run(15, 1 / 60)
    jax.block_until_ready(w2.state.bodies.center)
    pos_dense = np.asarray(w2.state.particles.pos)
    np.testing.assert_allclose(pos_cull[alive], pos_dense[alive],
                               rtol=1e-5, atol=5e-5)
