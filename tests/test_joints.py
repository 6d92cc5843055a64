import numpy as np

from box2d_tpu import api, geometry as g
from box2d_tpu import types as t


def _world():
    return api.World()


def test_revolute_pendulum_holds_pivot():
    w = _world()
    anchor = w.create_body(t.BodyDef(type=t.STATIC, position=(0, 5)))
    bob = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(2, 5)))
    w.create_circle_shape(bob, t.ShapeDef(), (0, 0), 0.2)
    w.create_joint(t.RevoluteJointDef(body_a=anchor, body_b=bob,
                                      local_anchor_a=(0, 0),
                                      local_anchor_b=(-2, 0)))
    w.compile()
    for _ in range(240):
        w.step(1 / 60)
        p = w.body_position(bob)
        arm = np.hypot(p[0], p[1] - 5)
        assert abs(arm - 2.0) < 0.01


def test_revolute_motor_spins():
    w = _world()
    anchor = w.create_body(t.BodyDef(type=t.STATIC, position=(0, 5)))
    rotor = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0, 5),
                                    gravity_scale=0.0))
    w.create_polygon_shape(rotor, t.ShapeDef(), g.box(1.0, 0.1))
    w.create_joint(t.RevoluteJointDef(body_a=anchor, body_b=rotor,
                                      enable_motor=True, motor_speed=2.0,
                                      max_motor_torque=100.0))
    w.compile()
    for _ in range(120):
        w.step(1 / 60)
    assert abs(w.body_angular_velocity(rotor) - 2.0) < 0.05


def test_revolute_limit():
    w = _world()
    anchor = w.create_body(t.BodyDef(type=t.STATIC, position=(0, 5)))
    arm = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(1, 5)))
    w.create_polygon_shape(arm, t.ShapeDef(), g.box(1.0, 0.1))
    w.create_joint(t.RevoluteJointDef(
        body_a=anchor, body_b=arm, local_anchor_b=(-1, 0),
        enable_limit=True, lower_angle=-0.25, upper_angle=0.25))
    w.compile()
    for _ in range(300):
        w.step(1 / 60)
    # gravity swings it down to the lower limit
    assert -0.30 < w.body_angle(arm) < -0.20


def test_prismatic_slides_on_axis_only():
    w = _world()
    base = w.create_body(t.BodyDef(type=t.STATIC, position=(0, 5)))
    slider = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0, 5)))
    w.create_polygon_shape(slider, t.ShapeDef(), g.box(0.3, 0.3))
    w.create_joint(t.PrismaticJointDef(
        body_a=base, body_b=slider, local_axis_a=(1.0, 0.0),
        enable_limit=True, lower_translation=-2.0, upper_translation=2.0))
    w.compile()
    w.set_linear_velocity(slider, (3.0, 0.0))
    for _ in range(240):
        w.step(1 / 60)
        p = w.body_position(slider)
        assert abs(p[1] - 5.0) < 0.01  # no off-axis drift (gravity resisted)
        assert p[0] < 2.05
    # ends resting at/near the upper limit
    assert 1.85 < w.body_position(slider)[0] <= 2.05


def test_prismatic_motor_drives():
    w = _world()
    base = w.create_body(t.BodyDef(type=t.STATIC, position=(0, 5)))
    slider = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0, 5),
                                     gravity_scale=0.0))
    w.create_polygon_shape(slider, t.ShapeDef(), g.box(0.3, 0.3))
    w.create_joint(t.PrismaticJointDef(
        body_a=base, body_b=slider, local_axis_a=(0.0, 1.0),
        enable_motor=True, motor_speed=1.0, max_motor_force=50.0))
    w.compile()
    for _ in range(60):
        w.step(1 / 60)
    assert abs(w.body_position(slider)[1] - 6.0) < 0.05


def test_weld_rigid_lock():
    w = _world()
    a = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0, 5)))
    w.create_polygon_shape(a, t.ShapeDef(), g.box(0.5, 0.5))
    b = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(1, 5)))
    w.create_polygon_shape(b, t.ShapeDef(), g.box(0.5, 0.5))
    w.create_joint(t.WeldJointDef(body_a=a, body_b=b,
                                  local_anchor_a=(0.5, 0),
                                  local_anchor_b=(-0.5, 0)))
    w.compile()
    w.set_linear_velocity(a, (0.0, 2.0))
    w.set_angular_velocity(b, 3.0)
    for _ in range(120):
        w.step(1 / 60)
    # relative pose preserved within tolerance while tumbling/falling
    pa, pb = w.body_position(a), w.body_position(b)
    assert abs(np.hypot(*(pb - pa)) - 1.0) < 0.02
    assert abs(w.body_angle(a) - w.body_angle(b)) < 0.02


def test_wheel_suspension_and_motor():
    w = _world()
    chassis = w.create_body(t.BodyDef(type=t.STATIC, position=(0, 2)))
    wheel = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0, 1)))
    w.create_circle_shape(wheel, t.ShapeDef(), (0, 0), 0.4)
    w.create_joint(t.WheelJointDef(
        body_a=chassis, body_b=wheel, local_anchor_a=(0, -1),
        local_axis_a=(0.0, 1.0), enable_spring=True, hertz=4.0,
        damping_ratio=0.7, enable_motor=True, motor_speed=5.0,
        max_motor_torque=20.0))
    w.compile()
    for _ in range(180):
        w.step(1 / 60)
    # spring supports the wheel near its rest position; motor spins it
    assert abs(w.body_position(wheel)[1] - 1.0) < 0.5
    assert abs(w.body_position(wheel)[0]) < 1e-3  # perpendicular lock holds
    assert w.body_angular_velocity(wheel) > 4.0


def test_motor_joint_drives_velocity():
    w = _world()
    a = w.create_body(t.BodyDef(type=t.STATIC))
    b = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0, 2),
                                gravity_scale=0.0))
    w.create_polygon_shape(b, t.ShapeDef(), g.box(0.3, 0.3))
    w.create_joint(t.MotorJointDef(
        body_a=a, body_b=b, linear_velocity=(1.0, 0.0),
        angular_velocity=0.5, max_velocity_force=100.0,
        max_velocity_torque=100.0))
    w.compile()
    for _ in range(60):
        w.step(1 / 60)
    v = w.body_linear_velocity(b)
    assert abs(v[0] - 1.0) < 0.05
    assert abs(w.body_angular_velocity(b) - 0.5) < 0.05


def test_distance_rigid_rod():
    w = _world()
    a = w.create_body(t.BodyDef(type=t.STATIC, position=(0, 5)))
    b = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(1.5, 5)))
    w.create_circle_shape(b, t.ShapeDef(), (0, 0), 0.2)
    w.create_joint(t.DistanceJointDef(body_a=a, body_b=b, length=1.5))
    w.compile()
    for _ in range(240):
        w.step(1 / 60)
        p = w.body_position(b)
        assert abs(np.hypot(p[0], p[1] - 5) - 1.5) < 0.02


def test_filter_joint_disables_collision():
    w = _world()
    ground = w.create_body(t.BodyDef(type=t.STATIC, position=(0, -0.5)))
    w.create_polygon_shape(ground, t.ShapeDef(), g.box(10, 0.5))
    a = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0, 0.5)))
    w.create_polygon_shape(a, t.ShapeDef(), g.box(0.5, 0.5))
    b = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0, 0.6)))
    w.create_polygon_shape(b, t.ShapeDef(), g.box(0.5, 0.5))
    w.create_joint(t.FilterJointDef(body_a=a, body_b=b))
    w.compile()
    for _ in range(120):
        w.step(1 / 60)
    # b falls through a onto the ground: both rest at the same height
    assert abs(w.body_position(b)[1] - 0.5) < 0.02
    assert abs(w.body_position(a)[1] - 0.5) < 0.02


def test_joint_farm_scene_stable():
    from box2d_tpu import scenes

    w = scenes.joint_farm(ragdolls=4).compile()
    for _ in range(120):
        w.step(1 / 60)
    assert bool(np.isfinite(np.asarray(w.state.bodies.center)).all())
    assert np.abs(np.asarray(w.state.bodies.v)).max() < 50.0


def test_runtime_motor_retarget_no_recompile():
    """Typed joint accessors (ref: api/Joint.cs:324-403): an RL-style loop
    flips a revolute motor's speed mid-rollout; the traced lane write must
    take effect without recompiling the step."""
    w = api.World()
    anchor = w.create_body(t.BodyDef(type=t.STATIC, position=(0.0, 2.0)))
    arm = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(1.0, 2.0)))
    w.create_polygon_shape(arm, t.ShapeDef(density=1.0), g.box(0.5, 0.1))
    j = w.create_joint(t.RevoluteJointDef(
        body_a=anchor, body_b=arm,
        local_anchor_a=(0.0, 0.0), local_anchor_b=(-1.0, 0.0),
        enable_motor=True, motor_speed=2.0, max_motor_torque=100.0))
    w.compile()
    step_fn = w._step
    for _ in range(30):
        w.step(1 / 60)
    assert float(w.state.bodies.w[arm]) > 0.5
    w.set_joint_motor_speed(j, -2.0)
    for _ in range(30):
        w.step(1 / 60)
    assert float(w.state.bodies.w[arm]) < -0.5
    assert w._step is step_fn, "accessor forced a recompile"
    # limits clamp the motor (ref RevoluteJoint_SetLimits)
    w.enable_joint_limit(j, True)
    w.set_joint_limits(j, -0.3, 0.3)
    for _ in range(120):
        w.step(1 / 60)
    # arm angle must be clamped near the limit range
    rot = np.asarray(w.state.bodies.rot[arm])
    angle = np.arctan2(rot[1], rot[0])
    assert -0.45 < angle < 0.45, f"limit ignored: angle={angle}"
