"""End-to-end RL-shaped workflow (the configuration this engine exists for):
64 independent worlds tiled into ONE flat batch (`scenes.replicate`),
per-world actions written into traced joint arrays, stepped through a single
`lax.scan` with rewards computed from the event surface — zero host
round-trips inside the loop.

Reference analog: none — the reference (single-world, C#) would run 64
processes; the flat batch is the TPU-native replacement (SURVEY.md §2
distributed table: world-batch axis).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from box2d_tpu import scenes
from box2d_tpu.joints import joint_types_present
from box2d_tpu.narrowphase import classes_for_shape_types
from box2d_tpu.sensors import sensor_shape_ids
from box2d_tpu.world import make_step

N_WORLDS = 64
STEPS = 256


def _build_flat_farm(n_worlds):
    base = scenes.joint_farm(ragdolls=1)
    w = scenes.replicate(base, n_worlds)
    state, cap = w.builder.build()
    classes = classes_for_shape_types(
        s["geom"].type for s in w.builder._shapes)
    jtypes = joint_types_present(j["_type"] for j in w.builder._joints)
    sensors = sensor_shape_ids(w.builder._shapes)
    step = make_step(cap, classes, 4, jtypes, sensors,
                     continuous=w.builder.def_.enable_continuous)
    n_joints = len(base.builder._joints)
    n_bodies = len(base.builder._bodies)
    n_shapes = len(base.builder._shapes)
    # joint 0 of every copy is the motorized torso revolute
    motor_lanes = jnp.arange(n_worlds, dtype=jnp.int32) * n_joints
    return state, step, motor_lanes, n_bodies, n_shapes


def test_rl_loop_64_worlds_device_side():
    state, step, motor_lanes, n_bodies, n_shapes = _build_flat_farm(N_WORLDS)
    world_of_body = jnp.arange(state.bodies.center.shape[0]) // n_bodies

    # deterministic per-(step, world) action schedule — stands in for a
    # policy network's output; worlds get distinguishable action signs
    t_idx = jnp.arange(STEPS, dtype=jnp.float32)[:, None]
    w_idx = jnp.arange(N_WORLDS, dtype=jnp.float32)[None, :]
    actions = 2.0 * jnp.sin(0.05 * t_idx + w_idx) + jnp.where(
        w_idx % 2 == 0, 1.5, -1.5)                        # (STEPS, N_WORLDS)

    def env_step(s, act):
        jn = s.joints
        s = dataclasses.replace(
            s, joints=dataclasses.replace(
                jn, motor_speed=jn.motor_speed.at[motor_lanes].set(act)))
        s = step(s, jnp.float32(1 / 60))
        ev = s.events
        # reward from the event surface: per-world moved-body count plus
        # per-world contact-begin count (shape ids map to worlds by range)
        moved = jnp.zeros(N_WORLDS, jnp.float32).at[world_of_body].add(
            ev.body_moved.astype(jnp.float32))
        cb_world = ev.contact_begin[:, 0] // n_shapes
        cb_ok = jnp.arange(ev.contact_begin.shape[0]) < ev.contact_begin_count
        contacts = jnp.zeros(N_WORLDS, jnp.float32).at[
            jnp.where(cb_ok, cb_world, N_WORLDS)].add(1.0, mode="drop")
        return s, moved + 0.1 * contacts

    @jax.jit
    def rollout(s, acts):
        return jax.lax.scan(env_step, s, acts)

    final, rewards = rollout(state, actions)
    jax.block_until_ready(final.bodies.center)

    assert rewards.shape == (STEPS, N_WORLDS)
    r = np.asarray(rewards)
    assert np.isfinite(r).all()
    assert r.sum() > 0.0, "no events fired at all"

    # per-world actions must actually reach per-world dynamics: the torso
    # revolute motor sign differs between even and odd worlds, so the torso
    # angular velocities must split by parity (torso = body 1 of each copy)
    w_t = np.asarray(final.bodies.w)[1::n_bodies]         # (N_WORLDS,)
    assert np.isfinite(w_t).all()
    even, odd = w_t[0::2], w_t[1::2]
    assert even.mean() > odd.mean() + 0.1, (
        f"actions did not differentiate worlds: even {even.mean():.3f} "
        f"vs odd {odd.mean():.3f}")
    # worlds are independent: no NaN anywhere, positions bounded
    c = np.asarray(final.bodies.center)
    assert np.isfinite(c).all()
