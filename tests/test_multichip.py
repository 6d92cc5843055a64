"""Multi-device sharding tests (SURVEY.md §2 distributed backend analog).

Physics worlds are embarrassingly parallel: the scaling axis is a world-batch
data axis sharded over the device mesh. These tests run on the conftest's
8 virtual CPU devices and validate (a) the driver's dryrun entry point
executes, and (b) a mesh-sharded batch is numerically identical to stepping
each world alone (ref analog: the reference has no distributed layer at all
— SURVEY §2 "Distributed communication backend: none").
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def test_dryrun_multichip_entrypoint():
    # exactly what the driver invokes; must not raise
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_sharded_batch_matches_single_world():
    from box2d_tpu import scenes
    from box2d_tpu.narrowphase import classes_for_shape_types
    from box2d_tpu.world import _step

    n = 8
    devices = jax.devices("cpu")[:n]
    assert len(devices) == n
    mesh = Mesh(np.array(devices), ("worlds",))

    w = scenes.pyramid(rows=3)
    state, cap = w.builder.build()
    classes = classes_for_shape_types(s["geom"].type for s in w.builder._shapes)

    def step1(s):
        return _step(s, jnp.float32(1.0 / 60.0), cap, classes, 4)

    # vary initial conditions per world so lanes are distinguishable
    def perturb(s, i):
        b = s.bodies
        vx = jnp.where(b.type == 2, 0.01 * (i + 1), 0.0)
        return dataclasses.replace(
            s, bodies=dataclasses.replace(b, v=b.v.at[:, 0].add(vx)))

    singles = [perturb(state, i) for i in range(n)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *singles)
    shard = NamedSharding(mesh, P("worlds"))
    batch = jax.tree.map(lambda x: jax.device_put(x, shard), batch)

    stepped_batch = jax.jit(jax.vmap(step1))(batch)
    for _ in range(2):
        stepped_batch = jax.jit(jax.vmap(step1))(stepped_batch)

    # the batch really is sharded over the mesh, not replicated
    s0 = stepped_batch.bodies.center.sharding
    assert s0.is_equivalent_to(shard, stepped_batch.bodies.center.ndim)

    ref = [jax.jit(step1)(s) for s in singles]
    for _ in range(2):
        ref = [jax.jit(step1)(s) for s in ref]
    for i in range(n):
        np.testing.assert_allclose(
            np.asarray(stepped_batch.bodies.center[i]),
            np.asarray(ref[i].bodies.center), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(stepped_batch.bodies.w[i]),
            np.asarray(ref[i].bodies.w), rtol=1e-6, atol=1e-6)


def test_flat_batch_per_device_bit_identity():
    """The production RL layout (VERDICT r4 #4): each device holds ONE flat
    multi-world batch (scenes.replicate) and runs the UNBATCHED step under
    shard_map. Because the per-device program squeezes the leading axis, the
    device runs the plain unbatched flat-batch program — measured agreement
    with stepping the same flat world alone on one device is last-ulp (XLA
    fuses the shard_map body slightly differently from the standalone jit:
    max observed diff 1 ulp on ~7% of elements after 3 steps), so the
    assertion is allclose at 1e-5 relative, not bitwise."""
    from jax import shard_map

    from box2d_tpu import scenes
    from box2d_tpu.narrowphase import classes_for_shape_types
    from box2d_tpu.world import _step

    n = 8
    devices = jax.devices("cpu")[:n]
    mesh = Mesh(np.array(devices), ("worlds",))
    shard = NamedSharding(mesh, P("worlds"))

    w = scenes.replicate(scenes.pyramid(rows=3), 4)
    fstate, fcap = w.builder.build()
    fclasses = classes_for_shape_types(
        s["geom"].type for s in w.builder._shapes)

    # distinguishable per-device initial conditions
    def perturb(s, i):
        b = s.bodies
        vx = jnp.where(b.type == 2, 0.003 * (i + 1), 0.0)
        return dataclasses.replace(
            s, bodies=dataclasses.replace(b, v=b.v.at[:, 0].add(vx)))

    singles = [perturb(fstate, i) for i in range(n)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *singles)
    batch = jax.tree.map(lambda x: jax.device_put(x, shard), batch)

    def step1(s):
        return _step(s, jnp.float32(1.0 / 60.0), fcap, fclasses, 4)

    def step_flat(block):
        s = jax.tree.map(lambda x: x[0], block)
        return jax.tree.map(lambda x: x[None], step1(s))

    fn = jax.jit(shard_map(step_flat, mesh=mesh, in_specs=P("worlds"),
                           out_specs=P("worlds"), check_vma=False))
    out = batch
    for _ in range(3):
        out = fn(out)

    # single-device reference: the same flat world stepped alone
    ref = singles
    step1_j = jax.jit(step1)
    for _ in range(3):
        ref = [step1_j(s) for s in ref]

    for i in range(n):
        np.testing.assert_allclose(
            np.asarray(out.bodies.center[i]),
            np.asarray(ref[i].bodies.center), rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(out.bodies.rot[i]), np.asarray(ref[i].bodies.rot),
            rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(out.bodies.v[i]), np.asarray(ref[i].bodies.v),
            rtol=1e-5, atol=1e-6)


def test_shard_map_worlds_execute():
    """shard_map over the world axis: per-device step with no collectives."""
    from jax import shard_map

    from box2d_tpu import scenes
    from box2d_tpu.narrowphase import classes_for_shape_types
    from box2d_tpu.world import _step

    n = 8
    devices = jax.devices("cpu")[:n]
    mesh = Mesh(np.array(devices), ("worlds",))

    w = scenes.pyramid(rows=2)
    state, cap = w.builder.build()
    classes = classes_for_shape_types(s["geom"].type for s in w.builder._shapes)

    batch = jax.tree.map(lambda x: jnp.stack([x] * n), state)

    def step_shard(s):
        # each device holds ONE world (leading dim 1 after sharding)
        return jax.vmap(
            lambda t: _step(t, jnp.float32(1.0 / 60.0), cap, classes, 4))(s)

    spec = P("worlds")
    fn = jax.jit(shard_map(step_shard, mesh=mesh, in_specs=spec,
                           out_specs=spec, check_vma=False))
    out = fn(batch)
    centers = np.asarray(out.bodies.center)
    # all worlds identical input -> identical output across the mesh
    for i in range(1, n):
        np.testing.assert_array_equal(centers[i], centers[0])
    assert np.all(np.isfinite(centers))
