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
