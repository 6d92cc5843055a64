"""World.validate — the B2_VALIDATE state-invariant checker analog
(ref: src/World.cs:457-753)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from box2d_tpu import geometry as g
from box2d_tpu import scenes
from box2d_tpu import types as t
from box2d_tpu.api import World
from box2d_tpu.state import Capacity


def test_validate_clean_scenes():
    """Fresh + stepped scenes of every flavor hold the invariants."""
    for build in (lambda: scenes.pyramid(rows=5),
                  lambda: scenes.joint_farm(ragdolls=2),
                  lambda: scenes.tumbler(count=20)):
        w = build()
        w.compile()
        assert w.validate() == []
        for _ in range(60):
            w.step()
        assert w.validate() == []


def test_validate_after_lifecycle_churn():
    w = World(t.WorldDef(enable_sleep=False))
    ground = w.create_body(t.BodyDef(type=t.STATIC, position=(0.0, -0.5)))
    w.create_polygon_shape(ground, t.ShapeDef(), g.box(10.0, 0.5))
    w.compile(Capacity(max_bodies=16, max_shapes=16, max_joints=4,
                       max_contact_pairs=128, max_verts=4))
    for _ in range(3):
        b1 = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(0.0, 1.0)))
        w.create_polygon_shape(b1, t.ShapeDef(density=1.0), g.box(0.2, 0.2))
        b2 = w.create_body(t.BodyDef(type=t.DYNAMIC, position=(1.0, 1.0)))
        w.create_circle_shape(b2, t.ShapeDef(density=1.0), (0.0, 0.0), 0.2)
        j = w.create_joint(t.DistanceJointDef(
            body_a=b1, body_b=b2, local_anchor_a=(0, 0),
            local_anchor_b=(0, 0), length=1.0))
        for _ in range(10):
            w.step()
        assert w.validate() == []
        w.destroy_body(b1)
        w.step()
        assert w.validate() == []
        w.destroy_body(b2)
        w.step()
        assert w.validate() == []


def test_validate_catches_corruption():
    w = scenes.pyramid(rows=4)
    w.compile()
    for _ in range(30):
        w.step()
    assert w.validate() == []
    # corrupt: give a static body an inverse mass
    b = w.state.bodies
    w.state = dataclasses.replace(
        w.state, bodies=dataclasses.replace(
            b, inv_mass=b.inv_mass.at[0].set(1.0)))
    with pytest.raises(AssertionError, match="inv_mass"):
        w.validate()
    w.state = dataclasses.replace(
        w.state, bodies=dataclasses.replace(
            w.state.bodies, inv_mass=b.inv_mass))
    # corrupt: force two touching contacts into the same color sharing a
    # body (pick two live contacts on one body)
    cs = w.state.contacts
    ka = np.asarray(cs.key_a)
    touching = np.asarray(cs.touching)
    col = np.asarray(cs.color)
    body_of = np.asarray(w.state.shapes.body)
    live = np.nonzero(touching & (col >= 0))[0]
    # find two contacts sharing a body
    pair = None
    for i in live:
        for j in live:
            if i >= j:
                continue
            bi = {int(body_of[ka[i]]), int(body_of[np.asarray(cs.key_b)[i]])}
            bj = {int(body_of[ka[j]]), int(body_of[np.asarray(cs.key_b)[j]])}
            shared = [x for x in (bi & bj)
                      if int(np.asarray(w.state.bodies.type)[x]) == 2]
            if shared:
                pair = (i, j)
                break
        if pair:
            break
    assert pair is not None
    i, j = pair
    w.state = dataclasses.replace(
        w.state, contacts=dataclasses.replace(
            cs, color=cs.color.at[j].set(int(col[i]))))
    with pytest.raises(AssertionError, match="color conflict"):
        w.validate()
