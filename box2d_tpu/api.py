"""High-level World API mirroring the reference's facade
(ref: api/World.cs, api/Body.cs, api/Shape.cs, api/Joint.cs, api/Chain.cs).

Host-side convenience wrapper: build a scene eagerly, `compile()` freezes it
to a WorldState + jitted step, then `step()` advances it. All per-entity
accessors read/write the dense arrays; for RL-scale workloads use the
functional layer directly (builder.build + world.make_step) and vmap.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import geometry as g
from . import math2d as m
from . import types as t
from .builder import WorldBuilder
from .joints import joint_types_present
from .narrowphase import classes_for_shape_types
from .state import Capacity, WorldState
from .world import make_step


class World:
    """A mutable scene wrapper around the pure-functional core."""

    def __init__(self, def_: t.WorldDef | None = None, substeps: int = 4):
        self.builder = WorldBuilder(def_)
        self.substeps = substeps
        self.state: WorldState | None = None
        self.capacity: Capacity | None = None
        self._step = None

    # -- construction (pre-compile) ----------------------------------------

    def create_body(self, def_: t.BodyDef | None = None, **kw) -> int:
        return self.builder.create_body(def_, **kw)

    def create_shape(self, body: int, def_: t.ShapeDef, geom: g.ShapeGeom) -> int:
        return self.builder.create_shape(body, def_, geom)

    def create_circle_shape(self, body, def_, center, radius):
        return self.create_shape(body, def_, g.circle(center, radius))

    def create_capsule_shape(self, body, def_, p1, p2, radius):
        return self.create_shape(body, def_, g.capsule(p1, p2, radius))

    def create_segment_shape(self, body, def_, p1, p2):
        return self.create_shape(body, def_, g.segment(p1, p2))

    def create_polygon_shape(self, body, def_, geom: g.ShapeGeom):
        return self.create_shape(body, def_, geom)

    def create_chain(self, body: int, def_: t.ChainDef):
        return self.builder.create_chain(body, def_)

    def create_joint(self, def_) -> int:
        return self.builder.create_joint(def_)

    def create_particle_system(self, radius: float, density: float = 1.0):
        return self.builder.create_particle_system(radius, density)

    # -- compile + step -----------------------------------------------------

    def compile(self, capacity: Capacity | None = None):
        self.state, self.capacity = self.builder.build(capacity)
        classes = classes_for_shape_types(
            s["geom"].type for s in self.builder._shapes)
        jtypes = joint_types_present(j["_type"] for j in self.builder._joints)
        from .sensors import sensor_shape_ids
        sensors = sensor_shape_ids(self.builder._shapes)
        pcfg = None
        if self.builder._particle_builder is not None:
            from .particles import ParticleConfig
            pcfg = ParticleConfig()
        self._step = make_step(self.capacity, classes, self.substeps, jtypes,
                               sensors,
                               continuous=self.builder.def_.enable_continuous,
                               particle_cfg=pcfg)
        return self

    def step(self, dt: float = 1.0 / 60.0):
        if self._step is None:
            self.compile()
        self.state = self._step(self.state, jnp.float32(dt))
        return self.state

    # -- accessors (ref: api/Body.cs getters) -------------------------------

    def body_position(self, body: int) -> np.ndarray:
        """Body origin position (ref: BodyAPI.GetPosition)."""
        b = self.state.bodies
        origin = b.center[body] - m.rot_vec(b.rot[body], b.local_center[body])
        return np.asarray(origin)

    def body_angle(self, body: int) -> float:
        b = self.state.bodies
        return float(jnp.arctan2(b.rot[body, 1], b.rot[body, 0]))

    def body_linear_velocity(self, body: int) -> np.ndarray:
        return np.asarray(self.state.bodies.v[body])

    def body_angular_velocity(self, body: int) -> float:
        return float(self.state.bodies.w[body])

    # -- mutators (post-compile, ref: api/Body.cs setters) -------------------

    def set_linear_velocity(self, body: int, v):
        bd = self.state.bodies
        self.state = dataclasses.replace(
            self.state,
            bodies=dataclasses.replace(
                bd, v=bd.v.at[body].set(jnp.asarray(v, jnp.float32))))

    def set_angular_velocity(self, body: int, w: float):
        bd = self.state.bodies
        self.state = dataclasses.replace(
            self.state,
            bodies=dataclasses.replace(bd, w=bd.w.at[body].set(jnp.float32(w))))

    def apply_force_to_center(self, body: int, force, wake=True):
        bd = self.state.bodies
        self.state = dataclasses.replace(
            self.state,
            bodies=dataclasses.replace(
                bd, force=bd.force.at[body].add(jnp.asarray(force, jnp.float32))))

    def apply_linear_impulse_to_center(self, body: int, impulse, wake=True):
        bd = self.state.bodies
        dv = jnp.asarray(impulse, jnp.float32) * bd.inv_mass[body]
        self.state = dataclasses.replace(
            self.state,
            bodies=dataclasses.replace(bd, v=bd.v.at[body].add(dv)))

    def apply_torque(self, body: int, torque: float, wake=True):
        bd = self.state.bodies
        self.state = dataclasses.replace(
            self.state,
            bodies=dataclasses.replace(
                bd, torque=bd.torque.at[body].add(jnp.float32(torque))))

    @property
    def profile(self):
        return self.state.profile

    @property
    def events(self):
        return self.state.events
