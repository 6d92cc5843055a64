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
        # flagship Pallas solver: TPU-only, joint-free scenes that fit VMEM
        use_pallas = False
        if jax.default_backend() not in ("cpu",) and not jtypes:
            from .solver_pallas import fits_kernel
            chunk = self.capacity.color_chunk or max(
                128, ((self.capacity.max_contact_pairs // 16 + 127) // 128) * 128)
            l0 = self.capacity.max_colors * chunk
            ovf = ((min(self.capacity.max_contact_pairs, 2 * chunk) + 127)
                   // 128) * 128
            use_pallas = fits_kernel(self.capacity.max_bodies, l0 + ovf, chunk)
        self._step = make_step(self.capacity, classes, self.substeps, jtypes,
                               sensors,
                               continuous=self.builder.def_.enable_continuous,
                               particle_cfg=pcfg, use_pallas=use_pallas)
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

    def body_transform(self, body: int):
        """(position, angle) of the body origin (ref: BodyAPI.GetTransform)."""
        return self.body_position(body), self.body_angle(body)

    def body_mass(self, body: int) -> float:
        return float(self.state.bodies.mass[body])

    def body_rotational_inertia(self, body: int) -> float:
        return float(self.state.bodies.inertia[body])

    def body_local_center(self, body: int) -> np.ndarray:
        return np.asarray(self.state.bodies.local_center[body])

    def body_world_center(self, body: int) -> np.ndarray:
        return np.asarray(self.state.bodies.center[body])

    def body_is_awake(self, body: int) -> bool:
        return bool(self.state.bodies.awake[body])

    def local_point(self, body: int, world_point):
        b = self.state.bodies
        origin = b.center[body] - m.rot_vec(b.rot[body], b.local_center[body])
        return np.asarray(m.inv_transform_point(
            origin, b.rot[body], jnp.asarray(world_point, jnp.float32)))

    def world_point(self, body: int, local_point):
        b = self.state.bodies
        origin = b.center[body] - m.rot_vec(b.rot[body], b.local_center[body])
        return np.asarray(m.transform_point(
            origin, b.rot[body], jnp.asarray(local_point, jnp.float32)))

    def _update_bodies(self, **cols):
        self.state = dataclasses.replace(
            self.state,
            bodies=dataclasses.replace(self.state.bodies, **cols))

    def set_transform(self, body: int, position, angle: float):
        """Teleport a body (ref: BodyAPI.SetTransform). The next step's
        broadphase re-pairs automatically since pairs are rebuilt anyway."""
        bd = self.state.bodies
        q = jnp.asarray([jnp.cos(angle), jnp.sin(angle)], jnp.float32)
        center = jnp.asarray(position, jnp.float32) + m.rot_vec(
            q, bd.local_center[body])
        self._update_bodies(
            center=bd.center.at[body].set(center),
            rot=bd.rot.at[body].set(q))

    def wake_body(self, body: int):
        bd = self.state.bodies
        self._update_bodies(awake=bd.awake.at[body].set(True),
                            sleep_time=bd.sleep_time.at[body].set(0.0))

    def set_body_enabled(self, body: int, enabled: bool):
        bd = self.state.bodies
        self._update_bodies(enabled=bd.enabled.at[body].set(bool(enabled)))

    def apply_angular_impulse(self, body: int, impulse: float, wake=True):
        bd = self.state.bodies
        self._update_bodies(
            w=bd.w.at[body].add(jnp.float32(impulse) * bd.inv_inertia[body]),
            awake=bd.awake.at[body].set(True))

    def apply_linear_impulse(self, body: int, impulse, point, wake=True):
        bd = self.state.bodies
        imp = jnp.asarray(impulse, jnp.float32)
        lever = jnp.asarray(point, jnp.float32) - bd.center[body]
        self._update_bodies(
            v=bd.v.at[body].add(imp * bd.inv_mass[body]),
            w=bd.w.at[body].add(bd.inv_inertia[body] * m.cross(lever, imp)),
            awake=bd.awake.at[body].set(True))

    # -- world tuning setters (ref: api/World.cs:628-807) --------------------

    def _update_tuning(self, **cols):
        self.state = dataclasses.replace(
            self.state,
            tuning=dataclasses.replace(
                self.state.tuning,
                **{k: jnp.asarray(v, jnp.float32) if not isinstance(v, bool)
                   else jnp.bool_(v) for k, v in cols.items()}))

    def set_gravity(self, gravity):
        self._update_tuning(gravity=gravity)

    def set_contact_tuning(self, hertz, damping_ratio, push_speed):
        self._update_tuning(contact_hertz=hertz,
                            contact_damping_ratio=damping_ratio,
                            contact_speed=push_speed)

    def set_restitution_threshold(self, v):
        self._update_tuning(restitution_threshold=v)

    def set_hit_event_threshold(self, v):
        self._update_tuning(hit_event_threshold=v)

    def set_maximum_linear_speed(self, v):
        self._update_tuning(max_linear_speed=v)

    def enable_sleep(self, flag: bool):
        self._update_tuning(enable_sleep=flag)

    def enable_warm_starting(self, flag: bool):
        self._update_tuning(enable_warm_starting=flag)

    # -- joint accessors ------------------------------------------------------

    def set_mouse_target(self, joint: int, target):
        """Move a mouse joint's world target (ref: MouseJoint SetTarget)."""
        jn = self.state.joints
        self.state = dataclasses.replace(
            self.state,
            joints=dataclasses.replace(
                jn, frame_a_p=jn.frame_a_p.at[joint].set(
                    jnp.asarray(target, jnp.float32))))
        self.wake_body(int(jn.body_b[joint]))

    # -- particles (post-compile) --------------------------------------------

    def destroy_particle(self, index: int):
        """Kill one particle (ref: ParticleSystem.DestroyParticle — the
        zombie flag + compaction become a simple alive-mask clear here)."""
        pt = self.state.particles
        self.state = dataclasses.replace(
            self.state,
            particles=dataclasses.replace(
                pt, alive=pt.alive.at[index].set(False)))

    def destroy_particles_in_aabb(self, lo, hi):
        """Kill all particles inside an AABB (region destroy)."""
        pt = self.state.particles
        lo = jnp.asarray(lo, jnp.float32)
        hi = jnp.asarray(hi, jnp.float32)
        inside = jnp.all((pt.pos >= lo) & (pt.pos <= hi), axis=1)
        self.state = dataclasses.replace(
            self.state,
            particles=dataclasses.replace(pt, alive=pt.alive & ~inside))

    def apply_particle_force(self, index: int, force):
        pt = self.state.particles
        self.state = dataclasses.replace(
            self.state,
            particles=dataclasses.replace(
                pt, force=pt.force.at[index].add(
                    jnp.asarray(force, jnp.float32))))

    def destroy_body(self, body: int):
        """Disable a body and its shapes (the masked analog of ref
        api/Body.cs:109-164 DestroyBody; lanes are not reclaimed until the
        scene is rebuilt)."""
        self.set_body_enabled(body, False)

    def joint_constraint_force(self, joint: int, dt=1.0 / 60.0):
        """Approximate reaction force magnitude (ref: JointAPI
        GetConstraintForce). Uses last step's stored impulses."""
        jn = self.state.joints
        return float(np.hypot(*np.asarray(jn.impulse[joint])) / dt)

    # -- queries (thin wrappers over box2d_tpu.queries) ----------------------

    def cast_ray_closest(self, origin, translation, **kw):
        from . import queries

        return queries.cast_ray_closest(self.state, origin, translation, **kw)

    def overlap_aabb(self, aabb, **kw):
        from . import queries

        return np.asarray(queries.overlap_aabb(self.state, aabb, **kw))

    def explode(self, position, radius, impulse_per_length, falloff=0.0):
        from . import queries

        self.state = queries.explode(self.state, position, radius,
                                     impulse_per_length, falloff)

    # -- counters (ref: api/World.cs:817-834 GetCounters) --------------------

    def counters(self) -> dict:
        st = self.state
        return {
            "body_count": int(np.sum(np.asarray(st.bodies.enabled))),
            "shape_count": int(np.sum(np.asarray(st.shapes.enabled))),
            "joint_count": int(np.sum(np.asarray(st.joints.enabled)
                                      & (np.asarray(st.joints.type) >= 0))),
            "contact_count": int(np.sum(np.asarray(st.contacts.touching))),
            "pair_count": int(st.profile.pair_count),
            "color_count": int(st.profile.color_count),
            "awake_body_count": int(np.sum(
                np.asarray(st.bodies.awake) & np.asarray(st.bodies.enabled)
                & (np.asarray(st.bodies.type) == 2))),
            "particle_count": (
                int(np.sum(np.asarray(st.particles.alive)))
                if st.particles is not None else 0),
        }

    @property
    def profile(self):
        return self.state.profile

    @property
    def events(self):
        return self.state.events
