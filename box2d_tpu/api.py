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


def _pairs_fallback(pts, cutoff):
    """NumPy proximity pairs (used when the native scene core is absent)."""
    a, b, dist = [], [], []
    for i in range(len(pts)):
        diff = pts[i + 1:] - pts[i]
        dd = np.hypot(diff[:, 0], diff[:, 1])
        for j in np.nonzero(dd < cutoff)[0]:
            a.append(i)
            b.append(i + 1 + int(j))
            dist.append(float(dd[j]))
    return (np.array(a, np.int32), np.array(b, np.int32),
            np.array(dist, np.float32))


class World:
    """A mutable scene wrapper around the pure-functional core."""

    def __init__(self, def_: t.WorldDef | None = None, substeps: int = 4):
        self.builder = WorldBuilder(def_)
        self.substeps = substeps
        self.state: WorldState | None = None
        self.capacity: Capacity | None = None
        self._step = None
        self._run_fns = None

    # -- handles (ref: include/ID.cs:4-50 generation-checked ids) ----------
    # A handle packs (lane, generation): lane in the low 20 bits, the lane's
    # generation above. Builder-time handles carry generation 0 and equal
    # the raw lane index; once a lane is destroyed and reused, its
    # generation bumps and any old handle raises on use.

    _GEN_SHIFT = 20
    _LANE_MASK = (1 << 20) - 1

    def _decode(self, handle: int, gens, kind: str) -> int:
        lane = handle & self._LANE_MASK
        gen = handle >> self._GEN_SHIFT
        if gens is not None:
            if lane >= len(gens) or gens[lane] != gen:
                raise ValueError(
                    f"stale or invalid {kind} handle {handle} "
                    f"(lane {lane} is at generation "
                    f"{gens[lane] if lane < len(gens) else '?'}, "
                    f"handle carries {gen})")
        return lane

    def _bid(self, handle: int) -> int:
        return self._decode(int(handle), getattr(self, "_body_gen", None),
                            "body")

    def _sid(self, handle: int) -> int:
        return self._decode(int(handle), getattr(self, "_shape_gen", None),
                            "shape")

    def _jid(self, handle: int) -> int:
        return self._decode(int(handle), getattr(self, "_joint_gen", None),
                            "joint")

    def _handle(self, lane: int, gens) -> int:
        return int(lane) | (int(gens[lane]) << self._GEN_SHIFT)

    # -- construction ------------------------------------------------------
    # Before compile(), entities append to the host-side builder. After
    # compile(), creates claim free capacity lanes (spare padding + lanes
    # recycled by destroys) and write state arrays directly — the runtime
    # analog of ref api/Body.cs:16-105 CreateBody / api/Shape.cs:8-24.

    def create_body(self, def_: t.BodyDef | None = None, **kw) -> int:
        if self.state is None:
            return self.builder.create_body(def_, **kw)
        return self._spawn_body(def_, **kw)

    def create_shape(self, body: int, def_: t.ShapeDef, geom: g.ShapeGeom) -> int:
        if self.state is None:
            return self.builder.create_shape(body, def_, geom)
        return self._spawn_shape(body, def_, geom)

    def create_circle_shape(self, body, def_, center, radius):
        return self.create_shape(body, def_, g.circle(center, radius))

    def create_capsule_shape(self, body, def_, p1, p2, radius):
        return self.create_shape(body, def_, g.capsule(p1, p2, radius))

    def create_segment_shape(self, body, def_, p1, p2):
        return self.create_shape(body, def_, g.segment(p1, p2))

    def create_polygon_shape(self, body, def_, geom: g.ShapeGeom):
        return self.create_shape(body, def_, geom)

    def create_chain(self, body: int, def_: t.ChainDef):
        if self.state is None:
            return self.builder.create_chain(body, def_)
        # runtime: build the same per-edge ChainSegment shapes through the
        # lane-spawning path (ref: api/Chain.cs:12-134)
        pts = [np.asarray(p, np.float32) for p in def_.points]
        n = len(pts)
        assert n >= 4, "chain needs at least 4 points"
        mats = list(def_.materials)

        def seg_material(i):
            return mats[i % len(mats)] if len(mats) > 1 else mats[0]

        ids = []

        def add(g1, p1, p2, g2, mat):
            geom = g.chain_segment(p1, p2, g1, g2)
            sd = t.ShapeDef(material=mat, density=1.0, filter=def_.filter,
                            enable_sensor_events=def_.enable_sensor_events)
            sd.update_body_mass = False
            ids.append(self._spawn_shape(body, sd, geom))

        if def_.is_loop:
            for i in range(n):
                add(pts[(i - 1) % n], pts[i], pts[(i + 1) % n],
                    pts[(i + 2) % n], seg_material(i))
        else:
            for i in range(n - 3):
                add(pts[i], pts[i + 1], pts[i + 2], pts[i + 3],
                    seg_material(i))
        return ids

    def create_joint(self, def_) -> int:
        if self.state is None:
            return self.builder.create_joint(def_)
        return self._spawn_joint(def_)

    def create_particle_system(self, radius: float, density: float = 1.0):
        return self.builder.create_particle_system(radius, density)

    # -- compile + step -----------------------------------------------------

    def compile(self, capacity: Capacity | None = None):
        self.state, self.capacity = self.builder.build(capacity)
        classes = classes_for_shape_types(
            s["geom"].type for s in self.builder._shapes)
        self._classes = classes
        self._contact_fn = None
        jtypes = joint_types_present(j["_type"] for j in self.builder._joints)
        from .sensors import sensor_shape_ids
        sensors = sensor_shape_ids(self.builder._shapes)
        pcfg = None
        if self.builder._particle_builder is not None:
            from .particles import (G_RIGID, G_SOLID, P_BARRIER,
                                    P_COLOR_MIXING, P_ELASTIC, P_POWDER,
                                    P_REPULSIVE, P_SPRING,
                                    P_STATIC_PRESSURE, P_TENSILE, P_VISCOUS,
                                    P_WALL, ParticleConfig)
            import math as _math
            pb = self.builder._particle_builder
            allf = 0
            for f in pb.flags:
                allf |= int(f)
            allg = 0
            for f in pb.group_flags:
                allg |= int(f)
            # size the nearby-shape cap so every shape that can plausibly
            # touch the particle region fits (a flat batch of replicated
            # tanks needs every copy's walls; the runtime top-K re-selects
            # by CURRENT AABB overlap each step, this is only the cap)
            n_near = 0
            if pb.pos:
                ppos = np.asarray(pb.pos, np.float32)
                lo = ppos.min(0)
                hi = ppos.max(0)
                margin = 0.5 * float(np.max(hi - lo)) + 2.0
                for s in self.builder._shapes:
                    geom = s["geom"]
                    v = geom.verts[:max(int(geom.count), 1)]
                    p0 = np.asarray(
                        self.builder._bodies[s["body"]]["position"],
                        np.float32)
                    slo = p0 + v.min(0) - geom.radius
                    shi = p0 + v.max(0) + geom.radius
                    if (shi >= lo - margin).all() and (slo <= hi + margin).all():
                        n_near += 1
            mbs = int(min(max(16, 2 * n_near), 2048,
                          max(len(self.builder._shapes), 1)))
            # per-block culling slots (particles.ParticleConfig
            # .block_shape_slots): a block of 256 sorted particles sees
            # roughly (n_near * 256 / n_particles) shapes when shapes are
            # spread with the particles (the flat-batch layout); 1.5x that
            # average plus slack covers block-spans-multiple-copies scenes
            # (tiny worlds), overflow stays counted in overflow_particles
            n_part = max(len(pb.flags), 1)
            k_cull = int(min(mbs, max(8, 3 * n_near * 256 // (2 * n_part)
                                      + 4)))
            k_cull = (k_cull + 3) // 4 * 4
            # per-flag trace gates, the analog of the reference's
            # AllParticleFlags checks (ref: Solve :1523-1555)
            pcfg = ParticleConfig(
                has_barrier=bool(allf & P_BARRIER),
                has_viscous=bool(allf & P_VISCOUS),
                has_repulsive=bool(allf & P_REPULSIVE),
                has_powder=bool(allf & P_POWDER),
                has_tensile=bool(allf & P_TENSILE),
                has_colormix=bool(allf & P_COLOR_MIXING),
                has_static_pressure=bool(allf & P_STATIC_PRESSURE),
                has_elastic=bool(allf & P_ELASTIC),
                has_spring=bool(allf & P_SPRING),
                has_wall=bool(allf & P_WALL),
                has_solid=bool(allg & G_SOLID),
                has_rigid=bool(allg & G_RIGID),
                # ref ComputeDepth iterates sqrt(particle count)
                depth_iterations=max(
                    16, int(_math.isqrt(max(len(pb.flags), 1))) + 1),
                # TPU fast path for the always-on pair passes; particles.py
                # ignores the flag when a gated pass needs the flat pair
                # view (see ParticleConfig docstring)
                use_window_kernel=(jax.default_backend() not in ("cpu",)
                                   and len(pb.flags) >= 2048),
                rank_repair=(jax.default_backend() not in ("cpu",)
                             and len(pb.flags) >= 2048),
                max_body_shapes=mbs,
                block_shape_slots=k_cull,
                geom_types=frozenset(
                    int(s["geom"].type) for s in self.builder._shapes),
            )
        # flagship Pallas solver: TPU-only.
        # mode 1 = VMEM-resident mega-kernel (small joint-free worlds,
        # vmap-friendly), mode 2 = HBM-streaming tiled kernel (large scenes
        # and ALL jointed scenes — joints ride kind-pure windows),
        # 0 = XLA path.
        use_pallas = 0
        if jax.default_backend() not in ("cpu",):
            from .solver_pallas import (fits_kernel, fits_tiled,
                                        fits_tiled_streamed, window_width)
            from .state import JOINT_FILTER
            solvable = sorted(int(t) for t in jtypes if t != JOINT_FILTER)
            from .state import auto_chunk
            chunk = (self.capacity.color_chunk
                     or auto_chunk(self.capacity.max_contact_pairs))
            l0 = self.capacity.max_colors * chunk
            # mirrors world.py's chunk-multiple overflow rounding
            ovf = ((min(self.capacity.max_contact_pairs, 2 * chunk)
                    + chunk - 1) // chunk) * chunk
            w_win = window_width(chunk)
            # mirrors world.py's joint-region sizing
            jl = 0
            if solvable:
                n_groups = self.capacity.max_colors * len(solvable)
                mj = self.capacity.max_joints
                jl = ((-(-mj // w_win)) * w_win
                      + min(n_groups, mj) * w_win)
            if not solvable and fits_kernel(self.capacity.max_bodies,
                                            l0 + ovf, chunk):
                use_pallas = 1
            elif fits_tiled(self.capacity.max_bodies, l0 + ovf + jl, w_win):
                use_pallas = 2
            elif fits_tiled_streamed(self.capacity.max_bodies, w_win):
                # layout too long for resident acc/idx: stream them per
                # window (mode 3) — giant flat batches ride the kernel
                use_pallas = 3
        # keep the derived static config so the step can be re-made with a
        # tweaked Capacity without resetting runtime state (see set_filter)
        self._jtypes = jtypes
        self._sensors = sensors
        self._pcfg = pcfg
        self._use_pallas = use_pallas
        self._remake_step()
        # --- entity lifecycle bookkeeping (ref: include/ID.cs generation
        # handles + src/IDPool.cs free lists) -----------------------------
        # lanes beyond the builder's entity counts are spare capacity for
        # runtime spawns; destroyed entities recycle their lanes with a
        # bumped generation so stale handles raise instead of aliasing
        self._body_gen = np.zeros(self.capacity.max_bodies, np.int64)
        self._shape_gen = np.zeros(self.capacity.max_shapes, np.int64)
        self._joint_gen = np.zeros(self.capacity.max_joints, np.int64)
        self._free_bodies = list(range(self.capacity.max_bodies - 1,
                                       len(self.builder._bodies) - 1, -1))
        self._free_shapes = list(range(self.capacity.max_shapes - 1,
                                       len(self.builder._shapes) - 1, -1))
        self._free_joints = list(range(self.capacity.max_joints - 1,
                                       len(self.builder._joints) - 1, -1))
        # per-lane shape records (geometry + density + owner) for runtime
        # mass recomputes — the builder's records indexed by lane
        self._shape_recs = {
            i: {"geom": s["geom"], "density": s["density"],
                "body": s["body"]}
            for i, s in enumerate(self.builder._shapes)}
        return self

    def _remake_step(self):
        self._step = make_step(
            self.capacity, self._classes, self.substeps, self._jtypes,
            self._sensors,
            continuous=self.builder.def_.enable_continuous,
            particle_cfg=self._pcfg, use_pallas=self._use_pallas,
            custom_filter=getattr(self, "_custom_filter", None),
            pre_solve=getattr(self, "_pre_solve", None))
        self._step_light = None  # built lazily on first run() (extra trace)
        self._run_fns = None  # cached scan fns close over the old step

    def _get_light_step(self):
        """Step variant with event compaction skipped (world.make_step
        light_events) — used for run()'s scanned prefix, whose per-frame
        event arrays are overwritten before anyone can read them."""
        if getattr(self, "_step_light", None) is None:
            self._step_light = make_step(
                self.capacity, self._classes, self.substeps, self._jtypes,
                self._sensors,
                continuous=self.builder.def_.enable_continuous,
                particle_cfg=self._pcfg, use_pallas=self._use_pallas,
                custom_filter=getattr(self, "_custom_filter", None),
                pre_solve=getattr(self, "_pre_solve", None),
                light_events=True)
        return self._step_light

    # -- user hooks (ref: api/World.cs SetCustomFilterCallback /
    # SetPreSolveCallback; include/Types.cs:813,:827) -----------------------

    def set_custom_filter(self, fn) -> None:
        """Install a jittable pair filter
        `fn(state, shape_a_ids, shape_b_ids) -> keep mask`, evaluated when
        candidate pairs are (re)built (see world.make_step docstring).
        Pass None to remove. Triggers a step re-trace."""
        self._custom_filter = fn
        if self.state is not None:
            self._remake_step()
            self._mark_broadphase_dirty()

    def set_pre_solve(self, fn) -> None:
        """Install a jittable pre-solve hook
        `fn(state, shape_a_ids, shape_b_ids, manifold) -> keep mask`,
        evaluated on fresh manifolds every step — the one-way-platform
        hook (see world.make_step docstring). Pass None to remove."""
        self._pre_solve = fn
        if self.state is not None:
            self._remake_step()

    def step(self, dt: float = 1.0 / 60.0):
        if self._step is None:
            self.compile()
        self.state = self._step(self.state, jnp.float32(dt))
        return self.state

    def run(self, steps: int, dt: float = 1.0 / 60.0,
            max_chunk: int | None = None, collect_events: bool = False):
        """Advance `steps` frames via lax.scan over the step, dispatched in
        bounded chunks. Per-call dispatch latency dominates small worlds —
        on a remote-tunneled chip each step() round trip costs ~ms — so
        batching frames is the single biggest small-scene throughput lever;
        but a single dispatch that runs for minutes (100k-particle or
        multi-thousand-body scenes) gets killed by the transport, so large
        scenes split into power-of-two chunks sized inversely to the entity
        count (each chunk length compiles once and is cached).

        collect_events=False (default): events/profile reflect only the
        FINAL frame; returns the new state. The scanned prefix runs a
        LIGHT step (event compaction skipped — those arrays are provably
        discarded); the final frame is a full step, so the returned
        events are exactly what per-step dispatch would produce.
        collect_events=True: every frame's Events pytree is carried out of
        the scan (ys) and returned STACKED with a leading (steps,) axis —
        the analog of consuming the reference's per-step event buffers
        (ref: src/World.cs:101-111) without leaving the device between
        frames. Returns (state, events_stacked)."""
        if self._step is None:
            self.compile()
        if max_chunk is None:
            ent = self.state.bodies.center.shape[0]
            if self.state.particles is not None:
                ent += self.state.particles.pos.shape[0]
            max_chunk = max(1, 2_000_000 // max(ent, 1))
        chunk = min(steps, max_chunk)
        if chunk < steps:
            chunk = 1 << (chunk.bit_length() - 1)  # pow2: few cached fns
        if not hasattr(self, "_run_fns") or self._run_fns is None:
            self._run_fns = {}
        inner = self._step if collect_events else self._get_light_step()

        def get_fn(length):
            fn = self._run_fns.get((length, collect_events))
            if fn is None:
                if collect_events:
                    def multi(state, dt_, _length=length):
                        def one(s, _):
                            ns = inner(s, dt_)
                            return ns, ns.events

                        return jax.lax.scan(one, state, None, length=_length)
                else:
                    def multi(state, dt_, _length=length):
                        return jax.lax.scan(
                            lambda s, _: (inner(s, dt_), None),
                            state, None, length=_length)[0]

                fn = jax.jit(multi)
                self._run_fns[(length, collect_events)] = fn
            return fn

        dt_f = jnp.float32(dt)
        # without event collection the prefix scans the light step and the
        # LAST frame runs the full step so final events/profile are real;
        # the pow2 chunk decomposition is kept and only the final piece is
        # shaved by one frame (one extra dispatch total, not a re-split)
        left = steps
        ev_chunks = []
        while left > 0:
            # pow2 pieces only (240 = 128+64+32+16) so the set of compiled
            # scan lengths stays logarithmic
            n = min(chunk, 1 << (left.bit_length() - 1)) if chunk < steps \
                else left
            if not collect_events and n == left:
                n = n - 1          # final frame runs as a full step below
                if n == 0:
                    break
            out = get_fn(n)(self.state, dt_f)
            if collect_events:
                self.state, evs = out
                ev_chunks.append(evs)
            else:
                self.state = out
            left -= n
            if not collect_events and left == 1:
                break
        if not collect_events:
            self.state = self._step(self.state, dt_f)
        if collect_events:
            events = (ev_chunks[0] if len(ev_chunks) == 1 else jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *ev_chunks))
            return self.state, events
        return self.state

    # -- accessors (ref: api/Body.cs getters) -------------------------------

    def body_position(self, body: int) -> np.ndarray:
        """Body origin position (ref: BodyAPI.GetPosition)."""
        body = self._bid(body)
        b = self.state.bodies
        origin = b.center[body] - m.rot_vec(b.rot[body], b.local_center[body])
        return np.asarray(origin)

    def body_angle(self, body: int) -> float:
        body = self._bid(body)
        b = self.state.bodies
        return float(jnp.arctan2(b.rot[body, 1], b.rot[body, 0]))

    def body_linear_velocity(self, body: int) -> np.ndarray:
        body = self._bid(body)
        return np.asarray(self.state.bodies.v[body])

    def body_angular_velocity(self, body: int) -> float:
        body = self._bid(body)
        return float(self.state.bodies.w[body])

    # -- mutators (post-compile, ref: api/Body.cs setters) -------------------

    def set_linear_velocity(self, body: int, v):
        body = self._bid(body)
        bd = self.state.bodies
        self.state = dataclasses.replace(
            self.state,
            bodies=dataclasses.replace(
                bd, v=bd.v.at[body].set(jnp.asarray(v, jnp.float32))))
        # ref: api/Body.cs:363 — a nonzero velocity wakes the body
        if float(np.hypot(*np.asarray(v, np.float32))) > 0:
            self.wake_body(body)

    def set_angular_velocity(self, body: int, w: float):
        body = self._bid(body)
        if w != 0.0:
            self.wake_body(body)  # ref: api/Body.cs:374
        bd = self.state.bodies
        self.state = dataclasses.replace(
            self.state,
            bodies=dataclasses.replace(bd, w=bd.w.at[body].set(jnp.float32(w))))

    def apply_force_to_center(self, body: int, force, wake=True):
        body = self._bid(body)
        if wake:
            self.wake_body(body)
        bd = self.state.bodies
        self.state = dataclasses.replace(
            self.state,
            bodies=dataclasses.replace(
                bd, force=bd.force.at[body].add(jnp.asarray(force, jnp.float32))))

    def apply_linear_impulse_to_center(self, body: int, impulse, wake=True):
        body = self._bid(body)
        if wake:
            self.wake_body(body)
        bd = self.state.bodies
        dv = jnp.asarray(impulse, jnp.float32) * bd.inv_mass[body]
        self.state = dataclasses.replace(
            self.state,
            bodies=dataclasses.replace(bd, v=bd.v.at[body].add(dv)))

    def apply_torque(self, body: int, torque: float, wake=True):
        body = self._bid(body)
        if wake:
            self.wake_body(body)
        bd = self.state.bodies
        self.state = dataclasses.replace(
            self.state,
            bodies=dataclasses.replace(
                bd, torque=bd.torque.at[body].add(jnp.float32(torque))))

    def body_transform(self, body: int):
        """(position, angle) of the body origin (ref: BodyAPI.GetTransform)."""
        body = self._bid(body)
        return self.body_position(body), self.body_angle(body)

    def body_mass(self, body: int) -> float:
        body = self._bid(body)
        return float(self.state.bodies.mass[body])

    def body_rotational_inertia(self, body: int) -> float:
        body = self._bid(body)
        return float(self.state.bodies.inertia[body])

    def body_local_center(self, body: int) -> np.ndarray:
        body = self._bid(body)
        return np.asarray(self.state.bodies.local_center[body])

    def body_world_center(self, body: int) -> np.ndarray:
        body = self._bid(body)
        return np.asarray(self.state.bodies.center[body])

    def body_is_awake(self, body: int) -> bool:
        body = self._bid(body)
        return bool(self.state.bodies.awake[body])

    def local_point(self, body: int, world_point):
        body = self._bid(body)
        b = self.state.bodies
        origin = b.center[body] - m.rot_vec(b.rot[body], b.local_center[body])
        return np.asarray(m.inv_transform_point(
            origin, b.rot[body], jnp.asarray(world_point, jnp.float32)))

    def world_point(self, body: int, local_point):
        body = self._bid(body)
        b = self.state.bodies
        origin = b.center[body] - m.rot_vec(b.rot[body], b.local_center[body])
        return np.asarray(m.transform_point(
            origin, b.rot[body], jnp.asarray(local_point, jnp.float32)))

    def _update_bodies(self, **cols):
        self.state = dataclasses.replace(
            self.state,
            bodies=dataclasses.replace(self.state.bodies, **cols))

    # -- per-body enumeration & derived getters (ref: api/Body.cs) ---------

    def body_shapes(self, body: int) -> list:
        """Shape handles attached to a body (ref: BodyAPI.GetShapes /
        GetShapeCount — the linked list becomes a mask scan)."""
        body = self._bid(body)
        owner = np.asarray(self.state.shapes.body)
        alive = np.asarray(self.state.shapes.enabled)
        gens = getattr(self, "_shape_gen", None)
        return [self._handle(i, gens) if gens is not None else int(i)
                for i in np.nonzero((owner == body) & alive)[0]]

    def body_joints(self, body: int) -> list:
        """Joint handles attached to a body (ref: BodyAPI.GetJoints)."""
        body = self._bid(body)
        jn = self.state.joints
        on = ((np.asarray(jn.body_a) == body)
              | (np.asarray(jn.body_b) == body))
        on &= np.asarray(jn.enabled) & (np.asarray(jn.type) >= 0)
        gens = getattr(self, "_joint_gen", None)
        return [self._handle(i, gens) if gens is not None else int(i)
                for i in np.nonzero(on)[0]]

    def body_contact_data(self, body: int) -> list:
        """Touching contacts involving the body (ref:
        BodyAPI.GetContactData): [(shape_a, shape_b, normal, points), ...]
        assembled from the persistent contact store + this body's shapes."""
        shapes = set(self._decode(h, getattr(self, "_shape_gen", None),
                                  "shape") for h in self.body_shapes(body))
        out = []
        for sa, sb, nrm, pts in self.contact_data():
            if sa in shapes or sb in shapes:
                out.append((sa, sb, nrm, pts))
        return out

    def apply_force(self, body: int, force, point, wake=True):
        """Force at a world point: force + induced torque
        (ref: BodyAPI.ApplyForce)."""
        blane = self._bid(body)
        if wake:
            self.wake_body(body)
        bd = self.state.bodies
        f = jnp.asarray(force, jnp.float32)
        lever = jnp.asarray(point, jnp.float32) - bd.center[blane]
        self._update_bodies(
            force=bd.force.at[blane].add(f),
            torque=bd.torque.at[blane].add(m.cross(lever, f)))

    def clear_forces(self, body: int):
        """ref: BodyAPI.ClearForces."""
        blane = self._bid(body)
        bd = self.state.bodies
        self._update_bodies(force=bd.force.at[blane].set(0.0),
                            torque=bd.torque.at[blane].set(0.0))

    def local_vector(self, body: int, world_vector):
        blane = self._bid(body)
        return np.asarray(m.inv_rot_vec(
            self.state.bodies.rot[blane],
            jnp.asarray(world_vector, jnp.float32)))

    def world_vector(self, body: int, local_vector):
        blane = self._bid(body)
        return np.asarray(m.rot_vec(
            self.state.bodies.rot[blane],
            jnp.asarray(local_vector, jnp.float32)))

    def world_point_velocity(self, body: int, world_point):
        """Velocity of a body-attached world point (ref:
        BodyAPI.GetWorldPointVelocity)."""
        blane = self._bid(body)
        bd = self.state.bodies
        r = jnp.asarray(world_point, jnp.float32) - bd.center[blane]
        return np.asarray(bd.v[blane] + m.cross_sv(bd.w[blane], r))

    def local_point_velocity(self, body: int, local_point):
        """ref: BodyAPI.GetLocalPointVelocity."""
        return self.world_point_velocity(
            body, self.world_point(body, local_point))

    def body_mass_data(self, body: int) -> tuple:
        """(mass, local center, rotational inertia) (ref: GetMassData)."""
        blane = self._bid(body)
        bd = self.state.bodies
        return (float(bd.mass[blane]),
                np.asarray(bd.local_center[blane]),
                float(bd.inertia[blane]))

    def set_mass_data(self, body: int, mass: float, center, inertia: float):
        """Override mass properties (ref: BodyAPI.SetMassData); COM moves
        with the new local center like the reference does."""
        blane = self._bid(body)
        bd = self.state.bodies
        lc = jnp.asarray(center, jnp.float32)
        origin = bd.origin[blane]
        new_center = origin + m.rot_vec(bd.rot[blane], lc)
        inv_m = 1.0 / mass if mass > 0 else 0.0
        inv_i = 1.0 / inertia if inertia > 0 else 0.0
        self._update_bodies(
            mass=bd.mass.at[blane].set(mass),
            inv_mass=bd.inv_mass.at[blane].set(inv_m),
            inertia=bd.inertia.at[blane].set(inertia),
            inv_inertia=bd.inv_inertia.at[blane].set(inv_i),
            local_center=bd.local_center.at[blane].set(lc),
            center=bd.center.at[blane].set(new_center))

    def apply_mass_from_shapes(self, body: int):
        """Recompute mass from attached shapes (ref: ApplyMassFromShapes)."""
        self._recompute_mass(self._bid(body))

    def body_motion_locks(self, body: int) -> tuple:
        from .state import LOCK_ANGULAR_Z, LOCK_LINEAR_X, LOCK_LINEAR_Y

        fl = int(np.asarray(self.state.bodies.flags)[self._bid(body)])
        return (bool(fl & LOCK_LINEAR_X), bool(fl & LOCK_LINEAR_Y),
                bool(fl & LOCK_ANGULAR_Z))

    def set_body_motion_locks(self, body: int, lock_x=False, lock_y=False,
                              lock_rotation=False):
        """ref: BodyAPI.SetMotionLocks."""
        from .state import LOCK_ANGULAR_Z, LOCK_LINEAR_X, LOCK_LINEAR_Y

        blane = self._bid(body)
        bd = self.state.bodies
        fl = int(np.asarray(bd.flags)[blane])
        fl &= ~(LOCK_LINEAR_X | LOCK_LINEAR_Y | LOCK_ANGULAR_Z)
        fl |= ((LOCK_LINEAR_X if lock_x else 0)
               | (LOCK_LINEAR_Y if lock_y else 0)
               | (LOCK_ANGULAR_Z if lock_rotation else 0))
        self._update_bodies(flags=bd.flags.at[blane].set(fl))

    def is_bullet(self, body: int) -> bool:
        from .state import IS_BULLET

        return bool(int(np.asarray(self.state.bodies.flags)[
            self._bid(body)]) & IS_BULLET)

    def set_bullet(self, body: int, flag: bool):
        """ref: BodyAPI.SetBullet."""
        from .state import IS_BULLET

        blane = self._bid(body)
        bd = self.state.bodies
        fl = int(np.asarray(bd.flags)[blane])
        fl = (fl | IS_BULLET) if flag else (fl & ~IS_BULLET)
        self._update_bodies(flags=bd.flags.at[blane].set(fl))

    def set_body_user_data(self, body: int, tag: int):
        blane = self._bid(body)
        bd = self.state.bodies
        self._update_bodies(user_data=bd.user_data.at[blane].set(int(tag)))

    def body_user_data(self, body: int) -> int:
        return int(np.asarray(self.state.bodies.user_data)[self._bid(body)])

    def set_sleep_threshold(self, body: int, v: float):
        blane = self._bid(body)
        bd = self.state.bodies
        self._update_bodies(
            sleep_threshold=bd.sleep_threshold.at[blane].set(float(v)))

    def set_linear_damping(self, body: int, v: float):
        blane = self._bid(body)
        bd = self.state.bodies
        self._update_bodies(
            linear_damping=bd.linear_damping.at[blane].set(float(v)))

    def set_angular_damping(self, body: int, v: float):
        blane = self._bid(body)
        bd = self.state.bodies
        self._update_bodies(
            angular_damping=bd.angular_damping.at[blane].set(float(v)))

    def set_gravity_scale(self, body: int, v: float):
        blane = self._bid(body)
        bd = self.state.bodies
        self._update_bodies(
            gravity_scale=bd.gravity_scale.at[blane].set(float(v)))

    def body_compute_aabb(self, body: int) -> np.ndarray:
        """Union AABB over the body's shapes (ref: BodyAPI.ComputeAABB)."""
        aabbs = [self.shape_aabb(s) for s in self.body_shapes(body)]
        if not aabbs:
            p = self.body_position(body)
            return np.concatenate([p, p])
        a = np.stack(aabbs)
        return np.concatenate([a[:, :2].min(0), a[:, 2:].max(0)])

    def wake_touching(self, body: int):
        """Wake bodies touching this one (ref: BodyAPI.WakeTouching)."""
        blane = self._bid(body)
        cs = self.state.contacts
        ka = np.asarray(cs.key_a)
        kb = np.asarray(cs.key_b)
        touch = np.asarray(cs.touching)
        owner = np.asarray(self.state.shapes.body)
        gens = getattr(self, "_body_gen", None)
        for lane in np.nonzero(touch & (ka >= 0))[0]:
            ba = int(owner[ka[lane]])
            bb = int(owner[kb[lane]])
            if blane in (ba, bb):
                other = bb if ba == blane else ba
                self.wake_body(self._handle(other, gens)
                               if gens is not None else other)

    def set_target_transform(self, body: int, position, angle: float,
                             dt: float):
        """Kinematic drive: velocities that reach the target pose in dt
        (ref: BodyAPI.SetTargetTransform)."""
        blane = self._bid(body)
        bd = self.state.bodies
        origin = np.asarray(bd.origin[blane])
        cur_a = float(np.arctan2(np.asarray(bd.rot[blane, 1]),
                                 np.asarray(bd.rot[blane, 0])))
        dpos = (np.asarray(position, np.float32) - origin) / dt
        da = float(angle) - cur_a
        da = (da + np.pi) % (2 * np.pi) - np.pi
        self.set_linear_velocity(body, dpos)
        self.set_angular_velocity(body, da / dt)

    def set_transform(self, body: int, position, angle: float):
        """Teleport a body (ref: BodyAPI.SetTransform — the reference moves
        the proxies immediately; here the dirty flag forces a pair rebuild
        even when the whole world is asleep, which would otherwise skip the
        step via the idle fast path and leave the teleport pair-invisible)."""
        body = self._bid(body)
        bd = self.state.bodies
        q = jnp.asarray([jnp.cos(angle), jnp.sin(angle)], jnp.float32)
        center = jnp.asarray(position, jnp.float32) + m.rot_vec(
            q, bd.local_center[body])
        self._update_bodies(
            center=bd.center.at[body].set(center),
            rot=bd.rot.at[body].set(q))
        self._mark_broadphase_dirty()

    def wake_body(self, body: int):
        """Wake a body AND its island (ref: src/Body.cs:245-254 WakeBody
        wakes the whole sleeping solver set): a woken body pushing its
        island-mates through already-existing contacts would never re-wake
        them via the new-touch path."""
        body = self._bid(body)
        bd = self.state.bodies
        label = bd.island_label[body]
        mates = ((bd.island_label == label) & (bd.type == 2) & bd.enabled)
        wake = mates | (jnp.arange(bd.awake.shape[0]) == body)
        self._update_bodies(
            awake=bd.awake | wake,
            sleep_time=jnp.where(wake, 0.0, bd.sleep_time))

    def set_body_enabled(self, body: int, enabled: bool):
        body = self._bid(body)
        bd = self.state.bodies
        self._update_bodies(enabled=bd.enabled.at[body].set(bool(enabled)))
        # enabling/disabling removes or restores the body's constraint
        # edges without a touch event — islands must re-partition
        self._mark_islands_dirty()

    def apply_angular_impulse(self, body: int, impulse: float, wake=True):
        body = self._bid(body)
        bd = self.state.bodies
        self._update_bodies(
            w=bd.w.at[body].add(jnp.float32(impulse) * bd.inv_inertia[body]),
            awake=bd.awake.at[body].set(True))

    def apply_linear_impulse(self, body: int, impulse, point, wake=True):
        body = self._bid(body)
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
    # Runtime typed get/setters (ref: api/Joint.cs:182-812, ~150 functions
    # collapsed onto the shared parameter union of state.Joints). All writes
    # are lane updates into traced arrays — no recompile — so an RL loop can
    # retarget motors every step.

    def _set_joint(self, joint: int, wake: bool = True, **fields):
        joint = self._jid(joint)
        jn = self.state.joints
        upd = {}
        for name, val in fields.items():
            arr = getattr(jn, name)
            upd[name] = arr.at[joint].set(jnp.asarray(val, arr.dtype))
        self.state = dataclasses.replace(
            self.state, joints=dataclasses.replace(jn, **upd))
        if wake:
            for bidx in (int(jn.body_a[joint]), int(jn.body_b[joint])):
                if bidx >= 0:
                    self.wake_body(bidx)

    def joint_param(self, joint: int, field: str):
        """Read any joint parameter column (ref: the Joint_Get* surface)."""
        joint = self._jid(joint)
        return np.asarray(getattr(self.state.joints, field)[joint])

    def enable_joint_motor(self, joint: int, flag: bool):
        """ref: RevoluteJoint_EnableMotor / PrismaticJoint_EnableMotor /
        WheelJoint_EnableMotor / DistanceJoint_EnableMotor."""
        self._set_joint(joint, enable_motor=flag)

    def set_joint_motor_speed(self, joint: int, speed: float):
        """ref: *Joint_SetMotorSpeed (rad/s or m/s by type)."""
        self._set_joint(joint, motor_speed=speed)

    def set_joint_max_motor_force(self, joint: int, force: float):
        """ref: *Joint_SetMaxMotorForce / SetMaxMotorTorque."""
        self._set_joint(joint, max_motor_force=force)

    def enable_joint_limit(self, joint: int, flag: bool):
        """ref: *Joint_EnableLimit."""
        self._set_joint(joint, enable_limit=flag)

    def set_joint_limits(self, joint: int, lower: float, upper: float):
        """ref: *Joint_SetLimits (angle/translation/length by type)."""
        self._set_joint(joint, lower=lower, upper=upper)

    def enable_joint_spring(self, joint: int, flag: bool):
        """ref: *Joint_EnableSpring."""
        self._set_joint(joint, enable_spring=flag)

    def set_joint_spring_hertz(self, joint: int, hertz: float):
        """ref: *Joint_SetSpringHertz."""
        self._set_joint(joint, hertz=hertz)

    def set_joint_spring_damping_ratio(self, joint: int, zeta: float):
        """ref: *Joint_SetSpringDampingRatio."""
        self._set_joint(joint, damping_ratio=zeta)

    def set_joint_spring_target(self, joint: int, target: float):
        """ref: RevoluteJoint_SetTargetAngle / PrismaticJoint spring
        target."""
        self._set_joint(joint, spring_target=target)

    def set_joint_angular_spring(self, joint: int, hertz: float,
                                 zeta: float):
        """ref: WeldJoint_SetAngularHertz/DampingRatio,
        MotorJoint angular spring."""
        self._set_joint(joint, angular_hertz=hertz,
                        angular_damping_ratio=zeta)

    def set_distance_joint_length(self, joint: int, length: float):
        """ref: DistanceJoint_SetLength."""
        self._set_joint(joint, length=length)

    def set_distance_joint_spring_forces(self, joint: int, lower: float,
                                         upper: float):
        """ref: DistanceJoint_SetSpringForceRange."""
        self._set_joint(joint, lower_spring_force=lower,
                        upper_spring_force=upper)

    def set_motor_joint_velocity(self, joint: int, linear, angular: float):
        """ref: MotorJoint_SetLinearVelocity / SetAngularVelocity."""
        self._set_joint(joint, linear_velocity=linear,
                        angular_velocity=angular)

    def set_motor_joint_max_force(self, joint: int, force: float,
                                  torque: float):
        """ref: MotorJoint_SetMaxVelocityForce / Torque."""
        self._set_joint(joint, max_velocity_force=force,
                        max_velocity_torque=torque)

    def set_joint_thresholds(self, joint: int, force: float, torque: float):
        """ref: Joint_SetForceThreshold / SetTorqueThreshold (events)."""
        self._set_joint(joint, force_threshold=force,
                        torque_threshold=torque, wake=False)

    def set_joint_enabled(self, joint: int, flag: bool):
        """ref: Joint_SetEnabled (wakes both bodies either way).

        The stored graph color is cleared on every enabled-flip: a disabled
        joint releases its color reservation (world.py all_reserved), so the
        color may be granted to another constraint on the same body while
        it's off — inheriting the stale value on re-enable would let two
        same-color constraints share a body (a solve-order race) and corrupt
        the used-mask bit carry in repair_colors. Clearing forces a fresh
        repair round instead."""
        self._set_joint(joint, enabled=flag, color=-1)
        self._mark_islands_dirty()

    def set_mouse_target(self, joint: int, target):
        """Move a mouse joint's world target (ref: MouseJoint SetTarget)."""
        joint = self._jid(joint)
        jn = self.state.joints
        self.state = dataclasses.replace(
            self.state,
            joints=dataclasses.replace(
                jn, frame_a_p=jn.frame_a_p.at[joint].set(
                    jnp.asarray(target, jnp.float32))))
        self.wake_body(self._handle(int(jn.body_b[joint]),
                                    self._body_gen))

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

    def join_particle_groups(self, group_a: int, group_b: int):
        """Merge group_b into group_a, creating spring pairs / elastic
        triads across the seam from CURRENT positions (ref:
        particle/ParticleSystem.cs JoinParticleGroups + the join filter in
        UpdatePairsAndTriads). Growing the pair/triad arrays changes their
        shapes, so the next step() retraces once."""
        from .particles import P_ELASTIC, P_SPRING, PARTICLE_STRIDE
        from .native import build_pairs_native, build_triads_native

        pt = self.state.particles
        group = np.asarray(pt.group).copy()
        alive = np.asarray(pt.alive)
        pos = np.asarray(pt.pos)
        pflags = np.asarray(pt.flags)
        in_a = (group == group_a) & alive
        in_b = (group == group_b) & alive
        group[in_b] = group_a
        gflags = np.asarray(pt.group_flags).copy()
        gflags[group_a] |= gflags[group_b]
        from .particles import G_NEEDS_DEPTH, G_SOLID
        if gflags[group_a] & G_SOLID:
            gflags[group_a] |= G_NEEDS_DEPTH  # re-derive depth after a join
        gstrength = np.asarray(pt.group_strength)
        strength = float(min(gstrength[group_a], gstrength[group_b]))

        idx = np.where(in_a | in_b)[0]
        d = 2.0 * float(np.asarray(pt.params.radius))
        new_pairs, new_triads = [], []
        if len(idx) >= 2:
            pts = pos[idx].astype(np.float32)
            from_b = in_b[idx]
            union_flags = int(np.bitwise_or.reduce(pflags[idx]))
            if union_flags & P_SPRING:
                res = build_pairs_native(pts, d * 1.2)
                if res is None:
                    res = _pairs_fallback(pts, d * 1.2)
                la, lb, dist = res
                for k in range(len(la)):
                    a, b = int(la[k]), int(lb[k])
                    if from_b[a] == from_b[b]:
                        continue  # keep only seam-crossing connections
                    fl = int(pflags[idx[a]] | pflags[idx[b]])
                    if fl & P_SPRING:
                        new_pairs.append((int(idx[a]), int(idx[b]), fl,
                                          strength, float(dist[k])))
            if union_flags & P_ELASTIC:
                res = build_triads_native(pts, PARTICLE_STRIDE * d)
                if res is not None:
                    tri, rest = res
                    for k in range(len(tri)):
                        ta, tb, tc = (int(v) for v in tri[k])
                        if from_b[ta] == from_b[tb] == from_b[tc]:
                            continue
                        fl = int(pflags[idx[ta]] | pflags[idx[tb]]
                                 | pflags[idx[tc]])
                        if fl & P_ELASTIC:
                            new_triads.append(
                                (int(idx[ta]), int(idx[tb]), int(idx[tc]),
                                 fl, strength,
                                 rest[k, 0], rest[k, 1], rest[k, 2]))

        pt = dataclasses.replace(
            pt, group=jnp.asarray(group),
            group_flags=jnp.asarray(gflags))
        if new_pairs:
            pt = dataclasses.replace(
                pt,
                pair_a=jnp.concatenate([pt.pair_a, jnp.asarray(
                    [p[0] for p in new_pairs], jnp.int32)]),
                pair_b=jnp.concatenate([pt.pair_b, jnp.asarray(
                    [p[1] for p in new_pairs], jnp.int32)]),
                pair_flags=jnp.concatenate([pt.pair_flags, jnp.asarray(
                    [p[2] for p in new_pairs], jnp.int32)]),
                pair_strength=jnp.concatenate([pt.pair_strength, jnp.asarray(
                    [p[3] for p in new_pairs], jnp.float32)]),
                pair_distance=jnp.concatenate([pt.pair_distance, jnp.asarray(
                    [p[4] for p in new_pairs], jnp.float32)]))
        if new_triads:
            pt = dataclasses.replace(
                pt,
                triad_a=jnp.concatenate([pt.triad_a, jnp.asarray(
                    [t_[0] for t_ in new_triads], jnp.int32)]),
                triad_b=jnp.concatenate([pt.triad_b, jnp.asarray(
                    [t_[1] for t_ in new_triads], jnp.int32)]),
                triad_c=jnp.concatenate([pt.triad_c, jnp.asarray(
                    [t_[2] for t_ in new_triads], jnp.int32)]),
                triad_flags=jnp.concatenate([pt.triad_flags, jnp.asarray(
                    [t_[3] for t_ in new_triads], jnp.int32)]),
                triad_strength=jnp.concatenate(
                    [pt.triad_strength, jnp.asarray(
                        [t_[4] for t_ in new_triads], jnp.float32)]),
                triad_pa=jnp.concatenate([pt.triad_pa, jnp.asarray(
                    np.stack([t_[5] for t_ in new_triads]), jnp.float32)]),
                triad_pb=jnp.concatenate([pt.triad_pb, jnp.asarray(
                    np.stack([t_[6] for t_ in new_triads]), jnp.float32)]),
                triad_pc=jnp.concatenate([pt.triad_pc, jnp.asarray(
                    np.stack([t_[7] for t_ in new_triads]), jnp.float32)]))
        self.state = dataclasses.replace(self.state, particles=pt)
        return group_a

    def split_particle_group(self, group: int) -> list[int]:
        """Split a group into its connected components over current
        proximity (< diameter), like ref SplitParticleGroup's contact-graph
        component labeling. The largest component keeps `group`; each other
        component gets a fresh group id (group_flags/strength copied).
        Returns the list of all resulting group ids."""
        pt = self.state.particles
        garr = np.asarray(pt.group).copy()
        alive = np.asarray(pt.alive)
        pos = np.asarray(pt.pos)
        members = np.where((garr == group) & alive)[0]
        if len(members) == 0:
            return [group]
        d = 2.0 * float(np.asarray(pt.params.radius))

        # union-find over a cell hash (cell = diameter, check 3x3 window)
        parent = {int(i): int(i) for i in members}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        cells: dict = {}
        for i in members:
            cells.setdefault((int(pos[i, 0] // d), int(pos[i, 1] // d)),
                             []).append(int(i))
        for (cx, cy), occupants in cells.items():
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    other = cells.get((cx + dx, cy + dy))
                    if other is None:
                        continue
                    for i in occupants:
                        for j in other:
                            if j <= i:
                                continue
                            if np.hypot(*(pos[i] - pos[j])) < d:
                                ri, rj = find(i), find(j)
                                if ri != rj:
                                    parent[ri] = rj
        comps: dict = {}
        for i in members:
            comps.setdefault(find(int(i)), []).append(int(i))
        ordered = sorted(comps.values(), key=len, reverse=True)
        gflags = np.asarray(pt.group_flags)
        gstrength = np.asarray(pt.group_strength)
        gids = [group]
        for comp in ordered[1:]:
            gid = len(gflags)
            gflags = np.append(gflags, gflags[group])
            gstrength = np.append(gstrength, gstrength[group])
            garr[comp] = gid
            gids.append(gid)
        self.state = dataclasses.replace(
            self.state,
            particles=dataclasses.replace(
                pt, group=jnp.asarray(garr),
                group_flags=jnp.asarray(gflags),
                group_strength=jnp.asarray(gstrength, jnp.float32)))
        return gids

    def apply_wind_force(self, shape: int, wind, drag: float, lift: float,
                         air_density: float = 1.225, wake: bool = True):
        """Aerodynamic wind force on one shape (ref: api/Shape.cs:455-476
        ApplyWindForce + the per-shape implementations in
        include/Collision.cs — circle :172, capsule :353, polygon :608).
        Like the reference API gate, only circle/segment/polygon shapes
        receive force, and only on awake (or woken) dynamic bodies. Note:
        the reference's polygon variant crosses LOCAL edge vectors with the
        WORLD wind direction (frame mixing, Collision.cs:604-617); here
        edges are rotated to world first."""
        shape = self._sid(shape)
        from . import geometry as geo
        sh = self.state.shapes
        b = self.state.bodies
        stype = int(np.asarray(sh.type[shape]))
        if stype not in (geo.CIRCLE, geo.SEGMENT, geo.POLYGON):
            return
        bi = int(np.asarray(sh.body[shape]))
        if int(np.asarray(b.type[bi])) != 2:  # DYNAMIC
            return
        if not bool(np.asarray(b.awake[bi])):
            if not wake:
                return
            self.wake_body(bi)
            b = self.state.bodies
        c, s = (float(v) for v in np.asarray(b.rot[bi]))
        R = np.array([[c, -s], [s, c]], np.float64)
        lc = np.asarray(b.local_center[bi], np.float64)
        centroid = np.asarray(sh.centroid[shape], np.float64)
        lever = R @ (centroid - lc)
        w = float(np.asarray(b.w[bi]))
        shape_vel = (np.asarray(b.v[bi], np.float64)
                     + w * np.array([-lever[1], lever[0]]))
        rel = float(drag) * np.asarray(wind, np.float64) - shape_vel
        speed = float(np.hypot(*rel))
        if speed == 0.0:
            return
        direction = rel / speed
        cr = lambda a, bb_: a[0] * bb_[1] - a[1] * bb_[0]
        csv = lambda sc, v: sc * np.array([-v[1], v[0]])
        mag0 = 0.5 * float(air_density) * speed * speed
        verts = np.asarray(sh.verts[shape], np.float64)
        radius = float(np.asarray(sh.radius[shape]))
        if stype == geo.CIRCLE:
            force = mag0 * (2.0 * radius) * direction
            torque = cr(lever, force)
        elif stype == geo.SEGMENT:
            d = R @ (verts[1] - verts[0])
            area = 2.0 * radius + abs(cr(d, direction))
            dl = np.hypot(*d)
            n = (np.array([-d[1], d[0]]) / dl) if dl > 0 else np.zeros(2)
            if np.dot(n, direction) > 0:
                n = -n
            lift_dir = csv(cr(n, direction), direction)
            force = mag0 * area * (direction + float(lift) * lift_dir)
            torque = cr(lever + radius * n, force)
        else:  # polygon: per windward edge (ref Collision.cs:604-617)
            count = int(np.asarray(sh.count[shape]))
            force = np.zeros(2)
            torque = 0.0
            for i in range(count):
                v1 = verts[i - 1]
                v2 = verts[i]
                d = R @ (v2 - v1)
                area = cr(d, direction)
                if area <= 0:
                    continue
                dl = np.hypot(*d)
                n = np.array([d[1], -d[0]]) / dl  # right perp
                lift_dir = csv(cr(n, direction), direction)
                f = mag0 * area * (direction + float(lift) * lift_dir)
                edge_lever = R @ (0.5 * (v1 + v2) - lc)
                force = force + f
                torque += cr(edge_lever, f)
        self.state = dataclasses.replace(
            self.state,
            bodies=dataclasses.replace(
                b,
                force=b.force.at[bi].add(
                    jnp.asarray(force, jnp.float32)),
                torque=b.torque.at[bi].add(jnp.float32(torque))))

    def set_contact_softening(self, enabled: bool):
        """Toggle mass-ratio contact softening (ref: WorldDef
        enableContactSoftening, include/Types.cs:106)."""
        self.state = dataclasses.replace(
            self.state,
            tuning=dataclasses.replace(
                self.state.tuning,
                enable_contact_softening=jnp.bool_(enabled)))

    def overlap_particles(self, lo, hi) -> np.ndarray:
        """Indices of alive particles inside an AABB (the callback-free
        analog of ref ParticleSystem.QueryAABB, particle/World.cs:64-76)."""
        pt = self.state.particles
        lo = np.asarray(lo, np.float32)
        hi = np.asarray(hi, np.float32)
        pos = np.asarray(pt.pos)
        inside = (np.asarray(pt.alive)
                  & np.all((pos >= lo) & (pos <= hi), axis=1))
        return np.where(inside)[0]

    def cast_ray_particles(self, origin, translation):
        """Closest particle hit by a ray segment (callback-free analog of
        ref ParticleSystem.RayCast, particle/World.cs:78-98). Returns
        (index, fraction, point, normal); index -1 if no hit."""
        pt = self.state.particles
        o = np.asarray(origin, np.float64)
        d = np.asarray(translation, np.float64)
        r = float(np.asarray(pt.params.radius))
        pos = np.asarray(pt.pos, np.float64)
        alive = np.asarray(pt.alive)
        # |o + t d - p|^2 = r^2  ->  t^2 (d.d) + 2 t d.(o-p) + |o-p|^2 - r^2
        q = o[None, :] - pos
        a = float(d @ d)
        b2_ = q @ d
        c_ = np.sum(q * q, axis=1) - r * r
        disc = b2_ * b2_ - a * c_
        ok = alive & (disc >= 0) & (a > 0)
        sq = np.sqrt(np.maximum(disc, 0.0))
        t = np.where(ok, (-b2_ - sq) / max(a, 1e-12), np.inf)
        t = np.where((t >= 0) & (t <= 1), t, np.inf)
        i = int(np.argmin(t))
        if not np.isfinite(t[i]):
            return -1, 1.0, None, None
        point = o + t[i] * d
        n = point - pos[i]
        nl = np.hypot(*n)
        n = n / nl if nl > 0 else np.array([0.0, 1.0])
        return i, float(t[i]), point.astype(np.float32), n.astype(np.float32)

    def byte_count(self) -> int:
        """Device bytes held by the world state (ref: WorldAPI
        GetByteCount, api/World.cs:835-842)."""
        return sum(x.nbytes for x in jax.tree.leaves(self.state)
                   if hasattr(x, "nbytes"))

    def stuck_particles(self, threshold: int = 5) -> np.ndarray:
        """Indices of particles wedged against bodies: >= 2 body contacts
        for more than `threshold` consecutive steps (ref:
        ParticleSystem.DetectStuckParticle + GetStuckCandidates)."""
        pt = self.state.particles
        cons = np.asarray(pt.consecutive_contact_steps)
        alive = np.asarray(pt.alive)
        return np.where(alive & (cons > threshold))[0]

    def _mark_islands_dirty(self):
        """Schedule an island label re-propagation — needed after host
        mutations that change the constraint-edge set without a begin/end
        touch event (joint enable/disable, body type flips, destroys)."""
        self.state = dataclasses.replace(
            self.state,
            bodies=dataclasses.replace(
                self.state.bodies, island_dirty=jnp.asarray(True),
                island_fresh=jnp.arange(
                    self.state.bodies.type.shape[0], dtype=jnp.int32)))

    def _mark_broadphase_dirty(self):
        """Force a pair-set rebuild next step — needed after mutations that
        change pair ADMISSIBILITY (filters, body type) rather than position
        (position/aliveness changes are caught by the escape check)."""
        if self.state.broadphase is not None:
            self.state = dataclasses.replace(
                self.state,
                broadphase=dataclasses.replace(
                    self.state.broadphase, dirty=jnp.asarray(True)))
        self._mark_islands_dirty()

    # -- runtime entity lifecycle (post-compile) ---------------------------

    def _spawn_body(self, def_: "t.BodyDef | None" = None, **kw) -> int:
        """Claim a free body lane and write its state (runtime analog of
        ref api/Body.cs:16-105 CreateBody)."""
        import math as _math

        from .state import (ALLOW_FAST_ROTATION, ENABLE_SLEEP, IS_BULLET,
                            LOCK_ANGULAR_Z, LOCK_LINEAR_X, LOCK_LINEAR_Y)

        d = dataclasses.replace(def_ or t.BodyDef(), **kw)
        if not self._free_bodies:
            raise RuntimeError(
                "body capacity exhausted: no free lanes "
                f"(Capacity.max_bodies={self.capacity.max_bodies}); "
                "compile() with a larger capacity")
        lane = self._free_bodies.pop()
        flags = ((LOCK_LINEAR_X if d.lock_linear_x else 0)
                 | (LOCK_LINEAR_Y if d.lock_linear_y else 0)
                 | (LOCK_ANGULAR_Z if d.lock_angular_z else 0)
                 | (IS_BULLET if d.is_bullet else 0)
                 | (ALLOW_FAST_ROTATION if d.allow_fast_rotation else 0)
                 | (ENABLE_SLEEP if d.enable_sleep else 0))
        rot = np.array([_math.cos(d.angle), _math.sin(d.angle)], np.float32)
        b = self.state.bodies
        f32 = jnp.float32
        # shapeless dynamic body: unit mass (ref: src/Body.cs:262-270);
        # _recompute_mass refines once shapes attach
        dyn = d.type == t.DYNAMIC
        self.state = dataclasses.replace(self.state, bodies=dataclasses.replace(
            b,
            center=b.center.at[lane].set(jnp.asarray(d.position, f32)),
            rot=b.rot.at[lane].set(jnp.asarray(rot)),
            v=b.v.at[lane].set(jnp.asarray(d.linear_velocity, f32)),
            w=b.w.at[lane].set(f32(d.angular_velocity)),
            force=b.force.at[lane].set(0.0),
            torque=b.torque.at[lane].set(0.0),
            local_center=b.local_center.at[lane].set(0.0),
            mass=b.mass.at[lane].set(1.0 if dyn else 0.0),
            inv_mass=b.inv_mass.at[lane].set(1.0 if dyn else 0.0),
            inertia=b.inertia.at[lane].set(0.0),
            inv_inertia=b.inv_inertia.at[lane].set(0.0),
            linear_damping=b.linear_damping.at[lane].set(
                f32(d.linear_damping)),
            angular_damping=b.angular_damping.at[lane].set(
                f32(d.angular_damping)),
            gravity_scale=b.gravity_scale.at[lane].set(f32(d.gravity_scale)),
            type=b.type.at[lane].set(int(d.type)),
            flags=b.flags.at[lane].set(flags),
            sleep_time=b.sleep_time.at[lane].set(0.0),
            sleep_threshold=b.sleep_threshold.at[lane].set(
                f32(d.sleep_threshold)),
            min_extent=b.min_extent.at[lane].set(1e8),
            max_extent=b.max_extent.at[lane].set(0.0),
            awake=b.awake.at[lane].set(bool(d.is_awake)),
            enabled=b.enabled.at[lane].set(bool(d.is_enabled)),
            user_data=b.user_data.at[lane].set(int(d.user_data)),
        ))
        self._mark_broadphase_dirty()
        return self._handle(lane, self._body_gen)

    def _spawn_shape(self, body: int, def_: "t.ShapeDef",
                     geom: "g.ShapeGeom") -> int:
        """Claim a free shape lane, write geometry + materials, refresh the
        packed static table row, and recompute the owner's mass (runtime
        analog of ref api/Shape.cs:8-24 + src/Body.cs:255-353)."""
        blane = self._bid(body)
        if not self._free_shapes:
            raise RuntimeError(
                "shape capacity exhausted: no free lanes "
                f"(Capacity.max_shapes={self.capacity.max_shapes})")
        V = max(2, min(self.capacity.max_verts, 8))
        if geom.count > V:
            raise ValueError(
                f"runtime shape has {geom.count} verts > compiled "
                f"Capacity.max_verts={self.capacity.max_verts}")
        lane = self._free_shapes.pop()
        d = def_
        sh = self.state.shapes
        verts8 = np.zeros((8, 2), np.float32)
        norms8 = np.zeros((8, 2), np.float32)
        verts8[:geom.count] = geom.verts[:geom.count]
        norms8[:geom.count] = geom.normals[:geom.count]
        g1 = np.zeros(2, np.float32) if geom.ghost1 is None else geom.ghost1
        g2 = np.zeros(2, np.float32) if geom.ghost2 is None else geom.ghost2
        # packed static table row (layout: narrowphase.build_static_table)
        row = np.concatenate([
            verts8[:V].reshape(-1), norms8[:V].reshape(-1),
            [geom.radius, geom.count, geom.type], g1, g2,
            [d.material.friction, d.material.restitution,
             d.material.rolling_resistance, d.material.tangent_speed,
             float(d.enable_contact_events), float(d.enable_hit_events),
             blane]]).astype(np.float32)
        self.state = dataclasses.replace(self.state, shapes=dataclasses.replace(
            sh,
            body=sh.body.at[lane].set(blane),
            type=sh.type.at[lane].set(int(geom.type)),
            verts=sh.verts.at[lane].set(jnp.asarray(verts8)),
            normals=sh.normals.at[lane].set(jnp.asarray(norms8)),
            count=sh.count.at[lane].set(int(geom.count)),
            radius=sh.radius.at[lane].set(jnp.float32(geom.radius)),
            centroid=sh.centroid.at[lane].set(
                jnp.asarray(geom.centroid, jnp.float32)),
            ghost1=sh.ghost1.at[lane].set(jnp.asarray(g1, jnp.float32)),
            ghost2=sh.ghost2.at[lane].set(jnp.asarray(g2, jnp.float32)),
            friction=sh.friction.at[lane].set(
                jnp.float32(d.material.friction)),
            restitution=sh.restitution.at[lane].set(
                jnp.float32(d.material.restitution)),
            rolling_resistance=sh.rolling_resistance.at[lane].set(
                jnp.float32(d.material.rolling_resistance)),
            tangent_speed=sh.tangent_speed.at[lane].set(
                jnp.float32(d.material.tangent_speed)),
            user_material=sh.user_material.at[lane].set(
                int(d.material.user_material_id)),
            density=sh.density.at[lane].set(jnp.float32(d.density)),
            filter_category=sh.filter_category.at[lane].set(
                d.filter.category_bits),
            filter_mask=sh.filter_mask.at[lane].set(d.filter.mask_bits),
            filter_group=sh.filter_group.at[lane].set(d.filter.group_index),
            is_sensor=sh.is_sensor.at[lane].set(bool(d.is_sensor)),
            enable_contact_events=sh.enable_contact_events.at[lane].set(
                bool(d.enable_contact_events)),
            enable_hit_events=sh.enable_hit_events.at[lane].set(
                bool(d.enable_hit_events)),
            enable_sensor_events=sh.enable_sensor_events.at[lane].set(
                bool(d.enable_sensor_events)),
            enabled=sh.enabled.at[lane].set(True),
            table=sh.table.at[lane].set(jnp.asarray(row)),
        ))
        self._shape_recs[lane] = {"geom": geom, "density": d.density,
                                  "body": blane}
        if d.update_body_mass:
            self._recompute_mass(blane)
        self._refresh_extents(blane)
        # a geometry class the step wasn't traced for (or a new sensor)
        # needs a one-time step re-make
        new_classes = classes_for_shape_types(
            [r["geom"].type for r in self._shape_recs.values()])
        remake = new_classes != self._classes
        self._classes = new_classes
        if d.is_sensor and d.enable_sensor_events:
            self._sensors = tuple(sorted(set(self._sensors) | {lane}))
            remake = True
        if remake:
            self._remake_step()
        self._mark_broadphase_dirty()
        self.wake_body(self._handle(blane, self._body_gen))
        return self._handle(lane, self._shape_gen)

    def _spawn_joint(self, def_) -> int:
        """Claim a free joint lane (runtime analog of ref
        src/Joint.cs:181-296 CreateJoint)."""
        if not self._free_joints:
            raise RuntimeError(
                "joint capacity exhausted: no free lanes "
                f"(Capacity.max_joints={self.capacity.max_joints})")
        lane = self._free_joints.pop()
        rec = dataclasses.asdict(def_) | {"_type": def_._type}
        rec["body_a"] = self._bid(rec["body_a"])
        rec["body_b"] = self._bid(rec["body_b"])
        # reuse the builder's def->frames conversion on a 1-row temp builder
        from .builder import WorldBuilder
        tb = WorldBuilder(self.builder.def_)
        tb._joints = [rec]
        one = tb._build_joints(1)
        jn = self.state.joints
        new_jn = jax.tree.map(lambda full, r: full.at[lane].set(r[0]),
                              jn, one)
        self.state = dataclasses.replace(self.state, joints=new_jn)
        if def_._type not in self._jtypes:
            self._jtypes = frozenset(self._jtypes | {def_._type})
            self._remake_step()
        self._mark_islands_dirty()
        self.wake_body(self._handle(rec["body_a"], self._body_gen))
        self.wake_body(self._handle(rec["body_b"], self._body_gen))
        return self._handle(lane, self._joint_gen)

    def _recompute_mass(self, blane: int):
        """ref: src/Body.cs:255-353 UpdateBodyMassData over the body's
        current shapes (lane records, not builder history)."""
        from .state import DYNAMIC as DYN, LOCK_ANGULAR_Z
        b = self.state.bodies
        if int(np.asarray(b.type[blane])) != DYN:
            return
        origin = np.asarray(b.origin[blane], np.float64)
        c, s = (float(v) for v in np.asarray(b.rot[blane]))
        mass = 0.0
        mc = np.zeros(2)
        io = 0.0
        for rec in self._shape_recs.values():
            if rec["body"] != blane:
                continue
            md = g.compute_mass(rec["geom"], rec["density"])
            mass += md.mass
            mc = mc + md.mass * md.center
            io += md.rotational_inertia + md.mass * float(
                md.center @ md.center)
        lc = np.zeros(2)
        ic = 0.0
        inv_m = inv_i = 0.0
        if mass > 0:
            lc = mc / mass
            ic = io - mass * float(lc @ lc)
            inv_m = 1.0 / mass
            locked = int(np.asarray(b.flags[blane])) & LOCK_ANGULAR_Z
            if ic <= 0 or locked:
                ic = 0.0
            inv_i = 1.0 / ic if ic > 0 else 0.0
        else:
            mass, inv_m = 1.0, 1.0
        new_center = origin + np.array([c * lc[0] - s * lc[1],
                                        s * lc[0] + c * lc[1]])
        self.state = dataclasses.replace(self.state, bodies=dataclasses.replace(
            b,
            mass=b.mass.at[blane].set(np.float32(mass)),
            inertia=b.inertia.at[blane].set(np.float32(ic)),
            inv_mass=b.inv_mass.at[blane].set(np.float32(inv_m)),
            inv_inertia=b.inv_inertia.at[blane].set(np.float32(inv_i)),
            local_center=b.local_center.at[blane].set(
                jnp.asarray(lc, jnp.float32)),
            center=b.center.at[blane].set(
                jnp.asarray(new_center, jnp.float32))))

    def _refresh_extents(self, blane: int):
        """Recompute min/max shape extents about the COM (used by sleep and
        continuous-collision gates, ref: src/Solver.cs:425-449)."""
        b = self.state.bodies
        lc = np.asarray(b.local_center[blane])
        min_e, max_e = 1e8, 0.0
        for rec in self._shape_recs.values():
            if rec["body"] != blane:
                continue
            geom = rec["geom"]
            vs = geom.verts[:geom.count]
            max_e = max(max_e,
                        float(np.max(np.hypot(*(vs - lc).T))) + geom.radius)
            if geom.count >= 3:
                offs = [float((vs[i] - geom.centroid) @ geom.normals[i])
                        for i in range(geom.count)]
                min_e = min(min_e, min(offs) + geom.radius)
            else:
                min_e = min(min_e, geom.radius)
        self.state = dataclasses.replace(self.state, bodies=dataclasses.replace(
            b, min_extent=b.min_extent.at[blane].set(np.float32(min_e)),
            max_extent=b.max_extent.at[blane].set(np.float32(max_e))))

    def destroy_shape(self, shape: int, update_body_mass: bool = True):
        """Disable a shape and recycle its lane (ref: api/Shape.cs
        DestroyShape)."""
        lane = self._sid(shape)
        sh = self.state.shapes
        blane = int(np.asarray(sh.body[lane]))
        self.state = dataclasses.replace(
            self.state, shapes=dataclasses.replace(
                sh, enabled=sh.enabled.at[lane].set(False)))
        self._shape_recs.pop(lane, None)
        if lane in self._sensors:
            self._sensors = tuple(i for i in self._sensors if i != lane)
            self._remake_step()
        self._shape_gen[lane] += 1
        self._free_shapes.append(lane)
        if update_body_mass:
            self._recompute_mass(blane)
            self._refresh_extents(blane)
        self._mark_broadphase_dirty()
        self.wake_body(self._handle(blane, self._body_gen))

    def destroy_joint(self, joint: int):
        """Disable a joint and recycle its lane (ref: src/Joint.cs
        DestroyJointInternal — wakes both bodies)."""
        lane = self._jid(joint)
        jn = self.state.joints
        ba = int(np.asarray(jn.body_a[lane]))
        bb = int(np.asarray(jn.body_b[lane]))
        self.state = dataclasses.replace(
            self.state, joints=dataclasses.replace(
                jn, enabled=jn.enabled.at[lane].set(False),
                type=jn.type.at[lane].set(-1),
                body_a=jn.body_a.at[lane].set(-1),
                body_b=jn.body_b.at[lane].set(-1),
                color=jn.color.at[lane].set(-1)))
        self._joint_gen[lane] += 1
        self._free_joints.append(lane)
        self._mark_islands_dirty()
        for bl in (ba, bb):
            if 0 <= bl < len(self._body_gen):
                self.wake_body(self._handle(bl, self._body_gen))

    def destroy_body(self, body: int):
        """Destroy a body: its shapes and joints are destroyed with it and
        every lane is recycled with a bumped generation, so stale handles
        raise (ref: api/Body.cs:109-164 DestroyBody + include/ID.cs)."""
        lane = self._bid(body)
        # destroy attached joints first (ref destroys joint edges)
        jn = self.state.joints
        ja = np.asarray(jn.body_a)
        jb = np.asarray(jn.body_b)
        jen = np.asarray(jn.enabled)
        for jl in np.nonzero(jen & ((ja == lane) | (jb == lane)))[0]:
            self.destroy_joint(self._handle(int(jl), self._joint_gen))
        # destroy attached shapes (skip the per-shape mass recompute)
        for sl in [k for k, r in self._shape_recs.items()
                   if r["body"] == lane]:
            self.destroy_shape(self._handle(sl, self._shape_gen),
                               update_body_mass=False)
        bd = self.state.bodies
        self.state = dataclasses.replace(
            self.state, bodies=dataclasses.replace(
                bd, enabled=bd.enabled.at[lane].set(False),
                awake=bd.awake.at[lane].set(False),
                v=bd.v.at[lane].set(0.0), w=bd.w.at[lane].set(0.0)))
        self._body_gen[lane] += 1
        self._free_bodies.append(lane)
        self._mark_broadphase_dirty()

    def set_body_type(self, body: int, type_: int):
        """Change a body's type at runtime (ref: api/Body.cs:185-267
        SetType). The reference migrates solver sets, destroys contacts,
        and re-inserts proxies with forced pair creation; here type is a
        traced lane and the broadphase re-pairs statelessly every step, so
        only mass data (ref UpdateBodyMassData, src/Body.cs:255-353) and
        wake state need updating. The body's origin is preserved."""
        body = self._bid(body)
        from .state import DYNAMIC as DYN, LOCK_ANGULAR_Z
        b = self.state.bodies
        origin = np.asarray(b.origin[body], np.float64)
        c, s = (float(v) for v in np.asarray(b.rot[body]))
        lc = np.zeros(2)
        inv_m = 0.0
        inv_i = 0.0
        mass = 0.0
        ic = 0.0
        if type_ == DYN:
            mc = np.zeros(2)
            io = 0.0
            for rec in self._shape_recs.values():
                if rec["body"] != body:
                    continue
                md = g.compute_mass(rec["geom"], rec["density"])
                mass += md.mass
                mc = mc + md.mass * md.center
                io += md.rotational_inertia + md.mass * float(
                    md.center @ md.center)
            if mass > 0:
                lc = mc / mass
                ic = io - mass * float(lc @ lc)
                inv_m = 1.0 / mass
                locked = int(np.asarray(b.flags[body])) & LOCK_ANGULAR_Z
                if ic <= 0 or locked:
                    ic = 0.0
                inv_i = 1.0 / ic if ic > 0 else 0.0
            else:
                mass = 1.0  # shapeless dynamic body: unit mass (ref)
                inv_m = 1.0
        new_center = origin + np.array([c * lc[0] - s * lc[1],
                                        s * lc[0] + c * lc[1]])
        zero_v = type_ == 0  # static bodies lose their velocity
        self.state = dataclasses.replace(
            self.state,
            bodies=dataclasses.replace(
                b,
                type=b.type.at[body].set(type_),
                mass=b.mass.at[body].set(mass),
                inertia=b.inertia.at[body].set(ic),
                inv_mass=b.inv_mass.at[body].set(inv_m),
                inv_inertia=b.inv_inertia.at[body].set(inv_i),
                local_center=b.local_center.at[body].set(
                    jnp.asarray(lc, jnp.float32)),
                center=b.center.at[body].set(
                    jnp.asarray(new_center, jnp.float32)),
                v=b.v.at[body].set(jnp.where(zero_v, 0.0, b.v[body])),
                w=b.w.at[body].set(jnp.where(zero_v, 0.0, b.w[body]))))
        # a type flip can invalidate persisted graph colors (two constraints
        # were allowed to share this body's color while it was static);
        # release all colors — they re-form over the next few steps
        self.state = dataclasses.replace(
            self.state,
            contacts=dataclasses.replace(
                self.state.contacts,
                color=jnp.full_like(self.state.contacts.color, -1)),
            joints=dataclasses.replace(
                self.state.joints,
                color=jnp.full_like(self.state.joints.color, -1)))
        self._mark_broadphase_dirty()
        self.wake_body(body)

    def set_filter(self, shape: int, filter_: "t.Filter"):
        """Update a shape's collision filter at runtime (ref:
        api/Shape.cs:157-169 SetFilter — the reference re-pairs proxies;
        the stateless broadphase applies the new filter next step)."""
        shape = self._sid(shape)
        if not self.capacity.has_filters:
            # the builder traced the broadphase WITHOUT filter checks (no
            # shape had a non-default filter at compile); enable them and
            # re-make the step — a one-time recompile on first use
            self.capacity = dataclasses.replace(self.capacity,
                                                has_filters=True)
            self._remake_step()
        sh = self.state.shapes
        self.state = dataclasses.replace(
            self.state,
            shapes=dataclasses.replace(
                sh,
                filter_category=sh.filter_category.at[shape].set(
                    filter_.category_bits),
                filter_mask=sh.filter_mask.at[shape].set(filter_.mask_bits),
                filter_group=sh.filter_group.at[shape].set(
                    filter_.group_index)))
        self._mark_broadphase_dirty()
        self.wake_body(self._handle(int(np.asarray(sh.body[shape])),
                                    self._body_gen))
        # wake current touching partners: a disappearing contact doesn't
        # trigger the wake-on-new-touch path (ref re-pairs proxies, which
        # wakes through contact destruction)
        cs = self.state.contacts
        sa = np.asarray(cs.key_a)
        sb = np.asarray(cs.key_b)
        touching = np.asarray(cs.touching)
        for k in np.where((sa >= 0) & touching
                          & ((sa == shape) | (sb == shape)))[0]:
            other = int(sb[k] if sa[k] == shape else sa[k])
            self.wake_body(self._handle(int(np.asarray(sh.body[other])),
                                        self._body_gen))

    def joint_constraint_force(self, joint: int, dt=1.0 / 60.0):
        """Approximate reaction force magnitude (ref: JointAPI
        GetConstraintForce). Uses last step's stored impulses."""
        joint = self._jid(joint)
        jn = self.state.joints
        return float(np.hypot(*np.asarray(jn.impulse[joint])) / dt)

    # -- queries (thin wrappers over box2d_tpu.queries) ----------------------

    def cast_ray_closest(self, origin, translation, **kw):
        from . import queries

        return queries.cast_ray_closest(self.state, origin, translation, **kw)

    def cast_mover(self, p1, p2, radius, translation, **kw) -> float:
        """ref: api/World.cs:568 CastMover."""
        from . import queries

        return float(queries.cast_mover(self.state, p1, p2, radius,
                                        translation, **kw))

    def collide_mover(self, p1, p2, radius, **kw):
        """ref: api/World.cs:617 CollideMover — collision planes for
        solve_planes."""
        from . import queries

        return queries.collide_mover(self.state, p1, p2, radius, **kw)

    def overlap_aabb(self, aabb, **kw):
        from . import queries

        return np.asarray(queries.overlap_aabb(self.state, aabb, **kw))

    def cast_ray_all(self, origin, translation, max_hits: int = 16, **kw):
        """All hits along a ray, fraction-ascending (ref: api/World.cs:
        442-465 CastRay with an accumulate-all callback). Returns a dict of
        arrays trimmed to the hit count."""
        from . import queries

        r = queries.cast_ray_all(self.state, origin, translation,
                                 max_hits, **kw)
        n = int(r.count)
        return {
            "shape": np.asarray(r.shape)[:n],
            "point": np.asarray(r.point)[:n],
            "normal": np.asarray(r.normal)[:n],
            "fraction": np.asarray(r.fraction)[:n],
        }

    def overlap_point(self, point, **kw) -> np.ndarray:
        """Boolean mask of shapes containing a world point."""
        from . import queries

        return np.asarray(queries.overlap_point(self.state, point, **kw))

    def test_point(self, shape: int, point) -> bool:
        """Point-in-shape test (ref: per-geometry PointInCircle/Capsule/
        Polygon in include/Geometry.cs; api/Shape.cs TestPoint)."""
        shape = self._sid(shape)
        from . import queries

        return bool(queries.overlap_point(
            self.state, point, mask_bits=0xFFFFFFFF,
            category_bits=0xFFFFFFFF)[shape])

    def shape_aabb(self, shape: int) -> np.ndarray:
        """Current world AABB of a shape as (lo_x, lo_y, hi_x, hi_y)
        (ref: api/Shape.cs GetAABB)."""
        shape = self._sid(shape)
        from .broadphase import compute_shape_aabbs

        return np.asarray(compute_shape_aabbs(self.state)[shape])

    # -- shape material / flag accessors (ref: api/Shape.cs) ---------------

    def _update_shapes(self, lane: int, **cols):
        sh = self.state.shapes
        upd = {k: getattr(sh, k).at[lane].set(v) for k, v in cols.items()}
        self.state = dataclasses.replace(
            self.state, shapes=dataclasses.replace(sh, **upd))
        self._rebuild_shape_table()

    def _rebuild_shape_table(self):
        from .narrowphase import build_static_table

        sh = self.state.shapes
        self.state = dataclasses.replace(
            self.state, shapes=dataclasses.replace(
                sh, table=build_static_table(sh, self.capacity.max_verts)))

    def shape_body(self, shape: int) -> int:
        lane = int(np.asarray(self.state.shapes.body)[self._sid(shape)])
        gens = getattr(self, "_body_gen", None)
        return self._handle(lane, gens) if gens is not None else lane

    def shape_friction(self, shape: int) -> float:
        return float(np.asarray(self.state.shapes.friction)[
            self._sid(shape)])

    def set_friction(self, shape: int, v: float):
        """ref: ShapeAPI.SetFriction."""
        self._update_shapes(self._sid(shape), friction=float(v))

    def shape_restitution(self, shape: int) -> float:
        return float(np.asarray(self.state.shapes.restitution)[
            self._sid(shape)])

    def set_restitution(self, shape: int, v: float):
        """ref: ShapeAPI.SetRestitution."""
        self._update_shapes(self._sid(shape), restitution=float(v))

    def shape_density(self, shape: int) -> float:
        return float(np.asarray(self.state.shapes.density)[
            self._sid(shape)])

    def set_density(self, shape: int, v: float, update_mass: bool = True):
        """ref: ShapeAPI.SetDensity."""
        lane = self._sid(shape)
        self._update_shapes(lane, density=float(v))
        self._shape_recs[lane]["density"] = float(v)
        if update_mass:
            self._recompute_mass(self._shape_recs[lane]["body"])

    def set_surface_material(self, shape: int, friction=None,
                             restitution=None, rolling_resistance=None,
                             tangent_speed=None, user_material=None):
        """ref: ShapeAPI.SetSurfaceMaterial / SetUserMaterial."""
        lane = self._sid(shape)
        cols = {}
        if friction is not None:
            cols["friction"] = float(friction)
        if restitution is not None:
            cols["restitution"] = float(restitution)
        if rolling_resistance is not None:
            cols["rolling_resistance"] = float(rolling_resistance)
        if tangent_speed is not None:
            cols["tangent_speed"] = float(tangent_speed)
        if user_material is not None:
            cols["user_material"] = int(user_material)
        if cols:
            self._update_shapes(lane, **cols)

    def shape_surface_material(self, shape: int) -> dict:
        lane = self._sid(shape)
        sh = self.state.shapes
        return {k: (float if k != "user_material" else int)(
            np.asarray(getattr(sh, k))[lane])
            for k in ("friction", "restitution", "rolling_resistance",
                      "tangent_speed", "user_material")}

    def enable_shape_contact_events(self, shape: int, flag: bool):
        """ref: ShapeAPI.EnableContactEvents (post-compile)."""
        self._update_shapes(self._sid(shape),
                            enable_contact_events=bool(flag))

    def enable_shape_hit_events(self, shape: int, flag: bool):
        self._update_shapes(self._sid(shape), enable_hit_events=bool(flag))

    def enable_shape_sensor_events(self, shape: int, flag: bool):
        self._update_shapes(self._sid(shape),
                            enable_sensor_events=bool(flag))

    def shape_filter(self, shape: int) -> "t.Filter":
        lane = self._sid(shape)
        sh = self.state.shapes
        return t.Filter(
            category_bits=int(np.asarray(sh.filter_category)[lane]),
            mask_bits=int(np.asarray(sh.filter_mask)[lane]),
            group_index=int(np.asarray(sh.filter_group)[lane]))

    def shape_geometry(self, shape: int):
        """The host-side ShapeGeom record (ref: ShapeAPI.GetPolygon /
        GetCircle / GetCapsule / GetSegment / GetType)."""
        return self._shape_recs[self._sid(shape)]["geom"]

    def shape_ray_cast(self, shape: int, origin, translation):
        """Ray vs ONE shape in world space (ref: ShapeAPI.RayCast).
        Returns (hit, fraction, point, normal)."""
        from .queries import ray_shape_analytic

        lane = self._sid(shape)
        sh = self.state.shapes
        b = self.state.bodies
        bid = sh.body[lane]
        sp = b.origin[bid]
        sq = b.rot[bid]
        lo = m.inv_transform_point(sp, sq,
                                   jnp.asarray(origin, jnp.float32))
        ld = m.inv_rot_vec(sq, jnp.asarray(translation, jnp.float32))
        hit, frac, pt, nrm = ray_shape_analytic(
            lo, ld, jnp.float32(1.0), sh.type[lane], sh.verts[lane],
            sh.normals[lane], sh.count[lane], sh.radius[lane])
        return (bool(hit), float(frac),
                np.asarray(m.transform_point(sp, sq, pt)),
                np.asarray(m.rot_vec(sq, nrm)))

    def shape_closest_point(self, shape: int, point) -> np.ndarray:
        """Closest point on the shape surface (ref: GetClosestPoint)."""
        from .particles import _point_shape_distance

        lane = self._sid(shape)
        sh = self.state.shapes
        b = self.state.bodies
        bid = sh.body[lane]
        sp = b.origin[bid]
        sq = b.rot[bid]
        lp = m.inv_transform_point(sp, sq, jnp.asarray(point, jnp.float32))
        dist, nrm = _point_shape_distance(
            lp, sh.verts[lane], sh.normals[lane], sh.count[lane],
            sh.radius[lane])
        cp = lp - jnp.maximum(dist, 0.0) * nrm
        return np.asarray(m.transform_point(sp, sq, cp))

    # -- typed joint getters (ref: api/Joint.cs *Joint_Get*) ----------------

    def joint_bodies(self, joint: int) -> tuple:
        lane = self._jid(joint)
        jn = self.state.joints
        gens = getattr(self, "_body_gen", None)
        a = int(np.asarray(jn.body_a)[lane])
        b = int(np.asarray(jn.body_b)[lane])
        if gens is not None:
            return self._handle(a, gens), self._handle(b, gens)
        return a, b

    def _joint_frames_world(self, lane: int):
        jn = self.state.joints
        bd = self.state.bodies
        a = jn.body_a[lane]
        b = jn.body_b[lane]
        pa = m.transform_point(bd.origin[a], bd.rot[a], jn.frame_a_p[lane])
        pb = m.transform_point(bd.origin[b], bd.rot[b], jn.frame_b_p[lane])
        qa = m.rot_mul(bd.rot[a], jn.frame_a_q[lane])
        qb = m.rot_mul(bd.rot[b], jn.frame_b_q[lane])
        return pa, qa, pb, qb

    def distance_joint_current_length(self, joint: int) -> float:
        """ref: DistanceJoint_GetCurrentLength."""
        pa, _, pb, _ = self._joint_frames_world(self._jid(joint))
        return float(m.length(pb - pa))

    def revolute_joint_angle(self, joint: int) -> float:
        """ref: RevoluteJoint_GetAngle."""
        _, qa, _, qb = self._joint_frames_world(self._jid(joint))
        rel = m.rot_inv_mul(qa, qb)
        return float(jnp.arctan2(rel[1], rel[0]))

    def prismatic_joint_translation(self, joint: int) -> float:
        """ref: PrismaticJoint_GetTranslation (wheel uses the same axis
        projection, WheelJoint.cs:184)."""
        lane = self._jid(joint)
        pa, qa, pb, _ = self._joint_frames_world(lane)
        axis = m.rot_vec(qa, jnp.asarray([1.0, 0.0], jnp.float32))
        return float(m.dot(pb - pa, axis))

    wheel_joint_translation = prismatic_joint_translation

    def joint_linear_separation(self, joint: int) -> float:
        """Positional constraint error (ref: JointAPI.GetLinearSeparation
        for the point-to-point types)."""
        pa, _, pb, _ = self._joint_frames_world(self._jid(joint))
        return float(m.length(pb - pa))

    def joint_angular_separation(self, joint: int) -> float:
        """ref: JointAPI.GetAngularSeparation."""
        _, qa, _, qb = self._joint_frames_world(self._jid(joint))
        rel = m.rot_inv_mul(qa, qb)
        return float(jnp.arctan2(rel[1], rel[0]))

    def joint_local_frames(self, joint: int) -> tuple:
        lane = self._jid(joint)
        jn = self.state.joints
        return (np.asarray(jn.frame_a_p[lane]),
                np.asarray(jn.frame_a_q[lane]),
                np.asarray(jn.frame_b_p[lane]),
                np.asarray(jn.frame_b_q[lane]))

    def set_joint_local_frames(self, joint: int, frame_a_p=None,
                               frame_b_p=None):
        """ref: JointAPI.SetLocalFrameA/B (anchor positions)."""
        fields = {}
        if frame_a_p is not None:
            fields["frame_a_p"] = jnp.asarray(frame_a_p, jnp.float32)
        if frame_b_p is not None:
            fields["frame_b_p"] = jnp.asarray(frame_b_p, jnp.float32)
        if fields:
            self._set_joint(joint, **fields)

    def joint_user_data(self, joint: int) -> int:
        # joints carry no user-data column; host-side map
        return getattr(self, "_joint_user", {}).get(self._jid(joint), 0)

    def set_joint_user_data(self, joint: int, tag: int):
        if not hasattr(self, "_joint_user"):
            self._joint_user = {}
        self._joint_user[self._jid(joint)] = int(tag)

    def contact_data(self):
        """Manifolds of all currently-touching contacts (ref:
        api/Contact.cs:20-33 GetData + api/Shape.cs GetContactData):
        re-runs broadphase + narrow phase on the CURRENT poses and returns
        a dict of arrays over touching pairs."""
        from .world import _step_work

        if getattr(self, "_contact_fn", None) is None:
            cap, classes, substeps = self.capacity, self._classes, self.substeps

            def narrow(s):
                return _step_work(s, jnp.float32(1.0 / 60.0), cap, classes,
                                  substeps, until="narrow")

            self._contact_fn = jax.jit(narrow)
        d = self._contact_fn(self.state)
        pc = np.asarray(d.manifold.point_count)
        idx = np.nonzero(pc > 0)[0]
        return {
            "shape_a": np.asarray(d.shape_a)[idx],
            "shape_b": np.asarray(d.shape_b)[idx],
            "normal": np.asarray(d.manifold.normal)[idx],
            "point": np.asarray(d.manifold.point)[idx],
            "separation": np.asarray(d.manifold.separation)[idx],
            "point_count": pc[idx],
            "normal_impulse": np.asarray(d.normal_impulse)[idx],
            "tangent_impulse": np.asarray(d.tangent_impulse)[idx],
        }

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
            "events_dropped": int(st.profile.events_dropped),
            "awake_body_count": int(np.sum(
                np.asarray(st.bodies.awake) & np.asarray(st.bodies.enabled)
                & (np.asarray(st.bodies.type) == 2))),
            "particle_count": (
                int(np.sum(np.asarray(st.particles.alive)))
                if st.particles is not None else 0),
            "body_move_count": int(st.events.body_move_count),
            "fell_asleep_count": int(st.events.body_fell_asleep_count),
        }

    def validate(self, raise_on_error: bool = True) -> list:
        """State-invariant validation (the B2_VALIDATE analog, ref:
        src/World.cs:457-753 ValidateConnectivity/SolverSets/Contacts):
        cross-references, mass data, coloring conflict-freedom, island
        min-labels, free-list consistency. Returns the violation list;
        raises AssertionError when non-empty unless raise_on_error=False."""
        from .validate import validate_world

        out = validate_world(self)
        if out and raise_on_error:
            raise AssertionError("state validation failed:\n  "
                                 + "\n  ".join(out))
        return out

    def profile_phases(self, n: int = 20) -> dict:
        """Measured per-phase step timings in milliseconds (ref:
        include/Types.cs:378-403 Profile). The jitted step is ONE fused XLA
        program with no in-flight timers, so phases are measured by timing
        jitted PREFIXES of the step (the `until=` hooks in world._step_work)
        and differencing: phase_ms[k] = t(prefix k) - t(prefix k-1). Fusion
        across phase boundaries makes each entry approximate but the sum
        exact. Results are cached per compile."""
        import time as _time

        from .world import _step_work

        phases = ["aabbs", "pairs", "narrow", "colors", "prepare", "store",
                  "events", "continuous", "finalize", "sleep", ""]
        cap, classes, substeps = self.capacity, self._classes, self.substeps
        jtypes = joint_types_present(
            j["_type"] for j in self.builder._joints)
        cont = self.builder.def_.enable_continuous
        s = self.state
        out = {}
        prev = 0.0
        for ph in phases:
            def f(st, ph=ph):
                return _step_work(st, jnp.float32(1.0 / 60.0), cap, classes,
                                  substeps, jtypes, (), cont, None, 0, ph)

            fj = jax.jit(f)
            try:
                r = fj(s)
            except Exception:   # a prefix may not exist for this config
                continue
            jax.block_until_ready(jax.tree.leaves(r)[0])
            t0 = _time.perf_counter()
            for _ in range(n):
                r = fj(s)
            jax.block_until_ready(jax.tree.leaves(r)[0])
            ms = (_time.perf_counter() - t0) / n * 1e3
            out[ph or "total"] = ms - prev if ph else ms
            prev = ms
        return out

    @property
    def profile(self):
        return self.state.profile

    @property
    def events(self):
        return self.state.events

    def body_move_events(self) -> list:
        """Reference-shaped BodyMoveEvent rows for the last step (ref:
        include/Types.cs:713-724, written in FinalizeBodiesTask
        src/Solver.cs:402-503; exposed api/World.cs:283-290). The device
        step records dense masks (Events.body_moved/body_fell_asleep);
        this assembles [(body_handle, (x, y), (c, s), fell_asleep), ...]
        with the transform taken from the committed body state."""
        ev = self.state.events
        moved = np.asarray(ev.body_moved)
        ids = np.nonzero(moved)[0]
        if ids.size == 0:
            return []
        b = self.state.bodies
        origin = np.asarray(b.origin)
        rot = np.asarray(b.rot)
        fell = np.asarray(ev.body_fell_asleep)
        gens = getattr(self, "_body_gen", None)
        return [((self._handle(i, gens) if gens is not None else int(i)),
                 (float(origin[i, 0]), float(origin[i, 1])),
                 (float(rot[i, 0]), float(rot[i, 1])),
                 bool(fell[i]))
                for i in ids]
