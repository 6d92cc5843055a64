"""WorldState: the entire simulation state as a pytree of dense arrays.

This is the TPU-first replacement for the reference's pointer-based World
object graph (ref: src/World.cs:43-226, src/SolverSet.cs, src/Body.cs): all
entities live in fixed-capacity struct-of-arrays with validity masks, so
`step` is a pure function WorldState -> WorldState that jits once, vmaps over
world batches, and shards over device meshes.

Design mapping from the reference:
- BodyState/BodySim/Body (ref: src/Body.cs:35-173) -> Bodies arrays. The
  static/disabled/awake/sleeping *solver sets* (ref: src/SolverSet.cs) are
  replaced by per-body type/enabled/awake masks — set migration is a CPU
  memory-locality optimization a masked batched solver does not need.
- Shape + per-geometry records (ref: src/Shape.cs, include/Collision.cs) ->
  Shapes arrays in the unified rounded-polygon representation.
- Contact/ContactSim with persistent warm-start impulses
  (ref: src/Contact.cs) -> ContactStore keyed by canonical pair key.
- JointSim + per-type joints (ref: src/Joint.cs, src/joints/*) -> Joints
  arrays with a type tag and a parameter union.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# Body types (ref: include/Types.cs BodyType)
STATIC = 0
KINEMATIC = 1
DYNAMIC = 2

# Body flag bits (subset of ref: src/Body.cs BodyFlags)
LOCK_LINEAR_X = 1
LOCK_LINEAR_Y = 2
LOCK_ANGULAR_Z = 4
IS_BULLET = 8
ALLOW_FAST_ROTATION = 16
ENABLE_SLEEP = 32

# Joint types
JOINT_DISTANCE = 0
JOINT_MOTOR = 1
JOINT_PRISMATIC = 2
JOINT_REVOLUTE = 3
JOINT_WELD = 4
JOINT_WHEEL = 5
JOINT_FILTER = 6
JOINT_MOUSE = 7


def _pytree(cls):
    """Register a dataclass whose fields are all array leaves."""
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_pytree_node(
        cls,
        lambda obj: (tuple(getattr(obj, f) for f in fields), None),
        lambda _, children: cls(*children),
    )
    return cls


@_pytree
class Bodies:
    """Dense body state; lane i is body id i. (ref: src/Body.cs:35-173)"""

    center: Any        # (Nb, 2) world center of mass
    rot: Any           # (Nb, 2) rotation (cos, sin)
    v: Any             # (Nb, 2) linear velocity of COM
    w: Any             # (Nb,)  angular velocity
    force: Any         # (Nb, 2) accumulated user force
    torque: Any        # (Nb,)
    local_center: Any  # (Nb, 2) COM in body-local frame
    inv_mass: Any      # (Nb,)
    inv_inertia: Any   # (Nb,)
    mass: Any          # (Nb,)
    inertia: Any       # (Nb,)
    linear_damping: Any
    angular_damping: Any
    gravity_scale: Any
    type: Any          # (Nb,) i32: STATIC/KINEMATIC/DYNAMIC
    flags: Any         # (Nb,) i32 bitfield
    sleep_time: Any    # (Nb,)
    sleep_threshold: Any  # (Nb,)
    min_extent: Any    # (Nb,) min shape extent (continuous-collision gate)
    max_extent: Any    # (Nb,) max shape reach from COM (sleep/fast checks)
    island_label: Any  # (Nb,) i32 persistent island min-label (see sleep.py)
    island_fresh: Any  # (Nb,) i32 re-partition shadow labels: re-seeded from
    #   body ids after every convergence, swapped into island_label once they
    #   reach a fixed point of the CURRENT edge set — the TPU analog of the
    #   reference's deferred island splits (ref: src/Island.cs:316-426)
    island_dirty: Any  # () bool — a label propagation is in flight (labels
    #   not yet a fixed point of the current edges). Together with per-step
    #   touch-set changes this gates the whole propagation pass: quiet steps
    #   skip it entirely (the reference's islands also cost nothing unless
    #   contacts link/unlink, src/Island.cs:107-187)
    island_split_pending: Any  # () bool — an edge left the graph and the
    #   split re-partition it calls for has not run yet. The re-partition is
    #   DEFERRED to the next quiet step (no touch-set change): during
    #   sustained churn every step loses some edge, and an immediate reseed
    #   would both re-run the 5-round propagation every step (~3.7 ms at 40k
    #   lanes) and never converge. Over-merged islands in the meantime are
    #   conservative (sleep later, wake more) — the reference defers splits
    #   the same way (ref: src/Island.cs:316-426 deferred split queue)
    awake: Any         # (Nb,) bool — sleeping bodies hold state frozen
    enabled: Any       # (Nb,) bool — lane allocated & enabled
    user_data: Any     # (Nb,) i32 opaque tag

    @property
    def origin(self):
        """Body origin transform position p = center - R*local_center
        (ref: src/Solver.cs:429)."""
        from . import math2d as m

        return self.center - m.rot_vec(self.rot, self.local_center)


@_pytree
class Shapes:
    """Unified shape arrays (see geometry.py). (ref: src/Shape.cs:24-301)"""

    body: Any      # (S,) i32 owning body id
    type: Any      # (S,) i32 geometry.CIRCLE..CHAIN_SEGMENT
    verts: Any     # (S, 8, 2) local
    normals: Any   # (S, 8, 2)
    count: Any     # (S,) i32
    radius: Any    # (S,)
    centroid: Any  # (S, 2)
    ghost1: Any    # (S, 2) chain segments only
    ghost2: Any    # (S, 2)
    friction: Any
    restitution: Any
    rolling_resistance: Any
    tangent_speed: Any
    user_material: Any  # (S,) i32
    density: Any
    filter_category: Any  # (S,) u32
    filter_mask: Any      # (S,) u32
    filter_group: Any     # (S,) i32
    is_sensor: Any        # (S,) bool
    enable_contact_events: Any  # (S,) bool
    enable_hit_events: Any      # (S,) bool
    enable_sensor_events: Any   # (S,) bool
    enabled: Any          # (S,) bool
    table: Any            # (S, 4V+14) packed STATIC operand rows for the
    #   narrow phase (verts/normals/radius/materials/flags at
    #   V=Capacity.max_verts — see narrowphase.build_shape_table); rebuilt
    #   only by host mutators that touch shape data, so the per-step table
    #   assembly is one concat with the body-dyn block instead of ~15


@_pytree
class ContactStore:
    """Persistent per-pair warm-start data, LANE-ALIGNED with the persistent
    pair buffer (BroadphaseStore): row i is last step's contact state for
    pair lane i. While the pair buffer is unchanged (the steady state),
    matching previous-step impulses to this step's manifolds is a pure
    lane-wise (key, feature-id) compare with zero gathers; on a pair-buffer
    rebuild the rows are re-aligned to the new lanes through a TRANSIENT
    open-addressed hash table (narrowphase.remap_cache) — the reference's
    persistent Contact objects + pairSet (ref: src/Contact.cs:385-413,
    src/BroadPhase.cs:50) without per-step pointer chasing."""

    key_a: Any           # (P,) canonical low shape id (-1 = no pair)
    key_b: Any           # (P,) canonical high shape id
    ids: Any             # (P, 2) i32 manifold point feature ids
    normal_impulse: Any  # (P, 2)
    tangent_impulse: Any  # (P, 2)
    rolling_impulse: Any  # (P,)
    touching: Any        # (P,) bool — for begin/end events
    color: Any           # (P,) i32 persistent graph color (-1 = none); the
    #   TPU analog of the reference's incremental constraint graph
    #   (ref: src/ConstraintGraph.cs:135-220 O(1) add/remove): a pair that
    #   stays touching keeps its color, so per-step coloring only repairs
    #   the (few) new pairs instead of recoloring the whole graph


@_pytree
class Joints:
    """All joints in one SoA with a type tag; per-type parameters live in a
    shared column union (documented per field). (ref: src/Joint.cs:18-133,
    src/joints/*). Joints attach via local *frames* like upstream Box2D v3
    (ref: include/Types.cs:440-441); the builder converts v2-style
    anchor/axis/reference-angle defs into frames."""

    type: Any            # (J,) i32
    enabled: Any         # (J,) bool
    body_a: Any          # (J,) i32
    body_b: Any          # (J,) i32
    frame_a_p: Any       # (J, 2) local frame A origin
    frame_a_q: Any       # (J, 2) local frame A rotation (cos, sin)
    frame_b_p: Any       # (J, 2)
    frame_b_q: Any       # (J, 2)
    collide_connected: Any  # (J,) bool
    constraint_hertz: Any   # (J,) rigid-constraint softness (default 60)
    constraint_damping_ratio: Any  # (J,) default 2
    # spring / motor / limit union
    hertz: Any           # (J,) main/linear spring hertz
    damping_ratio: Any   # (J,)
    enable_spring: Any   # (J,) bool
    enable_limit: Any    # (J,) bool
    enable_motor: Any    # (J,) bool
    lower: Any           # (J,) lower limit (length/angle/translation)
    upper: Any           # (J,)
    motor_speed: Any     # (J,)
    max_motor_force: Any  # (J,) force or torque depending on type
    # distance joint specifics
    length: Any          # (J,) rest length
    lower_spring_force: Any  # (J,)
    upper_spring_force: Any  # (J,)
    # revolute/prismatic spring target
    spring_target: Any   # (J,) target angle / translation
    # weld/motor secondary (angular) spring
    angular_hertz: Any   # (J,)
    angular_damping_ratio: Any  # (J,)
    # motor joint targets
    linear_velocity: Any     # (J, 2)
    angular_velocity: Any    # (J,)
    max_velocity_force: Any  # (J,)
    max_velocity_torque: Any  # (J,)
    max_spring_force: Any    # (J,)
    max_spring_torque: Any   # (J,)
    force_threshold: Any   # (J,) joint event force threshold
    torque_threshold: Any  # (J,)
    color: Any           # (J,) i32 persistent graph color (-1 = none)
    # accumulated impulses (warm starting)
    impulse: Any         # (J, 2) main linear/(perp,angle) impulse
    spring_impulse: Any  # (J,) axial/angular spring impulse
    spring_impulse2: Any  # (J, 2) motor joint linear spring impulse
    motor_impulse: Any   # (J,)
    lower_impulse: Any   # (J,)
    upper_impulse: Any   # (J,)
    angular_impulse: Any  # (J,) weld angular / motor angular-velocity impulse


@_pytree
class Tuning:
    """Runtime world tuning (ref: include/Types.cs:77-144 WorldDef +
    api/World.cs:628-807 setters). Traced scalars so they can change without
    recompiling."""

    gravity: Any
    restitution_threshold: Any
    hit_event_threshold: Any
    contact_hertz: Any
    contact_damping_ratio: Any
    contact_speed: Any
    max_linear_speed: Any
    joint_hertz: Any
    joint_damping_ratio: Any
    enable_sleep: Any
    enable_continuous: Any
    enable_warm_starting: Any
    enable_speculative: Any
    enable_contact_softening: Any


@_pytree
class Events:
    """Per-step event buffers (ref: include/Types.cs:665-792, double
    buffering in api/World.cs:105-111 is unnecessary here: the whole Events
    pytree is rebuilt every step and the previous one stays valid)."""

    contact_begin: Any       # (E, 2) i32 shape id pairs
    contact_begin_count: Any
    contact_end: Any         # (E, 2)
    contact_end_count: Any
    hit_point: Any           # (E, 2) f32
    hit_normal: Any          # (E, 2)
    hit_speed: Any           # (E,)
    hit_shapes: Any          # (E, 2) i32
    hit_count: Any
    sensor_begin: Any        # (E, 2) i32 (sensor shape, visitor shape)
    sensor_begin_count: Any
    sensor_end: Any          # (E, 2)
    sensor_end_count: Any
    joint_force: Any         # (E,) i32 joint ids over force threshold
    joint_force_count: Any
    # body move events (ref: include/Types.cs:713-724 BodyMoveEvent, written
    # in FinalizeBodiesTask src/Solver.cs:402-503). TPU redesign: instead of
    # compacted {transform, bodyId, fellAsleep} rows (a 10k-body scene moves
    # 10k bodies/step — compaction would be the cost, capacity the failure
    # mode), dense per-body masks; transforms are already in Bodies. The
    # World.body_move_events() accessor assembles reference-shaped rows.
    body_moved: Any          # (Nb,) bool — body was awake+non-static this step
    body_fell_asleep: Any    # (Nb,) bool — awake -> asleep transition
    body_move_count: Any     # i32
    body_fell_asleep_count: Any  # i32


@_pytree
class Profile:
    """Per-step counters (ref: include/Types.cs:378-419 Profile/Counters).
    Wall-time phases are measured by jax.profiler; these are logical."""

    pair_count: Any
    contact_point_count: Any
    color_count: Any
    overflow_pairs: Any       # candidate-buffer overflow (diagnostic!)
    overflow_colors: Any      # constraints that did not fit a color
    store_drops: Any          # contact-store inserts lost to hash congestion
    #   (a dropped pair loses warm-start impulses + color for one step and
    #   re-fires a spurious contact_begin next step — visible, not silent)
    overflow_ccd: Any         # fast shapes / TOI candidates beyond the CCD
    #   compaction caps (Capacity.fast_cap / cand_cap) — dropped lanes get
    #   no TOI this step and may tunnel; never silent
    overflow_particles: Any   # particle neighbor-window overflow: neighbors
    #   beyond the fixed K_SAME/K_UP scan windows shed contacts this step
    events_dropped: Any       # events beyond Capacity.event_capacity this
    #   step (begin/end/hit/joint); raise event_capacity if nonzero — a good
    #   sizing rule is ~2x the largest expected per-step begin-touch burst
    #   (scene drops / explosions), the reference grows its arrays instead
    pair_rebuild: Any         # broadphase work this step: 0 = pair buffer
    #   kept, 1 = incremental repair (escaped shapes only), 2 = full rebuild.
    #   Steady-state churn should show 0/1 only — the reference pays
    #   O(moved) per step, never O(world) (ref: src/BroadPhase.cs:233-268)


@_pytree
class BroadphaseStore:
    """Persistent candidate pairs + fat proxy AABBs — the TPU analog of the
    reference's BufferMove/pairSet incrementality (ref: src/BroadPhase.cs:
    40-56, src/Shape.cs:64-75): pair finding reruns only when some shape's
    tight AABB escapes its stored fat AABB (or `dirty` is set by a host-side
    mutator). While every shape stays inside its fat bounds the stored pair
    set is a superset of all overlapping pairs, so skipping the rebuild is
    exact."""

    fat: Any        # (S, 4) stored fat AABBs
    alive: Any      # (S,) bool aliveness when pairs were built
    shape_a: Any    # (P,) i32
    shape_b: Any    # (P,) i32
    valid: Any      # (P,) bool
    count: Any      # i32
    overflow: Any   # i32
    dirty: Any      # bool — host mutators force a rebuild
    cell: Any = None  # f32 grid cell size of the last FULL build (= widest
    #   non-big fat extent); the incremental repair classifies escaped
    #   shapes wider than this as "big" (per-partner emission side)


def zero_broadphase(S: int, P: int) -> BroadphaseStore:
    return BroadphaseStore(
        fat=jnp.zeros((S, 4), jnp.float32),
        alive=jnp.zeros(S, bool),
        shape_a=jnp.zeros(P, jnp.int32),
        shape_b=jnp.zeros(P, jnp.int32),
        valid=jnp.zeros(P, bool),
        count=jnp.int32(0),
        overflow=jnp.int32(0),
        dirty=jnp.asarray(True),
        cell=jnp.float32(1e9),
    )


@_pytree
class WorldState:
    bodies: Bodies
    shapes: Shapes
    contacts: ContactStore
    joints: Joints
    tuning: Tuning
    events: Events
    profile: Profile
    sensor_overlap: Any  # (S_sensor_cap,) persistent sensor visitor keys
    particles: Any       # particles.Particles or None
    step_count: Any
    broadphase: Any = None  # BroadphaseStore


@dataclasses.dataclass(frozen=True)
class Capacity:
    """Static capacities — part of the jit signature, not of the state."""

    max_bodies: int
    max_shapes: int
    max_joints: int
    max_contact_pairs: int       # total candidate pair capacity
    max_neighbors: int = 16      # (legacy, unused)
    sap_window: int = 32         # sweep-and-prune sorted window width
    max_verts: int = 8           # scene-wide max polygon vertex count
    big_shape_cap: int = 16      # wide shapes tested against all
    color_chunk: int = 0         # per-color bucket cap (0 = P // 8)
    max_colors: int = 24         # ref: src/Constants.cs:13
    sensor_pair_capacity: int = 256
    event_capacity: int = 256
    fast_cap: int = 0            # CCD fast-shape slots (0 = auto-sized by
    #   the builder to cover every bullet shape, ref src/Solver.cs:1238-1274
    #   handles ALL bullets)
    cand_cap: int = 8            # TOI candidate targets per fast shape
    bp_tile: int = 512           # broadphase forward-tile width: a shape's
    #   neighbors further than bp_tile-128 sorted positions ahead overflow
    #   (counted in Profile.overflow_pairs); raise for scenes with very wide
    #   grid rows (thousands of same-size shapes in one horizontal band)
    bp_repair_cap: int = 256     # incremental pair-repair budget: steps where
    #   at most this many shapes escape their fat AABBs (and <= 8 of them are
    #   grid-big) repair the persistent pair buffer in place instead of a
    #   full rebuild (ref analog: O(moved) BufferMove/FindPairs,
    #   src/BroadPhase.cs:233-268). 0 disables (always full-rebuild on
    #   escape) — the vmapped batch path sets 0 so the lax.cond->select
    #   lowering doesn't execute the repair pass every step.
    # trace-time gates (builder sets False when the scene provably never
    # needs the check, dropping its per-pair gathers from the program)
    has_filters: bool = True          # any non-default category/mask/group
    has_joint_exclusions: bool = True  # any collide_connected=False joint
    batched: bool = False    # set True when the step will be vmapped over a
    #   world axis: lax.cond fast paths lower to selects under vmap (both
    #   branches execute per world), so tiered/conditional optimizations
    #   that only pay off on a single world are disabled (coloring's
    #   two-tier repair; pair repair is disabled via bp_repair_cap=0)


def auto_chunk(max_contact_pairs: int) -> int:
    """Default per-color bucket cap when Capacity.color_chunk == 0.

    128-multiples keep dynamic lane-dim slices tile-aligned for the Pallas
    kernel (Mosaic requires it). Chunks >= 512 round up to a 512 multiple so
    the tiled kernel can sweep 4x128-lane sub-windows per grid step
    (world.py `halves`) — without the rounding, layouts like the 64-world
    flat batch land on chunk = 27*128 and fall back to one 128-lane window
    per grid step (~1us of per-step overhead each)."""
    c = max(128, ((max_contact_pairs // 16 + 127) // 128) * 128)
    if c >= 512:
        c = ((c + 511) // 512) * 512
    return c


def zero_events(cap: Capacity, nb: int | None = None) -> Events:
    e = cap.event_capacity
    nb = cap.max_bodies if nb is None else nb
    i0 = jnp.int32(0)
    return Events(
        contact_begin=jnp.zeros((e, 2), jnp.int32),
        contact_begin_count=i0,
        contact_end=jnp.zeros((e, 2), jnp.int32),
        contact_end_count=i0,
        hit_point=jnp.zeros((e, 2), jnp.float32),
        hit_normal=jnp.zeros((e, 2), jnp.float32),
        hit_speed=jnp.zeros((e,), jnp.float32),
        hit_shapes=jnp.zeros((e, 2), jnp.int32),
        hit_count=i0,
        sensor_begin=jnp.zeros((e, 2), jnp.int32),
        sensor_begin_count=i0,
        sensor_end=jnp.zeros((e, 2), jnp.int32),
        sensor_end_count=i0,
        joint_force=jnp.zeros((e,), jnp.int32),
        joint_force_count=i0,
        body_moved=jnp.zeros((nb,), bool),
        body_fell_asleep=jnp.zeros((nb,), bool),
        body_move_count=i0,
        body_fell_asleep_count=i0,
    )


def zero_profile() -> Profile:
    i0 = jnp.int32(0)
    return Profile(i0, i0, i0, i0, i0, i0, i0, i0, i0, i0)
