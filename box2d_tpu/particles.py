"""LiquidFun particle engine, TPU-native.

Behavioral counterpart of ref: particle/ParticleSystem.cs (2614 LoC) — SoA
particle buffers, cell-hash neighbor search, ~15 flag-gated force passes,
two-way rigid-body coupling, groups/pairs/triads.

TPU redesign:
- Neighbor search (ref :1096-1117, :1362-1370): instead of a tag-sorted proxy
  list with window scans on CPU threads, particles are sorted by a
  (row, column) cell key each iteration and every particle gathers a fixed
  window of candidates — K_SAME from its own sorted run (same row: same +
  next cell are contiguous) and K_UP from the row above located with one
  searchsorted. Contacts are a dense (Np, K) matrix: every per-contact pass
  becomes gather + math + one scatter-add, no atomics (ref interlocked adds
  :1873-1876 -> segment sums).
- Body contacts (ref :1418-1494): the reference runs GJK per candidate; a
  point-vs-convex distance is closed-form on the unified rounded-polygon
  representation, so we evaluate it for all (particle, nearby-shape) pairs
  against a small compacted shape set.
- Rigid-body coupling (ref particle/World.cs:47-61): per-pass immediate
  ApplyLinearImpulse becomes per-pass impulse accumulation scattered into
  (Nb,) dv/dw arrays applied once per pass (Jacobi within the pass, same
  order across passes).
- Pairs/triads (springs/elastic) are built at group creation on the host
  (ref :801-861 + VoronoiDiagram.cs) and live in fixed arrays.

Known port bug fixed: ref :1447-1452 runs GJK with useRadii unset, so
circle/capsule fixtures measure distance to their *core* skeleton; we measure
to the surface (upstream LiquidFun b2Shape::ComputeDistance semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import math2d as m
from .broadphase import compute_shape_aabbs
from .constants import MAX_POLYGON_VERTICES
from .queries import ray_shape_analytic
from .state import DYNAMIC, WorldState, _pytree

_LANES = jnp.arange(MAX_POLYGON_VERTICES)

# particle flags (ref: particle/Particle.cs ParticleFlag)
P_ZOMBIE = 1 << 1
P_WALL = 1 << 2
P_SPRING = 1 << 3
P_ELASTIC = 1 << 4
P_VISCOUS = 1 << 5
P_POWDER = 1 << 6
P_TENSILE = 1 << 7
P_COLOR_MIXING = 1 << 8
P_BARRIER = 1 << 9
P_STATIC_PRESSURE = 1 << 10
P_REACTIVE = 1 << 11
P_REPULSIVE = 1 << 12

# group flags (ref: particle/ParticleGroup.cs)
G_SOLID = 1 << 0
G_RIGID = 1 << 1
G_NEEDS_DEPTH = 1 << 2  # ref ParticleGroupFlag.NeedsUpdateDepth

# tuning constants (ref: particle/World.cs:8-45)
PARTICLE_STRIDE = 0.75
MIN_PARTICLE_WEIGHT = 1.0
MAX_PARTICLE_PRESSURE = 0.25
MAX_PARTICLE_FORCE = 0.5
PARTICLE_LINEAR_SLOP = 0.005
# block size for the per-block body-shape culling (sorted particles are
# spatially coherent, so one AABB covers each block tightly); matches the
# window kernels' B_BLK so block boundaries line up with kernel blocks
_CULL_BLK = 256

_NO_PRESSURE = P_POWDER | P_TENSILE


@_pytree
class ParticleParams:
    """ref: ParticleSystem properties :604-650."""

    radius: Any
    density: Any
    gravity_scale: Any
    pressure_strength: Any        # 0.05
    damping_strength: Any         # 1.0
    elastic_strength: Any         # 0.25
    spring_strength: Any          # 0.25
    viscous_strength: Any         # 0.25
    surface_tension_pressure: Any  # 0.2
    surface_tension_normal: Any   # 0.2
    repulsive_strength: Any       # 1.0
    powder_strength: Any          # 0.5
    ejection_strength: Any        # 0.5
    static_pressure_strength: Any  # 0.2
    static_pressure_relaxation: Any  # 0.2
    color_mixing_strength: Any    # 0.5


def default_params(radius: float, density: float = 1.0) -> ParticleParams:
    f = jnp.float32
    return ParticleParams(
        radius=f(radius), density=f(density), gravity_scale=f(1.0),
        pressure_strength=f(0.05), damping_strength=f(1.0),
        elastic_strength=f(0.25), spring_strength=f(0.25),
        viscous_strength=f(0.25), surface_tension_pressure=f(0.2),
        surface_tension_normal=f(0.2), repulsive_strength=f(1.0),
        powder_strength=f(0.5), ejection_strength=f(0.5),
        static_pressure_strength=f(0.2), static_pressure_relaxation=f(0.2),
        color_mixing_strength=f(0.5),
    )


@_pytree
class Particles:
    """SoA buffers (ref: ParticleSystem.cs:2585-2605)."""

    pos: Any        # (Np, 2)
    vel: Any        # (Np, 2)
    force: Any      # (Np, 2) user forces, cleared per step
    flags: Any      # (Np,) i32
    group: Any      # (Np,) i32, -1 = none
    alive: Any      # (Np,) bool
    expiration: Any  # (Np,) seconds left; <= 0 means immortal
    color: Any      # (Np, 4) f32 RGBA in [0, 1]
    static_pressure: Any  # (Np,)
    depth: Any      # (Np,)
    # groups (G lanes)
    group_flags: Any      # (G,) i32
    group_strength: Any   # (G,)
    # springs (Pp lanes) (ref: ParticlePair)
    pair_a: Any
    pair_b: Any
    pair_flags: Any
    pair_strength: Any
    pair_distance: Any
    # triads (Tp lanes) (ref: ParticleTriad)
    triad_a: Any
    triad_b: Any
    triad_c: Any
    triad_flags: Any
    triad_strength: Any
    triad_pa: Any  # (Tp, 2) rest offsets from triad midpoint
    triad_pb: Any
    triad_pc: Any
    # stuck detection (ref: DetectStuckParticle :1520-1541): steps in a row
    # with >= 2 body contacts; api.World.stuck_particles thresholds it
    consecutive_contact_steps: Any  # (Np,) i32
    params: Any    # ParticleParams


class ParticleConfig(NamedTuple):
    """Static config for the particle step."""

    k_same: int = 12      # candidates from own sorted run
    k_up: int = 12        # candidates from the row above
    max_body_shapes: int = 16  # compacted nearby rigid shapes
    iterations: int = 4   # ref: api/World.cs:92 hardcodes 4
    static_pressure_iterations: int = 8
    depth_iterations: int = 16
    # trace-time pass gates — the analog of the reference's AllParticleFlags
    # / AllGroupFlags checks (ref: Solve :1523-1555): a pass whose flag is
    # absent from the scene is never traced, so plain water pays only for
    # gravity/pressure/damping/collision
    has_barrier: bool = False
    has_viscous: bool = False
    has_repulsive: bool = False
    has_powder: bool = False
    has_tensile: bool = False
    has_colormix: bool = False
    has_static_pressure: bool = False
    has_elastic: bool = False
    has_spring: bool = False
    has_wall: bool = False
    has_solid: bool = False
    has_rigid: bool = False
    # TPU fast path: run the pair passes (weight/pressure/damping) as dense
    # masked-band Pallas kernels (particles_pallas.py) instead of the
    # windowed gather/scatter pipeline. Only valid when no gated pass needs
    # the flat pair view (plain-water scenes); set by api.compile() on TPU.
    use_window_kernel: bool = False
    # nearly-sorted rank repair of the per-sub-iteration cell sort
    # (particles_pallas.rank_pass); only meaningful on the window-kernel
    # path. Off under vmapped batches: the fallback lax.cond lowers to a
    # select there, running BOTH the kernel and the full sort every step.
    rank_repair: bool = False
    # per-block body-shape culling: when the step's compacted nearby-shape
    # set Sb exceeds this, each block of 256 SORTED particles (spatially
    # coherent by cell key) selects its own top-K overlapping shapes and the
    # body-coupling passes run dense (n, K) instead of (n, Sb). The flat
    # particle batch replicates one tank per world (Sb grows with worlds
    # while each particle only ever touches its own world's walls) — dense
    # (n, Sb) coupling cost grew with the batch, this stays O(n*K). Blocks
    # overlapping more than K shapes shed the extras (counted in
    # overflow_particles, never silent).
    block_shape_slots: int = 8
    # trace-time geometry families present in the scene: the anti-tunnel
    # raycast evaluates every closed-form variant per (particle, shape)
    # lane otherwise (4x the work for the usual polygon-tank scenes)
    geom_types: frozenset | None = None


# ---------------------------------------------------------------------------
# host-side builder
# ---------------------------------------------------------------------------

class ParticleSystemBuilder:
    """Create particles/groups eagerly; freeze to the Particles pytree."""

    def __init__(self, radius: float, density: float = 1.0):
        self.radius = float(radius)
        self.density = float(density)
        self.pos: list = []
        self.vel: list = []
        self.flags: list = []
        self.group: list = []
        self.group_flags: list = []
        self.group_strength: list = []
        self.pairs: list = []
        self.triads: list = []
        self.lifetime: list = []
        self.color: list = []

    def create_particle(self, position, velocity=(0.0, 0.0), flags=0,
                        group=-1, lifetime=0.0, color=(1.0, 1.0, 1.0, 1.0)) -> int:
        self.pos.append(np.asarray(position, np.float32))
        self.vel.append(np.asarray(velocity, np.float32))
        self.flags.append(int(flags))
        self.group.append(int(group))
        self.lifetime.append(float(lifetime))
        self.color.append(np.asarray(color, np.float32))
        return len(self.pos) - 1

    def create_group_box(self, center, half_w, half_h, flags=0, group_flags=0,
                         strength=1.0, velocity=(0.0, 0.0), lifetime=0.0,
                         color=(1.0, 1.0, 1.0, 1.0)) -> int:
        """Fill a box with particles on the standard stride grid
        (ref: CreateParticleGroup shape fill :652-720)."""
        gid = len(self.group_flags)
        gf = int(group_flags)
        if gf & G_SOLID:
            # solid groups need their depth field computed before the
            # ejection force can act (ref: SetGroupFlags -> NeedsUpdateDepth)
            gf |= G_NEEDS_DEPTH
        self.group_flags.append(gf)
        self.group_strength.append(float(strength))
        stride = PARTICLE_STRIDE * 2.0 * self.radius
        cx, cy = center
        first = len(self.pos)
        from .native import fill_box_native

        grid = fill_box_native(center, half_w, half_h, stride)
        if grid is None:
            ys = np.arange(-half_h + stride / 2, half_h, stride)
            xs = np.arange(-half_w + stride / 2, half_w, stride)
            grid = np.array([(cx + x, cy + y) for y in ys for x in xs],
                            np.float32).reshape(-1, 2)
        for p in grid:
            self.create_particle(p, velocity, flags, gid, lifetime, color)
        last = len(self.pos)
        if flags & (P_SPRING | P_ELASTIC | P_BARRIER):
            self._build_pairs_triads(first, last, flags, strength)
        return gid

    def _build_pairs_triads(self, first, last, flags, strength):
        """Spring pairs from initial proximity; elastic triads from a grid
    Delaunay-ish triangulation (behavioral stand-in for the reference's
    Voronoi triads, ref :801-861)."""
        pts = np.array(self.pos[first:last], np.float32)
        d = 2.0 * self.radius
        n = len(pts)
        from .native import build_pairs_native, build_triads_native

        # barrier groups also get pairs: each pair is a barrier segment
        # (ref k_pairFlags = spring | barrier, ParticleSystem.cs:762)
        if flags & (P_SPRING | P_BARRIER):
            res = build_pairs_native(pts, d * 1.2)
            if res is not None:
                a, b, dist = res
                for k in range(len(a)):
                    self.pairs.append((first + int(a[k]), first + int(b[k]),
                                       flags, strength, float(dist[k])))
            else:
                for i in range(n):
                    diff = pts[i + 1:] - pts[i]
                    dist = np.hypot(diff[:, 0], diff[:, 1])
                    for j in np.nonzero(dist < d * 1.2)[0]:
                        self.pairs.append((first + i, first + i + 1 + int(j),
                                           flags, strength, float(dist[j])))
        if flags & P_ELASTIC:
            stride = PARTICLE_STRIDE * d
            res = build_triads_native(pts, stride)
            if res is not None:
                tri, rest = res
                for k in range(len(tri)):
                    self.triads.append(
                        (first + int(tri[k, 0]), first + int(tri[k, 1]),
                         first + int(tri[k, 2]), flags, strength,
                         rest[k, 0], rest[k, 1], rest[k, 2]))
            else:
                key = {}
                for i, p in enumerate(pts):
                    key[(round(float(p[0]) / stride),
                         round(float(p[1]) / stride))] = i
                for (ix, iy), i in key.items():
                    right = key.get((ix + 1, iy))
                    up = key.get((ix, iy + 1))
                    diag = key.get((ix + 1, iy + 1))
                    for tri in ((i, right, up), (right, diag, up)):
                        if None in tri:
                            continue
                        a, b, c = (first + t for t in tri)
                        pa, pb, pc = pts[tri[0]], pts[tri[1]], pts[tri[2]]
                        mid = (pa + pb + pc) / 3.0
                        self.triads.append((a, b, c, flags, strength,
                                            pa - mid, pb - mid, pc - mid))

    def build(self, capacity: int | None = None,
              pair_capacity: int | None = None,
              triad_capacity: int | None = None) -> Particles:
        n = len(self.pos)
        cap = capacity or max(n, 1)
        g = max(len(self.group_flags), 1)
        pp = pair_capacity or max(len(self.pairs), 1)
        tp = triad_capacity or max(len(self.triads), 1)

        def pad(lst, cap_, shape=(), dtype=np.float32, fill=0):
            out = np.full((cap_,) + shape, fill, dtype)
            for i, v in enumerate(lst):
                out[i] = v
            return jnp.asarray(out)

        pairs = self.pairs
        triads = self.triads
        return Particles(
            pos=pad(self.pos, cap, (2,)),
            vel=pad(self.vel, cap, (2,)),
            force=jnp.zeros((cap, 2), jnp.float32),
            flags=pad(self.flags, cap, (), np.int32),
            group=pad(self.group, cap, (), np.int32, -1),
            alive=jnp.asarray(np.arange(cap) < n),
            expiration=pad(self.lifetime, cap),
            color=pad(self.color, cap, (4,)),
            static_pressure=jnp.zeros(cap, jnp.float32),
            depth=jnp.zeros(cap, jnp.float32),
            group_flags=pad(self.group_flags, g, (), np.int32),
            group_strength=pad(self.group_strength, g, (), np.float32, 1.0),
            pair_a=pad([p[0] for p in pairs], pp, (), np.int32),
            pair_b=pad([p[1] for p in pairs], pp, (), np.int32),
            pair_flags=pad([p[2] for p in pairs], pp, (), np.int32),
            pair_strength=pad([p[3] for p in pairs], pp),
            pair_distance=pad([p[4] for p in pairs], pp),
            triad_a=pad([t[0] for t in triads], tp, (), np.int32),
            triad_b=pad([t[1] for t in triads], tp, (), np.int32),
            triad_c=pad([t[2] for t in triads], tp, (), np.int32),
            triad_flags=pad([t[3] for t in triads], tp, (), np.int32),
            triad_strength=pad([t[4] for t in triads], tp),
            triad_pa=pad([t[5] for t in triads], tp, (2,)),
            triad_pb=pad([t[6] for t in triads], tp, (2,)),
            triad_pc=pad([t[7] for t in triads], tp, (2,)),
            consecutive_contact_steps=np.zeros(cap, np.int32),
            params=default_params(self.radius, self.density),
        )


# ---------------------------------------------------------------------------
# neighbor search
# ---------------------------------------------------------------------------

def _cell_key(pos, alive, diameter):
    """16-bit packed cell key, row-major so a cell row is contiguous
    (ref: ComputeTag :2610-2611)."""
    inv_d = 1.0 / diameter
    xi = jnp.floor(pos[:, 0] * inv_d).astype(jnp.int32)
    yi = jnp.floor(pos[:, 1] * inv_d).astype(jnp.int32)
    key = ((yi + 0x8000) << 16) | ((xi + 0x8000) & 0xFFFF)
    return jnp.where(alive, key, jnp.iinfo(jnp.int32).max)


def _shift_up(x, k):
    """value at sorted lane i+k (zero past the end)."""
    k = min(k, x.shape[0])
    pad = jnp.zeros((k,) + x.shape[1:], x.dtype)
    return jnp.concatenate([x[k:], pad], axis=0)


def _shift_down(x, k):
    """out[i+k] = x[i] (zero before the start)."""
    k = min(k, x.shape[0])
    pad = jnp.zeros((k,) + x.shape[1:], x.dtype)
    return jnp.concatenate([pad, x[:x.shape[0] - k]], axis=0)


def _partner_same(x, ks):
    """(n, C...) sorted field -> (n, ks, C...) values at lanes i+1..i+ks —
    ks static shifts, ZERO gathers."""
    return jnp.stack([_shift_up(x, k) for k in range(1, ks + 1)], axis=1)


class PairWindows(NamedTuple):
    """Sorted-space neighbor windows (see _find_contacts_sorted).

    The same-row window's partner for (i, k) is sorted lane i+1+k — a
    static shift, so per-pass partner reads and b-side accumulations cost
    ZERO gathers/scatters. Only the row-above window (cand_up) needs real
    indexed ops. Weights are 0 on invalid lanes."""

    cand_up: jnp.ndarray   # (n, ku) i32 clipped sorted partner index
    v_same: jnp.ndarray    # (n, ks) bool
    v_up: jnp.ndarray      # (n, ku) bool
    n_same: jnp.ndarray    # (n, ks, 2) unit normal a->b (0 when invalid)
    n_up: jnp.ndarray      # (n, ku, 2)
    w_same: jnp.ndarray    # (n, ks) contact weight (0 when invalid)
    w_up: jnp.ndarray      # (n, ku)


def _find_contacts_sorted(pos, alive, skey, diameter, cfg: ParticleConfig):
    """Neighbor windows over CELL-SORTED particles
    (ref: FindContacts_Reference :1096-1117).

    pos/alive are already sorted by skey. Each pair appears exactly once
    (all partners are at larger sorted lanes: same row forward + row
    above). Returns (PairWindows, overflow): overflow counts particles
    whose same-row / row-above cell spans exceed the fixed scan windows —
    their excess neighbor contacts are shed this step (surfaced in
    Profile.overflow_particles, never silent)."""
    n = pos.shape[0]
    inv_d = 1.0 / diameter
    ks, ku = cfg.k_same, cfg.k_up
    srow = skey >> 16

    def geom(p_part, al_part, in_rng, row_ok):
        d = p_part - pos[:, None, :]
        dist_sq = m.dot(d, d)
        valid = (alive[:, None] & al_part & in_rng & row_ok
                 & (dist_sq < diameter * diameter))
        inv_dist = jnp.where(
            dist_sq > 0,
            1.0 / jnp.sqrt(jnp.where(dist_sq > 0, dist_sq, 1.0)), 0.0)
        normal = d * inv_dist[..., None]
        weight = 1.0 - dist_sq * inv_dist * inv_d  # ref :1091
        return valid, jnp.where(valid[..., None], normal, 0.0), \
            jnp.where(valid, weight, 0.0)

    # same-row window: the next ks sorted entries (own + next cell) —
    # everything is static shifts
    p_same = _partner_same(pos, ks)
    row_same = _partner_same(srow, ks)
    al_same = _partner_same(alive, ks)
    in_rng_s = (jnp.arange(n)[:, None] + jnp.arange(1, ks + 1)[None, :]) < n
    v_same, n_same, w_same = geom(
        p_same, al_same, in_rng_s, row_same == srow[:, None])

    # row-above window: searchsorted for key(y+1, x-1); ONE packed partner
    # gather (pos + row + alive as f32 columns, n*ku indices)
    up_key = skey + (1 << 16) - 1
    start_up = jnp.searchsorted(skey, up_key)
    raw_up = start_up[:, None] + jnp.arange(ku)[None, :]
    cand_up = jnp.clip(raw_up, 0, n - 1)
    ptab = jnp.concatenate([
        pos, srow.astype(jnp.float32)[:, None],
        alive.astype(jnp.float32)[:, None]], axis=1)
    pu = ptab[cand_up]                       # (n, ku, 4)
    v_up, n_up, w_up = geom(
        pu[..., :2], pu[..., 3] > 0, raw_up < n,
        pu[..., 2].astype(jnp.int32) == srow[:, None] + 1)

    # window-overflow accounting
    lane = jnp.arange(n)
    same_end = jnp.searchsorted(skey, skey + 2)
    up_end = jnp.searchsorted(skey, skey + (1 << 16) + 2)
    over = alive & (((same_end - lane - 1) > ks)
                    | ((up_end - start_up) > ku))
    overflow = jnp.sum(over).astype(jnp.int32)
    return PairWindows(cand_up, v_same, v_up, n_same, n_up,
                       w_same, w_up), overflow


def _pair_accum(a_same, a_up, b_same, b_up, cand_up, n):
    """Accumulate per-pair contributions to per-particle sums in sorted
    space: out[i] += sum_k a_same[i,k] + sum_r a_up[i,r];
    out[i+1+k] += b_same[i,k] (static shifts, no scatter);
    out[cand_up[i,r]] += b_up[i,r] (the ONLY scatter, n*ku indices).
    Contributions must already be masked (0 on invalid lanes)."""
    out = jnp.sum(a_same, axis=1) + jnp.sum(a_up, axis=1)
    ks = a_same.shape[1]
    for k in range(1, ks + 1):
        out = out + _shift_down(b_same[:, k - 1], k)
    flat = b_up.reshape((-1,) + b_up.shape[2:])
    return out.at[cand_up.reshape(-1)].add(flat)


# ---------------------------------------------------------------------------
# point vs rounded-polygon distance (closed form)
# ---------------------------------------------------------------------------

def _point_shape_distance(p, verts, normals, count, radius, verts_next=None):
    """Distance from point to shape surface + outward normal.

    Gather-free: this is vmapped over 100k+ particles per nearby shape, so
    per-call lane gathers (fancy vertex indexing, argmin selects) would cost
    ~15 ns each on TPU. Lane selection uses first-true one-hot sums, and the
    next-vertex table can be hoisted per shape via `verts_next`."""
    lane_ok = _LANES < count
    # face separations
    seps = m.dot(normals, p[None, :] - verts)
    seps_m = jnp.where(lane_ok, seps, -jnp.inf)
    inside = jnp.all(jnp.where(lane_ok, seps <= 0.0, True)) & (count >= 3)
    # per-edge closest point
    v1 = verts
    if verts_next is None:
        verts_next = verts[(jnp.arange(MAX_POLYGON_VERTICES) + 1)
                           % jnp.maximum(count, 1)]
    e = verts_next - v1
    tt = jnp.clip(_safe_div(m.dot(p[None, :] - v1, e), m.dot(e, e)), 0.0, 1.0)
    cp = v1 + tt[:, None] * e
    dd = m.length(p[None, :] - cp)
    dd = jnp.where(lane_ok, dd, jnp.inf)
    dist_out = jnp.min(dd)
    bsel = dd == dist_out
    bsel = bsel & (jnp.cumsum(bsel) == 1)
    closest = jnp.sum(jnp.where(bsel[:, None], cp, 0.0), axis=0)
    n_out = _safe_div_vec(p - closest, dist_out)
    # inside: deepest face
    sep_max = jnp.max(seps_m)
    fsel = seps_m == sep_max
    fsel = fsel & (jnp.cumsum(fsel) == 1)
    n_in = jnp.sum(jnp.where(fsel[:, None], normals, 0.0), axis=0)
    dist = jnp.where(inside, sep_max, dist_out) - radius
    normal = jnp.where(inside, n_in, n_out)
    # degenerate single-point shape (circle): normal from center
    is_pt = count == 1
    dctr = p - verts[0]
    dlen = m.length(dctr)
    dist = jnp.where(is_pt, dlen - radius, dist)
    normal = jnp.where(is_pt, _safe_div_vec(dctr, dlen), normal)
    return dist, normal


def _point_shape_distance_batched(pos, s_origin, s_rot, verts, normals,
                                  counts, radii):
    """(N, Sb) point-vs-shape distances + WORLD-space outward normals —
    the lane-major batched form of _point_shape_distance (same math).

    The vmap(vmap(...)) form operates on (..., 2)-minor arrays, which tile
    to 128 lanes (64x waste) — at 31k particles x 192 shapes that padding
    alone costs tens of ms/iteration. Every elementwise op here runs
    TRANSPOSED, on (Sb, N) / (Sb*V, N) matrices: the particle axis rides
    the 128-lane minor dim at full utilization (the previous (N, Sb*V)
    form tiled its ~24-wide minor dim to 128 — 5x VPU waste, measured
    4.6 ms/iteration at 100k particles, Sb=3). One transpose each for the
    (N, Sb) outputs at the boundary."""
    V = verts.shape[1]
    Sb = verts.shape[0]
    # local point per (shape, particle): R^T (p - origin), componentwise
    dx = pos[:, 0][None, :] - s_origin[:, 0:1]   # (Sb, N)
    dy = pos[:, 1][None, :] - s_origin[:, 1:2]
    c = s_rot[:, 0:1]                            # (Sb, 1)
    s = s_rot[:, 1:2]
    lx = c * dx + s * dy
    ly = -s * dx + c * dy

    # flattened per-(shape, vertex) column tables (Sb*V, 1)
    lane_ok = (_LANES[None, :V] < counts[:, None]).reshape(-1)[:, None]
    vnext = jnp.take_along_axis(
        verts, ((jnp.arange(V)[None, :] + 1)
                % jnp.maximum(counts, 1)[:, None])[..., None], axis=1)
    vx = verts[..., 0].reshape(-1)[:, None]
    vy = verts[..., 1].reshape(-1)[:, None]
    nx = normals[..., 0].reshape(-1)[:, None]
    ny = normals[..., 1].reshape(-1)[:, None]
    ex = vnext[..., 0].reshape(-1)[:, None] - vx
    ey = vnext[..., 1].reshape(-1)[:, None] - vy
    e2 = jnp.maximum(ex * ex + ey * ey, 1e-12)

    lxv = jnp.repeat(lx, V, axis=0)           # (Sb*V, N)
    lyv = jnp.repeat(ly, V, axis=0)
    # face separations
    seps = nx * (lxv - vx) + ny * (lyv - vy)
    seps_m = jnp.where(lane_ok, seps, -jnp.inf)
    inside3 = (jnp.all(jnp.where(lane_ok, seps <= 0.0, True)
                       .reshape(Sb, V, -1), axis=1)
               & (counts[:, None] >= 3))      # (Sb, N)
    # per-edge closest point
    tt = jnp.clip(((lxv - vx) * ex + (lyv - vy) * ey) / e2, 0.0, 1.0)
    cpx = vx + tt * ex
    cpy = vy + tt * ey
    ddx = lxv - cpx
    ddy = lyv - cpy
    dd2 = ddx * ddx + ddy * ddy
    dd = jnp.where(lane_ok, jnp.sqrt(dd2), jnp.inf)
    dd3 = dd.reshape(Sb, V, -1)
    dist_out = jnp.min(dd3, axis=1)           # (Sb, N)
    bsel = dd3 == dist_out[:, None, :]
    bsel = bsel & (jnp.cumsum(bsel, axis=1) == 1)
    cl_x = jnp.sum(jnp.where(bsel, cpx.reshape(Sb, V, -1), 0.0), axis=1)
    cl_y = jnp.sum(jnp.where(bsel, cpy.reshape(Sb, V, -1), 0.0), axis=1)
    safe = jnp.where(dist_out > 0, dist_out, 1.0)
    nox = (lx - cl_x) / safe
    noy = (ly - cl_y) / safe
    # inside: deepest face
    seps3 = seps_m.reshape(Sb, V, -1)
    sep_max = jnp.max(seps3, axis=1)
    fsel = seps3 == sep_max[:, None, :]
    fsel = fsel & (jnp.cumsum(fsel, axis=1) == 1)
    nix = jnp.sum(jnp.where(fsel, normals[..., 0][:, :, None], 0.0), axis=1)
    niy = jnp.sum(jnp.where(fsel, normals[..., 1][:, :, None], 0.0), axis=1)
    dist = jnp.where(inside3, sep_max, dist_out) - radii[:, None]
    lnx = jnp.where(inside3, nix, nox)
    lny = jnp.where(inside3, niy, noy)
    # degenerate single-point shape (circle): normal from center
    is_pt = (counts == 1)[:, None]
    dcx = lx - verts[:, 0, 0][:, None]
    dcy = ly - verts[:, 0, 1][:, None]
    dlen = jnp.sqrt(dcx * dcx + dcy * dcy)
    dls = jnp.where(dlen > 0, dlen, 1.0)
    dist = jnp.where(is_pt, dlen - radii[:, None], dist)
    lnx = jnp.where(is_pt, dcx / dls, lnx)
    lny = jnp.where(is_pt, dcy / dls, lny)
    # rotate normals to world space
    wnx = c * lnx - s * lny
    wny = s * lnx + c * lny
    return dist.T, jnp.stack([wnx.T, wny.T], axis=-1)


def _safe_div(a, b):
    return a / jnp.where(b != 0.0, b, 1.0)


def _safe_div_vec(v, s):
    return v / jnp.where(s != 0.0, s, 1.0)[..., None]


# ---------------------------------------------------------------------------
# the particle solve
# ---------------------------------------------------------------------------

def particle_step(pt: Particles, state: WorldState, dt, cfg: ParticleConfig):
    """One full particle update (ref: Solve :1512-1564). Returns
    (particles, body_dv (Nb,2), body_dw (Nb,), neighbor_overflow):
    neighbor_overflow counts particles that shed neighbor contacts to the
    fixed scan windows this step (max over sub-iterations)."""
    prm: ParticleParams = pt.params
    b = state.bodies
    sh = state.shapes
    nb = b.center.shape[0]
    n = pt.pos.shape[0]

    dt = jnp.asarray(dt, jnp.float32) / cfg.iterations
    inv_dt = _safe_div(jnp.float32(1.0), dt)
    diameter = 2.0 * prm.radius
    inv_diameter = 1.0 / diameter
    crit_v = diameter * inv_dt                       # ref :2480
    crit_v2 = crit_v * crit_v
    crit_p = prm.density * crit_v2                   # ref :2482
    mass = prm.density * prm.radius * prm.radius * jnp.pi  # ref :2484
    inv_mass = _safe_div(jnp.float32(1.0), mass)

    # nearby rigid shapes, compacted once per step (system AABB prefilter)
    sys_lo = jnp.min(jnp.where(pt.alive[:, None], pt.pos, jnp.inf), axis=0) - diameter
    sys_hi = jnp.max(jnp.where(pt.alive[:, None], pt.pos, -jnp.inf), axis=0) + diameter
    boxes = compute_shape_aabbs(state)
    near = (m.aabb_overlaps(boxes, jnp.concatenate([sys_lo, sys_hi])[None, :])
            & sh.enabled & b.enabled[sh.body] & ~sh.is_sensor)
    S = sh.type.shape[0]
    sscore = jnp.where(near, S - jnp.arange(S), 0)
    stop, _ = jax.lax.top_k(sscore, min(cfg.max_body_shapes, S))
    bs_valid = stop > 0
    bs_idx = jnp.where(bs_valid, S - stop, 0)  # (Sb,)
    # shapes near the particle region beyond the cap get no coupling this
    # step — counted into overflow_particles, never silent
    shape_overflow = jnp.maximum(
        jnp.sum(near) - jnp.sum(bs_valid), 0).astype(jnp.int32)

    # per-block shape culling (trace-time): with many nearby shapes (a flat
    # batch replicates one tank per world) the dense (n, Sb) coupling pays
    # for every world's walls at every particle; blocks of 256 sorted
    # particles instead pick their own top-K overlapping shapes per
    # iteration. Shape AABBs are grown by the coupling radius plus one
    # diameter of travel (LimitVelocity caps speed at diameter/dt, so a
    # particle moves < 1 diameter per sub-iteration and the anti-tunnel ray
    # target stays inside the fattened box).
    Sb = bs_idx.shape[0]
    K_CULL = cfg.block_shape_slots
    use_cull = Sb > K_CULL
    if use_cull:
        s_boxes = boxes[bs_idx]
        marg = prm.radius + diameter + PARTICLE_LINEAR_SLOP
        s_fatbox = jnp.concatenate(
            [s_boxes[:, :2] - marg, s_boxes[:, 2:] + marg], axis=-1)
        s_fatbox = jnp.where(bs_valid[:, None], s_fatbox, jnp.inf)

    body_dv = jnp.zeros((nb, 2), jnp.float32)
    body_dw = jnp.zeros(nb, jnp.float32)

    # per-shape body rows, gathered ONCE (Sb indices) and broadcast: body
    # velocities are read pre-step (Jacobi coupling), so these are
    # loop-invariant — the old (Np, Sb) broadcast-index reads cost a
    # ~n*Sb-row gather PER FIELD per iteration (~15 ns/row on TPU)
    p_body = sh.body[bs_idx]                        # (Sb,)
    s_origin = b.origin[p_body]
    s_rot = b.rot[p_body]
    s_center = b.center[p_body]
    s_v = b.v[p_body]
    s_w = b.w[p_body]
    s_invm = b.inv_mass[p_body]
    s_invI = b.inv_inertia[p_body]
    s_dyn = b.type[p_body] == DYNAMIC
    s_verts = sh.verts[bs_idx]
    s_normals = sh.normals[bs_idx]
    s_count = sh.count[bs_idx]
    s_radius = sh.radius[bs_idx]

    if use_cull:
        # ONE packed per-shape row table: the per-iteration block culling
        # gathers (NBlk * K) rows of it (cheap — per-index cost scales with
        # row COUNT, not width)
        V_tab = s_verts.shape[1]
        shape_tab = jnp.concatenate([
            s_origin, s_rot, s_center, s_v,
            s_w[:, None], s_invm[:, None], s_invI[:, None],
            s_dyn.astype(jnp.float32)[:, None],
            s_radius[:, None], s_count.astype(jnp.float32)[:, None],
            s_verts.reshape(Sb, -1), s_normals.reshape(Sb, -1)],
            axis=1)                                     # (Sb, 14 + 4V)

    # trace-time: which gated passes still need the flat (ia, ib) pair view
    # (always-on passes use the sorted-space windows + shifts instead,
    # which removes the dominant n*K-index gather/scatter ops)
    need_flat = (cfg.has_viscous or cfg.has_repulsive or cfg.has_powder
                 or cfg.has_tensile or cfg.has_solid
                 or cfg.has_static_pressure or cfg.has_colormix
                 or cfg.has_rigid)
    need_inv = cfg.has_elastic or cfg.has_spring or cfg.has_barrier

    def iteration(carry, _):
        pt0, body_dv, body_dw, _bc_cnt, s2o, skey_prev = carry
        n_ = pt0.pos.shape[0]

        # ---- cell sort: the WHOLE iteration runs in sorted space --------
        # (gathers/scatters cost per index on TPU; in sorted space the
        # same-row neighbor window becomes static shifts and the row-above
        # window one packed gather — see _find_contacts_sorted).
        # The carry STAYS in sorted order across sub-iterations: pt0's
        # per-particle fields are in the PREVIOUS iteration's sorted order
        # and s2o maps sorted position -> original lane. Each iteration
        # composes the new order on top (one extra int column in the
        # packed scatter); the scatter back to original lanes happens ONCE
        # per step after the scan — the old per-iteration un-sort cost
        # three ~n-row scatters per iteration just so the next iteration
        # could re-gather.
        key = _cell_key(pt0.pos, pt0.alive, diameter)
        use_kernel = cfg.use_window_kernel and not need_flat and not need_inv
        if cfg.rank_repair and use_kernel:
            # NEARLY-SORTED repair (particles_pallas.rank_pass): particles
            # move <= 1 cell per sub-iteration, so the new sorted position
            # is a windowed rank over the previously sorted table — a dense
            # compare-reduce instead of the 3.1 ms full lax.sort at 100k.
            # Falls back to the full sort whenever the preconditions fail
            # (first iteration after host mutation, a > 1-cell jump, or a
            # window wider than the static budget).
            from .particles_pallas import (B_BLK as _RBLK, rank_offsets,
                                           rank_pass, rank_window)
            nbk = -(-n_ // _RBLK)
            rbw = rank_window(n_)
            offs_r, span_ok = rank_offsets(skey_prev, nbk, rbw)
            sorted_ok = jnp.all(skey_prev[1:] >= skey_prev[:-1])
            drow = jnp.abs((key >> 16) - (skey_prev >> 16))
            dcol = jnp.abs((key & 0xFFFF) - (skey_prev & 0xFFFF))
            jump_ok = jnp.all((drow <= 1) & (dcol <= 1))
            use_rank = sorted_ok & jump_ok & jnp.all(span_ok)
            interp_r = jax.default_backend() == "cpu"

            def _rank_fn(_):
                return rank_pass(key, offs_r, nbk, rbw, interp_r)

            def _sort_fn(_):
                order_ = jnp.argsort(key)
                return jnp.zeros(n_, jnp.int32).at[order_].set(
                    jnp.arange(n_, dtype=jnp.int32))

            rank = jax.lax.cond(use_rank, _rank_fn, _sort_fn, None)
        else:
            order_ = jnp.argsort(key)
            rank = jnp.zeros(n_, jnp.int32).at[order_].set(
                jnp.arange(n_, dtype=jnp.int32))
        # permute the per-particle fields the iteration touches with ONE
        # packed SCATTER to the new positions (int columns ride a bitcast;
        # the new skey rides as one more int column): scatter/gather cost
        # is per ROW (~11-33 ns at 100k rows regardless of width), so one
        # (n, 13+) op costs half of the old separate float + int permutes
        # (measured 3.7 ms each at 100k)
        as_f32 = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
        as_i32 = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
        cols = [pt0.pos, pt0.vel, pt0.force, pt0.expiration[:, None],
                pt0.static_pressure[:, None],
                as_f32(jnp.stack([pt0.flags, pt0.group,
                                  pt0.alive.astype(jnp.int32), s2o, key],
                                 axis=1))]
        if cfg.has_solid:
            cols.append(pt0.depth[:, None])
        if cfg.has_colormix:
            cols.append(pt0.color.reshape(n_, -1))  # (Np, 4) f32 RGBA
        pack_src = jnp.concatenate(cols, axis=1)
        pack = jnp.zeros_like(pack_src).at[rank].set(pack_src)
        ipack = as_i32(pack[:, 8:13])
        s2o_new = ipack[:, 3]
        skey = ipack[:, 4]
        pt = dataclasses.replace(
            pt0, pos=pack[:, 0:2], vel=pack[:, 2:4], force=pack[:, 4:6],
            expiration=pack[:, 6], static_pressure=pack[:, 7],
            flags=ipack[:, 0], group=ipack[:, 1], alive=ipack[:, 2] > 0)
        c_at = 13
        if cfg.has_solid:
            pt = dataclasses.replace(pt, depth=pack[:, c_at])
            c_at += 1
        if cfg.has_colormix:
            nc = pt0.color.reshape(n_, -1).shape[1]
            pt = dataclasses.replace(
                pt, color=pack[:, c_at:c_at + nc].reshape(pt0.color.shape))
        if need_inv:
            # triad/pair indices are stored as ORIGINAL lane ids (the carry
            # never overwrites them); map original -> current sorted pos
            inv_order = jnp.zeros(n_, jnp.int32).at[s2o_new].set(
                jnp.arange(n_, dtype=jnp.int32))

            def remap(idx):
                return jnp.where(idx >= 0,
                                 inv_order[jnp.maximum(idx, 0)], idx)

            pt = dataclasses.replace(
                pt, triad_a=remap(pt0.triad_a), triad_b=remap(pt0.triad_b),
                triad_c=remap(pt0.triad_c), pair_a=remap(pt0.pair_a),
                pair_b=remap(pt0.pair_b))
        pos = pt.pos
        vel = pt.vel

        # ---- neighbor contacts (ref UpdateContacts) ----
        if use_kernel:
            # dense masked-band Pallas path (particles_pallas.py): the pair
            # passes become per-block band sweeps with zero per-index ops
            from .particles_pallas import (PH_DAMPING, PH_PRESSURE,
                                           PH_WEIGHT, B_BLK, block_offsets,
                                           build_tab, window_pass)
            interp = jax.default_backend() == "cpu"
            n_blocks = -(-n_ // B_BLK)
            srow_k = skey >> 16
            scol_k = skey & 0xFFFF
            spos_k = jnp.where(pt.alive[:, None], pos, 1e9)
            offs_k = block_offsets(skey, n_blocks)
            scal_k = jnp.stack([
                jnp.asarray(inv_diameter, jnp.float32),
                jnp.asarray(diameter * diameter, jnp.float32),
                jnp.asarray(prm.damping_strength, jnp.float32),
                _safe_div(jnp.float32(1.0), crit_v),
                jnp.asarray(dt * (1.0 / prm.density) * inv_diameter,
                            jnp.float32),
                jnp.float32(0), jnp.float32(0), jnp.float32(0)])[None, :]
            zcol_k = jnp.zeros(n_, jnp.float32)

            def kernel_pass(phase, p0, p1):
                out = window_pass(
                    build_tab(spos_k, srow_k, scol_k, pt.alive, p0, p1,
                              n_blocks),
                    offs_k, scal_k, phase, n_blocks, interp)
                return out[:n_]

            outw = kernel_pass(PH_WEIGHT, zcol_k, zcol_k)
            w_pairs = outw[:, 0]
            c_over = jnp.sum(outw[:, 2]).astype(jnp.int32)
            pw = None
        else:
            pw, c_over = _find_contacts_sorted(pos, pt.alive, skey, diameter,
                                               cfg)
        ks, ku = cfg.k_same, cfg.k_up
        if need_flat:
            # flat sorted-space pair view for the gated passes
            idx_same = jnp.clip(
                jnp.arange(n_)[:, None] + jnp.arange(1, ks + 1)[None, :],
                0, n_ - 1)
            cand = jnp.concatenate([idx_same, pw.cand_up], axis=1)
            ia = jnp.broadcast_to(jnp.arange(n_)[:, None],
                                  cand.shape).reshape(-1)
            ib = cand.reshape(-1)
            c_ok = jnp.concatenate([pw.v_same, pw.v_up], axis=1).reshape(-1)
            c_n = jnp.concatenate([pw.n_same, pw.n_up],
                                  axis=1).reshape(-1, 2)
            c_w = jnp.concatenate([pw.w_same, pw.w_up], axis=1).reshape(-1)
            c_flags = jnp.where(c_ok, pt.flags[ia] | pt.flags[ib], 0)

        # ---- body contacts (ref UpdateBodyContacts) ----
        # (Np, C) point-shape distances in the lane-major batched form
        # (see _point_shape_distance_batched); all body fields come from
        # the per-shape rows (broadcasts), never (Np, C)-index gathers.
        # C = Sb dense, or K per-block-culled shape slots (use_cull).
        if use_cull:
            NBlk = -(-n_ // _CULL_BLK)
            npad = NBlk * _CULL_BLK - n_
            posp = jnp.concatenate(
                [pos, jnp.full((npad, 2), 1e9, jnp.float32)]
            ).reshape(NBlk, _CULL_BLK, 2)
            alivep = jnp.concatenate(
                [pt.alive, jnp.zeros(npad, bool)]).reshape(NBlk, _CULL_BLK)
            pm = jnp.where(alivep[..., None], posp, jnp.inf)
            blk_lo = jnp.min(pm, axis=1)                    # (NBlk, 2)
            blk_hi = jnp.max(jnp.where(alivep[..., None], posp, -jnp.inf),
                             axis=1)
            ov = ((blk_lo[:, None, 0] <= s_fatbox[None, :, 2])
                  & (s_fatbox[None, :, 0] <= blk_hi[:, None, 0])
                  & (blk_lo[:, None, 1] <= s_fatbox[None, :, 3])
                  & (s_fatbox[None, :, 1] <= blk_hi[:, None, 1])
                  & bs_valid[None, :])                      # (NBlk, Sb)
            scoreC = jnp.where(ov, Sb - jnp.arange(Sb)[None, :], 0)
            topC, _ = jax.lax.top_k(scoreC, K_CULL)
            blk_ok = topC > 0                               # (NBlk, K)
            blk_j = jnp.where(blk_ok, Sb - topC, 0)
            cull_over = jnp.sum(jnp.maximum(
                jnp.sum(ov, axis=1) - K_CULL, 0)).astype(jnp.int32)
            rows = shape_tab[blk_j.reshape(-1)].reshape(NBlk, K_CULL, -1)
            g_origin = rows[..., 0:2]
            g_rot = rows[..., 2:4]
            g_center = rows[..., 4:6]
            g_v = rows[..., 6:8]
            g_w = rows[..., 8]
            g_invm = jnp.where(blk_ok, rows[..., 9], 0.0)
            g_invI = jnp.where(blk_ok, rows[..., 10], 0.0)
            g_dyn = (rows[..., 11] > 0) & blk_ok
            g_radius = rows[..., 12]
            g_count = rows[..., 13].astype(jnp.int32)
            g_verts = rows[..., 14:14 + 2 * V_tab].reshape(
                NBlk, K_CULL, V_tab, 2)
            g_normals = rows[..., 14 + 2 * V_tab:].reshape(
                NBlk, K_CULL, V_tab, 2)
            blk_body = jnp.where(blk_ok, p_body[blk_j], nb)  # nb drops

            def expand(a):
                """(NBlk, K, ...) block rows -> (n, K, ...) per particle."""
                out = jnp.broadcast_to(
                    a[:, None], (NBlk, _CULL_BLK) + a.shape[1:])
                return out.reshape((NBlk * _CULL_BLK,) + a.shape[1:])[:n_]

            bdist_b, bnrm_b = jax.vmap(_point_shape_distance_batched)(
                posp, g_origin, g_rot, g_verts, g_normals, g_count,
                g_radius)
            bdist = bdist_b.reshape(-1, K_CULL)[:n_]
            bnrm = bnrm_b.reshape(-1, K_CULL, 2)[:n_]
            bc_valid = expand(blk_ok)
            e_center = expand(g_center)
            e_v = expand(g_v)
            e_w = expand(g_w)
            e_invm = expand(g_invm)
            e_invI = expand(g_invI)
            e_dyn = expand(g_dyn)
            blk_ctx = (NBlk, _CULL_BLK, npad, g_origin, g_rot, g_verts,
                       g_normals, g_count, blk_ok)
        else:
            bdist, bnrm = _point_shape_distance_batched(
                pos, s_origin, s_rot, s_verts, s_normals, s_count, s_radius)
            bc_valid = bs_valid[None, :]
            e_center = s_center[None, :, :]
            e_v = s_v[None, :, :]
            e_w = s_w[None, :]
            e_invm = s_invm[None, :]
            e_invI = s_invI[None, :]
            e_dyn = s_dyn[None, :]
            cull_over = jnp.int32(0)
            blk_ctx = None

        def body_vel_at(points):
            """Body surface velocity at (n, C, 2) points (broadcast rows)."""
            return e_v + m.cross_sv(e_w, points - e_center)

        def apply_body_impulse(dv, dw, impulse, points, active):
            """Accumulate (n, C, 2) per-contact impulses onto bodies: reduce
            per SHAPE (dense) or per (block, slot) first, then scatter few
            rows — replaces the old n*C-index scatter-adds (ref
            particle/World.cs:47-61 applies each impulse immediately;
            summing first is the same Jacobi total)."""
            imp = jnp.where((active & e_dyn)[..., None], impulse, 0.0)
            ang = m.cross(points - e_center, imp)            # (n, C)
            if use_cull:
                imp_s = jnp.sum(jnp.concatenate(
                    [imp, jnp.zeros((npad, K_CULL, 2), imp.dtype)]
                ).reshape(NBlk, _CULL_BLK, K_CULL, 2), axis=1)
                ang_s = jnp.sum(jnp.concatenate(
                    [ang, jnp.zeros((npad, K_CULL), ang.dtype)]
                ).reshape(NBlk, _CULL_BLK, K_CULL), axis=1)
                dv = dv.at[blk_body].add(imp_s * g_invm[..., None],
                                         mode="drop")
                dw = dw.at[blk_body].add(g_invI * ang_s, mode="drop")
            else:
                imp_sum = jnp.sum(imp, axis=0)               # (Sb, 2)
                ang_sum = jnp.sum(ang, axis=0)               # (Sb,)
                dv = dv.at[p_body].add(imp_sum * s_invm[:, None])
                dw = dw.at[p_body].add(s_invI * ang_sum)
            return dv, dw

        bc_ok = (bdist < prm.radius) & pt.alive[:, None] & bc_valid
        # contact normal points particle -> shape (ref stores -output.normal)
        bc_n = -bnrm
        bc_w = 1.0 - bdist * inv_diameter * 2.0       # ref :1492 weight
        bc_w = jnp.where(bc_ok, bc_w, 0.0)
        # per-contact effective mass (ref :1472-1475)
        lever = pos[:, None, :] - e_center
        rpn = m.cross(lever, bnrm)
        wall = (pt.flags & P_WALL) != 0
        inv_m_c = (jnp.where(wall, 0.0, inv_mass)[:, None]
                   + e_invm + e_invI * rpn * rpn)
        bc_mass = jnp.where(inv_m_c > 0, 1.0 / jnp.where(inv_m_c > 0, inv_m_c, 1.0), 0.0)
        bc_mass = jnp.where(bc_ok, bc_mass, 0.0)

        # ---- weight (ref ComputeWeight) ----
        weight = (w_pairs if use_kernel else
                  _pair_accum(pw.w_same, pw.w_up, pw.w_same, pw.w_up,
                              pw.cand_up, n_)) + jnp.sum(bc_w, axis=1)

        if cfg.has_solid:
            # ---- depth relaxation (ref ComputeDepth :1002-1062) ----
            # runs once per group change: groups flagged G_NEEDS_DEPTH seed
            # surface particles (contact weight < 0.8) at depth 0 and relax
            # interior depths over same-group contact edges, then clear the
            # flag; lax.cond skips the whole pass when no group is flagged.
            needs = (pt.group_flags & G_NEEDS_DEPTH) != 0

            def depth_pass(_):
                ga = pt.group[ia]
                gb = pt.group[ib]
                same = (c_ok & (ga == gb) & (ga >= 0)
                        & needs[jnp.maximum(ga, 0)])
                w_acc = (jnp.zeros(n, jnp.float32)
                         .at[ia].add(jnp.where(same, c_w, 0.0))
                         .at[ib].add(jnp.where(same, c_w, 0.0)))
                upd = (pt.alive & (pt.group >= 0)
                       & needs[jnp.maximum(pt.group, 0)])
                big_d = jnp.float32(1e9)
                d0 = jnp.where(w_acc < 0.8, 0.0, big_d)
                r_edge = jnp.where(same, 1.0 - c_w, big_d)

                def relax_iter(st):
                    it, d, _ = st
                    dn = (d.at[ia].min(jnp.where(same, d[ib] + r_edge,
                                                 big_d), mode="drop")
                          .at[ib].min(jnp.where(same, d[ia] + r_edge,
                                                big_d), mode="drop"))
                    return it + 1, dn, jnp.any(dn < d)

                _, d, _ = jax.lax.while_loop(
                    lambda st: (st[0] < cfg.depth_iterations) & st[2],
                    relax_iter, (jnp.int32(0), d0, jnp.bool_(True)))
                d = jnp.where(d < big_d, d * diameter, 0.0)
                return (jnp.where(upd, d, pt.depth),
                        pt.group_flags & ~(needs * G_NEEDS_DEPTH))

            new_depth, new_gflags = jax.lax.cond(
                jnp.any(needs), depth_pass,
                lambda _: (pt.depth, pt.group_flags), None)
            pt = dataclasses.replace(pt, depth=new_depth,
                                     group_flags=new_gflags)

        # ---- force (user forces, ref SolveForce) ----
        vel = vel + dt * inv_mass * pt.force

        if cfg.has_viscous:
            # ---- viscous (ref SolveViscous) ----
            visc = (c_flags & P_VISCOUS) != 0
            f = prm.viscous_strength * c_w[:, None] * (vel[ib] - vel[ia])
            f = jnp.where(visc[:, None], f, 0.0)
            vel = vel.at[ia].add(f).at[ib].add(-f)
            bvisc = bc_ok & ((pt.flags & P_VISCOUS) != 0)[:, None]
            fb = (prm.viscous_strength * bc_mass * bc_w)[..., None] * (
                body_vel_at(pos[:, None, :]) - vel[:, None, :])
            fb = jnp.where(bvisc[..., None], fb, 0.0)
            vel = vel + inv_mass * jnp.sum(fb, axis=1)
            body_dv, body_dw = apply_body_impulse(
                body_dv, body_dw, -fb,
                jnp.broadcast_to(pos[:, None, :], fb.shape), bvisc)

        if cfg.has_repulsive:
            # ---- repulsive (ref SolveRepulsive) ----
            rep = ((c_flags & P_REPULSIVE) != 0) & (pt.group[ia] != pt.group[ib])
            f = (prm.repulsive_strength * crit_v * c_w)[:, None] * c_n
            f = jnp.where(rep[:, None], f, 0.0)
            vel = vel.at[ia].add(-f).at[ib].add(f)

        if cfg.has_powder:
            # ---- powder (ref SolvePowder) ----
            min_w = 1.0 - PARTICLE_STRIDE
            pow_ = ((c_flags & P_POWDER) != 0) & (c_w > min_w)
            f = (prm.powder_strength * crit_v * (c_w - min_w))[:, None] * c_n
            f = jnp.where(pow_[:, None], f, 0.0)
            vel = vel.at[ia].add(-f).at[ib].add(f)

        if cfg.has_tensile:
            # ---- tensile (ref SolveTensile) ----
            tens = (c_flags & P_TENSILE) != 0
            wn = ((1.0 - c_w) * c_w)[:, None] * c_n
            wn = jnp.where(tens[:, None], wn, 0.0)
            acc2 = jnp.zeros((n, 2), jnp.float32)
            acc2 = acc2.at[ia].add(-wn).at[ib].add(wn)
            p_s = prm.surface_tension_pressure * crit_v
            n_s = prm.surface_tension_normal * crit_v
            max_var = MAX_PARTICLE_FORCE * crit_v
            fh = jnp.minimum(
                p_s * (weight[ia] + weight[ib] - 2.0)
                + n_s * m.dot(acc2[ib] - acc2[ia], c_n), max_var) * c_w
            f = jnp.where(tens, fh, 0.0)[:, None] * c_n
            vel = vel.at[ia].add(-f).at[ib].add(f)

        if cfg.has_solid:
            # ---- solid ejection (ref SolveSolid :2200) ----
            sol = (pt.group[ia] != pt.group[ib]) & c_ok
            ej = (prm.ejection_strength * inv_dt
                  * (pt.depth[ia] + pt.depth[ib]) * c_w)
            f = jnp.where(sol, ej, 0.0)[:, None] * c_n
            vel = vel.at[ia].add(-f).at[ib].add(f)

        # ---- gravity (ref SolveGravity) ----
        g_ = dt * prm.gravity_scale * state.tuning.gravity
        vel = vel + jnp.where(pt.alive[:, None], g_[None, :], 0.0)

        sp_mask = (pt.flags & P_STATIC_PRESSURE) != 0
        static_pressure = pt.static_pressure
        if cfg.has_static_pressure:
            # ---- static pressure (ref SolveStaticPressure) ----
            sp_mask = (pt.flags & P_STATIC_PRESSURE) != 0
            pp_w = prm.static_pressure_strength * crit_p
            max_p = MAX_PARTICLE_PRESSURE * crit_p
            relax = prm.static_pressure_relaxation

            def sp_iter(spb, _):
                acc = jnp.zeros(n, jnp.float32)
                cw_sp = jnp.where((c_flags & P_STATIC_PRESSURE) != 0, c_w, 0.0)
                acc = acc.at[ia].add(cw_sp * spb[ib]).at[ib].add(cw_sp * spb[ia])
                spb_n = jnp.clip(
                    (acc + pp_w * (weight - MIN_PARTICLE_WEIGHT)) / (weight + relax),
                    0.0, max_p)
                return jnp.where(sp_mask, spb_n, 0.0), None

            static_pressure, _ = jax.lax.scan(
                sp_iter, pt.static_pressure, None,
                length=cfg.static_pressure_iterations)

        # ---- pressure (ref SolvePressure) ----
        ppw = prm.pressure_strength * crit_p
        maxp = MAX_PARTICLE_PRESSURE * crit_p
        accum = jnp.minimum(ppw * jnp.maximum(0.0, weight - MIN_PARTICLE_WEIGHT),
                            maxp)
        accum = jnp.where((pt.flags & _NO_PRESSURE) != 0, 0.0, accum)
        accum = accum + jnp.where(sp_mask, static_pressure, 0.0)
        vel_per_p = dt * (1.0 / prm.density) * inv_diameter
        # body contacts
        fb = (vel_per_p * bc_w * bc_mass
              * (accum[:, None] + ppw * bc_w))[..., None] * bc_n
        fb = jnp.where(bc_ok[..., None], fb, 0.0)
        vel = vel - inv_mass * jnp.sum(fb, axis=1)
        body_dv, body_dw = apply_body_impulse(
            body_dv, body_dw, fb,
            jnp.broadcast_to(pos[:, None, :], fb.shape), bc_ok)
        if use_kernel:
            vel = vel + kernel_pass(PH_PRESSURE, accum, zcol_k)[:, :2]
        else:
            # particle contacts: a-side reads are broadcasts, same-row
            # partner reads are shifts, up-row partner reads one packed
            # gather
            acc_b_s = _partner_same(accum, ks)              # (n, ks)
            acc_b_u = accum[pw.cand_up]                     # (n, ku)
            f_s = (vel_per_p * pw.w_same
                   * (accum[:, None] + acc_b_s))[..., None] * pw.n_same
            f_u = (vel_per_p * pw.w_up
                   * (accum[:, None] + acc_b_u))[..., None] * pw.n_up
            vel = vel + _pair_accum(-f_s, -f_u, f_s, f_u, pw.cand_up, n_)

        # ---- damping (ref SolveDamping) ----
        lin_d = prm.damping_strength
        quad_d = _safe_div(jnp.float32(1.0), crit_v)
        vrel = body_vel_at(pos[:, None, :]) - vel[:, None, :]
        vn = m.dot(vrel, bc_n)
        damp = jnp.maximum(lin_d * bc_w, jnp.minimum(-quad_d * vn, 0.5))
        fb = (damp * bc_mass * vn)[..., None] * bc_n
        fb = jnp.where((bc_ok & (vn < 0))[..., None], fb, 0.0)
        vel = vel + inv_mass * jnp.sum(fb, axis=1)
        body_dv, body_dw = apply_body_impulse(
            body_dv, body_dw, -fb,
            jnp.broadcast_to(pos[:, None, :], fb.shape), bc_ok & (vn < 0))
        if use_kernel:
            vel = vel + kernel_pass(PH_DAMPING, vel[:, 0], vel[:, 1])[:, :2]
        else:
            # particle-pair damping in window form (shifts + one gather)
            vb_s = _partner_same(vel, ks)                   # (n, ks, 2)
            vb_u = vel[pw.cand_up]                          # (n, ku, 2)
            vn_s = m.dot(vb_s - vel[:, None, :], pw.n_same)
            vn_u = m.dot(vb_u - vel[:, None, :], pw.n_up)
            damp_s = jnp.maximum(lin_d * pw.w_same,
                                 jnp.minimum(-quad_d * vn_s, 0.5))
            damp_u = jnp.maximum(lin_d * pw.w_up,
                                 jnp.minimum(-quad_d * vn_u, 0.5))
            f_ds = jnp.where((pw.v_same & (vn_s < 0))[..., None],
                             (damp_s * vn_s)[..., None] * pw.n_same, 0.0)
            f_du = jnp.where((pw.v_up & (vn_u < 0))[..., None],
                             (damp_u * vn_u)[..., None] * pw.n_up, 0.0)
            vel = vel + _pair_accum(f_ds, f_du, -f_ds, -f_du, pw.cand_up, n_)

        if cfg.has_static_pressure:
            # ---- extra damping for static-pressure particles (ref :1978) ----
            ed = bc_ok & (((pt.flags & P_STATIC_PRESSURE) != 0))[:, None]
            vrel = body_vel_at(pos[:, None, :]) - vel[:, None, :]
            vn = m.dot(vrel, bc_n)
            fb = (0.5 * bc_mass * vn)[..., None] * bc_n
            fb = jnp.where((ed & (vn < 0))[..., None], fb, 0.0)
            vel = vel + inv_mass * jnp.sum(fb, axis=1)
            body_dv, body_dw = apply_body_impulse(
                body_dv, body_dw, -fb,
                jnp.broadcast_to(pos[:, None, :], fb.shape), ed & (vn < 0))

        if cfg.has_elastic:
            # ---- elastic triads (ref SolveElastic) ----
            ta, tb, tc = pt.triad_a, pt.triad_b, pt.triad_c
            # dead particles sever their triads (ref zombifies triads whose
            # member died, SolveZombie :2873-2906)
            el = (((pt.triad_flags & P_ELASTIC) != 0)
                  & pt.alive[ta] & pt.alive[tb] & pt.alive[tc])
            pa_ = pos[ta] + dt * vel[ta]
            pb_ = pos[tb] + dt * vel[tb]
            pc_ = pos[tc] + dt * vel[tc]
            midp = (pa_ + pb_ + pc_) / 3.0
            pa_, pb_, pc_ = pa_ - midp, pb_ - midp, pc_ - midp
            rc = (m.dot(pt.triad_pa, pa_) + m.dot(pt.triad_pb, pb_)
                  + m.dot(pt.triad_pc, pc_))
            rs = (m.cross(pt.triad_pa, pa_) + m.cross(pt.triad_pb, pb_)
                  + m.cross(pt.triad_pc, pc_))
            r = m.rot_normalize(jnp.stack([rc, rs], axis=-1))
            strength = (prm.elastic_strength * inv_dt * pt.triad_strength)
            strength = jnp.where(el, strength, 0.0)
            fa = strength[:, None] * (m.rot_vec(r, pt.triad_pa) - pa_)
            fbv = strength[:, None] * (m.rot_vec(r, pt.triad_pb) - pb_)
            fc = strength[:, None] * (m.rot_vec(r, pt.triad_pc) - pc_)
            vel = vel.at[ta].add(fa).at[tb].add(fbv).at[tc].add(fc)

        if cfg.has_spring:
            # ---- springs (ref SolveSpring) ----
            sa, sb_ = pt.pair_a, pt.pair_b
            spr = (((pt.pair_flags & P_SPRING) != 0)
                   & pt.alive[sa] & pt.alive[sb_])
            dvec = (pos[sb_] + dt * vel[sb_]) - (pos[sa] + dt * vel[sa])
            r1 = m.length(dvec)
            fs = (prm.spring_strength * inv_dt * pt.pair_strength
                  * _safe_div(pt.pair_distance - r1, r1))[:, None] * dvec
            fs = jnp.where(spr[:, None], fs, 0.0)
            vel = vel.at[sa].add(-fs).at[sb_].add(fs)

        # ---- limit velocity (ref LimitVelocity) ----
        v2 = m.dot(vel, vel)
        over = v2 > crit_v2
        vel = jnp.where(over[:, None],
                        vel * jnp.sqrt(_safe_div(crit_v2, v2))[:, None], vel)

        if cfg.has_rigid:
            # ---- rigid-group damping (ref SolveRigidDamping :1916-1977) --
            # Impulses are accumulated Jacobi-style per group (the reference
            # applies them sequentially per contact) and applied once as a
            # rigid-motion velocity delta to all members.
            (in_rigid, ngrp, g_center, g_linvel, g_omega,
             g_invm, g_invI) = _rigid_group_stats(pt, pos, vel, mass)
            gp = jnp.maximum(pt.group, 0)
            damping = prm.damping_strength
            glin_d = jnp.zeros((ngrp, 2), jnp.float32)
            gw_d = jnp.zeros(ngrp, jnp.float32)

            # (a) rigid group <-> rigid body contacts
            rel_g = pos[:, None, :] - g_center[gp][:, None, :]
            pgv = (g_linvel[gp][:, None, :]
                   + m.cross_sv(g_omega[gp][:, None], rel_g))
            vn = m.dot(body_vel_at(pos[:, None, :]) - pgv, bc_n)
            act = in_rigid[:, None] & bc_ok & (vn < 0)
            td_a = m.cross(rel_g, bc_n)
            td_b = m.cross(pos[:, None, :] - e_center, bc_n)
            ksum = (g_invm[gp][:, None] + g_invI[gp][:, None] * td_a * td_a
                    + e_invm + e_invI * td_b * td_b)
            f = damping * jnp.minimum(bc_w, 1.0) * _safe_div(vn, ksum)
            f = jnp.where(act & (ksum > 0), f, 0.0)
            gl_flat = jnp.broadcast_to(gp[:, None], f.shape).reshape(-1)
            glin_d = glin_d.at[gl_flat].add(
                ((f * g_invm[gp][:, None])[..., None] * bc_n).reshape(-1, 2))
            gw_d = gw_d.at[gl_flat].add(
                (f * td_a * g_invI[gp][:, None]).reshape(-1))
            body_dv, body_dw = apply_body_impulse(
                body_dv, body_dw, -f[..., None] * bc_n,
                jnp.broadcast_to(pos[:, None, :], bc_n.shape), act)

            # (b) particle contacts across groups where either side is rigid
            ga_g = jnp.maximum(pt.group[ia], 0)
            gb_g = jnp.maximum(pt.group[ib], 0)
            a_r = in_rigid[ia]
            b_r = in_rigid[ib]
            pmid = 0.5 * (pos[ia] + pos[ib])
            pw_inv = jnp.where((pt.flags & P_WALL) != 0, 0.0, inv_mass)

            def side(gsel, rsel, pidx):
                relm = pmid - g_center[gsel]
                vl = jnp.where(
                    rsel[:, None],
                    g_linvel[gsel] + m.cross_sv(g_omega[gsel], relm),
                    vel[pidx])
                inv_m_s = jnp.where(rsel, g_invm[gsel], pw_inv[pidx])
                inv_i_s = jnp.where(rsel, g_invI[gsel], 0.0)
                td = jnp.where(rsel, m.cross(relm, c_n), 0.0)
                return vl, inv_m_s, inv_i_s, td

            va_l, ima, iia, tda = side(ga_g, a_r, ia)
            vb_l, imb, iib, tdb = side(gb_g, b_r, ib)
            vn_p = m.dot(vb_l - va_l, c_n)
            actp = (c_ok & (pt.group[ia] != pt.group[ib]) & (a_r | b_r)
                    & (vn_p < 0))
            ksum_p = ima + iia * tda * tda + imb + iib * tdb * tdb
            fp = damping * c_w * _safe_div(vn_p, ksum_p)
            fp = jnp.where(actp & (ksum_p > 0), fp, 0.0)
            # side A gets +fp, side B gets -fp (ref ApplyDamping)
            glin_d = glin_d.at[jnp.where(a_r, ga_g, ngrp - 1)].add(
                jnp.where(a_r, fp * ima, 0.0)[:, None] * c_n)
            gw_d = gw_d.at[jnp.where(a_r, ga_g, ngrp - 1)].add(
                jnp.where(a_r, fp * tda * iia, 0.0))
            vel = vel.at[ia].add(
                jnp.where(~a_r, fp * ima, 0.0)[:, None] * c_n)
            glin_d = glin_d.at[jnp.where(b_r, gb_g, ngrp - 1)].add(
                jnp.where(b_r, -fp * imb, 0.0)[:, None] * c_n)
            gw_d = gw_d.at[jnp.where(b_r, gb_g, ngrp - 1)].add(
                jnp.where(b_r, -fp * tdb * iib, 0.0))
            vel = vel.at[ib].add(
                jnp.where(~b_r, -fp * imb, 0.0)[:, None] * c_n)

            # apply accumulated rigid-motion deltas to members
            vel = vel + jnp.where(
                in_rigid[:, None],
                glin_d[gp] + m.cross_sv(gw_d[gp], pos - g_center[gp]),
                0.0)

        if cfg.has_wall:
            # ---- wall particles stay put (ref SolveWall) ----
            vel = jnp.where((((pt.flags & P_WALL) != 0))[:, None],
                            jnp.zeros_like(vel), vel)

        if cfg.has_rigid:
            # ---- rigid groups move as rigid bodies (ref SolveRigid) ----
            vel = _solve_rigid(pt, pos, vel, mass, dt, inv_dt)

        # ---- collision anti-tunneling (ref SolveCollision) ----
        vel = _solve_collision(pt, pos, vel, state, bs_idx, bs_valid,
                               dt, inv_dt, prm, cfg.geom_types, blk_ctx)

        # ---- barrier segments block crossing (ref SolveBarrier) ----
        if cfg.has_barrier:
            vel = _solve_barrier(pt, pos, vel, dt, inv_dt, mass)

        col = pt.color
        if cfg.has_colormix:
            # ---- color mixing (ref SolveColorMixing :2243) ----
            col = pt.color
            mix = ((c_flags & P_COLOR_MIXING) != 0) & c_ok
            dcol = 0.5 * prm.color_mixing_strength * (col[ib] - col[ia])
            dcol = jnp.where(mix[:, None], dcol, 0.0)
            col = col.at[ia].add(dcol).at[ib].add(-dcol)

        # ---- lifetimes (ref SolveLifetimes :1516) ----
        expiration = jnp.where(pt.expiration > 0.0, pt.expiration - dt,
                               pt.expiration)
        alive = pt.alive & ~((pt.expiration > 0.0) & (expiration <= 0.0))

        # ---- integrate (ref :1554-1561) ----
        pos = pos + jnp.where(pt.alive[:, None], dt * vel, 0.0)

        # ---- carry stays SORTED: only update the mutated fields ----
        pt2 = dataclasses.replace(
            pt, pos=pos, vel=vel, expiration=expiration, alive=alive)
        if cfg.has_static_pressure:
            pt2 = dataclasses.replace(pt2, static_pressure=static_pressure)
        if cfg.has_colormix:
            pt2 = dataclasses.replace(pt2, color=col)
        if need_inv:
            # restore the ORIGINAL-lane triad/pair ids (pt holds this
            # iteration's remapped copies)
            pt2 = dataclasses.replace(
                pt2, triad_a=pt0.triad_a, triad_b=pt0.triad_b,
                triad_c=pt0.triad_c, pair_a=pt0.pair_a, pair_b=pt0.pair_b)
        bc_cnt = jnp.sum(bc_ok, axis=1).astype(jnp.int32)
        return (pt2, body_dv, body_dw, bc_cnt, s2o_new,
                skey), c_over + cull_over

    n0 = pt.pos.shape[0]
    bc_cnt0 = jnp.zeros(n0, jnp.int32)
    pt_orig = pt
    # initial sort keys in ORIGINAL lane order: iteration 1's rank repair
    # engages only if the original order happens to be key-sorted (fresh
    # row-major spawns often are); otherwise the sortedness check falls
    # back to the full sort
    skey0 = _cell_key(pt.pos, pt.alive, diameter)
    (pt_s, body_dv, body_dw, bc_cnt_s, s2o, _), c_over_iters = jax.lax.scan(
        iteration, (pt, body_dv, body_dw, bc_cnt0,
                    jnp.arange(n0, dtype=jnp.int32), skey0), None,
        length=cfg.iterations)
    neighbor_overflow = (jnp.max(c_over_iters).astype(jnp.int32)
                         + shape_overflow)

    # ---- un-sort ONCE: scatter the mutated fields back to original lanes
    # (one packed float scatter + one packed int scatter per STEP, instead
    # of three per sub-iteration)
    fcols = [pt_s.pos, pt_s.vel, pt_s.expiration[:, None]]
    if cfg.has_static_pressure:
        fcols.append(pt_s.static_pressure[:, None])
    if cfg.has_colormix:
        fcols.append(pt_s.color.reshape(n0, -1).astype(jnp.float32))
    if cfg.has_solid:
        fcols.append(pt_s.depth[:, None])
    fout = jnp.concatenate(fcols, axis=1)
    fback = jnp.zeros_like(fout).at[s2o].set(fout)
    iback = jnp.zeros((n0, 2), jnp.int32).at[s2o].set(
        jnp.stack([pt_s.alive.astype(jnp.int32), bc_cnt_s], axis=1))
    alive_o = iback[:, 0] > 0
    bc_cnt = iback[:, 1]
    pt = dataclasses.replace(
        pt_orig, pos=fback[:, 0:2], vel=fback[:, 2:4], expiration=fback[:, 4],
        alive=alive_o)
    c = 5
    if cfg.has_static_pressure:
        pt = dataclasses.replace(pt, static_pressure=fback[:, c])
        c += 1
    if cfg.has_colormix:
        nc = pt_orig.color.reshape(n0, -1).shape[1]
        pt = dataclasses.replace(
            pt, color=fback[:, c:c + nc].astype(pt_orig.color.dtype)
            .reshape(pt_orig.color.shape))
        c += nc
    if cfg.has_solid:
        pt = dataclasses.replace(pt, depth=fback[:, c],
                                 group_flags=pt_s.group_flags)
        c += 1
    # stuck detection (ref DetectStuckParticle :1520-1541): particles with
    # >= 2 body contacts this step extend their streak, others reset
    stuck_now = pt.alive & (bc_cnt >= 2)
    pt = dataclasses.replace(
        pt, force=jnp.zeros_like(pt.force),
        consecutive_contact_steps=jnp.where(
            stuck_now, pt.consecutive_contact_steps + 1, 0))
    return pt, body_dv, body_dw, neighbor_overflow


def _solve_barrier(pt: Particles, pos, vel, dt, inv_dt, mass):
    """Barrier pass (ref: SolveBarrier :1670-1760): every pair flagged
    P_BARRIER is a moving segment; any particle whose relative trajectory
    crosses it within dt is stopped AT the segment — velocity set to the
    barrier point's velocity. Unlike the reference we do NOT re-apply the
    removed momentum as a force: with this pass running last in the
    iteration, re-added momentum compounds into free-fall velocity against
    static barriers and eventually tunnels; absorbing it (like a rigid
    wall does) is stable, and particle-particle pressure against the
    barrier particles still transmits support. Returns the new velocity.

    Dense (pairs x particles) evaluation instead of the reference's
    AABB-query loop; lanes are masked by flags/groups, and the whole pass
    is trace-gated by ParticleConfig.has_barrier."""
    ba, bb = pt.pair_a, pt.pair_b
    is_bar = (((pt.pair_flags & P_BARRIER) != 0)
              & pt.alive[ba] & pt.alive[bb])                 # (Pb,)
    np_ = pos.shape[0]
    pa, pb = pos[ba], pos[bb]                                # (Pb, 2)
    va, vb = vel[ba], vel[bb]

    def cr(a, b):
        return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]

    # per (pair, particle) relative kinematics: segment point at (s, t) is
    # qa + s*e(t) + t*wa with e(t) = e0 + t*de, all relative to the particle
    qa = pa[:, None, :] - pos[None, :, :]                    # (Pb, Np, 2)
    wa = va[:, None, :] - vel[None, :, :]
    e0 = (pb - pa)[:, None, :]
    de = (vb - va)[:, None, :]
    c0 = cr(qa, e0)
    c1 = cr(qa, de) + cr(wa, e0)
    c2 = cr(wa, de)
    eps = 1e-9
    # candidate crossing times: linear root + both quadratic roots
    t_lin = _safe_div(-c0, c1)
    disc = c1 * c1 - 4.0 * c0 * c2
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_q1 = _safe_div(-c1 - sq, 2.0 * c2)
    t_q2 = _safe_div(-c1 + sq, 2.0 * c2)
    lin = jnp.abs(c2) < eps
    ok_lin = lin & (jnp.abs(c1) > eps)
    ok_q = ~lin & (disc >= 0.0)
    cand_t = jnp.stack([t_lin, t_q1, t_q2], axis=-1)         # (Pb, Np, 3)
    cand_ok = jnp.stack([ok_lin, ok_q, ok_q], axis=-1)

    et = e0[:, :, None, :] + cand_t[..., None] * de[:, :, None, :]
    pr = qa[:, :, None, :] + cand_t[..., None] * wa[:, :, None, :]
    s = _safe_div(-jnp.sum(pr * et, axis=-1),
                  jnp.sum(et * et, axis=-1))                 # (Pb, Np, 3)
    same_group = pt.group[ba][:, None] == pt.group[None, :]
    valid = (cand_ok & (cand_t >= 0.0) & (cand_t <= dt)
             & (s >= 0.0) & (s <= 1.0)
             & is_bar[:, None, None]
             & (~same_group)[:, :, None]
             & pt.alive[None, :, None])
    t_sel = jnp.where(valid, cand_t, jnp.inf)
    # earliest hit over candidates, then over pairs
    t_pair = jnp.min(t_sel, axis=-1)                         # (Pb, Np)
    s_pair = jnp.take_along_axis(
        s, jnp.argmin(t_sel, axis=-1)[..., None], axis=-1)[..., 0]
    k = jnp.argmin(t_pair, axis=0)                           # (Np,)
    hit = jnp.isfinite(jnp.min(t_pair, axis=0))
    lanes = jnp.arange(np_)
    s_hit = s_pair[k, lanes]
    # barrier point velocity at the hit
    v_s = va[k] + s_hit[:, None] * (vb[k] - va[k])
    dvel = jnp.where(hit[:, None], v_s - vel, 0.0)
    vel = vel + dvel

    # proximity guard: the trajectory test misses slow pressure-driven
    # seepage (crossing time >> dt each substep), so particles pressed
    # within one radius of a barrier segment also lose their approach
    # component toward it (two-sided)
    radius = pt.params.radius
    e2 = jnp.maximum(jnp.sum(e0 * e0, axis=-1), 1e-12)
    s_c = jnp.clip(-jnp.sum(qa * e0, axis=-1) / e2, 0.0, 1.0)  # (Pb, Np)
    cl = qa + s_c[..., None] * e0          # particle -> closest seg point
    d2 = jnp.sum(cl * cl, axis=-1)
    near = (is_bar[:, None] & (~same_group) & pt.alive[None, :]
            & (d2 < radius * radius))
    d2m = jnp.where(near, d2, jnp.inf)
    kn = jnp.argmin(d2m, axis=0)                               # (Np,)
    has_near = jnp.isfinite(jnp.min(d2m, axis=0))
    n_vec = _safe_div_vec(cl[kn, lanes], jnp.sqrt(
        jnp.maximum(d2[kn, lanes], 1e-12)))
    s_n = s_c[kn, lanes]
    v_seg = va[kn] + s_n[:, None] * (vb[kn] - va[kn])
    appr = jnp.sum((vel - v_seg) * n_vec, axis=-1)             # > 0: toward
    cut = jnp.where(has_near & (appr > 0.0), appr, 0.0)
    return vel - cut[:, None] * n_vec


def _rigid_group_stats(pt: Particles, pos, vel, mass):
    """Per-rigid-group mass statistics (ref: ParticleGroup.UpdateStatistics
    :42-120): center/velocity/omega plus inverse mass and inverse inertia
    for the damping solve. Returns (in_rigid (Np,), n_groups, center,
    linvel, omega, inv_mass, inv_inertia) with per-group arrays."""
    g = jnp.maximum(pt.group, 0)
    ng = pt.group_flags.shape[0]
    rigid = ((pt.group_flags & G_RIGID) != 0)
    in_rigid = pt.alive & (pt.group >= 0) & rigid[g]
    w1 = jnp.where(in_rigid, 1.0, 0.0)
    cnt = jnp.zeros(ng, jnp.float32).at[g].add(w1)
    safe = jnp.maximum(cnt, 1.0)
    cx = jnp.zeros(ng, jnp.float32).at[g].add(w1 * pos[:, 0]) / safe
    cy = jnp.zeros(ng, jnp.float32).at[g].add(w1 * pos[:, 1]) / safe
    vx = jnp.zeros(ng, jnp.float32).at[g].add(w1 * vel[:, 0]) / safe
    vy = jnp.zeros(ng, jnp.float32).at[g].add(w1 * vel[:, 1]) / safe
    center = jnp.stack([cx, cy], axis=-1)
    linvel = jnp.stack([vx, vy], axis=-1)
    rel = pos - center[g]
    relv = vel - linvel[g]
    inertia_u = jnp.zeros(ng, jnp.float32).at[g].add(w1 * m.dot(rel, rel))
    angm = jnp.zeros(ng, jnp.float32).at[g].add(w1 * m.cross(rel, relv))
    omega = _safe_div(angm, jnp.maximum(inertia_u, 1e-9))
    g_mass = mass * cnt
    g_inertia = mass * inertia_u
    inv_m = jnp.where(cnt > 0, _safe_div(jnp.float32(1.0), g_mass), 0.0)
    inv_i = jnp.where(inertia_u > 1e-9,
                      _safe_div(jnp.float32(1.0), g_inertia), 0.0)
    return in_rigid, ng, center, linvel, omega, inv_m, inv_i


def _solve_rigid(pt: Particles, pos, vel, mass, dt, inv_dt):
    """ref: SolveRigid — rigid groups get a uniform rigid-motion velocity
    field from their mass statistics."""
    in_rigid, ng, center, linvel, omega, _, _ = _rigid_group_stats(
        pt, pos, vel, mass)
    g = jnp.maximum(pt.group, 0)
    rel = pos - center[g]
    v_rigid = linvel[g] + m.cross_sv(omega[g], rel)
    return jnp.where(in_rigid[:, None], v_rigid, vel)


def _ray_polygon_batched(pos, delta, s_origin, s_rot, verts, normals,
                         counts):
    """(N, Sb) slab raycast against radius-0 polygons — the lane-major
    batched form of queries._ray_polygon_sharp (same math; see
    _point_shape_distance_batched for why). Returns (hit, frac,
    world normal); interior starts are excluded (frac would be 0, which
    the anti-tunnel pass drops anyway)."""
    V = verts.shape[1]
    Sb = verts.shape[0]
    # TRANSPOSED layout: intermediates are (Sb, N) / (Sb*V, N) so the
    # particle axis rides the 128-lane minor dim (see
    # _point_shape_distance_batched — the (N, Sb*V) form tiled its narrow
    # minor dim to 128 lanes, measured 7.8 ms/iteration at 100k, Sb=3)
    c = s_rot[:, 0:1]                              # (Sb, 1)
    s = s_rot[:, 1:2]
    dx0 = pos[:, 0][None, :] - s_origin[:, 0:1]    # (Sb, N)
    dy0 = pos[:, 1][None, :] - s_origin[:, 1:2]
    lpx = c * dx0 + s * dy0                        # local origin
    lpy = -s * dx0 + c * dy0
    ldx = c * delta[:, 0][None, :] + s * delta[:, 1][None, :]
    ldy = -s * delta[:, 0][None, :] + c * delta[:, 1][None, :]

    lane_ok = (_LANES[None, :V] < counts[:, None]).reshape(-1)[:, None]
    bx = verts[:, 0, 0][:, None]                   # (Sb, 1)
    by = verts[:, 0, 1][:, None]
    vx = verts[..., 0].reshape(-1)[:, None]        # (Sb*V, 1)
    vy = verts[..., 1].reshape(-1)[:, None]
    nx = normals[..., 0].reshape(-1)[:, None]
    ny = normals[..., 1].reshape(-1)[:, None]
    # p = local origin - base, per (shape, particle); expanded over verts
    px = jnp.repeat(lpx - bx, V, axis=0)           # (Sb*V, N)
    py = jnp.repeat(lpy - by, V, axis=0)
    ddx = jnp.repeat(ldx, V, axis=0)
    ddy = jnp.repeat(ldy, V, axis=0)
    rvx = vx - jnp.repeat(bx, V, axis=0)
    rvy = vy - jnp.repeat(by, V, axis=0)
    num = nx * (rvx - px) + ny * (rvy - py)
    den = nx * ddx + ny * ddy
    tf = num / jnp.where(den != 0.0, den, 1.0)
    lower_c = jnp.where(lane_ok & (den < 0.0), tf, -jnp.inf)
    upper_c = jnp.where(lane_ok & (den > 0.0), tf, jnp.inf)
    par_miss = jnp.any(
        (lane_ok & (den == 0.0) & (num < 0.0)).reshape(Sb, V, -1), axis=1)
    lc3 = lower_c.reshape(Sb, V, -1)
    mx = jnp.max(lc3, axis=1)                      # (Sb, N)
    lower = jnp.maximum(mx, 0.0)
    upper = jnp.minimum(jnp.min(upper_c.reshape(Sb, V, -1), axis=1), 1.0)
    hit = (~par_miss) & (lower <= upper) & (mx > 0.0) & (mx <= 1.0)
    frac = jnp.where(hit, lower, jnp.inf)
    sel = lc3 == mx[:, None, :]
    sel = sel & (jnp.cumsum(sel, axis=1) == 1)
    lnx = jnp.sum(jnp.where(sel, normals[..., 0][:, :, None], 0.0), axis=1)
    lny = jnp.sum(jnp.where(sel, normals[..., 1][:, :, None], 0.0), axis=1)
    wnx = c * lnx - s * lny
    wny = s * lnx + c * lny
    return hit.T, frac.T, wnx.T, wny.T


def _solve_collision(pt: Particles, pos, vel, state: WorldState, bs_idx,
                     bs_valid, dt, inv_dt, prm, geom_types=None, blk=None):
    """Ray cast each particle's predicted motion against nearby shapes and
    clamp velocity at the surface (ref: SolveCollision :1565-1624).

    blk: optional per-block culled shape tables (NBlk, BLK, npad, origin,
    rot, verts, normals, count, ok) from the iteration's block culling —
    the ray then tests only each block's K shapes instead of all Sb."""
    from . import geometry as g

    b = state.bodies
    sh = state.shapes
    origin = b.origin

    if geom_types is not None and geom_types <= {g.POLYGON}:
        # lane-major batched slab ray for polygon-only scenes (tanks)
        if blk is not None:
            (NBlk, BLK, npad, g_origin, g_rot, g_verts, g_normals,
             g_count, blk_ok) = blk
            n_ = pos.shape[0]
            K = blk_ok.shape[1]
            posp = jnp.concatenate(
                [pos, jnp.full((npad, 2), 1e9, jnp.float32)]
            ).reshape(NBlk, BLK, 2)
            dvp = jnp.concatenate(
                [dt * vel, jnp.zeros((npad, 2), jnp.float32)]
            ).reshape(NBlk, BLK, 2)
            hit_b, frac_b, wnx_b, wny_b = jax.vmap(_ray_polygon_batched)(
                posp, dvp, g_origin, g_rot, g_verts, g_normals, g_count)
            hit = hit_b.reshape(-1, K)[:n_]
            frac = frac_b.reshape(-1, K)[:n_]
            wnx = wnx_b.reshape(-1, K)[:n_]
            wny = wny_b.reshape(-1, K)[:n_]
            okk = jnp.broadcast_to(
                blk_ok[:, None], (NBlk, BLK, K)).reshape(-1, K)[:n_]
            hit = hit & okk & pt.alive[:, None]
        else:
            p_body = sh.body[bs_idx]
            hit, frac, wnx, wny = _ray_polygon_batched(
                pos, dt * vel, origin[p_body], b.rot[p_body],
                sh.verts[bs_idx], sh.normals[bs_idx], sh.count[bs_idx])
            hit = hit & bs_valid[None, :] & pt.alive[:, None]
        frac = jnp.where(hit, frac, jnp.inf)
        fbest = jnp.min(frac, axis=1)                      # (N,)
        any_hit = jnp.isfinite(fbest)
        sel = (frac == fbest[:, None])
        sel = sel & (jnp.cumsum(sel, axis=1) == 1)
        wn = jnp.stack([jnp.sum(jnp.where(sel, wnx, 0.0), axis=1),
                        jnp.sum(jnp.where(sel, wny, 0.0), axis=1)], axis=-1)
        fb = jnp.where(any_hit, fbest, 0.0)
        target = pos + fb[:, None] * (dt * vel) + PARTICLE_LINEAR_SLOP * wn
        v_new = inv_dt * (target - pos)
        return jnp.where(any_hit[:, None], v_new, vel)

    def vs_shape(si, valid):
        sp = origin[sh.body[si]]
        sq = b.rot[sh.body[si]]
        lo = jax.vmap(lambda x: m.inv_transform_point(sp, sq, x))(pos)
        ld = jax.vmap(lambda v: m.inv_rot_vec(sq, v))(dt * vel)
        hit, frac, lpt, lnrm = jax.vmap(
            lambda p1, d: ray_shape_analytic(p1, d, jnp.float32(1.0),
                                             sh.type[si], sh.verts[si],
                                             sh.normals[si], sh.count[si],
                                             sh.radius[si],
                                             geom_types))(lo, ld)
        hit = hit & valid & pt.alive & jnp.isfinite(frac) & (frac > 0.0)
        wpt = jax.vmap(lambda x: m.transform_point(sp, sq, x))(lpt)
        wn = jax.vmap(lambda v: m.rot_vec(sq, v))(lnrm)
        return hit, jnp.where(hit, frac, jnp.inf), wpt, wn

    hits, fracs, pts, nrms = jax.vmap(vs_shape, out_axes=1)(bs_idx, bs_valid)
    best = jnp.argmin(fracs, axis=1)
    rng = jnp.arange(pos.shape[0])
    hit = hits[rng, best]
    frac = fracs[rng, best]
    wpt = pts[rng, best]
    wn = nrms[rng, best]
    target = pos + frac[:, None] * (dt * vel) + PARTICLE_LINEAR_SLOP * wn
    v_new = inv_dt * (target - pos)
    return jnp.where(hit[:, None], v_new, vel)


def calculate_reasonable_particle_iterations(gravity, radius, dt) -> int:
    """ref: api/Particle.cs:9-38 + particle/Particle.cs:87-93 —
    clamp(ceil(sqrt(g / (0.01 * r)) * dt), 1, 8)."""
    import math

    g = float(abs(gravity)) if not hasattr(gravity, "__len__") else float(
        math.hypot(*gravity))
    if radius <= 0 or dt <= 0:
        return 1
    return max(1, min(8, math.ceil(math.sqrt(g / (0.01 * radius)) * dt)))
