"""Narrow phase: evaluate manifolds for candidate pairs + warm-start matching.

Replaces the reference's CollideTask parallel-for + ContactRegister virtual
dispatch (ref: src/World.cs:261-453, src/Contact.cs:324-474). Pairs are
canonically oriented (circle always B, chain segment always A), then each
shape-pair *class* kernel is vmapped over the whole pair buffer and lanes
select their class's result. Classes that cannot occur in the scene (no
circle shapes built, say) are gated out at trace time via `classes_present`,
so a pure-polygon scene compiles only the SAT/clip kernel.

Warm-start impulses transfer across steps by (canonical pair key, manifold
feature id) matching, the dense-array equivalent of the reference's
persistent ContactSim + id matching (ref: src/Contact.cs:385-413).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import geometry as g
from . import manifold as mfm
from . import math2d as m
from .broadphase import PairBuffer
from .state import ContactStore, WorldState

# pair-class kernels (trace-time gate keys)
CLS_CIRCLES = "circles"
CLS_CAPSULE_CIRCLE = "capsule_circle"
CLS_POLY_CIRCLE = "poly_circle"
CLS_CAPSULES = "capsules"
CLS_POLYS = "polys"
CLS_CHAIN_CIRCLE = "chain_circle"
CLS_CHAIN_POLY = "chain_poly"


def classes_for_shape_types(types) -> frozenset:
    """Host-side: which pair classes can occur given the shape types present."""
    ts = set(int(x) for x in types)
    has_circle = g.CIRCLE in ts
    has_cap2 = bool(ts & {g.CAPSULE, g.SEGMENT})
    has_poly = g.POLYGON in ts
    has_chain = g.CHAIN_SEGMENT in ts
    out = set()
    if has_circle:
        out.add(CLS_CIRCLES)
        if has_cap2:
            out.add(CLS_CAPSULE_CIRCLE)
        if has_poly:
            out.add(CLS_POLY_CIRCLE)
        if has_chain:
            out.add(CLS_CHAIN_CIRCLE)
    if has_cap2:
        out.add(CLS_CAPSULES)
    if has_poly and (has_cap2 or has_poly):
        out.add(CLS_POLYS)
    if has_chain and (has_cap2 or has_poly):
        out.add(CLS_CHAIN_POLY)
    return frozenset(out)


class ContactData(NamedTuple):
    """Per-candidate-pair narrow phase output (P lanes)."""

    shape_a: jnp.ndarray   # (P,) kernel-oriented shape ids
    shape_b: jnp.ndarray
    body_a: jnp.ndarray    # (P,)
    body_b: jnp.ndarray
    key_a: jnp.ndarray     # (P,) canonical pair key low shape id (-1 invalid)
    key_b: jnp.ndarray     # (P,) canonical pair key high shape id
    manifold: mfm.Manifold  # batched (P, ...)
    friction: jnp.ndarray
    restitution: jnp.ndarray
    rolling_resistance: jnp.ndarray
    tangent_speed: jnp.ndarray
    # warm-start transfer (matched from previous step)
    normal_impulse: jnp.ndarray   # (P, 2)
    tangent_impulse: jnp.ndarray  # (P, 2)
    rolling_impulse: jnp.ndarray  # (P,)
    was_touching: jnp.ndarray     # (P,) bool — previous-step touching
    prev_color: jnp.ndarray       # (P,) i32 inherited graph color (-1 none)
    # packed per-side body rows (see _DYN columns): START-of-step pose,
    # velocity, mass and awake/enabled/type flags for the gathered bodies.
    # TPU gathers cost ~1.3ms per OP at 40k lanes regardless of row width,
    # so downstream phases (prepare, coloring, events, sleep) read these
    # rows instead of re-gathering body fields — each reuse saves an op.
    dyn_a: jnp.ndarray            # (P, 14)
    dyn_b: jnp.ndarray            # (P, 14)
    ev_contact: jnp.ndarray       # (P,) bool both shapes enable contact events
    ev_hit: jnp.ndarray           # (P,) bool either shape enables hit events


# body-row columns inside the packed shape table's dynamic part / dyn_a/b
_DYN = dict(ox=0, oy=1, qc=2, qs=3, offx=4, offy=5, vx=6, vy=7, w=8,
            inv_m=9, inv_i=10, btype=11, awake=12, enabled=13, label=14)
N_DYN = 15


def dyn_col(name: str) -> int:
    return _DYN[name]


def build_static_table(sh, V: int):
    """The static half of the packed shape table (S, 4V+14) — pure function
    of per-shape data, so the builder precomputes it into Shapes.table and
    host mutators that touch shape data rebuild it."""
    S = sh.type.shape[0]
    return jnp.concatenate([
        sh.verts[:, :V].reshape(S, 2 * V),
        sh.normals[:, :V].reshape(S, 2 * V),
        sh.radius[:, None],
        sh.count.astype(jnp.float32)[:, None],
        sh.type.astype(jnp.float32)[:, None],
        sh.ghost1, sh.ghost2,
        sh.friction[:, None], sh.restitution[:, None],
        sh.rolling_resistance[:, None], sh.tangent_speed[:, None],
        sh.enable_contact_events.astype(jnp.float32)[:, None],
        sh.enable_hit_events.astype(jnp.float32)[:, None],
        sh.body.astype(jnp.float32)[:, None],
    ], axis=1)                              # (S, 4V+14)


def build_shape_table(state: WorldState, V: int):
    """Packed per-shape operand table (S, 4V+14+N_DYN):

      [verts(2V) | normals(2V) | radius count type g1(2) g2(2) friction
       restitution rolling tspeed evc evh body | body-dyn row (N_DYN)]

    Static columns come precomputed from Shapes.table (rebuilt only on host
    shape mutation); the body-dyn block costs ONE (S,)-row gather.
    int-valued columns (count/type/body) ride as exact f32. Downstream,
    narrow_phase fetches each pair side with ONE row gather — replacing ~14
    per-field gathers per side."""
    sh = state.shapes
    b = state.bodies
    off = m.rot_vec(b.rot, b.local_center)
    pose = jnp.concatenate([
        b.origin, b.rot, off, b.v, b.w[:, None],
        b.inv_mass[:, None], b.inv_inertia[:, None],
        b.type.astype(jnp.float32)[:, None],
        b.awake.astype(jnp.float32)[:, None],
        b.enabled.astype(jnp.float32)[:, None],
        # start-of-step island label (exact in f32 for any lane count that
        # fits memory) — rides the existing gathers so wake_and_sleep's
        # cross-island check needs no (2P,) label gather of its own
        b.island_label.astype(jnp.float32)[:, None],
    ], axis=1)                              # (Nb, N_DYN)
    dyn = pose[sh.body]                     # (S, N_DYN) — one gather
    static = sh.table
    if static is None or static.shape[1] != 4 * V + 14:
        # caller's V differs from the precomputed width (direct narrow_phase
        # calls with the default 8): assemble in-trace
        static = build_static_table(sh, V)
    return jnp.concatenate([static, dyn], axis=1)


def _static_cols(V: int):
    names = ("radius", "count", "type", "g1x", "g1y", "g2x", "g2y",
             "friction", "restitution", "rolling", "tspeed", "evc", "evh",
             "body")
    return {n: 4 * V + i for i, n in enumerate(names)}


def narrow_phase(state: WorldState, pairs: PairBuffer,
                 classes_present: frozenset,
                 max_verts: int = 8) -> ContactData:
    """max_verts: scene-wide max polygon vertex count (Capacity.max_verts).
    Vertex/normal tables are sliced to this width BEFORE the per-pair
    gather — TPU gathers cost ~3-9ns/element, and for box-only scenes this
    halves the dominant gather volume — and the manifold kernels are
    vertex-width generic, so the SAT/clip math also runs V-wide (box
    scenes: half the vector work of the 8-lane version)."""
    sh = state.shapes
    S = sh.type.shape[0]
    V = max(2, min(max_verts, sh.verts.shape[1]))

    # packed operand rows: 3 gather ops total (1 body->shape, 2 shape->pair)
    tbl = build_shape_table(state, V)
    C = _static_cols(V)
    D0 = 4 * V + 14                      # start of the body-dyn block
    rA0 = tbl[pairs.shape_a]             # (P, D)
    rB0 = tbl[pairs.shape_b]

    ta0 = rA0[:, C["type"]].astype(jnp.int32)
    tb0 = rB0[:, C["type"]].astype(jnp.int32)

    # canonical orientation: chain -> A, circle -> B
    swap = ((tb0 == g.CHAIN_SEGMENT) & (ta0 != g.CHAIN_SEGMENT)) | (
        (ta0 == g.CIRCLE) & (tb0 != g.CIRCLE))
    sa = jnp.where(swap, pairs.shape_b, pairs.shape_a)
    sb = jnp.where(swap, pairs.shape_a, pairs.shape_b)
    sw = swap[:, None]
    rA = jnp.where(sw, rB0, rA0)
    rB = jnp.where(sw, rA0, rB0)
    ta = jnp.where(swap, tb0, ta0)
    tb = jnp.where(swap, ta0, tb0)

    P = sa.shape[0]
    body_a = rA[:, C["body"]].astype(jnp.int32)
    body_b = rB[:, C["body"]].astype(jnp.int32)
    pa, qa = rA[:, D0:D0 + 2], rA[:, D0 + 2:D0 + 4]
    pb, qb = rB[:, D0:D0 + 2], rB[:, D0 + 2:D0 + 4]

    va = rA[:, :2 * V].reshape(P, V, 2)
    na = rA[:, 2 * V:4 * V].reshape(P, V, 2)
    ca, ra = rA[:, C["count"]].astype(jnp.int32), rA[:, C["radius"]]
    vb = rB[:, :2 * V].reshape(P, V, 2)
    nb = rB[:, 2 * V:4 * V].reshape(P, V, 2)
    cb, rb = rB[:, C["count"]].astype(jnp.int32), rB[:, C["radius"]]
    ghost1_a = rA[:, C["g1x"]:C["g1x"] + 2]
    ghost2_a = rA[:, C["g2x"]:C["g2x"] + 2]
    out = mfm.Manifold(
        normal=jnp.zeros((P, 2), jnp.float32),
        point_count=jnp.zeros(P, jnp.int32),
        anchor_a=jnp.zeros((P, 2, 2), jnp.float32),
        anchor_b=jnp.zeros((P, 2, 2), jnp.float32),
        point=jnp.zeros((P, 2, 2), jnp.float32),
        separation=jnp.zeros((P, 2), jnp.float32),
        ids=jnp.zeros((P, 2), jnp.int32),
    )

    def merge(mask, new):
        return mfm.Manifold(*[
            jnp.where(jnp.reshape(mask, (P,) + (1,) * (o.ndim - 1)), n, o)
            for o, n in zip(out, new)])

    if CLS_CIRCLES in classes_present:
        man = jax.vmap(mfm.collide_circles)(
            va[:, 0], ra, pa, qa, vb[:, 0], rb, pb, qb)
        out = merge((ta == g.CIRCLE) & (tb == g.CIRCLE), man)
    if CLS_CAPSULE_CIRCLE in classes_present:
        man = jax.vmap(mfm.collide_capsule_circle)(
            va[:, 0], va[:, 1], ra, pa, qa, vb[:, 0], rb, pb, qb)
        out = merge(((ta == g.CAPSULE) | (ta == g.SEGMENT)) & (tb == g.CIRCLE), man)
    if CLS_POLY_CIRCLE in classes_present:
        man = jax.vmap(mfm.collide_polygon_circle)(
            va, na, ca, ra, pa, qa, vb[:, 0], rb, pb, qb)
        out = merge((ta == g.POLYGON) & (tb == g.CIRCLE), man)
    if CLS_CHAIN_CIRCLE in classes_present:
        man = jax.vmap(mfm.collide_chain_segment_circle)(
            va[:, 0], va[:, 1], ghost1_a, ghost2_a, pa, qa,
            vb[:, 0], rb, pb, qb)
        out = merge((ta == g.CHAIN_SEGMENT) & (tb == g.CIRCLE), man)
    if CLS_CAPSULES in classes_present:
        man = jax.vmap(mfm.collide_capsules)(
            va[:, 0], va[:, 1], ra, pa, qa, vb[:, 0], vb[:, 1], rb, pb, qb)
        both2 = ((ta == g.CAPSULE) | (ta == g.SEGMENT)) & (
            (tb == g.CAPSULE) | (tb == g.SEGMENT))
        out = merge(both2, man)
    if CLS_POLYS in classes_present:
        # lane-major batched form: the vmapped scalar kernel's (V, 2)
        # locals tile the 2-wide minor dim to 128 lanes (64x VPU waste,
        # ~2 ms/step at 39k pairs)
        man = mfm.collide_polygons_batched(
            va, na, ca, ra, pa, qa, vb, nb, cb, rb, pb, qb)
        apoly = (ta == g.POLYGON) | (tb == g.POLYGON)
        not_special = (ta != g.CHAIN_SEGMENT) & (tb != g.CIRCLE)
        out = merge(apoly & not_special, man)
    if CLS_CHAIN_POLY in classes_present:
        man = jax.vmap(mfm.collide_chain_segment_polygon)(
            va[:, 0], va[:, 1], ghost1_a, ghost2_a, pa, qa,
            vb, nb, cb, rb, pb, qb)
        out = merge((ta == g.CHAIN_SEGMENT) & (tb != g.CIRCLE), man)

    # kill invalid lanes
    out = out._replace(point_count=jnp.where(pairs.valid, out.point_count, 0))

    # material mixing (ref: include/Types.cs:98-101 default callbacks,
    # src/Contact.cs:330-339)
    fr_a, fr_b = rA[:, C["friction"]], rB[:, C["friction"]]
    re_a, re_b = rA[:, C["restitution"]], rB[:, C["restitution"]]
    ro_a, ro_b = rA[:, C["rolling"]], rB[:, C["rolling"]]
    friction = jnp.sqrt(fr_a * fr_b)
    restitution = jnp.maximum(re_a, re_b)
    rr = jnp.where((ro_a > 0) | (ro_b > 0),
                   jnp.maximum(ro_a, ro_b) * jnp.maximum(ra, rb), 0.0)
    tangent_speed = rA[:, C["tspeed"]] + rB[:, C["tspeed"]]

    # re-base anchors on centers of mass (ref: src/Contact.cs:389-393
    # anchor -= centerOffset, centerOffset = R * localCenter)
    off_a = rA[:, D0 + 4:D0 + 6]
    off_b = rB[:, D0 + 4:D0 + 6]
    out = out._replace(
        anchor_a=out.anchor_a - off_a[:, None, :],
        anchor_b=out.anchor_b - off_b[:, None, :],
    )

    # canonical pair key as TWO shape-id columns — exact for any S (the
    # old single int32 a*S+b key silently overflowed past ~46k shapes)
    key_a = jnp.where(pairs.valid, jnp.minimum(sa, sb), -1)
    key_b = jnp.where(pairs.valid, jnp.maximum(sa, sb), -1)

    ni, ti, ri, was_touching, prev_color = _match_warm_start(
        state.contacts, key_a, key_b, out.ids)

    return ContactData(
        shape_a=sa, shape_b=sb, body_a=body_a, body_b=body_b,
        key_a=key_a, key_b=key_b,
        manifold=out, friction=friction, restitution=restitution,
        rolling_resistance=rr, tangent_speed=tangent_speed,
        normal_impulse=ni, tangent_impulse=ti, rolling_impulse=ri,
        was_touching=was_touching, prev_color=prev_color,
        dyn_a=rA[:, D0:], dyn_b=rB[:, D0:],
        ev_contact=(rA[:, C["evc"]] > 0) & (rB[:, C["evc"]] > 0),
        ev_hit=(rA[:, C["evh"]] > 0) | (rB[:, C["evh"]] > 0),
    )


_PROBES = 8


def table_size(capacity_pairs: int) -> int:
    """Hash-table slots for the persistent contact store: next power of two
    >= 2x the pair capacity (load factor <= 0.5 at a full pair buffer)."""
    t = 1024
    while t < 2 * capacity_pairs:
        t *= 2
    return t


def _probe_slots(key_a, key_b, t: int):
    """(P, _PROBES) probe slots per (lo, hi) pair key: mixed multiplicative
    hash + linear probing. The open-addressed store replaces the reference's
    persistent pairSet/Contact objects (ref: src/BroadPhase.cs:50,
    src/Contact.cs:134-227) with O(1) elementwise ops — a sort-based match
    here cost ~100 sequential bitonic passes per step on TPU."""
    # murmur3-style avalanche: structured shape-id pairs (consecutive ids
    # along pyramid rows) collide catastrophically under a plain
    # multiply-xor-top-bits mix (measured 25-deep buckets and ~25% insert
    # failures on pyramid-30, which kept re-waking the slept island through
    # phantom "new touch" events)
    x = (key_a.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
         + key_b.astype(jnp.uint32))
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> jnp.uint32(16))
    h = (x & jnp.uint32(t - 1)).astype(jnp.int32)
    return (h[:, None] + jnp.arange(_PROBES, dtype=jnp.int32)[None, :]) \
        & (t - 1)


def _match_warm_start(cache: ContactStore, new_ka, new_kb, new_ids):
    """Transfer impulses from the previous step by (key, point id) matching
    (ref: src/Contact.cs:385-413).

    `cache` is the PER-PAIR-LANE contact cache: row i holds last step's
    contact data for pair-buffer lane i. While the persistent pair buffer is
    unchanged (the common case — see find_pairs_incremental) lane i refers to
    the same shape pair across steps, so the match is a pure lane-wise key
    check with ZERO gathers; on a pair rebuild the cache was just re-aligned
    to the new lanes by remap_cache's transient hash, so the same lane-wise
    check still holds."""
    found = ((cache.key_a == new_ka) & (cache.key_b == new_kb)
             & (new_ka >= 0))

    old_ids = cache.ids                 # (P, 2)
    old_ni = cache.normal_impulse       # (P, 2)
    old_ti = cache.tangent_impulse

    def match_point(j):
        same0 = found & (new_ids[:, j] == old_ids[:, 0])
        same1 = found & (new_ids[:, j] == old_ids[:, 1])
        ni = jnp.where(same0, old_ni[:, 0], jnp.where(same1, old_ni[:, 1], 0.0))
        ti = jnp.where(same0, old_ti[:, 0], jnp.where(same1, old_ti[:, 1], 0.0))
        return ni, ti

    ni0, ti0 = match_point(0)
    ni1, ti1 = match_point(1)
    rolling = jnp.where(found, cache.rolling_impulse, 0.0)
    was_touching = found & cache.touching
    prev_color = jnp.where(found, cache.color, -1)
    return (jnp.stack([ni0, ni1], axis=1), jnp.stack([ti0, ti1], axis=1),
            rolling, was_touching, prev_color)


def empty_cache(P: int) -> ContactStore:
    return ContactStore(
        key_a=jnp.full(P, -1, jnp.int32),
        key_b=jnp.full(P, -1, jnp.int32),
        ids=jnp.zeros((P, 2), jnp.int32),
        normal_impulse=jnp.zeros((P, 2), jnp.float32),
        tangent_impulse=jnp.zeros((P, 2), jnp.float32),
        rolling_impulse=jnp.zeros(P, jnp.float32),
        touching=jnp.zeros(P, bool),
        color=jnp.full(P, -1, jnp.int32),
    )


def remap_cache(old_cache: ContactStore, new_ka, new_kb,
                capacity_pairs: int):
    """Re-align the per-lane contact cache to a REBUILT pair buffer.

    Runs only inside the rebuild branch of find_pairs_incremental (steady
    state never pays for it): old lanes are hashed into a TRANSIENT
    open-addressed table (murmur avalanche + linear probing — structured
    shape-id pairs collide catastrophically under weaker mixes, see
    _probe_slots), new lanes probe it, and matched rows transfer warm-start
    impulses, feature ids, touching flags, and graph-color reservations
    (ref: src/Contact.cs:385-413 + src/BroadPhase.cs:50 pairSet).

    Returns (new_cache, orphan_mask, drops):
    - orphan_mask (P,): OLD lanes that were touching but were claimed by no
      new lane — their contact vanished with the rebuild (teleports,
      explosions) and needs a contact_end event;
    - drops: old lanes that lost every probe round (hash congestion) and so
      lost their warm data — surfaced in Profile.store_drops.
    """
    t = table_size(capacity_pairs)
    ka, kb = old_cache.key_a, old_cache.key_b
    P = ka.shape[0]
    lane = jnp.arange(P, dtype=jnp.int32)
    live = ka >= 0
    big = jnp.int32(1 << 30)

    # --- probe-insert old lanes (parallel claim rounds) --------------------
    # ONE persistent claim table: each round, pending lanes claim their
    # round-r slot iff it was empty BEFORE the round (earlier winners are
    # never unseated); intra-round races resolve by scatter-min on lane id.
    # 3 per-row ops/round vs the old 4 (separate claims + taken bitmap),
    # and no final table-build scatter.
    slots = _probe_slots(ka, kb, t)
    tbl_lane = jnp.full(t + 1, big, jnp.int32)
    slot_of = jnp.full(P, -1, jnp.int32)
    for r in range(_PROBES):
        s_r = slots[:, r]
        pend = live & (slot_of < 0)
        cand = pend & (tbl_lane[s_r] == big)
        tbl_lane = tbl_lane.at[jnp.where(cand, s_r, t)].min(
            jnp.where(cand, lane, big))
        won = cand & (tbl_lane[s_r] == lane)
        slot_of = jnp.where(won, s_r, slot_of)
    drops = jnp.sum(live & (slot_of < 0)).astype(jnp.int32)

    # --- probe-match new lanes --------------------------------------------
    # slot rows pack (lane, key_a, key_b): each match round costs ONE
    # (P,)-row gather. The old (P, R) table + key gathers cost per ELEMENT
    # (~3x P*R rows, measured 19.8 ms of the 22.7 ms rebuild at 39k pairs).
    rows = jnp.stack([lane, ka, kb], axis=1)
    tbl = jnp.full((t + 1, 3), -1, jnp.int32).at[
        jnp.where(slot_of >= 0, slot_of, t)].set(rows, mode="drop")

    nslots = _probe_slots(new_ka, new_kb, t)          # (P, R)
    live_new = new_ka >= 0
    old_lane_s = jnp.full(P, -1, jnp.int32)
    for r in range(_PROBES):
        row = tbl[nslots[:, r]]                        # (P, 3) row gather
        ok = (live_new & (old_lane_s < 0)
              & (row[:, 1] == new_ka) & (row[:, 2] == new_kb))
        old_lane_s = jnp.where(ok, row[:, 0], old_lane_s)
    found = old_lane_s >= 0
    old_lane = jnp.maximum(old_lane_s, 0)

    # transfer warm data with ONE packed row gather (ints ride bitcast;
    # six separate field gathers cost ~6x the per-row price)
    f = found
    as_f = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
    as_i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
    packed = jnp.concatenate([
        as_f(old_cache.ids),
        old_cache.normal_impulse,
        old_cache.tangent_impulse,
        old_cache.rolling_impulse[:, None],
        old_cache.touching[:, None].astype(jnp.float32),
        as_f(old_cache.color[:, None]),
    ], axis=1)                                        # (P, 9)
    gr = packed[old_lane]
    new_cache = ContactStore(
        key_a=new_ka, key_b=new_kb,
        ids=jnp.where(f[:, None], as_i(gr[:, 0:2]), 0),
        normal_impulse=jnp.where(f[:, None], gr[:, 2:4], 0.0),
        tangent_impulse=jnp.where(f[:, None], gr[:, 4:6], 0.0),
        rolling_impulse=jnp.where(f, gr[:, 6], 0.0),
        touching=f & (gr[:, 7] > 0),
        color=jnp.where(f, as_i(gr[:, 8]), -1),
    )

    claimed = jnp.zeros(P + 1, bool).at[
        jnp.where(found, old_lane, P)].max(found)
    orphan = live & old_cache.touching & ~claimed[:P]
    return new_cache, orphan, drops


def update_cache(data: ContactData, color=None) -> ContactStore:
    """Write this step's pair-order contact results back into the per-lane
    cache — pure lane-aligned writes, ZERO scatters (the old hash-table
    rebuild cost two full-table scatters plus eight probe-claim rounds every
    step; that work now happens only on pair rebuilds, in remap_cache).

    color: (P,) raw graph colors to persist; touching pairs keep theirs
    (live ones get this step's assignment, sleeping ones keep the inherited
    reservation), separated pairs release (-1)."""
    touching = (data.manifold.point_count > 0) & (data.key_a >= 0)
    if color is None:
        color = jnp.full_like(data.key_a, -1)
    return ContactStore(
        key_a=data.key_a, key_b=data.key_b,
        ids=data.manifold.ids,
        normal_impulse=data.normal_impulse,
        tangent_impulse=data.tangent_impulse,
        rolling_impulse=data.rolling_impulse,
        touching=touching,
        color=jnp.where(touching, color, -1),
    )
