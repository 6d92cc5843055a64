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


def narrow_phase(state: WorldState, pairs: PairBuffer,
                 classes_present: frozenset,
                 max_verts: int = 8) -> ContactData:
    """max_verts: scene-wide max polygon vertex count (Capacity.max_verts).
    Vertex/normal tables are sliced to this width BEFORE the per-pair
    gather — TPU gathers cost ~3-9ns/element, and for box-only scenes this
    halves the dominant gather volume — then zero-padded back to the fixed
    8-lane manifold math (pad lanes are masked by `count`)."""
    sh = state.shapes
    b = state.bodies
    S = sh.type.shape[0]
    V = max(2, min(max_verts, sh.verts.shape[1]))
    if V < sh.verts.shape[1]:
        def pad8(x):
            return jnp.pad(
                x, ((0, 0), (0, sh.verts.shape[1] - V)) +
                ((0, 0),) * (x.ndim - 2))
    else:
        def pad8(x):
            return x
    verts_t = sh.verts[:, :V]
    normals_t = sh.normals[:, :V]

    ta0 = sh.type[pairs.shape_a]
    tb0 = sh.type[pairs.shape_b]

    # canonical orientation: chain -> A, circle -> B
    swap = ((tb0 == g.CHAIN_SEGMENT) & (ta0 != g.CHAIN_SEGMENT)) | (
        (ta0 == g.CIRCLE) & (tb0 != g.CIRCLE))
    sa = jnp.where(swap, pairs.shape_b, pairs.shape_a)
    sb = jnp.where(swap, pairs.shape_a, pairs.shape_b)
    ta = sh.type[sa]
    tb = sh.type[sb]

    body_a = sh.body[sa]
    body_b = sh.body[sb]
    origin = b.origin
    pa, qa = origin[body_a], b.rot[body_a]
    pb, qb = origin[body_b], b.rot[body_b]

    va, na = pad8(verts_t[sa]), pad8(normals_t[sa])
    ca, ra = sh.count[sa], sh.radius[sa]
    vb, nb = pad8(verts_t[sb]), pad8(normals_t[sb])
    cb, rb = sh.count[sb], sh.radius[sb]

    P = sa.shape[0]
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
            va[:, 0], va[:, 1], sh.ghost1[sa], sh.ghost2[sa], pa, qa,
            vb[:, 0], rb, pb, qb)
        out = merge((ta == g.CHAIN_SEGMENT) & (tb == g.CIRCLE), man)
    if CLS_CAPSULES in classes_present:
        man = jax.vmap(mfm.collide_capsules)(
            va[:, 0], va[:, 1], ra, pa, qa, vb[:, 0], vb[:, 1], rb, pb, qb)
        both2 = ((ta == g.CAPSULE) | (ta == g.SEGMENT)) & (
            (tb == g.CAPSULE) | (tb == g.SEGMENT))
        out = merge(both2, man)
    if CLS_POLYS in classes_present:
        man = jax.vmap(mfm.collide_polygons)(
            va, na, ca, ra, pa, qa, vb, nb, cb, rb, pb, qb)
        apoly = (ta == g.POLYGON) | (tb == g.POLYGON)
        not_special = (ta != g.CHAIN_SEGMENT) & (tb != g.CIRCLE)
        out = merge(apoly & not_special, man)
    if CLS_CHAIN_POLY in classes_present:
        man = jax.vmap(mfm.collide_chain_segment_polygon)(
            va[:, 0], va[:, 1], sh.ghost1[sa], sh.ghost2[sa], pa, qa,
            vb, nb, cb, rb, pb, qb)
        out = merge((ta == g.CHAIN_SEGMENT) & (tb != g.CIRCLE), man)

    # kill invalid lanes
    out = out._replace(point_count=jnp.where(pairs.valid, out.point_count, 0))

    # material mixing (ref: include/Types.cs:98-101 default callbacks,
    # src/Contact.cs:330-339)
    friction = jnp.sqrt(sh.friction[sa] * sh.friction[sb])
    restitution = jnp.maximum(sh.restitution[sa], sh.restitution[sb])
    rr = jnp.where(
        (sh.rolling_resistance[sa] > 0) | (sh.rolling_resistance[sb] > 0),
        jnp.maximum(sh.rolling_resistance[sa], sh.rolling_resistance[sb])
        * jnp.maximum(ra, rb),
        0.0)
    tangent_speed = sh.tangent_speed[sa] + sh.tangent_speed[sb]

    # re-base anchors on centers of mass (ref: src/Contact.cs:389-393
    # anchor -= centerOffset, centerOffset = R * localCenter)
    off_a = m.rot_vec(qa, b.local_center[body_a])
    off_b = m.rot_vec(qb, b.local_center[body_b])
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

    # --- probe-insert old lanes (parallel claim rounds) --------------------
    slots = _probe_slots(ka, kb, t)
    slot_of = jnp.full(P, -1, jnp.int32)
    taken = jnp.zeros(t, bool)
    big = jnp.int32(1 << 30)
    for r in range(_PROBES):
        s_r = slots[:, r]
        cand = live & (slot_of < 0) & ~taken[s_r]
        claim = jnp.full(t, big, jnp.int32).at[
            jnp.where(cand, s_r, 0)].min(jnp.where(cand, lane, big))
        won = cand & (claim[s_r] == lane)
        slot_of = jnp.where(won, s_r, slot_of)
        taken = taken.at[jnp.where(won, s_r, 0)].max(won)
    drops = jnp.sum(live & (slot_of < 0)).astype(jnp.int32)
    tbl = jnp.full(t, -1, jnp.int32).at[
        jnp.where(slot_of >= 0, slot_of, t)].set(lane, mode="drop")

    # --- probe-match new lanes --------------------------------------------
    nslots = _probe_slots(new_ka, new_kb, t)          # (P, R)
    cand_lane = tbl[nslots]                            # (P, R) old lanes
    cl = jnp.maximum(cand_lane, 0)
    hit = ((cand_lane >= 0)
           & (ka[cl] == new_ka[:, None]) & (kb[cl] == new_kb[:, None])
           & (new_ka >= 0)[:, None])
    found = jnp.any(hit, axis=1)
    first = jnp.argmax(hit, axis=1)
    old_lane = jnp.where(found, cl[jnp.arange(P), first], 0)

    f = found
    new_cache = ContactStore(
        key_a=new_ka, key_b=new_kb,
        ids=jnp.where(f[:, None], old_cache.ids[old_lane], 0),
        normal_impulse=jnp.where(
            f[:, None], old_cache.normal_impulse[old_lane], 0.0),
        tangent_impulse=jnp.where(
            f[:, None], old_cache.tangent_impulse[old_lane], 0.0),
        rolling_impulse=jnp.where(
            f, old_cache.rolling_impulse[old_lane], 0.0),
        touching=f & old_cache.touching[old_lane],
        color=jnp.where(f, old_cache.color[old_lane], -1),
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
