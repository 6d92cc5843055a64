"""Scene queries: ray casts, overlaps, shape casts, explosions, mover.

Counterpart of ref: api/World.cs:339-772 (OverlapAABB/OverlapShape/CastRay/
CastRayClosest/CastShape/CastMover/CollideMover/Explode) and the per-geometry
cast routines (ref: include/Collision.cs RayCast per shape). The reference
walks three BVH trees with callbacks; here every query is one vectorized
sweep over the shape arrays with a masked min-reduction — batched and
jit-friendly, and vmappable over many rays at once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import geometry as g
from . import math2d as m
from .constants import FLT_EPSILON, MAX_POLYGON_VERTICES
from .distance import shape_cast_pair, shape_distance
from .state import DYNAMIC, WorldState

_LANES = jnp.arange(MAX_POLYGON_VERTICES)


class RayResult(NamedTuple):
    hit: jnp.ndarray
    shape: jnp.ndarray     # i32 shape id (-1 when no hit)
    point: jnp.ndarray     # (2,) world
    normal: jnp.ndarray    # (2,) world
    fraction: jnp.ndarray


# ---------------------------------------------------------------------------
# local-space ray casts (scalar; vmapped over shapes)
# ---------------------------------------------------------------------------

def _ray_circle(p1, d, max_frac, center, radius):
    """ref: include/Collision.cs:93-130 Circle.RayCast."""
    s = p1 - center
    rr = radius * radius
    u, length = m.get_length_and_normalize(d)
    t = -m.dot(s, u)
    c = m.mul_add(s, t, u)
    cc = m.dot(c, c)
    h = jnp.sqrt(jnp.maximum(rr - cc, 0.0))
    fraction = t - h
    inside = m.dot(s, s) < rr
    valid = (length > 0) & (cc <= rr) & (fraction >= 0) & (
        max_frac * length >= fraction)
    hit_point = m.mul_add(s, fraction, u) + center
    normal = m.normalize(hit_point - center)
    frac = jnp.where(valid, fraction / jnp.where(length > 0, length, 1.0),
                     jnp.where(inside, 0.0, jnp.inf))
    hit = valid | inside
    point = jnp.where(valid, m.mul_add(center, radius, normal), p1)
    normal = jnp.where(valid, normal, jnp.zeros(2))
    return hit, frac, point, normal


def _ray_segment(p1, d, max_frac, v1, v2, one_sided):
    """ref: include/Collision.cs:656-686 Segment.RayCast."""
    e = v2 - v1
    e_unit, length = m.get_length_and_normalize(e)
    normal = m.right_perp(e_unit)
    numerator = m.dot(normal, v1 - p1)
    denominator = m.dot(normal, d)
    t = numerator / jnp.where(denominator != 0.0, denominator, 1.0)
    p = m.mul_add(p1, t, d)
    s = m.dot(p - v1, e_unit)
    side_ok = jnp.where(one_sided, m.cross(p1 - v1, e) >= 0.0, True)
    hit = (side_ok & (length > 0) & (denominator != 0.0)
           & (t >= 0) & (t <= max_frac) & (s >= 0) & (s <= length))
    out_normal = jnp.where(numerator > 0.0, -normal, normal)
    return hit, jnp.where(hit, t, jnp.inf), p, out_normal


def _ray_polygon_sharp(p1, d, max_frac, verts, normals, count):
    """Slab clipping for radius-0 polygons (ref: Collision.cs:497-545)."""
    base = verts[0]
    p = p1 - base
    lane_ok = _LANES < count
    num = jnp.einsum("ik,ik->i", normals, (verts - base[None]) - p[None])
    den = normals @ d

    # entering faces raise `lower`; exiting faces cap `upper`
    tf = num / jnp.where(den != 0.0, den, 1.0)
    lower_cand = jnp.where(lane_ok & (den < 0.0), tf, -jnp.inf)
    upper_cand = jnp.where(lane_ok & (den > 0.0), tf, jnp.inf)
    # parallel & outside any face => miss
    par_miss = jnp.any(lane_ok & (den == 0.0) & (num < 0.0))
    mx = jnp.max(lower_cand)
    lower = jnp.maximum(mx, 0.0)
    upper = jnp.minimum(jnp.min(upper_cand), max_frac)
    entered = mx > 0.0
    ok = ~par_miss & (lower <= upper)
    inside = ok & ~entered
    hit = ok & entered & (mx <= max_frac)
    frac = jnp.where(hit, lower, jnp.where(inside, 0.0, jnp.inf))
    point = jnp.where(hit, m.mul_add(p1, lower, d), p1)
    # first-max one-hot select instead of argmax + gather: this function is
    # vmapped over 100k+ particles in the anti-tunnel pass, where one lane
    # gather per call costs ~15 ns on TPU (dominating the pass)
    sel = lower_cand == mx
    sel = sel & (jnp.cumsum(sel) == 1)
    best_n = jnp.sum(jnp.where(sel[:, None], normals, 0.0), axis=0)
    normal = jnp.where(hit, best_n, jnp.zeros(2))
    return hit | inside, frac, point, normal


def _ray_capsule(p1, d, max_frac, v1, v2, radius):
    """Analytic capsule ray cast (ref: include/Collision.cs:230-290
    Capsule.RayCast): slab vs the infinite rounded band, endpoint circles."""
    a, cap_len = m.get_length_and_normalize(v2 - v1)
    q = p1 - v1
    qa = m.dot(q, a)
    qp = m.mul_add(q, -qa, a)
    inside_band = m.dot(qp, qp) < radius * radius

    # endpoint circle casts
    hit1, f1, pt1, n1 = _ray_circle(p1, d, max_frac, v1, radius)
    hit2, f2, pt2, n2 = _ray_circle(p1, d, max_frac, v2, radius)
    circle_best = f1 <= f2
    hit_c = jnp.where(circle_best, hit1, hit2)
    f_c = jnp.where(circle_best, f1, f2)
    pt_c = jnp.where(circle_best, pt1, pt2)
    n_c = jnp.where(circle_best, n1, n2)

    # side wall intersection
    n = jnp.stack([a[1], -a[0]], axis=-1)
    u, ray_len = m.get_length_and_normalize(d)
    den = -a[0] * u[1] + u[0] * a[1]
    safe_den = jnp.where(jnp.abs(den) > FLT_EPSILON, den, 1.0)
    b1 = m.mul_sub(q, radius, n)
    b2 = m.mul_add(q, radius, n)
    inv_den = 1.0 / safe_den
    s21 = (a[0] * b1[1] - b1[0] * a[1]) * inv_den
    s22 = (a[0] * b2[1] - b2[0] * a[1]) * inv_den
    first_is_1 = s21 < s22
    s2 = jnp.where(first_is_1, s21, s22)
    bsel = jnp.where(first_is_1, b1, b2)
    n_side = jnp.where(first_is_1, n, -n)
    s1 = (-bsel[0] * u[1] + u[0] * bsel[1]) * inv_den
    side_valid = ((jnp.abs(den) > FLT_EPSILON) & (s2 >= 0)
                  & (s2 <= max_frac * ray_len) & (s1 >= 0) & (s1 <= cap_len)
                  & (cap_len > 0) & ~inside_band)
    f_side = s2 / jnp.where(ray_len > 0, ray_len, 1.0)
    pt_side = m.lerp(v1, v2, s1 / jnp.where(cap_len > 0, cap_len, 1.0)) \
        + radius * n_side

    # endpoints are fallbacks when the side param is out of range
    use_side = side_valid
    hit = jnp.where(use_side, True, hit_c & ~inside_band)
    frac = jnp.where(use_side, f_side, f_c)
    pt = jnp.where(use_side, pt_side, pt_c)
    nrm = jnp.where(use_side, n_side, n_c)
    # starting inside: report hit at origin, fraction 0 (excluded by callers
    # that require frac > 0)
    hit = hit | inside_band
    frac = jnp.where(inside_band, 0.0, jnp.where(hit, frac, jnp.inf))
    return hit, frac, pt, nrm


def ray_shape_analytic(p1, d, max_frac, stype, verts, normals, count, radius,
                       types_present: frozenset | None = None):
    """Closed-form-only dispatch (no GJK): rounded polygons are treated as
    their sharp core. Used by the particle anti-tunneling pass where a GJK
    cast per (particle, shape) would dominate the whole step.

    types_present: optional TRACE-TIME set of geometry types in the scene —
    absent families drop out of the program entirely (the pass evaluates
    every variant per (particle, shape) lane otherwise; for the usual
    polygon-tank particle scenes this is a 4x cut)."""
    tp = types_present
    has = lambda *ts: tp is None or any(t in tp for t in ts)
    miss = (jnp.bool_(False), jnp.float32(jnp.inf), p1, jnp.zeros(2))
    hit_c, f_c, pt_c, n_c = (
        _ray_circle(p1, d, max_frac, verts[0], radius)
        if has(g.CIRCLE) else miss)
    hit_k, f_k, pt_k, n_k = (
        _ray_capsule(p1, d, max_frac, verts[0], verts[1], radius)
        if has(g.CAPSULE) else miss)
    hit_s, f_s, pt_s, n_s = (
        _ray_segment(p1, d, max_frac, verts[0], verts[1],
                     stype == g.CHAIN_SEGMENT)
        if has(g.SEGMENT, g.CHAIN_SEGMENT, g.CAPSULE) else miss)
    hit_p, f_p, pt_p, n_p = (
        _ray_polygon_sharp(p1, d, max_frac, verts, normals, count)
        if has(g.POLYGON) else miss)
    is_circle = stype == g.CIRCLE
    is_cap = (stype == g.CAPSULE) & (radius > 0.0)
    is_seg = (stype == g.SEGMENT) | (stype == g.CHAIN_SEGMENT) | (
        (stype == g.CAPSULE) & (radius == 0.0))

    def pick(c, k, s, p):
        return jnp.where(is_circle, c,
                         jnp.where(is_cap, k, jnp.where(is_seg, s, p)))

    return (pick(hit_c, hit_k, hit_s, hit_p), pick(f_c, f_k, f_s, f_p),
            pick(pt_c, pt_k, pt_s, pt_p), pick(n_c, n_k, n_s, n_p))


def _ray_rounded(p1, d, max_frac, verts, count, radius):
    """Rounded shapes via conservative-advancement cast of the ray point
    (ref: Collision.cs:546-558, Capsule/Polygon with radius)."""
    pt_proxy = jnp.tile(p1[None, :], (MAX_POLYGON_VERTICES, 1))
    out = shape_cast_pair(
        verts, count, radius, pt_proxy, 1, 0.0,
        jnp.zeros(2), m.rot_identity(), jnp.zeros(2), m.rot_identity(),
        d, max_frac)
    return out.hit, jnp.where(out.hit, out.fraction, jnp.inf), out.point, -out.normal


def _ray_shape_local(p1, d, max_frac, stype, verts, normals, count, radius):
    """Dispatch over the unified representation (single shape)."""
    hit_c, f_c, pt_c, n_c = _ray_circle(p1, d, max_frac, verts[0], radius)
    hit_s, f_s, pt_s, n_s = _ray_segment(
        p1, d, max_frac, verts[0], verts[1], stype == g.CHAIN_SEGMENT)
    hit_p, f_p, pt_p, n_p = _ray_polygon_sharp(p1, d, max_frac, verts,
                                               normals, count)
    hit_r, f_r, pt_r, n_r = _ray_rounded(p1, d, max_frac, verts, count, radius)

    is_circle = stype == g.CIRCLE
    is_seg = (stype == g.SEGMENT) | (stype == g.CHAIN_SEGMENT) | (
        (stype == g.CAPSULE) & (radius == 0.0))
    is_sharp_poly = (stype == g.POLYGON) & (radius == 0.0)
    # rounded: capsule with radius, rounded polygon

    def pick(c, s, p, r):
        return jnp.where(is_circle, c,
                         jnp.where(is_seg, s, jnp.where(is_sharp_poly, p, r)))

    return (pick(hit_c, hit_s, hit_p, hit_r), pick(f_c, f_s, f_p, f_r),
            pick(pt_c, pt_s, pt_p, pt_r), pick(n_c, n_s, n_p, n_r))


def _query_filter_mask(state: WorldState, category_bits, mask_bits):
    sh = state.shapes
    cat = jnp.uint32(category_bits)
    msk = jnp.uint32(mask_bits)
    return ((sh.filter_category & msk) != 0) & ((sh.filter_mask & cat) != 0)


def cast_ray_closest(state: WorldState, origin, translation,
                     category_bits=0x1, mask_bits=0xFFFFFFFF) -> RayResult:
    """Closest-hit ray cast against all shapes
    (ref: api/World.cs:466-503 CastRayClosest)."""
    sh = state.shapes
    b = state.bodies
    origin = jnp.asarray(origin, jnp.float32)
    translation = jnp.asarray(translation, jnp.float32)
    p = b.origin[sh.body]
    q = b.rot[sh.body]
    lo = m.inv_rot_vec(q, origin[None, :] - p)
    ld = m.inv_rot_vec(q, translation[None, :])

    hit, frac, pt, nrm = jax.vmap(
        lambda p1, d, st, v, n, c, r: _ray_shape_local(
            p1, d, jnp.float32(1.0), st, v, n, c, r)
    )(lo, ld, sh.type, sh.verts, sh.normals, sh.count, sh.radius)

    valid = (hit & sh.enabled & b.enabled[sh.body] & ~sh.is_sensor
             & _query_filter_mask(state, category_bits, mask_bits))
    frac = jnp.where(valid, frac, jnp.inf)
    best = jnp.argmin(frac).astype(jnp.int32)
    found = jnp.isfinite(frac[best])
    w_pt = m.transform_point(p[best], q[best], pt[best])
    w_n = m.rot_vec(q[best], nrm[best])
    return RayResult(
        hit=found,
        shape=jnp.where(found, best, -1),
        point=jnp.where(found, w_pt, origin),
        normal=jnp.where(found, w_n, jnp.zeros(2)),
        fraction=jnp.where(found, frac[best], 1.0),
    )


class RayHits(NamedTuple):
    """Fixed-capacity all-hits ray cast result (ref: api/World.cs:442-465
    CastRay visits every shape along the ray via callback; here the hits
    come back as arrays sorted by fraction)."""

    count: jnp.ndarray     # i32 number of valid rows (<= capacity)
    shape: jnp.ndarray     # (K,) i32 shape ids, fraction-ascending
    point: jnp.ndarray     # (K, 2) world hit points
    normal: jnp.ndarray    # (K, 2) world normals
    fraction: jnp.ndarray  # (K,)


def cast_ray_all(state: WorldState, origin, translation, max_hits: int = 16,
                 category_bits=0x1, mask_bits=0xFFFFFFFF) -> RayHits:
    """All-hits ray cast, fraction-sorted (ref: api/World.cs:442-465)."""
    sh = state.shapes
    b = state.bodies
    origin = jnp.asarray(origin, jnp.float32)
    translation = jnp.asarray(translation, jnp.float32)
    p = b.origin[sh.body]
    q = b.rot[sh.body]
    lo = m.inv_rot_vec(q, origin[None, :] - p)
    ld = m.inv_rot_vec(q, translation[None, :])

    hit, frac, pt, nrm = jax.vmap(
        lambda p1, d, st, v, n, c, r: _ray_shape_local(
            p1, d, jnp.float32(1.0), st, v, n, c, r)
    )(lo, ld, sh.type, sh.verts, sh.normals, sh.count, sh.radius)

    valid = (hit & sh.enabled & b.enabled[sh.body] & ~sh.is_sensor
             & _query_filter_mask(state, category_bits, mask_bits))
    frac = jnp.where(valid, frac, jnp.inf)
    order = jnp.argsort(frac)[:max_hits].astype(jnp.int32)
    ofrac = frac[order]
    found = jnp.isfinite(ofrac)
    w_pt = m.transform_point(p[order], q[order], pt[order])
    w_n = m.rot_vec(q[order], nrm[order])
    return RayHits(
        count=jnp.sum(valid).astype(jnp.int32).clip(0, max_hits),
        shape=jnp.where(found, order, -1),
        point=jnp.where(found[:, None], w_pt, 0.0),
        normal=jnp.where(found[:, None], w_n, 0.0),
        fraction=jnp.where(found, ofrac, 1.0),
    )


def overlap_point(state: WorldState, point,
                  category_bits=0x1, mask_bits=0xFFFFFFFF) -> jnp.ndarray:
    """Mask of shapes containing a world point — the world-level TestPoint
    (ref: per-geometry PointInCircle/Capsule/Polygon, include/Geometry.cs).
    The unified rounded-polygon representation makes this one primitive:
    a point is inside iff its distance to the polygon core is <= radius."""
    sh = state.shapes
    b = state.bodies
    point = jnp.asarray(point, jnp.float32)
    p = b.origin[sh.body]
    q = b.rot[sh.body]
    pt_proxy = jnp.tile(point[None, :], (MAX_POLYGON_VERTICES, 1))
    ident = jnp.asarray([1.0, 0.0], jnp.float32)

    def one(sv, sc, sr, sp, sq):
        out = shape_distance(sv, sc, sr, pt_proxy, 1, 0.0,
                             sp, sq, jnp.zeros(2), ident, use_radii=True)
        return out.distance <= 0.0

    inside = jax.vmap(one)(sh.verts, sh.count, sh.radius, p, q)
    return (inside & sh.enabled & b.enabled[sh.body]
            & _query_filter_mask(state, category_bits, mask_bits))


def overlap_aabb(state: WorldState, aabb,
                 category_bits=0x1, mask_bits=0xFFFFFFFF) -> jnp.ndarray:
    """Boolean mask of shapes whose AABB overlaps (ref: api/World.cs:339-358)."""
    from .broadphase import compute_shape_aabbs

    boxes = compute_shape_aabbs(state)
    aabb = jnp.asarray(aabb, jnp.float32)
    sh = state.shapes
    return (m.aabb_overlaps(boxes, aabb[None, :]) & sh.enabled
            & state.bodies.enabled[sh.body]
            & _query_filter_mask(state, category_bits, mask_bits))


def overlap_shape(state: WorldState, verts, count, radius, position, rotation,
                  category_bits=0x1, mask_bits=0xFFFFFFFF) -> jnp.ndarray:
    """Mask of shapes overlapping a query proxy (ref: api/World.cs
    OverlapShape -> GJK distance < ~0)."""
    sh = state.shapes
    b = state.bodies
    p = b.origin[sh.body]
    q = b.rot[sh.body]

    def one(sv, sc, sr, sp, sq):
        out = shape_distance(sv, sc, sr, verts, count, radius,
                             sp, sq, position, rotation, use_radii=True)
        return out.distance < 10.0 * FLT_EPSILON

    hits = jax.vmap(one)(sh.verts, sh.count, sh.radius, p, q)
    return (hits & sh.enabled & b.enabled[sh.body]
            & _query_filter_mask(state, category_bits, mask_bits))


def cast_shape_closest(state: WorldState, verts, count, radius, position,
                       rotation, translation,
                       category_bits=0x1, mask_bits=0xFFFFFFFF) -> RayResult:
    """Closest-hit shape cast (ref: api/World.cs:504-565 CastShape)."""
    sh = state.shapes
    b = state.bodies
    p = b.origin[sh.body]
    q = b.rot[sh.body]
    translation = jnp.asarray(translation, jnp.float32)

    def one(sv, sc, sr, sp, sq):
        return shape_cast_pair(sv, sc, sr, verts, count, radius,
                               sp, sq, position, rotation, translation, 1.0)

    outs = jax.vmap(one)(sh.verts, sh.count, sh.radius, p, q)
    valid = (outs.hit & sh.enabled & b.enabled[sh.body] & ~sh.is_sensor
             & _query_filter_mask(state, category_bits, mask_bits))
    frac = jnp.where(valid, outs.fraction, jnp.inf)
    best = jnp.argmin(frac).astype(jnp.int32)
    found = jnp.isfinite(frac[best])
    return RayResult(
        hit=found, shape=jnp.where(found, best, -1),
        point=outs.point[best], normal=outs.normal[best],
        fraction=jnp.where(found, frac[best], 1.0))


def explode(state: WorldState, position, radius, impulse_per_length,
            falloff=0.0, mask_bits=0xFFFFFFFF) -> WorldState:
    """Apply an explosion impulse to dynamic bodies
    (ref: api/World.cs:709-772 Explode/ExplosionCallback)."""
    import dataclasses

    sh = state.shapes
    b = state.bodies
    position = jnp.asarray(position, jnp.float32)
    p = b.origin[sh.body]
    q = b.rot[sh.body]
    pt_proxy = jnp.tile(position[None, :], (MAX_POLYGON_VERTICES, 1))

    def one(sv, sc, sr, sp, sq):
        return shape_distance(sv, sc, sr, pt_proxy, 1, 1.0, sp, sq,
                              jnp.zeros(2), m.rot_identity(), use_radii=True)

    out = jax.vmap(one)(sh.verts, sh.count, sh.radius, p, q)
    in_range = out.distance <= radius + falloff
    eligible = (in_range & sh.enabled & b.enabled[sh.body] & ~sh.is_sensor
                & (b.type[sh.body] == DYNAMIC)
                & ((sh.filter_category & jnp.uint32(mask_bits)) != 0))

    centroid_w = m.transform_point(p, q, sh.centroid)
    closest = jnp.where((out.distance == 0.0)[:, None], centroid_w, out.point_a)
    direction = closest - position[None, :]
    dlen2 = m.dot(direction, direction)
    direction = jnp.where(
        (dlen2 > 100.0 * FLT_EPSILON * FLT_EPSILON)[:, None],
        m.normalize(direction), jnp.array([1.0, 0.0])[None, :])

    # projected perimeter onto the line perpendicular to the blast direction
    local_line = m.inv_rot_vec(q, m.left_perp(direction))
    proj = jnp.einsum("ivk,ik->iv", sh.verts, local_line)
    lane_ok = _LANES[None, :] < sh.count[:, None]
    pmax = jnp.max(jnp.where(lane_ok, proj, -jnp.inf), axis=1)
    pmin = jnp.min(jnp.where(lane_ok, proj, jnp.inf), axis=1)
    perimeter = pmax - pmin + 2.0 * sh.radius

    scale = jnp.where((out.distance > radius) & (falloff > 0),
                      jnp.clip((radius + falloff - out.distance)
                               / jnp.where(falloff > 0, falloff, 1.0), 0, 1),
                      1.0)
    magnitude = impulse_per_length * perimeter * scale
    impulse = jnp.where(eligible[:, None], magnitude[:, None] * direction, 0.0)

    # accumulate per-body velocity changes (impulse at the closest point)
    body = sh.body
    nb = b.center.shape[0]
    dv = impulse * b.inv_mass[body][:, None]
    lever = closest - b.center[body]
    dw = b.inv_inertia[body] * m.cross(lever, impulse)
    v = b.v.at[body].add(dv)
    w = b.w.at[body].add(dw)
    return dataclasses.replace(
        state, bodies=dataclasses.replace(b, v=v, w=w))


# ---------------------------------------------------------------------------
# character mover (ref: src/Mover.cs:11-47)
# ---------------------------------------------------------------------------

def cast_mover(state: WorldState, p1, p2, radius, translation,
               category_bits=0x1, mask_bits=0xFFFFFFFF):
    """Capsule-mover shape cast with encroachment (ref: api/World.cs:568-626
    CastMover): returns the max fraction of `translation` the mover can
    travel. The reference's 3-tree loop with fraction clipping collapses to
    one masked min over the dense shape set; canEncroach lets a mover
    resting within slop of a surface keep sliding instead of reporting 0."""
    sh = state.shapes
    b = state.bodies
    p = b.origin[sh.body]
    q = b.rot[sh.body]
    p1 = jnp.asarray(p1, jnp.float32)
    p2 = jnp.asarray(p2, jnp.float32)
    translation = jnp.asarray(translation, jnp.float32)
    mover_verts = jnp.zeros((MAX_POLYGON_VERTICES, 2), jnp.float32)
    mover_verts = mover_verts.at[0].set(p1).at[1].set(p2)

    def one(sv, sc, sr, sp, sq):
        return shape_cast_pair(sv, sc, sr, mover_verts, 2, radius,
                               sp, sq, jnp.zeros(2), m.rot_identity(),
                               translation, 1.0, can_encroach=True)

    outs = jax.vmap(one)(sh.verts, sh.count, sh.radius, p, q)
    valid = (outs.hit & sh.enabled & b.enabled[sh.body] & ~sh.is_sensor
             & _query_filter_mask(state, category_bits, mask_bits))
    frac = jnp.where(valid, outs.fraction, 1.0)
    return jnp.min(frac)


def solve_planes(target_delta, plane_normals, plane_offsets, push_limits,
                 valid):
    """Iteratively push a movement delta out of collision planes
    (ref: src/Mover.cs:11-34 SolvePlanes). Arrays are (K,) fixed capacity.
    Plane separation of point p: dot(normal, p) + offset."""
    n = plane_normals
    tol = 0.005

    def body(it, carry):
        delta, push, _ = carry

        def plane_step(i, inner):
            delta, push, total = inner
            sep = m.dot(n[i], delta) + plane_offsets[i] + 0.005
            new_push = jnp.clip(push[i] - sep, 0.0, push_limits[i])
            dpush = jnp.where(valid[i], new_push - push[i], 0.0)
            delta = m.mul_add(delta, dpush, n[i])
            push = push.at[i].set(jnp.where(valid[i], new_push, push[i]))
            return delta, push, total + jnp.abs(dpush)

        delta, push, total = jax.lax.fori_loop(
            0, n.shape[0], plane_step,
            (delta, push, jnp.float32(0.0)))
        return delta, push, total

    delta, push, _ = jax.lax.fori_loop(
        0, 20, body,
        (jnp.asarray(target_delta, jnp.float32),
         jnp.zeros(n.shape[0], jnp.float32), jnp.float32(0.0)))
    return delta, push


def clip_vector(vector, plane_normals, push, clip_velocity, valid):
    """ref: src/Mover.cs:37-47 ClipVector."""
    def body(i, v):
        active = valid[i] & (push[i] != 0.0) & clip_velocity[i]
        d = jnp.minimum(0.0, m.dot(v, plane_normals[i]))
        return jnp.where(active, m.mul_sub(v, d, plane_normals[i]), v)

    return jax.lax.fori_loop(0, plane_normals.shape[0], body,
                             jnp.asarray(vector, jnp.float32))


def collide_mover(state: WorldState, p1, p2, radius, max_planes: int = 8,
                  category_bits=0x1, mask_bits=0xFFFFFFFF):
    """Collect collision planes for a capsule mover vs all shapes
    (ref: api/World.cs:566-626 CollideMover + per-shape CollideMover).
    Returns (normals (K,2), offsets (K,), valid (K,)) for solve_planes."""
    sh = state.shapes
    b = state.bodies
    p = b.origin[sh.body]
    q = b.rot[sh.body]
    mover = jnp.tile(jnp.asarray(p1, jnp.float32)[None, :],
                     (MAX_POLYGON_VERTICES, 1))
    mover = mover.at[1].set(jnp.asarray(p2, jnp.float32))

    def one(sv, sc, sr, sp, sq):
        out = shape_distance(sv, sc, 0.0, mover, 2, 0.0, sp, sq,
                             jnp.zeros(2), m.rot_identity())
        total_r = radius + sr
        hit = out.distance <= total_r
        return hit, out.normal, total_r - out.distance

    hit, normal, depth = jax.vmap(one)(sh.verts, sh.count, sh.radius, p, q)
    hit = (hit & sh.enabled & b.enabled[sh.body] & ~sh.is_sensor
           & _query_filter_mask(state, category_bits, mask_bits))
    # keep the deepest max_planes planes
    score = jnp.where(hit, depth, -jnp.inf)
    _, idx = jax.lax.top_k(score, max_planes)
    valid = hit[idx]
    # Plane(normal, offset=depth): separation(d) = dot(n, d) - offset, with
    # the GJK normal pointing from the shape toward the mover
    # (ref: Collision.cs CollideMover -> Plane(normal, r - dist))
    return normal[idx], -depth[idx], valid
