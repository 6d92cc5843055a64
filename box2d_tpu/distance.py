"""GJK distance, segment distance, conservative-advancement shape cast and TOI.

Behavioral counterpart of ref: src/Distance.cs. Written as *single-pair*
functions over the unified padded-vertex proxy representation; callers vmap
them over pair buffers. All loops are `lax.while_loop`s with the reference's
iteration caps (GJK 20, cast 20, TOI 20x20x50) so the code is jit/vmap-safe
with static shapes.

A proxy is ``(verts (8, 2) f32, count i32, radius f32)``; padded rows must
repeat a real vertex so masked support maths stays finite.

Known port bugs fixed here (we follow upstream Box2D v3 semantics):
- ref Distance.cs:117/124/131 reads ``wB`` from proxyA; upstream uses proxyB.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import math2d as m
from .constants import FLT_EPSILON, LINEAR_SLOP, MAX_POLYGON_VERTICES


class SegmentDistanceResult(NamedTuple):
    fraction1: jnp.ndarray
    fraction2: jnp.ndarray
    closest1: jnp.ndarray
    closest2: jnp.ndarray
    distance_squared: jnp.ndarray


def segment_distance(p1, q1, p2, q2) -> SegmentDistanceResult:
    """Closest points between two segments (ref: src/Distance.cs:20-72)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    dd1 = m.dot(d1, d1)
    dd2 = m.dot(d2, d2)
    rd1 = m.dot(r, d1)
    rd2 = m.dot(r, d2)
    eps_sqr = jnp.float32(FLT_EPSILON * FLT_EPSILON)

    # general case
    d12 = m.dot(d1, d2)
    denom = dd1 * dd2 - d12 * d12
    f1g = jnp.where(denom != 0.0, jnp.clip((d12 * rd2 - rd1 * dd2) / jnp.where(denom != 0.0, denom, 1.0), 0.0, 1.0), 0.0)
    f2g = (d12 * f1g + rd2) / jnp.where(dd2 != 0.0, dd2, 1.0)
    f1g = jnp.where(f2g < 0.0, jnp.clip(-rd1 / jnp.where(dd1 != 0.0, dd1, 1.0), 0.0, 1.0),
                    jnp.where(f2g > 1.0, jnp.clip((d12 - rd1) / jnp.where(dd1 != 0.0, dd1, 1.0), 0.0, 1.0), f1g))
    f2g = jnp.clip(f2g, 0.0, 1.0)

    # degenerate cases
    f1_d1 = jnp.clip(-rd1 / jnp.where(dd1 != 0.0, dd1, 1.0), 0.0, 1.0)  # seg2 is a point
    f2_d2 = jnp.clip(rd2 / jnp.where(dd2 != 0.0, dd2, 1.0), 0.0, 1.0)  # seg1 is a point

    deg1 = dd1 < eps_sqr
    deg2 = dd2 < eps_sqr
    f1 = jnp.where(deg1 | deg2,
                   jnp.where(~deg1, f1_d1, 0.0),
                   f1g)
    f2 = jnp.where(deg1 | deg2,
                   jnp.where(deg1 & ~deg2, f2_d2, 0.0),
                   f2g)
    c1 = m.mul_add(p1, f1, d1)
    c2 = m.mul_add(p2, f2, d2)
    return SegmentDistanceResult(f1, f2, c1, c2, m.distance_squared(c1, c2))


# ---------------------------------------------------------------------------
# GJK
# ---------------------------------------------------------------------------


def _find_support(verts, count, d):
    """Index of the vertex with max dot(v, d), masking padded lanes
    (ref: src/Distance.cs:86-100)."""
    dots = verts @ d
    lane = jnp.arange(MAX_POLYGON_VERTICES)
    dots = jnp.where(lane < count, dots, -jnp.inf)
    return jnp.argmax(dots).astype(jnp.int32)


class DistanceOutput(NamedTuple):
    point_a: jnp.ndarray  # world witness on A (radius-adjusted when use_radii)
    point_b: jnp.ndarray
    distance: jnp.ndarray
    normal: jnp.ndarray  # world unit normal from A to B (zero on overlap)
    cache_count: jnp.ndarray  # simplex vertex count (3 = overlap)
    cache_index_a: jnp.ndarray  # (3,) i32
    cache_index_b: jnp.ndarray  # (3,) i32
    iterations: jnp.ndarray


def _solve_simplex2(w, a):
    """Closest point on a 1-simplex; returns (perm, a, count, d)
    (ref: src/Distance.cs:154-166)."""
    w1, w2 = w[0], w[1]
    e12 = w2 - w1
    d12_2 = -m.dot(w1, e12)
    d12_1 = m.dot(w2, e12)
    inv = 1.0 / jnp.where(d12_1 + d12_2 != 0.0, d12_1 + d12_2, 1.0)

    # region vertex1 | vertex2 | edge
    c_v1 = d12_2 <= 0.0
    c_v2 = ~c_v1 & (d12_1 <= 0.0)

    perm = jnp.where(c_v2, jnp.array([1, 1, 2]), jnp.array([0, 1, 2]))
    new_a = jnp.where(c_v1 | c_v2, jnp.array([1.0, 0.0, 0.0]),
                      jnp.stack([d12_1 * inv, d12_2 * inv, 0.0]))
    count = jnp.where(c_v1 | c_v2, 1, 2).astype(jnp.int32)
    d_edge = m.cross_sv(m.cross(w1 + w2, e12), e12)
    d = jnp.where(c_v1, -w1, jnp.where(c_v2, -w2, d_edge))
    return perm, new_a, count, d


def _solve_simplex3(w, a):
    """Closest point on a 2-simplex (ref: src/Distance.cs:167-215)."""
    w1, w2, w3 = w[0], w[1], w[2]
    e12 = w2 - w1
    d12_1 = m.dot(w2, e12)
    d12_2 = -m.dot(w1, e12)
    e13 = w3 - w1
    d13_1 = m.dot(w3, e13)
    d13_2 = -m.dot(w1, e13)
    e23 = w3 - w2
    d23_1 = m.dot(w3, e23)
    d23_2 = -m.dot(w2, e23)
    n123 = m.cross(e12, e13)
    d123_1 = n123 * m.cross(w2, w3)
    d123_2 = n123 * m.cross(w3, w1)
    d123_3 = n123 * m.cross(w1, w2)

    # mutually prioritized regions, in the reference's if-chain order
    c1 = (d12_2 <= 0.0) & (d13_2 <= 0.0)  # vertex 1
    c2 = (d12_1 > 0.0) & (d12_2 > 0.0) & (d123_3 <= 0.0)  # edge 12
    c3 = (d13_1 > 0.0) & (d13_2 > 0.0) & (d123_2 <= 0.0)  # edge 13
    c4 = (d12_1 <= 0.0) & (d23_2 <= 0.0)  # vertex 2
    c5 = (d13_1 <= 0.0) & (d23_1 <= 0.0)  # vertex 3
    c6 = (d23_1 > 0.0) & (d23_2 > 0.0) & (d123_1 <= 0.0)  # edge 23

    inv12 = 1.0 / jnp.where(d12_1 + d12_2 != 0.0, d12_1 + d12_2, 1.0)
    inv13 = 1.0 / jnp.where(d13_1 + d13_2 != 0.0, d13_1 + d13_2, 1.0)
    inv23 = 1.0 / jnp.where(d23_1 + d23_2 != 0.0, d23_1 + d23_2, 1.0)
    s123 = d123_1 + d123_2 + d123_3
    inv123 = 1.0 / jnp.where(s123 != 0.0, s123, 1.0)

    def pick(*cases):
        """cases: list of (cond, value); last is default."""
        out = cases[-1][1]
        for cond, val in reversed(cases[:-1]):
            out = jnp.where(cond, val, out)
        return out

    perm = pick(
        (c1, jnp.array([0, 1, 2])),
        (c2, jnp.array([0, 1, 2])),
        (c3, jnp.array([0, 2, 2])),
        (c4, jnp.array([1, 1, 2])),
        (c5, jnp.array([2, 1, 2])),
        (c6, jnp.array([2, 1, 2])),
        (True, jnp.array([0, 1, 2])),
    )
    new_a = pick(
        (c1, jnp.array([1.0, 0.0, 0.0])),
        (c2, jnp.stack([d12_1 * inv12, d12_2 * inv12, 0.0])),
        (c3, jnp.stack([d13_1 * inv13, d13_2 * inv13, 0.0])),
        (c4, jnp.array([1.0, 0.0, 0.0])),
        (c5, jnp.array([1.0, 0.0, 0.0])),
        (c6, jnp.stack([d23_2 * inv23, d23_1 * inv23, 0.0])),
        (True, jnp.stack([d123_1 * inv123, d123_2 * inv123, d123_3 * inv123])),
    )
    count = pick(
        (c1, 1), (c2, 2), (c3, 2), (c4, 1), (c5, 1), (c6, 2), (True, 3)
    )
    d_e12 = m.cross_sv(m.cross(w1 + w2, e12), e12)
    d_e13 = m.cross_sv(m.cross(w1 + w3, e13), e13)
    d_e23 = m.cross_sv(m.cross(w2 + w3, e23), e23)
    d = pick(
        (c1, -w1), (c2, d_e12), (c3, d_e13), (c4, -w2), (c5, -w3), (c6, d_e23),
        (True, jnp.zeros(2, jnp.float32)),
    )
    return perm, new_a, jnp.asarray(count, jnp.int32), d


def shape_distance(
    verts_a, count_a, radius_a,
    verts_b, count_b, radius_b,
    p_a, q_a, p_b, q_b,
    use_radii: bool = False,
) -> DistanceOutput:
    """GJK closest-distance between two convex proxies
    (ref: src/Distance.cs:219-319). Single pair; vmap over buffers.
    """
    # bring B into A's frame (ref: :226-232)
    xp, xq = m.inv_mul_transforms(p_a, q_a, p_b, q_b)
    local_b = m.rot_vec(xq[None, :], verts_b) + xp[None, :]

    # cold-start simplex: first vertex pair (ref: :104-110)
    idx_a0 = jnp.zeros(3, jnp.int32)
    idx_b0 = jnp.zeros(3, jnp.int32)
    wa0 = jnp.tile(verts_a[0], (3, 1))
    wb0 = jnp.tile(local_b[0], (3, 1))

    def body(state):
        (count, idx_a, idx_b, wa, wb, bary, nun, it, done, _) = state
        w = wa - wb

        perm1, a1, cnt1, d1 = _solve_simplex2(w, bary)
        perm3, a3, cnt3, d3 = _solve_simplex3(w, bary)
        is1 = count == 1
        is2 = count == 2
        perm = jnp.where(is1, jnp.array([0, 1, 2]), jnp.where(is2, perm1, perm3))
        bary_n = jnp.where(is1, jnp.array([1.0, 0.0, 0.0]), jnp.where(is2, a1, a3))
        cnt_n = jnp.where(is1, 1, jnp.where(is2, cnt1, cnt3)).astype(jnp.int32)
        d = jnp.where(is1, -w[0], jnp.where(is2, d1, d3))

        idx_a = idx_a[perm]
        idx_b = idx_b[perm]
        wa = wa[perm]
        wb = wb[perm]

        # termination: triangle (overlap) or vanishing direction (ref: :257-271)
        overlap = cnt_n == 3
        tiny = m.dot(d, d) < FLT_EPSILON * FLT_EPSILON
        stop = overlap | tiny
        nun = jnp.where(stop, nun, d)

        # support point (ref: :273-280)
        sa = _find_support(verts_a, count_a, d)
        sb = _find_support(local_b, count_b, -d)

        # duplicate support check against pre-solve simplex (ref: :282-295)
        lane = jnp.arange(3)
        dup = jnp.any((lane < count) & (sa == state[1]) & (sb == state[2]))

        new_slot = cnt_n  # append at the post-solve count
        idx_a2 = idx_a.at[new_slot].set(sa, mode="drop")
        idx_b2 = idx_b.at[new_slot].set(sb, mode="drop")
        wa2 = wa.at[new_slot].set(verts_a[sa], mode="drop")
        wb2 = wb.at[new_slot].set(local_b[sb], mode="drop")

        grow = ~stop & ~dup
        cnt_out = jnp.where(grow, cnt_n + 1, cnt_n).astype(jnp.int32)
        idx_a = jnp.where(grow, idx_a2, idx_a)
        idx_b = jnp.where(grow, idx_b2, idx_b)
        wa = jnp.where(grow, wa2, wa)
        wb = jnp.where(grow, wb2, wb)

        done_out = stop | dup
        return (cnt_out, idx_a, idx_b, wa, wb, bary_n, nun,
                it + jnp.int32(1), done_out, overlap)

    def cond(state):
        return ~state[8] & (state[7] < 20)

    state0 = (jnp.int32(1), idx_a0, idx_b0, wa0, wb0,
              jnp.array([1.0, 0.0, 0.0], jnp.float32),
              jnp.zeros(2, jnp.float32), jnp.int32(0), jnp.bool_(False),
              jnp.bool_(False))
    (count, idx_a, idx_b, wa, wb, bary, nun, it, _, overlap) = lax.while_loop(
        cond, body, state0
    )

    # witness points (ref: :144-153)
    la = jnp.where(count == 1, wa[0],
                   jnp.where(count == 2, bary[0] * wa[0] + bary[1] * wa[1],
                             bary[0] * wa[0] + bary[1] * wa[1] + bary[2] * wa[2]))
    lb = jnp.where(count == 1, wb[0],
                   jnp.where(count == 2, bary[0] * wb[0] + bary[1] * wb[1], la))

    normal = m.rot_vec(q_a, m.normalize(nun))
    dist = m.distance(la, lb)
    pa = m.transform_point(p_a, q_a, la)
    pb = m.transform_point(p_a, q_a, lb)  # both witness pts live in A's frame

    if use_radii:
        shrink = dist > 0.1 * LINEAR_SLOP
        dist_r = jnp.maximum(0.0, dist - radius_a - radius_b)
        pa_r = m.mul_add(pa, radius_a, normal)
        pb_r = m.mul_sub(pb, radius_b, normal)
        dist = jnp.where(shrink, dist_r, dist)
        pa = jnp.where(shrink, pa_r, pa)
        pb = jnp.where(shrink, pb_r, pb)

    dist = jnp.where(overlap, 0.0, dist)
    normal = jnp.where(overlap, jnp.zeros(2, jnp.float32), normal)
    return DistanceOutput(pa, pb, dist, normal, count, idx_a, idx_b, it)


# ---------------------------------------------------------------------------
# conservative-advancement shape cast (ref: src/Distance.cs:322-381)
# ---------------------------------------------------------------------------


class CastOutput(NamedTuple):
    fraction: jnp.ndarray
    point: jnp.ndarray
    normal: jnp.ndarray
    hit: jnp.ndarray


def shape_cast_pair(
    verts_a, count_a, radius_a,
    verts_b, count_b, radius_b,
    p_a, q_a, p_b, q_b,
    translation_b, max_fraction,
    can_encroach=False,
) -> CastOutput:
    """Cast proxy B (moving by translation_b) against static proxy A."""
    total_radius = radius_a + radius_b
    target0 = jnp.maximum(LINEAR_SLOP, total_radius - LINEAR_SLOP)
    tolerance = 0.25 * LINEAR_SLOP

    def body(state):
        frac, target, it, done, out = state
        pb_t = m.mul_add(p_b, frac, translation_b)
        d = shape_distance(verts_a, count_a, radius_a, verts_b, count_b,
                           radius_b, p_a, q_a, pb_t, q_b, use_radii=False)
        close = d.distance < target + tolerance

        # initial touch handling (ref: :349-361)
        first = it == 0
        encroach_ok = jnp.asarray(can_encroach) & (d.distance > 2.0 * LINEAR_SLOP)
        target_n = jnp.where(close & first & encroach_ok,
                             d.distance - LINEAR_SLOP, target)
        hit_first = close & first & ~encroach_ok
        c1 = m.mul_add(d.point_a, radius_a, d.normal)
        c2 = m.mul_add(d.point_b, -radius_b, d.normal)
        out_first = CastOutput(jnp.float32(0.0), 0.5 * (c1 + c2), d.normal,
                               jnp.bool_(True))

        hit_later = close & ~first
        out_later = CastOutput(frac, m.mul_add(d.point_a, radius_a, d.normal),
                               d.normal, jnp.bool_(True))

        # conservative advancement (ref: :372-378); runs unless we hit above
        advancing = ~hit_first & ~hit_later
        denom = m.dot(translation_b, d.normal)
        miss = advancing & (denom >= 0.0)
        adv = (target_n - d.distance) / jnp.where(denom != 0.0, denom, 1.0)
        frac_n = jnp.where(advancing, frac + adv, frac)
        past = advancing & ~miss & (frac_n >= max_fraction)

        done_n = hit_first | hit_later | miss | past
        out_n = jax.tree.map(
            lambda f, l, o: jnp.where(hit_first, f, jnp.where(hit_later, l, o)),
            out_first, out_later, out)
        return frac_n, target_n, it + 1, done_n, out_n

    out0 = CastOutput(jnp.float32(0.0), jnp.zeros(2, jnp.float32),
                      jnp.zeros(2, jnp.float32), jnp.bool_(False))
    state0 = (jnp.float32(0.0), target0, jnp.int32(0), jnp.bool_(False), out0)
    *_, out = lax.while_loop(lambda s: ~s[3] & (s[2] < 20), body, state0)
    return out


# ---------------------------------------------------------------------------
# time of impact (ref: src/Distance.cs:382-645)
# ---------------------------------------------------------------------------

TOI_UNKNOWN = 0
TOI_OVERLAPPED = 1
TOI_HIT = 2
TOI_SEPARATED = 3
TOI_FAILED = 4


class Sweep(NamedTuple):
    """Body motion over the step (ref: include/Collision.cs:867-880)."""

    local_center: jnp.ndarray  # (2,)
    c1: jnp.ndarray  # COM at t=0
    c2: jnp.ndarray  # COM at t=1
    q1: jnp.ndarray  # rotation at t=0
    q2: jnp.ndarray  # rotation at t=1


def sweep_transform(sweep: Sweep, t):
    """ref: src/Distance.cs:8-18 GetSweepTransform."""
    p = (1.0 - t) * sweep.c1 + t * sweep.c2
    q = m.rot_normalize((1.0 - t) * sweep.q1 + t * sweep.q2)
    return p - m.rot_vec(q, sweep.local_center), q


class TOIOutput(NamedTuple):
    state: jnp.ndarray  # i32 TOI_*
    fraction: jnp.ndarray
    point: jnp.ndarray
    normal: jnp.ndarray


def time_of_impact(
    verts_a, count_a, radius_a, sweep_a: Sweep,
    verts_b, count_b, radius_b, sweep_b: Sweep,
    max_fraction,
) -> TOIOutput:
    """Conservative-advancement TOI with swept separating axes
    (ref: src/Distance.cs:529-645). Single pair; vmap over candidates.
    All nested loops use the reference's iteration caps."""
    total_radius = radius_a + radius_b
    target = jnp.maximum(LINEAR_SLOP, total_radius - LINEAR_SLOP)
    tolerance = 0.25 * LINEAR_SLOP

    def support(verts, count, d):
        dots = verts @ d
        dots = jnp.where(jnp.arange(MAX_POLYGON_VERTICES) < count, dots, -jnp.inf)
        return jnp.argmax(dots).astype(jnp.int32)

    def make_sep_fn(cache: DistanceOutput, t1):
        """Build the separation function (ref: :390-444). Returns
        (type, axis, local_point): 0=points, 1=faceA, 2=faceB."""
        xa_p, xa_q = sweep_transform(sweep_a, t1)
        xb_p, xb_q = sweep_transform(sweep_b, t1)
        ia0, ia1 = cache.cache_index_a[0], cache.cache_index_a[1]
        ib0, ib1 = cache.cache_index_b[0], cache.cache_index_b[1]
        one_point = cache.cache_count == 1
        face_b = (~one_point) & (ia0 == ia1)

        # points
        pa = m.transform_point(xa_p, xa_q, verts_a[ia0])
        pb = m.transform_point(xb_p, xb_q, verts_b[ib0])
        axis_pts = m.normalize(pb - pa)

        # faceB: B's edge normal
        lb1, lb2 = verts_b[ib0], verts_b[ib1]
        axis_fb = m.normalize(m.cross_vs(lb2 - lb1, jnp.float32(1.0)))
        lp_fb = 0.5 * (lb1 + lb2)
        nrm_fb = m.rot_vec(xb_q, axis_fb)
        pb_fb = m.transform_point(xb_p, xb_q, lp_fb)
        pa_fb = m.transform_point(xa_p, xa_q, verts_a[ia0])
        s_fb = m.dot(pa_fb - pb_fb, nrm_fb)
        axis_fb = jnp.where(s_fb < 0.0, -axis_fb, axis_fb)

        # faceA: A's edge normal
        la1, la2 = verts_a[ia0], verts_a[ia1]
        axis_fa = m.normalize(m.cross_vs(la2 - la1, jnp.float32(1.0)))
        lp_fa = 0.5 * (la1 + la2)
        nrm_fa = m.rot_vec(xa_q, axis_fa)
        pa_fa = m.transform_point(xa_p, xa_q, lp_fa)
        pb_fa = m.transform_point(xb_p, xb_q, verts_b[ib0])
        s_fa = m.dot(pb_fa - pa_fa, nrm_fa)
        axis_fa = jnp.where(s_fa < 0.0, -axis_fa, axis_fa)

        sep_type = jnp.where(one_point, 0, jnp.where(face_b, 2, 1))
        axis = jnp.where(one_point, axis_pts, jnp.where(face_b, axis_fb, axis_fa))
        local_point = jnp.where(one_point, jnp.zeros(2),
                                jnp.where(face_b, lp_fb, lp_fa))
        return sep_type, axis, local_point

    def find_min_separation(sep_type, axis, local_point, t):
        """ref: :445-491."""
        xa_p, xa_q = sweep_transform(sweep_a, t)
        xb_p, xb_q = sweep_transform(sweep_b, t)
        # points
        ax_a = m.inv_rot_vec(xa_q, axis)
        ax_b = m.inv_rot_vec(xb_q, -axis)
        ia_pts = support(verts_a, count_a, ax_a)
        ib_pts = support(verts_b, count_b, ax_b)
        s_pts = m.dot(
            m.transform_point(xb_p, xb_q, verts_b[ib_pts])
            - m.transform_point(xa_p, xa_q, verts_a[ia_pts]), axis)
        # faceA
        nrm_a = m.rot_vec(xa_q, axis)
        ib_fa = support(verts_b, count_b, m.inv_rot_vec(xb_q, -nrm_a))
        s_fa = m.dot(
            m.transform_point(xb_p, xb_q, verts_b[ib_fa])
            - m.transform_point(xa_p, xa_q, local_point), nrm_a)
        # faceB
        nrm_b = m.rot_vec(xb_q, axis)
        ia_fb = support(verts_a, count_a, m.inv_rot_vec(xa_q, -nrm_b))
        s_fb = m.dot(
            m.transform_point(xa_p, xa_q, verts_a[ia_fb])
            - m.transform_point(xb_p, xb_q, local_point), nrm_b)

        ia = jnp.where(sep_type == 0, ia_pts, jnp.where(sep_type == 1, -1, ia_fb))
        ib = jnp.where(sep_type == 0, ib_pts, jnp.where(sep_type == 1, ib_fa, -1))
        s = jnp.where(sep_type == 0, s_pts, jnp.where(sep_type == 1, s_fa, s_fb))
        return s, ia, ib

    def evaluate_separation(sep_type, axis, local_point, ia, ib, t):
        """ref: :492-524."""
        xa_p, xa_q = sweep_transform(sweep_a, t)
        xb_p, xb_q = sweep_transform(sweep_b, t)
        ia_c = jnp.maximum(ia, 0)
        ib_c = jnp.maximum(ib, 0)
        s_pts = m.dot(
            m.transform_point(xb_p, xb_q, verts_b[ib_c])
            - m.transform_point(xa_p, xa_q, verts_a[ia_c]), axis)
        nrm_a = m.rot_vec(xa_q, axis)
        s_fa = m.dot(
            m.transform_point(xb_p, xb_q, verts_b[ib_c])
            - m.transform_point(xa_p, xa_q, local_point), nrm_a)
        nrm_b = m.rot_vec(xb_q, axis)
        s_fb = m.dot(
            m.transform_point(xa_p, xa_q, verts_a[ia_c])
            - m.transform_point(xb_p, xb_q, local_point), nrm_b)
        return jnp.where(sep_type == 0, s_pts,
                         jnp.where(sep_type == 1, s_fa, s_fb))

    def outer_body(st):
        (t1, it, done, out) = st
        xa_p, xa_q = sweep_transform(sweep_a, t1)
        xb_p, xb_q = sweep_transform(sweep_b, t1)
        d = shape_distance(verts_a, count_a, 0.0, verts_b, count_b, 0.0,
                           xa_p, xa_q, xb_p, xb_q)

        overlapped = d.distance <= 0.0
        touching = (~overlapped) & (d.distance <= target + tolerance)
        pa_r = m.mul_add(d.point_a, radius_a, d.normal)
        pb_r = m.mul_add(d.point_b, -radius_b, d.normal)
        out_touch = TOIOutput(jnp.int32(TOI_HIT), t1, 0.5 * (pa_r + pb_r),
                              d.normal)
        out_over = TOIOutput(jnp.int32(TOI_OVERLAPPED), jnp.float32(0.0),
                             out.point, out.normal)

        sep_type, axis, local_point = make_sep_fn(d, t1)

        # inner push-back loop over t2 (ref: :583-631)
        def inner_body(ist):
            t1i, t2, push_it, idone, istate = ist
            s2, ia, ib = find_min_separation(sep_type, axis, local_point, t2)
            separated = s2 > target + tolerance
            advanced = (~separated) & (s2 > target - tolerance)
            s1 = evaluate_separation(sep_type, axis, local_point, ia, ib, t1i)
            failed = (~separated) & (~advanced) & (s1 < target - tolerance)
            hit_now = (~separated) & (~advanced) & (~failed) & (
                s1 <= target + tolerance)

            # 50-iteration false-position/bisection root find (ref: :615-628)
            def root_body(rst):
                a1, a2, s1r, s2r, k, rdone, t_out = rst
                t_mid = jnp.where(
                    (k & 1) == 1,
                    a1 + (target - s1r) * (a2 - a1)
                    / jnp.where(s2r - s1r != 0.0, s2r - s1r, 1.0),
                    0.5 * (a1 + a2))
                s = evaluate_separation(sep_type, axis, local_point, ia, ib,
                                        t_mid)
                converged = jnp.abs(s - target) < tolerance
                upper = s > target
                a1n = jnp.where(upper, t_mid, a1)
                s1n = jnp.where(upper, s, s1r)
                a2n = jnp.where(upper, a2, t_mid)
                s2n = jnp.where(upper, s2r, s)
                return (a1n, a2n, s1n, s2n, k + 1, rdone | converged,
                        jnp.where(converged & ~rdone, t_mid, t_out))

            root0 = (t1i, t2, s1, s2, jnp.int32(0), jnp.bool_(False), t2)
            *_, rdone, t2_new = lax.while_loop(
                lambda r: ~r[5] & (r[4] < 50), root_body, root0)
            t2n = jnp.where(rdone, t2_new, t2)

            # istate: 0=continue, 1=advance t1=t2, 2=separated, 3=failed, 4=hit
            new_state = jnp.where(separated, 2,
                                  jnp.where(advanced, 1,
                                            jnp.where(failed, 3,
                                                      jnp.where(hit_now, 4, 0))))
            idone_n = new_state != 0
            t1_n = jnp.where(advanced, t2, t1i)
            return (t1_n, jnp.where(idone_n, t2, t2n), push_it + 1,
                    idone_n | (push_it + 1 >= MAX_POLYGON_VERTICES), new_state)

        inner0 = (t1, jnp.asarray(max_fraction, jnp.float32), jnp.int32(0),
                  overlapped | touching, jnp.int32(0))
        (t1_after, _, _, _, istate) = lax.while_loop(
            lambda i: ~i[3], inner_body, inner0)

        out_sep = TOIOutput(jnp.int32(TOI_SEPARATED),
                            jnp.asarray(max_fraction, jnp.float32),
                            out.point, out.normal)
        out_fail = TOIOutput(jnp.int32(TOI_FAILED), t1_after, 0.5 * (pa_r + pb_r),
                             d.normal)
        out_hit2 = TOIOutput(jnp.int32(TOI_HIT), t1_after, 0.5 * (pa_r + pb_r),
                             d.normal)

        def pick_out():
            o = out
            o = jax.tree.map(lambda a, b: jnp.where(istate == 2, a, b), out_sep, o)
            o = jax.tree.map(lambda a, b: jnp.where(istate == 3, a, b), out_fail, o)
            o = jax.tree.map(lambda a, b: jnp.where(istate == 4, a, b), out_hit2, o)
            o = jax.tree.map(lambda a, b: jnp.where(touching, a, b), out_touch, o)
            o = jax.tree.map(lambda a, b: jnp.where(overlapped, a, b), out_over, o)
            return o

        finished = overlapped | touching | (istate >= 2)
        it_n = it + 1
        timeout = it_n >= 20
        out_timeout = TOIOutput(jnp.int32(TOI_FAILED), t1_after,
                                0.5 * (pa_r + pb_r), d.normal)
        out_n = pick_out()
        out_n = jax.tree.map(
            lambda a, b: jnp.where(~finished & timeout, a, b), out_timeout, out_n)
        return (t1_after, it_n, done | finished | timeout, out_n)

    out0 = TOIOutput(jnp.int32(TOI_UNKNOWN),
                     jnp.asarray(max_fraction, jnp.float32),
                     jnp.zeros(2, jnp.float32), jnp.zeros(2, jnp.float32))
    st0 = (jnp.float32(0.0), jnp.int32(0), jnp.bool_(False), out0)
    *_, out = lax.while_loop(lambda s: ~s[2], outer_body, st0)
    return out
