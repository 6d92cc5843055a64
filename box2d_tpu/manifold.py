"""Contact manifold generation for all shape-pair classes.

Behavioral counterpart of ref: src/Manifold.cs (12 pair functions). Built on
the unified rounded-polygon representation (see geometry.py): every function
here is written for a *single pair* in plain scalar JAX and vmapped by the
narrow phase over pair buffers — XLA turns the vmapped masked vertex loops
into dense vector ops, which is the TPU replacement for the reference's
per-pair virtual dispatch.

Pair classes (dispatch happens at pair-buffer build time, not per lane):
- versus-circle: circle/capsule/segment/polygon/chain  x  circle
- poly-poly:     capsule/segment/polygon  x  capsule/segment/polygon
- chain:         chain-segment  x  capsule/polygon (one-sided, GJK-based)

Known port bugs fixed here (upstream Box2D v3 semantics used instead):
- ref Manifold.cs:268-269: capsule clip conditions use `> length2` twice.
- ref Manifold.cs:277-278: point1 uses `sp` where upstream uses `sq`.
- ref Manifold.cs:127: `mp.point = xfA.p = mp.anchorA` assignment typo.
- ref Manifold.cs:841: reference-index variable never assigned before use
  (upstream uses the polygon separation's argmax index).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import math2d as m
from .constants import FLT_EPSILON, LINEAR_SLOP, MAX_POLYGON_VERTICES, SPECULATIVE_DISTANCE
from .distance import segment_distance, shape_distance

_LANES = jnp.arange(MAX_POLYGON_VERTICES)


class Manifold(NamedTuple):
    """Up-to-two-point contact manifold (ref: include/Collision.cs:916-958).

    anchor_a/anchor_b are world-oriented offsets from each body's *origin*;
    the contact prepare step re-bases them on the centers of mass.
    """

    normal: jnp.ndarray      # (2,) world normal from A to B
    point_count: jnp.ndarray  # i32 in {0, 1, 2}
    anchor_a: jnp.ndarray    # (2, 2)
    anchor_b: jnp.ndarray    # (2, 2)
    point: jnp.ndarray       # (2, 2) world contact points
    separation: jnp.ndarray  # (2,)
    ids: jnp.ndarray         # (2,) i32 feature ids for warm-start matching


def _empty() -> Manifold:
    z2 = jnp.zeros(2, jnp.float32)
    z22 = jnp.zeros((2, 2), jnp.float32)
    return Manifold(z2, jnp.int32(0), z22, z22, z22, z2, jnp.zeros(2, jnp.int32))


def _make_id(a, b):
    """Feature id packing (ref: src/Manifold.cs:22 B2_MAKE_ID)."""
    return (jnp.asarray(a, jnp.int32) << 8) | (jnp.asarray(b, jnp.int32) & 0xFF)


def _safe_div(num, den):
    return num / jnp.where(den != 0.0, den, 1.0)


def _finalize(manifold: Manifold, p_a, q_a, p_b, origin=None) -> Manifold:
    """Rotate anchors into world orientation and derive anchorB/point
    (ref: src/Manifold.cs:299-313, 546-560)."""
    anchor = manifold.anchor_a
    if origin is not None:
        anchor = anchor + origin[None, :]
    aa = m.rot_vec(q_a[None, :], anchor)
    ab = aa + (p_a - p_b)[None, :]
    pt = aa + p_a[None, :]
    return manifold._replace(
        normal=m.rot_vec(q_a, manifold.normal), anchor_a=aa, anchor_b=ab, point=pt
    )


def _select(pred, a: Manifold, b: Manifold) -> Manifold:
    return Manifold(*[jnp.where(pred, x, y) for x, y in zip(a, b)])


def _one_point(normal, anchor, separation, pid=0) -> Manifold:
    e = _empty()
    return e._replace(
        normal=normal,
        point_count=jnp.int32(1),
        anchor_a=e.anchor_a.at[0].set(anchor),
        separation=e.separation.at[0].set(separation),
        ids=e.ids.at[0].set(jnp.asarray(pid, jnp.int32)),
    )


# ---------------------------------------------------------------------------
# versus-circle family
# ---------------------------------------------------------------------------

def collide_circles(center_a, radius_a, p_a, q_a, center_b, radius_b, p_b, q_b) -> Manifold:
    """ref: src/Manifold.cs:24-46."""
    xp, xq = m.inv_mul_transforms(p_a, q_a, p_b, q_b)
    point_a = center_a
    point_b = m.transform_point(xp, xq, center_b)
    normal, dist = m.get_length_and_normalize(point_b - point_a)
    separation = dist - radius_a - radius_b
    c_a = m.mul_add(point_a, radius_a, normal)
    c_b = m.mul_add(point_b, -radius_b, normal)
    mf = _one_point(normal, 0.5 * (c_a + c_b), separation)
    mf = _finalize(mf, p_a, q_a, p_b)
    return _select(separation <= SPECULATIVE_DISTANCE, mf, _empty())


def collide_capsule_circle(p1, p2, radius_a, p_a, q_a, center_b, radius_b, p_b, q_b) -> Manifold:
    """ref: src/Manifold.cs:49-83. Also serves segment-vs-circle (radius 0)."""
    xp, xq = m.inv_mul_transforms(p_a, q_a, p_b, q_b)
    pb = m.transform_point(xp, xq, center_b)
    e = p2 - p1
    s1 = m.dot(pb - p1, e)
    s2 = m.dot(p2 - pb, e)
    s = _safe_div(s1, m.dot(e, e))
    pa = jnp.where(s1 < 0.0, p1, jnp.where(s2 < 0.0, p2, m.mul_add(p1, s, e)))
    normal, dist = m.get_length_and_normalize(pb - pa)
    separation = dist - radius_a - radius_b
    c_a = m.mul_add(pa, radius_a, normal)
    c_b = m.mul_add(pb, -radius_b, normal)
    mf = _one_point(normal, 0.5 * (c_a + c_b), separation)
    mf = _finalize(mf, p_a, q_a, p_b)
    return _select(separation <= SPECULATIVE_DISTANCE, mf, _empty())


def collide_polygon_circle(verts, normals, count, radius_a, p_a, q_a,
                           center_b, radius_b, p_b, q_b) -> Manifold:
    """ref: src/Manifold.cs:91-165. Polygon must have count >= 3."""
    xp, xq = m.inv_mul_transforms(p_a, q_a, p_b, q_b)
    center = m.transform_point(xp, xq, center_b)
    radius = radius_a + radius_b

    seps = m.dot(normals, center[None, :] - verts)
    seps = jnp.where(jnp.arange(verts.shape[0]) < count, seps, -jnp.inf)
    normal_index = jnp.argmax(seps).astype(jnp.int32)
    separation = seps[normal_index]

    i1 = normal_index
    i2 = jnp.where(i1 + 1 < count, i1 + 1, 0)
    v1 = verts[i1]
    v2 = verts[i2]
    u1 = m.dot(center - v1, v2 - v1)
    u2 = m.dot(center - v2, v1 - v2)

    deep = separation <= FLT_EPSILON  # center inside or on the face

    # vertex regions (ref: :115-148)
    n_v1 = m.normalize(center - v1)
    sep_v1 = m.dot(center - v1, n_v1)
    n_v2 = m.normalize(center - v2)
    sep_v2 = m.dot(center - v2, n_v2)
    # face region (ref: :149-163)
    n_face = normals[normal_index]

    use_v1 = (u1 < 0.0) & ~deep
    use_v2 = (u2 < 0.0) & ~deep & ~use_v1
    normal = jnp.where(use_v1, n_v1, jnp.where(use_v2, n_v2, n_face))
    sep_out = jnp.where(use_v1, sep_v1, jnp.where(use_v2, sep_v2, separation))

    vref = jnp.where(use_v2, v2, v1)
    c_a_vert = m.mul_add(vref, radius_a, normal)
    c_a_face = m.mul_add(center, radius_a - m.dot(center - v1, n_face), n_face)
    c_a = jnp.where(use_v1 | use_v2, c_a_vert, c_a_face)
    c_b = m.mul_sub(center, radius_b, normal)

    sep_final = jnp.where(use_v1 | use_v2, m.dot(c_b - c_a, normal), separation - radius)
    mf = _one_point(normal, 0.5 * (c_a + c_b), sep_final)
    mf = _finalize(mf, p_a, q_a, p_b)
    return _select(sep_out <= radius + SPECULATIVE_DISTANCE, mf, _empty())


# ---------------------------------------------------------------------------
# capsule vs capsule (both 2-vertex) — ref: src/Manifold.cs:167-315
# ---------------------------------------------------------------------------

def collide_capsules(a1, a2, radius_a, p_a, q_a, b1, b2, radius_b, p_b, q_b) -> Manifold:
    origin = a1
    sp_a = p_a + m.rot_vec(q_a, origin)
    xp, xq = m.inv_mul_transforms(sp_a, q_a, p_b, q_b)
    p1 = jnp.zeros(2, jnp.float32)
    q1 = a2 - origin
    p2 = m.transform_point(xp, xq, b1)
    q2 = m.transform_point(xp, xq, b2)

    sd = segment_distance(p1, q1, p2, q2)
    f1, f2 = sd.fraction1, sd.fraction2
    closest1, closest2 = sd.closest1, sd.closest2
    radius = radius_a + radius_b
    max_distance = radius + SPECULATIVE_DISTANCE
    in_range = sd.distance_squared <= max_distance * max_distance
    dist = jnp.sqrt(jnp.maximum(sd.distance_squared, 0.0))

    u1, length1 = m.get_length_and_normalize(q1 - p1)
    u2, length2 = m.get_length_and_normalize(q2 - p2)
    fp2 = m.dot(p2 - p1, u1)
    fq2 = m.dot(q2 - p1, u1)
    outside_a = ((fp2 < 0.0) & (fq2 < 0.0)) | ((fp2 >= length1) & (fq2 >= length1))
    fp1 = m.dot(p1 - p2, u2)
    fq1 = m.dot(q1 - p2, u2)
    outside_b = ((fp1 < 0.0) & (fq1 < 0.0)) | ((fp1 >= length2) & (fq1 >= length2))
    parallel_overlap = ~outside_a & ~outside_b

    # --- SAT separations along each segment's perpendicular (ref: :210-239)
    def seg_separation(nrm, pa_, pb_, qb_):
        ss1 = m.dot(pb_ - pa_, nrm)
        ss2 = m.dot(qb_ - pa_, nrm)
        s_pos = jnp.minimum(ss1, ss2)
        s_neg = jnp.minimum(-ss1, -ss2)
        flipn = s_pos <= s_neg
        return jnp.where(flipn, s_neg, s_pos), jnp.where(flipn, -nrm, nrm)

    sep_a, normal_a = seg_separation(m.left_perp(u1), p1, p2, q2)
    sep_b, normal_b = seg_separation(m.left_perp(u2), p2, p1, q1)
    use_a = sep_a + 0.1 * LINEAR_SLOP >= sep_b

    def clip_two(pc, qc, fp, fq, ln):
        """Clip segment (pc,qc) with edge fractions (fp,fq) into [0, ln]."""
        s_lo = _safe_div(-fp, fq - fp)
        c_lo = jnp.where((fp < 0.0) & (fq > 0.0), m.lerp(pc, qc, s_lo), pc)
        t_lo = _safe_div(-fq, fp - fq)
        d_lo = jnp.where((fq < 0.0) & (fp > 0.0), m.lerp(qc, pc, t_lo), qc)
        s_hi = _safe_div(fp - ln, fp - fq)
        c_hi = jnp.where((fp > ln) & (fq < ln), m.lerp(pc, qc, s_hi), c_lo)
        t_hi = _safe_div(fq - ln, fq - fp)
        d_hi = jnp.where((fq > ln) & (fp < ln), m.lerp(qc, pc, t_hi), d_lo)
        return c_hi, d_hi

    # branch A: reference edge on capsule A (ref: :240-260)
    cpa, cqa = clip_two(p2, q2, fp2, fq2, length1)
    spa = m.dot(cpa - p1, normal_a)
    sqa = m.dot(cqa - p1, normal_a)
    ok_a = (spa <= dist + LINEAR_SLOP) | (sqa <= dist + LINEAR_SLOP)
    pt0_a = m.mul_add(cpa, 0.5 * (radius_a - radius_b - spa), normal_a)
    pt1_a = m.mul_add(cqa, 0.5 * (radius_a - radius_b - sqa), normal_a)

    # branch B: reference edge on capsule B (ref: :261-282)
    cpb, cqb = clip_two(p1, q1, fp1, fq1, length2)
    spb = m.dot(cpb - p2, normal_b)
    sqb = m.dot(cqb - p2, normal_b)
    ok_b = (spb <= dist + LINEAR_SLOP) | (sqb <= dist + LINEAR_SLOP)
    pt0_b = m.mul_add(cpb, 0.5 * (radius_b - radius_a - spb), normal_b)
    pt1_b = m.mul_add(cqb, 0.5 * (radius_b - radius_a - sqb), normal_b)

    two_pt = parallel_overlap & jnp.where(use_a, ok_a, ok_b)
    e = _empty()
    mf2 = e._replace(
        normal=jnp.where(use_a, normal_a, -normal_b),
        point_count=jnp.int32(2),
        anchor_a=jnp.stack([jnp.where(use_a, pt0_a, pt0_b),
                            jnp.where(use_a, pt1_a, pt1_b)]),
        separation=jnp.stack([jnp.where(use_a, spa, spb) - radius,
                              jnp.where(use_a, sqa, sqb) - radius]),
        ids=jnp.stack([_make_id(0, 0), jnp.where(use_a, _make_id(0, 1), _make_id(1, 0))]),
    )

    # single-point fallback (ref: :284-298)
    nrm = closest2 - closest1
    nrm = jnp.where(m.dot(nrm, nrm) > FLT_EPSILON * FLT_EPSILON,
                    m.normalize(nrm), m.left_perp(u1))
    c1 = m.mul_add(closest1, radius_a, nrm)
    c2 = m.mul_add(closest2, -radius_b, nrm)
    i1 = jnp.where(f1 == 0.0, 0, 1)
    i2 = jnp.where(f2 == 0.0, 0, 1)
    mf1 = _one_point(nrm, 0.5 * (c1 + c2), dist - radius, _make_id(i1, i2))

    mf = _select(two_pt, mf2, mf1)
    mf = _finalize(mf, p_a, q_a, p_b, origin=origin)
    return _select(in_range, mf, _empty())


# ---------------------------------------------------------------------------
# polygon vs polygon (SAT + clipping) — ref: src/Manifold.cs:328-562
# ---------------------------------------------------------------------------

def _find_max_separation(n1, v1, c1, v2, c2):
    """max_i min_j dot(n1[i], v2[j]-v1[i]) (ref: src/Manifold.cs:389-408)."""
    # (i, j) separation matrix via broadcasting
    diff = v2[None, :, :] - v1[:, None, :]            # (8, 8, 2)
    sij = jnp.einsum("ik,ijk->ij", n1, diff)          # (8, 8)
    sij = jnp.where((jnp.arange(v2.shape[0]) < c2)[None, :], sij, jnp.inf)
    si = jnp.min(sij, axis=1)
    si = jnp.where(jnp.arange(v1.shape[0]) < c1, si, -jnp.inf)
    best = jnp.argmax(si).astype(jnp.int32)
    return si[best], best


def _clip_polygons(v_1, n_1, c_1, v_2, c_2, edge1, edge2, flip):
    """Reference-edge clipping (ref: src/Manifold.cs:329-388).

    poly1 is the reference polygon; poly2 the incident one. ``flip`` only
    affects the output normal sign and the id packing order.
    """
    i11 = edge1
    i12 = jnp.where(edge1 + 1 < c_1, edge1 + 1, 0)
    i21 = edge2
    i22 = jnp.where(edge2 + 1 < c_2, edge2 + 1, 0)
    normal = n_1[i11]
    v11, v12 = v_1[i11], v_1[i12]
    v21, v22 = v_2[i21], v_2[i22]
    tangent = m.cross_sv(jnp.float32(1.0), normal)
    lower1 = jnp.float32(0.0)
    upper1 = m.dot(v12 - v11, tangent)
    upper2 = m.dot(v21 - v11, tangent)
    lower2 = m.dot(v22 - v11, tangent)
    nonoverlap = (upper2 < lower1) | (upper1 < lower2)

    big = upper2 - lower2 > FLT_EPSILON
    v_lower = jnp.where((lower2 < lower1) & big,
                        m.lerp(v22, v21, _safe_div(lower1 - lower2, upper2 - lower2)), v22)
    v_upper = jnp.where((upper2 > upper1) & big,
                        m.lerp(v22, v21, _safe_div(upper1 - lower2, upper2 - lower2)), v21)
    sep_lower = m.dot(v_lower - v11, normal)
    sep_upper = m.dot(v_upper - v11, normal)
    return (normal, v_lower, v_upper, sep_lower, sep_upper,
            i11, i12, i21, i22, nonoverlap)


def collide_polygons(va, na, ca, ra, p_a, q_a, vb, nb, cb, rb, p_b, q_b) -> Manifold:
    """SAT + reference-edge clipping with rounded-polygon support and
    vertex-vertex fallback (ref: src/Manifold.cs:410-562). Handles any
    2..8-vertex pair except capsule-capsule (use collide_capsules)."""
    origin = va[0]
    sp_a = p_a + m.rot_vec(q_a, origin)
    xp, xq = m.inv_mul_transforms(sp_a, q_a, p_b, q_b)

    lva = va - origin[None, :]
    lna = na
    lvb = m.rot_vec(xq[None, :], vb) + xp[None, :]
    lnb = m.rot_vec(xq[None, :], nb)

    sep_a, edge_a0 = _find_max_separation(lna, lva, ca, lvb, cb)
    sep_b, edge_b0 = _find_max_separation(lnb, lvb, cb, lva, ca)
    radius = ra + rb
    in_range = (sep_a <= SPECULATIVE_DISTANCE + radius) & (sep_b <= SPECULATIVE_DISTANCE + radius)

    flip = sep_a < sep_b  # reference keeps A when sep_a >= sep_b

    # incident edge search: most anti-parallel normal (ref: :444-472)
    dots_b = lnb @ lna[edge_a0]
    dots_b = jnp.where(jnp.arange(lnb.shape[0]) < cb, dots_b, jnp.inf)
    inc_b = jnp.argmin(dots_b).astype(jnp.int32)
    dots_a = lna @ lnb[edge_b0]
    dots_a = jnp.where(jnp.arange(lna.shape[0]) < ca, dots_a, jnp.inf)
    inc_a = jnp.argmin(dots_a).astype(jnp.int32)
    edge_a = jnp.where(flip, inc_a, edge_a0)
    edge_b = jnp.where(flip, edge_b0, inc_b)

    # clip with reference polygon selected by flip
    (nrm_f, vl_f, vu_f, sl_f, su_f, i11f, i12f, i21f, i22f, no_f) = _clip_polygons(
        lva, lna, ca, lvb, cb, edge_a, edge_b, False)
    (nrm_t, vl_t, vu_t, sl_t, su_t, i11t, i12t, i21t, i22t, no_t) = _clip_polygons(
        lvb, lnb, cb, lva, ca, edge_b, edge_a, True)

    normal = jnp.where(flip, -nrm_t, nrm_f)
    r1 = jnp.where(flip, rb, ra)
    r2 = jnp.where(flip, ra, rb)
    v_lower = jnp.where(flip, vl_t, vl_f)
    v_upper = jnp.where(flip, vu_t, vu_f)
    sep_lower = jnp.where(flip, sl_t, sl_f)
    sep_upper = jnp.where(flip, su_t, su_f)
    nonoverlap = jnp.where(flip, no_t, no_f)
    ref_nrm = jnp.where(flip, nrm_t, nrm_f)
    v_lower = m.mul_add(v_lower, 0.5 * (r1 - r2 - sep_lower), ref_nrm)
    v_upper = m.mul_add(v_upper, 0.5 * (r1 - r2 - sep_upper), ref_nrm)

    id0 = jnp.where(flip, _make_id(i21t, i12t), _make_id(i11f, i22f))
    id1 = jnp.where(flip, _make_id(i22t, i11t), _make_id(i12f, i21f))
    pt0 = jnp.where(flip, v_upper, v_lower)
    pt1 = jnp.where(flip, v_lower, v_upper)
    sp0 = jnp.where(flip, sep_upper, sep_lower) - radius
    sp1 = jnp.where(flip, sep_lower, sep_upper) - radius

    e = _empty()
    mf_clip = e._replace(
        normal=normal, point_count=jnp.where(nonoverlap, 0, 2).astype(jnp.int32),
        anchor_a=jnp.stack([pt0, pt1]),
        separation=jnp.stack([sp0, sp1]),
        ids=jnp.stack([id0, id1]),
    )

    # vertex-vertex fallback when shapes are separated (ref: :474-544)
    speculative = jnp.maximum(sep_a, sep_b) > 0.1 * LINEAR_SLOP
    i11 = edge_a
    i12 = jnp.where(edge_a + 1 < ca, edge_a + 1, 0)
    i21 = edge_b
    i22 = jnp.where(edge_b + 1 < cb, edge_b + 1, 0)
    sd = segment_distance(lva[i11], lva[i12], lvb[i21], lvb[i22])
    dist = jnp.sqrt(jnp.maximum(sd.distance_squared, 0.0))
    separation = dist - radius
    beyond = speculative & (separation > SPECULATIVE_DISTANCE)

    min_sep = jnp.minimum(
        jnp.where(mf_clip.point_count > 0, mf_clip.separation[0], jnp.inf),
        jnp.where(mf_clip.point_count > 1, mf_clip.separation[1], jnp.inf))
    vertex_case = speculative & (separation + 0.1 * LINEAR_SLOP < min_sep) & (
        ((sd.fraction1 == 0.0) | (sd.fraction1 == 1.0))
        & ((sd.fraction2 == 0.0) | (sd.fraction2 == 1.0)))

    va_pt = jnp.where(sd.fraction1 == 0.0, lva[i11], lva[i12])
    vb_pt = jnp.where(sd.fraction2 == 0.0, lvb[i21], lvb[i22])
    ia = jnp.where(sd.fraction1 == 0.0, i11, i12)
    ib = jnp.where(sd.fraction2 == 0.0, i21, i22)
    nrm_vv = (vb_pt - va_pt) * _safe_div(jnp.float32(1.0), dist)
    c1 = m.mul_add(va_pt, ra, nrm_vv)
    c2 = m.mul_add(vb_pt, -rb, nrm_vv)
    mf_vv = _one_point(nrm_vv, 0.5 * (c1 + c2), separation, _make_id(ia, ib))

    mf = _select(vertex_case, mf_vv, mf_clip)
    mf = _finalize(mf, p_a, q_a, p_b, origin=origin)
    return _select(in_range & ~beyond, mf, _empty())


def collide_polygons_batched(va, na, ca, ra, p_a, q_a,
                             vb, nb_, cb, rb, p_b, q_b) -> Manifold:
    """LANE-MAJOR batched collide_polygons — identical math on (P,)/(P, V)
    arrays (ref: src/Manifold.cs:410-562, same structure as the scalar
    collide_polygons above, which stays for one-off callers).

    Under vmap, the scalar version's (V, 2)-shaped locals tile their 2-wide
    minor dim to 128 lanes (64x VPU waste) — at 39k pairs the narrow phase
    measured ~3 ms/step of which most was this padding. Here every
    elementwise op runs on (P,) or (P, V) with vector components split into
    x/y columns; per-lane vertex selections are (P, V) one-hot sums."""
    P, V = va.shape[0], va.shape[1]
    lanes = jnp.arange(V)

    vax, vay = va[..., 0], va[..., 1]
    nax, nay = na[..., 0], na[..., 1]
    vbx, vby = vb[..., 0], vb[..., 1]
    nbx, nby = nb_[..., 0], nb_[..., 1]
    qac, qas = q_a[:, 0], q_a[:, 1]
    qbc, qbs = q_b[:, 0], q_b[:, 1]

    def sel(arr, idx):
        """arr (P, V), idx (P,) -> (P,) one-hot row select."""
        oh = idx[:, None] == lanes[None, :]
        return jnp.sum(jnp.where(oh, arr, 0), axis=1)

    # local frame: A-local, origin at A's first vertex
    ox, oy = vax[:, 0], vay[:, 0]
    spx = p_a[:, 0] + qac * ox - qas * oy
    spy = p_a[:, 1] + qas * ox + qac * oy
    dx = p_b[:, 0] - spx
    dy = p_b[:, 1] - spy
    xpx = qac * dx + qas * dy      # inv_rot_vec(q_a, p_b - sp_a)
    xpy = -qas * dx + qac * dy
    xqc = qac * qbc + qas * qbs    # rot_inv_mul(q_a, q_b)
    xqs = qac * qbs - qas * qbc

    lvax = vax - ox[:, None]
    lvay = vay - oy[:, None]
    lnax, lnay = nax, nay
    lvbx = xqc[:, None] * vbx - xqs[:, None] * vby + xpx[:, None]
    lvby = xqs[:, None] * vbx + xqc[:, None] * vby + xpy[:, None]
    lnbx = xqc[:, None] * nbx - xqs[:, None] * nby
    lnby = xqs[:, None] * nbx + xqc[:, None] * nby

    ok_a = lanes[None, :] < ca[:, None]
    ok_b = lanes[None, :] < cb[:, None]

    def max_separation(n1x, n1y, v1x, v1y, c1ok, v2x, v2y, c2ok):
        """(ref: src/Manifold.cs:389-408) max_i min_j dot(n1[i], v2j-v1i);
        first-max argmax like jnp.argmax."""
        best_sep = jnp.full((P,), -jnp.inf, jnp.float32)
        best_i = jnp.zeros((P,), jnp.int32)
        for i in range(V):
            sij = (n1x[:, i:i + 1] * (v2x - v1x[:, i:i + 1])
                   + n1y[:, i:i + 1] * (v2y - v1y[:, i:i + 1]))
            si = jnp.min(jnp.where(c2ok, sij, jnp.inf), axis=1)
            take = c1ok[:, i] & (si > best_sep)
            best_sep = jnp.where(take, si, best_sep)
            best_i = jnp.where(take, jnp.int32(i), best_i)
        return best_sep, best_i

    sep_a, edge_a0 = max_separation(lnax, lnay, lvax, lvay, ok_a,
                                    lvbx, lvby, ok_b)
    sep_b, edge_b0 = max_separation(lnbx, lnby, lvbx, lvby, ok_b,
                                    lvax, lvay, ok_a)
    radius = ra + rb
    in_range = ((sep_a <= SPECULATIVE_DISTANCE + radius)
                & (sep_b <= SPECULATIVE_DISTANCE + radius))
    flip = sep_a < sep_b

    # incident edge search (ref: :444-472)
    ena_x = sel(lnax, edge_a0)
    ena_y = sel(lnay, edge_a0)
    dots_b = jnp.where(ok_b, lnbx * ena_x[:, None] + lnby * ena_y[:, None],
                       jnp.inf)
    inc_b = jnp.argmin(dots_b, axis=1).astype(jnp.int32)
    enb_x = sel(lnbx, edge_b0)
    enb_y = sel(lnby, edge_b0)
    dots_a = jnp.where(ok_a, lnax * enb_x[:, None] + lnay * enb_y[:, None],
                       jnp.inf)
    inc_a = jnp.argmin(dots_a, axis=1).astype(jnp.int32)
    edge_a = jnp.where(flip, inc_a, edge_a0)
    edge_b = jnp.where(flip, edge_b0, inc_b)

    # reference-edge clip with flip-SELECTED inputs (the scalar version
    # computes both clip orientations and selects after; selecting the
    # operand columns first is the batched equivalent)
    c_ref = jnp.where(flip, cb, ca)
    c_inc = jnp.where(flip, ca, cb)
    i11 = jnp.where(flip, edge_b, edge_a)
    i12 = jnp.where(i11 + 1 < c_ref, i11 + 1, 0)
    i21 = jnp.where(flip, edge_a, edge_b)
    i22 = jnp.where(i21 + 1 < c_inc, i21 + 1, 0)
    rvx = jnp.where(flip[:, None], lvbx, lvax)
    rvy = jnp.where(flip[:, None], lvby, lvay)
    rnx = jnp.where(flip[:, None], lnbx, lnax)
    rny = jnp.where(flip[:, None], lnby, lnay)
    ivx = jnp.where(flip[:, None], lvax, lvbx)
    ivy = jnp.where(flip[:, None], lvay, lvby)
    v11x, v11y = sel(rvx, i11), sel(rvy, i11)
    v12x, v12y = sel(rvx, i12), sel(rvy, i12)
    v21x, v21y = sel(ivx, i21), sel(ivy, i21)
    v22x, v22y = sel(ivx, i22), sel(ivy, i22)
    nrx, nry = sel(rnx, i11), sel(rny, i11)
    tx, ty = -nry, nrx                        # cross_sv(1, normal)
    upper1 = (v12x - v11x) * tx + (v12y - v11y) * ty
    upper2 = (v21x - v11x) * tx + (v21y - v11y) * ty
    lower2 = (v22x - v11x) * tx + (v22y - v11y) * ty
    nonoverlap = (upper2 < 0.0) | (upper1 < lower2)

    span = upper2 - lower2
    big = span > FLT_EPSILON
    safe_span = jnp.where(span != 0.0, span, 1.0)
    t_lo = (0.0 - lower2) / safe_span
    t_up = (upper1 - lower2) / safe_span
    lo_clip = (lower2 < 0.0) & big
    up_clip = (upper2 > upper1) & big
    v_lo_x = jnp.where(lo_clip, v22x + (v21x - v22x) * t_lo, v22x)
    v_lo_y = jnp.where(lo_clip, v22y + (v21y - v22y) * t_lo, v22y)
    v_up_x = jnp.where(up_clip, v22x + (v21x - v22x) * t_up, v21x)
    v_up_y = jnp.where(up_clip, v22y + (v21y - v22y) * t_up, v21y)
    sep_lower = (v_lo_x - v11x) * nrx + (v_lo_y - v11y) * nry
    sep_upper = (v_up_x - v11x) * nrx + (v_up_y - v11y) * nry

    nmx = jnp.where(flip, -nrx, nrx)
    nmy = jnp.where(flip, -nry, nry)
    r1 = jnp.where(flip, rb, ra)
    r2 = jnp.where(flip, ra, rb)
    adj_lo = 0.5 * (r1 - r2 - sep_lower)
    adj_up = 0.5 * (r1 - r2 - sep_upper)
    v_lo_x = v_lo_x + adj_lo * nrx
    v_lo_y = v_lo_y + adj_lo * nry
    v_up_x = v_up_x + adj_up * nrx
    v_up_y = v_up_y + adj_up * nry

    mk = lambda a, b: (a << 8) | (b & 0xFF)
    id0 = jnp.where(flip, mk(i21, i12), mk(i11, i22))
    id1 = jnp.where(flip, mk(i22, i11), mk(i12, i21))
    pt0x = jnp.where(flip, v_up_x, v_lo_x)
    pt0y = jnp.where(flip, v_up_y, v_lo_y)
    pt1x = jnp.where(flip, v_lo_x, v_up_x)
    pt1y = jnp.where(flip, v_lo_y, v_up_y)
    sp0 = jnp.where(flip, sep_upper, sep_lower) - radius
    sp1 = jnp.where(flip, sep_lower, sep_upper) - radius
    clip_count = jnp.where(nonoverlap, 0, 2).astype(jnp.int32)

    # vertex-vertex fallback when separated (ref: :474-544)
    speculative = jnp.maximum(sep_a, sep_b) > 0.1 * LINEAR_SLOP
    j11 = edge_a
    j12 = jnp.where(edge_a + 1 < ca, edge_a + 1, 0)
    j21 = edge_b
    j22 = jnp.where(edge_b + 1 < cb, edge_b + 1, 0)
    p1x, p1y = sel(lvax, j11), sel(lvay, j11)
    q1x, q1y = sel(lvax, j12), sel(lvay, j12)
    p2x, p2y = sel(lvbx, j21), sel(lvby, j21)
    q2x, q2y = sel(lvbx, j22), sel(lvby, j22)
    # segment_distance, componentwise (ref: src/Distance.cs:20-72)
    d1x, d1y = q1x - p1x, q1y - p1y
    d2x, d2y = q2x - p2x, q2y - p2y
    rx, ry = p1x - p2x, p1y - p2y
    dd1 = d1x * d1x + d1y * d1y
    dd2 = d2x * d2x + d2y * d2y
    rd1 = rx * d1x + ry * d1y
    rd2 = rx * d2x + ry * d2y
    eps_sqr = jnp.float32(FLT_EPSILON * FLT_EPSILON)
    d12 = d1x * d2x + d1y * d2y
    denom = dd1 * dd2 - d12 * d12
    sdd1 = jnp.where(dd1 != 0.0, dd1, 1.0)
    sdd2 = jnp.where(dd2 != 0.0, dd2, 1.0)
    f1g = jnp.where(denom != 0.0,
                    jnp.clip((d12 * rd2 - rd1 * dd2)
                             / jnp.where(denom != 0.0, denom, 1.0),
                             0.0, 1.0), 0.0)
    f2g = (d12 * f1g + rd2) / sdd2
    f1g = jnp.where(f2g < 0.0, jnp.clip(-rd1 / sdd1, 0.0, 1.0),
                    jnp.where(f2g > 1.0,
                              jnp.clip((d12 - rd1) / sdd1, 0.0, 1.0), f1g))
    f2g = jnp.clip(f2g, 0.0, 1.0)
    f1_d1 = jnp.clip(-rd1 / sdd1, 0.0, 1.0)
    f2_d2 = jnp.clip(rd2 / sdd2, 0.0, 1.0)
    deg1 = dd1 < eps_sqr
    deg2 = dd2 < eps_sqr
    f1 = jnp.where(deg1 | deg2, jnp.where(~deg1, f1_d1, 0.0), f1g)
    f2 = jnp.where(deg1 | deg2, jnp.where(deg1 & ~deg2, f2_d2, 0.0), f2g)
    c1x, c1y = p1x + f1 * d1x, p1y + f1 * d1y
    c2x, c2y = p2x + f2 * d2x, p2y + f2 * d2y
    dsq = (c2x - c1x) ** 2 + (c2y - c1y) ** 2
    dist = jnp.sqrt(jnp.maximum(dsq, 0.0))
    separation = dist - radius
    beyond = speculative & (separation > SPECULATIVE_DISTANCE)

    min_sep = jnp.minimum(jnp.where(clip_count > 0, sp0, jnp.inf),
                          jnp.where(clip_count > 1, sp1, jnp.inf))
    vertex_case = (speculative
                   & (separation + 0.1 * LINEAR_SLOP < min_sep)
                   & ((f1 == 0.0) | (f1 == 1.0))
                   & ((f2 == 0.0) | (f2 == 1.0)))

    va_px = jnp.where(f1 == 0.0, p1x, q1x)
    va_py = jnp.where(f1 == 0.0, p1y, q1y)
    vb_px = jnp.where(f2 == 0.0, p2x, q2x)
    vb_py = jnp.where(f2 == 0.0, p2y, q2y)
    ia = jnp.where(f1 == 0.0, j11, j12)
    ib = jnp.where(f2 == 0.0, j21, j22)
    inv_d = jnp.where(dist != 0.0, 1.0 / jnp.where(dist != 0.0, dist, 1.0),
                      0.0)
    nvx = (vb_px - va_px) * inv_d
    nvy = (vb_py - va_py) * inv_d
    ca1x = va_px + ra * nvx
    ca1y = va_py + ra * nvy
    cb1x = vb_px - rb * nvx
    cb1y = vb_py - rb * nvy
    av_x = 0.5 * (ca1x + cb1x)
    av_y = 0.5 * (ca1y + cb1y)

    # merge: vertex-vertex one-point vs two-point clip, then the range gate
    use_vv = vertex_case
    count = jnp.where(use_vv, 1, clip_count)
    nmx = jnp.where(use_vv, nvx, nmx)
    nmy = jnp.where(use_vv, nvy, nmy)
    a0x = jnp.where(use_vv, av_x, pt0x)
    a0y = jnp.where(use_vv, av_y, pt0y)
    a1x = jnp.where(use_vv, 0.0, pt1x)
    a1y = jnp.where(use_vv, 0.0, pt1y)
    s0 = jnp.where(use_vv, separation, sp0)
    s1 = jnp.where(use_vv, 0.0, sp1)
    id0 = jnp.where(use_vv, mk(ia, ib), id0)
    id1 = jnp.where(use_vv, 0, id1)

    # finalize (ref: src/Manifold.cs:299-313, 546-560): shift anchors back
    # by the local origin, rotate into world orientation, derive B/point
    a0x = a0x + ox
    a0y = a0y + oy
    a1x = a1x + ox
    a1y = a1y + oy
    wa0x = qac * a0x - qas * a0y
    wa0y = qas * a0x + qac * a0y
    wa1x = qac * a1x - qas * a1y
    wa1y = qas * a1x + qac * a1y
    wnx = qac * nmx - qas * nmy
    wny = qas * nmx + qac * nmy
    dpx = p_a[:, 0] - p_b[:, 0]
    dpy = p_a[:, 1] - p_b[:, 1]

    # range gate LAST, zeroing every field exactly like the scalar
    # version's final _select(..., _empty())
    live = in_range & ~beyond
    zf = jnp.float32(0.0)
    count = jnp.where(live, count, 0)
    wnx = jnp.where(live, wnx, zf)
    wny = jnp.where(live, wny, zf)
    wa0x = jnp.where(live, wa0x, zf)
    wa0y = jnp.where(live, wa0y, zf)
    wa1x = jnp.where(live, wa1x, zf)
    wa1y = jnp.where(live, wa1y, zf)
    s0 = jnp.where(live, s0, zf)
    s1 = jnp.where(live, s1, zf)
    id0 = jnp.where(live, id0, 0)
    id1 = jnp.where(live, id1, 0)
    dpx = jnp.where(live, dpx, zf)
    dpy = jnp.where(live, dpy, zf)
    pax = jnp.where(live, p_a[:, 0], zf)
    pay = jnp.where(live, p_a[:, 1], zf)

    def two(x0, y0, x1, y1):
        return jnp.stack([jnp.stack([x0, y0], axis=-1),
                          jnp.stack([x1, y1], axis=-1)], axis=1)

    return Manifold(
        normal=jnp.stack([wnx, wny], axis=-1),
        point_count=count,
        anchor_a=two(wa0x, wa0y, wa1x, wa1y),
        anchor_b=two(wa0x + dpx, wa0y + dpy, wa1x + dpx, wa1y + dpy),
        point=two(wa0x + pax, wa0y + pay, wa1x + pax, wa1y + pay),
        separation=jnp.stack([s0, s1], axis=-1),
        ids=jnp.stack([id0, id1], axis=-1).astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# chain segment family (one-sided) — ref: src/Manifold.cs:570-915
# ---------------------------------------------------------------------------

def collide_chain_segment_circle(p1, p2, ghost1, ghost2, p_a, q_a,
                                 center_b, radius_b, p_b, q_b) -> Manifold:
    """ref: src/Manifold.cs:570-618."""
    xp, xq = m.inv_mul_transforms(p_a, q_a, p_b, q_b)
    pb = m.transform_point(xp, xq, center_b)
    e = p2 - p1
    offset = m.dot(m.right_perp(e), pb - p1)
    front = offset >= 0.0

    u = m.dot(e, p2 - pb)
    v = m.dot(e, pb - p1)
    # region gating with ghost vertices
    prev_edge = p1 - ghost1
    u_prev = m.dot(prev_edge, pb - p1)
    next_edge = ghost2 - p2
    v_next = m.dot(next_edge, pb - p2)

    reject = (~front) | ((v <= 0.0) & (u_prev <= 0.0)) | ((v > 0.0) & (u <= 0.0) & (v_next > 0.0))

    ee = m.dot(e, e)
    pa_mid = jnp.where(ee > 0.0, (u * p1 + v * p2) / jnp.where(ee > 0.0, ee, 1.0), p1)
    pa = jnp.where(v <= 0.0, p1, jnp.where(u <= 0.0, p2, pa_mid))

    normal, dist = m.get_length_and_normalize(pb - pa)
    separation = dist - radius_b
    c_b = m.mul_add(pb, -radius_b, normal)
    mf = _one_point(normal, 0.5 * (pa + c_b), separation)
    mf = _finalize(mf, p_a, q_a, p_b)
    ok = ~reject & (separation <= SPECULATIVE_DISTANCE)
    return _select(ok, mf, _empty())


def _clip_segments(a1, a2, b1, b2, normal, ra, rb, id1, id2):
    """ref: src/Manifold.cs:625-658. Returns manifold in local A frame."""
    tangent = m.left_perp(normal)
    lower1 = jnp.float32(0.0)
    upper1 = m.dot(a2 - a1, tangent)
    upper2 = m.dot(b1 - a1, tangent)
    lower2 = m.dot(b2 - a1, tangent)
    nonoverlap = (upper2 < lower1) | (upper1 < lower2)
    big = upper2 - lower2 > FLT_EPSILON
    v_lower = jnp.where((lower2 < lower1) & big,
                        m.lerp(b2, b1, _safe_div(lower1 - lower2, upper2 - lower2)), b2)
    v_upper = jnp.where((upper2 > upper1) & big,
                        m.lerp(b2, b1, _safe_div(upper1 - lower2, upper2 - lower2)), b1)
    sep_lower = m.dot(v_lower - a1, normal)
    sep_upper = m.dot(v_upper - a1, normal)
    v_lower = m.mul_add(v_lower, 0.5 * (ra - rb - sep_lower), normal)
    v_upper = m.mul_add(v_upper, 0.5 * (ra - rb - sep_upper), normal)
    radius = ra + rb
    e = _empty()
    mf = e._replace(
        normal=normal,
        point_count=jnp.where(nonoverlap, 0, 2).astype(jnp.int32),
        anchor_a=jnp.stack([v_lower, v_upper]),
        separation=jnp.stack([sep_lower - radius, sep_upper - radius]),
        ids=jnp.stack([jnp.asarray(id1, jnp.int32), jnp.asarray(id2, jnp.int32)]),
    )
    return mf


def collide_chain_segment_polygon(p1, p2, ghost1, ghost2, p_a, q_a,
                                  vb, nb, cb, rb, p_b, q_b) -> Manifold:
    """One-sided chain segment vs rounded polygon/capsule
    (ref: src/Manifold.cs:681-915)."""
    xp, xq = m.inv_mul_transforms(p_a, q_a, p_b, q_b)
    lvb = m.rot_vec(xq[None, :], vb) + xp[None, :]
    lnb = m.rot_vec(xq[None, :], nb)
    centroid_b = jnp.sum(
        jnp.where((jnp.arange(lvb.shape[0]) < cb)[:, None], lvb, 0.0), axis=0
    ) / jnp.maximum(cb, 1).astype(jnp.float32)

    edge1 = m.normalize(p2 - p1)
    convex_tol = 0.01
    edge0 = m.normalize(p1 - ghost1)
    edge2 = m.normalize(ghost2 - p2)
    normal0 = m.right_perp(edge0)
    normal2 = m.right_perp(edge2)
    convex1 = m.cross(edge0, edge1) >= convex_tol
    convex2 = m.cross(edge1, edge2) >= convex_tol
    normal1 = m.right_perp(edge1)

    behind1 = m.dot(normal1, centroid_b - p1) < 0.0
    behind0 = jnp.where(convex1, m.dot(normal0, centroid_b - p1) < 0.0, True)
    behind2 = jnp.where(convex2, m.dot(normal2, centroid_b - p2) < 0.0, True)
    fully_behind = behind1 & behind0 & behind2

    # GJK distance from the segment's first point proxy to the polygon
    # (ref: :713-721 — proxyA is just [p1])
    seg_proxy = jnp.tile(p1[None, :], (MAX_POLYGON_VERTICES, 1))
    seg_proxy = seg_proxy.at[1].set(p2)
    d = shape_distance(seg_proxy, 2, 0.0, lvb, cb, 0.0,
                       jnp.zeros(2, jnp.float32), m.rot_identity(),
                       jnp.zeros(2, jnp.float32), m.rot_identity())
    out_of_range = d.distance > rb + SPECULATIVE_DISTANCE

    n0 = jnp.where(convex1, normal0, normal1)
    n2 = jnp.where(convex2, normal2, normal1)

    def classify(nrm):
        """0=skip, 1=admit, 2=snap (ref: :673-679)."""
        sin_tol = 0.01
        lower = m.dot(nrm, edge1) <= 0.0
        t_lower = jnp.where(convex1, jnp.where(m.cross(nrm, normal0) > sin_tol, 0, 1), 2)
        t_upper = jnp.where(convex2, jnp.where(m.cross(normal2, nrm) > sin_tol, 0, 1), 2)
        return jnp.where(lower, t_lower, t_upper)

    # ---------------- separated path (cache-based) ----------------
    sep_path = ~behind1 & (d.distance > 0.1 * LINEAR_SLOP)

    # cache.count == 1: vertex-vertex normal
    nrm_vv = m.normalize(d.point_b - d.point_a)
    type_vv = classify(nrm_vv)
    mf_admit_vv = _one_point(
        nrm_vv, d.point_a, d.distance - rb,
        _make_id(d.cache_index_a[0], d.cache_index_b[0]))

    # cache.count == 2 helpers
    ia1, ia2 = d.cache_index_a[0], d.cache_index_a[1]
    ib1, ib2 = d.cache_index_b[0], d.cache_index_b[1]
    same_a = ia1 == ia2

    # polygon face reference (A vertices same -> B has the face)
    nrm_ba = d.point_a - d.point_b
    dot1b = m.dot(nrm_ba, lnb[ib1])
    dot2b = m.dot(nrm_ba, lnb[ib2])
    ibf = jnp.where(dot1b > dot2b, ib1, ib2)
    nrm_bf = lnb[ibf]
    type_bf = classify(-nrm_bf)
    ibf2 = jnp.where(ibf < cb - 1, ibf + 1, 0)
    bf1 = lvb[ibf]
    bf2 = lvb[ibf2]
    dt1 = m.dot(nrm_bf, p1 - bf1)
    dt2 = m.dot(nrm_bf, p2 - bf1)
    smooth_reject_b = jnp.where(
        dt1 < dt2,
        m.dot(n0, nrm_bf) < m.dot(normal1, nrm_bf),
        m.dot(n2, nrm_bf) < m.dot(normal1, nrm_bf))
    mf_face_b = _clip_segments(bf1, bf2, p1, p2, nrm_bf, rb, 0.0,
                               _make_id(ibf, 1), _make_id(ibf2, 0))
    mf_face_b = mf_face_b._replace(normal=-nrm_bf)

    # incident selection when segment face is reference
    dot1s = m.dot(normal1, lvb[ib1] - p1)
    dot2s = m.dot(normal1, lvb[ib2] - p2)
    inc_idx_2 = jnp.where(dot1s < dot2s, ib1, ib2)

    # ---------------- behind/deep path ----------------
    svals = m.dot(lnb * 0 + normal1[None, :], lvb - p1[None, :])
    svals = jnp.where(jnp.arange(lvb.shape[0]) < cb, svals, jnp.inf)
    edge_sep = jnp.min(svals)
    inc_idx_deep = jnp.argmin(svals).astype(jnp.int32)

    s0vals = jnp.where(jnp.arange(lvb.shape[0]) < cb, m.dot(normal0[None, :] * jnp.ones_like(lvb), lvb - p1[None, :]), jnp.inf)
    s0 = jnp.min(s0vals)
    use0 = convex1 & (s0 > edge_sep)
    edge_sep2 = jnp.where(use0, s0, edge_sep)
    s2vals = jnp.where(jnp.arange(lvb.shape[0]) < cb, m.dot(normal2[None, :] * jnp.ones_like(lvb), lvb - p2[None, :]), jnp.inf)
    s2 = jnp.min(s2vals)
    use2 = convex2 & (s2 > edge_sep2)
    edge_sep_f = jnp.where(use2, s2, edge_sep2)
    ghost_best = use0 | use2

    # polygon reference faces admissible by smoothness (ref: :828-838)
    types = jnp.stack([classify(-lnb[i]) for i in range(lnb.shape[0])])
    admit = (types == 1) & (jnp.arange(lnb.shape[0]) < cb)
    poly_seps = jnp.minimum(
        jnp.einsum("ik,ik->i", lnb, p2[None, :] - lvb),
        jnp.einsum("ik,ik->i", lnb, p1[None, :] - lvb))
    poly_seps = jnp.where(admit, poly_seps, -jnp.inf)
    poly_sep = jnp.max(poly_seps)
    ref_idx = jnp.argmax(poly_seps).astype(jnp.int32)
    use_poly_face = poly_sep > edge_sep_f

    raf1 = lvb[ref_idx]
    ra2_idx = jnp.where(ref_idx < cb - 1, ref_idx + 1, 0)
    raf2 = lvb[ra2_idx]
    nrf = lnb[ref_idx]
    dd1 = m.dot(nrf, p1 - raf1)
    dd2 = m.dot(nrf, p2 - raf1)
    smooth_reject_deep = jnp.where(
        dd1 < dd2,
        m.dot(n0, nrf) < m.dot(normal1, nrf),
        m.dot(n2, nrf) < m.dot(normal1, nrf))
    mf_face_deep = _clip_segments(raf1, raf2, p1, p2, nrf, rb, 0.0,
                                  _make_id(ref_idx, 1), _make_id(ra2_idx, 0))
    mf_face_deep = mf_face_deep._replace(normal=-nrf)

    # ---------------- final segment-reference clip ----------------
    # choose incident edge of B around the incident vertex/normal
    def seg_ref_clip(inc_index, inc_normal, use_normal):
        ib1c = jnp.where(use_normal, inc_normal,
                         jnp.where(
                             m.dot(normal1, lnb[jnp.where(inc_index > 0, inc_index - 1, cb - 1)])
                             < m.dot(normal1, lnb[inc_index]),
                             jnp.where(inc_index > 0, inc_index - 1, cb - 1),
                             inc_index))
        ib2c = jnp.where(ib1c < cb - 1, ib1c + 1, 0)
        b1c = lvb[ib1c]
        b2c = lvb[ib2c]
        # normal1 already points from the chain toward the polygon; the
        # port's blanket negation (ref: Manifold.cs:905) is only correct for
        # the polygon-face-reference paths, so we keep +normal1 here
        # (upstream Box2D v3 semantics).
        return _clip_segments(p1, p2, b1c, b2c, normal1, 0.0, rb,
                              _make_id(0, ib2c), _make_id(1, ib1c))

    # separated path selections
    # cache count 1:
    c1_skip = type_vv == 0
    c1_admit = type_vv == 1
    mf_c1_snap = seg_ref_clip(d.cache_index_b[0], jnp.int32(0), jnp.bool_(False))
    mf_c1 = _select(c1_admit, mf_admit_vv,
                    _select(c1_skip, _empty(), mf_c1_snap))

    # cache count 2, same A vertex (polygon face candidate):
    c2a_skip = type_bf == 0
    c2a_admit = (type_bf == 1) & ~smooth_reject_b
    c2a_admit_empty = (type_bf == 1) & smooth_reject_b
    mf_c2a_snap = seg_ref_clip(jnp.int32(0), ibf, jnp.bool_(True))
    mf_c2a = _select(c2a_admit, mf_face_b,
                     _select(c2a_skip | c2a_admit_empty, _empty(), mf_c2a_snap))

    # cache count 2, distinct A vertices (segment is reference):
    mf_c2b = seg_ref_clip(inc_idx_2, jnp.int32(0), jnp.bool_(False))

    mf_sep = _select(d.cache_count == 1, mf_c1,
                     _select(same_a, mf_c2a, mf_c2b))

    # deep path selections
    mf_deep_face = _select(smooth_reject_deep, _empty(), mf_face_deep)
    mf_deep_seg = _select(ghost_best, _empty(),
                          seg_ref_clip(inc_idx_deep, jnp.int32(0), jnp.bool_(False)))
    mf_deep = _select(use_poly_face, mf_deep_face, mf_deep_seg)

    mf = _select(sep_path, mf_sep, mf_deep)
    mf = _finalize(mf, p_a, q_a, p_b)
    ok = ~fully_behind & ~out_of_range
    return _select(ok, mf, _empty())
