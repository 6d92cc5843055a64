"""L0 math core: 2D vector / rotation / transform algebra on JAX arrays.

Behavioral counterpart of the reference math layer (ref:
include/MathFunctions.cs:7-338), re-designed array-first: every function is
shape-polymorphic over leading batch dimensions so the same code serves a
single value, a shape array, or a vmapped batch of worlds.

Conventions
-----------
- A *vector* is an array whose trailing dimension is 2: ``(..., 2)``.
- A *rotation* is an array ``(..., 2)`` holding ``(cos, sin)`` — the complex
  number representation the reference uses (ref: MathFunctions.cs:96-170).
- A *transform* is a pair ``(p, q)`` of a translation vector and a rotation.
  We pass the two arrays separately; there is no wrapper object because
  pytrees of plain arrays compose best with vmap/jit/sharding.
- All math is float32. Physics state never touches bfloat16: the solver is
  bandwidth-light and accuracy-critical, and the VPU runs f32 at full rate.
"""

from __future__ import annotations

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# vectors
# ---------------------------------------------------------------------------


def vec2(x, y) -> jnp.ndarray:
    """Build an (..., 2) vector from components."""
    return jnp.stack(jnp.broadcast_arrays(jnp.float32(x), jnp.float32(y)), axis=-1)


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dot product (ref: MathFunctions.cs Vector2.Dot)."""
    return a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """2D cross product a x b -> scalar (ref: Vector2.Cross)."""
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def cross_sv(s: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Scalar x vector: s x v = (-s*v.y, s*v.x) (ref: Vector2.CrossSV)."""
    return jnp.stack([-s * v[..., 1], s * v[..., 0]], axis=-1)


def cross_vs(v: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Vector x scalar: v x s = (s*v.y, -s*v.x)."""
    return jnp.stack([s * v[..., 1], -s * v[..., 0]], axis=-1)


def left_perp(v: jnp.ndarray) -> jnp.ndarray:
    """Counter-clockwise perpendicular (-y, x) (ref: Vector2.LeftPerp)."""
    return jnp.stack([-v[..., 1], v[..., 0]], axis=-1)


def right_perp(v: jnp.ndarray) -> jnp.ndarray:
    """Clockwise perpendicular (y, -x) (ref: Vector2.RightPerp)."""
    return jnp.stack([v[..., 1], -v[..., 0]], axis=-1)


def length(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(dot(v, v))


def length_squared(v: jnp.ndarray) -> jnp.ndarray:
    return dot(v, v)


def distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return length(b - a)


def distance_squared(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return length_squared(b - a)


def normalize(v: jnp.ndarray) -> jnp.ndarray:
    """Safe normalize: returns 0 for zero-length input (ref: Vector2.Normalize)."""
    ln = length(v)
    inv = jnp.where(ln > 0.0, 1.0 / jnp.where(ln > 0.0, ln, 1.0), 0.0)
    return v * inv[..., None]


def get_length_and_normalize(v: jnp.ndarray):
    """Return (unit, length) with 0-safe handling (ref: GetLengthAndNormalize)."""
    ln = length(v)
    inv = jnp.where(ln > 0.0, 1.0 / jnp.where(ln > 0.0, ln, 1.0), 0.0)
    return v * inv[..., None], ln


def lerp(a: jnp.ndarray, b: jnp.ndarray, t) -> jnp.ndarray:
    """a + (b - a) * t; a per-element t broadcasts over the vector dim."""
    t = jnp.asarray(t, a.dtype)
    if t.ndim == a.ndim - 1:
        t = t[..., None]
    return a + (b - a) * t


def mul_add(a: jnp.ndarray, s, b: jnp.ndarray) -> jnp.ndarray:
    """a + s * b (ref: Vector2.MulAdd)."""
    s = jnp.asarray(s, a.dtype)
    return a + (s[..., None] if s.ndim == a.ndim - 1 else s) * b


def mul_sub(a: jnp.ndarray, s, b: jnp.ndarray) -> jnp.ndarray:
    """a - s * b (ref: Vector2.MulSub)."""
    s = jnp.asarray(s, a.dtype)
    return a - (s[..., None] if s.ndim == a.ndim - 1 else s) * b


def clamp_vec(v: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(v, lo, hi)


# ---------------------------------------------------------------------------
# rotations: (..., 2) = (cos, sin)
# ---------------------------------------------------------------------------

def rot_identity(shape=()) -> jnp.ndarray:
    q = jnp.zeros(shape + (2,), jnp.float32)
    return q.at[..., 0].set(1.0)


def rot_from_angle(radians) -> jnp.ndarray:
    radians = jnp.asarray(radians, jnp.float32)
    return jnp.stack([jnp.cos(radians), jnp.sin(radians)], axis=-1)


def rot_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Angle in [-pi, pi] (ref: Rotation.GetAngle)."""
    return jnp.arctan2(q[..., 1], q[..., 0])


def rot_normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Renormalize a rotation (ref: Rotation.Normalize)."""
    mag = jnp.sqrt(q[..., 0] * q[..., 0] + q[..., 1] * q[..., 1])
    inv = jnp.where(mag > 0.0, 1.0 / jnp.where(mag > 0.0, mag, 1.0), 0.0)
    return q * inv[..., None]


def rot_integrate(q: jnp.ndarray, delta_angle: jnp.ndarray) -> jnp.ndarray:
    """Exponential-map integration then renormalize (ref: Rotation.Integrate).

    q2 = (c - da*s, s + da*c), normalized.
    """
    c, s = q[..., 0], q[..., 1]
    q2 = jnp.stack([c - delta_angle * s, s + delta_angle * c], axis=-1)
    return rot_normalize(q2)


def rot_nlerp(q1: jnp.ndarray, q2: jnp.ndarray, t) -> jnp.ndarray:
    """Normalized lerp between rotations (ref: Rotation.NLerp)."""
    t = jnp.asarray(t, jnp.float32)
    q = q1 + (q2 - q1) * (t[..., None] if t.ndim == q1.ndim - 1 else t)
    return rot_normalize(q)


def rot_mul(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """q * r (ref: Rotation.operator*)."""
    qc, qs = q[..., 0], q[..., 1]
    rc, rs = r[..., 0], r[..., 1]
    return jnp.stack([qc * rc - qs * rs, qs * rc + qc * rs], axis=-1)


def rot_inv_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """inv(a) * b (ref: Rotation.InvMulRot)."""
    ac, as_ = a[..., 0], a[..., 1]
    bc, bs = b[..., 0], b[..., 1]
    return jnp.stack([ac * bc + as_ * bs, ac * bs - as_ * bc], axis=-1)


def rot_vec(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate a vector (ref: Rotation.operator* (vec))."""
    c, s = q[..., 0], q[..., 1]
    return jnp.stack([c * v[..., 0] - s * v[..., 1], s * v[..., 0] + c * v[..., 1]], axis=-1)


def inv_rot_vec(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Inverse-rotate a vector (ref: Rotation.InvRotateVector)."""
    c, s = q[..., 0], q[..., 1]
    return jnp.stack([c * v[..., 0] + s * v[..., 1], -s * v[..., 0] + c * v[..., 1]], axis=-1)


def relative_angle(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Angle of inv(a)*b in [-pi, pi] (ref: Rotation.RelativeAngle)."""
    return jnp.arctan2(
        a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
        a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1],
    )


def unwind_angle(radians: jnp.ndarray) -> jnp.ndarray:
    """Map any angle into [-pi, pi) (ref: Rotation.UnwindAngle)."""
    two_pi = jnp.float32(2.0 * jnp.pi)
    return jnp.mod(radians + jnp.float32(jnp.pi), two_pi) - jnp.float32(jnp.pi)


# ---------------------------------------------------------------------------
# transforms: pair (p: (...,2), q: (...,2))
# ---------------------------------------------------------------------------

def transform_point(p: jnp.ndarray, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Local -> world (ref: Transform.TransformPoint)."""
    return rot_vec(q, v) + p


def inv_transform_point(p: jnp.ndarray, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """World -> local (ref: Transform.InvTransformPoint)."""
    return inv_rot_vec(q, v - p)


def mul_transforms(pa, qa, pb, qb):
    """Compose: (A*B) (ref: Transform.operator*)."""
    return rot_vec(qa, pb) + pa, rot_mul(qa, qb)


def inv_mul_transforms(pa, qa, pb, qb):
    """inv(A)*B: converts frame-B-local points into frame-A-local points
    (ref: Transform.InvMulTransforms)."""
    return inv_rot_vec(qa, pb - pa), rot_inv_mul(qa, qb)


# ---------------------------------------------------------------------------
# 2x2 systems (ref: Mat22.Solve) — stored as 4 scalars for batching
# ---------------------------------------------------------------------------

def solve22(a11, a12, a21, a22, bx, by):
    """Solve [[a11,a12],[a21,a22]] x = b; returns 0 when singular."""
    det = a11 * a22 - a12 * a21
    inv_det = jnp.where(det != 0.0, 1.0 / jnp.where(det != 0.0, det, 1.0), 0.0)
    x = inv_det * (a22 * bx - a12 * by)
    y = inv_det * (a11 * by - a21 * bx)
    return x, y


# ---------------------------------------------------------------------------
# AABBs: (..., 4) = (lo_x, lo_y, hi_x, hi_y)
# ---------------------------------------------------------------------------

def aabb(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([lo, hi], axis=-1)


def aabb_center(b: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (b[..., :2] + b[..., 2:])


def aabb_extents(b: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (b[..., 2:] - b[..., :2])


def aabb_union(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate(
        [jnp.minimum(a[..., :2], b[..., :2]), jnp.maximum(a[..., 2:], b[..., 2:])], axis=-1
    )


def aabb_contains(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Does a contain b (ref: AABB.Contains)."""
    return (
        (a[..., 0] <= b[..., 0])
        & (a[..., 1] <= b[..., 1])
        & (b[..., 2] <= a[..., 2])
        & (b[..., 3] <= a[..., 3])
    )


def aabb_overlaps(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Boolean AABB overlap test (ref: AABB.Overlaps)."""
    return (
        (a[..., 0] <= b[..., 2])
        & (b[..., 0] <= a[..., 2])
        & (a[..., 1] <= b[..., 3])
        & (b[..., 1] <= a[..., 3])
    )


def aabb_perimeter(b: jnp.ndarray) -> jnp.ndarray:
    return 2.0 * ((b[..., 2] - b[..., 0]) + (b[..., 3] - b[..., 1]))


# ---------------------------------------------------------------------------
# implicit 1-D spring-damper (ref: MathFunctions.cs:317-322 SpringDamper)
# ---------------------------------------------------------------------------

def spring_damper(hertz, damping_ratio, c, v, h):
    """Implicitly integrate one spring-damper DOF; returns new velocity."""
    omega = 2.0 * jnp.pi * hertz
    zeta = damping_ratio
    # implicit: v' = (v - h*omega*omega*c) / (1 + h*(2*zeta*omega + h*omega*omega))
    return (v - h * omega * omega * c) / (1.0 + h * (2.0 * zeta * omega + h * omega * omega))


# ---------------------------------------------------------------------------
# soft-constraint parameters (ref: src/Solver.cs:10-26 Softness)
# ---------------------------------------------------------------------------

def softness(hertz, zeta, h):
    """Return (bias_rate, mass_scale, impulse_scale) for the TGS-soft solver.

    Zero hertz disables the bias entirely (rigid in relax-only mode), matching
    the reference constructor's early-out (ref: src/Solver.cs:17).
    """
    hertz = jnp.asarray(hertz, jnp.float32)
    omega = 2.0 * jnp.pi * hertz
    a1 = 2.0 * zeta + h * omega
    a2 = h * omega * a1
    a3 = 1.0 / (1.0 + a2)
    safe = hertz != 0.0
    a1_safe = jnp.where(a1 != 0.0, a1, 1.0)
    bias_rate = jnp.where(safe, omega / a1_safe, 0.0)
    mass_scale = jnp.where(safe, a2 * a3, 0.0)
    impulse_scale = jnp.where(safe, a3, 0.0)
    return bias_rate, mass_scale, impulse_scale
