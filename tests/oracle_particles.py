"""Scalar NumPy transliteration of the reference LiquidFun water pipeline.

Sources (ref: /root/reference/particle/ParticleSystem.cs):
- contacts/window scan + weight formula  AddContact :1082-1095
- body contacts                          UpdateBodyContacts :1418-1494
- ComputeWeight :1787-1806
- SolveGravity :1648-1659
- SolvePressure :1807-1879
- SolveDamping :1880-1915
- LimitVelocity :1625-1647
- SolveCollision :1565-1624
- Solve loop order :1512-1564 (dt /= iterations)

Two documented deviations shared with the engine (box2d_tpu/particles.py
header):
- particle-body distance is measured to the shape SURFACE with negative
  inside-depth (upstream LiquidFun b2Shape::ComputeDistance semantics);
  the C# port's GJK-without-radii (:1452-1460) measures to the core
  skeleton and returns 0 inside.
- SolveCollision does not re-apply the removed momentum as a force
  (ref :1618 ParticleApplyForce); the engine absorbs it (stable against
  static walls, see particles._solve_barrier docstring).

Constants (ref: particle/World.cs:8-45): stride 0.75, min weight 1.0,
max pressure 0.25, linear slop 0.005.
"""

import numpy as np

F = np.float32


class PWorld:
    """Static boxes only (the oracle models the particle solver, not the
    rigid solver): each box is (center (2,), half (2,))."""

    def __init__(self, boxes, gravity=(0.0, -10.0), radius=0.05,
                 density=1.0, pressure_strength=0.05, damping_strength=1.0):
        self.boxes = [(np.asarray(c, F), np.asarray(h, F)) for c, h in boxes]
        self.gravity = np.asarray(gravity, F)
        self.radius = F(radius)
        self.density = F(density)
        self.pressure_strength = F(pressure_strength)
        self.damping_strength = F(damping_strength)

    # point-box signed distance + outward normal (negative inside)
    def _box_distance(self, p, c, h):
        q = p - c
        dx, dy = abs(q[0]) - h[0], abs(q[1]) - h[1]
        sx = F(1.0) if q[0] >= 0 else F(-1.0)
        sy = F(1.0) if q[1] >= 0 else F(-1.0)
        if dx > 0 or dy > 0:   # outside: euclidean to the surface
            ox, oy = max(dx, F(0)), max(dy, F(0))
            d = F(np.hypot(ox, oy))
            if d > 0:
                n = np.array([sx * ox, sy * oy], F) / d
            else:
                n = np.array([0.0, 1.0], F)
            return d, n
        # inside: deepest face
        if dx > dy:
            return dx, np.array([sx, 0.0], F)
        return dy, np.array([0.0, sy], F)

    def _ray_box(self, p1, d, c, h):
        """Slab raycast, fraction in [0,1]; returns (hit, frac, normal)."""
        lo, hi = F(0.0), F(1.0)
        n = np.zeros(2, F)
        for ax in range(2):
            o = p1[ax] - c[ax]
            if abs(d[ax]) < 1e-12:
                if abs(o) > h[ax]:
                    return False, F(0), n
                continue
            inv = F(1.0) / d[ax]
            t1, t2 = (-h[ax] - o) * inv, (h[ax] - o) * inv
            sgn = F(-1.0)
            if t1 > t2:
                t1, t2 = t2, t1
                sgn = F(1.0)
            if t1 > lo:
                lo = t1
                n = np.zeros(2, F)
                n[ax] = sgn
            hi = min(hi, t2)
            if lo > hi:
                return False, F(0), n
        if lo <= 0.0 or not n.any():   # starts inside or no entering face
            return False, F(0), n
        return True, lo, n

    def step(self, pos, vel, dt, iterations=4):
        """One frame (ref Solve :1512-1564). Mutates and returns pos, vel."""
        dt = F(dt) / iterations
        inv_dt = F(1.0) / dt
        n = pos.shape[0]
        diameter = F(2.0) * self.radius
        inv_d = F(1.0) / diameter
        crit_v = diameter * inv_dt                      # GetCriticalVelocity
        crit_v2 = crit_v * crit_v
        crit_p = self.density * crit_v2                 # GetCriticalPressure
        mass = self.density * self.radius * self.radius * F(np.pi)
        inv_mass = F(1.0) / mass

        for _ in range(iterations):
            # --- contacts (ref AddContact :1082-1095) ---
            pairs = []
            for i in range(n):
                diff = pos[i + 1:] - pos[i]
                d2 = (diff ** 2).sum(1)
                for jj in np.nonzero(d2 < diameter * diameter)[0]:
                    j = i + 1 + int(jj)
                    dd = F(d2[jj])
                    invdist = F(1.0 / np.sqrt(dd)) if dd > 0 else F(0)
                    w = F(1.0) - dd * invdist * inv_d
                    nrm = (diff[jj] * invdist).astype(F)
                    pairs.append((i, j, w, nrm))
            # --- body contacts (ref :1442-1482; weight 1 - d*2/diameter) ---
            bcs = []
            for i in range(n):
                for c, h in self.boxes:
                    d, nrm = self._box_distance(pos[i], c, h)
                    if d < self.radius:
                        w = F(1.0) - d * inv_d * F(2.0)
                        # static body: invM = particle inverse mass only
                        m_c = F(1.0) / inv_mass
                        bcs.append((i, -nrm, m_c, w))
            # --- weight (ref ComputeWeight) ---
            weight = np.zeros(n, F)
            for i, nrm, m_c, w in bcs:
                weight[i] += w
            for i, j, w, nrm in pairs:
                weight[i] += w
                weight[j] += w
            # --- gravity (ref SolveGravity) ---
            vel += (dt * self.gravity).astype(F)
            # --- pressure (ref SolvePressure) ---
            ppw = self.pressure_strength * crit_p
            maxp = F(0.25) * crit_p                     # MaxParticlePressure
            accum = np.minimum(ppw * np.maximum(0.0, weight - F(1.0)),
                               maxp).astype(F)
            vpp = dt * (F(1.0) / self.density) * inv_d
            for i, nrm, m_c, w in bcs:
                f = (vpp * w * m_c * (accum[i] + ppw * w)) * nrm
                vel[i] -= inv_mass * f
            for i, j, w, nrm in pairs:
                f = (vpp * w * (accum[i] + accum[j])) * nrm
                vel[i] -= f
                vel[j] += f
            # --- damping (ref SolveDamping) ---
            lin_d = self.damping_strength
            quad_d = F(1.0) / crit_v
            for i, nrm, m_c, w in bcs:
                vn = F(-(vel[i] @ nrm))                 # static body v = 0
                if vn < 0:
                    damping = max(lin_d * w, min(-quad_d * vn, F(0.5)))
                    f = (damping * m_c * vn) * nrm
                    vel[i] += inv_mass * f
            for i, j, w, nrm in pairs:
                vn = F((vel[j] - vel[i]) @ nrm)
                if vn < 0:
                    f = (max(lin_d * w, min(-quad_d * vn, F(0.5))) * vn) * nrm
                    vel[i] += f
                    vel[j] -= f
            # --- limit velocity (ref LimitVelocity) ---
            for i in range(n):
                v2 = F(vel[i] @ vel[i])
                if v2 > crit_v2:
                    vel[i] *= F(np.sqrt(crit_v2 / v2))
            # --- collision (ref SolveCollision, deviation: no force re-add)
            for i in range(n):
                best = (False, F(np.inf), None)
                for c, h in self.boxes:
                    hit, frac, nrm = self._ray_box(pos[i], dt * vel[i], c, h)
                    if hit and frac < best[1]:
                        best = (True, frac, nrm)
                if best[0]:
                    target = (pos[i] + best[1] * dt * vel[i]
                              + F(0.005) * best[2])     # ParticleLinearSlop
                    vel[i] = (inv_dt * (target - pos[i])).astype(F)
            # --- integrate (ref :1554-1561) ---
            pos += (dt * vel).astype(F)
        return pos, vel
