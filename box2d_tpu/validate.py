"""State-invariant validation — the B2_VALIDATE analog.

The reference compiles `ValidateConnectivity` / `ValidateSolverSets` /
`ValidateContacts` (ref: src/World.cs:457-753) behind B2_VALIDATE and walks
its pointer graph. Here the state is dense masked arrays, so validation is a
host-side sweep over the same invariants:

- entity cross-references stay in range and point at live lanes;
- mass data is consistent with body type (static/kinematic have no inverse
  mass/inertia, dynamic bodies' mass * inv_mass == 1);
- everything is finite and rotations are unit;
- sleeping dynamic bodies hold zero velocity;
- the constraint-graph coloring invariant: no two same-color live
  constraints (touching contacts + enabled joints) share a dynamic body
  (ref: src/ConstraintGraph.cs per-color body bitsets);
- island labels respect the min-label property (label <= own id);
- the runtime free lists only hold disabled lanes.

`validate_world` returns a list of violation strings (empty == valid);
`World.validate()` raises on the first batch of violations.
"""

from __future__ import annotations

import numpy as np


def _check(out, cond, msg):
    if not cond:
        out.append(msg)


def validate_world(world) -> list[str]:
    """Validate a compiled World's state. Returns violations (empty = ok)."""
    st = world.state
    out: list[str] = []
    b = st.bodies
    sh = st.shapes
    jn = st.joints
    cs = st.contacts

    btype = np.asarray(b.type)
    ben = np.asarray(b.enabled)
    awake = np.asarray(b.awake)
    nb = btype.shape[0]
    center = np.asarray(b.center)
    rot = np.asarray(b.rot)
    v = np.asarray(b.v)
    w_ = np.asarray(b.w)
    inv_m = np.asarray(b.inv_mass)
    inv_i = np.asarray(b.inv_inertia)
    mass = np.asarray(b.mass)

    # --- finiteness + unit rotations (ref: Debug.Assert normalization) ----
    _check(out, np.all(np.isfinite(center[ben])), "non-finite body center")
    _check(out, np.all(np.isfinite(v[ben])), "non-finite body velocity")
    rn = np.hypot(rot[:, 0], rot[:, 1])
    bad_rot = ben & (np.abs(rn - 1.0) > 1e-3)
    _check(out, not np.any(bad_rot),
           f"non-unit rotation on bodies {np.nonzero(bad_rot)[0][:8]}")

    # --- mass data vs type (ref: src/Body.cs:255-353) ---------------------
    nondyn = ben & (btype != 2)
    _check(out, np.all(inv_m[nondyn] == 0.0),
           "static/kinematic body with nonzero inv_mass")
    _check(out, np.all(inv_i[nondyn] == 0.0),
           "static/kinematic body with nonzero inv_inertia")
    dyn = ben & (btype == 2)
    has_m = dyn & (inv_m > 0)
    _check(out, np.allclose(mass[has_m] * inv_m[has_m], 1.0, atol=1e-4),
           "dynamic body mass * inv_mass != 1")

    # --- sleeping bodies are frozen (ref: SolverSet sleep semantics) ------
    asleep = dyn & ~awake
    _check(out, np.all(v[asleep] == 0.0) and np.all(w_[asleep] == 0.0),
           "sleeping dynamic body with nonzero velocity")

    # --- island min-label property (sleep.py: labels seed from body ids
    # and only merge downward) --------------------------------------------
    labels = np.asarray(b.island_label)
    _check(out, np.all(labels[dyn] <= np.nonzero(dyn)[0])
           if np.any(dyn) else True,
           "island label above its body id (min-label violated)")

    # --- shapes reference valid bodies ------------------------------------
    sbody = np.asarray(sh.body)
    sen = np.asarray(sh.enabled)
    _check(out, np.all((sbody[sen] >= 0) & (sbody[sen] < nb)),
           "enabled shape references out-of-range body")
    cnt = np.asarray(sh.count)
    _check(out, np.all(cnt[sen] >= 1), "enabled shape with zero vertices")

    # --- joints -----------------------------------------------------------
    jen = np.asarray(jn.enabled) & (np.asarray(jn.type) >= 0)
    ja = np.asarray(jn.body_a)
    jb = np.asarray(jn.body_b)
    live_j = jen & (ja >= 0)
    _check(out, np.all((ja[live_j] < nb) & (jb[live_j] >= 0)
                       & (jb[live_j] < nb)),
           "enabled joint references out-of-range body")
    jcol = np.asarray(jn.color)
    _check(out, np.all(jcol[live_j] < world.capacity.max_colors),
           "joint color out of range")

    # --- contact store (lane-aligned cache) -------------------------------
    ka = np.asarray(cs.key_a)
    kb = np.asarray(cs.key_b)
    touching = np.asarray(cs.touching)
    S = np.asarray(sh.type).shape[0]
    live_c = ka >= 0
    _check(out, np.all(ka[live_c] <= kb[live_c]),
           "contact key not canonically ordered (key_a > key_b)")
    _check(out, np.all((kb[live_c] >= 0) & (kb[live_c] < S)),
           "contact key references out-of-range shape")
    _check(out, not np.any(touching & ~live_c),
           "touching contact with invalid key")
    ccol = np.asarray(cs.color)
    _check(out, np.all(ccol < world.capacity.max_colors),
           "contact color out of range")

    # --- constraint-graph coloring invariant (ref: src/ConstraintGraph.cs
    # per-color body bitsets: within a color no dynamic body repeats) ------
    # overflow color (last) is excluded: it is solved with mass-splitting
    # relaxation precisely because it may conflict.
    ovf = world.capacity.max_colors - 1
    seen = {}
    body_of = sbody

    def claim(color, body_lane, what):
        if btype[body_lane] != 2:
            return
        key = (int(color), int(body_lane))
        if key in seen:
            out.append(
                f"color conflict: {what} and {seen[key]} share body "
                f"{body_lane} in color {color}")
        else:
            seen[key] = what

    t_idx = np.nonzero(touching & (ccol >= 0) & (ccol != ovf))[0]
    for i in t_idx:
        claim(ccol[i], body_of[ka[i]], f"contact[{i}]")
        claim(ccol[i], body_of[kb[i]], f"contact[{i}]")
    j_idx = np.nonzero(live_j & (jcol >= 0) & (jcol != ovf))[0]
    for i in j_idx:
        claim(jcol[i], ja[i], f"joint[{i}]")
        claim(jcol[i], jb[i], f"joint[{i}]")

    # --- runtime free lists hold only disabled lanes ----------------------
    if getattr(world, "_free_bodies", None) is not None:
        _check(out, all(not ben[i] for i in world._free_bodies),
               "free body lane is enabled")
        _check(out, all(not sen[i] for i in world._free_shapes),
               "free shape lane is enabled")
        _check(out, all(not (jen[i]) for i in world._free_joints),
               "free joint lane is enabled")

    return out
