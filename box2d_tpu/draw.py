"""Debug-draw data extraction (ref: include/Types.cs:1007-1061 DebugDraw +
api/World.cs:116-280 WorldAPI.Draw).

The reference renders through user callbacks; here `draw_data` returns plain
NumPy arrays a renderer (matplotlib, a game engine, a notebook) can consume —
the callback-free analog. Colors encode body state like the reference's
default palette (static/kinematic/dynamic/sleeping).
"""

from __future__ import annotations

import numpy as np

from . import geometry as g
from . import math2d as m
from .state import KINEMATIC, STATIC, WorldState


def draw_data(state: WorldState, color_by: str = "state") -> dict:
    """Extract renderable primitives from the current state.

    color_by: "state" (static/kinematic/dynamic/sleeping palette, the
    reference's default), "island" (per-island hues, ref DebugDraw
    drawIslands), or "graph_color" (per-constraint-graph-color hues on
    touching contacts' bodies, ref ContactSolver color visualization).

    Returns a dict with:
      polygons: list of (verts (k,2), color)
      circles:  list of ((cx, cy), radius, color)
      capsules: list of ((p1, p2), radius, color)
      segments: list of ((p1, p2), color)
      particles: (positions (n,2), colors (n,4)) or None
      joints: list of ((pa, pb), color)
    """
    sh = state.shapes
    b = state.bodies
    origin = np.asarray(b.origin)
    rot = np.asarray(b.rot)
    verts = np.asarray(sh.verts)
    counts = np.asarray(sh.count)
    radius = np.asarray(sh.radius)
    stype = np.asarray(sh.type)
    body = np.asarray(sh.body)
    enabled = np.asarray(sh.enabled)
    btype = np.asarray(b.type)
    awake = np.asarray(b.awake)

    def hue(k):
        # golden-ratio hue walk: distinct colors for any index
        h = (0.618033988749895 * (k + 1)) % 1.0
        i = int(h * 6)
        f = h * 6 - i
        q, t_ = 0.35 + 0.65 * (1 - f), 0.35 + 0.65 * f
        rgb = [(1, t_, .35), (q, 1, .35), (.35, 1, t_),
               (.35, q, 1), (t_, .35, 1), (1, .35, q)][i % 6]
        return (*rgb, 1.0)

    if color_by == "island":
        labels = np.asarray(b.island_label)

        def body_color(bi):
            if btype[bi] == STATIC:
                return (0.5, 0.9, 0.5, 1.0)
            if not awake[bi]:
                return (0.6, 0.6, 0.6, 1.0)
            return hue(int(labels[bi]))
    elif color_by == "graph_color":
        # color each body by the max graph color among its stored touching
        # contacts (-1 = uncolored: grey)
        cs = state.contacts
        ka = np.asarray(cs.key_a)
        col = np.asarray(cs.color)
        touching = np.asarray(cs.touching)
        sh_body = np.asarray(state.shapes.body)
        body_gc = np.full(btype.shape[0], -1)
        for slot in np.where((ka >= 0) & touching & (col >= 0))[0]:
            for sid in (int(ka[slot]), int(np.asarray(cs.key_b)[slot])):
                bi = int(sh_body[sid])
                body_gc[bi] = max(body_gc[bi], int(col[slot]))

        def body_color(bi):
            if btype[bi] == STATIC:
                return (0.5, 0.9, 0.5, 1.0)
            if body_gc[bi] < 0:
                return (0.6, 0.6, 0.6, 1.0)
            return hue(int(body_gc[bi]))
    else:
        def body_color(bi):
            if btype[bi] == STATIC:
                return (0.5, 0.9, 0.5, 1.0)
            if btype[bi] == KINEMATIC:
                return (0.5, 0.5, 0.9, 1.0)
            if not awake[bi]:
                return (0.6, 0.6, 0.6, 1.0)
            return (0.9, 0.7, 0.7, 1.0)

    out = {"polygons": [], "circles": [], "capsules": [], "segments": [],
           "particles": None, "joints": []}
    for i in range(len(stype)):
        if not enabled[i]:
            continue
        bi = body[i]
        c, s = rot[bi]
        R = np.array([[c, -s], [s, c]], np.float32)
        w = verts[i, : counts[i]] @ R.T + origin[bi]
        col = body_color(bi)
        if stype[i] == g.CIRCLE:
            out["circles"].append((w[0], float(radius[i]), col))
        elif stype[i] == g.CAPSULE:
            out["capsules"].append(((w[0], w[1]), float(radius[i]), col))
        elif stype[i] in (g.SEGMENT, g.CHAIN_SEGMENT):
            out["segments"].append(((w[0], w[1]), col))
        else:
            out["polygons"].append((w, col))

    jn = state.joints
    jtype = np.asarray(jn.type)
    for j in range(len(jtype)):
        if jtype[j] < 0 or not bool(np.asarray(jn.enabled)[j]):
            continue
        ba, bb = int(jn.body_a[j]), int(jn.body_b[j])
        pa = origin[ba] + np.asarray(
            m.rot_vec(rot[ba], np.asarray(jn.frame_a_p)[j]))
        pb = origin[bb] + np.asarray(
            m.rot_vec(rot[bb], np.asarray(jn.frame_b_p)[j]))
        out["joints"].append(((pa, pb), (0.9, 0.8, 0.3, 1.0)))

    if state.particles is not None:
        alive = np.asarray(state.particles.alive)
        out["particles"] = (np.asarray(state.particles.pos)[alive],
                            np.asarray(state.particles.color)[alive])
    return out


def render_matplotlib(state: WorldState, ax=None, xlim=None, ylim=None):
    """Optional matplotlib renderer over draw_data (for notebooks/tests)."""
    import matplotlib.patches as patches
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(figsize=(8, 6))
    d = draw_data(state)
    for w, col in d["polygons"]:
        ax.add_patch(patches.Polygon(w, closed=True, facecolor=col,
                                     edgecolor="k", linewidth=0.5))
    for c, r, col in d["circles"]:
        ax.add_patch(patches.Circle(c, r, facecolor=col, edgecolor="k",
                                    linewidth=0.5))
    for (p1, p2), r, col in d["capsules"]:
        ax.plot([p1[0], p2[0]], [p1[1], p2[1]], color=col, linewidth=r * 72)
    for (p1, p2), col in d["segments"]:
        ax.plot([p1[0], p2[0]], [p1[1], p2[1]], color="k", linewidth=1.0)
    for (p1, p2), col in d["joints"]:
        ax.plot([p1[0], p2[0]], [p1[1], p2[1]], color=col, linewidth=1.0)
    if d["particles"] is not None:
        pos, cols = d["particles"]
        ax.scatter(pos[:, 0], pos[:, 1], s=2, c=cols)
    ax.set_aspect("equal")
    if xlim:
        ax.set_xlim(*xlim)
    if ylim:
        ax.set_ylim(*ylim)
    return ax
