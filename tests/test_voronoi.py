"""Voronoi-based elastic triad connectivity (ref: particle/VoronoiDiagram.cs
+ UpdatePairsAndTriads :827-861)."""

import numpy as np
import pytest

from box2d_tpu.native import build_triads_native

STRIDE = 0.075
DIAMETER = STRIDE / 0.75


def _grid(nx, ny, jitter=0.0, seed=3):
    rng = np.random.default_rng(seed)
    g = np.stack(np.meshgrid(np.arange(nx), np.arange(ny)), -1)
    pts = g.reshape(-1, 2).astype(np.float64) * STRIDE
    if jitter:
        pts = pts + rng.uniform(-jitter, jitter, pts.shape)
    return pts.astype(np.float32)


def _check_triads(pts, tri, rest):
    n = len(pts)
    assert len({tuple(sorted(t)) for t in tri}) == len(tri), "duplicates"
    for (a, b, c) in tri:
        assert 0 <= a < n and 0 <= b < n and 0 <= c < n
        assert len({a, b, c}) == 3
        for u, v in ((a, b), (b, c), (c, a)):
            # ref: MaxTriadDistance = 2 diameters
            assert np.hypot(*(pts[u] - pts[v])) <= 2 * DIAMETER + 1e-6
    assert np.abs(rest.sum(1)).max() < 1e-5, "rest offsets not centered"


def test_voronoi_triads_regular_grid():
    pts = _grid(5, 5)
    res = build_triads_native(pts, STRIDE)
    if res is None:
        pytest.skip("native core unavailable")
    tri, rest = res
    assert len(tri) >= 20
    _check_triads(pts, tri, rest)


def test_voronoi_triads_irregular_fill():
    """Jittered and hole-punched fills — where the Voronoi diagram differs
    from a grid triangulation — still yield a connected, deduped triad set."""
    pts = _grid(8, 8, jitter=0.015)
    keep = np.ones(len(pts), bool)
    keep[[9, 27, 35]] = False          # punch holes
    pts = pts[keep]
    res = build_triads_native(pts, STRIDE)
    if res is None:
        pytest.skip("native core unavailable")
    tri, rest = res
    _check_triads(pts, tri, rest)
    # every interior particle participates in at least one triad
    used = np.zeros(len(pts), bool)
    for t in tri:
        used[list(t)] = True
    assert used.mean() > 0.9


def test_voronoi_triads_two_far_clusters_not_connected():
    a = _grid(3, 3)
    b = _grid(3, 3) + np.float32(10.0)   # far beyond 2*diameter
    pts = np.concatenate([a, b])
    res = build_triads_native(pts, STRIDE)
    if res is None:
        pytest.skip("native core unavailable")
    tri, _ = res
    for t in tri:
        sides = {int(i) >= len(a) for i in t}
        assert len(sides) == 1, "triad spans disconnected clusters"
