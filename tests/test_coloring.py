"""Direct unit tests for coloring.repair_colors.

ADVICE r4: the two-tier repair buffer (512-lane fast tier vs full-width
tier) holds equivalence by construction (identical compaction positions and
priorities) — these tests pin that down so a future edit to pri_of/midx
can't silently make tier choice affect output.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from box2d_tpu.coloring import repair_colors

jax.config.update("jax_platforms", "cpu")


def _chain(n_constraints, nb):
    """Chain graph: constraint i links bodies (i, i+1) — adjacent conflicts."""
    ba = jnp.arange(n_constraints, dtype=jnp.int32) % (nb - 1)
    bb = ba + 1
    return ba, bb


def _assert_conflict_free(ba, bb, active, colors, body_type):
    ba = np.asarray(ba)
    bb = np.asarray(bb)
    act = np.asarray(active)
    col = np.asarray(colors)
    dyn = np.asarray(body_type) == 2
    seen = {}
    for i in range(len(ba)):
        if not act[i] or col[i] < 0:
            continue
        for b in (ba[i], bb[i]):
            if dyn[b]:
                key = (int(b), int(col[i]))
                assert key not in seen, (
                    f"body {b} has two constraints of color {col[i]}: "
                    f"{seen[key]} and {i}")
                seen[key] = i


@pytest.mark.parametrize("n_todo", [500, 511, 512, 513, 600])
def test_two_tier_boundary_matches_wide(n_todo):
    """n_todo below/at/above the 512-lane fast tier: the tier the cond picks
    must produce the same colors as a forced wide-tier run, and both must be
    conflict-free."""
    N = 1024
    nb = N + 2
    ba, bb = _chain(N, nb)
    body_type = jnp.full(nb, 2, jnp.int32)
    active = jnp.arange(N) < n_todo
    reserved = jnp.zeros(N, bool)
    prev = jnp.full(N, -1, jnp.int32)

    kw = dict(body_type=body_type, num_bodies=nb, max_colors=24,
              repair_cap=1024, color_cap=N)
    tiered = repair_colors(ba, bb, active, reserved, prev,
                           two_tier=True, **kw)
    wide = repair_colors(ba, bb, active, reserved, prev,
                         two_tier=False, **kw)
    assert np.array_equal(np.asarray(tiered), np.asarray(wide)), (
        f"tier choice changed colors at n_todo={n_todo}")
    _assert_conflict_free(ba, bb, active, tiered, body_type)


def test_two_tier_with_inherited_colors():
    """Fast tier must respect used-color masks built from inherited colors:
    pre-color half the chain, repair the rest, assert no conflicts and
    inherited lanes untouched."""
    N = 1024
    nb = N + 2
    ba, bb = _chain(N, nb)
    body_type = jnp.full(nb, 2, jnp.int32)
    active = jnp.ones(N, bool)
    reserved = jnp.zeros(N, bool)
    # alternate colors 0/1 on even lanes (a valid chain coloring), odd todo
    prev = jnp.where(jnp.arange(N) % 2 == 0,
                     (jnp.arange(N) // 2) % 2, -1).astype(jnp.int32)
    out = repair_colors(ba, bb, active, reserved, prev,
                        body_type=body_type, num_bodies=nb, max_colors=24,
                        repair_cap=1024, color_cap=N, two_tier=True)
    out = np.asarray(out)
    prev_np = np.asarray(prev)
    keep = prev_np >= 0
    assert np.array_equal(out[keep], prev_np[keep]), "inherited colors moved"
    assert np.all(out >= 0), "chain must color fully (degree 2 << 24 colors)"
    _assert_conflict_free(ba, bb, active, out, body_type)
