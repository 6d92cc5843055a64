"""Constraint-graph coloring via parallel greedy proposal rounds.

TPU-first replacement for the reference's sequential greedy coloring with
per-color body bitsets (ref: src/ConstraintGraph.cs:69-128; 24 colors, 20
reserved for dynamic-dynamic, src/Constants.cs:13,36). The sequential loop
doesn't jit, so instead we run Jones-Plassmann-style rounds: every uncolored
constraint proposes the smallest color not already used on either of its
dynamic bodies (a per-body 32-bit color mask), ties on (body, color) are
broken by a hashed priority (plain index order livelocks on chains), and
winners commit. Each round is a handful of
vectorized ops; a graph of max conflict-degree d colors in O(log n) expected
rounds with at most d+1 colors — the same color count as the reference's
greedy, computed in parallel.

Reference-structure preserved:
- dynamic-dynamic constraints use colors [0, dyn_colors);
- dynamic-static constraints use [dyn_colors, max_colors-1), so static
  contacts solve last within each Gauss-Seidel sweep (less push-through);
- constraints that fit no color go to the overflow color (last), which the
  solver handles with mass-splitting relaxation instead of the reference's
  single-threaded sweep.

Within a color no two constraints share a dynamic body, so the solver's
scatter-adds are conflict-free and the sweep is true Gauss-Seidel.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .state import DYNAMIC


def color_constraints(
    body_a: jnp.ndarray,      # (N,) i32
    body_b: jnp.ndarray,      # (N,) i32
    active: jnp.ndarray,      # (N,) bool
    body_type: jnp.ndarray,   # (Nb,) i32
    num_bodies: int,
    max_colors: int = 24,
    dyn_colors: int = 16,
    rounds: int = 24,
    color_cap: int | None = None,
):
    """Returns (color (N,) i32 densely remapped, overflow_mask, count).

    color_cap bounds the number of constraints per color so the solver can
    process each color as a fixed-size contiguous chunk; full colors stop
    accepting proposals."""
    assert max_colors <= 32
    n = body_a.shape[0]
    assert n < (1 << 16), "hashed priorities support < 65536 constraints"
    idx = jnp.arange(n, dtype=jnp.int32)
    # Deterministic pseudo-random priority (Knuth hash in the high bits,
    # index tie-break in the low bits). Plain index priorities livelock on
    # monotonically-indexed constraint chains (a pyramid row colors ONE
    # contact per round); randomized priorities give dense local minima and
    # O(log n) convergence.
    # 10 hash bits + 16 index bits = 26-bit unique priority, leaving room
    # for a 5-bit color in the packed per-body claim below
    pri_of = (((idx * jnp.int32(-1640531527)) >> 16) & 0x3FF) << 16 | idx
    big = jnp.iinfo(jnp.int32).max
    bit_range = jnp.arange(32, dtype=jnp.int32)

    dyn_a = body_type[body_a] == DYNAMIC
    dyn_b = body_type[body_b] == DYNAMIC
    both_dyn = dyn_a & dyn_b
    slot_a = jnp.where(dyn_a, body_a, num_bodies)
    slot_b = jnp.where(dyn_b, body_b, num_bodies)

    # color search window per constraint (static-last bias)
    lo = jnp.where(both_dyn, 0, dyn_colors)
    hi = jnp.where(both_dyn, dyn_colors, max_colors - 1)

    cap = color_cap if color_cap is not None else n

    def round_fn(carry):
        color, used, counts, _ = carry
        cand = active & (color < 0)
        # full colors are globally forbidden
        full_bits = jnp.sum(
            jnp.where(counts >= cap, 1 << jnp.arange(max_colors), 0))
        forbidden = used[slot_a] | used[slot_b] | full_bits
        free = (
            ((forbidden[:, None] >> bit_range[None, :]) & 1) == 0
        ) & (bit_range[None, :] >= lo[:, None]) & (bit_range[None, :] < hi[:, None])
        has_free = jnp.any(free, axis=1)
        proposal = jnp.argmax(free, axis=1).astype(jnp.int32)
        cand = cand & has_free

        # one packed scatter-min per body: (proposal << 26) | pri(10 high bits
        # truncated). Candidates proposing a higher color than the body's
        # minimum this round simply retry — slightly slower convergence for a
        # 32x smaller scatter (TPU scatters dominate the batched cost).
        pri = jnp.where(cand, (proposal << 26) | pri_of, big)
        claims = jnp.full(num_bodies + 1, big, jnp.int32)
        claims = claims.at[slot_a].min(pri)
        claims = claims.at[slot_b].min(pri)
        win = cand & (~dyn_a | (claims[slot_a] == pri)) \
            & (~dyn_b | (claims[slot_b] == pri))

        # enforce the per-color cap: keep only the first (cap - count) winners
        # of each color this round (ordinal = per-color prefix count)
        seg = jnp.where(win, proposal, max_colors)
        onehots = seg[:, None] == jnp.arange(max_colors)[None, :]
        ordinal = (jnp.cumsum(onehots, axis=0) - 1)[
            jnp.arange(n), jnp.clip(seg, 0, max_colors - 1)]
        room = cap - counts[jnp.clip(seg, 0, max_colors - 1)]
        win = win & (ordinal < room)

        color = jnp.where(win, proposal, color)
        counts = counts + jnp.sum(
            jnp.where(win[:, None], onehots, False), axis=0).astype(jnp.int32)
        bit = jnp.where(win, 1 << proposal, 0)
        used = used.at[slot_a].add(jnp.where(dyn_a, bit, 0))
        used = used.at[slot_b].add(jnp.where(dyn_b, bit, 0))
        # the sentinel lane may accumulate garbage; clear it
        used = used.at[num_bodies].set(0)
        return color, used, counts, jnp.any(cand)

    # early exit once nothing is uncolored (typical scenes: ~8-12 rounds)
    def cond_fn(state):
        i, carry = state
        return (i < rounds) & carry[3]

    def body_fn(state):
        i, carry = state
        return i + 1, round_fn(carry)

    color0 = jnp.full(n, -1, jnp.int32)
    used0 = jnp.zeros(num_bodies + 1, jnp.int32)
    counts0 = jnp.zeros(max_colors, jnp.int32)
    _, (color, _, _, _) = lax.while_loop(
        cond_fn, body_fn,
        (jnp.int32(0), (color0, used0, counts0, jnp.bool_(True))))

    overflow = active & (color < 0)
    color = jnp.where(overflow, max_colors - 1, color)

    color = dense_remap(color, active, max_colors)
    return color, overflow, jnp.sum(overflow).astype(jnp.int32)


def dense_remap(color, active, max_colors):
    """Remap used colors to a dense 0..k range (order-preserving, so dyn-dyn
    still solves before dyn-static and the overflow color stays last); the
    solver then loops only k times.

    Computed with (N, C) one-hot reductions instead of a scatter + gather —
    C is tiny (<=32), so the one-hot math is ~N*C cheap vector ops while the
    scatter/gather pair costs ~2.5 ms at 40k lanes."""
    onehot = (color[:, None] == jnp.arange(max_colors)[None, :]) \
        & active[:, None]
    used_c = jnp.any(onehot, axis=0)
    rank = jnp.cumsum(used_c.astype(jnp.int32)) - 1
    ranked = jnp.sum(jnp.where(onehot, rank[None, :], 0), axis=1)
    return jnp.where(active, ranked, -1)


def repair_colors(
    body_a: jnp.ndarray,      # (N,) i32
    body_b: jnp.ndarray,      # (N,) i32
    active: jnp.ndarray,      # (N,) bool — solved this step
    reserved: jnp.ndarray,    # (N,) bool — prev_color stays claimed even if
    #                           inactive (sleeping touching pairs, idle joints)
    prev_color: jnp.ndarray,  # (N,) i32 raw inherited colors, -1 = none
    body_type: jnp.ndarray,   # (Nb,) i32
    num_bodies: int,
    max_colors: int = 24,
    dyn_colors: int = 16,
    max_rounds: int = 16,
    repair_cap: int = 4096,
    color_cap: int | None = None,
    two_tier: bool = True,
):
    """Incremental constraint-graph coloring — the TPU analog of the
    reference's persistent graph with O(1) contact add/remove
    (ref: src/ConstraintGraph.cs:69-128,135-220).

    Invariant: two constraints that were both live (and hence conflict-free)
    keep their colors, and the live set only changes by insertion/removal —
    so inherited colors never conflict with each other. Only UNCOLORED active
    constraints need work: they are compacted into a `repair_cap` buffer and
    colored by a few Jones-Plassmann rounds against the per-body used-color
    masks built from the inherited colors. Steady state (no new contacts)
    exits the round loop immediately; a fresh scene drains over a few steps
    through the overflow color (mass-splitting relaxation), exactly like the
    reference's overflow color absorbs coloring pressure.

    Returns raw (not dense-remapped) colors (N,): inherited colors pass
    through for inactive lanes; active uncolored lanes that found no color
    this step stay -1 (caller maps them to the overflow color for the solve
    and stores -1 so they retry next step).
    """
    assert max_colors <= 32
    n = body_a.shape[0]
    M = min(repair_cap, n)
    big = jnp.iinfo(jnp.int32).max
    bit_range = jnp.arange(32, dtype=jnp.int32)

    dyn = body_type == DYNAMIC
    slot_of = lambda b, isdyn: jnp.where(isdyn, b, num_bodies)

    # steady state (every active constraint already colored) skips the whole
    # repair machinery via lax.cond — on a resting or slowly-changing scene
    # this removes ~6 ms/step of scatter/cumsum work at 39k lanes. Under
    # vmap the cond lowers to a select (both branches execute), which is
    # exactly the old always-on behavior.
    todo_full = active & (prev_color < 0)

    def impl(m):
        return lambda _: _repair_colors_impl(
            body_a, body_b, active, reserved, prev_color,
            dyn, slot_of, num_bodies, max_colors, dyn_colors,
            max_rounds, m, color_cap, big, bit_range, n)

    # two-tier buffer: settling churn repairs a handful of lanes/step, but
    # every JP round pays (M, C) cumsums + 2M-row gathers at the full
    # buffer width. A small fast tier handles the common trickle; the wide
    # tier only runs on real bursts (scene drops, rebuild re-alignment).
    # two_tier=False (Capacity.batched: the step is vmapped, conds lower to
    # selects and BOTH tiers would execute per world) keeps the single-tier
    # behavior.
    M_small = min(512, M)
    if two_tier and M_small < M:
        n_todo = jnp.sum(todo_full.astype(jnp.int32))
        run = lambda _: lax.cond(n_todo <= M_small, impl(M_small), impl(M),
                                 None)
    else:
        run = impl(M)
    return lax.cond(jnp.any(todo_full), run, lambda _: prev_color, None)


def _repair_colors_impl(body_a, body_b, active, reserved, prev_color,
                        dyn, slot_of, num_bodies, max_colors, dyn_colors,
                        max_rounds, M, color_cap, big, bit_range, n):
    # --- register inherited colors: per-body used masks + per-color counts --
    hold = (active | reserved) & (prev_color >= 0)
    bit = jnp.where(hold, 1 << jnp.clip(prev_color, 0, 31), 0)
    dyn_a = dyn[body_a]
    dyn_b = dyn[body_b]
    live_colored = active & (prev_color >= 0)
    # ONE packed scatter-add builds the per-body used-color masks (targets
    # offset into one array; scatters cost per SOURCE ROW, not per-element).
    # Colors of a body's constraints are distinct (the invariant), so the
    # bit adds never collide. The per-color counts ride an (N, C) one-hot
    # reduce instead — C <= 32 makes that pure cheap vector work, saving N
    # scatter rows (~0.6 ms at 39k lanes).
    nb1 = num_bodies + 1
    idx_all = jnp.concatenate([
        slot_of(body_a, dyn_a), slot_of(body_b, dyn_b)])
    val_all = jnp.concatenate([
        jnp.where(dyn_a, bit, 0), jnp.where(dyn_b, bit, 0)])
    used0 = jnp.zeros(nb1, jnp.int32).at[idx_all].add(
        val_all).at[num_bodies].set(0)
    counts0 = jnp.sum(
        (jnp.clip(prev_color, 0, max_colors - 1)[:, None]
         == jnp.arange(max_colors)[None, :]) & live_colored[:, None],
        axis=0).astype(jnp.int32)

    # --- compact uncolored active lanes into the repair buffer -------------
    todo = active & (prev_color < 0)
    pos = jnp.cumsum(todo) - 1
    lane = jnp.full(M, -1, jnp.int32).at[
        jnp.where(todo & (pos < M), pos, M)].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    cval = lane >= 0
    lane_c = jnp.maximum(lane, 0)
    ca = body_a[lane_c]
    cb = body_b[lane_c]
    cdyn_a = dyn[ca] & cval
    cdyn_b = dyn[cb] & cval
    both_dyn = cdyn_a & cdyn_b
    cslot_a = slot_of(ca, cdyn_a)
    cslot_b = slot_of(cb, cdyn_b)
    lo = jnp.where(both_dyn, 0, dyn_colors)
    hi = jnp.where(both_dyn, dyn_colors, max_colors - 1)
    cap = color_cap if color_cap is not None else n
    # priority: hashed lane id (high bits) + compact position (unique tiebreak)
    midx = jnp.arange(M, dtype=jnp.int32)
    pri_of = ((((lane_c * jnp.int32(-1640531527)) >> 16) & 0x3FF) << 16) | midx

    cslot_ab = jnp.concatenate([cslot_a, cslot_b])   # (2M,) shared indices

    def round_fn(carry):
        ccol, used, counts, _ = carry
        cand = cval & (ccol < 0)
        full_bits = jnp.sum(
            jnp.where(counts >= cap, 1 << jnp.arange(max_colors), 0))
        used_ab = used[cslot_ab]                     # one (2M,) gather
        forbidden = used_ab[:M] | used_ab[M:] | full_bits
        free = (
            ((forbidden[:, None] >> bit_range[None, :]) & 1) == 0
        ) & (bit_range[None, :] >= lo[:, None]) & (bit_range[None, :] < hi[:, None])
        has_free = jnp.any(free, axis=1)
        proposal = jnp.argmax(free, axis=1).astype(jnp.int32)
        cand = cand & has_free

        pri = jnp.where(cand, (proposal << 26) | pri_of, big)
        pri2 = jnp.concatenate([pri, pri])
        claims = jnp.full(num_bodies + 1, big, jnp.int32).at[
            cslot_ab].min(pri2)
        cl_ab = claims[cslot_ab]
        win = cand & (~cdyn_a | (cl_ab[:M] == pri)) \
            & (~cdyn_b | (cl_ab[M:] == pri))

        # per-color cap: keep only the first (cap - count) winners per color
        seg = jnp.where(win, proposal, max_colors)
        onehots = seg[:, None] == jnp.arange(max_colors)[None, :]
        ordinal = (jnp.cumsum(onehots, axis=0) - 1)[
            midx, jnp.clip(seg, 0, max_colors - 1)]
        room = cap - counts[jnp.clip(seg, 0, max_colors - 1)]
        win = win & (ordinal < room)

        ccol = jnp.where(win, proposal, ccol)
        counts = counts + jnp.sum(
            jnp.where(win[:, None], onehots, False), axis=0).astype(jnp.int32)
        wbit = jnp.where(win, 1 << proposal, 0)
        win2 = jnp.concatenate([jnp.where(cdyn_a, wbit, 0),
                                jnp.where(cdyn_b, wbit, 0)])
        used = used.at[cslot_ab].add(win2)
        used = used.at[num_bodies].set(0)
        return ccol, used, counts, jnp.any(cand)

    def cond_fn(st):
        i, carry = st
        return (i < max_rounds) & carry[3]

    def body_fn(st):
        i, carry = st
        return i + 1, round_fn(carry)

    ccol0 = jnp.full(M, -1, jnp.int32)
    any_todo = jnp.any(cval)
    _, (ccol, _, _, _) = lax.while_loop(
        cond_fn, body_fn,
        (jnp.int32(0), (ccol0, used0, counts0, any_todo)))

    # scatter repaired colors back to full width
    color = prev_color
    color = color.at[jnp.where(cval & (ccol >= 0), lane_c, n)].set(
        jnp.where(cval, ccol, -1), mode="drop")
    return color
