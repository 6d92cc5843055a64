"""Sleep management: island labels, sleep/wake transitions.

Behavioral counterpart of ref: src/Island.cs (persistent islands with
union-find merge) + src/SolverSet.cs:52-353 (sleep set migration) +
src/Solver.cs:1293-1321 (TrySleepIsland).

TPU redesign: instead of migrating entities between solver sets, sleeping is
a per-body `awake` mask — the solver and integrator already skip non-awake
bodies, and contacts between two sleeping bodies are excluded from the
constraint set. Islands are tracked with a persistent min-label that
propagates a few hops per step over the touching-contact + joint graph:

- merges accumulate across steps (labels only decrease), converging long
  before the 0.5 s sleep timer can expire;
- splits are not tracked (an over-merged island sleeps later than the
  reference's lazily-split islands would — conservative, never incorrect);
- a sleeping island wakes when a *new* touching contact or an external
  velocity/force change reaches any of its bodies (ref: src/Island.cs:217-220
  LinkContact wake).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax import lax

from .constants import TIME_TO_SLEEP
from .state import DYNAMIC, ENABLE_SLEEP, WorldState


def _edge_slots(body_type, edges_a, edges_b, edges_on, nb):
    """Masked scatter targets for dyn-dyn constraint edges."""
    dyn_a = body_type[edges_a] == DYNAMIC
    dyn_b = body_type[edges_b] == DYNAMIC
    on = edges_on & dyn_a & dyn_b
    slot_a = jnp.where(on, edges_a, nb)
    slot_b = jnp.where(on, edges_b, nb)
    return slot_a, slot_b


def _propagate(labels, edges_a, edges_b, slot_a, slot_b, nb,
               iterations: int):
    for _ in range(iterations):
        la = labels[jnp.clip(edges_a, 0, nb - 1)]
        lb = labels[jnp.clip(edges_b, 0, nb - 1)]
        mn = jnp.minimum(la, lb)
        ext = jnp.concatenate([labels, jnp.full((1,), 1 << 30, jnp.int32)])
        ext = ext.at[slot_a].min(mn).at[slot_b].min(mn)
        labels = ext[:nb]
    return labels


def propagate_islands(labels, body_type, edges_a, edges_b, edges_on,
                      iterations: int = 4):
    """Min-label propagation over constraint edges (dynamic bodies only).

    iterations=4 merges labels at 4 hops/step; long chains (diameter >
    ~4x the ~30-step sleep-timer horizon) could otherwise sleep a
    not-yet-merged sub-label while connected bodies still move, and a
    sleeping subgroup pushed through an EXISTING contact never re-wakes
    (waking needs a new touch). The scatter passes are cheap."""
    nb = labels.shape[0]
    slot_a, slot_b = _edge_slots(body_type, edges_a, edges_b, edges_on, nb)
    return _propagate(labels, edges_a, edges_b, slot_a, slot_b, nb,
                      iterations)


def wake_and_sleep(state: WorldState, touching, new_touch, body_a, body_b,
                   dt, dyn_a=None, dyn_b=None, lost_touch=None) -> WorldState:
    """Wake islands hit by new contacts; put long-still islands to sleep.

    dyn_a/dyn_b: optional (P, 14) packed body rows from the narrow phase
    (narrowphase._DYN columns) carrying type/awake/enabled for the contact
    endpoints — saves six P-lane gathers. Pass None when body wake flags may
    have changed since the narrow phase (particle impulses).

    lost_touch: (P,) pairs that stopped touching this step — an edge left
    the island graph, so a re-partition (split check) is needed."""
    b = state.bodies
    nb = b.center.shape[0]
    tn = state.tuning
    jn = state.joints

    if dyn_a is not None:
        c_typ_a = dyn_a[:, 11].astype(jnp.int32)
        c_typ_b = dyn_b[:, 11].astype(jnp.int32)
        c_awk_a = dyn_a[:, 12] > 0
        c_awk_b = dyn_b[:, 12] > 0
        c_en_a = dyn_a[:, 13] > 0
        c_en_b = dyn_b[:, 13] > 0
    else:
        c_typ_a = b.type[body_a]
        c_typ_b = b.type[body_b]
        c_awk_a = b.awake[body_a]
        c_awk_b = b.awake[body_b]
        c_en_a = b.enabled[body_a]
        c_en_b = b.enabled[body_b]

    # --- gated label maintenance ------------------------------------------
    # Labels only need work when the edge set changes (a contact begins or
    # ends, or a host mutator flips a joint/body — those set island_dirty)
    # or while a previous propagation has not reached a fixed point. Quiet
    # steps skip the whole pass (the reference's islands likewise cost
    # nothing unless contacts link/unlink, src/Island.cs:107-187). Under
    # vmap the cond lowers to a select — batched worlds pay the old cost.
    any_new = jnp.any(new_touch)
    any_lost = (jnp.any(lost_touch) if lost_touch is not None
                else jnp.bool_(False))
    # a new touch between bodies that already share a label adds no
    # information (min-merge over an intra-island edge is the identity), so
    # only CROSS-island new touches schedule a propagation — during a
    # settling stack, contacts churn almost entirely inside one island and
    # this one gated (2P,) gather replaces the 5-round gather+scatter pass.
    # Exact, not heuristic: lost edges and host mutations still force the
    # pass through the deferred split launch / island_dirty.
    if dyn_a is not None:
        # labels ride the packed dyn rows (start-of-step values — only this
        # function writes island_label): pure elementwise, no gather, no cond
        lab_a = dyn_a[:, 14].astype(jnp.int32)
        lab_b = dyn_b[:, 14].astype(jnp.int32)
        any_new_cross = jnp.any(new_touch & (c_typ_a == DYNAMIC)
                                & (c_typ_b == DYNAMIC) & (lab_a != lab_b))
    else:
        def _any_cross(_):
            lab_ab = b.island_label[jnp.concatenate([body_a, body_b])]
            P_ = body_a.shape[0]
            return jnp.any(new_touch & (c_typ_a == DYNAMIC)
                           & (c_typ_b == DYNAMIC)
                           & (lab_ab[:P_] != lab_ab[P_:]))

        any_new_cross = lax.cond(any_new, _any_cross,
                                 lambda _: jnp.bool_(False), None)
    # DEFERRED SPLITS: a lost edge only ever requires a re-partition (min-
    # merge labels stay valid, just possibly over-merged — conservative).
    # Launching the reseed immediately would re-run the propagation every
    # churn step and never converge (each step's losses reseed it again), so
    # the launch waits for a QUIET step (no touch-set change) — the analog of
    # the reference's deferred split queue (src/Island.cs:316-426). A lost
    # edge during an in-flight partition leaves the pending flag set: that
    # partition may swap in over-merged (safe), and a clean one relaunches
    # at the next quiet step.
    any_change = any_new | any_lost
    pend_in = b.island_split_pending | any_lost
    launch = pend_in & ~any_change
    run_labels = b.island_dirty | any_new_cross | launch
    fresh_in = jnp.where(launch, jnp.arange(nb, dtype=jnp.int32),
                         b.island_fresh)
    pend_out = pend_in & ~launch

    def do_labels(_):
        j_on = jn.enabled & (jn.body_a >= 0)
        j_dyn_a = b.type[jnp.clip(jn.body_a, 0, nb - 1)] == DYNAMIC
        j_dyn_b = b.type[jnp.clip(jn.body_b, 0, nb - 1)] == DYNAMIC

        edges_a = jnp.concatenate([body_a, jn.body_a])
        edges_b = jnp.concatenate([body_b, jn.body_b])
        on = jnp.concatenate([touching & (c_typ_a == DYNAMIC)
                              & (c_typ_b == DYNAMIC),
                              j_on & j_dyn_a & j_dyn_b])
        slot_a = jnp.where(on, edges_a, nb)
        slot_b = jnp.where(on, edges_b, nb)

        # --- packed label propagation ---------------------------------------
        # active labels (col 0): monotone min-merge (conservative, never
        # splits). fresh labels (col 1): island RE-PARTITION (ref:
        # src/Island.cs:316-426 deferred splits) — a shadow array re-seeds
        # from body ids and propagates alongside; once one more round changes
        # nothing it is a fixed point of the CURRENT edge set (an exact
        # connected-component labeling) and is swapped in, separating
        # clusters bridged by a since-departed body. Swapping only at
        # convergence keeps splits safe: an unconverged partition could let
        # half an island sleep while the other half moves. Both columns ride
        # ONE (2E, 2) gather + ONE scatter-min per iteration (gathers/
        # scatters cost per-op on TPU, not per-element).
        ce = jnp.clip(jnp.concatenate([edges_a, edges_b]), 0, nb - 1)
        slot_ab = jnp.concatenate([slot_a, slot_b])
        lab2 = jnp.stack([b.island_label, fresh_in], axis=1)  # (nb, 2)

        def prop2(l2):
            g = l2[ce]                                   # (2E, 2)
            E = edges_a.shape[0]
            mn = jnp.minimum(g[:E], g[E:])               # (E, 2)
            mn2 = jnp.concatenate([mn, mn])              # (2E, 2)
            ext = jnp.concatenate(
                [l2, jnp.full((1, 2), 1 << 30, jnp.int32)])
            return ext.at[slot_ab].min(mn2)[:nb]

        for _ in range(4):
            lab2 = prop2(lab2)
        snap4 = lab2
        lab2 = prop2(lab2)
        labels = lab2[:, 0]
        converged = jnp.all(lab2 == snap4)
        labels = jnp.where(converged, snap4[:, 1], labels)
        fresh = jnp.where(converged, jnp.arange(nb, dtype=jnp.int32),
                          lab2[:, 1])
        return labels, fresh, ~converged

    def skip_labels(_):
        return b.island_label, fresh_in, jnp.bool_(False)

    labels, fresh, dirty_out = lax.cond(run_labels, do_labels, skip_labels,
                                        None)

    # ---- wake: new touching contact reaches a sleeping body --------------
    # the waking side must be an AWAKE non-static body (ref: only moved
    # proxies create contacts, src/BroadPhase.cs BufferMove): two frozen
    # bodies cannot produce a real new touch, so a phantom new_touch from a
    # hash-store drop (store_slot never found => was_touching always False)
    # inside a sleeping island must not re-wake it. Gated on any_new: quiet
    # steps skip the three P-wide scatter/gather ops.
    def do_wake(_):
        mover_a = c_awk_a & (c_typ_a != 0) & c_en_a
        mover_b = c_awk_b & (c_typ_b != 0) & c_en_b
        hit = new_touch & ((~c_awk_a & mover_b) | (~c_awk_b & mover_a))
        ext = jnp.zeros(nb + 1, bool)
        hit2 = jnp.concatenate([hit, hit])
        ext = ext.at[jnp.where(hit2, jnp.concatenate([body_a, body_b]), nb)
                     ].max(hit2)
        woken_body = ext[:nb]
        # wake the whole island of any woken body
        island_woken = jnp.zeros(nb + 1, bool)
        island_woken = island_woken.at[
            jnp.where(woken_body, jnp.clip(labels, 0, nb), nb)].max(
            woken_body)
        return island_woken[jnp.clip(labels, 0, nb)] & (b.type == DYNAMIC)

    # nothing asleep => nothing to wake: skip the scatter/gather trio (the
    # common case during settling churn, where every body is still awake)
    any_asleep = jnp.any(~b.awake & (b.type == DYNAMIC) & b.enabled)
    wake = lax.cond(any_new & any_asleep, do_wake,
                    lambda _: jnp.zeros(nb, bool), None)
    awake = b.awake | wake
    sleep_time = jnp.where(wake, 0.0, b.sleep_time)

    # ---- sleep: every dynamic body in the island is past the timer -------
    can_sleep = (tn.enable_sleep & ((b.flags & ENABLE_SLEEP) != 0)
                 & (b.type == DYNAMIC) & b.enabled)
    eligible = jnp.where(b.type == DYNAMIC,
                         can_sleep & (sleep_time >= TIME_TO_SLEEP), True)
    island_ok = jnp.ones(nb + 1, bool)
    dyn = (b.type == DYNAMIC) & b.enabled
    island_ok = island_ok.at[
        jnp.where(dyn, jnp.clip(labels, 0, nb), nb)].min(eligible | ~dyn)
    go_sleep = awake & dyn & island_ok[jnp.clip(labels, 0, nb)] & can_sleep
    awake = jnp.where(go_sleep, False, awake)
    v = jnp.where(go_sleep[:, None], 0.0, b.v)
    w = jnp.where(go_sleep, 0.0, b.w)

    bodies = dataclasses.replace(
        b, awake=awake, v=v, w=w, sleep_time=sleep_time, island_label=labels,
        island_fresh=fresh, island_dirty=dirty_out,
        island_split_pending=pend_out)
    return dataclasses.replace(state, bodies=bodies)
