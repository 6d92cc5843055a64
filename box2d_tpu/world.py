"""World.step — the fully-jitted physics step.

Orchestration counterpart of ref: api/World.cs:31-113 (Step) +
src/Solver.cs:739-1322 (World.Solve), redesigned as one pure function:

    step(state, dt) -> state

No stage machine, no work stealing, no arenas: the whole step is one XLA
program. Phases: broadphase pairs -> narrow-phase manifolds + warm-start
matching -> constraint coloring -> TGS-soft substep loop -> restitution ->
store impulses -> finalize bodies -> events.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from . import math2d as m
from .broadphase import (compute_shape_aabbs, find_pairs,
                         find_pairs_incremental)
from .coloring import dense_remap, repair_colors
from .narrowphase import ContactData, narrow_phase, update_cache
from .solver import (BodySolverState, ContactConstraints as ContactConstraintsT,
                     integrate_positions, integrate_velocities,
                     finalize_bodies, prepare_contacts, restitution_color,
                     solve_color, warm_start_color)
from .state import Capacity, WorldState, zero_events, zero_profile
from .joints import (prepare_joints, warm_start_joints_color,
                     solve_joints_color)
from .continuous import continuous_pass
from .sensors import sensor_pass
from .sleep import wake_and_sleep
from .particles import ParticleConfig, particle_step


def make_step(capacity: Capacity, classes_present: frozenset,
              substeps: int = 4,
              joint_types: frozenset = frozenset(),
              sensor_ids: tuple = (),
              continuous: bool = True,
              particle_cfg: ParticleConfig | None = None,
              use_pallas: bool = False,
              custom_filter: Callable | None = None,
              pre_solve: Callable | None = None,
              light_events: bool = False) -> Callable:
    """Build a jit-able step function for the given static configuration.

    light_events=True skips contact/hit/joint event COMPACTION (the arrays
    stay empty; dense body-move masks and all physics, incl. the touching
    diffs that drive sleep/wake, are unchanged). World.run uses it for the
    scanned prefix whose events are discarded anyway — the final frame of a
    run always executes a full step (see api.World.run).

    custom_filter / pre_solve are TRACE-TIME user hooks (the TPU analog of
    ref include/Types.cs:813 CustomFilterFcn / :827 PreSolveFcn): jittable
    pure functions evaluated on the whole lane set —
      custom_filter(state, shape_a, shape_b) -> (P,) bool keep
        applied when candidate pairs are (re)built, like the reference's
        broadphase-query filter (src/BroadPhase.cs:170-180); not re-run
        while the persistent pair set is unchanged.
      pre_solve(state, shape_a, shape_b, manifold) -> (P,) bool keep
        applied to fresh manifolds every step before the solver (ref
        src/Contact.cs:372-384); dropping a lane zeroes its manifold, so it
        is not solved and emits no begin event — the one-way platform hook.
    """

    # NOTE: no buffer donation — identical zero-filled outputs (cleared
    # forces, empty event slots) get CSE'd into one buffer, and donating an
    # aliased buffer twice is an XLA error. Revisit with explicit
    # de-aliasing if allocation shows up in profiles.
    @jax.jit
    def step(state: WorldState, dt) -> WorldState:
        return _step(state, dt, capacity, classes_present, substeps,
                     joint_types, sensor_ids, continuous, particle_cfg,
                     use_pallas, custom_filter, pre_solve, light_events)

    return step


def _step(state: WorldState, dt, cap: Capacity, classes_present: frozenset,
          substeps: int, joint_types: frozenset = frozenset(),
          sensor_ids: tuple = (), continuous: bool = True,
          particle_cfg: ParticleConfig | None = None,
          use_pallas: bool = False,
          custom_filter=None, pre_solve=None,
          light_events: bool = False) -> WorldState:
    # Particle worlds: particles step FIRST (the reference runs them inside
    # the same step, api/World.cs:92; ordering them before the rigid phases
    # is equivalent because those phases read only poses, which particles
    # never touch). That lets the ENTIRE rigid pipeline be cond-skipped when
    # it has nothing to do — no awake non-static body (including bodies the
    # particle impulses just poked awake) and no host mutation. A pure-tank
    # scene (dam break: 1 static body) otherwise pays ~5 ms/step of rigid
    # fixed cost at every step; flat particle batches pay more.
    if particle_cfg is not None and state.particles is not None \
            and state.broadphase is not None:
        new_particles, body_dv, body_dw, pov = particle_step(
            state.particles, state, dt, particle_cfg)
        # particle impulses wake the bodies they touch
        # (ref: particle/World.cs:47-61 ApplyLinearImpulse -> WakeBody)
        poked = (m.dot(body_dv, body_dv) + body_dw * body_dw) > 1e-12
        b0 = state.bodies
        b1 = dataclasses.replace(
            b0, v=b0.v + body_dv, w=b0.w + body_dw,
            awake=b0.awake | (poked & (b0.type == 2)),
            sleep_time=jnp.where(poked, 0.0, b0.sleep_time))
        state = dataclasses.replace(state, bodies=b1,
                                    particles=new_particles)
        rigid_live = (state.broadphase.dirty
                      | jnp.any(b1.awake & (b1.type != 0) & b1.enabled))

        def rigid_fn(st):
            # particle_cfg=None: particles already ran, and the narrow
            # phase's packed dyn rows are built POST-poke, so the dyn-row
            # fast paths (ad_a/ad_b, fresh_vw, rows_fresh) are all valid
            return _step_work(st, dt, cap, classes_present, substeps,
                              joint_types, sensor_ids, continuous, None,
                              use_pallas, custom_filter=custom_filter,
                              pre_solve=pre_solve, light_events=light_events,
                              particle_overflow_in=pov)

        def skip_fn(st):
            profile = dataclasses.replace(zero_profile(),
                                          overflow_particles=pov)
            return dataclasses.replace(
                st, events=zero_events(cap), profile=profile,
                step_count=st.step_count + 1)

        return lax.cond(rigid_live, rigid_fn, skip_fn, state)

    # whole-world idle fast path: when every non-static body is asleep and
    # no host mutator dirtied the broadphase, the world is a fixed point —
    # skip the entire step (the reference's sleeping solver sets cost
    # nothing either, src/SolverSet.cs). Under vmap the cond lowers to a
    # select (both branches run), same as before.
    if particle_cfg is None and state.broadphase is not None:
        b0 = state.bodies
        idle = (~state.broadphase.dirty
                & ~jnp.any(b0.awake & (b0.type != 0) & b0.enabled))

        def idle_fn(st):
            return dataclasses.replace(
                st, events=zero_events(cap), profile=zero_profile(),
                step_count=st.step_count + 1)

        def work_fn(st):
            return _step_work(st, dt, cap, classes_present, substeps,
                              joint_types, sensor_ids, continuous,
                              particle_cfg, use_pallas,
                              custom_filter=custom_filter,
                              pre_solve=pre_solve, light_events=light_events)

        return lax.cond(idle, idle_fn, work_fn, state)
    return _step_work(state, dt, cap, classes_present, substeps, joint_types,
                      sensor_ids, continuous, particle_cfg, use_pallas,
                      custom_filter=custom_filter, pre_solve=pre_solve,
                      light_events=light_events)


def _step_work(state: WorldState, dt, cap: Capacity,
               classes_present: frozenset,
               substeps: int, joint_types: frozenset = frozenset(),
               sensor_ids: tuple = (), continuous: bool = True,
               particle_cfg: ParticleConfig | None = None,
               use_pallas: bool = False, until: str = "",
               custom_filter=None, pre_solve=None,
               light_events: bool = False,
               particle_overflow_in=None) -> WorldState:
    dt = jnp.asarray(dt, jnp.float32)
    inv_dt = jnp.where(dt > 0, 1.0 / jnp.where(dt > 0, dt, 1.0), 0.0)
    h = dt / substeps
    inv_h = jnp.where(h > 0, 1.0 / jnp.where(h > 0, h, 1.0), 0.0)
    b = state.bodies
    nb = b.center.shape[0]
    tn = state.tuning

    # pre-step poses for the sensor TOI sweep (ref: src/Solver.cs:1275-1292)
    prev_origin = b.origin
    prev_rot = b.rot

    # --- broadphase + narrow phase (ref: api/World.cs:59, :86) -----------
    # snapshot the old cache keys first: orphan contact_end events reference
    # OLD pair lanes after a rebuild re-aligns the cache to the new lanes
    old_key_a = state.contacts.key_a
    old_key_b = state.contacts.key_b
    aabbs = compute_shape_aabbs(state, cap.max_verts)
    if until == "aabbs":
        return aabbs
    if state.broadphase is not None:
        pairs, new_bp, cache, orphan_mask, store_drops, rebuild_kind = \
            find_pairs_incremental(state, cap, aabbs, custom_filter)
        state = dataclasses.replace(state, broadphase=new_bp, contacts=cache)
    else:
        from .narrowphase import remap_cache
        pairs = find_pairs(state, cap, aabbs, custom_filter)
        cache, orphan_mask, store_drops = remap_cache(
            state.contacts,
            jnp.where(pairs.valid, pairs.shape_a, -1),
            jnp.where(pairs.valid, pairs.shape_b, -1),
            cap.max_contact_pairs)
        state = dataclasses.replace(state, contacts=cache)
        rebuild_kind = jnp.int32(2)
    if until == "pairs":
        return pairs, state.contacts
    data = narrow_phase(state, pairs, classes_present, cap.max_verts)
    if pre_solve is not None:
        # PreSolve hook (ref: include/Types.cs:827, called on manifold gain
        # src/Contact.cs:372-384): a dropped lane's manifold is zeroed — not
        # solved, not touching, no begin event
        keep = jnp.asarray(
            pre_solve(state, data.shape_a, data.shape_b, data.manifold),
            bool)
        mf = data.manifold._replace(
            point_count=jnp.where(keep, data.manifold.point_count, 0))
        data = data._replace(manifold=mf)
    touching = data.manifold.point_count > 0
    if until == "narrow":
        return data

    # --- particle systems run before the rigid solve (ref: api/World.cs:92)
    # (production particle worlds arrive here with particle_cfg=None and the
    # particles ALREADY stepped by _step's gate; their overflow rides in)
    particle_overflow = (particle_overflow_in if particle_overflow_in
                         is not None else jnp.int32(0))
    if particle_cfg is not None and state.particles is not None:
        new_particles, body_dv, body_dw, particle_overflow = particle_step(
            state.particles, state, dt, particle_cfg)
        # particle impulses wake the bodies they touch
        # (ref: particle/World.cs:47-61 ApplyLinearImpulse -> WakeBody)
        poked = (m.dot(body_dv, body_dv) + body_dw * body_dw) > 1e-12
        b0 = state.bodies
        b = dataclasses.replace(
            b0, v=b0.v + body_dv, w=b0.w + body_dw,
            awake=b0.awake | (poked & (b0.type == 2)),
            sleep_time=jnp.where(poked, 0.0, b0.sleep_time))
        state = dataclasses.replace(state, bodies=b, particles=new_particles)
        b = state.bodies

    # --- constraint graph coloring (contacts + joints share colors) ------
    # constraints whose endpoints are all asleep/static are skipped entirely
    # (the masked analog of the reference's sleeping solver sets).
    # Colors PERSIST across steps (the analog of the reference's incremental
    # graph, src/ConstraintGraph.cs:135-220): touching pairs keep last step's
    # color (carried by the warm-start match), joints keep theirs in state;
    # only new pairs are colored, via a few compacted repair rounds.
    awake_dyn = b.awake & (b.type == 2)
    jn = state.joints
    joint_active = (jn.enabled & (jn.type >= 0) & _joint_needs_solve(jn)
                    & (awake_dyn[jnp.maximum(jn.body_a, 0)]
                       | awake_dyn[jnp.maximum(jn.body_b, 0)]))
    if particle_cfg is None:
        # packed body rows from the narrow phase (awake/type unchanged
        # since step start) — saves two P-lane gathers
        ad_a = (data.dyn_a[:, 12] > 0) & (data.dyn_a[:, 11] == 2)
        ad_b = (data.dyn_b[:, 12] > 0) & (data.dyn_b[:, 11] == 2)
    else:
        # particle_step may have woken bodies after the narrow phase
        ad_a = awake_dyn[data.body_a]
        ad_b = awake_dyn[data.body_b]
    contact_live = touching & (ad_a | ad_b)
    all_ba = jnp.concatenate([data.body_a, jn.body_a])
    all_bb = jnp.concatenate([data.body_b, jn.body_b])
    all_active = jnp.concatenate([contact_live, joint_active])
    # inherited colors; sleeping-but-touching pairs and idle joints keep
    # their colors RESERVED so a wake can't create conflicts
    all_prev = jnp.concatenate([jnp.where(touching, data.prev_color, -1),
                                jn.color])
    all_reserved = jnp.concatenate([touching, jn.enabled & (jn.type >= 0)])
    from .state import auto_chunk
    chunk = cap.color_chunk or auto_chunk(cap.max_contact_pairs)
    raw_colors = repair_colors(
        all_ba, all_bb, all_active, all_reserved, all_prev, b.type, nb,
        cap.max_colors, color_cap=chunk,
        # 16-bit compact-position priority bits cap the per-step repair
        # buffer at 65536 lanes; excess new constraints overflow-solve this
        # step and retry next step
        repair_cap=min(max(512, cap.max_contact_pairs // 4),
                       all_ba.shape[0], 1 << 16),
        two_tier=not cap.batched)
    ovf = all_active & (raw_colors < 0)
    overflow_colors = jnp.sum(ovf).astype(jnp.int32)
    colors = dense_remap(
        jnp.where(all_active,
                  jnp.where(ovf, cap.max_colors - 1, raw_colors), -1),
        all_active, cap.max_colors)
    p = data.body_a.shape[0]
    contact_color = jnp.where(contact_live, colors[:p], -1)
    joint_color = jnp.where(joint_active, colors[p:], -1)
    num_colors = jnp.maximum(jnp.max(jnp.where(all_active, colors, -1)) + 1, 0)

    # persist raw colors: touching contacts keep theirs (overflow lanes store
    # -1 and retry next step), joints always keep theirs
    contact_color_store = raw_colors[:p]
    new_joints = dataclasses.replace(
        state.joints, color=jnp.where(joint_active, raw_colors[p:], jn.color))
    state = dataclasses.replace(state, joints=new_joints)

    # mass-splitting scale for the overflow color (conflicting constraints
    # are Jacobi-averaged instead of the reference's serial sweep); the
    # degree scatter+gather only runs when overflow exists (rare outside
    # scene-drop steps) — under vmap the cond lowers to a select as usual
    def deg_relax(_):
        ovf2 = jnp.concatenate([ovf, ovf])
        both = jnp.concatenate([all_ba, all_bb])
        deg = jnp.zeros(nb + 1, jnp.float32).at[
            jnp.where(ovf2, both, nb)].add(1.0)
        deg2 = deg[both]
        E_ = all_ba.shape[0]
        cdeg = jnp.maximum(jnp.maximum(deg2[:E_], deg2[E_:]), 1.0)
        return jnp.where(ovf, 1.0 / cdeg, 1.0)

    relax = lax.cond(overflow_colors > 0, deg_relax,
                     lambda _: jnp.ones(all_ba.shape[0], jnp.float32), None)
    contact_relax = relax[:p]
    joint_relax = relax[p:]
    if until == "colors":
        return contact_color, joint_color, num_colors, contact_relax

    # --- prepare solver state (ref: SolverStage Prepare*) -----------------
    bs = BodySolverState(
        v=b.v, w=b.w,
        dp=jnp.zeros_like(b.center),
        dq=m.rot_identity((nb,)),
    )
    cc = prepare_contacts(state, data, bs, contact_color, h, inv_h,
                          fresh_vw=particle_cfg is not None)
    jc = prepare_joints(state, bs, joint_color, h, inv_h, joint_types)
    if until == "prepare":
        return cc, jc

    # --- fixed-stride bucket layout -----------------------------------------
    # constraints are scattered once into a layout where color c owns rows
    # [c*chunk, (c+1)*chunk) — bucket sizes are capped at `chunk` by the
    # coloring. Slice starts are then world-INDEPENDENT, so under vmap every
    # color pass stays a plain dynamic slice instead of degrading into
    # per-world gathers/scatters. The overflow bucket (unbounded) lives in a
    # tail region processed as one static slice with masking.
    p_cap = data.body_a.shape[0]
    l0 = cap.max_colors * chunk
    # overflow tail: small fixed budget processed unconditionally (a batched
    # lax.cond would execute both branches under vmap anyway); overflow
    # beyond the budget is dropped for the step and reported in the profile
    # rounded to a chunk multiple so the pallas kernel can sweep the whole
    # layout (buckets + overflow tail) in uniform chunk-wide windows
    ovf_cap = ((min(p_cap, 2 * chunk) + chunk - 1) // chunk) * chunk
    layout_len = l0 + ovf_cap

    # per-color slot = rank of the lane among lanes of its color, via ONE
    # cumsum over a (P, max_colors) one-hot — O(P*C) vectorized work instead
    # of two O(P log^2 P) bitonic argsorts (each ~100+ sequential passes on
    # TPU). Lane order follows the pair buffer, whose grid-emission order is
    # spatially sorted, which keeps the tiled kernel's gather ranges narrow.
    onehot_c = cc.color[:, None] == jnp.arange(cap.max_colors)[None, :]
    ranks = jnp.cumsum(onehot_c.astype(jnp.int32), axis=0)
    ovf_color = num_colors - 1  # only meaningful when overflow_colors > 0
    # own-column rank via the one-hot (exactly one column matches), not a
    # (P,)-row gather
    slot = jnp.sum(jnp.where(onehot_c, ranks, 0), axis=1) - 1
    # tail lanes: the official overflow color PLUS any lane whose bucket
    # exceeded the chunk (possible when sleeping pairs wake into a bucket
    # that filled up meanwhile — inherited colors bypass the repair cap)
    is_ovf_lane = (((cc.color == ovf_color) & (overflow_colors > 0))
                   | (slot >= chunk)) & (cc.color >= 0)
    tail_rank = jnp.cumsum(is_ovf_lane) - 1
    layout_idx = jnp.where(
        cc.color < 0, layout_len,
        jnp.where(is_ovf_lane,
                  jnp.where(tail_rank < ovf_cap, l0 + tail_rank, layout_len),
                  cc.color * chunk + slot))

    gidx = jnp.clip(layout_idx, 0, layout_len - 1)
    active_lane = layout_idx < layout_len

    from .state import JOINT_FILTER
    solvable_joints = tuple(sorted(
        int(t) for t in joint_types if int(t) != JOINT_FILTER))
    if use_pallas and (not solvable_joints or use_pallas >= 2):
        # flagship path: the whole substep pipeline in one Pallas kernel.
        # mode 1 = VMEM-resident mega-kernel (small scenes / batched worlds,
        # contact-only), mode 2 = HBM-streaming tiled kernel (large scenes
        # AND any jointed scene: joints ride kind-pure windows).
        # Constraints go straight from pair order into the packed kernel
        # matrices with ONE layout scatter per matrix (the 27 per-field
        # scatters of the XLA path cost ~12 ms/step at 39k pairs).
        from .solver_pallas import (NA, NF, NFJ, max_active_windows,
                                    pack_bodies, pack_bodies_tiled,
                                    pack_constraints_pairs, pack_joint_rows,
                                    run_solver_kernel,
                                    run_solver_kernel_tiled, unpack_bodies,
                                    unpack_bodies_tiled, unpack_joint_acc,
                                    window_metadata, window_width)

        data_p, acc_p, idx_p = pack_constraints_pairs(cc, contact_relax)
        with_joints = bool(solvable_joints) and use_pallas >= 2
        w_win = window_width(chunk)
        J = jn.type.shape[0]
        n_groups = 0
        if with_joints:
            # joint region: kind-pure windows appended after the overflow
            # tail, grouped by (color, type) at dynamic w-aligned offsets;
            # visit ORDER is restored per color by the window sort key, so
            # the region's position in memory is irrelevant
            ntp = len(solvable_joints)
            n_groups = cap.max_colors * ntp
            jl = (-(-J // w_win)) * w_win + min(n_groups, J) * w_win
            lay_len_k = layout_len + jl
            trank = jnp.zeros_like(jn.type)
            for r, t in enumerate(solvable_joints):
                trank = jnp.where(jn.type == t, r, trank)
            jlive = joint_color >= 0
            grp = jnp.where(jlive, joint_color * ntp + trank, n_groups)
            oh_g = grp[:, None] == jnp.arange(n_groups)[None, :]
            granks = jnp.cumsum(oh_g.astype(jnp.int32), axis=0)
            jslot = jnp.sum(jnp.where(oh_g, granks, 0), axis=1) - 1
            padded = -(-granks[-1] // w_win) * w_win
            offs = layout_len + jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.cumsum(padded)[:-1]])
            jpos = jnp.where(jlive, offs[grp] + jslot, lay_len_k)
            # dead contact lanes previously dropped at index layout_len,
            # which is now INSIDE the extended array — remap past the end
            cidx = jnp.where(layout_idx >= layout_len, lay_len_k, layout_idx)
            nrows = NFJ
        else:
            lay_len_k = layout_len
            cidx = layout_idx
            nrows = NF
        # ONE combined scatter for data+acc+int columns (scatter ops cost
        # ~1.3ms each at 40k source rows regardless of width); the int
        # columns ride the float scatter as BITCAST rows — scatter-set only
        # moves bits, never does arithmetic on them
        if nrows != NF:
            data_p = jnp.pad(data_p, ((0, 0), (0, nrows - NF)))
        as_f = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
        as_i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
        # nonstatic endpoint flags ride the scatter as one more bitcast
        # column (bit 0 = side a, bit 1 = side b): window_metadata needs
        # them per LAYOUT lane, and gathering body.type[bodyL] there costs
        # two L-row gathers (~2 ms at 66k lanes) while the narrow phase's
        # packed dyn rows already hold the type per pair, gather-free
        ns_c = ((data.dyn_a[:, 11] != 0).astype(jnp.int32)
                + 2 * (data.dyn_b[:, 11] != 0).astype(jnp.int32))
        ncols = 5 if with_joints else 3
        fill = jnp.concatenate(
            [jnp.zeros(nrows + NA, jnp.float32),
             jnp.broadcast_to(as_f(jnp.int32(-1)), (ncols,))])
        if with_joints:
            # int columns: [body_a, body_b, kind, visit key, nonstatic];
            # joints sort before contacts of the same color (matching the
            # XLA order, though same-color windows are conflict-free either
            # way) and overflow-tail contacts last
            key_c = jnp.where(is_ovf_lane, 2 * cap.max_colors,
                              2 * jnp.maximum(cc.color, 0) + 1)
            int_c = jnp.concatenate(
                [idx_p, jnp.zeros((p_cap, 1), jnp.int32),
                 key_c[:, None], ns_c[:, None]], axis=1)
            rows_c = jnp.concatenate([data_p, acc_p, as_f(int_c)], axis=1)
            jdata, jacc0, jidx = pack_joint_rows(state.joints, jc)
            ns_j = ((b.type[jnp.maximum(jn.body_a, 0)] != 0)
                    .astype(jnp.int32)
                    + 2 * (b.type[jnp.maximum(jn.body_b, 0)] != 0)
                    .astype(jnp.int32))
            int_j = jnp.concatenate(
                [jidx, 1 + jn.type[:, None],
                 2 * jnp.maximum(joint_color, 0)[:, None],
                 ns_j[:, None]], axis=1)
            rows_j = jnp.concatenate([jdata, jacc0, as_f(int_j)], axis=1)
            combL = jnp.broadcast_to(
                fill, (lay_len_k, fill.shape[0])).at[
                cidx].set(rows_c, mode="drop").at[
                jpos].set(rows_j, mode="drop")
            idxL4 = as_i(combL[:, nrows + NA:])
            idxL = idxL4[:, :2]
            kindL = jnp.maximum(idxL4[:, 2], 0)
            keyL = idxL4[:, 3]
            nsL = idxL4[:, 4]
        else:
            rows_c = jnp.concatenate(
                [data_p, acc_p,
                 as_f(jnp.concatenate([idx_p, ns_c[:, None]], axis=1))],
                axis=1)
            combL = jnp.broadcast_to(
                fill, (lay_len_k, fill.shape[0])).at[
                cidx].set(rows_c, mode="drop")
            idxL3 = as_i(combL[:, nrows + NA:])
            idxL = idxL3[:, :2]
            nsL = idxL3[:, 2]
            kindL = keyL = None
        dataL = combL[:, :nrows]
        accL = combL[:, nrows:nrows + NA]
        datap, accp, idxp = dataL.T, accL.T, idxL.T
        if until == "layout":
            return datap, accp, idxp
        scalars = jnp.stack([
            h, inv_h, tn.contact_speed, tn.restitution_threshold,
            tn.max_linear_speed, jnp.float32(0), jnp.float32(0),
            jnp.float32(0)])[None, :]
        if use_pallas >= 2:
            stream_acc = use_pallas == 3
            # contact-only resident-acc layouts ride PAIRED sub-windows:
            # one grid step sweeps `halves` 128-lane halves (each with its
            # own tight gather range), halving/quartering the ~1us-per-
            # grid-step overhead that dominates sparse-window sweeps
            halves = 1
            w_k = w_win
            if not with_joints and not stream_acc:
                # bucket alignment: chunk divisibility keeps every window
                # inside ONE color bucket (ovf_cap is a chunk multiple).
                # Wider is better (the ~1us grid-step overhead and the
                # per-visit fixed costs amortize over more lanes; gather
                # tiles stay 128-lane-tight per half) up to the VMEM
                # budget — chunk/w_win sweeps a whole color bucket per
                # grid step. fits_tiled knows hw=128 bounds the one-hot
                # tile, so the budget scales only in streamed data rows.
                from .solver_pallas import fits_tiled
                for cand in (chunk // w_win, 20, 10, 5, 4, 2):
                    if (cand > 1 and chunk % (cand * w_win) == 0
                            and fits_tiled(nb, lay_len_k, cand * w_win,
                                           halves=cand)):
                        halves, w_k = cand, cand * w_win
                        break
            bodyp, paramsp = pack_bodies_tiled(b, bs, tn, h, inv_dt)
            liveL = idxL[:, 0] >= 0
            bodyL_a = jnp.maximum(idxL[:, 0], 0)
            bodyL_b = jnp.maximum(idxL[:, 1], 0)
            # tile ranges must span every NON-STATIC endpoint: the shifted-dq
            # zero-read trick is only exact for static bodies — a KINEMATIC
            # body (nonzero v/w, integrates dp/dq) outside the gathered range
            # would be solved as stationary, breaking moving-platform and
            # conveyor contacts whenever its index lies beyond the dynamic
            # bodies' tiles. Flags come from the scattered nsL column
            # (bit 0 = a, bit 1 = b) — see the layout scatter above.
            restL = (dataL[:, 3] if not with_joints
                     else jnp.where(kindL == 0, dataL[:, 3], 0.0))
            wl, tlo, thi, nactp, wrest, kindw = window_metadata(
                liveL, bodyL_a, bodyL_b,
                ((nsL & 1) > 0) & liveL, ((nsL & 2) > 0) & liveL,
                lay_len_k, w_k, restitution=restL,
                kind=kindL, key=keyL, halves=halves)
            if until == "meta":
                return wl, tlo, thi, nactp, wrest, kindw, bodyp, paramsp
            out_body, out_acc = run_solver_kernel_tiled(
                substeps, chunk, scalars, idxp, datap, accp, bodyp,
                paramsp, wl, tlo, thi, nactp, wrest, kinds=kindw,
                jtypes=solvable_joints if with_joints else (), w=w_k,
                grid_windows=max_active_windows(
                    lay_len_k // w_k, p_cap, cap.max_colors, ovf_cap,
                    w_k, J if with_joints else 0, n_groups),
                stream_acc=stream_acc, halves=halves)
            if until == "kernel":
                return out_body, out_acc
            bs = unpack_bodies_tiled(bs, out_body)
            if with_joints:
                jacc = out_acc.T[jnp.clip(jpos, 0, lay_len_k - 1)]
                jc = unpack_joint_acc(jc, jacc, jlive)
        else:
            bodyp, paramsp = pack_bodies(b, bs, tn, h, inv_dt)
            out_body, out_acc = run_solver_kernel(
                substeps, cap.max_colors, chunk, l0, scalars,
                idxp, datap, accp, bodyp, paramsp)
            bs = unpack_bodies(bs, out_body)
        pair_acc = out_acc.T[gidx]                       # (P, NA)
        ni = jnp.where(active_lane[:, None], pair_acc[:, 0:2],
                       data.normal_impulse)
        ti = jnp.where(active_lane[:, None], pair_acc[:, 2:4],
                       data.tangent_impulse)
        tni = jnp.where(active_lane[:, None], pair_acc[:, 4:6], 0.0)
        roll = jnp.where(active_lane, pair_acc[:, 6], data.rolling_impulse)
        return _step_tail(state, data, bs, jc, dt, inv_dt, inv_h, cap,
                          pairs, num_colors, overflow_colors, touching,
                          sensor_ids, continuous, contact_color_store,
                          ni, ti, roll, tni, cc.relative_velocity,
                          prev_origin, prev_rot,
                          (orphan_mask, old_key_a, old_key_b, store_drops,
                           rebuild_kind),
                          particle_overflow, until=until,
                          rows_fresh=particle_cfg is None,
                          light_events=light_events)

    cc_pairs_relv = cc.relative_velocity

    def to_layout(x, fill=0):
        shape = (layout_len,) + x.shape[1:]
        out = jnp.full(shape, fill, x.dtype)
        return out.at[layout_idx].set(x, mode="drop")

    cc = ContactConstraintsT(*[
        to_layout(x, -1 if name == "color" else 0)
        for name, x in zip(cc._fields, cc)])
    layout_relax = to_layout(contact_relax)

    def contact_pass(fn, bs, cc, c, updates_cc=True):
        start = c * chunk  # world-independent
        ch = jax.tree.map(
            lambda x: lax.dynamic_slice_in_dim(x, start, chunk, 0), cc)
        out = fn(bs, ch, ch.color == c)
        if updates_cc:
            bs, ch = out
            cc = jax.tree.map(
                lambda full, x: lax.dynamic_update_slice_in_dim(
                    full, x, start, 0), cc, ch)
        else:
            bs = out
        return bs, cc

    def overflow_pass(fn, bs, cc):
        ch = jax.tree.map(lambda x: x[l0:], cc)
        # the tail holds the official overflow color AND bucket-demoted
        # lanes (any color); every live lane routed here must be solved
        bs, ch = fn(bs, ch, ch.color >= 0)
        cc = jax.tree.map(
            lambda full, x: full.at[l0:].set(x), cc, ch)
        return bs, cc

    def maybe_overflow(fn, bs, cc):
        # always runs (cheap fixed tail); the mask kills it when no overflow
        return overflow_pass(fn, bs, cc)

    n_chunk_colors = num_colors - jnp.where(overflow_colors > 0, 1, 0)

    def substep(_, carry):
        bs, cc, jc = carry
        bs = integrate_velocities(b, bs, tn, h, inv_dt)

        # warm starting is a pure linear accumulation of stored impulses, so
        # conflicts sum exactly through scatter-adds: ONE full-width pass
        # replaces the reference's per-color warm-start stages
        # (ref: src/Solver.cs:633-642 — the coloring there is only for
        # atomic-free threading)
        bs, jc = warm_start_joints_color(state, bs, jc, jc.color >= 0,
                                         joint_types)
        bs = warm_start_color(bs, cc, cc.color >= 0)

        def solve(c, carry):
            bs, cc, jc = carry
            bs, jc = solve_joints_color(state, bs, jc, jc.color == c, True,
                                        h, inv_h, joint_relax, joint_types)
            bs, cc = contact_pass(
                lambda bs, ch, mk: solve_color(bs, ch, mk, True, inv_h,
                                               tn.contact_speed), bs, cc, c)
            return bs, cc, jc

        bs, cc, jc = lax.fori_loop(0, n_chunk_colors, solve, (bs, cc, jc))
        bs, cc = maybe_overflow(
            lambda bs, ch, mk: solve_color(
                bs, ch, mk, True, inv_h, tn.contact_speed,
                layout_relax[l0:]), bs, cc)
        bs = integrate_positions(b, bs, h)

        def relax_pass(c, carry):
            bs, cc, jc = carry
            bs, jc = solve_joints_color(state, bs, jc, jc.color == c, False,
                                        h, inv_h, joint_relax, joint_types)
            bs, cc = contact_pass(
                lambda bs, ch, mk: solve_color(bs, ch, mk, False, inv_h,
                                               tn.contact_speed), bs, cc, c)
            return bs, cc, jc

        bs, cc, jc = lax.fori_loop(0, n_chunk_colors, relax_pass, (bs, cc, jc))
        bs, cc = maybe_overflow(
            lambda bs, ch, mk: solve_color(
                bs, ch, mk, False, inv_h, tn.contact_speed,
                layout_relax[l0:]), bs, cc)
        return bs, cc, jc

    bs, cc, jc = lax.fori_loop(0, substeps, substep, (bs, cc, jc))

    # --- restitution + store (ref: src/Solver.cs:684-702) ----------------
    def restit(c, carry):
        bs, cc = carry
        return contact_pass(
            lambda bs, ch, mk: restitution_color(bs, ch, mk,
                                                 tn.restitution_threshold),
            bs, cc, c)

    bs, cc = lax.fori_loop(0, n_chunk_colors, restit, (bs, cc))
    bs, cc = maybe_overflow(
        lambda bs, ch, mk: restitution_color(
            bs, ch, mk, tn.restitution_threshold), bs, cc)

    # gather impulses back to pair order; inactive lanes keep their
    # warm-matched impulses
    ni = jnp.where(active_lane[:, None], cc.normal_impulse[gidx],
                   data.normal_impulse)
    ti = jnp.where(active_lane[:, None], cc.tangent_impulse[gidx],
                   data.tangent_impulse)
    tni = jnp.where(active_lane[:, None], cc.total_normal_impulse[gidx], 0.0)
    roll = jnp.where(active_lane, cc.rolling_impulse[gidx],
                     data.rolling_impulse)
    return _step_tail(state, data, bs, jc, dt, inv_dt, inv_h, cap, pairs,
                      num_colors, overflow_colors, touching, sensor_ids,
                      continuous, contact_color_store, ni, ti, roll, tni,
                      cc_pairs_relv, prev_origin, prev_rot,
                      (orphan_mask, old_key_a, old_key_b, store_drops,
                           rebuild_kind),
                      particle_overflow, until=until,
                      rows_fresh=particle_cfg is None,
                      light_events=light_events)


def _step_tail(state, data, bs, jc, dt, inv_dt, inv_h, cap, pairs,
               num_colors, overflow_colors, touching, sensor_ids, continuous,
               contact_color_store, ni, ti, roll, tni, relv,
               prev_origin=None, prev_rot=None, orphan_info=None,
               particle_overflow=None, until: str = "",
               rows_fresh: bool = True, light_events: bool = False):
    """Post-solve: store impulses, events, continuous, finalize, sleep,
    sensors, profile. Shared by the XLA and Pallas solver paths.

    ni/ti/roll/tni/relv are PAIR-order solved impulses / relative
    velocities. orphan_info = (orphan_mask, old_key_a, old_key_b,
    store_drops) from the broadphase rebuild (see find_pairs_incremental)."""
    data = data._replace(
        normal_impulse=ni, tangent_impulse=ti, rolling_impulse=roll)
    new_store = update_cache(data, contact_color_store)
    state = dataclasses.replace(state, contacts=new_store,
                                joints=_store_joint_impulses(state.joints, jc))
    store_drops = (orphan_info[3] if orphan_info is not None
                   else jnp.int32(0))

    # --- events -----------------------------------------------------------
    if until == "store":
        return state.contacts
    if light_events:
        # scanned-prefix steps: the compacted arrays are provably discarded
        # (run() overwrites them next frame); skip the top_k/scatter work
        events, ev_drop = zero_events(cap), jnp.int32(0)
    else:
        events, ev_drop = _contact_events(state, data, touching, cap,
                                          orphan_info)
        events, d_hit = _hit_events(state, data, tni, relv, touching, events,
                                    cap)
        events, d_joint = _joint_events(state, jc, inv_h, events, cap)
        ev_drop = ev_drop + d_hit + d_joint
    if until == "events":
        return events

    # --- continuous collision (ref: src/Solver.cs:224-401) -----------------
    advance = None
    overflow_ccd = jnp.int32(0)
    if continuous:
        advance, overflow_ccd = continuous_pass(state, bs, dt,
                                                cap.fast_cap or 32,
                                                cap.cand_cap)
    if until == "continuous":
        return advance, overflow_ccd, events

    # --- finalize ----------------------------------------------------------
    state = finalize_bodies(state, bs, dt, inv_dt, advance)
    if until == "finalize":
        return state.bodies.center, state.bodies.rot, events

    # --- sleep/wake (ref: src/Solver.cs:1293-1321 + src/Island.cs) ---------
    awake_fin = state.bodies.awake  # post-finalize, pre-sleep
    new_touch = touching & ~data.was_touching
    lost_touch = data.was_touching & ~touching
    if orphan_info is not None:
        lost_touch = lost_touch | orphan_info[0]
    state = wake_and_sleep(state, touching, new_touch, data.body_a,
                           data.body_b, dt,
                           dyn_a=data.dyn_a if rows_fresh else None,
                           dyn_b=data.dyn_b if rows_fresh else None,
                           lost_touch=lost_touch)
    if until == "sleep":
        return state.bodies.awake, state.bodies.island_label, events

    # --- body move events (ref: include/Types.cs:713-724 BodyMoveEvent,
    # written per awake body in FinalizeBodiesTask src/Solver.cs:402-503).
    # Dense masks instead of compacted rows — see state.Events docstring.
    bnew = state.bodies
    moved = awake_fin & (bnew.type != 0) & bnew.enabled
    fell = moved & ~bnew.awake
    events = dataclasses.replace(
        events, body_moved=moved, body_fell_asleep=fell,
        body_move_count=jnp.sum(moved).astype(jnp.int32),
        body_fell_asleep_count=jnp.sum(fell).astype(jnp.int32))

    # --- sensors (ref: api/World.cs:99 OverlapSensors after solve) ---------
    state = dataclasses.replace(state, events=events)
    state = sensor_pass(state, cap, sensor_ids, prev_origin, prev_rot)
    events = state.events
    profile = zero_profile()
    profile = dataclasses.replace(
        profile,
        pair_count=pairs.count,
        contact_point_count=jnp.sum(data.manifold.point_count),
        color_count=num_colors.astype(jnp.int32),
        overflow_pairs=pairs.overflow,
        overflow_colors=overflow_colors,
        store_drops=store_drops,
        overflow_ccd=overflow_ccd,
        overflow_particles=(particle_overflow if particle_overflow is not None
                            else jnp.int32(0)),
        events_dropped=ev_drop,
        pair_rebuild=(orphan_info[4] if orphan_info is not None
                      and len(orphan_info) > 4 else jnp.int32(2)),
    )
    return dataclasses.replace(
        state, events=events, profile=profile,
        step_count=state.step_count + 1)


def _joint_needs_solve(jn):
    from .state import JOINT_FILTER

    return jn.type != JOINT_FILTER


def _store_joint_impulses(joints, jc):
    if jc is None:
        return joints
    return dataclasses.replace(
        joints,
        impulse=jc.impulse,
        spring_impulse=jc.spring_impulse,
        spring_impulse2=jc.spring_impulse2,
        motor_impulse=jc.motor_impulse,
        lower_impulse=jc.lower_impulse,
        upper_impulse=jc.upper_impulse,
        angular_impulse=jc.angular_impulse,
    )


def _compact_events(mask, payload, capacity):
    """Select masked lanes into a fixed-size event array (lane order
    preserved). Returns (array, clamped count, dropped count) — drops are
    surfaced in Profile.events_dropped, never silent (the reference grows
    its event arrays instead, ref: src/World.cs:376-450).

    top_k of the (small) selected set + a capacity-sized gather instead of
    a P-lane cumsum + P-source scatter: scatters cost per SOURCE row on TPU
    (~1.3 ms at 40k lanes), top_k only O(P log k)."""
    n = mask.shape[0]
    lane = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(1 << 30)
    score = jnp.where(mask, lane, big)
    k = min(capacity, n)
    neg_top, _ = jax.lax.top_k(-score, k)    # largest of -score = first lanes
    idx = -neg_top                           # ascending lane order
    valid = idx < big
    rows = payload[jnp.clip(idx, 0, n - 1)]
    vmask = valid.reshape((k,) + (1,) * (payload.ndim - 1))
    rows = jnp.where(vmask, rows, 0)
    if k < capacity:
        rows = jnp.concatenate(
            [rows, jnp.zeros((capacity - k,) + payload.shape[1:],
                             payload.dtype)])
    count = jnp.sum(mask)
    return (rows, jnp.minimum(count, capacity).astype(jnp.int32),
            jnp.maximum(count - capacity, 0).astype(jnp.int32))


def _contact_events(state: WorldState, data: ContactData, touching, cap,
                    orphan_info=None):
    """Begin/end touch events (ref: src/World.cs:376-450 bitset drains ->
    here a simple prev/next touching diff).

    On a pair-buffer rebuild, a previously-touching pair can VANISH from the
    buffer entirely (AABBs separated in one step: teleports, explosions) —
    lane-wise diffing never sees it. remap_cache flags those OLD lanes in
    orphan_mask; their end events are appended here, gated by lax.cond so
    steady-state steps pay nothing."""
    sh = state.shapes
    ev_enabled = data.ev_contact   # packed rows: both shapes enable events
    begin = touching & ~data.was_touching & ev_enabled
    end = ~touching & data.was_touching & ev_enabled
    pairs_ab = jnp.stack([data.shape_a, data.shape_b], axis=1)

    # compaction (two P-lane cumsums + scatters) only runs on steps that
    # actually have begin/end transitions; quiet steps skip it (lax.cond —
    # lowers to select under vmap, same as the always-on behavior)
    e = cap.event_capacity

    def compact_both(_):
        begin_arr, begin_count, drop_b = _compact_events(
            begin, pairs_ab, e)
        end_arr, end_count, drop_e = _compact_events(end, pairs_ab, e)
        return begin_arr, begin_count, end_arr, end_count, drop_b + drop_e

    def no_events(_):
        z = jnp.zeros((e, 2), pairs_ab.dtype)
        zc = jnp.int32(0)
        return z, zc, z, zc, zc

    begin_arr, begin_count, end_arr, end_count, dropped = jax.lax.cond(
        jnp.any(begin | end), compact_both, no_events, None)

    if orphan_info is not None:
        orphan_mask, old_key_a, old_key_b = orphan_info[:3]

        def orphan_pass(args):
            end_arr, end_count, dropped = args
            ka = jnp.maximum(old_key_a, 0)
            kb = jnp.maximum(old_key_b, 0)
            orphan = (orphan_mask
                      & sh.enable_contact_events[ka]
                      & sh.enable_contact_events[kb])
            e = cap.event_capacity
            pos = end_count + jnp.cumsum(orphan) - 1
            tgt = jnp.where(orphan & (pos < e), pos, e)
            new_arr = end_arr.at[tgt].set(
                jnp.stack([ka, kb], axis=1), mode="drop")
            total = end_count + jnp.sum(orphan)
            return (new_arr, jnp.minimum(total, e).astype(jnp.int32),
                    dropped + jnp.maximum(total - e, 0).astype(jnp.int32))

        end_arr, end_count, dropped = jax.lax.cond(
            jnp.any(orphan_mask), orphan_pass, lambda a: a,
            (end_arr, end_count, dropped))

    events = zero_events(cap)
    return dataclasses.replace(
        events,
        contact_begin=begin_arr, contact_begin_count=begin_count,
        contact_end=end_arr, contact_end_count=end_count,
    ), dropped


def _hit_events(state, data, tni, relv, touching, events, cap):
    """Contact hit events (ref: src/Solver.cs:1151-1190): at hit speed above
    the threshold with a non-zero normal impulse. tni/relv are PAIR-order."""
    tn = state.tuning
    enable = data.ev_hit           # packed rows: either shape enables hits
    approach = -relv
    pt_ok = (approach > tn.hit_event_threshold) & (tni > 0.0)
    hit = enable & touching & jnp.any(pt_ok, axis=1)
    e = cap.event_capacity

    # the cumsum + 4 scatters only run on steps with a qualifying hit
    def compact_hits(_):
        best_pt = jnp.argmax(jnp.where(pt_ok, approach, -jnp.inf), axis=1)
        lane = jnp.arange(data.shape_a.shape[0])
        speed = approach[lane, best_pt]
        point = data.manifold.point[lane, best_pt]
        normal = data.manifold.normal
        shapes_ab = jnp.stack([data.shape_a, data.shape_b], axis=1)
        pos = jnp.cumsum(hit) - 1
        tgt = jnp.where(hit, pos, e)
        n_hit = jnp.sum(hit)
        return (events.hit_point.at[tgt].set(point, mode="drop"),
                events.hit_normal.at[tgt].set(normal, mode="drop"),
                events.hit_speed.at[tgt].set(speed, mode="drop"),
                events.hit_shapes.at[tgt].set(shapes_ab, mode="drop"),
                jnp.minimum(n_hit, e).astype(jnp.int32),
                jnp.maximum(n_hit - e, 0).astype(jnp.int32))

    def no_hits(_):
        return (events.hit_point, events.hit_normal, events.hit_speed,
                events.hit_shapes, jnp.int32(0), jnp.int32(0))

    hp, hn, hs, hsh, n_hit, drop = jax.lax.cond(
        jnp.any(hit), compact_hits, no_hits, None)
    return dataclasses.replace(
        events, hit_point=hp, hit_normal=hn, hit_speed=hs, hit_shapes=hsh,
        hit_count=n_hit,
    ), drop


def _joint_events(state, jc, inv_h, events, cap):
    """Joint force/torque threshold events (ref: src/Solver.cs:1126-1150 +
    per-joint GetReaction)."""
    from .state import (JOINT_DISTANCE, JOINT_MOTOR, JOINT_PRISMATIC,
                        JOINT_REVOLUTE, JOINT_WELD, JOINT_WHEEL)

    jn = state.joints
    ty = jn.type
    lin = jnp.sqrt(jnp.sum(jc.impulse**2, axis=1))
    axial = jc.spring_impulse + jc.lower_impulse - jc.upper_impulse
    force = jnp.where(
        ty == JOINT_DISTANCE,
        jnp.abs(jc.impulse[:, 0] + jc.lower_impulse - jc.upper_impulse
                + jc.motor_impulse),
        jnp.where(ty == JOINT_PRISMATIC,
                  jnp.hypot(jc.impulse[:, 0],
                            axial + jc.motor_impulse),
                  jnp.where(ty == JOINT_WHEEL,
                            jnp.hypot(jc.impulse[:, 0], axial),
                            lin))) * inv_h
    torque = jnp.where(
        ty == JOINT_REVOLUTE,
        jnp.abs(jc.motor_impulse + jc.lower_impulse - jc.upper_impulse),
        jnp.where(ty == JOINT_PRISMATIC, jnp.abs(jc.impulse[:, 1]),
                  jnp.where(ty == JOINT_WHEEL, jnp.abs(jc.motor_impulse),
                            jnp.abs(jc.angular_impulse)))) * inv_h
    over = jc.active & ((force >= jn.force_threshold)
                        | (torque >= jn.torque_threshold))
    pos = jnp.cumsum(over) - 1
    e = cap.event_capacity
    tgt = jnp.where(over, pos, e)
    ids = jnp.arange(jn.type.shape[0], dtype=jnp.int32)
    n_over = jnp.sum(over)
    return dataclasses.replace(
        events,
        joint_force=events.joint_force.at[tgt].set(ids, mode="drop"),
        joint_force_count=jnp.minimum(n_over, e).astype(jnp.int32),
    ), jnp.maximum(n_over - e, 0).astype(jnp.int32)
