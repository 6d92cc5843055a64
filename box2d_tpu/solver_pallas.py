"""Pallas TPU mega-kernel: the entire TGS-soft contact solve in ONE kernel.

The XLA-level solver (solver.py) executes ~100 small fused kernels per step;
on this hardware each kernel carries ~20us of fixed overhead, which dominates
small and batched worlds. This kernel runs the full substep pipeline —
integrate velocities -> warm start -> per-color solve(bias) -> integrate
positions -> per-color relax -> restitution — inside a single `pallas_call`,
with all state resident in VMEM.

Layout (transposed, lane dimension = entity lanes):
- body state   (8, Nb): vx, vy, w, dpx, dpy, dqc, dqs, active(pos-integrate)
- body params  (12, Nb): inv_m, inv_I, ext_dvx, ext_dvy, ext_dw, damp_lin,
                         damp_ang, lockx, locky, lockw, max_w, vel_active
- constraints  (NF, L) static fields + (NA, L) impulse accumulators, in the
  fixed-stride color-bucket layout built by world.py (color c owns columns
  [c*chunk, (c+1)*chunk)).

Gather/scatter run on the MXU via transposed one-hot matmuls at HIGHEST
precision (f32 matmuls otherwise drop to bf16 passes on TPU and corrupt
state): gather = body(8,Nb) @ onehot(Nb,chunk); scatter = dot_general over
the chunk axis. This replaces both the reference's AoS<->SoA SIMD transposes
(ref: src/ContactSolver.cs:415-479) and its work-stealing stage machine
(ref: src/Solver.cs:37-56): coloring already made the passes conflict-free.

Restrictions (fallback to the XLA path otherwise):
- scenes without joints (joint math is not in-kernel yet)
- Nb and the constraint layout must fit VMEM (see fits_kernel)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import math2d as m
from .constants import MAX_ROTATION
from .state import DYNAMIC, STATIC

# static-field rows in the packed constraint matrix
_F = dict(
    nx=0, ny=1, friction=2, restitution=3, tangent_speed=4,
    rolling_resistance=5, rolling_mass=6, soft_bias=7, soft_mass=8,
    soft_imp=9,
    ax0=10, ay0=11, bx0=12, by0=13,   # point 0 anchors
    ax1=14, ay1=15, bx1=16, by1=17,   # point 1 anchors
    sep0=18, sep1=19, nmass0=20, nmass1=21, tmass0=22, tmass1=23,
    relv0=24, relv1=25, mask0=26, mask1=27,
    inv_ma=28, inv_mb=29, inv_ia=30, inv_ib=31,
    relax=32,   # overflow mass-splitting impulse scale (1 elsewhere)
)
NF = 33
# accumulator rows
_A = dict(ni0=0, ni1=1, ti0=2, ti1=3, tni0=4, tni1=5, roll=6)
NA = 7


def fits_kernel(nb: int, layout_len: int, chunk: int) -> bool:
    """VMEM budget check. The unified flag-driven sweep is instantiated once,
    so the live peak is the resident constraint/body matrices plus one sweep
    frame (~2 one-hot (nb, chunk) matrices and chunk-width temporaries; the
    6x factor leaves margin for Mosaic's register spills / double buffers)."""
    if layout_len % chunk != 0:
        return False
    budget = 12 * 1024 * 1024 / 4  # ~12MB of f32 (16MB VMEM minus slack)
    return (6 * nb * chunk + (NF + 2 * NA + 8) * layout_len + 48 * nb) < budget


def _row(ref_slice, name, table=_F):
    return ref_slice[table[name]]


def _solver_kernel(nsub: int, max_colors: int, chunk: int, l0: int,
                   scal_ref, idx_ref, data_ref, acc_ref,
                   body_ref, param_ref,
                   out_body_ref, out_acc_ref, oh_ref):
    # scalars live in a (1, 8) VMEM row and are used as broadcastable (1, 1)
    # slices (SMEM inputs break vmap batching of the kernel)
    h = scal_ref[0:1, 0:1]
    inv_h = scal_ref[0:1, 1:2]
    contact_speed = scal_ref[0:1, 2:3]
    restitution_threshold = scal_ref[0:1, 3:4]
    max_lin = scal_ref[0:1, 4:5]

    nb = body_ref.shape[1]
    L = data_ref.shape[1]
    del l0, max_colors  # layout covered by uniform chunk windows (see below)

    out_body_ref[:] = body_ref[:]
    out_acc_ref[:] = acc_ref[:]

    iota_nb = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)

    def gather(cols, width):
        """Returns (state (8, width), oh_a (nb,width), oh_b (nb,width))."""
        ia = idx_ref[0:1, pl.ds(cols, width)]
        ib = idx_ref[1:2, pl.ds(cols, width)]
        oh_a = jnp.where(iota_nb == ia, 1.0, 0.0)
        oh_b = jnp.where(iota_nb == ib, 1.0, 0.0)
        return oh_a, oh_b

    def dotf(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    def dot_t(a, b):
        # contract over the last dim of both: (r, w) x (n, w) -> (r, n)
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    def contact_sweep(cols, warm_f, bias_f, rest_f):
        """One conflict-free sweep over constraint columns [cols, cols+chunk),
        behavior selected by TRACED 0/1 scalar flags. One flag-parameterized
        sweep means ONE Mosaic instantiation for all four pass kinds — the
        previous per-pass Python specializations each got their own VMEM
        stack frame (~2MB of (nb, chunk) one-hots + temporaries apiece) and
        blew the 16MB scoped-VMEM limit on large scenes.
          warm_f=1: apply stored impulses (warm start), accumulators unchanged
          bias_f=1: useBias solve (soft-constraint bias, first sweep)
          rest_f=1: restitution pass (normal-only, threshold-gated)
          all 0:    relax pass (no bias, mass scale 1)
        Reads/writes out_body_ref and out_acc_ref in place."""
        width = chunk
        d = data_ref[:, pl.ds(cols, width)]
        a = out_acc_ref[:, pl.ds(cols, width)]
        oh_a, oh_b = gather(cols, width)
        body = out_body_ref[:]                      # (8, nb)
        st_a = dotf(body, oh_a)                     # (8, width)
        st_b = dotf(body, oh_b)

        dpx = st_b[3:4] - st_a[3:4]
        dpy = st_b[4:5] - st_a[4:5]
        dqca, dqsa = st_a[5:6], st_a[6:7]
        dqcb, dqsb = st_b[5:6], st_b[6:7]

        nx = d[_F["nx"]:_F["nx"] + 1]
        ny = d[_F["ny"]:_F["ny"] + 1]
        tx, ty = ny, -nx                             # right perp
        inv_ma = d[_F["inv_ma"]:_F["inv_ma"] + 1]
        inv_mb = d[_F["inv_mb"]:_F["inv_mb"] + 1]
        inv_ia = d[_F["inv_ia"]:_F["inv_ia"] + 1]
        inv_ib = d[_F["inv_ib"]:_F["inv_ib"] + 1]

        ni = [a[_A["ni0"]:_A["ni0"] + 1], a[_A["ni1"]:_A["ni1"] + 1]]
        ti = [a[_A["ti0"]:_A["ti0"] + 1], a[_A["ti1"]:_A["ti1"] + 1]]
        tni = [a[_A["tni0"]:_A["tni0"] + 1], a[_A["tni1"]:_A["tni1"] + 1]]
        roll = a[_A["roll"]:_A["roll"] + 1]

        def rot(qc, qs, x, y):
            return qc * x - qs * y, qs * x + qc * y

        def scatter_deltas(dvax, dvay, dwa, dvbx, dvby, dwb):
            da = jnp.concatenate([dvax, dvay, dwa], axis=0)
            db = jnp.concatenate([dvbx, dvby, dwb], axis=0)
            upd = dot_t(da, oh_a) + dot_t(db, oh_b)  # (3, nb)
            out_body_ref[0:3, :] = out_body_ref[0:3, :] + upd

        # Warm start and solve share the gathers above but branch on the
        # traced flag (scf branches, still ONE instantiation): warm applies
        # stored impulses with ~1/3 of the solve path's instruction count,
        # which matters because these sweeps are issue-bound, not data-bound.
        @pl.when(warm_f > 0.0)
        def _warm():
            dvax = jnp.zeros_like(nx)
            dvay = jnp.zeros_like(nx)
            dwa = jnp.zeros_like(nx)
            dvbx = jnp.zeros_like(nx)
            dvby = jnp.zeros_like(nx)
            dwb = jnp.zeros_like(nx)
            for j in (0, 1):
                mask = d[_F[f"mask{j}"]:_F[f"mask{j}"] + 1]
                pn = ni[j] * mask
                pt = ti[j] * mask
                px = pn * nx + pt * tx
                py = pn * ny + pt * ty
                rax = d[_F[f"ax{j}"]:_F[f"ax{j}"] + 1]
                ray = d[_F[f"ay{j}"]:_F[f"ay{j}"] + 1]
                rbx = d[_F[f"bx{j}"]:_F[f"bx{j}"] + 1]
                rby = d[_F[f"by{j}"]:_F[f"by{j}"] + 1]
                dvax = dvax - inv_ma * px
                dvay = dvay - inv_ma * py
                dwa = dwa - inv_ia * (rax * py - ray * px)
                dvbx = dvbx + inv_mb * px
                dvby = dvby + inv_mb * py
                dwb = dwb + inv_ib * (rbx * py - rby * px)
            dwa = dwa - inv_ia * roll
            dwb = dwb + inv_ib * roll
            scatter_deltas(dvax, dvay, dwa, dvbx, dvby, dwb)

        @pl.when(warm_f == 0.0)
        def _solve():
            solve_f = 1.0 - rest_f   # warm_f == 0 in this branch
            vax, vay, wa = st_a[0:1], st_a[1:2], st_a[2:3]
            vbx, vby, wb = st_b[0:1], st_b[1:2], st_b[2:3]
            total_normal = jnp.zeros_like(roll)
            restitution = d[_F["restitution"]:_F["restitution"] + 1]
            soft_bias = d[_F["soft_bias"]:_F["soft_bias"] + 1]
            soft_mass = d[_F["soft_mass"]:_F["soft_mass"] + 1]
            soft_imp = d[_F["soft_imp"]:_F["soft_imp"] + 1]
            relaxv = d[_F["relax"]:_F["relax"] + 1]

            for j in (0, 1):
                rax = d[_F[f"ax{j}"]:_F[f"ax{j}"] + 1]
                ray = d[_F[f"ay{j}"]:_F[f"ay{j}"] + 1]
                rbx = d[_F[f"bx{j}"]:_F[f"bx{j}"] + 1]
                rby = d[_F[f"by{j}"]:_F[f"by{j}"] + 1]
                mask = d[_F[f"mask{j}"]:_F[f"mask{j}"] + 1]
                nmass = d[_F[f"nmass{j}"]:_F[f"nmass{j}"] + 1]

                vrx = (vbx - wb * rby) - (vax - wa * ray)
                vry = (vby + wb * rbx) - (vay + wa * rax)
                vn = vrx * nx + vry * ny

                # --- solve/relax candidate: separation via substep deltas
                # (ref ContactSolver.cs:199-209); bias_f selects soft bias
                rrx_a, rry_a = rot(dqca, dqsa, rax, ray)
                rrx_b, rry_b = rot(dqcb, dqsb, rbx, rby)
                dsx = dpx + rrx_b - rrx_a
                dsy = dpy + rry_b - rry_a
                s = d[_F[f"sep{j}"]:_F[f"sep{j}"] + 1] + dsx * nx + dsy * ny
                speculative = s > 0.0
                bias = jnp.where(
                    speculative, s * inv_h,
                    bias_f * jnp.maximum(soft_mass * soft_bias * s,
                                         -contact_speed))
                mscale = jnp.where(speculative, 1.0,
                                   1.0 + bias_f * (soft_mass - 1.0))
                iscale = jnp.where(speculative, 0.0, bias_f * soft_imp)
                imp_s = (-nmass * (mscale * vn + bias)
                         - iscale * ni[j]) * relaxv
                new_s = jnp.maximum(ni[j] + imp_s, 0.0) * mask
                d_s = new_s - ni[j]

                # --- restitution candidate (ref ContactSolver.cs:293-320)
                relv = d[_F[f"relv{j}"]:_F[f"relv{j}"] + 1]
                apply_r = ((restitution != 0.0)
                           & (relv < -restitution_threshold)
                           & (tni[j] > 0.0)) * mask
                imp_r = -nmass * (vn + restitution * relv)
                new_r = jnp.maximum(ni[j] + imp_r, 0.0)
                d_r = (new_r - ni[j]) * apply_r

                # --- flag-combined applied impulse + accumulator updates
                impulse = solve_f * d_s + rest_f * d_r
                ni[j] = ni[j] + impulse
                tni[j] = tni[j] + solve_f * new_s + rest_f * d_r
                total_normal = total_normal + new_s  # read when solve_f=1

                px = impulse * nx
                py = impulse * ny
                vax = vax - inv_ma * px
                vay = vay - inv_ma * py
                wa = wa - inv_ia * (rax * py - ray * px)
                vbx = vbx + inv_mb * px
                vby = vby + inv_mb * py
                wb = wb + inv_ib * (rbx * py - rby * px)

            friction = d[_F["friction"]:_F["friction"] + 1]
            tangent_speed = d[_F["tangent_speed"]:_F["tangent_speed"] + 1]
            for j in (0, 1):
                rax = d[_F[f"ax{j}"]:_F[f"ax{j}"] + 1]
                ray = d[_F[f"ay{j}"]:_F[f"ay{j}"] + 1]
                rbx = d[_F[f"bx{j}"]:_F[f"bx{j}"] + 1]
                rby = d[_F[f"by{j}"]:_F[f"by{j}"] + 1]
                mask = d[_F[f"mask{j}"]:_F[f"mask{j}"] + 1]
                tmass = d[_F[f"tmass{j}"]:_F[f"tmass{j}"] + 1]
                vrx = (vbx - wb * rby) - (vax - wa * ray)
                vry = (vby + wb * rbx) - (vay + wa * rax)
                vt = vrx * tx + vry * ty - tangent_speed
                max_f = friction * ni[j]
                new_t = jnp.clip(ti[j] - tmass * vt * relaxv,
                                 -max_f, max_f) * mask
                d_t = new_t - ti[j]
                impulse = solve_f * d_t
                ti[j] = ti[j] + impulse
                px = impulse * tx
                py = impulse * ty
                vax = vax - inv_ma * px
                vay = vay - inv_ma * py
                wa = wa - inv_ia * (rax * py - ray * px)
                vbx = vbx + inv_mb * px
                vby = vby + inv_mb * py
                wb = wb + inv_ib * (rbx * py - rby * px)

            rolling_mass = d[_F["rolling_mass"]:_F["rolling_mass"] + 1]
            rolling_res = d[
                _F["rolling_resistance"]:_F["rolling_resistance"] + 1]
            max_l = rolling_res * total_normal
            new_roll = jnp.clip(roll - rolling_mass * (wb - wa) * relaxv,
                                -max_l, max_l)
            dl = solve_f * (new_roll - roll)
            wa = wa - inv_ia * dl
            wb = wb + inv_ib * dl

            # write accumulators back
            acc_new = jnp.concatenate(
                [ni[0], ni[1], ti[0], ti[1], tni[0], tni[1], roll + dl],
                axis=0)
            out_acc_ref[:, pl.ds(cols, width)] = acc_new

            # scatter velocity deltas
            scatter_deltas(vax - st_a[0:1], vay - st_a[1:2], wa - st_a[2:3],
                           vbx - st_b[0:1], vby - st_b[1:2], wb - st_b[2:3])

    def integrate_velocities():
        body = out_body_ref[:]
        prm = param_ref[:]
        vel_active = prm[11:12]
        v_new_x = prm[2:3] + prm[5:6] * body[0:1]
        v_new_y = prm[3:4] + prm[5:6] * body[1:2]
        w_new = prm[4:5] + prm[6:7] * body[2:3]
        # speed caps (ref: src/Solver.cs:142-153)
        vv = v_new_x * v_new_x + v_new_y * v_new_y
        scale = jnp.where(vv > max_lin * max_lin,
                          max_lin * jax.lax.rsqrt(jnp.maximum(vv, 1e-12)), 1.0)
        v_new_x = v_new_x * scale
        v_new_y = v_new_y * scale
        w_new = jnp.clip(w_new, -prm[10:11], prm[10:11])
        v_new_x = v_new_x * (1.0 - prm[7:8])
        v_new_y = v_new_y * (1.0 - prm[8:9])
        w_new = w_new * (1.0 - prm[9:10])
        out_body_ref[0:1, :] = jnp.where(vel_active > 0, v_new_x, body[0:1])
        out_body_ref[1:2, :] = jnp.where(vel_active > 0, v_new_y, body[1:2])
        out_body_ref[2:3, :] = jnp.where(vel_active > 0, w_new, body[2:3])

    def integrate_positions():
        body = out_body_ref[:]
        active = body[7:8]
        dpx = body[3:4] + h * body[0:1]
        dpy = body[4:5] + h * body[1:2]
        da = h * body[2:3]
        c0, s0 = body[5:6], body[6:7]
        c1 = c0 - da * s0
        s1 = s0 + da * c0
        inv = jax.lax.rsqrt(jnp.maximum(c1 * c1 + s1 * s1, 1e-12))
        out_body_ref[3:4, :] = jnp.where(active > 0, dpx, body[3:4])
        out_body_ref[4:5, :] = jnp.where(active > 0, dpy, body[4:5])
        out_body_ref[5:6, :] = jnp.where(active > 0, c1 * inv, body[5:6])
        out_body_ref[6:7, :] = jnp.where(active > 0, s1 * inv, body[6:7])

    # The whole pipeline runs as ONE flat stage loop so contact_sweep is
    # traced exactly once (one Mosaic VMEM frame). ovf_cap is a chunk
    # multiple (world.py), so uniform chunk-wide windows cover the entire
    # layout [0, L): color buckets in order, then the overflow tail. Empty
    # buckets/lanes are all-masked no-ops (idx rows are -1 -> zero one-hots).
    # Stage sequence per substep (ref src/Solver.cs substep pipeline):
    #   p=0: integrate velocities + warm start
    #   p=1: solve with bias
    #   p=2: integrate positions + relax (no bias)
    # and after all substeps one restitution stage (p=3).
    n_windows = L // chunk

    def stage_fn(k, carry):
        p = jnp.where(k == 3 * nsub, 3, lax.rem(k, 3))

        @pl.when(p == 0)
        def _():
            integrate_velocities()

        @pl.when(p == 2)
        def _():
            integrate_positions()

        warm_f = jnp.where(p == 0, 1.0, 0.0)
        bias_f = jnp.where(p == 1, 1.0, 0.0)
        rest_f = jnp.where(p == 3, 1.0, 0.0)

        def win(c, _):
            contact_sweep(c * chunk, warm_f, bias_f, rest_f)
            return 0

        lax.fori_loop(0, n_windows, win, 0, unroll=False)
        return carry

    lax.fori_loop(0, 3 * nsub + 1, stage_fn, 0, unroll=False)


def run_solver_kernel(nsub, max_colors, chunk, l0,
                      scalars, idx, data, acc, body, params):
    """Invoke the kernel. Shapes: idx (2, L) i32, data (NF, L), acc (NA, L),
    body (8, Nb), params (12, Nb), scalars (1, 8) f32."""
    L = data.shape[1]
    nb = body.shape[1]
    assert L % chunk == 0, "layout (incl. overflow tail) must be chunk-aligned"
    # Mosaic can't lower matmuls with a tiny lane dimension ("only constant
    # accumulators supported" on the (3, nb) scatter reduction when nb < a
    # full lane tile), so pad the body lane dim to 128; extra lanes are never
    # referenced by idx and are sliced off below.
    nb_pad = max(nb, 128)
    if nb_pad != nb:
        body = jnp.pad(body, ((0, 0), (0, nb_pad - nb)))
        params = jnp.pad(params, ((0, 0), (0, nb_pad - nb)))
    kern = functools.partial(_solver_kernel, nsub, max_colors, chunk, l0)
    out_body, out_acc = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((8, nb_pad), jnp.float32),
                   jax.ShapeDtypeStruct((NA, L), jnp.float32)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scalars
            pl.BlockSpec(memory_space=pltpu.VMEM),   # idx
            pl.BlockSpec(memory_space=pltpu.VMEM),   # data
            pl.BlockSpec(memory_space=pltpu.VMEM),   # acc
            pl.BlockSpec(memory_space=pltpu.VMEM),   # body
            pl.BlockSpec(memory_space=pltpu.VMEM),   # params
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )(scalars, idx, data, acc, body, params)
    if nb_pad != nb:
        out_body = out_body[:, :nb]
    return out_body, out_acc


# ---------------------------------------------------------------------------
# packing from / unpacking to the XLA-level structures
# ---------------------------------------------------------------------------

def pack_constraints(cc, relax=None):
    """ContactConstraints (layout order, see world.py) -> (idx, data, acc).

    relax: optional (L,) overflow mass-splitting impulse scale (defaults 1)."""
    z = jnp.zeros_like(cc.friction)
    mask0 = cc.point_mask[:, 0].astype(jnp.float32)
    mask1 = cc.point_mask[:, 1].astype(jnp.float32)
    live = (cc.color >= 0).astype(jnp.float32)
    if relax is None:
        relax = jnp.ones_like(cc.friction)
    data = jnp.stack([
        cc.normal[:, 0], cc.normal[:, 1], cc.friction, cc.restitution,
        cc.tangent_speed, cc.rolling_resistance, cc.rolling_mass,
        cc.soft_bias, cc.soft_mass, cc.soft_imp,
        cc.anchor_a[:, 0, 0], cc.anchor_a[:, 0, 1],
        cc.anchor_b[:, 0, 0], cc.anchor_b[:, 0, 1],
        cc.anchor_a[:, 1, 0], cc.anchor_a[:, 1, 1],
        cc.anchor_b[:, 1, 0], cc.anchor_b[:, 1, 1],
        cc.base_separation[:, 0], cc.base_separation[:, 1],
        cc.normal_mass[:, 0], cc.normal_mass[:, 1],
        cc.tangent_mass[:, 0], cc.tangent_mass[:, 1],
        cc.relative_velocity[:, 0], cc.relative_velocity[:, 1],
        mask0 * live, mask1 * live,
        cc.inv_mass_a * live, cc.inv_mass_b * live,
        cc.inv_i_a * live, cc.inv_i_b * live,
        jnp.maximum(relax, jnp.float32(0.0)),
    ], axis=0)
    acc = jnp.stack([
        cc.normal_impulse[:, 0], cc.normal_impulse[:, 1],
        cc.tangent_impulse[:, 0], cc.tangent_impulse[:, 1],
        cc.total_normal_impulse[:, 0], cc.total_normal_impulse[:, 1],
        cc.rolling_impulse,
    ], axis=0)
    nb_sentinel = jnp.int32(-1)
    live_i = cc.color >= 0
    idx = jnp.stack([
        jnp.where(live_i, cc.body_a, nb_sentinel),
        jnp.where(live_i, cc.body_b, nb_sentinel),
    ], axis=0)
    return idx, data, acc


def pack_constraints_pairs(cc, relax=None):
    """PAIR-order ContactConstraints -> ((P, NF) data, (P, NA) acc,
    (P, 2) idx) column-packed to the _F/_A row tables. The caller scatters
    these three matrices into the color-bucket layout with ONE scatter each
    and transposes — 27 separate per-field layout scatters cost ~12ms/step
    at 39k pairs on TPU."""
    mask0 = cc.point_mask[:, 0].astype(jnp.float32)
    mask1 = cc.point_mask[:, 1].astype(jnp.float32)
    live = (cc.color >= 0).astype(jnp.float32)
    if relax is None:
        relax = jnp.ones_like(cc.friction)
    data = jnp.stack([
        cc.normal[:, 0], cc.normal[:, 1], cc.friction, cc.restitution,
        cc.tangent_speed, cc.rolling_resistance, cc.rolling_mass,
        cc.soft_bias, cc.soft_mass, cc.soft_imp,
        cc.anchor_a[:, 0, 0], cc.anchor_a[:, 0, 1],
        cc.anchor_b[:, 0, 0], cc.anchor_b[:, 0, 1],
        cc.anchor_a[:, 1, 0], cc.anchor_a[:, 1, 1],
        cc.anchor_b[:, 1, 0], cc.anchor_b[:, 1, 1],
        cc.base_separation[:, 0], cc.base_separation[:, 1],
        cc.normal_mass[:, 0], cc.normal_mass[:, 1],
        cc.tangent_mass[:, 0], cc.tangent_mass[:, 1],
        cc.relative_velocity[:, 0], cc.relative_velocity[:, 1],
        mask0 * live, mask1 * live,
        cc.inv_mass_a * live, cc.inv_mass_b * live,
        cc.inv_i_a * live, cc.inv_i_b * live,
        jnp.maximum(relax, jnp.float32(0.0)),
    ], axis=1)
    acc = jnp.stack([
        cc.normal_impulse[:, 0], cc.normal_impulse[:, 1],
        cc.tangent_impulse[:, 0], cc.tangent_impulse[:, 1],
        cc.total_normal_impulse[:, 0], cc.total_normal_impulse[:, 1],
        cc.rolling_impulse,
    ], axis=1)
    live_i = cc.color >= 0
    sentinel = jnp.int32(-1)
    idx = jnp.stack([
        jnp.where(live_i, cc.body_a, sentinel),
        jnp.where(live_i, cc.body_b, sentinel),
    ], axis=1)
    return data, acc, idx


def unpack_acc(cc, acc):
    """Write kernel accumulators back into ContactConstraints."""
    return cc._replace(
        normal_impulse=acc[0:2].T,
        tangent_impulse=acc[2:4].T,
        total_normal_impulse=acc[4:6].T,
        rolling_impulse=acc[6],
    )


def pack_bodies(bodies, bs, tuning, h, inv_dt):
    """Bodies + BodySolverState -> (body (8, Nb), params (12, Nb))."""
    from .state import ALLOW_FAST_ROTATION, LOCK_ANGULAR_Z, LOCK_LINEAR_X, \
        LOCK_LINEAR_Y

    b = bodies
    pos_active = ((b.type != STATIC) & b.awake & b.enabled).astype(jnp.float32)
    vel_active = ((b.type == DYNAMIC) & b.awake & b.enabled).astype(jnp.float32)
    body = jnp.stack([
        bs.v[:, 0], bs.v[:, 1], bs.w,
        bs.dp[:, 0], bs.dp[:, 1], bs.dq[:, 0], bs.dq[:, 1],
        pos_active,
    ], axis=0)
    g_scale = jnp.where(b.inv_mass > 0, b.gravity_scale, 0.0)
    ext_dv = h * (b.inv_mass[:, None] * b.force
                  + g_scale[:, None] * tuning.gravity[None, :])
    ext_dw = h * b.inv_inertia * b.torque
    max_w_allow = jnp.where((b.flags & ALLOW_FAST_ROTATION) != 0,
                            jnp.float32(1e9), MAX_ROTATION * inv_dt)
    params = jnp.stack([
        b.inv_mass, b.inv_inertia, ext_dv[:, 0], ext_dv[:, 1], ext_dw,
        1.0 / (1.0 + h * b.linear_damping),
        1.0 / (1.0 + h * b.angular_damping),
        ((b.flags & LOCK_LINEAR_X) != 0).astype(jnp.float32),
        ((b.flags & LOCK_LINEAR_Y) != 0).astype(jnp.float32),
        ((b.flags & LOCK_ANGULAR_Z) != 0).astype(jnp.float32),
        max_w_allow,
        vel_active,
    ], axis=0)
    return body, params


def unpack_bodies(bs, body):
    return bs._replace(
        v=body[0:2].T, w=body[2],
        dp=body[3:5].T, dq=body[5:7].T)


# ===========================================================================
# Tiled / HBM-streaming kernel for LARGE scenes
# ===========================================================================
#
# The resident kernel above keeps everything in VMEM, which caps it at a few
# thousand bodies. This variant scales to ~50k bodies / ~150k constraint
# lanes:
#
# - body state (8, Nb) + params (12, Nb) and the impulse accumulators
#   (NA, L) stay VMEM-resident (they are small);
# - the static constraint matrix (NF, L) — the big array — STREAMS from HBM
#   one window at a time via the grid pipeline (auto double-buffered);
# - grid = (stage, window). A scalar-prefetched window LIST visits only
#   non-empty color-bucket windows; padded tail entries repeat the last
#   active window's block index so Mosaic elides their DMA entirely;
# - gather/scatter one-hot matmuls are tiled over body blocks of TB lanes,
#   restricted per window to the scalar-prefetched [tile_lo, tile_hi) range
#   of body tiles its constraints actually touch (lanes are body-sorted
#   within a bucket by world.py, so ranges stay narrow);
# - the dq.c body row is stored SHIFTED by -1 (identity == 0), so bodies
#   outside the gathered tile range read as zeros == identity rotation with
#   zero velocity — exactly correct for static bodies, which therefore never
#   widen a window's tile range (only dynamic endpoints count).
#
# This replaces the role of the reference's SIMD contact solver at scale
# (ref: src/ContactSolver.cs:362-1026) without its AoS<->SoA transposes:
# coloring makes windows conflict-free, tiling keeps the one-hots in VMEM.

import os

# Measured on v5e (pyramid-140, 29k contacts): per-sweep cost scales with
# the (tb, 2w) one-hot width, and narrow windows keep body-tile spans at 1;
# w=128/tb=512 runs the same stage schedule at 7.9ms vs 16.3ms for 512/512.
DEFAULT_WINDOW = int(os.environ.get("B2_TILED_WINDOW", "128"))
DEFAULT_BODY_TILE = int(os.environ.get("B2_TILED_BODY_TILE", "512"))


def window_width(chunk: int, target: int = DEFAULT_WINDOW) -> int:
    """Largest multiple of 128 <= target that divides the color chunk."""
    w = min(chunk, target)
    while w > 128 and chunk % w != 0:
        w -= 128
    return max(w, 128) if chunk % max(w, 128) == 0 else 128


def fits_tiled(nb: int, layout_len: int, w: int = DEFAULT_WINDOW,
               tb: int = DEFAULT_BODY_TILE) -> bool:
    """VMEM budget for the tiled kernel: resident body/params/acc/idx plus
    pipelined data windows and one gather tile frame."""
    nb_pad = ((max(nb, 128) + tb - 1) // tb) * tb
    words = (28 * nb_pad            # body in/out + params
             + (2 * NA + 2) * layout_len   # acc in/out + idx(int32)
             + 3 * NF * w           # streamed data windows (pipelined)
             + 4 * tb * w           # gather/scatter one-hot tiles
             + 48 * w + 65536)      # temporaries + slack
    return words * 4 < 12 * 1024 * 1024


def _tiled_kernel(nsub: int, w: int, tb: int,
                  win_ref, tlo_ref, thi_ref, nact_ref, wrest_ref,
                  scal_ref, idx_ref, data_ref, acc_ref,
                  body_ref, param_ref,
                  out_body_ref, out_acc_ref):
    h = scal_ref[0:1, 0:1]
    inv_h = scal_ref[0:1, 1:2]
    contact_speed = scal_ref[0:1, 2:3]
    restitution_threshold = scal_ref[0:1, 3:4]
    max_lin = scal_ref[0:1, 4:5]

    s = pl.program_id(0)
    wi = pl.program_id(1)

    @pl.when((s == 0) & (wi == 0))
    def _init():
        out_body_ref[:] = body_ref[:]
        out_acc_ref[:] = acc_ref[:]

    # stage kind: p=0 integrate-velocities+warm, p=1 solve(bias),
    # p=2 integrate-positions+relax, p=3 restitution (final stage)
    p = jnp.where(s == 3 * nsub, 3, lax.rem(s, 3))

    @pl.when((wi == 0) & (p == 0))
    def _intv():
        body = out_body_ref[:]
        prm = param_ref[:]
        vel_active = prm[11:12]
        v_new_x = prm[2:3] + prm[5:6] * body[0:1]
        v_new_y = prm[3:4] + prm[5:6] * body[1:2]
        w_new = prm[4:5] + prm[6:7] * body[2:3]
        vv = v_new_x * v_new_x + v_new_y * v_new_y
        scale = jnp.where(
            vv > max_lin * max_lin,
            max_lin * jax.lax.rsqrt(jnp.maximum(vv, 1e-12)), 1.0)
        v_new_x = v_new_x * scale * (1.0 - prm[7:8])
        v_new_y = v_new_y * scale * (1.0 - prm[8:9])
        w_new = jnp.clip(w_new, -prm[10:11], prm[10:11]) * (1.0 - prm[9:10])
        out_body_ref[0:1, :] = jnp.where(vel_active > 0, v_new_x, body[0:1])
        out_body_ref[1:2, :] = jnp.where(vel_active > 0, v_new_y, body[1:2])
        out_body_ref[2:3, :] = jnp.where(vel_active > 0, w_new, body[2:3])

    @pl.when((wi == 0) & (p == 2))
    def _intp():
        body = out_body_ref[:]
        active = body[7:8]
        dpx = body[3:4] + h * body[0:1]
        dpy = body[4:5] + h * body[1:2]
        da = h * body[2:3]
        # dq.c row is stored shifted by -1 (identity == all-zeros)
        c0, s0 = body[5:6] + 1.0, body[6:7]
        c1 = c0 - da * s0
        s1 = s0 + da * c0
        inv = jax.lax.rsqrt(jnp.maximum(c1 * c1 + s1 * s1, 1e-12))
        out_body_ref[3:4, :] = jnp.where(active > 0, dpx, body[3:4])
        out_body_ref[4:5, :] = jnp.where(active > 0, dpy, body[4:5])
        out_body_ref[5:6, :] = jnp.where(active > 0, c1 * inv - 1.0,
                                         body[5:6])
        out_body_ref[6:7, :] = jnp.where(active > 0, s1 * inv, body[6:7])

    def dotf(a_, b_):
        return jax.lax.dot_general(
            a_, b_, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    def dot_t(a_, b_):
        return jax.lax.dot_general(
            a_, b_, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    # restitution sweeps only run for windows that contain a lane with
    # nonzero restitution (wrest); most scenes have none and skip stage 3
    @pl.when((wi < nact_ref[0]) & ((p != 3) | (wrest_ref[wi] > 0)))
    def _sweep():
        col = pl.multiple_of(win_ref[wi] * w, w)
        tlo = tlo_ref[wi]
        thi = thi_ref[wi]
        ia = idx_ref[0:1, pl.ds(col, w)]
        ib = idx_ref[1:2, pl.ds(col, w)]
        d = data_ref[:]                       # streamed (NF, w) window
        a = out_acc_ref[:, pl.ds(col, w)]     # resident accumulator window

        iota_tb = jax.lax.broadcasted_iota(jnp.int32, (tb, 1), 0)
        # a- and b-side one-hots built and contracted as ONE (tb, 2w) op
        # per tile: sweep cost is dominated by per-op issue overhead, not
        # element count (tb=256 with 2x the tile iterations measures much
        # slower than tb=512 at identical total elements)
        iab = jnp.concatenate([ia, ib], axis=1)          # (1, 2w)

        def gather_tile(t, st):
            base = pl.multiple_of(t * tb, tb)
            bt = out_body_ref[:, pl.ds(base, tb)]
            oh = jnp.where(iota_tb + base == iab, 1.0, 0.0)   # (tb, 2w)
            return st + dotf(bt, oh)

        # warm start (p==0) never reads body state — its deltas are pure
        # functions of stored impulses — so skip the gather loop entirely
        gthi = jnp.where(p == 0, tlo, thi)
        st = lax.fori_loop(tlo, gthi, gather_tile,
                           jnp.zeros((8, 2 * w), jnp.float32))
        st_a, st_b = st[:, :w], st[:, w:]

        dpx = st_b[3:4] - st_a[3:4]
        dpy = st_b[4:5] - st_a[4:5]
        dqca, dqsa = st_a[5:6] + 1.0, st_a[6:7]
        dqcb, dqsb = st_b[5:6] + 1.0, st_b[6:7]

        nx = d[_F["nx"]:_F["nx"] + 1]
        ny = d[_F["ny"]:_F["ny"] + 1]
        tx, ty = ny, -nx
        inv_ma = d[_F["inv_ma"]:_F["inv_ma"] + 1]
        inv_mb = d[_F["inv_mb"]:_F["inv_mb"] + 1]
        inv_ia = d[_F["inv_ia"]:_F["inv_ia"] + 1]
        inv_ib = d[_F["inv_ib"]:_F["inv_ib"] + 1]
        relaxv = d[_F["relax"]:_F["relax"] + 1]

        ni = [a[_A["ni0"]:_A["ni0"] + 1], a[_A["ni1"]:_A["ni1"] + 1]]
        ti = [a[_A["ti0"]:_A["ti0"] + 1], a[_A["ti1"]:_A["ti1"] + 1]]
        tni = [a[_A["tni0"]:_A["tni0"] + 1], a[_A["tni1"]:_A["tni1"] + 1]]
        roll = a[_A["roll"]:_A["roll"] + 1]

        def rot(qc, qs, x, y):
            return qc * x - qs * y, qs * x + qc * y

        def warm_fn(_):
            dvax = jnp.zeros((1, w), jnp.float32)
            dvay = jnp.zeros((1, w), jnp.float32)
            dwa = -inv_ia * roll
            dvbx = jnp.zeros((1, w), jnp.float32)
            dvby = jnp.zeros((1, w), jnp.float32)
            dwb = inv_ib * roll
            for j in (0, 1):
                mask = d[_F[f"mask{j}"]:_F[f"mask{j}"] + 1]
                pn = ni[j] * mask
                pt = ti[j] * mask
                px = pn * nx + pt * tx
                py = pn * ny + pt * ty
                rax = d[_F[f"ax{j}"]:_F[f"ax{j}"] + 1]
                ray = d[_F[f"ay{j}"]:_F[f"ay{j}"] + 1]
                rbx = d[_F[f"bx{j}"]:_F[f"bx{j}"] + 1]
                rby = d[_F[f"by{j}"]:_F[f"by{j}"] + 1]
                dvax = dvax - inv_ma * px
                dvay = dvay - inv_ma * py
                dwa = dwa - inv_ia * (rax * py - ray * px)
                dvbx = dvbx + inv_mb * px
                dvby = dvby + inv_mb * py
                dwb = dwb + inv_ib * (rbx * py - rby * px)
            return (jnp.concatenate([dvax, dvay, dwa], 0),
                    jnp.concatenate([dvbx, dvby, dwb], 0), a)

        def solve_fn(_):
            bias_f = jnp.where(p == 1, 1.0, 0.0)
            rest_f = jnp.where(p == 3, 1.0, 0.0)
            solve_f = 1.0 - rest_f
            vax, vay, wa = st_a[0:1], st_a[1:2], st_a[2:3]
            vbx, vby, wb = st_b[0:1], st_b[1:2], st_b[2:3]
            nni = [ni[0], ni[1]]
            nti = [ti[0], ti[1]]
            ntni = [tni[0], tni[1]]
            total_normal = jnp.zeros_like(roll)
            restitution = d[_F["restitution"]:_F["restitution"] + 1]
            soft_bias = d[_F["soft_bias"]:_F["soft_bias"] + 1]
            soft_mass = d[_F["soft_mass"]:_F["soft_mass"] + 1]
            soft_imp = d[_F["soft_imp"]:_F["soft_imp"] + 1]

            for j in (0, 1):
                rax = d[_F[f"ax{j}"]:_F[f"ax{j}"] + 1]
                ray = d[_F[f"ay{j}"]:_F[f"ay{j}"] + 1]
                rbx = d[_F[f"bx{j}"]:_F[f"bx{j}"] + 1]
                rby = d[_F[f"by{j}"]:_F[f"by{j}"] + 1]
                mask = d[_F[f"mask{j}"]:_F[f"mask{j}"] + 1]
                nmass = d[_F[f"nmass{j}"]:_F[f"nmass{j}"] + 1]

                vrx = (vbx - wb * rby) - (vax - wa * ray)
                vry = (vby + wb * rbx) - (vay + wa * rax)
                vn = vrx * nx + vry * ny

                rrx_a, rry_a = rot(dqca, dqsa, rax, ray)
                rrx_b, rry_b = rot(dqcb, dqsb, rbx, rby)
                dsx = dpx + rrx_b - rrx_a
                dsy = dpy + rry_b - rry_a
                sep = (d[_F[f"sep{j}"]:_F[f"sep{j}"] + 1]
                       + dsx * nx + dsy * ny)
                speculative = sep > 0.0
                bias = jnp.where(
                    speculative, sep * inv_h,
                    bias_f * jnp.maximum(soft_mass * soft_bias * sep,
                                         -contact_speed))
                mscale = jnp.where(speculative, 1.0,
                                   1.0 + bias_f * (soft_mass - 1.0))
                iscale = jnp.where(speculative, 0.0, bias_f * soft_imp)
                imp_s = (-nmass * (mscale * vn + bias)
                         - iscale * nni[j]) * relaxv
                new_s = jnp.maximum(nni[j] + imp_s, 0.0) * mask
                d_s = new_s - nni[j]

                relv = d[_F[f"relv{j}"]:_F[f"relv{j}"] + 1]
                apply_r = ((restitution != 0.0)
                           & (relv < -restitution_threshold)
                           & (ntni[j] > 0.0)) * mask
                imp_r = -nmass * (vn + restitution * relv)
                new_r = jnp.maximum(nni[j] + imp_r, 0.0)
                d_r = (new_r - nni[j]) * apply_r

                impulse = solve_f * d_s + rest_f * d_r
                nni[j] = nni[j] + impulse
                ntni[j] = ntni[j] + solve_f * new_s + rest_f * d_r
                total_normal = total_normal + new_s

                px = impulse * nx
                py = impulse * ny
                vax = vax - inv_ma * px
                vay = vay - inv_ma * py
                wa = wa - inv_ia * (rax * py - ray * px)
                vbx = vbx + inv_mb * px
                vby = vby + inv_mb * py
                wb = wb + inv_ib * (rbx * py - rby * px)

            friction = d[_F["friction"]:_F["friction"] + 1]
            tangent_speed = d[_F["tangent_speed"]:_F["tangent_speed"] + 1]
            for j in (0, 1):
                rax = d[_F[f"ax{j}"]:_F[f"ax{j}"] + 1]
                ray = d[_F[f"ay{j}"]:_F[f"ay{j}"] + 1]
                rbx = d[_F[f"bx{j}"]:_F[f"bx{j}"] + 1]
                rby = d[_F[f"by{j}"]:_F[f"by{j}"] + 1]
                mask = d[_F[f"mask{j}"]:_F[f"mask{j}"] + 1]
                tmass = d[_F[f"tmass{j}"]:_F[f"tmass{j}"] + 1]
                vrx = (vbx - wb * rby) - (vax - wa * ray)
                vry = (vby + wb * rbx) - (vay + wa * rax)
                vt = vrx * tx + vry * ty - tangent_speed
                max_f = friction * nni[j]
                new_t = jnp.clip(nti[j] - tmass * vt * relaxv,
                                 -max_f, max_f) * mask
                impulse = solve_f * (new_t - nti[j])
                nti[j] = nti[j] + impulse
                px = impulse * tx
                py = impulse * ty
                vax = vax - inv_ma * px
                vay = vay - inv_ma * py
                wa = wa - inv_ia * (rax * py - ray * px)
                vbx = vbx + inv_mb * px
                vby = vby + inv_mb * py
                wb = wb + inv_ib * (rbx * py - rby * px)

            rolling_mass = d[_F["rolling_mass"]:_F["rolling_mass"] + 1]
            rolling_res = d[
                _F["rolling_resistance"]:_F["rolling_resistance"] + 1]
            max_l = rolling_res * total_normal
            new_roll = jnp.clip(roll - rolling_mass * (wb - wa) * relaxv,
                                -max_l, max_l)
            dl = solve_f * (new_roll - roll)
            wa = wa - inv_ia * dl
            wb = wb + inv_ib * dl

            acc_new = jnp.concatenate(
                [nni[0], nni[1], nti[0], nti[1], ntni[0], ntni[1],
                 roll + dl], 0)
            dva = jnp.concatenate(
                [vax - st_a[0:1], vay - st_a[1:2], wa - st_a[2:3]], 0)
            dvb = jnp.concatenate(
                [vbx - st_b[0:1], vby - st_b[1:2], wb - st_b[2:3]], 0)
            return dva, dvb, acc_new

        dva, dvb, acc_new = lax.cond(p == 0, warm_fn, solve_fn, None)
        out_acc_ref[:, pl.ds(col, w)] = acc_new
        dvab = jnp.concatenate([dva, dvb], axis=1)       # (3, 2w)

        def scatter_tile(t, _):
            base = pl.multiple_of(t * tb, tb)
            oh = jnp.where(iota_tb + base == iab, 1.0, 0.0)   # (tb, 2w)
            upd = dot_t(dvab, oh)                        # (3, tb)
            out_body_ref[0:3, pl.ds(base, tb)] = (
                out_body_ref[0:3, pl.ds(base, tb)] + upd)
            return 0

        lax.fori_loop(tlo, thi, scatter_tile, 0)


def window_metadata(live, body_a, body_b, dyn_a, dyn_b, layout_len: int,
                    w: int, tb: int = DEFAULT_BODY_TILE, restitution=None):
    """Active-window list + per-window body-tile ranges, all in layout order.

    live: (L,) bool; body_a/b: (L,) i32; dyn_a/b: (L,) bool (dynamic
    endpoint — only dynamic bodies bound the gather tile range; statics
    read as zeros == identity via the shifted-dq representation).
    restitution: optional (L,) — windows with no restitution lane skip the
    restitution stage in-kernel."""
    n_win = layout_len // w
    lane_win = jnp.arange(layout_len, dtype=jnp.int32) // w
    win = jnp.where(live, lane_win, n_win)

    # ONE packed (L, 4)-row scatter-max computes all per-window reductions
    # (scatters cost per-op on TPU, not per-element): occ, hi-tile, has-rest,
    # and -lo-tile (min via negated max)
    big = jnp.int32(2**30)
    lo_cand = jnp.minimum(jnp.where(dyn_a, body_a, big),
                          jnp.where(dyn_b, body_b, big)) // tb
    hi_cand = jnp.maximum(jnp.where(dyn_a, body_a, -1),
                          jnp.where(dyn_b, body_b, -1)) // tb + 1
    has_r = (jnp.zeros_like(live, jnp.int32) if restitution is None
             else (live & (restitution != 0.0)).astype(jnp.int32))
    rows = jnp.stack([
        live.astype(jnp.int32),
        jnp.where(live, hi_cand, 0),
        has_r,
        jnp.where(live, -lo_cand, -big),
    ], axis=1)                                              # (L, 4)
    red = jnp.full((n_win + 1, 4), jnp.iinfo(jnp.int32).min,
                   jnp.int32).at[win].max(rows)[:n_win]
    occ = jnp.maximum(red[:, 0], 0)
    thi_w = jnp.maximum(red[:, 1], 0)
    wrest_w = jnp.maximum(red[:, 2], 1 if restitution is None else 0)
    tlo_w = -red[:, 3]

    pos = jnp.cumsum(occ) - 1
    nact = jnp.sum(occ).astype(jnp.int32)
    wl = jnp.zeros(n_win, jnp.int32).at[
        jnp.where(occ > 0, pos, n_win)].set(
        jnp.arange(n_win, dtype=jnp.int32), mode="drop")
    last = wl[jnp.maximum(nact - 1, 0)]
    wl = jnp.where(jnp.arange(n_win) < nact, wl, last)

    tlo = jnp.minimum(tlo_w[wl], thi_w[wl])
    thi = thi_w[wl]
    wrest = wrest_w[wl]
    return wl, tlo, thi, nact[None], wrest


def max_active_windows(n_win: int, max_pairs: int, max_colors: int,
                       ovf_cap: int, w: int) -> int:
    """Static bound on the active-window count: each live lane occupies one
    window, plus at most one partial window per color bucket and the
    overflow tail. Shrinks the grid's window dimension (skipped grid steps
    still cost ~1us each)."""
    return min(n_win, (max_pairs + w - 1) // w + max_colors + ovf_cap // w)


def run_solver_kernel_tiled(nsub, chunk, scalars, idx, data, acc, body,
                            params, win_list, tile_lo, tile_hi, nact, wrest,
                            w: int = DEFAULT_WINDOW,
                            tb: int = DEFAULT_BODY_TILE,
                            grid_windows: int | None = None):
    """Invoke the HBM-streaming tiled kernel. Shapes as run_solver_kernel;
    body row 5 (dq.c) must be pre-shifted by -1 (see pack_bodies_tiled)."""
    L = data.shape[1]
    nb = body.shape[1]
    assert L % w == 0 and chunk % w == 0
    nb_pad = ((max(nb, 128) + tb - 1) // tb) * tb
    if nb_pad != nb:
        body = jnp.pad(body, ((0, 0), (0, nb_pad - nb)))
        params = jnp.pad(params, ((0, 0), (0, nb_pad - nb)))
    n_win = L // w
    stages = 3 * nsub + 1
    gw = n_win if grid_windows is None else min(grid_windows, n_win)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(stages, gw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),    # scalars
            pl.BlockSpec(memory_space=pltpu.VMEM),    # idx
            pl.BlockSpec(                             # data: streamed window
                (NF, w),
                lambda s, wi, win_r, lo_r, hi_r, na_r, re_r: (0, win_r[wi]),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),    # acc (initial)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # body (initial)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # params
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
    )
    kern = functools.partial(_tiled_kernel, nsub, w, tb)
    out_body, out_acc = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((8, nb_pad), jnp.float32),
                   jax.ShapeDtypeStruct((NA, L), jnp.float32)),
    )(win_list, tile_lo, tile_hi, nact, wrest,
      scalars, idx, data, acc, body, params)
    if nb_pad != nb:
        out_body = out_body[:, :nb]
    return out_body, out_acc


def pack_bodies_tiled(bodies, bs, tuning, h, inv_dt):
    """pack_bodies with the dq.c row shifted by -1 (identity == zeros), so
    out-of-tile-range bodies gather as exact static/identity state."""
    body, params = pack_bodies(bodies, bs, tuning, h, inv_dt)
    return body.at[5, :].add(-1.0), params


def unpack_bodies_tiled(bs, body):
    return unpack_bodies(bs, body.at[5, :].add(1.0))
