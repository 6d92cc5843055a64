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
NA = 9    # rows 0-6 used by contacts; joints use all 9 (see _JA)
NA_PAD = 16  # NA rounded to the 8-sublane tiling (streamed-acc DMA slices
#              must be tile-aligned in the row dimension)

# JOINT row table — valid inside joint-kind windows (windows are kind-pure,
# so the same row indices carry contact meaning in contact windows). Rows
# 24-27 hold TYPE-RESOLVED predicate flags packed by pack_joint_rows (e.g.
# f_spring for a distance joint already includes the spring-mode predicate).
_JF = dict(
    inv_ma=0, inv_mb=1, inv_ia=2, inv_ib=3,
    fapx=4, fapy=5, faqc=6, faqs=7,
    fbpx=8, fbpy=9, fbqc=10, fbqs=11,
    dcx=12, dcy=13, axial_mass=14,
    sb=15, sm=16, si=17,          # spring softness (bias, mass, imp)
    ab=18, am_=19, ai=20,         # angular softness
    cb=21, cm=22, ci=23,          # constraint softness
    f_spring=24, f_motor=25, f_limit=26, f_aux=27,
    lower=28, upper=29, target=30, speed=31,
    max1=32, max2=33, max3=34, lvx=35, lvy=36, max4=37, jrelax=38,
)
NFJ = 39  # data matrix rows when joints ride the kernel (max(NF, 39))
# joint accumulator rows
_JA = dict(ix=0, iy=1, spring=2, motor=3, lower=4, upper=5, angular=6,
           s2x=7, s2y=8)


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

            # write accumulators back (contacts use rows 0-6 of NA)
            acc_new = jnp.concatenate(
                [ni[0], ni[1], ti[0], ti[1], tni[0], tni[1], roll + dl],
                axis=0)
            out_acc_ref[0:7, pl.ds(cols, width)] = acc_new

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
    z7 = jnp.zeros_like(cc.rolling_impulse)
    acc = jnp.stack([
        cc.normal_impulse[:, 0], cc.normal_impulse[:, 1],
        cc.tangent_impulse[:, 0], cc.tangent_impulse[:, 1],
        cc.total_normal_impulse[:, 0], cc.total_normal_impulse[:, 1],
        cc.rolling_impulse,
    ] + [z7] * (NA - 7), axis=0)
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
    z7 = jnp.zeros_like(cc.rolling_impulse)
    acc = jnp.stack([
        cc.normal_impulse[:, 0], cc.normal_impulse[:, 1],
        cc.tangent_impulse[:, 0], cc.tangent_impulse[:, 1],
        cc.total_normal_impulse[:, 0], cc.total_normal_impulse[:, 1],
        cc.rolling_impulse,
    ] + [z7] * (NA - 7), axis=1)
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
               tb: int = DEFAULT_BODY_TILE, halves: int = 1) -> bool:
    """VMEM budget for the tiled kernel: resident body/params/acc/idx plus
    pipelined data windows and one gather tile frame. halves > 1 splits the
    window into 128-lane sub-windows for gather/scatter, so the one-hot
    tile term scales with w/halves, not w."""
    nb_pad = ((max(nb, 128) + tb - 1) // tb) * tb
    words = (28 * nb_pad            # body in/out + params
             + (2 * NA + 2) * layout_len   # acc in/out + idx(int32)
             + 3 * NF * w           # streamed data windows (pipelined)
             + 4 * tb * (w // halves)  # gather/scatter one-hot tiles
             + 48 * w + 65536)      # temporaries + slack
    return words * 4 < 12 * 1024 * 1024


def fits_tiled_streamed(nb: int, w: int = DEFAULT_WINDOW,
                        tb: int = DEFAULT_BODY_TILE) -> bool:
    """VMEM budget for the streamed-acc tiled kernel (mode 3): only the
    body/params stay resident; data, acc, and idx stream per window, so
    the layout length drops out of the budget entirely."""
    nb_pad = ((max(nb, 128) + tb - 1) // tb) * tb
    words = (28 * nb_pad
             + 3 * (NFJ + NA + 2) * w   # pipelined data+acc+idx windows
             + 4 * tb * w
             + 48 * w + 65536)
    return words * 4 < 12 * 1024 * 1024


def _atan2(y, x):
    """Branchless float32 atan2 (Cephes atanf reduction + 4-term poly);
    Pallas TPU has no atan2 primitive. Max error ~1e-7 rad."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    # t = tan of the angle folded into [0, pi/4]
    mn = jnp.minimum(ax, ay)
    mx = jnp.maximum(ax, ay)
    t = mn / jnp.where(mx > 0.0, mx, 1.0)
    # cephes range reduction at tan(pi/8)
    red = t > 0.4142135623730950
    t2 = (t - 1.0) / (t + 1.0)
    z = jnp.where(red, t2, t)
    zz = z * z
    p = ((((8.05374449538e-2 * zz - 1.38776856032e-1) * zz)
          + 1.99777106478e-1) * zz - 3.33329491539e-1) * zz * z + z
    p = jnp.where(red, p + 0.7853981633974483, p)
    p = jnp.where(ay > ax, 1.5707963267948966 - p, p)
    p = jnp.where(x < 0.0, 3.141592653589793 - p, p)
    return jnp.where(y < 0.0, -p, p)


def _joint_sweep(jtype: int, p, bias_f, d, a, idx_a, st_a, st_b, h, inv_h):
    """One conflict-free sweep over a kind-pure JOINT window.

    Row-form port of joints.py warm_start_joints_color / solve_joints_color
    (ref: src/joints/*.cs). jtype is STATIC (windows are kind-pure; the
    kernel switches branches per window), p/bias_f traced. Returns
    (dva (3,w), dvb (3,w), acc_new (NA,w))."""
    from .state import (JOINT_DISTANCE, JOINT_MOTOR, JOINT_MOUSE,
                        JOINT_PRISMATIC, JOINT_REVOLUTE, JOINT_WELD,
                        JOINT_WHEEL)

    def R(name):
        return d[_JF[name]:_JF[name] + 1]

    def A(name):
        return a[_JA[name]:_JA[name] + 1]

    live = jnp.where(idx_a >= 0, 1.0, 0.0)
    ma, mb = R("inv_ma"), R("inv_mb")
    ia, ib = R("inv_ia"), R("inv_ib")
    vax, vay, wa = st_a[0:1], st_a[1:2], st_a[2:3]
    vbx, vby, wb = st_b[0:1], st_b[1:2], st_b[2:3]
    dpax, dpay = st_a[3:4], st_a[4:5]
    dpbx, dpby = st_b[3:4], st_b[4:5]
    dqca, dqsa = st_a[5:6] + 1.0, st_a[6:7]
    dqcb, dqsb = st_b[5:6] + 1.0, st_b[6:7]

    def rotv(qc, qs, x, y):
        return qc * x - qs * y, qs * x + qc * y

    def cross(ax_, ay_, bx_, by_):
        return ax_ * by_ - ay_ * bx_

    rax, ray = rotv(dqca, dqsa, R("fapx"), R("fapy"))
    rbx, rby = rotv(dqcb, dqsb, R("fbpx"), R("fbpy"))
    dx = dpbx - dpax + R("dcx") + rbx - rax
    dy = dpby - dpay + R("dcy") + rby - ray

    axial = R("axial_mass")
    imp_x, imp_y = A("ix"), A("iy")
    spr_i, mot_i = A("spring"), A("motor")
    low_i, up_i, ang_i = A("lower"), A("upper"), A("angular")
    s2x, s2y = A("s2x"), A("s2y")

    # qa = dqa * fa_q as a unit vector == world joint axis / frame rotation
    qac, qas = rotv(dqca, dqsa, R("faqc"), R("faqs"))
    qbc, qbs = rotv(dqcb, dqsb, R("fbqc"), R("fbqs"))
    # rel angle of inv(qa) * qb
    relc = qac * qbc + qas * qbs
    rels = qac * qbs - qas * qbc

    def soft_limit(c, cdot, mass, old):
        """ref: RevoluteJoint.cs:160-198 pattern (constraint softness)."""
        bias = jnp.where(c > 0.0, c * inv_h, bias_f * R("cb") * c)
        msc = jnp.where(c > 0.0, 1.0, 1.0 + bias_f * (R("cm") - 1.0))
        isc = jnp.where(c > 0.0, 0.0, bias_f * R("ci"))
        impulse = -msc * mass * (cdot + bias) - isc * old
        new = jnp.maximum(old + impulse, 0.0)
        return new, new - old

    # velocity-update helpers operating on closure state
    st = {"vax": vax, "vay": vay, "wa": wa, "vbx": vbx, "vby": vby, "wb": wb}

    def apply_lin(px, py, la, lb):
        st["vax"] = st["vax"] - ma * px
        st["vay"] = st["vay"] - ma * py
        st["wa"] = st["wa"] - ia * la
        st["vbx"] = st["vbx"] + mb * px
        st["vby"] = st["vby"] + mb * py
        st["wb"] = st["wb"] + ib * lb

    def apply_ang(l):
        st["wa"] = st["wa"] - ia * l
        st["wb"] = st["wb"] + ib * l

    def vr_dot(ux, uy):
        vrx = (st["vbx"] - st["wb"] * rby) - (st["vax"] - st["wa"] * ray)
        vry = (st["vby"] + st["wb"] * rbx) - (st["vay"] + st["wa"] * rax)
        return vrx * ux + vry * uy

    acc = {k: a[v:v + 1] for k, v in _JA.items()}

    _ST_KEYS = ("vax", "vay", "wa", "vbx", "vby", "wb")
    _ACC_KEYS = tuple(_JA)

    def run_branch(warm, solve):
        """lax.cond over side-effecting closures: each branch runs its
        mutations of st/acc on a snapshot and returns the results, so the
        cond output (not trace-order side effects) selects the values."""
        def wrap(f):
            def g(_):
                st0 = {k: st[k] for k in _ST_KEYS}
                a0 = {k: acc[k] for k in _ACC_KEYS}
                f()
                out = (tuple(st[k] for k in _ST_KEYS),
                       tuple(acc[k] for k in _ACC_KEYS))
                st.update(st0)
                acc.update(a0)
                return out
            return g

        sv, av = lax.cond(p == 0, wrap(warm), wrap(solve), None)
        for k, v in zip(_ST_KEYS, sv):
            st[k] = v
        for k, v in zip(_ACC_KEYS, av):
            acc[k] = v

    if jtype == JOINT_DISTANCE:
        ln = jnp.sqrt(dx * dx + dy * dy)
        inv = jnp.where(ln > 0.0, 1.0 / jnp.where(ln > 0.0, ln, 1.0), 0.0)
        axx, axy = dx * inv, dy * inv
        spring_mode = R("f_spring")

        def warm():
            axl = imp_x + low_i - up_i + mot_i
            px, py = axl * axx, axl * axy
            apply_lin(px, py, cross(rax, ray, px, py), cross(rbx, rby, px, py))

        def solve():
            # rigid vs spring main constraint (ref DistanceJoint.cs:155-185)
            cdot = vr_dot(axx, axy)
            c = ln - R("target")
            bias = bias_f * R("cb") * c
            msc = 1.0 + bias_f * (R("cm") - 1.0)
            isc = bias_f * R("ci")
            dimp_r = -msc * axial * (cdot + bias) - isc * imp_x
            dimp_s = (-R("sm") * axial * (cdot + R("sb") * c)
                      - R("si") * imp_x) * R("f_aux")
            imp_spring = jnp.clip(imp_x + dimp_s, R("max2") * h,
                                  R("max3") * h)
            dimp = jnp.where(spring_mode > 0, imp_spring - imp_x, dimp_r)
            acc["ix"] = imp_x + dimp
            px, py = dimp * axx, dimp * axy
            apply_lin(px, py, cross(rax, ray, px, py), cross(rbx, rby, px, py))

            # limits (spring mode only, ref :186-242)
            lim = R("f_limit")
            new_low, dlow = soft_limit(ln - R("lower"), vr_dot(axx, axy),
                                       axial, low_i)
            dlow = dlow * lim
            acc["lower"] = jnp.where(lim > 0, new_low, low_i)
            px, py = dlow * axx, dlow * axy
            apply_lin(px, py, cross(rax, ray, px, py), cross(rbx, rby, px, py))

            new_up, dup = soft_limit(R("upper") - ln, -vr_dot(axx, axy),
                                     axial, up_i)
            dup = dup * lim
            acc["upper"] = jnp.where(lim > 0, new_up, up_i)
            px, py = -dup * axx, -dup * axy
            apply_lin(px, py, cross(rax, ray, px, py), cross(rbx, rby, px, py))

            # motor (ref :243-258)
            mot = R("f_motor")
            dimp_m = axial * (R("speed") - vr_dot(axx, axy))
            max_i = h * R("max1")
            new_mot = jnp.clip(mot_i + dimp_m, -max_i, max_i)
            dimp_m = (new_mot - mot_i) * mot
            acc["motor"] = jnp.where(mot > 0, new_mot, mot_i)
            px, py = dimp_m * axx, dimp_m * axy
            apply_lin(px, py, cross(rax, ray, px, py), cross(rbx, rby, px, py))

        run_branch(warm, solve)

    elif jtype == JOINT_REVOLUTE:
        rel_angle = _atan2(rels, relc)

        def warm():
            axl = spr_i + mot_i + low_i - up_i
            px, py = imp_x, imp_y
            apply_lin(px, py, cross(rax, ray, px, py) + axl,
                      cross(rbx, rby, px, py) + axl)

        def solve():
            # spring (ref RevoluteJoint.cs:131-142)
            spr = R("f_spring")
            cspr = _unwind(rel_angle - R("target"))
            dimp = (-R("sm") * axial * ((st["wb"] - st["wa"]) + R("sb") * cspr)
                    - R("si") * spr_i) * spr
            acc["spring"] = spr_i + dimp
            apply_ang(dimp)

            # motor
            mot = R("f_motor")
            dimp = -axial * (st["wb"] - st["wa"] - R("speed"))
            max_i = h * R("max1")
            new_mot = jnp.clip(mot_i + dimp, -max_i, max_i)
            dimp = (new_mot - mot_i) * mot
            acc["motor"] = jnp.where(mot > 0, new_mot, mot_i)
            apply_ang(dimp)

            # limits
            lim = R("f_limit")
            new_low, dlow = soft_limit(rel_angle - R("lower"),
                                       st["wb"] - st["wa"], axial, low_i)
            dlow = dlow * lim
            acc["lower"] = jnp.where(lim > 0, new_low, low_i)
            apply_ang(dlow)
            new_up, dup = soft_limit(R("upper") - rel_angle,
                                     st["wa"] - st["wb"], axial, up_i)
            dup = dup * lim
            acc["upper"] = jnp.where(lim > 0, new_up, up_i)
            apply_ang(-dup)

            # point constraint 2x2 (ref :199-224)
            cdx = (st["vbx"] - st["wb"] * rby) - (st["vax"] - st["wa"] * ray)
            cdy = (st["vby"] + st["wb"] * rbx) - (st["vay"] + st["wa"] * rax)
            sepx = dpbx - dpax + (rbx - rax) + R("dcx")
            sepy = dpby - dpay + (rby - ray) + R("dcy")
            bx_ = cdx + bias_f * R("cb") * sepx
            by_ = cdy + bias_f * R("cb") * sepy
            msc = 1.0 + bias_f * (R("cm") - 1.0)
            isc = bias_f * R("ci")
            k11 = ma + mb + ray * ray * ia + rby * rby * ib
            k12 = -ray * rax * ia - rby * rbx * ib
            k22 = ma + mb + rax * rax * ia + rbx * rbx * ib
            det = k11 * k22 - k12 * k12
            invd = jnp.where(det != 0.0, 1.0 / jnp.where(det != 0.0, det, 1.0),
                             0.0)
            sx = invd * (k22 * bx_ - k12 * by_)
            sy = invd * (k11 * by_ - k12 * bx_)
            dix = -msc * sx - isc * imp_x
            diy = -msc * sy - isc * imp_y
            acc["ix"] = imp_x + dix
            acc["iy"] = imp_y + diy
            apply_lin(dix, diy, cross(rax, ray, dix, diy),
                      cross(rbx, rby, dix, diy))

        run_branch(warm, solve)

    elif jtype == JOINT_WELD:
        rel_angle = _atan2(rels, relc)

        def warm():
            px, py = imp_x, imp_y
            apply_lin(px, py, cross(rax, ray, px, py) + ang_i,
                      cross(rbx, rby, px, py) + ang_i)

        def solve():
            # angular (ref WeldJoint.cs:104-118); f_motor = angular_hertz>0
            ang_on = jnp.minimum(bias_f + R("f_motor"), 1.0)
            bias = ang_on * R("ab") * rel_angle
            msc = 1.0 + ang_on * (R("am_") - 1.0)
            isc = ang_on * R("ai")
            dimp = -msc * axial * (st["wb"] - st["wa"] + bias) - isc * ang_i
            acc["angular"] = ang_i + dimp
            apply_ang(dimp)
            # linear 2x2; f_spring = hertz>0
            lin_on = jnp.minimum(bias_f + R("f_spring"), 1.0)
            sepx = dpbx - dpax + (rbx - rax) + R("dcx")
            sepy = dpby - dpay + (rby - ray) + R("dcy")
            cdx = (st["vbx"] - st["wb"] * rby) - (st["vax"] - st["wa"] * ray)
            cdy = (st["vby"] + st["wb"] * rbx) - (st["vay"] + st["wa"] * rax)
            bx_ = cdx + lin_on * R("sb") * sepx
            by_ = cdy + lin_on * R("sb") * sepy
            mscl = 1.0 + lin_on * (R("sm") - 1.0)
            iscl = lin_on * R("si")
            k11 = ma + mb + ray * ray * ia + rby * rby * ib
            k12 = -ray * rax * ia - rby * rbx * ib
            k22 = ma + mb + rax * rax * ia + rbx * rbx * ib
            det = k11 * k22 - k12 * k12
            invd = jnp.where(det != 0.0, 1.0 / jnp.where(det != 0.0, det, 1.0),
                             0.0)
            sx = invd * (k22 * bx_ - k12 * by_)
            sy = invd * (k11 * by_ - k12 * bx_)
            dix = -mscl * sx - iscl * imp_x
            diy = -mscl * sy - iscl * imp_y
            acc["ix"] = imp_x + dix
            acc["iy"] = imp_y + diy
            apply_lin(dix, diy, cross(rax, ray, dix, diy),
                      cross(rbx, rby, dix, diy))

        run_branch(warm, solve)

    elif jtype == JOINT_MOTOR:
        rel_angle = _atan2(rels, relc)

        def warm():
            px, py = imp_x + s2x, imp_y + s2y
            am2 = ang_i + spr_i
            apply_lin(px, py, cross(rax, ray, px, py) + am2,
                      cross(rbx, rby, px, py) + am2)

        def solve():
            # angular spring (ref MotorJoint.cs:127-143)
            aspr = R("f_spring")
            dimp = (-R("am_") * axial
                    * (st["wb"] - st["wa"] + R("ab") * rel_angle)
                    - R("ai") * spr_i)
            max_i = h * R("max2")
            new_aspr = jnp.clip(spr_i + dimp, -max_i, max_i)
            dimp = (new_aspr - spr_i) * aspr
            acc["spring"] = jnp.where(aspr > 0, new_aspr, spr_i)
            apply_ang(dimp)
            # angular velocity drive; f_motor = max_velocity_torque>0
            avel = R("f_motor")
            dimp = -axial * (st["wb"] - st["wa"] - R("speed"))
            max_i = h * R("max1")
            new_avel = jnp.clip(ang_i + dimp, -max_i, max_i)
            dimp = (new_avel - ang_i) * avel
            acc["angular"] = jnp.where(avel > 0, new_avel, ang_i)
            apply_ang(dimp)

            k11 = ma + mb + ray * ray * ia + rby * rby * ib
            k12 = -ray * rax * ia - rby * rbx * ib
            k22 = ma + mb + rax * rax * ia + rbx * rbx * ib
            det = k11 * k22 - k12 * k12
            invd = jnp.where(det != 0.0, 1.0 / jnp.where(det != 0.0, det, 1.0),
                             0.0)

            def solve22(bx_, by_):
                return (invd * (k22 * bx_ - k12 * by_),
                        invd * (k11 * by_ - k12 * bx_))

            # linear spring toward zero separation; f_limit = lspr flag
            lspr = R("f_limit")
            sepx = dpbx - dpax + (rbx - rax) + R("dcx")
            sepy = dpby - dpay + (rby - ray) + R("dcy")
            cdx = ((st["vbx"] - st["wb"] * rby)
                   - (st["vax"] - st["wa"] * ray) + R("sb") * sepx)
            cdy = ((st["vby"] + st["wb"] * rbx)
                   - (st["vay"] + st["wa"] * rax) + R("sb") * sepy)
            sx, sy = solve22(cdx, cdy)
            dix = -R("sm") * sx - R("si") * s2x
            diy = -R("sm") * sy - R("si") * s2y
            nx_, ny_ = s2x + dix, s2y + diy
            max_i = h * R("max3")
            ln = jnp.sqrt(nx_ * nx_ + ny_ * ny_)
            scale = jnp.where(ln > max_i,
                              max_i / jnp.where(ln > 0.0, ln, 1.0), 1.0)
            nx_, ny_ = nx_ * scale, ny_ * scale
            dix = (nx_ - s2x) * lspr
            diy = (ny_ - s2y) * lspr
            acc["s2x"] = jnp.where(lspr > 0, nx_, s2x)
            acc["s2y"] = jnp.where(lspr > 0, ny_, s2y)
            apply_lin(dix, diy, cross(rax, ray, dix, diy),
                      cross(rbx, rby, dix, diy))

            # linear velocity drive; f_aux = max_velocity_force>0
            lvel = R("f_aux")
            cdx = ((st["vbx"] - st["wb"] * rby)
                   - (st["vax"] - st["wa"] * ray) - R("lvx"))
            cdy = ((st["vby"] + st["wb"] * rbx)
                   - (st["vay"] + st["wa"] * rax) - R("lvy"))
            sx, sy = solve22(cdx, cdy)
            nx_, ny_ = imp_x - sx, imp_y - sy
            max_i = h * R("max4")
            ln = jnp.sqrt(nx_ * nx_ + ny_ * ny_)
            scale = jnp.where(ln > max_i,
                              max_i / jnp.where(ln > 0.0, ln, 1.0), 1.0)
            nx_, ny_ = nx_ * scale, ny_ * scale
            dix = (nx_ - imp_x) * lvel
            diy = (ny_ - imp_y) * lvel
            acc["ix"] = jnp.where(lvel > 0, nx_, imp_x)
            acc["iy"] = jnp.where(lvel > 0, ny_, imp_y)
            apply_lin(dix, diy, cross(rax, ray, dix, diy),
                      cross(rbx, rby, dix, diy))

        run_branch(warm, solve)

    elif jtype in (JOINT_PRISMATIC, JOINT_WHEEL):
        # world axis = rot(dqa * fa_q, (1,0)) = the qa unit vector itself
        axx, axy = qac, qas
        perpx, perpy = -axy, axx
        a1 = cross(rax + dx, ray + dy, axx, axy)
        a2 = cross(rbx, rby, axx, axy)
        s1 = cross(rax + dx, ray + dy, perpx, perpy)
        s2 = cross(rbx, rby, perpx, perpy)
        translation = axx * dx + axy * dy
        ka = ma + mb + ia * a1 * a1 + ib * a2 * a2
        ax_mass = jnp.where(ka > 0.0, 1.0 / jnp.where(ka > 0.0, ka, 1.0), 0.0)

        def adot():
            base = (axx * (st["vbx"] - st["vax"])
                    + axy * (st["vby"] - st["vay"]))
            return base + a2 * st["wb"] - a1 * st["wa"]

        def apply_axial(di):
            px, py = di * axx, di * axy
            st["vax"] = st["vax"] - ma * px
            st["vay"] = st["vay"] - ma * py
            st["wa"] = st["wa"] - ia * di * a1
            st["vbx"] = st["vbx"] + mb * px
            st["vby"] = st["vby"] + mb * py
            st["wb"] = st["wb"] + ib * di * a2

        if jtype == JOINT_PRISMATIC:
            def warm():
                axl = spr_i + mot_i + low_i - up_i
                px = axl * axx + imp_x * perpx
                py = axl * axy + imp_x * perpy
                la = axl * a1 + imp_x * s1 + imp_y
                lb = axl * a2 + imp_x * s2 + imp_y
                apply_lin(px, py, la, lb)

            def solve():
                rel_angle = _atan2(rels, relc)
                # spring
                spr = R("f_spring")
                cspr = translation - R("target")
                dimp = (-R("sm") * ax_mass * (adot() + R("sb") * cspr)
                        - R("si") * spr_i) * spr
                acc["spring"] = spr_i + dimp
                apply_axial(dimp)
                # motor
                mot = R("f_motor")
                dimp = ax_mass * (R("speed") - adot())
                max_i = h * R("max1")
                new_mot = jnp.clip(mot_i + dimp, -max_i, max_i)
                dimp = (new_mot - mot_i) * mot
                acc["motor"] = jnp.where(mot > 0, new_mot, mot_i)
                apply_axial(dimp)
                # limits
                lim = R("f_limit")
                new_low, dlow = soft_limit(translation - R("lower"), adot(),
                                           ax_mass, low_i)
                dlow = dlow * lim
                acc["lower"] = jnp.where(lim > 0, new_low, low_i)
                apply_axial(dlow)
                new_up, dup = soft_limit(R("upper") - translation, -adot(),
                                         ax_mass, up_i)
                dup = dup * lim
                acc["upper"] = jnp.where(lim > 0, new_up, up_i)
                apply_axial(-dup)
                # perp + angle 2x2 block
                cdot1 = (perpx * (st["vbx"] - st["vax"])
                         + perpy * (st["vby"] - st["vay"])
                         + s2 * st["wb"] - s1 * st["wa"])
                cdot2 = st["wb"] - st["wa"]
                bias1 = bias_f * R("cb") * (perpx * dx + perpy * dy)
                bias2 = bias_f * R("cb") * rel_angle
                msc = 1.0 + bias_f * (R("cm") - 1.0)
                isc = bias_f * R("ci")
                k11 = ma + mb + ia * s1 * s1 + ib * s2 * s2
                k12 = ia * s1 + ib * s2
                k22 = ia + ib
                k22 = jnp.where(k22 == 0.0, 1.0, k22)
                det = k11 * k22 - k12 * k12
                invd = jnp.where(det != 0.0,
                                 1.0 / jnp.where(det != 0.0, det, 1.0), 0.0)
                bx_ = cdot1 + bias1
                by_ = cdot2 + bias2
                sx = invd * (k22 * bx_ - k12 * by_)
                sy = invd * (k11 * by_ - k12 * bx_)
                dix = -msc * sx - isc * imp_x
                diy = -msc * sy - isc * imp_y
                acc["ix"] = imp_x + dix
                acc["iy"] = imp_y + diy
                px = dix * perpx
                py = dix * perpy
                apply_lin(px, py, dix * s1 + diy, dix * s2 + diy)

            run_branch(warm, solve)
        else:  # JOINT_WHEEL
            def warm():
                axl = spr_i + low_i - up_i
                px = axl * axx + imp_x * perpx
                py = axl * axy + imp_x * perpy
                la = axl * a1 + imp_x * s1 + mot_i
                lb = axl * a2 + imp_x * s2 + mot_i
                apply_lin(px, py, la, lb)

            def solve():
                km = ia + ib
                motor_mass = jnp.where(
                    km > 0.0, 1.0 / jnp.where(km > 0.0, km, 1.0), 0.0)
                kp = ma + mb + ia * s1 * s1 + ib * s2 * s2
                perp_mass = jnp.where(
                    kp > 0.0, 1.0 / jnp.where(kp > 0.0, kp, 1.0), 0.0)
                # rotational motor
                mot = R("f_motor")
                dimp = -motor_mass * (st["wb"] - st["wa"] - R("speed"))
                max_i = h * R("max1")
                new_mot = jnp.clip(mot_i + dimp, -max_i, max_i)
                dimp = (new_mot - mot_i) * mot
                acc["motor"] = jnp.where(mot > 0, new_mot, mot_i)
                apply_ang(dimp)
                # suspension spring
                spr = R("f_spring")
                dimp = (-R("sm") * ax_mass
                        * (adot() + R("sb") * translation)
                        - R("si") * spr_i) * spr
                acc["spring"] = spr_i + dimp
                apply_axial(dimp)
                # limits
                lim = R("f_limit")
                new_low, dlow = soft_limit(translation - R("lower"), adot(),
                                           ax_mass, low_i)
                dlow = dlow * lim
                acc["lower"] = jnp.where(lim > 0, new_low, low_i)
                apply_axial(dlow)
                new_up, dup = soft_limit(R("upper") - translation, -adot(),
                                         ax_mass, up_i)
                dup = dup * lim
                acc["upper"] = jnp.where(lim > 0, new_up, up_i)
                apply_axial(-dup)
                # perpendicular point-on-line
                cdot = (perpx * (st["vbx"] - st["vax"])
                        + perpy * (st["vby"] - st["vay"])
                        + s2 * st["wb"] - s1 * st["wa"])
                bias = bias_f * R("cb") * (perpx * dx + perpy * dy)
                msc = 1.0 + bias_f * (R("cm") - 1.0)
                isc = bias_f * R("ci")
                dimp = -msc * perp_mass * (cdot + bias) - isc * imp_x
                acc["ix"] = imp_x + dimp
                px = dimp * perpx
                py = dimp * perpy
                apply_lin(px, py, dimp * s1, dimp * s2)

            run_branch(warm, solve)

    elif jtype == JOINT_MOUSE:
        def warm():
            apply_lin(imp_x, imp_y, jnp.zeros_like(imp_x),
                      cross(rbx, rby, imp_x, imp_y))

        def solve():
            # target drag on body B (ref joints.py mouse block):
            # c = delta_center - fa_p + rb + dp_b
            cx = R("dcx") - R("fapx") + rbx + dpbx
            cy = R("dcy") - R("fapy") + rby + dpby
            cdx = st["vbx"] - st["wb"] * rby + R("sb") * cx
            cdy = st["vby"] + st["wb"] * rbx + R("sb") * cy
            k11 = mb + rby * rby * ib
            k12 = -rby * rbx * ib
            k22 = mb + rbx * rbx * ib
            det = k11 * k22 - k12 * k12
            invd = jnp.where(det != 0.0, 1.0 / jnp.where(det != 0.0, det, 1.0),
                             0.0)
            sx = invd * (k22 * cdx - k12 * cdy)
            sy = invd * (k11 * cdy - k12 * cdx)
            dix = -R("sm") * sx - R("si") * imp_x
            diy = -R("sm") * sy - R("si") * imp_y
            nx_, ny_ = imp_x + dix, imp_y + diy
            max_i = h * R("max1")
            ln = jnp.sqrt(nx_ * nx_ + ny_ * ny_)
            scale = jnp.where((ln > max_i) & (max_i > 0),
                              max_i / jnp.where(ln > 0.0, ln, 1.0), 1.0)
            nx_, ny_ = nx_ * scale, ny_ * scale
            acc["ix"] = nx_
            acc["iy"] = ny_
            dix, diy = nx_ - imp_x, ny_ - imp_y
            st["vbx"] = st["vbx"] + mb * dix
            st["vby"] = st["vby"] + mb * diy
            st["wb"] = st["wb"] + ib * cross(rbx, rby, dix, diy)

        run_branch(warm, solve)
    else:
        raise ValueError(f"joint type {jtype} has no kernel sweep")

    dva = jnp.concatenate([
        (st["vax"] - vax) * live, (st["vay"] - vay) * live,
        (st["wa"] - wa) * live], axis=0)
    dvb = jnp.concatenate([
        (st["vbx"] - vbx) * live, (st["vby"] - vby) * live,
        (st["wb"] - wb) * live], axis=0)
    acc_rows = [None] * len(_JA)
    for k, v in _JA.items():
        acc_rows[v] = jnp.where(live > 0, acc[k], a[v:v + 1])
    acc_new = jnp.concatenate(acc_rows, axis=0)
    return dva, dvb, acc_new


def _unwind(angle):
    """Map angle into [-pi, pi) without jnp.mod (floor-based)."""
    two_pi = 6.283185307179586
    x = (angle + 3.141592653589793) / two_pi
    return (x - jnp.floor(x)) * two_pi - 3.141592653589793


def _tiled_kernel(nsub: int, w: int, tb: int, jtypes: tuple, stream: bool,
                  halves: int,
                  win_ref, tlo_ref, thi_ref, nact_ref, wrest_ref, kind_ref,
                  scal_ref, idx_ref, data_ref, acc_ref,
                  body_ref, param_ref,
                  out_body_ref, out_acc_ref,
                  acc_vmem_ref=None, sem_in=None, sem_out=None):
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
        if not stream:
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
    run = (wi < nact_ref[0]) & ((p != 3) | (wrest_ref[wi] > 0))

    if stream:
        # acc lives in HBM (aliased in->out buffer); output blocks may not
        # be revisited across grid stages, so the auto-pipelined block path
        # cannot carry a read-modify-write accumulator. DOUBLE-BUFFERED
        # manual DMA instead: each visit k prefetches visit k+1's window
        # slice into the other scratch slot before waiting on its own, so
        # the fetch latency hides under this visit's compute. Safe because
        # consecutive visits touch DIFFERENT windows (distinct layout
        # slices) whenever nact > 1; at nact == 1 the same window repeats
        # back-to-back (its input is this visit's output), so prefetch is
        # disabled and every visit does a blocking self-fetch. The
        # write-back stays blocking, which keeps both scratch slots free
        # of outstanding writes by the time they are re-fetched into.
        # Visits are gated on wi < nact ONLY (not the restitution skip):
        # stage-3 windows without restitution still ride the DMA chain
        # (fetch, no compute, no write-back) so the prefetch handoff never
        # breaks.
        nact_v = nact_ref[0]
        stages_total = 3 * nsub + 1
        kvis = s * nact_v + wi                # visit counter (run_dma steps)
        parity = lax.rem(kvis, 2)
        run_dma = wi < nact_v
        first_vis = (s == 0) & (wi == 0)
        last_vis = (s == stages_total - 1) & (wi == nact_v - 1)
        col_s = pl.multiple_of(win_ref[wi] * w, w)

        def in_copy(slot, c):
            return pltpu.make_async_copy(
                out_acc_ref.at[:, pl.ds(pl.multiple_of(c, w), w)],
                acc_vmem_ref.at[slot], sem_in.at[slot])

        @pl.when(run_dma & (first_vis | (nact_v == 1)))
        def _self_fetch():
            in_copy(parity, col_s).start()

        nwi = jnp.where(wi + 1 < nact_v, wi + 1, 0)
        ncol = win_ref[nwi] * w

        @pl.when(run_dma & (nact_v > 1) & ~last_vis)
        def _prefetch():
            in_copy(1 - parity, ncol).start()

        # every started fetch is waited EXACTLY once (also on visits whose
        # compute is skipped by the restitution gate) — a skipped wait
        # would leave a stale semaphore count for a later visit
        @pl.when(run_dma)
        def _wait_in():
            in_copy(parity, col_s).wait()

    @pl.when(run)
    def _sweep():
        col = pl.multiple_of(win_ref[wi] * w, w)
        if stream:
            ia = idx_ref[0:1, :]              # streamed (2, w) block
            ib = idx_ref[1:2, :]
            a = acc_vmem_ref[parity]
        else:
            ia = idx_ref[0:1, pl.ds(col, w)]
            ib = idx_ref[1:2, pl.ds(col, w)]
            a = out_acc_ref[:, pl.ds(col, w)]  # resident accumulator window
        d = data_ref[:]                       # streamed (NF, w) window

        iota_tb = jax.lax.broadcasted_iota(jnp.int32, (tb, 1), 0)
        # CONTACT warm start (p==0) never reads body state — its deltas are
        # pure functions of stored impulses — so skip the gather loop
        # entirely; JOINT warm start needs anchors (dq) so it gathers
        kind = kind_ref[wi] if jtypes else jnp.int32(0)
        skip_gather = ((p == 0) & (kind == 0)) if jtypes else (p == 0)

        # a- and b-side one-hots built and contracted as ONE (tb, 2hw) op
        # per tile: sweep cost is dominated by per-op issue overhead, not
        # element count (tb=256 with 2x the tile iterations measures much
        # slower than tb=512 at identical total elements).
        # halves > 1: the window is `halves` color-chunk-aligned 128-lane
        # sub-windows sharing one grid step (grid overhead is ~1us/step);
        # each half gathers/scatters its OWN body-tile range so spans stay
        # as tight as 128-lane windows (a fused 2w-wide gather is what made
        # the plain wide-window variant regress). Solve math runs fused on
        # the full w lanes — it is elementwise across lanes.
        hw = w // halves
        iab_hs, bounds = [], []
        st_hs = []
        for hh in range(halves):
            ia_h = ia[:, hh * hw:(hh + 1) * hw] if halves > 1 else ia
            ib_h = ib[:, hh * hw:(hh + 1) * hw] if halves > 1 else ib
            iab_h = jnp.concatenate([ia_h, ib_h], axis=1)    # (1, 2hw)
            tlo_h = tlo_ref[wi * halves + hh]
            thi_h = thi_ref[wi * halves + hh]
            iab_hs.append(iab_h)
            bounds.append((tlo_h, thi_h))

            def gather_tile(t, st, _iab=iab_h):
                base = pl.multiple_of(t * tb, tb)
                bt = out_body_ref[:, pl.ds(base, tb)]
                oh = jnp.where(iota_tb + base == _iab, 1.0, 0.0)  # (tb, 2hw)
                return st + dotf(bt, oh)

            gthi_h = jnp.where(skip_gather, tlo_h, thi_h)
            st_hs.append(lax.fori_loop(tlo_h, gthi_h, gather_tile,
                                       jnp.zeros((8, 2 * hw), jnp.float32)))
        if halves == 1:
            st_a, st_b = st_hs[0][:, :w], st_hs[0][:, w:]
        else:
            st_a = jnp.concatenate([s_[:, :hw] for s_ in st_hs], axis=1)
            st_b = jnp.concatenate([s_[:, hw:] for s_ in st_hs], axis=1)

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
                    jnp.concatenate([dvbx, dvby, dwb], 0), a[:NA])

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
                 roll + dl, a[7:NA]], 0)
            dva = jnp.concatenate(
                [vax - st_a[0:1], vay - st_a[1:2], wa - st_a[2:3]], 0)
            dvb = jnp.concatenate(
                [vbx - st_b[0:1], vby - st_b[1:2], wb - st_b[2:3]], 0)
            return dva, dvb, acc_new

        def contact_fn(_):
            return lax.cond(p == 0, warm_fn, solve_fn, None)

        if jtypes:
            # kind-pure window dispatch: nested conds over the trace-time
            # present joint types, contacts as the final else branch
            bias_fj = jnp.where(p == 1, 1.0, 0.0)

            def make_branch(t, els):
                def joint_fn(_):
                    return _joint_sweep(t, p, bias_fj, d, a, ia, st_a, st_b,
                                        h, inv_h)

                return lambda op: lax.cond(kind == 1 + t, joint_fn, els, op)

            dispatch = contact_fn
            for t in jtypes:
                dispatch = make_branch(t, dispatch)
            dva, dvb, acc_new = dispatch(None)
        else:
            dva, dvb, acc_new = contact_fn(None)
        if stream:
            # scratch/HBM rows are padded to NA_PAD for DMA tiling; rows
            # NA.. carry don't-care padding
            acc_vmem_ref[parity] = jnp.concatenate([acc_new, a[NA:]], 0)
            copy_out = pltpu.make_async_copy(
                acc_vmem_ref.at[parity], out_acc_ref.at[:, pl.ds(col, w)],
                sem_out)
            copy_out.start()
            copy_out.wait()
        else:
            out_acc_ref[:, pl.ds(col, w)] = acc_new
        for hh in range(halves):
            dva_h = dva[:, hh * hw:(hh + 1) * hw] if halves > 1 else dva
            dvb_h = dvb[:, hh * hw:(hh + 1) * hw] if halves > 1 else dvb
            dvab_h = jnp.concatenate([dva_h, dvb_h], axis=1)  # (3, 2hw)
            iab_h = iab_hs[hh]
            tlo_h, thi_h = bounds[hh]

            def scatter_tile(t, _, _iab=iab_h, _dvab=dvab_h):
                base = pl.multiple_of(t * tb, tb)
                oh = jnp.where(iota_tb + base == _iab, 1.0, 0.0)  # (tb, 2hw)
                upd = dot_t(_dvab, oh)                   # (3, tb)
                out_body_ref[0:3, pl.ds(base, tb)] = (
                    out_body_ref[0:3, pl.ds(base, tb)] + upd)
                return 0

            lax.fori_loop(tlo_h, thi_h, scatter_tile, 0)


def window_metadata(live, body_a, body_b, dyn_a, dyn_b, layout_len: int,
                    w: int, tb: int = DEFAULT_BODY_TILE, restitution=None,
                    kind=None, key=None, enumerate_all: bool = False,
                    halves: int = 1):
    """Active-window list + per-window body-tile ranges.

    halves > 1: tile ranges are computed per 1/halves sub-window and
    returned FLATTENED as (n_win * halves,) arrays indexed
    [window * halves + half] — the kernel gathers/scatters each half with
    its own (tight) range while the grid advances one w-wide window per
    step. Empty halves get tlo == thi == 0 (their loops vanish).

    live: (L,) bool; body_a/b: (L,) i32; dyn_a/b: (L,) bool (dynamic
    endpoint — only dynamic bodies bound the gather tile range; statics
    read as zeros == identity via the shifted-dq representation).
    restitution: optional (L,) — windows with no restitution lane skip the
    restitution stage in-kernel.
    kind: optional (L,) i32 lane kind (0 = contact, 1+type = joint); windows
    are kind-pure, so the per-window max IS the kind.
    key: optional (L,) i32 visit-order key. Without it, windows are visited
    in layout order (pure contact layouts are already color-ordered). With
    it, active windows are sorted by (key, window index) — used when joint
    windows live in a separate layout region but must be solved inside
    their color's Gauss-Seidel slot."""
    n_win = layout_len // w
    assert n_win * w == layout_len  # window_width divides every region

    # windows are CONTIGUOUS fixed-width lane ranges, so every per-window
    # reduction is a reshape + axis reduce — pure vector work, no scatter
    # (the old (L,) scatter-max cost ~1 ms at 64k layout rows)
    big = jnp.int32(2**30)
    lo_cand = jnp.minimum(jnp.where(dyn_a, body_a, big),
                          jnp.where(dyn_b, body_b, big)) // tb
    hi_cand = jnp.maximum(jnp.where(dyn_a, body_a, -1),
                          jnp.where(dyn_b, body_b, -1)) // tb + 1

    hw = w // halves
    assert hw * halves == w

    def wmax(x, fill):
        return jnp.max(jnp.where(live, x, fill).reshape(n_win, w), axis=1)

    def hmax(x, fill):
        # per-half reduce: (n_win, halves)
        return jnp.max(jnp.where(live, x, fill).reshape(n_win, halves, hw),
                       axis=2)

    occ = jnp.any(live.reshape(n_win, w), axis=1).astype(jnp.int32)
    thi_w = jnp.maximum(hmax(hi_cand, 0), 0)          # (n_win, halves)
    wrest_w = (jnp.ones(n_win, jnp.int32) if restitution is None
               else wmax((live & (restitution != 0.0)).astype(jnp.int32), 0))
    tlo_w = -hmax(-lo_cand, -big)
    kind_w = (wmax(kind, 0) if kind is not None
              else jnp.zeros(n_win, jnp.int32))

    nact = jnp.sum(occ).astype(jnp.int32)
    if key is None:
        pos = jnp.cumsum(occ) - 1
        wl = jnp.zeros(n_win, jnp.int32).at[
            jnp.where(occ > 0, pos, n_win)].set(
            jnp.arange(n_win, dtype=jnp.int32), mode="drop")
    else:
        key_w = jnp.maximum(wmax(key, 0), 0)
        sortk = jnp.where(occ > 0,
                          key_w * n_win + jnp.arange(n_win, dtype=jnp.int32),
                          jnp.int32(jnp.iinfo(jnp.int32).max))
        wl = jnp.argsort(sortk).astype(jnp.int32)
    if enumerate_all:
        # the streamed-acc kernel visits EVERY window exactly once per
        # stage (inactive ones write-through), so the tail must enumerate
        # the inactive windows instead of repeating the last active one
        if key is None:
            posi = nact + jnp.cumsum(occ == 0) - 1
            wl = wl.at[jnp.where(occ == 0, posi, n_win)].set(
                jnp.arange(n_win, dtype=jnp.int32), mode="drop")
        # (argsort branch already places each inactive window once, sorted
        # to the tail)
    else:
        last = wl[jnp.maximum(nact - 1, 0)]
        wl = jnp.where(jnp.arange(n_win) < nact, wl, last)

    tlo = jnp.minimum(tlo_w[wl], thi_w[wl]).reshape(-1)  # (n_win*halves,)
    thi = thi_w[wl].reshape(-1)
    wrest = wrest_w[wl]
    return wl, tlo, thi, nact[None], wrest, kind_w[wl]


def max_active_windows(n_win: int, max_pairs: int, max_colors: int,
                       ovf_cap: int, w: int, max_joints: int = 0,
                       n_joint_groups: int = 0) -> int:
    """Static bound on the active-window count: each live lane occupies one
    window, plus at most one partial window per color bucket and the
    overflow tail, plus (when joints ride the kernel) one partial window
    per non-empty (color, type) joint group. Shrinks the grid's window
    dimension (skipped grid steps still cost ~1us each)."""
    jw = ((max_joints + w - 1) // w + min(n_joint_groups, max_joints)
          if max_joints else 0)
    return min(n_win, (max_pairs + w - 1) // w + max_colors + ovf_cap // w
               + jw)


def run_solver_kernel_tiled(nsub, chunk, scalars, idx, data, acc, body,
                            params, win_list, tile_lo, tile_hi, nact, wrest,
                            kinds=None, jtypes: tuple = (),
                            w: int = DEFAULT_WINDOW,
                            tb: int = DEFAULT_BODY_TILE,
                            grid_windows: int | None = None,
                            stream_acc: bool = False,
                            halves: int = 1):
    """Invoke the HBM-streaming tiled kernel. Shapes as run_solver_kernel
    except data may carry NFJ rows when joint windows ride along (jtypes =
    sorted trace-time joint types present); body row 5 (dq.c) must be
    pre-shifted by -1 (see pack_bodies_tiled).

    stream_acc: keep the accumulator in HBM (the acc input is aliased to
    the acc output) and move each visited window's slice in/out of a VMEM
    scratch by explicit DMA; idx streams as per-window blocks. This drops
    the layout-length term from the VMEM budget (fits_tiled_streamed), so
    arbitrarily long layouts (1024-world batches) ride the kernel.
    Unvisited windows keep their impulses through the aliasing."""
    L = data.shape[1]
    nrows = data.shape[0]
    nb = body.shape[1]
    assert L % w == 0 and chunk % w == 0
    # sub-window halving is contact-only (joint windows are kind-pure at w
    # granularity) and rides the resident-acc path
    assert halves == 1 or (not stream_acc and not jtypes)
    nb_pad = ((max(nb, 128) + tb - 1) // tb) * tb
    if nb_pad != nb:
        body = jnp.pad(body, ((0, 0), (0, nb_pad - nb)))
        params = jnp.pad(params, ((0, 0), (0, nb_pad - nb)))
    na_rows = NA_PAD if stream_acc else NA
    if stream_acc:
        acc = jnp.pad(acc, ((0, NA_PAD - NA), (0, 0)))
    n_win = L // w
    stages = 3 * nsub + 1
    gw = n_win if grid_windows is None else min(grid_windows, n_win)
    if kinds is None:
        kinds = jnp.zeros_like(win_list)

    winmap = lambda s, wi, win_r, lo_r, hi_r, na_r, re_r, kd_r: (
        0, win_r[wi])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(stages, gw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),    # scalars
            (pl.BlockSpec((2, w), winmap, memory_space=pltpu.VMEM)
             if stream_acc else
             pl.BlockSpec(memory_space=pltpu.VMEM)),  # idx
            pl.BlockSpec(                             # data: streamed window
                (nrows, w), winmap, memory_space=pltpu.VMEM),
            (pl.BlockSpec(memory_space=pltpu.ANY)
             if stream_acc else
             pl.BlockSpec(memory_space=pltpu.VMEM)),  # acc
            pl.BlockSpec(memory_space=pltpu.VMEM),    # body (initial)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # params
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   (pl.BlockSpec(memory_space=pltpu.ANY)
                    if stream_acc else
                    pl.BlockSpec(memory_space=pltpu.VMEM))),
        scratch_shapes=([pltpu.VMEM((2, NA_PAD, w), jnp.float32),
                         pltpu.SemaphoreType.DMA((2,)),
                         pltpu.SemaphoreType.DMA]
                        if stream_acc else []),
    )
    kern = functools.partial(_tiled_kernel, nsub, w, tb, tuple(jtypes),
                             stream_acc, halves)
    out_body, out_acc = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((8, nb_pad), jnp.float32),
                   jax.ShapeDtypeStruct((na_rows, L), jnp.float32)),
        # the HBM accumulator buffer is read-modify-written in place; the
        # alias also preserves unvisited windows' stored impulses
        input_output_aliases={9: 1} if stream_acc else {},
    )(win_list, tile_lo, tile_hi, nact, wrest, kinds,
      scalars, idx, data, acc, body, params)
    if nb_pad != nb:
        out_body = out_body[:, :nb]
    if stream_acc:
        out_acc = out_acc[:NA]
    return out_body, out_acc


def pack_joint_rows(jn, jc):
    """Joints state + prepared JointConstraints -> ((J, NFJ) data, (J, NA)
    acc, (J, 2) idx) column-packed to the _JF/_JA row tables, in JOINT-lane
    order (the caller scatters into the kind-pure joint windows of the
    layout). Predicate flags are TYPE-RESOLVED here so the kernel's
    per-type branches read plain 0/1 rows (the trace-time analog of the
    per-joint enable checks in ref src/joints/*.cs)."""
    from .state import (JOINT_DISTANCE, JOINT_MOTOR, JOINT_PRISMATIC,
                        JOINT_REVOLUTE, JOINT_WELD, JOINT_WHEEL)

    ty = jn.type
    f1 = lambda c: c.astype(jnp.float32)
    fixed_rot = (jc.inv_i_a + jc.inv_i_b) == 0.0
    spring_mode_d = jn.enable_spring & ((jn.lower < jn.upper)
                                        | ~jn.enable_limit)

    def bytype(dist, mot, pris, rev, weld, wheel, mouse=None, default=0.0):
        out = jnp.where(ty == JOINT_DISTANCE, dist,
              jnp.where(ty == JOINT_MOTOR, mot,
              jnp.where(ty == JOINT_PRISMATIC, pris,
              jnp.where(ty == JOINT_REVOLUTE, rev,
              jnp.where(ty == JOINT_WELD, weld,
              jnp.where(ty == JOINT_WHEEL, wheel, default))))))
        if mouse is not None:
            from .state import JOINT_MOUSE
            out = jnp.where(ty == JOINT_MOUSE, mouse, out)
        return out

    z = jnp.zeros_like(jn.hertz)
    f_spring = bytype(
        f1(spring_mode_d),
        f1((jn.max_spring_torque > 0.0) & (jn.angular_hertz > 0.0)),
        f1(jn.enable_spring),
        f1(jn.enable_spring & ~fixed_rot),
        f1(jn.hertz > 0.0),
        f1(jn.enable_spring))
    f_motor = bytype(
        f1(spring_mode_d & jn.enable_motor),
        f1(jn.max_velocity_torque > 0.0),
        f1(jn.enable_motor),
        f1(jn.enable_motor & ~fixed_rot),
        f1(jn.angular_hertz > 0.0),
        f1(jn.enable_motor & ~fixed_rot))
    f_limit = bytype(
        f1(spring_mode_d & jn.enable_limit),
        f1((jn.max_spring_force > 0.0) & (jn.hertz > 0.0)),
        f1(jn.enable_limit),
        f1(jn.enable_limit & ~fixed_rot),
        z,
        f1(jn.enable_limit))
    f_aux = bytype(
        f1(jn.hertz > 0.0),
        f1(jn.max_velocity_force > 0.0),
        z, z, z, z)
    target = bytype(jn.length, z, jn.spring_target, jn.spring_target, z, z)
    speed = bytype(jn.motor_speed, jn.angular_velocity, jn.motor_speed,
                   jn.motor_speed, z, jn.motor_speed)
    max1 = bytype(jn.max_motor_force, jn.max_velocity_torque,
                  jn.max_motor_force, jn.max_motor_force, z,
                  jn.max_motor_force, mouse=jn.max_velocity_force)
    max2 = bytype(jn.lower_spring_force, jn.max_spring_torque, z, z, z, z)
    max3 = bytype(jn.upper_spring_force, jn.max_spring_force, z, z, z, z)
    max4 = bytype(z, jn.max_velocity_force, z, z, z, z)

    live = jc.color >= 0
    livef = live.astype(jnp.float32)
    data = jnp.stack([
        jc.inv_mass_a * livef, jc.inv_mass_b * livef,
        jc.inv_i_a * livef, jc.inv_i_b * livef,
        jc.fa_p[:, 0], jc.fa_p[:, 1], jc.fa_q[:, 0], jc.fa_q[:, 1],
        jc.fb_p[:, 0], jc.fb_p[:, 1], jc.fb_q[:, 0], jc.fb_q[:, 1],
        jc.delta_center[:, 0], jc.delta_center[:, 1], jc.axial_mass,
        jc.spring_soft[:, 0], jc.spring_soft[:, 1], jc.spring_soft[:, 2],
        jc.angular_soft[:, 0], jc.angular_soft[:, 1], jc.angular_soft[:, 2],
        jc.constraint_soft[:, 0], jc.constraint_soft[:, 1],
        jc.constraint_soft[:, 2],
        f_spring, f_motor, f_limit, f_aux,
        jn.lower, jn.upper, target, speed,
        max1, max2, max3,
        jn.linear_velocity[:, 0], jn.linear_velocity[:, 1], max4,
        jnp.ones_like(z),   # jrelax (reserved for overflow mass-splitting)
    ], axis=1)
    acc = jnp.stack([
        jc.impulse[:, 0], jc.impulse[:, 1],
        jc.spring_impulse, jc.motor_impulse,
        jc.lower_impulse, jc.upper_impulse, jc.angular_impulse,
        jc.spring_impulse2[:, 0], jc.spring_impulse2[:, 1],
    ], axis=1)
    sentinel = jnp.int32(-1)
    idx = jnp.stack([
        jnp.where(live, jc.body_a, sentinel),
        jnp.where(live, jc.body_b, sentinel),
    ], axis=1)
    return data, acc, idx


def unpack_joint_acc(jc, jacc, active):
    """Write kernel joint accumulators (J, NA) back into JointConstraints."""
    def sel(new, old):
        m = active[:, None] if old.ndim == 2 else active
        return jnp.where(m, new, old)

    return jc._replace(
        impulse=sel(jacc[:, 0:2], jc.impulse),
        spring_impulse=sel(jacc[:, _JA["spring"]], jc.spring_impulse),
        motor_impulse=sel(jacc[:, _JA["motor"]], jc.motor_impulse),
        lower_impulse=sel(jacc[:, _JA["lower"]], jc.lower_impulse),
        upper_impulse=sel(jacc[:, _JA["upper"]], jc.upper_impulse),
        angular_impulse=sel(jacc[:, _JA["angular"]], jc.angular_impulse),
        spring_impulse2=sel(jacc[:, _JA["s2x"]:_JA["s2y"] + 1],
                            jc.spring_impulse2),
    )


def pack_bodies_tiled(bodies, bs, tuning, h, inv_dt):
    """pack_bodies with the dq.c row shifted by -1 (identity == zeros), so
    out-of-tile-range bodies gather as exact static/identity state."""
    body, params = pack_bodies(bodies, bs, tuning, h, inv_dt)
    return body.at[5, :].add(-1.0), params


def unpack_bodies_tiled(bs, body):
    return unpack_bodies(bs, body.at[5, :].add(1.0))
