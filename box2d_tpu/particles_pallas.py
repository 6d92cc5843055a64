"""Fused particle window kernels (TPU Pallas).

The sorted-space particle pipeline's hot ops are the row-above neighbor
window gather/scatters (~15 ns per index on TPU: at 100k particles the
measured cost is ~100 ms/step, round-3 BASELINE.md). These kernels remove
every per-index op from the pair passes:

- GATHER-ONLY: every pair interaction here is symmetric (weight) or
  antisymmetric (pressure, damping), so instead of accumulating a- and
  b-sides with scatters, each particle accumulates only its OWN side and
  every pair is visited once from each side. No scatter exists anywhere;
  each block writes only its own rows.
- DENSE MASKED BANDS: particles are processed in blocks of B sorted lanes.
  All neighbors of a block live in three CONTIGUOUS bands of the sorted
  table (same row / row above / row below — window starts are monotone in
  the sorted order), DMA'd to VMEM. The kernel evaluates the interaction
  against EVERY band lane, masked by (row delta, distance) — a (B, L)
  vectorized compute that replaces per-index gathers outright. Each band
  exclusively owns one row delta, so overlapping bands never double-count.
  Band truncation is detected by lexicographic edge-key checks and
  surfaced in Profile.overflow_particles (never silent).

Same math as ref particle/ParticleSystem.cs — ComputeWeight :1787-1806,
SolvePressure :1807-1879, SolveDamping :1880-1915, window scan
FindContacts :1096-1117 — on a TPU-native schedule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B_BLK = 256     # particles per block
BS = 512        # same-row band lanes (block - 128 .. block + 256)
BU = 768        # row-above / row-below band lanes

PH_WEIGHT, PH_PRESSURE, PH_DAMPING = 0, 1, 2

# sorted-table rows (the (8, n) transposed layout DMA'd per band)
_R_PX, _R_PY, _R_ROW, _R_COL, _R_P0, _R_P1 = 0, 1, 2, 3, 4, 5


def _dot_t(a, b):
    """(B, L) x (C, L) -> (B, C), contraction over lanes, f32-exact."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _kernel(offs_ref, scal_ref, tab_ref, out_ref, band_s, band_u, band_d,
            sems, *, phase: int, n_blocks: int):
    # DOUBLE-BUFFERED band DMA: block i's three bands were prefetched while
    # block i-1 computed (slot = i % 2); this visit starts block i+1's
    # fetches into the other slot before waiting on its own. Safe: the grid
    # is sequential, block i-1 (the other slot's last reader) has finished,
    # and band scratch is read-only to the compute.
    i = pl.program_id(0)
    slot = lax.rem(i, 2)

    def band_copies(blk, sl):
        s_off = pl.multiple_of(offs_ref[blk, 0], 128)
        u_off = pl.multiple_of(offs_ref[blk, 1], 128)
        d_off = pl.multiple_of(offs_ref[blk, 2], 128)
        out = []
        for band, off, L in ((band_s, s_off, BS), (band_u, u_off, BU),
                             (band_d, d_off, BU)):
            out.append(pltpu.make_async_copy(
                tab_ref.at[:, pl.ds(off, L)], band.at[sl],
                sems.at[sl, len(out)]))
        return out

    @pl.when(i == 0)
    def _self_fetch():
        for c in band_copies(0, slot):
            c.start()

    @pl.when(i + 1 < n_blocks)
    def _prefetch():
        nxt = jnp.minimum(i + 1, n_blocks - 1)
        for c in band_copies(nxt, 1 - slot):
            c.start()

    copies = band_copies(i, slot)
    band_s = band_s.at[slot]
    band_u = band_u.at[slot]
    band_d = band_d.at[slot]
    s_off = pl.multiple_of(offs_ref[i, 0], 128)
    u_off = pl.multiple_of(offs_ref[i, 1], 128)
    d_off = pl.multiple_of(offs_ref[i, 2], 128)

    inv_d = scal_ref[0, 0]       # 1 / diameter
    d2max = scal_ref[0, 1]       # diameter^2
    lin_d = scal_ref[0, 2]
    quad_d = scal_ref[0, 3]
    vel_per_p = scal_ref[0, 4]

    my_l = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, 1), 0)
    gpos = i * B_BLK + my_l                       # (B, 1) global sorted pos

    copies[0].wait()
    # own columns: positional one-hot x band_s (f32 one-hot selection is
    # exact on the MXU: products are 1.0*v and 0.0*v)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, BS), 1)
    oh = jnp.where(iota_s + s_off == gpos, 1.0, 0.0)
    mine = _dot_t(oh, band_s[:, :])               # (B, 8)
    my_px, my_py = mine[:, 0:1], mine[:, 1:2]
    my_row, my_col = mine[:, 2:3], mine[:, 3:4]
    my_p0, my_p1 = mine[:, 4:5], mine[:, 5:6]
    my_alive = my_row < 65536.0                   # dead/pad rows are >= 1e6

    def lex_lt(r1, c1, r2, c2):
        return (r1 < r2) | ((r1 == r2) & (c1 < c2))

    def band_accum(band, off, L, rowd, self_excl):
        b_px = band[_R_PX:_R_PX + 1, :]           # (1, L)
        b_py = band[_R_PY:_R_PY + 1, :]
        b_row = band[_R_ROW:_R_ROW + 1, :]
        dx = b_px - my_px                         # (B, L)
        dy = b_py - my_py
        d2v = dx * dx + dy * dy
        valid = (b_row == my_row + rowd) & (d2v < d2max)
        if self_excl:
            iota_l = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, L), 1)
            valid = valid & ((iota_l + off) != gpos)
        invdist = jnp.where(d2v > 0, jax.lax.rsqrt(jnp.maximum(d2v, 1e-30)),
                            0.0)
        w = 1.0 - d2v * invdist * inv_d           # ref :1091 weight
        wv = jnp.where(valid, w, 0.0)
        if phase == PH_WEIGHT:
            return jnp.sum(wv, axis=1, keepdims=True), jnp.zeros_like(my_px)
        nx = dx * invdist
        ny = dy * invdist
        if phase == PH_PRESSURE:
            b_acc = band[_R_P0:_R_P0 + 1, :]
            fh = vel_per_p * wv * (my_p0 + b_acc)
            return (-jnp.sum(fh * nx, axis=1, keepdims=True),
                    -jnp.sum(fh * ny, axis=1, keepdims=True))
        # damping (ref :1880-1915): approach-only, linear/quadratic blend
        b_vx = band[_R_P0:_R_P0 + 1, :]
        b_vy = band[_R_P1:_R_P1 + 1, :]
        vn = (b_vx - my_p0) * nx + (b_vy - my_p1) * ny
        damp = jnp.maximum(lin_d * wv, jnp.minimum(-quad_d * vn, 0.5))
        f = jnp.where(valid & (vn < 0), damp * vn, 0.0)
        return (jnp.sum(f * nx, axis=1, keepdims=True),
                jnp.sum(f * ny, axis=1, keepdims=True))

    # ---- same row (rowd 0, self-excluded) ----
    ox, oy = band_accum(band_s, s_off, BS, 0.0, True)
    # coverage checks: band edges must lexicographically enclose the
    # (row, col-1)..(row, col+1) window, else neighbors were truncated
    sr_first, sc_first = band_s[_R_ROW, 0], band_s[_R_COL, 0]
    sr_last = band_s[_R_ROW, BS - 1]
    sc_last = band_s[_R_COL, BS - 1]
    ovf = (lex_lt(sr_last, sc_last, my_row, my_col + 1.0)
           | ((s_off > 0)
              & lex_lt(my_row, my_col - 1.0, sr_first, sc_first)))

    # ---- row above ----
    copies[1].wait()
    ux, uy = band_accum(band_u, u_off, BU, 1.0, False)
    ox, oy = ox + ux, oy + uy
    ovf = ovf | lex_lt(band_u[_R_ROW, BU - 1], band_u[_R_COL, BU - 1],
                       my_row + 1.0, my_col + 1.0)

    # ---- row below ----
    copies[2].wait()
    dx_, dy_ = band_accum(band_d, d_off, BU, -1.0, False)
    ox, oy = ox + dx_, oy + dy_
    ovf = ovf | lex_lt(band_d[_R_ROW, BU - 1], band_d[_R_COL, BU - 1],
                       my_row - 1.0, my_col + 1.0)

    zero = jnp.zeros((B_BLK, 1), jnp.float32)
    ovf_f = jnp.where(my_alive & ovf, 1.0, 0.0)
    out_ref[:, :] = jnp.concatenate(
        [ox, oy, ovf_f, zero, zero, zero, zero, zero], axis=1)


def build_tab(spos, srow, scol, alive, p0, p1, n_blocks: int):
    """Assemble the (8, n_pad) transposed sorted table. Dead and padding
    lanes get huge spaced-apart row ids (1e6 + 3*lane) so they can never
    satisfy a row-delta match — against live rows (< 65536) or each other."""
    n = spos.shape[0]
    n_pad = n_blocks * B_BLK + max(BS, BU)
    lane = jnp.arange(n_pad, dtype=jnp.float32)
    dead_row = 1e6 + 3.0 * lane

    def padded(x, fill):
        return jnp.concatenate(
            [x, jnp.full((n_pad - n,), fill, jnp.float32)])

    row_f = jnp.where(
        jnp.arange(n_pad) < n,
        padded(jnp.where(alive, srow.astype(jnp.float32), 0.0), 0.0),
        0.0)
    alive_pad = padded(alive.astype(jnp.float32), 0.0) > 0
    row_f = jnp.where(alive_pad, row_f, dead_row)
    return jnp.stack([
        padded(spos[:, 0], 1e9),
        padded(spos[:, 1], 1e9),
        row_f,
        padded(scol.astype(jnp.float32), 0.0),
        padded(p0, 0.0),
        padded(p1, 0.0),
        jnp.zeros(n_pad, jnp.float32),
        jnp.zeros(n_pad, jnp.float32),
    ], axis=0)


def block_offsets(skey, n_blocks: int):
    """Per-block band offsets (128-aligned): same-row band around the
    block; row-above/below bands at the first block particle's window
    start (monotone in the sorted order, so they cover the whole block
    up to the lexicographic edge checks in the kernel)."""
    n = skey.shape[0]
    n_pad = n_blocks * B_BLK + max(BS, BU)
    idx0 = jnp.arange(n_blocks) * B_BLK
    fk = skey[jnp.minimum(idx0, n - 1)]
    # cell keys carry the +0x8000 row bias in the sign bit, so +/- one row
    # can wrap around int32 — clamp both directions
    tgt_u = jnp.minimum(fk, jnp.int32(0x7FFE0000)) + (1 << 16) - 1
    tgt_d = fk - (1 << 16) - 1
    tgt_d = jnp.where(tgt_d > fk, jnp.int32(-0x80000000), tgt_d)
    u_raw = jnp.searchsorted(skey, tgt_u).astype(jnp.int32)
    d_raw = jnp.searchsorted(skey, tgt_d).astype(jnp.int32)
    align = lambda x, L: jnp.clip(x - (x % 128), 0, n_pad - L)
    s_off = align(idx0 - 128, BS)
    u_off = align(u_raw, BU)
    d_off = align(d_raw, BU)
    return jnp.stack([s_off, u_off, d_off, jnp.zeros_like(s_off)], axis=1)


@functools.partial(jax.jit, static_argnames=("phase", "n_blocks",
                                             "interpret"))
def window_pass(tab, offs, scalars, phase: int, n_blocks: int,
                interpret: bool = False):
    """One pair pass over all blocks. tab (8, n_pad) from build_tab;
    offs (n_blocks, 4) from block_offsets; scalars (1, 8) f32 row
    [inv_diameter, diameter^2, lin_damping, quad_damping, vel_per_pressure].
    Returns (n_blocks*B, 8): cols 0-1 = weight / dvel, col 2 = coverage
    overflow flag."""
    kern = functools.partial(_kernel, phase=phase, n_blocks=n_blocks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),    # scalars
            pl.BlockSpec(memory_space=pltpu.ANY),     # tab (DMA source)
        ],
        out_specs=pl.BlockSpec((B_BLK, 8), lambda i, offs: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 8, BS), jnp.float32),     # double-buffered bands
            pltpu.VMEM((2, 8, BU), jnp.float32),
            pltpu.VMEM((2, 8, BU), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * B_BLK, 8), jnp.float32),
        interpret=interpret,
    )(offs, scalars, tab)
