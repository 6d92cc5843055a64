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


# ---------------------------------------------------------------------------
# sorted-order rank repair
# ---------------------------------------------------------------------------
#
# Each sub-iteration re-sorts the particle table by cell key, but particles
# move at most ONE cell per sub-iteration (LimitVelocity caps speed at
# diameter/dt), so the table is always NEARLY sorted: the new key of the
# particle at sorted lane j differs from the key the table was sorted by
# (skey_prev[j]) by at most +-1 row and +-1 column. The full lax.sort
# (3.1 ms at 100k) can then be replaced by a windowed RANK computation:
#
#   new_pos(i) = off_b + #{ j in window_b : (newkey_j, j) < (newkey_i, i) }
#
# where window_b = the contiguous slice of the PREVIOUSLY sorted table
# covering old rows [r0-2, r1+2] around block b's old rows [r0, r1]. Every
# lane before the window has old row <= r0-3, hence new row <= r0-2 <
# r0-1 <= any block lane's new row — strictly less, counted by off_b; every
# lane after has new row >= r1+2 > r1+1 — never counted. The count inside
# the window is a dense (B, RB) compare-reduce: the same masked-band shape
# as the pair kernels, zero per-index ops. The reference re-sorts with a
# parallel merge sort for exactly this near-sortedness
# (particle/ParticleSystem.cs:1362-1370); this is the TPU analog.
#
# The caller must verify (and lax.cond-fall back to a full argsort when):
#   - skey_prev is ascending (host mutations / first iteration break this),
#   - every particle moved <= 1 row and <= 1 column since the last sort,
#   - every block's required window fits in RB lanes (rank_offsets reports).


def rank_window(n: int) -> int:
    """Static rank-window size: ~5 cell rows of the sorted table plus block
    and alignment slack, clamped to [1536, 4096] lanes (128-multiples).
    Blocks whose 5-row span exceeds this fall back to the full sort (see
    rank_offsets.ok) — notably flat multi-world batches, whose key rows
    interleave EVERY world's row segment."""
    return min(4096, max(1536, (n // 24 + 127) // 128 * 128))


def _rank_kernel(offs_ref, tab_ref, out_ref, win, sems, *,
                 n_blocks: int, rb: int):
    # double-buffered window DMA, same discipline as _kernel: visit i
    # prefetches visit i+1's window into the other slot.
    # Keys travel as TWO exact f32 halves (row >> 16 and col & 0xFFFF, both
    # < 2^16 so f32-exact): Mosaic rejects narrow int32 side inputs, and the
    # f32 rows let the block read its OWN keys from the window with the
    # same positional one-hot MXU trick as _kernel (lexicographic compare
    # on the halves == int32 compare on the packed key).
    i = pl.program_id(0)
    slot = lax.rem(i, 2)

    def cp(blk, sl):
        off = pl.multiple_of(offs_ref[blk, 0], 128)
        return pltpu.make_async_copy(
            tab_ref.at[:, pl.ds(off, rb)], win.at[sl], sems.at[sl])

    @pl.when(i == 0)
    def _self_fetch():
        cp(0, slot).start()

    @pl.when(i + 1 < n_blocks)
    def _prefetch():
        cp(jnp.minimum(i + 1, n_blocks - 1), 1 - slot).start()

    cp(i, slot).wait()
    off = pl.multiple_of(offs_ref[i, 0], 128)
    w_hi = win[slot][0:1, :]                       # (1, rb) f32 key hi half
    w_lo = win[slot][1:2, :]                       # (1, rb) f32 key lo half
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, rb), 1)
    widx = iota_l + off                            # window lanes' global ids
    gpos = (i * B_BLK
            + jax.lax.broadcasted_iota(jnp.int32, (B_BLK, rb), 0))
    # own key halves: the block's lanes are inside its window (rank_offsets
    # guarantees coverage), select them with an exact f32 one-hot dot
    oh = jnp.where(widx == gpos, 1.0, 0.0)
    mine = _dot_t(oh, win[slot][:, :])             # (B, 8)
    my_hi = mine[:, 0:1]
    my_lo = mine[:, 1:2]
    less = ((w_hi < my_hi)
            | ((w_hi == my_hi)
               & ((w_lo < my_lo) | ((w_lo == my_lo) & (widx < gpos)))))
    rank = off + jnp.sum(less.astype(jnp.int32), axis=1, keepdims=True)
    zero = jnp.zeros((B_BLK, 1), jnp.int32)
    out_ref[:, :] = jnp.concatenate([rank] + [zero] * 7, axis=1)


def rank_offsets(skey_prev, n_blocks: int, rb: int):
    """Per-block rank-window offsets over the PREVIOUSLY sorted key table.

    Returns (offs (n_blocks, 4) int32, ok (n_blocks,) bool). ok[b] is False
    when block b's required coverage [first lane of old row r0-2, first lane
    of old row r1+3) does not fit in rb lanes from the 128-aligned offset —
    the caller must then fall back to a full sort."""
    n = skey_prev.shape[0]
    n_pad = n_blocks * B_BLK + rb
    idx0 = jnp.arange(n_blocks, dtype=jnp.int32) * B_BLK
    idx1 = jnp.minimum(idx0 + B_BLK - 1, n - 1)
    fk = skey_prev[jnp.minimum(idx0, n - 1)]
    lk = skey_prev[idx1]
    # row starts; the +-0x8000 biases live in the sign bit, so +-2 rows can
    # wrap int32 — clamp both directions (cf. block_offsets)
    row_lo = fk & ~jnp.int32(0xFFFF)
    row_hi = lk & ~jnp.int32(0xFFFF)
    tgt_lo = row_lo - 2 * (1 << 16)
    tgt_lo = jnp.where(tgt_lo > row_lo, jnp.int32(-0x80000000), tgt_lo)
    tgt_hi = row_hi + 3 * (1 << 16)
    tgt_hi = jnp.where(tgt_hi < row_hi, jnp.int32(0x7FFFFFFF), tgt_hi)
    lo_i = jnp.searchsorted(skey_prev, tgt_lo).astype(jnp.int32)
    hi_i = jnp.searchsorted(skey_prev, tgt_hi).astype(jnp.int32)
    start = jnp.minimum(lo_i, idx0)
    off = jnp.clip(start - (start % 128), 0, n_pad - rb)
    end_needed = jnp.maximum(hi_i, idx1 + 1)
    ok = end_needed <= off + rb
    offs = jnp.stack([off, jnp.zeros_like(off), jnp.zeros_like(off),
                      jnp.zeros_like(off)], axis=1)
    return offs, ok


@functools.partial(jax.jit, static_argnames=("n_blocks", "rb", "interpret"))
def rank_pass(newkey, offs, n_blocks: int, rb: int, interpret: bool = False):
    """New sorted position per lane (see module comment). newkey (n,) int32
    cell keys in the CURRENT (previously sorted) lane order; offs from
    rank_offsets. Returns (n,) int32 ranks — a bijection onto [0, n) when
    the caller-verified preconditions hold."""
    n = newkey.shape[0]
    n_pad = n_blocks * B_BLK + rb
    # exact f32 key halves; padding sorts strictly after every real key
    hi = (newkey >> 16).astype(jnp.float32)
    lo = (newkey & 0xFFFF).astype(jnp.float32)
    pad = jnp.full((n_pad - n,), 1e9, jnp.float32)
    tab = jnp.concatenate(
        [jnp.concatenate([hi, pad])[None, :],
         jnp.concatenate([lo, pad])[None, :],
         jnp.zeros((6, n_pad), jnp.float32)], axis=0)
    kern = functools.partial(_rank_kernel, n_blocks=n_blocks, rb=rb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),     # key table (DMA src)
        ],
        out_specs=pl.BlockSpec((B_BLK, 8), lambda i, offs: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 8, rb), jnp.float32),      # double-buffered window
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * B_BLK, 8), jnp.int32),
        interpret=interpret,
    )(offs, tab)
    return out[:n, 0]


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
