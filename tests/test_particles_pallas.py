"""Dense masked-band particle kernel (particles_pallas.py) equivalence.

Each phase (weight / pressure / damping) is checked against a brute-force
O(n^2) evaluation of the same pair math (ref particle/ParticleSystem.cs
ComputeWeight :1787, SolvePressure :1807, SolveDamping :1880) — run in
interpret mode on CPU; the compiled Mosaic path is checked on real TPU by
the bench and by tools/profile_particles.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from box2d_tpu import particles_pallas as pp


def _setup(seed, n, span, d=0.1):
    rng = np.random.RandomState(seed)
    pos = jnp.asarray(rng.uniform(0, span, (n, 2)).astype(np.float32)
                      - span / 2)
    key = (((jnp.floor(pos[:, 1] / d).astype(jnp.int32) + 0x8000) << 16)
           | ((jnp.floor(pos[:, 0] / d).astype(jnp.int32) + 0x8000)
              & 0xFFFF))
    alive = jnp.asarray(rng.rand(n) > 0.05)
    key = jnp.where(alive, key, jnp.iinfo(jnp.int32).max)
    o = jnp.argsort(key)
    skey = key[o]
    spos = jnp.where(alive[o][:, None], pos[o], 1e9)
    vel = jnp.asarray(rng.randn(n, 2).astype(np.float32))[o]
    acc = jnp.asarray(rng.rand(n).astype(np.float32))[o]
    return skey, spos, alive[o], vel, acc, d


def _brute(spos, skey, alive, vel, acc, d, lin_d, quad_d, vpp):
    P, K, A = np.asarray(spos), np.asarray(skey), np.asarray(alive)
    V, AC = np.asarray(vel), np.asarray(acc)
    n = P.shape[0]
    row = K >> 16
    w = np.zeros(n)
    p = np.zeros((n, 2))
    dmp = np.zeros((n, 2))
    for i in range(n):
        if not A[i]:
            continue
        dx = P - P[i]
        d2 = (dx ** 2).sum(1)
        ok = (np.abs(row - row[i]) <= 1) & (d2 < d * d) & A
        ok[i] = False
        idx = np.nonzero(ok)[0]
        dist = np.sqrt(d2[idx])
        inv = np.where(dist > 0, 1 / np.where(dist > 0, dist, 1), 0)
        wgt = 1 - dist / d
        nrm = dx[idx] * inv[:, None]
        w[i] = wgt.sum()
        fh = vpp * wgt * (AC[i] + AC[idx])
        p[i] = -(fh[:, None] * nrm).sum(0)
        vn = ((V[idx] - V[i]) * nrm).sum(1)
        da = np.maximum(lin_d * wgt, np.minimum(-quad_d * vn, 0.5))
        f = np.where(vn < 0, da * vn, 0)
        dmp[i] = (f[:, None] * nrm).sum(0)
    return w, p, dmp


@pytest.mark.parametrize("seed,n,span", [(0, 700, 3.0), (2, 511, 8.0)])
def test_window_kernel_phases_match_brute_force(seed, n, span):
    skey, spos, salive, vel, acc, d = _setup(seed, n, span)
    srow = skey >> 16
    scol = skey & 0xFFFF
    nb = -(-n // pp.B_BLK)
    offs = pp.block_offsets(skey, nb)
    lin_d, quad_d, vpp = 1.0, 0.7, 0.5
    scal = jnp.array([[1 / d, d * d, lin_d, quad_d, vpp, 0, 0, 0]],
                     jnp.float32)
    z = jnp.zeros(n)
    outw = np.asarray(pp.window_pass(
        pp.build_tab(spos, srow, scol, salive, z, z, nb),
        offs, scal, pp.PH_WEIGHT, nb, True))
    outp = np.asarray(pp.window_pass(
        pp.build_tab(spos, srow, scol, salive, acc, z, nb),
        offs, scal, pp.PH_PRESSURE, nb, True))
    outd = np.asarray(pp.window_pass(
        pp.build_tab(spos, srow, scol, salive, vel[:, 0], vel[:, 1], nb),
        offs, scal, pp.PH_DAMPING, nb, True))
    w_ref, p_ref, d_ref = _brute(spos, skey, salive, vel, acc, d,
                                 lin_d, quad_d, vpp)
    assert outw[:n, 2].sum() == 0, "unexpected coverage overflow"
    np.testing.assert_allclose(outw[:n, 0], w_ref, atol=2e-5)
    np.testing.assert_allclose(outp[:n, :2], p_ref, atol=2e-5)
    np.testing.assert_allclose(outd[:n, :2], d_ref, atol=2e-5)


def test_particle_step_kernel_path_matches_window_path():
    """Full particle_step with use_window_kernel=True (interpret) tracks
    the windowed XLA path on a settled dam-break slice."""
    from box2d_tpu import scenes
    from box2d_tpu.particles import particle_step

    w = scenes.dam_break(800)
    w.compile()
    w.run(20, 1 / 60)
    state = w.state
    pt = state.particles
    cfg = w._pcfg
    # wide windows on the reference path so neither path sheds contacts
    cfg_ref = cfg._replace(use_window_kernel=False, k_same=24, k_up=24)
    cfg_ker = cfg._replace(use_window_kernel=True)
    p_r, dv_r, dw_r, ov_r = particle_step(pt, state, jnp.float32(1 / 60),
                                          cfg_ref)
    p_k, dv_k, dw_k, ov_k = particle_step(pt, state, jnp.float32(1 / 60),
                                          cfg_ker)
    alive = np.asarray(p_r.alive)
    np.testing.assert_allclose(np.asarray(p_k.pos)[alive],
                               np.asarray(p_r.pos)[alive], atol=1e-5)
    np.testing.assert_allclose(np.asarray(p_k.vel)[alive],
                               np.asarray(p_r.vel)[alive], atol=1e-3)
    np.testing.assert_allclose(np.asarray(dv_k), np.asarray(dv_r), atol=1e-4)
    assert int(ov_k) == 0


def test_rank_pass_matches_stable_argsort():
    """rank_pass (nearly-sorted rank repair) must reproduce the stable
    argsort permutation exactly for +-1-cell key perturbations."""
    rng = np.random.RandomState(7)
    for n in (900, 5000, 20000):
        cols = rng.randint(-300, 300, n).astype(np.int32) + 0x8000
        rows = np.sort(rng.randint(0, max(n // 200, 4), n)).astype(np.int32)
        key0 = np.sort(((rows - 0x7FF0).astype(np.int64) << 16
                        | cols).astype(np.int32))
        newkey = (key0 + rng.randint(-1, 2, n).astype(np.int32) * (1 << 16)
                  + rng.randint(-1, 2, n).astype(np.int32))
        nb = -(-n // pp.B_BLK)
        rb = pp.rank_window(n)
        offs, ok = pp.rank_offsets(jnp.asarray(key0), nb, rb)
        assert bool(jnp.all(ok)), "window budget must cover the test grid"
        rank = np.asarray(pp.rank_pass(jnp.asarray(newkey), offs, nb, rb,
                                       interpret=True))
        order = np.argsort(newkey, kind="stable")
        want = np.zeros(n, np.int32)
        want[order] = np.arange(n)
        np.testing.assert_array_equal(rank, want)


def test_particle_step_rank_repair_bit_identical():
    """Full particle trajectories with rank_repair on vs off must be
    BIT-identical: the rank path reproduces the stable argsort permutation,
    so every downstream op sees the same operands in the same order."""
    from box2d_tpu import scenes
    from box2d_tpu.particles import particle_step
    import dataclasses as _dc

    w = scenes.dam_break(700)
    w.compile()
    w.run(10, 1 / 60)
    state = w.state
    cfg_ref = w._pcfg._replace(use_window_kernel=True, rank_repair=False)
    cfg_rr = cfg_ref._replace(rank_repair=True)
    pt_a, pt_b = state.particles, state.particles
    for _ in range(4):
        pt_a, dva, dwa, ova = particle_step(pt_a, state, jnp.float32(1 / 60),
                                            cfg_ref)
        pt_b, dvb, dwb, ovb = particle_step(pt_b, state, jnp.float32(1 / 60),
                                            cfg_rr)
    np.testing.assert_array_equal(np.asarray(pt_a.pos), np.asarray(pt_b.pos))
    np.testing.assert_array_equal(np.asarray(pt_a.vel), np.asarray(pt_b.vel))
    np.testing.assert_array_equal(np.asarray(dva), np.asarray(dvb))
