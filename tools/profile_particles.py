#!/usr/bin/env python
"""Decompose the dam-break particle iteration cost on TPU.

Each piece is repeated REPS times INSIDE one jitted lax.scan with a
data-dependent carry (dispatch through the axon tunnel costs ~30 ms per
call, which swamps single-shot timings). Reported = (scan time)/REPS.
Run: python -u tools/profile_particles.py [n_particles]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from box2d_tpu import scenes  # noqa: E402
from box2d_tpu.particles import (  # noqa: E402
    ParticleConfig, _cell_key, _find_contacts_sorted, _pair_accum,
    _partner_same, particle_step, _solve_collision, _point_shape_distance)
from box2d_tpu.broadphase import compute_shape_aabbs  # noqa: E402
from box2d_tpu import math2d as m  # noqa: E402

REPS = 8


def bench_scan(name, fn, carry0, reps=REPS, outer=3):
    """fn(carry) -> carry, repeated `reps` times inside one jit."""
    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (fn(c), None), c, None,
                            length=reps)[0]

    out = run(carry0)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(outer):
        t0 = time.perf_counter()
        out = run(carry0)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:42s} {best*1e3/reps:9.3f} ms")
    return best / reps


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    w = scenes.dam_break(n_target)
    w.compile()
    w.run(30, 1 / 60)
    jax.block_until_ready(w.state.bodies.center)
    state = w.state
    pt = state.particles
    cfg = w._pcfg or ParticleConfig()
    n = pt.pos.shape[0]
    prm = pt.params
    diameter = 2.0 * prm.radius
    print(f"n={n} alive={int(np.sum(np.asarray(pt.alive)))} "
          f"ks={cfg.k_same} ku={cfg.k_up}")

    dt = jnp.float32(1 / 60 / cfg.iterations)

    # full step: already a 4-iteration scan inside; report per iteration
    @jax.jit
    def full_fn(p, s):
        return particle_step(p, s, jnp.float32(1 / 60), cfg)

    o = full_fn(pt, state)
    jax.block_until_ready(o)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        o = full_fn(pt, state)
        jax.block_until_ready(o)
        best = min(best, time.perf_counter() - t0)
    print(f"{'particle_step per ITER':42s} {best*1e3/cfg.iterations:9.3f} ms")

    key = _cell_key(pt.pos, pt.alive, diameter)
    order = jnp.argsort(key)
    skey = jax.device_put(key[order])
    pos = jax.device_put(pt.pos[order])
    alive = jax.device_put(pt.alive[order])
    vel = jax.device_put(pt.vel[order])
    pw, _ = _find_contacts_sorted(pos, alive, skey, diameter, cfg)
    cand_up = pw.cand_up
    ku = cfg.k_up

    def dep(x, s):
        """fold a scalar into x so the next iteration depends on this one"""
        return x + jnp.asarray(s, x.dtype).sum() * 0

    bench_scan("argsort i32 keys", lambda c: dep(c, jnp.argsort(c)[0]), skey)
    bench_scan("cell_key+argsort",
               lambda p: dep(p, jnp.argsort(_cell_key(p, alive, diameter))[0]),
               pos)

    fpack = jnp.concatenate(
        [pos, vel, vel, skey[:, None].astype(jnp.float32),
         skey[:, None].astype(jnp.float32)], axis=1)
    bench_scan("permute fpack (n x8 gather)",
               lambda c: dep(c, c[order][0, 0]), fpack)

    bench_scan("searchsorted n->n",
               lambda c: dep(c, jnp.searchsorted(c, c + (1 << 16) - 1)[0]),
               skey)

    ptab = jnp.concatenate([pos, pos], axis=1)  # (n, 4)
    bench_scan("row-above gather n*ku x4col",
               lambda c: dep(c, c[cand_up][0, 0, 0]), ptab)
    acc1 = jnp.ones(n, jnp.float32)
    bench_scan("row-above gather n*ku x1col",
               lambda c: dep(c, c[cand_up][0, 0]), acc1)
    bench_scan("row-above scatter n*ku x1col",
               lambda c: dep(c, jnp.zeros(n, jnp.float32)
                             .at[cand_up.reshape(-1)].add(c[:, 0])[0]),
               jnp.ones((n * ku, 2), jnp.float32)[:, :1])
    bench_scan("row-above scatter n*ku x2col",
               lambda c: dep(c, jnp.zeros((n, 2), jnp.float32)
                             .at[cand_up.reshape(-1)].add(c)[0, 0]),
               jnp.ones((n * ku, 2), jnp.float32))
    bench_scan("find_contacts_sorted",
               lambda p: dep(p, _find_contacts_sorted(
                   p, alive, skey, diameter, cfg)[0].w_up[0, 0]), pos)
    bench_scan("pair_accum 1col",
               lambda c: dep(c, _pair_accum(
                   c[:, :cfg.k_same], c[:, :ku], c[:, :cfg.k_same],
                   c[:, :ku], cand_up, n)[0]),
               jnp.ones((n, max(cfg.k_same, ku)), jnp.float32))

    def same_row_geom(p):
        p_same = _partner_same(p, cfg.k_same)
        d = p_same - p[:, None, :]
        return dep(p, m.dot(d, d)[0, 0])

    bench_scan("same-row shifts+geom", same_row_geom, pos)

    # body contacts
    sh = state.shapes
    b = state.bodies
    S = sh.type.shape[0]
    boxes = compute_shape_aabbs(state)
    sys_lo = jnp.min(pos, axis=0) - diameter
    sys_hi = jnp.max(pos, axis=0) + diameter
    near = (m.aabb_overlaps(boxes, jnp.concatenate([sys_lo, sys_hi])[None, :])
            & sh.enabled & b.enabled[sh.body] & ~sh.is_sensor)
    sscore = jnp.where(near, S - jnp.arange(S), 0)
    stop, _ = jax.lax.top_k(sscore, min(cfg.max_body_shapes, S))
    bs_valid = stop > 0
    bs_idx = jnp.where(bs_valid, S - stop, 0)
    print(f"nearby shapes Sb={bs_idx.shape[0]}")

    def body_contacts(p):
        p_body = sh.body[bs_idx]
        bp = b.origin[p_body]
        bq = b.rot[p_body]

        def shape_dist(si, sp, sq):
            local = jax.vmap(lambda x: m.inv_transform_point(sp, sq, x))(p)
            dist, nrm = jax.vmap(
                lambda lp: _point_shape_distance(
                    lp, sh.verts[si], sh.normals[si], sh.count[si],
                    sh.radius[si]))(local)
            return dist, jax.vmap(lambda v: m.rot_vec(sq, v))(nrm)

        bdist, bnrm = jax.vmap(shape_dist, in_axes=(0, 0, 0),
                               out_axes=1)(bs_idx, bp, bq)
        bc_body = jnp.broadcast_to(p_body[None, :], bdist.shape)
        lever = p[:, None, :] - b.center[bc_body]
        rpn = m.cross(lever, bnrm)
        inv_m_c = (b.inv_mass[bc_body] + b.inv_inertia[bc_body] * rpn * rpn)
        return dep(p, inv_m_c[0, 0] + bdist[0, 0])

    bench_scan("body contacts (dist+mass)", body_contacts, pos)

    bc_body = jnp.broadcast_to(sh.body[bs_idx][None, :], (n, bs_idx.shape[0]))
    bench_scan("b.center[(n,Sb) bcast idx]",
               lambda c: dep(c, c[bc_body][0, 0, 0]), b.center)

    bench_scan("solve_collision",
               lambda p: dep(p, _solve_collision(
                   pt, p, vel, state, bs_idx, bs_valid, dt, 1.0 / dt,
                   prm)[0, 0]), pos)


if __name__ == "__main__":
    main()
