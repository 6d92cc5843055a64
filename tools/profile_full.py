#!/usr/bin/env python
"""Cumulative phase bisection of the full step (uses _step_work's `until`
early-return points; each prefix is jitted separately and XLA dead-code
eliminates later phases). Differences between consecutive rows = phase cost.

    python tools/profile_full.py [scene] [size] [mode]

mode: 0=XLA solver, 1=pallas vmem, 2=pallas tiled, auto=api selection.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


PHASES = ["aabbs", "pairs", "narrow", "colors", "prepare", "layout", "meta",
          "kernel", "store", "events", "continuous", "finalize", "sleep", ""]


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "pyramid"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 140
    mode = sys.argv[3] if len(sys.argv) > 3 else "auto"

    from box2d_tpu import scenes
    from box2d_tpu.world import _step_work

    kw = {"pyramid": {"rows": size}, "tumbler": {"count": size},
          "joint_farm": {"ragdolls": size},
          "bullet_barrage": {"bullets": size},
          "dam_break": {"particles_target": size}}[scene]
    w = getattr(scenes, scene)(**kw)
    w.compile()
    from box2d_tpu.joints import joint_types_present
    from box2d_tpu.narrowphase import classes_for_shape_types
    from box2d_tpu.sensors import sensor_shape_ids
    cap = w.capacity
    classes = classes_for_shape_types(
        s["geom"].type for s in w.builder._shapes)
    jtypes = joint_types_present(j["_type"] for j in w.builder._joints)
    sensors = sensor_shape_ids(w.builder._shapes)
    cont = w.builder.def_.enable_continuous

    if mode == "auto":
        import box2d_tpu.solver_pallas as sp
        from box2d_tpu.state import auto_chunk
        chunk = cap.color_chunk or auto_chunk(cap.max_contact_pairs)
        l0 = cap.max_colors * chunk
        ovf = ((min(cap.max_contact_pairs, 2 * chunk) + chunk - 1)
               // chunk) * chunk
        up = 0
        if jax.default_backend() != "cpu" and not jtypes:
            if sp.fits_kernel(cap.max_bodies, l0 + ovf, chunk):
                up = 1
            elif sp.fits_tiled(cap.max_bodies, l0 + ovf,
                               sp.window_width(chunk)):
                up = 2
        use_pallas = up
    else:
        use_pallas = int(mode)
    print(f"scene={scene}-{size} use_pallas={use_pallas} "
          f"backend={jax.default_backend()}")

    # advance the REAL world for a realistic settling state (PROFILE_WARM
    # steps; a pyramid needs ~60+ before the contact set is fully live)
    for _ in range(int(os.environ.get("PROFILE_WARM", "10"))):
        w.step()

    # pick the state kind to profile: keep (default) stops on a state whose
    # next step REUSES the pair buffer (the ~90% case the scan pays for);
    # PROFILE_STATE=rebuild stops on a state that forces a pair rebuild
    want_rebuild = os.environ.get("PROFILE_STATE", "keep") == "rebuild"
    from box2d_tpu.broadphase import compute_shape_aabbs as _aabbs

    @jax.jit
    def would_rebuild(st):
        bp = st.broadphase
        sh = st.shapes
        ab = _aabbs(st, cap.max_verts)
        alive = sh.enabled & st.bodies.enabled[sh.body] & ~sh.is_sensor
        inside = ((ab[:, 0] >= bp.fat[:, 0]) & (ab[:, 1] >= bp.fat[:, 1])
                  & (ab[:, 2] <= bp.fat[:, 2]) & (ab[:, 3] <= bp.fat[:, 3]))
        return bp.dirty | jnp.any(alive & ~inside) | jnp.any(
            alive != bp.alive)

    if w.state.broadphase is not None:
        for _ in range(200):
            if bool(would_rebuild(w.state)) == want_rebuild:
                break
            w.step()
        print(f"profiling a {'REBUILD' if want_rebuild else 'KEEP'} step")
    s = w.state
    jax.block_until_ready(s.bodies.center)

    def mk(until):
        def f(st):
            return _step_work(st, jnp.float32(1 / 60), cap, classes, 4,
                              jtypes, sensors, cont, None, use_pallas, until)
        return jax.jit(f)

    only = sys.argv[4].split(",") if len(sys.argv) > 4 else None
    phases = [p for p in PHASES if only is None or p in only or
              (p == "" and "FULL" in only)]
    prev = 0.0
    for ph in phases:
        f = mk(ph)
        try:
            r = f(s)
        except Exception as e:
            print(f"{ph or 'FULL':>12}: ERROR {type(e).__name__}: {e}")
            continue
        jax.block_until_ready(r)
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(s)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{ph or 'FULL':>12}: {dt:8.2f} ms  (+{dt - prev:6.2f})")
        prev = dt


if __name__ == "__main__":
    main()
