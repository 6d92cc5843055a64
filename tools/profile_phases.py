#!/usr/bin/env python
"""Per-phase timing instrumentation (the non-jit analog of the reference's
Profile struct, ref: include/Types.cs:378-403 ~22 ms timers).

The step itself is ONE fused XLA program, so in-step timers don't exist;
this tool jits each phase separately and times it on the current backend:

    python tools/profile_phases.py [scene] [size]

e.g. `python tools/profile_phases.py pyramid 140`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "pyramid"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 140

    from box2d_tpu import scenes
    from box2d_tpu.broadphase import compute_shape_aabbs, find_pairs
    from box2d_tpu.narrowphase import classes_for_shape_types, narrow_phase, \
        update_cache
    from box2d_tpu.world import _step

    kw = {"pyramid": {"rows": size}, "tumbler": {"count": size},
          "joint_farm": {"ragdolls": size},
          "bullet_barrage": {"bullets": size},
          "dam_break": {"particles_target": size}}[scene]
    w = getattr(scenes, scene)(**kw)
    state, cap = w.builder.build()
    classes = classes_for_shape_types(s["geom"].type for s in w.builder._shapes)
    stepf = jax.jit(lambda s: _step(s, jnp.float32(1 / 60), cap, classes, 4,
                                    frozenset(), (), True, None, 0))
    s = state
    for _ in range(10):
        s = stepf(s)
    jax.block_until_ready(s.bodies.center)

    def t(tag, f, *args, n=30):
        r = f(*args)
        jax.block_until_ready(jax.tree.leaves(r)[0])
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*args)
        jax.block_until_ready(jax.tree.leaves(r)[0])
        print(f"{tag:>22}: {(time.perf_counter() - t0) / n * 1e3:8.2f} ms")
        return r

    t("full step", stepf, s)
    aabbs = t("compute_shape_aabbs", jax.jit(compute_shape_aabbs), s)
    pairs = t("find_pairs", jax.jit(lambda st, ab: find_pairs(st, cap, ab)),
              s, aabbs)
    data = t("narrow_phase",
             jax.jit(lambda st, p: narrow_phase(st, p, classes,
                                                cap.max_verts)), s, pairs)
    t("update_cache", jax.jit(update_cache), data)


if __name__ == "__main__":
    main()
