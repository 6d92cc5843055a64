#!/usr/bin/env python
"""Measure the single-core CPU proxy baseline for bench.py's vs_baseline.

The C# reference cannot run in this image (no .NET runtime; BASELINE.md), so
the stand-in is this engine's own XLA path on ONE CPU core — the same
physics with the reference's threading model (README.md:16: the reference's
rigid-body core is single-threaded). Run:

    taskset -c 0 python tools/cpu_baseline.py

and copy the printed numbers into bench.py's CPU_BASELINE table.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_cpu_multi_thread_eigen=false"
                           " intra_op_parallelism_threads=1")

import json
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # the container force-registers
assert jax.default_backend() == "cpu"      # the axon TPU; env alone fails

import numpy as np


def measure(scene, steps, **kw):
    from box2d_tpu import scenes

    w = getattr(scenes, scene)(**kw)
    w.compile()
    dyn = int(np.sum(np.asarray(w.state.bodies.type) == 2))
    particles = (int(np.sum(np.asarray(w.state.particles.alive)))
                 if w.state.particles is not None else 0)
    state0 = w.state
    w.run(steps, 1 / 60)
    jax.block_until_ready(w.state.bodies.center)
    w.state = state0   # timed window = steps [0, steps) from spawn
    t0 = time.perf_counter()
    w.run(steps, 1 / 60)
    jax.block_until_ready(w.state.bodies.center)
    dt = time.perf_counter() - t0
    n = particles if scene == "dam_break" else dyn
    return {"steps_per_sec": round(steps / dt, 2),
            "entity_steps_per_sec": round(steps / dt * n, 1)}


def main():
    out = {}
    out["pyramid-20"] = measure("pyramid", 120, rows=20)
    out["pyramid-140"] = measure("pyramid", 30, rows=140)
    out["tumbler"] = measure("tumbler", 60)
    out["joint_farm"] = measure("joint_farm", 60)
    out["bullet_barrage"] = measure("bullet_barrage", 120)
    out["dam_break"] = measure("dam_break", 30, particles_target=2000)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
