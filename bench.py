#!/usr/bin/env python
"""Benchmark entry point: prints ONE JSON line with the headline metric.

Default config: pyramid-20 (231 bodies informing the body-steps/sec metric,
matching BASELINE.json's first driver config). Set BENCH_SCENE/BENCH_ROWS/
BENCH_STEPS env vars to vary.

The reference publishes no numbers (BASELINE.md), so vs_baseline reports the
ratio against REF_BODY_STEPS_PER_SEC below once a measured C# baseline lands;
0.0 means "no baseline measured yet".
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# measured reference throughput (body-steps/sec) once available
REF_BODY_STEPS_PER_SEC = 0.0


def main():
    scene_name = os.environ.get("BENCH_SCENE", "pyramid")
    rows = int(os.environ.get("BENCH_ROWS", "20"))
    steps = int(os.environ.get("BENCH_STEPS", "240"))

    from box2d_tpu import scenes

    if scene_name == "pyramid":
        w = scenes.pyramid(rows=rows)
    elif scene_name == "tumbler":
        w = scenes.tumbler(count=int(os.environ.get("BENCH_COUNT", "800")))
    elif scene_name == "joint_farm":
        w = scenes.joint_farm(ragdolls=int(os.environ.get("BENCH_COUNT", "100")))
    elif scene_name == "bullet_barrage":
        w = scenes.bullet_barrage(bullets=int(os.environ.get("BENCH_COUNT", "100")))
    elif scene_name == "dam_break":
        w = scenes.dam_break(int(os.environ.get("BENCH_COUNT", "2000")))
    else:
        raise SystemExit(f"unknown scene {scene_name}")
    w.compile()

    dyn_bodies = int(np.sum(np.asarray(w.state.bodies.type) == 2))
    particles = (int(np.sum(np.asarray(w.state.particles.alive)))
                 if w.state.particles is not None else 0)

    # warmup / compile
    for _ in range(3):
        w.step(1 / 60)
    jax.block_until_ready(w.state.bodies.center)

    t0 = time.perf_counter()
    for _ in range(steps):
        w.step(1 / 60)
    jax.block_until_ready(w.state.bodies.center)
    dt_wall = time.perf_counter() - t0

    steps_per_sec = steps / dt_wall
    if scene_name == "dam_break":
        # particle scenes report particle-steps/s (BASELINE.json's metric)
        value = steps_per_sec * particles
        metric = f"particle-steps/sec (dam_break, {particles} particles)"
        unit = "particle-steps/s"
    else:
        value = steps_per_sec * dyn_bodies
        tag = f"{scene_name}-{rows}" if scene_name == "pyramid" else scene_name
        metric = f"body-steps/sec ({tag}, {dyn_bodies} bodies)"
        unit = "body-steps/s"
    vs = value / REF_BODY_STEPS_PER_SEC if REF_BODY_STEPS_PER_SEC else 0.0
    print(json.dumps({
        "metric": metric,
        "value": round(value, 1),
        "unit": unit,
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
