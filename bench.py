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
    else:
        raise SystemExit(f"unknown scene {scene_name}")
    w.compile()

    dyn_bodies = int(np.sum(np.asarray(w.state.bodies.type) == 2))

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
    body_steps = steps_per_sec * dyn_bodies
    vs = body_steps / REF_BODY_STEPS_PER_SEC if REF_BODY_STEPS_PER_SEC else 0.0
    print(json.dumps({
        "metric": f"body-steps/sec ({scene_name}-{rows}, {dyn_bodies} bodies)",
        "value": round(body_steps, 1),
        "unit": "body-steps/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
