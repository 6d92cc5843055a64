#!/usr/bin/env python
"""Benchmark entry point: prints ONE JSON line with the headline metric.

Headline (default): pyramid-140 — 9,870 dynamic bodies, the BASELINE.md
north-star scale — stepped through `World.run` (lax.scan over frames, ONE
device dispatch), reported as body-steps/sec.

Env vars:
  BENCH_SCENE  pyramid|tumbler|joint_farm|bullet_barrage|dam_break|batch
  BENCH_ROWS   pyramid rows (default 140)
  BENCH_COUNT  entity count for the other scenes
  BENCH_STEPS  timed frames (default 240)
  BENCH_ALL=1  run the full five-scene sweep + the vmapped batch and write
               BENCH_FULL.json (one JSON object per scene); headline last

vs_baseline: the C# reference cannot run in this image (no .NET runtime,
BASELINE.md). The stand-in denominator is this engine's own XLA path pinned
to ONE CPU thread (same physics, single-core, measured via
tools/cpu_baseline.py) — a conservative proxy for the reference's
single-threaded rigid-body step rate (README.md:16 "single-threaded by
default"). 0.0 means no proxy measured for that scene yet.
"""

import json
import os
import time

import jax
import numpy as np

# single-core CPU XLA-path proxies (body-steps/s or particle-steps/s),
# measured with tools/cpu_baseline.py; see BASELINE.md for the policy.
# RE-MEASURED 2026-08-18 (round 4) after discovering the round-3 proxies
# were NOT single-core CPU numbers: the container's sitecustomize force-
# registers the axon TPU platform, so the script's JAX_PLATFORMS=cpu env
# var was silently ignored (cpu_baseline.py now asserts the backend), and
# the host is single-core so no hidden multithreading is possible either.
# The round-3 denominators were therefore ~20-60x too high (dam-break's
# round-3 "proxy" of 185.5k vs the TPU's own 187.7k is the tell). Rates
# are per-entity at the measurement scales (pyramid-20/140 exact; tumbler
# 800 boxes, joint_farm 100 ragdolls, dam_break 2k particles — per-entity
# cost is near-linear, documented in BASELINE.md).
CPU_BASELINE = {
    "pyramid-20": 11263.0,
    "pyramid-140": 8390.2,
    "tumbler": 16546.5,
    "joint_farm": 579.8,
    "bullet_barrage": 3279.1,
    "dam_break": 95743.3,
    # a single core runs batch members sequentially, so the per-world rate
    # is the batch baseline
    "batch": 11263.0,
}


def build(scene_name, rows, count):
    from box2d_tpu import scenes

    if scene_name == "pyramid":
        w = scenes.pyramid(rows=rows)
        tag = f"pyramid-{rows}"
    elif scene_name == "tumbler":
        w = scenes.tumbler(count=count or 800)
        tag = "tumbler"
    elif scene_name == "joint_farm":
        w = scenes.joint_farm(ragdolls=count or 100)
        tag = "joint_farm"
    elif scene_name == "bullet_barrage":
        w = scenes.bullet_barrage(bullets=count or 100)
        tag = "bullet_barrage"
    elif scene_name == "dam_break":
        w = scenes.dam_break(count or 2000)
        tag = "dam_break"
    else:
        raise SystemExit(f"unknown scene {scene_name}")
    return w, tag


def measure_world(w, tag, steps):
    """Scan-path (lax.scan over frames) throughput for one world.

    The timed window is steps [0, steps) FROM SPAWN (state restored after
    the compile/warm run): settle-prone scenes would otherwise measure
    mostly sleeping/idle steps after the warm run advanced them to rest.
    Sleep reached WITHIN the window still counts — that is the scene's
    real behavior."""
    w.compile()
    dyn_bodies = int(np.sum(np.asarray(w.state.bodies.type) == 2))
    particles = (int(np.sum(np.asarray(w.state.particles.alive)))
                 if w.state.particles is not None else 0)
    state0 = w.state
    w.run(steps, 1 / 60)  # compile + warm
    jax.block_until_ready(w.state.bodies.center)
    w.state = state0
    t0 = time.perf_counter()
    w.run(steps, 1 / 60)
    jax.block_until_ready(w.state.bodies.center)
    dt_wall = time.perf_counter() - t0
    steps_per_sec = steps / dt_wall
    if tag == "dam_break":
        value = steps_per_sec * particles
        unit = "particle-steps/s"
        metric = f"particle-steps/sec ({tag}, {particles} particles)"
    else:
        value = steps_per_sec * dyn_bodies
        unit = "body-steps/s"
        metric = f"body-steps/sec ({tag}, {dyn_bodies} bodies)"
    base = CPU_BASELINE.get(tag, 0.0)
    return {
        "metric": metric, "value": round(value, 1), "unit": unit,
        "steps_per_sec": round(steps_per_sec, 2),
        "vs_baseline": round(value / base, 3) if base else 0.0,
    }


def measure_batch(n_worlds=64, rows=20, steps=240):
    """vmapped batch of independent worlds (the RL/training configuration)."""
    import jax.numpy as jnp
    from box2d_tpu import scenes
    from box2d_tpu.narrowphase import classes_for_shape_types
    from box2d_tpu.world import _step

    w = scenes.pyramid(rows=rows)
    state, cap = w.builder.build()
    # under vmap the keep/repair/full cond lowers to selects (all branches
    # run every step) — disable the repair tier so the vmapped path only
    # pays for the two branches it always had
    import dataclasses
    cap = dataclasses.replace(cap, bp_repair_cap=0, batched=True)
    classes = classes_for_shape_types(s["geom"].type for s in w.builder._shapes)
    use_pallas = 0
    if jax.default_backend() not in ("cpu",):
        from box2d_tpu.solver_pallas import fits_kernel
        from box2d_tpu.state import auto_chunk
        chunk = cap.color_chunk or auto_chunk(cap.max_contact_pairs)
        l0 = cap.max_colors * chunk
        ovf = ((min(cap.max_contact_pairs, 2 * chunk) + chunk - 1)
               // chunk) * chunk
        use_pallas = 1 if fits_kernel(cap.max_bodies, l0 + ovf, chunk) else 0
    batch = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_worlds,) + x.shape), state)

    def one(s):
        return _step(s, jnp.float32(1 / 60), cap, classes, 4,
                     frozenset(), (), True, None, use_pallas)

    @jax.jit
    def run(b):
        return jax.lax.scan(lambda s, _: (jax.vmap(one)(s), None),
                            b, None, length=steps)[0]

    dyn_bodies = int(np.sum(np.asarray(state.bodies.type) == 2)) * n_worlds
    batch0 = batch
    batch = run(batch)
    jax.block_until_ready(batch.bodies.center)
    batch = run(batch0)   # timed window is steps [0, steps) from spawn
    jax.block_until_ready(batch.bodies.center)
    t0 = time.perf_counter()
    batch = run(batch0)
    jax.block_until_ready(batch.bodies.center)
    dt_wall = time.perf_counter() - t0
    steps_per_sec = steps / dt_wall
    value = steps_per_sec * dyn_bodies
    base = CPU_BASELINE.get("batch", 0.0)
    return {
        "metric": f"body-steps/sec ({n_worlds}x pyramid-{rows} vmapped, "
                  f"{dyn_bodies} bodies)",
        "value": round(value, 1), "unit": "body-steps/s",
        "steps_per_sec": round(steps_per_sec, 2),
        "vs_baseline": round(value / base, 3) if base else 0.0,
    }


def measure_batch_flat_particles(n_worlds=64, particles=500, steps=240):
    """Flat batch of particle worlds: n dam-break copies tiled into ONE
    world — one sorted particle table serves the whole batch (the lane-flat
    analog of vmapping LiquidFun over worlds)."""
    from box2d_tpu import scenes

    w = scenes.replicate(scenes.dam_break(particles), n_worlds)
    out = measure_world(w, "dam_break", steps)
    out["metric"] = (f"particle-steps/sec ({n_worlds}x dam_break-{particles}"
                     " flat batch, " + out["metric"].split(", ")[1])
    base = CPU_BASELINE.get("dam_break", 0.0)
    out["vs_baseline"] = round(out["value"] / base, 3) if base else 0.0
    return out


def measure_batch_flat(n_worlds=64, rows=20, steps=240):
    """Flat batch: n copies tiled into ONE world (scenes.replicate), stepped
    as a single program — the TPU-first batch mode (a vmapped batch pays
    batched-scatter serialization per world)."""
    from box2d_tpu import scenes

    w = scenes.replicate(scenes.pyramid(rows=rows), n_worlds)
    tag = f"batch-flat"
    out = measure_world(w, f"{n_worlds}x pyramid-{rows} flat", steps)
    out["metric"] = ("body-steps/sec (" + f"{n_worlds}x pyramid-{rows}"
                     + " flat batch, "
                     + out["metric"].split(", ")[1])
    base = CPU_BASELINE.get("batch", 0.0)
    out["vs_baseline"] = round(out["value"] / base, 3) if base else 0.0
    return out


def main():
    steps = int(os.environ.get("BENCH_STEPS", "240"))
    rows = int(os.environ.get("BENCH_ROWS", "140"))
    count = int(os.environ.get("BENCH_COUNT", "0"))

    if os.environ.get("BENCH_ALL"):
        # driver-config scale (BASELINE.json): tumbler 2k boxes, joint farm
        # 1k ragdolls, dam break 100k particles. vs_baseline divides by the
        # per-entity single-core proxy rate measured at the smaller round-2
        # configs — CPU step cost is near-linear in entity count, so the
        # per-entity rate transfers (documented in BASELINE.md).
        results = {}
        for scene, n, tag in [("pyramid", 0, "pyramid-20"),
                              ("pyramid", 0, "pyramid-140"),
                              ("tumbler", 2000, "tumbler"),
                              ("joint_farm", 1000, "joint_farm"),
                              ("bullet_barrage", 100, "bullet_barrage"),
                              ("dam_break", 100000, "dam_break")]:
            r = 20 if tag == "pyramid-20" else 140
            w, tag_ = build(scene, r, n)
            results[tag] = measure_world(w, tag, steps)
            prof = w.state.profile
            results[tag]["overflows"] = {
                "pairs": int(prof.overflow_pairs),
                "colors": int(prof.overflow_colors),
                "ccd": int(prof.overflow_ccd),
                "particles": int(prof.overflow_particles),
                "events_dropped": int(prof.events_dropped),
                "store_drops": int(prof.store_drops),
            }
        results["batch"] = measure_batch(steps=steps)
        results["batch_flat"] = measure_batch_flat(steps=steps)
        results["batch_flat_1024"] = measure_batch_flat(
            1024, 8, min(steps, 120))
        results["batch_flat_particles"] = measure_batch_flat_particles(
            steps=steps)
        results["batch_flat_particles_12k"] = measure_batch_flat_particles(
            n_worlds=8, particles=12000, steps=min(steps, 120))
        with open(os.path.join(os.path.dirname(__file__) or ".",
                               "BENCH_FULL.json"), "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps(results["pyramid-140"]))
        return

    scene_name = os.environ.get("BENCH_SCENE", "pyramid")
    if scene_name == "batch":
        out = measure_batch(steps=steps)
    elif scene_name == "batch_flat":
        out = measure_batch_flat(steps=steps)
    elif scene_name == "batch_flat_particles":
        out = measure_batch_flat_particles(steps=steps)
    elif scene_name == "batch_flat_particles_12k":
        out = measure_batch_flat_particles(
            n_worlds=8, particles=12000, steps=min(steps, 120))
    else:
        w, tag = build(scene_name, rows, count)
        out = measure_world(w, tag, steps)
    print(json.dumps({k: out[k] for k in
                      ("metric", "value", "unit", "vs_baseline")}))


if __name__ == "__main__":
    main()
