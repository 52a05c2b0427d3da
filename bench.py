#!/usr/bin/env python
"""Benchmark: flagship sp-nerf training throughput (rays/sec/chip).

Runs the full flagship training step (64 coarse samples, depth-guided resampling
-> 128-sample second pass, two solar-correction passes, semantic head, depth +
semantic losses, adam update) on synthetic device-resident data and reports
sustained rays/sec on the available chip.

Baseline: the driver's target is a 30k-step JAX_214 run (batch 1024 rays) in
< 10 min on a v5e-8 (BASELINE.md), i.e. 51,200 rays/s across 8 chips =
6,400 rays/s/chip sustained on this exact step. vs_baseline is measured/6400.
The reference publishes no throughput numbers of its own (SURVEY.md section 6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

BASELINE_RAYS_PER_SEC_PER_CHIP = 6400.0


def main():
    import jax

    from spnerf_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    from spnerf_tpu.utils.synth import bench_setup

    # the exact program (full 8x512 flagship field, synthetic device-resident
    # scene) is defined once in utils/synth.bench_setup so `tools warm-cache`
    # pre-compiles the same HLO this script times.
    # one dispatch drives a whole 100-step window via lax.scan: per-step host
    # dispatch latency (large through tunneled runtimes) is fully amortized,
    # and a host fetch of the loss is an unambiguous sync point. Window sweep
    # on the v5e (round 3): 25 -> 19,920 rays/s, 50 -> 20,246, 100 -> 20,394
    # (batch 2048 is worse at every window; matches the round-1 batch sweep)
    batch_size, n_inner = 1024, 100
    tr, state, data, run = bench_setup(batch_size, n_inner)
    key = jax.random.PRNGKey(1)

    state, ld = run(state, data, key)
    float(ld["loss"])  # compile + warmup

    n_groups = 2
    t0 = time.perf_counter()
    for _ in range(n_groups):
        state, ld = run(state, data, key)
        float(ld["loss"])
    dt = time.perf_counter() - t0
    n_steps = n_groups * n_inner

    rays_per_sec = n_steps * batch_size / dt
    print(json.dumps({
        "metric": "flagship_train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
