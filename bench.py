"""Headline benchmark: NMPC solves/s/chip at N=20 (BASELINE config 4).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the reference's real-time anchor: the
FORCES-Pro-based planner solves one 20-stage NMPC per 50 ms tick
(20 solves/s, nmpc_manage.cpp:46 / BASELINE.md).

Also reports (stderr): p99 batched-solve latency, solved fraction, mean IPM
iterations, and single-solve latency vs the 50 ms budget.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import dataclasses
    from pathlib import Path

    import jax

    # persistent compile cache: the fused-kernel solver program costs
    # ~8 min to compile cold through the remote helper; cached executables
    # load in seconds across processes/relay restarts
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import jax.numpy as jnp

    from forces_resilient_planner_tpu.config import DEFAULT_CONFIG
    from forces_resilient_planner_tpu.engine import batch as bm

    # multi-level tiered batch solve (solver/ipm_lanes.py::
    # solve_lanes_multitier): compaction levels chosen from this workload's
    # iteration histogram (tools/iteration_histogram.py: 12.3% of lanes
    # need >16 iterations, 2.7% >17, 0.45% >18, max 21) with >=2x lane
    # headroom per level.  Worth ~1.25x over the single-phase lockstep
    # while_loop and ~1.05x over the two-phase schedule.
    C = dataclasses.replace(
        DEFAULT_CONFIG,
        solver=dataclasses.replace(
            DEFAULT_CONFIG.solver, tiers=((16, 0.25), (18, 0.0625))
        ),
    )

    dev = jax.devices()[0]
    halves = np.array([[5.0, 5.0, 2.0]])
    n_goals, n_forces = 256, 16
    B = n_goals * n_forces * len(halves)

    def seeds(seed):
        rng = np.random.default_rng(seed)
        goals = rng.uniform([-3, -3, 1.0], [3, 3, 1.6], (n_goals, 3))
        forces = rng.uniform(-1.5, 1.5, (n_forces, 3))
        return goals, forces

    # compile (scenario expansion is fused into the solve: only the scenario
    # seeds — a few KB — cross the host-device boundary per call)
    g0, f0 = seeds(1)
    r = bm.solve_scenario_grid(C, g0, f0, halves)
    _ = np.asarray(r.Z)

    # timed: fresh scenario seeds each call (the runtime caches identical
    # executions); host sync via np.asarray each call
    reps = 8
    sets = [seeds(1000 + s) for s in range(reps)]
    lat = []
    solved = 0
    iters = []
    for g, f in sets:
        t0 = time.perf_counter()
        r = bm.solve_scenario_grid(C, g, f, halves)
        ec = np.asarray(r.exit_code)
        lat.append(time.perf_counter() - t0)
        solved += int(ec.sum())
        iters.append(float(np.asarray(r.iters).mean()))

    lat = np.asarray(lat)
    solves_per_s = B / lat.mean()
    p99_batch = float(np.percentile(lat, 99))
    baseline_rate = 20.0  # reference: one solve per 50 ms tick

    print(
        f"[bench] device={dev} batch={B} "
        f"mean={lat.mean()*1e3:.1f}ms min={lat.min()*1e3:.1f}ms "
        f"p99={p99_batch*1e3:.1f}ms solved={solved/(B*reps):.4f} "
        f"iters_mean={np.mean(iters):.1f} "
        f"per-solve-equiv={lat.mean()/B*1e6:.1f}us",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "nmpc_solves_per_s_per_chip_N20_batch4096",
                "value": round(float(solves_per_s), 1),
                "unit": "solves/s",
                "vs_baseline": round(float(solves_per_s / baseline_rate), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
