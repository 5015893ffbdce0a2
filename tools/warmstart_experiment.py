"""Warm-start / barrier-schedule iteration study on CPU (fast, no TPU
compiles).

Runs the bench scenario distribution (or a sub-batch of it) through the
lane-major tiered solver on CPU at f32 — same algorithm and dtype as the
TPU bench, XLA Riccati path instead of Pallas — and prints the iteration
histogram + solved fraction for a list of solver-config overrides.

Usage: python tools/warmstart_experiment.py [batch_lanes] [reps]
"""
import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

sys_path_root = str(Path(__file__).resolve().parents[1])
if sys_path_root not in sys.path:
    sys.path.insert(0, sys_path_root)


def run_case(tag, overrides, n_goals, n_forces, reps):
    import jax

    from forces_resilient_planner_tpu.config import DEFAULT_CONFIG
    from forces_resilient_planner_tpu.engine import batch as bm

    C = dataclasses.replace(
        DEFAULT_CONFIG,
        solver=dataclasses.replace(DEFAULT_CONFIG.solver, **overrides),
    )
    halves = np.array([[5.0, 5.0, 2.0]])
    B = n_goals * n_forces

    def seeds(seed):
        rng = np.random.default_rng(seed)
        goals = rng.uniform([-3, -3, 1.0], [3, 3, 1.6], (n_goals, 3))
        forces = rng.uniform(-1.5, 1.5, (n_forces, 3))
        return goals, forces

    g0, f0 = seeds(1)
    t0 = time.perf_counter()
    r = bm.solve_scenario_grid(C, g0, f0, halves)
    _ = np.asarray(r.Z)
    compile_s = time.perf_counter() - t0

    its, solved, kkt = [], 0, []
    t0 = time.perf_counter()
    for s in range(reps):
        g, f = seeds(1000 + s)
        r = bm.solve_scenario_grid(C, g, f, halves)
        ec = np.asarray(r.exit_code)
        solved += int(ec.sum())
        its.append(np.asarray(r.iters))
        kkt.append(np.asarray(r.kkt_error))
    wall = time.perf_counter() - t0
    it = np.concatenate(its)
    hist = {int(k): int(v) for k, v in zip(*np.unique(it, return_counts=True))}
    n = it.size
    cum, tail = 0, {}
    for k in sorted(hist, reverse=True):
        cum += hist[k]
        tail[k] = round(cum / n * 100, 2)
    print(
        f"[{tag}] compile={compile_s:.1f}s wall={wall:.1f}s "
        f"solved={solved/(B*reps):.4f} iters mean={it.mean():.2f} "
        f"p90={np.percentile(it, 90):.0f} max={it.max()}",
        flush=True,
    )
    print(f"[{tag}] tail%>=k: {tail}", flush=True)
    return it


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    n_goals = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_forces = 16

    import json

    if len(sys.argv) > 3:
        cases = [(tag, ov) for tag, ov in json.loads(sys.argv[3])]
    else:
        cases = [
            ("hover", {"warm_start": "hover"}),
            ("hover+k0.1", {"kappa_mu": 0.1}),
            ("hover+k0.05", {"kappa_mu": 0.05}),
            ("hover+tau0.999", {"frac_to_boundary": 0.999}),
            ("lqrsat", {"warm_start": "lqr"}),
            ("lqrsat+mu0.1", {"warm_start": "lqr", "mu_init": 0.1}),
            ("lqrsat+mu0.03", {"warm_start": "lqr", "mu_init": 0.03}),
        ]
    for tag, ov in cases:
        run_case(tag, ov, n_goals, n_forces, reps)


if __name__ == "__main__":
    main()
