"""Solver-knob experiment runner (real chip).

Usage: python tools/solver_knob_experiment.py '{"mu_init": 0.1}' [tag] [n_goals] [reps]
Applies the JSON dict as dataclasses.replace overrides on DEFAULT_CONFIG.solver
("tiers" lists become tuples), runs the (n_goals x 16)-scenario grid
(default 256 x 16 = 4096), prints timing + iteration histogram.
"""
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys_path_root = str(Path(__file__).resolve().parents[1])
import sys as _sys
if sys_path_root not in _sys.path:
    _sys.path.insert(0, sys_path_root)


def main():
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parents[1] / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from forces_resilient_planner_tpu.config import DEFAULT_CONFIG
    from forces_resilient_planner_tpu.engine import batch as bm

    overrides = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
    tag = sys.argv[2] if len(sys.argv) > 2 else json.dumps(overrides)
    if "tiers" in overrides:
        overrides["tiers"] = tuple(tuple(t) for t in overrides["tiers"])
    C = dataclasses.replace(
        DEFAULT_CONFIG,
        solver=dataclasses.replace(DEFAULT_CONFIG.solver, **overrides),
    )

    halves = np.array([[5.0, 5.0, 2.0]])
    n_goals = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    n_forces = 16
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
    print(f"[{tag}] compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

    lat, its, solved = [], [], 0
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    for s in range(reps):
        g, f = seeds(1000 + s)
        t0 = time.perf_counter()
        r = bm.solve_scenario_grid(C, g, f, halves)
        ec = np.asarray(r.exit_code)
        lat.append(time.perf_counter() - t0)
        solved += int(ec.sum())
        its.append(np.asarray(r.iters))
    lat = np.asarray(lat)
    it = np.concatenate(its)
    hist = {int(k): int(v) for k, v in zip(*np.unique(it, return_counts=True))}
    print(f"[{tag}] mean={lat.mean()*1e3:.1f}ms min={lat.min()*1e3:.1f}ms "
          f"solves/s={B/lat.mean():.0f} solved={solved/(B*reps):.4f} "
          f"iters mean={it.mean():.2f} max={it.max()}", flush=True)
    print(f"[{tag}] hist={hist}", flush=True)

    # streamed throughput (pipelined dispatch, the bench headline mode)
    sets = [seeds(4000 + s) for s in range(reps)]
    t0 = time.perf_counter()
    rs = bm.solve_scenario_stream(C, sets, halves)
    s_solved = sum(int(np.asarray(r.exit_code == 1).sum()) for r in rs)
    wall = time.perf_counter() - t0
    print(
        f"[{tag}] streamed: {B*reps/wall:.0f} solves/s "
        f"solved={s_solved/(B*reps):.4f}",
        flush=True,
    )
    n = it.size
    cum = 0
    tail = {}
    for k in sorted(hist, reverse=True):
        cum += hist[k]
        tail[k] = round(cum / n * 100, 2)
    print(f"[{tag}] tail%>=k: {tail}", flush=True)


if __name__ == "__main__":
    main()
