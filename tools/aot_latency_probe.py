"""Single-solve (B=1) latency attribution: jit vs AOT vs the relay floor.

BENCH_r03 measured single_solve_p50 ~31 ms against compute of ~1 ms; the
CLAUDE.md ledger attributes 31-37 ms to per-call dispatch overhead.  This
probe separates the avoidable from the unavoidable:

  noop      — jit(x+1) on a 4-float array: the pure host->relay->device
              round-trip floor.  Nothing dispatched from this host can
              beat it.
  jit       — the untiered B=1 solve through the normal jit path.
  aot       — the same executable through a jax.export artifact
              (utils/aot.py), i.e. "FORCES-style shipped solver".
  pipelined — K=8 solves issued back-to-back, syncing only at the end:
              the effective per-solve latency when the 20 Hz loop overlaps
              dispatch with compute (dispatch for tick k+1 issued before
              reading tick k).

Usage: python tools/aot_latency_probe.py
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    import bench

    bench.setup_cache()

    from forces_resilient_planner_tpu.engine import batch as bm
    from forces_resilient_planner_tpu.solver import ipm_lanes
    from forces_resilient_planner_tpu.utils import aot

    C = dataclasses.replace(
        bench.bench_config(),
        solver=dataclasses.replace(bench.bench_config().solver, tiers=()),
    )

    def pct(lat):
        a = np.asarray(lat) * 1e3
        return dict(p50=round(float(np.percentile(a, 50)), 2),
                    p99=round(float(np.percentile(a, 99)), 2))

    # ---- relay floor -----------------------------------------------------
    tiny = jnp.zeros(4, jnp.float32)
    f_noop = jax.jit(lambda x: x + 1.0)
    np.asarray(f_noop(tiny))
    lat = []
    for s in range(40):
        x = tiny + float(s)
        t0 = time.perf_counter()
        np.asarray(f_noop(x))
        lat.append(time.perf_counter() - t0)
    res = {"noop_ms": pct(lat)}

    # ---- normal jit B=1 solve -------------------------------------------
    def scen(s):
        g, f = bench.bench_seeds(2000 + s, n_goals=1, n_forces=1)
        return g, f

    g0, f0 = scen(0)
    r = bm.solve_scenario_grid(C, g0, f0, bench.HALVES)
    np.asarray(r.Z)
    lat = []
    for s in range(40):
        g, f = scen(s)
        t0 = time.perf_counter()
        r = bm.solve_scenario_grid(C, g, f, bench.HALVES)
        np.asarray(r.exit_code)
        lat.append(time.perf_counter() - t0)
    res["jit_ms"] = pct(lat)

    # ---- AOT artifact ----------------------------------------------------
    blob = aot.export_batched_solver(C, batch=1)
    solver = aot.load_solver(blob)
    scen0 = bm.make_scenarios(C, g0, f0, bench.HALVES, dtype=jnp.float32)
    rr = solver(scen0.Z0, scen0.params)
    np.asarray(rr.Z)
    lat = []
    for s in range(40):
        g, f = scen(100 + s)
        sc = bm.make_scenarios(C, g, f, bench.HALVES, dtype=jnp.float32)
        t0 = time.perf_counter()
        rr = solver(sc.Z0, sc.params)
        np.asarray(rr.exit_code)
        lat.append(time.perf_counter() - t0)
    res["aot_ms"] = pct(lat)

    # ---- pipelined dispatch ---------------------------------------------
    K = 8
    reps = 6
    eff = []
    for rep in range(reps):
        scs = [
            bm.make_scenarios(
                C, *scen(500 + rep * K + k), bench.HALVES, dtype=jnp.float32
            )
            for k in range(K)
        ]
        t0 = time.perf_counter()
        outs = [solver(sc.Z0, sc.params) for sc in scs]
        for o in outs:
            np.asarray(o.exit_code)
        eff.append((time.perf_counter() - t0) / K)
    res["pipelined_per_solve_ms"] = pct(eff)

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
