"""Measure the per-IPM-iteration cost on the real chip.

Runs the bench scenario grid single-phase (no tiers) with convergence
disabled (tolerances ~0) at two fixed iteration caps; the wall-clock
difference divided by the cap difference is the marginal cost of one
full-batch IPM iteration, and the extrapolated intercept is the fixed
overhead (dispatch + expansion + layout moves).  This decides where
optimization effort goes: iteration count (exhausted, see CLAUDE.md),
per-iteration kernel cost, or dispatch overhead.

Two cold compiles (~8-9 min each through the remote helper) on first use.

Usage: python tools/iteration_cost_probe.py [iters_lo] [iters_hi]
"""
import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def run_fixed(iters: int):
    import jax

    from forces_resilient_planner_tpu.config import DEFAULT_CONFIG
    from forces_resilient_planner_tpu.engine import batch as bm
    import bench

    C = dataclasses.replace(
        DEFAULT_CONFIG,
        solver=dataclasses.replace(
            DEFAULT_CONFIG.solver,
            max_iters=iters, tiers=(),
            tol_stat=1e-12, tol_eq=1e-12, tol_ineq=1e-12, tol_comp=1e-12,
        ),
    )
    g0, f0 = bench.bench_seeds(1)
    t0 = time.perf_counter()
    r = bm.solve_scenario_grid(C, g0, f0, bench.HALVES)
    _ = np.asarray(r.Z)
    print(f"[{iters} iters] compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    lat = []
    for s in range(5):
        g, f = bench.bench_seeds(1000 + s)
        t0 = time.perf_counter()
        r = bm.solve_scenario_grid(C, g, f, bench.HALVES)
        it = np.asarray(r.iters)
        lat.append(time.perf_counter() - t0)
        # lockstep cost is set by the while_loop trip count = the max lane;
        # isolated NaN dropouts (barrier at the 1e-12-tol floor) are fine
        assert it.max() == iters, it.max()
    m = float(np.mean(lat))
    print(f"[{iters} iters] mean={m*1e3:.1f}ms", flush=True)
    return m


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", str(ROOT / ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    t_lo = run_fixed(lo)
    t_hi = run_fixed(hi)
    per_iter = (t_hi - t_lo) / (hi - lo)
    overhead = t_lo - lo * per_iter
    print(
        f"per-iteration {per_iter*1e3:.2f}ms  "
        f"fixed-overhead {overhead*1e3:.1f}ms "
        f"(dispatch + expansion + layout moves)",
        flush=True,
    )


if __name__ == "__main__":
    main()
