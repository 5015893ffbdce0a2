"""Measure one-dispatch-per-set (expansion fused into the solve program)
vs the two-dispatch default.

Round-1 measured the fused arrangement 4.3x SLOWER (XLA scheduled the
expanded parameter tensors poorly around the IPM while-loop).  With the
whole-iteration Pallas kernel the program structure changed completely;
re-measure before keeping the two-dispatch default.  Streamed mode pays
~6.5 ms of relay gap per dispatch, so one dispatch/set could be worth
~+15% if the old scheduling pathology is gone.
"""
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp

    import bench
    from forces_resilient_planner_tpu.engine import batch as bm
    from forces_resilient_planner_tpu.solver import ipm_lanes, nlp

    C = bench.bench_config()
    dtype = jnp.float32
    x0 = np.zeros(9)
    x0[2] = 1.2
    weights = nlp.make_stage_weights(
        C.weights, C.model.N, final=False, dtype=dtype
    )

    @jax.jit
    def fused(x0_, g_, f_, h_):
        scen = bm._expand_scenarios_device(C, x0_, g_, f_, h_, weights)
        return ipm_lanes.solve_batch_lanes_tiered(
            scen.Z0, scen.params, C.model, C.solver
        )

    x0j = jnp.asarray(x0, dtype)
    hj = jnp.asarray(bench.HALVES, dtype)

    g, f = bench.bench_seeds(1)
    t0 = time.perf_counter()
    r = fused(x0j, jnp.asarray(g, dtype), jnp.asarray(f, dtype), hj)
    _ = np.asarray(r.exit_code)
    print(f"fused-dispatch compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)

    # per-call
    lat = []
    for s in range(6):
        g, f = bench.bench_seeds(1000 + s)
        t0 = time.perf_counter()
        r = fused(x0j, jnp.asarray(g, dtype), jnp.asarray(f, dtype), hj)
        ec = np.asarray(r.exit_code)
        lat.append(time.perf_counter() - t0)
    B = ec.size
    print(
        f"per-call mean {np.mean(lat)*1e3:.1f}ms -> "
        f"{B/np.mean(lat):.0f} solves/s solved={ec.mean():.4f}",
        flush=True,
    )

    # streamed
    sets = [bench.bench_seeds(3000 + s) for s in range(8)]
    t0 = time.perf_counter()
    rs = [
        fused(x0j, jnp.asarray(g, dtype), jnp.asarray(f, dtype), hj)
        for g, f in sets
    ]
    solved = sum(int(np.asarray(r.exit_code == 1).sum()) for r in rs)
    wall = time.perf_counter() - t0
    print(
        f"streamed {B*8/wall:.0f} solves/s solved={solved/(B*8):.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
