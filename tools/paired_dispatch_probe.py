"""Probe: solve TWO 4096-lane scenario sets per dispatch.

With the fully-fused iteration kernel the device time per set (~19 ms)
is now comparable to the per-dispatch relay gap (~4 ms x 2 dispatches);
pairing two sets inside one executable halves the dispatch count while
keeping the 4096-lane shape the solver is tuned for (B=8192 as ONE batch
is a measured negative — super-linear latency).
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
    def expand2(x0_, ga, fa, gb, fb, h_):
        sa = bm._expand_scenarios_device(C, x0_, ga, fa, h_, weights)
        sb = bm._expand_scenarios_device(C, x0_, gb, fb, h_, weights)
        return sa, sb

    @jax.jit
    def solve2(sa, sb):
        ra = ipm_lanes.solve_batch_lanes_tiered(
            sa.Z0, sa.params, C.model, C.solver
        )
        rb = ipm_lanes.solve_batch_lanes_tiered(
            sb.Z0, sb.params, C.model, C.solver
        )
        return ra, rb

    x0j = jnp.asarray(x0, dtype)
    hj = jnp.asarray(bench.HALVES, dtype)

    def j(g):
        return jnp.asarray(g, dtype)

    ga, fa = bench.bench_seeds(1)
    gb, fb = bench.bench_seeds(2)
    t0 = time.perf_counter()
    sa, sb = expand2(x0j, j(ga), j(fa), j(gb), j(fb), hj)
    ra, rb = solve2(sa, sb)
    _ = np.asarray(ra.exit_code), np.asarray(rb.exit_code)
    print(f"compile+first {time.perf_counter()-t0:.1f}s", flush=True)

    B = int(ra.exit_code.shape[0])
    reps = 4                               # x2 sets per rep = 8 sets
    t0 = time.perf_counter()
    results = []
    for s in range(reps):
        ga, fa = bench.bench_seeds(3000 + 2 * s)
        gb, fb = bench.bench_seeds(3000 + 2 * s + 1)
        sa, sb = expand2(x0j, j(ga), j(fa), j(gb), j(fb), hj)
        results.append(solve2(sa, sb))
    solved = sum(
        int(np.asarray(r.exit_code == 1).sum()) for pair in results for r in pair
    )
    wall = time.perf_counter() - t0
    n = B * reps * 2
    print(
        f"paired streamed {n/wall:.0f} solves/s solved={solved/n:.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
