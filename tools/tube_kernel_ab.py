"""A/B the tube kernel's Taylor length on-chip (round-5 ledger entry).

Times ops/tube_pallas.tube_stage_lanes at the production stage-lane count
(B=4096 x 19 stages) for the current N_TERMS and for a given override,
fresh inputs per call (the relay caches identical executions) with a
scalar-reduced sync (full-output syncs are relay-transfer-dominated).

Measured (round 5, same relay window): 12 terms 31.9 ms min incl.
dispatch -> 7 terms 26.6 ms min; accuracy basis in
tube/lyapunov.py::taylor_n_terms.

Usage: python tools/tube_kernel_ab.py [n_terms_b=12] [L=77824]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def time_kernel(n_terms: int, L: int, reps: int = 8):
    import jax
    import jax.numpy as jnp

    from forces_resilient_planner_tpu.config import DEFAULT_CONFIG as C
    from forces_resilient_planner_tpu.ops import tube_pallas as tp

    tp.N_TERMS = n_terms
    rng = np.random.default_rng(0)
    f = jax.jit(lambda x, u: tp.tube_stage_lanes(x, u, C.model, C.tube))
    xs = [jnp.asarray(rng.normal(0, 0.4, (L, 9)), jnp.float32)
          for _ in range(reps)]
    us = [jnp.asarray(np.array([0, 0, 0, 7.3]) + rng.normal(0, 0.5, (L, 4)),
                      jnp.float32) for _ in range(reps)]
    r = f(xs[0], us[0])
    np.asarray(r[0][:1])                     # compile + warm
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        r = f(xs[i], us[i])
        np.asarray(r[0][0, 0, 0])            # scalar-reduced sync
        ts.append((time.perf_counter() - t0) * 1e3)
    ts = np.array(ts[1:])                    # drop post-compile outlier
    return float(ts.min()), float(np.median(ts))


def main():
    import bench

    bench.setup_cache()
    from forces_resilient_planner_tpu.ops import tube_pallas as tp

    n_b = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 4096 * 19
    n_a = tp.N_TERMS
    try:
        mn_a, md_a = time_kernel(n_a, L)
        mn_b, md_b = time_kernel(n_b, L)
    finally:
        tp.N_TERMS = n_a
    print(f"[tube-ab] L={L}  A: {n_a} terms min {mn_a:.1f} ms p50 {md_a:.1f}"
          f"  |  B: {n_b} terms min {mn_b:.1f} ms p50 {md_b:.1f}"
          f"  (incl. relay dispatch; same window)")


if __name__ == "__main__":
    main()
