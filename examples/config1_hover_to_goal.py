"""BASELINE config 1: single hover-to-goal NMPC, zero force, box corridor.

Solves the N=20 NLP once and (optionally, --oracle) certifies the solution
against the independent CPU re-solve.
"""
import argparse

import numpy as np

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--oracle", action="store_true", help="cross-check vs CPU oracle (slow, needs x64)")
    ap.add_argument("--cpu", action="store_true", help="run on CPU")
    args = ap.parse_args()

    import jax
    if args.cpu or args.oracle:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from forces_resilient_planner_tpu.config import DEFAULT_CONFIG as C
    from forces_resilient_planner_tpu.solver import ipm
    from forces_resilient_planner_tpu.solver.problems import (
        hover_to_goal_params, hover_warm_start,
    )

    dtype = jnp.float64 if (args.cpu or args.oracle) else jnp.float32
    x0 = np.zeros(9); x0[2] = 1.2
    goal = np.array([1.5, 0.8, 1.2])
    p = hover_to_goal_params(x0, goal, C.model, C.weights, dtype=dtype)
    Z0 = hover_warm_start(jnp.asarray(x0, dtype), C.model)
    res = ipm.solve(Z0, p, C.model, C.solver)
    print(f"exit={int(res.exit_code)} iters={int(res.iters)} kkt={float(res.kkt_error):.2e}")
    print("u0 =", np.round(np.asarray(res.Z[0, :4]), 4))
    print("terminal pos =", np.round(np.asarray(res.Z[-1, 8:11]), 4))

    if args.oracle:
        from forces_resilient_planner_tpu.oracle.cpu_oracle import solve_oracle
        Zo, r = solve_oracle(p, C.model, C.solver)
        err = np.max(np.abs(np.asarray(res.Z[:, :4]) - Zo[:, :4]))
        print(f"control parity vs oracle: {err:.2e} (target < 1e-3)")


if __name__ == "__main__":
    main()
