"""Oracle classification of solver failures on the adversarial stress
distribution — quantifies the filter-line-search / SOC capability gap.

The reference's FORCES solver is a filter-line-search IPM with
second-order corrections (FORCESNLPsolver_normal.h:86-107); ours is a
fraction-to-boundary IPM with NaN guards.  tests/test_solver_stress.py
proves the SAFETY half (zero false optimals); this tool measures the
CAPABILITY half: of the stress lanes our solver fails, how many were
actually solvable?

Method: enlarge the stress batch (same distribution as
test_stress_batch_no_false_optimals: random tight/shifted corridors,
forces up to 4 m/s^2, random goals) to B lanes, solve with the
production lane-major IPM at f64, then for every failed lane run the
independent SLSQP oracle with multi-start (oracle/cpu_oracle.py).  A
failed lane counts as a CAPABILITY MISS only if the oracle finds a point
that (a) passes the independent KKT certificate and (b) satisfies every
constraint to tolerance — i.e. the problem was provably feasible and
another algorithm solved it.  Reports:

  solve_rate_overall          solved / B
  n_failed, n_oracle_feasible
  solve_rate_feasible_subset  solved / (solved + capability misses)
  exit-code family breakdown of the failures (-7 infeasibility
  certificates should dominate the genuinely-infeasible lanes)

Also CROSS-CHECKS the -7 (NOPROGRESS) taxonomy: a -7 lane where the
oracle finds a feasible KKT point is a mis-classified infeasibility
certificate (reported separately).

Usage: python tools/stress_oracle_classify.py [B] [--json out.json]
(CPU, f64; ~1 min per failed lane.)
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def stress_params(B: int, seed: int = 123):
    """The exact distribution of test_solver_stress.py::
    test_stress_batch_no_false_optimals, enlarged."""
    import jax
    import jax.numpy as jnp

    from forces_resilient_planner_tpu.config import DEFAULT_CONFIG as C
    from forces_resilient_planner_tpu.solver.problems import (
        hover_to_goal_params,
        hover_warm_start,
    )

    X0 = np.zeros(9)
    X0[2] = 1.2
    rng = np.random.default_rng(seed)
    params_list = []
    for _ in range(B):
        goal = rng.uniform([-2.5, -2.5, 0.6], [2.5, 2.5, 2.2], 3)
        f = rng.uniform(-4, 4, 3)
        half = rng.uniform([0.3, 0.3, 0.4], [4.0, 4.0, 2.0], 3)
        center = 0.5 * (X0[:3] + goal) + rng.uniform(-0.5, 0.5, 3)
        params_list.append(
            hover_to_goal_params(
                X0, goal, C.model, C.weights, f_ext=tuple(f),
                corridor_center=center, corridor_half=tuple(half),
            )
        )
    params = jax.tree.map(lambda *a: jnp.stack(a), *params_list)
    Z0 = jnp.tile(
        hover_warm_start(jnp.asarray(X0), C.model)[None], (B, 1, 1)
    )
    return Z0, params


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    out_path = ROOT / "STRESS_ORACLE.json"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import dataclasses

    import jax.numpy as jnp

    from forces_resilient_planner_tpu.config import DEFAULT_CONFIG as C
    from forces_resilient_planner_tpu.oracle.cpu_oracle import (
        kkt_certificate,
        solve_oracle,
    )
    from forces_resilient_planner_tpu.solver import ipm_lanes

    t0 = time.perf_counter()
    Z0, params = stress_params(B)
    scfg = dataclasses.replace(C.solver, tiers=())
    r = jax.jit(
        lambda z, p: ipm_lanes.solve_batch_lanes_tiered(z, p, C.model, scfg)
    )(Z0, params)
    ec = np.asarray(r.exit_code)
    solved = ec == 1
    failed_idx = np.flatnonzero(~solved)
    fam = {int(c): int((ec == c).sum()) for c in np.unique(ec)}
    print(
        f"[stress] B={B} solved={solved.mean():.4f} exit families={fam} "
        f"({time.perf_counter() - t0:.1f}s)",
        flush=True,
    )

    # oracle classification of every failed lane; per-lane results stream
    # to a jsonl so an interrupted run resumes (the failed-lane set is
    # deterministic per (B, seed))
    part = ROOT / "STRESS_ORACLE.partial.jsonl"
    done_lanes = {}
    if part.exists():
        for line in part.read_text().splitlines():
            try:
                rec = json.loads(line)
                done_lanes[rec["lane"]] = rec
            except Exception:
                pass
        if done_lanes:
            print(f"[resume] {len(done_lanes)} lanes already classified",
                  flush=True)
    rng = np.random.default_rng(999)
    misses = []          # feasible per oracle, our solver failed
    mis7 = []            # -7 lanes the oracle proves feasible
    results = []
    for j, lane in enumerate(failed_idx):
        if int(lane) in done_lanes:
            rec = done_lanes[int(lane)]
            if rec["feasible"]:
                misses.append(int(lane))
                if ec[lane] == -7:
                    mis7.append(int(lane))
            results.append(rec)
            continue
        p_lane = jax.tree.map(lambda a: a[int(lane)], params)
        feasible = False
        best = None
        for trial in range(3):
            if trial == 0:
                v0 = None
            else:
                nv = 4 + 4 * C.model.N
                v0 = np.zeros(nv)
                v0[3::4] = C.model.hover_thrust
                v0 = v0 + rng.normal(0, 0.05, nv)
            try:
                Z, res = solve_oracle(p_lane, C.model, scfg, v0=v0, ftol=1e-10)
            except Exception as e:   # SLSQP can die on NaN cost
                best = ("error", repr(e))
                continue
            feas, stat = kkt_certificate(np.asarray(res.x), p_lane, C.model, scfg)
            best = (int(res.status), float(feas), float(stat))
            # provably feasible + stationary point found by the oracle
            if feas <= 1e-7 and stat <= 1e-3:
                feasible = True
                break
        if feasible:
            misses.append(int(lane))
            if ec[lane] == -7:
                mis7.append(int(lane))
        rec = dict(lane=int(lane), exit=int(ec[lane]), oracle=best,
                   feasible=feasible)
        results.append(rec)
        with part.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(
            f"[oracle] {j + 1}/{len(failed_idx)} lane {lane} exit={ec[lane]} "
            f"-> {'FEASIBLE (capability miss)' if feasible else 'infeasible/unsolved'} "
            f"{best}",
            flush=True,
        )

    n_solved = int(solved.sum())
    n_miss = len(misses)
    rate_feas = n_solved / max(n_solved + n_miss, 1)
    out = {
        "B": B,
        "solve_rate_overall": float(solved.mean()),
        "n_failed": int(len(failed_idx)),
        "exit_families": {str(k): v for k, v in fam.items()},
        "n_capability_misses": n_miss,
        "miss_lanes": misses,
        "solve_rate_feasible_subset": rate_feas,
        "noprogress_misclassified": mis7,
        "n_noprogress_misclassified": len(mis7),
        "wall_s": round(time.perf_counter() - t0, 1),
        "config": "DEFAULT_CONFIG f64 single-phase lanes vs SLSQP "
                  "multi-start + KKT certificate",
    }
    out_path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
