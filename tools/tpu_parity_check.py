"""On-chip parity certificate for the EXACT benchmarked solver path.

BASELINE's north star reads ">=10k solves/s/chip ... matching FORCES Pro
controls to 1e-3".  bench.py produces the first half on the real TPU
(f32, Pallas fused kernels, multi-level tier schedule); the f64 parity
suite (tests/test_solver_parity.py) proves the second half on CPU.  This
tool ties both halves to the SAME execution: it runs bench.py's
configuration and scenario seeds on the TPU, then re-solves a lane subset
with the independent f64 CPU oracle (scipy SLSQP, oracle/cpu_oracle.py)
in a subprocess and asserts max |u_tpu - u_oracle| <= 1e-3 over the
4x20 control sequence (the FORCES output analog, forces_normal.cpp:142-168).

Writes PARITY_TPU.json, which bench.py folds into its "extras".

Usage:
  python tools/tpu_parity_check.py            # TPU stage + oracle subprocess
  python tools/tpu_parity_check.py --oracle F # (internal) oracle stage on F
"""
from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

N_LANES = 32          # oracle lanes: ~3 s/solve on CPU
SEED = 1000           # first timed seed set of bench.py
TOL = 1e-3


def tpu_stage(dump: Path):
    import jax

    import bench

    bench.setup_cache()
    from forces_resilient_planner_tpu.engine import batch as bm

    C = bench.bench_config()
    g, f = bench.bench_seeds(SEED)
    t0 = time.perf_counter()
    r = bm.solve_scenario_grid(C, g, f, bench.HALVES)
    u = np.asarray(r.Z[:, :, 0:4])
    ec = np.asarray(r.exit_code)
    it = np.asarray(r.iters)
    print(
        f"[tpu] device={jax.devices()[0]} B={len(ec)} "
        f"solved={ec.mean():.4f} wall={time.perf_counter()-t0:.1f}s",
        flush=True,
    )

    B = len(ec)
    # lane selection: evenly spread + the highest-iteration (hardest) lanes,
    # solved lanes only (unsolved lanes have no KKT point to certify)
    solved_idx = np.flatnonzero(ec == 1)
    spread = solved_idx[
        np.linspace(0, len(solved_idx) - 1, N_LANES * 3 // 4).astype(int)
    ]
    hard = solved_idx[np.argsort(it[solved_idx])[::-1][: N_LANES]]
    # hard lanes FIRST, topped up with spread lanes: np.unique would sort
    # indices and discard the high-index hard lanes whenever |spread|+|hard|
    # exceeds N_LANES, silently weakening the hard-lane coverage
    sel = np.concatenate([hard, np.setdiff1d(spread, hard)])[:N_LANES]

    np.savez(
        dump,
        sel=sel,
        u_tpu=u[sel],
        iters=it[sel],
        exit_code=ec[sel],
        seed=SEED,
        B=B,
    )
    return sel


def oracle_stage(dump: Path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import bench

    from forces_resilient_planner_tpu.engine import batch as bm
    from forces_resilient_planner_tpu.oracle.cpu_oracle import solve_oracle

    data = np.load(dump)
    sel, u_tpu = data["sel"], data["u_tpu"]
    C = bench.bench_config()

    # rebuild the identical scenario set at f64 host-side; make_scenarios
    # and the device-side expansion share the (goal-major, force, corridor)
    # ordering (engine/batch.py)
    g, f = bench.bench_seeds(int(data["seed"]))
    scen = bm.make_scenarios(C, g, f, bench.HALVES, dtype=jnp.float64)
    assert scen.batch == int(data["B"])

    diffs, statuses = [], []
    t0 = time.perf_counter()
    for j, lane in enumerate(sel):
        p_lane = jax.tree.map(lambda a: a[int(lane)], scen.params)
        Z, res = solve_oracle(p_lane, C.model, C.solver)
        du = np.abs(np.asarray(Z[:, 0:4]) - u_tpu[j])
        diffs.append(du.max())
        statuses.append(int(res.status))
        print(
            f"[oracle] lane {lane}: max|du|={du.max():.2e} "
            f"slsqp_status={res.status} iters_tpu={int(data['iters'][j])}",
            flush=True,
        )
    wall = time.perf_counter() - t0
    diffs = np.asarray(diffs)
    # SLSQP status 8 ("positive directional derivative") is a stall at the
    # optimum, typical near an active set at ftol=1e-14; such lanes carry
    # diffs indistinguishable from status-0 lanes, so the certificate
    # covers ALL lanes and additionally reports the strictly-converged max
    ok_oracle = np.asarray(statuses) == 0
    result = {
        "n_lanes": int(len(sel)),
        "n_oracle_converged": int(ok_oracle.sum()),
        "max_u_diff": float(diffs.max()),
        "max_u_diff_strict_lanes": float(diffs[ok_oracle].max())
        if ok_oracle.any() else None,
        "p99_u_diff": float(np.percentile(diffs, 99)),
        "tol": TOL,
        "pass": bool(diffs.max() <= TOL),
        "seed": int(data["seed"]),
        "batch": int(data["B"]),
        "config": "bench.bench_config() [f32+Pallas+tiers((16,1/4),(18,1/16)) on TPU]",
        "oracle_wall_s": round(wall, 1),
    }
    out = ROOT / "PARITY_TPU.json"
    out.write_text(json.dumps(result, indent=1))
    print(f"[oracle] {json.dumps(result)}", flush=True)
    assert result["pass"], f"parity FAILED: max|du|={result['max_u_diff']:.2e}"


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--oracle":
        oracle_stage(Path(sys.argv[2]))
        return
    dump = Path(tempfile.gettempdir()) / "frp_tpu_parity_dump.npz"
    tpu_stage(dump)
    # oracle runs in a fresh process: it needs CPU + x64, the TPU stage has
    # already bound the axon backend in this one
    rc = subprocess.call(
        [sys.executable, __file__, "--oracle", str(dump)], cwd=str(ROOT)
    )
    sys.exit(rc)


if __name__ == "__main__":
    main()
