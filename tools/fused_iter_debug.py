"""Interpret-mode parity driver for the fused IPM iteration kernel.

Runs the XLA lane-major solver and a manual loop over
ops/ipm_pallas.py::ipm_iteration_fused(interpret=True) on the same small
scenario batch (CPU, f32) and compares outcomes.  Debugging aid for the
kernel; the formal version lives in tests/test_ops.py.
"""
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
os.environ["FRP_PALLAS_ITER"] = "0"
os.environ["FRP_PALLAS_LQR"] = "0"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from forces_resilient_planner_tpu.config import DEFAULT_CONFIG as C
from forces_resilient_planner_tpu.engine import batch as bm
from forces_resilient_planner_tpu.ops import ipm_pallas
from forces_resilient_planner_tpu.solver import ipm_lanes


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    rng = np.random.default_rng(7)
    goals = rng.uniform([-3, -3, 1.0], [3, 3, 1.6], (8, 3))
    forces = rng.uniform(-1.5, 1.5, (2, 3))
    halves = np.array([[5.0, 5.0, 2.0]])
    scen = bm.make_scenarios(C, goals, forces, halves, dtype=jnp.float32)
    B = scen.batch
    Z0 = jnp.moveaxis(scen.Z0, 0, -1)
    params = ipm_lanes.lanes_params(scen.params)

    st = ipm_lanes._init_state(Z0, params, C.model, C.solver)
    ref = ipm_lanes._run_lanes(st, params, C.model, C.solver, K)

    dtype = jnp.float32
    st_f = st
    for step in range(K):
        Z, lam, s, mu_d, mu, it, done, err = st_f
        if bool(np.all(np.asarray(done))):
            break
        scal = jnp.stack(
            [mu, it.astype(dtype), done.astype(dtype), err], axis=0
        )
        Zn, lamn, sn, mudn, scaln = ipm_pallas.ipm_iteration_fused(
            Z, lam, s, mu_d, scal, params.weights,
            params.ref_pos, params.ref_yaw,
            params.corridor_A, params.corridor_b,
            params.f_ext, params.xinit,
            jnp.full((B,), float(K), dtype), C.model, C.solver,
            interpret=True,
        )
        st_f = (
            Zn, lamn, sn, mudn, scaln[0],
            scaln[1].astype(jnp.int32), scaln[2] > 0.5, scaln[3],
        )
        print(
            f"step {step}: done={int(np.asarray(st_f[6]).sum())}/{B} "
            f"err_med={np.median(np.asarray(st_f[7])):.2e}",
            flush=True,
        )

    Zr, itr, doner = np.asarray(ref[0]), np.asarray(ref[5]), np.asarray(ref[6])
    Zf, itf, donef = (
        np.asarray(st_f[0]), np.asarray(st_f[5]), np.asarray(st_f[6])
    )
    print("ref  done", doner.sum(), "iters", itr)
    print("fuse done", donef.sum(), "iters", itf)
    du = np.abs(Zf[:, 0:4] - Zr[:, 0:4]).max()
    print("max |u| diff", du)
    print("iters equal:", np.array_equal(itr, itf))
    print("bitwise Z equal:", np.array_equal(Zr, Zf))
    # exit status for tests/test_ops.py's subprocess harness
    assert np.array_equal(itr, itf), "iteration counts diverge"
    assert np.array_equal(doner, donef), "done masks diverge"
    assert du < 1e-4, f"controls diverge: {du}"
    print("FUSED_PARITY_OK")


if __name__ == "__main__":
    main()
