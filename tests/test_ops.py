"""Parity tests for the Pallas TPU kernels (interpret mode on CPU).

Oracle: the XLA lane-major implementation solver/riccati.py::
solve_lqr_batched, which is itself parity-tested against the dense KKT
solve (test_solver_parity.py).  The kernel must be bit-for-bit the same
algorithm, so tolerances here are tight.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forces_resilient_planner_tpu.ops import lqr_pallas
from forces_resilient_planner_tpu.solver import riccati
from forces_resilient_planner_tpu.solver.nlp import NXB, NU


def _run_kernel_debug(mode, marker):
    """All interpret-mode kernel executions run in SUBPROCESSES
    (tools/kernel_parity_debug.py): inline interpret kernels leave XLA:CPU
    in a state where later unrelated compiles segfault/abort (observed in
    test_sharding and test_solver_parity when any of these ran inline)."""
    import subprocess
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    out = subprocess.run(
        [sys.executable, str(root / "tools" / "kernel_parity_debug.py"),
         mode],
        capture_output=True, text=True, timeout=540, cwd=str(root),
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert marker in out.stdout, out.stdout[-3000:]


def test_pallas_lqr_matches_xla_lane_major():
    _run_kernel_debug("lqr", "LQR_PARITY_OK")


def test_pallas_lqr_solves_kkt_conditions():
    """Independent check: the kernel's output satisfies the LQR KKT system
    (dynamics feasibility + stationarity via costates), not just parity."""
    _run_kernel_debug("lqr_kkt", "LQR_KKT_OK")


def test_routing_flag(monkeypatch):
    assert not lqr_pallas.pallas_lqr_enabled(jnp.float32, 8)  # CPU backend
    monkeypatch.setenv("FRP_PALLAS_LQR", "1")
    assert lqr_pallas.pallas_lqr_enabled(jnp.float64, 8)
    monkeypatch.setenv("FRP_PALLAS_LQR", "0")
    assert not lqr_pallas.pallas_lqr_enabled(jnp.float32, 4096)


def test_fused_assembly_kernels_match_xla_path():
    """The fused assembly+factor / backsolve kernels must reproduce the
    XLA path (host-side _assemble_qp_blocks + lane-major factor/solve)
    exactly for real NLP data."""
    _run_kernel_debug("fused_assembly", "FUSED_ASSEMBLY_OK")


@pytest.mark.slow
def test_fused_iteration_kernel_matches_xla_solver():
    """ops/ipm_pallas.py::ipm_iteration_fused (whole IPM iteration in one
    kernel, interpret mode) must reproduce the XLA lane-major solver on a
    full solve: identical iteration counts and exit codes, controls to
    reassociation-level tolerance.

    Runs in a SUBPROCESS (tools/fused_iter_debug.py): executing the big
    interpret-mode kernel in the pytest process leaves XLA:CPU in a state
    where a later unrelated while_loop compile segfaults (observed
    reproducibly in test_solver_parity when this test ran inline)."""
    import subprocess
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    out = subprocess.run(
        [sys.executable, str(root / "tools" / "fused_iter_debug.py"), "25"],
        capture_output=True, text=True, timeout=540, cwd=str(root),
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert "FUSED_PARITY_OK" in out.stdout, out.stdout[-3000:]


def test_expm_fixed_matches_jax_scipy():
    """ops/expm.py::expm_fixed vs jax.scipy.linalg.expm over random batches
    spanning several norm decades (the tube Phi*dt matrices live at
    ||A||_1 ~ 1-3; also check the scaled regimes)."""
    import jax.scipy.linalg as jsl

    from forces_resilient_planner_tpu.ops.expm import expm_fixed

    rng = np.random.default_rng(7)
    for n in (9, 18):
        for scale in (0.05, 1.0, 8.0, 60.0):
            A = jnp.asarray(rng.normal(0, 1.0, (16, n, n)) * scale / np.sqrt(n))
            want = jax.vmap(jsl.expm)(A)
            got = expm_fixed(A)
            err = float(jnp.max(jnp.abs(got - want) / (1.0 + jnp.abs(want))))
            assert err < 1e-9, (n, scale, err)


def test_expm_fixed_tube_phi_regime():
    """On actual closed-loop Phi*dt matrices from the tube propagator."""
    from forces_resilient_planner_tpu.config import DEFAULT_CONFIG
    from forces_resilient_planner_tpu.ops.expm import expm_fixed
    from forces_resilient_planner_tpu.solver.problems import hover_warm_start
    from forces_resilient_planner_tpu.tube.lyapunov import closed_loop_phi

    import jax.scipy.linalg as jsl

    C = DEFAULT_CONFIG
    rng = np.random.default_rng(1)
    x0 = jnp.zeros(9).at[2].set(1.2)
    Z = hover_warm_start(x0, C.model)
    K = jnp.asarray(C.tube.K)
    for i in range(8):
        x = Z[i % Z.shape[0], 8:17] + jnp.asarray(rng.normal(0, 0.3, 9))
        u = Z[i % Z.shape[0], 0:4] + jnp.asarray(rng.normal(0, 0.2, 4))
        Phi = closed_loop_phi(x, u, K, C.model) * C.model.dt
        want = jsl.expm(Phi)
        got = expm_fixed(Phi)
        assert float(jnp.max(jnp.abs(got - want))) < 1e-11


def test_tube_kernel_interpret_matches_xla():
    """ops/tube_pallas.py (interpret mode) vs the XLA tube-stage math."""
    _run_kernel_debug("tube", "TUBE_PARITY_OK")


def test_corridor_kernel_interpret_matches_decompose_segment():
    """ops/corridor_pallas.py (interpret) vs decompose_segment."""
    _run_kernel_debug("corridor", "CORRIDOR_PARITY_OK")
