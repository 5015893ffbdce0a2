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


def _random_lqr(rng, N, Bn, dtype):
    """Well-conditioned random LQR data in lane-major layout."""
    def spd(n, scale):
        M = rng.standard_normal((N, n, n, Bn))
        A = np.einsum("nikb,njkb->nijb", M, M) / n + scale * np.eye(n)[None, :, :, None]
        return A

    Q = spd(NXB, 1.0)
    R = spd(NU, 1.0)
    S = 0.1 * rng.standard_normal((N, NU, NXB, Bn))
    qx = rng.standard_normal((N, NXB, Bn))
    qu = rng.standard_normal((N, NU, Bn))
    A = np.eye(NXB)[None, :, :, None] + 0.05 * rng.standard_normal(
        (N - 1, NXB, NXB, Bn)
    )
    B = 0.1 * rng.standard_normal((N - 1, NXB, NU, Bn))
    c = 0.01 * rng.standard_normal((N - 1, NXB, Bn))
    dx0 = rng.standard_normal((9, Bn))
    return tuple(jnp.asarray(x, dtype) for x in (Q, R, S, qx, qu, A, B, c, dx0))


@pytest.mark.parametrize("Bn", [128, 96])  # aligned + padded tile
def test_pallas_lqr_matches_xla_lane_major(Bn):
    rng = np.random.default_rng(0)
    args = _random_lqr(rng, N=20, Bn=Bn, dtype=jnp.float64)
    ref = riccati.solve_lqr_batched(*args)
    out = lqr_pallas.solve_lqr_lanes(*args, interpret=True)
    for got, want, name in zip(out, ref, ["dxb", "du", "nu", "dtheta"]):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-9,
            err_msg=name,
        )


def test_pallas_lqr_solves_kkt_conditions():
    """Independent check: the kernel's output satisfies the LQR KKT system
    (dynamics feasibility + stationarity via costates), not just parity."""
    rng = np.random.default_rng(1)
    Bn = 128
    args = _random_lqr(rng, N=8, Bn=Bn, dtype=jnp.float64)
    Q, R, S, qx, qu, A, B, c, dx0 = args
    dxb, du, nu, dtheta = lqr_pallas.solve_lqr_lanes(*args, interpret=True)
    dxb = np.moveaxis(np.asarray(dxb), -1, 0)   # (B, N, 13)
    du = np.moveaxis(np.asarray(du), -1, 0)
    nu = np.moveaxis(np.asarray(nu), -1, 0)
    Qb = np.moveaxis(np.asarray(Q), -1, 0)
    Rb = np.moveaxis(np.asarray(R), -1, 0)
    Sb = np.moveaxis(np.asarray(S), -1, 0)
    qxb = np.moveaxis(np.asarray(qx), -1, 0)
    qub = np.moveaxis(np.asarray(qu), -1, 0)
    Ab = np.moveaxis(np.asarray(A), -1, 0)
    Bb = np.moveaxis(np.asarray(B), -1, 0)
    cb = np.moveaxis(np.asarray(c), -1, 0)
    dx0b = np.moveaxis(np.asarray(dx0), -1, 0)

    # initial condition: states fixed, u_prev free
    np.testing.assert_allclose(dxb[:, 0, :9], dx0b, atol=1e-12)
    # dynamics feasibility
    pred = (
        np.einsum("bnij,bnj->bni", Ab, dxb[:, :-1])
        + np.einsum("bnij,bnj->bni", Bb, du[:, :-1])
        + cb
    )
    np.testing.assert_allclose(pred, dxb[:, 1:], atol=1e-8)
    # input stationarity: R du + S dxb + qu + B^T nu_{i+1} = 0
    r_u = (
        np.einsum("bnij,bnj->bni", Rb[:, :-1], du[:, :-1])
        + np.einsum("bnij,bnj->bni", Sb[:, :-1], dxb[:, :-1])
        + qub[:, :-1]
        + np.einsum("bnji,bnj->bni", Bb, nu[:, 1:])
    )
    np.testing.assert_allclose(r_u, 0.0, atol=1e-8)
    # terminal input stationarity (no dynamics out of stage N-1)
    r_uT = (
        np.einsum("bij,bj->bi", Rb[:, -1], du[:, -1])
        + np.einsum("bij,bj->bi", Sb[:, -1], dxb[:, -1])
        + qub[:, -1]
    )
    np.testing.assert_allclose(r_uT, 0.0, atol=1e-8)
    # free-theta stationarity: theta rows of nu_0 must vanish
    np.testing.assert_allclose(nu[:, 0, 9:], 0.0, atol=1e-8)


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
    import jax.numpy as jnp

    from forces_resilient_planner_tpu.config import DEFAULT_CONFIG as C
    from forces_resilient_planner_tpu.engine import batch as bm
    from forces_resilient_planner_tpu.solver import ipm_lanes, nlp as nlpm

    rng = np.random.default_rng(7)
    goals = rng.uniform([-2, -2, 1.0], [2, 2, 1.5], (4, 3))
    forces = rng.uniform(-1.0, 1.0, (2, 3))
    halves = np.array([[4.0, 4.0, 1.5]])
    sc = bm.make_scenarios(C, goals, forces, halves, dtype=jnp.float64)
    lp = ipm_lanes.lanes_params(sc.params)
    Z = jnp.moveaxis(sc.Z0, 0, -1)
    N = Z.shape[0]
    Bn = Z.shape[-1]
    dtype = Z.dtype
    w = lp.weights
    rmax2 = C.model.max_rate ** 2
    lb, ub = nlpm.variable_bounds(C.model, dtype)
    g0 = ipm_lanes._ineq_residuals(
        Z, lp.corridor_A, lp.corridor_b, lb, ub, 1e-5
    )
    s = np.maximum(-np.asarray(g0), 1e-2)
    sigma = jnp.asarray(np.clip(1.0 / s, 1e-6, 1e6) / s)

    x_bl = jnp.moveaxis(Z[:-1, 8:17], 1, -1)
    u_bl = jnp.moveaxis(Z[:-1, 0:4], 1, -1)
    from forces_resilient_planner_tpu.dynamics.quadrotor import (
        rk2_jacobians_analytic,
        rk2_step,
    )

    f_bl = lp.f_ext.T
    Ax, Bx = rk2_jacobians_analytic(x_bl, u_bl, f_bl[None], C.model)
    Ax = jnp.moveaxis(Ax, 1, -1)
    Bx = jnp.moveaxis(Bx, 1, -1)
    xn = rk2_step(x_bl, u_bl, f_bl[None], C.model)
    F = jnp.concatenate([jnp.moveaxis(xn, -1, 1), Z[:-1, 0:4]], axis=1)
    c = F - jnp.concatenate([Z[1:, 8:17], Z[1:, 4:8]], axis=1)
    qx = jnp.asarray(rng.standard_normal((N, 13, Bn)), dtype)
    qu = jnp.asarray(rng.standard_normal((N, 4, Bn)), dtype)
    dx0 = jnp.asarray(0.01 * rng.standard_normal((9, Bn)), dtype)

    # XLA reference path
    from forces_resilient_planner_tpu.solver import riccati

    Wp, Rp, Sp = ipm_lanes._assemble_qp_blocks(
        w, lp.corridor_A, sigma, jnp.asarray(C.solver.reg, dtype),
        rmax2, dtype,
    )
    NXB, NU = 13, 4
    Abar = jnp.zeros((N - 1, NXB, NXB, Bn), dtype).at[:, :9, :9].set(Ax)
    Bbar = (
        jnp.zeros((N - 1, NXB, NU, Bn), dtype)
        .at[:, :9, :].set(Bx)
        .at[:, 9:, :].set(
            jnp.broadcast_to(
                jnp.eye(NU, dtype=dtype)[None, :, :, None],
                (N - 1, NU, NU, Bn),
            )
        )
    )
    ref = riccati.solve_lqr_batched(Wp, Rp, Sp, qx, qu, Abar, Bbar, c, dx0)

    fac = lqr_pallas.lqr_factor_fused_lanes(
        w.w_wp, w.w_input, w.w_rate, w.w_vel, w.w_uprev0,
        sigma, lp.corridor_A, Ax, Bx, C.solver.reg, rmax2,
        interpret=True,
    )
    out = lqr_pallas.lqr_backsolve_fused_lanes(
        fac, Ax, Bx, c, qx, qu, dx0, interpret=True
    )
    for got, want, name in zip(out, ref, ["dxb", "du", "nu", "dtheta"]):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-9,
            err_msg=name,
        )


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
    """ops/tube_pallas.py (interpret mode) vs the XLA tube-stage math
    (closed_loop_phi + channel_Qd_fast + ego Q1) on the same lanes."""
    import dataclasses

    from forces_resilient_planner_tpu.config import DEFAULT_CONFIG
    from forces_resilient_planner_tpu.dynamics.quadrotor import euler_to_rot
    from forces_resilient_planner_tpu.ops import tube_pallas
    from forces_resilient_planner_tpu.tube import lyapunov as tl

    C = DEFAULT_CONFIG
    mcfg, tcfg = C.model, C.tube
    rng = np.random.default_rng(9)
    L = tube_pallas.LANES
    dt32 = jnp.float32
    x = jnp.asarray(rng.normal(0, 0.4, (L, 9)), dt32)
    u = jnp.asarray(
        np.array([0, 0, 0, 7.3]) + rng.normal(0, 0.5, (L, 4)), dt32
    )

    Qd_k, Mp_k, Phi_k, Q1_k = tube_pallas.tube_stage_lanes(
        x, u, mcfg, tcfg, interpret=True
    )

    K = jnp.asarray(tcfg.K, dt32)
    w = jnp.full((3,), tcfg.ext_noise_bound, dt32)
    Phi_x = jax.vmap(lambda a, b: tl.closed_loop_phi(a, b, K, mcfg))(x, u)
    Qd_x, Mp_x = tl.channel_Qd_fast(Phi_x, mcfg.dt, w)
    R = euler_to_rot(x[:, 6:9])
    ego = jnp.diag(jnp.asarray(
        [tcfg.ego_r**2, tcfg.ego_r**2, tcfg.ego_h**2], dt32))
    Q1_x = jnp.einsum("nij,jk,nlk->nil", R, ego, R)

    for name, got, want, tol in (
        ("Phi", Phi_k, Phi_x, 2e-5),
        ("Mp", Mp_k, Mp_x, 2e-6),
        ("Qd", Qd_k, Qd_x, 1e-6),
        ("Q1", Q1_k, Q1_x, 1e-6),
    ):
        err = float(jnp.max(jnp.abs(got - want)))
        assert err < tol, (name, err)


def test_corridor_kernel_interpret_matches_decompose_segment():
    """ops/corridor_pallas.py (interpret) vs corridor/decomp.py::
    decompose_segment over random scenes, both caps profiles."""
    import dataclasses

    from forces_resilient_planner_tpu.config import DEFAULT_CONFIG
    from forces_resilient_planner_tpu.corridor.decomp import decompose_segment
    from forces_resilient_planner_tpu.ops import corridor_pallas

    rng = np.random.default_rng(31)
    for ccfg, nh in (
        (dataclasses.replace(
            DEFAULT_CONFIG.corridor, shrink_iters=6, max_obs_planes=24,
            max_active_obstacles=0), 30),
        (dataclasses.replace(
            DEFAULT_CONFIG.corridor, shrink_iters=4, max_obs_planes=12,
            max_active_obstacles=0), 30),
    ):
        B, N, M = 2, 3, 96
        p1 = rng.uniform([-1, -1, 0.8], [1, 1, 1.6], (B, N, 3))
        yaw = rng.uniform(-np.pi, np.pi, (B, N))
        p2 = p1 + 0.1 * np.stack(
            [np.cos(yaw), np.sin(yaw), np.zeros_like(yaw)], -1
        )
        obs = rng.uniform([-3, -3, -0.5], [3, 3, 3], (B, M, 3))
        mask = rng.uniform(size=(B, M)) < 0.9

        A_k, b_k = corridor_pallas.decompose_stages_lanes(
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(obs),
            jnp.asarray(mask), ccfg, nh, interpret=True,
        )
        for bi in range(B):
            for ni in range(N):
                ref = decompose_segment(
                    jnp.asarray(p1[bi, ni]), jnp.asarray(p2[bi, ni]),
                    jnp.asarray(obs[bi]), jnp.asarray(mask[bi]), ccfg, nh,
                )
                np.testing.assert_allclose(
                    np.asarray(A_k[bi, ni]), np.asarray(ref.A), atol=1e-9,
                    err_msg=f"A b={bi} n={ni} caps={ccfg.max_obs_planes}",
                )
                np.testing.assert_allclose(
                    np.asarray(b_k[bi, ni]), np.asarray(ref.b), atol=1e-9,
                    err_msg=f"b b={bi} n={ni}",
                )
