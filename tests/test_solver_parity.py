"""Solver parity vs the CPU oracle (BASELINE configs 1-2).

The FORCES Pro binaries in the reference carry an expired license
(FORCESNLPsolver_normal.h:313-314), so parity is certified against an
independent high-accuracy re-solve of the identical NLP (oracle/cpu_oracle).
Target from BASELINE.json: control-sequence agreement to 1e-3.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forces_resilient_planner_tpu.config import DEFAULT_CONFIG as C
from forces_resilient_planner_tpu.oracle.cpu_oracle import solve_oracle
from forces_resilient_planner_tpu.solver import ipm, nlp
from forces_resilient_planner_tpu.solver.problems import (
    hover_to_goal_params,
    hover_warm_start,
)

TOL_U = 1e-3  # BASELINE.json target on the control sequence
TOL_X = 1e-3


def run_case(x0, goal, f_ext=(0.0, 0.0, 0.0), final=False, corridor_half=(5.0, 5.0, 2.0)):
    p = hover_to_goal_params(
        np.asarray(x0), np.asarray(goal), C.model, C.weights,
        f_ext=f_ext, final=final, corridor_half=corridor_half,
    )
    Z0 = hover_warm_start(jnp.asarray(x0, jnp.float64), C.model)
    res = ipm.solve(Z0, p, C.model, C.solver)
    assert int(res.exit_code) == 1, f"IPM failed: kkt={float(res.kkt_error)}"
    Zo, r = solve_oracle(p, C.model, C.solver)
    Zi = np.asarray(res.Z)
    u_err = np.max(np.abs(Zi[:, :4] - Zo[:, :4]))
    x_err = np.max(np.abs(Zi[:, 8:] - Zo[:, 8:]))
    return Zi, Zo, u_err, x_err, res


def test_config1_hover_to_goal_zero_force():
    x0 = np.zeros(9); x0[2] = 1.2
    Zi, Zo, u_err, x_err, res = run_case(x0, [1.5, 0.8, 1.2])
    assert u_err < TOL_U, u_err
    assert x_err < TOL_X, x_err


def test_config2_constant_external_force():
    """Constant disturb-manager style force (BASELINE config 2)."""
    x0 = np.zeros(9); x0[2] = 1.2
    Zi, Zo, u_err, x_err, res = run_case(
        x0, [2.0, -1.0, 1.2], f_ext=(1.0, -0.6, 0.3)
    )
    assert u_err < TOL_U, u_err
    assert x_err < TOL_X, x_err


def test_final_profile_brakes():
    """Final (braking) profile: terminal velocity must be driven toward zero
    and parity with oracle must hold (mpc_objectiveN_final.m:27)."""
    x0 = np.zeros(9); x0[2] = 1.2; x0[3] = 1.0
    Zi, Zo, u_err, x_err, res = run_case(x0, [0.8, 0.0, 1.2], final=True)
    assert u_err < TOL_U, u_err
    # braking: terminal speed much smaller than initial
    assert np.linalg.norm(Zi[-1, 11:14]) < 0.25


def test_moving_start_with_velocity():
    x0 = np.zeros(9); x0[2] = 1.2; x0[3:6] = [0.8, -0.4, 0.1]; x0[8] = 0.3
    Zi, Zo, u_err, x_err, res = run_case(x0, [2.5, 1.0, 1.4])
    assert u_err < TOL_U, u_err


def test_active_corridor_constraint():
    """Tight corridor forces constraint activity; parity must survive."""
    x0 = np.zeros(9); x0[2] = 1.2
    Zi, Zo, u_err, x_err, res = run_case(
        x0, [2.0, 0.0, 1.2], corridor_half=(5.0, 5.0, 0.15)
    )
    assert u_err < 2e-3, u_err
    # corridor respected (z within center +/- 0.15 + hu)
    assert np.all(Zi[:, 10] <= 1.2 + 0.15 + 1e-3)


def test_warm_start_from_solution_converges_fast():
    x0 = np.zeros(9); x0[2] = 1.2
    p = hover_to_goal_params(np.asarray(x0), np.asarray([1.5, 0.8, 1.2]), C.model, C.weights)
    Z0 = hover_warm_start(jnp.asarray(x0, jnp.float64), C.model)
    res1 = ipm.solve(Z0, p, C.model, C.solver)
    res2 = ipm.solve(res1.Z, p, C.model, C.solver)
    assert int(res2.exit_code) == 1
    assert int(res2.iters) <= int(res1.iters)


def test_batched_solve_matches_single():
    x0 = np.zeros(9); x0[2] = 1.2
    goals = [[1.5, 0.8, 1.2], [0.5, -1.0, 1.0], [2.0, 2.0, 1.5]]
    ps = [
        hover_to_goal_params(x0, np.asarray(g), C.model, C.weights) for g in goals
    ]
    batched = jax.tree.map(lambda *a: jnp.stack(a), *ps)
    Z0 = hover_warm_start(jnp.asarray(x0, jnp.float64), C.model)
    Z0b = jnp.tile(Z0[None], (3, 1, 1))
    resb = ipm.solve_batch(Z0b, batched, C.model, C.solver)
    for i, p in enumerate(ps):
        r1 = ipm.solve(Z0, p, C.model, C.solver)
        assert int(resb.exit_code[i]) == 1
        np.testing.assert_allclose(
            np.asarray(resb.Z[i]), np.asarray(r1.Z), atol=5e-6
        )
