"""Determinism + numerical-safety tests.

The reference's 4-thread spinner shares unguarded mutable state
(SURVEY.md section 3.1) and relies on timing luck; the functional core here
must be bitwise deterministic, and the solver must stay finite under
jax_debug_nans-style scrutiny (the race-detection/sanitizer analog,
SURVEY.md section 5)."""
import jax
import jax.numpy as jnp
import numpy as np

from forces_resilient_planner_tpu.config import DEFAULT_CONFIG as C
from forces_resilient_planner_tpu.engine import batch as bm
from forces_resilient_planner_tpu.solver import ipm
from forces_resilient_planner_tpu.solver.problems import (
    hover_to_goal_params,
    hover_warm_start,
)


def test_solve_is_bitwise_deterministic():
    x0 = np.zeros(9); x0[2] = 1.2
    p = hover_to_goal_params(x0, np.array([1.2, 0.4, 1.3]), C.model, C.weights)
    Z0 = hover_warm_start(jnp.asarray(x0, jnp.float64), C.model)
    r1 = ipm.solve(Z0, p, C.model, C.solver)
    r2 = ipm.solve(Z0, p, C.model, C.solver)
    np.testing.assert_array_equal(np.asarray(r1.Z), np.asarray(r2.Z))
    assert int(r1.iters) == int(r2.iters)


def test_batch_lane_isolation():
    """A poisoned lane (NaN force) must not affect its neighbors."""
    goals = np.array([[1.0, 0.0, 1.2], [0.5, 1.0, 1.3]])
    forces = np.array([[0.0, 0.0, 0.0], [np.nan, 0.0, 0.0]])
    halves = np.array([[5.0, 5.0, 2.0]])
    scen = bm.make_scenarios(C, goals, forces, halves, dtype=jnp.float64)
    res = bm.solve_scenarios(scen, C)
    ec = np.asarray(res.exit_code)
    # lanes with NaN force fail (as -6 BADFUNCEVAL: the NaN guard kept a
    # feasible iterate); clean-force lanes still solve
    # layout: goal-major (g0f0, g0f1, g1f0, g1f1)
    assert ec[0] == 1 and ec[2] == 1
    assert ec[1] == -6 and ec[3] == -6, ec
    assert np.isfinite(np.asarray(res.Z)[[0, 2]]).all()


def test_debug_nans_clean_on_happy_path():
    """The solve must not trip jax_debug_nans on a feasible problem (no
    transient NaNs relied upon anywhere in the iteration)."""
    x0 = np.zeros(9); x0[2] = 1.2
    p = hover_to_goal_params(x0, np.array([0.8, -0.3, 1.2]), C.model, C.weights)
    Z0 = hover_warm_start(jnp.asarray(x0, jnp.float64), C.model)
    jax.config.update("jax_debug_nans", True)
    try:
        r = ipm.solve(Z0, p, C.model, C.solver)
        assert int(r.exit_code) == 1
    finally:
        jax.config.update("jax_debug_nans", False)


def test_stream_matches_per_call_grid():
    """solve_scenario_stream (pipelined async dispatch) must return exactly
    the per-call solve_scenario_grid results for the same seed sets."""
    rng = np.random.default_rng(5)
    halves = np.array([[5.0, 5.0, 2.0]])
    sets = []
    for s in range(3):
        r = np.random.default_rng(100 + s)
        sets.append(
            (
                r.uniform([-3, -3, 1.0], [3, 3, 1.6], (4, 3)),
                r.uniform(-1.5, 1.5, (2, 3)),
            )
        )
    stream = bm.solve_scenario_stream(C, sets, halves)
    assert len(stream) == 3
    for (g, f), res in zip(sets, stream):
        ref = bm.solve_scenario_grid(C, g, f, halves)
        np.testing.assert_array_equal(
            np.asarray(res.exit_code), np.asarray(ref.exit_code)
        )
        np.testing.assert_allclose(
            np.asarray(res.Z), np.asarray(ref.Z), rtol=0, atol=0
        )
