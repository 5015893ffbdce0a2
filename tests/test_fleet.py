"""Fleet closed loop: B scenarios through search + batched NMPC + plant
(engine/fleet.py) on a shared scene — the Monte-Carlo config-3 shape."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from forces_resilient_planner_tpu.config import DEFAULT_CONFIG
from forces_resilient_planner_tpu.engine import fleet
from forces_resilient_planner_tpu.mapping import occ_grid as og

CFG = dataclasses.replace(
    DEFAULT_CONFIG,
    map=dataclasses.replace(
        DEFAULT_CONFIG.map, size=(12.0, 12.0, 4.0), origin=(-6.0, -6.0, -1.0)
    ),
    search=dataclasses.replace(
        DEFAULT_CONFIG.search, expand_width=8, node_capacity=4096,
        max_rounds=32,
    ),
    corridor=dataclasses.replace(
        DEFAULT_CONFIG.corridor, max_obstacles=512, shrink_iters=8,
        max_obs_planes=12,
    ),
)


def test_fleet_reaches_goals_no_collisions():
    """Fence with a WIDE gap (1.8 m: enough clearance for ego + the
    disturbance tube at far horizon stages — scenarios threading tighter
    gaps honestly fail their solves by tube-tightened infeasibility,
    which the per-lane ladder then escalates)."""
    dtype = jnp.float64
    grid = og.make_grid(CFG.map, dtype)
    ys = np.arange(-4.0, 4.0, 0.1)
    zs = np.arange(0.0, 2.6, 0.1)
    yy, zz = np.meshgrid(ys, zs)
    pts = np.stack([np.full(yy.size, 1.5), yy.ravel(), zz.ravel()], -1)
    keep = ~((pts[:, 1] > 0.3) & (pts[:, 1] < 2.1))
    pts = pts[keep]
    grid = og.set_occupancy(
        grid, jnp.asarray(pts, dtype), jnp.ones(len(pts), bool), CFG.map
    )
    obs, mask = og.occupied_cloud(grid, CFG.map, 2048)

    B = 4
    rng = np.random.default_rng(2)
    starts = np.zeros((B, 9))
    starts[:, 0] = -0.5
    starts[:, 1] = rng.uniform(0.6, 1.8, B)
    starts[:, 2] = 1.2
    goals = np.stack(
        [np.full(B, 3.2), rng.uniform(0.6, 1.8, B), np.full(B, 1.2)], -1
    )
    f_true = rng.uniform(-0.5, 0.5, (B, 3))

    res = fleet.run_fleet(
        CFG, grid, jnp.asarray(obs, dtype), mask, starts, goals, f_true,
        duration=6.0, replan_every=10, dtype=dtype,
    )
    assert res.reached_frac >= 0.75, res
    assert res.collided_frac == 0.0, res
    assert res.solved_frac > 0.8, res
    assert res.mean_final_dist < 1.0, res
    # round-5 attribution invariants: every lane has exactly one fate and
    # the aggregate fractions are consistent with the outcome table
    assert sum(res.outcome_counts.values()) == B, res.outcome_counts
    assert res.outcome_counts["reached"] == int(round(B * res.reached_frac))
    assert res.outcome_counts["collided"] == int(round(B * res.collided_frac))
    reached = res.outcome == fleet.OUTCOME_REACHED
    assert np.isfinite(res.time_to_goal[reached]).all()
    assert np.isnan(res.time_to_goal[~reached]).all()
    # solver tick families sum to 1 over live ticks
    if res.tick_code_fracs:
        assert abs(sum(res.tick_code_fracs.values()) - 1.0) < 1e-6


def test_runaway_lanes_regression():
    """Pins the round-5 ancillary-feedback fix on lanes that USED to run
    away: with the prediction-anchored solver and an open-loop plant,
    these exact scenarios (fleet-probe rng(5) lanes 5/7/9/10 on the
    single-fence scene) crossed the gap, silently diverged from the
    solver's internal state for seconds with every solve optimal, blew
    past v_max, and froze on perpetual exit -7 ~3 m from goal.  With
    u = u_nom + K (x - x_nom) (the closed loop the tubes model,
    engine/fleet.py) all four reach in ~3 s.  A feedback regression
    reverts them to panicked/timeout."""
    CFG2 = dataclasses.replace(
        CFG,
        corridor=dataclasses.replace(
            DEFAULT_CONFIG.corridor, max_obstacles=512, shrink_iters=8,
            max_obs_planes=12,
        ),
    )
    dtype = jnp.float64
    grid = og.make_grid(CFG2.map, dtype)
    ys = np.arange(-4.0, 4.0, 0.1)
    zs = np.arange(0.0, 2.6, 0.1)
    yy, zz = np.meshgrid(ys, zs)
    pts = np.stack([np.full(yy.size, 1.5), yy.ravel(), zz.ravel()], -1)
    pts = pts[~((pts[:, 1] > 0.3) & (pts[:, 1] < 2.1))]
    grid = og.set_occupancy(
        grid, jnp.asarray(pts, dtype), jnp.ones(len(pts), bool), CFG2.map
    )
    obs, mask = og.occupied_cloud(grid, CFG2.map, 2048)

    # the fleet-probe scenario generator (tools/fleet_probe.py), B=128,
    # restricted to the four formerly-runaway lanes
    B = 128
    rng = np.random.default_rng(5)
    starts = np.zeros((B, 9))
    starts[:, 0] = -0.5
    starts[:, 1] = rng.uniform(0.8, 1.6, B)
    starts[:, 2] = 1.2
    goals = np.stack(
        [np.full(B, 3.2), rng.uniform(0.9, 1.5, B), np.full(B, 1.2)], -1
    )
    f_true = rng.uniform(-0.5, 0.5, (B, 3))
    lanes = np.array([5, 7, 9, 10])

    res = fleet.run_fleet(
        CFG2, grid, jnp.asarray(obs, dtype), mask,
        starts[lanes], goals[lanes], f_true[lanes],
        duration=6.0, replan_every=10, dtype=dtype,
    )
    assert (res.outcome == fleet.OUTCOME_REACHED).all(), (
        res.outcome, res.outcome_counts
    )
    assert np.nanmax(res.time_to_goal) < 5.0, res.time_to_goal
