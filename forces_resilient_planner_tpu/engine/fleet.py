"""Fleet-scale batched closed loop: map -> search -> NMPC per scenario.

The Monte-Carlo configuration the reference cannot express: B independent
scenarios (start x goal x true-force) flown SIMULTANEOUSLY through the
full pipeline — vmapped kinodynamic search (HOT LOOP 1,
kinodynamic_astar.cpp:17-286), the batched nmpc_step (tube + corridor
kernels + lane-major solver), and a device-side RK4 plant — with
synchronized replanning.  One shared occupancy scene; per-lane goals,
forces and fates.

Simplifications vs the single-robot host stack (engine/planner.py),
documented deviations for the batched setting:
  - receding-horizon execution applies stage-1 controls directly for one
    dt instead of the 100 Hz command interpolation (commander.py);
  - replanning is synchronized every `replan_every` ticks (the host FSM
    replans per-robot on its fail ladder);
  - reached lanes freeze (their plant stops integrating) — per-lane
    failure isolation, SURVEY.md section 2.4.
"""
from __future__ import annotations

import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from forces_resilient_planner_tpu.config import PlannerConfig
from forces_resilient_planner_tpu.dynamics.quadrotor import continuous_dynamics
from forces_resilient_planner_tpu.engine.pipeline_batch import nmpc_step_batched
from forces_resilient_planner_tpu.mapping import occ_grid as og
from forces_resilient_planner_tpu.search import kinodynamic as kd
from forces_resilient_planner_tpu.solver.problems import hover_warm_start


class FleetResult(NamedTuple):
    reached_frac: float
    collided_frac: float
    mean_final_dist: float
    solved_frac: float          # mean solver success over all ticks
    n_ticks: int
    batch: int
    wall_s: float
    searches: int
    final_states: np.ndarray    # (B, 9)


def _rk4_plant(state, u, f_true, mcfg, dt):
    """Device-side plant: RK4 on the true dynamics with ideal rate
    tracking — the jnp twin of engine/simulator.QuadSim.step."""
    def f(x):
        return continuous_dynamics(x, u, f_true, mcfg)

    k1 = f(state)
    k2 = f(state + 0.5 * dt * k1)
    k3 = f(state + 0.5 * dt * k2)
    k4 = f(state + dt * k3)
    return state + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)


def run_fleet(
    cfg: PlannerConfig,
    grid: og.OccGrid,
    obstacles: jnp.ndarray,      # (M, 3) shared scene cloud
    obstacle_mask: jnp.ndarray,  # (M,)
    starts: np.ndarray,          # (B, 9)
    goals: np.ndarray,           # (B, 3)
    f_true: np.ndarray,          # (B, 3) true external force accel
    duration: float,
    replan_every: int = 10,      # MPC ticks between synchronized replans
    goal_radius: float = 0.3,
    dtype=jnp.float32,
) -> FleetResult:
    mcfg = cfg.model
    N = mcfg.N
    dt = mcfg.dt
    B = starts.shape[0]
    M = obstacles.shape[0]

    starts_j = jnp.asarray(starts, dtype)
    goals_j = jnp.asarray(goals, dtype)
    f_j = jnp.asarray(f_true, dtype)
    obs_b = jnp.broadcast_to(jnp.asarray(obstacles, dtype)[None], (B, M, 3))
    mask_b = jnp.broadcast_to(jnp.asarray(obstacle_mask)[None], (B, M))

    z3 = jnp.zeros(3, dtype)

    @jax.jit
    def search_fleet(states):
        res = jax.vmap(
            lambda s, g, e: kd.search(
                grid, s[0:3], s[3:6], z3, g, z3, e, False,
                cfg.search, cfg.tube, cfg.map,
            ),
            in_axes=(0, 0, 0),
        )(states, goals_j, f_j)
        path, size = jax.vmap(
            lambda r, e: kd.get_kino_traj(r, e, dt)
        )(res, f_j)
        return res.status, path, size

    @jax.jit
    def mpc_and_plant(mpc_output, path, size, t_off, states, use_final,
                      frozen, last_ok):
        # per-lane fail ladder, the batched initMPCOutput + divergence
        # guard (nmpc_solver.cpp:362-364, 453-463): a lane whose last
        # solve failed, or whose stage-1 prediction drifted beyond the
        # divergence bound from the MEASURED state, re-seeds its deque
        # from hover at the measured state
        hover = jax.vmap(lambda s: hover_warm_start(s, mcfg))(states)
        hover_out = jnp.concatenate([hover, hover[:, -1:]], axis=1)
        pred_err = jnp.linalg.norm(
            mpc_output[:, 1, 8:11] - states[:, 0:3], axis=-1
        )
        reanchor = (~last_ok) | (pred_err > cfg.fsm.divergence_dist)
        Zin = jnp.where(reanchor[:, None, None], hover_out, mpc_output)

        r = nmpc_step_batched(
            Zin, path, size, t_off, states, f_j, goals_j,
            obs_b, mask_b, use_final, cfg=cfg,
        )
        u0 = r.mpc_output[:, 1, 0:4]
        new_states = jax.vmap(
            lambda s, u, f: _rk4_plant(s, u, f, mcfg, dt)
        )(states, u0, f_j)
        new_states = jnp.where(frozen[:, None], states, new_states)
        dist = jnp.linalg.norm(new_states[:, 0:3] - goals_j, axis=-1)
        reached = dist < goal_radius
        occ = jax.vmap(
            lambda s: og.voxel_state(grid, s[0:3], cfg.map)
        )(new_states)
        return (
            r.mpc_output, new_states, reached, occ == 1,
            r.switch_to_final, r.exit_code == 1,
            jnp.mean((r.exit_code == 1).astype(dtype)),
        )

    Z0 = jax.vmap(lambda s: hover_warm_start(s, mcfg))(starts_j)
    mpc_output = jnp.concatenate([Z0, Z0[:, -1:]], axis=1)
    states = starts_j
    use_final = jnp.zeros((B,), bool)
    reached_mask = np.zeros(B, bool)
    panicked = np.zeros(B, bool)
    last_ok = jnp.ones((B,), bool)
    fail_count = np.zeros(B, np.int32)
    collided = np.zeros(B, bool)
    solved_accum = []

    n_ticks = int(round(duration / dt))
    t0 = time.perf_counter()
    status, path, size = search_fleet(states)
    searches = 1
    # a failed search (NO_PATH / empty traj) keeps the lane's previous
    # path (the FSM's plan-fail behavior: the old trajectory stays live,
    # nmpc_manage.cpp:186-192); time origins are tracked per lane
    t_planned = jnp.zeros((B,), dtype)
    for k in range(n_ticks):
        t_now = k * dt
        # replan on cadence OR when any lane's fail ladder escalates
        # (fail_count > max_solve_fails -> REPLAN, nmpc_solver.cpp:405-421)
        escalate = bool(
            np.any((fail_count == cfg.fsm.max_solve_fails + 1) & ~panicked)
        )
        if k > 0 and (k % replan_every == 0 or escalate):
            status2, path2, size2 = search_fleet(states)
            good = size2 > 0
            path = jnp.where(good[:, None, None], path2, path)
            size = jnp.where(good, size2, size)
            t_planned = jnp.where(good, t_now, t_planned)
            searches += 1
        t_off = (t_now - t_planned).astype(dtype)
        frozen = jnp.asarray(reached_mask | panicked)
        (mpc_output, states, reached, occ_hit, use_final, ok_b,
         sf) = mpc_and_plant(
            mpc_output, path, size, t_off, states, use_final, frozen,
            last_ok,
        )
        last_ok = ok_b
        ok_np = np.asarray(ok_b)
        fail_count = np.where(ok_np, 0, fail_count + 1)
        # panic stop: a lane failing for many consecutive ticks freezes as
        # FAILED (the >10 m/s^2 panic / WAIT_TARGET abort analog,
        # nmpc_manage.cpp:380-411) so its garbage state cannot pollute the
        # sweep statistics as a phantom flight
        panicked |= (fail_count >= 6) & ~reached_mask
        reached_mask |= np.asarray(reached) & ~panicked
        collided |= np.asarray(occ_hit) & ~reached_mask & ~panicked
        solved_accum.append(float(sf))
    states_np = np.asarray(states)
    wall = time.perf_counter() - t0

    dist = np.linalg.norm(states_np[:, 0:3] - np.asarray(goals), axis=-1)
    return FleetResult(
        reached_frac=float(reached_mask.mean()),
        collided_frac=float(collided.mean()),
        mean_final_dist=float(dist[~panicked].mean()) if (~panicked).any()
        else float("nan"),
        solved_frac=float(np.mean(solved_accum)),
        n_ticks=n_ticks,
        batch=B,
        wall_s=wall,
        searches=searches,
        final_states=states_np,
    )
