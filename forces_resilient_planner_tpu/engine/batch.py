"""Batched scenario engine: thousands of NMPC problems per chip.

The framework's data parallelism (SURVEY.md section 2.4): vmap over
(goal x force profile x corridor set) scenarios of the full solve, plus
scenario-grid builders for the BASELINE configs 4-5.  Per-scenario failure
isolation comes free: each lane carries its own exit code and the batched
solver's NaN guard keeps diverged lanes from poisoning the rest.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from forces_resilient_planner_tpu.config import PlannerConfig
from forces_resilient_planner_tpu.solver import ipm, nlp
from forces_resilient_planner_tpu.solver.problems import (
    box_corridor,
    hover_warm_start,
)


class ScenarioSet(NamedTuple):
    """Batched NLP parameters + warm starts.  Leading axis = scenario."""

    Z0: jnp.ndarray
    params: nlp.NLPParams

    @property
    def batch(self) -> int:
        return self.Z0.shape[0]


def make_scenarios(
    cfg: PlannerConfig,
    goals: np.ndarray,          # (G, 3)
    forces: np.ndarray,         # (F, 3)
    corridor_halves: np.ndarray,  # (Cc, 3) box half-extents
    x0: np.ndarray | None = None,
    dtype=jnp.float32,
) -> ScenarioSet:
    """Cartesian scenario grid (goal x force x corridor), config-4/5 style."""
    mcfg = cfg.model
    N = mcfg.N
    if x0 is None:
        x0 = np.zeros(9)
        x0[2] = 1.2
    G, F, Cc = len(goals), len(forces), len(corridor_halves)
    B = G * F * Cc
    gi, fi, ci = np.meshgrid(
        np.arange(G), np.arange(F), np.arange(Cc), indexing="ij"
    )
    g = goals[gi.ravel()]
    f = forces[fi.ravel()]
    ch = corridor_halves[ci.ravel()]

    ref_pos = np.tile(g[:, None, :], (1, N, 1))
    dirv = g[:, :2] - x0[None, :2]
    yaw = np.where(
        np.linalg.norm(dirv, axis=-1) > 1e-6,
        np.arctan2(dirv[:, 1], dirv[:, 0]),
        0.0,
    )
    ref_yaw = np.tile(yaw[:, None], (1, N))

    centers = 0.5 * (x0[None, :3] + g)
    A = np.zeros((B, N, mcfg.nh, 3))
    b = np.zeros((B, N, mcfg.nh))
    eye = np.eye(3)
    for k in range(3):
        A[:, :, 2 * k, :] = eye[k]
        b[:, :, 2 * k] = (centers[:, k] + ch[:, k])[:, None]
        A[:, :, 2 * k + 1, :] = -eye[k]
        b[:, :, 2 * k + 1] = -(centers[:, k] - ch[:, k])[:, None]

    weights = nlp.make_stage_weights(cfg.weights, N, final=False, dtype=dtype)
    weights_b = jax.tree.map(lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim), weights)

    params = nlp.NLPParams(
        xinit=jnp.tile(jnp.asarray(x0, dtype)[None], (B, 1)),
        ref_pos=jnp.asarray(ref_pos, dtype),
        ref_yaw=jnp.asarray(ref_yaw, dtype),
        f_ext=jnp.asarray(f, dtype),
        corridor_A=jnp.asarray(A, dtype),
        corridor_b=jnp.asarray(b, dtype),
        weights=weights_b,
    )
    Z0 = jnp.tile(
        hover_warm_start(jnp.asarray(x0, dtype), mcfg)[None], (B, 1, 1)
    )
    return ScenarioSet(Z0=Z0, params=params)


_jitted_solvers: dict = {}


def solve_scenarios(
    scen: ScenarioSet, cfg: PlannerConfig
) -> ipm.SolveResult:
    """One batched jitted solve (compiled once per config, cached)."""
    key = id(cfg)
    if key not in _jitted_solvers:
        _jitted_solvers[key] = jax.jit(
            lambda Z0, params: ipm.solve_batch(Z0, params, cfg.model, cfg.solver)
        )
    return _jitted_solvers[key](scen.Z0, scen.params)


class SweepStats(NamedTuple):
    n: jnp.ndarray
    n_solved: jnp.ndarray
    mean_iters: jnp.ndarray
    max_kkt_solved: jnp.ndarray
    mean_cost: jnp.ndarray


def sweep_stats(res: ipm.SolveResult) -> SweepStats:
    """Global reductions over a (possibly sharded) batch.  Under pjit these
    lower to XLA collectives across the mesh (the reference's 'communication
    backend' analog, SURVEY.md section 5)."""
    solved = res.exit_code == 1
    n = jnp.asarray(res.exit_code.shape[0], jnp.float32)
    n_solved = jnp.sum(solved.astype(jnp.float32))
    mean_iters = jnp.mean(res.iters.astype(jnp.float32))
    max_kkt = jnp.max(jnp.where(solved, res.kkt_error, 0.0))
    mean_cost = jnp.mean(jnp.sum(res.Z[:, :, 0:4] ** 2, axis=(1, 2)))
    return SweepStats(
        n=n, n_solved=n_solved, mean_iters=mean_iters,
        max_kkt_solved=max_kkt, mean_cost=mean_cost,
    )
