"""Problem-construction helpers: warm starts and simple corridor setups.

Mirrors the host-side parameter packing of forces_normal.cpp:55-140 /
NMPCSolver::initMPCOutput (nmpc_solver.cpp:265-286).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from forces_resilient_planner_tpu.config import ModelConfig, WeightConfig
from forces_resilient_planner_tpu.solver.nlp import (
    NLPParams,
    NZ,
    StageWeights,
    make_stage_weights,
)


def hover_warm_start(
    state: jnp.ndarray, cfg: ModelConfig, thrust_seed: float | None = None,
    dtype=None,
) -> jnp.ndarray:
    """Hover-seeded Z0 (N, 17): zero rates, hover-ish thrust, state replicated.

    Mirrors initMPCOutput's real_thrust_c_=7.3 seed (nmpc_solver.cpp:265-286).
    """
    dtype = dtype or state.dtype
    t = cfg.hover_thrust if thrust_seed is None else thrust_seed
    row = jnp.concatenate(
        [
            jnp.asarray([0.0, 0.0, 0.0, t, 0.0, 0.0, 0.0, t], dtype),
            state.astype(dtype),
        ]
    )
    return jnp.tile(row[None, :], (cfg.N, 1))


def box_corridor(
    center: np.ndarray, half: np.ndarray, N: int, nh: int = 30, dtype=np.float64
):
    """Axis-aligned box corridor, identical at every stage.  Returns (A, b)."""
    A = np.zeros((nh, 3), dtype)
    b = np.zeros((nh,), dtype)
    eye = np.eye(3)
    for k in range(3):
        A[2 * k] = eye[k]
        b[2 * k] = center[k] + half[k]
        A[2 * k + 1] = -eye[k]
        b[2 * k + 1] = -(center[k] - half[k])
    return (
        jnp.asarray(np.tile(A[None], (N, 1, 1))),
        jnp.asarray(np.tile(b[None], (N, 1))),
    )


def hover_to_goal_params(
    x0: np.ndarray,
    goal: np.ndarray,
    mcfg: ModelConfig,
    wcfg: WeightConfig,
    f_ext=(0.0, 0.0, 0.0),
    corridor_center=None,
    corridor_half=(5.0, 5.0, 2.0),
    final: bool = False,
    dtype=jnp.float64,
) -> NLPParams:
    """BASELINE config-1 style problem: constant goal reference, box corridor."""
    N = mcfg.N
    ref_pos = jnp.tile(jnp.asarray(goal, dtype)[None], (N, 1))
    dirv = np.asarray(goal[:2]) - np.asarray(x0[:2])
    yaw = float(np.arctan2(dirv[1], dirv[0])) if np.linalg.norm(dirv) > 1e-6 else 0.0
    ref_yaw = jnp.full((N,), yaw, dtype)
    center = (
        np.asarray(corridor_center)
        if corridor_center is not None
        else 0.5 * (np.asarray(x0[:3]) + np.asarray(goal))
    )
    A, b = box_corridor(center, np.asarray(corridor_half), N)
    return NLPParams(
        xinit=jnp.asarray(x0, dtype),
        ref_pos=ref_pos,
        ref_yaw=ref_yaw,
        f_ext=jnp.asarray(f_ext, dtype),
        corridor_A=A.astype(dtype),
        corridor_b=b.astype(dtype),
        weights=make_stage_weights(wcfg, N, final=final, dtype=dtype),
    )
