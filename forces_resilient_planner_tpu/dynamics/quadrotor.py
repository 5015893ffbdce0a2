"""9-state quadrotor dynamics with external force and rotor drag.

TPU-native transcription of the reference model:
  - continuous dynamics: matlab_code/dynamics/nonlinear_dynamics.m:20-40
  - discretization:      matlab_code/dynamics/transit.m (FORCES RK2 = Heun's
    method, verified against the generated CasADi code
    solver/normal/FORCESNLPsolver_normal_casadi.c:238-470 — k1 = f(x,u),
    k2 = f(x + dt*k1, u), x+ = x + dt/2*(k1+k2))
  - analytic Jacobian cross-check target: plan_manage/src/nmpc_solver.cpp:615-699

State  x = [px py pz vx vy vz roll pitch yaw]
Input  u = [wx wy wz thrust]   (commanded body rates + collective thrust force)

All functions are pure, jit/vmap-friendly, and written for f32 TPU compute
(f64-capable when jax_enable_x64 is on, used by the CPU oracle).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from forces_resilient_planner_tpu.config import ModelConfig


def euler_to_rot(rpy: jnp.ndarray) -> jnp.ndarray:
    """ZYX rotation R = Rz(yaw) @ Ry(pitch) @ Rx(roll).

    Matches nonlinear_dynamics.m:22-24 and nmpc_solver.cpp:554-564.
    rpy: (..., 3) -> (..., 3, 3)
    """
    roll, pitch, yaw = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    r00 = cy * cp
    r01 = cy * sp * sr - cr * sy
    r02 = cy * sp * cr + sy * sr
    r10 = cp * sy
    r11 = cy * cr + sy * sp * sr
    r12 = sy * sp * cr - cy * sr
    r20 = -sp
    r21 = cp * sr
    r22 = cp * cr
    rows = jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def continuous_dynamics(
    x: jnp.ndarray, u: jnp.ndarray, f_ext: jnp.ndarray, cfg: ModelConfig
) -> jnp.ndarray:
    """xdot = f(x, u, f_ext).  nonlinear_dynamics.m:20-40."""
    vel = x[..., 3:6]
    rpy = x[..., 6:9]
    R = euler_to_rot(rpy)
    z_b = R[..., :, 2]
    thrust = u[..., 3]
    drag = jnp.asarray([cfg.drag_coeff, cfg.drag_coeff, 0.0], dtype=x.dtype)
    # drag_acc = R diag(d) R^T v
    v_body = jnp.einsum("...ji,...j->...i", R, vel)
    drag_acc = jnp.einsum("...ij,...j->...i", R, drag * v_body)
    g_vec = jnp.zeros_like(vel).at[..., 2].set(cfg.g)
    acc = z_b * (thrust[..., None] / cfg.mass) + f_ext - g_vec - drag_acc
    euler_dot = u[..., 0:3]
    return jnp.concatenate([vel, acc, euler_dot], axis=-1)


def rk2_step(
    x: jnp.ndarray, u: jnp.ndarray, f_ext: jnp.ndarray, cfg: ModelConfig
) -> jnp.ndarray:
    """Heun RK2 discretization, exactly the FORCES client's RK2 (transit.m)."""
    k1 = continuous_dynamics(x, u, f_ext, cfg)
    k2 = continuous_dynamics(x + cfg.dt * k1, u, f_ext, cfg)
    return x + 0.5 * cfg.dt * (k1 + k2)


def ab_jacobians(
    x: jnp.ndarray, u: jnp.ndarray, f_ext: jnp.ndarray, cfg: ModelConfig
):
    """Discrete-time Jacobians (A, B) of rk2_step via forward-mode autodiff.

    Replaces the hand-derived updateMatrix (nmpc_solver.cpp:615-699); the
    continuous-time versions are exposed separately for the tube module.
    """
    A = jax.jacfwd(lambda xx: rk2_step(xx, u, f_ext, cfg))(x)
    B = jax.jacfwd(lambda uu: rk2_step(x, uu, f_ext, cfg))(u)
    return A, B


def continuous_jacobians(
    x: jnp.ndarray, u: jnp.ndarray, f_ext: jnp.ndarray, cfg: ModelConfig
):
    """Continuous-time (At, Bt) of xdot = f(x,u); used for Phi = At + Bt K."""
    At = jax.jacfwd(lambda xx: continuous_dynamics(xx, u, f_ext, cfg))(x)
    Bt = jax.jacfwd(lambda uu: continuous_dynamics(x, uu, f_ext, cfg))(u)
    return At, Bt


def thrust_world_acc(rpy: jnp.ndarray, thrust: jnp.ndarray, cfg: ModelConfig):
    """World-frame acceleration implied by attitude+thrust: R e3 T/m - g e3.

    Used for warm-start accel recovery (nmpc_solver.cpp:176-180) and the
    100 Hz command stream (nmpc_solver.cpp:925-931).
    """
    R = euler_to_rot(rpy)
    acc = R[..., :, 2] * (thrust[..., None] / cfg.mass)
    return acc - jnp.zeros_like(acc).at[..., 2].set(cfg.g)
