"""External-force estimation (VID-Fusion analog).

The reference consumes an external `/forces` wrench published by the
VID-Fusion visual-inertial-dynamics estimator (README.md:46-49,
nmpc_manage.cpp:366-418 `extforceCallback`); the estimator itself is not in
the repo.  This module makes the framework standalone: a momentum-residual
disturbance observer that recovers the external force acceleration from
odometry velocity and the commanded thrust/attitude through the same
9-state model the planner uses (dynamics/quadrotor.py).

Momentum observer (first order):

    v_dot_model = R e3 T/m - g e3 - R D R^T v          (no external force)
    f_hat      += L dt * ((v_k - v_{k-1})/dt - v_dot_model - f_hat)

which is a low-pass filter on the model residual with bandwidth L [1/s].
Pure array math: jit/vmap-able for per-scenario batched estimation, and a
small stateful host wrapper for the 100 Hz loop.

The *consumer-side* semantics of the reference (noise deadband
ext_noise_bound, force-jump replan trigger, >10 m/s^2 panic stop) live in
the FSM (engine/planner.py), matching the reference's split.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from forces_resilient_planner_tpu.config import ModelConfig
from forces_resilient_planner_tpu.dynamics.quadrotor import (
    continuous_dynamics,
)


class EstimatorState(NamedTuple):
    f_hat: jnp.ndarray    # (..., 3) estimated external acceleration
    v_prev: jnp.ndarray   # (..., 3) last velocity sample


def estimator_init(v0: jnp.ndarray) -> EstimatorState:
    return EstimatorState(f_hat=jnp.zeros_like(v0), v_prev=v0)


def estimator_update(
    st: EstimatorState,
    x: jnp.ndarray,        # (..., 9) current odometry state [p, v, rpy]
    u: jnp.ndarray,        # (..., 4) commanded [rates(3), thrust]
    dt: float,
    cfg: ModelConfig,
    bandwidth: float = 8.0,
) -> EstimatorState:
    """One observer step.  Works on any leading batch shape."""
    v = x[..., 3:6]
    v_dot_meas = (v - st.v_prev) / dt
    # model acceleration WITHOUT external force
    f0 = jnp.zeros_like(v)
    v_dot_model = continuous_dynamics(x, u, f0, cfg)[..., 3:6]
    resid = v_dot_meas - v_dot_model - st.f_hat
    gain = 1.0 - jnp.exp(-bandwidth * dt)   # exact discrete first-order LPF
    return EstimatorState(f_hat=st.f_hat + gain * resid, v_prev=v)


class MomentumForceEstimator:
    """Stateful host-side wrapper for the 100 Hz loop (single vehicle).

    >>> est = MomentumForceEstimator(cfg)
    >>> f = est.update(odom_state, last_command, dt)   # (3,) accel [m/s^2]
    """

    def __init__(self, cfg: ModelConfig, bandwidth: float = 8.0):
        self.cfg = cfg
        self.bandwidth = bandwidth
        self._st: EstimatorState | None = None

    @property
    def f_hat(self) -> np.ndarray:
        return (
            np.zeros(3)
            if self._st is None
            else np.asarray(self._st.f_hat, float)
        )

    def update(self, x: np.ndarray, u: np.ndarray, dt: float) -> np.ndarray:
        xj = jnp.asarray(x, jnp.float64)
        if self._st is None:
            self._st = estimator_init(xj[3:6])
            return np.zeros(3)
        self._st = estimator_update(
            self._st, xj, jnp.asarray(u, jnp.float64), dt, self.cfg,
            self.bandwidth,
        )
        return np.asarray(self._st.f_hat, float)

    def sync(self, x: np.ndarray) -> None:
        """Track velocity without integrating the observer — for phases
        where the vehicle is not flying the model (position holds, yaw
        ramps): the momentum residual is meaningless there and would
        corrupt f_hat."""
        v = jnp.asarray(x, jnp.float64)[3:6]
        if self._st is None:
            self._st = estimator_init(v)
        else:
            self._st = self._st._replace(v_prev=v)

    def reset(self) -> None:
        self._st = None
