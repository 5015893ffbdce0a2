"""Momentum force observer: convergence against the true plant.

The estimator must recover the simulator's true external force from
odometry + commands alone (the framework's standalone replacement for the
VID-Fusion `/forces` input, README.md:46-49).
"""
import jax
import jax.numpy as jnp
import numpy as np

from forces_resilient_planner_tpu.config import DEFAULT_CONFIG as C
from forces_resilient_planner_tpu.engine.simulator import _dynamics
from forces_resilient_planner_tpu.estimation import (
    MomentumForceEstimator,
    estimator_init,
    estimator_update,
)


def _fly(f_true, n_steps=400, dt=0.01, seed=0):
    """Integrate the true plant under a wobbly open-loop command and yield
    (state, command) samples."""
    rng = np.random.default_rng(seed)
    x = np.zeros(9)
    x[2] = 1.2
    hover = C.model.mass * C.model.g
    for k in range(n_steps):
        u = np.array(
            [0.3 * np.sin(0.05 * k), 0.2 * np.cos(0.03 * k), 0.0,
             hover * (1.0 + 0.05 * np.sin(0.02 * k))]
        )
        yield x.copy(), u.copy()
        x = x + dt * _dynamics(x, u, f_true, C.model)


def test_estimator_converges_to_true_force():
    f_true = np.array([1.2, -0.6, 0.3])
    est = MomentumForceEstimator(C.model, bandwidth=8.0)
    for x, u in _fly(f_true):
        f = est.update(x, u, 0.01)
    np.testing.assert_allclose(f, f_true, atol=0.05)


def test_estimator_tracks_force_step():
    est = MomentumForceEstimator(C.model, bandwidth=10.0)
    x = np.zeros(9)
    x[2] = 1.2
    hover = np.array([0.0, 0.0, 0.0, C.model.mass * C.model.g])
    dt = 0.01
    f_true = np.zeros(3)
    errs = []
    for k in range(600):
        if k == 300:
            f_true = np.array([2.0, 0.0, 0.0])   # gust turns on
        est.update(x, hover, dt)
        x = x + dt * _dynamics(x, hover, f_true, C.model)
        if k in (295, 595):
            errs.append(np.linalg.norm(est.f_hat - f_true))
    assert errs[0] < 0.02          # converged to zero-force before the gust
    assert errs[1] < 0.1           # re-converged after the step


def test_estimator_batched_jit():
    """The functional core vmaps over vehicles and runs under jit."""
    B = 8
    rng = np.random.default_rng(1)
    f_true = rng.uniform(-1.5, 1.5, (B, 3))
    x = np.zeros((B, 9))
    x[:, 2] = 1.0
    hover = np.tile([0.0, 0.0, 0.0, C.model.mass * C.model.g], (B, 1))
    dt = 0.01

    step = jax.jit(
        lambda st, xs: estimator_update(
            st, xs, jnp.asarray(hover), dt, C.model, 10.0
        )
    )
    st = estimator_init(jnp.asarray(x[:, 3:6]))
    for _ in range(500):
        st = step(st, jnp.asarray(x))
        for i in range(B):
            x[i] = x[i] + dt * _dynamics(x[i], hover[i], f_true[i], C.model)
    np.testing.assert_allclose(np.asarray(st.f_hat), f_true, atol=0.05)
