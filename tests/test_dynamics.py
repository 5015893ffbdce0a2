"""Dynamics parity tests.

Validates the JAX model against an independent NumPy transcription of
nonlinear_dynamics.m and the hand-derived Jacobian structure of
nmpc_solver.cpp:615-699 (via finite differences).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forces_resilient_planner_tpu.config import DEFAULT_CONFIG
from forces_resilient_planner_tpu.dynamics.quadrotor import (
    ab_jacobians,
    continuous_dynamics,
    continuous_jacobians,
    euler_to_rot,
    rk2_step,
)

CFG = DEFAULT_CONFIG.model
RNG = np.random.default_rng(0)


def numpy_dynamics(x, u, f_ext):
    """Independent transcription of nonlinear_dynamics.m:20-40."""
    roll, pitch, yaw = x[6], x[7], x[8]
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    R = np.array(
        [
            [cy * cp, cy * sp * sr - cr * sy, cy * sp * cr + sy * sr],
            [cp * sy, cy * cr + sy * sp * sr, sy * sp * cr - cy * sr],
            [-sp, cp * sr, cp * cr],
        ]
    )
    z_B = R[:, 2]
    D = np.diag([CFG.drag_coeff, CFG.drag_coeff, 0.0])
    v = x[3:6]
    drag_acc = R @ D @ R.T @ v
    acc = z_B * u[3] / CFG.mass + f_ext - np.array([0, 0, CFG.g]) - drag_acc
    return np.concatenate([v, acc, u[0:3]])


def random_state():
    x = RNG.uniform(-1, 1, 9)
    x[6:8] *= 0.4 * np.pi
    x[8] *= np.pi
    u = np.array(
        [
            RNG.uniform(-CFG.max_rate, CFG.max_rate),
            RNG.uniform(-CFG.max_rate, CFG.max_rate),
            RNG.uniform(-CFG.max_rate, CFG.max_rate),
            RNG.uniform(CFG.min_thrust, CFG.max_thrust),
        ]
    )
    f = RNG.uniform(-2, 2, 3)
    return x, u, f


def test_continuous_dynamics_matches_reference_transcription():
    for _ in range(20):
        x, u, f = random_state()
        got = continuous_dynamics(jnp.asarray(x), jnp.asarray(u), jnp.asarray(f), CFG)
        want = numpy_dynamics(x, u, f)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)


def test_rk2_is_heun():
    """RK2 must be Heun's method exactly (FORCESNLPsolver_normal_casadi.c:238-470)."""
    x, u, f = random_state()
    k1 = numpy_dynamics(x, u, f)
    k2 = numpy_dynamics(x + CFG.dt * k1, u, f)
    want = x + 0.5 * CFG.dt * (k1 + k2)
    got = rk2_step(jnp.asarray(x), jnp.asarray(u), jnp.asarray(f), CFG)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)


def test_jacobians_match_finite_differences():
    x, u, f = random_state()
    A, B = ab_jacobians(jnp.asarray(x), jnp.asarray(u), jnp.asarray(f), CFG)
    eps = 1e-6

    def fd(fn, v):
        out = []
        for i in range(v.size):
            vp, vm = v.copy(), v.copy()
            vp[i] += eps
            vm[i] -= eps
            out.append((fn(vp) - fn(vm)) / (2 * eps))
        return np.stack(out, axis=-1)

    def step_np(xx, uu):
        k1 = numpy_dynamics(xx, uu, f)
        k2 = numpy_dynamics(xx + CFG.dt * k1, uu, f)
        return xx + 0.5 * CFG.dt * (k1 + k2)

    A_fd = fd(lambda v: step_np(v, u), x)
    B_fd = fd(lambda v: step_np(x, v), u)
    np.testing.assert_allclose(np.asarray(A), A_fd, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(B), B_fd, rtol=1e-5, atol=1e-7)


def test_continuous_jacobian_structure():
    """Sparsity/structure of At, Bt matches nmpc_solver.cpp:8-26: dp/dv = I,
    deuler/du = I on rate rows, thrust column only hits acceleration."""
    x, u, f = random_state()
    At, Bt = continuous_jacobians(jnp.asarray(x), jnp.asarray(u), jnp.asarray(f), CFG)
    At, Bt = np.asarray(At), np.asarray(Bt)
    np.testing.assert_allclose(At[0:3, 3:6], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(At[0:3, 0:3], 0, atol=1e-12)
    np.testing.assert_allclose(At[6:9, :], 0, atol=1e-12)
    np.testing.assert_allclose(Bt[6:9, 0:3], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(Bt[0:6, 0:3], 0, atol=1e-12)
    # thrust column: z_B / m on acc rows
    R = np.asarray(euler_to_rot(jnp.asarray(x[6:9])))
    np.testing.assert_allclose(Bt[3:6, 3], R[:, 2] / CFG.mass, rtol=1e-8)


def test_euler_to_rot_vs_quaternion_composition():
    """eulerToRot (nmpc_solver.cpp:554-564) builds qz*qy*qx — same matrix."""
    for _ in range(10):
        rpy = RNG.uniform(-1.5, 1.5, 3)
        R = np.asarray(euler_to_rot(jnp.asarray(rpy)))

        def quat(w, x, y, z):
            return np.array(
                [
                    [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                    [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                    [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                ]
            )

        cr, sr = np.cos(rpy[0] / 2), np.sin(rpy[0] / 2)
        cp, sp = np.cos(rpy[1] / 2), np.sin(rpy[1] / 2)
        cy, sy = np.cos(rpy[2] / 2), np.sin(rpy[2] / 2)
        # qz * qy * qx
        w = cy * cp * cr + sy * sp * sr
        xq = cy * cp * sr - sy * sp * cr
        yq = cy * sp * cr + sy * cp * sr
        zq = sy * cp * cr - cy * sp * sr
        np.testing.assert_allclose(R, quat(w, xq, yq, zq), atol=1e-12)
