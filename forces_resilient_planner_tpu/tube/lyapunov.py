"""Disturbance-tube propagation: forward reachable ellipsoids.

TPU-native equivalent of NMPCSolver::getDistrEllipsoid + setFORCESParams
(plan_manage/src/nmpc_solver.cpp:484-611):

  - closed-loop Phi = At + Bt K with the fixed feedback gain K
    (nmpc_solver.cpp:28-31, 696); At/Bt are the continuous-time Jacobians
    (hand-derived in updateMatrix 615-699, here via autodiff).
  - per disturbance channel i:  Nt = t w_i^2 D_i D_i^T,
    W = Nt - e^{-Phi t} Nt e^{-Phi^T t},  solve  Phi X + X Phi^T = W.
    The reference solves this with complex Schur + Sylvester
    (Eigen::matrix_function_solve_triangular_sylvester, line 595); at 9x9 a
    batched Kronecker solve (81x81) is the TPU-shaped formulation — one
    batched LU instead of an unbatchable Schur iteration.
  - channel combination and stage recursion use the trace-normalized
    Minkowski-sum approximation Q = (1+1/beta) Q1 + (1+beta) Q2 with
    beta = sqrt(tr Q1 / tr Q2)  (nmpc_solver.cpp:507-509, 601-603).

Faithfulness note: the reference's `temp` accumulator is declared
uninitialized (nmpc_solver.cpp:573, UB in C++); we implement the intended
semantics temp = 0.  The shadowed inner `X` (line 596) is likewise treated
as the intended per-channel solution.

Structure for TPU: everything per-stage-independent (Phi, expm, Lyapunov
solves, Qd) is computed batched with vmap; only the cheap 9x9 Minkowski
recursion over the horizon runs in a lax.scan.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from forces_resilient_planner_tpu.config import ModelConfig, TubeConfig
from forces_resilient_planner_tpu.dynamics.quadrotor import (
    continuous_jacobians,
    euler_to_rot,
)

_PREC = jax.lax.Precision.HIGHEST

NX = 9


def _mm(a, b):
    return jnp.matmul(a, b, precision=_PREC)


def lyapunov_solve(Phi: jnp.ndarray, W: jnp.ndarray) -> jnp.ndarray:
    """Solve Phi X + X Phi^T = W for X via the Kronecker-vectorized system.

    (I (x) Phi + Phi (x) I) vec(X) = vec(W) with column-major vec; using
    row-major flatten the operator becomes kron(Phi, I) + kron(I, Phi).

    General-W reference implementation (kept as the oracle for tests).
    The production tube path uses lyapunov_gramian below: at batch scale
    the 81x81 LU's block-inversion custom call must hold its whole
    (B, N, 81, 81) operand in scoped VMEM, which overflows the 16 MB v5e
    limit past ~8 vmapped pipelines.
    """
    n = Phi.shape[-1]
    I = jnp.eye(n, dtype=Phi.dtype)
    Kmat = jnp.kron(Phi, I) + jnp.kron(I, Phi)
    x = jnp.linalg.solve(Kmat, W.reshape(-1))
    return x.reshape(n, n)


def lyapunov_gramian(Phi: jnp.ndarray, C: jnp.ndarray, t: float) -> jnp.ndarray:
    """X = int_0^t e^{-Phi s} C e^{-Phi^T s} ds — the UNIQUE solution of
    Phi X + X Phi^T = C - e^{-Phi t} C e^{-Phi^T t} (differentiate the
    integral), i.e. exactly the getDistrEllipsoid Lyapunov problem
    (nmpc_solver.cpp:567-611) without forming the right-hand side.

    Computed with Van Loan's block-exponential identity:
      expm([[ -Phi, C ], [ 0, Phi^T ]] t) = [[ ., F12 ], [ 0, F22 ]]
      F12 = X e^{Phi^T t},  F22 = e^{Phi^T t}  =>  X = F12 F22^{-1}.
    One 18x18 expm + one 9x9 solve per (stage, channel): VMEM-trivial,
    fully batchable, and PSD by construction (the Kronecker route can
    return small asymmetries at f32).
    """
    n = Phi.shape[-1]
    Z = jnp.zeros_like(Phi)
    H = jnp.concatenate(
        [
            jnp.concatenate([-Phi, C], axis=-1),
            jnp.concatenate([Z, Phi.T], axis=-1),
        ],
        axis=-2,
    )
    F = jax.scipy.linalg.expm(H * t)
    F12, F22 = F[:n, n:], F[n:, n:]
    # X = F12 @ inv(F22): solve F22^T X^T = F12^T (9x9)
    return jnp.linalg.solve(F22.T, F12.T).T


def minkowski_sum(Q1: jnp.ndarray, Q2: jnp.ndarray) -> jnp.ndarray:
    """Trace-normalized outer approximation of the Minkowski sum of two
    ellipsoids given by shape matrices (nmpc_solver.cpp:507-509)."""
    beta = jnp.sqrt(jnp.trace(Q1, axis1=-2, axis2=-1) / jnp.trace(Q2, axis1=-2, axis2=-1))
    beta = beta[..., None, None]
    return (1.0 + 1.0 / beta) * Q1 + (1.0 + beta) * Q2


def sqrtm_psd(Q: jnp.ndarray) -> jnp.ndarray:
    """Symmetric PSD matrix square root via eigendecomposition.

    Replaces the general EigenSolver sqrt (nmpc_solver.cpp:512-513); Q is
    symmetric by construction so eigh is exact and batchable.
    """
    w, V = jnp.linalg.eigh(Q)
    w = jnp.clip(w, 0.0, None)
    return jnp.einsum("...ij,...j,...kj->...ik", V, jnp.sqrt(w), V, precision=_PREC)


def closed_loop_phi(
    x: jnp.ndarray, u: jnp.ndarray, K: jnp.ndarray, cfg: ModelConfig
) -> jnp.ndarray:
    """Phi = At + Bt K at one linearization point (nmpc_solver.cpp:696)."""
    f0 = jnp.zeros(3, dtype=x.dtype)
    At, Bt = continuous_jacobians(x, u, f0, cfg)
    return At + _mm(Bt, K.astype(x.dtype))


def channel_Qd(
    Phi: jnp.ndarray, t: float, w_bound: jnp.ndarray, dtype=None
) -> jnp.ndarray:
    """Combined disturbance ellipsoid Qd for one stage (all 3 channels).

    Channels enter through D = [e_x e_y e_z] on the velocity rows
    (Dt_, nmpc_solver.cpp:24-26).
    """
    dtype = dtype or Phi.dtype

    def one_channel(i):
        d = jnp.zeros((NX,), dtype).at[3 + i].set(1.0)
        Nt = t * w_bound[i] ** 2 * jnp.outer(d, d)
        # Gramian form: solves Phi X + X Phi^T = Nt - e^{-Phi t} Nt e^{-Phi^T t}
        # without materializing the 81x81 Kronecker operator (see
        # lyapunov_gramian; identical X, batch-scalable on TPU)
        X = lyapunov_gramian(Phi, Nt, t)
        trX = jnp.sqrt(jnp.clip(jnp.trace(X), 1e-30, None))
        return trX, X / trX

    trs, Xn = jax.vmap(one_channel)(jnp.arange(3))
    return jnp.sum(trs) * jnp.sum(Xn, axis=0)


class TubeResult(NamedTuple):
    E: jnp.ndarray        # (N, 3, 3) stage uncertainty ellipsoid sqrt matrices
    Q2: jnp.ndarray       # (N, 3, 3) propagated disturbance position ellipsoids
    Phi: jnp.ndarray      # (N, 9, 9) closed-loop matrices (diagnostics)


def propagate_tubes(
    Z_prev: jnp.ndarray,
    mcfg: ModelConfig,
    tcfg: TubeConfig,
    K: jnp.ndarray,
) -> TubeResult:
    """Per-stage uncertainty ellipsoids E_i for corridor tightening.

    Z_prev: (N, 17) previous MPC solution (predicted euler/vel/thrust per
    stage are the linearization points, nmpc_solver.cpp:497-501).

    Stage recursion (setFORCESParams, nmpc_solver.cpp:490-520):
      Q1_i = R_i ego_size R_i^T
      Q_i  = Q1_0                      (i = 0)
           = mink(Q1_i, Q2pos_{i-1})   (i > 0)
      E_i  = sqrt(Q_i)
      [Qd_i from channels]  Qu_i = mink(Qinit_{i}, Qd_i)
      Q2pos_i = (e^{Phi_i t} Qu_i e^{Phi_i^T t})[0:3, 0:3]
      Qinit_{i+1} = Qu_i,   Qinit_0 = eps^2 I
    """
    dtype = Z_prev.dtype
    t = mcfg.dt
    N = Z_prev.shape[0]
    x_stages = Z_prev[:, 8:17]
    u_stages = Z_prev[:, 0:4]
    rpy = Z_prev[:, 14:17]
    w_bound = jnp.full((3,), tcfg.ext_noise_bound, dtype)

    Phi = jax.vmap(lambda x, u: closed_loop_phi(x, u, jnp.asarray(K), mcfg))(
        x_stages, u_stages
    )
    # stage-independent heavy lifting, fully batched
    Qd = jax.vmap(lambda P: channel_Qd(P, t, w_bound, dtype))(Phi)
    expm_pos = jax.vmap(lambda P: jax.scipy.linalg.expm(P * t))(Phi)

    R = euler_to_rot(rpy)
    ego = jnp.diag(
        jnp.asarray([tcfg.ego_r**2, tcfg.ego_r**2, tcfg.ego_h**2], dtype)
    )
    Q1 = jnp.einsum("nij,jk,nlk->nil", R, ego, R, precision=_PREC)

    Q_init0 = (tcfg.epsilon**2) * jnp.eye(NX, dtype=dtype)

    def scan_body(carry, inp):
        Q_init = carry
        Qd_i, Em_i = inp
        Qu = minkowski_sum(Q_init, Qd_i)
        Q2pos = _mm(_mm(Em_i, Qu), Em_i.T)[0:3, 0:3]
        return Qu, Q2pos

    _, Q2pos = jax.lax.scan(scan_body, Q_init0, (Qd, expm_pos))

    # combine with the ego ellipsoid: stage 0 uses Q1 only, stage i uses the
    # disturbance ellipsoid computed at stage i-1
    Qcomb = jnp.concatenate(
        [Q1[0][None], minkowski_sum(Q1[1:], Q2pos[:-1])], axis=0
    )
    E = sqrtm_psd(Qcomb)
    return TubeResult(E=E, Q2=Q2pos, Phi=Phi)


def tighten_corridor(
    A: jnp.ndarray, b: jnp.ndarray, E: jnp.ndarray
) -> jnp.ndarray:
    """btilde_j = b_j - ||E a_j^T||  (forces_normal.cpp:111-136).

    A: (..., nh, 3), b: (..., nh), E: (..., 3, 3) -> (..., nh).
    Zero (padding) rows are left untouched (||E*0|| = 0).
    """
    Ea = jnp.einsum("...ij,...kj->...ki", E, A, precision=_PREC)
    return b - jnp.linalg.norm(Ea, axis=-1)
