"""High-accuracy CPU oracle for solver parity testing.

Independently re-solves the identical NLP (same RK2 dynamics, costs, bounds,
corridor constraints, tolerances) with scipy's SLSQP on the condensed
control-space formulation.  This replaces the expired FORCES Pro binaries as
the parity reference (BASELINE.md caveat: embedded license expired
2021-10-29, exit code -100).

Condensation: decision vector v = [uprev_0 (4), u_0..u_{N-1} (4N)]; states
are eliminated through the exact RK2 rollout from xinit, so the equality
constraints hold by construction and only inequalities remain.
"""
from __future__ import annotations

import numpy as np
import scipy.optimize as sopt

import jax
import jax.numpy as jnp

from forces_resilient_planner_tpu.config import ModelConfig, SolverConfig
from forces_resilient_planner_tpu.dynamics.quadrotor import rk2_step
from forces_resilient_planner_tpu.solver import nlp
from forces_resilient_planner_tpu.solver.nlp import NLPParams


def _rollout_Z(v: jnp.ndarray, params: NLPParams, cfg: ModelConfig) -> jnp.ndarray:
    """v (4 + 4N,) -> Z (N, 17) via exact rollout."""
    N = cfg.N
    uprev0 = v[:4]
    u = v[4:].reshape(N, 4)

    def step(x, uu):
        xn = rk2_step(x, uu, params.f_ext, cfg)
        return xn, x

    _, xs = jax.lax.scan(step, params.xinit, u)
    uprev = jnp.concatenate([uprev0[None], u[:-1]], axis=0)
    return jnp.concatenate([u, uprev, xs], axis=1)


def solve_oracle(
    params: NLPParams,
    mcfg: ModelConfig,
    scfg: SolverConfig,
    v0: np.ndarray | None = None,
    maxiter: int = 500,
    ftol: float = 1e-14,
):
    """Returns (Z (N,17), scipy result).  Requires jax_enable_x64.

    SLSQP on the condensed problem; its SQP iterations are an independent
    algorithm from our interior-point method, so agreement certifies the
    KKT point rather than the implementation.
    """
    N = mcfg.N
    H = nlp.stage_hessians(params.weights, mcfg, jnp.float64)
    lb, ub = nlp.variable_bounds(mcfg, jnp.float64)
    hu = scfg.corridor_slack

    def obj(v):
        Z = _rollout_Z(jnp.asarray(v), params, mcfg)
        return nlp.cost_value(Z, params, H)

    def cons(v):
        # SLSQP convention: feasible when >= 0
        Z = _rollout_Z(jnp.asarray(v), params, mcfg)
        return -nlp.inequality_residuals(Z, params, lb, ub, hu).reshape(-1)

    obj_j = jax.jit(jax.value_and_grad(obj))
    cons_j = jax.jit(cons)
    cons_jac = jax.jit(jax.jacfwd(cons))

    nv = 4 + 4 * N
    if v0 is None:
        v0 = np.zeros(nv)
        v0[3::4] = mcfg.hover_thrust

    # control bounds directly on v
    lbv = np.tile(np.asarray(lb[:4]), N + 1)
    ubv = np.tile(np.asarray(ub[:4]), N + 1)
    v0 = np.clip(v0, lbv + 1e-6, ubv - 1e-6)

    res = sopt.minimize(
        lambda v: tuple(np.asarray(o) for o in obj_j(v)),
        v0,
        jac=True,
        method="SLSQP",
        bounds=list(zip(lbv, ubv)),
        constraints=[
            {
                "type": "ineq",
                "fun": lambda v: np.asarray(cons_j(v)),
                "jac": lambda v: np.asarray(cons_jac(v)),
            }
        ],
        options={"maxiter": maxiter, "ftol": ftol},
    )
    Z = np.asarray(_rollout_Z(jnp.asarray(res.x), params, mcfg))
    return Z, res


def kkt_certificate(
    v: np.ndarray,
    params: NLPParams,
    mcfg: ModelConfig,
    scfg: SolverConfig,
    active_tol: float = 1e-6,
):
    """Independent KKT residuals at a condensed-space point v.

    SLSQP frequently stops with status 8 ("positive directional derivative
    for linesearch") AT the optimum when ftol is below what the condensed
    f64 objective resolves; its status flag then under-reports convergence.
    This certificate checks the point itself:

      feas = max inequality violation (>= 0 convention)
      stat = inf-norm of grad_f - J_act^T mu - lam_lb + lam_ub minimized
             over nonnegative multipliers (NNLS), with the one-sided rule
             at active bounds

    Returns (feas, stat) — a point with feas <~ 1e-8 and stat <~ 1e-5 *
    scale is a KKT point regardless of the SLSQP status."""
    N = mcfg.N
    H = nlp.stage_hessians(params.weights, mcfg, jnp.float64)
    lb, ub = nlp.variable_bounds(mcfg, jnp.float64)
    hu = scfg.corridor_slack

    def obj(vv):
        Z = _rollout_Z(jnp.asarray(vv), params, mcfg)
        return nlp.cost_value(Z, params, H)

    def cons(vv):
        Z = _rollout_Z(jnp.asarray(vv), params, mcfg)
        return -nlp.inequality_residuals(Z, params, lb, ub, hu).reshape(-1)

    g = np.asarray(jax.grad(obj)(jnp.asarray(v)))
    c = np.asarray(cons(v))
    J = np.asarray(jax.jacfwd(cons)(jnp.asarray(v)))
    feas = float(np.maximum(-c, 0.0).max())

    lbv = np.tile(np.asarray(lb[:4]), N + 1)
    ubv = np.tile(np.asarray(ub[:4]), N + 1)
    at_lb = v < lbv + 1e-8
    at_ub = v > ubv - 1e-8
    active = np.abs(c) < active_tol

    cols = []
    if active.any():
        cols.append(J[active].T)                       # (nv, n_act)
    if at_lb.any():
        cols.append(np.eye(len(v))[:, at_lb])          # +lam_lb columns
    if at_ub.any():
        cols.append(-np.eye(len(v))[:, at_ub])         # -lam_ub columns
    if cols:
        A = np.concatenate(cols, axis=1)
        mu, _ = sopt.nnls(A, g)
        r = g - A @ mu
    else:
        r = g
    # one-sided rule at active bounds: r >= 0 allowed at lb, <= 0 at ub
    r_eff = np.where(at_lb, np.minimum(r, 0.0), r)
    r_eff = np.where(at_ub, np.maximum(r_eff, 0.0), r_eff)
    stat = float(np.abs(r_eff).max())
    return feas, stat
