"""Block-tridiagonal KKT solve via Riccati recursion.

Solves the equality-constrained QP arising at each interior-point iteration:

    min  sum_i 1/2 [dxb_i; du_i]^T [Q_i S_i^T; S_i R_i] [dxb_i; du_i]
              + qx_i^T dxb_i + qu_i^T du_i
    s.t. dxb_{i+1} = A_i dxb_i + B_i du_i + c_i        (i = 0..N-2)
         dxb_0 = [dx0_fixed; dtheta],  dtheta free     (partially-fixed init)

where xb = [x(9), uprev(4)] is the augmented state and u the 4-dim input.
The partially-free initial state encodes FORCES' xinitidx = states-only
(mpc_generator_normal.m:49): stage-0 u_prev is a free decision variable.

This is the TPU replacement for FORCES' 'symm_indefinite_fast' stagewise
factorization (mpc_generator_normal.m:66).  Sequential in N (N=20) via
lax.scan; batched across scenarios with vmap.  Also returns the costates
nu_i = P_i dxb_i + p_i, which are the equality multipliers the IPM needs.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from forces_resilient_planner_tpu.solver.nlp import NXB, NU

_PREC = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_PREC)


class LQRSolution(NamedTuple):
    dxb: jnp.ndarray    # (N, 13)
    du: jnp.ndarray     # (N, 4)
    nu: jnp.ndarray     # (N, 13) costates
    dtheta: jnp.ndarray # (4,) stage-0 u_prev step


def solve_lqr(
    Q: jnp.ndarray,    # (N, 13, 13)
    R: jnp.ndarray,    # (N, 4, 4)
    S: jnp.ndarray,    # (N, 4, 13)
    qx: jnp.ndarray,   # (N, 13)
    qu: jnp.ndarray,   # (N, 4)
    A: jnp.ndarray,    # (N-1, 13, 13)
    B: jnp.ndarray,    # (N-1, 13, 4)
    c: jnp.ndarray,    # (N-1, 13)
    dx0: jnp.ndarray,  # (9,) fixed initial state part
) -> LQRSolution:
    N = Q.shape[0]
    dtype = Q.dtype

    # ---- terminal stage: eliminate u_{N-1} (no dynamics out of it) -------
    Rl = jnp.linalg.cholesky(R[-1])
    RiS = jax.scipy.linalg.cho_solve((Rl, True), S[-1])
    Riqu = jax.scipy.linalg.cho_solve((Rl, True), qu[-1])
    P_term = Q[-1] - _mm(S[-1].T, RiS)
    p_term = qx[-1] - _mm(S[-1].T, Riqu[:, None])[:, 0]

    # ---- backward sweep over i = N-2 .. 0 --------------------------------
    def backward(carry, inp):
        P, p = carry
        Qi, Ri, Si, qxi, qui, Ai, Bi, ci = inp
        Pc = p + _mm(P, ci[:, None])[:, 0]
        AtP = _mm(Ai.T, P)
        BtP = _mm(Bi.T, P)
        Qh = Qi + _mm(AtP, Ai)
        Rh = Ri + _mm(BtP, Bi)
        Sh = Si + _mm(BtP, Ai)
        qxh = qxi + _mm(Ai.T, Pc[:, None])[:, 0]
        quh = qui + _mm(Bi.T, Pc[:, None])[:, 0]
        Rl_i = jnp.linalg.cholesky(Rh)
        K = -jax.scipy.linalg.cho_solve((Rl_i, True), Sh)       # (4, 13)
        k = -jax.scipy.linalg.cho_solve((Rl_i, True), quh)      # (4,)
        Pn = Qh + _mm(Sh.T, K)
        Pn = 0.5 * (Pn + Pn.T)
        pn = qxh + _mm(Sh.T, k[:, None])[:, 0]
        return (Pn, pn), (K, k)

    inputs = (Q[:-1], R[:-1], S[:-1], qx[:-1], qu[:-1], A, B, c)
    (P0, p0), (Ks, ks) = jax.lax.scan(
        backward, (P_term, p_term), inputs, reverse=True
    )

    # ---- stage-0 free u_prev (theta) -------------------------------------
    # V_0(dxb_0) with dxb_0 = [dx0; dtheta]; minimize over dtheta.
    Pxx = P0[:9, :9]
    Pxt = P0[:9, 9:]
    Ptt = P0[9:, 9:]
    pt = p0[9:]
    rhs = -(pt + _mm(Pxt.T, dx0[:, None])[:, 0])
    Ptl = jnp.linalg.cholesky(Ptt)
    dtheta = jax.scipy.linalg.cho_solve((Ptl, True), rhs)
    dxb0 = jnp.concatenate([dx0, dtheta])

    # ---- forward sweep ----------------------------------------------------
    def forward(dxb, inp):
        K, k, Ai, Bi, ci = inp
        du = _mm(K, dxb[:, None])[:, 0] + k
        nxt = _mm(Ai, dxb[:, None])[:, 0] + _mm(Bi, du[:, None])[:, 0] + ci
        return nxt, (dxb, du)

    dxb_last, (dxbs, dus) = jax.lax.scan(
        forward, dxb0, (Ks, ks, A, B, c)
    )
    # terminal input
    du_term = -(Riqu + _mm(RiS, dxb_last[:, None])[:, 0])

    dxb_all = jnp.concatenate([dxbs, dxb_last[None]], axis=0)
    du_all = jnp.concatenate([dus, du_term[None]], axis=0)

    # ---- costates nu_i = P_i dxb_i + p_i ---------------------------------
    # Recompute P_i along the trajectory is already available only at 0 and
    # terminal from the scan carries; instead rebuild nu from stationarity:
    #   nu_i = Q_i dxb_i + S_i^T du_i + qx_i + A_i^T nu_{i+1}
    nu_term = (
        _mm(P_term, dxb_last[:, None])[:, 0] + p_term
    )

    def costate(nu_next, inp):
        Qi, Si, qxi, Ai, dxbi, dui = inp
        nu_i = (
            _mm(Qi, dxbi[:, None])[:, 0]
            + _mm(Si.T, dui[:, None])[:, 0]
            + qxi
            + _mm(Ai.T, nu_next[:, None])[:, 0]
        )
        return nu_i, nu_i

    _, nus = jax.lax.scan(
        costate,
        nu_term,
        (Q[:-1], S[:-1], qx[:-1], A, dxb_all[:-1], du_all[:-1]),
        reverse=True,
    )
    nu_all = jnp.concatenate([nus, nu_term[None]], axis=0)
    return LQRSolution(dxb=dxb_all, du=du_all, nu=nu_all, dtheta=dtheta)
