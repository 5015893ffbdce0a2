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


def _chol4(A):
    """Unrolled Cholesky of a 4x4 SPD matrix.

    TPU note: lax.linalg.cholesky on (batch, 4, 4) lowers to serialized
    scalar-ish code; unrolling to explicit elementwise formulas keeps the
    whole Riccati sweep on the VPU with the batch dimension vectorized.
    Returns the lower factor entries as a tuple.
    """
    eps = jnp.asarray(1e-30, A.dtype)
    l00 = jnp.sqrt(jnp.maximum(A[..., 0, 0], eps))
    l10 = A[..., 1, 0] / l00
    l20 = A[..., 2, 0] / l00
    l30 = A[..., 3, 0] / l00
    l11 = jnp.sqrt(jnp.maximum(A[..., 1, 1] - l10 * l10, eps))
    l21 = (A[..., 2, 1] - l20 * l10) / l11
    l31 = (A[..., 3, 1] - l30 * l10) / l11
    l22 = jnp.sqrt(jnp.maximum(A[..., 2, 2] - l20 * l20 - l21 * l21, eps))
    l32 = (A[..., 3, 2] - l30 * l20 - l31 * l21) / l22
    l33 = jnp.sqrt(
        jnp.maximum(A[..., 3, 3] - l30 * l30 - l31 * l31 - l32 * l32, eps)
    )
    return (l00, l10, l20, l30, l11, l21, l31, l22, l32, l33)


def spd_solve4(A, B):
    """Solve A X = B for SPD 4x4 A and B of shape (..., 4, k) via unrolled
    Cholesky + forward/back substitution (elementwise, batch-vectorized)."""
    (l00, l10, l20, l30, l11, l21, l31, l22, l32, l33) = _chol4(A)
    b0, b1, b2, b3 = B[..., 0, :], B[..., 1, :], B[..., 2, :], B[..., 3, :]
    # forward: L y = b
    y0 = b0 / l00[..., None]
    y1 = (b1 - l10[..., None] * y0) / l11[..., None]
    y2 = (b2 - l20[..., None] * y0 - l21[..., None] * y1) / l22[..., None]
    y3 = (
        b3 - l30[..., None] * y0 - l31[..., None] * y1 - l32[..., None] * y2
    ) / l33[..., None]
    # backward: L^T x = y
    x3 = y3 / l33[..., None]
    x2 = (y2 - l32[..., None] * x3) / l22[..., None]
    x1 = (y1 - l21[..., None] * x2 - l31[..., None] * x3) / l11[..., None]
    x0 = (
        y0 - l10[..., None] * x1 - l20[..., None] * x2 - l30[..., None] * x3
    ) / l00[..., None]
    return jnp.stack([x0, x1, x2, x3], axis=-2)


@jax.custom_batching.custom_vmap
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
    sol_term = spd_solve4(
        R[-1], jnp.concatenate([S[-1], qu[-1][:, None]], axis=-1)
    )
    RiS, Riqu = sol_term[:, :NXB], sol_term[:, NXB]
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
        sol = spd_solve4(Rh, jnp.concatenate([Sh, quh[:, None]], axis=-1))
        K = -sol[:, :NXB]                                       # (4, 13)
        k = -sol[:, NXB]                                        # (4,)
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
    dtheta = spd_solve4(Ptt, rhs[:, None])[:, 0]
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


# ---------------------------------------------------------------------------
# lane-major batched implementation (TPU hot path)
# ---------------------------------------------------------------------------
# Batched (B, 13, 13) linear algebra is hostile to the TPU vector unit: XLA
# pads each tiny matrix to (8, 128) tiles, wasting ~10x lanes.  Putting the
# scenario batch on the minor (lane) dimension instead — arrays shaped
# (..., i, j, B) — turns every 13x13 operation into 13 fused elementwise
# FMAs over (i, k, B) tiles, which is exactly what the VPU wants.  The
# public solve_lqr gets a custom_vmap rule that routes batched calls here.

def _mm_ll(a, b):
    """(i, j, B) @ (j, k, B) -> (i, k, B): contraction as an unrolled sum of
    broadcasted elementwise products (fuses into VPU FMAs)."""
    return jnp.sum(a[:, :, None, :] * b[None, :, :, :], axis=1)


def _mv_ll(a, v):
    """(i, j, B) @ (j, B) -> (i, B)."""
    return jnp.sum(a * v[None, :, :], axis=1)


def _t_ll(a):
    return jnp.swapaxes(a, 0, 1)


def _chol4_ll(A):
    """Unrolled Cholesky of (4, 4, B) SPD stacks."""
    eps = jnp.asarray(1e-30, A.dtype)
    l00 = jnp.sqrt(jnp.maximum(A[0, 0], eps))
    l10 = A[1, 0] / l00
    l20 = A[2, 0] / l00
    l30 = A[3, 0] / l00
    l11 = jnp.sqrt(jnp.maximum(A[1, 1] - l10 * l10, eps))
    l21 = (A[2, 1] - l20 * l10) / l11
    l31 = (A[3, 1] - l30 * l10) / l11
    l22 = jnp.sqrt(jnp.maximum(A[2, 2] - l20 * l20 - l21 * l21, eps))
    l32 = (A[3, 2] - l30 * l20 - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(A[3, 3] - l30 * l30 - l31 * l31 - l32 * l32, eps))
    return (l00, l10, l20, l30, l11, l21, l31, l22, l32, l33)


def spd_solve4_ll(A, Bm):
    """Solve A X = B with A (4, 4, B) SPD, B (4, k, B)."""
    (l00, l10, l20, l30, l11, l21, l31, l22, l32, l33) = _chol4_ll(A)
    b0, b1, b2, b3 = Bm[0], Bm[1], Bm[2], Bm[3]     # (k, B)
    y0 = b0 / l00[None]
    y1 = (b1 - l10[None] * y0) / l11[None]
    y2 = (b2 - l20[None] * y0 - l21[None] * y1) / l22[None]
    y3 = (b3 - l30[None] * y0 - l31[None] * y1 - l32[None] * y2) / l33[None]
    x3 = y3 / l33[None]
    x2 = (y2 - l32[None] * x3) / l22[None]
    x1 = (y1 - l21[None] * x2 - l31[None] * x3) / l11[None]
    x0 = (y0 - l10[None] * x1 - l20[None] * x2 - l30[None] * x3) / l00[None]
    return jnp.stack([x0, x1, x2, x3], axis=0)


def solve_lqr_batched(Q, R, S, qx, qu, A, B, c, dx0) -> LQRSolution:
    """Lane-major batched LQR solve.

    Shapes (trailing batch Bn):
      Q (N,13,13,Bn)  R (N,4,4,Bn)  S (N,4,13,Bn)  qx (N,13,Bn)  qu (N,4,Bn)
      A (N-1,13,13,Bn)  B (N-1,13,4,Bn)  c (N-1,13,Bn)  dx0 (9,Bn)
    """
    N = Q.shape[0]

    sol_term = spd_solve4_ll(
        R[-1], jnp.concatenate([S[-1], qu[-1][:, None]], axis=1)
    )
    RiS, Riqu = sol_term[:, :NXB], sol_term[:, NXB]
    P_term = Q[-1] - _mm_ll(_t_ll(S[-1]), RiS)
    p_term = qx[-1] - _mv_ll(_t_ll(S[-1]), Riqu)

    def backward(carry, inp):
        P, p = carry
        Qi, Ri, Si, qxi, qui, Ai, Bi, ci = inp
        Pc = p + _mv_ll(P, ci)
        AtP = _mm_ll(_t_ll(Ai), P)
        BtP = _mm_ll(_t_ll(Bi), P)
        Qh = Qi + _mm_ll(AtP, Ai)
        Rh = Ri + _mm_ll(BtP, Bi)
        Sh = Si + _mm_ll(BtP, Ai)
        qxh = qxi + _mv_ll(_t_ll(Ai), Pc)
        quh = qui + _mv_ll(_t_ll(Bi), Pc)
        sol = spd_solve4_ll(Rh, jnp.concatenate([Sh, quh[:, None]], axis=1))
        K = -sol[:, :NXB]
        k = -sol[:, NXB]
        Pn = Qh + _mm_ll(_t_ll(Sh), K)
        Pn = 0.5 * (Pn + jnp.swapaxes(Pn, 0, 1))
        pn = qxh + _mv_ll(_t_ll(Sh), k)
        return (Pn, pn), (K, k)

    inputs = (Q[:-1], R[:-1], S[:-1], qx[:-1], qu[:-1], A, B, c)
    (P0, p0), (Ks, ks) = jax.lax.scan(backward, (P_term, p_term), inputs,
                                      reverse=True)

    Pxt = P0[:9, 9:]
    Ptt = P0[9:, 9:]
    pt = p0[9:]
    rhs = -(pt + _mv_ll(jnp.swapaxes(Pxt, 0, 1), dx0))
    dtheta = spd_solve4_ll(Ptt, rhs[:, None])[:, 0]
    dxb0 = jnp.concatenate([dx0, dtheta], axis=0)

    def forward(dxb, inp):
        K, k, Ai, Bi, ci = inp
        du = _mv_ll(K, dxb) + k
        nxt = _mv_ll(Ai, dxb) + _mv_ll(Bi, du) + ci
        return nxt, (dxb, du)

    dxb_last, (dxbs, dus) = jax.lax.scan(forward, dxb0, (Ks, ks, A, B, c))
    du_term = -(Riqu + _mv_ll(RiS, dxb_last))
    dxb_all = jnp.concatenate([dxbs, dxb_last[None]], axis=0)
    du_all = jnp.concatenate([dus, du_term[None]], axis=0)

    nu_term = _mv_ll(P_term, dxb_last) + p_term

    def costate(nu_next, inp):
        Qi, Si, qxi, Ai, dxbi, dui = inp
        nu_i = (
            _mv_ll(Qi, dxbi) + _mv_ll(_t_ll(Si), dui) + qxi
            + _mv_ll(_t_ll(Ai), nu_next)
        )
        return nu_i, nu_i

    _, nus = jax.lax.scan(
        costate, nu_term,
        (Q[:-1], S[:-1], qx[:-1], A, dxb_all[:-1], du_all[:-1]),
        reverse=True,
    )
    nu_all = jnp.concatenate([nus, nu_term[None]], axis=0)
    return LQRSolution(dxb=dxb_all, du=du_all, nu=nu_all, dtheta=dtheta)


@solve_lqr.def_vmap
def _solve_lqr_vmap(axis_size, in_batched, Q, R, S, qx, qu, A, B, c, dx0):
    args = [Q, R, S, qx, qu, A, B, c, dx0]

    def to_ll(x, batched):
        if batched:
            return jnp.moveaxis(x, 0, -1)
        return jnp.broadcast_to(x[..., None], x.shape + (axis_size,))

    ll = [to_ll(x, b) for x, b in zip(args, in_batched)]
    # TPU hot path: the Pallas kernel runs the whole sweep in VMEM per
    # 128-lane tile (ops/lqr_pallas.py); XLA lane-major scan is the fallback.
    from forces_resilient_planner_tpu.ops import lqr_pallas

    if lqr_pallas.pallas_lqr_enabled(Q.dtype, axis_size):
        sol = LQRSolution(*lqr_pallas.solve_lqr_lanes(*ll))
    else:
        sol = solve_lqr_batched(*ll)
    out = LQRSolution(*[jnp.moveaxis(f, -1, 0) for f in sol])
    return out, LQRSolution(dxb=True, du=True, nu=True, dtheta=True)
