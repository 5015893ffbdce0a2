"""Pallas TPU kernel: lane-major block-tridiagonal Riccati LQR solve.

The IPM's equality-constrained QP step (solver/riccati.py,
solve_lqr_batched) is a 20-stage backward Riccati sweep + forward rollout
+ costate recursion over (13, 13, BATCH) lane-major stacks.  Under XLA the
`lax.scan` writes its carry (P: 13x13xB) and the K-gain stack back to HBM
on every stage and re-reads them, so the sweep is HBM-bandwidth-bound.

This kernel runs the *entire* solve for a 128-lane batch tile inside VMEM:
grid = (B / 128,), every stage matrix stack for the tile (~5 MB) is staged
into VMEM once, the three sweeps run with zero HBM traffic for
intermediates, and only the solution (dxb, du, nu, dtheta) leaves the
chip's vector memory.

Math is identical to solver/riccati.py::solve_lqr_batched (which remains
the XLA fallback and the oracle for the interpret-mode parity tests in
tests/test_ops.py).  The factorization replaces FORCES Pro's
'symm_indefinite_fast' stagewise solver (reference
matlab_code/mpc/normal/mpc_generator_normal.m:66).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from forces_resilient_planner_tpu.solver.nlp import NXB, NU

LANES = 128  # f32 lane width; batch tile per kernel instance


# ---- in-kernel small linear algebra (operands are (i, j, LANES) stacks) ----

def _mm(a, b):
    """(i, j, L) @ (j, k, L) -> (i, k, L) as j unrolled broadcast FMAs.

    Pure-slice indexing only: mixed integer/newaxis indexing lowers to a
    gather, which Mosaic does not support beyond 2D.
    """
    acc = a[:, 0:1, :] * b[0:1]
    for j in range(1, a.shape[1]):
        acc = acc + a[:, j:j + 1, :] * b[j:j + 1]
    return acc


def _mv(a, v):
    """(i, j, L) @ (j, L) -> (i, L)."""
    return jnp.sum(a * v[None], axis=1)


def _t(a):
    return jnp.swapaxes(a, 0, 1)


def _chol4(A):
    """Unrolled Cholesky factors of a (4, 4, L) SPD stack."""
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


def _chol4_solve(f, Bm):
    """Solve L L^T X = B with factors f, B of shape (4, k, L)."""
    (l00, l10, l20, l30, l11, l21, l31, l22, l32, l33) = f
    b0, b1, b2, b3 = Bm[0], Bm[1], Bm[2], Bm[3]
    y0 = b0 / l00[None]
    y1 = (b1 - l10[None] * y0) / l11[None]
    y2 = (b2 - l20[None] * y0 - l21[None] * y1) / l22[None]
    y3 = (b3 - l30[None] * y0 - l31[None] * y1 - l32[None] * y2) / l33[None]
    x3 = y3 / l33[None]
    x2 = (y2 - l32[None] * x3) / l22[None]
    x1 = (y1 - l21[None] * x2 - l31[None] * x3) / l11[None]
    x0 = (y0 - l10[None] * x1 - l20[None] * x2 - l30[None] * x3) / l00[None]
    return jnp.stack([x0, x1, x2, x3], axis=0)


def _chol4_pack(A):
    """Packed (10, L) Cholesky factors of a (4, 4, L) SPD stack."""
    return jnp.stack(_chol4(A), axis=0)


def _chol4_solve_packed(f, Bm):
    """Solve against packed factors f (10, L); B of shape (4, k, L)."""
    return _chol4_solve(tuple(f[i] for i in range(10)), Bm)


def _lqr_factor_kernel(
    Q_ref, R_ref, S_ref, A_ref, B_ref,
    P_ref, K_ref, cRh_ref, RiS_ref, cRt_ref,
):
    """Riccati matrix sweep: store the cost-to-go stack P_i, the gains K_i
    and the packed Cholesky factors of Rh_i so backsolves can be replayed
    against multiple right-hand sides (Mehrotra predictor-corrector)."""
    N = Q_ref.shape[0]
    S_term = S_ref[N - 1]                                   # (4, 13, L)
    f_term = _chol4(R_ref[N - 1])
    RiS = _chol4_solve(f_term, S_term)                      # (4, 13, L)
    cRt_ref[:] = jnp.stack(f_term, axis=0)
    RiS_ref[:] = RiS
    P = Q_ref[N - 1] - _mm(_t(S_term), RiS)
    P_ref[N - 1] = P

    for i in range(N - 2, -1, -1):
        Ai, Bi = A_ref[i], B_ref[i]
        AtP = _mm(_t(Ai), P)
        BtP = _mm(_t(Bi), P)
        Qh = Q_ref[i] + _mm(AtP, Ai)
        Rh = R_ref[i] + _mm(BtP, Bi)
        Sh = S_ref[i] + _mm(BtP, Ai)
        fh = _chol4(Rh)
        K = -_chol4_solve(fh, Sh)                           # (4, 13, L)
        K_ref[i] = K
        cRh_ref[i] = jnp.stack(fh, axis=0)
        Pn = Qh + _mm(_t(Sh), K)
        P = 0.5 * (Pn + _t(Pn))
        P_ref[i] = P


def _lqr_solve_kernel(
    P_ref, K_ref, cRh_ref, RiS_ref, cRt_ref,
    A_ref, B_ref, c_ref, qx_ref, qu_ref, dx0_ref,
    dxb_ref, du_ref, nu_ref, dtheta_ref,
    p_scr, k_scr,
):
    """Vector backsolve against a stored factorization.

    Backward pass: p_i = qxh_i + K_i^T quh_i (Sh^T k = K^T quh since
    K = -Rh^{-1} Sh); costates from nu_i = P_i dxb_i + p_i.
    """
    N = qx_ref.shape[0]
    RiS = RiS_ref[:]
    Riqu = _chol4_solve_packed(cRt_ref[:], qu_ref[N - 1][:, None])[:, 0]
    p = qx_ref[N - 1] - _mv(_t(RiS), qu_ref[N - 1])
    p_scr[N - 1] = p

    for i in range(N - 2, -1, -1):
        Pc = p + _mv(P_ref[i + 1], c_ref[i])
        qxh = qx_ref[i] + _mv(_t(A_ref[i]), Pc)
        quh = qu_ref[i] + _mv(_t(B_ref[i]), Pc)
        k = -_chol4_solve_packed(cRh_ref[i], quh[:, None])[:, 0]
        k_scr[i] = k
        p = qxh + _mv(_t(K_ref[i]), quh)
        p_scr[i] = p

    # stage-0 free u_prev (theta): xinitidx = states only
    P0 = P_ref[0]
    Pxt = P0[:9, 9:]                                        # (9, 4, L)
    Ptt = P0[9:, 9:]                                        # (4, 4, L)
    dx0 = dx0_ref[:]                                        # (9, L)
    rhs = -(p[9:] + _mv(_t(Pxt), dx0))
    dtheta = _chol4_solve(_chol4(Ptt), rhs[:, None])[:, 0]
    dtheta_ref[:] = dtheta
    dxb = jnp.concatenate([dx0, dtheta], axis=0)            # (13, L)

    for i in range(N - 1):
        du = _mv(K_ref[i], dxb) + k_scr[i]
        dxb_ref[i] = dxb
        du_ref[i] = du
        nu_ref[i] = _mv(P_ref[i], dxb) + p_scr[i]
        dxb = _mv(A_ref[i], dxb) + _mv(B_ref[i], du) + c_ref[i]
    dxb_ref[N - 1] = dxb
    du_ref[N - 1] = -(Riqu + _mv(RiS, dxb))
    nu_ref[N - 1] = _mv(P_ref[N - 1], dxb) + p_scr[N - 1]


def _abar(Ax_i):
    """[[Ax, 0], [0, 0]]: augmented-state transition (9+4, 13, L)."""
    z94 = jnp.zeros(Ax_i.shape[:1] + (4,) + Ax_i.shape[2:], Ax_i.dtype)
    z4 = jnp.zeros((4, NXB) + Ax_i.shape[2:], Ax_i.dtype)
    return jnp.concatenate(
        [jnp.concatenate([Ax_i, z94], axis=1), z4], axis=0
    )


def _bbar(Bx_i):
    """[[Bx], [I4]]: input map with the u -> u_prev copy rows (13, 4, L)."""
    L = Bx_i.shape[-1]
    eye = jnp.broadcast_to(
        jnp.eye(NU, dtype=Bx_i.dtype)[:, :, None], (NU, NU, L)
    )
    return jnp.concatenate([Bx_i, eye], axis=0)


def _assemble_stage(
    i, w_wp_ref, w_input_ref, w_rate_ref, w_vel_ref, w_uprev0_ref,
    sigma_ref, Acor_ref, reg, rmax2,
):
    """Barrier-weighted stage QP blocks (Wp, Rp, Sp) for stage i, built in
    VMEM from the weight table + sigma + corridor rows — the in-kernel
    version of solver/ipm_lanes.py::_assemble_qp_blocks (same sparsity:
    tracking/vel/rate diagonals, u<->u_prev coupling, bound sigmas on every
    diagonal, dense corridor 3x3 position block).

    Mosaic has no scatter lowering, so everything is built from eye-masked
    broadcasts and concatenations — never `.at[...]` updates.
    """
    dtype = sigma_ref.dtype
    L = sigma_ref.shape[-1]
    sig = sigma_ref[i]                                      # (64, L)
    sig_u = sig[0:4] + sig[17:21]
    sig_up = sig[4:8] + sig[21:25]
    sig_x = sig[8:17] + sig[25:34]
    sc = sig[34:64]                                         # (30, L)
    A = Acor_ref[i]                                         # (30, 3, L)

    eye4 = jnp.eye(NU, dtype=dtype)[:, :, None]
    eye13 = jnp.eye(NXB, dtype=dtype)[:, :, None]
    wr = w_rate_ref[i][None]                                # (1, L)
    wp_i = w_wp_ref[i][None]
    # --- Rp: diag(2 w_rate + sig_u + reg [+ 2 w_input / rmax2 on 0:3]) ---
    r_diag = 2.0 * wr + sig_u + reg                         # (4, L)
    r_in = 2.0 * w_input_ref[i][None] / rmax2
    r_diag = jnp.concatenate([r_diag[0:3] + r_in, r_diag[3:4]], axis=0)
    Rp = eye4 * r_diag[None]                                # (4, 4, L)

    # --- Wp: diag([x_diag, up_diag]) + corridor 3x3 position block -------
    x_add = jnp.concatenate(
        [
            jnp.broadcast_to(2.0 * wp_i, (3, L)),
            jnp.broadcast_to(2.0 * w_vel_ref[i][None], (3, L)),
            jnp.zeros((2, L), dtype),
            24.0 * wp_i,
        ],
        axis=0,
    )
    x_diag = sig_x + reg + x_add                            # (9, L)
    up_add = jnp.concatenate(
        [jnp.broadcast_to(2.0 * w_uprev0_ref[i][None], (3, L)),
         jnp.zeros((1, L), dtype)],
        axis=0,
    )
    up_diag = 2.0 * wr + sig_up + reg + up_add              # (4, L)
    diag13 = jnp.concatenate([x_diag, up_diag], axis=0)     # (13, L)
    Wp = eye13 * diag13[None]                               # (13, 13, L)

    As = A * sc[:, None]                                    # (30, 3, L)
    # blk[j, l] = sum_k As[k, j] A[k, l]; as an unrolled _mm contraction
    # (Mosaic cannot reduce over a strided-slice dimension)
    blk = _mm(_t(As), A)                                    # (3, 3, L)
    blk_p = jnp.concatenate(
        [
            jnp.concatenate([blk, jnp.zeros((3, 10, L), dtype)], axis=1),
            jnp.zeros((10, NXB, L), dtype),
        ],
        axis=0,
    )
    Wp = Wp + blk_p

    # --- Sp: only the u <-> u_prev rate coupling at [k, 9+k] -------------
    Sp = jnp.concatenate(
        [jnp.zeros((NU, 9, L), dtype), -2.0 * wr[None] * eye4], axis=1
    )
    return Wp, Rp, Sp


def _lqr_factor_fused_kernel(
    w_wp_ref, w_input_ref, w_rate_ref, w_vel_ref, w_uprev0_ref,
    sigma_ref, Acor_ref, Ax_ref, Bx_ref, scal_ref,
    P_ref, K_ref, cRh_ref, RiS_ref, cRt_ref,
):
    """Factor kernel with in-VMEM QP assembly: the (N,13,13,B) stage
    Hessian stacks and the padded (13,13)/(13,4) dynamics never exist in
    HBM; inputs are the raw weight table, barrier sigmas, corridor rows and
    the 9x9/9x4 RK2 Jacobians."""
    N = sigma_ref.shape[0]
    reg = scal_ref[0]
    rmax2 = scal_ref[1]
    wargs = (
        w_wp_ref, w_input_ref, w_rate_ref, w_vel_ref, w_uprev0_ref,
    )

    Q_t, R_t, S_t = _assemble_stage(
        N - 1, *wargs, sigma_ref, Acor_ref, reg, rmax2
    )
    f_term = _chol4(R_t)
    RiS = _chol4_solve(f_term, S_t)
    cRt_ref[:] = jnp.stack(f_term, axis=0)
    RiS_ref[:] = RiS
    P_term = Q_t - _mm(_t(S_t), RiS)
    P_ref[N - 1] = P_term

    P = P_term
    for i in range(N - 2, -1, -1):
        Ai = _abar(Ax_ref[i])
        Bi = _bbar(Bx_ref[i])
        Qi, Ri, Si = _assemble_stage(
            i, *wargs, sigma_ref, Acor_ref, reg, rmax2
        )
        AtP = _mm(_t(Ai), P)
        BtP = _mm(_t(Bi), P)
        Qh = Qi + _mm(AtP, Ai)
        Rh = Ri + _mm(BtP, Bi)
        Sh = Si + _mm(BtP, Ai)
        fh = _chol4(Rh)
        K = -_chol4_solve(fh, Sh)
        K_ref[i] = K
        cRh_ref[i] = jnp.stack(fh, axis=0)
        Pn = Qh + _mm(_t(Sh), K)
        P = 0.5 * (Pn + _t(Pn))
        P_ref[i] = P


def _lqr_solve_fused_kernel(
    P_ref, K_ref, cRh_ref, RiS_ref, cRt_ref,
    Ax_ref, Bx_ref, c_ref, qx_ref, qu_ref, dx0_ref,
    dxb_ref, du_ref, nu_ref, dtheta_ref,
    p_scr, k_scr,
):
    """Vector backsolve rebuilding the [[Ax,0],[0,0]] / [[Bx],[I]] stage
    structure in VMEM (same math as _lqr_solve_kernel)."""
    N = qx_ref.shape[0]
    RiS = RiS_ref[:]
    Riqu = _chol4_solve_packed(cRt_ref[:], qu_ref[N - 1][:, None])[:, 0]
    p_term = qx_ref[N - 1] - _mv(_t(RiS), qu_ref[N - 1])
    p_scr[N - 1] = p_term

    p0 = p_term
    for i in range(N - 2, -1, -1):
        Ai = _abar(Ax_ref[i])
        Bi = _bbar(Bx_ref[i])
        Pc = p0 + _mv(P_ref[i + 1], c_ref[i])
        qxh = qx_ref[i] + _mv(_t(Ai), Pc)
        quh = qu_ref[i] + _mv(_t(Bi), Pc)
        k = -_chol4_solve_packed(cRh_ref[i], quh[:, None])[:, 0]
        k_scr[i] = k
        p0 = qxh + _mv(_t(K_ref[i]), quh)
        p_scr[i] = p0

    P0 = P_ref[0]
    Pxt = P0[:9, 9:]
    Ptt = P0[9:, 9:]
    dx0 = dx0_ref[:]
    rhs = -(p0[9:] + _mv(_t(Pxt), dx0))
    dtheta = _chol4_solve(_chol4(Ptt), rhs[:, None])[:, 0]
    dtheta_ref[:] = dtheta
    dxb0 = jnp.concatenate([dx0, dtheta], axis=0)

    dxb = dxb0
    for i in range(N - 1):
        du = _mv(K_ref[i], dxb) + k_scr[i]
        dxb_ref[i] = dxb
        du_ref[i] = du
        nu_ref[i] = _mv(P_ref[i], dxb) + p_scr[i]
        dxb = (
            _mv(_abar(Ax_ref[i]), dxb) + _mv(_bbar(Bx_ref[i]), du) + c_ref[i]
        )
    dxb_ref[N - 1] = dxb
    du_ref[N - 1] = -(Riqu + _mv(RiS, dxb))
    nu_ref[N - 1] = _mv(P_ref[N - 1], dxb) + p_scr[N - 1]


def _spec(shape):
    nd = len(shape)
    return pl.BlockSpec(
        shape[:-1] + (LANES,),
        lambda i, _nd=nd: (0,) * (_nd - 1) + (i,),
        memory_space=pltpu.VMEM,
    )


def _pad_lanes(Bn):
    return (-Bn) % LANES


@functools.partial(jax.jit, static_argnames=("interpret",))
def lqr_factor_lanes(Q, R, S, A, B, *, interpret: bool = False):
    """Factor kernel wrapper.  Returns (P, K, cRh, RiS, cRt) lane-major
    stacks (padded lanes get identity Q/R so the factors stay SPD)."""
    N = Q.shape[0]
    Bn = Q.shape[-1]
    dtype = Q.dtype
    pad = _pad_lanes(Bn)
    if pad:
        padf = lambda x: jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        eye4 = jnp.eye(NU, dtype=dtype)[None, :, :, None]
        eye13 = jnp.eye(NXB, dtype=dtype)[None, :, :, None]
        Q = padf(Q) + jnp.where(
            jnp.arange(Bn + pad) >= Bn, 1.0, 0.0
        ).astype(dtype) * eye13
        R = padf(R) + jnp.where(
            jnp.arange(Bn + pad) >= Bn, 1.0, 0.0
        ).astype(dtype) * eye4
        S, A, B = map(padf, (S, A, B))
    Bp = Bn + pad
    out_shapes = (
        jax.ShapeDtypeStruct((N, NXB, NXB, Bp), dtype),   # P
        jax.ShapeDtypeStruct((N - 1, NU, NXB, Bp), dtype),  # K
        jax.ShapeDtypeStruct((N - 1, 10, Bp), dtype),     # cRh
        jax.ShapeDtypeStruct((NU, NXB, Bp), dtype),       # RiS
        jax.ShapeDtypeStruct((10, Bp), dtype),            # cRt
    )
    return pl.pallas_call(
        _lqr_factor_kernel,
        grid=(Bp // LANES,),
        in_specs=[_spec(x.shape) for x in (Q, R, S, A, B)],
        out_specs=tuple(_spec(s.shape) for s in out_shapes),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(Q, R, S, A, B)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lqr_backsolve_lanes(fac, A, B, c, qx, qu, dx0, *, interpret: bool = False):
    """Vector-solve kernel wrapper.  fac = (P, K, cRh, RiS, cRt) from
    lqr_factor_lanes (already lane-padded); rhs arrays are padded here."""
    P, K, cRh, RiS, cRt = fac
    N = qx.shape[0]
    Bn = qx.shape[-1]
    dtype = qx.dtype
    pad = P.shape[-1] - Bn
    if pad:
        padf = lambda x: jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        A, B, c, qx, qu, dx0 = map(padf, (A, B, c, qx, qu, dx0))
    Bp = Bn + pad
    out_shapes = (
        jax.ShapeDtypeStruct((N, NXB, Bp), dtype),   # dxb
        jax.ShapeDtypeStruct((N, NU, Bp), dtype),    # du
        jax.ShapeDtypeStruct((N, NXB, Bp), dtype),   # nu
        jax.ShapeDtypeStruct((NU, Bp), dtype),       # dtheta
    )
    dxb, du, nu, dtheta = pl.pallas_call(
        _lqr_solve_kernel,
        grid=(Bp // LANES,),
        in_specs=[
            _spec(x.shape)
            for x in (P, K, cRh, RiS, cRt, A, B, c, qx, qu, dx0)
        ],
        out_specs=tuple(_spec(s.shape) for s in out_shapes),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((N, NXB, LANES), dtype),      # p stack
            pltpu.VMEM((N - 1, NU, LANES), dtype),   # k offsets
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(P, K, cRh, RiS, cRt, A, B, c, qx, qu, dx0)
    if pad:
        dxb, du, nu, dtheta = (
            dxb[..., :Bn], du[..., :Bn], nu[..., :Bn], dtheta[..., :Bn]
        )
    return dxb, du, nu, dtheta


@functools.partial(jax.jit, static_argnames=("interpret",))
def lqr_factor_fused_lanes(
    w_wp, w_input, w_rate, w_vel, w_uprev0,   # (N, Bn) stage weight tables
    sigma,                                     # (N, 64, Bn) barrier sigmas
    Acor,                                      # (N, 30, 3, Bn) corridor rows
    Ax, Bx,                                    # (N-1, 9, {9,4}, Bn) jacobians
    reg: float, rmax2: float,
    *, interpret: bool = False,
):
    """Fused assembly + factor: QP blocks and the augmented-state dynamics
    are built inside VMEM; the (N,13,13,B) stacks never touch HBM."""
    N = sigma.shape[0]
    Bn = sigma.shape[-1]
    dtype = sigma.dtype
    pad = _pad_lanes(Bn)
    if pad:
        padf = lambda x: jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        lane_pad = (jnp.arange(Bn + pad) >= Bn).astype(dtype)
        # padded lanes: unit tracking/rate weights keep the blocks SPD
        w_wp = padf(w_wp) + lane_pad
        w_input = padf(w_input) + lane_pad
        w_rate = padf(w_rate) + lane_pad
        w_vel, w_uprev0, sigma, Acor, Ax, Bx = map(
            padf, (w_vel, w_uprev0, sigma, Acor, Ax, Bx)
        )
    Bp = Bn + pad
    scal = jnp.broadcast_to(
        jnp.asarray([reg, rmax2], dtype)[:, None], (2, Bp)
    )
    out_shapes = (
        jax.ShapeDtypeStruct((N, NXB, NXB, Bp), dtype),     # P
        jax.ShapeDtypeStruct((N - 1, NU, NXB, Bp), dtype),  # K
        jax.ShapeDtypeStruct((N - 1, 10, Bp), dtype),       # cRh
        jax.ShapeDtypeStruct((NU, NXB, Bp), dtype),         # RiS
        jax.ShapeDtypeStruct((10, Bp), dtype),              # cRt
    )
    ins = (w_wp, w_input, w_rate, w_vel, w_uprev0, sigma, Acor, Ax, Bx, scal)
    return pl.pallas_call(
        _lqr_factor_fused_kernel,
        grid=(Bp // LANES,),
        in_specs=[_spec(x.shape) for x in ins],
        out_specs=tuple(_spec(s.shape) for s in out_shapes),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(*ins)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lqr_backsolve_fused_lanes(fac, Ax, Bx, c, qx, qu, dx0, *,
                              interpret: bool = False):
    """Backsolve against a fused factorization using the raw 9x9/9x4
    Jacobians (the 13-wide augmented structure is rebuilt in VMEM)."""
    P, K, cRh, RiS, cRt = fac
    N = qx.shape[0]
    Bn = qx.shape[-1]
    dtype = qx.dtype
    pad = P.shape[-1] - Bn
    if pad:
        padf = lambda x: jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        Ax, Bx, c, qx, qu, dx0 = map(padf, (Ax, Bx, c, qx, qu, dx0))
    Bp = Bn + pad
    out_shapes = (
        jax.ShapeDtypeStruct((N, NXB, Bp), dtype),   # dxb
        jax.ShapeDtypeStruct((N, NU, Bp), dtype),    # du
        jax.ShapeDtypeStruct((N, NXB, Bp), dtype),   # nu
        jax.ShapeDtypeStruct((NU, Bp), dtype),       # dtheta
    )
    ins = (P, K, cRh, RiS, cRt, Ax, Bx, c, qx, qu, dx0)
    dxb, du, nu, dtheta = pl.pallas_call(
        _lqr_solve_fused_kernel,
        grid=(Bp // LANES,),
        in_specs=[_spec(x.shape) for x in ins],
        out_specs=tuple(_spec(s.shape) for s in out_shapes),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((N, NXB, LANES), dtype),      # p stack
            pltpu.VMEM((N - 1, NU, LANES), dtype),   # k offsets
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(*ins)
    if pad:
        dxb, du, nu, dtheta = (
            dxb[..., :Bn], du[..., :Bn], nu[..., :Bn], dtheta[..., :Bn]
        )
    return dxb, du, nu, dtheta


@functools.partial(jax.jit, static_argnames=("interpret",))
def solve_lqr_lanes(Q, R, S, qx, qu, A, B, c, dx0, *, interpret: bool = False):
    """Lane-major LQR solve via the Pallas factor + backsolve kernels.

    Shapes (trailing batch Bn, padded here to a multiple of 128):
      Q (N,13,13,Bn)  R (N,4,4,Bn)  S (N,4,13,Bn)  qx (N,13,Bn)  qu (N,4,Bn)
      A (N-1,13,13,Bn)  B (N-1,13,4,Bn)  c (N-1,13,Bn)  dx0 (9,Bn)
    Returns (dxb (N,13,Bn), du (N,4,Bn), nu (N,13,Bn), dtheta (4,Bn)).
    """
    fac = lqr_factor_lanes(Q, R, S, A, B, interpret=interpret)
    return lqr_backsolve_lanes(fac, A, B, c, qx, qu, dx0, interpret=interpret)


def _env_flag(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v not in ("0", "false", "False", "")


def pallas_lqr_enabled(dtype, batch: int) -> bool:
    """Route the batched LQR through the Pallas kernel?  TPU + f32 + a batch
    large enough that a 128-lane tile is not mostly padding; overridable via
    FRP_PALLAS_LQR=0/1."""
    default = (
        jax.default_backend() == "tpu"
        and dtype == jnp.float32
        and batch >= LANES
    )
    return _env_flag("FRP_PALLAS_LQR", default)
