"""Pallas TPU kernel: one ENTIRE IPM iteration fused per 128-lane tile.

tools/iteration_cost_probe.py + tools/kernel_share_probe.py measured the
iteration budget at B=4096: 2.11 ms total, of which the Riccati
factor+backsolve kernels are only 0.68 ms — the other 1.43 ms is XLA glue
(cost gradient, inequality residuals, KKT error reductions, barrier
update, RHS assembly, step-length reductions, state updates) streaming
(N, 64, B) intermediates through HBM.

This kernel runs the complete monotone-path iteration body of
solver/ipm_lanes.py::_run_lanes for a 128-lane tile in VMEM:

  inputs:  state (Z, lam, s, mu_d, scal=[mu, it, done, err]),
           NLP parameters (weights, refs, corridor, xinit, f_ext, bounds)
           — the dynamics linearization (Ax, Bx, c) is computed IN-KERNEL
           (phase 0 below, scratch Ax/Bx/c); moving it into VMEM removed
           the per-iteration (N-1,9,9,B) Jacobian transposes that
           dominated the XLA glue (2.11 -> 1.05 ms/iteration measured)
  scratch: sigma/r_g/grad_f stacks, the Riccati factorization (P, K,
           packed Cholesky factors), RHS and direction stacks
  outputs: the updated state — nothing else ever touches HBM.

Math is line-for-line the lane-major iteration (same update formulas,
same convergence masks, same barrier schedule, same NaN guards); parity
is tested against _run_lanes in interpret mode (tests/test_ops.py) and
on-chip by the end-to-end f64-oracle certificate
(tools/tpu_parity_check.py).  Mehrotra predictor-corrector is NOT
implemented here (the monotone schedule is the batched default on more
than algorithmic grounds, see SolverConfig.predictor_corrector).

Reference anchors are those of solver/ipm.py (FORCES PDIP_NLP,
mpc_generator_normal.m:51-79).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from forces_resilient_planner_tpu.config import ModelConfig, SolverConfig
from forces_resilient_planner_tpu.ops.lqr_pallas import (
    LANES,
    _abar,
    _bbar,
    _assemble_stage,
    _chol4,
    _chol4_solve,
    _chol4_solve_packed,
    _mm,
    _mv,
    _t,
    _pad_lanes,
    _spec,
)
from forces_resilient_planner_tpu.solver import nlp

NZ, NXB, NU, NH = 17, 13, 4, 30
NIN = 64  # inequality rows per stage: 17 lb + 17 ub + 30 corridor


def pallas_iter_enabled(dtype, batch: int) -> bool:
    """Route the whole IPM iteration through the fused kernel?  Same
    conditions as the LQR kernels (TPU + f32 + >=1 full lane tile);
    overridable via FRP_PALLAS_ITER=0/1."""
    from forces_resilient_planner_tpu.ops.lqr_pallas import _env_flag

    default = (
        jax.default_backend() == "tpu"
        and dtype == jnp.float32
        and batch >= LANES
    )
    return _env_flag("FRP_PALLAS_ITER", default)


def _rowsum(prod):
    """(R, L) -> (1, L) as unrolled adds.  Mosaic rejects ADD reductions
    whose operand layout has nonzero offsets over the reduced dim (which
    strided slices like A_ref[i][:, j] produce); unrolling sidesteps the
    layout rule, same trick as lqr_pallas._mm."""
    acc = prod[0:1]
    for k in range(1, prod.shape[0]):
        acc = acc + prod[k:k + 1]
    return acc


def _corr3(Ai, w30):
    """Corridor J^T contraction: rows j of sum_k Ai[k, j] * w30[k], (3, L).

    Implemented as a single ADD reduction over axis 1 of the TRANSPOSED
    full-block read (zero offsets over the reduced dim — the Mosaic layout
    rule rejects the same reduction over the strided slice Ai[:, j]).
    """
    At = jnp.swapaxes(Ai, 0, 1)                            # (3, 30, L)
    return jnp.sum(At * w30[None], axis=1)


def _rot_blocks(rpy, dtype):
    """R and its three angle derivatives as (3, 3, L) stacks, built from
    ZYX factor products (dynamics/quadrotor.py::_rot_factors, lane-major
    concat construction — Mosaic has no scatter)."""
    L = rpy.shape[-1]
    cr, sr = jnp.cos(rpy[0:1]), jnp.sin(rpy[0:1])          # (1, L)
    cp, sp = jnp.cos(rpy[1:2]), jnp.sin(rpy[1:2])
    cy, sy = jnp.cos(rpy[2:3]), jnp.sin(rpy[2:3])
    z = jnp.zeros((1, L), dtype)
    o = jnp.ones((1, L), dtype)

    def m(rows):
        return jnp.concatenate(
            [jnp.concatenate(r, axis=0)[None] for r in rows], axis=0
        )                                                  # (3, 3, L)

    Rx = m([[o, z, z], [z, cr, -sr], [z, sr, cr]])
    dRx = m([[z, z, z], [z, -sr, -cr], [z, cr, -sr]])
    Ry = m([[cp, z, sp], [z, o, z], [-sp, z, cp]])
    dRy = m([[-sp, z, cp], [z, z, z], [-cp, z, -sp]])
    Rz = m([[cy, -sy, z], [sy, cy, z], [z, z, o]])
    dRz = m([[-sy, -cy, z], [cy, -sy, z], [z, z, z]])
    RyRx = _mm(Ry, Rx)
    R = _mm(Rz, RyRx)
    dR_r = _mm(Rz, _mm(Ry, dRx))
    dR_p = _mm(Rz, _mm(dRy, Rx))
    dR_y = _mm(dRz, RyRx)
    return R, dR_r, dR_p, dR_y


def _xdot(x, u, f_ext, R, mcfg, dtype):
    """Continuous dynamics, lane-major (9, L) (nonlinear_dynamics.m:20-40)."""
    L = x.shape[-1]
    vel = x[3:6]
    thrust_m = u[3:4] / mcfg.mass                          # (1, L)
    z_b = R[:, 2]                                          # (3, L)
    dc = jnp.asarray(mcfg.drag_coeff, dtype)
    # v_body = R^T v; drag_acc = R @ diag(d) v_body with d = (dc, dc, 0)
    vb0 = _rowsum(R[:, 0] * vel)                           # (1, L)
    vb1 = _rowsum(R[:, 1] * vel)
    dv = jnp.concatenate([dc * vb0, dc * vb1, jnp.zeros((1, L), dtype)], 0)
    drag = _mv(R, dv)                                      # (3, L)
    g_e3 = jnp.concatenate(
        [jnp.zeros((2, L), dtype), jnp.full((1, L), mcfg.g, dtype)], axis=0
    )
    acc = z_b * thrust_m + f_ext - g_e3 - drag
    return jnp.concatenate([vel, acc, u[0:3]], axis=0)


def _cont_jac(x, u, mcfg, dtype):
    """Continuous Jacobians (Jc (9,9,L), Bc (9,4,L)), lane-major
    (dynamics/quadrotor.py::continuous_jacobians_analytic)."""
    L = x.shape[-1]
    vel = x[3:6]
    R, dR_r, dR_p, dR_y = _rot_blocks(x[6:9], dtype)
    dc = jnp.asarray(mcfg.drag_coeff, dtype)
    Dv = jnp.concatenate(
        [jnp.full((1, 1, L), mcfg.drag_coeff, dtype)] * 2
        + [jnp.zeros((1, 1, L), dtype)],
        axis=0,
    )                                                      # (3, 1, L)
    RD = R * jnp.swapaxes(Dv, 0, 1)                        # R @ diag(D)
    RDRt = _mm(RD, _t(R))
    Tm = u[3:4] / mcfg.mass                                # (1, L)

    cols = []
    for dR in (dR_r, dR_p, dR_y):
        dRD = dR * jnp.swapaxes(Dv, 0, 1)
        dRDRt = _mm(dRD, _t(R)) + _mm(RD, _t(dR))
        col = dR[:, 2] * Tm - _mv(dRDRt, vel)              # (3, L)
        cols.append(col[:, None])
    dv_drpy = jnp.concatenate(cols, axis=1)                # (3, 3, L)
    dv_dv = -RDRt

    z33 = jnp.zeros((3, 3, L), dtype)
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype)[:, :, None], (3, 3, L))
    Jc = jnp.concatenate(
        [
            jnp.concatenate([z33, eye3, z33], axis=1),
            jnp.concatenate([z33, dv_dv, dv_drpy], axis=1),
            jnp.concatenate([z33, z33, z33], axis=1),
        ],
        axis=0,
    )                                                      # (9, 9, L)
    z31 = jnp.zeros((3, 1, L), dtype)
    Bc = jnp.concatenate(
        [
            jnp.concatenate([z33, z31], axis=1),
            jnp.concatenate([z33, (R[:, 2] / mcfg.mass)[:, None]], axis=1),
            jnp.concatenate([eye3, z31], axis=1),
        ],
        axis=0,
    )                                                      # (9, 4, L)
    return Jc, Bc


def _dyn_stage(x, u, f_ext, x_next, theta_next, mcfg, dtype):
    """One stage's equality residual c (13, L) and RK2 Jacobians
    Ax (9,9,L), Bx (9,4,L) — in-kernel version of ipm_lanes._dyn_pieces
    (Heun step, chain-rule Jacobians, dynamics/quadrotor.py:182-201)."""
    dt = mcfg.dt
    R1, _, _, _ = _rot_blocks(x[6:9], dtype)
    k1 = _xdot(x, u, f_ext, R1, mcfg, dtype)
    x_mid = x + dt * k1
    Rm, _, _, _ = _rot_blocks(x_mid[6:9], dtype)
    k2 = _xdot(x_mid, u, f_ext, Rm, mcfg, dtype)
    xn = x + 0.5 * dt * (k1 + k2)
    c = jnp.concatenate([xn - x_next, u - theta_next], axis=0)

    J1, B1 = _cont_jac(x, u, mcfg, dtype)
    J2, B2 = _cont_jac(x_mid, u, mcfg, dtype)
    L = x.shape[-1]
    eye9 = jnp.broadcast_to(jnp.eye(9, dtype=dtype)[:, :, None], (9, 9, L))
    Ax = eye9 + 0.5 * dt * (J1 + J2 + dt * _mm(J2, J1))
    Bx = 0.5 * dt * (B1 + B2 + dt * _mm(J2, B1))
    return c, Ax, Bx


def _iter_kernel(
    # ---- inputs (VMEM refs, trailing LANES) ----
    Z_ref, lam_ref, s_ref, mud_ref, scal_ref,
    wwp_ref, win_ref, wrt_ref, wvl_ref, wup_ref,
    refp_ref, refy_ref, A_ref, b_ref,
    fext_ref, xinit_ref, bnd_ref, cst_ref,
    # ---- outputs ----
    Zn_ref, lamn_ref, sn_ref, mudn_ref, scaln_ref,
    # ---- scratch ----
    sig_scr, rg_scr, gf_scr, qx_scr, qu_scr,
    P_scr, K_scr, cRh_scr, RiS_scr, cRt_scr, p_scr, k_scr,
    dZ_scr, ds_scr, dmu_scr, nu_scr,
    Ax_ref, Bx_ref, c_ref,
    *,
    mcfg: ModelConfig, scfg: SolverConfig,
):
    N = Z_ref.shape[0]
    dtype = Z_ref.dtype
    L = Z_ref.shape[-1]
    lb = bnd_ref[0]                                        # (17, L)
    ub = bnd_ref[1]
    hu = jnp.asarray(scfg.corridor_slack, dtype)
    tol = jnp.asarray(
        max(scfg.tol_stat, scfg.tol_eq, scfg.tol_ineq, scfg.tol_comp), dtype
    )
    rmax2 = mcfg.max_rate ** 2
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    tol_ref = jnp.asarray(1e-4, dtype)
    tau = jnp.asarray(scfg.frac_to_boundary, dtype)
    reg = cst_ref[0]                                       # (L,) broadcast
    max_iters_f = cst_ref[1:2]                             # (1, L)

    # All per-lane quantities are kept 2-D (1, L) and masks are kept as
    # f32 {0, 1} until the final jnp.where: Mosaic does not lower 1-D i1
    # vectors ("Unsupported target bitwidth for truncation").
    mu = scal_ref[0:1]                                     # (1, L)
    it = scal_ref[1:2]
    done_in_f = scal_ref[2:3]
    err_in = scal_ref[3:4]
    one = jnp.ones((1, L), dtype)
    zero = jnp.zeros((1, L), dtype)
    f1 = jnp.asarray(1.0, dtype)
    f0 = jnp.asarray(0.0, dtype)
    active_f = (one - done_in_f) * jnp.where(it < max_iters_f, f1, f0)

    neg_inf = jnp.asarray(-jnp.inf, dtype)

    # ---- phase 0: dynamics linearization, in-kernel (scratch refs) -------
    # residuals + RK2 Jacobians never touch HBM; the XLA path's per-
    # iteration moveaxis transposes of the (N-1, 9, 9, B) stacks vanish
    f_ext = fext_ref[:]                                    # (3, L)
    for i in range(N - 1):
        Zi = Z_ref[i]
        Znx = Z_ref[i + 1]
        ci, Axi, Bxi = _dyn_stage(
            Zi[8:17], Zi[0:4], f_ext, Znx[8:17], Znx[4:8], mcfg, dtype
        )
        c_ref[i] = ci
        Ax_ref[i] = Axi
        Bx_ref[i] = Bxi

    # ---- phase 1: per-stage grad/residuals/sigma + error accumulators ----
    ineq_max = jnp.full((1, L), neg_inf, dtype)
    comp_max = jnp.full((1, L), neg_inf, dtype)
    comp0_max = jnp.full((1, L), neg_inf, dtype)
    habs_max = jnp.full((1, L), neg_inf, dtype)
    lam_abs_sum = zero
    mud_abs_sum = zero
    lam_abs_max = jnp.full((1, L), neg_inf, dtype)
    mud_abs_max = jnp.full((1, L), neg_inf, dtype)
    eq_max = jnp.full((1, L), neg_inf, dtype)

    for i in range(N):
        Zi = Z_ref[i]                                      # (17, L)
        u, up = Zi[0:4], Zi[4:8]
        pos, vel = Zi[8:11], Zi[11:14]
        yaw = Zi[16]
        wwp = wwp_ref[i][None]                             # (1, L)
        wrt = wrt_ref[i][None]
        wvl = wvl_ref[i][None]
        wupf = wup_ref[i][None]
        winf = win_ref[i][None]

        # cost gradient (ipm_lanes._cost_gradient, stagewise)
        g_u = 2.0 * wrt * (u - up)
        g_u = jnp.concatenate(
            [g_u[0:3] + 2.0 * (winf / rmax2) * u[0:3], g_u[3:4]], axis=0
        )
        g_up = 2.0 * wrt * (up - u)
        g_up = jnp.concatenate(
            [g_up[0:3] + 2.0 * wupf * up[0:3], g_up[3:4]], axis=0
        )
        g_pos = 2.0 * wwp * (pos - refp_ref[i])
        g_vel = 2.0 * wvl * vel
        g_rpy = jnp.concatenate(
            [
                jnp.zeros((2, L), dtype),
                (24.0 * wwp_ref[i] * (yaw - refy_ref[i]))[None],
            ],
            axis=0,
        )
        gf_i = jnp.concatenate([g_u, g_up, g_pos, g_vel, g_rpy], axis=0)
        gf_scr[i] = gf_i

        # |H||z| row maxima (f32 stationarity floor, _habs_z_max)
        au, aup = jnp.abs(u), jnp.abs(up)
        r_u = 2.0 * wrt * (au + aup)
        r_u = jnp.concatenate(
            [r_u[0:3] + 2.0 * (winf / rmax2) * au[0:3], r_u[3:4]], axis=0
        )
        r_up = 2.0 * wrt * (aup + au)
        r_up = jnp.concatenate(
            [r_up[0:3] + 2.0 * wupf * aup[0:3], r_up[3:4]], axis=0
        )
        rows = jnp.concatenate(
            [
                r_u, r_up, 2.0 * wwp * jnp.abs(pos),
                2.0 * jnp.abs(wvl) * jnp.abs(vel),
                (24.0 * wwp_ref[i] * jnp.abs(yaw))[None],
            ],
            axis=0,
        )
        habs_max = jnp.maximum(habs_max, jnp.max(rows, axis=0, keepdims=True))

        # inequality residuals g = [lb - z, z - ub, A p - b - hu]
        Ai = A_ref[i]                                      # (30, 3, L)
        Ap = (
            Ai[:, 0] * pos[0:1] + Ai[:, 1] * pos[1:2] + Ai[:, 2] * pos[2:3]
        )                                                  # (30, L)
        gi = jnp.concatenate(
            [lb - Zi, Zi - ub, Ap - b_ref[i] - hu], axis=0
        )                                                  # (64, L)
        si = s_ref[i]
        mdi = mud_ref[i]
        rg_i = gi + si
        rg_scr[i] = rg_i
        sig_scr[i] = mdi / si

        ineq_max = jnp.maximum(
            ineq_max, jnp.max(jnp.abs(rg_i), axis=0, keepdims=True)
        )
        smd = si * mdi
        comp_max = jnp.maximum(
            comp_max, jnp.max(jnp.abs(smd - mu), axis=0, keepdims=True)
        )
        comp0_max = jnp.maximum(
            comp0_max, jnp.max(jnp.abs(smd), axis=0, keepdims=True)
        )
        mud_abs_sum = mud_abs_sum + jnp.sum(
            jnp.abs(mdi), axis=0, keepdims=True
        )
        mud_abs_max = jnp.maximum(
            mud_abs_max, jnp.max(jnp.abs(mdi), axis=0, keepdims=True)
        )
        li = lam_ref[i]
        lam_abs_sum = lam_abs_sum + jnp.sum(
            jnp.abs(li), axis=0, keepdims=True
        )
        lam_abs_max = jnp.maximum(
            lam_abs_max, jnp.max(jnp.abs(li), axis=0, keepdims=True)
        )
        if i < N - 1:
            eq_max = jnp.maximum(
                eq_max, jnp.max(jnp.abs(c_ref[i]), axis=0, keepdims=True)
            )

    r_init = Z_ref[0][8:17] - xinit_ref[:]                 # (9, L)
    eq_max = jnp.maximum(
        eq_max, jnp.max(jnp.abs(r_init), axis=0, keepdims=True)
    )

    # ---- phase 2: stationarity (grad_f + J_eq^T lam + J_g^T mu_d) ----
    stat_max = jnp.full((1, L), neg_inf, dtype)
    for i in range(N):
        r = gf_scr[i]
        mdi = mud_ref[i]
        r = r - mdi[0:17] + mdi[17:34]
        Ai = A_ref[i]
        mc = mdi[34:64]                                    # (30, L)
        corr = _corr3(Ai, mc)
        r = jnp.concatenate(
            [r[0:8], r[8:11] + corr, r[11:17]], axis=0
        )
        # equality-gradient contributions (ipm_lanes._eq_grad)
        if i < N - 1:
            lx = lam_ref[i + 1][0:9]                       # (9, L)
            lu = lam_ref[i + 1][9:13]
            BtL = _mv(_t(Bx_ref[i]), lx)                   # (4, L)
            AtL = _mv(_t(Ax_ref[i]), lx)                   # (9, L)
            r = jnp.concatenate(
                [r[0:4] + BtL + lu, r[4:8], r[8:17] + AtL], axis=0
            )
        if i > 0:
            li = lam_ref[i]
            r = jnp.concatenate(
                [r[0:4], r[4:8] - li[9:13], r[8:17] - li[0:9]], axis=0
            )
        else:
            r = jnp.concatenate(
                [r[0:8], r[8:17] + lam_ref[0][0:9]], axis=0
            )
        stat_max = jnp.maximum(
            stat_max, jnp.max(jnp.abs(r), axis=0, keepdims=True)
        )

    # ---- phase 3: scaled errors, convergence, barrier update ----
    m_eq = N * NXB
    m_in = N * NIN
    s_max = 100.0
    m_all = (lam_abs_sum + mud_abs_sum) / (m_eq + m_in)
    s_d = jnp.maximum(s_max, m_all) / s_max
    s_c = jnp.maximum(s_max, mud_abs_sum / m_in) / s_max
    mag = habs_max + lam_abs_max + mud_abs_max
    stat_scale = jnp.maximum(1.0, 4.0 * eps * mag / tol_ref)
    stat = stat_max / (s_d * stat_scale)
    comp = comp_max / s_c
    comp0 = comp0_max / s_c
    err0 = jnp.maximum(jnp.maximum(stat, eq_max), jnp.maximum(ineq_max, comp0))
    lane_done_f = jnp.where(err0 <= tol, f1, f0)           # (1, L)

    if scfg.mu_gate:
        err_mu = jnp.maximum(
            jnp.maximum(stat, eq_max), jnp.maximum(ineq_max, comp)
        )
        shrink_f = jnp.where(err_mu <= scfg.mu_gate_factor * mu, f1, f0)
    else:
        shrink_f = one
    # mu ** 1.5 as mu * sqrt(mu): general pow lowers through exp/log in
    # Mosaic; the sqrt form is exact for the default superlinear exponent
    if scfg.mu_superlin == 1.5:
        mu_pow = mu * jnp.sqrt(mu)
    else:
        mu_pow = jnp.exp(scfg.mu_superlin * jnp.log(mu))
    mu_n = jnp.where(
        shrink_f * (one - lane_done_f) > 0.5,
        jnp.maximum(
            tol / 20.0,
            jnp.minimum(scfg.kappa_mu * mu, mu_pow),
        ),
        mu,
    )

    # ---- phase 4: RHS q = grad_f + J_g^T (mu_n/s + sigma*r_g) ----
    for i in range(N):
        w_vec = mu_n / s_ref[i] + sig_scr[i] * rg_scr[i]   # (64, L)
        q = gf_scr[i] - w_vec[0:17] + w_vec[17:34]
        Ai = A_ref[i]
        wc = w_vec[34:64]
        corr = _corr3(Ai, wc)
        q = jnp.concatenate([q[0:8], q[8:11] + corr, q[11:17]], axis=0)
        # Riccati partition: qx = [x(9), u_prev(4)], qu = u(4)
        qx_scr[i] = jnp.concatenate([q[8:17], q[4:8]], axis=0)
        qu_scr[i] = q[0:4]

    # ---- phase 5: factor (in-VMEM assembly, as _lqr_factor_fused_kernel) --
    wargs = (wwp_ref, win_ref, wrt_ref, wvl_ref, wup_ref)
    Q_t, R_t, S_t = _assemble_stage(
        N - 1, *wargs, sig_scr, A_ref, reg, rmax2
    )
    f_term = _chol4(R_t)
    RiS = _chol4_solve(f_term, S_t)
    cRt_scr[:] = jnp.stack(f_term, axis=0)
    RiS_scr[:] = RiS
    P = Q_t - _mm(_t(S_t), RiS)
    P_scr[N - 1] = P
    for i in range(N - 2, -1, -1):
        Abar = _abar(Ax_ref[i])
        Bbar = _bbar(Bx_ref[i])
        Qi, Ri, Si = _assemble_stage(i, *wargs, sig_scr, A_ref, reg, rmax2)
        AtP = _mm(_t(Abar), P)
        BtP = _mm(_t(Bbar), P)
        Qh = Qi + _mm(AtP, Abar)
        Rh = Ri + _mm(BtP, Bbar)
        Sh = Si + _mm(BtP, Abar)
        fh = _chol4(Rh)
        Kg = -_chol4_solve(fh, Sh)
        K_scr[i] = Kg
        cRh_scr[i] = jnp.stack(fh, axis=0)
        Pn = Qh + _mm(_t(Sh), Kg)
        P = 0.5 * (Pn + _t(Pn))
        P_scr[i] = P

    # ---- phase 6: backsolve (as _lqr_solve_fused_kernel) -----------------
    RiS = RiS_scr[:]
    quN = qu_scr[N - 1]
    Riqu = _chol4_solve_packed(cRt_scr[:], quN[:, None])[:, 0]
    p0 = qx_scr[N - 1] - _mv(_t(RiS), quN)
    p_scr[N - 1] = p0
    for i in range(N - 2, -1, -1):
        Pc = p0 + _mv(P_scr[i + 1], c_ref[i])
        qxh = qx_scr[i] + _mv(_t(_abar(Ax_ref[i])), Pc)
        quh = qu_scr[i] + _mv(_t(_bbar(Bx_ref[i])), Pc)
        kv = -_chol4_solve_packed(cRh_scr[i], quh[:, None])[:, 0]
        k_scr[i] = kv
        p0 = qxh + _mv(_t(K_scr[i]), quh)
        p_scr[i] = p0

    P0 = P_scr[0]
    dx0 = xinit_ref[:] - Z_ref[0][8:17]
    rhs = -(p0[9:] + _mv(_t(P0[:9, 9:]), dx0))
    dtheta = _chol4_solve(_chol4(P0[9:, 9:]), rhs[:, None])[:, 0]
    dxb = jnp.concatenate([dx0, dtheta], axis=0)           # (13, L)

    # forward rollout + per-stage direction pieces dZ/ds/dmu + step ratios
    ap_min = jnp.ones((1, L), dtype)
    ad_min = jnp.ones((1, L), dtype)
    dir_finite_f = jnp.ones((1, L), dtype)

    for i in range(N):
        if i < N - 1:
            du = _mv(K_scr[i], dxb) + k_scr[i]
        else:
            du = -(Riqu + _mv(RiS, dxb))
        nu_i = _mv(P_scr[i], dxb) + p_scr[i]
        nu_scr[i] = nu_i
        dZ_i = jnp.concatenate([du, dxb[9:13], dxb[0:9]], axis=0)
        dZ_scr[i] = dZ_i
        dpos = dZ_i[8:11]
        Ai = A_ref[i]
        Adp = (
            Ai[:, 0] * dpos[0:1] + Ai[:, 1] * dpos[1:2] + Ai[:, 2] * dpos[2:3]
        )
        Jdz = jnp.concatenate([-dZ_i, dZ_i, Adp], axis=0)  # (64, L)
        ds_i = -rg_scr[i] - Jdz
        ds_scr[i] = ds_i
        dmu_i = mu_n / s_ref[i] - sig_scr[i] * ds_i - mud_ref[i]
        dmu_scr[i] = dmu_i

        si = s_ref[i]
        mdi = mud_ref[i]
        ratio_p = jnp.where(
            ds_i < 0, -tau * si / jnp.minimum(ds_i, -1e-30), jnp.inf
        )
        ap_min = jnp.minimum(
            ap_min, jnp.min(ratio_p, axis=0, keepdims=True)
        )
        ratio_d = jnp.where(
            dmu_i < 0, -tau * mdi / jnp.minimum(dmu_i, -1e-30), jnp.inf
        )
        ad_min = jnp.minimum(
            ad_min, jnp.min(ratio_d, axis=0, keepdims=True)
        )
        # finiteness as float mins (Mosaic: no 1-D i1 / boolean reductions)
        dir_finite_f = jnp.minimum(
            dir_finite_f,
            jnp.min(
                jnp.where(jnp.isfinite(dZ_i), f1, f0),
                axis=0, keepdims=True,
            ),
        )
        dir_finite_f = jnp.minimum(
            dir_finite_f,
            jnp.min(
                jnp.where(jnp.isfinite(ds_i), f1, f0),
                axis=0, keepdims=True,
            ),
        )
        if i < N - 1:
            dxb = (
                _mv(_abar(Ax_ref[i]), dxb) + _mv(_bbar(Bx_ref[i]), du)
                + c_ref[i]
            )

    fin_err_f = jnp.where(jnp.isfinite(err0), f1, f0)
    bad_f = one - fin_err_f * dir_finite_f                 # (1, L)
    keep_f = jnp.maximum(lane_done_f, bad_f)
    upd = active_f * (one - keep_f) > 0.5                  # (1, L) mask

    # ---- phase 7: state update ------------------------------------------
    for i in range(N):
        Zi = Z_ref[i]
        si = s_ref[i]
        mdi = mud_ref[i]
        li = lam_ref[i]
        nu_i = nu_scr[i]
        if i == 0:
            lam_plus = jnp.concatenate(
                [-nu_i[0:9], jnp.zeros((4, L), dtype)], axis=0
            )
        else:
            lam_plus = nu_i
        Zn_ref[i] = jnp.where(upd, Zi + ap_min * dZ_scr[i], Zi)
        sn_ref[i] = jnp.where(upd, si + ap_min * ds_scr[i], si)
        mudn_ref[i] = jnp.where(upd, mdi + ad_min * dmu_scr[i], mdi)
        lamn_ref[i] = jnp.where(upd, li + ad_min * (lam_plus - li), li)

    act = active_f > 0.5
    err_cand = jnp.where(
        bad_f * (one - lane_done_f) > 0.5, jnp.asarray(jnp.inf, dtype), err0
    )
    mu_out = jnp.where(act, mu_n, mu)
    it_out = it + active_f
    done_out_f = jnp.where(act, jnp.maximum(lane_done_f, bad_f), done_in_f)
    err_out = jnp.where(act, err_cand, err_in)
    scaln_ref[:] = jnp.concatenate(
        [mu_out, it_out, done_out_f, err_out], axis=0
    )


@functools.partial(
    jax.jit, static_argnames=("mcfg", "scfg", "interpret")
)
def ipm_iteration_fused(
    Z, lam, s, mu_d, scal,          # lane-major state; scal (4, B)
    weights: nlp.StageWeights,      # (N, B) tables
    ref_pos, ref_yaw,               # (N, 3, B), (N, B)
    Acor, bcor,                     # (N, 30, B)-family corridor
    f_ext,                          # (3, B) — dynamics run IN-kernel
    xinit,                          # (9, B)
    max_iters_lane,                 # (B,) f32 per-lane iteration cap
    mcfg: ModelConfig, scfg: SolverConfig,
    *, interpret: bool = False,
):
    """One fused IPM iteration; returns (Z', lam', s', mu_d', scal')."""
    N = Z.shape[0]
    Bn = Z.shape[-1]
    dtype = Z.dtype
    pad = _pad_lanes(Bn)

    lb, ub = nlp.variable_bounds(mcfg, dtype)
    bnd = jnp.stack(
        [
            jnp.broadcast_to(lb[:, None], (NZ, Bn)),
            jnp.broadcast_to(ub[:, None], (NZ, Bn)),
        ],
        axis=0,
    )
    cst = jnp.stack(
        [
            jnp.full((Bn,), scfg.reg, dtype),
            max_iters_lane.astype(dtype),
        ],
        axis=0,
    )

    ins = [
        Z, lam, s, mu_d, scal,
        weights.w_wp, weights.w_input, weights.w_rate, weights.w_vel,
        weights.w_uprev0,
        ref_pos, ref_yaw, Acor, bcor, f_ext, xinit, bnd, cst,
    ]
    if pad:
        def padf(x):
            return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])

        # padded lanes: mark done (scal[2]=1) and keep s/mu_d at 1 so no
        # division blows up; unit weights keep the factor SPD
        lane_pad = (jnp.arange(Bn + pad) >= Bn).astype(dtype)
        ins = [padf(x) for x in ins]
        Zp, lamp, sp, mudp, scalp = ins[0:5]
        sp = sp + lane_pad
        mudp = mudp + lane_pad
        scalp = scalp.at[2].add(lane_pad)
        ws = [w + lane_pad for w in ins[5:10]]
        ins = [Zp, lamp, sp, mudp, scalp] + ws + ins[10:]
    Bp = Bn + pad

    out_shapes = (
        jax.ShapeDtypeStruct((N, NZ, Bp), dtype),
        jax.ShapeDtypeStruct((N, NXB, Bp), dtype),
        jax.ShapeDtypeStruct((N, NIN, Bp), dtype),
        jax.ShapeDtypeStruct((N, NIN, Bp), dtype),
        jax.ShapeDtypeStruct((4, Bp), dtype),
    )
    scratch = [
        pltpu.VMEM((N, NIN, LANES), dtype),      # sigma
        pltpu.VMEM((N, NIN, LANES), dtype),      # r_g
        pltpu.VMEM((N, NZ, LANES), dtype),       # grad_f
        pltpu.VMEM((N, NXB, LANES), dtype),      # qx
        pltpu.VMEM((N, NU, LANES), dtype),       # qu
        pltpu.VMEM((N, NXB, NXB, LANES), dtype),  # P
        pltpu.VMEM((N - 1, NU, NXB, LANES), dtype),  # K
        pltpu.VMEM((N - 1, 10, LANES), dtype),   # cRh
        pltpu.VMEM((NU, NXB, LANES), dtype),     # RiS
        pltpu.VMEM((10, LANES), dtype),          # cRt
        pltpu.VMEM((N, NXB, LANES), dtype),      # p
        pltpu.VMEM((N - 1, NU, LANES), dtype),   # k
        pltpu.VMEM((N, NZ, LANES), dtype),       # dZ
        pltpu.VMEM((N, NIN, LANES), dtype),      # ds
        pltpu.VMEM((N, NIN, LANES), dtype),      # dmu
        pltpu.VMEM((N, NXB, LANES), dtype),      # nu
        pltpu.VMEM((N - 1, 9, 9, LANES), dtype),  # Ax (in-kernel dynamics)
        pltpu.VMEM((N - 1, 9, NU, LANES), dtype),  # Bx
        pltpu.VMEM((N - 1, NXB, LANES), dtype),  # c
    ]
    kern = functools.partial(_iter_kernel, mcfg=mcfg, scfg=scfg)
    outs = pl.pallas_call(
        kern,
        grid=(Bp // LANES,),
        in_specs=[_spec(x.shape) for x in ins],
        out_specs=tuple(_spec(s_.shape) for s_ in out_shapes),
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*ins)
    if pad:
        outs = tuple(o[..., :Bn] for o in outs)
    return outs
