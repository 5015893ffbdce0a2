"""Pallas TPU kernel: the whole per-stage tube computation, lane-major.

tools/tube_phase_probe.py measured the XLA tube phase for B=1024 pipelines
(L = 20480 stage-lanes) at ~135 ms even after removing every batched LU:
the cost is ~90 batched 9x9 matmuls (each padded onto the MXU at ~2%
utilization) plus the Jacobian assembly's gather-heavy glue.  This kernel
runs the complete per-stage pipeline for a 128-lane tile in VMEM:

  inputs:  x (9, L) stage state, u (4, L) stage input
  compute: continuous Jacobians (reusing ops/ipm_pallas._cont_jac),
           Phi = Jc + Bc K (nmpc_solver.cpp:696), the three
           disturbance-channel Gramians via the Taylor + doubling scheme
           of tube/lyapunov.py::gramian_channels (matmul-only; exact
           doubling identities), the trace-normalized channel combine
           (nmpc_solver.cpp:601-603), Mp = e^{Phi dt}, and the ego
           ellipsoid Q1 = R ego R^T (nmpc_solver.cpp:503-513)
  outputs: Qd (9,9,L), Mp (9,9,L), Phi (9,9,L), Q1 (3,3,L)

The horizon recursion (Minkowski scan + DB sqrt) stays in XLA — it is
O(N) tiny ops.  Parity vs the XLA path: tests/test_ops.py (interpret) and
the f64 oracle chain in tests/test_tube.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from forces_resilient_planner_tpu.config import ModelConfig, TubeConfig
from forces_resilient_planner_tpu.ops.lqr_pallas import (
    LANES,
    _mm,
    _t,
)
from forces_resilient_planner_tpu.ops.ipm_pallas import _cont_jac, _rot_blocks

NX = 9
# f32 kernel: 7 Taylor terms reach f32 precision at the scaled norm <= 0.5
# (tube/lyapunov.py::taylor_n_terms — measured X rel 6.5e-10 vs the 12-term
# f64 reference); MUST match the XLA fallback's f32 count for kernel parity
N_TERMS = 7
MAX_DOUBLINGS = 4
# tile width.  MEASURED NEGATIVE (round 5): widening to 512 lanes (the
# production grid B=4096 x 19 stages = 608 steps at 128 -> 152 steps)
# made the standalone kernel slightly SLOWER (60.7 vs 55.9 ms min incl.
# dispatch) — the kernel is VPU-compute/VMEM-bandwidth-bound, not
# grid-step-overhead-bound; 128 stays.
TUBE_LANES = 128


def tube_pallas_enabled(dtype, batch: int) -> bool:
    from forces_resilient_planner_tpu.ops.lqr_pallas import _env_flag

    default = (
        jax.default_backend() == "tpu"
        and dtype == jnp.float32
        and batch >= LANES
    )
    return _env_flag("FRP_PALLAS_TUBE", default)


def _tube_kernel(x_ref, u_ref, qd_ref, mp_ref, phi_ref, q1_ref,
                 *, mcfg: ModelConfig, tcfg: TubeConfig):
    dtype = x_ref.dtype
    x = x_ref[...]
    u = u_ref[...]
    L = x.shape[-1]
    t = mcfg.dt

    # Phi = Jc + Bc K (closed_loop_phi; K fixed, nmpc_solver.cpp:28-31).
    # K is built from scalar fulls: Mosaic kernels cannot capture array
    # constants, and the gain is static config.
    Jc, Bc = _cont_jac(x, u, mcfg, dtype)
    Kmat = jnp.concatenate(
        [
            jnp.concatenate(
                [jnp.full((1, 1, L), float(v), dtype) for v in row], axis=1
            )
            for row in tcfg.K
        ],
        axis=0,
    )                                                        # (4, 9, L)
    Phi = Jc + _mm(Bc, Kmat)
    phi_ref[...] = Phi

    # scaling from the 1-norm of Phi*t (gramian_channels)
    Pt = Phi * t
    colsum = jnp.sum(jnp.abs(Pt), axis=0)                    # (9, L)
    norm1 = jnp.max(colsum, axis=0, keepdims=True)           # (1, L)
    s = jnp.ceil(jnp.log2(jnp.maximum(norm1 / 0.5, 1.0)))
    s = jnp.clip(s, 0.0, float(MAX_DOUBLINGS))
    u_scale = jnp.exp2(-s)                                   # (1, L)
    Pu = Pt * u_scale[None]                                  # (9, 9, L)

    eye9 = jnp.broadcast_to(jnp.eye(NX, dtype=dtype)[:, :, None], (NX, NX, L))
    Mm = eye9
    Mp = eye9
    for m in range(N_TERMS, 0, -1):
        inv_m = jnp.asarray(1.0 / m, dtype)
        Mm = eye9 - _mm(Pu, Mm) * inv_m
        Mp = eye9 + _mm(Pu, Mp) * inv_m

    # per-channel series X(u) = u * sum_m H_m/(m+1), H_0 = e_i e_i^T
    Xs = []
    for i in range(3, 6):
        G = jnp.broadcast_to(
            (jnp.eye(NX, dtype=dtype)[:, i][:, None]
             * jnp.eye(NX, dtype=dtype)[i, :][None, :])[:, :, None],
            (NX, NX, L),
        )
        H = G
        X = G
        for m in range(1, N_TERMS + 1):
            PH = _mm(Pu, H)
            H = -(PH + _t(PH)) * jnp.asarray(1.0 / m, dtype)
            X = X + H * jnp.asarray(1.0 / (m + 1), dtype)
        Xs.append(X * (t * u_scale)[None])

    # doublings: X(2u) = X + M X M^T, M(2u) = M^2 (masked per lane)
    for k in range(MAX_DOUBLINGS):
        live = (s > k)[None]                                 # (1, 1, L)
        Mmt = _t(Mm)
        for c in range(3):
            MX = _mm(Mm, Xs[c])
            Xs[c] = jnp.where(live, Xs[c] + _mm(MX, Mmt), Xs[c])
        Mm = jnp.where(live, _mm(Mm, Mm), Mm)
        Mp = jnp.where(live, _mm(Mp, Mp), Mp)
    mp_ref[...] = Mp

    # Nt factor + trace-normalized combine (channel_Qd)
    w2t = [t * float(w) ** 2 for w in (tcfg.ext_noise_bound,) * 3]
    tr_sum = jnp.zeros((1, L), dtype)
    qd_acc = jnp.zeros((NX, NX, L), dtype)
    trs = []
    for c in range(3):
        Xc = Xs[c] * jnp.asarray(w2t[c], dtype)
        Xs[c] = Xc
        tr = Xc[0:1, 0:1]
        for k in range(1, NX):
            tr = tr + Xc[k:k + 1, k:k + 1]
        tr = jnp.sqrt(jnp.maximum(tr[0], 1e-30))             # (1, L)
        trs.append(tr)
        tr_sum = tr_sum + tr
    for c in range(3):
        qd_acc = qd_acc + Xs[c] / trs[c][None]
    qd_ref[...] = tr_sum[None] * qd_acc

    # ego ellipsoid Q1 = R ego R^T (setFORCESParams, nmpc_solver.cpp:503-513)
    R, _, _, _ = _rot_blocks(x[6:9], dtype)
    ego = jnp.concatenate(
        [
            jnp.full((1, 1, L), float(tcfg.ego_r**2), dtype),
            jnp.full((1, 1, L), float(tcfg.ego_r**2), dtype),
            jnp.full((1, 1, L), float(tcfg.ego_h**2), dtype),
        ],
        axis=1,
    )                                                        # (1, 3, L)
    Rego = R * ego
    q1_ref[...] = _mm(Rego, _t(R))


@functools.partial(
    jax.jit, static_argnames=("mcfg", "tcfg", "interpret")
)
def tube_stage_lanes(
    x: jnp.ndarray,            # (L, 9)
    u: jnp.ndarray,            # (L, 4)
    mcfg: ModelConfig,
    tcfg: TubeConfig,
    *,
    interpret: bool = False,
):
    """Kernel wrapper: batch-leading in, batch-leading out.

    Returns (Qd (L,9,9), Mp (L,9,9), Phi (L,9,9), Q1 (L,3,3))."""
    Lb = x.shape[0]
    dtype = x.dtype
    tile = min(TUBE_LANES, max(LANES, Lb))
    tile = LANES * max(1, tile // LANES)     # multiple of the vector width
    pad = (-Lb) % tile
    xt = jnp.moveaxis(x, 0, -1)
    ut = jnp.moveaxis(u, 0, -1)
    if pad:
        xt = jnp.pad(xt, [(0, 0), (0, pad)])
        ut = jnp.pad(ut, [(0, 0), (0, pad)])
    Lp = Lb + pad

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape[:-1] + (tile,),
            lambda i, _nd=nd: (0,) * (_nd - 1) + (i,),
            memory_space=pltpu.VMEM,
        )

    kern = functools.partial(_tube_kernel, mcfg=mcfg, tcfg=tcfg)
    outs = pl.pallas_call(
        kern,
        grid=(Lp // tile,),
        in_specs=[spec((NX, Lp)), spec((4, Lp))],
        out_specs=[
            spec((NX, NX, Lp)),
            spec((NX, NX, Lp)),
            spec((NX, NX, Lp)),
            spec((3, 3, Lp)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NX, NX, Lp), dtype),
            jax.ShapeDtypeStruct((NX, NX, Lp), dtype),
            jax.ShapeDtypeStruct((NX, NX, Lp), dtype),
            jax.ShapeDtypeStruct((3, 3, Lp), dtype),
        ],
        interpret=interpret,
    )(xt, ut)
    Qd, Mp, Phi, Q1 = [jnp.moveaxis(o, -1, 0)[:Lb] for o in outs]
    return Qd, Mp, Phi, Q1
