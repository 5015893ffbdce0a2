"""Pallas TPU kernel: whole-stage safe-flight-corridor decomposition.

After the tube kernel, the corridor phase dominates the batched pipeline
(304 ms of 439 at B=4096, tools/pipeline_scale_probe.py): ~56 masked
fixed-point rounds (ellipsoid shrink x2 + hyperplane peel), each streaming
(B*N, M) obstacle distance arrays through HBM.  This kernel runs ONE
stage's complete decomposition (decomp.py::decompose_segment — bbox
filter, sphere-seeded shrink, supporting-hyperplane peel, bbox walls,
outward-oriented constraint rows) for a 128-scenario tile entirely in
VMEM, with the full obstacle buffer resident across the N-stage inner
grid loop.

Layout: grid (B/128, N), scenario lanes trailing.  The obstacle block's
index map ignores the stage index, so Mosaic keeps it in VMEM across the
inner loop — obstacles are read from HBM once per scenario tile.

Numerical notes vs corridor/decomp.py (same math, different expression):
  - ellipsoid distances use the diagonal form ||diag(1/a) Rf^T (p-d)||
    instead of inv3(C) (identical for C = Rf diag(a) Rf^T);
  - rotation angles are never materialized: cos/sin come from normalized
    vector components (atan2-free);
  - argmin tie-breaks select the lowest index, like _closest_masked.
Parity: tests/test_ops.py (interpret) vs decompose_segment.

Reference anchors: decomp_util/line_segment.h:47-211,
decomp_util/decomp_base.h:33-83, decomp_geometry/polyhedron.h:98-147,
nmpc_solver.cpp:288-332 (2-point seed usage).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from forces_resilient_planner_tpu.config import CorridorConfig
from forces_resilient_planner_tpu.ops.lqr_pallas import (
    LANES,
    _mm,
    _pad_lanes,
    _t,
)

NH = 30
_BIG = 1e30


def corridor_pallas_enabled(dtype, batch: int) -> bool:
    from forces_resilient_planner_tpu.ops.lqr_pallas import _env_flag

    default = (
        jax.default_backend() == "tpu"
        and dtype == jnp.float32
        and batch >= LANES
    )
    return _env_flag("FRP_PALLAS_CORRIDOR", default)


def _norm3(x, y, z):
    return jnp.sqrt(x * x + y * y + z * z)


def _sel_closest(score, iota_m, ox, oy, oz, big):
    """Lowest-index minimizer of (M, L) score; returns its coords (1, L).

    dmin by MIN reduction; the winning row by a one-hot ADD reduction
    (iota and the index MIN run in int32 — Mosaic's iota is integer-only);
    ties resolve to the lowest index, matching _closest_masked's argmin."""
    M = score.shape[0]
    dmin = jnp.min(score, axis=0, keepdims=True)             # (1, L)
    match = score <= dmin                                    # (M, L)
    idx = jnp.min(
        jnp.where(match, iota_m, jnp.int32(M)), axis=0, keepdims=True
    )                                                        # (1, L) int32
    onehot = (iota_m == idx).astype(score.dtype)             # exactly one row
    px = jnp.sum(onehot * ox, axis=0, keepdims=True)
    py = jnp.sum(onehot * oy, axis=0, keepdims=True)
    pz = jnp.sum(onehot * oz, axis=0, keepdims=True)
    return px, py, pz, dmin


def _ell_dist(Rf, a0, a1, a2, dx, dy, dz, ox, oy, oz):
    """||diag(1/a) Rf^T (o - d)|| over the (M, L) obstacle planes."""
    rx = ox - dx
    ry = oy - dy
    rz = oz - dz
    t0 = Rf[0, 0] * rx + Rf[1, 0] * ry + Rf[2, 0] * rz
    t1 = Rf[0, 1] * rx + Rf[1, 1] * ry + Rf[2, 1] * rz
    t2 = Rf[0, 2] * rx + Rf[1, 2] * ry + Rf[2, 2] * rz
    q0 = t0 / a0
    q1 = t1 / a1
    q2 = t2 / a2
    return jnp.sqrt(q0 * q0 + q1 * q1 + q2 * q2)


def _corridor_kernel(p1_ref, p2_ref, obs_ref, mask_ref, A_ref, b_ref,
                     *, ccfg: CorridorConfig):
    dtype = p1_ref.dtype
    M = obs_ref.shape[1]
    L = obs_ref.shape[2]
    eps = ccfg.epsilon

    p1 = p1_ref[...][0]                                      # (3, L)
    p2 = p2_ref[...][0]
    ox = obs_ref[0]                                          # (M, L)
    oy = obs_ref[1]
    oz = obs_ref[2]
    m0 = mask_ref[...]                                       # (M, L) f32
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (M, L), 0)
    big = jnp.asarray(_BIG, dtype)

    p1x, p1y, p1z = p1[0:1], p1[1:2], p1[2:3]                # (1, L)
    p2x, p2y, p2z = p2[0:1], p2[1:2], p2[2:3]

    # ---- segment frame (geometric_utils.h:27-35, atan2-free) -------------
    vx, vy, vz = p2x - p1x, p2y - p1y, p2z - p1z
    nxy = jnp.sqrt(vx * vx + vy * vy)
    nv = _norm3(vx, vy, vz)
    deg_y = nxy < 1e-12
    cy = jnp.where(deg_y, 1.0, vx / jnp.where(deg_y, 1.0, nxy))
    sy = jnp.where(deg_y, 0.0, vy / jnp.where(deg_y, 1.0, nxy))
    deg_p = nv < 1e-12
    cp = jnp.where(deg_p, 1.0, nxy / jnp.where(deg_p, 1.0, nv))
    sp = jnp.where(deg_p, 0.0, -vz / jnp.where(deg_p, 1.0, nv))
    z1 = jnp.zeros((1, L), dtype)

    def mat3(rows):
        return jnp.concatenate(
            [jnp.concatenate(r, axis=0)[None] for r in rows], axis=0
        )

    # Ri = Rz(yaw) @ Ry(pitch)  (roll = 0)
    Ri = mat3([
        [cy * cp, -sy, cy * sp],
        [sy * cp, cy, sy * sp],
        [-sp, z1, cp],
    ])

    dx = 0.5 * (p1x + p2x)
    dy_ = 0.5 * (p1y + p2y)
    dz = 0.5 * (p1z + p2z)

    # ---- local bbox walls (line_segment.h:47-85) -------------------------
    nv_safe = jnp.maximum(nv, 1e-12)
    dvx, dvy, dvz = vx / nv_safe, vy / nv_safe, vz / nv_safe
    hx0, hy0 = dvy, -dvx
    nh_ = jnp.sqrt(hx0 * hx0 + hy0 * hy0)
    deg_h = nh_ < 1e-12
    hx = jnp.where(deg_h, -1.0, hx0 / jnp.where(deg_h, 1.0, nh_))
    hy = jnp.where(deg_h, 0.0, hy0 / jnp.where(deg_h, 1.0, nh_))
    hz = z1
    # dir_v = cross(dirv, dir_h)
    wx = dvy * hz - dvz * hy
    wy = dvz * hx - dvx * hz
    wz = dvx * hy - dvy * hx
    bb0, bb1, bb2 = ccfg.local_bbox
    walls = [
        ((p1x + hx * bb1, p1y + hy * bb1, p1z + hz * bb1), (hx, hy, hz)),
        ((p1x - hx * bb1, p1y - hy * bb1, p1z - hz * bb1), (-hx, -hy, -hz)),
        ((p2x + dvx * bb0, p2y + dvy * bb0, p2z + dvz * bb0), (dvx, dvy, dvz)),
        ((p1x - dvx * bb0, p1y - dvy * bb0, p1z - dvz * bb0), (-dvx, -dvy, -dvz)),
        ((p1x + wx * bb2, p1y + wy * bb2, p1z + wz * bb2), (wx, wy, wz)),
        ((p1x - wx * bb2, p1y - wy * bb2, p1z - wz * bb2), (-wx, -wy, -wz)),
    ]

    # ---- bbox obstacle filter (decomp_base.h:33-38) ----------------------
    inside_f = m0
    for (ptx, pty, ptz), (nx, ny, nz) in walls:
        sd = nx * ox + ny * oy + nz * oz - (nx * ptx + ny * pty + nz * ptz)
        inside_f = inside_f * (sd <= eps).astype(dtype)

    # ---- find_ellipsoid (line_segment.h:134-211, offset=0) ---------------
    f = jnp.maximum(0.5 * nv, 1e-6)
    dist0 = _ell_dist(Ri, f, f, f, dx, dy_, dz, ox, oy, oz)
    inside0 = inside_f * (dist0 <= 1.0).astype(dtype)

    a0, a1 = f, f
    Rf = Ri
    inside = inside0
    for _ in range(ccfg.shrink_iters):
        dists = _ell_dist(Rf, a0, a1, a1, dx, dy_, dz, ox, oy, oz)
        any_in = jnp.max(inside, axis=0, keepdims=True)      # (1, L)
        score = jnp.where(inside > 0.5, dists, big)
        px, py, pz, _ = _sel_closest(score, iota_m, ox, oy, oz, big)
        # re-roll the frame about the segment axis toward the point
        lx = Ri[0, 0] * (px - dx) + Ri[1, 0] * (py - dy_) + Ri[2, 0] * (pz - dz)
        ly = Ri[0, 1] * (px - dx) + Ri[1, 1] * (py - dy_) + Ri[2, 1] * (pz - dz)
        lz = Ri[0, 2] * (px - dx) + Ri[1, 2] * (py - dy_) + Ri[2, 2] * (pz - dz)
        hroll = jnp.sqrt(ly * ly + lz * lz)
        deg_r = hroll < 1e-12
        cr = jnp.where(deg_r, 1.0, ly / jnp.where(deg_r, 1.0, hroll))
        sr = jnp.where(deg_r, 0.0, lz / jnp.where(deg_r, 1.0, hroll))
        Rx = mat3([
            [jnp.ones((1, L), dtype), z1, z1],
            [z1, cr, -sr],
            [z1, sr, cr],
        ])
        Rf_new = _mm(Ri, Rx)
        # point in the re-rolled frame
        rx0 = px - dx
        ry0 = py - dy_
        rz0 = pz - dz
        pr0 = Rf_new[0, 0] * rx0 + Rf_new[1, 0] * ry0 + Rf_new[2, 0] * rz0
        pr1 = Rf_new[0, 1] * rx0 + Rf_new[1, 1] * ry0 + Rf_new[2, 1] * rz0
        denom = 1.0 - (pr0 / a0) ** 2
        b_new = jnp.where(
            (pr0 < a0) & (denom > 1e-12),
            jnp.abs(pr1) / jnp.sqrt(jnp.maximum(denom, 1e-12)),
            a1,
        )
        gate = any_in > 0.5                                  # (1, L)
        Rf = jnp.where(gate[None], Rf_new, Rf)
        a1 = jnp.where(gate, b_new, a1)
        new_d = _ell_dist(Rf, a0, a1, a1, dx, dy_, dz, ox, oy, oz)
        inside_new = inside * (1.0 - new_d > eps).astype(dtype)
        inside = jnp.where(gate, inside_new, inside)

    # phase 2: vertical axis, frame fixed, re-filtered inside set
    a2 = f
    d2 = _ell_dist(Rf, a0, a1, a2, dx, dy_, dz, ox, oy, oz)
    inside = inside_f * (d2 <= 1.0).astype(dtype) * (dist0 <= 1.0).astype(dtype)
    for _ in range(ccfg.shrink_iters):
        dists = _ell_dist(Rf, a0, a1, a2, dx, dy_, dz, ox, oy, oz)
        any_in = jnp.max(inside, axis=0, keepdims=True)
        score = jnp.where(inside > 0.5, dists, big)
        px, py, pz, _ = _sel_closest(score, iota_m, ox, oy, oz, big)
        rx0, ry0, rz0 = px - dx, py - dy_, pz - dz
        pr0 = Rf[0, 0] * rx0 + Rf[1, 0] * ry0 + Rf[2, 0] * rz0
        pr1 = Rf[0, 1] * rx0 + Rf[1, 1] * ry0 + Rf[2, 1] * rz0
        pr2 = Rf[0, 2] * rx0 + Rf[1, 2] * ry0 + Rf[2, 2] * rz0
        dd = 1.0 - (pr0 / a0) ** 2 - (pr1 / a1) ** 2
        c_new = jnp.where(
            dd > eps, jnp.abs(pr2) / jnp.sqrt(jnp.maximum(dd, 1e-12)), a2
        )
        gate = any_in > 0.5
        a2 = jnp.where(gate, c_new, a2)
        new_d = _ell_dist(Rf, a0, a1, a2, dx, dy_, dz, ox, oy, oz)
        inside_new = inside * (1.0 - new_d > eps).astype(dtype)
        inside = jnp.where(gate, inside_new, inside)

    # ---- find_polyhedron peel (decomp_base.h:63-83) ----------------------
    # distances w.r.t. the final ellipsoid are loop-invariant
    dists = _ell_dist(Rf, a0, a1, a2, dx, dy_, dz, ox, oy, oz)
    remain = inside_f
    rows = []
    for _ in range(ccfg.max_obs_planes):
        any_left = jnp.max(remain, axis=0, keepdims=True)    # (1, L)
        score = jnp.where(remain > 0.5, dists, big)
        px, py, pz, _ = _sel_closest(score, iota_m, ox, oy, oz, big)
        # n = Cinv Cinv^T (p - d) = Rf diag(1/a^2) Rf^T (p - d)
        rx0, ry0, rz0 = px - dx, py - dy_, pz - dz
        t0 = (Rf[0, 0] * rx0 + Rf[1, 0] * ry0 + Rf[2, 0] * rz0) / (a0 * a0)
        t1 = (Rf[0, 1] * rx0 + Rf[1, 1] * ry0 + Rf[2, 1] * rz0) / (a1 * a1)
        t2 = (Rf[0, 2] * rx0 + Rf[1, 2] * ry0 + Rf[2, 2] * rz0) / (a2 * a2)
        nx = Rf[0, 0] * t0 + Rf[0, 1] * t1 + Rf[0, 2] * t2
        ny = Rf[1, 0] * t0 + Rf[1, 1] * t1 + Rf[1, 2] * t2
        nz = Rf[2, 0] * t0 + Rf[2, 1] * t1 + Rf[2, 2] * t2
        nn = jnp.maximum(_norm3(nx, ny, nz), 1e-12)
        nx, ny, nz = nx / nn, ny / nn, nz / nn
        sd = nx * (ox - px) + ny * (oy - py) + nz * (oz - pz)
        gate = any_left > 0.5
        remain_new = remain * (sd < 0).astype(dtype)
        remain = jnp.where(gate, remain_new, remain)
        valid = any_left.astype(dtype)
        rows.append((px * valid, py * valid, pz * valid,
                     nx * valid, ny * valid, nz * valid, valid))

    for (ptx, pty, ptz), (nx, ny, nz) in walls:
        one = jnp.ones((1, L), dtype)
        rows.append((ptx, pty, ptz, nx, ny, nz, one))

    # ---- outward-oriented A x <= b rows (polyhedron.h:98-147) ------------
    A_rows = []
    b_rows = []
    for (ptx, pty, ptz, nx, ny, nz, valid) in rows:
        c = ptx * nx + pty * ny + ptz * nz
        flip = (nx * dx + ny * dy_ + nz * dz - c) > 0
        sgn = jnp.where(flip, -1.0, 1.0) * valid
        A_rows.append(
            jnp.concatenate([nx * sgn, ny * sgn, nz * sgn], axis=0)[None]
        )                                                    # (1, 3, L)
        b_rows.append(c * sgn)
    nh_out = A_ref.shape[1]
    for _ in range(nh_out - len(rows)):   # zero-pad to nh (compile-lean caps)
        A_rows.append(jnp.zeros((1, 3, L), dtype))
        b_rows.append(jnp.zeros((1, L), dtype))
    A_ref[...] = jnp.concatenate(A_rows, axis=0)[None]       # (1, nh, 3, L)
    b_ref[...] = jnp.concatenate(b_rows, axis=0)[None]       # (1, nh, L)


@functools.partial(
    jax.jit, static_argnames=("ccfg", "nh", "interpret")
)
def decompose_stages_lanes(
    p1: jnp.ndarray,        # (B, N, 3) stage seed starts
    p2: jnp.ndarray,        # (B, N, 3) stage seed ends
    obs: jnp.ndarray,       # (B, M, 3)
    obs_mask: jnp.ndarray,  # (B, M) bool
    ccfg: CorridorConfig,
    nh: int = NH,
    *,
    interpret: bool = False,
):
    """Kernel wrapper: all-stage decomposition, batch-leading in/out.

    Returns (A (B, N, nh, 3), b (B, N, nh)): max_obs_planes peel rows,
    6 bbox walls, zero padding — decompose_segment's row layout."""
    assert nh >= ccfg.max_obs_planes + 6, (nh, ccfg.max_obs_planes)
    B, N = p1.shape[0], p1.shape[1]
    M = obs.shape[1]
    dtype = p1.dtype
    pad = _pad_lanes(B)
    Bp = B + pad

    def padb(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)) if pad else x

    p1t = jnp.moveaxis(padb(p1), 0, -1)                      # (N, 3, Bp)
    p2t = jnp.moveaxis(padb(p2), 0, -1)
    obst = jnp.moveaxis(padb(obs), 0, -1)                    # (M, 3, Bp)
    obst = jnp.swapaxes(obst, 0, 1)                          # (3, M, Bp)
    maskt = jnp.moveaxis(padb(obs_mask).astype(dtype), 0, -1)  # (M, Bp)

    kern = functools.partial(_corridor_kernel, ccfg=ccfg)
    grid = (Bp // LANES, N)
    A, b = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, LANES), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, LANES), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, M, LANES), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, LANES), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, nh, 3, LANES), lambda i, j: (j, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh, LANES), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, nh, 3, Bp), dtype),
            jax.ShapeDtypeStruct((N, nh, Bp), dtype),
        ],
        interpret=interpret,
    )(p1t, p2t, obst, maskt)
    A = jnp.moveaxis(A, -1, 0)[:B]                           # (B, N, NH, 3)
    b = jnp.moveaxis(b, -1, 0)[:B]
    return A, b
