"""Additional corridor decomposition variants.

Completes the DecompROS surface: the reference vendors seed-point
decomposition (decomp_util/seed_decomp.h) and iterative path-simplifying
decomposition (decomp_util/iterative_decomp.h) alongside the line-segment
decomposition the planner uses.  Both re-expressed as fixed-shape masked
array programs over the same primitives as corridor/decomp.py.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from forces_resilient_planner_tpu.config import CorridorConfig
from forces_resilient_planner_tpu.corridor.decomp import (
    CorridorResult,
    Ellipsoid,
    PlaneSet,
    decompose_segment,
    find_polyhedron,
    planes_to_constraints,
)

_PREC = jax.lax.Precision.HIGHEST


def seed_decompose(
    p: jnp.ndarray,
    radius: float,
    obs: jnp.ndarray,
    obs_mask: jnp.ndarray,
    cfg: CorridorConfig,
    nh: int = 30,
) -> CorridorResult:
    """Seed-point decomposition (seed_decomp.h:29-33): dilate a sphere of
    the given radius around p, peel supporting hyperplanes, add the
    axis-aligned local bbox walls (seed_decomp.h:43-68)."""
    dtype = p.dtype
    bbox = jnp.asarray(cfg.local_bbox, dtype)
    # axis-aligned bbox prefilter (set_obs with the axis-aligned walls)
    lo = p - bbox
    hi = p + bbox
    mask = obs_mask & jnp.all((obs >= lo - cfg.epsilon) & (obs <= hi + cfg.epsilon), axis=-1)
    E = Ellipsoid(C=radius * jnp.eye(3, dtype=dtype), d=p)
    obs_planes = find_polyhedron(E, obs, mask, cfg.max_obs_planes)
    eye = jnp.eye(3, dtype=dtype)
    wall_pts = jnp.stack(
        [p + eye[1] * bbox[1], p - eye[1] * bbox[1],
         p + eye[0] * bbox[0], p - eye[0] * bbox[0],
         p + eye[2] * bbox[2], p - eye[2] * bbox[2]]
    )
    wall_ns = jnp.stack([eye[1], -eye[1], eye[0], -eye[0], eye[2], -eye[2]])
    planes = PlaneSet(
        points=jnp.concatenate([obs_planes.points, wall_pts]),
        normals=jnp.concatenate([obs_planes.normals, wall_ns]),
        valid=jnp.concatenate([obs_planes.valid, jnp.ones(6, bool)]),
    )
    A, b = planes_to_constraints(planes, p, nh)
    return CorridorResult(A=A, b=b, ellipsoid_C=E.C, ellipsoid_d=E.d)


class IterativeResult(NamedTuple):
    A: jnp.ndarray          # (S, nh, 3) per final segment
    b: jnp.ndarray          # (S, nh)
    path: jnp.ndarray       # (S+1, 3) simplified path (padded)
    n_segments: jnp.ndarray


def _simplify_mask(path: np.ndarray, A: np.ndarray, b: np.ndarray) -> np.ndarray:
    """simplify() (iterative_decomp.h:74-93): drop waypoint i-1 when the
    current reference point is inside polyhedron i-1 with >0.1 clearance."""
    n = len(path)
    keep = np.zeros(n, bool)
    keep[0] = keep[-1] = True
    ref = path[0]
    for i in range(2, n):
        Ai, bi = A[i - 1], b[i - 1]
        rows = np.linalg.norm(Ai, axis=-1) > 1e-9
        margin = bi[rows] - Ai[rows] @ ref
        if not (np.all(margin >= -1e-10) and margin.min() > 0.1):
            ref = path[i - 1]
            keep[i - 1] = True
    return keep


def iterative_decompose(
    path: np.ndarray,
    obs: jnp.ndarray,
    obs_mask: jnp.ndarray,
    cfg: CorridorConfig,
    iter_num: int = 5,
    downsample_res: float = 0.0,
    nh: int = 30,
):
    """Iterative decomposition (iterative_decomp.h:36-52): decompose, drop
    redundant waypoints whose segment polytopes already cover them, repeat.

    The outer waypoint-simplification loop is host-side (it changes segment
    counts); each round's segment decompositions run batched on device.
    Returns IterativeResult with numpy outputs.
    """
    path = np.asarray(path, float)
    if downsample_res > 0 and len(path) >= 2:
        out = []
        for i in range(1, len(path)):
            d = np.linalg.norm(path[i] - path[i - 1])
            cnt = max(int(np.ceil(d / downsample_res)), 1)
            for j in range(cnt):
                out.append(path[i - 1] + j * (path[i] - path[i - 1]) / cnt)
        out.append(path[-1])
        path = np.asarray(out)

    dec_batch = jax.jit(
        jax.vmap(
            lambda p1, p2: decompose_segment(p1, p2, obs, obs_mask, cfg, nh)
        )
    )

    for _ in range(iter_num + 1):
        p1 = jnp.asarray(path[:-1])
        p2 = jnp.asarray(path[1:])
        res = dec_batch(p1, p2)
        A = np.asarray(res.A)
        b = np.asarray(res.b)
        keep = _simplify_mask(path, A, b)
        new_path = path[keep]
        if len(new_path) == len(path):
            break
        path = new_path

    return IterativeResult(
        A=jnp.asarray(A),
        b=jnp.asarray(b),
        path=jnp.asarray(path),
        n_segments=jnp.asarray(len(path) - 1),
    )
