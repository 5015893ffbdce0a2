"""Corridor decomposition tests.

Includes a direct NumPy transcription of the reference algorithm
(line_segment.h / decomp_base.h, unbounded loops) as the parity oracle.
"""
import jax.numpy as jnp
import numpy as np

from forces_resilient_planner_tpu.config import DEFAULT_CONFIG as C
from forces_resilient_planner_tpu.corridor.decomp import (
    bbox_filter_obstacles,
    decompose_segment,
    find_ellipsoid,
    find_polyhedron,
    local_bbox_planes,
    seed_rotation,
)

RNG = np.random.default_rng(7)
EPS = 1e-10


# ---------------------------------------------------------------------------
# NumPy oracle: faithful transcription with data-dependent while loops
# ---------------------------------------------------------------------------
def np_seed_rotation(p1, p2):
    v = p2 - p1
    pitch = np.arctan2(-v[2], np.linalg.norm(v[:2]))
    yaw = np.arctan2(v[1], v[0])
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry


def np_bbox_planes(p1, p2, bbox):
    v = p2 - p1
    dirv = v / np.linalg.norm(v)
    dir_h = np.array([dirv[1], -dirv[0], 0.0])
    if np.linalg.norm(dir_h) == 0:
        dir_h = np.array([-1.0, 0, 0])
    dir_h = dir_h / np.linalg.norm(dir_h)
    dir_v = np.cross(dirv, dir_h)
    return [
        (p1 + dir_h * bbox[1], dir_h),
        (p1 - dir_h * bbox[1], -dir_h),
        (p2 + dirv * bbox[0], dirv),
        (p1 - dirv * bbox[0], -dirv),
        (p1 + dir_v * bbox[2], dir_v),
        (p1 - dir_v * bbox[2], -dir_v),
    ]


def np_find_ellipsoid(p1, p2, obs):
    f = max(np.linalg.norm(p1 - p2) / 2, 1e-6)
    Ri = np_seed_rotation(p1, p2)
    d = (p1 + p2) / 2
    axes = np.array([f, f, f])
    C = f * np.eye(3)
    C = Ri @ C @ Ri.T

    def dist(Cm, pts):
        return np.linalg.norm(np.linalg.inv(Cm) @ (pts - d).T, axis=0)

    obs0 = obs[dist(C, obs) <= 1] if len(obs) else obs
    inside = obs0.copy()
    Rf = Ri
    while len(inside):
        dd = dist(C, inside)
        pw = inside[np.argmin(dd)]
        p = Ri.T @ (pw - d)
        roll = np.arctan2(p[2], p[1])
        cr, sr = np.cos(roll), np.sin(roll)
        Rf = Ri @ np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
        p = Rf.T @ (pw - d)
        if p[0] < axes[0]:
            axes[1] = abs(p[1]) / np.sqrt(1 - (p[0] / axes[0]) ** 2)
        C = Rf @ np.diag([axes[0], axes[1], axes[1]]) @ Rf.T
        inside = inside[1 - dist(C, inside) > EPS]

    C = Rf @ np.diag([axes[0], axes[1], f]) @ Rf.T
    axes[2] = f
    inside = obs0[dist(C, obs0) <= 1] if len(obs0) else obs0
    while len(inside):
        dd = dist(C, inside)
        pw = inside[np.argmin(dd)]
        p = Rf.T @ (pw - d)
        dd2 = 1 - (p[0] / axes[0]) ** 2 - (p[1] / axes[1]) ** 2
        if dd2 > EPS:
            axes[2] = abs(p[2]) / np.sqrt(dd2)
        C = Rf @ np.diag(axes) @ Rf.T
        inside = inside[1 - dist(C, inside) > EPS]
    return C, d


def np_find_polyhedron(Cm, d, obs):
    planes = []
    remain = obs.copy()
    Minv = np.linalg.inv(Cm)
    M = Minv @ Minv.T
    while len(remain):
        dd = np.linalg.norm(Minv @ (remain - d).T, axis=0)
        pw = remain[np.argmin(dd)]
        n = M @ (pw - d)
        n = n / np.linalg.norm(n)
        planes.append((pw, n))
        remain = remain[(remain - pw) @ n < 0]
    return planes


def make_scene(n_obs=60, seed=0):
    rng = np.random.default_rng(seed)
    p1 = np.array([0.0, 0.0, 1.2])
    p2 = np.array([0.1, 0.05, 1.2])
    obs = rng.uniform([-2, -2, 0.0], [2.2, 2, 2.4], (n_obs, 3))
    # keep obstacles away from the segment itself
    keep = np.linalg.norm(obs - (p1 + p2) / 2, axis=1) > 0.4
    return p1, p2, obs[keep]


def pad_obs(obs, cap=256):
    m = np.zeros(cap, bool)
    m[: len(obs)] = True
    buf = np.zeros((cap, 3))
    buf[: len(obs)] = obs
    return jnp.asarray(buf), jnp.asarray(m)


def test_ellipsoid_matches_numpy_oracle():
    for seed in range(5):
        p1, p2, obs = make_scene(seed=seed)
        bbox = np.asarray(C.corridor.local_bbox)
        # oracle applies the bbox filter first (set_obs)
        planes = np_bbox_planes(p1, p2, bbox)
        inside = np.array(
            [all(n @ (o - p) <= EPS for p, n in planes) for o in obs]
        )
        obs_f = obs[inside]
        C_ref, d_ref = np_find_ellipsoid(p1, p2, obs_f)

        buf, m = pad_obs(obs)
        m = bbox_filter_obstacles(
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(bbox), buf, m, EPS
        )
        E = find_ellipsoid(jnp.asarray(p1), jnp.asarray(p2), buf, m, C.corridor)
        np.testing.assert_allclose(np.asarray(E.C), C_ref, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(E.d), d_ref, atol=1e-12)


def test_polyhedron_matches_numpy_oracle():
    for seed in range(5):
        p1, p2, obs = make_scene(seed=seed)
        bbox = np.asarray(C.corridor.local_bbox)
        planes_b = np_bbox_planes(p1, p2, bbox)
        inside = np.array(
            [all(n @ (o - p) <= EPS for p, n in planes_b) for o in obs]
        )
        obs_f = obs[inside]
        C_ref, d_ref = np_find_ellipsoid(p1, p2, obs_f)
        ref_planes = np_find_polyhedron(C_ref, d_ref, obs_f)

        buf, m = pad_obs(obs)
        m = bbox_filter_obstacles(
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(bbox), buf, m, EPS
        )
        E = find_ellipsoid(jnp.asarray(p1), jnp.asarray(p2), buf, m, C.corridor)
        ps = find_polyhedron(E, buf, m, C.corridor.max_obs_planes)
        nvalid = int(np.sum(np.asarray(ps.valid)))
        assert nvalid == len(ref_planes), (nvalid, len(ref_planes))
        for k, (pw, n) in enumerate(ref_planes):
            np.testing.assert_allclose(np.asarray(ps.points[k]), pw, atol=1e-9)
            np.testing.assert_allclose(np.asarray(ps.normals[k]), n, atol=1e-7)


def test_constraints_exclude_obstacles_and_contain_seed():
    for seed in range(8):
        p1, p2, obs = make_scene(n_obs=120, seed=seed)
        buf, m = pad_obs(obs)
        res = decompose_segment(
            jnp.asarray(p1), jnp.asarray(p2), buf, m, C.corridor
        )
        A, b = np.asarray(res.A), np.asarray(res.b)
        mid = (p1 + p2) / 2
        # seed midpoint strictly inside
        assert np.all(A @ mid - b <= 1e-9)
        # every bbox-filtered obstacle is outside (some row >= -eps)
        bbox = np.asarray(C.corridor.local_bbox)
        mj = np.asarray(
            bbox_filter_obstacles(
                jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(bbox), buf, m, EPS
            )
        )
        valid_rows = np.linalg.norm(A, axis=1) > 1e-9
        for o, keep in zip(np.asarray(buf), mj):
            if keep:
                assert np.max((A[valid_rows] @ o) - b[valid_rows]) >= -1e-7


def test_empty_scene_gives_bbox_only():
    p1 = np.array([0.0, 0.0, 1.2]); p2 = np.array([0.1, 0.0, 1.2])
    buf, m = pad_obs(np.zeros((0, 3)))
    res = decompose_segment(jnp.asarray(p1), jnp.asarray(p2), buf, m, C.corridor)
    A = np.asarray(res.A)
    nvalid = int(np.sum(np.linalg.norm(A, axis=1) > 1e-9))
    assert nvalid == 6  # bbox walls only
    # walls at the configured distances
    b = np.asarray(res.b)
    mid = (p1 + p2) / 2
    margins = b[np.linalg.norm(A, axis=1) > 1e-9] - A[np.linalg.norm(A, axis=1) > 1e-9] @ mid
    assert margins.min() > 0.9  # ~1.0 (z walls) and ~2.0 (xy walls)
