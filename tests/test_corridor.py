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


def test_polyhedron_vertices_unit_cube():
    import numpy as np
    from forces_resilient_planner_tpu.corridor.geometry import polyhedron_vertices

    A = np.vstack([np.eye(3), -np.eye(3)])
    b = np.ones(6)
    pf = polyhedron_vertices(A, b)
    assert pf.vertices.shape == (8, 3)
    want = {tuple(v) for v in
            np.array(np.meshgrid([-1, 1], [-1, 1], [-1, 1])).reshape(3, -1).T}
    got = {tuple(np.round(v, 9)) for v in pf.vertices}
    assert got == want
    assert len(pf.faces) == 6
    for face in pf.faces:
        assert face.shape == (4, 3)
        # ring-sorted: consecutive vertices share an edge (distance 2, not
        # the diagonal 2*sqrt(2))
        d = np.linalg.norm(np.roll(face, -1, axis=0) - face, axis=1)
        np.testing.assert_allclose(d, 2.0, atol=1e-9)


def test_polyhedron_vertices_masked_rows_and_simplex():
    import numpy as np
    from forces_resilient_planner_tpu.corridor.geometry import polyhedron_vertices

    # simplex x,y,z >= 0, x+y+z <= 1, padded with zero rows (masked slots)
    A = np.vstack([-np.eye(3), np.ones((1, 3)), np.zeros((26, 3))])
    b = np.concatenate([np.zeros(3), [1.0], np.zeros(26)])
    pf = polyhedron_vertices(A, b)
    assert pf.vertices.shape == (4, 3)
    assert len(pf.faces) == 4


def test_vec3_to_rotation():
    import numpy as np
    from forces_resilient_planner_tpu.corridor.geometry import vec3_to_rotation

    rng = np.random.default_rng(3)
    for _ in range(20):
        v = rng.standard_normal(3)
        R = vec3_to_rotation(v)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)
        # x-axis maps onto v's direction
        np.testing.assert_allclose(R[:, 0], v / np.linalg.norm(v), atol=1e-12)
        # zero roll: the body-y axis stays horizontal
        np.testing.assert_allclose(R[2, 1], 0.0, atol=1e-12)


def test_msgs_roundtrip_and_constraints():
    import numpy as np
    from forces_resilient_planner_tpu.corridor.msgs import (
        EllipsoidMsg, PolyhedronMsg, SceneMsg,
    )

    rng = np.random.default_rng(5)
    A = np.vstack([np.eye(3), -np.eye(3), [[1.0, 1.0, 0.0]]])
    b = np.array([2.0, 2.0, 1.0, 0.0, 0.0, 0.0, 2.5])
    poly = PolyhedronMsg.from_constraints(A, b)
    A2, b2 = poly.to_constraints()
    # same half-spaces after row normalization
    nn = np.linalg.norm(A, axis=-1)
    np.testing.assert_allclose(A2, A / nn[:, None], atol=1e-12)
    np.testing.assert_allclose(b2, b / nn, atol=1e-12)

    ell = EllipsoidMsg(d=rng.standard_normal(3), E=rng.standard_normal((3, 3)))
    scene = SceneMsg(
        polyhedra=[poly], ellipsoids=[ell],
        traj=rng.standard_normal((5, 3)), ref=rng.standard_normal((5, 3)),
        meta={"tick": 7},
    )
    back = SceneMsg.from_json(scene.to_json())
    np.testing.assert_allclose(back.ellipsoids[0].E, ell.E, atol=1e-15)
    np.testing.assert_allclose(back.polyhedra[0].points, poly.points, atol=1e-15)
    np.testing.assert_allclose(back.traj, scene.traj, atol=1e-15)
    assert back.meta == {"tick": 7}


def test_obstacle_compaction_is_transparent():
    """max_active_obstacles: when the in-bbox set fits the compacted buffer
    the decomposition must be identical to the uncompacted path (pure
    reindexing; corridor/decomp.py::compact_obstacles)."""
    import dataclasses

    rng = np.random.default_rng(21)
    M = 2048
    obs = rng.uniform([-4, -4, -1], [6, 4, 3], (M, 3))
    mask = rng.uniform(size=M) < 0.9
    p1 = jnp.asarray([0.0, 0.0, 1.2])
    p2 = jnp.asarray([0.4, 0.2, 1.2])

    CFG = C.corridor
    c_off = dataclasses.replace(CFG, max_active_obstacles=0)
    c_on = dataclasses.replace(CFG, max_active_obstacles=512)
    # sanity: the scene must actually overflow nothing (fit in 512)
    from forces_resilient_planner_tpu.corridor.decomp import (
        bbox_filter_obstacles,
        decompose_segment,
    )
    n_in = int(
        jnp.sum(
            bbox_filter_obstacles(
                p1, p2, jnp.asarray(CFG.local_bbox), jnp.asarray(obs),
                jnp.asarray(mask), CFG.epsilon,
            )
        )
    )
    assert 0 < n_in <= 512, n_in

    r_off = decompose_segment(p1, p2, jnp.asarray(obs), jnp.asarray(mask), c_off)
    r_on = decompose_segment(p1, p2, jnp.asarray(obs), jnp.asarray(mask), c_on)
    np.testing.assert_allclose(np.asarray(r_on.A), np.asarray(r_off.A), atol=1e-12)
    np.testing.assert_allclose(np.asarray(r_on.b), np.asarray(r_off.b), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(r_on.ellipsoid_C), np.asarray(r_off.ellipsoid_C), atol=1e-12
    )


def test_obstacle_compaction_overflow_unsound():
    """The OVERFLOW regime is why compaction defaults to OFF
    (CorridorConfig.max_active_obstacles=0): a dense near cluster hogs
    every slot, the sparse far obstacles are dropped, and a dropped
    obstacle then sits strictly INSIDE the compacted polytope — a
    corridor that is not obstacle-free.  This test pins that measured
    behavior (so the hazard stays documented and the default stays off)
    and verifies the uncompacted path excludes the same obstacles."""
    import dataclasses

    from forces_resilient_planner_tpu.corridor.decomp import decompose_segment

    rng = np.random.default_rng(1)
    cluster = rng.uniform([0.35, -0.1, -0.1], [0.5, 0.1, 0.1], (400, 3))
    far = np.array([[0.05, -1.5, 0.0], [0.05, -1.6, 0.1]])
    obs = jnp.asarray(np.concatenate([cluster, far]))
    mask = jnp.ones(obs.shape[0], bool)
    p1 = jnp.asarray([0.0, 0.0, 0.0])
    p2 = jnp.asarray([0.1, 0.0, 0.0])

    def depth_inside(res):
        # penetration depth of the far obstacles into the polytope
        # (positive = strictly inside = unsafe corridor)
        A = np.asarray(res.A)
        b = np.asarray(res.b)
        act = np.linalg.norm(A, axis=-1) > 1e-9
        s = (A[None] @ far[:, :, None])[:, :, 0] - b[None]
        return -np.max(np.where(act[None], s, -np.inf), axis=1)

    c_cmp = dataclasses.replace(C.corridor, max_active_obstacles=128)
    c_off = dataclasses.replace(C.corridor, max_active_obstacles=0)
    d_cmp = depth_inside(decompose_segment(p1, p2, obs, mask, c_cmp))
    d_off = depth_inside(decompose_segment(p1, p2, obs, mask, c_off))
    # uncompacted (default): every obstacle on/outside the polytope
    assert np.all(d_off <= 1e-9), d_off
    # compacted: the documented hazard — dropped obstacles strictly inside
    assert np.any(d_cmp > 0.05), d_cmp
