"""Occupancy-map tests: voxel semantics, raycast traversal parity vs a NumPy
Amanatides-Woo transcription (raycast.cpp:31-150), log-odds batch update,
collision checks."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from forces_resilient_planner_tpu.config import DEFAULT_CONFIG, MapConfig
from forces_resilient_planner_tpu.mapping import occ_grid as og

# small map for tests
CFG = dataclasses.replace(
    DEFAULT_CONFIG.map, size=(10.0, 10.0, 4.0), origin=(-5.0, -5.0, -1.0)
)


def np_raycast(start, end, res):
    """Amanatides-Woo transcription (voxel coords), start voxel excluded,
    end voxel included."""
    s = np.asarray(start) / res
    e = np.asarray(end) / res
    x = np.floor(s).astype(int)
    x1 = np.floor(e).astype(int)
    d = e - s
    step = np.sign(d).astype(int)

    def intbound(sv, dv):
        if dv == 0:
            return np.inf
        sv = ((sv % 1.0) + 1.0) % 1.0
        return (1 - sv) / dv if dv > 0 else sv / (-dv)

    tmax = np.array([intbound(s[i], d[i]) for i in range(3)])
    tdelta = np.array([abs(1.0 / d[i]) if d[i] != 0 else np.inf for i in range(3)])
    out = []
    for _ in range(10000):
        if np.all(x == x1):
            break
        axis = int(np.argmin(tmax))
        x = x.copy()
        x[axis] += step[axis]
        tmax = tmax.copy()
        tmax[axis] += tdelta[axis]
        out.append(x.copy())
    return out


def test_raycast_matches_numpy():
    rng = np.random.default_rng(1)
    for _ in range(10):
        a = rng.uniform(-4, 4, 3)
        b = rng.uniform(-4, 4, 3)
        vox, valid = og._raycast_voxels(
            jnp.asarray(a), jnp.asarray(b), 400, CFG
        )
        got = np.asarray(vox)[np.asarray(valid)]
        want = np.array(np_raycast(a, b, CFG.resolution)).reshape(-1, 3)
        assert got.shape == want.shape, (got.shape, want.shape)
        np.testing.assert_array_equal(got, want)


def test_voxel_state_semantics():
    g = og.make_grid(CFG)
    pts = jnp.asarray([[0.0, 0.0, 1.0], [100.0, 0.0, 0.0]])
    st = og.voxel_state(g, pts, CFG)
    assert int(st[0]) == 0      # free
    assert int(st[1]) == -1     # outside map
    g2 = og.set_occupancy(
        g, jnp.asarray([[0.0, 0.0, 1.0]]), jnp.asarray([True]), CFG
    )
    assert int(og.voxel_state(g2, pts[0], CFG)) == 1


def test_raycast_update_carves_freespace_and_marks_hits():
    g = og.make_grid(CFG)
    cam = jnp.asarray([0.0, 0.0, 1.0])
    # a wall of points at x = 3
    ys = np.linspace(-1, 1, 21)
    zs = np.linspace(0.5, 1.5, 11)
    yy, zz = np.meshgrid(ys, zs)
    pts = np.stack([np.full(yy.size, 3.0), yy.ravel(), zz.ravel()], axis=-1)
    valid = jnp.ones(len(pts), bool)
    # three hit updates cross the 1.7 threshold from clamp_min -1.0
    # (-1 + 3*1.2 -> clamped at 2.0 > 1.7), matching the reference's log-odds
    for _ in range(3):
        g = og.raycast_update(g, jnp.asarray(pts), valid, cam, CFG)
    # wall occupied
    assert int(og.voxel_state(g, jnp.asarray([3.0, 0.0, 1.0]), CFG)) == 1
    # free space along the ray
    assert int(og.voxel_state(g, jnp.asarray([1.5, 0.0, 1.0]), CFG)) == 0
    # behind the wall untouched (still clamp_min, free)
    assert int(og.voxel_state(g, jnp.asarray([4.5, 0.0, 1.0]), CFG)) == 0
    buf = np.asarray(g.buffer)
    idx = og.pos_to_index(jnp.asarray([3.0, 0.0, 1.0]), CFG)
    assert buf[tuple(np.asarray(idx))] > CFG.min_occupancy_log


def test_check_pos_surround_and_state():
    g = og.make_grid(CFG)
    g = og.set_occupancy(
        g, jnp.asarray([[1.0, 0.0, 1.0]]), jnp.asarray([True]), CFG
    )
    ego_r, ego_h = DEFAULT_CONFIG.tube.ego_r, DEFAULT_CONFIG.tube.ego_h
    free = og.check_pos_surround(
        g, jnp.asarray([-2.0, 0.0, 1.0]), 1.2, ego_r, ego_h, CFG
    )
    hit = og.check_pos_surround(
        g, jnp.asarray([1.05, 0.0, 1.0]), 1.2, ego_r, ego_h, CFG
    )
    assert bool(free) and not bool(hit)
    # checkState: moving in +x, chord along y must touch the obstacle when
    # passing right beside it
    occ_state = og.check_state(
        g, jnp.asarray([1.0, 0.3, 1.0]), jnp.asarray([1.0, 0.0, 0.0]),
        1.5, ego_r, ego_h, CFG,
    )
    free_state = og.check_state(
        g, jnp.asarray([-2.0, 0.0, 1.0]), jnp.asarray([1.0, 0.0, 0.0]),
        1.5, ego_r, ego_h, CFG,
    )
    assert not bool(occ_state) and bool(free_state)


def test_project_depth_roundtrip():
    fx = fy = 387.0
    cx, cy = 320.0, 240.0
    depth = np.zeros((480, 640), np.float32)
    # rows/cols are subsampled with skip_pixel=2 from margin=1 (odd indices)
    depth[241, 321] = 2.0  # nearly straight ahead
    R_wc = np.array([[0, 0, 1.0], [-1, 0, 0], [0, -1, 0]])  # camera z forward -> world x
    t_wc = np.array([0.0, 0.0, 1.0])
    pts, valid = og.project_depth(
        jnp.asarray(depth), jnp.asarray(R_wc), jnp.asarray(t_wc), CFG,
        fx, fy, cx, cy,
    )
    pts = np.asarray(pts)[np.asarray(valid)]
    assert len(pts) == 1
    off = 1.0 * 2.0 / 387.0  # one-pixel offset from the principal point
    np.testing.assert_allclose(pts[0], [2.0, -off, 1.0 - off], atol=1e-6)


def test_local_vs_history_cloud_window_semantics():
    """local_view_cloud restricts to the sensor-following window
    (localOccVisCallback, occ_map.cpp:177-215); history_view_cloud covers
    the whole map (globalOccVisCallback, 150-175)."""
    grid = og.make_grid(CFG, jnp.float64)
    pts = np.array([[1.0, 1.0, 1.0], [4.0, 4.0, 1.0]])
    grid = og.set_occupancy(grid, jnp.asarray(pts), jnp.ones(2, bool), CFG)
    # window around the first point only
    grid = og.update_local_window(
        grid, jnp.asarray([1.0, 1.0, 1.0]), jnp.asarray([1.0, 1.0, 1.0])
    )
    loc_pts, loc_mask = og.occupied_cloud(grid, CFG, 64)
    hist_pts, hist_mask = og.history_cloud(grid, CFG, 64)
    loc = np.asarray(loc_pts)[np.asarray(loc_mask)]
    hist = np.asarray(hist_pts)[np.asarray(hist_mask)]
    assert len(loc) >= 1 and len(hist) >= 2
    assert np.all(np.linalg.norm(loc - pts[0], axis=1) < 0.2)
    # history contains the far voxel too
    assert np.any(np.linalg.norm(hist - pts[1], axis=1) < 0.2)
