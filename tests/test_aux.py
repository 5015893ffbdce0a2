"""Tests for auxiliary subsystems: corridor variants, search path queries,
shift filter, body-frame odometry, timers, scene dump, checkpointing."""
import dataclasses
import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from forces_resilient_planner_tpu.config import DEFAULT_CONFIG
from forces_resilient_planner_tpu.corridor.variants import (
    iterative_decompose,
    seed_decompose,
)
from forces_resilient_planner_tpu.engine.planner import ResilientPlanner
from forces_resilient_planner_tpu.mapping import occ_grid as og
from forces_resilient_planner_tpu.search import kinodynamic as kd
from forces_resilient_planner_tpu.utils import checkpoint as ckpt
from forces_resilient_planner_tpu.utils.scene import dump_scene
from forces_resilient_planner_tpu.utils.timing import Timers

C = DEFAULT_CONFIG
RNG = np.random.default_rng(11)


def test_seed_decompose():
    obs = RNG.uniform([-2, -2, 0], [2, 2, 2], (100, 3))
    keep = np.linalg.norm(obs - [0, 0, 1], axis=1) > 0.5
    buf = np.zeros((256, 3)); buf[: keep.sum()] = obs[keep]
    m = np.zeros(256, bool); m[: keep.sum()] = True
    res = seed_decompose(
        jnp.asarray([0.0, 0.0, 1.0]), 0.3, jnp.asarray(buf), jnp.asarray(m),
        C.corridor,
    )
    A, b = np.asarray(res.A), np.asarray(res.b)
    # seed inside
    assert np.all(A @ np.array([0, 0, 1.0]) - b <= 1e-9)
    # kept obstacles excluded
    rows = np.linalg.norm(A, axis=1) > 1e-9
    for o in obs[keep]:
        if np.all(np.abs(o - [0, 0, 1]) <= np.asarray(C.corridor.local_bbox)):
            assert np.max(A[rows] @ o - b[rows]) >= -1e-7


def test_iterative_decompose_simplifies():
    obs = RNG.uniform([-1, -4, 0], [6, 4, 2.4], (150, 3))
    keep = np.abs(obs[:, 1]) > 0.7
    buf = np.zeros((256, 3)); buf[: keep.sum()] = obs[keep]
    m = np.zeros(256, bool); m[: keep.sum()] = True
    # a needlessly dense straight path
    t = np.linspace(0, 1, 12)[:, None]
    path = np.array([0.0, 0, 1.2]) + t * np.array([5.0, 0, 0])
    res = iterative_decompose(path, jnp.asarray(buf), jnp.asarray(m), C.corridor)
    assert int(res.n_segments) <= len(path) - 1
    # all remaining waypoints covered by their segment polytopes
    P = np.asarray(res.path)
    A, b = np.asarray(res.A), np.asarray(res.b)
    for i in range(int(res.n_segments)):
        mid = 0.5 * (P[i] + P[i + 1])
        assert np.all(A[i] @ mid - b[i] <= 1e-7)


def _simple_search():
    MAP = dataclasses.replace(
        C.map, size=(10.0, 10.0, 4.0), origin=(-5.0, -5.0, -1.0)
    )
    SR = dataclasses.replace(C.search, expand_width=8, node_capacity=2048, max_rounds=48)
    grid = og.make_grid(MAP, jnp.float64)
    res = kd.search(
        grid, jnp.asarray([-2.0, 0.0, 1.2]), jnp.zeros(3, jnp.float64),
        jnp.zeros(3, jnp.float64), jnp.asarray([1.0, 0.5, 1.2]),
        jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64),
        False, SR, C.tube, MAP,
    )
    return res, SR


def test_get_cur_pos_and_samples():
    res, SR = _simple_search()
    assert int(res.status) in (kd.REACH_END, kd.REACH_END_BUT_SHOT_FAILS)
    p0 = kd.get_cur_pos(res, np.zeros(3), 0.0, SR.max_tau, [1.0, 0.5, 1.2])
    np.testing.assert_allclose(p0, [-2.0, 0.0, 1.2], atol=1e-9)
    p_end = kd.get_cur_pos(res, np.zeros(3), 100.0, SR.max_tau, [1.0, 0.5, 1.2])
    if bool(res.shot_ok):
        np.testing.assert_allclose(p_end, [1.0, 0.5, 1.2], atol=1e-9)
    pts, derivs = kd.get_samples(res, np.zeros(3), 0.05)
    assert len(pts) > 5
    np.testing.assert_allclose(pts[0], [-2.0, 0.0, 1.2], atol=0.3)
    assert len(derivs) == 4


def test_shift_filter_rejects_inconsistent_depth():
    mcfg = C.map
    fx = fy = 387.0; cx, cy = 320.0, 240.0
    depth = np.full((480, 640), 2.0, np.float32)
    last = depth.copy()
    R = np.eye(3); t = np.zeros(3)
    pts, keep = og.project_depth_shift_filter(
        jnp.asarray(depth), jnp.asarray(R), jnp.asarray(t),
        jnp.asarray(last), jnp.asarray(R), jnp.asarray(t),
        mcfg, fx, fy, cx, cy,
    )
    assert bool(np.asarray(keep).all())
    # corrupt the previous frame -> everything inconsistent
    last_bad = np.full((480, 640), 4.0, np.float32)
    _, keep_bad = og.project_depth_shift_filter(
        jnp.asarray(depth), jnp.asarray(R), jnp.asarray(t),
        jnp.asarray(last_bad), jnp.asarray(R), jnp.asarray(t),
        mcfg, fx, fy, cx, cy,
    )
    assert not bool(np.asarray(keep_bad).any())


def test_body_frame_odometry():
    p = ResilientPlanner(C, max_cloud=128)
    yaw = 0.7
    q = np.array([np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)])  # pure yaw
    p.on_odometry_body_frame([1, 2, 1.2], q, [1.0, 0.0, 0.0])
    # body +x velocity rotates into world by yaw
    np.testing.assert_allclose(
        p.odom[3:5], [np.cos(yaw), np.sin(yaw)], atol=1e-12
    )
    np.testing.assert_allclose(p.odom[8], yaw, atol=1e-12)


def test_timers_and_scene_and_checkpoint(tmp_path):
    tm = Timers()
    with tm.phase("solve"):
        pass
    with tm.phase("solve"):
        pass
    rep = tm.report()
    assert rep["solve"]["n"] == 2 and "solves_per_s" in rep

    traj = np.linspace([0, 0, 1], [2, 1, 1.2], 20)
    html = dump_scene(
        tmp_path / "scene.html", traj, traj, [2, 1, 1.2],
        obstacles=RNG.uniform(-1, 3, (50, 3)),
        tube_E=np.tile(np.eye(3)[None] * 0.3, (20, 1, 1)),
        meta={"exit_code": 1},
    )
    text = html.read_text()
    assert "resilient planner scene" in text and "exit_code" in text

    # animated replay dump (the rviz-session analog): a synthetic trace
    # with plan snapshots renders to a self-contained scrubber page
    from forces_resilient_planner_tpu.utils.scene import dump_replay

    T = 40
    trace = {
        "t": np.arange(T) * 0.01,
        "pos": np.linspace([0, 0, 1.2], [2, 1, 1.2], T),
        "force": np.zeros((T, 3)),
        "state": ["EXEC_TRAJ"] * T,
        "plans": [(0.0, np.linspace([0, 0, 1.2], [2, 1, 1.2], 21))],
    }
    rp = dump_replay(
        tmp_path / "replay.html", trace, [2, 1, 1.2],
        obstacles=RNG.uniform(-1, 3, (30, 3)), meta={"run": "test"},
    )
    rtext = rp.read_text()
    assert "flight replay" in rtext and "scrubber" not in rtext
    assert '"plans"' in rtext and "EXEC_TRAJ" in rtext

    state = {"Z": np.ones((4, 3)), "iters": np.asarray([3, 4])}
    path = ckpt.save(tmp_path / "ck", state, {"note": "test"})
    back = ckpt.load(path, like=state)
    np.testing.assert_allclose(back["Z"], state["Z"])


def test_aot_export_roundtrip():
    """The exported solver artifact (the FORCES-codegen analog,
    generate_solver.m) must reproduce the live jit path exactly."""
    import jax.numpy as jnp

    from forces_resilient_planner_tpu.config import DEFAULT_CONFIG as C
    from forces_resilient_planner_tpu.engine import batch as bm
    from forces_resilient_planner_tpu.solver import ipm_lanes
    from forces_resilient_planner_tpu.utils import aot

    rng = np.random.default_rng(2)
    goals = rng.uniform([-2, -2, 1.0], [2, 2, 1.5], (2, 3))
    forces = np.zeros((2, 3))
    halves = np.array([[4.0, 4.0, 1.5]])
    sc = bm.make_scenarios(C, goals, forces, halves, dtype=jnp.float64)

    blob = aot.export_batched_solver(C, batch=sc.Z0.shape[0],
                                     dtype=jnp.float64)
    assert len(blob) > 1000
    solver = aot.load_solver(blob)
    got = solver(sc.Z0, sc.params)
    ref = ipm_lanes.solve_batch_lanes_tiered(
        sc.Z0, sc.params, C.model, C.solver
    )
    np.testing.assert_array_equal(np.asarray(got[5]), np.asarray(ref.iters))
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(ref.Z), rtol=0, atol=0
    )
