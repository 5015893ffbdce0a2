"""Native runtime core vs the Python/JAX implementations."""
import dataclasses
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from forces_resilient_planner_tpu.config import DEFAULT_CONFIG
from forces_resilient_planner_tpu.engine import commander
from forces_resilient_planner_tpu.engine.reference import wrap_yaw_outputs
from forces_resilient_planner_tpu.mapping import occ_grid as og
from native import bindings

pytestmark = pytest.mark.skipif(
    bindings.load() is None, reason="no native toolchain"
)

CFG = DEFAULT_CONFIG.model
RNG = np.random.default_rng(9)


def random_output(N=20):
    out = RNG.uniform(-1, 1, (N + 1, 17))
    out[:, 3] = RNG.uniform(4, 14, N + 1)
    return out


def test_interpolate_matches_python():
    out = random_output()
    for t in [0.0, 0.013, 0.27, 0.51, 0.89]:
        cmd_py = commander.interpolate_command(out, t, CFG)
        cmd_c = bindings.interpolate_command(out, t, CFG.dt, CFG.mass, CFG.g)
        if cmd_py is None:
            assert cmd_c is None
            continue
        np.testing.assert_allclose(cmd_c[0:3], cmd_py.pos, atol=1e-12)
        np.testing.assert_allclose(cmd_c[3:6], cmd_py.vel, atol=1e-12)
        np.testing.assert_allclose(cmd_c[6:9], cmd_py.acc, atol=1e-12)
        np.testing.assert_allclose(cmd_c[9:12], cmd_py.body_rates, atol=1e-12)
        assert abs(cmd_c[12] - cmd_py.yaw) < 1e-12
        assert abs(cmd_c[13] - cmd_py.thrust) < 1e-12
    assert bindings.interpolate_command(out, 1.2, CFG.dt, CFG.mass, CFG.g) is None


def test_init_yaw_rate_matches_python():
    lib = bindings.load()
    for _ in range(30):
        cur = RNG.uniform(-np.pi, np.pi)
        tgt = RNG.uniform(-np.pi, np.pi)
        want = commander.init_yaw_rate(cur, tgt, 0.4 * np.pi)
        got = lib.frp_init_yaw_rate(cur, tgt, 0.4 * np.pi)
        assert abs(got - want) < 1e-12


def test_postprocess_matches_python():
    out = random_output()
    out[:, 16] = RNG.uniform(-2 * np.pi, 2 * np.pi, 21)
    want = np.asarray(wrap_yaw_outputs(jnp.asarray(out[:20])))
    got = bindings.postprocess_output(out.copy(), 20)
    np.testing.assert_allclose(got[:20, 16], want[:, 16], atol=1e-12)
    np.testing.assert_allclose(got[20], got[19], atol=1e-12)


def test_native_raycast_matches_jax():
    mcfg = dataclasses.replace(
        DEFAULT_CONFIG.map, size=(10.0, 10.0, 4.0), origin=(-5.0, -5.0, -1.0)
    )
    grid_j = og.make_grid(mcfg)
    cam = np.array([0.0, 0.0, 1.0])
    pts = RNG.uniform([-4, -4, 0], [4, 4, 2.5], (200, 3))
    valid = np.ones(200, bool)
    gj = og.raycast_update(
        grid_j, jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(cam), mcfg
    )
    gc = bindings.raycast_update(
        np.full(mcfg.grid_shape, mcfg.clamp_min_log, np.float32),
        mcfg.origin, mcfg.resolution, pts, valid, cam,
        mcfg.min_ray_length, mcfg.max_ray_length,
        mcfg.prob_hit_log, mcfg.prob_miss_log,
        mcfg.clamp_min_log, mcfg.clamp_max_log,
    )
    np.testing.assert_allclose(np.asarray(gj.buffer), gc, atol=1e-5)


def test_ring_latest_roundtrip():
    ring = bindings.CommandRing(n_stages=20)
    assert ring.latest() is None
    out = random_output()
    ring.push(out, 12.5)
    snap, t = ring.latest()
    assert t == 12.5
    np.testing.assert_array_equal(snap, out)
    out2 = random_output()
    ring.push(out2, 13.0)
    snap2, t2 = ring.latest()
    assert t2 == 13.0
    np.testing.assert_array_equal(snap2, out2)


def test_ring_command_matches_interpolator():
    ring = bindings.CommandRing(n_stages=20)
    out = random_output()
    ring.push(out, 100.0)
    for t in (100.05, 100.31, 100.77):
        cmd = ring.command(t, CFG.dt, CFG.mass, CFG.g)
        ref = bindings.interpolate_command(
            out, t - 100.0, CFG.dt, CFG.mass, CFG.g
        )
        np.testing.assert_allclose(cmd, ref, atol=1e-15)
    assert ring.command(102.0, CFG.dt, CFG.mass, CFG.g) is None  # exhausted


def test_ring_concurrent_snapshots_consistent():
    """Writer floods the ring while the reader samples; every snapshot must
    be internally consistent (all entries from one publish)."""
    import threading

    ring = bindings.CommandRing(n_stages=20)
    stop = threading.event() if hasattr(threading, "event") else None
    done = threading.Event()

    def writer():
        for k in range(4000):
            payload = np.full((21, 17), float(k))
            ring.push(payload, float(k))
        done.set()

    w = threading.Thread(target=writer)
    w.start()
    torn = 0
    reads = 0
    while not done.is_set():
        got = ring.latest()
        if got is None:
            continue
        snap, t = got
        reads += 1
        if not (snap == snap.flat[0]).all() or t != snap.flat[0]:
            torn += 1
    w.join()
    assert reads > 0
    assert torn == 0
