"""End-to-end NMPC pipeline step tests (BASELINE config-3 shape: corridor
sequence from obstacles + kino path + force estimate)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from forces_resilient_planner_tpu.config import DEFAULT_CONFIG
from forces_resilient_planner_tpu.engine import pipeline
from forces_resilient_planner_tpu.solver.problems import hover_warm_start

C = DEFAULT_CONFIG


def make_inputs(with_obstacles=False, t_offset=0.0, f_ext=(0.0, 0.0, 0.0)):
    N = C.model.N
    x0 = np.zeros(9)
    x0[2] = 1.2
    Z = np.asarray(hover_warm_start(jnp.asarray(x0, jnp.float64), C.model))
    mpc_output = jnp.asarray(np.concatenate([Z, Z[-1:]], axis=0))
    # straight-line kino path toward +x at cruise speed (samples at Ts)
    K = 128
    t = np.arange(K) * C.model.dt
    path = np.stack([x0[0] + 1.5 * t, np.zeros(K), np.full(K, 1.2)], -1)
    rng = np.random.default_rng(0)
    M = 512
    obs = np.zeros((M, 3))
    mask = np.zeros(M, bool)
    if with_obstacles:
        pts = rng.uniform([-1, -2.5, 0], [6, 2.5, 2.5], (200, 3))
        keep = np.abs(pts[:, 1]) > 0.6  # corridor along the path stays open
        pts = pts[keep]
        obs[: len(pts)] = pts
        mask[: len(pts)] = True
    return dict(
        mpc_output=mpc_output,
        kino_path=jnp.asarray(path),
        kino_size=jnp.asarray(K),
        t_offset=jnp.asarray(float(t_offset)),
        state_mpc=jnp.asarray(x0),
        f_ext=jnp.asarray(np.asarray(f_ext, np.float64)),
        end_pt=jnp.asarray(path[-1]),
        obstacles=jnp.asarray(obs),
        obstacle_mask=jnp.asarray(mask),
        use_final=jnp.asarray(False),
    )


def test_pipeline_step_free_space():
    inp = make_inputs()
    res = pipeline.nmpc_step(**inp, cfg=C)
    assert int(res.exit_code) == 1, float(res.kkt_error)
    out = np.asarray(res.mpc_output)
    assert out.shape == (C.model.N + 1, 17)
    # tracks the reference path: moves forward in x
    assert out[10, 8] > 0.05
    np.testing.assert_allclose(out[-1], out[-2])  # row N copies row N-1
    # tube ellipsoids grow along the horizon (uncertainty accumulates)
    E = np.asarray(res.tube_E)
    assert np.trace(E[-1] @ E[-1]) > np.trace(E[0] @ E[0])


def test_pipeline_step_with_obstacles_and_force():
    inp = make_inputs(with_obstacles=True, f_ext=(0.8, -0.4, 0.0))
    res = pipeline.nmpc_step(**inp, cfg=C)
    assert int(res.exit_code) == 1, float(res.kkt_error)
    # solution satisfies the *tightened* corridors stage-wise
    out = np.asarray(res.mpc_output)[: C.model.N]
    A = np.asarray(res.corridor_A)
    bt = np.asarray(res.corridor_b_tight)
    for i in range(C.model.N):
        viol = A[i] @ out[i, 8:11] - bt[i]
        assert np.max(viol) <= 1e-5 + 1e-7, (i, np.max(viol))


def test_corridor_reuse_is_selected():
    """Consecutive stages along a straight path should reuse polytopes."""
    inp = make_inputs(with_obstacles=True)
    from forces_resilient_planner_tpu.engine.reference import sample_references
    from forces_resilient_planner_tpu.tube.lyapunov import propagate_tubes
    ref = sample_references(
        inp["kino_path"], inp["kino_size"], inp["t_offset"],
        inp["mpc_output"][1, 16], inp["mpc_output"][1, 8:11],
        C.model.N, C.model.dt,
    )
    tube = propagate_tubes(
        inp["mpc_output"][: C.model.N], C.model, C.tube,
        jnp.asarray(C.K_matrix()),
    )
    _, _, sel = pipeline.build_corridors(
        ref, tube.E, inp["obstacles"], inp["obstacle_mask"], C
    )
    sel = np.asarray(sel)
    assert sel[0] == 0
    assert len(np.unique(sel)) < C.model.N  # at least some reuse happened
    assert np.all(np.diff(sel) >= 0)        # reuse index is monotone


def test_goal_reached_flag():
    inp = make_inputs()
    # goal at current position -> after solve, ref_end ~ goal
    inp["end_pt"] = jnp.asarray(np.array([0.0, 0.0, 1.2]))
    inp["kino_path"] = jnp.tile(jnp.asarray(np.array([[0.0, 0.0, 1.2]])), (128, 1))
    res = pipeline.nmpc_step(**inp, cfg=C)
    assert bool(res.goal_reached)


def test_device_scenario_expansion_matches_host():
    """solve_scenario_grid's on-device cartesian expansion must produce the
    identical parameter set as the host-side make_scenarios builder."""
    import jax.numpy as jnp
    import numpy as np
    from forces_resilient_planner_tpu.config import DEFAULT_CONFIG as C
    from forces_resilient_planner_tpu.engine import batch as bm
    from forces_resilient_planner_tpu.solver import nlp

    rng = np.random.default_rng(7)
    goals = rng.uniform([-2, -2, 1.0], [2, 2, 1.5], (3, 3))
    forces = rng.uniform(-1.0, 1.0, (2, 3))
    halves = np.array([[5.0, 5.0, 2.0], [3.0, 4.0, 1.5]])
    x0 = np.zeros(9)
    x0[2] = 1.2

    host = bm.make_scenarios(C, goals, forces, halves, dtype=jnp.float64)
    weights = nlp.make_stage_weights(
        C.weights, C.model.N, final=False, dtype=jnp.float64
    )
    dev = bm._expand_scenarios_device(
        C, jnp.asarray(x0, jnp.float64), jnp.asarray(goals, jnp.float64),
        jnp.asarray(forces, jnp.float64), jnp.asarray(halves, jnp.float64),
        weights,
    )
    np.testing.assert_allclose(np.asarray(dev.Z0), np.asarray(host.Z0), atol=1e-12)
    for name in nlp.NLPParams._fields:
        a, b = getattr(dev.params, name), getattr(host.params, name)
        if name == "weights":
            for f_a, f_b in zip(a, b):
                np.testing.assert_allclose(np.asarray(f_a), np.asarray(f_b), atol=1e-12)
        else:
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-12, err_msg=name
            )


def test_batched_step_matches_vmapped_single():
    """nmpc_step_batched (lane-major tiered solve) must agree with
    jax.vmap(nmpc_step) (per-lane solve) — same math, different batching
    (engine/pipeline_batch.py)."""
    from forces_resilient_planner_tpu.engine.pipeline_batch import (
        nmpc_step_batched,
    )

    B = 4
    rng = np.random.default_rng(3)
    base = make_inputs(with_obstacles=True)
    keys = list(base.keys())
    batched = {
        k: jnp.stack([v] * B, axis=0) for k, v in base.items()
    }
    # per-lane variety: forces, t_offsets, one final-profile lane
    batched["f_ext"] = jnp.asarray(rng.uniform(-1.0, 1.0, (B, 3)))
    batched["t_offset"] = jnp.asarray(rng.uniform(0.0, 0.3, (B,)))
    batched["use_final"] = jnp.asarray([False, True, False, False])
    batched["mpc_output"] = batched["mpc_output"] + jnp.asarray(
        rng.normal(0, 1e-3, batched["mpc_output"].shape)
    )

    rb = nmpc_step_batched(*[batched[k] for k in keys], cfg=C)
    rv = jax.vmap(
        lambda *a: pipeline.nmpc_step(*a, cfg=C)
    )(*[batched[k] for k in keys])

    assert np.array_equal(np.asarray(rb.exit_code), np.asarray(rv.exit_code))
    np.testing.assert_allclose(
        np.asarray(rb.mpc_output), np.asarray(rv.mpc_output),
        atol=5e-5, rtol=0,
    )
    np.testing.assert_allclose(
        np.asarray(rb.corridor_b_tight), np.asarray(rv.corridor_b_tight),
        atol=1e-9, rtol=0,
    )
    for fld in ("reach_local_end", "switch_to_final", "diverged",
                "goal_reached", "ref_jump_replan"):
        np.testing.assert_array_equal(
            np.asarray(getattr(rb, fld)), np.asarray(getattr(rv, fld)),
            err_msg=fld,
        )
