"""Sharded solves on REALISTIC problems: corridor-rich obstacle scenes at
production iteration budgets, tier compaction active per shard.

The trivial-box sharding tests (test_sharding.py) don't exercise the
tiered compaction + shard_map interaction where it could plausibly break:
active corridor rows, lanes converging at different rates, tail gathers
inside each shard.  Here every scenario's corridor comes from a real
ellipsoid decomposition against a fence scene (corridor/decomp.py), the
solver runs the production multi-level tier schedule, and the sharded
result must be BIT-EXACT against the unsharded lane-major path (f64).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forces_resilient_planner_tpu.config import DEFAULT_CONFIG
from forces_resilient_planner_tpu.corridor.decomp import decompose_segment
from forces_resilient_planner_tpu.engine import batch as bm
from forces_resilient_planner_tpu.parallel import mesh as pm
from forces_resilient_planner_tpu.solver import nlp
from forces_resilient_planner_tpu.solver.problems import hover_warm_start

CFG = dataclasses.replace(
    DEFAULT_CONFIG,
    solver=dataclasses.replace(
        DEFAULT_CONFIG.solver, tiers=((16, 0.25), (18, 0.0625))
    ),
    corridor=dataclasses.replace(
        DEFAULT_CONFIG.corridor,
        max_obstacles=512, shrink_iters=8, max_obs_planes=12,
    ),
)


def _fence_scene():
    """Fence with a gap at y in (0, 1.2), plus a second staggered fence."""
    pts = []
    for x, gap_lo, gap_hi in ((1.5, 0.0, 1.2), (3.0, -1.2, 0.0)):
        ys = np.arange(-3.0, 3.0, 0.15)
        zs = np.arange(0.0, 2.6, 0.15)
        yy, zz = np.meshgrid(ys, zs)
        keep = ~((yy.ravel() > gap_lo) & (yy.ravel() < gap_hi))
        pts.append(
            np.stack(
                [np.full(keep.sum(), x), yy.ravel()[keep], zz.ravel()[keep]],
                -1,
            )
        )
    return np.concatenate(pts, axis=0)


def _corridor_scenarios(B: int, dtype=jnp.float64):
    """B scenarios whose references thread the fence gaps; corridors from
    real per-stage segment decompositions (build_corridors' inner op)."""
    mcfg = CFG.model
    N = mcfg.N
    rng = np.random.default_rng(42)
    obs_np = _fence_scene()
    M = CFG.corridor.max_obstacles
    sel = rng.choice(len(obs_np), size=min(M, len(obs_np)), replace=False)
    obs = jnp.asarray(obs_np[sel], dtype)
    mask = jnp.ones(len(sel), bool)

    x0 = np.zeros(9)
    x0[2] = 1.2
    goals = rng.uniform([3.8, -2.0, 1.0], [4.5, 2.0, 1.6], (B, 3))
    forces = rng.uniform(-1.0, 1.0, (B, 3))

    # reference: piecewise line start -> gap1 -> gap2 -> goal, walked at a
    # per-scenario reference speed <= v_max so the horizon's references stay
    # dynamically reachable (the kino front-end resamples at Ts=0.05 the
    # same way); scenarios differ in speed and gap entry point, so stages
    # near the fence get genuinely different corridor decompositions
    gap1 = np.stack(
        [np.full(B, 1.5), rng.uniform(0.2, 1.0, B), np.full(B, 1.2)], -1
    )
    wp = np.stack(
        [
            np.tile(x0[:3], (B, 1)),
            gap1,
            np.tile([3.0, -0.6, 1.2], (B, 1)),
            goals,
        ],
        axis=1,
    )  # (B, 4, 3)
    seg = np.linalg.norm(np.diff(wp, axis=1), axis=-1)  # (B, 3)
    cum = np.concatenate([np.zeros((B, 1)), np.cumsum(seg, axis=1)], axis=1)
    v_ref = rng.uniform(1.0, 1.9, (B, 1))
    s = np.minimum(
        np.arange(N)[None] * CFG.model.dt * v_ref, cum[:, -1:]
    )
    ref_pos = np.stack(
        [
            np.stack(
                [np.interp(s[b], cum[b], wp[b, :, k]) for k in range(3)], -1
            )
            for b in range(B)
        ],
        0,
    )  # (B, N, 3)
    d = np.diff(ref_pos, axis=1)
    yaw = np.arctan2(d[:, :, 1], d[:, :, 0])
    ref_yaw = np.concatenate([yaw, yaw[:, -1:]], axis=1)  # (B, N)

    seed2 = ref_pos + CFG.corridor.seed_len * np.stack(
        [np.cos(ref_yaw), np.sin(ref_yaw), np.zeros_like(ref_yaw)], -1
    )

    dec = jax.jit(
        jax.vmap(
            jax.vmap(
                lambda p1, p2: decompose_segment(
                    p1, p2, obs, mask, CFG.corridor, CFG.model.nh
                )
            )
        )
    )(jnp.asarray(ref_pos, dtype), jnp.asarray(seed2, dtype))
    A, b = dec.A, dec.b  # (B, N, nh, 3), (B, N, nh)

    weights = nlp.make_stage_weights(CFG.weights, N, final=False, dtype=dtype)
    weights_b = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), weights
    )
    params = nlp.NLPParams(
        xinit=jnp.broadcast_to(jnp.asarray(x0, dtype)[None], (B, 9)),
        ref_pos=jnp.asarray(ref_pos, dtype),
        ref_yaw=jnp.asarray(ref_yaw, dtype),
        f_ext=jnp.asarray(forces, dtype),
        corridor_A=A,
        corridor_b=b,
        weights=weights_b,
    )
    Z0 = jnp.broadcast_to(
        hover_warm_start(jnp.asarray(x0, dtype), mcfg)[None], (B, N, nlp.NZ)
    )
    return bm.ScenarioSet(Z0=Z0, params=params)


@pytest.mark.slow
def test_sharded_tiered_corridor_scenes_bit_exact():
    B = 128  # 16 lanes/device over the 8-device mesh
    scen = _corridor_scenarios(B)
    assert CFG.solver.max_iters == 60  # production iteration budget

    # corridor rows are genuinely active: some stage has a non-bbox row
    nrm = np.linalg.norm(np.asarray(scen.params.corridor_A), axis=-1)
    assert (nrm > 1e-9).sum() > B * CFG.model.N * 6  # more than bbox walls

    res_local = bm.solve_scenarios(scen, CFG)
    ec = np.asarray(res_local.exit_code)
    assert ec.mean() >= 0.9, f"solved {ec.mean()}"

    mesh = pm.make_mesh(shape=(2, 4))
    scen_sh = pm.shard_scenarios(scen, mesh)
    run = pm.make_sharded_solver(CFG, mesh)
    res_sh, stats = run(scen_sh)

    assert len(res_sh.Z.sharding.device_set) == 8
    np.testing.assert_array_equal(
        np.asarray(res_sh.exit_code), ec
    )
    np.testing.assert_array_equal(
        np.asarray(res_sh.iters), np.asarray(res_local.iters)
    )
    # bit-exact per-lane solutions: tier compaction is device-local and the
    # per-shard program is the single-chip path
    np.testing.assert_allclose(
        np.asarray(res_sh.Z), np.asarray(res_local.Z), atol=0.0, rtol=0.0
    )
    assert int(stats.n_solved) == int(ec.sum())
