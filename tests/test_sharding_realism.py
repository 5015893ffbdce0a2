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

from forces_resilient_planner_tpu.engine.scenarios import (
    PARITY_SCENE_CFG as CFG,
    corridor_scenarios,
)


def _corridor_scenarios(B: int, dtype=jnp.float64):
    return corridor_scenarios(CFG, B, dtype=dtype)


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
