"""Parity: the lane-major batched IPM (solver/ipm_lanes.py) must reproduce
vmap(ipm.solve) lane for lane — same exit codes, same iteration counts,
and the same iterates to roundoff (the update formulas are identical; only
array layout and reduction order differ)."""
import jax.numpy as jnp
import numpy as np

from forces_resilient_planner_tpu.config import DEFAULT_CONFIG as C
from forces_resilient_planner_tpu.engine import batch as bm
from forces_resilient_planner_tpu.solver import ipm, ipm_lanes


def _scenarios(dtype=jnp.float64):
    rng = np.random.default_rng(11)
    goals = rng.uniform([-2.5, -2.5, 1.0], [2.5, 2.5, 1.6], (4, 3))
    forces = np.vstack([[0.0, 0.0, 0.0], rng.uniform(-1.5, 1.5, (2, 3))])
    halves = np.array([[5.0, 5.0, 2.0], [2.0, 3.0, 1.2]])
    return bm.make_scenarios(C, goals, forces, halves, dtype=dtype)


def test_lane_major_ipm_matches_vmap_solve():
    sc = _scenarios()
    ref = ipm.solve_batch(sc.Z0, sc.params, C.model, C.solver)
    got = ipm_lanes.solve_batch_lanes(sc.Z0, sc.params, C.model, C.solver)

    np.testing.assert_array_equal(
        np.asarray(got.exit_code), np.asarray(ref.exit_code)
    )
    assert (np.asarray(ref.exit_code) == 1).all()
    np.testing.assert_array_equal(np.asarray(got.iters), np.asarray(ref.iters))
    np.testing.assert_allclose(
        np.asarray(got.Z), np.asarray(ref.Z), rtol=1e-8, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(got.kkt_error), np.asarray(ref.kkt_error),
        rtol=1e-4, atol=1e-10,
    )


def test_lane_major_ipm_f32_controls_close():
    sc64 = _scenarios(jnp.float64)
    sc32 = _scenarios(jnp.float32)
    ref = ipm.solve_batch(sc64.Z0, sc64.params, C.model, C.solver)
    got = ipm_lanes.solve_batch_lanes(sc32.Z0, sc32.params, C.model, C.solver)
    assert (np.asarray(got.exit_code) == 1).all()
    d = np.max(np.abs(np.asarray(got.Z[:, :, 0:4], float)
                      - np.asarray(ref.Z[:, :, 0:4])))
    assert d < 1e-3, d


def test_lane_major_nan_isolation():
    """A poisoned lane (NaN f_ext) must fail alone; its neighbors solve."""
    sc = _scenarios()
    f = np.asarray(sc.params.f_ext).copy()
    f[2] = np.nan
    params = sc.params._replace(f_ext=jnp.asarray(f))
    got = ipm_lanes.solve_batch_lanes(sc.Z0, params, C.model, C.solver)
    ec = np.asarray(got.exit_code)
    # taxonomy: the NaN guard trips with a feasible kept iterate -> -6
    # BADFUNCEVAL (ipm_lanes._state_to_result)
    assert ec[2] == -6, ec[2]
    ok = np.ones(len(ec), bool)
    ok[2] = False
    assert (ec[ok] == 1).all()
    assert np.isfinite(np.asarray(got.Z)[ok]).all()


def test_predictor_corrector_parity_and_convergence():
    """The Mehrotra path (non-default) must also match vmap(ipm.solve)
    lane-for-lane and solve the full grid."""
    import dataclasses

    scfg = dataclasses.replace(C.solver, predictor_corrector=True)
    sc = _scenarios()
    ref = ipm.solve_batch(sc.Z0, sc.params, C.model, scfg)
    got = ipm_lanes.solve_batch_lanes(sc.Z0, sc.params, C.model, scfg)
    assert (np.asarray(ref.exit_code) == 1).all()
    np.testing.assert_array_equal(
        np.asarray(got.exit_code), np.asarray(ref.exit_code)
    )
    np.testing.assert_array_equal(np.asarray(got.iters), np.asarray(ref.iters))
    np.testing.assert_allclose(
        np.asarray(got.Z), np.asarray(ref.Z), rtol=1e-8, atol=1e-8
    )


def test_tiered_solver_bit_identical_when_tail_covers():
    """Tiered compaction must reproduce the single-phase solver exactly
    (same exit codes, iteration counts, iterates) when the tail sub-batch
    covers every unconverged lane; on overflow the full-batch safety-net
    phase finishes the leftover lanes, so results are STILL bit-exact."""
    import dataclasses

    sc = _scenarios()
    ref = ipm_lanes.solve_batch_lanes(sc.Z0, sc.params, C.model, C.solver)
    B = sc.Z0.shape[0]
    scfg = dataclasses.replace(C.solver, tier_phase1=8, tier_frac=1.0)
    got = ipm_lanes.solve_batch_lanes_tiered(sc.Z0, sc.params, C.model, scfg)
    np.testing.assert_array_equal(
        np.asarray(got.exit_code), np.asarray(ref.exit_code)
    )
    np.testing.assert_array_equal(np.asarray(got.iters), np.asarray(ref.iters))
    np.testing.assert_allclose(
        np.asarray(got.Z), np.asarray(ref.Z), rtol=0, atol=0
    )

    # overflow: tail far too small for the unconverged count — the safety
    # net must restore exact single-phase results (this is the guard
    # against tier schedules tuned on one workload silently dropping
    # lanes on a harder scenario distribution)
    assert (np.asarray(ref.iters) > 6).sum() > 4  # genuinely overflows
    got2 = ipm_lanes.solve_lanes_tiered(
        jnp.moveaxis(sc.Z0, 0, -1), ipm_lanes.lanes_params(sc.params),
        C.model, C.solver, 6, 4,
    )
    np.testing.assert_array_equal(
        np.asarray(got2.exit_code), np.asarray(ref.exit_code)
    )
    np.testing.assert_array_equal(
        np.asarray(got2.iters), np.asarray(ref.iters)
    )
    np.testing.assert_allclose(
        np.asarray(got2.Z), np.asarray(ref.Z), rtol=0, atol=0
    )


def test_multitier_solver_bit_identical_when_tails_cover():
    """Multi-level tiered compaction must reproduce the single-phase solver
    exactly when every level's tail covers the unconverged count."""
    import dataclasses

    sc = _scenarios()
    ref = ipm_lanes.solve_batch_lanes(sc.Z0, sc.params, C.model, C.solver)

    # wrapper path (fracs round up to cover the tiny test batch entirely)
    scfg = dataclasses.replace(
        C.solver, tiers=((6, 1.0), (9, 1.0))
    )
    got = ipm_lanes.solve_batch_lanes_tiered(sc.Z0, sc.params, C.model, scfg)
    np.testing.assert_array_equal(
        np.asarray(got.exit_code), np.asarray(ref.exit_code)
    )
    np.testing.assert_array_equal(np.asarray(got.iters), np.asarray(ref.iters))
    np.testing.assert_allclose(
        np.asarray(got.Z), np.asarray(ref.Z), rtol=0, atol=0
    )

    # direct path with genuinely shrinking sub-batches: still exact as long
    # as each level covers the lanes that remain unconverged at its cutoff
    it = np.asarray(ref.iters)
    B = it.size
    lanes1 = int((it > 8).sum())
    lanes2 = int((it > 11).sum())
    if lanes1 >= 1 and lanes2 >= 1:
        got2 = ipm_lanes.solve_lanes_multitier(
            jnp.moveaxis(sc.Z0, 0, -1), ipm_lanes.lanes_params(sc.params),
            C.model, C.solver, ((8, lanes1), (11, lanes2)),
        )
        np.testing.assert_array_equal(
            np.asarray(got2.iters), np.asarray(ref.iters)
        )
        np.testing.assert_allclose(
            np.asarray(got2.Z), np.asarray(ref.Z), rtol=0, atol=0
        )
