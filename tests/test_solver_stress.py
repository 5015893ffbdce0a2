"""Adversarial solver robustness: near-infeasible corridors, saturated
bounds, force-vs-corridor conflicts.

The FORCES solver carries a filter line search + second-order correction
(FORCESNLPsolver_normal.h:86-107) that earns its keep on exactly these
problems; our IPM uses fraction-to-boundary + NaN guards + masked
convergence.  This suite measures where that difference could matter:

  - an exit code of 1 must NEVER be reported for a solution that violates
    the corridor beyond the hu slack or the variable bounds (the
    safety-critical claim — a wrong "optimal" is worse than a failure);
  - infeasible problems must report exit 0 with finite outputs (the host
    fail ladder consumes them, engine/planner.py);
  - on feasible-but-hard problems the solve rate is measured and bounded.

Reference anchors: exit-code semantics FORCESNLPsolver_normal.h:110-139,
corridor slack hu=1e-5 (mpc_generator_normal.m:14), tightening
forces_normal.cpp:111-136.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from forces_resilient_planner_tpu.config import DEFAULT_CONFIG
from forces_resilient_planner_tpu.solver import ipm, ipm_lanes, nlp
from forces_resilient_planner_tpu.solver.problems import (
    box_corridor,
    hover_to_goal_params,
    hover_warm_start,
)

C = DEFAULT_CONFIG
MCFG = C.model
X0 = np.zeros(9)
X0[2] = 1.2


_jit_solve = jax.jit(
    lambda Z0, params: ipm.solve(Z0, params, MCFG, C.solver)
)


def _solve(params):
    # jitted on purpose: an EAGER ipm.solve dispatches its while_loop as a
    # primitive whose on-demand XLA:CPU compile segfaulted reproducibly
    # when this file ran late in the full suite (~99 tests of compiled
    # state); under jit the same program compiles and runs fine
    Z0 = hover_warm_start(jnp.asarray(X0), MCFG)
    return _jit_solve(Z0, params)


def _violations(Z, params):
    """Max corridor violation and bound violation of a solution."""
    lb, ub = nlp.variable_bounds(MCFG, jnp.float64)
    pos = Z[:, 8:11]
    corr = jnp.einsum("nkj,nj->nk", params.corridor_A, pos) - params.corridor_b
    bound = jnp.maximum(lb[None] - Z, Z - ub[None])
    return float(jnp.max(corr)), float(jnp.max(bound))


def test_empty_corridor_reports_failure():
    """A corridor whose tightened box is EMPTY (b-tightening crossed 0,
    the failure mode of aggressive tube tightening near obstacles) must
    never return exit 1, and outputs must stay finite."""
    p = hover_to_goal_params(X0, np.array([1.0, 0.0, 1.2]), MCFG, C.weights)
    # empty box: x <= 0.5 AND -x <= -0.6 (i.e. x >= 0.6)
    A, b = box_corridor(np.array([0.0, 0.0, 1.2]), np.array([5, 5, 2.0]), MCFG.N)
    b = b.at[:, 0].set(0.5)
    b = b.at[:, 1].set(-0.6)
    p = p._replace(corridor_A=A, corridor_b=b)
    r = _solve(p)
    # taxonomy (round 5): the stuck inequality residual is the primal-
    # infeasibility certificate — the empty corridor must be reported as
    # NOPROGRESS (-7, FORCESNLPsolver_normal.h:130-131), which the host
    # FSM consumes as replan-immediately (engine/planner.py)
    assert int(r.exit_code) == -7, int(r.exit_code)
    assert bool(jnp.all(jnp.isfinite(r.Z)))
    # kkt_error may be non-finite here (the NaN guard tripped): that is
    # the DESIRED interaction with accept_on_maxit, which requires a
    # finite KKT error before desperately accepting a max-iter iterate
    # (engine/pipeline.py) — an empty corridor can never be accepted


def test_start_outside_corridor_recovers_or_fails_honestly():
    """xinit outside the corridor (tightening pushed the wall past the
    vehicle — occurs transiently in flight).  Either the solver recovers
    a corridor-feasible plan (exit 1, violation <= slack + tol) or it
    reports failure; silent violation with exit 1 is the forbidden case."""
    for wall_x in (1.0, 0.5, 0.05, -0.05):
        p = hover_to_goal_params(
            X0, np.array([2.0, 0.0, 1.2]), MCFG, C.weights
        )
        A, b = box_corridor(
            np.array([0.0, 0.0, 1.2]), np.array([5, 5, 2.0]), MCFG.N
        )
        # wall: -x <= -wall_x  (x >= wall_x); start x=0 violates for >0
        b = b.at[:, 1].set(-wall_x)
        p = p._replace(corridor_A=A, corridor_b=b)
        r = _solve(p)
        assert bool(jnp.all(jnp.isfinite(r.Z))), wall_x
        if int(r.exit_code) == 1:
            cv, bv = _violations(r.Z, p)
            # xinit row is pinned by the equality constraint; stages 1..N
            # must satisfy the corridor
            cv_free = float(
                jnp.max(
                    jnp.einsum(
                        "nkj,nj->nk", p.corridor_A[1:], r.Z[1:, 8:11]
                    )
                    - p.corridor_b[1:]
                )
            )
            assert cv_free <= C.solver.corridor_slack + 1e-6, (wall_x, cv_free)
            assert bv <= 1e-6, (wall_x, bv)


def test_saturated_thrust_stays_within_bounds():
    """A heavy downward force + high goal demands thrust beyond the upper
    bound: the accepted solution must saturate AT the bound, never beyond
    (u_max = 2 m g, setup.m:24-28)."""
    p = hover_to_goal_params(
        X0, np.array([0.0, 0.0, 2.5]), MCFG, C.weights,
        f_ext=(0.0, 0.0, -12.0),
    )
    r = _solve(p)
    lb, ub = nlp.variable_bounds(MCFG, jnp.float64)
    assert bool(jnp.all(jnp.isfinite(r.Z)))
    assert float(jnp.max(r.Z[:, 3])) <= float(ub[3]) + 1e-8
    # thrust indeed saturates (the problem demands it)
    assert float(jnp.max(r.Z[:, 3])) >= float(ub[3]) - 0.5


def test_force_conflicts_with_corridor_wall():
    """Strong lateral force pushes the vehicle into a nearby wall while
    the reference pulls along it: outputs finite, accepted solutions
    corridor-feasible."""
    rates = []
    for fy in (0.0, 1.0, 2.0, 4.0, 8.0):
        p = hover_to_goal_params(
            X0, np.array([2.0, 0.0, 1.2]), MCFG, C.weights,
            f_ext=(0.0, fy, 0.0),
            corridor_half=(5.0, 0.45, 2.0),
        )
        r = _solve(p)
        assert bool(jnp.all(jnp.isfinite(r.Z))), fy
        if int(r.exit_code) == 1:
            cv, bv = _violations(r.Z, p)
            assert cv <= C.solver.corridor_slack + 1e-6, (fy, cv)
        rates.append(int(r.exit_code))
    # moderate conflicts must still be solvable (K can hold ~0.45 m off
    # a wall against 2 m/s^2); the extreme cases may honestly fail
    assert rates[0] == 1 and rates[1] == 1, rates


def test_stress_batch_no_false_optimals():
    """Randomized stress batch through the PRODUCTION tiered lane solver:
    random tight/shifted corridors, strong forces, random goals.  Measures
    the solve rate and asserts zero false optimals (exit 1 with corridor
    violation beyond slack) and all-finite outputs."""
    rng = np.random.default_rng(123)
    B = 64
    N = MCFG.N
    params_list = []
    for i in range(B):
        goal = rng.uniform([-2.5, -2.5, 0.6], [2.5, 2.5, 2.2], 3)
        f = rng.uniform(-4, 4, 3)
        half = rng.uniform([0.3, 0.3, 0.4], [4.0, 4.0, 2.0], 3)
        center = 0.5 * (X0[:3] + goal) + rng.uniform(-0.5, 0.5, 3)
        p = hover_to_goal_params(
            X0, goal, MCFG, C.weights, f_ext=tuple(f),
            corridor_center=center, corridor_half=tuple(half),
        )
        params_list.append(p)
    params = jax.tree.map(lambda *a: jnp.stack(a), *params_list)
    Z0 = jnp.tile(hover_warm_start(jnp.asarray(X0), MCFG)[None], (B, 1, 1))
    # single-phase lane solver: the multi-tier program (3 compacted solver
    # phases + safety net) is the largest compile in the suite and
    # segfaulted XLA:CPU when it happened ~100 tests deep (tiered-vs-
    # single bit-exactness is covered by test_ipm_lanes, which runs
    # earlier); the no-false-optimal claim is solver-phase-independent
    scfg = dataclasses.replace(C.solver, tiers=())
    r = jax.jit(
        lambda z, p: ipm_lanes.solve_batch_lanes_tiered(z, p, MCFG, scfg)
    )(Z0, params)

    assert bool(jnp.all(jnp.isfinite(r.Z)))
    ec = np.asarray(r.exit_code)
    solved = ec == 1
    # violation audit on accepted lanes (stages 1..N; stage 0 is pinned
    # to xinit by the equality constraints)
    corr = np.asarray(
        jnp.einsum(
            "bnkj,bnj->bnk", params.corridor_A[:, 1:], r.Z[:, 1:, 8:11]
        )
        - params.corridor_b[:, 1:]
    )
    false_optimal = solved & (corr.max(axis=(1, 2)) > C.solver.corridor_slack + 1e-6)
    assert not false_optimal.any(), np.flatnonzero(false_optimal)
    # the distribution contains genuinely infeasible lanes; the feasible
    # majority must solve
    assert solved.mean() >= 0.5, solved.mean()
    print(f"stress batch solve rate: {solved.mean():.2f}")


def test_exit_code_taxonomy():
    """Exit codes discriminate the reference's return-code families
    (FORCESNLPsolver_normal.h:110-139): 1 OPTIMAL on a feasible problem,
    -7 NOPROGRESS on an infeasible one — for BOTH the single-lane solver
    and the lane-major batched solver, which must agree lane-by-lane."""
    p_ok = hover_to_goal_params(
        X0, np.array([1.0, 0.0, 1.2]), MCFG, C.weights
    )
    p_bad = hover_to_goal_params(
        X0, np.array([1.0, 0.0, 1.2]), MCFG, C.weights
    )
    A, b = box_corridor(
        np.array([0.0, 0.0, 1.2]), np.array([5, 5, 2.0]), MCFG.N
    )
    b_bad = b.at[:, 0].set(0.5).at[:, 1].set(-0.6)   # empty slab
    p_bad = p_bad._replace(corridor_A=A, corridor_b=b_bad)

    r_ok = _solve(p_ok)
    r_bad = _solve(p_bad)
    assert int(r_ok.exit_code) == 1
    assert int(r_bad.exit_code) == -7

    # batched lane-major path classifies identically per lane
    params = jax.tree.map(lambda *a: jnp.stack(a), p_ok, p_bad)
    Z0 = jnp.tile(hover_warm_start(jnp.asarray(X0), MCFG)[None], (2, 1, 1))
    scfg = dataclasses.replace(C.solver, tiers=())
    rb = jax.jit(
        lambda z, p: ipm_lanes.solve_batch_lanes_tiered(z, p, MCFG, scfg)
    )(Z0, params)
    np.testing.assert_array_equal(np.asarray(rb.exit_code), [1, -7])
    assert bool(jnp.all(jnp.isfinite(rb.Z)))
