"""FORCES-compatible interface: layout + solve parity.

Proves the flat FORCES parameter block (xinit / x0[340] /
all_parameters[2600], forces_normal.cpp:62-137) and our NLPParams describe
the same problem: packing through the shim and solving must reproduce the
native-path solution exactly, and the tube tightening applied at pack time
must equal the constraint module's.
"""
import jax.numpy as jnp
import numpy as np

from forces_resilient_planner_tpu.config import DEFAULT_CONFIG as C
from forces_resilient_planner_tpu.solver import forces_api as fapi
from forces_resilient_planner_tpu.solver import ipm, nlp
from forces_resilient_planner_tpu.solver.problems import (
    box_corridor,
    hover_to_goal_params,
    hover_warm_start,
)


def _packed_problem(goal, f_ext, tube_E=None):
    x0 = np.zeros(9)
    x0[2] = 1.2
    params = fapi.ForcesParams()
    params.xinit[:] = x0
    fapi.set_stage_weights(
        params,
        C.weights.w_stage_wp, C.weights.w_stage_input, C.weights.w_input_rate,
        C.weights.w_terminal_wp, C.weights.w_terminal_input,
    )
    A, b = box_corridor(0.5 * (x0[:3] + goal), np.array([5.0, 5.0, 2.0]),
                        C.model.N)
    ref_pos = np.tile(goal[None], (fapi.N, 1))
    yaw = np.arctan2(goal[1] - x0[1], goal[0] - x0[0])
    fapi.pack_stage_params(
        params, ref_pos, np.full(fapi.N, yaw), np.asarray(f_ext),
        np.asarray(A), np.asarray(b), tube_E=tube_E,
    )
    Z0 = hover_warm_start(jnp.asarray(x0, jnp.float64), C.model)
    fapi.pack_warm_start(params, np.asarray(Z0))
    return x0, params, Z0


def test_roundtrip_matches_native_params():
    goal = np.array([1.5, 0.8, 1.2])
    x0, params, Z0 = _packed_problem(goal, [0.4, -0.2, 0.0])
    Z0u, p = fapi.unpack_params(params, C, final=False)
    ref = hover_to_goal_params(x0, goal, C.model, C.weights,
                               f_ext=(0.4, -0.2, 0.0))
    np.testing.assert_allclose(np.asarray(Z0u), np.asarray(Z0))
    for name in ("xinit", "ref_pos", "ref_yaw", "f_ext",
                 "corridor_A", "corridor_b"):
        np.testing.assert_allclose(
            np.asarray(getattr(p, name)), np.asarray(getattr(ref, name)),
            err_msg=name, atol=1e-12,
        )
    for name in nlp.StageWeights._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(p.weights, name)),
            np.asarray(getattr(ref.weights, name)), err_msg=name,
        )


def test_shim_solve_matches_direct_solve():
    goal = np.array([2.0, -1.0, 1.4])
    x0, params, Z0 = _packed_problem(goal, [0.0, 0.0, 0.0])
    out, flag, info = fapi.ForcesSolver("normal").solve(params)
    assert flag == 1
    assert info.it > 0 and info.res_eq < 1e-4

    ref = ipm.solve(
        Z0,
        hover_to_goal_params(x0, goal, C.model, C.weights),
        C.model, C.solver,
    )
    Z_shim = np.stack([out[f"x{i + 1:02d}"] for i in range(fapi.N)])
    np.testing.assert_allclose(Z_shim, np.asarray(ref.Z), atol=1e-12)


def test_pack_tightening_matches_reference_rule():
    """b_tilde = b - ||E a^T|| on active rows, zeroed padding rows
    (forces_normal.cpp:111-136)."""
    rng = np.random.default_rng(3)
    E = rng.standard_normal((fapi.N, 3, 3)) * 0.1
    goal = np.array([1.0, 0.0, 1.2])
    _, params, _ = _packed_problem(goal, [0, 0, 0], tube_E=E)
    ap = params.all_parameters.reshape(fapi.N, fapi.NPAR_STAGE)
    A = ap[:, 10:100].reshape(fapi.N, 30, 3)
    b = ap[:, 100:130]
    # padding rows (zero normals) must carry zero offsets
    padding = np.linalg.norm(A, axis=-1) == 0
    assert (b[padding] == 0.0).all()
    # active rows must carry exactly the b - ||E a^T|| shrink
    Araw, braw = box_corridor(
        0.5 * (np.array([0, 0, 1.2]) + goal), np.array([5.0, 5.0, 2.0]),
        C.model.N,
    )
    Araw, braw = np.asarray(Araw), np.asarray(braw)
    active = np.linalg.norm(Araw, axis=-1) > 0
    shrink = np.linalg.norm(
        np.einsum("nij,nkj->nki", E, Araw), axis=-1
    )
    np.testing.assert_allclose(
        b[active], (braw - shrink)[active], atol=1e-12
    )


def test_final_profile_brakes_terminal_velocity():
    goal = np.array([4.0, 0.0, 1.2])
    _, params, _ = _packed_problem(goal, [0, 0, 0])
    fapi.set_stage_weights(
        params,
        C.weights.w_final_stage_wp, C.weights.w_final_stage_input,
        C.weights.w_input_rate,
        C.weights.w_final_terminal_wp, C.weights.w_final_terminal_input,
    )
    out_n, flag_n, _ = fapi.ForcesSolver("normal").solve(params)
    out_f, flag_f, _ = fapi.ForcesSolver("final").solve(params)
    assert flag_n == 1 and flag_f == 1
    v_n = np.linalg.norm(out_n["x20"][11:14])
    v_f = np.linalg.norm(out_f["x20"][11:14])
    assert v_f < 0.5 * v_n, (v_f, v_n)
