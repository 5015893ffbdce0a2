"""Dual warm start for receding-horizon streaming (VERDICT r3 item 8).

Round-3's warm-start experiments (tools/warmstart_experiment.py) all
re-initialized lam/s/mu from scratch and found the hover PRIMAL start +
large initial barrier optimal on the COLD-start sweep distribution.  This
experiment targets the other distribution — consecutive receding-horizon
ticks — and the untested lever: shifting the FULL primal-dual state one
stage (lam, s, mu_d shifted like Z; last stage duplicated) with mu_init
taken from the shifted point's mean complementarity, vs. the production
shifted-primal + cold-dual start.

Closed loop: one scenario stepped by its own stage-1 prediction (perfect
model), params rebuilt per tick through the public pipeline pieces
(references -> tubes -> corridors -> tighten).  CPU f64.

Usage: python tools/dual_warmstart_experiment.py [T_ticks]
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

from forces_resilient_planner_tpu.config import DEFAULT_CONFIG  # noqa: E402
from forces_resilient_planner_tpu.engine.pipeline import (  # noqa: E402
    build_corridors,
)
from forces_resilient_planner_tpu.engine.reference import (  # noqa: E402
    sample_references,
)
from forces_resilient_planner_tpu.solver import ipm, nlp  # noqa: E402
from forces_resilient_planner_tpu.solver.problems import (  # noqa: E402
    hover_warm_start,
)
from forces_resilient_planner_tpu.tube.lyapunov import (  # noqa: E402
    propagate_tubes,
    tighten_corridor,
)

C = DEFAULT_CONFIG
MCFG = C.model
N = MCFG.N


def make_scene(rng):
    K = 128
    t = np.arange(K) * MCFG.dt
    yaw0 = rng.uniform(-np.pi, np.pi)
    v = rng.uniform(1.0, 1.8)
    path = np.stack(
        [v * t * np.cos(yaw0), v * t * np.sin(yaw0), np.full(K, 1.2)], -1
    )
    M = 512
    obs = rng.uniform([-2, -4, 0], [8, 4, 2.5], (M, 3))
    # keep a tube along the path free
    d = np.abs(obs[:, 1] * np.cos(yaw0) - obs[:, 0] * np.sin(yaw0))
    obs = np.where((d < 0.8)[:, None], obs + np.array([0, 3.0, 0]), obs)
    f_ext = rng.uniform(-1.0, 1.0, 3)
    return jnp.asarray(path), jnp.asarray(obs), jnp.asarray(f_ext)


def tick_params(mpc_output, path, t_off, f_ext, obs):
    ref = sample_references(
        path, jnp.asarray(path.shape[0]), jnp.asarray(t_off),
        last_yaw=mpc_output[1, 16], pred_pos1=mpc_output[1, 8:11],
        N=N, Ts=MCFG.dt,
    )
    tube = propagate_tubes(
        mpc_output[:N], MCFG, C.tube, jnp.asarray(C.tube.K, jnp.float64)
    )
    A_sel, b_sel, _ = build_corridors(
        ref, tube.E, obs, jnp.ones(obs.shape[0], bool), C
    )
    b_t = tighten_corridor(A_sel, b_sel, tube.E)
    w = nlp.make_stage_weights(C.weights, N, final=False, dtype=jnp.float64)
    return nlp.NLPParams(
        xinit=mpc_output[1, 8:17], ref_pos=ref.ref_pos, ref_yaw=ref.ref_yaw,
        f_ext=f_ext, corridor_A=A_sel, corridor_b=b_t, weights=w,
    )


def shift(a):
    return jnp.concatenate([a[1:], a[-1:]], axis=0)


def main(T):
    rng = np.random.default_rng(0)
    n_scen = 6
    iters_a, iters_b, iters_c = [], [], []
    solve = jax.jit(
        lambda Z0, p: ipm.solve(Z0, p, MCFG, C.solver)
    )
    solve_d = jax.jit(
        lambda Z0, p, lam, s, mud, mu: ipm.solve(
            Z0, p, MCFG, C.solver, init_duals=(lam, s, mud, mu)
        )
    )
    tol = max(C.solver.tol_stat, C.solver.tol_comp)
    for sc in range(n_scen):
        path, obs, f_ext = make_scene(rng)
        x0 = jnp.zeros(9).at[2].set(1.2)
        Z = hover_warm_start(x0, MCFG)
        out = jnp.concatenate([Z, Z[-1:]], axis=0)
        prev = None
        for k in range(T):
            p = tick_params(out, path, k * MCFG.dt, f_ext, obs)
            Z0 = out[1 : N + 1]
            rA = solve(Z0, p)
            if prev is not None and int(rA.exit_code) == 1:
                # B: shifted duals + complementarity-scaled mu
                lam_s = shift(prev.lam)
                s_s = shift(prev.s)
                mud_s = shift(prev.mu_d)
                mu_s = jnp.clip(jnp.mean(s_s * mud_s), tol / 10.0, 1.0)
                rB = solve_d(Z0, p, lam_s, s_s, mud_s, mu_s)
                # C: shifted duals, production mu_init (isolates the mu cut)
                rC = solve_d(
                    Z0, p, lam_s, s_s, mud_s,
                    jnp.asarray(C.solver.mu_init, jnp.float64),
                )
                if int(rB.exit_code) == 1 and int(rC.exit_code) == 1:
                    iters_a.append(int(rA.iters))
                    iters_b.append(int(rB.iters))
                    iters_c.append(int(rC.iters))
            if int(rA.exit_code) == 1:
                prev = rA
                Zn = rA.Z
                out = jnp.concatenate([Zn, Zn[-1:]], axis=0)
            else:
                prev = None
        print(
            f"scene {sc}: ticks so far {len(iters_a)} "
            f"A(mean) {np.mean(iters_a):.2f} B {np.mean(iters_b):.2f} "
            f"C {np.mean(iters_c):.2f}",
            flush=True,
        )
    a, b, c = map(np.asarray, (iters_a, iters_b, iters_c))
    print(
        "\nA shifted-primal + cold duals (production): "
        f"mean {a.mean():.2f} p95 {np.percentile(a, 95):.0f} max {a.max()}"
    )
    print(
        "B shifted primal-dual + complementarity mu:  "
        f"mean {b.mean():.2f} p95 {np.percentile(b, 95):.0f} max {b.max()}"
    )
    print(
        "C shifted primal-dual + production mu_init:  "
        f"mean {c.mean():.2f} p95 {np.percentile(c, 95):.0f} max {c.max()}"
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
