"""Phase split of the batched full pipeline (nmpc_step) on-chip.

Round-3 bench: pipeline_batched_steps_per_s = 665 at B=32 while the bare
lane-major solver streams 150k solves/s — a ~225x gap.  This probe times
each phase of the vmapped nmpc_step separately (references, tubes,
corridors, tighten, solve) plus the lane-major tiered solver on the SAME
NLP parameters, to locate the dominant cost before optimizing.

Usage:  python tools/pipeline_phase_probe.py [B ...]   (default 32 128)
Writes one JSON line per batch size to stdout.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(batches):
    import jax
    import jax.numpy as jnp

    import bench
    import __graft_entry__ as ge

    bench.setup_cache()

    from forces_resilient_planner_tpu.engine.pipeline import (
        build_corridors,
        nmpc_step,
    )
    from forces_resilient_planner_tpu.engine.reference import sample_references
    from forces_resilient_planner_tpu.solver import ipm, ipm_lanes, nlp
    from forces_resilient_planner_tpu.tube.lyapunov import (
        propagate_tubes,
        tighten_corridor,
    )

    cfg = ge._small_cfg()
    mcfg = cfg.model
    N = mcfg.N
    dtype = jnp.float32

    def timed(fn, make_args, reps=8):
        out = fn(*make_args(0))
        jax.tree.map(np.asarray, out)
        lat = []
        for s in range(1, reps + 1):
            a = make_args(s)
            t0 = time.perf_counter()
            out = fn(*a)
            jax.tree.map(np.asarray, out)
            lat.append(time.perf_counter() - t0)
        return float(np.median(lat) * 1e3), out

    for B in batches:
        args0 = ge._example_inputs(cfg, dtype, batch=B)
        rng = np.random.default_rng(0)

        def margs(s, keys=("state_mpc", "f_ext")):
            a = dict(args0)
            r = np.random.default_rng(100 + s)
            for k in keys:
                a[k] = a[k] + jnp.asarray(
                    r.normal(0, 1e-3, a[k].shape), dtype
                )
            # also perturb the warm start so solver work is fresh
            a["mpc_output"] = a["mpc_output"] + jnp.asarray(
                r.normal(0, 1e-4, a["mpc_output"].shape), dtype
            )
            return a

        # ---- phase functions (jitted separately) -------------------------
        @jax.jit
        def f_refs(a):
            return jax.vmap(
                lambda out, path, size, toff: sample_references(
                    path, size, toff, last_yaw=out[1, 16],
                    pred_pos1=out[1, 8:11], N=N, Ts=mcfg.dt,
                )
            )(a["mpc_output"], a["kino_path"], a["kino_size"], a["t_offset"])

        @jax.jit
        def f_tubes(a):
            K = jnp.asarray(cfg.tube.K, dtype)
            return jax.vmap(
                lambda out: propagate_tubes(out[:N], mcfg, cfg.tube, K)
            )(a["mpc_output"])

        @jax.jit
        def f_corr(a, ref, tubeE):
            return jax.vmap(
                lambda r, E, obs, om: build_corridors(r, E, obs, om, cfg)
            )(ref, tubeE, a["obstacles"], a["obstacle_mask"])

        @jax.jit
        def f_tighten(A, b, E):
            return tighten_corridor(A, b, E)

        def make_params(a, ref, A, b_t):
            w = nlp.make_stage_weights(cfg.weights, N, final=False, dtype=dtype)
            wb = jax.tree.map(
                lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), w
            )
            return nlp.NLPParams(
                xinit=a["mpc_output"][:, 1, 8:17],
                ref_pos=ref.ref_pos, ref_yaw=ref.ref_yaw,
                f_ext=a["f_ext"], corridor_A=A, corridor_b=b_t,
                weights=wb,
            )

        @jax.jit
        def f_solve_vmap(Z0, params):
            return jax.vmap(
                lambda z, p: ipm.solve(z, p, mcfg, cfg.solver)
            )(Z0, params)

        @jax.jit
        def f_solve_lanes(Z0, params):
            return ipm_lanes.solve_batch_lanes_tiered(
                Z0, params, mcfg, cfg.solver
            )

        @jax.jit
        def f_full(a):
            return jax.vmap(
                lambda out, path, size, toff, st, f, end, obs, om, fin:
                nmpc_step(out, path, size, toff, st, f, end, obs, om,
                          fin, cfg=cfg).mpc_output
            )(*[a[k] for k in (
                "mpc_output", "kino_path", "kino_size", "t_offset",
                "state_mpc", "f_ext", "end_pt", "obstacles",
                "obstacle_mask", "use_final")])

        res = {"B": B}
        t, ref = timed(f_refs, lambda s: (margs(s),))
        res["refs_ms"] = t
        t, tube = timed(f_tubes, lambda s: (margs(s),))
        res["tubes_ms"] = t
        t, corr = timed(f_corr, lambda s: (margs(s), ref, tube.E))
        res["corridors_ms"] = t
        A_sel, b_sel, _ = corr
        t, b_t = timed(f_tighten, lambda s: (A_sel, b_sel, tube.E))
        res["tighten_ms"] = t

        a0 = margs(0)
        params = make_params(a0, ref, A_sel, b_t)
        Z0 = a0["mpc_output"][:, 1 : N + 1]

        def solver_args(s):
            r = np.random.default_rng(200 + s)
            return (
                Z0 + jnp.asarray(r.normal(0, 1e-4, Z0.shape), dtype),
                params,
            )

        t, rv = timed(f_solve_vmap, solver_args)
        res["solve_vmap_ms"] = t
        res["solve_vmap_solved"] = float(np.mean(np.asarray(rv.exit_code) == 1))
        t, rl = timed(f_solve_lanes, solver_args)
        res["solve_lanes_ms"] = t
        res["solve_lanes_solved"] = float(np.mean(np.asarray(rl.exit_code) == 1))
        t, _ = timed(f_full, lambda s: (margs(s),))
        res["full_step_ms"] = t
        res["full_steps_per_s"] = B / (t / 1e3)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    bs = [int(x) for x in sys.argv[1:]] or [32, 128]
    main(bs)
