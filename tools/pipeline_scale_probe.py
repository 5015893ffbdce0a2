"""Scale + phase split of nmpc_step_batched on-chip, transfer-free.

tools/pipeline_phase_probe.py timed phases with full outputs synced to the
host; through the axon relay the device->host transfer dominated and the
phase numbers were unusable (phases summed to ~18x the full step).  This
probe reduces every program's output to ONE scalar on-device, so timings
measure compute + fixed dispatch overhead only.

Programs:
  full@B      — whole nmpc_step_batched (production corridor caps)
  p1@B        — references only
  p2@B        — references + tubes
  p3@B        — references + tubes + corridors (+ tighten)
  p3lean@B    — p3 with the compile-lean entry corridor caps
Marginal phase cost = successive differences (same dispatch overhead).

Usage: python tools/pipeline_scale_probe.py [B ...]  (default 256 1024)
"""
from __future__ import annotations

import dataclasses
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

    from forces_resilient_planner_tpu.config import DEFAULT_CONFIG
    from forces_resilient_planner_tpu.engine.pipeline import build_corridors
    from forces_resilient_planner_tpu.engine.pipeline_batch import (
        nmpc_step_batched,
    )
    from forces_resilient_planner_tpu.engine.reference import sample_references
    from forces_resilient_planner_tpu.tube.lyapunov import (
        propagate_tubes,
        tighten_corridor,
    )

    # production caps, untiered solver (tiering is a separate lever; the
    # lockstep while_loop still exits when every lane converges)
    cfg = DEFAULT_CONFIG
    lean = ge._small_cfg()
    mcfg = cfg.model
    N = mcfg.N
    dtype = jnp.float32
    ARG_KEYS = (
        "mpc_output", "kino_path", "kino_size", "t_offset", "state_mpc",
        "f_ext", "end_pt", "obstacles", "obstacle_mask", "use_final",
    )

    def phase_fns(c):
        def p1(a):
            ref = jax.vmap(
                lambda out, path, size, toff: sample_references(
                    path, size, toff, last_yaw=out[1, 16],
                    pred_pos1=out[1, 8:11], N=N, Ts=mcfg.dt,
                )
            )(a["mpc_output"], a["kino_path"], a["kino_size"], a["t_offset"])
            return ref

        def p2(a):
            ref = p1(a)
            K = jnp.asarray(c.tube.K, dtype)
            tube = jax.vmap(
                lambda out: propagate_tubes(out[:N], mcfg, c.tube, K)
            )(a["mpc_output"])
            return ref, tube

        def p3(a):
            ref, tube = p2(a)
            A_sel, b_sel, _ = jax.vmap(
                lambda r, E, obs, om: build_corridors(r, E, obs, om, c)
            )(ref, tube.E, a["obstacles"], a["obstacle_mask"])
            b_t = tighten_corridor(A_sel, b_sel, tube.E)
            return ref, tube, A_sel, b_t

        def s(t):
            return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(t))

        return (
            jax.jit(lambda a: s(p1(a))),
            jax.jit(lambda a: s(p2(a))),
            jax.jit(lambda a: s(p3(a))),
        )

    f1, f2, f3 = phase_fns(cfg)
    _, _, f3l = phase_fns(lean)

    @jax.jit
    def ffull(a):
        r = nmpc_step_batched(*[a[k] for k in ARG_KEYS], cfg=cfg)
        return (
            jnp.sum(r.mpc_output.astype(jnp.float32))
            + jnp.sum(r.iters.astype(jnp.float32)),
            jnp.mean((r.exit_code == 1).astype(jnp.float32)),
            jnp.mean(r.iters.astype(jnp.float32)),
        )

    def timed(fn, margs, reps=6):
        out = fn(margs(0))
        np.asarray(jax.tree.leaves(out)[0])
        # pre-stage inputs on device: per-call host->device transfer of
        # the perturbed arrays through the relay otherwise adds ~70 ms
        # that no device-resident production loop pays
        sets = []
        for s_ in range(1, reps + 1):
            a = margs(s_)
            jax.block_until_ready(list(a.values()))
            sets.append(a)
        lat = []
        for a in sets:
            t0 = time.perf_counter()
            out = fn(a)
            np.asarray(jax.tree.leaves(out)[0])
            lat.append(time.perf_counter() - t0)
        return float(np.median(lat) * 1e3), out

    for B in batches:
        # example inputs at production obstacle caps
        args0 = ge._example_inputs(
            dataclasses.replace(
                lean, corridor=cfg.corridor
            ),
            dtype, batch=B,
        )

        def margs(s):
            a = dict(args0)
            r = np.random.default_rng(500 + s)
            a["f_ext"] = a["f_ext"] + jnp.asarray(
                r.normal(0, 1e-3, a["f_ext"].shape), dtype)
            a["mpc_output"] = a["mpc_output"] + jnp.asarray(
                r.normal(0, 1e-4, a["mpc_output"].shape), dtype)
            return a

        res = {"B": B}
        t1, _ = timed(f1, margs)
        res["p1_refs_ms"] = round(t1, 2)
        t2, _ = timed(f2, margs)
        res["p2_tubes_ms"] = round(t2, 2)
        t3, _ = timed(f3, margs)
        res["p3_corr_ms"] = round(t3, 2)
        t3l, _ = timed(f3l, margs)
        res["p3lean_corr_ms"] = round(t3l, 2)
        tf, out = timed(ffull, margs)
        res["full_ms"] = round(tf, 2)
        res["solved_frac"] = float(out[1])
        res["iters_mean"] = float(out[2])
        res["steps_per_s"] = round(B / (tf / 1e3), 1)
        res["marginal"] = {
            "tubes_ms": round(t2 - t1, 2),
            "corridors_ms": round(t3 - t2, 2),
            "corridors_lean_ms": round(t3l - t2, 2),
            "solve_ms": round(tf - t3, 2),
        }
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    bs = [int(x) for x in sys.argv[1:]] or [256, 1024]
    main(bs)
