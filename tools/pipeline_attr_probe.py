"""Phase-by-phase attribution of the batched-pipeline vs bare-solver gap
(round-5 VERDICT item 7: streamed full pipeline 57.4k steps/s vs 139.6k
bare solves/s at the same batch — where do the extra ms go?).

Times CUMULATIVE PREFIXES of the exact production nmpc_step_batched
(engine/pipeline_batch.py) with scalar-reduced outputs (transfer-free,
see pipeline_scale_probe.py's method note):

  q1  references                      (vmapped sample_references)
  q2  + tube kernel                   (propagate_tubes_batch -> Pallas)
  q3  + corridor kernel               (corridor_seed2 + decompose_stages_lanes)
  q4  + reuse gather-scan             (vmapped reuse_select)
  q5  + tighten + param pack          (tighten_corridor + weight select)
  full + lane-major solve + status    (the whole step)

Marginal phase cost = successive differences (equal dispatch overhead in
every program).  Run AFTER bench.py has warmed the cache.

Usage: python tools/pipeline_attr_probe.py [B ...]   (default 4096)
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
    from forces_resilient_planner_tpu.engine.pipeline import (
        corridor_seed2,
        reuse_select,
    )
    from forces_resilient_planner_tpu.engine.reference import sample_references
    from forces_resilient_planner_tpu.ops import corridor_pallas
    from forces_resilient_planner_tpu.solver import nlp
    from forces_resilient_planner_tpu.tube.lyapunov import (
        propagate_tubes_batch,
        tighten_corridor,
    )

    cfg = DEFAULT_CONFIG
    lean = ge._small_cfg()
    mcfg = cfg.model
    N = mcfg.N
    dtype = jnp.float32

    def p_ref(a):
        return jax.vmap(
            lambda out, path, size, toff: sample_references(
                path, size, toff, last_yaw=out[1, 16],
                pred_pos1=out[1, 8:11], N=N, Ts=mcfg.dt,
            )
        )(a["mpc_output"], a["kino_path"], a["kino_size"], a["t_offset"])

    def p_tube(a):
        ref = p_ref(a)
        tube = propagate_tubes_batch(a["mpc_output"][:, :N], mcfg, cfg.tube)
        return ref, tube

    def p_corr(a):
        ref, tube = p_tube(a)
        seed2 = corridor_seed2(ref, cfg)
        A_all, b_all = corridor_pallas.decompose_stages_lanes(
            ref.ref_pos, seed2, a["obstacles"], a["obstacle_mask"],
            cfg.corridor, mcfg.nh,
        )
        return ref, tube, A_all, b_all

    def p_reuse(a):
        ref, tube, A_all, b_all = p_corr(a)
        A_sel, b_sel, _ = jax.vmap(
            lambda Aa, ba, E, rp: reuse_select(Aa, ba, E, rp, cfg)
        )(A_all, b_all, tube.E, ref.ref_pos)
        return ref, tube, A_sel, b_sel

    def p_pack(a):
        ref, tube, A_sel, b_sel = p_reuse(a)
        b_tight = tighten_corridor(A_sel, b_sel, tube.E)
        B = a["mpc_output"].shape[0]
        weights_n = nlp.make_stage_weights(cfg.weights, N, final=False,
                                           dtype=dtype)
        weights_f = nlp.make_stage_weights(cfg.weights, N, final=True,
                                           dtype=dtype)

        def _select(x, y):
            xn = jnp.broadcast_to(x[None], (B,) + x.shape)
            yn = jnp.broadcast_to(y[None], (B,) + y.shape)
            sel = a["use_final"].reshape((B,) + (1,) * x.ndim)
            return jnp.where(sel, yn, xn)

        weights = jax.tree.map(_select, weights_n, weights_f)
        params = nlp.NLPParams(
            xinit=a["mpc_output"][:, 1, 8:17],
            ref_pos=ref.ref_pos,
            ref_yaw=ref.ref_yaw,
            f_ext=a["f_ext"],
            corridor_A=A_sel,
            corridor_b=b_tight,
            weights=weights,
        )
        return ref, tube, params

    def s(t):
        return sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(t)
        )

    fns = {
        "q1_refs": jax.jit(lambda a: s(p_ref(a))),
        "q2_tube_kernel": jax.jit(lambda a: s(p_tube(a))),
        "q3_corridor_kernel": jax.jit(lambda a: s(p_corr(a))),
        "q4_reuse_scan": jax.jit(lambda a: s(p_reuse(a))),
        "q5_tighten_pack": jax.jit(lambda a: s(p_pack(a))),
    }
    ffull, _ = bench.make_pipeline_fn()

    def timed(fn, margs, reps=12):
        """MIN of `reps` (relay jitter is one-sided, +-15 ms; the min is
        the faithful compute+fixed-dispatch estimate for marginal
        subtraction — medians produced negative phase costs)."""
        out = fn(margs(0))
        np.asarray(jax.tree.leaves(out)[0])
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
        return float(np.min(lat) * 1e3), out

    for B in batches:
        args0 = bench.normalize_pipeline_args(
            ge._example_inputs(
                dataclasses.replace(lean, corridor=cfg.corridor), dtype,
                batch=B,
            )
        )

        def margs(s_):
            a = dict(args0)
            r = np.random.default_rng(500 + s_)
            a["f_ext"] = a["f_ext"] + jnp.asarray(
                r.normal(0, 1e-3, a["f_ext"].shape), dtype)
            a["mpc_output"] = a["mpc_output"] + jnp.asarray(
                r.normal(0, 1e-4, a["mpc_output"].shape), dtype)
            return a

        res = {"B": B}
        prev = 0.0
        marg = {}
        for name, fn in fns.items():
            t, _ = timed(fn, margs)
            res[name + "_ms"] = round(t, 2)
            marg[name] = round(t - prev, 2)
            prev = t
        tf, out = timed(ffull, margs)
        res["full_ms"] = round(tf, 2)
        marg["q6_solve_status"] = round(tf - prev, 2)
        res["solved_frac"] = float(out[1])
        res["iters_mean"] = float(out[2])
        res["steps_per_s"] = round(B / (tf / 1e3), 1)
        res["marginal_ms"] = marg
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    bs = [int(x) for x in sys.argv[1:]] or [4096]
    main(bs)
