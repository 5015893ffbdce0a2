"""BASELINE config 5: Monte-Carlo resilience sweep over a device mesh with
collective statistics and chunk checkpointing.

On a real pod slice run under jax.distributed (one process per host; the
actual multi-process initialization + sharded execution path is exercised
by tests/test_multiprocess.py via tests/_mp_sweep_worker.py); on a dev box:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/config5_monte_carlo.py --chunks 4
"""
import argparse
import time

import numpy as np

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--goals", type=int, default=64)
    ap.add_argument("--forces", type=int, default=16)
    ap.add_argument("--ckpt-dir", default="mc_sweep_ckpt")
    args = ap.parse_args()

    import os

    import jax
    if os.environ.get("FRP_CPU"):    # sitecustomize overrides JAX_PLATFORMS
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from forces_resilient_planner_tpu.config import DEFAULT_CONFIG as C
    from forces_resilient_planner_tpu.parallel import mesh as pm
    from forces_resilient_planner_tpu.utils.checkpoint import SweepCheckpointer

    mesh = pm.make_mesh()
    print("mesh:", dict(zip(mesh.axis_names, mesh.devices.shape)))
    ck = SweepCheckpointer(args.ckpt_dir)
    done = ck.done_chunks()
    total_solved = 0
    total_n = 0
    t0 = time.perf_counter()
    for chunk in range(args.chunks):
        if chunk in done:
            print(f"chunk {chunk}: checkpointed, skipping")
            continue
        res, stats = pm.monte_carlo_sweep(
            C, mesh, n_goals=args.goals, n_forces=args.forces,
            seed=1234 + chunk, dtype=jnp.float32,
        )
        ck.save_chunk(chunk, {
            "exit_code": np.asarray(res.exit_code),
            "iters": np.asarray(res.iters),
            "kkt": np.asarray(res.kkt_error),
        })
        total_solved += int(stats.n_solved)
        total_n += int(stats.n)
        print(f"chunk {chunk}: n={int(stats.n)} solved={int(stats.n_solved)} "
              f"mean_iters={float(stats.mean_iters):.1f}")
    dt = time.perf_counter() - t0
    if total_n:
        print(f"sweep: {total_n} scenarios in {dt:.1f} s "
              f"({total_n/dt:.0f} solves/s aggregate), "
              f"resilience rate {total_solved/total_n*100:.2f}%")


if __name__ == "__main__":
    main()
