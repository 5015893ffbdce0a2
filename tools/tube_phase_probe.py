"""Micro-profile of the tube phase internals on-chip.

pipeline_scale_probe shows the tube phase at ~650 ms for B=1024 (L=20480
stage-lanes) even after the fixed-structure expm — this probe times each
constituent separately to find the real cost:

  phi      — closed_loop_phi batch (autodiff-free Jacobians + matmul)
  expm18   — expm_fixed on (L*3, 18, 18)
  solve18  — jnp.linalg.solve on (L*3, 18, 18) RHS (L*3, 18, 18)
  expm9    — expm_fixed on (L, 9, 9)
  eigh3    — sqrtm_psd (eigh) on (L, 3, 3)
  qd       — channel_Qd full (3 channels, gramian + combine)
  tubes    — propagate_tubes end-to-end

Usage: python tools/tube_phase_probe.py [B]   (default 1024)
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(B):
    import jax
    import jax.numpy as jnp

    import bench

    bench.setup_cache()

    from forces_resilient_planner_tpu.config import DEFAULT_CONFIG as C
    from forces_resilient_planner_tpu.ops.expm import expm_fixed
    from forces_resilient_planner_tpu.solver.problems import hover_warm_start
    from forces_resilient_planner_tpu.tube import lyapunov as tl

    mcfg = C.model
    N = mcfg.N
    L = B * N
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    x0 = jnp.zeros(9, dtype).at[2].set(1.2)
    Z1 = np.asarray(hover_warm_start(x0, mcfg))
    Zb = jnp.asarray(
        np.tile(Z1[None], (B, 1, 1)) + rng.normal(0, 1e-3, (B, N, 17)), dtype
    )
    K = jnp.asarray(C.tube.K, dtype)

    def timed(fn, margs, reps=6):
        out = fn(margs(0))
        np.asarray(jax.tree.leaves(out)[0])
        lat = []
        for s in range(1, reps + 1):
            a = margs(s)
            t0 = time.perf_counter()
            out = fn(a)
            np.asarray(jax.tree.leaves(out)[0])
            lat.append(time.perf_counter() - t0)
        return float(np.median(lat) * 1e3)

    def mz(s):
        r = np.random.default_rng(900 + s)
        return Zb + jnp.asarray(r.normal(0, 1e-4, Zb.shape), dtype)

    res = {"B": B, "L": L}

    @jax.jit
    def f_phi(Z):
        Zf = Z.reshape(L, 17)
        Phi = jax.vmap(
            lambda z: tl.closed_loop_phi(z[8:17], z[0:4], K, mcfg)
        )(Zf)
        return jnp.sum(Phi)

    res["phi_ms"] = round(timed(f_phi, mz), 2)

    # fixed random 18x18 stacks for the isolated linalg ops
    A18 = jnp.asarray(rng.normal(0, 0.3, (L * 3, 18, 18)), dtype)
    B18 = jnp.asarray(rng.normal(0, 1.0, (L * 3, 18, 18)), dtype)
    A9 = jnp.asarray(rng.normal(0, 0.3, (L, 9, 9)), dtype)
    S3 = jnp.asarray(rng.normal(0, 1.0, (L, 3, 3)), dtype)
    S3 = S3 @ jnp.swapaxes(S3, -1, -2) + 0.1 * jnp.eye(3, dtype=dtype)

    @jax.jit
    def f_expm18(eps):
        return jnp.sum(expm_fixed(A18 + eps))

    res["expm18_ms"] = round(timed(f_expm18, lambda s: jnp.asarray(s * 1e-6, dtype)), 2)

    @jax.jit
    def f_solve18(eps):
        return jnp.sum(jnp.linalg.solve(A18 + jnp.eye(18, dtype=dtype) * (3.0 + eps), B18))

    res["solve18_ms"] = round(timed(f_solve18, lambda s: jnp.asarray(s * 1e-6, dtype)), 2)

    @jax.jit
    def f_expm9(eps):
        return jnp.sum(expm_fixed(A9 + eps))

    res["expm9_ms"] = round(timed(f_expm9, lambda s: jnp.asarray(s * 1e-6, dtype)), 2)

    @jax.jit
    def f_eigh3(eps):
        return jnp.sum(tl.sqrtm_psd(S3 + eps * jnp.eye(3, dtype=dtype)))

    res["eigh3_ms"] = round(timed(f_eigh3, lambda s: jnp.asarray(s * 1e-6, dtype)), 2)

    w_bound = jnp.full((3,), C.tube.ext_noise_bound, dtype)

    @jax.jit
    def f_qd(Z):
        Zf = Z.reshape(L, 17)
        Phi = jax.vmap(
            lambda z: tl.closed_loop_phi(z[8:17], z[0:4], K, mcfg)
        )(Zf)
        Qd = jax.vmap(lambda P: tl.channel_Qd(P, mcfg.dt, w_bound, dtype))(Phi)
        return jnp.sum(Qd)

    res["qd_ms"] = round(timed(f_qd, mz), 2)

    @jax.jit
    def f_tubes(Z):
        t = jax.vmap(lambda z: tl.propagate_tubes(z, mcfg, C.tube, K))(Z)
        return jnp.sum(t.E)

    res["tubes_ms"] = round(timed(f_tubes, mz), 2)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
