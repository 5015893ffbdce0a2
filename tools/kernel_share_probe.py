"""Measure the Pallas factor+backsolve share of one IPM iteration.

Runs k chained factor+backsolve pairs (data-dependent, so the device
cannot overlap them) inside ONE jitted program at bench shapes
(N=20, B=4096, f32); the wall-clock slope between two k values is the
marginal kernel-pair cost, dispatch-overhead-free.  Compare against the
2.11 ms/iteration total from tools/iteration_cost_probe.py to split the
iteration budget into kernel vs XLA-glue time.
"""
import functools
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp

    from forces_resilient_planner_tpu.ops import lqr_pallas as lp

    N, B, nh = 20, 4096, 30
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    def mk(*shape, lo=0.1, hi=1.0):
        return jnp.asarray(rng.uniform(lo, hi, shape), dtype)

    w = tuple(mk(N, B) for _ in range(5))
    sigma = mk(N, 64, B, lo=0.5, hi=2.0)
    Acor = mk(N, nh, 3, B, lo=-1.0, hi=1.0)
    Ax = jnp.broadcast_to(
        jnp.eye(9, dtype=dtype)[None, :, :, None], (N - 1, 9, 9, B)
    ) + 0.05 * mk(N - 1, 9, 9, B, lo=-1, hi=1)
    Bx = 0.05 * mk(N - 1, 9, 4, B, lo=-1, hi=1)
    c = mk(N - 1, 13, B, lo=-0.1, hi=0.1)
    qx = mk(N, 13, B, lo=-1, hi=1)
    qu = mk(N, 4, B, lo=-1, hi=1)
    dx0 = mk(9, B, lo=-0.1, hi=0.1)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(sigma0, qx0, k):
        def body(_, carry):
            sigma_c, qx_c = carry
            fac = lp.lqr_factor_fused_lanes(
                *w, sigma_c, Acor, Ax, Bx, 1e-8, 2.4674
            )
            dxb, du, nu, _ = lp.lqr_backsolve_fused_lanes(
                fac, Ax, Bx, c, qx_c, qu, dx0
            )
            # data dependency serializes the chain without changing scale
            s = 1.0 + 1e-6 * jnp.tanh(dxb[0, 0])
            return sigma_c * s[None, None], qx_c + 1e-6 * nu

        return jax.lax.fori_loop(0, k, body, (sigma0, qx0))

    def run(k):
        t0 = time.perf_counter()
        out = chain(sigma, qx, k)
        jax.block_until_ready(out)
        print(f"[k={k}] compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        lat = []
        for s in range(5):
            t0 = time.perf_counter()
            out = chain(sigma * (1.0 + 1e-4 * s), qx, k)
            jax.block_until_ready(out)
            lat.append(time.perf_counter() - t0)
        m = float(np.min(lat))
        print(f"[k={k}] min {m*1e3:.1f}ms", flush=True)
        return m

    t1 = run(1)
    t9 = run(9)
    pair_ms = (t9 - t1) / 8 * 1e3
    print(
        f"factor+backsolve pair: {pair_ms:.2f}ms "
        f"(vs 2.11ms/iteration total -> XLA glue = "
        f"{2.11 - pair_ms:.2f}ms)",
        flush=True,
    )


if __name__ == "__main__":
    main()
