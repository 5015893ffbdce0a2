"""Test harness: run on a virtual 8-device CPU mesh, f64 enabled.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count), per the repo's build rules; the
real-TPU path is exercised by bench.py / __graft_entry__.py.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon sitecustomize force-registers the TPU platform; tests must run on
# the virtual CPU mesh regardless, so override after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent XLA:CPU compile cache, READ-mostly: (a) repeat suite runs
# skip most compiles, (b) late-suite backend_compile_and_load calls have
# segfaulted nondeterministically after ~100 tests of accumulated
# compiler state (observed in test_sharding / test_solver_parity /
# test_solver_stress on different runs) — cache LOADS take a different
# path and shrink the number of live compiles per process.  The WRITE
# path (put_executable_and_time -> CPU executable serialization) has
# ALSO segfaulted late-suite (round 5, test_solver_stress ~100 tests
# deep), so the write threshold is set above any test-sized compile:
# entries are only ever written by short dedicated warm runs
# (python -m pytest tests/test_ipm_lanes.py tests/test_pipeline.py -q
# with the threshold lowered via JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache_cpu"),
)
jax.config.update(
    "jax_persistent_cache_min_compile_time_secs",
    float(os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                         "3600")),
)
