"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The session environment pins an experimental TPU platform via sitecustomize,
which initializes JAX config at interpreter start — env vars alone cannot
override it. Setting XLA_FLAGS before the CPU backend is created and then
updating the jax config does.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU treats a collective rendezvous that misses its terminate timeout as
# stuck and ABORTS the process (observed as a flaky "Fatal Python error:
# Aborted" inside jax.Array._value on sharded-train tests). On a contended
# single-core CI host, 8 virtual device threads can legitimately take minutes
# to all reach the rendezvous; raise both timeouts well past any honest run.
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    _flags += (
        " --xla_cpu_collective_timeout_seconds=1200"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = _flags

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on CPU"

# Persistent compilation cache: the suite is dominated by XLA CPU compiles of
# tiny models (single host core); caching them across runs cuts wall time ~3x.
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
