"""Test harness: force an 8-virtual-device CPU platform.

Multi-chip sharding paths are validated on a simulated mesh per SURVEY.md §4
(CPU-simulated multi-device tests precede real multi-host).

Note: this environment's sitecustomize registers a remote-TPU PJRT plugin at
interpreter startup and pins jax.config jax_platforms to "axon,cpu", so env
vars alone are not enough — we must override the config after import (before
any backend is initialized) or every tiny test op round-trips a network
tunnel to the TPU.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: kernels recompile only when they change.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-test")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"
assert len(jax.devices()) == 8, "expected 8 simulated CPU devices"
