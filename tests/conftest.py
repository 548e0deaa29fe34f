"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must run before the first jax import (SURVEY.md §4: mesh tests on CPU via
xla_force_host_platform_device_count).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Keep TF (used only as a parity oracle) quiet and off any accelerator.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")

# Persistent compilation cache: XLA-on-1-CPU-core compiles are the test
# bottleneck; cache across test processes and CLI subprocesses.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU through
# the config API (must happen before any computation runs).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
