"""Force CPU backend with 8 virtual devices for all tests.

Multi-chip sharding is validated on a host-platform mesh; real-TPU benchmarks
run via bench.py. Note: this environment's sitecustomize registers an 'axon'
TPU plugin and re-exports JAX_PLATFORMS=axon, so we must override via
jax.config (env vars alone are not enough).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
