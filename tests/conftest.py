"""Force CPU backend with 8 virtual devices for all tests (multi-chip
sharding is validated on a host-platform mesh; real-TPU benchmarks run via
bench.py)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
