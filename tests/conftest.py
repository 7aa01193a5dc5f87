"""Test env: force CPU backend with 8 virtual devices so sharding/collective
code paths run in CI without TPU hardware (SURVEY §4.5)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")
