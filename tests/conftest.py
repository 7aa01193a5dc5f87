"""Test env: run on CPU with 8 virtual devices so sharding/collective code
paths run in CI without TPU hardware (SURVEY.md §4.5).

Note: the environment's sitecustomize registers an `axon` TPU backend at
interpreter startup (before this conftest runs), so JAX is already imported
and `JAX_PLATFORMS` cannot be changed. Instead we (a) set XLA_FLAGS before
the lazily-initialized CPU backend is first touched, giving 8 virtual CPU
devices, and (b) make CPU the default device so jit'd tests never hit the
slow remote-compiled TPU path.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax  # noqa: E402

_cpu_devices = jax.devices("cpu")
assert len(_cpu_devices) == 8, (
    "expected 8 virtual CPU devices; XLA_FLAGS was applied too late: "
    f"{len(_cpu_devices)}"
)
jax.config.update("jax_default_device", _cpu_devices[0])
jax.config.update("jax_platform_name", "cpu")

# persistent compile cache (same dir as bench.py / __graft_entry__.py):
# the quick gate's cost is dominated by 3 fused-step CPU compiles; cached
# executables cut `pytest -m quick` from ~5 min to well under 2 on the
# 4-core host (VERDICT r3 #5)
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
