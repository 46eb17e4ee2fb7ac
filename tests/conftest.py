"""Test harness: CPU platform with 8 virtual devices + persistent compile cache.

The host has one CPU core and XLA compiles are slow; the on-disk compilation
cache makes pytest reruns fast. Multi-device tests use the virtual CPU mesh
(the same mechanism the driver uses for the multichip dry run).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sast_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
