"""Test environment: CPU backend with 8 virtual devices, x64 enabled.

The reference's oracle tests are float64/complex128 (SURVEY.md §4); we run
the suite on the XLA host platform with device emulation so sharding tests
exercise a real 8-device mesh without TPU hardware (SURVEY.md §4 note).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# The environment may pin JAX_PLATFORMS to a hardware backend via
# sitecustomize (overriding the env var); force the CPU host platform for
# the test suite explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
