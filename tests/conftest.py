"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Mirrors the reference's oracle-based test strategy (SURVEY.md §4): exact
comparisons need f64; multi-device sharding tests run on a virtual CPU mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
