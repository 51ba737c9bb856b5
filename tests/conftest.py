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

import gc  # noqa: E402

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True, scope="module")
def _release_xla_jit_memory():
    """Drop compiled XLA executables after every test module.

    Root cause (diagnosed round 3): each XLA-CPU compilation JIT-loads
    code through LLVM ORC, costing several persistent mmap regions; the
    full suite accumulates ~65k mappings and dies with SIGSEGV when it
    hits the kernel's vm.max_map_count (65530) — reproduced with a
    /proc/<pid>/maps monitor (maps=65272 at the crash sample, 3/3 runs
    crashed before this fix at ~90% progress). Clearing JAX's compiled
    caches per module releases the executables and their code mappings;
    steady-state map count stays bounded. Cost: cross-module kernel
    recompiles (shapes differ per module anyway)."""
    yield
    jax.clear_caches()
    gc.collect()
