"""Host allocator tuning for microVM environments.

This build target runs in a Firecracker microVM with on-demand paging:
freshly mmapped pages fault in at ~15 MB/s, so every large NumPy temporary
(glibc routes allocations above the mmap threshold straight to mmap, and
munmaps them on free) pays seconds of page-fault stalls. Routing large
allocations through the main heap instead — and never trimming it — means
pages fault once and are reused for the rest of the process: measured 3.4 s
-> 0.04 s for a fresh 128 MB temporary.

Set CUTFEMX_NO_MALLOC_TUNING=1 to disable (e.g. for RSS-constrained runs:
the heap high-watermark is retained for the process lifetime).
"""

from __future__ import annotations

import ctypes
import os

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_applied = False
_hp_installed = False


def _build_hugepage_ext():
    """Compile (once, hash-keyed) and import the hugepage allocator
    extension. Returns the module or raises."""
    import hashlib
    import importlib.util
    import platform
    import subprocess
    import sys
    import sysconfig

    import numpy as np

    here = os.path.join(os.path.dirname(__file__), "native")
    src = os.path.join(here, "hugepage_alloc.c")
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    out = os.path.join(
        here, f"_hugepage_alloc_{sys.implementation.cache_tag}"
        f"_{platform.machine()}_{digest}.so")
    if not os.path.exists(out):
        cmd = ["gcc", "-O2", "-shared", "-fPIC",
               "-DNPY_TARGET_VERSION=NPY_1_22_API_VERSION",
               f"-I{sysconfig.get_paths()['include']}",
               f"-I{np.get_include()}", src, "-o", out, "-lpthread"]
        subprocess.run(cmd, check=True, capture_output=True)
    spec = importlib.util.spec_from_file_location(
        "cutfemx_tpu.native._hugepage_alloc", out)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def install_numpy_hugepage_allocator() -> bool:
    """Route NumPy's large buffers through 2MB-aligned hugepage mmaps with
    a recycling pool (measured ~30x faster first touch on this microVM,
    and fault-free steady state). Returns True when active."""
    global _hp_installed
    if _hp_installed:
        return True
    if os.environ.get("CUTFEMX_NO_MALLOC_TUNING"):
        return False
    try:
        mod = _build_hugepage_ext()
        mod.install()
        _hp_installed = True
    except Exception:
        _hp_installed = False
    return _hp_installed


def tune_host_allocator() -> bool:
    """Apply the glibc mallopt tuning once; returns True when active."""
    global _applied
    if _applied:
        return True
    if os.environ.get("CUTFEMX_NO_MALLOC_TUNING"):
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = (libc.mallopt(_M_MMAP_THRESHOLD, 2 ** 31 - 1) == 1
              and libc.mallopt(_M_TRIM_THRESHOLD, 2 ** 31 - 1) == 1)
    except OSError:  # non-glibc platform
        ok = False
    _applied = bool(ok)
    return _applied


tune_host_allocator()
install_numpy_hugepage_allocator()
