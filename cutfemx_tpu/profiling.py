"""Lightweight timing/observability utilities.

The reference's observability surface is spdlog timers + phase logs
(SURVEY.md §5: dolfinx Timer spans in the FIM, phase wall-clock logs in
distance.from_stl, ProfileWriter CSVs in the optimization demo). This
module provides the same capabilities: named timer spans that log through
the "cutfemx_tpu" logger, an accumulating registry, and a CSV profile
writer for iteration loops.
"""

from __future__ import annotations

import csv
import logging
import time
from collections import defaultdict
from contextlib import contextmanager

logger = logging.getLogger("cutfemx_tpu")

__all__ = ["Timer", "timings", "reset_timings", "list_timings",
           "ProfileWriter"]

_ACCUM: dict = defaultdict(lambda: [0, 0.0])


@contextmanager
def Timer(name: str, log=True):
    """Context-manager timer span (the dolfinx::common::Timer role,
    fast_iterative.h:220). Accumulates into the module registry."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _ACCUM[name][0] += 1
        _ACCUM[name][1] += dt
        if log:
            logger.info("%s: %.4fs", name, dt)


def timings():
    """{name: (count, total_seconds)}."""
    return {k: tuple(v) for k, v in _ACCUM.items()}


def reset_timings():
    _ACCUM.clear()


def list_timings(print_fn=print):
    """Formatted timing table (dolfinx list_timings role)."""
    rows = sorted(timings().items(), key=lambda kv: -kv[1][1])
    print_fn(f"{'timer':<40s} {'calls':>7s} {'total':>10s} {'avg':>10s}")
    for name, (count, total) in rows:
        print_fn(f"{name:<40s} {count:7d} {total:10.4f} "
                 f"{total / max(count, 1):10.4f}")


class ProfileWriter:
    """Per-iteration CSV profile rows (the optimization demo's
    ProfileWriter, demo_compliance_optimization.py:307-379)."""

    def __init__(self, path, fieldnames):
        self.path = path
        self.fieldnames = list(fieldnames)
        self._fh = open(path, "w", newline="")
        self._writer = csv.DictWriter(self._fh,
                                      fieldnames=self.fieldnames,
                                      extrasaction="ignore")
        self._writer.writeheader()

    def write(self, **row):
        self._writer.writerow(row)
        self._fh.flush()

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
