"""Runtime (cut-cell) quadrature rules — placeholder, implemented in the cut
layer milestone."""

from __future__ import annotations

import numpy as np

__all__ = ["RuntimeQuadratureRules"]


class RuntimeQuadratureRules:
    """Runtime quadrature rules (contract mirrors the reference's
    runintgen.QuadratureRules: kind/tdim/points/weights/offsets/parent_map,
    /root/reference/python/cutfemx/cut.py:22-57). Internally padded for TPU:
    points_padded (n, Qmax, tdim), weights_padded (n, Qmax) with PHYSICAL
    weights (zero padding)."""

    kind = "per_entity"

    def __init__(self, tdim, parent_map, points_padded, weights_padded,
                 parent_cells=None, local_facets=None, physical_points=None):
        self.tdim = int(tdim)
        self.parent_map = np.asarray(parent_map, dtype=np.int32)
        self.points_padded = points_padded
        self.weights_padded = weights_padded
        # facet-hosted rules: background cell + local facet per rule
        self.parent_cells = (self.parent_map if parent_cells is None
                             else np.asarray(parent_cells, np.int32))
        self.local_facets = local_facets
        self._physical_points = physical_points
        self._compact = None

    # -- compact (reference-contract) views ---------------------------------

    def _compact_arrays(self):
        if self._compact is None:
            w = np.asarray(self.weights_padded)
            p = np.asarray(self.points_padded)
            mask = w != 0.0
            counts = mask.sum(axis=1)
            offsets = np.zeros(len(counts) + 1, dtype=np.int64)
            np.cumsum(counts, out=offsets[1:])
            pts = p[mask]
            wts = w[mask]
            self._compact = (pts, wts, offsets, mask)
        return self._compact

    @property
    def points(self):
        return self._compact_arrays()[0]

    @property
    def weights(self):
        return self._compact_arrays()[1]

    @property
    def offsets(self):
        return self._compact_arrays()[2]

    @property
    def total_points(self):
        return int(self.offsets[-1])

    @property
    def mask(self):
        return self._compact_arrays()[3]
