"""Exact segment/triangle-triangle intersection predicates and their use in
the ComponentAnchor sign mode (reference: tri_intersection.h:132-186 feeding
sign_region.h:40-185)."""

import numpy as np
import pytest

import cutfemx_tpu as cfx
from cutfemx_tpu.native import (native_available, seg_tri_isect_batch,
                                tri_tri_isect_batch)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native geometry kernels unavailable")


def _tri(a, b, c):
    return np.array([a, b, c], dtype=np.float64)


class TestSegTri:
    def _one(self, p, q, tri):
        return bool(seg_tri_isect_batch(
            np.array([[p, q]], dtype=np.float64), tri[None])[0])

    def test_crossing(self):
        t = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        assert self._one([0.2, 0.2, -1], [0.2, 0.2, 1], t)

    def test_miss_outside_triangle(self):
        t = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        assert not self._one([0.9, 0.9, -1], [0.9, 0.9, 1], t)

    def test_miss_same_side(self):
        t = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        assert not self._one([0.2, 0.2, 0.5], [0.2, 0.2, 1.5], t)

    def test_touching_endpoint_counts(self):
        t = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        assert self._one([0.2, 0.2, 0.0], [0.2, 0.2, 1.0], t)

    def test_touch_vertex_counts(self):
        t = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        assert self._one([0, 0, -1], [0, 0, 1], t)

    def test_coplanar_crossing(self):
        t = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        assert self._one([-0.5, 0.2, 0.0], [0.5, 0.2, 0.0], t)

    def test_coplanar_inside(self):
        t = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        assert self._one([0.1, 0.1, 0.0], [0.2, 0.2, 0.0], t)

    def test_coplanar_miss(self):
        t = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        assert not self._one([1.5, 1.5, 0.0], [2.0, 1.5, 0.0], t)

    def test_near_miss_tiny_gap(self):
        # plane at z = 1e-14 is a miss for a segment reaching only z=0
        t = _tri([0, 0, 1e-14], [1, 0, 1e-14], [0, 1, 1e-14])
        assert not self._one([0.2, 0.2, -1.0], [0.2, 0.2, 0.0], t)


class TestTriTri:
    def _one(self, t1, t2):
        return bool(tri_tri_isect_batch(t1[None], t2[None])[0])

    def test_crossing(self):
        t1 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        t2 = _tri([0.2, 0.2, -0.5], [0.2, 0.2, 0.5], [1.5, 1.5, 0.1])
        assert self._one(t1, t2)

    def test_separated_parallel(self):
        t1 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        t2 = _tri([0, 0, 1], [1, 0, 1], [0, 1, 1])
        assert not self._one(t1, t2)

    def test_crossing_planes_but_disjoint(self):
        t1 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        t2 = _tri([5, 5, -1], [6, 5, 1], [5, 6, 1])
        assert not self._one(t1, t2)

    def test_shared_edge_counts(self):
        t1 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        t2 = _tri([0, 0, 0], [1, 0, 0], [0, 0, 1])
        assert self._one(t1, t2)

    def test_coplanar_overlapping(self):
        t1 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        t2 = _tri([0.1, 0.1, 0], [1.1, 0.1, 0], [0.1, 1.1, 0])
        assert self._one(t1, t2)

    def test_coplanar_disjoint(self):
        t1 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        t2 = _tri([2, 2, 0], [3, 2, 0], [2, 3, 0])
        assert not self._one(t1, t2)

    def test_coplanar_containment(self):
        t1 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        t2 = _tri([0.1, 0.1, 0], [0.2, 0.1, 0], [0.1, 0.2, 0])
        assert self._one(t1, t2)

    def test_near_miss_exact(self):
        # t2 hovers 1e-13 above t1's plane: separated, and the predicate
        # must say so even though a naive epsilon test might not
        t1 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        t2 = _tri([0.1, 0.1, 1e-13], [0.9, 0.1, 1e-13], [0.1, 0.9, 1e-13])
        assert not self._one(t1, t2)


def _box_with_hole_soup():
    """Open surface: box [0.26, 0.74]^3 whose top face has a square hole
    (x, y) in [0.375, 0.625]^2 — every point of space is OUTSIDE (the
    'interior' connects to the exterior through the hole)."""
    lo, hi = 0.26, 0.74
    h0, h1 = 0.375, 0.625
    z0, z1 = lo, hi
    quads = []

    def quad(a, b, c, d):
        quads.append((a, b, c, d))

    # bottom
    quad((lo, lo, z0), (hi, lo, z0), (hi, hi, z0), (lo, hi, z0))
    # sides
    quad((lo, lo, z0), (hi, lo, z0), (hi, lo, z1), (lo, lo, z1))
    quad((lo, hi, z0), (hi, hi, z0), (hi, hi, z1), (lo, hi, z1))
    quad((lo, lo, z0), (lo, hi, z0), (lo, hi, z1), (lo, lo, z1))
    quad((hi, lo, z0), (hi, hi, z0), (hi, hi, z1), (hi, lo, z1))
    # top: four strips around the hole
    quad((lo, lo, z1), (h0, lo, z1), (h0, hi, z1), (lo, hi, z1))
    quad((h1, lo, z1), (hi, lo, z1), (hi, hi, z1), (h1, hi, z1))
    quad((h0, lo, z1), (h1, lo, z1), (h1, h0, z1), (h0, h0, z1))
    quad((h0, h1, z1), (h1, h1, z1), (h1, hi, z1), (h0, hi, z1))

    verts, tris = [], []
    for (a, b, c, d) in quads:
        i = len(verts)
        verts += [a, b, c, d]
        tris += [[i, i + 1, i + 2], [i, i + 2, i + 3]]
    X = np.asarray(verts, dtype=np.float64)
    T = np.asarray(tris, dtype=np.int64)
    e1 = X[T[:, 1]] - X[T[:, 0]]
    e2 = X[T[:, 2]] - X[T[:, 0]]
    N = np.cross(e1, e2)
    N /= np.linalg.norm(N, axis=1, keepdims=True)
    from cutfemx_tpu.distance.stl import TriSoup
    return TriSoup(X, T, N, np.arange(len(T)))


def test_component_anchor_pocket_not_flipped():
    """The open box-with-hole encloses no volume: with exact facet-triangle
    tests the 'interior' stays boundary-connected through the hole and all
    deep vertices are positive. The conservative marking (every facet of
    every candidate cell) seals the hole and flips the pocket negative."""
    from cutfemx_tpu.distance.api import (_component_labels,
                                          _cut_facets_exact,
                                          compute_signed_distance)
    from cutfemx_tpu.distance.stl import build_cell_triangle_map

    mesh = cfx.mesh.create_box((0., 0., 0.), (1., 1., 1.), (8, 8, 8))
    soup = _box_with_hole_soup()
    ctmap = build_cell_triangle_map(mesh, soup)

    # the conservative variant seals the pocket: a non-anchored component
    cut_cells = ctmap.cells_with_triangles()
    cons = np.zeros(mesh.num_facets, bool)
    cons[mesh.cell_facets[cut_cells].ravel()] = True
    lab_cons = _component_labels(mesh, cons)
    mids = mesh.midpoints()
    deep = (np.abs(mids - 0.5).max(axis=1) < 0.1)  # central cells
    assert (lab_cons[deep] > 0).any(), \
        "test geometry should seal the pocket under conservative marking"

    # exact predicates keep the hole open
    exact = _cut_facets_exact(mesh, soup, ctmap)
    assert exact.sum() < cons.sum()
    lab_exact = _component_labels(mesh, exact)
    assert (lab_exact[deep] == 0).all(), \
        "exact facet tests must keep the pocket boundary-connected"

    # end-to-end: signed distance deep inside the pocket stays positive
    d, _ = compute_signed_distance(mesh, soup, ctmap=ctmap,
                                   sign_mode="component_anchor")
    vdeep = np.abs(mesh.vertices - 0.5).max(axis=1) < 0.05
    assert (d[vdeep] > 0).all()
