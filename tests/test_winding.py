"""Clustered Barnes-Hut winding numbers (distance/winding.py) — the
role of the reference's octree-accelerated generalized winding number
(/root/reference/cpp/cutfemx/distance/winding.h:85-330)."""

import numpy as np

from cutfemx_tpu.distance.winding import (WindingCluster,
                                          winding_numbers)


def _icosphere(subdiv):
    """Subdivided icosahedron on the unit sphere -> (V, T)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], float)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
        np.int64)
    for _ in range(subdiv):
        mids = {}
        vlist = list(verts)

        def mid(i, j):
            key = (min(i, j), max(i, j))
            if key not in mids:
                m = vlist[i] + vlist[j]
                m = m / np.linalg.norm(m)
                mids[key] = len(vlist)
                vlist.append(m)
            return mids[key]

        out = []
        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            out += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        faces = np.array(out, np.int64)
        verts = np.array(vlist)
    return verts, faces


def test_clustered_winding_matches_analytic_sphere():
    verts, faces = _icosphere(4)          # 5120 triangles
    tri = verts[faces]
    cl = WindingCluster(tri, K=64)

    rng = np.random.default_rng(5)
    pts = rng.uniform(-1.6, 1.6, size=(800, 3))
    r = np.linalg.norm(pts, axis=1)
    keep = np.abs(r - 1.0) > 0.15         # stay off the facet band
    pts, r = pts[keep], r[keep]
    w = winding_numbers(pts, cl)
    inside = w > 0.5
    np.testing.assert_array_equal(inside, r < 1.0)
    # values saturate: ~1 inside, ~0 outside
    assert np.abs(w[r < 1.0] - 1.0).max() < 0.05
    assert np.abs(w[r > 1.0]).max() < 0.05


def test_clustered_winding_matches_brute():
    verts, faces = _icosphere(3)          # 1280 triangles
    tri = verts[faces]
    cl = WindingCluster(tri, K=32)
    rng = np.random.default_rng(9)
    pts = rng.uniform(-2.0, 2.0, size=(200, 3))
    w_fast = winding_numbers(pts, cl)

    # brute solid-angle sum
    a = tri[None, :, 0, :] - pts[:, None, :]
    b = tri[None, :, 1, :] - pts[:, None, :]
    c = tri[None, :, 2, :] - pts[:, None, :]
    la = np.linalg.norm(a, axis=-1)
    lb = np.linalg.norm(b, axis=-1)
    lc = np.linalg.norm(c, axis=-1)
    num = np.einsum("ptg,ptg->pt", a, np.cross(b, c))
    den = (la * lb * lc + np.einsum("ptg,ptg->pt", a, b) * lc
           + np.einsum("ptg,ptg->pt", b, c) * la
           + np.einsum("ptg,ptg->pt", a, c) * lb)
    w_brute = np.sum(2.0 * np.arctan2(num, den), axis=1) / (4 * np.pi)

    off = np.abs(np.linalg.norm(pts, axis=1) - 1.0) > 0.1
    assert np.abs(w_fast[off] - w_brute[off]).max() < 0.02


def test_winding_sign_mode_uses_clusters_on_large_soups():
    """from_stl-style signed distance with SignMode.winding_number on a
    >4096-triangle soup agrees with component_anchor away from the
    surface (the reference's cross-mode consistency)."""
    import cutfemx_tpu as cfx
    from cutfemx_tpu.distance.api import (SignMode, compute_signed_distance)
    from cutfemx_tpu.distance.stl import TriSoup

    verts, faces = _icosphere(4)          # 5120 > 4096 -> clustered path
    sverts = 0.55 * verts
    e1 = sverts[faces[:, 1]] - sverts[faces[:, 0]]
    e2 = sverts[faces[:, 2]] - sverts[faces[:, 0]]
    nrm = np.cross(e1, e2)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    soup = TriSoup(sverts, faces.astype(np.int64), nrm,
                   np.arange(len(faces)))
    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (10, 10, 10))
    dw, _ = compute_signed_distance(mesh, soup,
                                    sign_mode=SignMode.winding_number)
    da, _ = compute_signed_distance(mesh, soup,
                                    sign_mode=SignMode.component_anchor)
    dw = np.asarray(dw)
    da = np.asarray(da)
    far = np.abs(da) > 0.1
    np.testing.assert_array_equal(np.sign(dw[far]), np.sign(da[far]))
