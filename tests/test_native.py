"""Native C++ geometry kernels: exact predicates and parity with the
NumPy fallbacks (the role of
/root/reference/cpp/cutfemx/distance/stl/mp_predicates.h)."""

import numpy as np
import pytest

from cutfemx_tpu import native


def test_native_builds():
    assert native.native_available(), "native toolchain build failed"


def test_orient3d_robustness():
    # degenerate / near-coplanar configuration: filter must not flip sign
    a = np.array([0.0, 0.0, 0.0])
    b = np.array([1.0, 0.0, 0.0])
    c = np.array([0.0, 1.0, 0.0])
    # Shewchuk convention: positive when d lies below the CCW plane abc
    assert native.orient3d(a, b, c, np.array([0.0, 0.0, 1.0])) < 0
    assert native.orient3d(a, b, c, np.array([0.0, 0.0, -1.0])) > 0
    assert native.orient3d(a, b, c, np.array([0.3, 0.3, 0.0])) == 0.0
    # tiny perturbations around coplanarity keep a consistent sign
    for eps in (1e-18, 1e-20, 5e-19):
        v = native.orient3d(a, b, c, np.array([0.25, 0.25, eps]))
        assert v < 0, (eps, v)
        v = native.orient3d(a, b, c, np.array([0.25, 0.25, -eps]))
        assert v > 0, (eps, v)


def test_orient3d_batch_matches_det():
    rng = np.random.default_rng(3)
    pa, pb, pc, pd = rng.standard_normal((4, 100, 3))
    out = native.orient3d_batch(pa, pb, pc, pd)
    ref = np.linalg.det(np.stack([pa - pd, pb - pd, pc - pd], axis=1))
    assert np.allclose(out, ref, rtol=1e-12)


def test_parse_stl_records_matches_numpy():
    rng = np.random.default_rng(0)
    n = 17
    floats = rng.standard_normal((n, 12)).astype("<f4")
    raw = np.zeros((n, 50), np.uint8)
    raw[:, :48] = floats.view(np.uint8).reshape(n, 48)
    normals, verts = native.parse_stl_records(raw.ravel())
    assert np.allclose(normals, floats[:, :3].astype(np.float64))
    assert np.allclose(verts.reshape(n, 9),
                       floats[:, 3:].astype(np.float64))


def test_tri_cell_overlap_parity():
    rng = np.random.default_rng(1)
    m = 200
    cells = rng.uniform(-1, 1, (m, 4, 3))
    tris = rng.uniform(-1, 1, (m, 3, 3))
    flags = native.tri_cell_overlap(cells, tris)
    if flags is None:
        pytest.skip("native lib unavailable")
    # parity with the pure-NumPy SAT in distance.stl (force fallback)
    import cutfemx_tpu.distance.stl as stl
    import cutfemx_tpu.native as nat
    lib = nat._LIB
    try:
        nat._LIB = None
        nat._TRIED = True
        ref = stl._tri_cell_overlap(cells, tris)
    finally:
        nat._LIB = lib
    assert np.array_equal(flags, ref)
