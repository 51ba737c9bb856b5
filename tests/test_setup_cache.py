"""Setup-cache round trip: save_setup_cache/load_setup_cache must restore
the mesh + derived topology + dofmaps bit-exactly, and the loaded objects
must drive the full cut pipeline to the same answer as the built ones.

Reference role: DOLFINx XDMF mesh checkpointing
(/root/reference/python/demo/demo_poisson.py:75-125)."""
import numpy as np
import pytest

import cutfemx_tpu as cfx
from cutfemx_tpu import fem, io
from cutfemx_tpu.forms.dsl import (TestFunction, TrialFunction, grad,
                                   inner)
from cutfemx_tpu.forms.measure import Measure


@pytest.fixture
def cached(tmp_path):
    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (6, 6, 6))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0]**2 + x[1]**2 + x[2]**2) - 0.6)
    V = cfx.functionspace(mesh, ("Lagrange", 2))
    _ = mesh.facets
    _ = mesh.edges
    path = str(tmp_path / "setup")
    io.save_setup_cache(path, mesh, [Vphi, V])
    return mesh, Vphi, V, phi, path


def test_roundtrip_arrays(cached):
    mesh, Vphi, V, phi, path = cached
    out = io.load_setup_cache(path)
    assert out is not None
    m2, (W1, W2) = out
    np.testing.assert_array_equal(m2.vertices, mesh.vertices)
    np.testing.assert_array_equal(m2.cells, mesh.cells)
    np.testing.assert_array_equal(m2.facets, mesh.facets)
    np.testing.assert_array_equal(m2.facet_cells, mesh.facet_cells)
    np.testing.assert_array_equal(m2.facet_local_index,
                                  mesh.facet_local_index)
    np.testing.assert_array_equal(m2.edges, mesh.edges)
    np.testing.assert_array_equal(m2.cell_edges, mesh.cell_edges)
    np.testing.assert_array_equal(W1.dofmap, Vphi.dofmap)
    np.testing.assert_array_equal(W2.dofmap, V.dofmap)
    assert W2.num_scalar_dofs == V.num_scalar_dofs
    assert W2.dim == V.dim
    assert m2._lattice is not None
    # derived topology was restored, not rebuilt: the cache dict holds it
    assert "facets" in m2._cache and "edges" in m2._cache


def test_loaded_objects_drive_pipeline(cached):
    mesh, Vphi, V, phi, path = cached
    m2, (W1, W2) = io.load_setup_cache(path)
    p2 = cfx.Function(W1, name="phi")
    p2.interpolate(lambda x: np.sqrt(x[0]**2 + x[1]**2 + x[2]**2) - 0.6)

    def asm(msh, Vs, ph):
        cd = cfx.cut(ph)
        inside = cfx.locate_entities(cd, "phi<0")
        vol = cfx.runtime_quadrature(cd, "phi<0", 4)
        dxo = Measure("dx", domain=msh, subdomain_data=[inside, vol])
        u, v = TrialFunction(Vs), TestFunction(Vs)
        a = fem.form(inner(grad(u), grad(v)) * dxo, dtype=np.float64)
        return fem.assemble_matrix(a)

    A1 = asm(mesh, V, phi).to_dense()
    A2 = asm(m2, W2, p2).to_dense()
    assert np.abs(np.asarray(A1) - np.asarray(A2)).max() < 1e-12


def test_missing_path_returns_none(tmp_path):
    assert io.load_setup_cache(str(tmp_path / "nope")) is None


def test_dof_coordinates_restored(cached):
    mesh, Vphi, V, phi, path = cached
    _ = Vphi.dof_coordinates  # force compute
    io.save_setup_cache(path, mesh, [Vphi])
    m2, (W1,) = io.load_setup_cache(path)
    np.testing.assert_array_equal(np.asarray(W1.dof_coordinates),
                                  np.asarray(Vphi.dof_coordinates))
