"""Mesh import/export: gmsh .msh (2.2 + 4.1), XDMF round-trip, VTU
output (the DOLFINx IO role the reference rides — demo_poisson.py:75-125,
gmshio.read_from_msh)."""

import numpy as np
import pytest

import cutfemx_tpu as cfx
from cutfemx_tpu import io

MSH22 = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
4
1 0 0 0
2 1 0 0
3 1 1 0
4 0 1 0
$EndNodes
$Elements
6
1 2 2 7 1 1 2 3
2 2 2 7 1 1 3 4
3 1 2 5 10 1 2
4 1 2 5 11 2 3
5 1 2 6 12 3 4
6 1 2 6 13 4 1
$EndElements
"""

MSH41 = """$MeshFormat
4.1 0 8
$EndMeshFormat
$Entities
0 1 1 0
10 0 0 0 1 1 0 1 5 0
1 0 0 0 1 1 0 1 7 1 10
$EndEntities
$Nodes
1 4 1 4
2 1 0 4
1
2
3
4
0 0 0
1 0 0
1 1 0
0 1 0
$EndNodes
$Elements
2 3 1 3
2 1 2 2
1 1 2 3
2 1 3 4
1 10 1 1
3 1 2
$EndElements
"""


def test_read_gmsh_22(tmp_path):
    p = tmp_path / "square.msh"
    p.write_text(MSH22)
    mesh, ct, ft = io.read_gmsh(p)
    assert mesh.cell_type == "triangle"
    assert mesh.num_cells == 2
    assert mesh.num_vertices == 4
    assert mesh.gdim == 2
    # physical tag 7 on both triangles
    assert np.array_equal(ct.values, [7, 7])
    assert set(ft.values.tolist()) == {5, 5, 6, 6} - set()  # tags 5,6
    # facet tag 5 facets are the bottom+right edges
    f5 = ft.find(5)
    mids = mesh.vertices[mesh.facets[f5]].mean(axis=1)
    assert len(f5) == 2
    # mesh is usable: total area = 1
    area = 0.5 * np.abs(np.linalg.det(
        mesh.vertices[mesh.cells[:, 1:]] -
        mesh.vertices[mesh.cells[:, :1]])).sum()
    assert np.isclose(area, 1.0)


def test_read_gmsh_41(tmp_path):
    p = tmp_path / "square41.msh"
    p.write_text(MSH41)
    mesh, ct, ft = io.read_gmsh(p)
    assert mesh.cell_type == "triangle"
    assert mesh.num_cells == 2
    assert np.array_equal(ct.values, [7, 7])  # via $Entities physical map
    assert np.array_equal(ft.values, [5])


def test_solve_on_imported_mesh(tmp_path):
    """A gmsh-imported unstructured mesh drives the standard pipeline."""
    import jax.numpy as jnp
    import scipy.sparse.linalg as spla

    from cutfemx_tpu import fem
    from cutfemx_tpu.forms.dsl import (SpatialCoordinate, TestFunction,
                                       TrialFunction, grad, inner, pi, sin)
    from cutfemx_tpu.forms.measure import Measure

    p = tmp_path / "square.msh"
    p.write_text(MSH22)
    mesh, _, _ = io.read_gmsh(p)
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    u, v = TrialFunction(V), TestFunction(V)
    dx = Measure("dx", domain=mesh)
    A = fem.assemble_matrix(fem.form(inner(grad(u), grad(v)) * dx))
    assert np.abs(A.to_scipy() @ np.ones(V.dim)).max() < 1e-12


def test_xdmf_roundtrip(tmp_path):
    mesh = cfx.mesh.create_rectangle((0., 0.), (1., 2.), (3, 4),
                                     "triangle")
    f = np.sin(mesh.vertices[:, 0]) + mesh.vertices[:, 1]
    vec = np.stack([f, 2 * f], axis=1)
    p = tmp_path / "m.xdmf"
    io.write_xdmf(p, mesh, point_data={"f": f, "v": vec})
    m2, data = io.read_xdmf(p)
    assert m2.cell_type == mesh.cell_type
    assert m2.num_cells == mesh.num_cells
    assert np.allclose(m2.vertices, mesh.vertices)
    assert np.allclose(np.sort(np.sort(m2.cells, 1), 0),
                       np.sort(np.sort(mesh.cells, 1), 0))
    assert np.allclose(data["f"], f)
    assert np.allclose(data["v"], vec)


def test_xdmf_roundtrip_hex(tmp_path):
    mesh = cfx.mesh.create_box((0., 0., 0.), (1., 1., 1.), (2, 2, 2),
                               "hexahedron")
    p = tmp_path / "h.xdmf"
    io.write_xdmf(p, mesh)
    m2, _ = io.read_xdmf(p)
    assert m2.cell_type == "hexahedron"
    assert np.array_equal(m2.cells, mesh.cells)
    assert np.allclose(m2.vertices, mesh.vertices)


def test_vtu_writes(tmp_path):
    mesh = cfx.mesh.create_rectangle((0., 0.), (1., 1.), (2, 2))
    p = tmp_path / "m.vtu"
    io.write_vtu(p, mesh, point_data={"x": mesh.vertices[:, 0]})
    text = p.read_text()
    assert "UnstructuredGrid" in text and "connectivity" in text
