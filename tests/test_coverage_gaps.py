"""Coverage for paths exercised indirectly elsewhere: runtime exterior-
facet assembly, cut_only visualisation meshes, STL mesh adaptation."""

import numpy as np

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (SpatialCoordinate, TestFunction,
                                   TrialFunction, dot, grad, inner)
from cutfemx_tpu.forms.measure import Measure


def test_runtime_exterior_facet_assembly():
    """ds-measure with facet-hosted cut rules: integrate x over the part
    of the bottom boundary with {x < 0.51} (assembly path, not just
    weights)."""
    n = 10
    mesh = cfx.mesh.create_unit_square(n)
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: x[0] - 0.51)
    ext = mesh.exterior_facets
    mid = mesh.midpoints(mesh.tdim - 1, ext)
    bottom = ext[np.abs(mid[:, 1]) < 1e-12]
    cd = cfx.cut(phi, bottom, mesh.tdim - 1)
    rules = cfx.runtime_quadrature(cd, "phi<0", 3)
    inside_facets = cfx.locate_entities(cd, "phi<0")
    ds_cut = Measure("ds", domain=mesh,
                     subdomain_data=[inside_facets, rules])
    x = SpatialCoordinate(mesh)
    val = float(fem.assemble_scalar(fem.form(x[0] * ds_cut)))
    assert np.isclose(val, 0.51 ** 2 / 2, atol=1e-12)
    # rank-1 assembly over the runtime ds
    v = TestFunction(V)
    b = np.asarray(fem.assemble_vector(fem.form(x[0] * v * ds_cut)))
    assert np.isclose(b.sum(), 0.51 ** 2 / 2, atol=1e-12)
    # rank-2: boundary mass on the cut part is PSD with correct trace mass
    u = TrialFunction(V)
    M = fem.assemble_matrix(fem.form(u * v * ds_cut)).to_dense()
    assert np.isclose(M.sum(), 0.51, atol=1e-12)
    assert np.allclose(M, M.T)


def test_create_cut_mesh_cut_only_and_interface():
    mesh = cfx.mesh.create_rectangle((-1, -1), (1, 1), (20, 20))
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2) - 0.55)
    cd = cfx.cut(phi)
    cut_only = cfx.create_cut_mesh(cd, "phi<0", mode="cut_only")
    assert (cut_only.is_cut_cell == 1).all()
    # interface mesh: segments approximating the circle
    gamma = cfx.create_cut_mesh(cd, "phi=0")
    assert gamma.mesh.cell_type == "interval"
    seg = gamma.mesh.cell_vertex_coords
    length = np.linalg.norm(seg[:, 1] - seg[:, 0], axis=1).sum()
    assert abs(length - 2 * np.pi * 0.55) < 0.02
    rad = np.linalg.norm(seg.reshape(-1, 2), axis=1)
    assert np.abs(rad - 0.55).max() < 0.01


def test_adapt_mesh_to_stl_3d(tmp_path):
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from test_distance import _sphere_soup
    from cutfemx_tpu.distance.stl import write_stl
    from cutfemx_tpu import distance
    soup = _sphere_soup(r=0.4, n=6)
    path = tmp_path / "s.stl"
    write_stl(path, soup)
    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (4, 4, 4))
    nc0 = mesh.num_cells
    out = distance.adapt_mesh_to_stl(mesh, path, max_iterations=1)
    assert out.num_cells > nc0
    # refinement preserved total volume
    v = out.cell_vertex_coords
    vol = np.abs(np.einsum("ci,ci->c",
                           np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]),
                           v[:, 3] - v[:, 0])).sum() / 6.0
    assert np.isclose(vol, 8.0, atol=1e-9)
    # 2D marked-edge adaptation loop terminates
    edges = distance.refinement_edges_from_stl(mesh, soup, rings=1)
    assert len(edges) > 0


def test_vtu_output(tmp_path):
    """VTU writer produces valid XML for background + cut meshes with
    point/cell data (the reference's XDMF/VTK output role)."""
    import xml.etree.ElementTree as ET
    from cutfemx_tpu import io as cio
    mesh = cfx.mesh.create_rectangle((-1, -1), (1, 1), (8, 8))
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2) - 0.5)
    cd = cfx.cut(phi)
    cm = cfx.create_cut_mesh(cd, "phi<0", mode="full")
    p1 = tmp_path / "bg.vtu"
    cio.write_vtu(p1, mesh,
                  point_data={"phi": np.asarray(phi.x)[:mesh.num_vertices]})
    p2 = tmp_path / "cut.vtu"
    cio.write_cut_mesh(p2, cm, [phi])
    for p in (p1, p2):
        root = ET.parse(p).getroot()
        assert root.tag == "VTKFile"
    # cut file has parent_index cell data
    txt = p2.read_text()
    assert "parent_index" in txt and "is_cut_cell" in txt
