"""Round-3 ports of five named reference cut-API contracts
(/root/reference/python/tests/test_cut_api.py:288, 1336, 1370, 1399,
527-652) onto the marching/Saye backends."""

import numpy as np

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import ConstantExpr
from cutfemx_tpu.forms.measure import Measure


def _line_level_set():
    """3x3 triangle unit square with phi = x - 0.51
    (test_cut_api.py:19-33)."""
    msh = cfx.mesh.create_rectangle((0.0, 0.0), (1.0, 1.0), (3, 3),
                                    "triangle")
    V = cfx.functionspace(msh, ("Lagrange", 1))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: x[0] - 0.51)
    return msh, phi


def _one(msh):
    return ConstantExpr(1.0)


def _hex_sphere_surface(n):
    msh = cfx.mesh.create_box((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0),
                              (n, n, n), "hexahedron")
    V = cfx.functionspace(msh, ("Lagrange", 1))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: x[0] ** 2 + x[1] ** 2 + x[2] ** 2
                    - 0.65 ** 2)
    cd = cfx.cut(phi)
    cm = cfx.create_cut_mesh(cd, "phi=0", mode="cut_only")
    pv = cm.mesh.vertices[cm.mesh.cells]          # (T, 3, 3)
    area = 0.5 * np.linalg.norm(
        np.cross(pv[:, 1] - pv[:, 0], pv[:, 2] - pv[:, 0]), axis=1).sum()
    return cd, cm, float(area)


def test_mixed_hex_surface_mesh_is_triangulated():
    """Hex-hosted interface meshes emit triangles covering the sphere
    (the reference splits Basix quads on a diagonal,
    test_cut_api.py:288-345; here the hexes march through their 6-tet
    split — the contract is a consistent triangle surface over the cut
    hexes whose area converges to the sphere's)."""
    cd, cm, area4 = _hex_sphere_surface(4)
    assert cm.mesh is not None
    assert cm.mesh.cell_type == "triangle"
    assert cm.mesh.cells.shape[1] == 3
    cut_cells = set(cfx.locate_entities(cd, "phi=0").tolist())
    assert set(cm.parent_index.tolist()).issubset(cut_cells)
    assert np.all(cm.is_cut_cell == 1)
    exact = 4.0 * np.pi * 0.65 ** 2
    _, _, area8 = _hex_sphere_surface(8)
    _, _, area16 = _hex_sphere_surface(16)
    assert abs(area8 - exact) < abs(area4 - exact)
    assert abs(area16 - exact) < abs(area8 - exact)
    assert abs(area16 - exact) / exact < 0.05


def test_runtime_quadratures_algoim_paired_selectors():
    """Paired selector dict returns the same rules as individual calls
    (test_cut_api.py:1336-1367)."""
    msh = cfx.mesh.create_rectangle((0.0, 0.0), (1.0, 1.0), (4, 4),
                                    "quadrilateral")
    Vp = cfx.functionspace(msh, ("Lagrange", 2))
    phi = cfx.Function(Vp, name="phi")
    phi.interpolate(lambda x: (x[0] - 0.5) ** 2 + (x[1] - 0.5) ** 2
                    - 0.2 ** 2)
    cd = cfx.cut(phi)
    inside = cfx.runtime_quadrature(cd, "phi<0", 4, backend="algoim")
    interface = cfx.runtime_quadrature(cd, "phi=0", 4, backend="algoim")
    paired = cfx.runtime_quadratures(cd, ["phi<0", "phi>0", "phi=0"], 4,
                                     backend="algoim")
    assert set(paired) == {"phi<0", "phi>0", "phi=0"}
    np.testing.assert_allclose(np.sum(paired["phi<0"].weights),
                               np.sum(inside.weights))
    np.testing.assert_allclose(np.sum(paired["phi=0"].weights),
                               np.sum(interface.weights))
    assert len(paired["phi>0"].weights) > 0


def test_runtime_quadrature_algoim_interval_interface_on_facets():
    """Codim-2 point rules on interval facets of a quad mesh land at the
    exact polynomial root of a P2 level set (test_cut_api.py:1370-1394):
    weight exactly 1, physical x exactly 0.37."""
    msh = cfx.mesh.create_rectangle((0.0, 0.0), (1.0, 1.0), (4, 4),
                                    "quadrilateral")
    Vp = cfx.functionspace(msh, ("Lagrange", 2))
    phi = cfx.Function(Vp, name="phi")
    phi.interpolate(lambda x: (x[0] - 0.37) * (x[0] + 0.5))
    facets = msh.interior_facets
    cd = cfx.cut(phi, entities=facets, entity_dim=msh.tdim - 1)
    rules = cfx.runtime_quadrature(cd, "phi=0", 4, backend="algoim")
    assert rules.weights.size > 0
    np.testing.assert_allclose(rules.weights, 1.0, rtol=0.0, atol=0.0)
    np.testing.assert_allclose(rules.physical_points[0], 0.37,
                               rtol=1e-12, atol=1e-12)


def test_runtime_quadrature_algoim_embedded_quad_interface_on_3d_facets():
    """Interface segments embedded in quad facets of a hex mesh: total
    length 2.0 at x = 0.37 (test_cut_api.py:1399-1441)."""
    msh = cfx.mesh.create_box((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (2, 2, 2),
                              "hexahedron")
    Vp = cfx.functionspace(msh, ("Lagrange", 2))
    phi = cfx.Function(Vp, name="phi")
    phi.interpolate(lambda x: x[0] - 0.37)
    facets = msh.interior_facets
    cd = cfx.cut(phi, entities=facets, entity_dim=msh.tdim - 1)
    rules = cfx.runtime_quadrature(cd, "phi=0", 4, backend="algoim")
    w = np.asarray(rules.weights)
    assert w.size > 0
    assert np.all(w > 0.0)
    np.testing.assert_allclose(w.sum(), 2.0, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(rules.physical_points[0], 0.37,
                               rtol=1e-12, atol=1e-12)


def test_mixed_standard_runtime_exterior_facet_scalar():
    """Measure('ds', subdomain_data=[standard facets, runtime rules])
    assembles the sum of its standard and runtime parts
    (test_cut_api.py:527-562)."""
    msh, phi = _line_level_set()
    facets = msh.exterior_facets
    cd = cfx.cut(phi, entities=facets, entity_dim=msh.tdim - 1)
    standard = cfx.locate_entities(cd, "phi<0")
    rules = cfx.runtime_quadrature(cd, "phi<0", 2)
    one = _one(msh)

    v_std = float(fem.assemble_scalar(fem.form(
        one * Measure("ds", domain=msh, subdomain_data=standard))))
    v_rt = float(fem.assemble_scalar(fem.form(
        one * Measure("ds", domain=msh, subdomain_data=rules))))
    v_mix = float(fem.assemble_scalar(fem.form(
        one * Measure("ds", domain=msh,
                      subdomain_data=[standard, rules]))))
    assert v_rt > 0.0 and np.isfinite(v_rt)
    np.testing.assert_allclose(v_mix, v_std + v_rt, rtol=1e-12)
    # {phi<0} boundary length: left edge (1.0) + bottom/top up to 0.51
    np.testing.assert_allclose(v_mix, 1.0 + 2 * 0.51, rtol=1e-12)


def test_mixed_standard_runtime_interior_facet_scalar():
    """Same contract on interior facets with a dS measure
    (test_cut_api.py:586-618) plus the raw-facet-ids standard dS
    (test_cut_api.py:622-652)."""
    msh, phi = _line_level_set()
    facets = msh.interior_facets
    cd = cfx.cut(phi, entities=facets, entity_dim=msh.tdim - 1)
    standard = cfx.locate_entities(cd, "phi<0")
    rules = cfx.runtime_quadrature(cd, "phi<0", 2)
    one = _one(msh)

    v_std = float(fem.assemble_scalar(fem.form(
        one * Measure("dS", domain=msh, subdomain_data=standard))))
    v_rt = float(fem.assemble_scalar(fem.form(
        one * Measure("dS", domain=msh, subdomain_data=rules))))
    v_mix = float(fem.assemble_scalar(fem.form(
        one * Measure("dS", domain=msh,
                      subdomain_data=[standard, rules]))))
    assert v_rt > 0.0 and np.isfinite(v_rt)
    np.testing.assert_allclose(v_mix, v_std + v_rt, rtol=1e-12)

    # raw facet ids == the same facets through a tagged measure (here:
    # recomputed directly as total facet length of the standard set)
    fv = msh.vertices[msh.facets[standard]]
    lengths = np.linalg.norm(fv[:, 1] - fv[:, 0], axis=1).sum()
    np.testing.assert_allclose(v_std, lengths, rtol=1e-12)
