"""Cut-layer contract tests, mirroring the oracles of
/root/reference/python/tests/test_cut_api.py (classification, selectors,
runtime quadrature, circle area/perimeter, volume complement)."""

import numpy as np
import pytest

import cutfemx_tpu as cfx
from cutfemx_tpu.mesh import create_unit_cube, create_unit_square


def _line_level_set(n=12):
    mesh = create_unit_square(n)
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: x[0] - 0.51)
    return mesh, phi


def _circle_level_set(n=32, r=0.31, degree=1):
    mesh = cfx.mesh.create_rectangle((-1.0, -1.0), (1.0, 1.0), (n, n))
    V = cfx.functionspace(mesh, ("Lagrange", degree))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2) - r)
    return mesh, phi


def test_classification_partition():
    mesh, phi = _line_level_set()
    cd = cfx.cut(phi)
    inside = cfx.locate_entities(cd, "phi<0")
    outside = cfx.locate_entities(cd, "phi>0")
    interface = cfx.locate_entities(cd, "phi=0")
    assert len(inside) + len(outside) + len(interface) == mesh.num_cells
    assert set(inside) & set(outside) == set()
    # inclusive = strict + interface
    le = cfx.locate_entities(cd, "phi<=0")
    ge = cfx.locate_entities(cd, "phi>=0")
    assert set(le) == set(inside) | set(interface)
    assert set(ge) == set(outside) | set(interface)


def test_zero_dofs_are_interface():
    """A cell with a zero dof value classifies as intersected
    (test_cut_api.py:191)."""
    mesh, phi = _line_level_set(4)
    import jax.numpy as jnp
    phi.x = jnp.zeros_like(phi.x)
    cd = cfx.cut(phi)
    assert len(cfx.locate_entities(cd, "phi=0")) == mesh.num_cells


def test_multi_level_set_or_selector():
    mesh, phi = _line_level_set()
    V = phi.function_space
    cap = cfx.Function(V, name="cap")
    cap.interpolate(lambda x: x[1] - 0.51)
    cd = cfx.cut([phi, cap])
    assert cd.level_set_names == ("phi", "cap")
    both = cfx.locate_entities(cd, "phi=0 or cap=0")
    first = cfx.locate_entities(cfx.cut(phi), "phi=0")
    second = cfx.locate_entities(cfx.cut(cap), "cap=0")
    assert set(both) == set(first) | set(second)
    inter = cfx.locate_entities(cd, "phi<0 and cap<0")
    assert set(inter) == (set(cfx.locate_entities(cd, "phi<0"))
                          & set(cfx.locate_entities(cd, "cap<0")))


def test_default_names_frozen():
    mesh, phi = _line_level_set(4)
    V = phi.function_space
    second = cfx.Function(V)
    second.interpolate(lambda x: x[1] - 0.3)
    cd = cfx.cut([phi, second])
    assert cd.level_set_names == ("phi", "phi1")


def test_update_recuts():
    mesh, phi = _line_level_set()
    cd = cfx.cut(phi)
    before = cfx.locate_entities(cd, "phi=0")
    phi.interpolate(lambda x: x[0] - 0.23)
    cfx.update(cd)
    after = cfx.locate_entities(cd, "phi=0")
    fresh = cfx.locate_entities(cfx.cut(phi), "phi=0")
    assert not np.array_equal(before, after)
    assert np.array_equal(after, fresh)


def test_runtime_quadrature_inclusive_matches_strict():
    _, phi = _line_level_set()
    cd = cfx.cut(phi)
    incl = cfx.runtime_quadrature(cd, "phi<=0", 2)
    strict = cfx.runtime_quadrature(cd, "phi<0", 2)
    assert np.array_equal(incl.parent_map, strict.parent_map)
    assert np.allclose(incl.weights, strict.weights)


def test_volume_complement_sums_to_cell_volume():
    """phi<0 + phi>0 cut rules cover each cut cell exactly
    (test_extensions_cell_aggregation.py:74 volume-fraction oracle)."""
    mesh, phi = _circle_level_set(16)
    cd = cfx.cut(phi)
    neg = cfx.runtime_quadrature(cd, "phi<0", 2)
    pos = cfx.runtime_quadrature(cd, "phi>0", 2)
    wneg = np.asarray(neg.weights_padded).sum(axis=1)
    wpos = np.asarray(pos.weights_padded).sum(axis=1)
    # physical cell volumes of the cut cells
    cells = neg.parent_map
    coords = mesh.cell_vertex_coords[cells]
    e1 = coords[:, 1] - coords[:, 0]
    e2 = coords[:, 2] - coords[:, 0]
    vol = 0.5 * np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
    assert np.allclose(wneg + wpos, vol, rtol=1e-12)
    assert (wneg > 0).all() and (wpos > 0).all()


@pytest.mark.parametrize("degree", [1, 2])
def test_circle_area_and_perimeter(degree):
    """Runtime quadrature integrates the circle area and perimeter
    (test_cut_api.py:1268). P1 level set: O(h^2) geometric error."""
    r = 0.31
    n = 64
    mesh, phi = _circle_level_set(n, r, degree)
    cd = cfx.cut(phi)
    inside = cfx.locate_entities(cd, "phi<0")
    vol_rules = cfx.runtime_quadrature(cd, "phi<0", 3)
    surf_rules = cfx.runtime_quadrature(cd, "phi=0", 3)

    area_cut = float(np.asarray(vol_rules.weights_padded).sum())
    coords = mesh.cell_vertex_coords[inside]
    e1 = coords[:, 1] - coords[:, 0]
    e2 = coords[:, 2] - coords[:, 0]
    area_full = 0.5 * np.abs(e1[:, 0] * e2[:, 1]
                             - e1[:, 1] * e2[:, 0]).sum()
    area = area_cut + area_full
    perim = float(np.asarray(surf_rules.weights_padded).sum())
    h = 2.0 / n
    assert abs(area - np.pi * r ** 2) < 2.0 * h ** 2
    assert abs(perim - 2 * np.pi * r) < 5.0 * h ** 2


def test_interface_normals_point_outward():
    mesh, phi = _circle_level_set(24)
    cd = cfx.cut(phi)
    rules = cfx.runtime_quadrature(cd, "phi=0", 2)
    nrm = np.asarray(rules.normals_padded)
    w = np.asarray(rules.weights_padded)
    # physical points
    from cutfemx_tpu.elements import lagrange_element
    el = lagrange_element(mesh.cell_type, 1)
    pts = np.asarray(rules.points_padded)
    coords = mesh.cell_vertex_coords[rules.parent_cells]
    phys = np.einsum("nqv,nvg->nqg",
                     np.asarray(el.tabulate(pts)), coords)
    mask = w > 0
    radial = phys / np.linalg.norm(phys, axis=-1, keepdims=True)
    dots = np.einsum("nqg,nqg->nq", nrm, radial)[mask]
    assert (dots > 0.9).all()  # outward of {phi<0} = radially outward


def test_facet_hosted_cut_boundary_length():
    """Cut exterior facets: length of {x=0 boundary} ∩ {phi<0}."""
    mesh, phi = _line_level_set(10)  # phi = x - 0.51
    # bottom boundary y=0: facets with midpoint y≈0
    ext = mesh.exterior_facets
    mid = mesh.midpoints(mesh.tdim - 1, ext)
    bottom = ext[np.abs(mid[:, 1]) < 1e-12]
    cd = cfx.cut(phi, bottom, mesh.tdim - 1)
    cut_facets = cfx.locate_entities(cd, "phi=0")
    assert len(cut_facets) >= 1
    rules = cfx.runtime_quadrature(cd, "phi<0", 2)
    inside_facets = cfx.locate_entities(cd, "phi<0")
    mid_in = mesh.midpoints(mesh.tdim - 1, inside_facets)
    full_len = 0.1 * len(inside_facets)
    cut_len = float(np.asarray(rules.weights_padded).sum())
    assert np.isclose(full_len + cut_len, 0.51, atol=1e-12)


def test_sphere_volume_and_area_3d():
    r = 0.4
    n = 12
    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (n, n, n))
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0]**2 + x[1]**2 + x[2]**2) - r)
    cd = cfx.cut(phi)
    inside = cfx.locate_entities(cd, "phi<0")
    vol_rules = cfx.runtime_quadrature(cd, "phi<0", 2)
    surf_rules = cfx.runtime_quadrature(cd, "phi=0", 2)
    coords = mesh.cell_vertex_coords[inside]
    vol_full = np.abs(np.einsum(
        "cij,cij->c", np.cross(coords[:, 1] - coords[:, 0],
                               coords[:, 2] - coords[:, 0])[:, None, :],
        (coords[:, 3] - coords[:, 0])[:, None, :])).sum() / 6.0
    vol = vol_full + float(np.asarray(vol_rules.weights_padded).sum())
    area = float(np.asarray(surf_rules.weights_padded).sum())
    h = 2.0 / n
    assert abs(vol - 4 / 3 * np.pi * r ** 3) < 4 * h ** 2
    assert abs(area - 4 * np.pi * r ** 2) < 10 * h ** 2


def test_ghost_penalty_facets():
    mesh, phi = _circle_level_set(16)
    cd = cfx.cut(phi)
    gp = cfx.ghost_penalty_facets(cd, "phi<0")
    assert len(gp) > 0
    fc = mesh.facet_cells[gp]
    assert (fc[:, 1] >= 0).all()
    cut_cells = set(cfx.locate_entities(cd, "phi=0"))
    active = cut_cells | set(cfx.locate_entities(cd, "phi<0"))
    for f in gp[:50]:
        c0, c1 = mesh.facet_cells[f]
        assert c0 in active and c1 in active
        assert c0 in cut_cells or c1 in cut_cells


def test_interior_facets_for_cells():
    mesh, phi = _line_level_set(6)
    cells = np.arange(10, dtype=np.int32)
    facets = cfx.interior_facets_for_cells(mesh, cells)
    sel = set(cells.tolist())
    for f in facets:
        c0, c1 = mesh.facet_cells[f]
        assert c0 in sel and c1 in sel


def test_create_cut_mesh_area():
    mesh, phi = _circle_level_set(24, 0.31)
    cd = cfx.cut(phi)
    cm = cfx.create_cut_mesh(cd, "phi<0", mode="full")
    assert cm.mesh is not None
    v = cm.mesh.cell_vertex_coords
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    areas = 0.5 * np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
    assert abs(areas.sum() - np.pi * 0.31 ** 2) < 2 * (2 / 24) ** 2
    assert cm.parent_index.shape[0] == cm.mesh.num_cells
    assert set(np.unique(cm.is_cut_cell)) <= {0, 1}


def test_higher_order_cut_approximation():
    """P2 level set + subdivided marching (the reference's
    cut_approximation/max_refinement_iterations options) reduces the
    geometric error by ~(1/2^levels)^2 (test vs linear cut)."""
    r, n = 0.37, 24
    mesh = cfx.mesh.create_rectangle((-1, -1), (1, 1), (n, n))
    V = cfx.functionspace(mesh, ("Lagrange", 2))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: (x[0] ** 2 + x[1] ** 2) - r ** 2)

    errs = {}
    for approx in ("linear", "auto"):
        cd = cfx.cut(phi, cut_approximation=approx)
        inside = cfx.locate_entities(cd, "phi<0")
        vol = cfx.runtime_quadrature(cd, "phi<0", 3)
        coords = mesh.cell_vertex_coords[inside]
        E1 = coords[:, 1] - coords[:, 0]
        E2 = coords[:, 2] - coords[:, 0]
        full = 0.5 * np.abs(E1[:, 0] * E2[:, 1] - E1[:, 1] * E2[:, 0]).sum()
        area = full + float(np.asarray(vol.weights_padded).sum())
        errs[approx] = abs(area - np.pi * r ** 2)
    assert errs["auto"] < errs["linear"] / 8.0, errs


def test_compound_selector_runtime_quadrature():
    """Boolean-region (AND) runtime quadrature: half-disk and
    quarter-disk areas via recursive marching."""
    r, n = 0.48, 40
    mesh = cfx.mesh.create_rectangle((-1, -1), (1, 1), (n, n))
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    circ = cfx.Function(V, name="circ")
    circ.interpolate(lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2) - r)
    half = cfx.Function(V, name="half")
    half.interpolate(lambda x: x[0] + 0.013)  # off-grid plane
    cd = cfx.cut([circ, half])

    rules = cfx.runtime_quadrature(cd, "circ<0 and half<0", 3)
    inside = cfx.locate_entities(cd, "circ<0 and half<0")
    coords = mesh.cell_vertex_coords[inside]
    E1 = coords[:, 1] - coords[:, 0]
    E2 = coords[:, 2] - coords[:, 0]
    full = 0.5 * np.abs(E1[:, 0] * E2[:, 1] - E1[:, 1] * E2[:, 0]).sum()
    area = full + float(np.asarray(rules.weights_padded).sum())
    # exact area of the disk part left of x = -0.013
    d = 0.013
    exact = r * r * np.arccos(d / r) - d * np.sqrt(r * r - d * d)
    h = 2.0 / n
    assert abs(area - exact) < 3 * h ** 2, (area, exact)


def test_union_selector_runtime_quadrature():
    """OR-term boolean-region quadrature by inclusion-exclusion:
    area of {a<0 or b<0} on the unit square."""
    n = 20
    mesh = create_unit_square(n)
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    a = cfx.Function(V, name="a")
    a.interpolate(lambda x: x[0] - 0.313)
    b = cfx.Function(V, name="b")
    b.interpolate(lambda x: x[1] - 0.217)
    cd = cfx.cut([a, b])
    rules = cfx.runtime_quadrature(cd, "a<0 or b<0", 2)
    # full cells strictly inside the union
    strict = cfx.locate_entities(cd, "a<0 or b<0")
    cut_like = np.unique(rules.parent_map)
    full_cells = np.setdiff1d(strict, cut_like)
    coords = mesh.cell_vertex_coords[full_cells]
    e1 = coords[:, 1] - coords[:, 0]
    e2 = coords[:, 2] - coords[:, 0]
    full = 0.5 * np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]).sum()
    area = full + float(np.asarray(rules.weights_padded).sum())
    exact = 1.0 - (1 - 0.313) * (1 - 0.217)
    assert abs(area - exact) < 1e-10, (area, exact)
