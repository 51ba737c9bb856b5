"""Cut-API contract cases ported (as behavior, not code) from
/root/reference/python/tests/test_cut_api.py — selector algebra, entity
subsets, validation errors, rule-shape contracts, laziness, multi level
sets, cut meshes on facet entities."""

import numpy as np
import pytest

import cutfemx_tpu as cfx


def _line_level_set(n=4, c=0.26):
    mesh = cfx.mesh.create_rectangle((0.0, 0.0), (1.0, 1.0), (n, n),
                                     "triangle")
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: x[1] - c)
    return mesh, phi


def _sphere_level_set(n=6, r=0.33):
    mesh = cfx.mesh.create_box((0, 0, 0), (1, 1, 1), (n, n, n))
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: (x[0] - 0.5) ** 2 + (x[1] - 0.5) ** 2
                    + (x[2] - 0.5) ** 2 - r ** 2)
    return mesh, phi


# -- locate_entities / selectors ---------------------------------------------


def test_locate_entities_default_cells_and_names():
    mesh, phi = _line_level_set()
    cd = cfx.cut(phi)
    assert cd.level_set_names == ("phi",)
    cut_cells = cfx.locate_entities(cd, "phi=0")
    assert cut_cells.size > 0
    # every intersected cell straddles the line y = 0.26
    ymin = mesh.vertices[mesh.cells[cut_cells], 1].min(axis=1)
    ymax = mesh.vertices[mesh.cells[cut_cells], 1].max(axis=1)
    assert (ymin <= 0.26).all() and (ymax >= 0.26).all()


def test_locate_entities_inclusive_selectors_are_unions():
    _, phi = _line_level_set()
    cd = cfx.cut(phi)
    neg = cfx.locate_entities(cd, "phi<0")
    pos = cfx.locate_entities(cd, "phi>0")
    itf = cfx.locate_entities(cd, "phi=0")
    assert np.array_equal(cfx.locate_entities(cd, "phi<=0"),
                          np.union1d(neg, itf))
    assert np.array_equal(cfx.locate_entities(cd, "phi>=0"),
                          np.union1d(pos, itf))


def test_selector_partition_is_disjoint_and_covering():
    mesh, phi = _line_level_set()
    cd = cfx.cut(phi)
    neg = cfx.locate_entities(cd, "phi<0")
    pos = cfx.locate_entities(cd, "phi>0")
    itf = cfx.locate_entities(cd, "phi=0")
    assert np.intersect1d(neg, itf).size == 0
    assert np.intersect1d(neg, pos).size == 0
    assert np.intersect1d(itf, pos).size == 0
    assert np.array_equal(np.sort(np.concatenate([neg, itf, pos])),
                          np.arange(mesh.num_cells))


def test_accepts_linear_no_refinement_options_and_update():
    _, phi = _line_level_set()
    opts = dict(cut_approximation="linear", cut_approximation_order=1,
                max_refinement_iterations=0)
    cd = cfx.cut(phi, **opts)
    first = cfx.locate_entities(cd, "phi=0")
    fresh = cfx.locate_entities(cfx.cut(phi, **opts), "phi=0")
    assert np.array_equal(first, fresh)
    phi.interpolate(lambda x: x[1] - 0.51)
    cfx.update(cd)
    updated = cfx.locate_entities(cd, "phi=0")
    fresh2 = cfx.locate_entities(cfx.cut(phi, **opts), "phi=0")
    assert np.array_equal(updated, fresh2)
    assert not np.array_equal(first, updated)


# -- entity subsets ------------------------------------------------------------


def test_cut_accepts_cell_subset_as_host():
    mesh, phi = _line_level_set()
    subset = np.arange(11, dtype=np.int32)
    cd = cfx.cut(phi, subset, mesh.tdim)
    itf = cfx.locate_entities(cd, "phi=0")
    full = cfx.locate_entities(cfx.cut(phi), "phi=0")
    assert np.array_equal(itf, np.intersect1d(full, subset))


def test_cut_accepts_facet_subset_as_host():
    mesh, phi = _line_level_set()
    facets = np.arange(mesh.num_facets, dtype=np.int32)
    cd = cfx.cut(phi, facets, 1)
    neg = cfx.locate_entities(cd, "phi<0")
    itf = cfx.locate_entities(cd, "phi=0")
    pos = cfx.locate_entities(cd, "phi>0")
    assert itf.size > 0
    assert np.intersect1d(neg, itf).size == 0
    assert np.intersect1d(neg, pos).size == 0
    assert np.intersect1d(itf, pos).size == 0
    assert np.array_equal(np.sort(np.concatenate([neg, itf, pos])), facets)


def test_cut_requires_entity_dim_with_subset():
    _, phi = _line_level_set()
    with pytest.raises(ValueError, match="entity_dim must be supplied"):
        cfx.cut(phi, entities=np.arange(11, dtype=np.int32))


def test_cut_rejects_entity_dim_without_subset():
    _, phi = _line_level_set()
    with pytest.raises(ValueError, match="entity_dim is only valid"):
        cfx.cut(phi, entity_dim=0)


def test_cut_rejects_invalid_level_set_inputs():
    _, phi = _line_level_set()
    with pytest.raises(TypeError, match="expects a Function"):
        cfx.cut("phi")
    with pytest.raises(ValueError, match="requires at least one"):
        cfx.cut([])
    with pytest.raises(TypeError, match="sequence entries"):
        cfx.cut([phi, object()])


# -- create_cut_mesh -----------------------------------------------------------


def test_create_cut_mesh_full_has_cut_and_uncut():
    _, phi = _line_level_set()
    cd = cfx.cut(phi)
    cm = cfx.create_cut_mesh(cd, "phi<0", mode="full")
    assert cm.mesh is not None
    assert cm.parent_index.size == cm.is_cut_cell.size
    assert np.count_nonzero(cm.is_cut_cell) > 0
    assert np.count_nonzero(cm.is_cut_cell == 0) > 0


def test_create_cut_mesh_rejects_interface_full_mode():
    _, phi = _line_level_set()
    cd = cfx.cut(phi)
    with pytest.raises(ValueError, match="mode='full'"):
        cfx.create_cut_mesh(cd, "phi=0", mode="full")


def test_create_cut_mesh_accepts_facet_entities_3d():
    mesh, phi = _sphere_level_set()
    facets = np.arange(mesh.num_facets, dtype=np.int32)
    cd = cfx.cut(phi, facets, mesh.tdim - 1)
    cm = cfx.create_cut_mesh(cd, "phi<0", mode="cut_only")
    assert cm.mesh is not None
    assert cm.mesh.cell_type == "triangle"
    assert (cm.is_cut_cell == 1).all()
    # fragment areas sum to less than the area of their host facets
    host = set(cm.parent_index.tolist())
    assert host.issubset(set(cfx.locate_entities(cd, "phi=0").tolist()))


# -- runtime quadrature contracts ---------------------------------------------


def test_runtime_quadrature_compact_contract():
    mesh, phi = _line_level_set()
    cd = cfx.cut(phi)
    rules = cfx.runtime_quadrature(cd, "phi<0", 2)
    itf = cfx.locate_entities(cd, "phi=0")
    assert rules.kind == "per_entity"
    assert rules.tdim == 2
    assert rules.points.shape[0] == rules.weights.size
    assert rules.offsets[0] == 0
    assert rules.offsets[-1] == rules.weights.size
    assert rules.parent_map.size == rules.offsets.size - 1
    assert set(rules.parent_map.tolist()).issubset(set(itf.tolist()))
    assert (rules.weights > 0).all()


def test_runtime_quadrature_physical_points_are_lazy():
    mesh, phi = _line_level_set()
    cd = cfx.cut(phi)
    rules = cfx.runtime_quadrature(cd, "phi<0", 2)
    assert rules._physical_points is None
    mapped = rules.with_physical_points()
    assert mapped is rules
    assert mapped.physical_points.shape == (mesh.gdim, rules.weights.size)
    assert np.isfinite(mapped.physical_points).all()
    # physical points of the 'phi<0' part lie strictly below the line
    assert (mapped.physical_points[1] <= 0.26 + 1e-12).all()


def test_runtime_quadrature_exterior_facets():
    mesh, phi = _line_level_set()
    ext = mesh.exterior_facets
    cd = cfx.cut(phi, ext, 1)
    rules_lo = cfx.runtime_quadrature(cd, "phi<0", 2)
    rules_hi = cfx.runtime_quadrature(cd, "phi>0", 2)
    cut_f = cfx.locate_entities(cd, "phi=0")
    # the two parts of each cut exterior facet sum to its length
    fl = np.linalg.norm(np.diff(mesh.vertices[mesh.facets[cut_f]],
                                axis=1)[:, 0], axis=1)
    total = float(np.sum(np.asarray(rules_lo.weights_padded))) + \
        float(np.sum(np.asarray(rules_hi.weights_padded)))
    assert np.isclose(total, fl.sum(), rtol=1e-12)
    # only vertical boundary facets are cut by the horizontal line
    mids = mesh.vertices[mesh.facets[cut_f]].mean(axis=1)
    assert np.all(np.isclose(mids[:, 0], 0.0) | np.isclose(mids[:, 0], 1.0))


def test_runtime_quadrature_interior_facets():
    mesh, phi = _line_level_set()
    interior = mesh.interior_facets
    cd = cfx.cut(phi, interior, 1)
    rules = cfx.runtime_quadrature(cd, "phi<0", 2)
    cut_f = cfx.locate_entities(cd, "phi=0")
    assert set(rules.parent_map.tolist()).issubset(set(cut_f.tolist()))
    assert (np.asarray(rules.weights_padded) >= 0).all()
    rules_hi = cfx.runtime_quadrature(cd, "phi>0", 2)
    fl = np.linalg.norm(np.diff(mesh.vertices[mesh.facets[cut_f]],
                                axis=1)[:, 0], axis=1)
    total = float(np.sum(np.asarray(rules.weights_padded))) + \
        float(np.sum(np.asarray(rules_hi.weights_padded)))
    assert np.isclose(total, fl.sum(), rtol=1e-12)


# -- multiple level sets --------------------------------------------------------


def test_multiple_level_sets_or_selector_with_cell_subset():
    mesh, phi = _line_level_set()
    V = phi.function_space
    cap = cfx.Function(V, name="cap")
    cap.interpolate(lambda x: x[0] - 0.51)
    cells = np.arange(11, dtype=np.int32)
    cd = cfx.cut([phi, cap], cells, mesh.tdim)
    assert cd.entity_dim == mesh.tdim
    assert np.array_equal(cd.entities, cells)
    sel = cfx.locate_entities(cd, "phi=0 or cap=0")
    first = cfx.locate_entities(cfx.cut(phi, cells, mesh.tdim), "phi=0")
    second = cfx.locate_entities(cfx.cut(cap, cells, mesh.tdim), "cap=0")
    assert set(sel.tolist()) == set(first.tolist()) | set(second.tolist())
    assert set(sel.tolist()).issubset(set(cells.tolist()))


def test_multiple_level_sets_default_names_are_frozen():
    _, phi = _line_level_set()
    V = phi.function_space
    second = cfx.Function(V)
    second.interpolate(lambda x: x[1] - 0.51)
    cd = cfx.cut([phi, second])
    assert cd.level_set_names == ("phi", "phi1")
    second.name = "renamed_after_cut"
    cd.update()
    assert cd.level_set_names == ("phi", "phi1")
    assert cfx.locate_entities(cd, "phi=0 or phi1=0").size > 0


def test_rejects_duplicate_real_level_set_names():
    _, phi = _line_level_set()
    V = phi.function_space
    phi.name = "fluid"
    second = cfx.Function(V, name="fluid")
    with pytest.raises(ValueError, match="Duplicate level-set"):
        cfx.cut([phi, second])


def test_and_selector_locate_matches_set_intersection():
    mesh, phi = _line_level_set(n=6, c=0.41)
    V = phi.function_space
    cap = cfx.Function(V, name="cap")
    cap.interpolate(lambda x: x[0] - 0.41)
    cd = cfx.cut([phi, cap])
    both = cfx.locate_entities(cd, "phi<0 and cap<0")
    a = cfx.locate_entities(cd, "phi<0")
    b = cfx.locate_entities(cd, "cap<0")
    assert set(both.tolist()) == set(a.tolist()) & set(b.tolist())


# -- ghost penalty / facet bands -------------------------------------------------


def test_ghost_penalty_facets_unique_interior():
    mesh, phi = _sphere_level_set()
    cd = cfx.cut(phi)
    gp = cfx.ghost_penalty_facets(cd, "phi<0")
    assert gp.size == np.unique(gp).size
    assert (mesh.facet_cells[gp, 1] >= 0).all()  # interior facets only
    # each facet touches at least one cut cell
    cut_cells = set(cfx.locate_entities(cd, "phi=0").tolist())
    fc = mesh.facet_cells[gp]
    assert all(int(a) in cut_cells or int(b) in cut_cells
               for a, b in fc)


def test_runtime_quadrature_algoim_rejects_simplex_hosts():
    """Reference contract test_cut_api.py:1304: the algoim backends only
    accept quad/hex host cells."""
    _, phi = _line_level_set()
    cd = cfx.cut(phi)
    with pytest.raises(ValueError, match="quadrilateral/hexahedron"):
        cfx.runtime_quadrature(cd, "phi<0", 2, backend="algoim")
    with pytest.raises(ValueError, match="unknown backend"):
        cfx.runtime_quadrature(cd, "phi<0", 2, backend="nope")


# -- assembly contract ports (test_cut_api.py:504-676, 1199-1266) -------------


def test_form_assembles_runtime_exterior_facet_scalar():
    """Reference :504 — a pure-runtime ds form assembles; the scalar is
    exactly the sum of the (physical) runtime weights."""
    from cutfemx_tpu import fem
    from cutfemx_tpu.forms.measure import Measure
    mesh, phi = _line_level_set()
    ext = mesh.exterior_facets
    cd = cfx.cut(phi, ext, 1)
    cut_f = cfx.locate_entities(cd, "phi=0")
    rules = cfx.runtime_quadrature(cd, "phi<0", 2)
    ds_rt = Measure("ds", domain=mesh, subdomain_data=rules)
    val = float(fem.assemble_scalar(fem.form(1.0 * ds_rt)))
    assert set(cut_f.tolist()).issubset(set(rules.parent_map.tolist()))
    assert np.isfinite(val) and val > 0.0
    np.testing.assert_allclose(
        val, float(np.sum(np.asarray(rules.weights_padded))), rtol=1e-13)


def test_form_assembles_runtime_interior_facet_scalar():
    """Reference :565 — a pure-runtime dS form assembles; the scalar is
    exactly the sum of the (physical) runtime weights."""
    from cutfemx_tpu import fem
    from cutfemx_tpu.forms.measure import Measure
    mesh, phi = _line_level_set()
    interior = mesh.interior_facets
    cd = cfx.cut(phi, interior, 1)
    cut_f = cfx.locate_entities(cd, "phi=0")
    rules = cfx.runtime_quadrature(cd, "phi<0", 2)
    dS_rt = Measure("dS", domain=mesh, subdomain_data=rules)
    val = float(fem.assemble_scalar(fem.form(1.0 * dS_rt)))
    assert set(rules.parent_map.tolist()).issubset(set(cut_f.tolist()))
    assert np.isfinite(val) and val > 0.0
    np.testing.assert_allclose(
        val, float(np.sum(np.asarray(rules.weights_padded))), rtol=1e-13)


def test_form_assembles_standard_raw_interior_facet_ids():
    """Reference :622 — a standard dS integral accepts a RAW facet-id
    array as subdomain_data (no runtime data involved) and equals the
    summed facet measure."""
    from cutfemx_tpu import fem
    from cutfemx_tpu.forms.measure import Measure
    mesh, phi = _line_level_set()
    interior = mesh.interior_facets
    cd = cfx.cut(phi, interior, 1)
    std_f = cfx.locate_entities(cd, "phi<0")
    dS_raw = Measure("dS", domain=mesh, subdomain_data=std_f)
    val = float(fem.assemble_scalar(fem.form(1.0 * dS_raw)))
    fl = np.linalg.norm(np.diff(mesh.vertices[mesh.facets[std_f]],
                                axis=1)[:, 0], axis=1)
    np.testing.assert_allclose(val, fl.sum(), rtol=1e-12)


def test_form_assembles_runtime_interior_facet_jump_matrix():
    """Reference :652 — a DG1 jump-jump matrix on a runtime dS measure
    assembles to a finite, nonzero, symmetric matrix that annihilates
    constants (jump of a constant is zero)."""
    from cutfemx_tpu import fem
    from cutfemx_tpu.forms.dsl import TestFunction, TrialFunction, jump
    from cutfemx_tpu.forms.measure import Measure
    mesh, phi = _line_level_set()
    interior = mesh.interior_facets
    cd = cfx.cut(phi, interior, 1)
    rules = cfx.runtime_quadrature(cd, "phi<0", 2)
    V = cfx.functionspace(mesh, ("DG", 1))
    u, v = TrialFunction(V), TestFunction(V)
    a = jump(u) * jump(v) * Measure("dS", domain=mesh,
                                    subdomain_data=rules)
    A = fem.assemble_matrix(fem.form(a)).to_scipy().tocsr()
    nrm2 = (A.multiply(A)).sum()
    assert np.isfinite(nrm2) and nrm2 > 0.0
    assert abs(A - A.T).max() < 1e-12
    ones = np.ones(V.dim)
    assert np.abs(A @ ones).max() < 1e-12


def test_standard_only_form_active_domain_allows_no_inactive_dofs():
    """Reference :1199 — a purely-standard form's active domain covers
    every cell and deactivation is a no-op."""
    from cutfemx_tpu import fem
    from cutfemx_tpu.forms.dsl import (TestFunction, TrialFunction, grad,
                                       inner)
    from cutfemx_tpu.forms.measure import Measure
    mesh, _ = _line_level_set()
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    u, v = TrialFunction(V), TestFunction(V)
    a = fem.form(inner(grad(u), grad(v)) * Measure("dx", domain=mesh))
    dom = fem.active_domain(a)
    np.testing.assert_array_equal(
        dom.active_cells, np.arange(mesh.num_cells, dtype=np.int32))
    assert dom.inactive_dofs.size == 0
    A = fem.assemble_matrix(a)
    before = A.to_scipy().tocsr().copy()
    fem.deactivate_outside(A, None, dom)
    assert abs(A.to_scipy().tocsr() - before).max() == 0.0


def test_active_domain_supports_mixed_space():
    """Reference :1221 — active_domain on a monolithic mixed-space form
    collects cells from the runtime+standard domains per part; the
    deactivated rhs is zero on inactive dofs."""
    from cutfemx_tpu import fem
    from cutfemx_tpu.forms.dsl import (MixedFunctionSpace, TestFunctions,
                                       TrialFunctions, inner)
    from cutfemx_tpu.forms.measure import Measure
    mesh, phi = _line_level_set()
    cd = cfx.cut(phi)
    inside = cfx.locate_entities(cd, "phi<0")
    rules = cfx.runtime_quadrature(cd, "phi<0", 2)
    dxi = Measure("dx", domain=mesh, subdomain_data=[inside, rules])
    V = cfx.functionspace(mesh, ("Lagrange", 1), shape=(2,))
    Q = cfx.functionspace(mesh, ("Lagrange", 1))
    W = MixedFunctionSpace(V, Q)
    (u, p) = TrialFunctions(W)
    (v, q) = TestFunctions(W)
    a = fem.form((inner(u, v) + p * q) * dxi)
    L = fem.form((v[0] + q) * dxi)
    A = fem.assemble_matrix(a)
    b = np.array(fem.assemble_vector(L))
    dom = fem.active_domain(a)
    expected = np.unique(np.concatenate([inside, rules.parent_map]))
    for part in dom.domains:
        np.testing.assert_array_equal(part.active_cells, expected)
    assert dom.inactive_dofs.size > 0
    fem.deactivate_outside(A, b, dom)
    np.testing.assert_allclose(b[dom.inactive_dofs], 0.0)


def test_deactivation_removes_old_selector_api():
    """Reference :1263 — the old selector-based deactivation entry
    points do not exist; ActiveDomain is the only path."""
    from cutfemx_tpu import fem
    assert not hasattr(fem, "deactivate")
    assert not hasattr(fem, "locate_dofs")


def test_cut_function_uses_cut_mesh_parent_map():
    """Reference :391 — cut_function interpolates a background Function
    onto the cut visualization mesh via parent_index; parent-cell values
    match the background values at the cut-mesh vertex coordinates."""
    from cutfemx_tpu import fem
    mesh, phi = _line_level_set()
    cd = cfx.cut(phi)
    cm = cfx.create_cut_mesh(cd, "phi<0", "full")
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    f = cfx.Function(V)
    f.interpolate(lambda x: 2.0 * x[0] + 3.0 * x[1])
    fc = fem.cut_function(f, cm)
    xs = np.asarray(fc.function_space.mesh.vertices)
    np.testing.assert_allclose(np.asarray(fc.x),
                               2.0 * xs[:, 0] + 3.0 * xs[:, 1],
                               atol=1e-12)


def test_level_set_value_assembles_runtime_cell_scalar():
    """Reference :972 — the level_set_value quadrature field assembles
    inside a runtime cell form; for the linear phi = y - c the integral
    of phi over the cut-cell {phi<0} strips is analytic."""
    from cutfemx_tpu import fem
    from cutfemx_tpu.forms.measure import Measure
    mesh, phi = _line_level_set(n=4, c=0.26)
    cd = cfx.cut(phi)
    vol = cfx.runtime_quadrature(cd, "phi<0", 3)
    f = cfx.level_set_value(phi)
    dxr = Measure("dx", domain=mesh, subdomain_data=vol)
    val = float(fem.assemble_scalar(fem.form(f * dxr)))
    # cut cells span y in [0.25, 0.5]; the {phi<0} part is y in
    # [0.25, 0.26]: integral of (y - 0.26) dy over it, unit width
    lo, c = 0.25, 0.26
    exact = ((lo - c) ** 2 / 2) * -1.0  # -(c-lo)^2/2
    np.testing.assert_allclose(val, -((c - lo) ** 2) / 2, atol=1e-14)


def test_surface_normal_assembles_runtime_interface_scalar():
    """Reference :989 + :1012 — the geometric surface normal assembles
    in a runtime interface form (|n|^2 integrates the perimeter) and
    matches the radial direction on a quadratic circle."""
    from cutfemx_tpu import fem
    from cutfemx_tpu.forms.dsl import inner
    from cutfemx_tpu.forms.measure import Measure
    mesh = cfx.mesh.create_rectangle((0.0, 0.0), (1.0, 1.0), (6, 6),
                                     "triangle")
    V = cfx.functionspace(mesh, ("Lagrange", 2))
    phi = cfx.Function(V, name="phi")
    cx, cy, r = 0.47, 0.43, 0.31
    phi.interpolate(lambda x: (x[0] - cx) ** 2 + (x[1] - cy) ** 2
                    - r ** 2)
    cd = cfx.cut(phi)
    srf = cfx.runtime_quadrature(cd, "phi=0", 3)
    ns = cfx.surface_normal(cd, "phi=0")
    dxg = Measure("dx", domain=mesh, subdomain_data=srf)
    per = float(fem.assemble_scalar(fem.form(inner(ns, ns) * dxg)))
    exact = 2 * np.pi * r
    assert abs(per - exact) < 0.02 * exact  # P1-linearized interface
    # the normal values at the rule points are radial (outward from
    # phi<0), up to the marching linearization
    nv = np.asarray(ns.evaluator(srf))
    mask = np.asarray(srf.weights_padded) > 0
    from cutfemx_tpu.elements import lagrange_element
    el = lagrange_element(mesh.cell_type, 1)
    pts = np.asarray(srf.points_padded)
    coords = mesh.cell_vertex_coords[srf.parent_cells]
    phys = np.einsum("nqv,nvg->nqg", np.asarray(el.tabulate(pts)), coords)
    rad = phys - np.array([cx, cy])
    rad /= np.linalg.norm(rad, axis=-1, keepdims=True)
    dots = np.einsum("nqg,nqg->nq", nv, rad)[mask]
    assert dots.min() > 0.95
