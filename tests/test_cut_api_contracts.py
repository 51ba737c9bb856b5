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
