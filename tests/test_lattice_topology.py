"""Structured-lattice topology fast path vs the generic sort-based
builder: same entities, same per-cell connectivity, same adjacency —
only the global numbering may differ (mesh.py _lattice_subentities).

The closed-form path replaces the DOLFINx-role topology computation for
structured backgrounds (SURVEY.md L1); at the 10M-dof bench it removes a
45M-row argsort from host setup."""

import numpy as np
import pytest

import cutfemx_tpu as cfx
from cutfemx_tpu.mesh import CellType


def _strip_lattice(mesh):
    """Clone with the structured metadata removed (forces generic path)."""
    from cutfemx_tpu.mesh import Mesh
    m = Mesh(mesh.vertices, mesh.cells, mesh.cell_type)
    m._lattice = None
    return m


def _entity_key(verts_row):
    return tuple(int(v) for v in verts_row)


@pytest.mark.parametrize("make", [
    lambda: cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (3, 4, 5)),
    lambda: cfx.mesh.create_box((0, 0, 0), (1, 1, 1), (4, 4, 4)),
    lambda: cfx.mesh.create_box((0, 0, 0), (1, 1, 1), (3, 3, 3),
                                CellType.hexahedron),
    lambda: cfx.mesh.create_rectangle((0, 0), (2, 1), (5, 3)),
    lambda: cfx.mesh.create_rectangle((0, 0), (1, 1), (4, 6),
                                      diagonal="left"),
    lambda: cfx.mesh.create_rectangle((0, 0), (1, 1), (4, 4),
                                      CellType.quadrilateral),
])
def test_lattice_topology_matches_generic(make):
    ms = make()
    assert ms._lattice is not None
    mg = _strip_lattice(ms)

    for prop in ("edges", "facets"):
        if prop == "edges" and ms.tdim == 2:
            continue  # 2D edges == facets
        es = getattr(ms, prop)
        eg = getattr(mg, prop)
        assert es.shape == eg.shape
        # rows are sorted vertex tuples in both paths; the SETS must match
        set_s = {_entity_key(r) for r in es}
        set_g = {_entity_key(r) for r in eg}
        assert set_s == set_g
        # per-cell entity -> same vertex tuple through either numbering
        ces = getattr(ms, "cell_edges" if prop == "edges" else "cell_facets")
        ceg = getattr(mg, "cell_edges" if prop == "edges" else "cell_facets")
        assert np.array_equal(es[ces], eg[ceg])

    # facet adjacency: compare as facet-keyed dicts (numbering differs)
    adj_s = {_entity_key(ms.facets[f]): (tuple(ms.facet_cells[f]),
                                         tuple(ms.facet_local_index[f]))
             for f in range(ms.num_facets)}
    adj_g = {_entity_key(mg.facets[f]): (tuple(mg.facet_cells[f]),
                                         tuple(mg.facet_local_index[f]))
             for f in range(mg.num_facets)}
    assert adj_s == adj_g

    # boundary facet count sanity
    assert len(ms.exterior_facets) == len(mg.exterior_facets)


def test_lattice_dofmaps_give_identical_operators():
    """End check: a P2 stiffness matrix assembled on the structured path
    equals the generic-path matrix after matching the dof numbering via
    dof coordinates (the physics is numbering-invariant)."""
    from cutfemx_tpu import fem
    from cutfemx_tpu.forms.dsl import TestFunction, TrialFunction, grad, inner
    from cutfemx_tpu.forms.measure import dx

    ms = cfx.mesh.create_box((0, 0, 0), (1, 1, 1), (2, 2, 2))
    mg = _strip_lattice(ms)
    As, Ag = [], []
    perms = []
    for m in (ms, mg):
        V = cfx.functionspace(m, ("Lagrange", 2))
        u, v = TrialFunction(V), TestFunction(V)
        A = fem.assemble_matrix(fem.form(inner(grad(u), grad(v)) * dx))
        coords = V.dof_coordinates
        key = np.lexsort(coords.T)
        perms.append(key)
        (As if m is ms else Ag).append(A.to_dense())
    Ms = np.asarray(As[0])[np.ix_(perms[0], perms[0])]
    Mg = np.asarray(Ag[0])[np.ix_(perms[1], perms[1])]
    assert np.allclose(Ms, Mg, atol=1e-12)
