"""Public cut API: cut, locate_entities, runtime_quadrature, create_cut_mesh,
ghost_penalty_facets — mirrors /root/reference/python/cutfemx/cut.py.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

import jax.numpy as jnp

from ..functionspace import Function
from ..mesh import Mesh
from .classify import CutData
from .quadrature import (RuntimeQuadratureRules, _map_rule, _march_parts,
                         facet_volume_rules, interface_rules, volume_rules)
from .selector import DOMAIN_INTERSECTED, parse_selector
from .tables import simplex_cut_tables

__all__ = [
    "cut", "update", "locate_entities", "runtime_quadrature",
    "runtime_quadratures", "create_cut_mesh", "CutMesh", "CutData",
    "ghost_penalty_facets", "interior_facets_for_cells",
]


def _normalize_level_sets(level_set):
    if isinstance(level_set, Function):
        return [level_set]
    if isinstance(level_set, Sequence) and not isinstance(level_set, str):
        out = list(level_set)
        if not out:
            raise ValueError("cut requires at least one level-set Function")
        if not all(isinstance(f, Function) for f in out):
            raise TypeError("cut sequence entries must be Functions")
        return out
    raise TypeError("cut expects a Function or a sequence of Functions")


def cut(level_set, entities=None, entity_dim=None, *,
        cut_approximation="auto", cut_approximation_order=1,
        max_refinement_iterations=8, edge_max_depth=20) -> CutData:
    """Classify cells (or selected entities) against one or more level sets
    (/root/reference/python/cutfemx/cut.py:186-249)."""
    level_sets = _normalize_level_sets(level_set)
    options = dict(cut_approximation=cut_approximation,
                   cut_approximation_order=cut_approximation_order,
                   max_refinement_iterations=max_refinement_iterations,
                   edge_max_depth=edge_max_depth)
    return CutData(level_sets, entities=entities, entity_dim=entity_dim,
                   options=options)


def update(cut_data: CutData):
    cut_data.update()


def locate_entities(cut_data: CutData, ls_part: str):
    return cut_data.locate(ls_part)


def _subdivision_levels(cut_data, phi):
    """Map the reference's cut-approximation options
    (cut.py:190-194: cut_approximation, cut_approximation_order,
    max_refinement_iterations) onto marching-simplex red-refinement
    levels: a degree-1 level set is cut exactly at level 0; higher-degree
    level sets get refined marching simplices with the true basis
    re-evaluated at sub-vertices."""
    opts = cut_data.options or {}
    approx = opts.get("cut_approximation", "auto")
    if approx in ("linear",):
        return 0
    order = int(opts.get("cut_approximation_order", 1))
    max_iter = int(opts.get("max_refinement_iterations", 8))
    if phi.function_space.degree <= 1:
        return 0
    if approx == "auto" or order > 1:
        return max(0, min(2, max_iter))
    return 0


def _approx_plan(cut_data, phi, mesh):
    """(levels, curved) for cell-hosted marching rules.

    ``cut_approximation_order >= 2`` on a simplex host with a
    higher-degree level set selects the genuinely higher-order curved
    path (isoparametric P2 parts with polished/projected interface
    nodes, O(h^3) geometric error) at the BASE part count; other
    combinations keep the red-refinement mapping of
    _subdivision_levels (the reference delegates both regimes to
    CutCells/Algoim via cut.py:190-194)."""
    opts = cut_data.options or {}
    approx = opts.get("cut_approximation", "auto")
    order = int(opts.get("cut_approximation_order", 1))
    if (approx != "linear" and order > 1
            and phi.function_space.degree > 1
            and mesh.cell_type in ("triangle", "tetrahedron")):
        return 0, True
    return _subdivision_levels(cut_data, phi), False


def _single_clause(selector):
    terms = parse_selector(selector)
    if len(terms) != 1 or len(terms[0]) != 1:
        raise NotImplementedError(
            "runtime quadrature currently supports single-clause selectors "
            f"(got {selector!r})")
    return terms[0][0]


def runtime_quadrature(cut_data: CutData, ls_part: str, order: int, *,
                       backend: str = "straight") -> RuntimeQuadratureRules:
    """Runtime quadrature for the selected part on intersected entities
    (cut.cpp:1311-1335). Inclusive selectors produce the same rules as the
    strict ones (test_cut_api.py:702-711). Compound AND selectors over
    several level sets produce boolean-region rules by recursive
    marching."""
    if backend not in ("straight", "algoim", "algoim_general"):
        raise ValueError(f"unknown backend '{backend}'")
    terms = parse_selector(ls_part)
    if len(terms) > 1:
        return _union_runtime_quadrature(cut_data, terms, order)
    if len(terms[0]) > 1:
        return _compound_runtime_quadrature(cut_data, terms[0], order)
    name, op = _single_clause(ls_part)
    try:
        idx = cut_data.level_set_names.index(name)
    except ValueError:
        raise ValueError(f"unknown level-set name '{name}'") from None
    phi = cut_data.level_sets[idx]
    mesh = cut_data.mesh
    cut_entities = cut_data.hosted_entities[
        cut_data.domains[idx] == DOMAIN_INTERSECTED]
    levels, curved = _approx_plan(cut_data, phi, mesh)

    if backend in ("algoim", "algoim_general"):
        # Saye dimension-reduction quadrature; quad/hex hosts only (the
        # reference's Algoim host-cell validation, cut.cpp:194-237)
        from .saye import saye_interface_rules, saye_volume_rules
        if cut_data.hosted_dim == mesh.tdim - 1:
            # facet-hosted algoim: interval/embedded-quad interface rules
            # with polynomial-exact 2D crossings
            # (test_cut_api.py:1370,1399)
            from .quadrature import facet_interface_rules
            if op == "=":
                return facet_interface_rules(mesh, phi, cut_entities,
                                             order, polish=True)
            side = "<" if op in ("<", "<=") else ">"
            return facet_volume_rules(mesh, phi, cut_entities, order,
                                      side=side)
        if cut_data.hosted_dim != mesh.tdim:
            raise NotImplementedError(
                "algoim backends support cell-hosted rules only")
        if op == "=":
            return saye_interface_rules(mesh, phi, cut_entities, order)
        side = "<" if op in ("<", "<=") else ">"
        return saye_volume_rules(mesh, phi, cut_entities, order, side=side)

    if cut_data.hosted_dim == mesh.tdim:
        if op in ("<", "<="):
            return volume_rules(mesh, phi, cut_entities, order, side="<",
                                levels=levels, curved=curved)
        if op in (">", ">="):
            return volume_rules(mesh, phi, cut_entities, order, side=">",
                                levels=levels, curved=curved)
        return interface_rules(mesh, phi, cut_entities, order,
                               levels=levels, curved=curved)
    if cut_data.hosted_dim == mesh.tdim - 1:
        if op == "=":
            from .quadrature import facet_interface_rules
            return facet_interface_rules(mesh, phi, cut_entities, order)
        side = "<" if op in ("<", "<=") else ">"
        return facet_volume_rules(mesh, phi, cut_entities, order, side=side)
    raise NotImplementedError(f"entity dim {cut_data.hosted_dim}")


def _compound_masks(cut_data, clauses):
    """(inclusive-match mask, any-clause-intersected mask, phis, sides)."""
    from .selector import DOMAIN_INSIDE, DOMAIN_OUTSIDE
    phis, sides = [], []
    incl = np.ones(len(cut_data.hosted_entities), bool)
    any_cut = np.zeros(len(cut_data.hosted_entities), bool)
    for name, op in clauses:
        if op == "=":
            raise NotImplementedError(
                "compound selectors with '=' clauses are not supported "
                "for runtime quadrature")
        idx = cut_data.level_set_names.index(name)
        d = cut_data.domains[idx]
        want = DOMAIN_INSIDE if op in ("<", "<=") else DOMAIN_OUTSIDE
        incl &= (d == want) | (d == DOMAIN_INTERSECTED)
        any_cut |= d == DOMAIN_INTERSECTED
        phis.append(cut_data.level_sets[idx])
        sides.append("<" if op in ("<", "<=") else ">")
    return incl, any_cut, phis, sides


def _compound_runtime_quadrature(cut_data, clauses, order, cells=None):
    """AND-intersection region rules: cells matching every clause
    inclusively with at least one clause intersected (or an explicit cell
    set); each cell cut recursively by all participating level sets."""
    from .quadrature import compound_volume_rules
    mesh = cut_data.mesh
    if cut_data.hosted_dim != mesh.tdim:
        raise NotImplementedError(
            "compound runtime quadrature requires cell-hosted CutData")
    incl, any_cut, phis, sides = _compound_masks(cut_data, clauses)
    if cells is None:
        cells = cut_data.hosted_entities[incl & any_cut]
    levels = max(_subdivision_levels(cut_data, p) for p in phis)
    return compound_volume_rules(mesh, list(zip(phis, sides)), cells,
                                 order, levels=levels)


def _union_runtime_quadrature(cut_data, terms, order):
    """OR of AND-terms by inclusion-exclusion: |A u B| = A + B - A^B,
    emitted as concatenated signed-weight rule blocks (every subset S of
    terms contributes (-1)^(|S|+1) x rules(AND of S's clauses))."""
    from itertools import combinations

    import jax.numpy as jnp

    for clauses in terms:
        for name, op in clauses:
            if op == "=":
                raise NotImplementedError(
                    "union selectors with '=' clauses are not supported "
                    "for runtime quadrature")
    nent = len(cut_data.hosted_entities)
    # cells fully inside some term are the user's standard-entity set
    # (locate_entities); rules cover every other cell the union touches.
    fully_inside = np.zeros(nent, bool)
    for clauses in terms:
        incl, any_cut, _, _ = _compound_masks(cut_data, clauses)
        fully_inside |= incl & ~any_cut
    pieces = []
    k = len(terms)
    for size in range(1, k + 1):
        for subset in combinations(range(k), size):
            clauses = [c for i in subset for c in terms[i]]
            # drop duplicate clauses
            seen, uniq = set(), []
            for c in clauses:
                if c not in seen:
                    seen.add(c)
                    uniq.append(c)
            incl, any_cut, _, _ = _compound_masks(cut_data, uniq)
            cells = cut_data.hosted_entities[incl & ~fully_inside]
            rules = _compound_runtime_quadrature(cut_data, uniq, order,
                                                 cells=cells)
            sign = 1.0 if size % 2 == 1 else -1.0
            pieces.append((sign, rules))

    mesh = cut_data.mesh
    qmax = max(np.asarray(r.points_padded).shape[1] for _, r in pieces)
    parents, pts, wts = [], [], []
    for sign, r in pieces:
        p = np.asarray(r.points_padded)
        w = sign * np.asarray(r.weights_padded)
        pad = qmax - p.shape[1]
        if pad:
            p = np.pad(p, ((0, 0), (0, pad), (0, 0)))
            w = np.pad(w, ((0, 0), (0, pad)))
        parents.append(r.parent_map)
        pts.append(p)
        wts.append(w)
    return RuntimeQuadratureRules(
        mesh.tdim, np.concatenate(parents),
        jnp.asarray(np.concatenate(pts)),
        jnp.asarray(np.concatenate(wts)), mesh=mesh)


def runtime_quadratures(cut_data: CutData, ls_parts, order: int, *,
                        backend: str = "straight"):
    return {str(p): runtime_quadrature(cut_data, str(p), order,
                                       backend=backend)
            for p in ls_parts}


# -- cut visualisation meshes ------------------------------------------------


class CutMesh:
    """Visualisation mesh of a selected cut part
    (/root/reference/python/cutfemx/cut.py:60-92)."""

    def __init__(self, mesh, parent_index, is_cut_cell):
        self.mesh = mesh
        self.parent_index = np.asarray(parent_index, dtype=np.int32)
        self.is_cut_cell = np.asarray(is_cut_cell, dtype=np.int8)


_SIMPLEX_OF_DIM = {1: "interval", 2: "triangle", 3: "tetrahedron"}


def create_cut_mesh(cut_data: CutData, ls_part: str, mode=None) -> CutMesh:
    """Build a simplex visualisation mesh of the selected part
    (cut.cpp:1065-1250). mode: 'full' includes uncut cells of the phase,
    'cut_only' only the cut fragments; 'auto' = 'full' for volume parts,
    'cut_only' for interfaces."""
    mode = mode or "auto"
    name, op = _single_clause(ls_part)
    idx = cut_data.level_set_names.index(name)
    phi = cut_data.level_sets[idx]
    mesh = cut_data.mesh
    tdim = mesh.tdim
    if op == "=" and mode == "full":
        raise ValueError(
            "mode='full' is not valid for interface parts ('=' selector)")
    if cut_data.hosted_dim == tdim - 1:
        return _create_facet_cut_mesh(cut_data, idx, op, mode)
    if cut_data.hosted_dim != tdim:
        raise NotImplementedError("cut meshes require cell- or facet-hosted "
                                  "CutData")
    if mode == "auto":
        mode = "cut_only" if op == "=" else "full"

    from ..elements import lagrange_element
    cut_cells = cut_data.hosted_entities[
        cut_data.domains[idx] == DOMAIN_INTERSECTED]
    cell = mesh.ref_cell
    split = cell.simplex_split
    VOL, SURF = simplex_cut_tables(tdim)

    verts_out, cells_out, parents, iscut = [], [], [], []
    nv_off = 0

    def add_parts(X, valid, parent_cells, cut_flag):
        nonlocal nv_off
        Xn = np.asarray(X)
        vn = np.asarray(valid)
        C, M, m, g = Xn.shape
        sel = np.nonzero(vn)
        npart = len(sel[0])
        if npart == 0:
            return
        pv = Xn[sel[0], sel[1]]               # (npart, m, gdim)
        verts_out.append(pv.reshape(-1, g))
        conn = (np.arange(npart * m) + nv_off).reshape(npart, m)
        cells_out.append(conn)
        nv_off += npart * m
        parents.append(parent_cells[sel[0]])
        iscut.append(np.full(npart, cut_flag, np.int8))

    # cut fragments (march in physical coordinates)
    if len(cut_cells):
        el = phi.function_space.element
        dofs = jnp.asarray(phi.x)[phi.function_space.dofmap[cut_cells]]
        coords = mesh.cell_vertex_coords[cut_cells]
        ref_verts = cell.vertices
        tab = np.asarray(el.tabulate(ref_verts))
        phiv = np.einsum("pn,cn->cp", tab, np.asarray(dofs))
        for sub in split:
            pv = jnp.asarray(coords[:, sub, :])
            ph = jnp.asarray(phiv[:, sub])
            if op == "=":
                X, valid, _ = _march_parts(ph, pv, tdim, SURF)
            else:
                sgn = -1.0 if op in (">", ">=") else 1.0
                X, valid, _ = _march_parts(sgn * ph, pv, tdim, VOL)
            add_parts(X, valid, cut_cells, 1)

    # whole uncut cells of the phase
    if mode == "full" and op != "=":
        from .selector import DOMAIN_INSIDE, DOMAIN_OUTSIDE
        want = DOMAIN_INSIDE if op in ("<", "<=") else DOMAIN_OUTSIDE
        full_cells = cut_data.hosted_entities[cut_data.domains[idx] == want]
        if len(full_cells):
            coords = mesh.cell_vertex_coords[full_cells]
            for sub in split:
                pv = coords[:, sub, :]          # (C, tdim+1, gdim)
                C = pv.shape[0]
                add_parts(pv[:, None, :, :], np.ones((C, 1), bool),
                          full_cells, 0)

    if not verts_out:
        return CutMesh(None, np.zeros(0, np.int32), np.zeros(0, np.int8))
    verts = np.concatenate(verts_out)
    cells = np.concatenate(cells_out)
    out_dim = tdim - 1 if op == "=" else tdim
    vis = Mesh(verts, cells, _SIMPLEX_OF_DIM[out_dim])
    return CutMesh(vis, np.concatenate(parents), np.concatenate(iscut))


def _create_facet_cut_mesh(cut_data, idx, op, mode):
    """Visualisation mesh of cut parts hosted on (simplex) facets — the
    facet-entities branch of the reference's create_cut_mesh
    (test_cut_api.py:256-287). Marches directly on facet vertices (exact
    for P1 level sets; vertex dofs lead the Lagrange numbering)."""
    import jax.numpy as jnp  # noqa: F811

    mesh = cut_data.mesh
    tdim = mesh.tdim
    k = tdim - 1
    phi = cut_data.level_sets[idx]
    if mesh.facets.shape[1] != k + 1:
        raise NotImplementedError(
            "facet-hosted cut meshes support simplex facets")
    out_dim = k - 1 if op == "=" else k
    if out_dim < 1:
        raise NotImplementedError(
            "facet interface parts in 2D are point sets, not meshes")
    if mode == "auto":
        mode = "cut_only" if op == "=" else "full"
    VOL, SURF = simplex_cut_tables(k)
    ents = cut_data.hosted_entities
    dom = cut_data.domains[idx]
    cut_facets = ents[dom == DOMAIN_INTERSECTED]
    vertex_vals = np.asarray(phi.x)[:mesh.num_vertices]

    verts_out, cells_out, parents, iscut = [], [], [], []
    nv_off = 0

    def add_parts(X, valid, parent_facets, cut_flag):
        nonlocal nv_off
        Xn, vn = np.asarray(X), np.asarray(valid)
        sel = np.nonzero(vn)
        npart = len(sel[0])
        if npart == 0:
            return
        pv = Xn[sel[0], sel[1]]
        g = pv.shape[-1]
        m = pv.shape[1]
        verts_out.append(pv.reshape(-1, g))
        cells_out.append((np.arange(npart * m) + nv_off).reshape(npart, m))
        nv_off += npart * m
        parents.append(parent_facets[sel[0]])
        iscut.append(np.full(npart, cut_flag, np.int8))

    if len(cut_facets):
        fv = mesh.facets[cut_facets]
        coords = jnp.asarray(mesh.vertices[fv])
        ph = jnp.asarray(vertex_vals[fv])
        if op == "=":
            X, valid, _ = _march_parts(ph, coords, k, SURF)
        else:
            sgn = -1.0 if op in (">", ">=") else 1.0
            X, valid, _ = _march_parts(sgn * ph, coords, k, VOL)
        add_parts(X, valid, cut_facets, 1)

    if mode == "full" and op != "=":
        from .selector import DOMAIN_INSIDE, DOMAIN_OUTSIDE
        want = DOMAIN_INSIDE if op in ("<", "<=") else DOMAIN_OUTSIDE
        full_f = ents[dom == want]
        if len(full_f):
            coords = mesh.vertices[mesh.facets[full_f]]
            add_parts(coords[:, None, :, :],
                      np.ones((len(full_f), 1), bool), full_f, 0)

    if not verts_out:
        return CutMesh(None, np.zeros(0, np.int32), np.zeros(0, np.int8))
    vis = Mesh(np.concatenate(verts_out), np.concatenate(cells_out),
               _SIMPLEX_OF_DIM[out_dim])
    return CutMesh(vis, np.concatenate(parents), np.concatenate(iscut))


# -- stabilization facet bands ----------------------------------------------


def interior_facets_for_cells(msh: Mesh, cells, *, include_ghosts=False):
    """Interior facets whose both neighbors are in ``cells``
    (cut.cpp:926-994)."""
    sel = np.zeros(msh.num_cells, dtype=bool)
    sel[np.asarray(cells, dtype=np.int64)] = True
    fc = msh.facet_cells
    interior = fc[:, 1] >= 0
    both = interior & sel[fc[:, 0]] & sel[np.maximum(fc[:, 1], 0)]
    return np.flatnonzero(both).astype(np.int32)


def ghost_penalty_facets(cut_data: CutData, selector: str, *, depth=1,
                         include_ghosts=False):
    """Interior facets of the cut-cell stabilization band: facets adjacent
    to a cut cell whose both neighbors are active (cut or selected)
    (/root/reference/python/cutfemx/cut.py:340-380)."""
    if depth != 1:
        raise NotImplementedError(
            "ghost_penalty_facets currently supports depth=1.")
    if cut_data.entity_dim is not None and \
            cut_data.entity_dim != cut_data.mesh.tdim:
        raise ValueError("ghost_penalty_facets expects cell-hosted CutData.")
    msh = cut_data.mesh
    cut_cells = locate_entities(cut_data, "phi=0" if
                                "phi" in cut_data.level_set_names else
                                f"{cut_data.level_set_names[0]}=0")
    selected = locate_entities(cut_data, selector)
    active = np.zeros(msh.num_cells, dtype=bool)
    active[cut_cells] = True
    active[selected] = True
    is_cut = np.zeros(msh.num_cells, dtype=bool)
    is_cut[cut_cells] = True
    fc = msh.facet_cells
    interior = fc[:, 1] >= 0
    c1 = np.maximum(fc[:, 1], 0)
    both_active = interior & active[fc[:, 0]] & active[c1]
    any_cut = is_cut[fc[:, 0]] | is_cut[c1]
    return np.flatnonzero(both_active & any_cut).astype(np.int32)
