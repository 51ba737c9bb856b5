"""Cell aggregation and extension-penalty stabilization.

Mirrors /root/reference/python/cutfemx/extensions.py +
cpp/cutfemx/extensions/: ill-posed (small-cut) cells are mapped to
well-posed root cells by iterative facet-neighbor propagation
(cell_aggregation.cpp:143-273), and an L2 penalty
beta*(u_bad - u_root)(v_bad - v_root) over the full bad cell ties each bad
cell's dofs to its root's polynomial extension
(extension_penalty.cpp:91-170; quadrature on the bad cell, same physical
points pulled back into root reference coordinates).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from .cut.classify import CutData
from .cut.quadrature import volume_rules
from .cut.selector import parse_selector
from .elements import lagrange_element
from .geometry import pullback
from .la import MatrixCSR
from .quadrature import quadrature_rule

__all__ = [
    "CellAggregation", "ExtensionQuadrature", "ExtensionPenaltyTerm",
    "create_cell_aggregation", "extension_quadrature",
    "assemble_extension_penalty", "extension_penalty_matrix",
    "create_extension_penalty_matrix",
]


@dataclass
class CellAggregation:
    """Aggregation state (cell_aggregation.h:25-38)."""
    interior_cells: np.ndarray
    cut_cells: np.ndarray
    active_cells: np.ndarray
    well_posed_cells: np.ndarray
    ill_posed_cells: np.ndarray
    rootless_cells: np.ndarray
    cut_volume_fraction: np.ndarray   # (num_cells,)
    root_cell: np.ndarray             # (num_cells,), -1 unset
    aggregate_id: np.ndarray
    propagation_depth: np.ndarray


def _strict_clause(selector):
    terms = parse_selector(selector)
    if len(terms) != 1 or len(terms[0]) != 1 or \
            terms[0][0][1] not in ("<", ">"):
        raise ValueError(
            "cell aggregation requires a strict single-clause selector "
            f"like 'phi<0' (got {selector!r})")
    return terms[0][0]


def create_cell_aggregation(cut_data: CutData, selector: str,
                            volume_fraction_threshold: float, *,
                            root_policy: str = "interior_or_well_cut",
                            max_iterations: int = -1,
                            allow_rootless: bool = False) -> CellAggregation:
    """Classify cells and propagate ill-posed cells to roots
    (cell_aggregation.cpp:143-273). Matches the reference's deterministic
    sweep order: ill-posed cells ascending, first rooted neighbor in
    ascending cell order wins, in-sweep updates visible."""
    if cut_data.entity_dim is not None:
        raise ValueError("CellAggregation v1 only supports cuts on the "
                         "original background cell mesh")
    if not 0.0 <= volume_fraction_threshold <= 1.0:
        raise ValueError("Volume fraction threshold must be in [0, 1].")
    if root_policy not in ("interior_only", "interior_or_well_cut"):
        raise ValueError("Unknown root policy. Expected 'interior_only' or "
                         "'interior_or_well_cut'.")
    name, op = _strict_clause(selector)
    if name not in cut_data.level_set_names:
        raise ValueError("CellAggregation selector level set is unknown.")
    idx = cut_data.level_set_names.index(name)
    phi = cut_data.level_sets[idx]
    mesh = cut_data.mesh
    nc = mesh.num_cells

    interior = cut_data.locate(f"{name}{op}0")
    cut_cells = cut_data.locate(f"{name}=0")
    active = np.union1d(interior, cut_cells).astype(np.int32)

    # volume fractions of the selected phase on cut cells
    fractions = np.zeros(nc)
    if len(cut_cells):
        rules = volume_rules(mesh, phi, cut_cells, order=2,
                             side="<" if op == "<" else ">")
        part_vol = np.asarray(rules.weights_padded).sum(axis=1)
        cell_vol = _cell_volumes(mesh, cut_cells)
        fractions[cut_cells] = part_vol / cell_vol

    root_cell = np.full(nc, -1, np.int32)
    aggregate_id = np.full(nc, -1, np.int32)
    depth = np.full(nc, -1, np.int32)

    roots = set(interior.tolist())
    ill = []
    for c in cut_cells.tolist():
        if root_policy == "interior_or_well_cut" and \
                fractions[c] >= volume_fraction_threshold:
            roots.add(c)
        else:
            ill.append(c)
    well_posed = np.array(sorted(roots), np.int32)
    ill_posed = np.array(sorted(ill), np.int32)

    for agg, r in enumerate(well_posed.tolist()):
        root_cell[r] = r
        aggregate_id[r] = agg
        depth[r] = 0

    # facet neighbors
    fc = mesh.facet_cells
    interior_f = fc[:, 1] >= 0
    pairs = fc[interior_f]
    neighbors = [[] for _ in range(nc)]
    for a, b in pairs.tolist():
        neighbors[a].append(b)
        neighbors[b].append(a)
    neighbors = [sorted(set(ns)) for ns in neighbors]
    active_set = set(active.tolist())

    limit = nc if max_iterations < 0 else max_iterations
    for _ in range(limit):
        mapped = 0
        for c in ill_posed.tolist():
            if root_cell[c] >= 0:
                continue
            for other in neighbors[c]:
                if other not in active_set or root_cell[other] < 0:
                    continue
                root_cell[c] = root_cell[other]
                aggregate_id[c] = aggregate_id[other]
                depth[c] = depth[other] + 1
                mapped += 1
                break
        if mapped == 0:
            break

    rootless = np.array([c for c in ill_posed.tolist()
                         if root_cell[c] < 0], np.int32)
    if len(rootless) and not allow_rootless:
        raise RuntimeError(
            "CellAggregation found active ill-posed cells without an "
            "admissible root. Adjust the root policy or threshold, or "
            "explicitly allow rootless aggregation for diagnostics.")

    return CellAggregation(interior, cut_cells, active, well_posed,
                           ill_posed, rootless, fractions, root_cell,
                           aggregate_id, depth)


def _cell_volumes(mesh, cells):
    coords = mesh.cell_vertex_coords[cells]
    cell = mesh.ref_cell
    split = cell.simplex_split
    vol = np.zeros(len(cells))
    for sub in split:
        v = coords[:, sub, :]
        E = v[:, 1:, :] - v[:, :1, :]
        if mesh.tdim == 2:
            vol += 0.5 * np.abs(E[:, 0, 0] * E[:, 1, 1]
                                - E[:, 0, 1] * E[:, 1, 0])
        else:
            vol += np.abs(np.einsum("ci,ci->c", np.cross(E[:, 0], E[:, 1]),
                                    E[:, 2])) / 6.0
    return vol


@dataclass
class ExtensionQuadrature:
    """Full-cell quadrature on bad cells with root pullbacks
    (extension_penalty.h:35-44)."""
    bad_cells: np.ndarray        # (nb,)
    root_cells: np.ndarray       # (nb,)
    points_bad: jnp.ndarray      # (nb, nq, tdim) bad-cell reference coords
    points_root: jnp.ndarray     # (nb, nq, tdim) root-cell reference coords
    weights: jnp.ndarray         # (nb, nq) physical weights


def extension_quadrature(V, cut_data: CutData,
                         aggregation: CellAggregation,
                         quadrature_degree: int) -> ExtensionQuadrature:
    """Standard full-cell rule on each bad cell; the same physical points
    expressed in root reference coordinates (affine pullback; the
    reference adds a Newton pullback for non-affine cells,
    extension_penalty.cpp:91-170)."""
    mesh = cut_data.mesh
    bad = aggregation.ill_posed_cells
    bad = bad[aggregation.root_cell[bad] >= 0]
    roots = aggregation.root_cell[bad]
    pts, w = quadrature_rule(mesh.cell_type, quadrature_degree)
    nq = len(w)
    nb = len(bad)
    coords_bad = jnp.asarray(mesh.cell_vertex_coords[bad])
    coords_root = jnp.asarray(mesh.cell_vertex_coords[roots])
    el1 = lagrange_element(mesh.cell_type, 1)
    phi1 = jnp.asarray(el1.tabulate(pts))            # (nq, nv)
    xphys = jnp.einsum("qv,cvg->cqg", phi1, coords_bad)
    pts_root = jax.vmap(
        lambda c, x: pullback(mesh.cell_type, c, x))(coords_root,
                                                            xphys)
    # physical weights: w * |detJ_bad|
    dphi1 = jnp.asarray(el1.tabulate_grad(pts))      # (nq, nv, tdim)
    J = jnp.einsum("cvg,qvt->cqgt", coords_bad, dphi1)
    detJ = jnp.abs(jnp.linalg.det(J))
    weights = jnp.asarray(w)[None, :] * detJ
    pts_bad = jnp.broadcast_to(jnp.asarray(pts), (nb, nq, mesh.tdim))
    return ExtensionQuadrature(bad, roots, pts_bad, pts_root, weights)


@dataclass
class ExtensionPenaltyTerm:
    """Descriptor of an extension penalty contribution
    (/root/reference/python/cutfemx/extensions.py:102-128)."""
    V: object
    cut_data: CutData
    aggregation: CellAggregation
    beta: object = 1.0
    quadrature_degree: int = 2


def _penalty_element_matrices(V, eq: ExtensionQuadrature, beta):
    """(nb, 2*nd, 2*nd) element matrices over stacked (bad, root) dofs."""
    el = V.element
    tab_bad = el.tabulate(eq.points_bad)             # (nb, nq, nd)
    tab_root = el.tabulate(eq.points_root)
    psi = jnp.concatenate([tab_bad, -tab_root], axis=-1)  # (nb, nq, 2nd)
    w = eq.weights
    if isinstance(beta, (int, float)):
        bw = float(beta) * w
    else:
        beta_arr = jnp.asarray(beta)
        if beta_arr.ndim != 1:
            raise ValueError("cellwise beta must be a 1D per-cell array")
        bw = beta_arr[jnp.asarray(eq.bad_cells)][:, None] * w
    return jnp.einsum("cq,cqi,cqj->cij", bw, psi, psi)


def _penalty_dofs(V, eq):
    bd = V.blocked_dofmap
    return np.concatenate([bd[eq.bad_cells], bd[eq.root_cells]], axis=1)


def assemble_extension_penalty(A, V, cut_data=None, aggregation=None,
                               beta=None, quadrature_degree=None):
    """Assemble the L2 extension penalty into ``A`` (MatrixCSR). ``beta``
    is a scalar, a per-cell array, or a DG0 Function evaluated on bad
    cells (extensions.py:302-351)."""
    if isinstance(V, ExtensionPenaltyTerm):
        term = V
        V, cut_data, aggregation = term.V, term.cut_data, term.aggregation
        beta = term.beta if beta is None else beta
        quadrature_degree = term.quadrature_degree if quadrature_degree \
            is None else quadrature_degree
    beta = 1.0 if beta is None else beta
    quadrature_degree = 2 * V.degree if quadrature_degree is None else \
        quadrature_degree
    from .functionspace import Function
    if isinstance(beta, Function):
        if beta.function_space.degree != 0:
            raise ValueError("beta Function must be DG0")
        beta = np.asarray(beta.x)
    eq = extension_quadrature(V, cut_data, aggregation, quadrature_degree)
    if len(eq.bad_cells) == 0:
        return A
    Ae = np.asarray(_penalty_element_matrices(V, eq, beta))
    dofs = _penalty_dofs(V, eq)
    nb, nd2 = dofs.shape
    rows = np.broadcast_to(dofs[:, :, None], (nb, nd2, nd2)).ravel()
    cols = np.broadcast_to(dofs[:, None, :], (nb, nd2, nd2)).ravel()
    import scipy.sparse as sps
    M = sps.coo_matrix((Ae.ravel(), (rows, cols)),
                       shape=(V.dim, V.dim)).tocsr()
    A._m = (A.to_scipy() + M).tocsr()
    return A


def extension_penalty_matrix(V, cut_data, aggregation, beta=1.0,
                             quadrature_degree=None):
    """Assemble the penalty into a fresh MatrixCSR."""
    import scipy.sparse as sps
    A = MatrixCSR(sps.csr_matrix((V.dim, V.dim)))
    return assemble_extension_penalty(A, V, cut_data, aggregation, beta,
                                      quadrature_degree)


def create_extension_penalty_matrix(V, cut_data, aggregation, dtype=None):
    """Empty MatrixCSR with the bad/root pair sparsity (host CSR builds
    sparsity on insert, so this is a zero matrix of the right shape)."""
    import scipy.sparse as sps
    return MatrixCSR(sps.csr_matrix((V.dim, V.dim)))
