"""Public distance API: STL -> signed distance, reinitialization,
normal-velocity extension, mesh adaptation.

Mirrors /root/reference/python/cutfemx/distance.py: ``from_stl`` (:119),
``reinitialize(_from_facets)`` (:154-173), ``extend_normal_velocity``
(:176-240), ``adapt_mesh_to_stl`` (:243-264), with the three sign
strategies of distance/sign_options.h:13-17.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from enum import Enum

import numpy as np

import jax.numpy as jnp

from ..functionspace import Function, FunctionSpace
from .fim import FMMOptions, eikonal_solve
from .stl import (TriSoup, build_cell_triangle_map, distribute_stl,
                  point_segment_distance, point_triangle_distance, read_stl)

logger = logging.getLogger("cutfemx_tpu")

__all__ = ["SignMode", "from_stl", "compute_unsigned_distance",
           "compute_signed_distance", "reinitialize",
           "reinitialize_from_facets", "extend_normal_velocity",
           "NormalExtensionResult", "adapt_mesh_to_stl",
           "refinement_edges_from_stl"]


class SignMode(Enum):
    """Sign strategies (sign_options.h:13-17)."""
    local_normal_band = "local_normal_band"
    component_anchor = "component_anchor"
    winding_number = "winding_number"


# -- near field --------------------------------------------------------------


def _near_field(mesh, soup: TriSoup, ctmap):
    """Exact distances at vertices of triangle-mapped cells.

    Returns (d0 (NV,), frozen (NV,), closest (NV, gdim), tri_normal
    (NV, gdim))."""
    nv = mesh.num_vertices
    gdim = mesh.gdim
    cells = ctmap.cells_with_triangles()
    pairs_v, pairs_t = [], []
    for c in cells:
        tris = ctmap.links(c)
        for v in mesh.cells[c]:
            pairs_v.append(np.full(len(tris), v))
            pairs_t.append(tris)
    if not pairs_v:
        inf = FMMOptions().inf
        return (np.full(nv, inf), np.zeros(nv, bool), np.zeros((nv, gdim)),
                np.zeros((nv, gdim)))
    pv = np.concatenate(pairs_v)
    pt = np.concatenate(pairs_t)
    # dedupe
    key = pv.astype(np.int64) * soup.num_triangles + pt
    _, idx = np.unique(key, return_index=True)
    pv, pt = pv[idx], pt[idx]

    p = jnp.asarray(_pad3(mesh.vertices)[pv])
    tri = jnp.asarray(soup.triangle_coords()[pt])
    d, closest = point_triangle_distance(p, tri)
    d = np.asarray(d)
    closest = np.asarray(closest)

    inf = FMMOptions().inf
    d0 = np.full(nv, inf)
    np.minimum.at(d0, pv, d)
    frozen = d0 < inf * 0.5
    best = d <= d0[pv] + 1e-300
    cl = np.zeros((nv, 3))
    nrm = np.zeros((nv, 3))
    # keep the closest triangle's data per vertex
    order = np.argsort(d, kind="stable")
    seen = np.zeros(nv, bool)
    for i in order:
        v = pv[i]
        if not seen[v]:
            seen[v] = True
            cl[v] = closest[i]
            nrm[v] = soup.N[pt[i]]
    return d0, frozen, cl[:, :gdim], nrm[:, :gdim]


def _pad3(x):
    if x.shape[1] == 3:
        return x
    out = np.zeros((x.shape[0], 3))
    out[:, :x.shape[1]] = x
    return out


def compute_unsigned_distance(mesh, soup: TriSoup, ctmap=None,
                              options: FMMOptions | None = None):
    """Unsigned distance field at mesh vertices: exact near field + FIM."""
    if ctmap is None:
        ctmap = build_cell_triangle_map(mesh, soup)
    d0, frozen, _, _ = _near_field(mesh, soup, ctmap)
    d, _, its = eikonal_solve(mesh, d0, frozen, options)
    return np.asarray(d), its


# -- sign strategies ---------------------------------------------------------


def _component_labels(mesh, cut_facets_mask):
    """Flood-fill cell components blocked by cut facets (sign_region.h:
    40-185) as iterated masked propagation; labels: -1 unvisited, then
    component ids with component 0 = anchored at the domain boundary."""
    nc = mesh.num_cells
    fc = mesh.facet_cells
    interior = (fc[:, 1] >= 0) & ~cut_facets_mask
    a, b = fc[interior, 0], fc[interior, 1]
    label = np.full(nc, -1, np.int64)
    # anchor: cells touching the domain boundary through uncut facets
    bmask = (fc[:, 1] < 0) & ~cut_facets_mask
    label[fc[bmask, 0]] = 0
    next_label = 1
    while True:
        # propagate labels across uncut interior facets to convergence
        while True:
            changed = False
            m1 = (label[a] < 0) & (label[b] >= 0)
            if m1.any():
                label[a[m1]] = label[b[m1]]
                changed = True
            m2 = (label[b] < 0) & (label[a] >= 0)
            if m2.any():
                label[b[m2]] = label[a[m2]]
                changed = True
            if not changed:
                break
        rest = np.flatnonzero(label < 0)
        if not len(rest):
            break
        label[rest[0]] = next_label
        next_label += 1
    return label


def _cut_facets_exact(mesh, soup, ctmap):
    """Mark facets actually intersected by surface triangles, using the
    exact predicate-only seg-tri/tri-tri tests (tri_intersection.h:132-186
    role). Falls back to the conservative every-candidate-facet marking
    when the native predicates are unavailable."""
    from ..native import seg_tri_isect_batch, tri_tri_isect_batch
    cut_facets = np.zeros(mesh.num_facets, bool)
    counts = np.diff(ctmap.offsets)
    cell_idx = np.repeat(np.arange(mesh.num_cells), counts)
    tri_idx = ctmap.triangles
    if not len(cell_idx):
        return cut_facets
    nfpc = mesh.cell_facets.shape[1]
    fids = mesh.cell_facets[cell_idx]                    # (P, nfpc)
    fids_flat = fids.ravel()
    tc = soup.triangle_coords()
    tris = np.repeat(tc[tri_idx], nfpc, axis=0)          # (P*nfpc, 3, 3)
    fverts = _pad3(mesh.vertices)[mesh.facets[fids_flat]]
    if mesh.facets.shape[1] == 3:
        hit = tri_tri_isect_batch(fverts, tris)
    elif mesh.facets.shape[1] == 2:
        hit = seg_tri_isect_batch(fverts, tris)
    else:
        hit = None
    if hit is None:  # conservative fallback (no native library)
        cut_facets[fids_flat] = True
        return cut_facets
    cut_facets[fids_flat[hit]] = True
    return cut_facets


def _sign_component_anchor(mesh, soup, ctmap, d, closest, nrm, frozen):
    """Cut facets block flood fill; boundary-anchored component is
    outside; near-band vertices use the closest-triangle normal test."""
    cut_facets = _cut_facets_exact(mesh, soup, ctmap)
    label = _component_labels(mesh, cut_facets)
    outside_cells = label == 0

    nv = mesh.num_vertices
    sign = np.zeros(nv)
    # far vertices: sign by incident cell component
    vert_out = np.zeros(nv, bool)
    vert_in = np.zeros(nv, bool)
    vout = mesh.cells[outside_cells].ravel()
    vin = mesh.cells[(label > 0)].ravel()
    vert_out[vout] = True
    vert_in[vin] = True
    sign[vert_out & ~vert_in] = 1.0
    sign[vert_in & ~vert_out] = -1.0
    # near band + ambiguous: normal dot test
    amb = frozen | (vert_in & vert_out) | (sign == 0.0)
    p = mesh.vertices[amb]
    dvec = p - closest[amb]
    s = np.einsum("ij,ij->i", dvec, nrm[amb])
    sign[amb] = np.where(s >= 0, 1.0, -1.0)
    return sign


def _sign_local_normal_band(mesh, d, closest, nrm, frozen):
    """Normal dot test in the near band + edge-propagation outward
    (sign.h:56-214)."""
    nv = mesh.num_vertices
    sign = np.zeros(nv)
    p = mesh.vertices[frozen]
    s = np.einsum("ij,ij->i", p - closest[frozen], nrm[frozen])
    sign[frozen] = np.where(s >= 0, 1.0, -1.0)
    edges = mesh.edges
    a, b = edges[:, 0], edges[:, 1]
    while (sign == 0).any():
        changed = False
        m = (sign[a] == 0) & (sign[b] != 0)
        if m.any():
            sign[a[m]] = sign[b[m]]
            changed = True
        m = (sign[b] == 0) & (sign[a] != 0)
        if m.any():
            sign[b[m]] = sign[a[m]]
            changed = True
        if not changed:
            sign[sign == 0] = 1.0
            break
    return sign


def _sign_winding_number(mesh, soup):
    """Generalized winding number (winding.h:85-330). Large soups route
    through the clustered Barnes-Hut scheme (distance/winding.py:
    Morton-clustered dipole far field + exact near field, O(V*C)
    instead of O(V*T)); small soups use the brute batched sum."""
    if soup.tri.shape[0] > 4096:
        from .winding import build_winding_clusters, winding_numbers
        cl = build_winding_clusters(soup)
        w = winding_numbers(mesh.vertices, cl)
        return np.where(w > 0.5, -1.0, 1.0)
    P = jnp.asarray(_pad3(mesh.vertices))            # (NV, 3)
    T = jnp.asarray(soup.triangle_coords())          # (NT, 3, 3)

    def wind_chunk(p):
        a = T[None, :, 0, :] - p[:, None, :]
        b = T[None, :, 1, :] - p[:, None, :]
        c = T[None, :, 2, :] - p[:, None, :]
        la = jnp.linalg.norm(a, axis=-1)
        lb = jnp.linalg.norm(b, axis=-1)
        lc = jnp.linalg.norm(c, axis=-1)
        num = jnp.einsum("ptg,ptg->pt", a, jnp.cross(b, c))
        den = (la * lb * lc + jnp.einsum("ptg,ptg->pt", a, b) * lc
               + jnp.einsum("ptg,ptg->pt", b, c) * la
               + jnp.einsum("ptg,ptg->pt", a, c) * lb)
        return jnp.sum(2.0 * jnp.arctan2(num, den), axis=1) / (4 * np.pi)

    out = []
    chunk = 8192
    for i in range(0, P.shape[0], chunk):
        out.append(np.asarray(wind_chunk(P[i:i + chunk])))
    w = np.concatenate(out)
    return np.where(w > 0.5, -1.0, 1.0)  # inside (w>1/2) is negative


def compute_signed_distance(mesh, soup: TriSoup, ctmap=None,
                            sign_mode=SignMode.component_anchor,
                            options: FMMOptions | None = None):
    if ctmap is None:
        ctmap = build_cell_triangle_map(mesh, soup)
    d0, frozen, closest, nrm = _near_field(mesh, soup, ctmap)
    d, _, its = eikonal_solve(mesh, d0, frozen, options)
    d = np.asarray(d)
    if isinstance(sign_mode, str):
        sign_mode = SignMode(sign_mode)
    if sign_mode == SignMode.component_anchor:
        sign = _sign_component_anchor(mesh, soup, ctmap, d, closest, nrm,
                                      frozen)
    elif sign_mode == SignMode.local_normal_band:
        sign = _sign_local_normal_band(mesh, d, closest, nrm, frozen)
    else:
        sign = _sign_winding_number(mesh, soup)
    return sign * d, its


def _vertex_p1_function(mesh, values, name):
    """Wrap per-vertex values into a P1 Function (vertex dofs lead the
    global numbering, functionspace._build_dofmap)."""
    V = FunctionSpace(mesh, ("Lagrange", 1))
    f = Function(V, name=name)
    f.x = jnp.asarray(values, f.x.dtype)
    return f


def from_stl(mesh, path, *, sign_mode=SignMode.component_anchor,
             padding=0.0, options: FMMOptions | None = None,
             log_timings=True):
    """STL -> signed-distance P1 Function (distance.py:119-151, with the
    same per-phase timing log)."""
    t0 = time.perf_counter()
    soup = distribute_stl(mesh, path, padding=padding)
    t1 = time.perf_counter()
    ctmap = build_cell_triangle_map(mesh, soup)
    t2 = time.perf_counter()
    d, its = compute_signed_distance(mesh, soup, ctmap,
                                     sign_mode=sign_mode, options=options)
    t3 = time.perf_counter()
    if log_timings:
        logger.info(
            "from_stl: distribute %.3fs, cell_triangle_map %.3fs, "
            "signed_distance %.3fs (%d FIM sweeps)",
            t1 - t0, t2 - t1, t3 - t2, its)
    return _vertex_p1_function(mesh, d, "signed_distance")


# -- reinitialization --------------------------------------------------------


def _interface_soup(mesh, phi):
    """Zero-contour of phi as a segment (2D) / triangle (3D) soup in
    physical coords, plus the parent cell of each piece
    (reinitialize.h:79-100 via create_cut_mesh '... phi=0 cut_only')."""
    from ..cut.api import create_cut_mesh, cut as cut_fn
    cd = cut_fn(phi)
    cm = create_cut_mesh(cd, f"{cd.level_set_names[0]}=0", mode="cut_only")
    if cm.mesh is None:
        raise ValueError("level set has no zero contour on this mesh")
    pieces = cm.mesh.cell_vertex_coords          # (np, tdim, gdim)
    return pieces, cm.parent_index, cd


def _exact_distance_to_pieces(points, pieces):
    """Min distance from each point to a soup of segments/triangles."""
    pts = jnp.asarray(points)
    P = jnp.asarray(pieces)
    if P.shape[1] == 2:  # segments
        d, _ = point_segment_distance(pts[:, None, :], P[None, :, 0, :],
                                      P[None, :, 1, :])
    else:
        d, _ = point_triangle_distance(
            jnp.asarray(_pad3(points))[:, None, :],
            jnp.asarray(np.pad(np.asarray(P), ((0, 0), (0, 0),
                                               (0, 3 - P.shape[2]))))
            [None, :, :, :])
    return np.asarray(d.min(axis=1))


def reinitialize(phi, options: FMMOptions | None = None):
    """Rebuild phi as a signed distance to its own zero contour
    (distance.py:154, reinitialize.h): exact near field on cut-cell
    vertices, FIM far field, original sign restored.

    Degree >= 2 level sets (the reference's higher-order target-space
    variant): the P1 carrier solve interpolates linearly into phi's
    space, and every dof of a cut cell is replaced by its exact distance
    to the (refined-marching) interface pieces."""
    mesh = phi.function_space.mesh
    V = phi.function_space
    pieces, parents, cd = _interface_soup(mesh, phi)

    nv = mesh.num_vertices
    inf = (options or FMMOptions()).inf
    d0 = np.full(nv, inf)
    cut_cells = cd.locate(f"{cd.level_set_names[0]}=0")
    near_verts = np.unique(mesh.cells[cut_cells].ravel())
    d0[near_verts] = _exact_distance_to_pieces(mesh.vertices[near_verts],
                                               pieces)
    frozen = d0 < inf * 0.5
    d, _, _ = eikonal_solve(mesh, d0, frozen, options)
    d = np.asarray(d)
    out = phi.copy()
    if V.degree == 1:
        sign = np.where(np.asarray(phi.x)[:nv] < 0, -1.0, 1.0)
        out.x = jnp.asarray(sign * d, phi.x.dtype)
        return out
    vals = _interp_p1_to_space(V, d)
    near_dofs = np.unique(V.dofmap[cut_cells].ravel())
    vals[near_dofs] = _exact_distance_to_pieces(
        V.dof_coordinates[near_dofs], pieces)
    sign = np.where(np.asarray(phi.x) < 0, -1.0, 1.0)
    out.x = jnp.asarray(sign * vals, phi.x.dtype)
    return out


def reinitialize_from_facets(mesh_or_phi, facets,
                             options: FMMOptions | None = None,
                             phi_sign=None):
    """Distance to a set of mesh facets (distance.py:166)."""
    if isinstance(mesh_or_phi, Function):
        mesh = mesh_or_phi.function_space.mesh
        phi_sign = np.asarray(mesh_or_phi.x)[:mesh.num_vertices]
    else:
        mesh = mesh_or_phi
    pieces = mesh.vertices[mesh.facets[np.asarray(facets)]]
    nv = mesh.num_vertices
    inf = (options or FMMOptions()).inf
    d0 = np.full(nv, inf)
    fc = mesh.facet_cells[np.asarray(facets)]
    cells = np.unique(fc[fc >= 0])
    near_verts = np.unique(mesh.cells[cells].ravel())
    d0[near_verts] = _exact_distance_to_pieces(mesh.vertices[near_verts],
                                               pieces)
    frozen = d0 < inf * 0.5
    d, _, _ = eikonal_solve(mesh, d0, frozen, options)
    d = np.asarray(d)
    if phi_sign is not None:
        d = np.where(phi_sign < 0, -d, d)
    return _vertex_p1_function(mesh, d, "distance")


# -- normal-velocity extension ----------------------------------------------


@dataclass
class NormalExtensionResult:
    """(distance.py:176-240)."""
    speed: Function
    velocity: Function
    signed_distance: Function


def extend_normal_velocity(phi, interface_speed,
                           options: FMMOptions | None = None,
                           target_space=None):
    """Extend a scalar interface speed into the bulk along characteristics
    of the distance function (normal_extension.h): exact near field with
    speed evaluated at the interface closest point, FIM payload transport
    of (speed, normal) to the far field, velocity = speed * normal."""
    mesh = phi.function_space.mesh
    V = phi.function_space
    if V.degree != 1:
        raise NotImplementedError("extend_normal_velocity supports P1")
    pieces, parents, cd = _interface_soup(mesh, phi)
    nv = mesh.num_vertices
    gdim = mesh.gdim
    inf = (options or FMMOptions()).inf

    cut_cells = cd.locate(f"{cd.level_set_names[0]}=0")
    near_verts = np.unique(mesh.cells[cut_cells].ravel())
    pts = jnp.asarray(mesh.vertices[near_verts])
    P = jnp.asarray(pieces)
    if P.shape[1] == 2:
        dmat, cl = point_segment_distance(pts[:, None, :],
                                          P[None, :, 0, :],
                                          P[None, :, 1, :])
    else:
        dmat, cl = point_triangle_distance(
            jnp.asarray(_pad3(mesh.vertices[near_verts]))[:, None, :],
            jnp.asarray(np.pad(np.asarray(P),
                               ((0, 0), (0, 0), (0, 3 - P.shape[2]))))
            [None, :, :, :])
    dmat = np.asarray(dmat)
    cl = np.asarray(cl)[..., :gdim]
    best = np.argmin(dmat, axis=1)
    d_near = dmat[np.arange(len(near_verts)), best]
    closest = cl[np.arange(len(near_verts)), best]
    host = parents[best]                          # background cell per pt

    # speed + level-set normal at the closest interface point
    speed_vals = _eval_function_at(interface_speed, host, closest)
    normal_vals = _levelset_normal_at(phi, host, closest)

    d0 = np.full(nv, inf)
    d0[near_verts] = d_near
    frozen = d0 < inf * 0.5
    payload = np.zeros((nv, 1 + gdim))
    payload[near_verts, 0] = speed_vals
    payload[near_verts, 1:] = normal_vals
    d, pay, _ = eikonal_solve(mesh, d0, frozen, options, payload=payload)
    pay = np.asarray(pay)

    speed_f = _vertex_p1_function(mesh, pay[:, 0], "extended_speed")
    Vvec = FunctionSpace(mesh, ("Lagrange", 1), shape=(gdim,))
    vel = Function(Vvec, name="extension_velocity")
    nrm = pay[:, 1:]
    nn = np.linalg.norm(nrm, axis=1, keepdims=True)
    nrm = nrm / np.maximum(nn, 1e-14)
    vel.x = jnp.asarray((pay[:, :1] * nrm).reshape(-1), vel.x.dtype)
    sign = np.where(np.asarray(phi.x)[:nv] < 0, -1.0, 1.0)
    sd = _vertex_p1_function(mesh, sign * np.asarray(d), "signed_distance")
    if target_space is not None:
        # interpolate the P1 carrier triple into the target space (and
        # the matching vector space), distance.py:227-240
        if target_space.mesh is not mesh:
            raise ValueError("target_space must live on phi's mesh")
        if target_space.value_shape:
            raise ValueError("target_space must be scalar")
        out_s = Function(target_space, name="extended_speed")
        out_s.x = jnp.asarray(_interp_p1_to_space(target_space, pay[:, 0]),
                              out_s.x.dtype)
        Vtv = FunctionSpace(mesh, ("Lagrange", target_space.degree),
                            shape=(gdim,))
        out_v = Function(Vtv, name="extension_velocity")
        comps = [_interp_p1_to_space(target_space,
                                     (pay[:, :1] * nrm)[:, k])
                 for k in range(gdim)]
        out_v.x = jnp.asarray(np.stack(comps, axis=1).reshape(-1),
                              out_v.x.dtype)
        out_d = Function(target_space, name="signed_distance")
        out_d.x = jnp.asarray(
            _interp_p1_to_space(target_space, sign * np.asarray(d)),
            out_d.x.dtype)
        return NormalExtensionResult(out_s, out_v, out_d)
    return NormalExtensionResult(speed_f, vel, sd)


def _interp_p1_to_space(V, vertex_vals):
    """Exact linear interpolation of a P1 vertex field into a scalar
    Lagrange space on the same mesh (the reference's carrier -> target
    interpolation, distance.py:227-240): vertex dofs copy, edge-interior
    dofs interpolate along the (ascending) edge, face/cell-interior dofs
    (single symmetric point, P<=3) take the entity-vertex mean."""
    mesh = V.mesh
    vertex_vals = np.asarray(vertex_vals)
    if V.degree == 1 and V.family == "Lagrange":
        return vertex_vals.copy()
    el = V.element
    from ..elements import lagrange_element
    phi_geo = np.asarray(lagrange_element(mesh.cell_type, 1).tabulate(
        el.dof_points))
    cell = mesh.ref_cell
    tdim = mesh.tdim
    out = np.zeros(V.num_scalar_dofs, vertex_vals.dtype)
    out[:mesh.num_vertices] = vertex_vals
    for (edim, eidx), dofs in el.entity_dofs.items():
        if edim == 0 or eidx != 0:
            continue
        if edim == 1 and tdim >= 2:
            la, lb = cell.edges[0]
            ts = phi_geo[np.asarray(dofs), lb]
            e = mesh.edges
            lo, hi = vertex_vals[e[:, 0]], vertex_vals[e[:, 1]]
            n_ei = len(ts)
            base = V._edge_off + np.arange(mesh.num_edges,
                                           dtype=np.int64) * n_ei
            for j, t in enumerate(ts):
                out[base + j] = (1.0 - t) * lo + t * hi
        elif edim == tdim - 1 and tdim == 3:
            f = mesh.facets
            centers = vertex_vals[f].mean(axis=1)
            n_fi = len(dofs)
            base = V._face_off + np.arange(mesh.num_facets,
                                           dtype=np.int64) * n_fi
            for j in range(n_fi):
                out[base + j] = centers
        elif edim == tdim or (edim == 1 and tdim == 1):
            d = np.asarray(sorted(dofs))
            vals = np.einsum("dk,ck->cd", phi_geo[d],
                             vertex_vals[mesh.cells])
            out[V.dofmap[:, d].ravel()] = vals.ravel()
    return out


def _eval_function_at(f, cells, points_phys):
    """Evaluate a Function at physical points inside given cells."""
    from ..geometry import pullback
    import jax
    V = f.function_space
    mesh = V.mesh
    coords = jnp.asarray(mesh.cell_vertex_coords[cells])
    ref = jax.vmap(lambda c, x: pullback(mesh.cell_type, c,
                                                x[None, :])[0])(
        coords, jnp.asarray(points_phys))
    tab = V.element.tabulate(ref)                 # (n, nd)
    dofs = jnp.asarray(f.x)[V.dofmap[cells]]
    return np.asarray(jnp.einsum("nd,nd->n", tab, dofs))


def _levelset_normal_at(phi, cells, points_phys):
    from ..geometry import pullback
    import jax
    V = phi.function_space
    mesh = V.mesh
    coords = jnp.asarray(mesh.cell_vertex_coords[cells])
    ref = jax.vmap(lambda c, x: pullback(mesh.cell_type, c,
                                                x[None, :])[0])(
        coords, jnp.asarray(points_phys))
    rg = V.element.tabulate_grad(ref)             # (n, nd, tdim)
    dofs = jnp.asarray(phi.x)[V.dofmap[cells]]
    gref = jnp.einsum("ndt,nd->nt", rg, dofs)
    from ..elements import lagrange_element
    el1 = lagrange_element(mesh.cell_type, 1)
    dphi = el1.tabulate_grad(ref)                 # (n, nvert, tdim)
    J = jnp.einsum("nvg,nvt->ngt", coords, dphi)
    K = jnp.linalg.inv(J)
    g = jnp.einsum("ntg,nt->ng", K, gref)
    g = np.asarray(g)
    nn = np.linalg.norm(g, axis=1, keepdims=True)
    return g / np.maximum(nn, 1e-14)


# -- mesh adaptation ---------------------------------------------------------


def refinement_edges_from_stl(mesh, soup_or_path, *, rings=1):
    """Unique edges of STL-intersecting cells (+ k-ring), the marker set
    for refinement (stl/mesh_adapt.h:24-151)."""
    soup = soup_or_path if isinstance(soup_or_path, TriSoup) else \
        read_stl(soup_or_path)
    ctmap = build_cell_triangle_map(mesh, soup)
    marked = np.zeros(mesh.num_cells, bool)
    marked[ctmap.cells_with_triangles()] = True
    fc = mesh.facet_cells
    for _ in range(rings):
        interior = fc[:, 1] >= 0
        a, b = fc[interior, 0], fc[interior, 1]
        nxt = marked.copy()
        nxt[a[marked[b]]] = True
        nxt[b[marked[a]]] = True
        marked = nxt
    edges = np.unique(mesh.cell_edges[marked].ravel())
    return edges.astype(np.int32)


def adapt_mesh_to_stl(mesh, path, *, max_iterations=3, rings=1):
    """Iteratively refine cells near the STL surface (distance.py:243-264;
    the reference loops refinement_edges_from_stl + dolfinx refine)."""
    from ..refine import refine_marked
    soup = read_stl(path)
    for _ in range(max_iterations):
        edges = refinement_edges_from_stl(mesh, soup, rings=rings)
        if len(edges) == 0:
            break
        mesh = refine_marked(mesh, edges)
    return mesh
