"""Geometry maps: Jacobians, pushforward, pullback, facet normals.

Replaces the coordinate-element machinery the reference gets from DOLFINx
(e.g. Jacobian/K computation in /root/reference/cpp/cutfemx/level_set/
normal.h:102-170 and the physical-point pushforward in
cut/runtime_quadrature.h:43-232). All functions are pure JAX, batched over
quadrature points of one entity; batching over entities is done by vmap in
the form compiler.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .cells import reference_cell
from .elements import lagrange_element

__all__ = [
    "jacobian", "pushforward", "pullback_affine", "gram_det",
    "reference_facet_map", "facet_reference_normals",
]


def coordinate_element(cell_type):
    return lagrange_element(cell_type, 1)


def jacobian(cell_type, coords, points):
    """J = dx/dxi at each point.

    coords: (nv, gdim) cell vertex coords; points: (Q, tdim).
    Returns (Q, gdim, tdim).
    """
    el = coordinate_element(cell_type)
    dphi = el.tabulate_grad(points)  # (Q, nv, tdim)
    return jnp.einsum("vg,qvt->qgt", coords, dphi)


def pushforward(cell_type, coords, points):
    """Map reference points (Q, tdim) to physical (Q, gdim)."""
    el = coordinate_element(cell_type)
    phi = el.tabulate(points)  # (Q, nv)
    return jnp.einsum("qv,vg->qg", phi, coords)


def pullback_affine(cell_type, coords, xphys):
    """Inverse map for affine (simplex) cells: (Q, gdim) -> (Q, tdim)."""
    cell = reference_cell(cell_type)
    if not cell.is_simplex:
        raise ValueError("pullback_affine requires a simplex cell")
    origin = coords[0]
    J = jnp.stack([coords[i + 1] - origin for i in range(cell.tdim)],
                  axis=-1)  # (gdim, tdim)
    if J.shape[0] == J.shape[1]:
        K = jnp.linalg.inv(J)
    else:
        K = jnp.linalg.pinv(J)
    return jnp.einsum("tg,qg->qt", K, xphys - origin)


def pullback_newton(cell_type, coords, xphys, iters=8):
    """Inverse of the (multilinear) geometry map by Newton iteration
    (the role of the reference's non-affine pull_back,
    cpp/cutfemx/extensions/extension_penalty.cpp:91-170).

    coords: (nv, gdim); xphys: (Q, gdim) -> (Q, tdim)."""
    cell = reference_cell(cell_type)
    el = coordinate_element(cell_type)
    xi = jnp.broadcast_to(
        jnp.asarray(cell.vertices.mean(axis=0), xphys.dtype),
        (xphys.shape[0], cell.tdim))
    for _ in range(iters):
        phi = el.tabulate(xi)
        dphi = el.tabulate_grad(xi)
        x = jnp.einsum("qv,vg->qg", phi, coords)
        J = jnp.einsum("vg,qvt->qgt", coords, dphi)
        K = jnp.linalg.inv(J) if J.shape[-1] == J.shape[-2] else \
            jnp.linalg.pinv(J)
        xi = xi + jnp.einsum("qtg,qg->qt", K, xphys - x)
    return xi


def pullback(cell_type, coords, xphys):
    """General inverse geometry map: exact affine solve for simplices,
    Newton otherwise."""
    if reference_cell(cell_type).is_simplex:
        return pullback_affine(cell_type, coords, xphys)
    return pullback_newton(cell_type, coords, xphys)


def gram_det(J):
    """sqrt(det(J^T J)) for possibly non-square J (..., gdim, tdim)."""
    g, t = J.shape[-2], J.shape[-1]
    if g == t:
        return jnp.abs(jnp.linalg.det(J))
    JTJ = jnp.einsum("...gi,...gj->...ij", J, J)
    return jnp.sqrt(jnp.abs(jnp.linalg.det(JTJ)))


def inv_or_pinv(J):
    if J.shape[-2] == J.shape[-1]:
        return jnp.linalg.inv(J)
    return jnp.linalg.pinv(J)


# -- facet embedding ---------------------------------------------------------


def reference_facet_map(cell_type):
    """Static tables mapping facet-reference points into the cell reference.

    Returns (origins (nfacets, tdim), tangents (nfacets, tdim, fdim)) such
    that a facet-reference point s (fdim,) maps to
    xi = origin[f] + tangents[f] @ phi_embed(s)   (affine for simplex facets;
    for quadrilateral facets of hexes the embedding is bilinear so we return
    the facet vertex reference coordinates instead).
    """
    cell = reference_cell(cell_type)
    fverts = cell.facet_vertices_coords()  # (nf, nvf, tdim)
    return fverts


def map_facet_points(cell_type, local_facet, facet_points, fverts_table):
    """Map facet-reference points (Q, fdim) to cell-reference (Q, tdim) for a
    given local facet index (traced int).

    fverts_table: (nf, nvf, tdim) static reference coords of facet vertices.
    """
    cell = reference_cell(cell_type)
    fct = cell.facet_cell_type
    fel = lagrange_element(fct, 1) if fct != "point" else None
    fv = jnp.asarray(fverts_table)[local_facet]  # (nvf, tdim)
    if fel is None:
        return jnp.broadcast_to(fv[0], (facet_points.shape[0],
                                        cell.tdim))
    phi = fel.tabulate(facet_points)  # (Q, nvf)
    return jnp.einsum("qv,vt->qt", phi, fv)


def facet_reference_normals(cell_type):
    """(nfacets, tdim) outward unit normals of the reference cell facets."""
    cell = reference_cell(cell_type)
    n = np.zeros((cell.num_facets, cell.tdim))
    centroid = cell.vertices.mean(axis=0)
    for f in range(cell.num_facets):
        vs = cell.vertices[cell.facets[f]]
        if cell.tdim == 1:
            nv = vs[0] - centroid
        elif cell.tdim == 2:
            t = vs[1] - vs[0]
            nv = np.array([t[1], -t[0]])
        else:
            nv = np.cross(vs[1] - vs[0], vs[2] - vs[0])
        mid = vs.mean(axis=0)
        if np.dot(nv, mid - centroid) < 0:
            nv = -nv
        n[f] = nv / np.linalg.norm(nv)
    return n


def physical_facet_normal(cell_type, K, ref_normal):
    """Outward physical normal from reference normal: n = K^T n_ref / |.|.

    K: (Q, tdim, gdim) inverse Jacobian; ref_normal: (tdim,).
    """
    n = jnp.einsum("qtg,t->qg", K, ref_normal)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)
