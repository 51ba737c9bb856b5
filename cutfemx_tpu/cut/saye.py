"""Saye-style implicit quadrature on quadrilateral/hexahedral host cells.

The role of the reference's ``algoim`` / ``algoim_general`` runtime
quadrature backends (/root/reference/python/cutfemx/cut.py:190-194,
wrappers/cut.cpp:117-140 routes them to Algoim's Bernstein quadrature,
with host-cell validation restricting them to quad/hex cells,
cut.cpp:194-237): instead of sub-triangulating the cut cell (the
``straight`` backend), the implicitly-defined region is integrated by
dimension reduction following R. Saye's algorithm —

1. pick a height direction k where phi is most monotone,
2. integrate over the base (the remaining axes) with Gauss rules whose
   lines are SPLIT at the zero sets of phi restricted to the two
   k-faces (where the interface exits the cell the base integrand is
   only piecewise smooth; splitting restores spectral accuracy),
3. along each height line find the exact roots of the 1D polynomial
   restriction of the level set; sub-segments between roots get scaled
   1D Gauss rules (volume) and the roots themselves become surface
   points weighted by the graph factor |grad phi| / |d_k phi|.

The 1D restriction of a Qk level set along an axis line is a degree-k
polynomial, so roots are exact (closed form for k <= 2); the interface
of the *interpolated* level set is integrated without the linearization
error of the marching/sub-triangulation backend. Residual error vs full
Saye: in 3D the base splitting itself uses plain Gauss in the outer
axis (codim-2 corner effects are not recursed), and interfaces that are
not height-function graphs over any axis inside a cell (unresolved
level sets) lose the non-graph sheets.

Output contract matches the straight backend exactly: points in
parent-cell reference coordinates, PHYSICAL weights (|det J| factors
folded in), padded arrays with zero-weight padding.
"""

from __future__ import annotations

import numpy as np

from ..elements import lagrange_element
from ..quadrature import gauss_legendre
from .quadrature import RuntimeQuadratureRules

__all__ = ["saye_volume_rules", "saye_interface_rules"]

_TENSOR_CELLS = ("quadrilateral", "hexahedron")


def _validate_host(mesh):
    """Algoim-backend host-cell validation (cut.cpp:194-237)."""
    if mesh.cell_type not in _TENSOR_CELLS:
        raise ValueError(
            "algoim backends require quadrilateral/hexahedron host cells "
            f"(got '{mesh.cell_type}'); use backend='straight'")


def _npts_1d(order):
    return max(2, (int(order) + 2) // 2)


def _fit_nodes(p):
    """Chebyshev-Lobatto sample nodes on [0,1] (exact poly fit)."""
    if p <= 1:
        return np.array([0.0, 1.0])
    return 0.5 * (1.0 - np.cos(np.pi * np.arange(p + 1) / p))


def _poly_coeffs(vals, ts):
    """Exact monomial coefficients through degree-p samples.

    vals: (..., p+1) values at shared nodes ts -> (..., p+1) coeffs c
    with poly(t) = sum c_i t^i."""
    V = np.vander(ts, len(ts), increasing=True)
    return vals @ np.linalg.inv(V).T


def _roots_in_unit(c):
    """Real roots of sum c_i t^i in (0, 1), vectorized for degree <= 2.

    c: (..., p+1) -> (roots (..., p), valid (..., p)); invalid slots 1.0.
    """
    p = c.shape[-1] - 1
    eps = 1e-14
    if p == 1:
        c0, c1 = c[..., 0], c[..., 1]
        safe = np.abs(c1) > eps
        t = np.where(safe, -c0 / np.where(safe, c1, 1.0), 2.0)
        valid = safe & (t > 0.0) & (t < 1.0)
        return (np.where(valid, t, 1.0)[..., None], valid[..., None])
    if p == 2:
        c0, c1, c2 = c[..., 0], c[..., 1], c[..., 2]
        quad = np.abs(c2) > eps
        disc = c1 * c1 - 4.0 * c2 * c0
        sq = np.sqrt(np.maximum(disc, 0.0))
        qq = -0.5 * (c1 + np.sign(np.where(c1 == 0, 1.0, c1)) * sq)
        den1 = np.where(quad, c2, 1.0)
        den2 = np.where(np.abs(qq) > eps, qq, 1.0)
        ok = quad & (disc > 0)
        r1 = np.where(ok, qq / den1, 2.0)
        r2 = np.where(ok & (np.abs(qq) > eps), c0 / den2, 2.0)
        lin = ~quad & (np.abs(c1) > eps)
        r1 = np.where(lin, -c0 / np.where(lin, c1, 1.0), r1)
        roots = np.stack([r1, r2], axis=-1)
        valid = (roots > 0.0) & (roots < 1.0)
        return np.where(valid, roots, 1.0), valid
    flat = c.reshape(-1, p + 1)
    roots = np.full((flat.shape[0], p), 1.0)
    valid = np.zeros((flat.shape[0], p), bool)
    for i, ci in enumerate(flat):
        rr = np.roots(ci[::-1])
        rr = rr[np.abs(rr.imag) < 1e-10].real
        rr = rr[(rr > 0.0) & (rr < 1.0)]
        roots[i, :len(rr)] = rr[:p]
        valid[i, :len(rr)] = True
    return (roots.reshape(c.shape[:-1] + (p,)),
            valid.reshape(c.shape[:-1] + (p,)))


def _poly_eval(c, t):
    """sum c_i t^i; c: (..., p+1) broadcast against t: (...)."""
    out = np.zeros(np.broadcast_shapes(c.shape[:-1], t.shape))
    for i in range(c.shape[-1] - 1, -1, -1):
        out = out * t + c[..., i]
    return out


def _segments(roots):
    """Sorted segment bounds from padded roots: (..., R) -> lo, hi of
    shape (..., R+1)."""
    shape = roots.shape[:-1]
    bnd = np.concatenate([np.zeros(shape + (1,)),
                          np.sort(roots, axis=-1),
                          np.ones(shape + (1,))], axis=-1)
    return bnd[..., :-1], bnd[..., 1:]


def _group_by_height(mesh, phi, cut_cells):
    """Split cut cells into groups by best height direction (argmax of
    |d_k phi| at the cell center)."""
    V = phi.function_space
    d = mesh.tdim
    center = np.full((1, d), 0.5)
    g = np.asarray(V.element.tabulate_grad(center))[0]
    dofs = np.asarray(phi.x)[np.asarray(V.dofmap)[cut_cells]]
    gc = np.abs(dofs @ g)
    k = np.argmax(gc, axis=1)
    return [(kk, np.flatnonzero(k == kk)) for kk in range(d)
            if (k == kk).any()]


def _split_base(mesh, el, dofs, k, order):
    """Base rule with lines split at the k-face zero sets.

    Returns (base_pts (Cg, NB, d) with the k coordinate zeroed,
    base_w (Cg, NB)). The base integrand of the dimension-reduction
    quadrature is smooth except where phi vanishes on the k-faces
    (t = 0, 1); base lines are split at those roots.
    """
    d = mesh.tdim
    p = el.degree
    n1 = _npts_1d(order)
    gx, gw = gauss_legendre(n1)
    ts = _fit_nodes(p)
    Cg = dofs.shape[0]
    other = [a for a in range(d) if a != k]
    Sb = 2 * p + 1                                  # base segments/line

    if d == 2:
        j = other[0]
        # face restrictions phi(b, t) for t in {0,1}: shared sample pts
        spts = np.zeros((len(ts), 2, d))
        spts[:, :, j] = ts[:, None]
        spts[:, 0, k] = 0.0
        spts[:, 1, k] = 1.0
        tab = np.asarray(el.tabulate(spts))         # (p+1, 2, nd)
        vals = np.einsum("tfn,cn->cft", tab, dofs)  # (Cg, 2, p+1)
        coef = _poly_coeffs(vals, ts)
        roots, _ = _roots_in_unit(coef)             # (Cg, 2, p)
        lo, hi = _segments(roots.reshape(Cg, 2 * p))
        ln = hi - lo                                # (Cg, Sb)
        b = lo[..., None] + ln[..., None] * gx      # (Cg, Sb, n1)
        w = ln[..., None] * gw
        NB = Sb * n1
        pts = np.zeros((Cg, NB, d))
        pts[:, :, j] = b.reshape(Cg, NB)
        return pts, w.reshape(Cg, NB)

    j1, j2 = other                                  # outer, inner axes
    n1o = n1 + 1
    ax, aw = gauss_legendre(n1o)
    # phi(a_i, b, t) restrictions in b for t in {0,1}: shared sample pts
    spts = np.zeros((n1o, len(ts), 2, d))
    spts[..., j1] = ax[:, None, None]
    spts[..., j2] = ts[None, :, None]
    spts[:, :, 1, k] = 1.0
    tab = np.asarray(el.tabulate(spts))             # (n1o, p+1, 2, nd)
    vals = np.einsum("otfn,cn->coft", tab, dofs)    # (Cg, n1o, 2, p+1)
    coef = _poly_coeffs(vals, ts)
    roots, _ = _roots_in_unit(coef)                 # (Cg, n1o, 2, p)
    lo, hi = _segments(roots.reshape(Cg, n1o, 2 * p))
    ln = hi - lo                                    # (Cg, n1o, Sb)
    b = lo[..., None] + ln[..., None] * gx          # (Cg, n1o, Sb, n1)
    w = ln[..., None] * gw * aw[None, :, None, None]
    NB = n1o * Sb * n1
    pts = np.zeros((Cg, n1o, Sb, n1, d))
    pts[..., j1] = ax[None, :, None, None]
    pts[..., j2] = b
    return pts.reshape(Cg, NB, d), w.reshape(Cg, NB)


def _line_values(el, dofs, base_pts, k):
    """Sample phi along the height lines: coefficient array (Cg, NB, p+1)
    of the degree-p restriction at every base point."""
    p = el.degree
    ts = _fit_nodes(p)
    pts = np.repeat(base_pts[:, :, None, :], len(ts), axis=2)
    pts[..., k] = ts[None, None, :]
    tab = np.asarray(el.tabulate(pts))              # (Cg, NB, p+1, nd)
    vals = np.einsum("cbtn,cn->cbt", tab, dofs)
    return _poly_coeffs(vals, ts), pts


def _detJ(mesh, cells, pts):
    """|det J| of the (bi/tri)linear cell map at per-cell reference
    points. pts: (C, Np, d) -> (|det J| (C, Np), J)."""
    el1 = lagrange_element(mesh.cell_type, 1)
    dphi = np.asarray(el1.tabulate_grad(pts))
    coords = mesh.cell_vertex_coords[cells]
    J = np.einsum("cvg,cpvd->cpgd", coords, dphi)
    if J.shape[-2] == J.shape[-1]:
        return np.abs(np.linalg.det(J)), J
    G = np.einsum("cpgd,cpge->cpde", J, J)
    return np.sqrt(np.abs(np.linalg.det(G))), J


def saye_volume_rules(mesh, phi, cut_cells, order, side="<"):
    """Padded volume rules for {phi < 0} / {phi > 0} on cut quad/hex
    cells by dimension-reduction quadrature (the algoim backends of
    cut.cpp:1311-1406)."""
    _validate_host(mesh)
    d = mesh.tdim
    V = phi.function_space
    el = V.element
    p = V.degree
    cut_cells = np.asarray(cut_cells, dtype=np.int32)
    C = len(cut_cells)
    n1 = _npts_1d(order)
    gx, gw = gauss_legendre(n1)
    S = p + 1
    dofs_all = np.asarray(phi.x)[np.asarray(V.dofmap)[cut_cells]]
    sgn = 1.0 if side == "<" else -1.0

    points = weights = None                 # allocated on first group
    for k, idx in _group_by_height(mesh, phi, cut_cells):
        base_pts, base_w = _split_base(mesh, el, dofs_all[idx], k, order)
        coef, _ = _line_values(el, dofs_all[idx], base_pts, k)
        coef = sgn * coef
        roots, _ = _roots_in_unit(coef)
        lo, hi = _segments(roots)                   # (Cg, NB, S)
        ln = hi - lo
        mid = 0.5 * (lo + hi)
        use = (_poly_eval(coef[..., None, :], mid) < 0.0) & (ln > 1e-14)
        tq = lo[..., None] + ln[..., None] * gx     # (Cg, NB, S, n1)
        wq = use[..., None] * ln[..., None] * gw \
            * base_w[:, :, None, None]
        Cg, NBg = base_pts.shape[:2]
        pts = np.repeat(base_pts[:, :, None, :], S * n1, axis=2) \
            .reshape(Cg, NBg, S, n1, d)
        pts[..., k] = tq
        Qmax = NBg * S * n1
        pts = pts.reshape(Cg, Qmax, d)
        wq = wq.reshape(Cg, Qmax)
        det, _ = _detJ(mesh, cut_cells[idx], pts)
        if points is None:
            points = np.zeros((C, Qmax, d))
            weights = np.zeros((C, Qmax))
        points[idx] = pts
        weights[idx] = wq * det
    if points is None:                              # no cut cells
        points = np.zeros((C, 1, d))
        weights = np.zeros((C, 1))
    return RuntimeQuadratureRules(d, cut_cells, points, weights, mesh=mesh)


def saye_interface_rules(mesh, phi, cut_cells, order):
    """Padded interface ({phi = 0}) rules on cut quad/hex cells: surface
    points are the exact line roots, weighted by the graph factor
    |grad phi|/|d_k phi| and the Nanson surface transform
    |det J| |J^-T n_ref|; geometric normals along grad(phi) (outward
    from {phi<0}, matching interface_rules)."""
    _validate_host(mesh)
    d = mesh.tdim
    V = phi.function_space
    el = V.element
    p = V.degree
    cut_cells = np.asarray(cut_cells, dtype=np.int32)
    C = len(cut_cells)
    dofs_all = np.asarray(phi.x)[np.asarray(V.dofmap)[cut_cells]]
    gdim = mesh.gdim

    points = weights = normals = None
    for k, idx in _group_by_height(mesh, phi, cut_cells):
        base_pts, base_w = _split_base(mesh, el, dofs_all[idx], k, order)
        coef, _ = _line_values(el, dofs_all[idx], base_pts, k)
        roots, valid = _roots_in_unit(coef)         # (Cg, NB, p)
        Cg, NBg = base_pts.shape[:2]
        pts = np.repeat(base_pts[:, :, None, :], p, axis=2)
        pts[..., k] = roots
        Qmax = NBg * p
        pts = pts.reshape(Cg, Qmax, d)
        gtab = np.asarray(el.tabulate_grad(pts))    # (Cg, Q, nd, d)
        gref = np.einsum("cqnd,cn->cqd", gtab, dofs_all[idx])
        gnorm = np.linalg.norm(gref, axis=-1)
        dk = np.abs(gref[..., k])
        trans = valid.reshape(Cg, Qmax) & (dk > 1e-12)
        graph = np.where(trans, gnorm / np.where(trans, dk, 1.0), 0.0)
        wref = np.repeat(base_w[:, :, None], p, axis=2) \
            .reshape(Cg, Qmax) * graph
        det, J = _detJ(mesh, cut_cells[idx], pts)
        nref = gref / np.maximum(gnorm, 1e-30)[..., None]
        Jinv = np.linalg.inv(J)
        cov = np.einsum("cqdg,cqd->cqg", Jinv, nref)
        covn = np.linalg.norm(cov, axis=-1)
        nphys = cov / np.maximum(covn, 1e-30)[..., None]
        if points is None:
            points = np.zeros((C, Qmax, d))
            weights = np.zeros((C, Qmax))
            normals = np.zeros((C, Qmax, gdim))
        points[idx] = pts
        weights[idx] = wref * det * covn
        normals[idx] = np.where(trans[..., None], nphys, 0.0)
    if points is None:
        points = np.zeros((C, 1, d))
        weights = np.zeros((C, 1))
        normals = np.zeros((C, 1, gdim))
    return RuntimeQuadratureRules(d, cut_cells, points, weights, mesh=mesh,
                                  normals_padded=normals)
