"""Higher-order (curved) cut approximation on simplex hosts.

The reference delegates ``cut_approximation_order`` to CutCells/Algoim
(/root/reference/python/cutfemx/cut.py:190-194): a P2 level set's interface
is approximated at higher order, not just by refined linear marching. Here
the curved path (cut/quadrature.py: polished edge roots + isoparametric P2
parts with mid-edge nodes projected onto {phi=0}) must

- beat red-refined linear marching at MATCHED (or lower) point counts, and
- converge at geometric order >= ~3 where linear marching gives 2.
"""

import numpy as np
import pytest

import cutfemx_tpu as cfx
from cutfemx_tpu.cut.quadrature import (full_cell_rules, interface_rules,
                                        volume_rules)


def _sphere_phi(mesh, r):
    V = cfx.functionspace(mesh, ("Lagrange", 2))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: sum(xi ** 2 for xi in x) - r * r)
    return phi


def _region_volume(mesh, phi, rules):
    """sum of physical weights of the cut rules + exact volume of the
    fully-inside cells."""
    cd = cfx.cut(phi)
    inside = cfx.locate_entities(cd, "phi<0")
    w_in = float(np.sum(np.asarray(
        full_cell_rules(mesh, inside, 1).weights_padded)))
    return w_in + float(np.sum(np.asarray(rules.weights_padded)))


def _cut_cells(phi):
    cd = cfx.cut(phi)
    from cutfemx_tpu.cut.classify import DOMAIN_INTERSECTED
    return cd.hosted_entities[cd.domains[0] == DOMAIN_INTERSECTED]


@pytest.mark.parametrize("n", [6, 12])
def test_curved_beats_red_refinement_tet_volume(n):
    """P2 sphere level set on tets: curved marching at the BASE part count
    must beat one level of red refinement (8x the parts/points)."""
    r = 0.6
    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (n, n, n))
    assert mesh.cell_type == "tetrahedron"
    phi = _sphere_phi(mesh, r)
    cells = _cut_cells(phi)
    exact = 4.0 / 3.0 * np.pi * r ** 3

    vol = {}
    for name, kw in [("linear", dict(levels=0)),
                     ("red1", dict(levels=1)),
                     ("curved", dict(levels=0, curved=True))]:
        rules = volume_rules(mesh, phi, cells, 3, side="<", **kw)
        vol[name] = _region_volume(mesh, phi, rules)
    err = {k: abs(v - exact) for k, v in vol.items()}

    assert err["curved"] < err["red1"] < err["linear"]
    # curved at 1x points should beat red refinement by a clear margin
    assert err["curved"] < 0.5 * err["red1"]


def test_curved_volume_convergence_order_tet():
    r = 0.6
    errs = []
    for n in (6, 12):
        mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (n, n, n))
        phi = _sphere_phi(mesh, r)
        cells = _cut_cells(phi)
        rules = volume_rules(mesh, phi, cells, 3, side="<", curved=True)
        errs.append(abs(_region_volume(mesh, phi, rules)
                        - 4.0 / 3.0 * np.pi * r ** 3))
    order = np.log2(errs[0] / errs[1])
    assert order > 2.7, (errs, order)


def test_curved_interface_area_tet():
    """Surface area of the sphere from curved interface rules: beats the
    red-refined linear rules and converges at order >= ~3."""
    r = 0.6
    exact = 4.0 * np.pi * r ** 2
    err_c, err_r = [], []
    # n=6 -> n=16: cut-pattern/alignment noise makes adjacent doublings
    # non-monotone on Freudenthal tets; the wide pair shows the rate
    for n in (6, 16):
        mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (n, n, n))
        phi = _sphere_phi(mesh, r)
        cells = _cut_cells(phi)
        a_c = float(np.sum(np.asarray(interface_rules(
            mesh, phi, cells, 3, curved=True).weights_padded)))
        a_r = float(np.sum(np.asarray(interface_rules(
            mesh, phi, cells, 3, levels=1).weights_padded)))
        err_c.append(abs(a_c - exact))
        err_r.append(abs(a_r - exact))
    assert err_c[0] < err_r[0] and err_c[1] < err_r[1], (err_c, err_r)
    rate = np.log(err_c[0] / err_c[1]) / np.log(16.0 / 6.0)
    assert rate > 2.5, (err_c, rate)


def test_curved_interface_normals_tet():
    """Per-point curved normals converge to the true outward direction
    x/|x| at O(h^2) in the measure-weighted RMS (sliver parts carry tiny
    weight but O(h^2)-with-bad-constant pointwise error, so max-norm is
    not the right metric for quadrature normals)."""
    r = 0.6
    rms, med = [], []
    for n in (8, 16):
        mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (n, n, n))
        phi = _sphere_phi(mesh, r)
        cells = _cut_cells(phi)
        rules = interface_rules(mesh, phi, cells, 2, curved=True)
        w = np.asarray(rules.weights_padded)
        mask = w != 0.0
        wts = w[mask]
        nrm = np.asarray(rules.normals_padded)[mask]
        pts = rules.physical_points.T[: mask.sum()]
        true_n = pts / np.linalg.norm(pts, axis=1, keepdims=True)
        err = np.linalg.norm(nrm - true_n, axis=1)
        rms.append(np.sqrt(np.sum(wts * err ** 2) / np.sum(wts)))
        med.append(np.median(err))
    assert rms[0] < 0.03 and med[0] < 5e-3, (rms, med)
    assert rms[0] / rms[1] > 2.5, rms   # ~O(h^2)


@pytest.mark.parametrize("n", [8, 16])
def test_curved_triangle_circle(n):
    """2D: circle area + perimeter from curved rules beat red refinement."""
    r = 0.55
    mesh = cfx.mesh.create_rectangle((-1, -1), (1, 1), (n, n))
    assert mesh.cell_type == "triangle"
    V = cfx.functionspace(mesh, ("Lagrange", 2))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: x[0] ** 2 + x[1] ** 2 - r * r)
    cells = _cut_cells(phi)

    exact_a = np.pi * r ** 2
    errs = {}
    for name, kw in [("red1", dict(levels=1)),
                     ("curved", dict(curved=True))]:
        rules = volume_rules(mesh, phi, cells, 3, side="<", **kw)
        errs[name] = abs(_region_volume(mesh, phi, rules) - exact_a)
    assert errs["curved"] < errs["red1"]

    exact_p = 2.0 * np.pi * r
    p_c = float(np.sum(np.asarray(interface_rules(
        mesh, phi, cells, 3, curved=True).weights_padded)))
    p_r = float(np.sum(np.asarray(interface_rules(
        mesh, phi, cells, 3, levels=1).weights_padded)))
    assert abs(p_c - exact_p) < abs(p_r - exact_p)


def test_api_order2_selects_curved_path():
    """cut(phi, cut_approximation_order=2) on a tet mesh routes
    runtime_quadrature through the curved rules (better volume than the
    default red-refined path at far fewer points)."""
    r, n = 0.6, 8
    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (n, n, n))
    phi = _sphere_phi(mesh, r)
    exact = 4.0 / 3.0 * np.pi * r ** 3

    cd1 = cfx.cut(phi)   # auto: red-refined marching (levels 2)
    cd2 = cfx.cut(phi, cut_approximation_order=2)
    r1 = cfx.runtime_quadrature(cd1, "phi<0", 3)
    r2 = cfx.runtime_quadrature(cd2, "phi<0", 3)
    v1 = _region_volume(mesh, phi, r1)
    v2 = _region_volume(mesh, phi, r2)
    assert r2.total_points < 0.5 * r1.total_points
    assert abs(v2 - exact) < abs(v1 - exact)
