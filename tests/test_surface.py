"""Surface PDE machinery: codim-2 skeleton rules, side-aware conormals,
correction distance, and a cut surface-DG Poisson solve — mirrors
/root/reference/python/demo/demo_surface_poisson_dg.py and
geometry/{conormal,correction_distance}.h."""

import numpy as np
import pytest

import jax.numpy as jnp

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (CellDiameter, CoefficientExpr,
                                   FacetNormal, Identity, SpatialCoordinate,
                                   TestFunction, TrialFunction, avg, dot,
                                   grad, inner, jump, outer)
from cutfemx_tpu.forms.measure import Measure
from cutfemx_tpu.la import direct_solve


def _circle_setup(n=32, r=0.62, phi_degree=2):
    mesh = cfx.mesh.create_rectangle((-1.0, -1.0), (1.0, 1.0), (n, n))
    V = cfx.functionspace(mesh, ("Lagrange", phi_degree))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: (x[0] ** 2 + x[1] ** 2) - r ** 2)
    return mesh, phi


def test_skeleton_rules_are_crossing_points():
    mesh, phi = _circle_setup(16, phi_degree=1)
    cd = cfx.cut(phi)
    cut_cells = cfx.locate_entities(cd, "phi=0")
    skel = cfx.interior_facets_for_cells(mesh, cut_cells)
    fcd = cfx.cut(phi, skel, mesh.tdim - 1)
    rules = cfx.runtime_quadrature(fcd, "phi=0", 2)
    # every cut skeleton facet carries exactly one unit-weight point
    w = np.asarray(rules.weights_padded)
    counts = (w > 0).sum(axis=1)
    assert (counts == 1).all()
    assert np.allclose(w.sum(axis=1), 1.0)
    # crossing points lie on the (P1) interface: |phi| small
    from cutfemx_tpu.elements import lagrange_element
    el = lagrange_element(mesh.cell_type, 1)
    pts = np.asarray(rules.points_padded)
    coords = mesh.cell_vertex_coords[rules.parent_cells]
    phys = np.einsum("nqv,nvg->nqg", np.asarray(el.tabulate(pts)), coords)
    mask = w > 0
    rad = np.linalg.norm(phys[mask], axis=-1)
    assert np.abs(rad - 0.62).max() < 0.05


def test_correction_distance_circle():
    """rho along the level-set normal corrects P1 cut points onto the
    exact (P2) zero set: |x + rho n| = r."""
    r = 0.62
    mesh, phi = _circle_setup(24, r, phi_degree=2)
    cd = cfx.cut(phi)
    rules = cfx.runtime_quadrature(cd, "phi=0", 2)
    ng = cfx.normal(phi)
    rho_field = cfx.correction_distance(phi, ng)
    rho = np.asarray(rho_field.evaluator(rules))
    n_vals = np.asarray(ng.evaluator(rules))
    from cutfemx_tpu.elements import lagrange_element
    el = lagrange_element(mesh.cell_type, 1)
    pts = np.asarray(rules.points_padded)
    coords = mesh.cell_vertex_coords[rules.parent_cells]
    phys = np.einsum("nqv,nvg->nqg", np.asarray(el.tabulate(pts)), coords)
    corrected = phys + rho[..., None] * n_vals
    mask = np.asarray(rules.weights_padded) > 0
    rad = np.linalg.norm(corrected[mask], axis=-1)
    assert np.abs(rad - r).max() < 1e-10


def test_conormal_orthogonality():
    """mu is unit, tangent to the surface (mu.n = 0), and mu('+') points
    out of the '+' cell."""
    mesh, phi = _circle_setup(20, phi_degree=1)
    cd = cfx.cut(phi)
    cut_cells = cfx.locate_entities(cd, "phi=0")
    skel = cfx.interior_facets_for_cells(mesh, cut_cells)
    fcd = cfx.cut(phi, skel, mesh.tdim - 1)
    rules = cfx.runtime_quadrature(fcd, "phi=0", 2)
    ng = cfx.normal(phi)
    mu = cfx.conormal(ng)
    mup = np.asarray(mu.evaluator(rules, "+"))
    mum = np.asarray(mu.evaluator(rules, "-"))
    nv = np.asarray(ng.evaluator(rules))
    w = np.asarray(rules.weights_padded)
    m = w > 0
    assert np.abs(np.linalg.norm(mup[m], axis=-1) - 1).max() < 1e-10
    assert np.abs(np.einsum("pg,pg->p", mup[m], nv[m])).max() < 1e-10
    # the two sides' conormals oppose (planar curve through the facet)
    assert (np.einsum("pg,pg->p", mup[m], mum[m]) < -0.9).all()


def solve_surface_poisson(n, r=0.62, penalty=20.0, ghost=0.1):
    """-Delta_Gamma u + u = f on the circle; u = x/r, f = (1+1/r^2) u."""
    mesh, phi = _circle_setup(n, r, phi_degree=1)
    cd = cfx.cut(phi)
    cut_cells = cfx.locate_entities(cd, "phi=0")
    gamma_rules = cfx.runtime_quadrature(cd, "phi=0", 4)
    skel = cfx.interior_facets_for_cells(mesh, cut_cells)
    fcd = cfx.cut(phi, skel, mesh.tdim - 1)
    skel_rules = cfx.runtime_quadrature(fcd, "phi=0", 4)
    ghost_facets = cfx.locate_entities(fcd, "phi=0")

    dxg = Measure("dx", domain=mesh, subdomain_data=gamma_rules)
    dSg = Measure("dS", domain=mesh, subdomain_data=skel_rules)
    dSh = Measure("dS", domain=mesh, subdomain_data=ghost_facets)

    V = cfx.functionspace(mesh, ("DG", 1))
    u, v = TrialFunction(V), TestFunction(V)
    x = SpatialCoordinate(mesh)
    ng = cfx.normal(phi)
    mu = cfx.conormal(ng)
    nf = FacetNormal(mesh)
    h = CellDiameter(mesh)

    P = Identity(2) - outer(ng, ng)
    gu = dot(P, grad(u))
    gv = dot(P, grad(v))
    ngp, ngm = ng("+"), ng("-")
    Pp = Identity(2) - outer(ngp, ngp)
    Pm = Identity(2) - outer(ngm, ngm)
    avg_gu = 0.5 * (dot(Pp, grad(u)("+")) + dot(Pm, grad(u)("-")))
    avg_gv = 0.5 * (dot(Pp, grad(v)("+")) + dot(Pm, grad(v)("-")))
    ju = jump(u, mu)
    jv = jump(v, mu)

    u_ex = x[0] / r
    f = (1.0 + 1.0 / r ** 2) * u_ex

    a = (inner(gu, gv) + u * v) * dxg
    a += -inner(avg_gu, jv) * dSg
    a += -inner(avg_gv, ju) * dSg
    a += penalty / avg(h) * inner(ju, jv) * dSg
    a += ghost * inner(jump(grad(u), nf), jump(grad(v), nf)) * dSh
    L = f * v * dxg

    af, Lf = fem.form(a), fem.form(L)
    A = fem.assemble_matrix(af)
    b = np.array(fem.assemble_vector(Lf))
    dom = fem.active_domain(af)
    fem.deactivate_outside(A, b, dom)
    uh = cfx.Function(V)
    uh.x = jnp.asarray(direct_solve(A, b))
    e = CoefficientExpr(uh) - u_ex
    err = float(fem.assemble_scalar(fem.form(e * e * dxg)))
    return np.sqrt(max(err, 0.0))


def test_surface_poisson_dg_converges():
    ec = solve_surface_poisson(16)
    ef = solve_surface_poisson(32)
    assert ef < 2e-2
    assert np.log2(ec / ef) > 1.3, (ec, ef)
