"""Geometric-Galerkin multigrid preconditioning (mg.py): transfers are
exact P1 interpolation on the structured lattice, the V-cycle is a
symmetric preconditioner, and iteration counts drop dramatically vs
plain Jacobi CG."""

import numpy as np
import pytest

import cutfemx_tpu as cfx
from cutfemx_tpu import fem, mg
from cutfemx_tpu.forms.dsl import (CellDiameter, FacetNormal,
                                   SpatialCoordinate, TestFunction,
                                   TrialFunction, avg, dot, grad, inner,
                                   jump, pi, sin)
from cutfemx_tpu.forms.measure import Measure


def _stabilized_cut_poisson(n, deg):
    mesh = cfx.mesh.create_rectangle((-1.0, -1.0), (1.0, 1.0), (n, n))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2) - 0.6)
    cd = cfx.cut(phi)
    inside = cfx.locate_entities(cd, "phi<0")
    vol = cfx.runtime_quadrature(cd, "phi<0", 2 * deg)
    srf = cfx.runtime_quadrature(cd, "phi=0", 2 * deg)
    gpf = cfx.ghost_penalty_facets(cd, "phi<0")
    dxo = Measure("dx", domain=mesh, subdomain_data=[inside, vol])
    dxg = Measure("dx", domain=mesh, subdomain_data=srf)
    dSg = Measure("dS", domain=mesh, subdomain_data=gpf)
    V = cfx.functionspace(mesh, ("Lagrange", deg))
    u, v = TrialFunction(V), TestFunction(V)
    x = SpatialCoordinate(mesh)
    ng = cfx.normal(phi)
    nf = FacetNormal(mesh)
    h = CellDiameter(mesh)
    ue = sin(pi * x[0]) * sin(pi * x[1])
    f = 2 * pi ** 2 * ue
    a = inner(grad(u), grad(v)) * dxo
    a += (-dot(grad(u), ng) * v - dot(grad(v), ng) * u
          + 40.0 / h * u * v) * dxg
    a += 0.1 * avg(h) * inner(jump(grad(u), nf),
                              jump(grad(v), nf)) * dSg
    L = f * v * dxo + (-dot(grad(v), ng) * ue + 40.0 / h * ue * v) * dxg
    af, Lf = fem.form(a), fem.form(L)
    dom = fem.active_domain(af)
    A = fem.assemble_matrix(af)
    b = np.array(fem.assemble_vector(Lf))
    fem.deactivate_outside(A, b, dom)
    return V, af, dom, A, b


def test_p1_grid_transfer_is_interpolation():
    """Prolongating a P1 field from the coarse lattice reproduces the
    coarse function exactly at every fine vertex."""
    fine = cfx.mesh.create_rectangle((-1, -1), (1, 1), (16, 16))
    coarse = cfx.mesh.create_rectangle((-1, -1), (1, 1), (8, 8))
    idx, w = mg.p1_grid_transfer(fine, coarse)
    uc = 2.0 * coarse.vertices[:, 0] - 0.7 * coarse.vertices[:, 1] + 0.3
    uf = (w * uc[idx]).sum(axis=1)
    exact = 2.0 * fine.vertices[:, 0] - 0.7 * fine.vertices[:, 1] + 0.3
    assert np.abs(uf - exact).max() < 1e-12


def test_mg_matches_jacobi_solution():
    V, af, dom, A, b = _stabilized_cut_poisson(32, 1)
    op = fem.CutOperator(af, dom)
    import jax.numpy as jnp
    xj, itj, _ = op.solve_cg(jnp.asarray(b), rtol=1e-10, maxiter=3000)
    xm, itm, _ = mg.mg_solve_cg(A, V, b, rtol=1e-10, maxiter=200)
    mask = dom.active_mask
    diff = np.abs(np.asarray(xj) - np.asarray(xm))[mask].max()
    assert diff < 1e-7
    assert itm < itj / 3, (itm, itj)


def test_mg_p1_near_mesh_independence():
    its = []
    for n in (16, 32, 64):
        V, af, dom, A, b = _stabilized_cut_poisson(n, 1)
        _, it, res = mg.mg_solve_cg(A, V, b, rtol=1e-8, maxiter=100)
        its.append(it)
    assert its[-1] <= 2 * its[0] + 4, its
    assert its[-1] < 25, its


def test_mg_p2_beats_jacobi_iterations():
    V, af, dom, A, b = _stabilized_cut_poisson(32, 2)
    op = fem.CutOperator(af, dom)
    import jax.numpy as jnp
    xj, itj, _ = op.solve_cg(jnp.asarray(b), rtol=1e-8, maxiter=3000)
    xm, itm, _ = mg.mg_solve_cg(A, V, b, rtol=1e-8, maxiter=400)
    assert itm < itj / 4, (itm, itj)


def test_mg_vector_elasticity():
    """Blocked (vector) MG: cut elasticity with ghost penalty."""
    from cutfemx_tpu.forms.dsl import Identity, sym, tr
    n = 24
    mesh = cfx.mesh.create_rectangle((-1.0, -1.0), (1.0, 1.0), (n, n))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2) - 0.6)
    cd = cfx.cut(phi)
    inside = cfx.locate_entities(cd, "phi<0")
    vol = cfx.runtime_quadrature(cd, "phi<0", 2)
    srf = cfx.runtime_quadrature(cd, "phi=0", 2)
    gpf = cfx.ghost_penalty_facets(cd, "phi<0")
    dxo = Measure("dx", domain=mesh, subdomain_data=[inside, vol])
    dxg = Measure("dx", domain=mesh, subdomain_data=srf)
    dSg = Measure("dS", domain=mesh, subdomain_data=gpf)
    V = cfx.functionspace(mesh, ("Lagrange", 1), shape=(2,))
    u, v = TrialFunction(V), TestFunction(V)
    ng = cfx.normal(phi)
    nf = FacetNormal(mesh)
    h = CellDiameter(mesh)

    def sigma(w):
        e = sym(grad(w))
        return 2 * e + 1.3 * tr(e) * Identity(2)

    a = inner(sigma(u), sym(grad(v))) * dxo
    a += (-inner(dot(sigma(u), ng), v) - inner(dot(sigma(v), ng), u)
          + 60.0 / h * inner(u, v)) * dxg
    a += 0.1 * avg(h) * inner(jump(grad(u), nf), jump(grad(v), nf)) * dSg
    from cutfemx_tpu.forms.dsl import as_vector
    L = inner(as_vector([0.0, -1.0]), v) * dxo
    af, Lf = fem.form(a), fem.form(L)
    dom = fem.active_domain(af)
    A = fem.assemble_matrix(af)
    b = np.array(fem.assemble_vector(Lf))
    fem.deactivate_outside(A, b, dom)
    import jax.numpy as jnp
    op = fem.CutOperator(af, dom)
    xj, itj, _ = op.solve_cg(jnp.asarray(b), rtol=1e-8, maxiter=3000)
    xm, itm, _ = mg.mg_solve_cg(A, V, b, rtol=1e-8, maxiter=200)
    mask = dom.active_mask
    rel = (np.abs(np.asarray(xj) - np.asarray(xm))[mask].max()
           / max(np.abs(np.asarray(xj)[mask]).max(), 1e-12))
    assert rel < 1e-6
    assert itm < itj / 2, (itm, itj)
