"""Nonlinear residuals with AD-exact Newton Jacobians — a capability the
AD-based form compiler provides beyond the reference's multilinear FFCx
kernels (fem.derivative / fem.newton_solve)."""

import numpy as np

import jax.numpy as jnp

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (CellDiameter, CoefficientExpr,
                                   SpatialCoordinate, TestFunction, dot,
                                   grad, inner, pi, sin)
from cutfemx_tpu.forms.measure import Measure, dx


def test_newton_nonlinear_poisson_fitted():
    """-div((1 + u^2) grad u) = f with manufactured solution on the unit
    square (strong BCs); Newton converges quadratically."""
    mesh = cfx.mesh.create_unit_square(12)
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    u = cfx.Function(V, name="u")
    v = TestFunction(V)
    x = SpatialCoordinate(mesh)

    u_ex_np = lambda X: X[0] * (1 - X[0]) * X[1] * (1 - X[1])  # noqa: E731
    uc = CoefficientExpr(u)
    kappa = 1.0 + uc * uc
    u_ex = x[0] * (1 - x[0]) * x[1] * (1 - x[1])
    kex = 1.0 + u_ex * u_ex
    # F(u; v) = (kappa grad u, grad v) - (kappa_ex grad u_ex, grad v)
    F = inner(kappa * grad(uc), grad(v)) * dx
    F -= inner(kex * grad(u_ex), grad(v)) * dx

    coords = V.dof_coordinates
    onb = ((np.abs(coords[:, 0]) < 1e-12)
           | (np.abs(coords[:, 0] - 1) < 1e-12)
           | (np.abs(coords[:, 1]) < 1e-12)
           | (np.abs(coords[:, 1] - 1) < 1e-12))
    bcs = [fem.dirichletbc(0.0, np.flatnonzero(onb), V)]

    u.interpolate(lambda X: 0.0 * X[0])
    u, its, hist = fem.newton_solve(F, u, bcs=bcs, tol=1e-12)
    assert hist[-1] < 1e-12
    assert its <= 6  # quadratic convergence
    err = np.abs(np.asarray(u.x) - u_ex_np(coords.T)).max()
    assert err < 5e-3


def test_newton_on_cut_domain():
    """Nonlinear reaction term on a cut disk with Nitsche BCs."""
    r, n, gamma = 0.6, 24, 40.0
    mesh = cfx.mesh.create_rectangle((-1, -1), (1, 1), (n, n))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(lambda X: np.sqrt(X[0] ** 2 + X[1] ** 2) - r)
    cd = cfx.cut(phi)
    inside = cfx.locate_entities(cd, "phi<0")
    vol = cfx.runtime_quadrature(cd, "phi<0", 2)
    srf = cfx.runtime_quadrature(cd, "phi=0", 2)
    dxo = Measure("dx", domain=mesh, subdomain_data=[inside, vol])
    dxg = Measure("dx", domain=mesh, subdomain_data=srf)

    V = cfx.functionspace(mesh, ("Lagrange", 1))
    u = cfx.Function(V, name="u")
    v = TestFunction(V)
    x = SpatialCoordinate(mesh)
    ng = cfx.normal(phi)
    h = CellDiameter(mesh)
    uc = CoefficientExpr(u)
    u_ex = sin(pi * x[0]) * sin(pi * x[1])
    f = 2 * pi ** 2 * u_ex + u_ex ** 3

    F = inner(grad(uc), grad(v)) * dxo + (uc ** 3 - f) * v * dxo
    F += (-dot(grad(uc), ng) * v - dot(grad(v), ng) * (uc - u_ex)
          + gamma / h * (uc - u_ex) * v) * dxg

    dom_probe = fem.form(inner(grad(cfx.ufl.TrialFunction(V)),
                               grad(v)) * dxo)
    dom = fem.active_domain(dom_probe)
    inactive = dom.inactive_dofs
    bcs = [fem.dirichletbc(0.0, inactive, V)]

    u.interpolate(lambda X: 0.0 * X[0])
    u, its, hist = fem.newton_solve(F, u, bcs=bcs, tol=1e-11)
    assert hist[-1] < 1e-11, hist
    e = CoefficientExpr(u) - u_ex
    err = float(fem.assemble_scalar(fem.form(e * e * dxo)))
    assert np.sqrt(max(err, 0.0)) < 8e-3
