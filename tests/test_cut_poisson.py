"""End-to-end 2D cut Poisson: the minimum-slice milestone (SURVEY.md §7
stage 5), mirroring /root/reference/python/demo/demo_poisson.py:135-222 —
Nitsche boundary conditions on the embedded interface, ghost-penalty
stabilization, dof deactivation, and L2-error convergence."""

import numpy as np
import pytest

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (CellDiameter, CoefficientExpr,
                                   FacetNormal, SpatialCoordinate,
                                   TestFunction, TrialFunction, avg, dot,
                                   grad, inner, jump, pi, sin)
from cutfemx_tpu.forms.measure import Measure
from cutfemx_tpu.la import direct_solve


def solve_cut_poisson(n, r=0.46, degree=1, gamma=40.0, gamma_g=0.1):
    mesh = cfx.mesh.create_rectangle((-1.0, -1.0), (1.0, 1.0), (n, n))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2) - r)

    cut_data = cfx.cut(phi)
    inside_cells = cfx.locate_entities(cut_data, "phi<0")
    volume_rules = cfx.runtime_quadrature(cut_data, "phi<0", 2 * degree)
    interface_rules = cfx.runtime_quadrature(cut_data, "phi=0", 2 * degree)
    ghost_facets = cfx.ghost_penalty_facets(cut_data, "phi<0")

    dx_omega = Measure("dx", domain=mesh,
                       subdomain_data=[inside_cells, volume_rules])
    dx_gamma = Measure("dx", domain=mesh, subdomain_data=interface_rules)
    dS_ghost = Measure("dS", domain=mesh, subdomain_data=ghost_facets)

    V = cfx.functionspace(mesh, ("Lagrange", degree))
    u, v = TrialFunction(V), TestFunction(V)
    x = SpatialCoordinate(mesh)
    n_gamma = cfx.normal(phi)
    n_facet = FacetNormal(mesh)
    h = CellDiameter(mesh)
    h_avg = avg(h)

    u_exact = sin(pi * x[0]) * sin(pi * x[1])
    f = 2.0 * pi ** 2 * u_exact

    a = inner(grad(u), grad(v)) * dx_omega
    a += (-dot(grad(u), n_gamma) * v - dot(grad(v), n_gamma) * u
          + gamma / h * u * v) * dx_gamma
    if ghost_facets.size > 0:
        a += (gamma_g * h_avg
              * inner(jump(grad(u), n_facet), jump(grad(v), n_facet))
              ) * dS_ghost

    L = f * v * dx_omega
    L += (-dot(grad(v), n_gamma) * u_exact
          + gamma / h * u_exact * v) * dx_gamma

    a_form, L_form = fem.form(a), fem.form(L)
    A = fem.assemble_matrix(a_form)
    b = np.array(fem.assemble_vector(L_form))
    domain = fem.active_domain(a_form)
    fem.deactivate_outside(A, b, domain)

    uh = cfx.Function(V)
    import jax.numpy as jnp
    uh.x = jnp.asarray(direct_solve(A, b))

    err = CoefficientExpr(uh) - u_exact
    err_sq = fem.assemble_scalar(fem.form(err * err * dx_omega))
    return float(np.sqrt(max(float(err_sq), 0.0))), domain, A


def test_cut_poisson_convergence_p1():
    errs = [solve_cut_poisson(n)[0] for n in (16, 32, 64)]
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    assert errs[-1] < 2e-3
    assert rates[-1] > 1.7, (errs, rates)


def test_cut_poisson_p2():
    err_c, _, _ = solve_cut_poisson(24, degree=2)
    err_f, _, _ = solve_cut_poisson(48, degree=2)
    rate = np.log2(err_c / err_f)
    # P1 level-set geometry limits convergence to ~O(h^2); P2 solution on
    # exact geometry would give 3
    assert err_f < 5e-4
    assert rate > 1.6, (err_c, err_f, rate)


def test_deactivation_structure():
    err, domain, A = solve_cut_poisson(16)
    V = domain.function_space
    assert 0 < len(domain.inactive_dofs) < V.dim
    M = A.to_scipy().tocsr()
    for d in domain.inactive_dofs[:20]:
        row = M.getrow(int(d)).toarray().ravel()
        assert row[d] == 1.0
        row[d] = 0.0
        assert np.abs(row).max() == 0.0


def test_active_domain_matches_reference_semantics():
    """active cells = union of all integral domains incl. facet neighbors
    (deactivate.h:103-183)."""
    n = 16
    mesh = cfx.mesh.create_rectangle((-1.0, -1.0), (1.0, 1.0), (n, n))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2) - 0.46)
    cut_data = cfx.cut(phi)
    inside = cfx.locate_entities(cut_data, "phi<0")
    rules = cfx.runtime_quadrature(cut_data, "phi<0", 2)
    dxw = Measure("dx", domain=mesh, subdomain_data=[inside, rules])
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    u, v = TrialFunction(V), TestFunction(V)
    a = fem.form(u * v * dxw)
    dom = fem.active_domain(a)
    expected = set(inside.tolist()) | set(rules.parent_map.tolist())
    assert set(dom.active_cells.tolist()) == expected
