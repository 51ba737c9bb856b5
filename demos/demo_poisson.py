"""Poisson on an implicitly defined flower-shaped cut domain.

TPU-native re-design of /root/reference/python/demo/demo_poisson.py: the
physical domain is {phi < 0} for a polar flower level set on a fixed
background mesh; Dirichlet data are imposed weakly on {phi = 0} with
symmetric Nitsche terms and ghost-penalty stabilization on the cut-cell
facet band.

Run:  python demos/demo_poisson.py [--n 32] [--degree 1] [--solver cg|direct]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax.numpy as jnp

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (CellDiameter, CoefficientExpr,
                                   FacetNormal, SpatialCoordinate,
                                   TestFunction, TrialFunction, avg, cos,
                                   dot, grad, inner, jump, pi, sin)
from cutfemx_tpu.forms.measure import Measure
from cutfemx_tpu.la import cg, direct_solve


def flower_level_set(base_radius, amplitude, petals):
    def phi(x):
        theta = np.arctan2(x[1], x[0])
        boundary_radius = base_radius + amplitude * np.cos(petals * theta)
        return np.sqrt(x[0] ** 2 + x[1] ** 2) - boundary_radius
    return phi


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=32)
    p.add_argument("--degree", type=int, default=1)
    p.add_argument("--solver", default="direct", choices=["direct", "cg"])
    args = p.parse_args()

    n = args.n
    base_radius, amplitude, petals = 0.46, 0.15, 6
    gamma, gamma_g = 40.0, 0.1

    t0 = time.perf_counter()
    mesh = cfx.mesh.create_rectangle((-1.0, -1.0), (1.0, 1.0), (n, n))
    V_phi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(V_phi, name="phi")
    phi.interpolate(flower_level_set(base_radius, amplitude, petals))

    cut_data = cfx.cut(phi)
    inside_cells = cfx.locate_entities(cut_data, "phi<0")
    volume_rules = cfx.runtime_quadrature(cut_data, "phi<0", 2 * args.degree)
    interface_rules = cfx.runtime_quadrature(cut_data, "phi=0",
                                             2 * args.degree)
    ghost_facets = cfx.ghost_penalty_facets(cut_data, "phi<0")

    dx_omega = Measure("dx", domain=mesh,
                       subdomain_data=[inside_cells, volume_rules])
    dx_gamma = Measure("dx", domain=mesh, subdomain_data=interface_rules)
    dS_ghost = Measure("dS", domain=mesh, subdomain_data=ghost_facets)

    V = cfx.functionspace(mesh, ("Lagrange", args.degree))
    u, v = TrialFunction(V), TestFunction(V)
    x = SpatialCoordinate(mesh)
    n_gamma = cfx.normal(phi)
    n_facet = FacetNormal(mesh)
    h = CellDiameter(mesh)

    u_exact = sin(pi * x[0]) * sin(pi * x[1])
    f = 2.0 * pi ** 2 * u_exact

    a = inner(grad(u), grad(v)) * dx_omega
    a += (-dot(grad(u), n_gamma) * v - dot(grad(v), n_gamma) * u
          + gamma / h * u * v) * dx_gamma
    if ghost_facets.size > 0:
        a += (gamma_g * avg(h)
              * inner(jump(grad(u), n_facet), jump(grad(v), n_facet))
              ) * dS_ghost
    L = f * v * dx_omega
    L += (-dot(grad(v), n_gamma) * u_exact
          + gamma / h * u_exact * v) * dx_gamma

    a_form, L_form = fem.form(a), fem.form(L)
    b = np.array(fem.assemble_vector(L_form))
    domain = fem.active_domain(a_form)

    if args.solver == "direct":
        A = fem.assemble_matrix(a_form)
        fem.deactivate_outside(A, b, domain)
        uh_arr = direct_solve(A, b)
        solver_info = "scipy spsolve"
    else:
        op = fem.CutOperator(a_form, domain)
        bj = jnp.asarray(b).at[jnp.asarray(domain.inactive_dofs)].set(0.0)
        d = op.diagonal()
        uh_jnp, its, res = cg(op, bj, M=lambda r: r / d, rtol=1e-10,
                              maxiter=2000)
        uh_arr = np.asarray(uh_jnp)
        solver_info = f"matrix-free CG+Jacobi ({int(its)} its, " \
                      f"|r|={float(res):.2e})"

    uh = cfx.Function(V)
    uh.x = jnp.asarray(uh_arr)
    err = CoefficientExpr(uh) - u_exact
    err_sq = float(fem.assemble_scalar(fem.form(err * err * dx_omega)))
    elapsed = time.perf_counter() - t0

    print(f"Cut Poisson problem on a {petals}-petal flower, n={n}, "
          f"P{args.degree}")
    print(f"inside cells = {inside_cells.size}")
    print(f"cut cells    = {interface_rules.parent_map.size}")
    print(f"ghost facets = {ghost_facets.size}")
    print(f"solver       = {solver_info}")
    print(f"L2 error     = {np.sqrt(max(err_sq, 0.0)):.6e}")
    print(f"total time   = {elapsed:.2f}s")


if __name__ == "__main__":
    main()
