"""Linear elasticity on a cut flower domain (TPU-native re-design of
/root/reference/python/demo/demo_elasticity.py): vector P1/P2 space,
Nitsche-imposed displacement on the embedded boundary, ghost penalty.

Run: python demos/demo_elasticity.py [--n 32] [--degree 1]
"""

from __future__ import annotations

import argparse

import numpy as np

import jax.numpy as jnp

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (CellDiameter, CoefficientExpr,
                                   FacetNormal, Identity, SpatialCoordinate,
                                   TestFunction, TrialFunction, as_vector,
                                   avg, dot, grad, inner, jump, pi, sin,
                                   sym, tr)
from cutfemx_tpu.forms.measure import Measure
from cutfemx_tpu.la import direct_solve


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=32)
    p.add_argument("--degree", type=int, default=1)
    args = p.parse_args()

    n, deg = args.n, args.degree
    r, gamma, gamma_g = 0.46, 60.0, 0.1
    mu, lam = 1.0, 1.25

    mesh = cfx.mesh.create_rectangle((-1.0, -1.0), (1.0, 1.0), (n, n))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2) - r)

    cd = cfx.cut(phi)
    inside = cfx.locate_entities(cd, "phi<0")
    vol = cfx.runtime_quadrature(cd, "phi<0", 2 * deg)
    srf = cfx.runtime_quadrature(cd, "phi=0", 2 * deg)
    gp = cfx.ghost_penalty_facets(cd, "phi<0")

    dxo = Measure("dx", domain=mesh, subdomain_data=[inside, vol])
    dxg = Measure("dx", domain=mesh, subdomain_data=srf)
    dSg = Measure("dS", domain=mesh, subdomain_data=gp)

    V = cfx.functionspace(mesh, ("Lagrange", deg), shape=(2,))
    u, v = TrialFunction(V), TestFunction(V)
    x = SpatialCoordinate(mesh)
    ng = cfx.normal(phi)
    nf = FacetNormal(mesh)
    h = CellDiameter(mesh)

    def sigma(w):
        e = sym(grad(w))
        return 2 * mu * e + lam * tr(e) * Identity(2)

    # manufactured displacement; the load enters weakly as
    # L(v) = (sigma(u_ex), eps(v)) - <sigma(u_ex) n, v>_Gamma, which equals
    # (f, v) with f = -div(sigma(u_ex)) by integration by parts
    u_ex = as_vector([sin(pi * x[0]) * sin(pi * x[1]),
                      x[0] * x[1] * (1 - x[0] * x[1])])
    a = inner(sigma(u), sym(grad(v))) * dxo
    a += (-inner(dot(sigma(u), ng), v) - inner(dot(sigma(v), ng), u)
          + gamma / h * inner(u, v)) * dxg
    if gp.size:
        a += gamma_g * avg(h) * inner(jump(grad(u), nf),
                                      jump(grad(v), nf)) * dSg
    # RHS: inner(sigma(u_ex), eps(v)) - boundary consistency with u_ex
    L = inner(sigma(u_ex), sym(grad(v))) * dxo
    L += -inner(dot(sigma(u_ex), ng), v) * dxg  # cancels interface flux
    L += (-inner(dot(sigma(v), ng), u_ex)
          + gamma / h * inner(u_ex, v)) * dxg

    af, Lf = fem.form(a), fem.form(L)
    A = fem.assemble_matrix(af)
    b = np.array(fem.assemble_vector(Lf))
    dom = fem.active_domain(af)
    fem.deactivate_outside(A, b, dom)
    uh = cfx.Function(V)
    uh.x = jnp.asarray(direct_solve(A, b))

    e = CoefficientExpr(uh) - u_ex
    err = float(fem.assemble_scalar(fem.form(inner(e, e) * dxo)))
    print(f"Cut elasticity, n={n}, P{deg}")
    print(f"active cells = {dom.active_cells.size}")
    print(f"L2 error     = {np.sqrt(max(err, 0.0)):.6e}")


if __name__ == "__main__":
    main()
