"""Surface Poisson DG on an implicit circle/sphere (re-design of
/root/reference/python/demo/demo_surface_poisson_dg.py):
-Delta_Gamma u + u = f solved with SIPG on the cut surface, conormal
jumps on the codim-2 skeleton, and normal-gradient ghost stabilization.

Run: python demos/demo_surface_poisson_dg.py [--n 32]
"""

from __future__ import annotations

import argparse

import numpy as np

import jax.numpy as jnp

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (CellDiameter, CoefficientExpr,
                                   FacetNormal, Identity, SpatialCoordinate,
                                   TestFunction, TrialFunction, avg, dot,
                                   grad, inner, jump, outer)
from cutfemx_tpu.forms.measure import Measure
from cutfemx_tpu.la import direct_solve


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=32)
    args = p.parse_args()
    n, r = args.n, 0.62
    penalty, ghost = 20.0, 0.1

    mesh = cfx.mesh.create_rectangle((-1.0, -1.0), (1.0, 1.0), (n, n))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(lambda x: (x[0] ** 2 + x[1] ** 2) - r ** 2)

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
    gu, gv = dot(P, grad(u)), dot(P, grad(v))
    ngp, ngm = ng("+"), ng("-")
    Pp = Identity(2) - outer(ngp, ngp)
    Pm = Identity(2) - outer(ngm, ngm)
    avg_gu = 0.5 * (dot(Pp, grad(u)("+")) + dot(Pm, grad(u)("-")))
    avg_gv = 0.5 * (dot(Pp, grad(v)("+")) + dot(Pm, grad(v)("-")))
    ju, jv = jump(u, mu), jump(v, mu)

    u_ex = x[0] / r
    f = (1.0 + 1.0 / r ** 2) * u_ex

    a = (inner(gu, gv) + u * v) * dxg
    a += (-inner(avg_gu, jv) - inner(avg_gv, ju)
          + penalty / avg(h) * inner(ju, jv)) * dSg
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

    print(f"Surface Poisson DG on the circle, n={n}, r={r}")
    print(f"cut cells        = {cut_cells.size}")
    print(f"skeleton facets  = {skel.size}")
    print(f"L2(Gamma) error  = {np.sqrt(max(err, 0.0)):.6e}")


if __name__ == "__main__":
    main()
