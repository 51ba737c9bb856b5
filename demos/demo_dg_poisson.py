"""SIPG discontinuous-Galerkin Poisson (re-design of
/root/reference/python/demo/demo_dg_poisson.py): DG space on the full
mesh, interior-facet SIPG terms, Nitsche-style boundary terms.

Run: python demos/demo_dg_poisson.py [--n 32] [--degree 1]
"""

from __future__ import annotations

import argparse

import numpy as np

import jax.numpy as jnp

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (CellDiameter, CoefficientExpr,
                                   FacetNormal, SpatialCoordinate,
                                   TestFunction, TrialFunction, avg, dot,
                                   grad, inner, jump, pi, sin)
from cutfemx_tpu.forms.measure import dS, ds, dx
from cutfemx_tpu.la import direct_solve


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=32)
    p.add_argument("--degree", type=int, default=1)
    args = p.parse_args()
    n, degree, sigma = args.n, args.degree, 10.0

    mesh = cfx.mesh.create_unit_square(n)
    V = cfx.functionspace(mesh, ("DG", degree))
    u, v = TrialFunction(V), TestFunction(V)
    x = SpatialCoordinate(mesh)
    nf = FacetNormal(mesh)
    h = CellDiameter(mesh)
    u_ex = sin(pi * x[0]) * sin(pi * x[1])
    f = 2 * pi ** 2 * u_ex
    pen = sigma * degree ** 2

    a = inner(grad(u), grad(v)) * dx
    a += (-inner(avg(grad(u)), jump(v, nf))
          - inner(avg(grad(v)), jump(u, nf))
          + pen / avg(h) * inner(jump(u, nf), jump(v, nf))) * dS
    a += (-dot(grad(u), nf) * v - dot(grad(v), nf) * u
          + pen / h * u * v) * ds
    L = f * v * dx + (-dot(grad(v), nf) * u_ex + pen / h * u_ex * v) * ds

    A = fem.assemble_matrix(fem.form(a))
    b = np.array(fem.assemble_vector(fem.form(L)))
    uh = cfx.Function(V)
    uh.x = jnp.asarray(direct_solve(A, b))
    e = CoefficientExpr(uh) - u_ex
    err = float(fem.assemble_scalar(fem.form(e * e * dx)))
    print(f"SIPG DG{degree} Poisson, n={n}")
    print(f"dofs     = {V.dim}")
    print(f"L2 error = {np.sqrt(max(err, 0.0)):.6e}")


if __name__ == "__main__":
    main()
