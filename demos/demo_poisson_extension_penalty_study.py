"""Extension-penalty conditioning study (re-design of
/root/reference/python/demo/demo_poisson_extension_penalty_study.py):
solve the cut Poisson problem with ghost penalty replaced by the
aggregation-based extension penalty, sweeping beta, and report condition
numbers / errors.

Run: python demos/demo_poisson_extension_penalty_study.py [--n 24]
"""

from __future__ import annotations

import argparse

import numpy as np

import jax.numpy as jnp

import cutfemx_tpu as cfx
from cutfemx_tpu import extensions, fem
from cutfemx_tpu.forms.dsl import (CellDiameter, CoefficientExpr,
                                   SpatialCoordinate, TestFunction,
                                   TrialFunction, dot, grad, inner, pi, sin)
from cutfemx_tpu.forms.measure import Measure
from cutfemx_tpu.la import direct_solve


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=24)
    p.add_argument("--betas", type=float, nargs="*",
                   default=[0.0, 0.1, 1.0, 10.0])
    args = p.parse_args()
    n, r, gamma = args.n, 0.46, 40.0

    mesh = cfx.mesh.create_rectangle((-1.0, -1.0), (1.0, 1.0), (n, n))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2) - r)

    cd = cfx.cut(phi)
    inside = cfx.locate_entities(cd, "phi<0")
    vol = cfx.runtime_quadrature(cd, "phi<0", 2)
    srf = cfx.runtime_quadrature(cd, "phi=0", 2)
    agg = extensions.create_cell_aggregation(cd, "phi<0", 0.5)

    dxo = Measure("dx", domain=mesh, subdomain_data=[inside, vol])
    dxg = Measure("dx", domain=mesh, subdomain_data=srf)

    V = cfx.functionspace(mesh, ("Lagrange", 1))
    u, v = TrialFunction(V), TestFunction(V)
    x = SpatialCoordinate(mesh)
    ng = cfx.normal(phi)
    h = CellDiameter(mesh)
    ue = sin(pi * x[0]) * sin(pi * x[1])
    f = 2 * pi ** 2 * ue
    a = inner(grad(u), grad(v)) * dxo
    a += (-dot(grad(u), ng) * v - dot(grad(v), ng) * u
          + gamma / h * u * v) * dxg
    L = f * v * dxo + (-dot(grad(v), ng) * ue + gamma / h * ue * v) * dxg

    af, Lf = fem.form(a), fem.form(L)
    dom = fem.active_domain(af)
    print(f"Extension-penalty study, n={n}; ill-posed cells = "
          f"{agg.ill_posed_cells.size}, roots = "
          f"{agg.well_posed_cells.size}")
    print(f"{'beta':>8s} {'L2 error':>12s} {'cond(act)':>12s}")
    for beta in args.betas:
        A = fem.assemble_matrix(af)
        if beta > 0:
            extensions.assemble_extension_penalty(A, V, cd, agg, beta=beta)
        b = np.array(fem.assemble_vector(Lf))
        fem.deactivate_outside(A, b, dom)
        uh = cfx.Function(V)
        uh.x = jnp.asarray(direct_solve(A, b))
        e = CoefficientExpr(uh) - ue
        err = np.sqrt(max(float(fem.assemble_scalar(
            fem.form(e * e * dxo))), 0.0))
        act = dom.active_mask
        M = A.to_dense()[np.ix_(act, act)]
        cond = np.linalg.cond(M)
        print(f"{beta:8.2f} {err:12.4e} {cond:12.4e}")


if __name__ == "__main__":
    main()
