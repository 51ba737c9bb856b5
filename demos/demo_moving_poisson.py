"""Moving-domain Poisson (re-design of
/root/reference/python/demo/demo_moving_poisson.py): the level set
translates each step; the cut state is refreshed with cutfemx update(),
runtime quadrature and forms are rebuilt (compiled kernels are cached by
structural signature), and the system is re-assembled and solved.

Run: python demos/demo_moving_poisson.py [--n 32] [--steps 8]
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
                                   TestFunction, TrialFunction, avg, dot,
                                   grad, inner, jump, pi, sin)
from cutfemx_tpu.forms.measure import Measure
from cutfemx_tpu.la import direct_solve


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=32)
    p.add_argument("--steps", type=int, default=8)
    args = p.parse_args()
    n, r, gamma = args.n, 0.35, 40.0

    mesh = cfx.mesh.create_rectangle((-1.0, -1.0), (1.0, 1.0), (n, n))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    V = cfx.functionspace(mesh, ("Lagrange", 1))

    cut_data = None
    for step in range(args.steps):
        t0 = time.perf_counter()
        cx = -0.4 + 0.8 * step / max(args.steps - 1, 1)
        phi.interpolate(lambda x: np.sqrt((x[0] - cx) ** 2 + x[1] ** 2) - r)
        if cut_data is None:
            cut_data = cfx.cut(phi)
        else:
            cfx.update(cut_data)
        inside = cfx.locate_entities(cut_data, "phi<0")
        vol = cfx.runtime_quadrature(cut_data, "phi<0", 2)
        srf = cfx.runtime_quadrature(cut_data, "phi=0", 2)
        gp = cfx.ghost_penalty_facets(cut_data, "phi<0")
        dxo = Measure("dx", domain=mesh, subdomain_data=[inside, vol])
        dxg = Measure("dx", domain=mesh, subdomain_data=srf)
        dSg = Measure("dS", domain=mesh, subdomain_data=gp)

        u, v = TrialFunction(V), TestFunction(V)
        x = SpatialCoordinate(mesh)
        ng = cfx.normal(phi)
        nf = FacetNormal(mesh)
        h = CellDiameter(mesh)
        ue = sin(pi * x[0]) * sin(pi * x[1])
        f = 2 * pi ** 2 * ue
        a = inner(grad(u), grad(v)) * dxo
        a += (-dot(grad(u), ng) * v - dot(grad(v), ng) * u
              + gamma / h * u * v) * dxg
        a += 0.1 * avg(h) * inner(jump(grad(u), nf),
                                  jump(grad(v), nf)) * dSg
        L = f * v * dxo + (-dot(grad(v), ng) * ue
                           + gamma / h * ue * v) * dxg
        af, Lf = fem.form(a), fem.form(L)
        A = fem.assemble_matrix(af)
        b = np.array(fem.assemble_vector(Lf))
        fem.deactivate_outside(A, b, fem.active_domain(af))
        uh = cfx.Function(V)
        uh.x = jnp.asarray(direct_solve(A, b))
        e = CoefficientExpr(uh) - ue
        err = float(fem.assemble_scalar(fem.form(e * e * dxo)))
        print(f"step {step}: center x = {cx:+.2f}, cut cells = "
              f"{srf.parent_map.size:4d}, L2 error = "
              f"{np.sqrt(max(err, 0.0)):.3e}, "
              f"{time.perf_counter() - t0:.2f}s")


if __name__ == "__main__":
    main()
