"""n=108 convergence probe: residual trajectories of the grid CG under
ASM vs Jacobi preconditioning (diagnoses the 1200-iteration divergence
seen in BENCH n=108). Usage: python tools/probe108b.py [n]."""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import cutfemx_tpu as cfx
    from cutfemx_tpu import fem
    from cutfemx_tpu.forms.dsl import (CellDiameter, FacetNormal,
                                       SpatialCoordinate, TestFunction,
                                       TrialFunction, avg, dot, grad,
                                       inner, jump, pi, sin)
    from cutfemx_tpu.forms.measure import Measure
    from cutfemx_tpu.stencil import StencilCutOperator

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 108
    deg, r, gamma = 2, 0.46, 40.0
    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (n, n, n))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0]**2 + x[1]**2 + x[2]**2) - r)
    V = cfx.functionspace(mesh, ("Lagrange", deg))
    _ = mesh.facets
    cd = cfx.cut(phi)
    inside = cfx.locate_entities(cd, "phi<0")
    vol = cfx.runtime_quadrature(cd, "phi<0", 2 * deg)
    srf = cfx.runtime_quadrature(cd, "phi=0", 2 * deg)
    gp = cfx.ghost_penalty_facets(cd, "phi<0")
    dxo = Measure("dx", domain=mesh, subdomain_data=[inside, vol])
    dxg = Measure("dx", domain=mesh, subdomain_data=srf)
    dSg = Measure("dS", domain=mesh, subdomain_data=gp)
    u, v = TrialFunction(V), TestFunction(V)
    x = SpatialCoordinate(mesh)
    ng = cfx.normal(phi)
    nf = FacetNormal(mesh)
    h = CellDiameter(mesh)
    ue = sin(pi*x[0])*sin(pi*x[1])*sin(pi*x[2])
    f = 3*pi**2*ue
    a = inner(grad(u), grad(v))*dxo + (-dot(grad(u), ng)*v
        - dot(grad(v), ng)*u + gamma/h*u*v)*dxg
    a += 0.1*avg(h)*inner(jump(grad(u), nf), jump(grad(v), nf))*dSg
    L = f*v*dxo + (-dot(grad(v), ng)*ue + gamma/h*ue*v)*dxg
    af, Lf = fem.form(a), fem.form(L)
    dom = fem.active_domain(af)
    b = fem.assemble_vector(Lf)
    print(f"|b| = {float(jnp.linalg.norm(b)):.6e}", flush=True)
    op = StencilCutOperator(af, dom)

    for pc in ("asm", "jacobi"):
        t0 = time.perf_counter()
        for cap in (60, 180, 420):
            xs, its, res = op.solve_cg(b, rtol=1e-6, maxiter=cap,
                                       precond=pc)
            print(f"{pc:7s} it<= {cap:4d}: its={int(its):4d} "
                  f"|r|={float(res):.4e}  ({time.perf_counter()-t0:.1f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
