"""Round-3 probe: asm vs asm-fold steady-state solve time at n=48 on TPU.

One full pipeline warm-up per precond (compiles), then two timed solves
each; prints per-precond totals. Run on the default (TPU) backend.
"""
import os
import time

import numpy as np


def main():
    import jax

    import cutfemx_tpu as cfx
    from cutfemx_tpu import fem
    from cutfemx_tpu.forms.dsl import (CellDiameter, FacetNormal,
                                       SpatialCoordinate, TestFunction,
                                       TrialFunction, avg, dot, grad, inner,
                                       jump, pi, sin)
    from cutfemx_tpu.forms.measure import Measure
    from cutfemx_tpu.stencil import StencilCutOperator

    n = int(os.environ.get("CUTFEMX_BENCH_N", "48"))
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
    a = inner(grad(u), grad(v))*dxo
    a += (-dot(grad(u), ng)*v - dot(grad(v), ng)*u + gamma/h*u*v)*dxg
    a += 0.1*avg(h)*inner(jump(grad(u), nf), jump(grad(v), nf))*dSg
    L = f*v*dxo + (-dot(grad(v), ng)*ue + gamma/h*ue*v)*dxg
    af = fem.form(a, dtype=np.float32)
    Lf = fem.form(L, dtype=np.float32)
    dom = fem.active_domain(af)
    b = fem.assemble_vector(Lf)
    op = StencilCutOperator(af, dom)

    for precond in ("asm", "asm-fold"):
        # warm-up (compiles + fold build)
        t0 = time.perf_counter()
        xs, its, res = op.solve_cg(b, rtol=1e-6, maxiter=600,
                                   precond=precond)
        jax.block_until_ready(xs)
        warm = time.perf_counter() - t0
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            xs, its, res = op.solve_cg(b, rtol=1e-6, maxiter=600,
                                       precond=precond)
            jax.block_until_ready(xs)
            times.append(time.perf_counter() - t0)
        print(f"RESULT precond={precond} n={n} warm={warm:.2f}s "
              f"steady={min(times):.3f}s its={its} res={float(res):.3e}",
              flush=True)


if __name__ == "__main__":
    main()
