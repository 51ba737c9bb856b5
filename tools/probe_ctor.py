"""Profile StencilCutOperator.__init__ at bench size (the dominant
pipeline phase at n=108: ~26 s steady). cProfile over the second ctor
call so jit compiles / device caches are warm. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_ctor.py [n]
"""
import cProfile
import pstats
import sys
import time

import numpy as np


def main():
    import jax

    import cutfemx_tpu as cfx
    from cutfemx_tpu import fem
    from cutfemx_tpu.stencil import StencilCutOperator
    from cutfemx_tpu.forms.dsl import (CellDiameter, FacetNormal,
                                       TestFunction, TrialFunction, avg,
                                       dot, grad, inner, jump)
    from cutfemx_tpu.forms.measure import Measure

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 108
    deg, r, gamma = 2, 0.46, 40.0

    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (n, n, n))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0]**2 + x[1]**2 + x[2]**2) - r)
    V = cfx.functionspace(mesh, ("Lagrange", deg))

    cd = cfx.cut(phi)
    inside = cfx.locate_entities(cd, "phi<0")
    vol = cfx.runtime_quadrature(cd, "phi<0", 2 * deg)
    srf = cfx.runtime_quadrature(cd, "phi=0", 2 * deg)
    gp = cfx.ghost_penalty_facets(cd, "phi<0")
    dxo = Measure("dx", domain=mesh, subdomain_data=[inside, vol])
    dxg = Measure("dx", domain=mesh, subdomain_data=srf)
    dSg = Measure("dS", domain=mesh, subdomain_data=gp)
    u, v = TrialFunction(V), TestFunction(V)
    ng = cfx.normal(phi)
    nf = FacetNormal(mesh)
    h = CellDiameter(mesh)
    a = inner(grad(u), grad(v)) * dxo
    a += (-dot(grad(u), ng) * v - dot(grad(v), ng) * u
          + gamma / h * u * v) * dxg
    a += 0.1 * avg(h) * inner(jump(grad(u), nf), jump(grad(v), nf)) * dSg
    af = fem.form(a, dtype=np.float32)
    dom = fem.active_domain(af)

    t0 = time.perf_counter()
    op = StencilCutOperator(af, dom)
    jax.block_until_ready(op.rest_mats)
    print(f"ctor pass 1 (compiles): {time.perf_counter()-t0:.2f}s",
          flush=True)
    del op

    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    op = StencilCutOperator(af, dom)
    jax.block_until_ready(op.rest_mats)
    prof.disable()
    print(f"ctor pass 2 (steady): {time.perf_counter()-t0:.2f}s",
          flush=True)
    st = pstats.Stats(prof)
    st.sort_stats("cumulative").print_stats(30)


if __name__ == "__main__":
    main()
