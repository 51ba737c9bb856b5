"""Round-3 solve-phase split at bench sizes: times each preconditioner
build stage (op ctor, cube-ASM inversion, band fold, coarse Galerkin)
then the full solve_cg with all builds cached, so per-iteration cost is
isolated from per-pass build cost. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_r3c.py [n]
"""
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import cutfemx_tpu as cfx
    from cutfemx_tpu import fem
    from cutfemx_tpu.stencil import StencilCutOperator
    from cutfemx_tpu.forms.dsl import (CellDiameter, FacetNormal,
                                       SpatialCoordinate, TestFunction,
                                       TrialFunction, avg, dot, grad,
                                       inner, jump, pi, sin)
    from cutfemx_tpu.forms.measure import Measure

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 108
    deg, r, gamma = 2, 0.46, 40.0
    precond = os.environ.get("CUTFEMX_PROBE_PRECOND", "pallas")

    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (n, n, n))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0]**2 + x[1]**2 + x[2]**2) - r)
    V = cfx.functionspace(mesh, ("Lagrange", deg))

    def build():
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
        ue = sin(pi * x[0]) * sin(pi * x[1]) * sin(pi * x[2])
        f = 3 * pi ** 2 * ue
        a = inner(grad(u), grad(v)) * dxo
        a += (-dot(grad(u), ng) * v - dot(grad(v), ng) * u
              + gamma / h * u * v) * dxg
        a += 0.1 * avg(h) * inner(jump(grad(u), nf),
                                  jump(grad(v), nf)) * dSg
        L = f * v * dxo + (-dot(grad(v), ng) * ue + gamma / h * ue * v) * dxg
        af = fem.form(a, dtype=np.float32)
        Lf = fem.form(L, dtype=np.float32)
        dom = fem.active_domain(af)
        b = fem.assemble_vector(Lf)
        return af, dom, b

    def stamp(name, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"{name:24s} {dt:7.2f}s", flush=True)
        return out

    # warm pass (compiles)
    print("== warm pass ==", flush=True)
    af, dom, b = stamp("forms+assemble", build)
    op = stamp("op ctor", lambda: StencilCutOperator(af, dom))
    stamp("fold build", lambda: (op._ensure_band_fold(),
                                 jax.block_until_ready(op._bf_diag)))
    stamp("asm build", lambda: (op._ensure_cube_asm(),
                                jax.block_until_ready(op._asm_binv)))
    stamp("coarse build", lambda: (op._ensure_coarse(),
                                   jax.block_until_ready(op._c_acinv)))
    x, its, res = stamp("solve (warm builds)", lambda: op.solve_cg(
        b, rtol=1e-6, maxiter=500, precond=precond))
    print(f"  its={its} res={res:.3e}", flush=True)
    # everything cached + compiled: pure iteration cost
    x, its, res = stamp("solve (all cached)", lambda: op.solve_cg(
        b, rtol=1e-6, maxiter=500, precond=precond))
    print(f"  its={its} res={res:.3e} "
          f"(~{0.0 if not its else 0.0:.0f})", flush=True)

    # steady pass: rebuild everything like a moving-domain step would;
    # the OLD operator's tensors must die first or HBM can't hold both
    del op, af, dom, b, x
    print("== steady pass ==", flush=True)
    af, dom, b = stamp("forms+assemble", build)
    op = stamp("op ctor", lambda: StencilCutOperator(af, dom))
    stamp("fold build", lambda: (op._ensure_band_fold(),
                                 jax.block_until_ready(op._bf_diag)))
    stamp("asm build", lambda: (op._ensure_cube_asm(),
                                jax.block_until_ready(op._asm_binv)))
    stamp("coarse build", lambda: (op._ensure_coarse(),
                                   jax.block_until_ready(op._c_acinv)))
    x, its, res = stamp("solve (builds cached)", lambda: op.solve_cg(
        b, rtol=1e-6, maxiter=500, precond=precond))
    print(f"  its={its} res={res:.3e}", flush=True)


if __name__ == "__main__":
    main()
