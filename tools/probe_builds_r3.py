"""Round-3 probe: per-pass build-cost split of the stencil solver stack
on TPU — operator ctor, cube-ASM inversion, band fold, coarse Galerkin —
measured on a SECOND operator instance (jits cached, pool warm), i.e. the
steady-state moving-domain cost the bench pays per pipeline pass. Then
steady-state solve times per preconditioner on prebuilt state.
"""

import os
import time

import numpy as np


def main():
    import jax

    import cutfemx_tpu as cfx
    from cutfemx_tpu import fem
    from cutfemx_tpu.forms.dsl import (CellDiameter, FacetNormal,
                                       TestFunction, TrialFunction, avg,
                                       dot, grad, inner, jump)
    from cutfemx_tpu.forms.measure import Measure
    from cutfemx_tpu.stencil import StencilCutOperator

    n = int(os.environ.get("CUTFEMX_BENCH_N", "48"))
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
    b = np.ones(V.dim, np.float32)

    def build_split(tag):
        t0 = time.perf_counter()
        op = StencilCutOperator(af, dom)
        t_ctor = time.perf_counter() - t0
        t0 = time.perf_counter()
        op._ensure_cube_asm()
        jax.block_until_ready(op._asm_binv)
        t_asm = time.perf_counter() - t0
        t0 = time.perf_counter()
        op._ensure_band_fold()
        jax.block_until_ready(op._bf_diag)
        t_fold = time.perf_counter() - t0
        t0 = time.perf_counter()
        op._ensure_coarse()
        jax.block_until_ready(op._c_acinv)
        t_coarse = time.perf_counter() - t0
        print(f"{tag}: ctor {t_ctor:.2f}s asm {t_asm:.2f}s "
              f"fold {t_fold:.2f}s coarse {t_coarse:.2f}s", flush=True)
        return op

    build_split("pass1 (compiles)")
    op = build_split("pass2 (steady)")

    if os.environ.get("CUTFEMX_PROBE_SOLVES", "1") == "0":
        return
    for pc in ("asm", "asm2", "asm-fold2", "pallas"):
        try:
            ts = []
            for rep in range(2):
                t0 = time.perf_counter()
                x, its, res = op.solve_cg(b, rtol=1e-6, maxiter=500,
                                          precond=pc)
                jax.block_until_ready(x)
                ts.append(time.perf_counter() - t0)
            print(f"solve[{pc}]: warm {ts[0]:.2f}s steady {ts[1]:.2f}s "
                  f"its={its} res={float(res):.3e}", flush=True)
        except Exception as e:
            print(f"solve[{pc}]: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
