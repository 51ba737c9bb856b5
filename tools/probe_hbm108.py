"""HBM audit of the n=108 bench pipeline: device memory stats after each
stage (assembly, operator ctor, ASM, fold, coarse, solve)."""

import os
import time

import numpy as np


def stats(tag):
    import jax
    d = jax.devices()[0]
    try:
        s = d.memory_stats()
        used = s.get("bytes_in_use", 0) / 1e9
        lim = s.get("bytes_limit", 0) / 1e9
        print(f"[hbm] {tag}: {used:.2f} / {lim:.2f} GB", flush=True)
    except Exception as e:
        print(f"[hbm] {tag}: memory_stats unavailable ({e})", flush=True)


def main():
    import jax

    import cutfemx_tpu as cfx
    from cutfemx_tpu import fem
    from cutfemx_tpu.forms.dsl import (CellDiameter, FacetNormal,
                                       TestFunction, TrialFunction, avg,
                                       dot, grad, inner, jump)
    from cutfemx_tpu.forms.measure import Measure
    from cutfemx_tpu.stencil import StencilCutOperator

    n = int(os.environ.get("CUTFEMX_BENCH_N", "108"))
    deg, r, gamma = 2, 0.46, 40.0
    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (n, n, n))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0]**2 + x[1]**2 + x[2]**2) - r)
    V = cfx.functionspace(mesh, ("Lagrange", deg))
    stats("spaces")
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
    b = fem.assemble_vector(fem.form(
        (1.0 * v) * dxo, dtype=np.float32))
    jax.block_until_ready(b)
    stats("assembled")
    op = StencilCutOperator(af, dom)
    stats("op ctor")
    t0 = time.perf_counter()
    op._ensure_cube_asm()
    jax.block_until_ready(op._asm_binv)
    stats(f"cube asm ({time.perf_counter()-t0:.1f}s) "
          f"bbox={op._asm_bbox}")
    t0 = time.perf_counter()
    op._ensure_band_fold()
    jax.block_until_ready(op._bf_diag)
    stats(f"band fold ({time.perf_counter()-t0:.1f}s) "
          f"bbox={op._bf_bbox}")
    t0 = time.perf_counter()
    op._ensure_coarse()
    jax.block_until_ready(op._c_acinv)
    stats(f"coarse ({time.perf_counter()-t0:.1f}s)")
    t0 = time.perf_counter()
    x, its, res = op.solve_cg(np.asarray(b), rtol=1e-6, maxiter=1200,
                              precond="pallas")
    jax.block_until_ready(x)
    stats(f"solve ({time.perf_counter()-t0:.1f}s) its={its} "
          f"res={float(res):.3e}")


if __name__ == "__main__":
    main()
