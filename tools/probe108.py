"""Bisect the n=108 TPU device fault: run the bench pipeline in phases
with explicit sync + prints so the failing dispatch is identifiable in
one run. Usage: python tools/probe108.py [n]."""
import sys
import time

import numpy as np


def stamp(msg, t0=[None]):
    t = time.perf_counter()
    dt = 0.0 if t0[0] is None else t - t0[0]
    t0[0] = t
    print(f"[{dt:7.2f}s] {msg}", flush=True)


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
    from cutfemx_tpu.stencil import StencilCutOperator, _stencil_apply_grid

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 108
    deg, r, gamma = 2, 0.46, 40.0
    stamp("start")
    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (n, n, n))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0]**2 + x[1]**2 + x[2]**2) - r)
    V = cfx.functionspace(mesh, ("Lagrange", deg))
    _ = mesh.facets
    stamp("mesh+spaces")
    cd = cfx.cut(phi)
    inside = cfx.locate_entities(cd, "phi<0")
    vol = cfx.runtime_quadrature(cd, "phi<0", 2 * deg)
    srf = cfx.runtime_quadrature(cd, "phi=0", 2 * deg)
    gp = cfx.ghost_penalty_facets(cd, "phi<0")
    stamp("cut+rules")
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
    b.block_until_ready()
    stamp("forms+vector")
    op = StencilCutOperator(af, dom)
    jax.block_until_ready(op.rest_mats)
    stamp(f"stencil op build (rest {[tuple(m.shape) for m in op.rest_mats]})")
    x0 = jnp.ones(op.gsize, jnp.float32)
    y = _stencil_apply_grid(op, x0)
    y.block_until_ready()
    stamp("gather apply")
    op._ensure_cube_asm()
    op._asm_binv.block_until_ready()
    stamp(f"asm build (bbox {op._asm_bbox})")
    from cutfemx_tpu.stencil import _asm_apply_body
    z = _asm_apply_body(op.n, op.N, op.nch, tuple(op.table), op._asm_bbox,
                        op._asm_binv, op.active_grid, y)
    z.block_until_ready()
    stamp("asm apply")
    op._ensure_band_fold()
    jax.block_until_ready(op._bf_diag)
    stamp(f"band fold build (bbox {op._bf_bbox})")
    from cutfemx_tpu.stencil import _grid_apply_fold_body
    w = _grid_apply_fold_body(*op._grid_statics(), op._bf_bbox, op.A_local,
                              op.cube_mask_j, op.active_grid,
                              op.identity_grid, op._bf_diag, op._bf_fwd,
                              op._bf_rev, x0)
    w.block_until_ready()
    stamp("fold apply")
    err = float(jnp.abs(w - y).max())
    stamp(f"fold vs gather max abs diff {err:.3e}")
    xs, its, res = op.solve_cg(b, rtol=1e-6, maxiter=30)
    xs.block_until_ready()
    stamp(f"short CG: its={int(its)} res={float(res):.3e}")
    xs, its, res = op.solve_cg(b, rtol=1e-6, maxiter=1200)
    xs.block_until_ready()
    stamp(f"full CG: its={int(its)} res={float(res):.3e}")


if __name__ == "__main__":
    main()
