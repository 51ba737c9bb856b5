"""Isolate the grid-layout stencil apply costs on TPU: full apply vs
interior-only vs element-path-only, 100 fused applies per measurement."""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import cutfemx_tpu as cfx
    from cutfemx_tpu import fem
    from cutfemx_tpu.stencil import StencilCutOperator, _stencil_apply_grid
    from cutfemx_tpu.forms.dsl import (CellDiameter, FacetNormal,
                                       SpatialCoordinate, TestFunction,
                                       TrialFunction, avg, dot, grad,
                                       inner, jump, pi, sin)
    from cutfemx_tpu.forms.measure import Measure

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
    x = SpatialCoordinate(mesh)
    ng = cfx.normal(phi)
    nf = FacetNormal(mesh)
    h = CellDiameter(mesh)
    a = inner(grad(u), grad(v)) * dxo
    a += (-dot(grad(u), ng) * v - dot(grad(v), ng) * u
          + gamma / h * u * v) * dxg
    a += 0.1 * avg(h) * inner(jump(grad(u), nf), jump(grad(v), nf)) * dSg
    af = fem.form(a)
    dom = fem.active_domain(af)
    op = StencilCutOperator(af, dom)

    from functools import partial

    def interior_only(op, Xf):
        n_, N, nch = op.n, op.N, op.nch
        Xin = jnp.where(op.active_grid, Xf, 0.0)
        X = Xin.reshape(nch, N, N, N)
        parts = [X[ch, dx:dx + n_, dy:dy + n_, dz:dz + n_]
                 for (ch, (dx, dy, dz)) in op.table]
        xc = jnp.stack(parts, axis=-1)
        yc = jnp.einsum("xyzl,lm->xyzm", xc, op.A_local)
        yc = jnp.where(op.cube_mask_j[..., None], yc, 0.0)
        Y = jnp.zeros_like(X)
        for s, (ch, (dx, dy, dz)) in enumerate(op.table):
            Y = Y.at[ch, dx:dx + n_, dy:dy + n_, dz:dz + n_].add(yc[..., s])
        return Y.reshape(-1)

    def rest_only(op, Xf):
        Xin = jnp.where(op.active_grid, Xf, 0.0)
        parts2 = [jnp.einsum("eij,ej->ei", Ae, Xin[cg]).ravel()
                  for Ae, cg in zip(op.rest_mats, op.rest_cols_grid)]
        flat = jnp.concatenate(parts2) if len(parts2) > 1 else parts2[0]
        import jax as _jax
        return _jax.ops.segment_sum(flat[op._permg], op._sortedg,
                                    num_segments=op.gsize,
                                    indices_are_sorted=True)

    def bench(name, fn):
        @partial(jax.jit, static_argnums=())
        def loop(x0):
            def body(i, x):
                y = fn(op, x)
                return y / (jnp.linalg.norm(y) + 1.0)
            return jax.lax.fori_loop(0, 100, body, x0)
        x0 = jnp.ones(op.gsize, jnp.float32) / np.sqrt(op.gsize)
        t0 = time.perf_counter()
        r1 = loop(x0)
        r1.block_until_ready()
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        r2 = loop(x0)
        r2.block_until_ready()
        dt = time.perf_counter() - t0
        print(f"{name}: {dt/100*1000:.2f} ms/apply "
              f"(compile+1st {t_compile:.1f}s)", flush=True)

    ne = sum(int(np.prod(np.asarray(m).shape[:2]))
             for m in op.rest_mats)
    print(f"n={n} gsize={op.gsize} rest instances="
          f"{[tuple(np.asarray(m).shape) for m in op.rest_mats]} "
          f"gathered={ne}", flush=True)
    bench("full grid apply ", _stencil_apply_grid)
    bench("interior only    ", interior_only)
    bench("element path only", rest_only)


if __name__ == "__main__":
    main()
