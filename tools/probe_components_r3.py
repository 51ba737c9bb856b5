"""Round-3 per-iteration cost breakdown on TPU at bench sizes:
interior stencil, element-path gathers, band-fold apply, cube-ASM
preconditioner, f64 apply (IR outer step), and axpy/dot vector ops.
100 fused repetitions per measurement, second call timed."""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    import cutfemx_tpu as cfx
    from cutfemx_tpu import fem
    from cutfemx_tpu.stencil import (StencilCutOperator, _asm_apply_body,
                                     _band_rest_apply, _grid_apply_body,
                                     _stencil_apply_grid)
    from cutfemx_tpu.forms.dsl import (CellDiameter, FacetNormal,
                                       SpatialCoordinate, TestFunction,
                                       TrialFunction, avg, dot, grad,
                                       inner, jump, pi, sin)
    from cutfemx_tpu.forms.measure import Measure

    n = int(os.environ.get("CUTFEMX_BENCH_N", "108"))
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
    af = fem.form(a, dtype=np.float32)
    dom = fem.active_domain(af)
    t0 = time.perf_counter()
    op = StencilCutOperator(af, dom)
    print(f"op build {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    op._ensure_cube_asm()
    jax.block_until_ready(op._asm_binv)
    print(f"asm build {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    op._ensure_band_fold()
    jax.block_until_ready(op._bf_diag)
    print(f"fold build {time.perf_counter()-t0:.1f}s", flush=True)

    def bench(name, fn, reps=100):
        @jax.jit
        def loop(x0):
            def body(i, xx):
                y = fn(xx)
                return y / (jnp.linalg.norm(y) + 1.0)
            return jax.lax.fori_loop(0, reps, body, x0)
        x0 = jnp.ones(op.gsize, jnp.float32) / np.sqrt(op.gsize)
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x0))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x0))
        dt = time.perf_counter() - t0
        print(f"{name}: {dt/reps*1000:.2f} ms/apply "
              f"(compile+1st {tc:.1f}s)", flush=True)

    statics = op._grid_statics()
    arrays = op._grid_arrays()
    bench("full apply (gather)", lambda xx: _grid_apply_body(
        *statics, *arrays, xx))

    def interior_only(xx):
        n_, N, nch = op.n, op.N, op.nch
        Xin = jnp.where(op.active_grid, xx, 0.0)
        X = Xin.reshape(nch, N, N, N)
        parts = [X[ch, dx:dx + n_, dy:dy + n_, dz:dz + n_]
                 for (ch, (dx, dy, dz)) in op.table]
        xc = jnp.stack(parts, axis=-1)
        yc = jnp.einsum("xyzl,lm->xyzm", xc, op.A_local,
                        precision=jax.lax.Precision.HIGHEST)
        yc = jnp.where(op.cube_mask_j[..., None], yc, 0.0)
        Y = jnp.zeros_like(X)
        for s, (ch, (dx, dy, dz)) in enumerate(op.table):
            Y = Y.at[ch, dx:dx + n_, dy:dy + n_, dz:dz + n_].add(
                yc[..., s])
        return Y.reshape(-1)
    bench("interior only      ", interior_only)

    def rest_only(xx):
        Xin = jnp.where(op.active_grid, xx, 0.0)
        parts2 = [jnp.einsum("eij,ej->ei", Ae, Xin[cg],
                             precision=jax.lax.Precision.HIGHEST).ravel()
                  for Ae, cg in zip(op.rest_mats, op.rest_cols_grid)]
        flat = jnp.concatenate(parts2) if len(parts2) > 1 else parts2[0]
        return jax.ops.segment_sum(flat[op._permg], op._sortedg,
                                   num_segments=op.gsize,
                                   indices_are_sorted=True)
    bench("element path only  ", rest_only)

    def fold_only(xx):
        Xin = jnp.where(op.active_grid, xx, 0.0)
        return _band_rest_apply(op.n, op.N, op.nch, op.table,
                                op._bf_bbox, op._bf_diag, op._bf_fwd,
                                op._bf_rev, Xin)
    bench("band-fold only     ", fold_only)

    def asm_only(rr):
        return _asm_apply_body(op.n, op.N, op.nch, op.table,
                               op._asm_bbox, op._asm_binv,
                               op.active_grid, rr)
    bench("ASM precond        ", asm_only)

    def axpy_dots(xx):
        al = jnp.vdot(xx, xx).real
        return xx * (1.0 / (al + 1.0)) + xx
    bench("2 dots + 2 axpys   ", axpy_dots)

    # one f64 apply (IR outer step cost)
    with jax.enable_x64():
        x64 = jnp.ones(op.gsize, jnp.float64) / np.sqrt(op.gsize)

        @jax.jit
        def f64_apply(xx):
            return _grid_apply_body(*statics, *arrays, xx)
        t0 = time.perf_counter()
        jax.block_until_ready(f64_apply(x64))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            jax.block_until_ready(f64_apply(x64))
        print(f"f64 apply: {(time.perf_counter()-t0)/3*1000:.1f} ms "
              f"(compile+1st {tc:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
