"""Round-3 probe (fixed): per-iteration costs at bench sizes with all
device arrays passed as jit ARGUMENTS (closure capture inlined them as
HLO constants; at n=108 the 2.6GB fold tensors blew the remote-compile
request limit — HTTP 413).

Measures: raw HBM saxpy bandwidth, ASM preconditioner apply, band-fold
element apply, dots+axpys, and one f64 apply (the IR outer step)."""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import cutfemx_tpu as cfx
    from cutfemx_tpu import fem
    from cutfemx_tpu.stencil import (StencilCutOperator, _asm_apply_body,
                                     _band_rest_apply, _grid_apply_body)
    from cutfemx_tpu.forms.dsl import (CellDiameter, FacetNormal,
                                       TestFunction, TrialFunction, avg,
                                       dot, grad, inner, jump)
    from cutfemx_tpu.forms.measure import Measure

    n = int(os.environ.get("CUTFEMX_BENCH_N", "108"))
    deg, r, gamma = 2, 0.46, 40.0

    # ---- raw HBM bandwidth roofline ------------------------------------
    def bw(name, m):
        x = jnp.ones(m // 4, jnp.float32)
        y = jnp.ones(m // 4, jnp.float32)

        @jax.jit
        def loop(x, y):
            def body(i, xy):
                x, y = xy
                return (x, y + 0.5 * x)
            return jax.lax.fori_loop(0, 50, body, (x, y))
        jax.block_until_ready(loop(x, y))
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x, y))
        dt = (time.perf_counter() - t0) / 50
        # saxpy: read x, read y, write y = 3m bytes
        print(f"saxpy {m>>20}MB: {dt*1e3:.3f} ms -> "
              f"{3*m/dt/1e9:.1f} GB/s", flush=True)

    bw("small", 40 << 20)
    bw("big", 400 << 20)

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
    print(f"op build {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    op._ensure_cube_asm()
    jax.block_until_ready(op._asm_binv)
    print(f"asm build {time.perf_counter()-t0:.1f}s "
          f"bbox={op._asm_bbox}", flush=True)
    t0 = time.perf_counter()
    op._ensure_band_fold()
    jax.block_until_ready(op._bf_diag)
    nb = int(np.prod(op._bf_diag.shape[:3]))
    gbytes = (op._bf_diag.nbytes + sum(f.nbytes for f in op._bf_fwd)
              + sum(r_.nbytes for r_ in op._bf_rev)) / 1e9
    print(f"fold build {time.perf_counter()-t0:.1f}s nbb={nb} "
          f"fold_bytes={gbytes:.2f}GB", flush=True)

    def bench(name, fn, arrays, reps=50):
        @jax.jit
        def loop(x0, *arr):
            def body(i, xx):
                y = fn(xx, *arr)
                return y / (jnp.linalg.norm(y) + 1.0)
            return jax.lax.fori_loop(0, reps, body, x0)
        x0 = jnp.ones(op.gsize, jnp.float32) / np.sqrt(op.gsize)
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x0, *arrays))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x0, *arrays))
        dt = time.perf_counter() - t0
        print(f"{name}: {dt/reps*1000:.2f} ms/apply "
              f"(compile+1st {tc:.1f}s)", flush=True)

    nS, NS, nchS = op.n, op.N, op.nch
    table = op.table

    bench("ASM precond        ", lambda rr, binv, act: _asm_apply_body(
        nS, NS, nchS, table, op._asm_bbox, binv, act, rr),
        (op._asm_binv, op.active_grid))

    bench("band-fold only     ", lambda xx, Dg, f0, f1, f2, r0, r1, r2,
          act: _band_rest_apply(nS, NS, nchS, table, op._bf_bbox, Dg,
                                (f0, f1, f2), (r0, r1, r2),
                                jnp.where(act, xx, 0.0)),
          (op._bf_diag, *op._bf_fwd, *op._bf_rev, op.active_grid))

    def axpy_dots(xx):
        al = jnp.vdot(xx, xx).real
        return xx * (1.0 / (al + 1.0)) + xx
    bench("2 dots + 2 axpys   ", lambda xx: axpy_dots(xx), ())

    # one f64 apply (IR outer step cost)
    statics = op._grid_statics()
    arrays = op._grid_arrays()
    with jax.enable_x64():
        arrays64 = jax.tree.map(
            lambda a: a.astype(jnp.float64)
            if a.dtype == jnp.float32 else a, arrays)
        x64 = jnp.ones(op.gsize, jnp.float64) / np.sqrt(op.gsize)

        @jax.jit
        def f64_apply(xx, *arr):
            return _grid_apply_body(*statics, *arr, xx)
        t0 = time.perf_counter()
        jax.block_until_ready(f64_apply(x64, *arrays64))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            jax.block_until_ready(f64_apply(x64, *arrays64))
        print(f"f64 apply: {(time.perf_counter()-t0)/3*1000:.1f} ms "
              f"(compile+1st {tc:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
