"""TPU probe: Pallas interior-stencil kernel vs XLA interior, the
symmetric (Rev=None) band-fold apply, coarse-level build cost, and full
solves for precond in {asm, asm-fold2, pallas} at bench sizes."""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import cutfemx_tpu as cfx
    from cutfemx_tpu import fem
    from cutfemx_tpu.pallas_stencil import (interior_stencil_apply,
                                            pad_mask_for_stencil)
    from cutfemx_tpu.stencil import (StencilCutOperator, _band_rest_apply)
    from cutfemx_tpu.forms.dsl import (CellDiameter, FacetNormal,
                                       TestFunction, TrialFunction, avg,
                                       dot, grad, inner, jump)
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
    ng = cfx.normal(phi)
    nf = FacetNormal(mesh)
    h = CellDiameter(mesh)
    a = inner(grad(u), grad(v)) * dxo
    a += (-dot(grad(u), ng) * v - dot(grad(v), ng) * u
          + gamma / h * u * v) * dxg
    a += 0.1 * avg(h) * inner(jump(grad(u), nf), jump(grad(v), nf)) * dSg
    af = fem.form(a, dtype=np.float32)
    dom = fem.active_domain(af)
    b = np.asarray(fem.assemble_vector(fem.form((1.0 * v) * dxo,
                                                dtype=np.float32)))
    t0 = time.perf_counter()
    op = StencilCutOperator(af, dom)
    print(f"op build {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    op._ensure_band_fold()
    jax.block_until_ready(op._bf_diag)
    print(f"fold build {time.perf_counter()-t0:.1f}s "
          f"rev={'None' if op._bf_rev is None else 'stored'}", flush=True)
    t0 = time.perf_counter()
    op._ensure_cube_asm()
    jax.block_until_ready(op._asm_binv)
    print(f"asm build {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    op._ensure_coarse()
    jax.block_until_ready(op._c_acinv)
    print(f"coarse build {time.perf_counter()-t0:.1f}s m={op._c_m} "
          f"K={op._c_K}", flush=True)

    def bench(name, fn, reps=50, *arrs):
        # big device tensors enter as ARGS: closures bake them as HLO
        # constants and the remote-compile request blows the tunnel's
        # body-size limit (HTTP 413) at n=108
        @jax.jit
        def loop(x0, *aa):
            def body(i, xx):
                y = fn(xx, *aa)
                return y / (jnp.linalg.norm(y) + 1.0)
            return jax.lax.fori_loop(0, reps, body, x0)
        x0 = jnp.ones(op.gsize, jnp.float32) / np.sqrt(op.gsize)
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x0, *arrs))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x0, *arrs))
        dt = time.perf_counter() - t0
        print(f"{name}: {dt/reps*1000:.2f} ms/apply "
              f"(compile+1st {tc:.1f}s)", flush=True)

    nS, NS, nchS = op.n, op.N, op.nch
    table = op.table

    def xla_interior(xx):
        Xin = jnp.where(op.active_grid, xx, 0.0)
        X = Xin.reshape(nchS, NS, NS, NS)
        parts = [X[ch, dx:dx + nS, dy:dy + nS, dz:dz + nS]
                 for (ch, (dx, dy, dz)) in table]
        xc = jnp.stack(parts, axis=-1)
        yc = jnp.einsum("xyzl,lm->xyzm", xc, op.A_local,
                        precision=jax.lax.Precision.HIGHEST)
        yc = jnp.where(op.cube_mask_j[..., None], yc, 0.0)
        Y = jnp.zeros_like(X)
        for s, (ch, (dx, dy, dz)) in enumerate(table):
            Y = Y.at[ch, dx:dx + nS, dy:dy + nS, dz:dz + nS].add(
                yc[..., s])
        return Y.reshape(-1)

    T = 16
    Mp = pad_mask_for_stencil(op.cube_mask, nS, T=T)

    def pallas_interior(xx):
        Xin = jnp.where(op.active_grid, xx, 0.0)
        return interior_stencil_apply(nS, NS, nchS, table,
                                      np.asarray(op.A_local), Mp, Xin,
                                      T=T)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(op.gsize).astype(np.float32))
    t0 = time.perf_counter()
    y_p = np.asarray(jax.jit(pallas_interior)(x))
    print(f"pallas T={T} compile+1st {time.perf_counter()-t0:.1f}s",
          flush=True)
    y_x = np.asarray(jax.jit(xla_interior)(x))
    err = np.abs(y_p - y_x).max() / (np.abs(y_x).max() + 1e-30)
    print(f"pallas T={T} vs XLA interior: rel err {err:.2e}", flush=True)

    bench("sym band-fold      ",
          lambda xx, Dg, F0, F1, F2: _band_rest_apply(
              nS, NS, nchS, table, op._bf_bbox, Dg, (F0, F1, F2), None,
              jnp.where(op.active_grid, xx, 0.0)),
          50, op._bf_diag, *op._bf_fwd)

    for pc in ("pallas", "asm-fold2", "asm"):
        for attempt in range(2):
            t0 = time.perf_counter()
            xs, its, res = op.solve_cg(b, rtol=1e-6, maxiter=500,
                                       precond=pc)
            jax.block_until_ready(xs)
            dt = time.perf_counter() - t0
            tag = "warm" if attempt else "compile+solve"
            print(f"solve {pc}: {dt:.2f}s ({tag}) its={int(its)} "
                  f"|r|={float(res):.3e}", flush=True)


if __name__ == "__main__":
    main()
