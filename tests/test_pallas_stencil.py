"""Pallas interior-stencil kernel vs the XLA interior path (interpret
mode on CPU; the same kernel runs compiled on the TPU in bench.py)."""

import numpy as np

import jax.numpy as jnp

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (CellDiameter, FacetNormal, TestFunction,
                                   TrialFunction, avg, dot, grad, inner,
                                   jump)
from cutfemx_tpu.forms.measure import Measure
from cutfemx_tpu.pallas_stencil import (interior_stencil_apply,
                                        pad_mask_for_stencil)
from cutfemx_tpu.stencil import StencilCutOperator


def _cut_operator(n=10, deg=2):
    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (n, n, n))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(
        lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2 + x[2] ** 2) - 0.46)
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
          + 40.0 / h * u * v) * dxg
    a += 0.1 * avg(h) * inner(jump(grad(u), nf),
                              jump(grad(v), nf)) * dSg
    af = fem.form(a, dtype=np.float32)
    dom = fem.active_domain(af)
    return StencilCutOperator(af, dom)


def _interior_reference(op, Xin):
    """The interior path of _grid_apply_body, verbatim."""
    import jax
    n, N, nch = op.n, op.N, op.nch
    X = Xin.reshape(nch, N, N, N)
    parts = [X[ch, dx:dx + n, dy:dy + n, dz:dz + n]
             for (ch, (dx, dy, dz)) in op.table]
    xc = jnp.stack(parts, axis=-1)
    yc = jnp.einsum("xyzl,lm->xyzm", xc, op.A_local,
                    precision=jax.lax.Precision.HIGHEST)
    yc = jnp.where(op.cube_mask_j[..., None], yc, 0.0)
    Y = jnp.zeros_like(X)
    for s, (ch, (dx, dy, dz)) in enumerate(op.table):
        Y = Y.at[ch, dx:dx + n, dy:dy + n, dz:dz + n].add(yc[..., s])
    return Y.reshape(-1)


def test_pallas_interior_matches_xla():
    op = _cut_operator(n=10)
    rng = np.random.default_rng(7)
    Mp = pad_mask_for_stencil(op.cube_mask, op.n, T=16)
    for _ in range(2):
        x = jnp.asarray(rng.standard_normal(op.gsize).astype(np.float32))
        Xin = jnp.where(op.active_grid, x, 0.0)
        y_ref = np.asarray(_interior_reference(op, Xin))
        y = np.asarray(interior_stencil_apply(
            op.n, op.N, op.nch, op.table, op.A_local, Mp, Xin, T=16,
            interpret=True))
        scale = np.abs(y_ref).max()
        assert np.abs(y - y_ref).max() < 2e-6 * scale


def test_pallas_interior_nondivisible_tile():
    # N=11 with T=4 -> padded NP=12, remainder tiles exercised
    op = _cut_operator(n=10)
    Mp = pad_mask_for_stencil(op.cube_mask, op.n, T=8)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(op.gsize).astype(np.float32))
    Xin = jnp.where(op.active_grid, x, 0.0)
    y_ref = np.asarray(_interior_reference(op, Xin))
    y = np.asarray(interior_stencil_apply(
        op.n, op.N, op.nch, op.table, op.A_local, Mp, Xin, T=8,
        interpret=True))
    assert np.abs(y - y_ref).max() < 2e-6 * np.abs(y_ref).max()


def test_traffic_model_after_pallas_solve():
    """Roofline accounting: after a pallas-stack solve the per-iteration
    HBM traffic model reports every stage with positive byte counts (the
    fields bench.py publishes as hbm_bytes_per_it etc.)."""
    op = _cut_operator(n=8)
    b = jnp.ones(op.active.shape[0] if op.active is not None
                 else op.gsize, jnp.float32)
    op.solve_cg(b, rtol=1e-4, maxiter=30, precond="pallas")
    tm = op.traffic_model()
    for key in ("vec_bytes", "stencil_bytes", "band_bytes", "asm_bytes",
                "coarse_bytes", "cg_vec_bytes", "bytes_per_it"):
        assert tm[key] > 0, key
    assert tm["bytes_per_it"] == (tm["stencil_bytes"] + tm["band_bytes"]
                                  + tm["asm_bytes"] + tm["coarse_bytes"]
                                  + tm["cg_vec_bytes"])
