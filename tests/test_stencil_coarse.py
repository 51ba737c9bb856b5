"""Two-level (cube-ASM + coarse lattice) preconditioner: Galerkin
exactness of the folded coarse operator and solver parity/iteration
reduction vs the single-level ASM."""

import numpy as np

import jax.numpy as jnp

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (CellDiameter, FacetNormal, TestFunction,
                                   TrialFunction, avg, dot, grad, inner,
                                   jump)
from cutfemx_tpu.forms.measure import Measure
from cutfemx_tpu.stencil import StencilCutOperator, _stencil_apply_grid


def _cut_operator(n, deg=2):
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
    af = fem.form(a)
    dom = fem.active_domain(af)
    op = StencilCutOperator(af, dom)
    b = np.asarray(fem.assemble_vector(fem.form((1.0 * v) * dxo)))
    return op, b


def test_coarse_galerkin_exact():
    """The folded coarse operator equals P~^T A P~ computed column by
    column with the actual grid apply (P~ = active-masked trilinear
    prolongation)."""
    # n=8 is the smallest box where the r=0.46 sphere fully contains a
    # cell (n=6 has no standard 'inside' instance for the stencil path)
    op, _ = _cut_operator(n=8)
    m = 2
    A_c, K, Ws = op._coarse_galerkin(m)
    A_c = np.asarray(A_c)
    Vc = K ** 3
    W = [np.asarray(w) for w in Ws]
    sub = op._channel_sub()
    N, nch = op.N, op.nch
    act = np.asarray(op.active_grid)

    def prolong(zc):
        Z = np.zeros((nch, N, N, N))
        for ch in range(nch):
            sx, sy, sz = sub[ch]
            Z[ch] = np.einsum("ai,bj,ck,ijk->abc", W[sx], W[sy], W[sz],
                              zc)
        return np.where(act, Z.reshape(-1), 0.0)

    def restrict(w):
        Wr = np.where(act, w, 0.0).reshape(nch, N, N, N)
        rc = np.zeros((K, K, K))
        for ch in range(nch):
            sx, sy, sz = sub[ch]
            rc += np.einsum("ai,bj,ck,abc->ijk", W[sx], W[sy], W[sz],
                            Wr[ch])
        return rc.reshape(-1)

    A_ref = np.zeros((Vc, Vc))
    for j in range(Vc):
        zc = np.zeros(Vc)
        zc[j] = 1.0
        w = np.asarray(_stencil_apply_grid(
            op, jnp.asarray(prolong(zc.reshape(K, K, K)))))
        A_ref[:, j] = restrict(w)
    err = np.abs(A_c - A_ref).max() / np.abs(A_ref).max()
    assert err < 1e-10, err


def test_two_level_solver_parity_and_iterations():
    """asm2/asm-fold2 match the single-level solution and never take
    more iterations (measurably fewer at bench sizes: 139 -> ~112 at
    n=24, m=2)."""
    op, b = _cut_operator(n=12)
    x1, it1, r1 = op.solve_cg(b, rtol=1e-8, maxiter=900, precond="asm",
                              refine=False)
    x2, it2, r2 = op.solve_cg(b, rtol=1e-8, maxiter=900, precond="asm2",
                              refine=False)
    x3, it3, r3 = op.solve_cg(b, rtol=1e-8, maxiter=900,
                              precond="asm-fold2", refine=False)
    x1, x2, x3 = map(np.asarray, (x1, x2, x3))
    ref = np.linalg.norm(x1)
    assert np.linalg.norm(x2 - x1) < 1e-6 * ref
    assert np.linalg.norm(x3 - x1) < 1e-6 * ref
    assert int(it2) <= int(it1)
    assert int(it3) <= int(it1)


def test_fold_direct_matches_sweep():
    """The device closed-form band fold reproduces the sweep's folded
    operator apply exactly (same block decomposition semantics, different
    entry->cube assignment; the applied operator must agree)."""
    import os

    from cutfemx_tpu.stencil import _grid_apply_fold_body

    os.environ["CUTFEMX_FOLD_CLAIM"] = "sweep"
    try:
        op1, _ = _cut_operator(n=8)
        op1._ensure_band_fold()
    finally:
        del os.environ["CUTFEMX_FOLD_CLAIM"]
    op2, _ = _cut_operator(n=8)
    op2._ensure_band_fold()

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=op1.dim))
    xg = op1.vec_to_grid(jnp.where(jnp.asarray(op1.active), x, 0.0))

    def fold_apply(op):
        args = (op.n, op.N, op.nch, op.table, op.gsize, op._bf_bbox,
                op.A_local, op.cube_mask_j, op.active_grid,
                op.identity_grid, op._bf_diag, op._bf_fwd, op._bf_rev)
        return np.asarray(_grid_apply_fold_body(*args, xg))

    y1, y2 = fold_apply(op1), fold_apply(op2)
    den = np.abs(y1).max()
    assert np.abs(y2 - y1).max() / den < 1e-12


def test_coarse_fold_matches_windows():
    """The device coarse congruence (assembled from the fold tensors +
    interior stencil) equals the host window-fold coarse operator."""
    op, _ = _cut_operator(n=8)
    op._ensure_band_fold()
    m = 2
    A1 = np.asarray(op._coarse_galerkin(m)[0])
    A2 = np.asarray(op._coarse_galerkin_fold(m)[0])
    den = np.abs(A1).max()
    assert np.abs(A2 - A1).max() / den < 1e-12
