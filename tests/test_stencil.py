"""Structured-stencil interior operator: exact agreement with the
element-batched apply and solve on the bench problem family."""

import numpy as np
import pytest

import jax.numpy as jnp

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (CellDiameter, FacetNormal,
                                   SpatialCoordinate, TestFunction,
                                   TrialFunction, avg, dot, grad, inner,
                                   jump, pi, sin)
from cutfemx_tpu.forms.measure import Measure
from cutfemx_tpu.stencil import StencilCutOperator


def _problem(n, deg):
    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (n, n, n))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0]**2 + x[1]**2 + x[2]**2) - 0.6)
    cd = cfx.cut(phi)
    inside = cfx.locate_entities(cd, "phi<0")
    vol = cfx.runtime_quadrature(cd, "phi<0", 2 * deg)
    srf = cfx.runtime_quadrature(cd, "phi=0", 2 * deg)
    gp = cfx.ghost_penalty_facets(cd, "phi<0")
    dxo = Measure("dx", domain=mesh, subdomain_data=[inside, vol])
    dxg = Measure("dx", domain=mesh, subdomain_data=srf)
    dSg = Measure("dS", domain=mesh, subdomain_data=gp)
    V = cfx.functionspace(mesh, ("Lagrange", deg))
    u, v = TrialFunction(V), TestFunction(V)
    x = SpatialCoordinate(mesh)
    ng = cfx.normal(phi)
    nf = FacetNormal(mesh)
    h = CellDiameter(mesh)
    ue = sin(pi * x[0]) * sin(pi * x[1]) * sin(pi * x[2])
    f = 3 * pi ** 2 * ue
    a = inner(grad(u), grad(v)) * dxo
    a += (-dot(grad(u), ng) * v - dot(grad(v), ng) * u
          + 40.0 / h * u * v) * dxg
    a += 0.1 * avg(h) * inner(jump(grad(u), nf),
                              jump(grad(v), nf)) * dSg
    L = f * v * dxo + (-dot(grad(v), ng) * ue + 40.0 / h * ue * v) * dxg
    af, Lf = fem.form(a), fem.form(L)
    dom = fem.active_domain(af)
    b = fem.assemble_vector(Lf)
    return V, af, dom, b


@pytest.mark.parametrize("deg", [1, 2])
def test_stencil_matches_element_apply(deg):
    V, af, dom, b = _problem(10, deg)
    op0 = fem.CutOperator(af, dom)
    op1 = StencilCutOperator(af, dom)
    rng = np.random.default_rng(0)
    for _ in range(3):
        x = jnp.asarray(rng.standard_normal(V.dim))
        y0 = np.asarray(op0(x))
        y1 = np.asarray(op1(x))
        assert np.abs(y0 - y1).max() < 1e-12 * max(np.abs(y0).max(), 1)
    d0 = np.asarray(op0.diagonal())
    d1 = np.asarray(op1.diagonal())
    assert np.abs(d0 - d1).max() < 1e-12 * np.abs(d0).max()


def test_stencil_solve_matches():
    # like-preconditioned solves follow the same CG trajectory, so the
    # solutions agree even along near-null sliver-cut modes
    V, af, dom, b = _problem(10, 2)
    op0 = fem.CutOperator(af, dom)
    op1 = StencilCutOperator(af, dom)
    x0, it0, _ = op0.solve_cg(b, rtol=1e-9, maxiter=2000)
    x1, it1, _ = op1.solve_cg(b, rtol=1e-9, maxiter=2000,
                              precond="jacobi")
    mask = dom.active_mask
    err = np.abs(np.asarray(x0) - np.asarray(x1))[mask].max()
    assert err < 1e-6 * np.abs(np.asarray(x0)[mask]).max()


@pytest.mark.parametrize("n,deg", [(8, 1), (10, 2)])
def test_band_fold_apply_exact(n, deg):
    """The folded element path (dense cube/pair blocks, zero gathers)
    reproduces the gather-path apply exactly."""
    from cutfemx_tpu.stencil import (_grid_apply_fold_body,
                                     _grid_apply_jit)
    V, af, dom, b = _problem(n, deg)
    op = StencilCutOperator(af, dom)
    op._ensure_band_fold()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(op.gsize))
    y0 = np.asarray(_grid_apply_jit(*op._grid_statics(),
                                    *op._grid_arrays(), x))
    y1 = np.asarray(_grid_apply_fold_body(
        *op._grid_statics(), op._bf_bbox, op.A_local, op.cube_mask_j,
        op.active_grid, op.identity_grid, op._bf_diag, op._bf_fwd,
        op._bf_rev, x))
    err = np.abs(y1 - y0).max() / max(np.abs(y0).max(), 1.0)
    assert err < 1e-11, err


def test_mixed_precision_refinement():
    """f32 problems solve through iterative refinement (scoped-x64 true
    residuals + short f32 corrections) and meet the tolerance in the
    TRUE residual, not just the recurrence."""
    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (8, 8, 8))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0]**2 + x[1]**2 + x[2]**2) - 0.6)
    cd = cfx.cut(phi)
    inside = cfx.locate_entities(cd, "phi<0")
    vol = cfx.runtime_quadrature(cd, "phi<0", 4)
    srf = cfx.runtime_quadrature(cd, "phi=0", 4)
    gp = cfx.ghost_penalty_facets(cd, "phi<0")
    dxo = Measure("dx", domain=mesh, subdomain_data=[inside, vol])
    dxg = Measure("dx", domain=mesh, subdomain_data=srf)
    dSg = Measure("dS", domain=mesh, subdomain_data=gp)
    V = cfx.functionspace(mesh, ("Lagrange", 2))
    u, v = TrialFunction(V), TestFunction(V)
    x = SpatialCoordinate(mesh)
    ng = cfx.normal(phi)
    nf = FacetNormal(mesh)
    h = CellDiameter(mesh)
    a = inner(grad(u), grad(v)) * dxo + (-dot(grad(u), ng) * v
        - dot(grad(v), ng) * u + 40.0 / h * u * v) * dxg
    a += 0.1 * avg(h) * inner(jump(grad(u), nf), jump(grad(v), nf)) * dSg
    L = sin(pi * x[0]) * v * dxo
    af = fem.form(a, dtype=np.float32)
    Lf = fem.form(L, dtype=np.float32)
    dom = fem.active_domain(af)
    b = fem.assemble_vector(Lf)
    assert np.asarray(b).dtype == np.float32
    op = StencilCutOperator(af, dom)
    xs, its, res = op.solve_cg(b, rtol=1e-6, maxiter=2000)
    # verify the TRUE residual in f64
    op64 = fem.CutOperator(fem.form(a), fem.active_domain(fem.form(a)))
    bb = np.where(dom.active_mask, np.asarray(b, np.float64), 0.0)
    r = np.asarray(op64(jnp.asarray(np.asarray(xs, np.float64)))) - bb
    # f64 oracle operator differs from the f32 operator by rounding of
    # the element matrices themselves (~1e-7 relative)
    assert np.linalg.norm(r) <= 5e-6 * np.linalg.norm(bb)


def test_chunked_dispatch_solve():
    """Splitting the solve into small restart chunks still converges to
    tolerance (the 10M-dof path runs this way to respect the remote
    runtime's per-dispatch limit)."""
    V, af, dom, b = _problem(8, 2)
    op = StencilCutOperator(af, dom)
    x1, it1, r1 = op.solve_cg(b, rtol=1e-8, maxiter=2000)
    x2, it2, r2 = op.solve_cg(b, rtol=1e-8, maxiter=2000,
                              dispatch_chunk=9)
    op0 = fem.CutOperator(af, dom)
    bb = np.where(dom.active_mask, np.asarray(b), 0.0)
    for xs in (x1, x2):
        res = np.linalg.norm(np.asarray(op0(jnp.asarray(xs))) - bb)
        assert res <= 1.05e-8 * np.linalg.norm(bb)


def test_stencil_asm_fold_solve():
    """The opt-in folded-apply solve (zero gathers) converges to the same
    residual as the gather-path ASM solve."""
    V, af, dom, b = _problem(10, 2)
    op0 = fem.CutOperator(af, dom)
    op1 = StencilCutOperator(af, dom)
    xf, itf, _ = op1.solve_cg(b, rtol=1e-8, maxiter=2000,
                              precond="asm-fold")
    bb = np.where(dom.active_mask, np.asarray(b), 0.0)
    res = np.linalg.norm(np.asarray(op0(jnp.asarray(xf))) - bb)
    assert res <= 1.05e-8 * np.linalg.norm(bb)


def test_stencil_asm_precond():
    """Cube-block additive Schwarz: converges to the same residual in the
    reference operator's metric with materially fewer iterations (the
    solution itself is only unique up to near-null sliver modes)."""
    V, af, dom, b = _problem(10, 2)
    op0 = fem.CutOperator(af, dom)
    op1 = StencilCutOperator(af, dom)
    xj, itj, _ = op1.solve_cg(b, rtol=1e-8, maxiter=2000,
                              precond="jacobi")
    xa, ita, _ = op1.solve_cg(b, rtol=1e-8, maxiter=2000, precond="asm")
    bb = np.where(dom.active_mask, np.asarray(b), 0.0)
    res = np.linalg.norm(np.asarray(op0(jnp.asarray(xa))) - bb)
    assert res <= 1e-8 * np.linalg.norm(bb) * 1.01
    assert int(ita) < 0.6 * int(itj), (int(ita), int(itj))
