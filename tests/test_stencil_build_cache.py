"""Verified-reuse preconditioner build cache (stencil._BUILD_CACHE):
builds are adopted across operator rebuilds only when every build input
is bitwise identical, and a moved level set invalidates the cache and
yields the same solution as a cold build.

The reference's moving-domain loop re-cuts and re-assembles every step
(/root/reference/cpp/cutfemx/cut/cut.cpp:845-868); re-solving on an
UNCHANGED cut (Newton iterations, multi-RHS, a step where phi did not
move) must not pay the fold/ASM/coarse builds again."""

import numpy as np

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (CellDiameter, FacetNormal, TestFunction,
                                   TrialFunction, avg, dot, grad, inner,
                                   jump)
from cutfemx_tpu.forms.measure import Measure
from cutfemx_tpu.stencil import _BUILD_CACHE, StencilCutOperator


def _cut_problem(n, radius):
    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (n, n, n))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(
        lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2 + x[2] ** 2) - radius)
    V = cfx.functionspace(mesh, ("Lagrange", 2))
    cd = cfx.cut(phi)
    inside = cfx.locate_entities(cd, "phi<0")
    vol = cfx.runtime_quadrature(cd, "phi<0", 4)
    srf = cfx.runtime_quadrature(cd, "phi=0", 4)
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


def test_identical_rebuild_adopts_builds():
    _BUILD_CACHE.clear()
    op1, b = _cut_problem(8, 0.46)
    x1, it1, _ = op1.solve_cg(b, rtol=1e-8, maxiter=600,
                              precond="asm-fold2", refine=False)
    assert any("fold" in e and "asm" in e and "coarse" in e
               for e in _BUILD_CACHE.values())

    # identical rebuild (same phi): every stage adopted by identity
    op2, b2 = _cut_problem(8, 0.46)
    op2._ensure_band_fold()
    op2._ensure_cube_asm()
    op2._ensure_coarse()
    assert op2._bf_diag is op1._bf_diag
    assert op2._asm_binv is op1._asm_binv
    assert op2._c_acinv is op1._c_acinv
    x2, it2, _ = op2.solve_cg(b2, rtol=1e-8, maxiter=600,
                              precond="asm-fold2", refine=False)
    assert int(it2) == int(it1)
    assert np.allclose(np.asarray(x2), np.asarray(x1), atol=0.0)


def test_moved_level_set_invalidates_and_matches_cold():
    _BUILD_CACHE.clear()
    op1, _ = _cut_problem(8, 0.46)
    op1.solve_cg(np.ones(op1.dim), rtol=1e-6, maxiter=300,
                 precond="asm-fold2", refine=False)

    # moved interface: fingerprints must differ -> fresh builds
    op2, b2 = _cut_problem(8, 0.52)
    op2._ensure_band_fold()
    assert op2._bf_diag is not op1._bf_diag
    x_warm, it_w, _ = op2.solve_cg(b2, rtol=1e-8, maxiter=600,
                                   precond="asm-fold2", refine=False)

    # cold-cache reference of the moved problem
    _BUILD_CACHE.clear()
    op3, b3 = _cut_problem(8, 0.52)
    x_cold, it_c, _ = op3.solve_cg(b3, rtol=1e-8, maxiter=600,
                                   precond="asm-fold2", refine=False)
    assert int(it_w) == int(it_c)
    ref = np.linalg.norm(np.asarray(x_cold))
    assert np.linalg.norm(np.asarray(x_warm) - np.asarray(x_cold)) \
        <= 1e-10 * ref


def test_cache_disabled_by_env(monkeypatch):
    _BUILD_CACHE.clear()
    monkeypatch.setenv("CUTFEMX_BUILD_CACHE", "0")
    op1, b = _cut_problem(8, 0.46)
    op1._ensure_band_fold()
    assert not _BUILD_CACHE
    op2, _ = _cut_problem(8, 0.46)
    op2._ensure_band_fold()
    assert op2._bf_diag is not op1._bf_diag
