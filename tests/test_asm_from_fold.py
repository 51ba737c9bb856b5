"""Cube-ASM blocks reconstructed from the direct band fold must match
the host per-element cube sweep (stencil._asm_blocks_from_fold vs
_asm_blocks_host): same band, same off-diagonal sums (block diagonals
are overwritten with the exact operator diagonal downstream), and the
preconditioned solves must coincide."""

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


def _problem(n, deg, ls):
    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (n, n, n))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(ls)
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
    return V, af, dom, fem.assemble_vector(Lf)


SPHERE = lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2 + x[2] ** 2) - 0.6
# tilted plane: the active domain touches the box boundary, so the fold
# bbox origin hits 0 on two axes (exercises the shifted-write clipping)
PLANE = lambda x: x[0] + 0.31 * x[1] - 0.13


@pytest.mark.parametrize("deg", [1, 2])
@pytest.mark.parametrize("ls", [SPHERE, PLANE], ids=["sphere", "plane"])
def test_asm_blocks_from_fold_match_host(deg, ls):
    V, af, dom, b = _problem(8, deg, ls)
    op = StencilCutOperator(af, dom)
    op._ensure_band_fold()
    assert op._bf_direct, "expected the closed-form direct fold"
    band_f, blocks_f = op._asm_blocks_from_fold()
    band_h, blocks_h = op._asm_blocks_host()
    assert np.isin(band_f, band_h).all()
    bf = np.asarray(blocks_f)
    bh = np.asarray(blocks_h)
    L = bf.shape[-1]
    offm = 1.0 - np.eye(L)
    pos_f = {int(c): i for i, c in enumerate(band_f)}
    scale = float(np.abs(bh).max())
    for i, c in enumerate(band_h):
        hb = bh[i] * offm
        if int(c) in pos_f:
            d = float(np.abs(hb - bf[pos_f[int(c)]] * offm).max())
        else:
            d = float(np.abs(hb).max())
        assert d <= 1e-5 * scale


def test_asm_from_fold_solve_parity(monkeypatch):
    V, af, dom, b = _problem(8, 2, SPHERE)
    monkeypatch.setenv("CUTFEMX_ASM_BUILD", "host")
    op_h = StencilCutOperator(af, dom)
    op_h._ensure_band_fold()
    x_h, it_h, _ = op_h.solve_cg(b, rtol=1e-8, maxiter=800, precond="asm")
    monkeypatch.delenv("CUTFEMX_ASM_BUILD")
    op_f = StencilCutOperator(af, dom)
    op_f._ensure_band_fold()
    x_f, it_f, _ = op_f.solve_cg(b, rtol=1e-8, maxiter=800, precond="asm")
    assert abs(it_h - it_f) <= 2
    num = float(jnp.max(jnp.abs(x_h - x_f)))
    den = max(float(jnp.max(jnp.abs(x_h))), 1e-30)
    assert num / den < 1e-6
