"""CutOperator matrix-free apply vs the assembled-CSR oracle, including
the merged/duplicate-compressed apply arrays (interior-facet ghost
penalty exercises the 20->14 dof compression; the runtime-volume and
Nitsche-surface instances exercise same-cell batch merging)."""

import numpy as np

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (CellDiameter, FacetNormal, TestFunction,
                                   TrialFunction, avg, dot, grad, inner,
                                   jump)
from cutfemx_tpu.forms.measure import Measure


def _cut_nitsche_form(n=8, deg=2, r=0.46):
    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (n, n, n))
    V1 = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(V1, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0]**2 + x[1]**2 + x[2]**2) - r)
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
    ng = cfx.normal(phi)
    nf = FacetNormal(mesh)
    h = CellDiameter(mesh)
    a = inner(grad(u), grad(v)) * dxo \
        + (-dot(grad(u), ng) * v - dot(grad(v), ng) * u
           + 40. / h * u * v) * dxg \
        + 0.1 * avg(h) * inner(jump(grad(u), nf),
                               jump(grad(v), nf)) * dSg
    af = fem.form(a)
    return af, fem.active_domain(af)


def test_cutoperator_matches_assembled_matrix():
    af, dom = _cut_nitsche_form()
    op = fem.CutOperator(af, dom)
    A = af and fem.assemble_matrix(af).to_scipy().tocsr()
    active = np.asarray(dom.active_mask)
    rng = np.random.default_rng(3)
    for _ in range(3):
        x = rng.standard_normal(op.dim)
        y = np.asarray(op(x))
        y_ref = A @ np.where(active, x, 0.0)
        y_ref = np.where(active, y_ref, x)
        err = np.abs(y - y_ref).max() / np.abs(y_ref).max()
        assert err < 1e-5

    # compression actually happened: total gathered row elements are
    # fewer than the raw per-instance layout
    raw = sum(int(np.asarray(r).size) for r in op.row_dofs)
    packed = sum(int(np.asarray(r).size) for r in op._rows)
    assert packed < raw

    # diagonal matches the CSR diagonal on active dofs
    d = np.asarray(op.diagonal())
    d_ref = np.asarray(A.diagonal())
    sel = active
    err_d = np.abs(d[sel] - d_ref[sel]).max() / np.abs(d_ref[sel]).max()
    assert err_d < 1e-5


def test_cutoperator_cg_solves():
    af, dom = _cut_nitsche_form(n=6)
    op = fem.CutOperator(af, dom)
    active = np.asarray(dom.active_mask)
    rng = np.random.default_rng(0)
    b = np.where(active, rng.standard_normal(op.dim), 0.0)
    x, its, res = op.solve_cg(b, rtol=1e-8, maxiter=2000)
    y = np.asarray(op(np.asarray(x)))
    rel = np.linalg.norm(np.where(active, y - b, 0.0)) / np.linalg.norm(b)
    assert rel < 1e-6
