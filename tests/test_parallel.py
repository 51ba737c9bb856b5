"""Multi-device sharding: the halo-exchange operator must reproduce the
single-device solve exactly on an 8-way virtual CPU mesh (the TPU-native
analog of the reference's 2-rank MPI smoke tests, SURVEY.md §4)."""

import numpy as np
import pytest

import jax

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (CellDiameter, FacetNormal,
                                   SpatialCoordinate, TestFunction,
                                   TrialFunction, avg, dot, grad, inner,
                                   jump, pi, sin)
from cutfemx_tpu.forms.measure import Measure
from cutfemx_tpu.parallel import make_device_mesh
from cutfemx_tpu.parallel.halo import HaloOperator, build_slab_partition


def _cut_poisson_problem(n=24, degree=1, ghost=False):
    mesh = cfx.mesh.create_rectangle((-1.0, -1.0), (1.0, 1.0), (n, n))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2) - 0.6)
    cd = cfx.cut(phi)
    inside = cfx.locate_entities(cd, "phi<0")
    vol = cfx.runtime_quadrature(cd, "phi<0", 2 * degree)
    srf = cfx.runtime_quadrature(cd, "phi=0", 2 * degree)
    dxo = Measure("dx", domain=mesh, subdomain_data=[inside, vol])
    dxg = Measure("dx", domain=mesh, subdomain_data=srf)
    V = cfx.functionspace(mesh, ("Lagrange", degree))
    u, v = TrialFunction(V), TestFunction(V)
    x = SpatialCoordinate(mesh)
    ng = cfx.normal(phi)
    h = CellDiameter(mesh)
    ue = sin(pi * x[0]) * sin(pi * x[1])
    f = 2 * pi ** 2 * ue
    gamma = 40.0
    a = inner(grad(u), grad(v)) * dxo
    a += (-dot(grad(u), ng) * v - dot(grad(v), ng) * u
          + gamma / h * u * v) * dxg
    if ghost:
        gp = cfx.ghost_penalty_facets(cd, "phi<0")
        dSg = Measure("dS", domain=mesh, subdomain_data=gp)
        nf = FacetNormal(mesh)
        a += 0.1 * avg(h) * inner(jump(grad(u), nf),
                                  jump(grad(v), nf)) * dSg
    L = f * v * dxo + (-dot(grad(v), ng) * ue + gamma / h * ue * v) * dxg
    af, Lf = fem.form(a), fem.form(L)
    dom = fem.active_domain(af)
    b = np.array(fem.assemble_vector(Lf))
    return V, af, dom, b


@pytest.mark.parametrize("ndev", [2, 8])
def test_halo_partition_consistency(ndev):
    V, af, dom, b = _cut_poisson_problem()
    part = build_slab_partition(V, ndev)
    # every dof appears exactly once as owned across parts
    owned = []
    for p in range(ndev):
        owned.append(part.global_of_local[p, :part.n_owned[p]])
    owned = np.concatenate(owned)
    assert len(owned) == V.dim
    assert len(np.unique(owned)) == V.dim


@pytest.mark.parametrize("ndev", [2, 8])
def test_halo_apply_matches_serial(ndev):
    V, af, dom, b = _cut_poisson_problem()
    op = fem.CutOperator(af, dom)
    part = build_slab_partition(V, ndev)
    mesh = make_device_mesh(ndev)
    hop = HaloOperator(af, dom, part, mesh)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(V.dim)
    y_serial = np.asarray(op(jax.numpy.asarray(x)))
    from cutfemx_tpu.parallel.halo import _halo_cg  # noqa: F401
    # single apply via the internals: run one CG iteration manually by
    # comparing full solves instead (apply is exercised through solve)
    xs, its_s, _ = op.solve_cg(b, rtol=1e-10, maxiter=400)
    xg, its_h, res = hop.solve_cg(b, rtol=1e-10, maxiter=400)
    xs = np.asarray(xs)
    mask = dom.active_mask
    err = np.abs(xs[mask] - xg[mask]).max()
    scale = np.abs(xs[mask]).max()
    assert err < 1e-8 * scale, (err, scale, its_s, its_h)


@pytest.mark.parametrize("ndev", [2, 8])
def test_halo_with_ghost_penalty(ndev):
    """Two-sided ghost layers: distributed solves of ghost-penalty forms
    (facet terms straddle slab boundaries) match the serial solve."""
    V, af, dom, b = _cut_poisson_problem(ghost=True)
    op = fem.CutOperator(af, dom)
    part = build_slab_partition(V, ndev)
    mesh = make_device_mesh(ndev)
    hop = HaloOperator(af, dom, part, mesh)
    xs, its_s, _ = op.solve_cg(b, rtol=1e-10, maxiter=400)
    xg, its_h, res = hop.solve_cg(b, rtol=1e-10, maxiter=400)
    xs = np.asarray(xs)
    mask = dom.active_mask
    err = np.abs(xs[mask] - xg[mask]).max()
    assert err < 1e-8 * np.abs(xs[mask]).max(), (err, its_s, its_h)
