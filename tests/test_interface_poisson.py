"""Two-domain interface Poisson with Nitsche coupling and block
deactivation — mirrors /root/reference/python/demo/demo_interface_poisson.py
(kappa-weighted Nitsche on {phi=0}, exact solution u1=r^2,
u2=ratio*r^2+R^2(1-ratio))."""

import numpy as np
import pytest

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (CellDiameter, CoefficientExpr,
                                   FacetNormal, MixedFunctionSpace,
                                   SpatialCoordinate, TestFunctions,
                                   TrialFunctions, avg, dot, grad, inner,
                                   jump)
from cutfemx_tpu.forms.measure import Measure


def solve_interface(n):
    radius, center = 0.53, (0.05, -0.03)
    kappa_1, kappa_2 = 1.0, 8.0
    g_int, g_bnd, g_ghost = 40.0, 40.0, 0.1

    mesh = cfx.mesh.create_rectangle((-1.0, -1.0), (1.0, 1.0), (n, n))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(lambda x: np.sqrt((x[0] - center[0]) ** 2
                                      + (x[1] - center[1]) ** 2) - radius)

    cd = cfx.cut(phi)
    inside = cfx.locate_entities(cd, "phi<0")
    outside = cfx.locate_entities(cd, "phi>0")
    in_rules = cfx.runtime_quadrature(cd, "phi<0", 3)
    out_rules = cfx.runtime_quadrature(cd, "phi>0", 3)
    gam_rules = cfx.runtime_quadrature(cd, "phi=0", 3)
    gp1 = cfx.ghost_penalty_facets(cd, "phi<0")
    gp2 = cfx.ghost_penalty_facets(cd, "phi>0")

    dx1 = Measure("dx", domain=mesh, subdomain_data=[inside, in_rules])
    dx2 = Measure("dx", domain=mesh, subdomain_data=[outside, out_rules])
    dgam = Measure("dx", domain=mesh, subdomain_data=gam_rules)
    dS1 = Measure("dS", domain=mesh, subdomain_data=gp1)
    dS2 = Measure("dS", domain=mesh, subdomain_data=gp2)
    ds_out = Measure("ds", domain=mesh)

    V1 = cfx.functionspace(mesh, ("Lagrange", 1))
    V2 = cfx.functionspace(mesh, ("Lagrange", 1))
    W = MixedFunctionSpace(V1, V2)
    u1, u2 = TrialFunctions(W)
    v1, v2 = TestFunctions(W)

    x = SpatialCoordinate(mesh)
    r2 = (x[0] - center[0]) ** 2 + (x[1] - center[1]) ** 2
    ratio = kappa_1 / kappa_2
    u1_ex = r2
    u2_ex = ratio * r2 + radius ** 2 * (1.0 - ratio)
    f1 = -4.0 * kappa_1
    f2 = -4.0 * kappa_1

    ng = cfx.normal(phi)
    nf = FacetNormal(mesh)
    h = CellDiameter(mesh)
    kh = 2 * kappa_1 * kappa_2 / (kappa_1 + kappa_2)
    eta_i = g_int * kh / h
    eta_b = g_bnd * kappa_2 / h
    w1 = kappa_2 / (kappa_1 + kappa_2)
    w2 = kappa_1 / (kappa_1 + kappa_2)

    ju, jv = u1 - u2, v1 - v2
    flux_u = w1 * kappa_1 * dot(grad(u1), ng) + \
        w2 * kappa_2 * dot(grad(u2), ng)
    flux_v = w1 * kappa_1 * dot(grad(v1), ng) + \
        w2 * kappa_2 * dot(grad(v2), ng)

    a = kappa_1 * inner(grad(u1), grad(v1)) * dx1
    a += kappa_2 * inner(grad(u2), grad(v2)) * dx2
    a += (-flux_u * jv - flux_v * ju + eta_i * ju * jv) * dgam
    if gp1.size:
        a += g_ghost * kappa_1 * avg(h) * inner(
            jump(grad(u1), nf), jump(grad(v1), nf)) * dS1
    if gp2.size:
        a += g_ghost * kappa_2 * avg(h) * inner(
            jump(grad(u2), nf), jump(grad(v2), nf)) * dS2
    a += (-kappa_2 * dot(grad(u2), nf) * v2
          - kappa_2 * dot(grad(v2), nf) * u2 + eta_b * u2 * v2) * ds_out

    L = f1 * v1 * dx1 + f2 * v2 * dx2
    L += (-kappa_2 * dot(grad(v2), nf) * u2_ex + eta_b * u2_ex * v2) * ds_out

    a_blocks = fem.extract_blocks(a)
    L_blocks = fem.extract_blocks(L)

    A = [[fem.assemble_matrix(blk) if blk is not None else None
          for blk in row] for row in a_blocks]
    b = [np.array(fem.assemble_vector(blk)) if blk is not None
         else np.zeros(V.dim)
         for blk, V in zip(L_blocks, (V1, V2))]

    dom1 = fem.active_domain(a_blocks[0][0])
    dom2 = fem.active_domain(a_blocks[1][1])
    fem.deactivate_outside_blocks(A, [dom1, dom2], b)
    zrows = fem.zero_block_rows(A)
    assert all(r.size == 0 for r in zrows)

    from scipy.sparse import bmat, csr_matrix
    Ah = bmat([[blk.to_scipy().tocsr() if blk is not None
                else csr_matrix((V1.dim if i == 0 else V2.dim,
                                 V1.dim if j == 0 else V2.dim))
                for j, blk in enumerate(row)] for i, row in enumerate(A)],
              format="csr")
    from scipy.sparse.linalg import spsolve
    sol = spsolve(Ah, np.concatenate(b))

    import jax.numpy as jnp
    u1h = cfx.Function(V1)
    u1h.x = jnp.asarray(sol[:V1.dim])
    u2h = cfx.Function(V2)
    u2h.x = jnp.asarray(sol[V1.dim:])

    e1 = CoefficientExpr(u1h) - u1_ex
    e2 = CoefficientExpr(u2h) - u2_ex
    jerr = CoefficientExpr(u1h) - CoefficientExpr(u2h)
    err1 = np.sqrt(max(float(fem.assemble_scalar(fem.form(e1 * e1 * dx1))),
                       0.0))
    err2 = np.sqrt(max(float(fem.assemble_scalar(fem.form(e2 * e2 * dx2))),
                       0.0))
    jmp = np.sqrt(max(float(fem.assemble_scalar(
        fem.form(jerr * jerr * dgam))), 0.0))
    return err1, err2, jmp


def test_interface_poisson_convergence():
    e1c, e2c, jc = solve_interface(12)
    e1f, e2f, jf = solve_interface(24)
    assert e1f < 6e-3 and e2f < 6e-3
    assert np.log2(e1c / e1f) > 1.5
    assert np.log2(e2c / e2f) > 1.5
    assert jf < 2e-2  # interface jump controlled


def test_block_assembly_helpers():
    """assemble_matrix_block / assemble_vector_block match the manual
    scipy bmat composition used in the demos."""
    import cutfemx_tpu as cfx
    from cutfemx_tpu.forms.dsl import (MixedFunctionSpace, TestFunctions,
                                       TrialFunctions, div)
    from cutfemx_tpu.forms.measure import dx
    mesh = cfx.mesh.create_unit_square(4)
    V = cfx.functionspace(mesh, ("Lagrange", 2), shape=(2,))
    Q = cfx.functionspace(mesh, ("Lagrange", 1))
    W = MixedFunctionSpace(V, Q)
    u, p = TrialFunctions(W)
    v, q = TestFunctions(W)
    a = (inner(grad(u), grad(v)) - p * div(v) + div(u) * q) * dx
    ab = fem.extract_blocks(a)
    A = fem.assemble_matrix_block(ab, spaces=[V, Q])
    assert A.shape == (V.dim + Q.dim, V.dim + Q.dim)
    from scipy.sparse import bmat, csr_matrix
    manual = bmat([[fem.assemble_matrix(b).to_scipy() if b is not None
                    else csr_matrix((s1.dim, s2.dim))
                    for b, s2 in zip(row, (V, Q))]
                   for row, s1 in zip(ab, (V, Q))]).tocsr()
    assert abs(A.to_scipy() - manual).max() < 1e-14
    offs = fem.block_offsets([V, Q])
    assert offs[-1] == V.dim + Q.dim
