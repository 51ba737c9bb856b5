"""Two-domain Poisson on an unfitted circular interface (TPU-native
re-design of /root/reference/python/demo/demo_interface_poisson.py):
separate background spaces per phase coupled with kappa-weighted symmetric
Nitsche terms on {phi = 0}; block assembly + block deactivation.

Run: python demos/demo_interface_poisson.py [--n 24]
"""

from __future__ import annotations

import argparse

import numpy as np

import jax.numpy as jnp

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (CellDiameter, CoefficientExpr,
                                   FacetNormal, MixedFunctionSpace,
                                   SpatialCoordinate, TestFunctions,
                                   TrialFunctions, avg, dot, grad, inner,
                                   jump)
from cutfemx_tpu.forms.measure import Measure


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=24)
    args = p.parse_args()
    n = args.n
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
    in_rules = cfx.runtime_quadrature(cd, "phi<0", 4)
    out_rules = cfx.runtime_quadrature(cd, "phi>0", 4)
    gam_rules = cfx.runtime_quadrature(cd, "phi=0", 4)
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
    eta_i, eta_b = g_int * kh / h, g_bnd * kappa_2 / h
    w1 = kappa_2 / (kappa_1 + kappa_2)
    w2 = kappa_1 / (kappa_1 + kappa_2)

    ju, jv = u1 - u2, v1 - v2
    flux_u = w1 * kappa_1 * dot(grad(u1), ng) \
        + w2 * kappa_2 * dot(grad(u2), ng)
    flux_v = w1 * kappa_1 * dot(grad(v1), ng) \
        + w2 * kappa_2 * dot(grad(v2), ng)

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
    L += (-kappa_2 * dot(grad(v2), nf) * u2_ex
          + eta_b * u2_ex * v2) * ds_out

    a_blocks = fem.extract_blocks(a)
    L_blocks = fem.extract_blocks(L)
    A = [[fem.assemble_matrix(blk) if blk is not None else None
          for blk in row] for row in a_blocks]
    b = [np.array(fem.assemble_vector(blk)) if blk is not None
         else np.zeros(sp.dim) for blk, sp in zip(L_blocks, (V1, V2))]

    dom1 = fem.active_domain(a_blocks[0][0])
    dom2 = fem.active_domain(a_blocks[1][1])
    fem.deactivate_outside_blocks(A, [dom1, dom2], b)
    zrows = fem.zero_block_rows(A)
    if any(r.size > 0 for r in zrows):
        raise RuntimeError("Zero matrix rows remain after deactivation")

    from scipy.sparse import bmat, csr_matrix
    from scipy.sparse.linalg import spsolve
    dims = (V1.dim, V2.dim)
    Ah = bmat([[blk.to_scipy().tocsr() if blk is not None else
                csr_matrix((dims[i], dims[j]))
                for j, blk in enumerate(row)]
               for i, row in enumerate(A)], format="csr")
    sol = spsolve(Ah, np.concatenate(b))

    u1h = cfx.Function(V1, name="u1_h")
    u1h.x = jnp.asarray(sol[:V1.dim])
    u2h = cfx.Function(V2, name="u2_h")
    u2h.x = jnp.asarray(sol[V1.dim:])

    e1 = CoefficientExpr(u1h) - u1_ex
    e2 = CoefficientExpr(u2h) - u2_ex
    je = CoefficientExpr(u1h) - CoefficientExpr(u2h)
    err1 = float(fem.assemble_scalar(fem.form(e1 * e1 * dx1)))
    err2 = float(fem.assemble_scalar(fem.form(e2 * e2 * dx2)))
    jerr = float(fem.assemble_scalar(fem.form(je * je * dgam)))

    print(f"Two-domain interface Poisson, n={n}")
    print(f"inside cells          = {inside.size}")
    print(f"outside cells         = {outside.size}")
    print(f"interface cut cells   = {gam_rules.parent_map.size}")
    print(f"ghost facets in/out   = {gp1.size}/{gp2.size}")
    print(f"inactive dofs u1/u2   = "
          f"{dom1.inactive_dofs.size}/{dom2.inactive_dofs.size}")
    print(f"L2 error u1           = {np.sqrt(max(err1, 0.0)):.6e}")
    print(f"L2 error u2           = {np.sqrt(max(err2, 0.0)):.6e}")
    print(f"interface jump norm   = {np.sqrt(max(jerr, 0.0)):.6e}")


if __name__ == "__main__":
    main()
