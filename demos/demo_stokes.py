"""Cut Stokes flow around an implicit cylinder (TPU-native re-design of
/root/reference/python/demo/demo_stokes.py): equal-order P1-P1 with CIP
pressure stabilization, Nitsche velocity conditions on the cylinder, an
inflow profile on the left and strong walls.

Run: python demos/demo_stokes.py [--n 24]
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
                                   TrialFunctions, as_vector, avg, div,
                                   dot, grad, inner, jump)
from cutfemx_tpu.forms.measure import Measure


def traction(u, p, nu, n):
    return nu * dot(grad(u), n) - p * n


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=24)
    args = ap.parse_args()
    n = args.n
    nu = 1.0
    center, radius = (-1.2, 0.0), 0.3
    gamma_u, gamma_p, gamma_g = 100.0, 0.1, 0.1

    mesh = cfx.mesh.create_rectangle((-3.0, -1.0), (5.0, 1.0),
                                     (4 * n, n))
    Q1 = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Q1, name="phi")
    phi.interpolate(lambda x: np.sqrt((x[0] - center[0]) ** 2
                                      + (x[1] - center[1]) ** 2) - radius)

    cd = cfx.cut(phi)
    fluid = cfx.locate_entities(cd, "phi>0")
    cut_cells = cfx.locate_entities(cd, "phi=0")
    rules = cfx.runtime_quadrature(cd, "phi>0", 4)
    irules = cfx.runtime_quadrature(cd, "phi=0", 4)
    gp = cfx.ghost_penalty_facets(cd, "phi>0")
    active = np.union1d(fluid, cut_cells)
    p_facets = cfx.interior_facets_for_cells(mesh, active)

    dxo = Measure("dx", domain=mesh, subdomain_data=[fluid, rules])
    dxg = Measure("dx", domain=mesh, subdomain_data=irules)
    dSg = Measure("dS", domain=mesh, subdomain_data=gp)
    dSp = Measure("dS", domain=mesh, subdomain_data=p_facets)

    V = cfx.functionspace(mesh, ("Lagrange", 1), shape=(2,))
    Q = cfx.functionspace(mesh, ("Lagrange", 1))
    W = MixedFunctionSpace(V, Q)
    u, p = TrialFunctions(W)
    v, q = TestFunctions(W)
    ng = -1.0 * cfx.normal(phi)  # outward of the fluid {phi>0}
    nf = FacetNormal(mesh)
    h = CellDiameter(mesh)

    a = nu * inner(grad(u), grad(v)) * dxo
    a += -p * div(v) * dxo
    a += div(u) * q * dxo
    a += -inner(traction(u, p, nu, ng), v) * dxg
    a += -inner(traction(v, q, nu, ng), u) * dxg
    a += gamma_u * nu / h * inner(u, v) * dxg
    if gp.size:
        a += gamma_g * avg(h) * inner(jump(grad(u), nf),
                                      jump(grad(v), nf)) * dSg
    a += gamma_p * avg(h) ** 3 * inner(jump(grad(p), nf),
                                       jump(grad(q), nf)) * dSp
    zero = as_vector([0.0, 0.0])
    L = inner(zero, v) * dxo

    ab = fem.extract_blocks(a)
    Lb = fem.extract_blocks(L)
    A = [[fem.assemble_matrix(blk) if blk is not None else None
          for blk in row] for row in ab]
    b = [np.zeros(V.dim), np.zeros(Q.dim)]
    for i, blk in enumerate(Lb):
        if blk is not None:
            b[i] = np.array(fem.assemble_vector(blk))

    # strong BCs: inflow parabola on the left, walls top/bottom, do
    # nothing at the outflow
    ext = mesh.exterior_facets
    mid = mesh.midpoints(mesh.tdim - 1, ext)
    leftf = ext[np.abs(mid[:, 0] + 3.0) < 1e-12]
    wallf = ext[np.abs(np.abs(mid[:, 1]) - 1.0) < 1e-12]
    inflow = cfx.Function(V)
    inflow.interpolate(lambda x: np.stack(
        (1.0 - x[1] ** 2, np.zeros_like(x[0]))))
    bcs = [fem.dirichletbc(inflow,
                           fem.locate_dofs_topological(
                               V, mesh.tdim - 1, leftf), V),
           fem.dirichletbc(0.0,
                           fem.locate_dofs_topological(
                               V, mesh.tdim - 1, wallf), V)]

    dom_u = fem.active_domain(ab[0][0])
    dom_p = fem.active_domain(ab[1][1])
    fem.deactivate_outside_blocks(A, [dom_u, dom_p], b)

    from scipy.sparse import bmat, csr_matrix
    from scipy.sparse.linalg import spsolve
    dims = (V.dim, Q.dim)
    Ah = bmat([[blk.to_scipy().tocsr() if blk is not None else
                csr_matrix((dims[i], dims[j]))
                for j, blk in enumerate(row)]
               for i, row in enumerate(A)], format="lil")
    bfull = np.concatenate(b)
    g = np.zeros(V.dim + Q.dim)
    for bc in bcs:
        g[bc.dofs] = bc.values
    # symmetric elimination: lift the rhs, zero bc rows AND columns
    bfull -= np.asarray(Ah.tocsr() @ g)
    all_bc = np.unique(np.concatenate([bc.dofs for bc in bcs]))
    Ah[all_bc, :] = 0.0
    Ah[:, all_bc] = 0.0
    Ah[all_bc, all_bc] = 1.0
    bfull[all_bc] = g[all_bc]
    # NOTE: no pressure pinning — the do-nothing outflow fixes the
    # pressure level (pinning would overconstrain and break mass
    # conservation)
    sol = spsolve(Ah.tocsr(), bfull)

    uh = cfx.Function(V, name="u")
    uh.x = jnp.asarray(sol[:V.dim])
    ph = cfx.Function(Q, name="p")
    ph.x = jnp.asarray(sol[V.dim:])

    ue = CoefficientExpr(uh)
    rightf = ext[np.abs(mid[:, 0] - 5.0) < 1e-12]
    ds_in = Measure("ds", domain=mesh, subdomain_data=leftf)
    ds_out = Measure("ds", domain=mesh, subdomain_data=rightf)
    flux_in = float(fem.assemble_scalar(fem.form(
        dot(ue, nf) * ds_in)))
    flux_out = float(fem.assemble_scalar(fem.form(
        dot(ue, nf) * ds_out)))
    rate = float(fem.assemble_scalar(fem.form(inner(ue, ue) * dxg)))
    print(f"Cut Stokes cylinder flow, n={n}")
    print(f"fluid cells   = {fluid.size}, cut cells = {cut_cells.size}")
    print(f"ghost facets  = {gp.size}")
    print(f"flux in/out   = {-flux_in:.4f} / {flux_out:.4f} "
          f"(mass defect {abs(flux_in + flux_out):.2e})")
    print(f"|u|_Gamma     = {np.sqrt(max(rate, 0)):.3e} (no-slip quality)")
    umag = np.linalg.norm(np.asarray(uh.x).reshape(-1, 2), axis=1)
    print(f"max |u|       = {umag.max():.3f}")


if __name__ == "__main__":
    main()
