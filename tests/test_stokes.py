"""Cut Stokes: unfitted equal-order P1-P1 with Nitsche velocity BCs,
ghost-penalty and CIP pressure stabilization — mirrors
/root/reference/python/demo/demo_stokes.py:175-200 (traction coupling,
gamma_p avg(h)^3 pressure jumps)."""

import numpy as np

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (CellDiameter, CoefficientExpr,
                                   FacetNormal, MixedFunctionSpace,
                                   SpatialCoordinate, TestFunctions,
                                   TrialFunctions, as_vector, avg, cos, div,
                                   dot, grad, inner, jump, pi, sin)
from cutfemx_tpu.forms.measure import Measure


def traction(u, p, nu, n):
    return nu * dot(grad(u), n) - p * n


def solve_cut_stokes(n, r=0.71):
    nu = 1.0
    gamma_u, gamma_p, gamma_g = 100.0, 0.1, 0.1

    mesh = cfx.mesh.create_rectangle((-1.0, -1.0), (1.0, 1.0), (n, n))
    Q1 = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Q1, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2) - r)

    cd = cfx.cut(phi)
    fluid = cfx.locate_entities(cd, "phi<0")
    cut_cells = cfx.locate_entities(cd, "phi=0")
    rules = cfx.runtime_quadrature(cd, "phi<0", 3)
    irules = cfx.runtime_quadrature(cd, "phi=0", 3)
    gp = cfx.ghost_penalty_facets(cd, "phi<0")
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

    x = SpatialCoordinate(mesh)
    # divergence-free manufactured velocity from psi = sin(pi x) sin(pi y)
    u_ex = as_vector([pi * sin(pi * x[0]) * cos(pi * x[1]),
                      -pi * cos(pi * x[0]) * sin(pi * x[1])])
    p_ex = cos(pi * x[0]) * sin(pi * x[1])
    # f = -nu lap(u) + grad(p): lap(u) = -2 pi^2 u
    f = as_vector([
        2 * nu * pi ** 2 * pi * sin(pi * x[0]) * cos(pi * x[1])
        - pi * sin(pi * x[0]) * sin(pi * x[1]),
        -2 * nu * pi ** 2 * pi * cos(pi * x[0]) * sin(pi * x[1])
        + pi * cos(pi * x[0]) * cos(pi * x[1]),
    ])

    ng = cfx.normal(phi)  # outward of the fluid {phi<0}
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

    L = inner(f, v) * dxo
    L += -inner(traction(v, q, nu, ng), u_ex) * dxg
    L += gamma_u * nu / h * inner(u_ex, v) * dxg

    ab = fem.extract_blocks(a)
    Lb = fem.extract_blocks(L)
    A = [[fem.assemble_matrix(b) if b is not None else None for b in row]
         for row in ab]
    rhs = [np.array(fem.assemble_vector(b)) if b is not None else
           np.zeros(sp.dim) for b, sp in zip(Lb, (V, Q))]

    dom_u = fem.active_domain(ab[0][0])
    dom_p = fem.active_domain(ab[1][1])
    fem.deactivate_outside_blocks(A, [dom_u, dom_p], rhs)

    from scipy.sparse import bmat, csr_matrix
    from scipy.sparse.linalg import spsolve
    dims = (V.dim, Q.dim)
    Ah = bmat([[blk.to_scipy().tocsr() if blk is not None else
                csr_matrix((dims[i], dims[j]))
                for j, blk in enumerate(row)] for i, row in enumerate(A)],
              format="lil")
    b_full = np.concatenate(rhs)
    # pin one active pressure dof (pressure defined up to a constant)
    pdof = int(dom_p.active_mask.nonzero()[0][0])
    row = V.dim + pdof
    Ah[row, :] = 0.0
    Ah[row, row] = 1.0
    coords = Q.dof_coordinates[pdof]
    b_full[row] = np.cos(np.pi * coords[0]) * np.sin(np.pi * coords[1])
    sol = spsolve(Ah.tocsr(), b_full)

    import jax.numpy as jnp
    uh = cfx.Function(V)
    uh.x = jnp.asarray(sol[:V.dim])
    ph = cfx.Function(Q)
    ph.x = jnp.asarray(sol[V.dim:])

    eu = CoefficientExpr(uh) - u_ex
    err_u = np.sqrt(max(float(fem.assemble_scalar(
        fem.form(inner(eu, eu) * dxo))), 0.0))
    ep = CoefficientExpr(ph) - p_ex
    err_p = np.sqrt(max(float(fem.assemble_scalar(
        fem.form(ep * ep * dxo))), 0.0))
    return err_u, err_p


def test_cut_stokes_convergence():
    eu_c, ep_c = solve_cut_stokes(16)
    eu_f, ep_f = solve_cut_stokes(32)
    assert np.log2(eu_c / eu_f) > 1.5, (eu_c, eu_f)
    assert eu_f < 5e-2
    assert ep_f < ep_c  # pressure improves under refinement
