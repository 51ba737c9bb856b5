"""Monolithic mixed-space assembly (fem.form on MixedFunctionSpace
arguments without extract_blocks) — the reference's UFL-mixed + PETSc-nest
role (petsc.py:330-344). The monolithic matrix/vector must equal the
block-composed ones exactly."""

import numpy as np
import pytest
import scipy.sparse as sps

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (MixedFunctionSpace, SpatialCoordinate,
                                   TestFunctions, TrialFunctions, div, grad,
                                   inner, pi, sin)
from cutfemx_tpu.forms.measure import Measure


def _stokes_forms(n=8):
    mesh = cfx.mesh.create_rectangle((0., 0.), (1., 1.), (n, n), "triangle")
    V = cfx.functionspace(mesh, ("Lagrange", 2), shape=(2,))
    Q = cfx.functionspace(mesh, ("Lagrange", 1))
    W = MixedFunctionSpace(V, Q)
    u, p = TrialFunctions(W)
    v, q = TestFunctions(W)
    dx = Measure("dx", domain=mesh)
    x = SpatialCoordinate(mesh)
    a = (inner(grad(u), grad(v)) - p * div(v) + div(u) * q) * dx
    f0 = sin(pi * x[0]) * sin(pi * x[1])
    L = (f0 * v[0] + f0 * v[1]) * dx
    return mesh, V, Q, a, L


def test_monolithic_matrix_equals_block_composition():
    mesh, V, Q, a, L = _stokes_forms()
    af = fem.form(a)
    assert isinstance(af, fem.MixedCutForm)
    assert af.rank == 2
    A_mono = fem.assemble_matrix(af).to_scipy().tocsr()

    ab = fem.extract_blocks(a)
    dims = (V.dim, Q.dim)
    A_blk = sps.bmat(
        [[fem.assemble_matrix(b).to_scipy().tocsr() if b is not None
          else sps.csr_matrix((dims[i], dims[j]))
          for j, b in enumerate(row)] for i, row in enumerate(ab)],
        format="csr")
    assert A_mono.shape == (V.dim + Q.dim, V.dim + Q.dim)
    assert abs(A_mono - A_blk).max() == 0.0


def test_monolithic_vector_equals_block_composition():
    mesh, V, Q, a, L = _stokes_forms()
    Lf = fem.form(L)
    b_mono = np.asarray(fem.assemble_vector(Lf))
    Lb = fem.extract_blocks(L)
    assert len(Lb) == 1  # only the velocity part appears in L
    b_blk = np.concatenate(
        [np.asarray(fem.assemble_vector(Lb[0])), np.zeros(Q.dim)])
    assert b_mono.shape == (V.dim + Q.dim,)
    assert np.array_equal(b_mono, b_blk)


def test_monolithic_active_domain_and_deactivation():
    mesh, V, Q, a, L = _stokes_forms()
    af = fem.form(a)
    dom = fem.active_domain(af)
    assert dom.active_mask.shape == (V.dim + Q.dim,)
    # fitted problem: everything active
    assert dom.active_mask.all()
    assert dom.sub(0).function_space is V

    A = fem.assemble_matrix(af)
    b = np.array(fem.assemble_vector(fem.form(L)))
    fem.deactivate_outside(A, b, dom)  # no-op here, but must not raise


def test_monolithic_cut_stokes_solves():
    """End-to-end: the cut Stokes demo flow through the monolithic path
    produces the same errors as the block path in test_stokes.py."""
    from cutfemx_tpu.forms.dsl import (CellDiameter, CoefficientExpr,
                                       FacetNormal, as_vector, avg, cos,
                                       dot, jump)
    n = 16
    nu, gamma_u, gamma_g, gamma_p = 1.0, 10.0, 0.1, 0.1
    mesh = cfx.mesh.create_rectangle((-1., -1.), (1., 1.), (n, n),
                                     "triangle")
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2) - 0.71)
    cd = cfx.cut(phi)
    fluid = cfx.locate_entities(cd, "phi<0")
    rules = cfx.runtime_quadrature(cd, "phi<0", 4)
    irules = cfx.runtime_quadrature(cd, "phi=0", 4)
    gp = cfx.ghost_penalty_facets(cd, "phi<0")
    cut_cells = cfx.locate_entities(cd, "phi=0")
    band = np.union1d(fluid, cut_cells)
    p_facets = cfx.interior_facets_for_cells(mesh, band)
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
    u_ex = as_vector([pi * sin(pi * x[0]) * cos(pi * x[1]),
                      -pi * cos(pi * x[0]) * sin(pi * x[1])])
    f = as_vector([
        2 * nu * pi ** 2 * pi * sin(pi * x[0]) * cos(pi * x[1])
        - pi * sin(pi * x[0]) * sin(pi * x[1]),
        -2 * nu * pi ** 2 * pi * cos(pi * x[0]) * sin(pi * x[1])
        + pi * cos(pi * x[0]) * cos(pi * x[1])])
    ng = cfx.normal(phi)
    nf = FacetNormal(mesh)
    h = CellDiameter(mesh)

    def traction(w, r):
        return nu * dot(grad(w), ng) - r * ng

    a = nu * inner(grad(u), grad(v)) * dxo
    a += -p * div(v) * dxo + div(u) * q * dxo
    a += -inner(traction(u, p), v) * dxg
    a += -inner(traction(v, q), u) * dxg
    a += gamma_u * nu / h * inner(u, v) * dxg
    if gp.size:
        a += gamma_g * avg(h) * inner(jump(grad(u), nf),
                                      jump(grad(v), nf)) * dSg
    a += gamma_p * avg(h) ** 3 * inner(jump(grad(p), nf),
                                       jump(grad(q), nf)) * dSp
    L = inner(f, v) * dxo
    L += -inner(traction(v, q), u_ex) * dxg
    L += gamma_u * nu / h * inner(u_ex, v) * dxg

    af, Lf = fem.form(a), fem.form(L)
    A = fem.assemble_matrix(af)
    b = np.array(fem.assemble_vector(Lf))
    dom = fem.active_domain(af)
    fem.deactivate_outside(A, b, dom)
    # pin one active pressure dof
    pdof = int(dom.sub(1).active_mask.nonzero()[0][0])
    row = V.dim + pdof
    fem.zero_rows(A, np.array([row]))
    fem.insert_diagonal(A, np.array([row]), 1.0)
    coords = Q.dof_coordinates[pdof]
    b[row] = np.cos(np.pi * coords[0]) * np.sin(np.pi * coords[1])

    from scipy.sparse.linalg import spsolve
    sol = spsolve(A.to_scipy().tocsc(), b)
    import jax.numpy as jnp
    uh = cfx.Function(V)
    uh.x = jnp.asarray(sol[:V.dim])
    eu = CoefficientExpr(uh) - u_ex
    err_u = float(np.sqrt(max(float(fem.assemble_scalar(
        fem.form(inner(eu, eu) * dxo))), 0.0)))
    # P1 velocity on n=16: coarse but must be clearly converging
    assert err_u < 0.6, err_u
