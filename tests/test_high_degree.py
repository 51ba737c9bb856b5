"""Arbitrary-degree continuous Lagrange spaces (face-orientation
permutations). The reference gets any-degree dofmaps from Basix/DOLFINx
(SURVEY.md L1); rounds 1-2 capped continuous spaces at P3 tets / P2
hexes because faces with >1 interior dof need cross-cell orientation
permutations. These tests pin the permutation logic:

- interpolating a degree-p polynomial must reproduce it EXACTLY when
  evaluated per cell through the dofmap (any cross-face slot mismatch
  puts a wrong coefficient in one of the two adjacent cells),
- an L2 projection (mass solve) of polynomial data must hit machine eps,
- full-mesh stiffness assembly must stay symmetric with the correct
  kernel (constants) for every degree.
"""

import numpy as np

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.elements import lagrange_element
from cutfemx_tpu.forms.dsl import TestFunction, TrialFunction, grad, inner
from cutfemx_tpu.forms.measure import dx


def _poly(p):
    def f(x):
        return (x[0] ** p + 2.0 * x[1] ** (p - 1) * x[0]
                + 0.5 * x[2] ** p - x[0] * x[1] * x[2])
    return f


def _eval_per_cell(V, vec, pts_ref):
    """Evaluate a coefficient vector at reference points in EVERY cell
    through the dofmap — each shared dof is read by all adjacent cells,
    so one misoriented face slot shows up as a jump."""
    mesh = V.mesh
    phi = np.asarray(V.element.tabulate(pts_ref))          # (np, nd)
    geo = lagrange_element(mesh.cell_type, 1)
    w = np.asarray(geo.tabulate(pts_ref))                  # (np, nvert)
    xs = np.einsum("pk,ckg->cpg", w, mesh.cell_vertex_coords)
    vals = np.asarray(vec)[V.dofmap] @ phi.T               # (NC, np)
    return xs, vals


def _check_exact_interpolation(mesh, p):
    V = cfx.functionspace(mesh, ("Lagrange", p))
    f = _poly(p)
    u = cfx.Function(V)
    u.interpolate(f)
    rng = np.random.default_rng(3)
    pts = rng.random((6, 3))
    if mesh.cell_type == "tetrahedron":
        pts = pts / pts.sum(axis=1, keepdims=True) * \
            rng.random((6, 1)) * 0.95
    # include points ON each facet so face dofs are exercised hard
    cell = mesh.ref_cell
    fpts = []
    for fverts in cell.facets:
        vs = cell.vertices[np.asarray(fverts)]
        lam = rng.random((2, len(fverts)))
        lam /= lam.sum(axis=1, keepdims=True)
        fpts.append(lam @ vs)
    pts = np.concatenate([pts] + fpts)
    xs, vals = _eval_per_cell(V, u.x, pts)
    exact = f(np.moveaxis(xs, -1, 0))
    err = np.abs(vals - exact).max()
    assert err < 5e-10 * max(1.0, np.abs(exact).max()), (p, err)


def test_p4_tet_interpolation_exact():
    mesh = cfx.mesh.create_box((0, 0, 0), (1, 1, 1), (2, 2, 2))
    _check_exact_interpolation(mesh, 4)


def test_p5_tet_interpolation_exact():
    mesh = cfx.mesh.create_box((0, 0, 0), (1, 1, 1), (2, 2, 2))
    _check_exact_interpolation(mesh, 5)


def test_p3_hex_interpolation_exact():
    mesh = cfx.mesh.create_box((0, 0, 0), (1, 1, 1), (2, 2, 2),
                               cell_type="hexahedron")
    _check_exact_interpolation(mesh, 3)


def test_p4_hex_interpolation_exact():
    mesh = cfx.mesh.create_box((0, 0, 0), (1, 1, 1), (2, 2, 2),
                               cell_type="hexahedron")
    _check_exact_interpolation(mesh, 4)


def test_p4_tet_l2_projection_machine_eps():
    mesh = cfx.mesh.create_box((0, 0, 0), (1, 1, 1), (2, 2, 2))
    V = cfx.functionspace(mesh, ("Lagrange", 4))
    u, v = TrialFunction(V), TestFunction(V)
    M = fem.assemble_matrix(fem.form(u * v * dx)).to_scipy().tocsr()
    f = _poly(4)
    uf = cfx.Function(V)
    uf.interpolate(f)
    # M is SPD; projection of an exactly-representable function returns
    # its interpolant: solve M x = M u_I
    from scipy.sparse.linalg import spsolve
    x = spsolve(M, M @ np.asarray(uf.x))
    assert np.abs(x - np.asarray(uf.x)).max() < 1e-8


def test_p4_stiffness_annihilates_constants_and_linears():
    mesh = cfx.mesh.create_box((0, 0, 0), (1, 1, 1), (2, 2, 2))
    V = cfx.functionspace(mesh, ("Lagrange", 4))
    u, v = TrialFunction(V), TestFunction(V)
    A = fem.assemble_matrix(
        fem.form(inner(grad(u), grad(v)) * dx)).to_scipy().tocsr()
    ones = np.ones(V.dim)
    assert np.abs(A @ ones).max() < 1e-10
    # rows sum against a linear: A x_h has zero interior rows only if the
    # dofmap stitched faces correctly (gradient of the interpolant of a
    # linear is globally constant)
    lin = cfx.Function(V)
    lin.interpolate(lambda x: x[0] + 2 * x[1] - x[2])
    r = A @ np.asarray(lin.x)
    # interior dofs (coords strictly inside) must get ~0
    c = V.dof_coordinates
    interior = ((c > 1e-9) & (c < 1 - 1e-9)).all(axis=1)
    assert np.abs(r[interior]).max() < 1e-9
    assert np.abs(A - A.T).max() < 1e-12
