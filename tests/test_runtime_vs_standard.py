"""Oracle pattern #1: full-mesh runtime assembly must equal standard
assembly to near machine precision (mirrors
/root/reference/python/tests/test_assembly_poisson.py:18-59,
test_assembly_stokes.py:34, test_assembly_elasticity.py:18)."""

import numpy as np
import pytest

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.cut.quadrature import full_cell_rules
from cutfemx_tpu.forms.dsl import (Identity, TestFunction, TrialFunction,
                                   div, grad, inner, sym, tr)
from cutfemx_tpu.forms.measure import Measure, dx
from cutfemx_tpu.mesh import create_unit_cube, create_unit_square


def _compare(mesh, a_of, spaces, order):
    """Assemble a(u, v) standard vs runtime-full-mesh, compare."""
    rules = full_cell_rules(mesh, np.arange(mesh.num_cells), order)
    dxr = Measure("dx", domain=mesh, subdomain_data=rules,
                  metadata={"quadrature_degree": order})
    dxs = Measure("dx", domain=mesh,
                  metadata={"quadrature_degree": order})
    U, V = spaces
    u, v = TrialFunction(U), TestFunction(V)
    A_std = fem.assemble_matrix(fem.form(a_of(u, v) * dxs)).to_dense()
    A_rt = fem.assemble_matrix(fem.form(a_of(u, v) * dxr)).to_dense()
    scale = max(np.abs(A_std).max(), 1.0)
    assert np.abs(A_rt - A_std).max() < 1e-12 * scale


@pytest.mark.parametrize("cell,n", [("triangle", 4), ("quadrilateral", 3),
                                    ("tetrahedron", 2), ("hexahedron", 2)])
@pytest.mark.parametrize("deg", [1, 2])
def test_poisson_runtime_equals_standard(cell, n, deg):
    mesh = (create_unit_square(n, cell) if cell in
            ("triangle", "quadrilateral") else create_unit_cube(n, cell))
    V = cfx.functionspace(mesh, ("Lagrange", deg))
    # tensor-product bases have per-axis degree `deg`: simplex-split runtime
    # rules need total-degree 2*deg*tdim to integrate their products exactly
    order = 2 * deg * (mesh.tdim if cell in ("quadrilateral", "hexahedron")
                       else 1)
    _compare(mesh, lambda u, v: inner(grad(u), grad(v)) + u * v, (V, V),
             order)


def test_elasticity_runtime_equals_standard():
    mesh = create_unit_square(3)
    V = cfx.functionspace(mesh, ("Lagrange", 2), shape=(2,))
    mu, lam = 1.0, 1.3

    def a(u, v):
        eps_u, eps_v = sym(grad(u)), sym(grad(v))
        sigma = 2 * mu * eps_u + lam * tr(eps_u) * Identity(2)
        return inner(sigma, eps_v)

    _compare(mesh, a, (V, V), 4)


def test_stokes_blocks_runtime_equals_standard():
    mesh = create_unit_square(3)
    V = cfx.functionspace(mesh, ("Lagrange", 2), shape=(2,))
    Q = cfx.functionspace(mesh, ("Lagrange", 1))
    _compare(mesh, lambda u, v: inner(grad(u), grad(v)), (V, V), 4)
    # mixed block B(p, v) = -div(v) p  (trial p in Q, test v in V)
    _compare(mesh, lambda p, v: -div(v) * p, (Q, V), 3)
    _compare(mesh, lambda u, q: -div(u) * q, (V, Q), 3)


def test_vector_rhs_runtime_equals_standard():
    from cutfemx_tpu.forms.dsl import SpatialCoordinate, as_vector
    mesh = create_unit_square(3)
    V = cfx.functionspace(mesh, ("Lagrange", 2), shape=(2,))
    rules = full_cell_rules(mesh, np.arange(mesh.num_cells), 4)
    dxr = Measure("dx", domain=mesh, subdomain_data=rules,
                  metadata={"quadrature_degree": 4})
    dxs = Measure("dx", metadata={"quadrature_degree": 4}, domain=mesh)
    v = TestFunction(V)
    x = SpatialCoordinate(mesh)
    f = as_vector([x[0] * x[1], x[0] ** 2])
    b_std = np.asarray(fem.assemble_vector(fem.form(inner(f, v) * dxs)))
    b_rt = np.asarray(fem.assemble_vector(fem.form(inner(f, v) * dxr)))
    assert np.abs(b_std - b_rt).max() < 1e-13


def test_newton_pullback_hex_interior_facets():
    """Interior-facet assembly on hex meshes uses the Newton pullback for
    the '-' side; jump-jump matrices stay symmetric and annihilate
    global linears (the invariant that holds for any conforming mesh)."""
    from cutfemx_tpu.forms.dsl import (CellDiameter, FacetNormal, avg,
                                       jump)
    from cutfemx_tpu.forms.measure import dS
    mesh = create_unit_cube(2, "hexahedron")
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    u, v = TrialFunction(V), TestFunction(V)
    nf = FacetNormal(mesh)
    h = CellDiameter(mesh)
    G = fem.assemble_matrix(fem.form(
        avg(h) * inner(jump(grad(u), nf), jump(grad(v), nf)) * dS)
    ).to_dense()
    assert np.allclose(G, G.T, atol=1e-12)
    c = V.dof_coordinates
    lin = 1.0 + 2 * c[:, 0] - c[:, 1] + 0.5 * c[:, 2]
    assert np.abs(G @ lin).max() < 1e-10
    # plain jump continuity: CG functions have zero jumps
    J = fem.assemble_matrix(fem.form(jump(u) * jump(v) * dS)).to_dense()
    assert np.abs(J).max() < 1e-14


def test_newton_pullback_accuracy():
    """pullback on a distorted hex recovers reference points exactly."""
    from cutfemx_tpu.geometry import pullback, pushforward
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    base = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
                     [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]], float)
    coords = jnp.asarray(base + 0.15 * rng.standard_normal((8, 3)))
    ref = jnp.asarray(rng.uniform(0.1, 0.9, (20, 3)))
    phys = pushforward("hexahedron", coords, ref)
    back = pullback("hexahedron", coords, phys)
    assert np.abs(np.asarray(back - ref)).max() < 1e-12
