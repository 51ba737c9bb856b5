"""Complex-scalar runtime assembly (mirrors
/root/reference/python/tests/test_complex_assembly.py:51): assembling with
complex dtype on full-mesh runtime rules equals the standard assembly, and
complex coefficients flow through the kernels."""

import numpy as np

import jax.numpy as jnp

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.cut.quadrature import full_cell_rules
from cutfemx_tpu.forms.dsl import (CoefficientExpr, TestFunction,
                                   TrialFunction, grad, inner)
from cutfemx_tpu.forms.measure import Measure
from cutfemx_tpu.mesh import create_unit_square


def test_complex_mass_helmholtz():
    mesh = create_unit_square(4)
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    u, v = TrialFunction(V), TestFunction(V)
    dxs = Measure("dx", domain=mesh, metadata={"quadrature_degree": 2})

    # Helmholtz-like bilinear form with a complex shift
    k2 = 1.0 + 2.0j
    a = inner(grad(u), grad(v)) * dxs - k2 * u * v * dxs
    A = fem.assemble_matrix(fem.form(a, dtype=jnp.complex128)).to_dense()
    # real/imag parts match separately assembled real forms
    Ar = fem.assemble_matrix(fem.form(
        inner(grad(u), grad(v)) * dxs - 1.0 * u * v * dxs)).to_dense()
    Ai = fem.assemble_matrix(fem.form(-2.0 * u * v * dxs)).to_dense()
    assert np.allclose(A.real, Ar, atol=1e-13)
    assert np.allclose(A.imag, Ai, atol=1e-13)


def test_complex_runtime_equals_standard():
    mesh = create_unit_square(3)
    V = cfx.functionspace(mesh, ("Lagrange", 2))
    u, v = TrialFunction(V), TestFunction(V)
    rules = full_cell_rules(mesh, np.arange(mesh.num_cells), 4)
    dxr = Measure("dx", domain=mesh, subdomain_data=rules,
                  metadata={"quadrature_degree": 4})
    dxs = Measure("dx", domain=mesh, metadata={"quadrature_degree": 4})
    f = cfx.Function(V, dtype=jnp.complex128)
    f.x = jnp.asarray(np.random.default_rng(0).standard_normal(V.dim)
                      + 1j * np.random.default_rng(1).standard_normal(
                          V.dim))
    c = CoefficientExpr(f)
    a_std = fem.form(c * u * v * dxs, dtype=jnp.complex128)
    a_rt = fem.form(c * u * v * dxr, dtype=jnp.complex128)
    A_std = fem.assemble_matrix(a_std).to_dense()
    A_rt = fem.assemble_matrix(a_rt).to_dense()
    assert np.abs(A_std - A_rt).max() < 1e-12
    # complex rank-1 and rank-0 paths
    b = np.asarray(fem.assemble_vector(
        fem.form(c * v * dxr, dtype=jnp.complex128)))
    s = complex(fem.assemble_scalar(fem.form(c * dxr,
                                             dtype=jnp.complex128)))
    b_std = np.asarray(fem.assemble_vector(
        fem.form(c * v * dxs, dtype=jnp.complex128)))
    assert np.abs(b - b_std).max() < 1e-13
    assert abs(s - complex(fem.assemble_scalar(
        fem.form(c * dxs, dtype=jnp.complex128)))) < 1e-13
