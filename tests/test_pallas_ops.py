"""Banded-ELL Pallas SpMV: RCM reordering bounds the bandwidth and the
operator matches the CSR product exactly (reference path on CPU; the
Pallas kernel itself runs on TPU)."""

import numpy as np

import jax.numpy as jnp

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import TestFunction, TrialFunction, grad, inner
from cutfemx_tpu.forms.measure import dx
from cutfemx_tpu.pallas_ops import BandedEllOperator, rcm_permutation


def _stiffness(n, deg=2):
    mesh = cfx.mesh.create_unit_square(n)
    V = cfx.functionspace(mesh, ("Lagrange", deg))
    u, v = TrialFunction(V), TestFunction(V)
    A = fem.assemble_matrix(fem.form(inner(grad(u), grad(v)) * dx
                                     + u * v * dx))
    return A, V


def test_rcm_bounds_bandwidth():
    A, V = _stiffness(16)
    m = A.to_scipy().tocsr()
    perm, iperm = rcm_permutation(m)
    mp = m[perm][:, perm].tocoo()
    band = np.abs(mp.row - mp.col).max()
    # natural ordering bandwidth vs RCM
    nat = m.tocoo()
    band_nat = np.abs(nat.row - nat.col).max()
    assert band <= band_nat
    assert band < 4 * (2 * 16 + 2)  # O(sqrt(n)) band for a 2D grid


def test_banded_ell_matches_csr():
    A, V = _stiffness(12)
    op = BandedEllOperator(A, block_rows=64, interpret=True)
    rng = np.random.default_rng(0)
    for _ in range(3):
        x = jnp.asarray(rng.standard_normal(V.dim))
        y_ref = A.to_scipy() @ np.asarray(x)
        y = np.asarray(op(x))
        assert np.abs(y - y_ref).max() < 1e-11 * np.abs(y_ref).max()
    assert op.bandwidth >= 1
