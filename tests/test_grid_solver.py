"""Distributed grid-layout stencil solver: the single-chip headline
solver (interior stencil + element band + cube-ASM) sharded over a
virtual 8-device mesh, matching the serial operator exactly.

Mirrors the reference's solve-distribution contract: PETSc KSP runs over
the same MPI partition as the assembly (demo_poisson.py:52-58)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cutfemx_tpu import fem
from cutfemx_tpu.parallel import make_device_mesh
from cutfemx_tpu.parallel.gridsolver import ShardedStencilSolver
from cutfemx_tpu.stencil import StencilCutOperator, _asm_apply_body
from test_sharded_pipeline import _serial_forms, _setup


@pytest.fixture(scope="module")
def problem():
    mesh, V, phi = _setup(16, 2, "tetrahedron")
    af, Lf, dom = _serial_forms(mesh, V, phi)
    b = np.array(fem.assemble_vector(Lf))
    b[~dom.active_mask] = 0.0
    op = StencilCutOperator(af, dom)
    op._ensure_cube_asm()
    dmesh = make_device_mesh(8)
    slv = ShardedStencilSolver(op, dmesh)
    return op, slv, b, dom


def test_sharded_grid_apply_matches_serial(problem):
    op, slv, b, dom = problem
    rng = np.random.default_rng(7)
    for _ in range(2):
        x = rng.standard_normal(op.dim)
        y_se = np.asarray(op(jnp.asarray(x)))
        y_sh = slv.apply_global(x)
        np.testing.assert_allclose(y_sh, y_se, rtol=0,
                                   atol=1e-11 * max(1, abs(y_se).max()))


def test_sharded_grid_precond_matches_serial(problem):
    op, slv, b, dom = problem
    rng = np.random.default_rng(11)
    r = rng.standard_normal(op.dim)
    rg = op.vec_to_grid(jnp.asarray(r))
    zg = _asm_apply_body(op.n, op.N, op.nch, op.table, op._asm_bbox,
                         op._asm_binv, op.active_grid, rg)
    z_se = np.asarray(zg[op.dof_to_grid])
    z_sh = slv.precond_global(r)
    np.testing.assert_allclose(z_sh, z_se, rtol=0,
                               atol=1e-11 * max(1, abs(z_se).max()))


def test_sharded_grid_solve_matches_serial(problem):
    op, slv, b, dom = problem
    x_sh, its, res = slv.solve_cg(b, rtol=1e-10, maxiter=2000)
    x_se, its_se, res_se = op.solve_cg(b, rtol=1e-10, maxiter=2000,
                                       precond="asm")
    x_se = np.asarray(x_se)
    act = dom.active_mask
    err = (np.linalg.norm((x_sh - x_se)[act])
           / np.linalg.norm(x_se[act]))
    assert err < 1e-8, (err, its, its_se)
    # distributed iteration count stays in the serial ballpark (same
    # preconditioner; restart structure differs)
    assert its <= 2 * max(int(its_se), 1) + 10
