"""End-to-end distributed PRODUCTION pipeline (parallel/sgrid.py):
owner-computes per-slab classify -> cut -> quadrature -> element kernels
feeding the distributed stencil/ASM/coarse CG — with NO serial global
operator build — must match the serial production solve.

The reference contract: the solve distributes over the same partition as
the assembly with no serial global stage (assembler.h:614-717 per-rank
element loops feeding demo_poisson.py:52-58 distributed KSP)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cutfemx_tpu import fem
from cutfemx_tpu.parallel import make_device_mesh
from cutfemx_tpu.parallel.sgrid import ShardedStencilProblem
from cutfemx_tpu.parallel.spipeline import cut_poisson_builder
from cutfemx_tpu.stencil import StencilCutOperator, _BUILD_CACHE
from test_sharded_pipeline import _serial_forms, _setup


@pytest.fixture(scope="module")
def problem():
    _BUILD_CACHE.clear()
    mesh, V, phi = _setup(16, 2, "tetrahedron")
    dmesh = make_device_mesh(8)
    prob = ShardedStencilProblem(V, cut_poisson_builder(V, phi), dmesh)
    af, Lf, dom = _serial_forms(mesh, V, phi)
    b = np.array(fem.assemble_vector(Lf))
    b[~dom.active_mask] = 0.0
    op = StencilCutOperator(af, dom)
    return prob, op, af, Lf, dom, b


def test_sgrid_rhs_matches_serial(problem):
    prob, op, af, Lf, dom, b = problem
    b_sh = prob.b_global()
    np.testing.assert_allclose(b_sh, b, rtol=0,
                               atol=1e-12 * max(1.0, abs(b).max()))


def test_sgrid_active_matches_serial(problem):
    prob, op, af, Lf, dom, b = problem
    act_sh = np.zeros(prob.V.dim, bool)
    # owned planes of the sharded active mask -> global
    act_sh = prob.to_global(np.asarray(prob.d_active).astype(np.float64)
                            .reshape(prob.d_active.shape)) > 0
    np.testing.assert_array_equal(act_sh, dom.active_mask)


def test_sgrid_apply_matches_serial(problem):
    prob, op, af, Lf, dom, b = problem
    rng = np.random.default_rng(7)
    for _ in range(2):
        x = rng.standard_normal(op.dim)
        y_se = np.asarray(op(jnp.asarray(x)))
        y_sh = prob.apply_global(x)
        np.testing.assert_allclose(y_sh, y_se, rtol=0,
                                   atol=1e-11 * max(1, abs(y_se).max()))


def test_sgrid_asm_matches_serial(problem):
    """The distributed ASM build (per-slab fold + cube-plane exchange)
    reproduces the serial _asm_blocks_from_fold + finishing exactly."""
    from cutfemx_tpu.stencil import _asm_apply_body
    prob, op, af, Lf, dom, b = problem
    op._ensure_band_fold()
    op._ensure_cube_asm()
    rng = np.random.default_rng(11)
    r = rng.standard_normal(op.dim)
    rg = op.vec_to_grid(jnp.asarray(r))
    zg = _asm_apply_body(op.n, op.N, op.nch, op.table, op._asm_bbox,
                         op._asm_binv, op.active_grid, rg)
    z_se = np.asarray(jnp.where(op.active_grid & _covered_serial(op),
                                zg, rg))[np.asarray(op.dof_to_grid)]
    # distributed ASM-only precond (coarse correction subtracted)
    z2 = prob.precond_global(r)
    zc = _coarse_serial(op, r)
    np.testing.assert_allclose(z2 - zc, z_se, rtol=0,
                               atol=1e-9 * max(1, abs(z_se).max()))


def _covered_serial(op):
    import numpy as np

    import jax.numpy as jnp
    n, N, nch = op.n, op.N, op.nch
    x0, y0, z0, nbx, nby, nbz = op._asm_bbox
    bh = np.asarray(op._asm_binv)
    cov_cubes = np.zeros((n, n, n), bool)
    cov_cubes[x0:x0 + nbx, y0:y0 + nby, z0:z0 + nbz] = \
        np.abs(bh).max(axis=(-1, -2)) > 0
    covered = np.zeros((nch, N, N, N), bool)
    for (ch, (dx, dy, dz)) in op.table:
        covered[ch, dx:dx + n, dy:dy + n, dz:dz + n] |= cov_cubes
    return jnp.asarray(covered.reshape(-1))


def _coarse_serial(op, r):
    """Serial coarse correction on a dof vector."""
    from cutfemx_tpu.stencil import _coarse_apply_body
    import jax.numpy as jnp
    op._ensure_coarse()
    rg = op.vec_to_grid(jnp.asarray(r))
    zg = _coarse_apply_body(op.N, op.nch, op._c_sel, *op._c_W,
                            op._c_acinv, op.active_grid, rg)
    return np.asarray(zg[op.dof_to_grid])


def test_sgrid_coarse_matches_serial(problem):
    """Distributed coarse operator == serial coarse operator (same
    Galerkin congruence, psum-reduced) and the coarse correction
    matches."""
    prob, op, af, Lf, dom, b = problem
    op._ensure_coarse()
    A_se = np.asarray(op._c_acinv)
    A_sh = np.asarray(prob._c_acinv)
    assert A_se.shape == A_sh.shape
    den = np.abs(A_se).max()
    assert np.abs(A_sh - A_se).max() <= 1e-9 * den


def test_sgrid_solve_matches_serial(problem):
    prob, op, af, Lf, dom, b = problem
    x_sh, its, res = prob.solve_cg(rtol=1e-10, maxiter=2000)
    x_se, its_se, res_se = op.solve_cg(jnp.asarray(b), rtol=1e-10,
                                       maxiter=2000, precond="asm2")
    x_se = np.asarray(x_se)
    ref = np.linalg.norm(x_se)
    assert np.linalg.norm(np.asarray(x_sh) - x_se) <= 1e-8 * ref
    # true residual of the distributed solution through the SERIAL apply
    r = np.asarray(op(jnp.asarray(np.asarray(x_sh)))) - b
    r[~dom.active_mask] = 0.0
    assert np.linalg.norm(r) <= 1e-8 * np.linalg.norm(b)


def test_sgrid_moving_domain_recut_n24():
    """Distributed MOVING-DOMAIN step at n=24 (8 slabs x 3 cube planes
    each): move phi, re-cut, re-assemble, re-solve through
    ShardedStencilProblem, matching the serial production step — the
    regime the reference runs under MPI (demo_moving_poisson.py:57-90
    re-cut loop). Also exercises the verified-reuse build cache across
    the move: the moved cut must NOT adopt the previous stages, and an
    identical repeat step must adopt them."""
    _BUILD_CACHE.clear()
    mesh, V, phi = _setup(24, 2, "tetrahedron", r=0.46)
    dmesh = make_device_mesh(8)

    def serial_op():
        af, Lf, dom = _serial_forms(mesh, V, phi)
        b = np.array(fem.assemble_vector(Lf))
        b[~dom.active_mask] = 0.0
        return StencilCutOperator(af, dom), b, dom

    # step 1 (r=0.46): distributed apply parity + populate the build cache
    prob1 = ShardedStencilProblem(V, cut_poisson_builder(V, phi), dmesh)
    op1, b1, dom1 = serial_op()
    rng = np.random.default_rng(3)
    xr = rng.standard_normal(op1.dim)
    y_se = np.asarray(op1(jnp.asarray(xr)))
    np.testing.assert_allclose(prob1.apply_global(xr), y_se, rtol=0,
                               atol=1e-11 * max(1.0, np.abs(y_se).max()))
    op1._ensure_cube_asm()
    assert op1._cache_adoptable("asm")

    # move the level set -> re-cut -> re-assemble -> re-solve
    phi.interpolate(
        lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2 + x[2] ** 2) - 0.52)
    prob2 = ShardedStencilProblem(V, cut_poisson_builder(V, phi), dmesh)
    x_sh, its, res = prob2.solve_cg(rtol=1e-8, maxiter=2000)
    op2, b2, dom2 = serial_op()
    # the moved cut changes the build inputs bitwise: no stale adoption
    assert not op2._cache_adoptable("asm")
    x_se, _, _ = op2.solve_cg(jnp.asarray(b2), rtol=1e-8, maxiter=2000,
                              precond="asm2")
    x_se = np.asarray(x_se)
    ref = np.linalg.norm(x_se)
    assert np.linalg.norm(np.asarray(x_sh) - x_se) <= 1e-7 * ref
    r = np.asarray(op2(jnp.asarray(np.asarray(x_sh)))) - b2
    r[~dom2.active_mask] = 0.0
    assert np.linalg.norm(r) <= 1e-7 * np.linalg.norm(b2)

    # identical repeat step (fixed cut): a fresh operator ADOPTS the
    # cached stages and reproduces the solve
    op3, b3, dom3 = serial_op()
    assert op3._cache_adoptable("asm")
    x3, _, _ = op3.solve_cg(jnp.asarray(b3), rtol=1e-8, maxiter=2000,
                            precond="asm2")
    assert np.linalg.norm(np.asarray(x3) - x_se) <= 1e-10 * ref
