"""Linear algebra: CSR matrices, Krylov solvers, preconditioners.

Replaces the DOLFINx la::MatrixCSR / PETSc role (SURVEY.md L1 and
/root/reference/python/cutfemx/petsc.py). The CSR wrapper is host-backed
(SciPy) for oracle tests and direct solves; the performance path is the
matrix-free ``CutOperator`` in ``fem.py`` driving the jitted CG below.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["MatrixCSR", "cg", "bicgstab", "direct_solve"]


class MatrixCSR:
    """CSR matrix wrapper with the subset of the DOLFINx la.MatrixCSR API
    the reference's demos/tests rely on (to_scipy, to_dense,
    scatter_reverse)."""

    def __init__(self, sp_matrix):
        import scipy.sparse as sps
        self._m = sps.csr_matrix(sp_matrix)

    @classmethod
    def from_coo(cls, rows, cols, vals, shape):
        import scipy.sparse as sps
        m = sps.coo_matrix((np.asarray(vals), (np.asarray(rows),
                                               np.asarray(cols))),
                           shape=shape).tocsr()
        return cls(m)

    @property
    def shape(self):
        return self._m.shape

    def to_scipy(self):
        return self._m

    def to_dense(self):
        return self._m.toarray()

    def scatter_reverse(self):
        """Ghost accumulation — single-process no-op (the reference calls
        A.scatter_reverse() after assembly, demo_poisson.py:52)."""

    def matvec(self, x):
        return self._m @ np.asarray(x)

    def diagonal(self):
        return self._m.diagonal()

    def zero_rows(self, rows, diag=1.0):
        """Zero the given rows and set ``diag`` on the diagonal (the role of
        /root/reference/cpp/cutfemx/fem/deactivate.h:265-320 zero_rows +
        set_diagonal)."""
        import scipy.sparse as sps
        rows = np.asarray(rows, dtype=np.int64)
        if rows.size == 0:
            return
        m = self._m.tocsr()
        # zero the stored entries of the selected rows in-place on the CSR
        # data (scipy lil fancy assignment would materialize a dense block)
        sel = np.zeros(m.shape[0], dtype=bool)
        sel[rows] = True
        row_ids = np.repeat(np.arange(m.shape[0]),
                            np.diff(m.indptr))
        m.data[sel[row_ids]] = 0.0
        m.eliminate_zeros()
        if diag != 0.0:
            if m.shape[0] != m.shape[1]:
                raise ValueError(
                    "cannot set a diagonal on a non-square block")
            d = sps.coo_matrix((np.full(len(rows), diag), (rows, rows)),
                               shape=m.shape)
            m = (m + d).tocsr()
        self._m = m

    def __matmul__(self, x):
        return self._m @ x


# -- Krylov solvers (pure JAX, jittable, matrix-free) ------------------------


def cg_init(operator, b, x0=None, M=None):
    """Initial PCG state (x, r, p, rz, it) and squared rhs norm."""
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    if M is None:
        def M(r):
            return r
    r = b - operator(x)
    z = M(r)
    rz = jnp.vdot(r, z).real
    return (x, r, z, rz, jnp.zeros((), jnp.int32)), jnp.vdot(b, b).real


def cg_resume(operator, state, M, tol2, it_cap):
    """Continue PCG from ``state`` until ||r||^2 <= tol2 or it >= it_cap
    (one lax.while_loop; tol2/it_cap may be traced scalars)."""
    if M is None:
        def M(r):
            return r

    def cond(s):
        x, r, p, rz, it = s
        # rz > 0 is a finite-precision breakdown guard: in exact
        # arithmetic (r, M^-1 r) stays positive, and once it is not, the
        # recurrence can only produce garbage (NaN x within a few steps)
        return (jnp.vdot(r, r).real > tol2) & (it < it_cap) & (rz > 0)

    def body(s):
        x, r, p, rz, it = s
        Ap = operator(p)
        alpha = rz / jnp.vdot(p, Ap).real
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.vdot(r, z).real
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, p, rz_new, it + 1)

    return jax.lax.while_loop(cond, body, state)


def cg(operator, b, x0=None, M=None, rtol=1e-10, atol=0.0, maxiter=1000):
    """Preconditioned conjugate gradients.

    operator: callable x -> A@x (linear, SPD). M: callable r -> M^{-1} r.
    Runs as a lax.while_loop; returns (x, iterations, residual_norm).
    """
    state, bb = cg_init(operator, b, x0=x0, M=M)
    tol2 = jnp.maximum(rtol * jnp.sqrt(bb), atol) ** 2
    x, r, p, rz, it = cg_resume(operator, state, M, tol2, maxiter)
    return x, it, jnp.linalg.norm(r)


def power_iteration_lmax(operator, d, n, iters=15, key_dim_probe=None):
    """Estimate the largest eigenvalue of D^{-1/2} A D^{-1/2} by power
    iteration (jittable; used to target the Chebyshev interval)."""
    x = jnp.sin(jnp.arange(n, dtype=d.dtype) + 1.0)  # deterministic seed
    dinv_sqrt = 1.0 / jnp.sqrt(jnp.maximum(d, 1e-30))

    def body(_, x):
        y = dinv_sqrt * operator(dinv_sqrt * x)
        return y / jnp.linalg.norm(y)

    x = jax.lax.fori_loop(0, iters, body, x / jnp.linalg.norm(x))
    y = dinv_sqrt * operator(dinv_sqrt * x)
    return jnp.vdot(x, y).real


def chebyshev_preconditioner(operator, d, lmax, degree=4, lmin_frac=0.06):
    """Chebyshev polynomial of the Jacobi-scaled operator targeting
    [lmin_frac*lmax, 1.1*lmax]. As a standalone CG preconditioner this
    cannot beat CG's own optimal polynomial — it exists as the high-mode
    smoother for the (planned) multigrid hierarchy."""
    lo = lmin_frac * lmax
    hi = 1.1 * lmax
    theta = 0.5 * (hi + lo)
    delta = 0.5 * (hi - lo)
    dinv = 1.0 / jnp.maximum(d, 1e-30)

    def M(r):
        # standard Chebyshev iteration for A z = r, z0 = 0
        z = jnp.zeros_like(r)
        p = jnp.zeros_like(r)
        alpha = jnp.asarray(0.0, r.dtype)
        for k in range(degree):
            resid = dinv * (r - operator(z))
            if k == 0:
                p = resid
                alpha = 1.0 / theta
            elif k == 1:
                beta = 0.5 * (delta * alpha) ** 2
                alpha = 1.0 / (theta - beta / alpha)
                p = resid + beta * p
            else:
                beta = (delta * alpha / 2.0) ** 2
                alpha = 1.0 / (theta - beta / alpha)
                p = resid + beta * p
            z = z + alpha * p
        return z

    return M


def bicgstab(operator, b, x0=None, M=None, rtol=1e-10, maxiter=1000):
    """BiCGStab for nonsymmetric operators (jittable)."""
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    if M is None:
        def M(r):
            return r
    r = b - operator(x)
    rhat = r
    rho = alpha = omega = jnp.ones((), b.dtype)
    v = p = jnp.zeros_like(b)
    bnorm = jnp.linalg.norm(b)
    tol2 = (rtol * bnorm) ** 2

    def cond(state):
        x, r, p, v, rho, alpha, omega, it = state
        return (jnp.vdot(r, r).real > tol2) & (it < maxiter)

    def body(state):
        x, r, p, v, rho, alpha, omega, it = state
        rho_new = jnp.vdot(rhat, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        phat = M(p)
        v = operator(phat)
        alpha = rho_new / jnp.vdot(rhat, v)
        s = r - alpha * v
        shat = M(s)
        t = operator(shat)
        omega = jnp.vdot(t, s) / jnp.vdot(t, t)
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        return (x, r, p, v, rho_new, alpha, omega, it + 1)

    state = (x, r, p, v, rho, alpha, omega, 0)
    x, r, *_, it = jax.lax.while_loop(cond, body, state)
    return x, it, jnp.linalg.norm(r)


def direct_solve(A, b):
    """Host direct solve (SciPy spsolve), the role of the reference demos'
    serial SciPy path (demo_poisson.py:48-58)."""
    from scipy.sparse.linalg import spsolve
    m = A.to_scipy() if isinstance(A, MatrixCSR) else A
    return spsolve(m.tocsr(), np.asarray(b))
