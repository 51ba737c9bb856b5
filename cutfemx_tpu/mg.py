"""Geometric-Galerkin multigrid preconditioning for cut problems.

The solver technology the 10M-dof target needs (BASELINE.json): CG with
plain Jacobi needs O(h^-1) iterations; a V-cycle preconditioner makes the
count mesh-independent. Design (cf. the CutFEM-multigrid literature, e.g.
arXiv:2508.11608 referenced in PAPERS.md):

- transfers exploit the structured background lattice of create_box /
  create_rectangle meshes: every fine vertex value is a 2^|S|-corner
  average of its enclosing coarse sub-cube (|S| = axes with half-offset;
  for Freudenthal tet meshes the min->max diagonal convention makes this
  exactly P1 interpolation), and P2 -> P1 on the same mesh is
  vertex-identity + edge-midpoint averages;
- coarse operators are Galerkin products R A P built host-side in scipy
  (inactive fine rows keep their identity, so deactivation is respected);
- each level applies its CSR operator on device as
  segment_sum(data * x[cols], rows) with naturally sorted CSR rows;
- damped-Jacobi smoothing, dense direct solve on the coarsest level;
  the whole V-cycle is one jitted linear operator, symmetric, CG-safe.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["structured_lattice_info", "MGPreconditioner", "mg_solve_cg"]


def structured_lattice_info(mesh):
    """Detect a structured lattice: returns (lo, n_axes, h_axes) when every
    vertex sits on lo + (i,j,k)*h for integer lattice sizes, else None."""
    v = mesh.vertices
    lo = v.min(axis=0)
    hi = v.max(axis=0)
    out_n = []
    for ax in range(v.shape[1]):
        vals = np.unique(np.round((v[:, ax] - lo[ax]) * 1e12) / 1e12)
        n = len(vals) - 1
        if n < 1:
            return None
        h = (hi[ax] - lo[ax]) / n
        if not np.allclose(vals, lo[ax] * 0 + np.arange(n + 1) * h,
                           atol=1e-9 * max(abs(hi[ax] - lo[ax]), 1)):
            return None
        out_n.append(n)
    if len(v) != np.prod([n + 1 for n in out_n]):
        return None
    h_axes = (hi - lo) / np.asarray(out_n)
    return lo, np.asarray(out_n, np.int64), h_axes


def _lattice_index(mesh, lo, h_axes):
    """(NV, gdim) integer lattice coords of the mesh vertices."""
    return np.round((mesh.vertices - lo) / h_axes).astype(np.int64)


def _vertex_id_map(n_axes):
    """Map lattice coords -> vertex id for create_rectangle/create_box
    ordering (x fastest-varying last axis: vid = ((i)*(ny+1)+j)*(nz+1)+k)."""
    def vid(idx):
        out = idx[:, 0]
        for ax in range(1, idx.shape[1]):
            out = out * (n_axes[ax] + 1) + idx[:, ax]
        return out
    return vid


def p1_grid_transfer(mesh_f, mesh_c):
    """Prolongation from coarse-lattice P1 vertices to fine vertices:
    (idx (NVf, K), w (NVf, K)) gather-weights (K = 2^gdim padded)."""
    inf_f = structured_lattice_info(mesh_f)
    inf_c = structured_lattice_info(mesh_c)
    if inf_f is None or inf_c is None:
        raise ValueError("meshes are not structured lattices")
    lo, nf, hf = inf_f
    loc, nc, hc = inf_c
    if not np.allclose(nf, 2 * nc):
        raise ValueError("fine lattice must be the coarse refined by 2")
    gdim = mesh_f.gdim
    idx_f = _lattice_index(mesh_f, lo, hf)
    base = idx_f // 2
    frac = idx_f - 2 * base                     # 0 or 1 per axis
    vid_c = _vertex_id_map(nc)
    K = 2 ** gdim
    NV = len(idx_f)
    idx = np.zeros((NV, K), np.int64)
    w = np.zeros((NV, K))
    if mesh_f.cell_type in ("triangle", "tetrahedron", "interval"):
        # Freudenthal/right-diagonal: value at a half-offset point is the
        # average of the min and max corners of its sub-simplex diagonal
        lo_corner = np.minimum(base, nc - 0)     # clamp not needed
        hi_corner = base + frac
        idx[:, 0] = vid_c(np.clip(base, 0, None))
        idx[:, 1] = vid_c(np.clip(hi_corner, None, nc))
        on_corner = (frac == 0).all(axis=1)
        w[:, 0] = np.where(on_corner, 1.0, 0.5)
        w[:, 1] = np.where(on_corner, 0.0, 0.5)
    else:
        # multilinear cells: 2^|S| corner average
        for k in range(K):
            offs = np.array([(k >> a) & 1 for a in range(gdim)])
            corner = base + frac * offs[None, :]
            idx[:, k] = vid_c(np.clip(corner, None, nc))
        nS = frac.sum(axis=1)
        for k in range(K):
            offs = np.array([(k >> a) & 1 for a in range(gdim)])
            active = ((frac * (1 - offs[None, :])) == frac).all(axis=1)
            w[:, k] = np.where(active, 1.0 / (2.0 ** nS), 0.0)
        # normalize duplicated corners
        w /= np.maximum(w.sum(axis=1, keepdims=True), 1e-300)
    return idx, w


def p2_to_p1_transfer(V2, V1):
    """Prolongation P1 -> P2 on the same mesh: vertex identity + edge
    midpoint averages. Returns (idx (nd2, 2), w (nd2, 2))."""
    mesh = V2.mesh
    nd2 = V2.num_scalar_dofs
    idx = np.zeros((nd2, 2), np.int64)
    w = np.zeros((nd2, 2))
    nv = mesh.num_vertices
    # vertex dofs of P2 lead the numbering (functionspace._build_dofmap)
    idx[:nv, 0] = np.arange(nv)
    w[:nv, 0] = 1.0
    # edge dofs follow, one per edge, global edge order
    edges = mesh.edges
    idx[nv:nv + len(edges), 0] = edges[:, 0]
    idx[nv:nv + len(edges), 1] = edges[:, 1]
    w[nv:nv + len(edges)] = 0.5
    if nd2 != nv + len(edges):
        raise ValueError("p2_to_p1_transfer expects a scalar P2 space")
    return idx, w


def _prolong_matrix(idx, w, ncols):
    import scipy.sparse as sps
    n = idx.shape[0]
    rows = np.repeat(np.arange(n), idx.shape[1])
    return sps.coo_matrix((w.ravel(), (rows, idx.ravel())),
                          shape=(n, ncols)).tocsr()


def _csr_device(m):
    """(arrays (data, cols, rows), n_rows) — n_rows kept OUT of the
    pytree so jitted functions treat it as static."""
    m = m.tocsr()
    m.sum_duplicates()
    counts = np.diff(m.indptr)
    rows = np.repeat(np.arange(m.shape[0]), counts).astype(np.int32)
    return ((jnp.asarray(m.data),
             jnp.asarray(m.indices.astype(np.int32)),
             jnp.asarray(rows)), int(m.shape[0]))


def _csr_apply(arrs, nrows, x):
    data, cols, rows = arrs
    return jax.ops.segment_sum(data * x[cols], rows,
                               num_segments=nrows,
                               indices_are_sorted=True)


@partial(jax.jit, static_argnums=(2, 3))
def _power_lmax_jit(dev, dinv, n, iters):
    x = jnp.sin(jnp.arange(n, dtype=dinv.dtype) + 1.0)
    x = x / jnp.linalg.norm(x)

    def body(_, x):
        y = dinv * _csr_apply(dev, n, x)
        return y / jnp.linalg.norm(y)

    x = jax.lax.fori_loop(0, iters, body, x)
    return jnp.vdot(x, dinv * _csr_apply(dev, n, x)).real


def _power_lmax(dev, dinv, n, iters=12):
    return float(_power_lmax_jit(dev, dinv, n, iters))


class MGPreconditioner:
    """V-cycle preconditioner built from a deactivated fine CSR matrix.

    Parameters: A (la.MatrixCSR or scipy) on space V; mesh hierarchy is
    derived automatically by halving the structured background lattice
    while the lattice size stays even and the dof count > coarse_size.
    """

    def __init__(self, A, V, *, nu=2, omega=0.7, coarse_size=3000,
                 bs=1):
        import scipy.sparse as sps
        from .functionspace import FunctionSpace
        from .mesh import create_box, create_rectangle

        m = A.to_scipy().tocsr() if hasattr(A, "to_scipy") else A.tocsr()
        mesh = V.mesh
        info = structured_lattice_info(mesh)
        if info is None:
            raise ValueError("MGPreconditioner needs a structured "
                             "background mesh")
        lo, n_axes, h_axes = info
        hi = lo + n_axes * h_axes
        self.nu = nu
        self.omega = omega

        # build prolongation chain (fine to coarse); vector (blocked)
        # spaces use the scalar transfer kron'ed with the block identity
        bs = V.bs

        def blocked(P):
            if bs == 1:
                return P
            return sps.kron(P, sps.eye(bs), format="csr")

        prolongs = []
        if V.degree == 2:
            V1 = FunctionSpace(mesh, ("Lagrange", 1))
            idx, w = p2_to_p1_transfer(
                FunctionSpace(mesh, ("Lagrange", 2)), V1)
            prolongs.append(blocked(
                _prolong_matrix(idx, w, V1.num_scalar_dofs)))
        elif V.degree != 1:
            raise NotImplementedError(
                "MG supports P1/P2 Lagrange spaces in round 1")

        cur_mesh = mesh
        cur_n = n_axes.copy()
        while (cur_n % 2 == 0).all() and (cur_n > 2).all():
            size = np.prod(cur_n // 2 + 1) * bs
            nxt_n = cur_n // 2
            if cur_mesh.gdim == 3:
                nxt = create_box(lo, hi, tuple(int(k) for k in nxt_n),
                                 cur_mesh.cell_type)
            else:
                nxt = create_rectangle(lo, hi,
                                       tuple(int(k) for k in nxt_n),
                                       cur_mesh.cell_type)
            idx, w = p1_grid_transfer(cur_mesh, nxt)
            prolongs.append(blocked(
                _prolong_matrix(idx, w, nxt.num_vertices)))
            cur_mesh, cur_n = nxt, nxt_n
            if size <= coarse_size:
                break

        # Galerkin chain
        mats = [m]
        for P in prolongs:
            m = (P.T @ m @ P).tocsr()
            mats.append(m)

        self.levels = []
        self._sizes = []
        for k, mk in enumerate(mats):
            dev, nrows = _csr_device(mk)
            diag = np.asarray(mk.diagonal())
            diag = np.where(np.abs(diag) > 1e-300, diag, 1.0)
            dinv = jnp.asarray(1.0 / diag)
            # spectral bound of D^-1 A for Chebyshev smoothing
            lmax = _power_lmax(dev, dinv, nrows)
            self.levels.append(dict(A=dev, dinv=dinv, lmax=lmax))
            self._sizes.append(nrows)
        self._sizes = tuple(self._sizes)
        self.prolongs = [_csr_device(P)[0] for P in prolongs]
        self.restricts = [_csr_device(P.T.tocsr())[0] for P in prolongs]
        Ac = mats[-1].toarray()
        self.coarse_inv = jnp.asarray(np.linalg.inv(Ac))
        self.n_levels = len(self.levels)

        self._levels = tuple((lv["A"], lv["dinv"], lv["lmax"])
                             for lv in self.levels)
        self._prol = tuple(self.prolongs)
        self._rest = tuple(self.restricts)

    def __call__(self, r):
        return _vcycle_jit(self.n_levels, self.nu, self._sizes,
                           self._levels, self._prol, self._rest,
                           self.coarse_inv, r)

    def operator(self):
        """The fine-level CSR operator (for driving CG)."""
        A0 = self._levels[0][0]
        n0 = self._sizes[0]
        return lambda x: _csr_apply_jit(n0, A0, x)


def _smooth(Ak, nk, dinv, lmax, b, x, degree):
    """Chebyshev smoother on [lmax/4, 1.1 lmax] of D^-1 A."""
    lo, hi = lmax / 4.0, 1.1 * lmax
    theta = 0.5 * (hi + lo)
    delta = 0.5 * (hi - lo)
    p = jnp.zeros_like(b)
    alpha = 0.0
    for k in range(degree):
        resid = dinv * (b - _csr_apply(Ak, nk, x))
        if k == 0:
            p = resid
            alpha = 1.0 / theta
        else:
            beta = (delta * alpha / 2.0) ** 2 if k > 1 else \
                0.5 * (delta * alpha) ** 2
            alpha = 1.0 / (theta - beta / alpha)
            p = resid + beta * p
        x = x + alpha * p
    return x


@partial(jax.jit, static_argnums=(0, 1, 2))
def _vcycle_jit(nlev, nu, sizes, levels, prol, rest, cinv, b):
    """Module-level jitted V-cycle: rebuilt hierarchies with equal shapes
    (moving domains) reuse the compiled program."""
    def vcycle(k, bk):
        Ak, dinv, lmax = levels[k]
        if k == nlev - 1:
            return cinv @ bk
        x = jnp.zeros_like(bk)
        x = _smooth(Ak, sizes[k], dinv, lmax, bk, x, nu)
        r = bk - _csr_apply(Ak, sizes[k], x)
        rc = _csr_apply(rest[k], sizes[k + 1], r)
        xc = vcycle(k + 1, rc)
        x = x + _csr_apply(prol[k], sizes[k], xc)
        x = _smooth(Ak, sizes[k], dinv, lmax, bk, x, nu)
        return x
    return vcycle(0, b)


@partial(jax.jit, static_argnums=(0,))
def _csr_apply_jit(nrows, arrs, x):
    return _csr_apply(arrs, nrows, x)


@partial(jax.jit, static_argnums=(0, 1, 2))
def _mg_cg_jit(nlev, nu, sizes, levels, prol, rest, cinv, b, rtol,
               maxiter):
    from .la import cg
    A0 = levels[0][0]

    def op(x):
        return _csr_apply(A0, sizes[0], x)

    def M(r):
        return _vcycle_jit(nlev, nu, sizes, levels, prol, rest, cinv, r)
    return cg(op, b, M=M, rtol=rtol, maxiter=maxiter)


def mg_solve_cg(A, V, b, *, rtol=1e-8, maxiter=200, **mg_kwargs):
    """CG on the deactivated CSR system with V-cycle preconditioning.
    Returns (x, iters, residual_norm). Rebuilding the hierarchy on fresh
    data (same shapes) reuses the compiled solve."""
    M = MGPreconditioner(A, V, **mg_kwargs)
    x, it, res = _mg_cg_jit(M.n_levels, M.nu, M._sizes, M._levels,
                            M._prol, M._rest, M.coarse_inv,
                            jnp.asarray(b), rtol, maxiter)
    return x, int(it), float(res)
