"""Distributed grid-layout stencil solver: the single-chip headline
solver (stencil.StencilCutOperator: dense-slicing interior + gathered
element band + cube-block additive Schwarz) sharded over a device mesh.

Layout: the channel grid (nch, N, N, N) splits into contiguous x-plane
slabs. Device p owns planes [start_p, start_p + W_p) and the lattice
cubes starting in them. Local blocks carry TWO extra halo planes on the
right only — every read/write of the interior stencil (cube c touches
planes c..c+1), the element band (elements are owned by the slab of
their minimum plane and reach at most min+2), and the ASM block apply
(cube c touches c..c+1) stays within [owned | right-halo-2].

One operator apply or preconditioner apply costs exactly two ppermutes:
ghost-plane contributions accumulate to the right neighbor, then the
halo planes refresh from the right neighbor's owned boundary. CG dot
products are plain jnp reductions over the sharded arrays (XLA inserts
the cross-device reduction), masked to owned valid planes.

The reference's analog: PETSc KSP over the same MPI partition as the
assembly (/root/reference/python/cutfemx/petsc.py, demo_poisson.py:52-58)
— the solve distributes exactly as well as the operator.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["ShardedStencilSolver"]


def _plane_split(n, N, nparts):
    """Split lattice planes [0, N) into slabs of >= 2 cube columns."""
    if n < 2 * nparts:
        raise ValueError(
            f"grid solver needs >= 2 cube columns per device "
            f"({n} columns, {nparts} devices)")
    bounds = np.linspace(0, n, nparts + 1).round().astype(int)
    starts = bounds[:-1]
    widths = np.diff(bounds)
    widths[-1] = N - starts[-1]   # last slab also owns plane n
    return starts, widths


class ShardedStencilSolver:
    """Distribute a built StencilCutOperator over a 1D device mesh.

    The element data is REGROUPED from the serial operator (oracle
    construction; the owner-computes construction arrives via
    spipeline.ShardedCutProblem feeding per-slab element sets). The
    SOLVE — interior stencil, element band, cube-ASM preconditioner,
    CG — runs fully distributed.
    """

    def __init__(self, op, device_mesh, axis="cells"):
        self.op = op
        self.mesh_dev = device_mesh
        self.axis = axis
        nparts = device_mesh.shape[axis]
        self.nparts = nparts
        n, N, nch = op.n, op.N, op.nch
        self.n, self.N, self.nch = n, N, nch
        self.table = op.table
        L = len(op.table)
        dtype = op.A_local.dtype

        starts, widths = _plane_split(n, N, nparts)
        self.starts, self.widths = starts, widths
        Wmax = int(widths.max())
        Wext = Wmax + 2
        self.Wmax, self.Wext = Wmax, Wext
        sh = NamedSharding(device_mesh, P(axis))
        put = lambda x: jax.device_put(jnp.asarray(x), sh)  # noqa: E731

        # -- per-device static grids --------------------------------------
        def slab_planes(G):
            """Slice a (nch, N, N, N) array into (P, nch, Wext, N, N)."""
            out = np.zeros((nparts, nch, Wext) + G.shape[2:], G.dtype)
            for p in range(nparts):
                s = starts[p]
                e = min(s + Wext, N)
                out[p, :, :e - s] = G[:, s:e]
            return out

        # cubes owned by slab p: [start_p, start_p + ncubes_p) where the
        # last slab's width counts plane n (one more plane than cubes)
        ncubes = np.minimum(starts + widths, n) - starts
        self.ncubes = ncubes
        cube_mask = np.asarray(op.cube_mask)           # (n, n, n)
        cmask_l = np.zeros((nparts, Wmax, n, n), bool)
        for p in range(nparts):
            s, e = starts[p], starts[p] + ncubes[p]
            cmask_l[p, :e - s] = cube_mask[s:e]
        self.d_cube_mask = put(cmask_l)

        act = np.asarray(op.active_grid).reshape(nch, N, N, N)
        idg = np.asarray(op.identity_grid).reshape(nch, N, N, N)
        self.d_active = put(slab_planes(act))
        self.d_identity = put(slab_planes(idg))
        self.d_W = put(np.asarray(widths, np.int32)[:, None])  # (P, 1)
        owned = np.zeros((nparts, 1, Wext, 1, 1), bool)
        for p in range(nparts):
            owned[p, 0, :widths[p]] = True
        self.d_owned_planes = put(owned)

        # -- element band regrouped by owning slab (min plane) -------------
        def local_flat(gpos, p):
            """Global grid flat index -> local extended flat index."""
            ch = gpos // N ** 3
            rem = gpos % N ** 3
            gx = rem // N ** 2
            lx = gx - starts[p]
            return ((ch * Wext + lx) * N ** 2) + rem % N ** 2

        d_insts = []
        for Ae, rg, cg_ in zip(op.rest_mats, op.rest_rows_grid,
                               op.rest_cols_grid):
            rgn = np.asarray(rg)
            cgn = np.asarray(cg_)
            # owner slab = slab of the element's minimum x-plane (its
            # other positions reach at most min+2: within right halo)
            gx_r = (rgn % N ** 3) // N ** 2
            gx_c = (cgn % N ** 3) // N ** 2
            gx_min = np.minimum(gx_r.min(axis=1), gx_c.min(axis=1))
            owner = np.clip(np.searchsorted(starts, gx_min, "right") - 1,
                            0, nparts - 1)
            counts = np.bincount(owner, minlength=nparts)
            Emax = max(int(counts.max()), 1)
            Al = np.zeros((nparts, Emax) + np.asarray(Ae).shape[1:],
                          np.asarray(Ae).dtype)
            Rl = np.zeros((nparts, Emax, rgn.shape[1]), np.int32)
            Cl = np.zeros((nparts, Emax, cgn.shape[1]), np.int32)
            Ah = np.asarray(Ae)
            for p in range(nparts):
                sel = np.flatnonzero(owner == p)
                if not len(sel):
                    continue
                Al[p, :len(sel)] = Ah[sel]
                Rl[p, :len(sel)] = local_flat(rgn[sel], p)
                Cl[p, :len(sel)] = local_flat(cgn[sel], p)
            d_insts.append((put(Al), put(Rl), put(Cl)))
        self.d_insts = tuple(d_insts)

        # -- ASM inverse blocks sliced per slab (owned cubes only) ----------
        op._ensure_cube_asm()
        x0, y0, z0, nbx, nby, nbz = op._asm_bbox
        bh = np.asarray(op._asm_binv)                 # (nbx, nby, nbz, L, L)
        Bl = np.zeros((nparts, Wmax, n, n, L, L), bh.dtype)
        for p in range(nparts):
            s, e = starts[p], starts[p] + ncubes[p]
            lo = max(s, x0)
            hi = min(e, x0 + nbx)
            if hi > lo:
                Bl[p, lo - s:hi - s, y0:y0 + nby, z0:z0 + nbz] = \
                    bh[lo - x0:hi - x0]
        self.d_binv = put(Bl)

        # covered slots (host precompute): grid slots of any cube with a
        # nonzero ASM block; uncovered active slots keep r (identity M)
        cov_cubes = np.zeros((n, n, n), bool)
        cov_cubes[x0:x0 + nbx, y0:y0 + nby, z0:z0 + nbz] = \
            np.abs(bh).max(axis=(-1, -2)) > 0
        covered = np.zeros((nch, N, N, N), bool)
        for (ch, (dx, dy, dz)) in op.table:
            covered[ch, dx:dx + n, dy:dy + n, dz:dz + n] |= cov_cubes
        self.d_covered = put(slab_planes(covered))

        self.A_local = op.A_local
        self.dtype = dtype

    # -- host-side vector staging -----------------------------------------

    def to_local(self, x):
        """Global dof vector -> sharded (P, nch, Wext, N, N) grid blocks
        (halo planes populated)."""
        n, N, nch, Wext = self.n, self.N, self.nch, self.Wext
        G = np.asarray(self.op.vec_to_grid(jnp.asarray(x))).reshape(
            nch, N, N, N)
        out = np.zeros((self.nparts, nch, Wext, N, N), G.dtype)
        for p in range(self.nparts):
            s = self.starts[p]
            e = min(s + Wext, N)
            out[p, :, :e - s] = G[:, s:e]
        sh = NamedSharding(self.mesh_dev, P(self.axis))
        return jax.device_put(jnp.asarray(out), sh)

    def to_global_grid(self, Xl):
        """Sharded local blocks -> (gsize,) flat global grid (owned)."""
        n, N, nch = self.n, self.N, self.nch
        Xn = np.asarray(Xl)
        G = np.zeros((nch, N, N, N), Xn.dtype)
        for p in range(self.nparts):
            s, w = self.starts[p], self.widths[p]
            G[:, s:s + w] = Xn[p, :, :w]
        return G.reshape(-1)

    def to_global(self, Xl):
        """Sharded local blocks -> global dof vector."""
        return self.to_global_grid(Xl)[np.asarray(self.op.dof_to_grid)]

    # -- distributed solve ---------------------------------------------------

    def solve_cg(self, b, rtol=1e-8, maxiter=500):
        """Distributed ASM-preconditioned CG. Returns (x_dofs, iters,
        true-residual norm)."""
        bl = self.to_local(np.asarray(b))
        x, it, res = _sgrid_cg(self, bl, rtol, maxiter)
        return self.to_global(x), int(it), float(res)

    def apply_global(self, x):
        """A @ x through the distributed apply (testing/oracle path)."""
        return self.to_global(_sgrid_apply_jit(self, self.to_local(x)))

    def precond_global(self, r):
        """M @ r through the distributed ASM apply (testing path)."""
        return self.to_global(_sgrid_precond_jit(self, self.to_local(r)))


# -- per-shard bodies ---------------------------------------------------------


def _halo_accumulate(slv, Y, W):
    """Send right-halo write planes [W, W+2) to the right neighbor's
    owned planes [0, 2); then zero the local halo contribution."""
    axis = slv.axis
    nparts = slv.nparts
    nch, N, Wext = slv.nch, slv.N, slv.Wext
    z = jnp.zeros((), W.dtype)
    ghost = jax.lax.dynamic_slice(Y, (z, W, z, z), (nch, 2, N, N))
    recv = jax.lax.ppermute(ghost, axis,
                            [(p, p + 1) for p in range(nparts - 1)])
    Y = jax.lax.dynamic_update_slice(
        Y, jnp.zeros((nch, 2, N, N), Y.dtype), (z, W, z, z))
    return Y.at[:, 0:2].add(recv)


def _halo_refresh(slv, Y, W):
    """Refresh local halo planes [W, W+2) from the right neighbor's owned
    planes [0, 2) (the last device receives zeros — out of domain)."""
    axis = slv.axis
    nparts = slv.nparts
    recv = jax.lax.ppermute(Y[:, 0:2], axis,
                            [(p + 1, p) for p in range(nparts - 1)])
    z = jnp.zeros((), W.dtype)
    return jax.lax.dynamic_update_slice(Y, recv.astype(Y.dtype),
                                        (z, W, z, z))


def _sgrid_apply_body(slv, X, active, identity, cmask, insts, W):
    """Per-shard operator apply on an extended local block.
    Invariant: halo planes of X hold the neighbor's current values."""
    n, N, nch = slv.n, slv.N, slv.nch
    Wmax, Wext = slv.Wmax, slv.Wext
    table = slv.table
    hi = jax.lax.Precision.HIGHEST
    Xin = jnp.where(active, X, 0.0)

    # interior stencil over owned cubes
    parts = [Xin[ch, dx:dx + Wmax, dy:dy + n, dz:dz + n]
             for (ch, (dx, dy, dz)) in table]
    xc = jnp.stack(parts, axis=-1)                     # (Wmax, n, n, L)
    yc = jnp.einsum("xyzl,lm->xyzm", xc, slv.A_local, precision=hi)
    yc = jnp.where(cmask[..., None], yc, 0.0)
    Y = jnp.zeros_like(X)
    for s, (ch, (dx, dy, dz)) in enumerate(table):
        Y = Y.at[ch, dx:dx + Wmax, dy:dy + n, dz:dz + n].add(yc[..., s])

    # element band (slab-owned elements; zero-padded matrices)
    if insts:
        Yf = Y.reshape(-1)
        xf = Xin.reshape(-1)
        for Ae, R, C in insts:
            ye = jnp.einsum("eij,ej->ei", Ae, xf[C], precision=hi)
            Yf = Yf.at[R.ravel()].add(ye.ravel())
        Y = Yf.reshape(nch, Wext, N, N)

    Y = _halo_accumulate(slv, Y, W)
    Y = _halo_refresh(slv, Y, W)
    Y = jnp.where(active, Y, 0.0) + jnp.where(identity, X, 0.0)
    return Y


def _sgrid_precond_body(slv, R, active, binv, covered, W):
    """Per-shard cube-block ASM apply (identity on uncovered slots)."""
    n, N, nch = slv.n, slv.N, slv.nch
    Wmax, Wext = slv.Wmax, slv.Wext
    table = slv.table
    hi = jax.lax.Precision.HIGHEST
    parts = [R[ch, dx:dx + Wmax, dy:dy + n, dz:dz + n]
             for (ch, (dx, dy, dz)) in table]
    rc = jnp.stack(parts, axis=-1)                     # (Wmax, n, n, L)
    zc = jnp.einsum("xyzl,xyzlm->xyzm", rc, binv, precision=hi)
    Z = jnp.zeros_like(R)
    for s, (ch, (dx, dy, dz)) in enumerate(table):
        Z = Z.at[ch, dx:dx + Wmax, dy:dy + n, dz:dz + n].add(zc[..., s])
    Z = _halo_accumulate(slv, Z, W)
    Z = _halo_refresh(slv, Z, W)
    return jnp.where(active & covered, Z, R)


def _make_sharded_ops(slv):
    spec = P(slv.axis)
    mesh = slv.mesh_dev
    flat_insts = []
    for A, R, C in slv.d_insts:
        flat_insts += [A, R, C]
    n_inst = len(slv.d_insts)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=tuple([spec] * (5 + len(flat_insts))),
             out_specs=spec)
    def apply_run(X, active, identity, cmask, W, *flat):
        insts = [(flat[3 * i][0], flat[3 * i + 1][0], flat[3 * i + 2][0])
                 for i in range(n_inst)]
        return _sgrid_apply_body(slv, X[0], active[0], identity[0],
                                 cmask[0], insts, W[0, 0])[None]

    @partial(jax.shard_map, mesh=mesh, in_specs=(spec,) * 5,
             out_specs=spec)
    def precond_run(R, active, binv, covered, W):
        return _sgrid_precond_body(slv, R[0], active[0], binv[0],
                                   covered[0], W[0, 0])[None]

    def apply_fn(X):
        return apply_run(X, slv.d_active, slv.d_identity,
                         slv.d_cube_mask, slv.d_W, *flat_insts)

    def precond_fn(R):
        return precond_run(R, slv.d_active, slv.d_binv, slv.d_covered,
                           slv.d_W)

    return apply_fn, precond_fn


@partial(jax.jit, static_argnums=(0,))
def _sgrid_apply_jit(slv, X):
    apply_fn, _ = _make_sharded_ops(slv)
    return apply_fn(X)


@partial(jax.jit, static_argnums=(0,))
def _sgrid_precond_jit(slv, R):
    _, precond_fn = _make_sharded_ops(slv)
    return precond_fn(R)


@partial(jax.jit, static_argnums=(0,))
def _sgrid_cg(slv, b, rtol, maxiter):
    """Distributed ASM-PCG over sharded grid blocks. Dots are plain jnp
    reductions masked to owned planes; XLA inserts the collectives."""
    apply_fn, precond_fn = _make_sharded_ops(slv)
    owned = slv.d_owned_planes
    act = slv.d_active

    def pdot(u, v):
        return jnp.sum(jnp.where(owned & act, u * v, 0.0))

    bb = jnp.where(act, b, 0.0)
    x = jnp.zeros_like(bb)
    r = bb - apply_fn(x)
    z = precond_fn(r)
    p_vec = z
    rz = pdot(r, z)
    tol2 = jnp.maximum((rtol * rtol) * pdot(bb, bb),
                       jnp.finfo(bb.dtype).tiny)

    def cond(state):
        x, r, p_vec, rz, it = state
        return (pdot(r, r) > tol2) & (it < maxiter)

    def body(state):
        x, r, p_vec, rz, it = state
        Ap = apply_fn(p_vec)
        alpha = rz / pdot(p_vec, Ap)
        x = x + alpha * p_vec
        r = r - alpha * Ap
        z = precond_fn(r)
        rz_new = pdot(r, z)
        beta = rz_new / rz
        return (x, r, z + beta * p_vec, rz_new, it + 1)

    x, r, p_vec, rz, it = jax.lax.while_loop(cond, body,
                                             (x, r, p_vec, rz, 0))
    # halo refresh so to_global reads consistent owned planes
    return x, it, jnp.sqrt(pdot(r, r))
