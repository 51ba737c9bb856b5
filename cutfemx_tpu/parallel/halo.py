"""Owner-computes halo-exchange parallelism over a TPU device mesh.

The TPU-native replacement for DOLFINx IndexMap ghost scatters (SURVEY.md
§2f): cells partition into contiguous geometric slabs along the domain's
longest axis; each slab also carries a one-cell ghost layer so
facet-coupling terms (ghost penalty, DG) assemble locally. Dofs are owned
by the lowest-index slab touching them; each slab's locals are
[owned | left ghosts (owner p-1) | right ghosts (owner p+1)].
``scatter_rev`` (ghost -> owner add) and ``scatter_fwd`` (owner -> ghost
refresh) are two ``ppermute`` pairs over the mesh axis inside
``shard_map`` — the reference's MPI pattern (deactivate.h:181-182) riding
ICI. CG dot products reduce owned entries with a ``psum``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["SlabPartition", "build_slab_partition", "HaloOperator"]


@dataclass
class SlabPartition:
    """Host-side partition data, padded to uniform per-slab sizes."""
    nparts: int
    cell_part: np.ndarray          # (NC,) owning slab per cell
    n_owned: np.ndarray            # (P,)
    owned_max: int
    gl_max: int                    # left-ghost padding
    gr_max: int                    # right-ghost padding
    local_size: int                # owned_max + gl_max + gr_max
    global_of_local: np.ndarray    # (P, local_size), -1 padded
    # exchange tables (aligned with the neighbor's ghost slot order):
    send_left_slots: np.ndarray    # (P, gl_max): owned slots of p that
    #                                 p+1 holds as left ghosts
    send_right_slots: np.ndarray   # (P, gr_max): owned slots of p that
    #                                 p-1 holds as right ghosts
    ghostl_valid: np.ndarray       # (P, gl_max) bool
    ghostr_valid: np.ndarray       # (P, gr_max) bool
    dof_owner: np.ndarray
    owned_ids: list                # per part: sorted global dofs owned
    gl_ids: list                   # per part: sorted left-ghost globals
    gr_ids: list                   # per part: sorted right-ghost globals

    def locals_of_globals(self, p: int, g: np.ndarray) -> np.ndarray:
        """Vectorized (global dof -> local slot) map for part p. Raises if
        any dof is neither owned by p nor in p's ghost layer."""
        g = np.asarray(g)
        owner = self.dof_owner[g]
        loc = np.empty(g.shape, np.int64)
        pools = ((p, self.owned_ids[p], 0),
                 (p - 1, self.gl_ids[p], self.owned_max),
                 (p + 1, self.gr_ids[p], self.owned_max + self.gl_max))
        covered = np.zeros(g.shape, bool)
        for q, ids, off in pools:
            m = owner == q
            if not m.any():
                continue
            idx = np.searchsorted(ids, g[m])
            ok = (idx < len(ids))
            ok &= np.where(ok, ids[np.minimum(idx, len(ids) - 1)] == g[m],
                           False)
            if not ok.all():
                raise ValueError(
                    "integral couples dofs outside the slab's ghost "
                    "layer; use fewer partitions")
            loc[m] = off + idx
            covered |= m
        if not covered.all():
            raise ValueError(
                "integral couples dofs outside the slab's ghost layer; "
                "use fewer partitions")
        return loc


class _NonNeighborGhosts(ValueError):
    pass


def build_slab_partition(V, nparts, weights=None) -> SlabPartition:
    """Partition cells of V.mesh into geometric slabs with one-cell ghost
    layers and build the two-sided halo layout for V's blocked dofs.

    ``weights`` (optional, per cell) balances slab boundaries by
    cumulative weight instead of cell count — the owner-computes pipeline
    passes activity weights so the cut band spreads across devices even
    when the level set occupies a fraction of the domain (the reference
    delegates the same problem to its mesh partitioner).

    If ``nparts`` slabs would be so thin that a ghost layer spans two
    slabs (non-neighbor ghosts), weights are first blended toward
    uniform (weaker balance beats losing devices), then the cells are
    spread over fewer non-empty slabs — trailing devices own nothing but
    still participate in the collective program."""
    if weights is not None:
        w = np.asarray(weights, float)
        u = np.full_like(w, max(w.mean(), 1e-12))
        candidates = [b * w + (1.0 - b) * u
                      for b in (1.0, 0.75, 0.5, 0.25)] + [None]
    else:
        candidates = [None]
    last_err = None
    for m in range(nparts, 0, -1):
        for wts in candidates:
            try:
                return _build_slab_partition_m(V, nparts, m, wts)
            except _NonNeighborGhosts as e:
                last_err = e
    raise last_err


def _split_cells(order, m, weights):
    if weights is None:
        return list(np.array_split(order, m))
    w = np.asarray(weights, float)[order]
    cw = np.cumsum(w)
    bounds = np.searchsorted(cw, cw[-1] * np.arange(1, m) / m)
    return list(np.split(order, bounds))


def _build_slab_partition_m(V, nparts, m, weights=None) -> SlabPartition:
    mesh = V.mesh
    bd = V.blocked_dofmap
    ndofs = V.dim

    mids = mesh.midpoints()
    extent = mesh.vertices.max(axis=0) - mesh.vertices.min(axis=0)
    axis = int(np.argmax(extent))
    order = np.argsort(mids[:, axis], kind="stable")
    parts_cells = _split_cells(order, m, weights)
    parts_cells += [np.empty(0, np.int64)] * (nparts - m)
    cell_part = np.empty(mesh.num_cells, np.int32)
    for p, cs in enumerate(parts_cells[:m]):
        cell_part[cs] = p

    # dof owner = lowest slab touching it: write slabs in descending order
    # so lower indices overwrite (vectorized; ufunc.at is orders of
    # magnitude slower at 10M dofs)
    dof_owner = np.full(ndofs, nparts, np.int32)
    for p in range(m - 1, -1, -1):
        dof_owner[bd[parts_cells[p]].ravel()] = p

    # one-cell ghost layer via facet adjacency
    fc = mesh.facet_cells
    interior = fc[:, 1] >= 0
    a, b = fc[interior, 0], fc[interior, 1]

    owned_lists, gl_lists, gr_lists = [], [], []
    empty = np.empty(0, np.int64)
    for p in range(nparts):
        if p >= m:
            owned_lists.append(empty)
            gl_lists.append(empty)
            gr_lists.append(empty)
            continue
        own_cells = parts_cells[p]
        in_p = cell_part == p
        nb = np.concatenate([b[in_p[a]], a[in_p[b]]])
        layer_cells = np.unique(np.concatenate([own_cells, nb]))
        touched = np.unique(bd[layer_cells].ravel())
        owned = np.flatnonzero(dof_owner == p).astype(np.int64)
        ghosts = touched[dof_owner[touched] != p]
        owners = dof_owner[ghosts]
        if len(ghosts) and not np.isin(owners, [p - 1, p + 1]).all():
            raise _NonNeighborGhosts(
                "slab partition has non-neighbor ghosts; use fewer "
                "partitions or a finer mesh")
        owned_lists.append(owned)
        gl_lists.append(np.sort(ghosts[owners == p - 1]).astype(np.int64))
        gr_lists.append(np.sort(ghosts[owners == p + 1]).astype(np.int64))

    owned_max = max(len(o) for o in owned_lists)
    gl_max = max(max((len(g) for g in gl_lists), default=0), 1)
    gr_max = max(max((len(g) for g in gr_lists), default=0), 1)
    local_size = owned_max + gl_max + gr_max

    global_of_local = np.full((nparts, local_size), -1, np.int64)
    for p in range(nparts):
        global_of_local[p, :len(owned_lists[p])] = owned_lists[p]
        global_of_local[p, owned_max:owned_max + len(gl_lists[p])] = \
            gl_lists[p]
        go = owned_max + gl_max
        global_of_local[p, go:go + len(gr_lists[p])] = gr_lists[p]

    part = SlabPartition(
        nparts=nparts, cell_part=cell_part,
        n_owned=np.array([len(o) for o in owned_lists], np.int32),
        owned_max=owned_max, gl_max=gl_max, gr_max=gr_max,
        local_size=local_size, global_of_local=global_of_local,
        send_left_slots=np.zeros((nparts, gl_max), np.int64),
        send_right_slots=np.zeros((nparts, gr_max), np.int64),
        ghostl_valid=np.zeros((nparts, gl_max), bool),
        ghostr_valid=np.zeros((nparts, gr_max), bool),
        dof_owner=dof_owner, owned_ids=owned_lists, gl_ids=gl_lists,
        gr_ids=gr_lists)

    for p in range(nparts):
        part.ghostl_valid[p, :len(gl_lists[p])] = True
        part.ghostr_valid[p, :len(gr_lists[p])] = True
        if p + 1 < nparts and len(gl_lists[p + 1]):
            # p+1's left ghosts are owned by p: local slot = owned index
            part.send_left_slots[p, :len(gl_lists[p + 1])] = \
                np.searchsorted(owned_lists[p], gl_lists[p + 1])
        if p - 1 >= 0 and len(gr_lists[p - 1]):
            part.send_right_slots[p, :len(gr_lists[p - 1])] = \
                np.searchsorted(owned_lists[p], gr_lists[p - 1])
    return part


class HaloOperator:
    """Distributed matrix-free operator + CG over slab-sharded dofs.

    Element batches are regrouped per slab (entities live on the slab of
    their first cell; the ghost layer guarantees all their dofs are
    local). One apply = local einsum + scatter + ghost->owner adds
    (2 ppermutes) + owner->ghost refresh (2 ppermutes).

    Two construction paths:

    - ``HaloOperator(form, domain, part, mesh)`` — ORACLE path: builds
      the global element set serially, then regroups per slab. Used by
      parity tests to cross-check the production path below.
    - ``HaloOperator.from_device(part, mesh, d_instances, d_active)`` —
      production path fed by the owner-computes sharded pipeline
      (parallel/spipeline.py): element matrices arrive as device-sharded
      arrays computed per slab; no global element array ever exists.
    """

    @classmethod
    def from_device(cls, partition: SlabPartition, mesh: Mesh,
                    d_instances, d_active, axis="cells"):
        """Build from device-sharded per-slab element data.

        d_instances: tuple of (A, D) jax Arrays sharded over ``axis``
        with shapes (P, E, nd, nd) / (P, E, nd) (D holds LOCAL slots).
        d_active: (P, local_size) bool Array sharded over ``axis``."""
        self = cls.__new__(cls)
        part = partition
        self.part = part
        self.mesh = mesh
        self.axis = axis
        self.instances = None   # no host copy on this path
        self.owned_mask = np.zeros((part.nparts, part.local_size), bool)
        for p in range(part.nparts):
            self.owned_mask[p, :part.n_owned[p]] = True
        sh = NamedSharding(mesh, P(axis))
        put = lambda x: jax.device_put(jnp.asarray(x), sh)  # noqa: E731
        self.d_instances = tuple(d_instances)
        self.d_active = d_active
        self.d_owned = put(self.owned_mask)
        self.d_send_l = put(part.send_left_slots)
        self.d_send_r = put(part.send_right_slots)
        self.d_gl_valid = put(part.ghostl_valid)
        self.d_gr_valid = put(part.ghostr_valid)
        return self

    def __init__(self, form, domain, partition: SlabPartition, mesh: Mesh,
                 axis="cells"):
        from ..fem import CutOperator
        part = partition
        self.part = part
        self.mesh = mesh
        self.axis = axis
        op = CutOperator(form, domain)
        if len(op.element_matrices) == 0:
            raise ValueError("empty operator")

        inst_cells = [np.asarray(inst.rows_cells)
                      for inst in form.instances]
        stacked = []
        for (Ae, rows), cells in zip(
                [(np.asarray(a), np.asarray(r))
                 for a, r in zip(op.element_matrices, op.row_dofs)],
                inst_cells):
            cells0 = cells if cells.ndim == 1 else cells[:, 0]
            slabs = part.cell_part[cells0]
            nd = rows.shape[1]
            counts = np.bincount(slabs, minlength=part.nparts)
            emax = max(int(counts.max()), 1)
            A = np.zeros((part.nparts, emax, nd, nd), Ae.dtype)
            D = np.full((part.nparts, emax, nd), part.local_size - 1,
                        np.int64)
            for p in range(part.nparts):
                sel = np.flatnonzero(slabs == p)
                if not len(sel):
                    continue
                A[p, :len(sel)] = Ae[sel]
                D[p, :len(sel)] = part.locals_of_globals(p, rows[sel])
            stacked.append((A, D))
        self.instances = stacked

        active = np.asarray(op.active) if op.active is not None else None
        gol = part.global_of_local
        valid = gol >= 0
        ga = np.zeros((part.nparts, part.local_size), bool)
        if active is not None:
            ga[valid] = active[gol[valid]]
        else:
            ga[valid] = True
        self.active_local = ga
        self.owned_mask = np.zeros((part.nparts, part.local_size), bool)
        for p in range(part.nparts):
            self.owned_mask[p, :part.n_owned[p]] = True

        sh = NamedSharding(mesh, P(axis))
        put = lambda x: jax.device_put(jnp.asarray(x), sh)  # noqa: E731
        self.d_instances = tuple((put(A), put(D))
                                 for A, D in self.instances)
        self.d_active = put(self.active_local)
        self.d_owned = put(self.owned_mask)
        self.d_send_l = put(part.send_left_slots)
        self.d_send_r = put(part.send_right_slots)
        self.d_gl_valid = put(part.ghostl_valid)
        self.d_gr_valid = put(part.ghostr_valid)

    # -- vector layout helpers ----------------------------------------------

    def to_local(self, x_global):
        gol = self.part.global_of_local
        out = np.zeros(gol.shape, np.asarray(x_global).dtype)
        valid = gol >= 0
        out[valid] = np.asarray(x_global)[gol[valid]]
        return jax.device_put(jnp.asarray(out),
                              NamedSharding(self.mesh, P(self.axis)))

    def to_global(self, x_local):
        gol = self.part.global_of_local
        xl = np.asarray(x_local)
        out = np.zeros(int(self.part.dof_owner.shape[0]), xl.dtype)
        own = self.owned_mask & (gol >= 0)
        out[gol[own]] = xl[own]
        return out

    def solve_cg(self, b_global, rtol=1e-8, maxiter=500):
        bl = self.to_local(np.asarray(b_global))
        x, it, res = _halo_cg(self, bl, rtol, maxiter)
        return self.to_global(x), int(it), float(res)

    def apply_global(self, x_global):
        """A @ x for a replicated global vector (testing/oracle path)."""
        return self.to_global(_halo_apply(self, self.to_local(x_global)))


def _halo_sync(op, y, send_l, send_r, gl_valid, gr_valid):
    """Ghost->owner adds then owner->ghost refresh (2+2 ppermutes)."""
    part = op.part
    axis = op.axis
    nparts = part.nparts
    om, gl, gr = part.owned_max, part.gl_max, part.gr_max
    gl_part = jnp.where(gl_valid, y[om:om + gl], 0.0)
    recv_from_right = jax.lax.ppermute(
        gl_part, axis, [(p, p - 1) for p in range(1, nparts)])
    y = y.at[send_l].add(recv_from_right)
    gr_part = jnp.where(gr_valid, y[om + gl:om + gl + gr], 0.0)
    recv_from_left = jax.lax.ppermute(
        gr_part, axis, [(p, p + 1) for p in range(nparts - 1)])
    y = y.at[send_r].add(recv_from_left)
    to_right = jax.lax.ppermute(
        y[send_l], axis, [(p, p + 1) for p in range(nparts - 1)])
    y = y.at[om:om + gl].set(jnp.where(gl_valid, to_right, 0.0))
    to_left = jax.lax.ppermute(
        y[send_r], axis, [(p, p - 1) for p in range(1, nparts)])
    y = y.at[om + gl:om + gl + gr].set(jnp.where(gr_valid, to_left, 0.0))
    return y


def _diag_body(op, instances, active, owned, send_l, send_r, gl_valid,
               gr_valid):
    """Assembled operator diagonal per shard (duplicate-slot aware: a
    facet-pair element lists shared dofs twice, so their cross entries
    belong on the diagonal), halo-summed like the apply."""
    d = jnp.zeros(op.part.local_size, instances[0][0].dtype)
    for A, D in instances:
        Ae, dd = A[0], D[0]
        eq = dd[:, :, None] == dd[:, None, :]
        contrib = jnp.sum(jnp.where(eq, Ae, 0.0), axis=2)
        d = d.at[dd.ravel()].add(contrib.ravel())
    d = _halo_sync(op, d, send_l[0], send_r[0], gl_valid[0], gr_valid[0])
    d = jnp.where(active[0] & (jnp.abs(d) > 1e-30), d, 1.0)
    return d[None]


def _apply_body(op, instances, active, owned, send_l, send_r, gl_valid,
                gr_valid, x):
    """Per-shard operator application (inside shard_map; every array has a
    leading length-1 shard axis)."""
    part = op.part
    axis = op.axis
    nparts = part.nparts
    om, gl, gr = part.owned_max, part.gl_max, part.gr_max
    x = x[0]
    xin = jnp.where(active[0], x, 0.0)
    y = jnp.zeros_like(x)
    for A, D in instances:
        Ae, dd = A[0], D[0]
        ye = jnp.einsum("eij,ej->ei", Ae, xin[dd],
                        precision=jax.lax.Precision.HIGHEST)
        y = y.at[dd.ravel()].add(ye.ravel())
    y = _halo_sync(op, y, send_l[0], send_r[0], gl_valid[0], gr_valid[0])
    y = jnp.where(active[0], y, x)
    return y[None]


def _make_apply(op):
    """Sharded operator application (P, local) -> (P, local)."""
    mesh, axis = op.mesh, op.axis
    spec = P(axis)

    def apply_sharded(x):
        flat = []
        for A, D in op.d_instances:
            flat += [A, D]
        n_extra = 7

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=tuple([spec] * (len(flat) + n_extra)),
                 out_specs=spec)
        def run(*args):
            *flat_in, active, owned, send_l, send_r, glv, grv, xx = args
            insts = [(flat_in[2 * i], flat_in[2 * i + 1])
                     for i in range(len(op.d_instances))]
            return _apply_body(op, insts, active, owned, send_l, send_r,
                               glv, grv, xx)
        return run(*flat, op.d_active, op.d_owned, op.d_send_l,
                   op.d_send_r, op.d_gl_valid, op.d_gr_valid, x)

    return apply_sharded


@partial(jax.jit, static_argnums=(0,))
def _halo_apply(op, x):
    return _make_apply(op)(x)


@partial(jax.jit, static_argnums=(0,))
def _halo_cg(op: HaloOperator, b, rtol, maxiter):
    mesh, axis = op.mesh, op.axis
    spec = P(axis)
    apply_sharded = _make_apply(op)

    def diag_sharded():
        flat = []
        for A, D in op.d_instances:
            flat += [A, D]
        n_extra = 6

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=tuple([spec] * (len(flat) + n_extra)),
                 out_specs=spec)
        def run(*args):
            *flat_in, active, owned_, send_l, send_r, glv, grv = args
            insts = [(flat_in[2 * i], flat_in[2 * i + 1])
                     for i in range(len(op.d_instances))]
            return _diag_body(op, insts, active, owned_, send_l, send_r,
                              glv, grv)
        return run(*flat, op.d_active, op.d_owned, op.d_send_l,
                   op.d_send_r, op.d_gl_valid, op.d_gr_valid)

    owned = op.d_owned

    def pdot(u, v):
        return jnp.sum(jnp.where(owned, u * v, 0.0))

    # Jacobi-preconditioned CG (the reference's demos run unpreconditioned
    # KSP defaults; the assembled diagonal costs one extra sharded pass)
    d = diag_sharded()

    def M(r_):
        return jnp.where(op.d_active, r_ / d, r_)

    bb = jnp.where(op.d_active, b, 0.0)
    x = jnp.zeros_like(bb)
    r = bb - apply_sharded(x)
    z = M(r)
    p_vec = z
    rz = pdot(r, z)
    tol2 = (rtol ** 2) * pdot(r, r)

    def cond(state):
        x, r, p_vec, rz, it = state
        return (pdot(r, r) > tol2) & (it < maxiter)

    def body(state):
        x, r, p_vec, rz, it = state
        Ap = apply_sharded(p_vec)
        alpha = rz / pdot(p_vec, Ap)
        x = x + alpha * p_vec
        r = r - alpha * Ap
        z = M(r)
        rz_new = pdot(r, z)
        beta = rz_new / rz
        return (x, r, z + beta * p_vec, rz_new, it + 1)

    x, r, p_vec, rz, it = jax.lax.while_loop(
        cond, body, (x, r, p_vec, rz, 0))
    # report the TRUE residual norm (rz is the preconditioned inner
    # product r.M^-1 r, which can differ by orders of magnitude when the
    # diagonal is far from 1); convergence already checks pdot(r, r)
    return x, it, jnp.sqrt(pdot(r, r))
