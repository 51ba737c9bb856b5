"""Owner-computes halo-exchange parallelism over a TPU device mesh.

The TPU-native replacement for DOLFINx IndexMap ghost scatters (SURVEY.md
§2f): cells are partitioned into contiguous geometric slabs along the
domain's longest axis; each dof is owned by the lowest-index slab touching
it and ghosted in the (single) neighbor slab. ``scatter_fwd`` (owner ->
ghost copy) and ``scatter_rev`` (ghost -> owner add) become one
``ppermute`` each over the mesh axis inside ``shard_map`` — exactly the
halo pattern of the reference's MPI layer (deactivate.h:181-182), riding
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
    cell_part: np.ndarray          # (NC,)
    cells_of_part: np.ndarray      # (P, cmax) cell ids, -1 padded
    n_cells: np.ndarray            # (P,)
    # local dof numbering: [owned | ghosts]; ghosts owned by part-1
    n_owned: np.ndarray            # (P,)
    n_ghost: np.ndarray            # (P,)
    local_size: int                # owned_max + ghost_max (uniform)
    owned_max: int
    ghost_max: int
    global_of_local: np.ndarray    # (P, local_size) global dof, -1 padded
    local_dofmap: np.ndarray       # (P, cmax, nd) local dof per cell slot
    # exchange: ghosts of part p are owned by part p-1;
    # send_slots[p] = local (owned) slots of p that p+1 ghosts, aligned
    # with p+1's ghost slot order
    send_slots: np.ndarray         # (P, ghost_max) -1 padded
    dof_owner: np.ndarray          # (num_dofs,)


def build_slab_partition(V, nparts) -> SlabPartition:
    """Partition cells of V.mesh into geometric slabs and build the halo
    layout for V's (blocked) dofs."""
    mesh = V.mesh
    nd_cell = V.blocked_dofmap.shape[1]
    bs = V.bs
    ndofs = V.dim

    mids = mesh.midpoints()
    extent = mesh.vertices.max(axis=0) - mesh.vertices.min(axis=0)
    axis = int(np.argmax(extent))
    order = np.argsort(mids[:, axis], kind="stable")
    parts_cells = np.array_split(order, nparts)
    cell_part = np.empty(mesh.num_cells, np.int32)
    for p, cs in enumerate(parts_cells):
        cell_part[cs] = p

    bd = V.blocked_dofmap                      # (NC, nd)
    dof_owner = np.full(ndofs, nparts, np.int32)
    np.minimum.at(dof_owner, bd.ravel(),
                  np.repeat(cell_part, nd_cell))

    # per-part local numbering
    owned_lists, ghost_lists = [], []
    for p in range(nparts):
        owned = np.flatnonzero(dof_owner == p)
        touched = np.unique(bd[parts_cells[p]].ravel())
        ghosts = touched[dof_owner[touched] != p]
        owners = dof_owner[ghosts]
        if len(ghosts) and not (owners == p - 1).all():
            raise ValueError(
                "slab partition has non-neighbor ghosts; use fewer "
                "partitions or a finer mesh")
        owned_lists.append(owned)
        ghost_lists.append(ghosts)

    owned_max = max(len(o) for o in owned_lists)
    ghost_max = max((len(g) for g in ghost_lists), default=0)
    ghost_max = max(ghost_max, 1)
    cmax = max(len(c) for c in parts_cells)
    local_size = owned_max + ghost_max

    global_of_local = np.full((nparts, local_size), -1, np.int64)
    local_of_global = {}
    for p in range(nparts):
        for i, g in enumerate(owned_lists[p]):
            global_of_local[p, i] = g
            local_of_global[(p, g)] = i
        for i, g in enumerate(ghost_lists[p]):
            global_of_local[p, owned_max + i] = g
            local_of_global[(p, g)] = owned_max + i

    cells_of_part = np.full((nparts, cmax), -1, np.int64)
    local_dofmap = np.full((nparts, cmax, nd_cell), local_size - 1,
                           np.int64)  # dummy slot: last ghost pad
    for p, cs in enumerate(parts_cells):
        cells_of_part[p, :len(cs)] = cs
        for k, c in enumerate(cs):
            for j, g in enumerate(bd[c]):
                local_dofmap[p, k, j] = local_of_global[(p, g)]

    # send_slots: for part p, the owned slots matching part p+1's ghosts
    send_slots = np.full((nparts, ghost_max), 0, np.int64)
    for p in range(nparts - 1):
        for i, g in enumerate(ghost_lists[p + 1]):
            send_slots[p, i] = local_of_global[(p, g)]

    return SlabPartition(
        nparts=nparts, cell_part=cell_part, cells_of_part=cells_of_part,
        n_cells=np.array([len(c) for c in parts_cells], np.int32),
        n_owned=np.array([len(o) for o in owned_lists], np.int32),
        n_ghost=np.array([len(g) for g in ghost_lists], np.int32),
        local_size=local_size, owned_max=owned_max, ghost_max=ghost_max,
        global_of_local=global_of_local, local_dofmap=local_dofmap,
        send_slots=send_slots, dof_owner=dof_owner)


class HaloOperator:
    """Distributed matrix-free operator + CG over slab-sharded dofs.

    Element matrices are resharded per slab (padded); vectors live in the
    local [owned | ghost] layout, (P, local_size) sharded over the mesh
    axis. One apply = local einsum + segment-sum + one backward ppermute
    (ghost-add) + one forward ppermute (ghost-refresh)."""

    def __init__(self, form, domain, partition: SlabPartition, mesh: Mesh,
                 axis="cells"):
        from ..fem import CutOperator
        part = partition
        self.part = part
        self.mesh = mesh
        self.axis = axis
        op = CutOperator(form, domain)  # element matrices on device
        if len(op.element_matrices) == 0:
            raise ValueError("empty operator")
        # regroup every instance's element matrices by slab, padded, and
        # convert global row/col dofs to local slots
        mats_p, dofs_p = [], []
        for Ae, rows in zip(op.element_matrices, op.row_dofs):
            Ae = np.asarray(Ae)
            rows = np.asarray(rows)
            nd = rows.shape[1]
            # entity -> slab via its first dof owner cell? use row cells:
            # recover entity slab from the owning instance cells
            mats_p.append((Ae, rows))
        # build per-slab concatenated element lists on the host
        inst_cells = [np.asarray(inst.rows_cells)
                      for inst in form.instances]
        emax_all = []
        per_slab = [[] for _ in range(part.nparts)]
        for (Ae, rows), cells in zip(mats_p, inst_cells):
            cells0 = cells if cells.ndim == 1 else cells[:, 0]
            slabs = part.cell_part[cells0]
            for p in range(part.nparts):
                sel = np.flatnonzero(slabs == p)
                per_slab[p].append((Ae[sel], rows[sel]))
        # per slab: concat across instances with per-instance nd padding to
        # a common nd via block structure: keep instances separate
        self.n_inst = len(mats_p)
        self.slab_data = []
        lofg = {}
        for p in range(part.nparts):
            for i in range(part.local_size):
                g = part.global_of_local[p, i]
                if g >= 0:
                    lofg[(p, g)] = i
        # validate: every instance's receiving dofs must live in the
        # entity's assigned slab (interior-facet terms straddling a slab
        # boundary need two-sided ghosting — round-2 work; use the psum
        # operator for ghost-penalty forms meanwhile)
        for (Ae, rows), cells in zip(mats_p, inst_cells):
            cells0 = cells if cells.ndim == 1 else cells[:, 0]
            slabs = part.cell_part[cells0]
            for p in range(part.nparts):
                sel = np.flatnonzero(slabs == p)
                have = set(part.global_of_local[p][
                    part.global_of_local[p] >= 0].tolist())
                needed = set(np.unique(rows[sel]).tolist())
                if not needed <= have:
                    raise NotImplementedError(
                        "HaloOperator: an integral couples dofs across "
                        "non-neighbor slabs (e.g. ghost-penalty facets on "
                        "slab boundaries); use the psum-sharded operator "
                        "or fewer partitions")

        stacked = []
        for i in range(self.n_inst):
            emax = max(len(per_slab[p][i][0]) for p in range(part.nparts))
            emax = max(emax, 1)
            nd = mats_p[i][1].shape[1]
            A = np.zeros((part.nparts, emax, nd, nd),
                         dtype=np.asarray(mats_p[i][0]).dtype)
            D = np.full((part.nparts, emax, nd), part.local_size - 1,
                        np.int64)
            for p in range(part.nparts):
                Ae, rows = per_slab[p][i]
                A[p, :len(Ae)] = Ae
                for k in range(len(rows)):
                    for j in range(nd):
                        D[p, k, j] = lofg[(p, rows[k, j])]
            stacked.append((A, D))
        self.instances = stacked

        # active mask + diagonal in local layout
        active = np.asarray(op.active) if op.active is not None else None
        ga = np.zeros((part.nparts, part.local_size), bool)
        gol = part.global_of_local
        valid = gol >= 0
        if active is not None:
            ga[valid] = active[gol[valid]]
        else:
            ga[valid] = True
        self.active_local = ga
        self.owned_mask = np.zeros((part.nparts, part.local_size), bool)
        for p in range(part.nparts):
            self.owned_mask[p, :part.n_owned[p]] = True
        self.ghost_valid = np.zeros((part.nparts, part.ghost_max), bool)
        for p in range(part.nparts):
            self.ghost_valid[p, :part.n_ghost[p]] = True

        self._shard()

    def _shard(self):
        mesh, axis = self.mesh, self.axis
        sh = NamedSharding(mesh, P(axis))
        put = lambda a: jax.device_put(jnp.asarray(a), sh)  # noqa: E731
        self.d_instances = tuple(
            (put(A), put(D)) for A, D in self.instances)
        self.d_active = put(self.active_local)
        self.d_owned = put(self.owned_mask)
        self.d_send = put(self.part.send_slots)
        self.d_ghost_valid = put(self.ghost_valid)
        self.owned_max = self.part.owned_max
        self.ghost_max = self.part.ghost_max
        self.local_size = self.part.local_size

    # -- vector layout helpers ----------------------------------------------

    def to_local(self, x_global):
        """(ndofs,) -> sharded (P, local_size)."""
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

    # -- distributed compute -------------------------------------------------

    def solve_cg(self, b_global, rtol=1e-8, maxiter=500):
        bl = self.to_local(np.asarray(b_global))
        x, it, res = _halo_cg(self, bl, rtol, maxiter)
        return self.to_global(x), int(it), float(res)


def _apply_body(instances, active, owned, send, ghost_valid, owned_max,
                ghost_max, axis, nparts, x):
    """Per-shard operator application (runs inside shard_map; every array
    has a leading length-1 shard axis)."""
    x = x[0]
    xin = jnp.where(active[0], x, 0.0)
    y = jnp.zeros_like(x)
    for A, D in instances:
        Ae, dd = A[0], D[0]
        xe = xin[dd]
        ye = jnp.einsum("eij,ej->ei", Ae, xe)
        y = y.at[dd.ravel()].add(ye.ravel())
    # ghost -> owner add: each part sends its ghost partial sums to the
    # left neighbor (their owner); parts with no right neighbor receive
    # zeros from ppermute and add them at a dummy slot
    ghost_part = jnp.where(ghost_valid[0], y[owned_max:], 0.0)
    recv = jax.lax.ppermute(ghost_part, axis,
                            [(p, p - 1) for p in range(1, nparts)])
    y = y.at[send[0]].add(recv)
    # owner -> ghost refresh: owners send the now-complete values right
    out = jax.lax.ppermute(y[send[0]], axis,
                           [(p, p + 1) for p in range(nparts - 1)])
    y = y.at[owned_max:].set(jnp.where(ghost_valid[0], out, 0.0))
    y = jnp.where(active[0], y, x)
    return y[None]


@partial(jax.jit, static_argnums=(0,))
def _halo_cg(op: HaloOperator, b, rtol, maxiter):
    mesh, axis = op.mesh, op.axis
    nparts = op.part.nparts
    spec = P(axis)

    in_specs = tuple((spec, spec) for _ in op.d_instances)

    def apply_sharded(x):
        flat = []
        for A, D in op.d_instances:
            flat += [A, D]

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=tuple([spec] * len(flat)) + (spec, spec, spec,
                                                       spec, spec),
                 out_specs=spec)
        def run(*args):
            *flat_in, active, owned, send, gvalid, xx = args
            insts = [(flat_in[2 * i], flat_in[2 * i + 1])
                     for i in range(len(op.d_instances))]
            return _apply_body(insts, active, owned, send, gvalid,
                               op.owned_max, op.ghost_max, axis, nparts,
                               xx)
        return run(*flat, op.d_active, op.d_owned, op.d_send,
                   op.d_ghost_valid, x)

    owned = op.d_owned

    def pdot(u, v):
        return jnp.sum(jnp.where(owned, u * v, 0.0))

    bb = jnp.where(op.d_active, b, 0.0)
    x = jnp.zeros_like(bb)
    r = bb - apply_sharded(x)
    p_vec = r
    rz = pdot(r, r)
    tol2 = (rtol ** 2) * rz

    def cond(state):
        x, r, p_vec, rz, it = state
        return (rz > tol2) & (it < maxiter)

    def body(state):
        x, r, p_vec, rz, it = state
        Ap = apply_sharded(p_vec)
        alpha = rz / pdot(p_vec, Ap)
        x = x + alpha * p_vec
        r = r - alpha * Ap
        rz_new = pdot(r, r)
        beta = rz_new / rz
        p_new = r + beta * p_vec
        # refresh ghosts of p_new via one apply-free exchange: reuse the
        # linearity of the update (r and Ap already carry consistent
        # ghosts, so p_new ghosts are consistent too)
        return (x, r, p_new, rz_new, it + 1)

    x, r, p_vec, rz, it = jax.lax.while_loop(
        cond, body, (x, r, p_vec, rz, 0))
    return x, it, jnp.sqrt(rz)