"""Owner-computes sharded cut pipeline: classify -> cut -> quadrature ->
assemble -> solve with NO global element set on any host.

The TPU-native counterpart of the reference's per-rank locality
(/root/reference/cpp/cutfemx/cut/cut.cpp:845-868 — each MPI rank
classifies and cuts only its local cells;
cpp/dolfinx_custom_data/fem/assembler.h:614-717 — element loops run over
local entities; deactivate.h:181-182 — ghost accumulation via scatters):

- cells partition into geometric slabs with one-cell ghost layers
  (halo.build_slab_partition);
- each slab classifies ITS OWN cells (+ ghost layer) against the level
  set, generates runtime quadrature for ITS OWN cut cells, and builds
  form instances over slab-local entity subsets — the entity arrays,
  quadrature tables, and coefficient gathers are all slab-sized;
- element kernels evaluate ON DEVICE inside ``shard_map``: the batched
  AD kernels (forms/compile.py) run per shard on that shard's entity
  data, so element matrices only ever exist as device-sharded arrays
  (one shard per device, built via
  ``jax.make_array_from_single_device_arrays`` — there is never a
  (P, E, nd, nd) host array either);
- assembly accumulation is a local scatter into the slab's
  [owned | ghostL | ghostR] layout plus ppermute ghost->owner adds
  (halo._halo_sync), exactly the reference's scatter_rev(add);
- the solve is the halo CG (psum dot products over owned entries).

Ownership rules (each element computed exactly once, by one slab):
- cell entities: owned by their slab;
- facet entities: owned by the slab of facet_cells[f, 0]; the other
  cell is at most one layer away, so all its dofs are slab-local.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .halo import HaloOperator, SlabPartition, build_slab_partition, \
    _halo_sync

__all__ = ["SlabContext", "ShardedCutProblem", "cut_poisson_builder",
           "activity_weights"]


def activity_weights(phi, w_out=0.2, w_in=1.0, w_cut=3.0):
    """Per-cell load weights for build_slab_partition: cut cells carry
    runtime volume + interface + ghost-penalty work, inside cells one
    standard element, outside cells none (they still cost dof storage,
    hence the small floor weight). One vectorized host classification
    pass — the global information any mesh partitioner needs."""
    from ..cut.classify import classify_entities
    from ..cut.selector import DOMAIN_INSIDE, DOMAIN_INTERSECTED
    mesh = phi.function_space.mesh
    cells = np.arange(mesh.num_cells, dtype=np.int32)
    d = classify_entities(phi, mesh.tdim, cells)
    w = np.full(mesh.num_cells, float(w_out))
    w[d == DOMAIN_INSIDE] = float(w_in)
    w[d == DOMAIN_INTERSECTED] = float(w_cut)
    return w


def cut_poisson_builder(V, phi, gamma=40.0, gp=0.1, order=None):
    """Slab builder for the flagship cut-Poisson problem (the sharded
    form of demo_poisson / bench.py: Nitsche BC on {phi=0} + ghost
    penalty on the cut band, manufactured sin-product solution).

    Returns ``builder(ctx) -> (a_expr, L_expr)`` for ShardedCutProblem.
    """
    from ..cut.api import (cut as cut_fn, ghost_penalty_facets,
                           locate_entities, runtime_quadrature)
    from ..forms.dsl import (CellDiameter, FacetNormal, SpatialCoordinate,
                             TestFunction, TrialFunction, avg, dot, grad,
                             inner, jump, pi, sin)
    from ..forms.measure import Measure
    from ..level_set import normal as ls_normal

    mesh = V.mesh
    deg = V.degree
    qorder = order or 2 * deg
    tdim = mesh.tdim

    def builder(ctx):
        cd = cut_fn(phi, entities=ctx.layer_cells, entity_dim=tdim)
        inside = ctx.own_cells(locate_entities(cd, "phi<0"))
        cut_own = ctx.own_cells(locate_entities(cd, "phi=0"))
        gpf = ctx.own_facets(ghost_penalty_facets(cd, "phi<0"))
        # runtime rules restricted to slab-owned cut cells
        if cut_own.size:
            cd_own = cut_fn(phi, entities=cut_own, entity_dim=tdim)
            vol = runtime_quadrature(cd_own, "phi<0", qorder)
            srf = runtime_quadrature(cd_own, "phi=0", qorder)
            dxo = Measure("dx", domain=mesh, subdomain_data=[inside, vol])
            dxg = Measure("dx", domain=mesh, subdomain_data=srf)
        else:
            srf = None
            dxo = Measure("dx", domain=mesh, subdomain_data=inside)
            dxg = None
        u, v = TrialFunction(V), TestFunction(V)
        x = SpatialCoordinate(mesh)
        ng = ls_normal(phi)
        h = CellDiameter(mesh)
        if tdim == 2:
            ue = sin(pi * x[0]) * sin(pi * x[1])
            f = 2 * pi ** 2 * ue
        else:
            ue = sin(pi * x[0]) * sin(pi * x[1]) * sin(pi * x[2])
            f = 3 * pi ** 2 * ue
        a = inner(grad(u), grad(v)) * dxo
        L = f * v * dxo
        if dxg is not None:
            a += (-dot(grad(u), ng) * v - dot(grad(v), ng) * u
                  + gamma / h * u * v) * dxg
            L += (-dot(grad(v), ng) * ue + gamma / h * ue * v) * dxg
        if gpf.size:
            dSg = Measure("dS", domain=mesh, subdomain_data=gpf)
            nf = FacetNormal(mesh)
            a += gp * avg(h) * inner(jump(grad(u), nf),
                                     jump(grad(v), nf)) * dSg
        return a, L

    return builder


class SlabContext:
    """Slab-local entity sets handed to the user's form builder.

    The builder mirrors the serial pipeline but restricted to this slab:

        def builder(ctx):
            cd = cfx.cut(phi, entities=ctx.layer_cells,
                         entity_dim=mesh.tdim)
            inside = ctx.own_cells(cfx.locate_entities(cd, "phi<0"))
            ...
            gp = ctx.own_facets(cfx.ghost_penalty_facets(cd, "phi<0"))
            return a_expr, L_expr
    """

    def __init__(self, mesh, cell_part, p):
        self.mesh = mesh
        self.part_index = int(p)
        self._cell_part = cell_part
        self.cells = np.flatnonzero(cell_part == p).astype(np.int32)
        # one-cell ghost layer via facet adjacency
        fc = mesh.facet_cells
        interior = fc[:, 1] >= 0
        a, b = fc[interior, 0], fc[interior, 1]
        in_p = cell_part == p
        nb = np.concatenate([b[in_p[a]], a[in_p[b]]])
        self.layer_cells = np.unique(
            np.concatenate([self.cells, nb])).astype(np.int32)

    def own_cells(self, cells):
        """Filter a cell array down to the cells this slab owns."""
        cells = np.asarray(cells, dtype=np.int32)
        return cells[self._cell_part[cells] == self.part_index]

    def own_facets(self, facets):
        """Filter a facet array down to slab-owned facets (owner = slab
        of the facet's first adjacent cell)."""
        facets = np.asarray(facets, dtype=np.int32)
        first = self.mesh.facet_cells[facets, 0]
        return facets[self._cell_part[first] == self.part_index]


def _shard_map_novma(**kw):
    """shard_map with replication tracking OFF: the element kernels
    differentiate w.r.t. jnp.zeros seeds created inside the traced
    function; those are 'replicated' values to the vma checker, so AD
    would insert a psum of the cotangent over the mesh axis — summing
    every slab's element matrices onto every device. With tracking off,
    per-shard AD stays independent (which is the semantics we want:
    each device differentiates its own slab's integrand)."""
    import inspect
    try:
        params = inspect.signature(jax.shard_map).parameters
    except (TypeError, ValueError):
        params = {"check_vma": None}
    key = "check_vma" if "check_vma" in params else "check_rep"
    return partial(jax.shard_map, **{key: False}, **kw)


def _shard_stack(per_slab, mesh_dev, axis):
    """Per-slab host/np arrays -> one device-sharded Array with a leading
    slab axis, WITHOUT ever forming the stacked array on the host."""
    devs = list(mesh_dev.devices.ravel())
    shards = [jax.device_put(jnp.asarray(a)[None], d)
              for a, d in zip(per_slab, devs)]
    shape = (len(devs),) + tuple(shards[0].shape[1:])
    sh = NamedSharding(mesh_dev, P(axis))
    return jax.make_array_from_single_device_arrays(shape, sh, shards)


def _pad_rows(arr, E, pad_value=None):
    """Pad leading axis to E (replicating row 0, or with pad_value)."""
    arr = np.asarray(arr)
    if arr.shape[0] == E:
        return arr
    pad = E - arr.shape[0]
    if arr.shape[0] == 0:
        fill = np.zeros((pad,) + arr.shape[1:], arr.dtype) \
            if pad_value is None else np.full((pad,) + arr.shape[1:],
                                              pad_value, arr.dtype)
        return fill
    rep = np.broadcast_to(arr[:1], (pad,) + arr.shape[1:])
    if pad_value is not None:
        rep = np.full((pad,) + arr.shape[1:], pad_value, arr.dtype)
    return np.concatenate([arr, rep], axis=0)


def _pad_axis(arr, axis, n, edge=False):
    """Pad one axis to length n with zeros (or edge replication)."""
    arr = np.asarray(arr)
    if arr.shape[axis] == n:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, n - arr.shape[axis])
    return np.pad(arr, pad, mode="edge" if edge else "constant")


class _GroupPlan:
    """Cross-slab uniform shapes for one instance origin."""

    def __init__(self, kernel, itype, E, Q, nd):
        self.kernel = kernel
        self.itype = itype
        self.E = E          # padded element count (uniform across slabs)
        self.Q = Q          # padded quadrature count (runtime) or None
        self.nd = nd


def _normalize_instance_data(inst, plan, dtype):
    """Pad one slab instance's data pytree to the group's uniform shapes.
    Zero-weight padding keeps the padded entries exactly zero."""
    data = dict(inst.data)
    E = plan.E
    for key in ("coords", "h", "local_facet"):
        if key in data:
            data[key] = _pad_rows(data[key], E)
    data["mask"] = _pad_axis(_pad_rows(np.asarray(data["mask"]), E,
                                       pad_value=0.0), 0, E)
    if plan.Q is not None:
        pts = _pad_rows(data["points"], E)
        wts = _pad_rows(data["weights"], E)
        data["points"] = _pad_axis(pts, 1, plan.Q, edge=True)
        data["weights"] = _pad_axis(wts, 1, plan.Q)
    coeffs = tuple(_pad_rows(c, E) for c in data.get("coeffs", ()))
    data["coeffs"] = coeffs
    qfs = []
    for qf_spec, arr in zip(plan.kernel.qfields, data.get("qfields", ())):
        a = _pad_rows(arr, E)
        if plan.Q is not None:
            qaxis = 2 if getattr(qf_spec, "side_dependent", False) else 1
            a = _pad_axis(a, qaxis, plan.Q, edge=True)
        qfs.append(a)
    data["qfields"] = tuple(qfs)
    return jax.tree.map(lambda a: np.asarray(a), data)


def _zero_instance_data(donor_data):
    """Clone a slab's (already normalized) data with mask = 0: the kernel
    multiplies weights by the mask, so every element matrix is exactly
    zero; the rows point at the padding slot."""
    out = dict(donor_data)
    out["mask"] = np.zeros_like(np.asarray(donor_data["mask"]))
    return out


class ShardedCutProblem:
    """Distributed cut problem assembled owner-computes over a device mesh.

    Parameters
    ----------
    V : FunctionSpace — test == trial space (square operator).
    builder : callable(SlabContext) -> (a_expr, L_expr) — builds the
        bilinear and linear FormExpr over THIS SLAB's entity subsets.
        May return (None, None) for slabs with no active entities.
    device_mesh : jax.sharding.Mesh (1D).
    """

    def __init__(self, V, builder, device_mesh, axis="cells", dtype=None,
                 weights=None):
        from ..fem import CutForm

        self.V = V
        self.mesh_dev = device_mesh
        self.axis = axis
        nparts = device_mesh.shape[axis]
        self.part = build_slab_partition(V, nparts, weights=weights)
        part = self.part

        # -- per-slab form construction (slab-local entities only) -------
        a_groups: dict = {}
        L_groups: dict = {}
        a_form_by_slab = [None] * nparts
        L_form_by_slab = [None] * nparts
        self.element_counts = np.zeros(nparts, np.int64)
        for p in range(nparts):
            ctx = SlabContext(V.mesh, part.cell_part, p)
            if ctx.cells.size == 0:
                continue
            a_expr, L_expr = builder(ctx)
            if a_expr is not None:
                af = CutForm(a_expr, dtype=dtype)
                a_form_by_slab[p] = af
                for inst in af.instances:
                    a_groups.setdefault(inst.origin,
                                        [None] * nparts)[p] = inst
                self.element_counts[p] = sum(
                    int((np.asarray(i.data["mask"]) > 0).sum())
                    for i in af.instances)
            if L_expr is not None:
                Lf = CutForm(L_expr, dtype=dtype)
                L_form_by_slab[p] = Lf
                for inst in Lf.instances:
                    L_groups.setdefault(inst.origin,
                                        [None] * nparts)[p] = inst
        some = next((f for f in a_form_by_slab if f is not None), None)
        if some is None:
            raise ValueError("no slab produced any integral instance")
        self.dtype = some.dtype
        if some.test_space is not some.trial_space:
            raise ValueError(
                "ShardedCutProblem requires test space == trial space")

        # -- uniform padded shapes per group ------------------------------
        def make_plan(insts, rank2):
            ref = next(i for i in insts if i is not None)
            E = max(i.rows_cells.shape[0] for i in insts if i is not None)
            Q = None
            if ref.runtime:
                Q = max(np.asarray(i.data["weights"]).shape[1]
                        for i in insts if i is not None)
            nd = None
            return _GroupPlan(ref.kernel, ref.itype, E, Q, nd)

        # -- device-sharded element data + local dof rows ------------------
        sh = NamedSharding(self.mesh_dev, P(axis))

        def group_rows(insts, form_by_slab, plan):
            """(P, E, nd) LOCAL slot rows (padding slot when absent)."""
            pad_slot = part.local_size - 1
            per_slab = []
            nd = None
            for p, inst in enumerate(insts):
                if inst is None:
                    per_slab.append(None)
                    continue
                f = form_by_slab[p]
                r = np.asarray(f._entity_dofs(V, inst))
                loc = part.locals_of_globals(p, r)
                # padded elements (mask == 0) scatter zero matrices; send
                # them to the padding slot anyway
                mask = np.asarray(inst.data["mask"]) > 0
                loc[~mask[:len(loc)]] = pad_slot
                loc = _pad_rows(loc, plan.E, pad_value=pad_slot)
                per_slab.append(loc)
                nd = loc.shape[1]
            for p in range(nparts):
                if per_slab[p] is None:
                    per_slab[p] = np.full((plan.E, nd), pad_slot, np.int64)
            return per_slab

        def shard_group(insts, form_by_slab, plan):
            rows = group_rows(insts, form_by_slab, plan)
            datas = [None] * nparts
            donor = None
            for p, inst in enumerate(insts):
                if inst is not None:
                    datas[p] = _normalize_instance_data(inst, plan,
                                                        self.dtype)
                    donor = datas[p]
            for p in range(nparts):
                if datas[p] is None:
                    datas[p] = _zero_instance_data(donor)
            # leaf-wise shard stacking (no host concat)
            data_sharded = jax.tree.map(
                lambda *leaves: _shard_stack(leaves, self.mesh_dev, axis),
                *datas)
            D = _shard_stack(rows, self.mesh_dev, axis)
            return data_sharded, D

        # -- element matrices computed ON DEVICE inside shard_map ----------
        d_instances = []
        for origin in sorted(a_groups):
            insts = a_groups[origin]
            plan = make_plan(insts, rank2=True)
            data_sharded, D = shard_group(insts, a_form_by_slab, plan)
            kfn = plan.kernel._get("matrix", self.dtype, some.block)

            @_shard_map_novma(mesh=self.mesh_dev, in_specs=P(axis),
                              out_specs=P(axis))
            def build_mats(data, _kfn=kfn):
                local = jax.tree.map(lambda a: a[0], data)
                return _kfn(local)[None]

            A = build_mats(data_sharded)
            d_instances.append((A, D))

        # -- active mask: locally-touched dofs, halo-consistent -------------
        touched = np.zeros((nparts, part.local_size), bool)
        for origin, insts in a_groups.items():
            plan = make_plan(insts, rank2=True)
            rows = group_rows(insts, a_form_by_slab, plan)
            for p, inst in enumerate(insts):
                if inst is None:
                    continue
                mask = np.asarray(inst.data["mask"]) > 0
                touched[p][rows[p][:len(mask)][mask].ravel()] = True
        touched[:, part.local_size - 1] = False  # padding slot
        d_touched = _shard_stack(
            [touched[p].astype(np.float32) for p in range(nparts)],
            self.mesh_dev, axis)

        self.op = HaloOperator.from_device(part, self.mesh_dev,
                                           d_instances, None, axis=axis)
        # ghost->owner OR + owner->ghost refresh makes slabs agree on
        # activity contributed by neighbor-slab elements
        d_active = self._halo_sum(d_touched) > 0
        gol_valid = _shard_stack(
            [part.global_of_local[p] >= 0 for p in range(nparts)],
            self.mesh_dev, axis)
        self.op.d_active = jnp.logical_and(d_active, gol_valid)

        # -- rhs assembled per slab on device + halo accumulation -----------
        b_local = jnp.zeros((nparts, part.local_size), self.dtype)
        b_local = jax.device_put(b_local, sh)
        for origin in sorted(L_groups):
            insts = L_groups[origin]
            plan = make_plan(insts, rank2=False)
            data_sharded, D = shard_group(insts, L_form_by_slab, plan)
            kfn = plan.kernel._get("vector", self.dtype,
                                   (some.block[0], None))

            @_shard_map_novma(mesh=self.mesh_dev,
                              in_specs=(P(axis), P(axis)),
                              out_specs=P(axis))
            def build_vec(data, DD, _kfn=kfn):
                local = jax.tree.map(lambda a: a[0], data)
                be = _kfn(local)                      # (E, nd)
                b = jnp.zeros(part.local_size, be.dtype)
                b = b.at[DD[0].ravel()].add(be.ravel())
                return b[None]

            b_local = b_local + build_vec(data_sharded, D)
        b_local = self._halo_sum(b_local)
        # zero the padding slot (absorbed padded-element scatters)
        b_local = b_local * jnp.asarray(
            np.concatenate([np.ones(part.local_size - 1), [0.0]]),
            self.dtype)
        self.b_local = jnp.where(self.op.d_active, b_local, 0.0)

    # ------------------------------------------------------------------

    def _halo_sum(self, y):
        """Ghost->owner add + owner->ghost refresh on a (P, local) array."""
        op = self.op if hasattr(self, "op") else None
        if op is None:
            raise RuntimeError("operator not built yet")
        spec = P(self.axis)

        @partial(jax.shard_map, mesh=self.mesh_dev,
                 in_specs=(spec,) * 5, out_specs=spec)
        def run(yy, sl, sr, glv, grv):
            return _halo_sync(op, yy[0], sl[0], sr[0], glv[0], grv[0])[None]

        return run(y, op.d_send_l, op.d_send_r, op.d_gl_valid,
                   op.d_gr_valid)

    def solve_cg(self, rtol=1e-8, maxiter=500):
        """Distributed CG on the owner-computes operator. Returns
        (x_global, iterations, true residual norm)."""
        from .halo import _halo_cg
        x, it, res = _halo_cg(self.op, self.b_local, rtol, maxiter)
        return self.op.to_global(x), int(it), float(res)

    def b_global(self):
        return self.op.to_global(self.b_local)
