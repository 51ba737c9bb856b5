"""Owner-computes distributed PRODUCTION pipeline: per-slab classify ->
cut -> runtime quadrature -> element kernels feeding the distributed
grid-layout stencil solve (interior stencil + element band + cube-block
additive Schwarz + two-level coarse lattice + mixed-precision iterative
refinement) with NO serial global operator build anywhere.

This composes parallel/spipeline.py (owner-computes element sets) with
parallel/gridsolver.py (distributed stencil apply/ASM) and adds the
distributed constructions of the remaining production-stack pieces:

- the cube-ASM blocks are built from a PER-SLAB closed-form diagonal
  band fold (the same entry->cube assignment as
  stencil._build_band_fold_direct) with one cube-plane halo exchange, so
  each device inverts exactly its owned cubes' blocks;
- the exact operator diagonal is assembled per slab and halo-summed
  (the reference's scatter_rev(add), deactivate.h:181-182);
- the coarse trilinear lattice operator is a sum of per-slab congruence
  folds psum-reduced across devices, then inverted redundantly on every
  device (the classic replicated-coarse-solve of domain decomposition;
  role: PETSc AMG over the MPI partition in the reference,
  /root/reference/python/cutfemx/petsc.py:167-394, demo_poisson.py:52-58);
- iterative refinement wraps the distributed f32 CG with one f64
  distributed apply per outer step (stencil._solve_ir, distributed).

Slab layout matches ShardedStencilSolver: device p owns lattice planes
[start_p, start_p + W_p) and the cubes starting in them; locals carry
two extra halo planes on the right; entity ownership (cell -> its
cube's slab, facet -> its first cell's slab) guarantees every element
writes within [owned | right-halo-2].

Reference contract: the solve distributes over the same partition as
the assembly with no serial global stage
(/root/reference/cpp/dolfinx_custom_data/fem/assembler.h:614-717 feeding
/root/reference/python/demo/demo_poisson.py:52-58).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..mg import structured_lattice_info
from ..stencil import (_EDGE_CLASS, _coarse_1d_tables, _dense_spd_inverse,
                       _local_dof_table, _spd_inverse_device)
from .gridsolver import (_halo_accumulate, _halo_refresh, _plane_split,
                         _sgrid_apply_body, _sgrid_precond_body)
from .spipeline import (_GroupPlan, _normalize_instance_data, _pad_rows,
                        _shard_map_novma, _shard_stack,
                        _zero_instance_data, SlabContext)

__all__ = ["ShardedStencilProblem"]


def _grid_maps_host(V, mesh, lo, h_axes, degree):
    """Global dof <-> channel-grid maps (host metadata, the IndexMap
    role): grid_index (nch, N, N, N), dof_to_grid (dim,), valid mask."""
    n = int(round((mesh.vertices[:, 0].max() - lo[0]) / h_axes[0]))
    N = n + 1
    nch = 8 if degree == 2 else 1
    lat = np.round((mesh.vertices - lo) / h_axes).astype(np.int64)
    grid_index = np.full((nch, N, N, N), -1, np.int64)
    grid_index[0, lat[:, 0], lat[:, 1], lat[:, 2]] = np.arange(
        mesh.num_vertices)
    if degree == 2:
        e = mesh.edges
        la, lb = lat[e[:, 0]], lat[e[:, 1]]
        origin = np.minimum(la, lb)
        delta = np.abs(lb - la)
        ch_table = np.zeros(8, np.int64)
        for d, c in _EDGE_CLASS.items():
            ch_table[d[0] * 4 + d[1] * 2 + d[2]] = c
        code = delta[:, 0] * 4 + delta[:, 1] * 2 + delta[:, 2]
        grid_index[ch_table[code], origin[:, 0], origin[:, 1],
                   origin[:, 2]] = mesh.num_vertices + np.arange(len(e))
    valid = grid_index >= 0
    flatpos = np.zeros(V.dim, np.int64)
    pos = np.argwhere(valid)
    lin = ((pos[:, 0] * N + pos[:, 1]) * N + pos[:, 2]) * N + pos[:, 3]
    flatpos[grid_index[valid]] = lin
    return grid_index, valid, flatpos


def _host_windows(PJ, PW, coords, s2, nc):
    """Trilinear coarse windows for point sets: coords/s2 are 3-tuples of
    (B, nd) int arrays (grid coords / half-offsets). Returns
    (W3 (B, nd, 27) float64, base (B,) flat coarse-cell id)."""
    B, nd = coords[0].shape
    bi = np.arange(B)[:, None]
    di = np.arange(nd)[None, :]
    us, c0s = [], []
    for a in range(3):
        ja = PJ[coords[a], s2[a]]
        wa = PW[coords[a], s2[a]]
        c0 = ja.min(axis=1) if nd else np.zeros(B, np.int64)
        pos = ja - c0[:, None]
        if pos.size and pos.max() > 1:
            raise ValueError("coarse spacing must be >= 2")
        ua = np.zeros((B, nd, 3))
        ua[bi, di, pos] = wa[..., 0]
        ua[bi, di, pos + 1] = wa[..., 1]
        us.append(ua)
        c0s.append(c0)
    W3 = (us[0][:, :, :, None, None] * us[1][:, :, None, :, None]
          * us[2][:, :, None, None, :]).reshape(B, nd, 27)
    base = (c0s[0] * nc + c0s[1]) * nc + c0s[2]
    return W3, base


class ShardedStencilProblem:
    """End-to-end distributed cut problem on a structured background:
    owner-computes assembly + the distributed production solve.

    Parameters mirror spipeline.ShardedCutProblem: ``builder(ctx)``
    returns (a_expr, L_expr) over the slab's entity subsets (use
    spipeline.cut_poisson_builder for the flagship problem)."""

    def __init__(self, V, builder, device_mesh, axis="cells", dtype=None,
                 coarse=True):
        from ..fem import CutForm, IntegralInstance

        mesh = V.mesh
        if mesh.cell_type != "tetrahedron" or V.bs != 1 or \
                V.degree not in (1, 2):
            raise NotImplementedError(
                "ShardedStencilProblem supports scalar P1/P2 on 3D tet "
                "backgrounds")
        info = structured_lattice_info(mesh)
        if info is None:
            raise ValueError("structured background required")
        lo, n_axes, h_axes = info
        if not (n_axes == n_axes[0]).all():
            raise NotImplementedError("cubic lattice required")
        self.V = V
        self.mesh_dev = device_mesh
        self.axis = axis
        nparts = device_mesh.shape[axis]
        self.nparts = nparts
        n = int(n_axes[0])
        N = n + 1
        deg = V.degree
        nch = 8 if deg == 2 else 1
        self.n, self.N, self.nch, self.degree = n, N, nch, deg
        self.table = tuple((int(ch), (int(o[0]), int(o[1]), int(o[2])))
                           for ch, o in _local_dof_table(deg))
        L = len(self.table)
        self.L = L

        starts, widths = _plane_split(n, N, nparts)
        self.starts, self.widths = starts, widths
        Wmax = int(widths.max())
        Wext = Wmax + 2
        self.Wmax, self.Wext = Wmax, Wext
        ncubes = np.minimum(starts + widths, n) - starts
        self.ncubes = ncubes
        sh = NamedSharding(device_mesh, P(axis))
        put = lambda x: jax.device_put(jnp.asarray(x), sh)  # noqa: E731
        self._sh = sh

        # -- cell partition by cube x-plane (assembly slabs == solve slabs)
        cube_of_cell = np.arange(mesh.num_cells) // 6
        cube_x = cube_of_cell // (n * n)
        cell_part = np.clip(
            np.searchsorted(starts, cube_x, "right") - 1, 0,
            nparts - 1).astype(np.int32)
        # cubes belong to the slab of their plane; guard the boundary
        # cube column of the last slab (plane n has no cubes)
        self.cell_part = cell_part

        # -- per-slab forms over slab-local entity subsets -----------------
        a_groups: dict = {}
        L_groups: dict = {}
        a_form_by_slab = [None] * nparts
        L_form_by_slab = [None] * nparts
        std_by_slab = [None] * nparts
        full_local = np.zeros((nparts, Wmax, n, n), bool)
        for p in range(nparts):
            ctx = SlabContext(mesh, cell_part, p)
            if ctx.cells.size == 0:
                continue
            a_expr, L_expr = builder(ctx)
            if a_expr is None:
                continue
            af = CutForm(a_expr, dtype=dtype)
            a_form_by_slab[p] = af
            # standard cell instance -> interior stencil split
            std_idx = None
            for i, inst in enumerate(af.instances):
                if inst.itype == "cell" and not inst.runtime:
                    if std_idx is None or len(inst.entities) > len(
                            af.instances[std_idx].entities):
                        std_idx = i
            if std_idx is None:
                # slab entirely outside the active domain (or cut-band
                # only): every instance goes through the element path
                for inst in af.instances:
                    a_groups.setdefault(inst.origin,
                                        [None] * nparts)[p] = inst
                if L_expr is not None:
                    Lf = CutForm(L_expr, dtype=dtype)
                    L_form_by_slab[p] = Lf
                    for inst in Lf.instances:
                        L_groups.setdefault(inst.origin,
                                            [None] * nparts)[p] = inst
                continue
            std = af.instances[std_idx]
            if std.kernel.coefficients:
                raise NotImplementedError(
                    "stencil interior requires a coefficient-free "
                    "standard integrand")
            valid = (np.arange(len(std.rows_cells)) < std.n_valid
                     if std.n_valid is not None
                     else np.asarray(std.data["mask"]) > 0)
            std_cells = np.asarray(std.rows_cells)[valid]
            # owned full cubes (all 6 tets standard) — slab-local info
            count = np.zeros(n ** 3, np.int64)
            np.add.at(count, cube_of_cell[std_cells], 1)
            fullc = count == 6
            s0, nc_p = starts[p], ncubes[p]
            full_local[p, :nc_p] = fullc.reshape(n, n, n)[s0:s0 + nc_p]
            std_by_slab[p] = (std, std_cells, fullc)
            # leftover standard cells -> element path, rebuilt from mesh
            # data directly (uniform geometry; no device pulls)
            left = std_cells[~fullc[cube_of_cell[std_cells]]]
            insts = [inst for i, inst in enumerate(af.instances)
                     if i != std_idx]
            if len(left):
                data = dict(
                    coords=jnp.asarray(mesh.cell_vertex_coords[left],
                                       af.dtype),
                    h=jnp.asarray(mesh.cell_diameters()[left], af.dtype),
                    coeffs=(),
                )
                linst = IntegralInstance(
                    kernel=std.kernel, itype="cell", runtime=False,
                    entities=left, data=data, rows_cells=left)
                linst = CutForm._bucket_pad(af, linst)
                linst.origin = ("std-leftover",)
                insts.append(linst)
            for inst in insts:
                a_groups.setdefault(inst.origin, [None] * nparts)[p] = inst
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
            raise ValueError("test space must equal trial space")
        self._block = some.block
        self._a_form_by_slab = a_form_by_slab
        self._L_form_by_slab = L_form_by_slab
        self.d_cube_mask = put(full_local)

        # -- A_local probe (one interior cube; geometry is uniform) --------
        self.A_local = self._probe_A_local(V, mesh, lo, h_axes,
                                           std_by_slab, cube_of_cell)

        # -- global dof <-> grid maps (host metadata) -----------------------
        grid_index, gvalid, d2g = _grid_maps_host(V, mesh, lo, h_axes, deg)
        self._d2g = d2g
        self._grid_index = grid_index
        self._grid_valid = gvalid

        def g2l(p, dofs):
            """Global blocked dofs -> slab-local extended flat grid ids."""
            pos = d2g[np.asarray(dofs)]
            ch = pos // N ** 3
            rem = pos % N ** 3
            lx = rem // N ** 2 - starts[p]
            if pos.size and (lx.min() < 0 or lx.max() >= Wext):
                raise ValueError(
                    "element couples dofs outside the slab window")
            return (ch * Wext + lx) * N ** 2 + rem % N ** 2

        # -- element groups: matrices ON DEVICE per shard -------------------
        def make_plan(insts):
            ref = next(i for i in insts if i is not None)
            E = max(i.rows_cells.shape[0] for i in insts if i is not None)
            Q = None
            if ref.runtime:
                Q = max(np.asarray(i.data["weights"]).shape[1]
                        for i in insts if i is not None)
            return _GroupPlan(ref.kernel, ref.itype, E, Q, None)

        def group_rows(insts, form_by_slab, plan, cols=False):
            per_slab = []
            nd = None
            from ..fem import CutForm as _CF
            for p, inst in enumerate(insts):
                if inst is None:
                    per_slab.append(None)
                    continue
                f = form_by_slab[p] or some
                r = np.asarray(_CF._entity_dofs(f, V, inst))
                loc = g2l(p, r)
                loc = _pad_rows(loc, plan.E)
                per_slab.append(loc.astype(np.int32))
                nd = loc.shape[1]
            for p in range(nparts):
                if per_slab[p] is None:
                    # zero-mask slabs scatter exactly-zero matrices; any
                    # in-range target works — use slot 0
                    per_slab[p] = np.zeros((plan.E, nd), np.int32)
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
            data_sharded = jax.tree.map(
                lambda *leaves: _shard_stack(leaves, device_mesh, axis),
                *datas)
            D = _shard_stack(rows, device_mesh, axis)
            return data_sharded, D, rows

        d_insts = []
        self._host_rows = []        # (plan, rows-per-slab) for coarse fold
        gsize_l = nch * Wext * N * N
        self.gsize_l = gsize_l
        for origin in sorted(a_groups, key=str):
            insts = a_groups[origin]
            plan = make_plan(insts)
            data_sharded, D, rows = shard_group(insts, a_form_by_slab,
                                                plan)
            kfn = plan.kernel._get("matrix", self.dtype, self._block)

            @_shard_map_novma(mesh=device_mesh, in_specs=P(axis),
                              out_specs=P(axis))
            def build_mats(data, _kfn=kfn):
                local = jax.tree.map(lambda a: a[0], data)
                return _kfn(local)[None]

            A = build_mats(data_sharded)
            d_insts.append((A, D, D))
            self._host_rows.append((plan, insts, rows))
        self.d_insts = tuple(d_insts)

        # -- active / identity grids (halo-consistent) ----------------------
        act = np.zeros((nparts, gsize_l), bool)
        for (plan, insts, rows) in self._host_rows:
            for p, inst in enumerate(insts):
                if inst is None:
                    continue
                nval = inst.n_valid if inst.n_valid is not None else \
                    int((np.asarray(inst.data["mask"]) > 0).sum())
                act[p][rows[p][:nval].ravel()] = True
        # interior stencil activity: all slots of owned full cubes and of
        # the std instance's cells (== dofs of std cells; full cubes'
        # slots cover exactly those for full cubes)
        for p in range(nparts):
            if std_by_slab[p] is None:
                continue
            _, std_cells, _ = std_by_slab[p]
            act[p][g2l(p, V.blocked_dofmap[std_cells]).ravel()] = True
        d_act_f = _shard_stack(
            [act[p].astype(np.float32) for p in range(nparts)],
            device_mesh, axis)
        valid_l = np.zeros((nparts, nch, Wext, N, N), bool)
        for p in range(nparts):
            s = starts[p]
            e = min(s + Wext, N)
            valid_l[p, :, :e - s] = gvalid[:, s:e]
        self.d_W = put(np.asarray(widths, np.int32)[:, None])
        owned = np.zeros((nparts, 1, Wext, 1, 1), bool)
        for p in range(nparts):
            owned[p, 0, :widths[p]] = True
        self.d_owned_planes = put(owned)
        d_act = self._halo_or(d_act_f)
        d_valid = put(valid_l.reshape(nparts, gsize_l))
        self.d_active = (d_act & d_valid).reshape(
            nparts, nch, Wext, N, N)
        self.d_identity = jnp.logical_and(
            d_valid, ~d_act).reshape(nparts, nch, Wext, N, N)

        # -- RHS assembled per slab on device + halo accumulation -----------
        b_local = jax.device_put(
            jnp.zeros((nparts, gsize_l), self.dtype), sh)
        for origin in sorted(L_groups, key=str):
            insts = L_groups[origin]
            plan = make_plan(insts)
            data_sharded, D, _ = shard_group(insts, L_form_by_slab, plan)
            kfn = plan.kernel._get("vector", self.dtype,
                                   (self._block[0], None))

            @_shard_map_novma(mesh=device_mesh,
                              in_specs=(P(axis), P(axis)),
                              out_specs=P(axis))
            def build_vec(data, DD, _kfn=kfn):
                local = jax.tree.map(lambda a: a[0], data)
                be = _kfn(local)
                b = jnp.zeros(gsize_l, be.dtype)
                b = b.at[DD[0].ravel()].add(be.ravel())
                return b[None]

            b_local = b_local + build_vec(data_sharded, D)
        b_local = self._halo_sum_grid(b_local.reshape(
            nparts, nch, Wext, N, N))
        self.b_local = jnp.where(self.d_active, b_local, 0.0)

        # -- distributed cube-ASM build --------------------------------------
        self._build_asm_distributed(put)

        # -- distributed coarse level -----------------------------------------
        self.coarse = bool(coarse)
        if self.coarse:
            self._build_coarse_distributed(put, std_by_slab, cube_of_cell,
                                           g2l)

    # ------------------------------------------------------------------

    def _probe_A_local(self, V, mesh, lo, h_axes, std_by_slab,
                       cube_of_cell):
        """Local cube matrix from ONE interior full cube (translation
        invariance makes any full cube representative; mirrors
        stencil.StencilCutOperator's probe)."""
        n = self.n
        L = self.L
        probe = None
        for p in range(self.nparts):
            if std_by_slab[p] is None:
                continue
            std, std_cells, fullc = std_by_slab[p]
            idx = np.flatnonzero(fullc)
            for c in idx:
                i, j, k = c // (n * n), (c // n) % n, c % n
                if 0 < i < n - 1 and 0 < j < n - 1 and 0 < k < n - 1:
                    probe = (std, int(c))
                    break
            if probe is None and len(idx):
                probe = (std, int(idx[0]))
            if probe is not None:
                break
        if probe is None:
            raise ValueError("no fully-standard cube found")
        std, cube = probe
        probe_cells = cube * 6 + np.arange(6)
        data = dict(
            coords=jnp.asarray(mesh.cell_vertex_coords[probe_cells],
                               self.dtype),
            h=jnp.asarray(mesh.cell_diameters()[probe_cells], self.dtype),
            coeffs=(),
            mask=jnp.ones(6, self.dtype),
        )
        Ae6 = np.asarray(std.kernel.assemble_matrix(data, self.dtype,
                                                    self._block))
        # dof -> slot map of the probe cube
        origin = np.array([cube // (n * n), (cube // n) % n, cube % n])
        slot_of = {}
        for s, (ch, off) in enumerate(self.table):
            tgt = origin + np.array(off)
            if ch == 0:
                vid = ((tgt[0] * (n + 1) + tgt[1]) * (n + 1) + tgt[2])
                slot_of[vid] = s
            else:
                delta = [k for k, v in _EDGE_CLASS.items() if v == ch][0]
                a = tgt
                b = tgt + np.array(delta)
                va = ((a[0] * (n + 1) + a[1]) * (n + 1) + a[2])
                vb = ((b[0] * (n + 1) + b[1]) * (n + 1) + b[2])
                key = np.sort([va, vb])
                eidx = np.flatnonzero(
                    (mesh.edges[:, 0] == key[0])
                    & (mesh.edges[:, 1] == key[1]))[0]
                slot_of[mesh.num_vertices + eidx] = s
        A_local = np.zeros((L, L))
        bd = V.blocked_dofmap
        for t in range(6):
            dofs = bd[probe_cells[t]]
            ls = [slot_of[d] for d in dofs]
            for a_, la in enumerate(ls):
                for b_, lb in enumerate(ls):
                    A_local[la, lb] += Ae6[t, a_, b_]
        return jnp.asarray(A_local, self.dtype)

    # -- halo primitives on (P, nch, Wext, N, N) grids -----------------------

    def _halo_sum_grid(self, Y):
        spec = P(self.axis)

        @partial(jax.shard_map, mesh=self.mesh_dev,
                 in_specs=(spec, spec), out_specs=spec)
        def run(YY, W):
            Z = _halo_accumulate(self, YY[0], W[0, 0])
            return _halo_refresh(self, Z, W[0, 0])[None]

        return run(Y, self.d_W)

    def _halo_or(self, yf):
        """(P, gsize_l) float activity -> halo-consistent bool."""
        Y = yf.reshape(self.nparts, self.nch, self.Wext, self.N, self.N)
        return (self._halo_sum_grid(Y) > 0).reshape(self.nparts,
                                                    self.gsize_l)

    # -- distributed ASM ------------------------------------------------------

    def _build_asm_distributed(self, put):
        """Per-slab diag band fold + cube-plane exchange + reconstruction
        + finishing + batched inversion of OWNED cubes' blocks only."""
        n, N, L = self.n, self.N, self.L
        Wmax, Wext, nch = self.Wmax, self.Wext, self.nch
        table = self.table
        # slot lut + per-channel axis-offset availability (closed form)
        lut = -np.ones((nch, 2, 2, 2), np.int64)
        for s, (ch, (dx, dy, dz)) in enumerate(table):
            lut[ch, dx, dy, dz] = s
        h0 = np.zeros((nch, 3), np.int32)
        h1 = np.zeros((nch, 3), np.int32)
        for chn, (dx, dy, dz) in table:
            for a, o in enumerate((dx, dy, dz)):
                (h0 if o == 0 else h1)[chn, a] = 1
        lutf = jnp.asarray(np.maximum(lut.reshape(-1), 0).astype(np.int32))
        h01 = jnp.asarray(np.stack([h0, h1]))
        d_start = put(np.asarray(self.starts, np.int32)[:, None])
        d_nc = put(np.asarray(self.ncubes, np.int32)[:, None])
        # shared interior inverse: A_local + uniform exact diagonal
        A_loc = np.array(self.A_local, np.float64)
        iid, jjd = np.diag_indices(L)
        dloc = np.diag(A_loc)
        ch_of = np.array([ch for ch, _ in table])
        d_uni = np.array([dloc[ch_of == ch_of[s]].sum() for s in range(L)])
        B_int = A_loc.copy()
        B_int[iid, jjd] = d_uni
        from ..stencil import _spd_clamp_inverse
        inv_int = jnp.asarray(_spd_clamp_inverse(B_int[None])[0]
                              .astype(np.float32), self.dtype)

        spec = P(self.axis)
        flat_insts = []
        for A, R, C in self.d_insts:
            flat_insts += [A, R, C]
        n_inst = len(self.d_insts)
        slv = self

        @_shard_map_novma(mesh=self.mesh_dev,
                          in_specs=(spec,) * (5 + len(flat_insts)),
                          out_specs=(spec, spec, spec))
        def build(cmask, W, start, nc_own, d_act_grid, *flat):
            insts = [(flat[3 * i][0], flat[3 * i + 1][0])
                     for i in range(n_inst)]
            return _slab_asm_build(
                slv, lutf, h01, inv_int, cmask[0], W[0, 0],
                start[0, 0], nc_own[0, 0], d_act_grid[0], insts)

        binv, covered, diag = build(
            self.d_cube_mask, self.d_W, d_start, d_nc, self.d_active,
            *flat_insts)
        self.d_binv = binv
        self.d_covered = covered
        self.d_diag = diag    # halo-consistent exact diagonal (grid layout)

    # -- distributed coarse level ---------------------------------------------

    def _build_coarse_distributed(self, put, std_by_slab, cube_of_cell,
                                  g2l):
        """Per-slab congruence folds of the exact Galerkin coarse operator
        (host windows + device folds, mirroring stencil._coarse_galerkin),
        psum-reduced and inverted redundantly on every device."""
        n, N, L = self.n, self.N, self.L
        nch, Wext = self.nch, self.Wext
        nparts = self.nparts
        m = 2
        while (-(-n // m) + 1) ** 3 > 10000:
            m += 1
        K, W0, Wh, PJ, PW = _coarse_1d_tables(n, m)
        nc = K - 1
        self._c_m, self._c_K = m, K
        sub = np.zeros((nch, 3), np.int64)
        for delta, ch in _EDGE_CLASS.items():
            if ch < nch:
                sub[ch] = delta
        self._c_sel = tuple(tuple(int(v) for v in sub[ch])
                            for ch in range(nch))

        offs = np.array([off for _, off in self.table])
        chs = np.array([ch for ch, _ in self.table])
        s2_slot = sub[chs]                                  # (L, 3)

        # per-slab fold jobs: (W3r, W3c, base, rows_l, cols_l, Ae_ref)
        # full owned cubes (shared A_local, UNMASKED — matches serial)
        full_jobs = []        # per slab: (W3 (C, L, 27), base (C,), slots)
        Cmax = 1
        for p in range(nparts):
            if std_by_slab[p] is None:
                full_jobs.append(None)
                continue
            _, _, fullc = std_by_slab[p]
            s0, ncp = self.starts[p], self.ncubes[p]
            own = np.zeros(n ** 3, bool)
            own.reshape(n, n, n)[s0:s0 + ncp] = \
                fullc.reshape(n, n, n)[s0:s0 + ncp]
            cub = np.flatnonzero(own)
            if not len(cub):
                full_jobs.append(None)
                continue
            cpos = np.stack([cub // (n * n), (cub // n) % n, cub % n], 1)
            coords = tuple(cpos[:, a][:, None] + offs[None, :, a]
                           for a in range(3))
            s2 = tuple(np.broadcast_to(s2_slot[None, :, a],
                                       coords[a].shape) for a in range(3))
            W3, base = _host_windows(PJ, PW, coords, s2, nc)
            full_jobs.append((W3, base))
            Cmax = max(Cmax, len(cub))

        # element groups: windows over row+col position sets
        elem_jobs = []   # list over groups of per-slab (W3r, W3c, base)
        for (plan, insts, rows) in self._host_rows:
            per = []
            for p, inst in enumerate(insts):
                if inst is None:
                    per.append(None)
                    continue
                r_l = rows[p]
                # local grid ids -> GLOBAL grid coords
                def coords_of(lids):
                    lids = np.asarray(lids, np.int64)
                    ch = lids // (Wext * N * N)
                    rem = lids % (Wext * N * N)
                    gx = rem // (N * N) + self.starts[p]
                    gy = (rem // N) % N
                    gz = rem % N
                    return ch, gx, gy, gz
                ch_r, xr, yr, zr = coords_of(r_l)
                # rows == cols in these instances (square operator)
                s2r = sub[ch_r]
                W3, base = _host_windows(
                    PJ, PW, (xr, yr, zr),
                    tuple(s2r[..., a] for a in range(3)), nc)
                per.append((W3, base))
            elem_jobs.append(per)

        # -- device fold: one shard_map over all jobs -----------------------
        spec = P(self.axis)
        dt = self.dtype
        Vc = K ** 3
        acc0 = jnp.zeros((nparts, nc ** 3, 27, 27), dt)
        acc0 = jax.device_put(acc0, self._sh)

        def stack_job(per, shape_tail, dtp=None):
            """Stack per-slab job arrays ZERO-padded to the max length:
            fold kernels rely on zero window rows for padding slots
            (row-0 replication would double-count the first cube's
            Galerkin block on every shorter slab)."""
            Emaxg = max(x.shape[0] for x in per if x is not None)
            outs = []
            for x in per:
                if x is None:
                    x = np.zeros((0,) + shape_tail)
                outs.append(_pad_rows(x, Emaxg, pad_value=0).astype(
                    dtp or np.dtype(self.dtype)))
            return _shard_stack(outs, self.mesh_dev, self.axis)

        # full-cube fold
        have_full = any(j is not None for j in full_jobs)
        acc = acc0
        if have_full:
            W3s = stack_job([None if j is None else j[0]
                             for j in full_jobs], (L, 27))
            bases = stack_job([None if j is None else j[1]
                               for j in full_jobs], (), dtp=np.int32)
            A_loc = self.A_local

            @_shard_map_novma(mesh=self.mesh_dev,
                              in_specs=(spec,) * 3, out_specs=spec)
            def fold_full(accv, W3, base):
                hp = jax.lax.Precision.HIGHEST
                W = W3[0].astype(dt)
                T = jnp.einsum("clk,lm->cmk", W, A_loc, precision=hp)
                G = jnp.einsum("cmk,cmq->ckq", T, W, precision=hp)
                return accv[0].at[base[0]].add(G)[None]

            acc = fold_full(acc, W3s, bases)

        # element folds (active-masked rows AND columns)
        for (A, R, C), per in zip(self.d_insts, elem_jobs):
            W3s = stack_job([None if j is None else j[0] for j in per],
                            (R.shape[-1], 27))
            bases = stack_job([None if j is None else j[1] for j in per],
                              (), dtp=np.int32)
            acc = _coarse_fold_elem(self, acc, W3s, bases, A, R)

        # reduce + invert (replicated on every device)
        Aflat = _coarse_reduce_to_dense(nc, K, acc)
        self._c_araw = Aflat.reshape(Vc, Vc)   # pre-inversion (parity tests)
        self._c_acinv = _dense_spd_inverse(self._c_araw)
        jax.block_until_ready(self._c_acinv)

        # per-slab W tables for the distributed coarse apply
        WXr0 = np.zeros((nparts, Wext, K))
        WXrh = np.zeros((nparts, Wext, K))
        WXp0 = np.zeros((nparts, Wext, K))
        WXph = np.zeros((nparts, Wext, K))
        for p in range(nparts):
            s, w = self.starts[p], self.widths[p]
            for lx in range(Wext):
                gx = s + lx
                if gx >= N:
                    continue
                WXp0[p, lx] = W0[gx]
                WXph[p, lx] = Wh[gx]
                if lx < w:
                    WXr0[p, lx] = W0[gx]
                    WXrh[p, lx] = Wh[gx]
        self.d_WXr = (put(WXr0.astype(np.float32)),
                      put(WXrh.astype(np.float32)))
        self.d_WXp = (put(WXp0.astype(np.float32)),
                      put(WXph.astype(np.float32)))
        self._c_Wy = (jnp.asarray(W0, dt), jnp.asarray(Wh, dt))

    # -- solves ---------------------------------------------------------------

    def solve_cg(self, rtol=1e-8, maxiter=500, refine="auto"):
        """Distributed two-level (ASM + coarse) PCG with optional mixed-
        precision iterative refinement. Returns (x_global, its, true
        residual norm)."""
        from ..stencil import _f64_available
        bl = self.b_local
        if refine is True or (refine == "auto"
                              and bl.dtype == jnp.float32
                              and _f64_available()):
            return self._solve_ir(bl, rtol, maxiter)
        x, it, res = _sgridp_cg(self, bl, rtol, maxiter)
        return self.to_global(x), int(it), float(res)

    def _solve_ir(self, bl, rtol, maxiter):
        """Mixed-precision IR around the distributed f32 CG (the
        distributed form of stencil._solve_ir: one f64 distributed apply
        per outer step, f32 inner corrections)."""
        enable_x64 = jax.enable_x64
        owned = self.d_owned_planes
        act = self.d_active

        def pdot(u, v):
            return float(jnp.sum(jnp.where(owned & act, u * v, 0.0)))

        with enable_x64():
            b64 = bl.astype(jnp.float64)
            bb2 = pdot(b64, b64)
        tol2 = rtol * rtol * bb2
        x64 = None
        best_x64, best_rho2 = None, bb2
        total_its = 0
        prev_rho2 = np.inf
        rho2 = bb2
        for outer in range(11):
            if outer == 0:
                r64 = b64
                rho2 = bb2
            else:
                with enable_x64():
                    r64 = b64 - _sgridp_apply(self, x64)
                    rho2 = pdot(r64, r64)
                if np.isfinite(rho2) and rho2 < best_rho2:
                    best_x64, best_rho2 = x64, rho2
            if best_rho2 <= tol2 or total_its >= maxiter or outer == 10 \
                    or not np.isfinite(rho2) or rho2 >= 0.25 * prev_rho2:
                break
            prev_rho2 = rho2
            with enable_x64():
                r32 = r64.astype(jnp.float32)
            inner_rtol = max(1e-3, 0.5 * float(np.sqrt(
                tol2 / max(rho2, 1e-300))))
            eg, its, _ = _sgridp_cg(self, r32, inner_rtol,
                                    min(maxiter - total_its, 400))
            total_its += int(its) + 1
            with enable_x64():
                e64 = eg.astype(jnp.float64)
                x64 = e64 if x64 is None else x64 + e64
        if best_x64 is None:
            xl = jnp.zeros_like(bl)
        else:
            with enable_x64():
                xl = best_x64.astype(bl.dtype)
        return self.to_global(xl), total_its, float(np.sqrt(best_rho2))

    # -- layout helpers ---------------------------------------------------------

    def to_global(self, Xl):
        """Sharded local grid blocks -> global dof vector."""
        n, N, nch = self.n, self.N, self.nch
        Xn = np.asarray(Xl)
        G = np.zeros((nch, N, N, N), Xn.dtype)
        for p in range(self.nparts):
            s, w = self.starts[p], self.widths[p]
            G[:, s:s + w] = Xn[p, :, :w]
        return G.reshape(-1)[self._d2g]

    def to_local(self, x):
        """Global dof vector -> sharded local grid blocks (halo valid)."""
        n, N, nch, Wext = self.n, self.N, self.nch, self.Wext
        G = np.zeros((nch, N, N, N), np.asarray(x).dtype)
        G.reshape(-1)[self._d2g] = np.asarray(x)
        out = np.zeros((self.nparts, nch, Wext, N, N), G.dtype)
        for p in range(self.nparts):
            s = self.starts[p]
            e = min(s + Wext, N)
            out[p, :, :e - s] = G[:, s:e]
        return jax.device_put(jnp.asarray(out), self._sh)

    def apply_global(self, x):
        return self.to_global(_sgridp_apply(self, self.to_local(x)))

    def precond_global(self, r):
        return self.to_global(_sgridp_precond(self, self.to_local(r)))

    def b_global(self):
        return self.to_global(self.b_local)


# -- per-shard build bodies -----------------------------------------------------


def _slab_fold_diag(slv, lutf, h01, start, Rl, Ae, F):
    """Closed-form DIAGONAL band fold on slab-local ids: every element
    entry whose dofs share a cube goes to the top cube of the pair's
    containing range (identical assignment to
    stencil._build_band_fold_direct kind 0). F: flat donated accumulator
    over cube planes [-1, Wmax+2) x (n, n) x (L, L) — slab-owned
    elements reach one cube left and up to two cube planes right of the
    owned range (a facet element's upper-cell dofs sit at min+2)."""
    n, N, L = slv.n, slv.N, slv.L
    Wext, Wmax = slv.Wext, slv.Wmax
    N2 = N * N
    g = Rl.astype(jnp.int32)
    ch = g // (Wext * N2)
    rem = g % (Wext * N2)
    gx = rem // N2 + start
    gy = (rem // N) % N
    gz = rem % N
    Pp = (gx, gy, gz)
    cmin = [jnp.maximum(Pp[a] - h01[1, ch, a], 0) for a in range(3)]
    cmax = [jnp.minimum(Pp[a] - 1 + h01[0, ch, a], n - 1)
            for a in range(3)]
    A_ = [jnp.maximum(cmin[a][:, :, None], cmin[a][:, None, :])
          for a in range(3)]
    B_ = [jnp.minimum(cmax[a][:, :, None], cmax[a][:, None, :])
          for a in range(3)]
    isect = ((A_[0] <= B_[0]) & (A_[1] <= B_[1]) & (A_[2] <= B_[2]))
    c = [B_[a] for a in range(3)]
    rowp = [p[:, :, None] for p in Pp]
    colp = [p[:, None, :] for p in Pp]

    def slot(pp, cc, chs):
        dx = pp[0] - cc[0]
        dy = pp[1] - cc[1]
        dz = pp[2] - cc[2]
        return lutf[((chs * 2 + dx) * 2 + dy) * 2 + dz]

    sr = slot(rowp, c, ch[:, :, None])
    sc = slot(colp, c, ch[:, None, :])
    clx = c[0] - start + 1                    # buffer plane index
    idx = (((clx * n + c[1]) * n + c[2]) * L + sr) * L + sc
    return F.at[jnp.where(isect, idx, 0).reshape(-1)].add(
        jnp.where(isect, Ae, 0.0).reshape(-1))


def _slab_asm_build(slv, lutf, h01, inv_int, cmask, W, start,
                    nc_own, act_grid, insts):
    """Per-shard ASM build: fold -> cube-plane exchange -> reconstruction
    -> finishing -> batched inversion. Returns (binv (Wmax, n, n, L, L),
    covered (nch, Wext, N, N) bool, diag grid (nch, Wext, N, N))."""
    n, N, L = slv.n, slv.N, slv.L
    nch, Wmax, Wext = slv.nch, slv.Wmax, slv.Wext
    table = slv.table
    dt = slv.dtype
    hp = jax.lax.Precision.HIGHEST
    axis, nparts = slv.axis, slv.nparts
    z32 = jnp.int32(0)

    # -- fold
    F = jnp.zeros((Wmax + 3) * n * n * L * L, dt)
    for Ae, Rl in insts:
        F = _slab_fold_diag(slv, lutf, h01, start.astype(jnp.int32),
                            Rl.astype(jnp.int32), Ae, F)
    F = F.reshape(Wmax + 3, n, n, L, L)

    # -- cube-plane exchange: plane 0 (global cube start-1) to the left
    # neighbor's last owned cube; planes nc_own+1, nc_own+2 (the right
    # neighbor's cubes 0 and 1) to the right
    left = F[0]
    recv_r = jax.lax.ppermute(left, axis,
                              [(p, p - 1) for p in range(1, nparts)])
    F = F.at[0].set(0.0)
    idx = (nc_own.astype(jnp.int32), z32, z32, z32, z32)
    cur = jax.lax.dynamic_slice(F, idx, (1, n, n, L, L))
    F = jax.lax.dynamic_update_slice(F, cur + recv_r[None], idx)
    idx_hi = ((nc_own + 1).astype(jnp.int32), z32, z32, z32, z32)
    ghost_hi = jax.lax.dynamic_slice(F, idx_hi, (2, n, n, L, L))
    recv_l = jax.lax.ppermute(ghost_hi, axis,
                              [(p, p + 1) for p in range(nparts - 1)])
    F = jax.lax.dynamic_update_slice(
        F, jnp.zeros((2, n, n, L, L), dt), idx_hi)
    F = F.at[1:3].add(recv_l)
    # refresh the right halo cube plane (reconstruction reads cube
    # nc_own) from the neighbor's accumulated cube 0
    refreshed = jax.lax.ppermute(F[1], axis,
                                 [(p + 1, p) for p in range(nparts - 1)])
    F = jax.lax.dynamic_update_slice(F, refreshed[None], idx_hi)

    # owned-cube mask (lx < nc_own)
    ownc = (jnp.arange(Wmax, dtype=jnp.int32) <
            nc_own)[:, None, None]                       # (Wmax, 1, 1)

    # -- exact diagonal grid: element diag from owned fold blocks +
    # stencil dloc on full cubes, halo-summed
    dloc = jnp.diagonal(slv.A_local)
    Fown = jnp.where(ownc[..., None, None], F[1:1 + Wmax], 0.0)
    D = jnp.zeros((nch, Wext, N, N), dt)
    for s, (chn, (ox, oy, oz)) in enumerate(table):
        dv = Fown[:, :, :, s, s] + jnp.where(cmask, dloc[s], 0.0)
        D = D.at[chn, ox:ox + Wmax, oy:oy + n, oz:oz + n].add(dv)
    D = _halo_accumulate(slv, D, W)
    D = _halo_refresh(slv, D, W)
    Dg = jnp.where(act_grid, D, 1.0)

    # -- reconstruction: ASM_c = sum_delta P_d^T F[c+delta] P_d
    sidx = {(ch, tuple(o)): s for s, (ch, o) in enumerate(table)}
    acc = jnp.zeros((Wmax, n, n, L, L), dt)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                iperm = np.zeros(L, np.int32)
                mask = np.zeros(L, np.float32)
                for t, (chn, o) in enumerate(table):
                    src = sidx.get((chn, (o[0] - dx, o[1] - dy,
                                          o[2] - dz)))
                    if src is not None:
                        iperm[t] = src
                        mask[t] = 1.0
                if not mask.any():
                    continue
                ip = jnp.asarray(iperm)
                mk = jnp.asarray(mask, dt)
                src_b = F[1 + dx:1 + dx + Wmax, dy:n, dz:n]
                Dm = src_b[..., ip, :][..., :, ip] \
                    * (mk[:, None] * mk[None, :])
                acc = acc.at[:, :n - dy, :n - dz].add(Dm)

    # -- band cover + finishing
    eyeL = jnp.eye(L, dtype=dt)
    off = jnp.abs(acc) * (1.0 - eyeL)
    band = (off.sum((-1, -2)) > 0) & ownc                # (Wmax, n, n)
    fullo = cmask & ownc
    blocks = acc + jnp.where(fullo[..., None, None], slv.A_local, 0.0)
    # slot gathers of the exact diagonal + active mask
    Df = Dg.reshape(-1)
    af = act_grid.reshape(-1)
    cx = jnp.arange(Wmax, dtype=jnp.int32)[:, None, None, None]
    cy = jnp.arange(n, dtype=jnp.int32)[None, :, None, None]
    cz = jnp.arange(n, dtype=jnp.int32)[None, None, :, None]
    tch = jnp.asarray(np.array([ch for ch, _ in table], np.int32))
    tof = np.array([o for _, o in table], np.int32)
    pos = (((tch[None, None, None, :] * Wext + cx + tof[None, None, None,
                                                        :, 0]) * N
            + cy + tof[None, None, None, :, 1]) * N
           + cz + tof[None, None, None, :, 2])           # (Wmax,n,n,L)
    d_b = Df[pos]
    a_b = af[pos]
    dmax = jnp.maximum(jnp.max(Dg), 1.0)
    dmax = jax.lax.pmax(dmax, axis)
    weak = d_b <= 1e-6 * dmax
    couple = (a_b & ~weak).astype(dt)
    blocks = blocks * couple[..., :, None] * couple[..., None, :]
    diag_vals = jnp.where(a_b, jnp.maximum(d_b, 1e-30 * dmax), 1.0)
    ii = jnp.arange(L)
    blocks = blocks.at[..., ii, ii].set(diag_vals)
    # invert band blocks only (identity placeholder elsewhere)
    sel = band[..., None, None]
    blk_inv_in = jnp.where(sel, blocks, eyeL).reshape(-1, L, L)
    inv = _spd_inverse_device(blk_inv_in).reshape(Wmax, n, n, L, L)
    binv = jnp.where(sel, inv,
                     jnp.where((fullo & ~band)[..., None, None],
                               inv_int, 0.0))
    # covered slots: slots of band|full cubes, halo-consistent
    has = (band | fullo).astype(dt)
    Cov = jnp.zeros((nch, Wext, N, N), dt)
    for s, (chn, (ox, oy, oz)) in enumerate(table):
        Cov = Cov.at[chn, ox:ox + Wmax, oy:oy + n, oz:oz + n].add(has)
    Cov = _halo_accumulate(slv, Cov, W)
    Cov = _halo_refresh(slv, Cov, W)
    covered = Cov > 0
    return binv[None], covered[None], Dg[None]


# -- coarse fold + apply ---------------------------------------------------------


def _coarse_fold_elem(slv, acc, W3s, bases, A, R):
    """acc[base] += (act W_r)^T Ae (act W_c) per slab-owned element."""
    spec = P(slv.axis)
    dt = slv.dtype

    @_shard_map_novma(mesh=slv.mesh_dev, in_specs=(spec,) * 6,
                      out_specs=spec)
    def run(accv, W3, base, Ae, Rl, act):
        hp = jax.lax.Precision.HIGHEST
        E = Ae[0].shape[0]
        af = act[0].reshape(-1)
        mask = af[Rl[0]].astype(dt)[..., None]          # (E, nd, 1)
        W = W3[0, :E].astype(dt) * mask
        T = jnp.einsum("elm,elp->emp", Ae[0], W, precision=hp)
        G = jnp.einsum("emp,emq->epq", T, W, precision=hp)
        return accv[0].at[base[0, :E]].add(G)[None]

    return run(acc, W3s, bases, A, R, slv.d_active)


@partial(jax.jit, static_argnums=(0, 1))
def _coarse_reduce_to_dense(nc, K, acc_stack):
    """Sum per-slab coarse window accumulators across devices and convert
    to the dense coarse matrix (replicated)."""
    from ..stencil import _coarse_acc_to_dense
    return _coarse_acc_to_dense(nc, K, jnp.sum(acc_stack, axis=0))


def _sgridp_coarse_body(slv, R, active, WXr0, WXrh, WXp0, WXph, Acinv):
    """Distributed coarse correction: per-slab restriction (owned planes
    only) -> psum -> redundant dense solve -> local prolongation."""
    hp = jax.lax.Precision.HIGHEST
    K = slv._c_K
    nch, N = slv.nch, slv.N
    Wy = slv._c_Wy
    WXr = (WXr0, WXrh)
    WXp = (WXp0, WXph)
    chsel = slv._c_sel
    Rm = jnp.where(active, R, 0.0)
    rc = jnp.zeros((K, K, K), R.dtype)
    for ch in range(nch):
        sx, sy, sz = chsel[ch]
        t = jnp.tensordot(Rm[ch], Wy[sz].astype(R.dtype),
                          axes=((2,), (0,)), precision=hp)  # (Wext, N, K)
        t = jnp.tensordot(t, Wy[sy].astype(R.dtype), axes=((1,), (0,)),
                          precision=hp)                     # (Wext, Kz, Ky)
        t = jnp.tensordot(t, WXr[sx].astype(R.dtype), axes=((0,), (0,)),
                          precision=hp)                     # (Kz, Ky, Kx)
        rc = rc + t.transpose(2, 1, 0)
    rc = jax.lax.psum(rc, slv.axis)
    zc = jnp.matmul(Acinv.astype(R.dtype), rc.reshape(-1), precision=hp)
    Zc = zc.reshape(K, K, K)
    Z = []
    for ch in range(nch):
        sx, sy, sz = chsel[ch]
        t = jnp.tensordot(WXp[sx].astype(R.dtype), Zc, axes=((1,), (0,)),
                          precision=hp)                     # (Wext, Ky, Kz)
        t = jnp.tensordot(Wy[sy].astype(R.dtype), t, axes=((1,), (1,)),
                          precision=hp)                     # (y, Wext, Kz)
        t = jnp.tensordot(Wy[sz].astype(R.dtype), t, axes=((1,), (2,)),
                          precision=hp)                     # (z, y, Wext)
        Z.append(t.transpose(2, 1, 0))
    Zs = jnp.stack(Z)
    return jnp.where(active, Zs, 0.0)


# -- distributed solve programs ---------------------------------------------------


def _sgridp_make_ops(slv):
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

    if slv.coarse:
        @partial(jax.shard_map, mesh=mesh, in_specs=(spec,) * 10,
                 out_specs=spec)
        def precond_run(R, active, binv, covered, W, Wr0, Wrh, Wp0, Wph,
                        Acinv_s):
            z = _sgrid_precond_body(slv, R[0], active[0], binv[0],
                                    covered[0], W[0, 0])
            zc = _sgridp_coarse_body(slv, R[0], active[0], Wr0[0], Wrh[0],
                                     Wp0[0], Wph[0], Acinv_s[0])
            return (z + zc)[None]
    else:
        @partial(jax.shard_map, mesh=mesh, in_specs=(spec,) * 5,
                 out_specs=spec)
        def precond_run(R, active, binv, covered, W):
            return _sgrid_precond_body(slv, R[0], active[0], binv[0],
                                       covered[0], W[0, 0])[None]

    def apply_fn(X):
        return apply_run(X, slv.d_active, slv.d_identity, slv.d_cube_mask,
                         slv.d_W, *flat_insts)

    def precond_fn(R):
        if slv.coarse:
            P_ = slv.nparts
            Ac = jnp.broadcast_to(slv._c_acinv[None],
                                  (P_,) + slv._c_acinv.shape)
            return precond_run(R, slv.d_active, slv.d_binv, slv.d_covered,
                               slv.d_W, slv.d_WXr[0], slv.d_WXr[1],
                               slv.d_WXp[0], slv.d_WXp[1], Ac)
        return precond_run(R, slv.d_active, slv.d_binv, slv.d_covered,
                           slv.d_W)

    return apply_fn, precond_fn


@partial(jax.jit, static_argnums=(0,))
def _sgridp_apply(slv, X):
    apply_fn, _ = _sgridp_make_ops(slv)
    return apply_fn(X)


@partial(jax.jit, static_argnums=(0,))
def _sgridp_precond(slv, R):
    _, precond_fn = _sgridp_make_ops(slv)
    return precond_fn(R)


@partial(jax.jit, static_argnums=(0,))
def _sgridp_cg(slv, b, rtol, maxiter):
    """Distributed two-level PCG over sharded grid blocks."""
    apply_fn, precond_fn = _sgridp_make_ops(slv)
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
    return x, it, jnp.sqrt(pdot(r, r))
