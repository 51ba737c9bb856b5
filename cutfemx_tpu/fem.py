"""Runtime form assembly, dof deactivation, and matrix-free operators.

Mirrors the public surface of ``cutfemx.fem``
(/root/reference/python/cutfemx/fem.py): ``form``/``cut_form``,
``assemble_scalar/vector/matrix``, ``active_domain``,
``deactivate_outside``, ``zero_rows``, ``create_matrix``. The compiled
kernels come from ``forms.compile``; this module decides which entities each
integral runs over (standard vs runtime quadrature, the role of
fem.py:_create_cpp_form in the reference) and performs the global scatter.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from .forms.compile import compile_integral
from .forms.dsl import extract_arguments
from .forms.measure import (FormExpr, Integral, Measure,
                            split_subdomain_data)
from .la import MatrixCSR


def _vertex_rules(mesh, verts):
    """One-point physical-weight runtime rules hosting each vertex in an
    adjacent cell: integral = sum of integrand values at the vertices
    (the reference's IntegralType::vertex role, Form.h:34-41)."""
    from .cells import reference_cell
    from .cut.quadrature import RuntimeQuadratureRules
    verts = np.asarray(verts, np.int64)
    cells = np.asarray(mesh.cells)
    nc, nv = cells.shape
    # first adjacent cell of every mesh vertex
    flat = cells.ravel()
    order = np.argsort(flat, kind="stable")
    uniq, first = np.unique(flat[order], return_index=True)
    host_of = np.full(mesh.num_vertices, -1, np.int64)
    host_of[uniq] = order[first] // nv
    host = host_of[verts]
    if np.any(host < 0):
        raise ValueError("vertex without an adjacent cell")
    local = np.argmax(cells[host] == verts[:, None], axis=1)
    ref = reference_cell(mesh.cell_type).vertices  # (nv, tdim)
    pts = ref[local][:, None, :]                   # (n, 1, tdim)
    wts = np.ones((len(verts), 1))
    return RuntimeQuadratureRules(mesh.tdim, host, pts, wts, mesh=mesh)


def _ridge_rules(mesh, edges, degree=2):
    """Arc-length Gauss rules along mesh edges, hosted in an adjacent
    cell's reference coords (IntegralType::ridge, codim-2 in 3D)."""
    from .cells import reference_cell
    from .cut.quadrature import RuntimeQuadratureRules
    from .quadrature import gauss_legendre
    edges = np.asarray(edges, np.int64)
    ce = np.asarray(mesh.cell_edges)               # (NC, ne_local)
    nc, ne = ce.shape
    flat = ce.ravel()
    order = np.argsort(flat, kind="stable")
    uniq, first = np.unique(flat[order], return_index=True)
    host_of = np.full(mesh.num_edges, -1, np.int64)
    host_of[uniq] = order[first] // ne
    host = host_of[edges]
    if np.any(host < 0):
        raise ValueError("edge without an adjacent cell")
    local = np.argmax(ce[host] == edges[:, None], axis=1)
    cell = reference_cell(mesh.cell_type)
    refv = cell.vertices
    eview = np.asarray(cell.edges)                 # (ne_local, 2)
    la_, lb = eview[local, 0], eview[local, 1]
    A, B = refv[la_], refv[lb]
    t, w = gauss_legendre(max(1, (degree + 2) // 2))  # already on [0,1]
    pts = A[:, None, :] + t[None, :, None] * (B - A)[:, None, :]
    # physical edge lengths (affine P1 geometry)
    ev = np.asarray(mesh.edges)[edges]             # (n, 2) vertex ids
    xy = np.asarray(mesh.vertices)
    length = np.linalg.norm(xy[ev[:, 1]] - xy[ev[:, 0]], axis=1)
    wts = length[:, None] * w[None, :]
    return RuntimeQuadratureRules(mesh.tdim, host, pts, wts, mesh=mesh)

__all__ = [
    "CutForm", "form", "cut_form", "extract_blocks", "assemble_scalar",
    "assemble_vector", "assemble_matrix", "ActiveDomain", "active_domain",
    "deactivate_outside", "deactivate_outside_blocks", "zero_rows",
    "zero_block_rows", "create_matrix", "create_sparsity_pattern",
    "insert_diagonal", "CutOperator", "cut_function", "DirichletBC",
    "dirichletbc", "locate_dofs_geometrical", "locate_dofs_topological",
    "apply_lifting", "set_bc", "assemble_matrix_block",
    "assemble_vector_block", "block_offsets", "derivative",
    "newton_solve",
]


@dataclass
class IntegralInstance:
    """One (kernel, entity set) pair ready for assembly."""
    kernel: object
    itype: str
    runtime: bool
    entities: np.ndarray          # cells / facets / rule parents
    rules: object = None          # RuntimeQuadratureRules for runtime
    data: dict = None             # batched kernel inputs (jnp pytree)
    rows_cells: np.ndarray = None  # cells whose dofs receive contributions
    # (E,) for cell/ext-facet instances, (E, 2) for interior facets
    n_valid: int = None           # rows [0, n_valid) are real, the rest
    # bucket padding (host mirror of data["mask"] — avoids device pulls)
    origin: tuple = None          # (integral idx, runtime, itype): aligns
    # instances of structurally-equal forms built over different entity
    # subsets (the sharded owner-computes pipeline, parallel/spipeline.py)


class CutForm:
    """Compiled form: mesh + integral instances + argument spaces.

    ``block=(test_part, trial_part)`` restricts assembly to one block of a
    mixed form (the role of ufl.extract_blocks +
    /root/reference/python/cutfemx/fem.py block handling)."""

    def __init__(self, form_expr: FormExpr, dtype=None, block=None):
        if not isinstance(form_expr, FormExpr):
            raise TypeError("form() expects expr * measure (a FormExpr)")
        self.integrals = form_expr.integrals
        self.arguments = {}
        for itg in self.integrals:
            for key, arg in extract_arguments(itg.integrand).items():
                self.arguments.setdefault(key, arg)
        numbers = sorted({num for num, _ in self.arguments})
        self.rank = len(numbers)
        parts = {part for _, part in self.arguments}
        self.is_mixed = any(p is not None for p in parts)
        if block is None:
            if self.is_mixed:
                raise ValueError(
                    "mixed-space forms must go through fem.extract_blocks")
            block = (None, None)
        self.block = tuple(block)
        self.mesh = self._find_mesh()
        self.dtype = jnp.dtype(dtype) if dtype is not None else \
            jnp.zeros(0).dtype
        self.instances = []
        for i, itg in enumerate(self.integrals):
            for inst in self._build_instances(itg):
                inst.origin = (i, inst.runtime, inst.itype)
                self.instances.append(inst)

    # ------------------------------------------------------------------

    def _find_mesh(self):
        from .forms.dsl import traverse
        from .mesh import Mesh
        for itg in self.integrals:
            m = itg.measure.domain
            if m is not None:
                return m
            for node in traverse(itg.integrand):
                sp = getattr(node, "space", None)
                if sp is not None:
                    return sp.mesh
                fn = getattr(node, "function", None)
                if fn is not None:
                    return fn.function_space.mesh
                nm = getattr(node, "mesh", None)
                if isinstance(nm, Mesh):
                    return nm
        raise ValueError("cannot infer mesh for form")

    @property
    def test_space(self):
        a = self.arguments.get((0, self.block[0]))
        return a.space if a is not None else None

    @property
    def trial_space(self):
        a = self.arguments.get((1, self.block[1]))
        return a.space if a is not None else None

    # -- instance building --------------------------------------------------

    def _build_instances(self, itg):
        if self.rank:
            # drop integrals not contributing to this block
            keys = set(extract_arguments(itg.integrand))
            if (0, self.block[0]) not in keys:
                return []
            if self.rank == 2 and (1, self.block[1]) not in keys:
                return []
        mesh = self.mesh
        itype = itg.integral_type
        ents, rules = split_subdomain_data(itg.measure.subdomain_data)
        out = []
        if itype == "cell":
            if rules is None:
                cells = (np.arange(mesh.num_cells, dtype=np.int32)
                         if ents is None else ents)
                out.append(self._cell_instance(itg, cells))
            else:
                if ents is not None and len(ents):
                    out.append(self._cell_instance(itg, ents))
                out.append(self._runtime_cell_instance(itg, rules))
        elif itype == "exterior_facet":
            if rules is None:
                facets = (mesh.exterior_facets if ents is None else ents)
                out.append(self._exterior_facet_instance(itg, facets))
            else:
                if ents is not None and len(ents):
                    out.append(self._exterior_facet_instance(itg, ents))
                out.append(self._runtime_facet_instance(itg, rules))
        elif itype in ("vertex", "ridge"):
            # the reference's two extra custom-data integral types
            # (Form.h:34-41). Lowered onto the runtime cell path: a
            # vertex integral is a one-point physical-weight rule hosted
            # in an adjacent cell (sum of point values); a ridge
            # (codim-2) integral is a 1D Gauss rule along each edge
            # pulled back to host-cell reference coords with arc-length
            # weights. In 2D, ridge entities coincide with vertices.
            if rules is not None:
                raise ValueError(f"{itype} integrals take entity arrays, "
                                 "not runtime rules")
            if ents is None or not len(ents):
                raise ValueError(f"{itype} integrals require an entity "
                                 "array in subdomain_data")
            if itype == "vertex" or mesh.tdim == 2:
                vr = _vertex_rules(mesh, ents)
            else:
                deg = itg.measure.metadata.get("quadrature_degree", 2)
                vr = _ridge_rules(mesh, ents, deg)
            cell_itg = Integral(itg.integrand,
                                Measure("dx", domain=itg.measure.domain,
                                        metadata=itg.measure.metadata))
            out.append(self._runtime_cell_instance(cell_itg, vr))
        else:  # interior facet
            if rules is not None:
                if ents is not None and len(ents):
                    out.append(self._interior_facet_instance(itg, ents))
                out.append(self._runtime_interior_facet_instance(itg,
                                                                 rules))
            else:
                facets = mesh.interior_facets if ents is None else ents
                out.append(self._interior_facet_instance(itg, facets))
        return [self._bucket_pad(o) for o in out if o is not None]

    @staticmethod
    def _bucket(n):
        """Round entity counts up to stable buckets so re-cut steps with
        slightly different cut-cell counts reuse compiled kernels (TPU
        compiles are expensive; zero-mask padding is exact)."""
        if n <= 32:
            step = 8
        elif n <= 512:
            step = 64
        elif n <= 16384:
            step = 1024
        else:
            # keep padding waste under ~10% at large sizes (the padded
            # elements are gathered/scattered every operator apply)
            step = 2048
        return ((n + step - 1) // step) * step

    def _bucket_pad(self, inst):
        E = inst.rows_cells.shape[0]
        target = self._bucket(E)
        data = dict(inst.data)
        mask = jnp.zeros(target, self.dtype).at[:E].set(1.0)
        if target != E:
            pad = target - E

            def padded(a):
                reps = jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])
                return jnp.concatenate([a, reps], axis=0)

            for key in ("coords", "h", "points", "weights",
                        "local_facet"):
                if key in data:
                    data[key] = padded(data[key])
            for key in ("coeffs", "qfields"):
                if key in data:
                    data[key] = tuple(padded(a) for a in data[key])
            inst.rows_cells = np.concatenate(
                [inst.rows_cells,
                 np.broadcast_to(inst.rows_cells[:1],
                                 (pad,) + inst.rows_cells.shape[1:])])
        data["mask"] = mask
        inst.data = data
        inst.n_valid = E
        return inst

    def _coeff_arrays(self, coefficients, cells):
        """Gather coefficient dofs: tuple of (E, nd*bs) arrays."""
        out = []
        for f in coefficients:
            bd = f.function_space.blocked_dofmap
            if cells.ndim == 1:
                out.append(jnp.asarray(f.x, self.dtype)[bd[cells]])
            else:  # (E, 2) interior facet pairs -> (E, 2*nd*bs)
                g = jnp.asarray(f.x, self.dtype)[bd[cells]]
                out.append(g.reshape(g.shape[0], -1))
        return tuple(out)

    def _qfield_arrays(self, qfields, rules, two_sided=False):
        out = []
        for qf in qfields:
            if getattr(qf, "side_dependent", False):
                if not two_sided:
                    raise ValueError(
                        f"{qf.name} is side-aware and requires a runtime "
                        "dS measure")
                vp = jnp.asarray(qf.evaluator(rules, "+"), self.dtype)
                vm = jnp.asarray(qf.evaluator(rules, "-"), self.dtype)
                out.append(jnp.stack([vp, vm], axis=1))  # (E, 2, Q, ...)
            else:
                v = qf.evaluator(rules)
                out.append(jnp.asarray(v, self.dtype))
        return tuple(out)

    def _runtime_interior_facet_instance(self, itg, rules):
        """Runtime dS: per-facet cut rules (points in the '+' cell's
        reference coords) on interior facets — the role of the reference's
        _facet_payload_with_rows (_runintgen_adapter.py:605-680)."""
        from .forms.dsl import extract_coefficients, extract_qfields
        mesh = self.mesh
        facets = np.asarray(rules.parent_map, dtype=np.int32)
        if facets.size == 0:
            return None
        cells = mesh.facet_cells[facets]           # (E, 2)
        if (cells[:, 1] < 0).any():
            raise ValueError(
                "runtime dS rules include boundary facets")
        local = mesh.facet_local_index[facets]
        kernel = compile_integral(itg, mesh.cell_type, mesh.gdim,
                                  runtime=True)
        data = dict(
            coords=jnp.asarray(mesh.cell_vertex_coords[cells], self.dtype),
            h=jnp.asarray(mesh.cell_diameters()[cells], self.dtype),
            points=jnp.asarray(rules.points_padded, self.dtype),
            weights=jnp.asarray(rules.weights_padded, self.dtype),
            local_facet=jnp.asarray(local, jnp.int32),
            coeffs=self._coeff_arrays(extract_coefficients(itg.integrand),
                                      cells),
            qfields=self._qfield_arrays(extract_qfields(itg.integrand),
                                        rules, two_sided=True),
        )
        return IntegralInstance(kernel, "interior_facet", True, facets,
                                rules=rules, data=data, rows_cells=cells)

    def _cell_instance(self, itg, cells):
        from .forms.dsl import extract_coefficients, extract_qfields
        cells = np.asarray(cells, dtype=np.int32)
        if cells.size == 0:
            return None
        mesh = self.mesh
        kernel = compile_integral(itg, mesh.cell_type, mesh.gdim,
                                  runtime=False)
        if extract_qfields(itg.integrand):
            raise ValueError("QuadratureField terms require runtime rules")
        data = dict(
            coords=jnp.asarray(mesh.cell_vertex_coords[cells], self.dtype),
            h=jnp.asarray(mesh.cell_diameters()[cells], self.dtype),
            coeffs=self._coeff_arrays(extract_coefficients(itg.integrand),
                                      cells),
        )
        return IntegralInstance(kernel, "cell", False, cells, data=data,
                                rows_cells=cells)

    def _runtime_cell_instance(self, itg, rules):
        from .forms.dsl import extract_coefficients, extract_qfields
        mesh = self.mesh
        parents = np.asarray(rules.parent_map, dtype=np.int32)
        if parents.size == 0:
            return None
        kernel = compile_integral(itg, mesh.cell_type, mesh.gdim,
                                  runtime=True)
        data = dict(
            coords=jnp.asarray(mesh.cell_vertex_coords[parents], self.dtype),
            h=jnp.asarray(mesh.cell_diameters()[parents], self.dtype),
            points=jnp.asarray(rules.points_padded, self.dtype),
            weights=jnp.asarray(rules.weights_padded, self.dtype),
            coeffs=self._coeff_arrays(extract_coefficients(itg.integrand),
                                      parents),
            qfields=self._qfield_arrays(extract_qfields(itg.integrand),
                                        rules),
        )
        return IntegralInstance(kernel, "cell", True, parents, rules=rules,
                                data=data, rows_cells=parents)

    def _exterior_facet_instance(self, itg, facets):
        facets = np.asarray(facets, dtype=np.int32)
        if facets.size == 0:
            return None
        mesh = self.mesh
        cells = mesh.facet_cells[facets, 0]
        local = mesh.facet_local_index[facets, 0]
        from .forms.dsl import extract_coefficients
        kernel = compile_integral(itg, mesh.cell_type, mesh.gdim,
                                  runtime=False)
        data = dict(
            coords=jnp.asarray(mesh.cell_vertex_coords[cells], self.dtype),
            h=jnp.asarray(mesh.cell_diameters()[cells], self.dtype),
            local_facet=jnp.asarray(local, jnp.int32),
            coeffs=self._coeff_arrays(extract_coefficients(itg.integrand),
                                      cells),
        )
        return IntegralInstance(kernel, "exterior_facet", False, facets,
                                data=data, rows_cells=cells)

    def _runtime_facet_instance(self, itg, rules):
        mesh = self.mesh
        parents = np.asarray(rules.parent_map, dtype=np.int32)
        if parents.size == 0:
            return None
        cells = np.asarray(rules.parent_cells, dtype=np.int32)
        local = np.asarray(rules.local_facets, dtype=np.int32)
        from .forms.dsl import extract_coefficients, extract_qfields
        kernel = compile_integral(itg, mesh.cell_type, mesh.gdim,
                                  runtime=True)
        data = dict(
            coords=jnp.asarray(mesh.cell_vertex_coords[cells], self.dtype),
            h=jnp.asarray(mesh.cell_diameters()[cells], self.dtype),
            points=jnp.asarray(rules.points_padded, self.dtype),
            weights=jnp.asarray(rules.weights_padded, self.dtype),
            local_facet=jnp.asarray(local, jnp.int32),
            coeffs=self._coeff_arrays(extract_coefficients(itg.integrand),
                                      cells),
            qfields=self._qfield_arrays(extract_qfields(itg.integrand),
                                        rules),
        )
        return IntegralInstance(kernel, "exterior_facet", True, parents,
                                rules=rules, data=data, rows_cells=cells)

    def _interior_facet_instance(self, itg, facets):
        facets = np.asarray(facets, dtype=np.int32)
        if facets.size == 0:
            return None
        mesh = self.mesh
        cells = mesh.facet_cells[facets]          # (E, 2)
        if (cells[:, 1] < 0).any():
            raise ValueError("interior-facet integral over boundary facets")
        local = mesh.facet_local_index[facets]    # (E, 2)
        from .forms.dsl import extract_coefficients
        kernel = compile_integral(itg, mesh.cell_type, mesh.gdim,
                                  runtime=False)
        data = dict(
            coords=jnp.asarray(mesh.cell_vertex_coords[cells], self.dtype),
            h=jnp.asarray(mesh.cell_diameters()[cells], self.dtype),
            local_facet=jnp.asarray(local, jnp.int32),
            coeffs=self._coeff_arrays(extract_coefficients(itg.integrand),
                                      cells),
        )
        return IntegralInstance(kernel, "interior_facet", False, facets,
                                data=data, rows_cells=cells)

    # -- dof rows -----------------------------------------------------------

    def _entity_dofs(self, space, inst):
        """Global blocked dofs receiving contributions: (E, nd*bs[*2])."""
        bd = space.blocked_dofmap
        cells = inst.rows_cells
        if cells.ndim == 1:
            return bd[cells]
        g = bd[cells]                            # (E, 2, nd*bs)
        return g.reshape(g.shape[0], -1)


class DirichletBC:
    """Strong Dirichlet condition: dofs + prescribed values (the DOLFINx
    DirichletBC role the reference's demos use, demo_stokes.py:218-...)."""

    def __init__(self, value, dofs, V):
        self.function_space = V
        self.dofs = np.asarray(dofs, dtype=np.int64).ravel()
        from .functionspace import Constant, Function
        if isinstance(value, Function):
            self.values = np.asarray(value.x)[self.dofs]
        elif isinstance(value, Constant):
            v = np.asarray(value.value)
            self.values = np.broadcast_to(v.ravel()[
                self.dofs % max(V.bs, 1)] if v.size == V.bs and V.bs > 1
                else v, self.dofs.shape).astype(float)
        else:
            v = np.asarray(value, dtype=float)
            if v.ndim == 0:
                self.values = np.full(len(self.dofs), float(v))
            elif v.shape == self.dofs.shape:
                self.values = v
            elif v.size == V.bs:
                self.values = v.ravel()[self.dofs % V.bs]
            else:
                raise ValueError("cannot broadcast bc value")


def dirichletbc(value, dofs, V):
    return DirichletBC(value, dofs, V)


def locate_dofs_geometrical(V, marker):
    """Dofs whose coordinates satisfy marker(x) with x of shape (gdim, N)
    (dolfinx.fem.locate_dofs_geometrical role)."""
    coords = V.dof_coordinates
    hits = np.flatnonzero(np.asarray(marker(coords.T)))
    if V.bs == 1:
        return hits.astype(np.int64)
    return (hits[:, None] * V.bs + np.arange(V.bs)).ravel()


def locate_dofs_topological(V, dim, entities):
    """Dofs on the closure of the given facets/cells."""
    from .cut.classify import entity_closure_dofs
    scalar = np.unique(entity_closure_dofs(V, dim, entities).ravel())
    if V.bs == 1:
        return scalar.astype(np.int64)
    return (scalar[:, None] * V.bs + np.arange(V.bs)).ravel()


def set_bc(b, bcs, scale=1.0):
    """b[bc dofs] = scale * g (dolfinx.fem.set_bc role)."""
    if isinstance(b, np.ndarray):
        for bc in bcs:
            b[bc.dofs] = scale * bc.values
        return b
    for bc in bcs:
        b = b.at[jnp.asarray(bc.dofs)].set(
            scale * jnp.asarray(bc.values, b.dtype))
    return b


def apply_lifting(b, a_forms, bcs_lists, scale=1.0):
    """b -= scale * A @ g for each form/bc pair (the reference's
    apply_lifting, fem.py:604). Host CSR path."""
    b = np.array(b)
    for a, bcs in zip(a_forms, bcs_lists):
        if not bcs:
            continue
        A = assemble_matrix(a)
        g = np.zeros(a.trial_space.dim)
        for bc in bcs:
            g[bc.dofs] = bc.values
        b -= scale * (A.to_scipy() @ g)
    return b


def form(form_expr, dtype=None):
    """Compile a form expression. Mixed-space forms (arguments created
    through TrialFunctions/TestFunctions of a MixedFunctionSpace) compile
    monolithically into a MixedCutForm whose assemble_matrix /
    assemble_vector produce block-composed outputs — the reference's
    UFL-mixed + PETSc-nest path (petsc.py:330-344) without requiring
    fem.extract_blocks."""
    if not isinstance(form_expr, FormExpr):
        raise TypeError("form() expects expr * measure (a FormExpr)")
    keys = {}
    for itg in form_expr.integrals:
        keys.update(extract_arguments(itg.integrand))
    if any(part is not None for (_, part) in keys):
        return MixedCutForm(form_expr, dtype=dtype)
    return CutForm(form_expr, dtype=dtype)


cut_form = form


class MixedCutForm:
    """Monolithic view of a mixed-space form: block CutForms plus the
    concatenated dof layout [part0 | part1 | ...]."""

    def __init__(self, form_expr, dtype=None):
        keys = {}
        for itg in form_expr.integrals:
            keys.update(extract_arguments(itg.integrand))
        if any(part is None for (_, part) in keys):
            raise ValueError(
                "mixed forms must build every argument from a "
                "MixedFunctionSpace (no part-less arguments)")
        self.rank = len({num for (num, _) in keys})

        def layout(num):
            args = [a for k, a in keys.items() if k[0] == num]
            if not args:
                return []
            W = next((a.mixed for a in args if getattr(a, "mixed", None)
                      is not None), None)
            if W is not None:
                return list(W.spaces)
            parts = sorted(k[1] for k in keys if k[0] == num)
            return [keys[(num, p)].space for p in parts]

        self.test_spaces = layout(0)
        self.trial_spaces = layout(1) if self.rank == 2 else []

        def make(block):
            f = CutForm(form_expr, dtype=dtype, block=block)
            return f if f.instances else None

        nt = len(self.test_spaces)
        if self.rank == 1:
            self.blocks = tuple(
                make((i, None)) if (0, i) in keys else None
                for i in range(nt))
        else:
            nu = len(self.trial_spaces)
            self.blocks = tuple(tuple(
                make((i, j)) if ((0, i) in keys and (1, j) in keys)
                else None for j in range(nu)) for i in range(nt))
        self.test_offsets = np.concatenate(
            [[0], np.cumsum([sp.dim for sp in self.test_spaces])]).astype(
                np.int64)
        self.trial_offsets = np.concatenate(
            [[0], np.cumsum([sp.dim for sp in self.trial_spaces])]).astype(
                np.int64) if self.rank == 2 else None
        some = next(b for b in _flat(self.blocks) if b is not None)
        self.dtype = some.dtype
        self.mesh = some.mesh

    @property
    def dim(self):
        return int(self.test_offsets[-1])


def _flat(blocks):
    for b in blocks:
        if isinstance(b, tuple):
            yield from _flat(b)
        else:
            yield b


@dataclass
class MixedActiveDomain:
    """Per-part active domains with monolithic offsets."""
    domains: list
    offsets: np.ndarray

    @property
    def inactive_dofs(self):
        return np.concatenate([
            d.inactive_dofs + off
            for d, off in zip(self.domains, self.offsets[:-1])])

    @property
    def active_mask(self):
        return np.concatenate([d.active_mask for d in self.domains])

    def sub(self, i):
        return self.domains[i]


def derivative(residual_expr, u, du=None):
    """Gateaux derivative of a residual form F(u; v) with respect to the
    Function ``u`` in direction TrialFunction ``du``: substitutes
    u -> u + du so the AD kernel's argument-Jacobian (evaluated at zero
    trial coefficients) is the exact Newton Jacobian at u's current
    state. The capability the reference cannot offer — its FFCx kernels
    are compiled for fixed multilinear forms."""
    from .forms.dsl import (CoefficientExpr, Sum, TrialFunction,
                            replace)
    from .forms.measure import FormExpr, Integral
    if du is None:
        du = TrialFunction(u.function_space)
    cexpr = CoefficientExpr(u)
    out = []
    for itg in residual_expr.integrals:
        new = replace(itg.integrand, {cexpr: Sum(CoefficientExpr(u), du)})
        out.append(Integral(new, itg.measure))
    return FormExpr(out)


def newton_solve(residual_expr, u, bcs=None, tol=1e-10, max_iter=20,
                 report=False):
    """Newton's method on a nonlinear residual form F(u; v) = 0 using the
    AD-exact Jacobian. Updates ``u`` in place; returns (u, iterations,
    |F| history)."""
    from .la import direct_solve
    V = u.function_space
    du = None
    hist = []
    for it in range(max_iter):
        F = form(residual_expr)
        b = np.array(assemble_vector(F))
        J_expr = derivative(residual_expr, u)
        J = form(J_expr)
        A = assemble_matrix(J, bcs=bcs)
        if bcs:
            for bc in bcs:
                b[bc.dofs] = 0.0
        norm = np.linalg.norm(b)
        hist.append(norm)
        if report:
            print(f"newton it {it}: |F| = {norm:.3e}")
        if norm < tol:
            break
        delta = direct_solve(A, b)
        u.x = u.x - jnp.asarray(delta, u.x.dtype)
    return u, len(hist), hist


def extract_blocks(form_expr, dtype=None):
    """Split a mixed-space form into per-block CutForms (the role of
    ufl.extract_blocks, demo_interface_poisson.py:263-266). Returns a
    nested tuple for rank-2 forms, a flat tuple for rank-1 forms; entries
    are None when a block has no contribution."""
    keys = {}
    for itg in form_expr.integrals:
        keys.update(extract_arguments(itg.integrand))
    test_parts = sorted({p for (num, p) in keys if num == 0},
                        key=lambda p: -1 if p is None else p)
    trial_parts = sorted({p for (num, p) in keys if num == 1},
                         key=lambda p: -1 if p is None else p)
    rank = 2 if trial_parts else 1

    def make(block):
        f = CutForm(form_expr, dtype=dtype, block=block)
        return f if f.instances else None

    if rank == 1:
        return tuple(make((tp, None)) for tp in test_parts)
    return tuple(tuple(make((tp, up)) for up in trial_parts)
                 for tp in test_parts)


# -- assembly ---------------------------------------------------------------


def assemble_scalar(f: CutForm):
    if f.rank != 0:
        raise ValueError("assemble_scalar requires a rank-0 form")
    total = jnp.zeros((), f.dtype)
    for inst in f.instances:
        total = total + inst.kernel.assemble_scalar(inst.data, f.dtype)
    return total


def assemble_vector(f):
    if isinstance(f, MixedCutForm):
        if f.rank != 1:
            raise ValueError("assemble_vector requires a rank-1 form")
        parts = [assemble_vector(b) if b is not None
                 else jnp.zeros(sp.dim, f.dtype)
                 for b, sp in zip(f.blocks, f.test_spaces)]
        return jnp.concatenate(parts)
    if f.rank != 1:
        raise ValueError("assemble_vector requires a rank-1 form")
    V = f.test_space
    parts, rows_list = [], []
    for inst in f.instances:
        be = inst.kernel.assemble_vector(inst.data, f.dtype, f.block)
        parts.append(be.ravel())
        rows_list.append(np.asarray(f._entity_dofs(V, inst)).ravel())
    if not parts:
        return jnp.zeros(V.dim, f.dtype)
    # sorted segment-sum instead of .at[].add: XLA scatters with
    # unsorted indices serialize on TPU (~1 s at bench sizes)
    flat_rows = np.concatenate(rows_list)
    perm = np.argsort(flat_rows, kind="stable")
    flat = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    return jax.ops.segment_sum(
        flat[jnp.asarray(perm.astype(np.int32))],
        jnp.asarray(flat_rows[perm].astype(np.int32)),
        num_segments=V.dim, indices_are_sorted=True)


def assemble_matrix(f: CutForm, bcs=None, extension_terms=None):
    """Assemble a rank-2 form into a host CSR matrix (oracle/direct path;
    the performance path is CutOperator). With ``bcs``, rows and columns
    of constrained dofs are zeroed with a unit diagonal (DOLFINx
    convention; pair with apply_lifting + set_bc). ``extension_terms``
    adds aggregation extension penalties (the reference's
    assemble_matrix(..., extension_terms=...), fem.py:887)."""
    if isinstance(f, MixedCutForm):
        if bcs or extension_terms:
            raise NotImplementedError(
                "bcs/extension_terms with monolithic mixed forms: apply "
                "them per block via extract_blocks")
        import scipy.sparse as sps
        grid = []
        for i, row in enumerate(f.blocks):
            r = []
            for j, blk in enumerate(row):
                if blk is None:
                    r.append(sps.csr_matrix(
                        (f.test_spaces[i].dim, f.trial_spaces[j].dim)))
                else:
                    r.append(assemble_matrix(blk).to_scipy().tocsr())
            grid.append(r)
        return MatrixCSR(sps.bmat(grid, format="csr"))
    if f.rank != 2:
        raise ValueError("assemble_matrix requires a rank-2 form")
    V, U = f.test_space, f.trial_space
    rows_all, cols_all, vals_all = [], [], []
    for inst in f.instances:
        Ae = np.asarray(inst.kernel.assemble_matrix(inst.data, f.dtype,
                                                    f.block))
        r = f._entity_dofs(V, inst)              # (E, nv)
        c = f._entity_dofs(U, inst)              # (E, nu)
        E, nv = r.shape
        nu = c.shape[1]
        rows_all.append(np.broadcast_to(r[:, :, None], (E, nv, nu)).ravel())
        cols_all.append(np.broadcast_to(c[:, None, :], (E, nv, nu)).ravel())
        vals_all.append(Ae.ravel())
    if not rows_all:
        A = MatrixCSR.from_coo([], [], [], (V.dim, U.dim))
    else:
        A = MatrixCSR.from_coo(np.concatenate(rows_all),
                               np.concatenate(cols_all),
                               np.concatenate(vals_all), (V.dim, U.dim))
    if extension_terms:
        from .extensions import assemble_extension_penalty
        terms = extension_terms if isinstance(extension_terms,
                                              (list, tuple)) \
            else [extension_terms]
        for term in terms:
            assemble_extension_penalty(A, term)
    if bcs:
        import scipy.sparse as sps
        bc_dofs = np.unique(np.concatenate([bc.dofs for bc in bcs]))
        m = A.to_scipy().tocsr()
        sel_r = np.zeros(m.shape[0], bool)
        sel_r[bc_dofs] = True
        sel_c = np.zeros(m.shape[1], bool)
        sel_c[bc_dofs[bc_dofs < m.shape[1]]] = True
        row_ids = np.repeat(np.arange(m.shape[0]), np.diff(m.indptr))
        kill = sel_r[row_ids] | sel_c[m.indices]
        m.data[kill] = 0.0
        m.eliminate_zeros()
        if V.dim == U.dim:
            d = sps.coo_matrix((np.ones(len(bc_dofs)),
                                (bc_dofs, bc_dofs)), shape=m.shape)
            m = (m + d).tocsr()
        A._m = m
    return A


def assemble_matrix_block(a_blocks, spaces=None):
    """Assemble a nested block layout [[CutForm|None]] into one monolithic
    CSR (the role of the reference's PETSc nest-matrix path,
    petsc.py:330-344). ``spaces`` gives the per-block spaces when a whole
    row/column is None."""
    import scipy.sparse as sps
    nrows = len(a_blocks)
    ncols = len(a_blocks[0])
    if spaces is None:
        spaces = [None] * nrows
        for i, row in enumerate(a_blocks):
            for blk in row:
                if blk is not None:
                    spaces[i] = blk.test_space
                    break
    dims = [sp.dim for sp in spaces]
    grid = []
    for i, row in enumerate(a_blocks):
        out_row = []
        for j, blk in enumerate(row):
            if blk is None:
                out_row.append(sps.csr_matrix((dims[i], dims[j])))
            elif isinstance(blk, MatrixCSR):
                out_row.append(blk.to_scipy().tocsr())
            else:
                out_row.append(assemble_matrix(blk).to_scipy().tocsr())
        grid.append(out_row)
    return MatrixCSR(sps.bmat(grid, format="csr"))


def assemble_vector_block(L_blocks, spaces):
    """Assemble rank-1 blocks (None -> zeros) into one concatenated
    vector."""
    out = []
    for blk, sp in zip(L_blocks, spaces):
        if blk is None:
            out.append(np.zeros(sp.dim))
        else:
            out.append(np.array(assemble_vector(blk)))
    return np.concatenate(out)


def block_offsets(spaces):
    """Cumulative dof offsets of a block layout."""
    dims = [0] + [sp.dim for sp in spaces]
    return np.cumsum(dims)


def create_sparsity_pattern(f: CutForm, extension_terms=None):
    """Sparsity of a rank-2 form as a scipy CSR structure matrix with the
    deactivation diagonal included (the reference's
    create_sparsity_pattern + insert_deactivation_diagonal,
    assembler.h:568-592). ``extension_terms`` adds bad/root dof pair
    blocks (fem.py:801-848)."""
    if f.rank != 2:
        raise ValueError("create_sparsity_pattern requires a rank-2 form")
    import scipy.sparse as sps
    V, U = f.test_space, f.trial_space
    rows, cols = [], []
    for inst in f.instances:
        r = f._entity_dofs(V, inst)
        c = f._entity_dofs(U, inst)
        E, nv = r.shape
        nu = c.shape[1]
        rows.append(np.broadcast_to(r[:, :, None], (E, nv, nu)).ravel())
        cols.append(np.broadcast_to(c[:, None, :], (E, nv, nu)).ravel())
    if V.dim == U.dim:
        diag = np.arange(V.dim)
        rows.append(diag)
        cols.append(diag)
    if extension_terms:
        from .extensions import extension_quadrature, _penalty_dofs
        terms = extension_terms if isinstance(extension_terms,
                                              (list, tuple)) \
            else [extension_terms]
        for term in terms:
            eq = extension_quadrature(term.V, term.cut_data,
                                      term.aggregation,
                                      term.quadrature_degree)
            dofs = _penalty_dofs(term.V, eq)
            nb, nd2 = dofs.shape
            rows.append(np.broadcast_to(dofs[:, :, None],
                                        (nb, nd2, nd2)).ravel())
            cols.append(np.broadcast_to(dofs[:, None, :],
                                        (nb, nd2, nd2)).ravel())
    data = np.ones(sum(len(r) for r in rows), np.int8)
    m = sps.coo_matrix((data, (np.concatenate(rows),
                               np.concatenate(cols))),
                       shape=(V.dim, U.dim)).tocsr()
    m.data[:] = 1
    return m


def insert_diagonal(A: MatrixCSR, rows, value=1.0):
    """Set ``value`` on the diagonal of the given rows (the reference's
    insert_diagonal for bc rows, fem.py:935-941)."""
    import scipy.sparse as sps
    rows = np.asarray(rows, dtype=np.int64)
    if rows.size == 0:
        return A
    # CSR-native: zero any existing diagonal entries in those rows in-place,
    # then add a COO diagonal. (lil fancy assignment materializes dense
    # blocks — a 2.85 TiB OOM at 900k dofs; see CLAUDE.md.)
    m = A.to_scipy().tocsr()
    mask = np.zeros(m.shape[0], dtype=bool)
    mask[rows] = True
    coo = m.tocoo()
    diag_hits = mask[coo.row] & (coo.row == coo.col)
    if diag_hits.any():
        m.data[diag_hits] = 0.0
    add = sps.coo_matrix((np.full(rows.size, value, dtype=m.dtype),
                          (rows, rows)), shape=m.shape)
    A._m = (m + add.tocsr()).tocsr()
    return A


def create_matrix(f: CutForm, extension_terms=None):
    """Create an empty matrix with the form's sparsity (the reference's
    create_matrix, fem.py:801-848). Host CSR path: the sparsity is implicit
    in COO assembly, so this just returns a zero matrix of the right shape."""
    V, U = f.test_space, f.trial_space
    import scipy.sparse as sps
    return MatrixCSR(sps.csr_matrix((V.dim, U.dim)))


# -- active domain / deactivation -------------------------------------------


@dataclass
class ActiveDomain:
    """Active-cell/dof bookkeeping (the reference's ActiveDomain,
    /root/reference/cpp/cutfemx/fem/deactivate.h:340-347)."""
    function_space: object
    active_cells: np.ndarray
    inactive_dofs: np.ndarray

    @property
    def active_mask(self):
        m = np.ones(self.function_space.dim, dtype=bool)
        m[self.inactive_dofs] = False
        return m


def active_domain(f, space=None):
    """Collect cells from all integral domains and mark dofs untouched by
    any of them as inactive (deactivate.h:103-183, 388-400). Mixed forms
    return a MixedActiveDomain with per-part domains and monolithic
    offsets."""
    if isinstance(f, MixedCutForm):
        doms = []
        rows = f.blocks if f.rank == 2 else [(b,) for b in f.blocks]
        for i, row in enumerate(rows):
            blk = None
            if f.rank == 2 and i < len(row) and row[i] is not None:
                blk = row[i]  # prefer the diagonal block
            else:
                blk = next((b for b in row if b is not None), None)
            sp = f.test_spaces[i]
            if blk is None:
                doms.append(ActiveDomain(
                    sp, np.zeros(0, np.int32),
                    np.arange(sp.dim, dtype=np.int32)))
            else:
                doms.append(active_domain(blk, space=sp))
        return MixedActiveDomain(doms, f.test_offsets)
    V = space or f.test_space or f.trial_space
    if V is None:
        raise ValueError("active_domain requires a form with arguments")
    cells = []
    for inst in f.instances:
        rc = inst.rows_cells
        cells.append(rc.ravel())
    if cells:
        active_cells = np.unique(np.concatenate(cells)).astype(np.int32)
    else:
        active_cells = np.zeros(0, np.int32)
    touched = np.zeros(V.dim, dtype=bool)
    touched[V.blocked_dofmap[active_cells].ravel()] = True
    inactive = np.flatnonzero(~touched).astype(np.int32)
    return ActiveDomain(V, active_cells, inactive)


def deactivate_outside(A, b, domain: ActiveDomain, diag=1.0):
    """Unit-diagonal the inactive rows and zero the rhs there
    (deactivate.h:402-418)."""
    rows = domain.inactive_dofs
    if isinstance(A, MatrixCSR):
        A.zero_rows(rows, diag=diag)
    if b is not None:
        if isinstance(b, np.ndarray):
            b[rows] = 0.0
            return A, b
        b = b.at[jnp.asarray(rows)].set(0.0)
    return A, b


def zero_rows(A: MatrixCSR, rows=None, diag=1.0, *, tol=0.0):
    """Two reference-compatible behaviors:

    - ``zero_rows(A, rows)``: zero the given rows with ``diag`` on the
      diagonal (deactivate.h:265-320 role);
    - ``zero_rows(A, tol=...)`` with no rows: RETURN the indices of rows
      whose entries are all <= tol in magnitude — the reference's
      post-deactivation diagnostic (fem.py:777-784)."""
    if rows is None:
        m = A.to_scipy().tocsr()
        sums = np.asarray(np.abs(m).sum(axis=1)).ravel()
        return np.flatnonzero(sums <= tol).astype(np.int32)
    A.zero_rows(rows, diag=diag)
    return A


def deactivate_outside_blocks(A_blocks, domains, b_blocks=None, diag=1.0):
    """Block variant: zero inactive rows in the whole block row, unit
    diagonal only in the diagonal block (deactivate.h:420-457)."""
    for i, dom in enumerate(domains):
        rows = dom.inactive_dofs
        for j, A in enumerate(A_blocks[i]):
            if A is None:
                continue
            A.zero_rows(rows, diag=diag if i == j else 0.0)
        if b_blocks is not None and b_blocks[i] is not None:
            b = b_blocks[i]
            if isinstance(b, np.ndarray):
                b[rows] = 0.0
            else:
                b_blocks[i] = b.at[jnp.asarray(rows)].set(0.0)
    return A_blocks, b_blocks


def zero_block_rows(A_blocks):
    """Rows that are identically zero across a block row — the reference's
    post-deactivation sanity check (fem.py:777-798). Returns one index
    array per block row."""
    out = []
    for row in A_blocks:
        mask = None
        for A in row:
            if A is None:
                continue
            m = A.to_scipy().tocsr()
            nz = np.abs(m).sum(axis=1).A.ravel() if hasattr(
                np.abs(m).sum(axis=1), "A") else \
                np.asarray(np.abs(m).sum(axis=1)).ravel()
            mask = nz if mask is None else mask + nz
        out.append(np.flatnonzero(mask == 0.0).astype(np.int32)
                   if mask is not None else np.zeros(0, np.int32))
    return out


def cut_function(u, cut_mesh):
    """Interpolate a background Function onto a cut visualisation mesh
    (the reference's cut_function, cpp/cutfemx/fem/interpolate.h:32-204).
    Returns a P1 Function on cut_mesh.mesh with vertex values of u."""
    from .cut.api import CutMesh
    from .functionspace import Function, FunctionSpace
    from .geometry import pullback

    if not isinstance(cut_mesh, CutMesh) or cut_mesh.mesh is None:
        raise ValueError("cut_function requires a non-empty CutMesh")
    V = u.function_space
    bg = V.mesh
    vis = cut_mesh.mesh
    Vout = FunctionSpace(vis, ("Lagrange", 1), shape=V.value_shape)
    out = Function(Vout, name=u.name, dtype=u.x.dtype)

    # vis vertices live inside their parent background cell; pull back and
    # evaluate u's basis there (vertices are duplicated per vis cell, so a
    # plain per-cell evaluation covers every dof)
    parents = cut_mesh.parent_index
    vis_coords = jnp.asarray(vis.cell_vertex_coords)      # (E, m, gdim)
    par_coords = jnp.asarray(bg.cell_vertex_coords[parents])
    ref = jax.vmap(lambda c, x: pullback(bg.cell_type, c, x))(
        par_coords, vis_coords)                            # (E, m, tdim)
    tab = V.element.tabulate(ref)                          # (E, m, nd)
    dofs = jnp.asarray(u.x).reshape(-1, V.bs)[V.dofmap[parents]]
    vals = jnp.einsum("emn,enb->emb", tab, dofs)           # (E, m, bs)
    x = jnp.zeros((Vout.num_scalar_dofs, Vout.bs), u.x.dtype)
    x = x.at[jnp.asarray(Vout.dofmap)].set(vals)
    out.x = x.reshape(-1)
    return out


# -- matrix-free operator ---------------------------------------------------


from functools import partial


@partial(jax.jit, static_argnums=(0,))
def _matfree_apply(dim, mats, rows, cols, active, x):
    """A@x with deactivated dofs passed through identically. Jitted at
    module level so rebuilding an operator on fresh data reuses the
    compiled program (shapes equal -> cache hit)."""
    xin = jnp.where(active, x, 0.0) if active is not None else x
    y = jnp.zeros(dim, x.dtype)
    for Ae, r, c in zip(mats, rows, cols):
        xe = xin[c]
        ye = jnp.einsum("eij,ej->ei", Ae, xe,
                        precision=jax.lax.Precision.HIGHEST)
        y = y.at[r.ravel()].add(ye.ravel())
    if active is not None:
        y = jnp.where(active, y, x)
    return y


@partial(jax.jit, static_argnums=(0,))
def _matfree_apply_sorted(dim, mats, cols, perm, sorted_rows, active, x):
    """A@x via a presorted scatter plan: element contributions are
    permuted into row-sorted order and reduced with a sorted segment-sum
    (XLA scatters with unsorted indices serialize on TPU; sorted
    segment_sum vectorizes)."""
    xin = jnp.where(active, x, 0.0) if active is not None else x
    parts = []
    for Ae, c in zip(mats, cols):
        xe = xin[c]
        parts.append(jnp.einsum(
            "eij,ej->ei", Ae, xe,
            precision=jax.lax.Precision.HIGHEST).ravel())
    flat = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    y = jax.ops.segment_sum(flat[perm], sorted_rows, num_segments=dim,
                            indices_are_sorted=True)
    if active is not None:
        y = jnp.where(active, y, x)
    return y


@partial(jax.jit, static_argnums=(0,))
def _matfree_diagonal(dim, mats, rows, cols, perm, sorted_rows, active,
                      dtype_probe):
    """Operator diagonal via the apply's presorted scatter plan (the
    unsorted .at[].add alternative serializes on TPU). The eq-trick sums
    every (i, j) entry whose row and column map to the same dof, which
    handles any remaining duplicate-dof elements."""
    parts = []
    for Ae, r, c in zip(mats, rows, cols):
        eq = (r[:, :, None] == c[:, None, :])
        parts.append(jnp.sum(jnp.where(eq, Ae, 0.0), axis=2).ravel())
    flat = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    d = jax.ops.segment_sum(flat[perm], sorted_rows, num_segments=dim,
                            indices_are_sorted=True)
    if active is not None:
        d = jnp.where(active, d, 1.0)
    return d


@partial(jax.jit, static_argnums=(0, 1))
def _matfree_cg(dim, precond, mats, rows, cols, perm, sorted_rows, active,
                b, rtol, maxiter):
    from .la import cg, chebyshev_preconditioner, power_iteration_lmax
    bb = jnp.where(active, b, 0.0) if active is not None else b

    def op(x):
        return _matfree_apply_sorted(dim, mats, cols, perm, sorted_rows,
                                     active, x)
    if precond == "jacobi":
        d = _matfree_diagonal(dim, mats, rows, cols, perm, sorted_rows,
                              active, b)
        M = lambda r: r / d  # noqa: E731
    elif precond == "chebyshev":
        d = _matfree_diagonal(dim, mats, rows, cols, perm, sorted_rows,
                              active, b)
        lmax = power_iteration_lmax(op, d, dim)
        M = chebyshev_preconditioner(op, d, lmax, degree=4)
    else:
        M = None
    return cg(op, bb, M=M, rtol=rtol, maxiter=maxiter)


def _merge_equal_batches(mats, rows, cols):
    """Sum element-matrix batches that address identical (rows, cols)
    (e.g. the runtime-volume and Nitsche-surface instances both run over
    the cut cells): one gather/scatter pass instead of two. mats are
    device arrays; rows/cols host int arrays."""
    out_m, out_r, out_c = [], [], []
    for m, r, c in zip(mats, rows, cols):
        for i, (rm, rr, rc) in enumerate(zip(out_m, out_r, out_c)):
            if rr.shape == r.shape and rc.shape == c.shape and \
                    out_m[i].shape == m.shape and \
                    np.array_equal(rr, r) and np.array_equal(rc, c):
                out_m[i] = rm + m
                break
        else:
            out_m.append(m)
            out_r.append(r)
            out_c.append(c)
    return out_m, out_r, out_c


@partial(jax.jit, static_argnums=(2,))
def _fold_duplicates_device(A, slot, L):
    """A_c[e, a, b] = sum over (i, j) with slot[e,i]=a, slot[e,j]=b of
    A[e, i, j], as two batched one-hot matmuls (MXU work; the host-side
    equivalent pays first-touch page faults for ~150 MB per build on
    microVM hosts)."""
    S = (slot[:, :, None] == jnp.arange(L)[None, None, :]).astype(A.dtype)
    # HIGHEST: TPU einsum otherwise multiplies in bf16, which corrupts
    # the folded matrices enough to stall CG at ~1e-4
    return jnp.einsum("eia,eij,ejb->eab", S, A, S,
                      precision=jax.lax.Precision.HIGHEST)


def _duplicate_slots(rr):
    """Per-element duplicate-dof slot map (host, small arrays only).

    rr: (E, n) host int array -> (slot (E, n), rows_u (E, L), L) or None
    when nothing compresses. A facet-pair element lists both cells' dofs,
    so the shared-facet dofs appear twice (P2 tet pair: 20 listed, 14
    unique)."""
    E, n = rr.shape
    order = np.argsort(rr, axis=1, kind="stable")
    srt = np.take_along_axis(rr, order, axis=1)
    new = np.ones((E, n), bool)
    new[:, 1:] = srt[:, 1:] != srt[:, :-1]
    slot_sorted = np.cumsum(new, axis=1) - 1
    L = int(slot_sorted.max()) + 1
    if L >= n:
        return None
    slot = np.empty((E, n), np.int64)
    np.put_along_axis(slot, order, slot_sorted, axis=1)
    rows_u = np.zeros((E, L), rr.dtype)
    np.put_along_axis(rows_u, slot, rr, axis=1)
    return slot, rows_u, L


def _build_apply_arrays(mats, rows, cols, itypes):
    """Merged + duplicate-compressed (mats, rows, cols) for the matvec.
    mats: device arrays; rows/cols: host int arrays."""
    cm, cr, cc = [], [], []
    for m, r, c, it in zip(mats, rows, cols, itypes):
        if it == "interior_facet" and r.shape == c.shape and \
                np.array_equal(r, c):
            packed = _duplicate_slots(r)
            if packed is not None:
                slot, rows_u, L = packed
                m = _fold_duplicates_device(
                    m, jnp.asarray(slot.astype(np.int32)), L)
                r = c = rows_u
        cm.append(m)
        cr.append(r)
        cc.append(c)
    return _merge_equal_batches(cm, cr, cc)


class CutOperator:
    """Matrix-free operator for a rank-2 form: precomputed element matrices
    + gather/einsum/scatter action, with inactive-dof masking folded in.

    This is the TPU hot path (BASELINE.json north star): the action is a
    batched (E, nd, nd) x (E, nd) contraction plus one segment scatter-add,
    and ``solve_cg`` runs the whole preconditioned solve as one XLA program.
    """

    def __init__(self, f: CutForm, domain: ActiveDomain | None = None,
                 apply_plan: bool = True):
        """apply_plan=False skips the merged/compressed matvec plan (the
        argsorted scatter layout) for consumers that only need the
        per-instance element matrices and dof maps (StencilCutOperator);
        __call__/diagonal/solve_cg then raise."""
        if f.rank != 2:
            raise ValueError("CutOperator requires a rank-2 form")
        self.form = f
        V, U = f.test_space, f.trial_space
        if V.dim != U.dim:
            raise ValueError("matrix-free operator requires square forms")
        self.dim = V.dim
        self.element_matrices = []
        self.row_dofs = []
        self.col_dofs = []
        itypes = []
        self._rows_host = []          # numpy copies (avoid device->host
        self._cols_host = []          # transfers on every re-read)
        for inst in f.instances:
            Ae = inst.kernel.assemble_matrix(inst.data, f.dtype, f.block)
            self.element_matrices.append(Ae)
            rh = np.asarray(f._entity_dofs(V, inst))
            ch = np.asarray(f._entity_dofs(U, inst))
            self._rows_host.append(rh)
            self._cols_host.append(ch)
            self.row_dofs.append(jnp.asarray(rh))
            self.col_dofs.append(jnp.asarray(ch))
            itypes.append(inst.itype)
        if not f.instances:
            raise ValueError(
                "CutOperator: form produced no integral instances (every "
                "measure had an empty entity set); nothing to apply")
        self.active = (jnp.asarray(domain.active_mask)
                       if domain is not None else None)
        self._itypes = itypes
        self._has_plan = bool(apply_plan)
        if not apply_plan:
            return
        # apply-path arrays: merged + compressed copies of the
        # per-instance data (element_matrices/row_dofs stay per-instance
        # for consumers that index by instance, e.g. StencilCutOperator).
        # The apply is gather-bound (~25 ns per gathered element on TPU),
        # so every dropped row element is wall-clock off the CG solve.
        mats, rows, cols = _build_apply_arrays(
            self.element_matrices, list(self._rows_host),
            list(self._cols_host), itypes)
        self._mats = tuple(jnp.asarray(m) for m in mats)
        self._rows = tuple(jnp.asarray(r) for r in rows)
        self._cols = tuple(jnp.asarray(c) for c in cols)
        # presorted scatter plan (host): row-sorted segment-sum
        flat_rows = np.concatenate([np.asarray(r).ravel()
                                    for r in rows])
        perm = np.argsort(flat_rows, kind="stable")
        self._perm = jnp.asarray(perm.astype(np.int32))
        self._sorted_rows = jnp.asarray(flat_rows[perm].astype(np.int32))

    def _require_plan(self):
        if not self._has_plan:
            raise RuntimeError(
                "CutOperator was built with apply_plan=False (element "
                "data only); rebuild with apply_plan=True to apply it")

    def __call__(self, x):
        self._require_plan()
        return _matfree_apply_sorted(self.dim, self._mats, self._cols,
                                     self._perm, self._sorted_rows,
                                     self.active, x)

    def diagonal(self):
        self._require_plan()
        return _matfree_diagonal(self.dim, self._mats, self._rows,
                                 self._cols, self._perm,
                                 self._sorted_rows, self.active,
                                 jnp.zeros((), self.form.dtype))

    def solve_cg(self, b, rtol=1e-8, maxiter=500, jacobi=True,
                 precond=None):
        """Fully-jitted preconditioned CG solve; returns (x, iters,
        residual_norm). precond: 'jacobi' (default), 'chebyshev'
        (polynomial of the Jacobi-scaled operator), or 'none'."""
        if precond is None:
            precond = "jacobi" if jacobi else "none"
        self._require_plan()
        return _matfree_cg(self.dim, str(precond), self._mats, self._rows,
                           self._cols, self._perm, self._sorted_rows,
                           self.active, jnp.asarray(b), rtol, maxiter)
