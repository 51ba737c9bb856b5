"""Background meshes as plain arrays.

Replaces the DOLFINx mesh role the reference builds on (topology,
connectivity, facet computation — see SURVEY.md L1). Topology is computed
host-side with NumPy and cached; the JAX compute path consumes vertex
coordinates and connectivity as static-shaped device arrays.

Vertex ordering inside each cell follows the Basix conventions in
``cutfemx_tpu.cells``.
"""

from __future__ import annotations

import numpy as np

from .cells import CellType, reference_cell

__all__ = [
    "Mesh", "create_interval", "create_rectangle", "create_box",
    "create_unit_square", "create_unit_cube",
]


class Mesh:
    """Unstructured conforming mesh: vertices + cell-vertex connectivity."""

    def __init__(self, vertices, cells, cell_type: str):
        self.vertices = np.ascontiguousarray(vertices, dtype=np.float64)
        self.cells = np.ascontiguousarray(cells, dtype=np.int32)
        self.cell_type = cell_type
        self.ref_cell = reference_cell(cell_type)
        self.tdim = self.ref_cell.tdim
        self.gdim = self.vertices.shape[1]
        self.num_vertices = self.vertices.shape[0]
        self.num_cells = self.cells.shape[0]
        self._cache: dict = {}

    # -- derived topology (host-side, cached) -------------------------------

    def _build_subentities(self, sub_verts_table):
        """Generic unique-subentity builder.

        sub_verts_table: (n_sub_per_cell, nv_sub) local vertex indices.
        Returns (entities (NE, nv_sub) int32 — vertex lists in *sorted* global
        order, cell_entities (NC, n_sub_per_cell) int32).
        """
        local = np.asarray(sub_verts_table)
        nvs = local.shape[1]
        sub = self.cells[:, local].reshape(-1, nvs)  # (NC*nspc, nvs)
        sub.sort(axis=1)
        # np.unique(axis=0) falls back to void-dtype comparisons (an order
        # of magnitude slower); dedup via a scalar code (pairs) or lexsort.
        # int32 everywhere it fits: cumsum/astype on int64 are memory-bound
        # and measurably slow on this host.
        nv = int(self.num_vertices)
        if nvs == 2 or (nvs == 3 and nv ** 3 < (1 << 62)):
            # scalar-code dedup: one int64 sort instead of a multi-column
            # lexsort (each lexsort pass re-streams the key array)
            code = sub[:, 0].astype(np.int64)
            for j in range(1, nvs):
                code *= nv
                code += sub[:, j]
            order = np.argsort(code, kind="stable")
            cs = code[order]
            first = np.empty(len(cs), dtype=bool)
            first[0] = True
            np.not_equal(cs[1:], cs[:-1], out=first[1:])
        else:
            order = np.lexsort(sub.T[::-1])
            ks = sub[order]
            first = np.empty(len(ks), dtype=bool)
            first[0] = True
            np.any(ks[1:] != ks[:-1], axis=1, out=first[1:])
        uid_sorted = np.cumsum(first, dtype=np.int32)
        uid_sorted -= 1
        inv = np.empty(len(order), dtype=np.int32)
        inv[order] = uid_sorted
        uniq = np.ascontiguousarray(sub[order[first]])
        cell_entities = inv.reshape(self.num_cells, local.shape[0])
        return uniq, cell_entities

    @property
    def edges(self):
        """(NE, 2) unique edges, vertices sorted ascending."""
        self._ensure_edges()
        return self._cache["edges"]

    @property
    def cell_edges(self):
        """(NC, n_edges_per_cell) edge indices."""
        self._ensure_edges()
        return self._cache["cell_edges"]

    def _ensure_edges(self):
        if "edges" not in self._cache:
            if self.tdim == 1:
                self._cache["edges"] = np.sort(self.cells, axis=1)
                self._cache["cell_edges"] = np.arange(
                    self.num_cells, dtype=np.int32).reshape(-1, 1)
            else:
                e, ce = self._build_subentities(self.ref_cell.edges)
                self._cache["edges"] = e
                self._cache["cell_edges"] = ce

    @property
    def facets(self):
        """(NF, nv_facet) unique facets, vertices sorted ascending."""
        self._ensure_facets()
        return self._cache["facets"]

    @property
    def cell_facets(self):
        self._ensure_facets()
        return self._cache["cell_facets"]

    @property
    def facet_cells(self):
        """(NF, 2) adjacent cells, second entry -1 on the boundary.
        Ordering: lower cell index first."""
        self._ensure_facets()
        return self._cache["facet_cells"]

    @property
    def facet_local_index(self):
        """(NF, 2) local facet index within each adjacent cell (-1 unused)."""
        self._ensure_facets()
        return self._cache["facet_local_index"]

    def _ensure_facets(self):
        if "facets" in self._cache:
            return
        if self.tdim == 1:
            # facets are vertices
            nv = self.num_vertices
            facets = np.arange(nv, dtype=np.int32).reshape(-1, 1)
            cell_facets = self.cells.copy()
            fc = np.full((nv, 2), -1, np.int32)
            fl = np.full((nv, 2), -1, np.int32)
            for c in range(self.num_cells):
                for lf in range(2):
                    f = self.cells[c, lf]
                    slot = 0 if fc[f, 0] < 0 else 1
                    fc[f, slot] = c
                    fl[f, slot] = lf
            self._cache.update(facets=facets, cell_facets=cell_facets,
                               facet_cells=fc, facet_local_index=fl)
            return
        facets, cell_facets = self._build_subentities(self.ref_cell.facets)
        nf = facets.shape[0]
        fc = np.full((nf, 2), -1, np.int32)
        fl = np.full((nf, 2), -1, np.int32)
        nfpc = cell_facets.shape[1]
        cells_rep = np.repeat(np.arange(self.num_cells, dtype=np.int32),
                              nfpc)
        fids = cell_facets.ravel()
        locals_rep = np.tile(np.arange(nfpc, dtype=np.int32),
                             self.num_cells)
        # sort by (facet, cell) so the lower cell lands in slot 0
        order = np.lexsort((cells_rep, fids))
        fids_s, cells_s, locals_s = fids[order], cells_rep[order], \
            locals_rep[order]
        first = np.ones(len(fids_s), dtype=bool)
        first[1:] = fids_s[1:] != fids_s[:-1]
        slot = np.where(first, 0, 1)
        fc[fids_s, slot] = cells_s
        fl[fids_s, slot] = locals_s
        self._cache.update(facets=facets, cell_facets=cell_facets,
                           facet_cells=fc, facet_local_index=fl)

    @property
    def exterior_facets(self):
        """Sorted indices of boundary facets."""
        return np.flatnonzero(self.facet_cells[:, 1] < 0).astype(np.int32)

    @property
    def interior_facets(self):
        return np.flatnonzero(self.facet_cells[:, 1] >= 0).astype(np.int32)

    @property
    def num_facets(self):
        return self.facets.shape[0]

    @property
    def num_edges(self):
        return self.edges.shape[0]

    # -- geometry helpers ----------------------------------------------------

    @property
    def cell_vertex_coords(self):
        """(NC, nv_cell, gdim) float64."""
        if "cvx" not in self._cache:
            self._cache["cvx"] = self.vertices[self.cells]
        return self._cache["cvx"]

    def cell_diameters(self):
        """(NC,) max inter-vertex distance per cell (matches
        ufl.CellDiameter semantics for simplices)."""
        if "hmax" not in self._cache:
            x = self.cell_vertex_coords
            d = np.linalg.norm(x[:, :, None, :] - x[:, None, :, :], axis=-1)
            self._cache["hmax"] = d.max(axis=(1, 2))
        return self._cache["hmax"]

    def midpoints(self, dim=None, entities=None):
        """Midpoints of cells (default) or given entities of dimension dim."""
        if dim is None or dim == self.tdim:
            pts = self.cell_vertex_coords.mean(axis=1)
        elif dim == self.tdim - 1:
            pts = self.vertices[self.facets].mean(axis=1)
        elif dim == 1:
            pts = self.vertices[self.edges].mean(axis=1)
        elif dim == 0:
            pts = self.vertices
        else:
            raise ValueError(dim)
        if entities is not None:
            pts = pts[np.asarray(entities)]
        return pts


# -- generators --------------------------------------------------------------


def create_interval(n, a=0.0, b=1.0):
    x = np.linspace(a, b, n + 1).reshape(-1, 1)
    cells = np.stack([np.arange(n), np.arange(1, n + 1)], axis=1)
    return Mesh(x, cells, CellType.interval)


def _grid_vertices_2d(p0, p1, nx, ny):
    x = np.linspace(p0[0], p1[0], nx + 1)
    y = np.linspace(p0[1], p1[1], ny + 1)
    X, Y = np.meshgrid(x, y, indexing="ij")
    return np.stack([X.ravel(), Y.ravel()], axis=-1)


def create_rectangle(p0, p1, n, cell_type=CellType.triangle,
                     diagonal="right"):
    """Rectangle mesh matching dolfinx.mesh.create_rectangle semantics."""
    nx, ny = n
    verts = _grid_vertices_2d(p0, p1, nx, ny)

    def vid(i, j):
        return i * (ny + 1) + j

    I, J = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    v00 = vid(I, J).ravel()
    v10 = vid(I + 1, J).ravel()
    v01 = vid(I, J + 1).ravel()
    v11 = vid(I + 1, J + 1).ravel()
    if cell_type == CellType.quadrilateral:
        cells = np.stack([v00, v10, v01, v11], axis=1)
        return Mesh(verts, cells, cell_type)
    if diagonal == "right":
        t1 = np.stack([v00, v10, v11], axis=1)
        t2 = np.stack([v00, v11, v01], axis=1)
    elif diagonal == "left":
        t1 = np.stack([v00, v10, v01], axis=1)
        t2 = np.stack([v10, v11, v01], axis=1)
    elif diagonal == "crossed":
        raise NotImplementedError("crossed diagonal not supported")
    else:
        raise ValueError(diagonal)
    cells = np.concatenate([t1, t2], axis=0)
    return Mesh(verts, cells, CellType.triangle)


def create_box(p0, p1, n, cell_type=CellType.tetrahedron):
    nx, ny, nz = n
    x = np.linspace(p0[0], p1[0], nx + 1)
    y = np.linspace(p0[1], p1[1], ny + 1)
    z = np.linspace(p0[2], p1[2], nz + 1)
    X, Y, Z = np.meshgrid(x, y, z, indexing="ij")
    verts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=-1)

    def vid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k

    I, J, K = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                          indexing="ij")
    c = [vid(I + di, J + dj, K + dk).ravel()
         for dk in (0, 1) for dj in (0, 1) for di in (0, 1)]
    # hex vertex order (Basix): (0,0,0),(1,0,0),(0,1,0),(1,1,0),
    #                           (0,0,1),(1,0,1),(0,1,1),(1,1,1)
    v = [c[0], c[1], c[2], c[3], c[4], c[5], c[6], c[7]]
    if cell_type == CellType.hexahedron:
        cells = np.stack(v, axis=1)
        return Mesh(verts, cells, cell_type)
    # Freudenthal split of each cube into 6 tets along the 0-7 diagonal;
    # faces of adjacent cubes match because each square face is split along
    # the diagonal containing its lexicographically extreme corners.
    split = reference_cell(CellType.hexahedron).simplex_split
    vs = np.stack(v, axis=1)  # (ncubes, 8)
    cells = vs[:, split].reshape(-1, 4)
    return Mesh(verts, cells, CellType.tetrahedron)


def create_unit_square(n, cell_type=CellType.triangle):
    return create_rectangle((0.0, 0.0), (1.0, 1.0), (n, n), cell_type)


def create_unit_cube(n, cell_type=CellType.tetrahedron):
    return create_box((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (n, n, n), cell_type)
