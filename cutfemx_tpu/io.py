"""Mesh/solution output.

The reference persists results via DOLFINx XDMF and VTK writers
(demo_poisson.py:75-125, stl/surface.h:40). Here: a dependency-free VTU
(XML unstructured grid) writer for meshes, Functions, and cut
visualisation meshes — readable by ParaView/VisIt.
"""

from __future__ import annotations

import numpy as np

__all__ = ["write_vtu", "write_cut_mesh"]

_VTK_TYPE = {
    "interval": 3,       # VTK_LINE
    "triangle": 5,       # VTK_TRIANGLE
    "quadrilateral": 8,  # VTK_PIXEL ordering differs; use 9 with reorder
    "tetrahedron": 10,   # VTK_TETRA
    "hexahedron": 11,    # VTK_VOXEL ordering matches lexicographic
}


def _cells_for_vtk(mesh):
    cells = mesh.cells
    if mesh.cell_type == "quadrilateral":
        # lexicographic (v00,v10,v01,v11) -> VTK_QUAD (ccw)
        return cells[:, [0, 1, 3, 2]], 9
    return cells, _VTK_TYPE[mesh.cell_type]


def write_vtu(path, mesh, point_data=None, cell_data=None):
    """Write a mesh with optional per-vertex / per-cell scalar or vector
    fields. point_data/cell_data: {name: array} with leading length NV/NC;
    vector fields may be (N, gdim)."""
    cells, vtk_type = _cells_for_vtk(mesh)
    nv, nc = mesh.num_vertices, mesh.num_cells
    pts = np.zeros((nv, 3))
    pts[:, :mesh.gdim] = mesh.vertices

    def data_arrays(data, n):
        out = []
        for name, arr in (data or {}).items():
            a = np.asarray(arr)
            if a.ndim == 1 and a.size == n * mesh.gdim and mesh.gdim > 1 \
                    and a.size != n:
                a = a.reshape(n, mesh.gdim)
            if a.ndim == 2 and a.shape[1] < 3:
                a = np.pad(a, ((0, 0), (0, 3 - a.shape[1])))
            ncomp = 1 if a.ndim == 1 else a.shape[1]
            out.append((name, ncomp, a.reshape(n, -1)))
        return out

    pdata = data_arrays(point_data, nv)
    cdata = data_arrays(cell_data, nc)

    def fmt(a):
        return " ".join(f"{v:.10g}" for v in np.asarray(a).ravel())

    with open(path, "w") as f:
        f.write('<?xml version="1.0"?>\n')
        f.write('<VTKFile type="UnstructuredGrid" version="0.1" '
                'byte_order="LittleEndian">\n<UnstructuredGrid>\n')
        f.write(f'<Piece NumberOfPoints="{nv}" NumberOfCells="{nc}">\n')
        f.write('<Points><DataArray type="Float64" NumberOfComponents="3"'
                ' format="ascii">\n')
        f.write(fmt(pts))
        f.write('\n</DataArray></Points>\n<Cells>\n')
        f.write('<DataArray type="Int64" Name="connectivity" '
                'format="ascii">\n')
        f.write(fmt(cells))
        f.write('\n</DataArray>\n<DataArray type="Int64" Name="offsets" '
                'format="ascii">\n')
        f.write(fmt(np.arange(1, nc + 1) * cells.shape[1]))
        f.write('\n</DataArray>\n<DataArray type="UInt8" Name="types" '
                'format="ascii">\n')
        f.write(fmt(np.full(nc, vtk_type)))
        f.write('\n</DataArray>\n</Cells>\n')
        for label, items in (("PointData", pdata), ("CellData", cdata)):
            f.write(f"<{label}>\n")
            for name, ncomp, a in items:
                f.write(f'<DataArray type="Float64" Name="{name}" '
                        f'NumberOfComponents="{ncomp}" format="ascii">\n')
                f.write(fmt(a))
                f.write("\n</DataArray>\n")
            f.write(f"</{label}>\n")
        f.write("</Piece>\n</UnstructuredGrid>\n</VTKFile>\n")


def write_cut_mesh(path, cut_mesh, functions=None):
    """Write a CutMesh with interpolated Functions (the role of the
    reference's cut-domain XDMF outputs): each Function is interpolated
    onto the visualisation mesh via fem.cut_function first when it lives
    on the background mesh."""
    from .fem import cut_function as _cut_function
    if cut_mesh.mesh is None:
        raise ValueError("empty cut mesh")
    point_data = {}
    for fn in (functions or []):
        if fn.function_space.mesh is cut_mesh.mesh:
            out = fn
        else:
            out = _cut_function(fn, cut_mesh)
        vals = np.asarray(out.x)
        bs = out.function_space.bs
        nv = cut_mesh.mesh.num_vertices
        point_data[fn.name] = vals.reshape(nv, bs) if bs > 1 else \
            vals[:nv]
    cell_data = {"parent_index": cut_mesh.parent_index.astype(float),
                 "is_cut_cell": cut_mesh.is_cut_cell.astype(float)}
    write_vtu(path, cut_mesh.mesh, point_data=point_data,
              cell_data=cell_data)
