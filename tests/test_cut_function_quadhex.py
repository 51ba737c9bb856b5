"""cut_function on quad/hex backgrounds (interpolate.h:32-204 handles any
cell type; the Newton pullback in geometry.py covers the multilinear
geometry map)."""

import numpy as np

import cutfemx_tpu as cfx
from cutfemx_tpu import fem


def _check(mesh, sdf, linear):
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(sdf)
    cd = cfx.cut(phi)
    cm = cfx.create_cut_mesh(cd, "phi<0", mode="full")
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    u = cfx.Function(V)
    u.interpolate(linear)
    uc = fem.cut_function(u, cm)
    vv = uc.function_space.mesh.vertices
    expect = linear(vv.T)
    err = np.abs(np.asarray(uc.x) - expect).max()
    assert err < 1e-9, err
    assert uc.function_space.mesh.num_cells > 0


def test_cut_function_quadrilateral_background():
    mesh = cfx.mesh.create_rectangle((-1, -1), (1, 1), (12, 12),
                                     "quadrilateral")
    _check(mesh, lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2) - 0.55,
           lambda x: x[0] + 2 * x[1])


def test_cut_function_hexahedron_background():
    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (6, 6, 6),
                               "hexahedron")
    _check(mesh, lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2 + x[2] ** 2)
           - 0.55, lambda x: x[0] + 2 * x[1] - 0.5 * x[2])
