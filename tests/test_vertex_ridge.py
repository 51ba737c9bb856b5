"""Vertex (dP) and ridge (dr) integral types — the two extra integral
types of the reference's custom-data Form
(/root/reference/cpp/dolfinx_custom_data/fem/Form.h:34-41), unused by the
reference's own demo surface but part of its capability contract."""

import numpy as np

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (SpatialCoordinate, TestFunction,
                                   TrialFunction)
from cutfemx_tpu.forms.measure import Measure


def test_vertex_functional_is_point_sum():
    mesh = cfx.mesh.create_rectangle((0, 0), (1, 1), (4, 4))
    verts = np.array([0, 7, 12], np.int64)
    xy = np.asarray(mesh.vertices)[verts]
    x = SpatialCoordinate(mesh)
    dP = Measure("dP", domain=mesh, subdomain_data=verts)
    val = float(fem.assemble_scalar(fem.form(
        (x[0] ** 2 + 3.0 * x[1]) * dP)))
    exact = (xy[:, 0] ** 2 + 3.0 * xy[:, 1]).sum()
    assert abs(val - exact) < 1e-12


def test_vertex_load_vector_is_point_source():
    mesh = cfx.mesh.create_rectangle((0, 0), (1, 1), (3, 3))
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    verts = np.array([5, 9], np.int64)
    v = TestFunction(V)
    x = SpatialCoordinate(mesh)
    dP = Measure("dP", domain=mesh, subdomain_data=verts)
    b = np.array(fem.assemble_vector(fem.form((x[0] + 2.0) * v * dP)))
    xy = np.asarray(mesh.vertices)
    expected = np.zeros(V.dim)
    expected[verts] = xy[verts, 0] + 2.0  # P1 vertex dof == vertex id
    np.testing.assert_allclose(b, expected, atol=1e-12)


def test_vertex_mass_matrix_diagonal():
    mesh = cfx.mesh.create_rectangle((0, 0), (1, 1), (3, 3))
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    verts = np.array([2, 11], np.int64)
    u, v = TrialFunction(V), TestFunction(V)
    dP = Measure("dP", domain=mesh, subdomain_data=verts)
    A = fem.assemble_matrix(fem.form(u * v * dP)).to_dense()
    expected = np.zeros_like(A)
    expected[verts, verts] = 1.0
    np.testing.assert_allclose(A, expected, atol=1e-12)


def test_vertex_p2_point_evaluation():
    mesh = cfx.mesh.create_rectangle((0, 0), (1, 1), (3, 3))
    V = cfx.functionspace(mesh, ("Lagrange", 2))
    f = cfx.Function(V)
    f.interpolate(lambda x: x[0] ** 2 - x[1] ** 2 + 0.5)
    from cutfemx_tpu.forms.dsl import CoefficientExpr
    verts = np.array([4, 8], np.int64)
    xy = np.asarray(mesh.vertices)[verts]
    dP = Measure("dP", domain=mesh, subdomain_data=verts)
    val = float(fem.assemble_scalar(fem.form(CoefficientExpr(f) * dP)))
    exact = (xy[:, 0] ** 2 - xy[:, 1] ** 2 + 0.5).sum()
    assert abs(val - exact) < 1e-10


def _x_axis_edges(mesh):
    ev = np.asarray(mesh.edges)
    xy = np.asarray(mesh.vertices)
    on = (np.abs(xy[:, 1]) < 1e-12) & (np.abs(xy[:, 2]) < 1e-12)
    return np.flatnonzero(on[ev[:, 0]] & on[ev[:, 1]])


def test_ridge_length_3d():
    mesh = cfx.mesh.create_box((0, 0, 0), (1, 1, 1), (3, 3, 3))
    edges = _x_axis_edges(mesh)
    assert edges.size == 3
    dr = Measure("dr", domain=mesh, subdomain_data=edges)
    one = float(fem.assemble_scalar(fem.form(
        (SpatialCoordinate(mesh)[0] * 0 + 1.0) * dr)))
    assert abs(one - 1.0) < 1e-12


def test_ridge_polynomial_exact_3d():
    mesh = cfx.mesh.create_box((0, 0, 0), (1, 1, 1), (2, 2, 2))
    edges = _x_axis_edges(mesh)
    x = SpatialCoordinate(mesh)
    dr = Measure("dr", domain=mesh,
                 subdomain_data=edges,
                 metadata={"quadrature_degree": 3})
    # int_0^1 x^3 dx = 1/4 along the x-axis ridge
    val = float(fem.assemble_scalar(fem.form(x[0] ** 3 * dr)))
    assert abs(val - 0.25) < 1e-12


def test_ridge_rank1_3d():
    mesh = cfx.mesh.create_box((0, 0, 0), (1, 1, 1), (2, 2, 2))
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    edges = _x_axis_edges(mesh)
    v = TestFunction(V)
    dr = Measure("dr", domain=mesh, subdomain_data=edges)
    b = np.array(fem.assemble_vector(fem.form((1.0 * v) * dr)))
    # partition of unity along the ridge: weights sum to its length
    assert abs(b.sum() - 1.0) < 1e-12
    # only dofs on the ridge line receive weight
    xy = np.asarray(mesh.vertices)
    off = (np.abs(xy[:, 1]) > 1e-12) | (np.abs(xy[:, 2]) > 1e-12)
    np.testing.assert_allclose(b[off], 0.0, atol=1e-12)


def test_ridge_2d_falls_back_to_vertices():
    mesh = cfx.mesh.create_rectangle((0, 0), (1, 1), (3, 3))
    verts = np.array([1, 6], np.int64)
    dr = Measure("dr", domain=mesh, subdomain_data=verts)
    x = SpatialCoordinate(mesh)
    val = float(fem.assemble_scalar(fem.form((x[0] + 1.0) * dr)))
    xy = np.asarray(mesh.vertices)[verts]
    assert abs(val - (xy[:, 0] + 1.0).sum()) < 1e-12


def test_vertex_requires_entities():
    import pytest
    mesh = cfx.mesh.create_rectangle((0, 0), (1, 1), (2, 2))
    dP = Measure("dP", domain=mesh)
    with pytest.raises(ValueError):
        fem.form((SpatialCoordinate(mesh)[0]) * dP)
