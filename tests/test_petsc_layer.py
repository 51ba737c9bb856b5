"""Solver-backend layer parity: the petsc module's assembly path must
equal the fem path exactly (the reference's test_petsc.py:31 contract),
plus profiling utilities."""

import numpy as np

import cutfemx_tpu as cfx
from cutfemx_tpu import fem, petsc
from cutfemx_tpu.forms.dsl import TestFunction, TrialFunction, grad, inner
from cutfemx_tpu.forms.measure import dx


def test_petsc_path_equals_fem_path():
    mesh = cfx.mesh.create_unit_square(6)
    V = cfx.functionspace(mesh, ("Lagrange", 2))
    u, v = TrialFunction(V), TestFunction(V)
    a = fem.form(inner(grad(u), grad(v)) * dx + u * v * dx)
    A1 = fem.assemble_matrix(a).to_dense()
    A2 = petsc.assemble_matrix(a).to_dense()
    assert np.array_equal(A1, A2)
    L = fem.form(v * dx)
    b1 = np.asarray(fem.assemble_vector(L))
    b2 = petsc.assemble_vector(L)
    assert np.array_equal(b1, b2)
    # deactivation mirrors
    dom = fem.active_domain(a)
    A3 = petsc.assemble_matrix(a)
    petsc.deactivate_outside(A3, None, dom)
    assert A3.shape == (V.dim, V.dim)


def test_profiling_utilities(tmp_path):
    from cutfemx_tpu.profiling import (ProfileWriter, Timer, list_timings,
                                       reset_timings, timings)
    reset_timings()
    with Timer("span_a", log=False):
        _ = sum(range(1000))
    with Timer("span_a", log=False):
        pass
    t = timings()
    assert t["span_a"][0] == 2 and t["span_a"][1] >= 0.0
    lines = []
    list_timings(print_fn=lines.append)
    assert any("span_a" in ln for ln in lines)

    path = tmp_path / "prof.csv"
    with ProfileWriter(path, ["iteration", "compliance"]) as pw:
        pw.write(iteration=0, compliance=1.5)
        pw.write(iteration=1, compliance=1.2, extra="ignored")
    rows = path.read_text().strip().splitlines()
    assert rows[0] == "iteration,compliance"
    assert len(rows) == 3


def test_assemble_matrix_nest_matches_monolithic():
    import numpy as np
    import scipy.sparse as sps

    import cutfemx_tpu as cfx
    from cutfemx_tpu import fem, petsc
    from cutfemx_tpu.forms.dsl import (MixedFunctionSpace, TestFunctions,
                                       TrialFunctions, div, grad, inner)
    from cutfemx_tpu.forms.measure import Measure

    mesh = cfx.mesh.create_rectangle((0., 0.), (1., 1.), (6, 6))
    V = cfx.functionspace(mesh, ("Lagrange", 2), shape=(2,))
    Q = cfx.functionspace(mesh, ("Lagrange", 1))
    W = MixedFunctionSpace(V, Q)
    u, p = TrialFunctions(W)
    v, q = TestFunctions(W)
    dx = Measure("dx", domain=mesh)
    a = (inner(grad(u), grad(v)) - p * div(v) + div(u) * q) * dx

    nest = petsc.assemble_matrix_nest(a)
    dims = (V.dim, Q.dim)
    A_blk = sps.bmat(
        [[blk.to_scipy().tocsr() if blk is not None
          else sps.csr_matrix((dims[i], dims[j]))
          for j, blk in enumerate(row)] for i, row in enumerate(nest)],
        format="csr")
    A_mono = fem.assemble_matrix(fem.form(a)).to_scipy().tocsr()
    assert abs(A_mono - A_blk).max() == 0.0

    bvecs = petsc.assemble_vector_nest(fem.form(
        1.0 * q * dx))  # only the pressure block
    assert len(bvecs) == 2
    assert np.allclose(bvecs[0], 0.0)
    assert abs(np.sum(bvecs[1]) - 1.0) < 1e-12  # integral of 1 over unit sq
