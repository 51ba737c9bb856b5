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


def test_petsc_deactivate_outside_signatures():
    """Reference petsc.py:299-330: deactivate_outside(A, domain) and
    deactivate_outside(A, b, domain, diagonal=, rhs_value=)."""
    import pytest

    mesh = cfx.mesh.create_unit_square(8)
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(cfx.functionspace(mesh, ("Lagrange", 1)))
    phi.interpolate(lambda x: np.sqrt((x[0] - .5) ** 2 + (x[1] - .5) ** 2)
                    - 0.3)
    cd = cfx.cut(phi)
    inside = cfx.locate_entities(cd, "phi<0")
    vol = cfx.runtime_quadrature(cd, "phi<0", 2)
    from cutfemx_tpu.forms.measure import Measure
    dxo = Measure("dx", domain=mesh, subdomain_data=[inside, vol])
    u, v = TrialFunction(V), TestFunction(V)
    a = fem.form((inner(grad(u), grad(v)) + u * v) * dxo)
    dom = fem.active_domain(a)
    assert len(dom.inactive_dofs) > 0

    # matrix-only signature
    A = petsc.assemble_matrix(a)
    out = petsc.deactivate_outside(A, dom, diagonal=3.0)
    assert out is dom
    Ad = A.to_dense()
    r = int(dom.inactive_dofs[0])
    row = np.array(Ad[r])
    assert row[r] == 3.0 and np.count_nonzero(row) == 1

    # matrix+vector signature with rhs_value
    A2 = petsc.assemble_matrix(a)
    b = np.ones(V.dim)
    petsc.deactivate_outside(A2, b, dom, diagonal=1.0, rhs_value=7.0)
    assert np.all(b[dom.inactive_dofs] == 7.0)
    act = np.setdiff1d(np.arange(V.dim), dom.inactive_dofs)
    assert np.all(b[act] == 1.0)

    # error paths mirror the reference's TypeErrors
    with pytest.raises(TypeError):
        petsc.deactivate_outside(A2, dom, dom)
    with pytest.raises(TypeError):
        petsc.deactivate_outside(A2, b, None)

    # zero_rows diagnostic: after zeroing rows with diag=0 they show up
    A3 = petsc.assemble_matrix(a)
    from cutfemx_tpu.la import MatrixCSR
    assert isinstance(A3, MatrixCSR)
    A3.zero_rows(np.asarray(dom.inactive_dofs), diag=0.0)
    zr = petsc.zero_rows(A3)
    assert np.array_equal(np.sort(zr), np.sort(dom.inactive_dofs))


def test_petsc_deactivate_blocks_and_zero_block_rows():
    """Reference petsc.py:348-394 block mirrors on the CSR backend."""
    mesh = cfx.mesh.create_unit_square(8)
    V = cfx.functionspace(mesh, ("Lagrange", 2))
    Q = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(cfx.functionspace(mesh, ("Lagrange", 1)))
    phi.interpolate(lambda x: np.sqrt((x[0] - .5) ** 2 + (x[1] - .5) ** 2)
                    - 0.3)
    cd = cfx.cut(phi)
    inside = cfx.locate_entities(cd, "phi<0")
    vol = cfx.runtime_quadrature(cd, "phi<0", 3)
    from cutfemx_tpu.forms.measure import Measure
    dxo = Measure("dx", domain=mesh, subdomain_data=[inside, vol])
    u, v = TrialFunction(V), TestFunction(V)
    p, q = TrialFunction(Q), TestFunction(Q)
    a00 = fem.form((inner(grad(u), grad(v)) + u * v) * dxo)
    a01 = fem.form(p * v * dxo)
    a10 = fem.form(u * q * dxo)
    a11 = fem.form(p * q * dxo)
    dom0 = fem.active_domain(a00)
    dom1 = fem.active_domain(a11)
    blocks = [[petsc.assemble_matrix(a00), petsc.assemble_matrix(a01)],
              [petsc.assemble_matrix(a10), petsc.assemble_matrix(a11)]]
    b_blocks = [np.ones(V.dim), np.ones(Q.dim)]
    doms = petsc.deactivate_outside_blocks(
        blocks, [dom0, dom1], b_blocks, diagonal=2.0, rhs_value=0.0)
    assert doms == [dom0, dom1]
    # diagonal block keeps diag=2, off-diagonal rows are fully zeroed
    A00 = blocks[0][0].to_dense()
    A01 = blocks[0][1].to_dense()
    r = int(dom0.inactive_dofs[0])
    assert A00[r, r] == 2.0 and np.count_nonzero(np.array(A00[r])) == 1
    assert np.count_nonzero(np.array(A01[r])) == 0
    assert np.all(b_blocks[0][dom0.inactive_dofs] == 0.0)
    # zero_block_rows: a block row counts as zero only across all blocks
    zr = petsc.zero_block_rows(blocks)
    assert len(zr) == 2
    # rows zeroed in BOTH A00 (diag kept -> not zero) should not appear
    assert not np.intersect1d(zr[0], dom0.inactive_dofs).size


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
