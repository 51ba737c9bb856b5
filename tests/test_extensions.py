"""Cell aggregation + extension penalty oracles — mirrors
/root/reference/python/tests/test_extensions_cell_aggregation.py:
opposite-phase volume fractions sum to 1 (:74), penalty matrix symmetric
and annihilates constants (:123)."""

import numpy as np
import pytest

import cutfemx_tpu as cfx
from cutfemx_tpu import extensions


def _circle(n=24, r=0.31):
    mesh = cfx.mesh.create_rectangle((-1.0, -1.0), (1.0, 1.0), (n, n))
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2) - r)
    return mesh, phi


def test_volume_fractions_sum_to_one():
    mesh, phi = _circle()
    cd = cfx.cut(phi)
    agg_in = extensions.create_cell_aggregation(cd, "phi<0", 0.3,
                                                allow_rootless=True)
    agg_out = extensions.create_cell_aggregation(cd, "phi>0", 0.3,
                                                 allow_rootless=True)
    cut_cells = agg_in.cut_cells
    total = (agg_in.cut_volume_fraction[cut_cells]
             + agg_out.cut_volume_fraction[cut_cells])
    assert np.allclose(total, 1.0, atol=1e-12)
    assert (agg_in.cut_volume_fraction[cut_cells] > 0).all()


def test_aggregation_roots_and_propagation():
    mesh, phi = _circle()
    cd = cfx.cut(phi)
    agg = extensions.create_cell_aggregation(cd, "phi<0", 0.5)
    # every ill-posed cell got a root; roots are well-posed; depth >= 1
    assert agg.rootless_cells.size == 0
    for c in agg.ill_posed_cells:
        r = agg.root_cell[c]
        assert r in set(agg.well_posed_cells.tolist())
        assert agg.propagation_depth[c] >= 1
        assert agg.aggregate_id[c] == agg.aggregate_id[r]
    # interior-only policy: no cut cell is a root
    agg2 = extensions.create_cell_aggregation(
        cd, "phi<0", 0.5, root_policy="interior_only")
    cutset = set(agg2.cut_cells.tolist())
    assert not (set(agg2.well_posed_cells.tolist()) & cutset)


def test_aggregation_rejects_invalid_inputs():
    mesh, phi = _circle(8)
    cd = cfx.cut(phi)
    with pytest.raises(ValueError):
        extensions.create_cell_aggregation(cd, "phi=0", 0.5)
    with pytest.raises(ValueError):
        extensions.create_cell_aggregation(cd, "phi<0", 1.5)
    with pytest.raises(ValueError):
        extensions.create_cell_aggregation(cd, "phi<0", 0.5,
                                           root_policy="bogus")


@pytest.mark.parametrize("degree", [1, 2])
def test_extension_penalty_symmetric_annihilates_polynomials(degree):
    """The penalty vanishes on globally-polynomial fields of the space's
    degree (u_bad == extension of u_root) and is symmetric PSD."""
    mesh, phi = _circle()
    cd = cfx.cut(phi)
    agg = extensions.create_cell_aggregation(cd, "phi<0", 0.5)
    V = cfx.functionspace(mesh, ("Lagrange", degree))
    A = extensions.extension_penalty_matrix(V, cd, agg, beta=2.0,
                                            quadrature_degree=2 * degree)
    M = A.to_dense()
    assert np.allclose(M, M.T, atol=1e-12)
    coords = V.dof_coordinates
    for poly in (np.ones(V.dim),
                 coords[:, 0] + 0.5 * coords[:, 1],
                 (coords[:, 0] * coords[:, 1] if degree == 2
                  else np.ones(V.dim))):
        assert np.abs(M @ poly).max() < 1e-10
    # PSD: penalty energy nonnegative
    rng = np.random.default_rng(0)
    for _ in range(5):
        x = rng.standard_normal(V.dim)
        assert x @ (M @ x) >= -1e-10
    # cellwise beta variant
    beta_cells = np.full(mesh.num_cells, 3.0)
    A2 = extensions.extension_penalty_matrix(V, cd, agg, beta=beta_cells,
                                             quadrature_degree=2 * degree)
    assert np.allclose(A2.to_dense(), 1.5 * M, atol=1e-12)
