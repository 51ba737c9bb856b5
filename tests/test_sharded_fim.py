"""Sharded FIM vs serial FIM parity on the 8-device virtual mesh (the role
of /root/reference/cpp/cutfemx/distance/parallel_exchange.h:49-100: ghost
min-exchange inside the Eikonal loop)."""

import numpy as np
import pytest

import cutfemx_tpu as cfx
from cutfemx_tpu.distance.fim import FMMOptions, eikonal_solve
from cutfemx_tpu.distance.sharded import sharded_eikonal_solve
from cutfemx_tpu.parallel import make_device_mesh


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_point_source_2d(ndev):
    mesh = cfx.mesh.create_rectangle((-1, -1), (1, 1), (24, 24))
    r = np.linalg.norm(mesh.vertices, axis=1)
    frozen = r < 0.2
    d0 = np.where(frozen, r, FMMOptions().inf)

    ds, _, its_s = eikonal_solve(mesh, d0, frozen)
    ds = np.asarray(ds)

    dmesh = make_device_mesh(ndev)
    dp, its_p = sharded_eikonal_solve(mesh, d0, frozen, dmesh)
    assert its_p < 1000
    err = np.abs(dp - ds).max()
    assert err < 1e-10, f"sharded vs serial mismatch {err}"


def test_sharded_point_source_3d():
    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (8, 8, 8))
    r = np.linalg.norm(mesh.vertices, axis=1)
    frozen = r < 0.3
    d0 = np.where(frozen, r, FMMOptions().inf)

    ds, _, _ = eikonal_solve(mesh, d0, frozen)
    ds = np.asarray(ds)

    dmesh = make_device_mesh(4)
    dp, _ = sharded_eikonal_solve(mesh, d0, frozen, dmesh)
    err = np.abs(dp - ds).max()
    assert err < 1e-10, f"sharded vs serial mismatch {err}"


def test_sharded_accuracy_against_exact():
    """Sharded solution approximates the true distance, not just the serial
    solver (guards against a consistently-wrong pair)."""
    mesh = cfx.mesh.create_rectangle((-1, -1), (1, 1), (40, 40))
    r = np.linalg.norm(mesh.vertices, axis=1)
    frozen = r < 0.15
    d0 = np.where(frozen, r, FMMOptions().inf)
    dmesh = make_device_mesh(8)
    dp, _ = sharded_eikonal_solve(mesh, d0, frozen, dmesh)
    far = r > 0.3
    assert np.abs(dp[far] - r[far]).max() < 0.05 * r[far].max()


def test_sharded_signed_distance_matches_serial():
    """End-to-end sharded pipeline (STL routing -> per-slab near field ->
    sharded FIM -> sign) equals the serial path (distribute.h parity:
    routed triangles must reproduce the global candidate sets)."""
    from tests.test_distance import _sphere_soup

    from cutfemx_tpu.distance.api import compute_signed_distance
    from cutfemx_tpu.distance.sharded import (distribute_stl_sharded,
                                              sharded_signed_distance)

    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (8, 8, 8))
    soup = _sphere_soup(r=0.55, n=10)

    ds, _ = compute_signed_distance(mesh, soup,
                                    sign_mode="local_normal_band")
    dmesh = make_device_mesh(4)
    dp, _ = sharded_signed_distance(mesh, soup, dmesh)
    err = np.abs(dp - ds).max()
    assert err < 1e-10, err


def test_distribute_stl_covers_all_candidates():
    """Every (cell, triangle) candidate pair of the global broad phase
    appears in the owning slab's routed soup."""
    from tests.test_distance import _sphere_soup

    from cutfemx_tpu.distance.sharded import distribute_stl_sharded
    from cutfemx_tpu.distance.stl import build_cell_triangle_map
    from cutfemx_tpu.functionspace import FunctionSpace
    from cutfemx_tpu.parallel.halo import build_slab_partition

    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (6, 6, 6))
    soup = _sphere_soup(r=0.55, n=8)
    part = build_slab_partition(FunctionSpace(mesh, ("Lagrange", 1)), 4)
    soups = distribute_stl_sharded(mesh, soup, part)
    ctmap = build_cell_triangle_map(mesh, soup)
    counts = np.diff(ctmap.offsets)
    for c in np.flatnonzero(counts):
        p = part.cell_part[c]
        routed = set(soups[p].tri_gid.tolist())
        needed = set(soup.tri_gid[ctmap.links(c)].tolist())
        assert needed.issubset(routed), (c, p)
