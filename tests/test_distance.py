"""Distance subsystem oracles — mirrors
/root/reference/python/tests/test_distance.py: Eikonal point source,
reinitialized parabolic level set ≈ signed distance (:30-83), STL sphere
signed distance under all three sign modes, extension velocity."""

import numpy as np
import pytest

import cutfemx_tpu as cfx
from cutfemx_tpu import distance
from cutfemx_tpu.distance.fim import FMMOptions, eikonal_solve
from cutfemx_tpu.distance.stl import TriSoup, write_stl


def _sphere_soup(r=0.5, n=12, center=(0.0, 0.0, 0.0)):
    """Cube-sphere triangle soup (projected subdivided cube)."""
    verts, tris = [], []
    nverts = 0
    for axis in range(3):
        for s in (-1.0, 1.0):
            base = nverts
            u = np.linspace(-1, 1, n + 1)
            U, W = np.meshgrid(u, u, indexing="ij")
            pts = np.zeros((n + 1, n + 1, 3))
            pts[..., axis] = s
            pts[..., (axis + 1) % 3] = U * s  # flip for outward winding
            pts[..., (axis + 2) % 3] = W
            pts = pts.reshape(-1, 3)
            pts = pts / np.linalg.norm(pts, axis=1, keepdims=True) * r
            verts.append(pts + np.asarray(center))
            nverts += len(pts)
            for i in range(n):
                for j in range(n):
                    a = base + i * (n + 1) + j
                    b = a + n + 1
                    tris += [[a, a + 1, b + 1], [a, b + 1, b]]
    X = np.concatenate(verts)
    tri = np.asarray(tris, np.int32)
    e1 = X[tri[:, 1]] - X[tri[:, 0]]
    e2 = X[tri[:, 2]] - X[tri[:, 0]]
    N = np.cross(e1, e2)
    # orient normals outward
    cent = X[tri].mean(axis=1) - np.asarray(center)
    flip = np.einsum("ij,ij->i", N, cent) < 0
    tri[flip] = tri[flip][:, [0, 2, 1]]
    N = np.where(flip[:, None], -N, N)
    N /= np.linalg.norm(N, axis=1, keepdims=True)
    return TriSoup(X, tri, N, np.arange(len(tri), dtype=np.int64))


def test_eikonal_point_source():
    mesh = cfx.mesh.create_rectangle((-1, -1), (1, 1), (40, 40))
    nv = mesh.num_vertices
    # freeze vertices near the origin with exact distances
    r = np.linalg.norm(mesh.vertices, axis=1)
    frozen = r < 0.15
    d0 = np.where(frozen, r, FMMOptions().inf)
    d, _, its = eikonal_solve(mesh, d0, frozen)
    d = np.asarray(d)
    assert its < 1000
    err = np.abs(d - r)
    assert err.max() < 0.05  # first-order FIM on h=0.05 mesh


def test_eikonal_3d_point_source():
    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (10, 10, 10))
    r = np.linalg.norm(mesh.vertices, axis=1)
    frozen = r < 0.3
    d0 = np.where(frozen, r, FMMOptions().inf)
    d, _, _ = eikonal_solve(mesh, d0, frozen)
    assert np.abs(np.asarray(d) - r).max() < 0.2


def test_reinitialize_parabolic_level_set():
    """phi = (x^2+y^2) - r^2 reinitializes to ~ sqrt(x^2+y^2) - r
    (test_distance.py:30-83)."""
    r = 0.5
    mesh = cfx.mesh.create_rectangle((-1, -1), (1, 1), (48, 48))
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: (x[0] ** 2 + x[1] ** 2) - r ** 2)
    out = distance.reinitialize(phi)
    vals = np.asarray(out.x)
    exact = np.linalg.norm(mesh.vertices, axis=1) - r
    # zero contour preserved + far field is a distance (grad magnitude 1)
    assert np.abs(vals - exact).max() < 0.06
    band = np.abs(exact) < 0.1
    assert np.abs(vals - exact)[band].max() < 0.01


@pytest.mark.parametrize("mode", ["component_anchor", "local_normal_band",
                                  "winding_number"])
def test_stl_sphere_signed_distance(mode, tmp_path):
    soup = _sphere_soup(r=0.5, n=10)
    path = tmp_path / "sphere.stl"
    write_stl(path, soup)
    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (12, 12, 12))
    f = distance.from_stl(mesh, path, sign_mode=mode)
    vals = np.asarray(f.x)
    exact = np.linalg.norm(mesh.vertices, axis=1) - 0.5
    assert np.abs(vals - exact).max() < 0.12, np.abs(vals - exact).max()
    # sign correctness away from the surface
    far = np.abs(exact) > 0.15
    assert (np.sign(vals[far]) == np.sign(exact[far])).all()


def test_unsigned_distance_and_bbox(tmp_path):
    soup = _sphere_soup(r=0.4, n=8)
    path = tmp_path / "s.stl"
    write_stl(path, soup)
    lo, hi = distance.stl_bbox(path)
    assert np.allclose(lo, -0.4, atol=1e-6) and np.allclose(hi, 0.4,
                                                            atol=1e-6)
    mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (10, 10, 10))
    soup2 = distance.distribute_stl(mesh, path)
    d, _ = distance.compute_unsigned_distance(mesh, soup2)
    exact = np.abs(np.linalg.norm(mesh.vertices, axis=1) - 0.4)
    assert np.abs(d - exact).max() < 0.15


def test_extend_normal_velocity_constant_speed():
    """A constant interface speed extends to a constant field with
    velocity = speed * normal (test_distance.py extension oracle)."""
    r = 0.5
    mesh = cfx.mesh.create_rectangle((-1, -1), (1, 1), (32, 32))
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2) - r)
    speed = cfx.Function(V, name="speed")
    speed.interpolate(lambda x: np.full(x.shape[1], 2.5))
    res = distance.extend_normal_velocity(phi, speed)
    sv = np.asarray(res.speed.x)
    assert np.abs(sv - 2.5).max() < 1e-6
    # velocity is radial with magnitude 2.5 away from the center
    vel = np.asarray(res.velocity.x).reshape(-1, 2)
    rad = np.linalg.norm(mesh.vertices, axis=1)
    far = rad > 0.2
    vmag = np.linalg.norm(vel, axis=1)
    assert np.abs(vmag[far] - 2.5).max() < 1e-5
    radial = mesh.vertices / np.maximum(rad[:, None], 1e-12)
    align = np.einsum("ij,ij->i", vel / np.maximum(vmag[:, None], 1e-12),
                      radial)
    assert (align[far] > 0.95).all()


def test_extend_normal_velocity_varying_speed():
    """speed = x/r on the circle extends ~ constant along normals:
    extended(p) ≈ cos(theta(p))."""
    r = 0.5
    mesh = cfx.mesh.create_rectangle((-1, -1), (1, 1), (40, 40))
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2) - r)
    speed = cfx.Function(V, name="speed")
    speed.interpolate(lambda x: x[0] / np.maximum(
        np.sqrt(x[0] ** 2 + x[1] ** 2), 1e-12))
    res = distance.extend_normal_velocity(phi, speed)
    sv = np.asarray(res.speed.x)
    rad = np.linalg.norm(mesh.vertices, axis=1)
    ok = (rad > 0.25) & (rad < 0.9)
    expect = mesh.vertices[:, 0] / np.maximum(rad, 1e-12)
    assert np.abs(sv - expect)[ok].max() < 0.12


def test_refine_marked_conforming():
    from cutfemx_tpu.refine import refine_marked, refine_uniform
    mesh = cfx.mesh.create_unit_square(8)
    area = 1.0
    # mark edges near the diagonal
    mid = mesh.vertices[mesh.edges].mean(axis=1)
    marked = np.flatnonzero(np.abs(mid[:, 0] - mid[:, 1]) < 0.1)
    fine = refine_marked(mesh, marked)
    v = fine.cell_vertex_coords
    areas = 0.5 * np.abs((v[:, 1, 0] - v[:, 0, 0]) * (v[:, 2, 1] - v[:, 0, 1])
                         - (v[:, 1, 1] - v[:, 0, 1]) * (v[:, 2, 0] - v[:, 0, 0]))
    assert np.isclose(areas.sum(), area, atol=1e-12)
    assert (areas > 0).all()
    # conforming: interior facets have exactly 2 cells, none dangling
    fc = fine.facet_cells
    assert ((fc[:, 1] >= 0) | (fc[:, 1] == -1)).all()
    counts = (fc >= 0).sum(axis=1)
    assert set(np.unique(counts)) <= {1, 2}
    n_boundary = (counts == 1).sum()
    # boundary facet midpoints lie on the unit-square boundary
    bmid = fine.vertices[fine.facets[counts == 1]].mean(axis=1)
    onb = ((np.abs(bmid) < 1e-12) | (np.abs(bmid - 1) < 1e-12)).any(axis=1)
    assert onb.all()
    # 3D uniform refinement preserves volume
    m3 = cfx.mesh.create_unit_cube(3)
    f3 = refine_uniform(m3)
    assert f3.num_cells == 8 * m3.num_cells
    vv = f3.cell_vertex_coords
    vol = np.abs(np.einsum("ci,ci->c",
                           np.cross(vv[:, 1] - vv[:, 0], vv[:, 2] - vv[:, 0]),
                           vv[:, 3] - vv[:, 0])).sum() / 6.0
    assert np.isclose(vol, 1.0, atol=1e-12)


def test_refine_marked_tet_local():
    """Marked-edge tet bisection: volume preserved, conforming (every
    interior face shared by exactly two cells), marked edges actually
    bisected, and refinement stays local."""
    from cutfemx_tpu.refine import refine_marked
    mesh = cfx.mesh.create_unit_cube(3)
    # mark all edges of cells touching the corner (0,0,0)
    mid = mesh.vertices[mesh.edges].mean(axis=1)
    marked = np.flatnonzero(np.linalg.norm(mid, axis=1) < 0.5)
    assert len(marked) > 0
    fine = refine_marked(mesh, marked)
    assert fine.num_cells > mesh.num_cells
    vv = fine.cell_vertex_coords
    svol = np.einsum("ci,ci->c",
                     np.cross(vv[:, 1] - vv[:, 0], vv[:, 2] - vv[:, 0]),
                     vv[:, 3] - vv[:, 0]) / 6.0
    assert (svol > 0).all()                      # positively oriented
    assert np.isclose(svol.sum(), 1.0, atol=1e-12)
    # conformity: face (sorted vertex triple) counts are 1 (boundary,
    # on the cube surface) or 2 (interior)
    c = fine.cells
    faces = np.concatenate([c[:, [1, 2, 3]], c[:, [0, 2, 3]],
                            c[:, [0, 1, 3]], c[:, [0, 1, 2]]])
    faces = np.sort(faces, axis=1)
    uniq, counts = np.unique(faces, axis=0, return_counts=True)
    assert set(np.unique(counts)) <= {1, 2}
    bfaces = uniq[counts == 1]
    fv = fine.vertices[bfaces]                   # (nf, 3, 3)
    on0 = (np.abs(fv) < 1e-12).all(axis=1)
    on1 = (np.abs(fv - 1.0) < 1e-12).all(axis=1)
    assert (on0 | on1).any(axis=1).all()
    # every marked edge was bisected: its midpoint exists as a vertex
    mpts = mid[marked]
    d2 = np.min(((fine.vertices[None, :, :] - mpts[:, None, :]) ** 2)
                .sum(-1), axis=1)
    assert d2.max() < 1e-24
    # locality: cells far from the corner are untouched in count
    far = np.linalg.norm(mesh.vertices[mesh.cells].mean(axis=1) - 1.0,
                         axis=1) < 0.4
    assert fine.num_cells < 8 * mesh.num_cells   # not uniform


def test_orient_surface():
    """BFS orientation makes all windings consistent (outward normals on
    a sphere after fixing the flipped half) and reports diagnostics —
    mirrors /root/reference/cpp/tests/test_orient_surface.cpp."""
    from cutfemx_tpu.distance.stl import orient_surface, read_stl
    import tempfile, os
    raw = _sphere_soup(r=0.5, n=4)
    # weld duplicated face-boundary vertices via the STL roundtrip
    d = tempfile.mkdtemp()
    write_stl(os.path.join(d, "s.stl"), raw)
    soup = read_stl(os.path.join(d, "s.stl"))
    # scramble: flip a random half of the windings
    rng = np.random.default_rng(0)
    bad = soup.tri.copy()
    flip = rng.random(len(bad)) < 0.5
    bad[flip] = bad[flip][:, [0, 2, 1]]
    from cutfemx_tpu.distance.stl import TriSoup
    scrambled = TriSoup(soup.X, bad, soup.N.copy(), soup.tri_gid)
    fixed, diag = orient_surface(scrambled)
    assert diag.n_components == 1
    assert diag.n_nonmanifold_edges == 0
    assert diag.n_boundary_edges == 0
    # consistent: all normals point the same way (in or out) -> flip sign
    cent = fixed.X[fixed.tri].mean(axis=1)
    dots = np.einsum("ij,ij->i", fixed.N, cent)
    assert (dots > 0).all() or (dots < 0).all()


def test_reinitialize_p2_level_set():
    """Higher-order reinitialize (the reference's target-space variant,
    distance.py:176-240): a distorted P2 level set with a circular zero
    contour comes back as the signed distance, exact near the band."""
    mesh = cfx.mesh.create_rectangle((-1, -1), (1, 1), (24, 24))
    V = cfx.functionspace(mesh, ("Lagrange", 2))
    phi = cfx.Function(V, name="phi")
    r = 0.55
    # distorted: same zero set as |x| - r, wrong slope away from it
    phi.interpolate(lambda x: (x[0] ** 2 + x[1] ** 2 - r ** 2)
                    * (1.0 + 0.5 * x[0] ** 2))
    out = distance.reinitialize(phi)
    assert out.function_space.degree == 2
    coords = np.asarray(V.dof_coordinates)
    exact = np.linalg.norm(coords, axis=1) - r
    err = np.abs(np.asarray(out.x) - exact)
    # near band: h^2-accurate marching geometry; far field: FIM accuracy
    h = 2.0 / 24
    assert np.median(err) < 0.5 * h ** 2 * 10
    assert err.max() < 0.12 * r


def test_extend_normal_velocity_target_space():
    mesh = cfx.mesh.create_rectangle((-1, -1), (1, 1), (16, 16))
    V1 = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(V1, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2) - 0.5)
    speed = cfx.Function(V1, name="s")
    speed.interpolate(lambda x: 1.0 + 0.0 * x[0])
    V2 = cfx.functionspace(mesh, ("Lagrange", 2))
    res = distance.extend_normal_velocity(phi, speed, target_space=V2)
    assert res.speed.function_space is V2
    assert res.velocity.function_space.degree == 2
    assert res.signed_distance.function_space is V2
    # constant unit speed extends to ~1 everywhere
    s = np.asarray(res.speed.x)
    assert np.abs(s - 1.0).max() < 0.05
    # velocity magnitude ~ 1 where defined
    v = np.asarray(res.velocity.x).reshape(-1, 2)
    mag = np.linalg.norm(v, axis=1)
    assert np.abs(np.median(mag) - 1.0) < 0.05
