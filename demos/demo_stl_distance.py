"""Distributed signed distance from an STL surface (re-design of
/root/reference/python/demo/demo_stl_distance.py): STL -> triangle soup ->
cell-triangle map -> exact near field -> Eikonal far field -> sign.

Run: python demos/demo_stl_distance.py [--stl path] [--n 16]
(without --stl, a sphere STL is generated on the fly)
"""

from __future__ import annotations

import argparse
import tempfile
from pathlib import Path

import numpy as np

import cutfemx_tpu as cfx
from cutfemx_tpu import distance


def _make_sphere_stl(path, r=0.5, n=12):
    from cutfemx_tpu.distance.stl import TriSoup, write_stl
    verts, tris = [], []
    nverts = 0
    for axis in range(3):
        for s in (-1.0, 1.0):
            base = nverts
            u = np.linspace(-1, 1, n + 1)
            U, W = np.meshgrid(u, u, indexing="ij")
            pts = np.zeros((n + 1, n + 1, 3))
            pts[..., axis] = s
            pts[..., (axis + 1) % 3] = U * s
            pts[..., (axis + 2) % 3] = W
            pts = pts.reshape(-1, 3)
            pts = pts / np.linalg.norm(pts, axis=1, keepdims=True) * r
            verts.append(pts)
            nverts += len(pts)
            for i in range(n):
                for j in range(n):
                    a = base + i * (n + 1) + j
                    b = a + n + 1
                    tris += [[a, a + 1, b + 1], [a, b + 1, b]]
    X = np.concatenate(verts)
    tri = np.asarray(tris, np.int32)
    N = np.cross(X[tri[:, 1]] - X[tri[:, 0]], X[tri[:, 2]] - X[tri[:, 0]])
    cent = X[tri].mean(axis=1)
    flip = np.einsum("ij,ij->i", N, cent) < 0
    tri[flip] = tri[flip][:, [0, 2, 1]]
    N = np.where(flip[:, None], -N, N)
    N /= np.linalg.norm(N, axis=1, keepdims=True)
    write_stl(path, TriSoup(X, tri, N, np.arange(len(tri))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stl", default=None)
    p.add_argument("--n", type=int, default=16)
    p.add_argument("--sign-mode", default="component_anchor",
                   choices=[m.value for m in distance.SignMode])
    args = p.parse_args()

    if args.stl is None:
        tmp = Path(tempfile.mkdtemp()) / "sphere.stl"
        _make_sphere_stl(tmp)
        stl_path = tmp
        print("generated sphere STL:", stl_path)
    else:
        stl_path = Path(args.stl)

    lo, hi = distance.stl_bbox(stl_path)
    pad = 0.5 * (np.asarray(hi) - np.asarray(lo)).max()
    mesh = cfx.mesh.create_box(np.asarray(lo) - pad, np.asarray(hi) + pad,
                               (args.n, args.n, args.n))
    f = distance.from_stl(mesh, stl_path, sign_mode=args.sign_mode)
    vals = np.asarray(f.x)
    print(f"STL signed distance, mesh n={args.n}")
    print(f"bbox                = {np.round(lo, 3)} .. {np.round(hi, 3)}")
    print(f"distance range      = [{vals.min():.4f}, {vals.max():.4f}]")
    print(f"negative (inside) vertices = {(vals < 0).sum()}")


if __name__ == "__main__":
    main()
