"""Cut boundary integrals: sphere/circle perimeter via facet-hosted and
interface runtime quadrature (re-design of
/root/reference/python/demo/demo_boundary_sphere_perimeter.py).

Run: python demos/demo_boundary_sphere_perimeter.py [--n 32] [--dim 2|3]
"""

from __future__ import annotations

import argparse

import numpy as np

import cutfemx_tpu as cfx


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=32)
    p.add_argument("--dim", type=int, default=2, choices=(2, 3))
    args = p.parse_args()
    n, r = args.n, 0.43

    if args.dim == 2:
        mesh = cfx.mesh.create_rectangle((-1, -1), (1, 1), (n, n))
        exact_perim = 2 * np.pi * r
        exact_area = np.pi * r ** 2
    else:
        mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (n, n, n))
        exact_perim = 4 * np.pi * r ** 2
        exact_area = 4 / 3 * np.pi * r ** 3

    V = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: np.sqrt(sum(x[i] ** 2
                                          for i in range(args.dim))) - r)

    cd = cfx.cut(phi)
    inside = cfx.locate_entities(cd, "phi<0")
    srf = cfx.runtime_quadrature(cd, "phi=0", 3)
    vol = cfx.runtime_quadrature(cd, "phi<0", 3)

    perim = float(np.asarray(srf.weights_padded).sum())
    area_cut = float(np.asarray(vol.weights_padded).sum())
    coords = mesh.cell_vertex_coords[inside]
    if args.dim == 2:
        E1 = coords[:, 1] - coords[:, 0]
        E2 = coords[:, 2] - coords[:, 0]
        full = 0.5 * np.abs(E1[:, 0] * E2[:, 1] - E1[:, 1] * E2[:, 0]).sum()
    else:
        full = np.abs(np.einsum(
            "ci,ci->c",
            np.cross(coords[:, 1] - coords[:, 0],
                     coords[:, 2] - coords[:, 0]),
            coords[:, 3] - coords[:, 0])).sum() / 6.0
    area = full + area_cut

    name = "perimeter" if args.dim == 2 else "surface area"
    vname = "area" if args.dim == 2 else "volume"
    print(f"Cut {name} demo, dim={args.dim}, n={n}, r={r}")
    print(f"{name:13s} = {perim:.6f}  (exact {exact_perim:.6f}, "
          f"err {abs(perim - exact_perim):.2e})")
    print(f"{vname:13s} = {area:.6f}  (exact {exact_area:.6f}, "
          f"err {abs(area - exact_area):.2e})")


if __name__ == "__main__":
    main()
