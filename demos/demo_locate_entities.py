"""Entity classification and boolean selectors (re-design of
/root/reference/python/demo/demo_locate_entities.py): classify cells
against two level sets and evaluate combined selectors.

Run: python demos/demo_locate_entities.py [--n 24]
"""

from __future__ import annotations

import argparse

import numpy as np

import cutfemx_tpu as cfx


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=24)
    args = p.parse_args()
    mesh = cfx.mesh.create_rectangle((-1.0, -1.0), (1.0, 1.0),
                                     (args.n, args.n))
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    circle = cfx.Function(V, name="circle")
    circle.interpolate(lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2) - 0.6)
    band = cfx.Function(V, name="band")
    band.interpolate(lambda x: np.abs(x[1]) - 0.25)

    cd = cfx.cut([circle, band])
    print(f"level sets: {cd.level_set_names}")
    for sel in ("circle<0", "circle=0", "band<0",
                "circle<0 and band<0", "circle=0 or band=0",
                "circle<=0 and band>0"):
        cells = cfx.locate_entities(cd, sel)
        print(f"  {sel:28s} -> {cells.size:5d} cells")

    # facet-hosted classification on the outer boundary
    ext = mesh.exterior_facets
    fcd = cfx.cut(circle, ext, mesh.tdim - 1)
    print(f"boundary facets with circle=0: "
          f"{cfx.locate_entities(fcd, 'circle=0').size}")


if __name__ == "__main__":
    main()
