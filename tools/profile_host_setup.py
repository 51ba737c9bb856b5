"""Profile the bench host-setup phases (CPU-only, no TPU traffic)."""
import sys
import time

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

import cutfemx_tpu as cfx

n = int(sys.argv[1]) if len(sys.argv) > 1 else 48

t0 = time.perf_counter()
mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (n, n, n))
t1 = time.perf_counter()
print(f"create_box          {t1 - t0:7.2f}s", flush=True)
Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
t2 = time.perf_counter()
print(f"P1 space            {t2 - t1:7.2f}s", flush=True)
phi = cfx.Function(Vphi, name="phi")
phi.interpolate(lambda x: np.sqrt(x[0]**2 + x[1]**2 + x[2]**2) - 0.46)
t3 = time.perf_counter()
print(f"phi interpolate     {t3 - t2:7.2f}s", flush=True)
V = cfx.functionspace(mesh, ("Lagrange", 2))
t4 = time.perf_counter()
print(f"P2 space            {t4 - t3:7.2f}s", flush=True)
_ = mesh.facets
t5 = time.perf_counter()
print(f"facets              {t5 - t4:7.2f}s", flush=True)
_ = mesh.cell_vertex_coords
t6 = time.perf_counter()
print(f"cell_vertex_coords  {t6 - t5:7.2f}s", flush=True)
_ = mesh.cell_diameters()
t7 = time.perf_counter()
print(f"cell_diameters      {t7 - t6:7.2f}s", flush=True)
print(f"TOTAL               {t7 - t0:7.2f}s", flush=True)
