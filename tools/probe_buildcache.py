"""Probe: does the verified-reuse build cache adopt on a second
identical pipeline pass? (CPU, small n — adoption logic is
backend-independent)."""
import time

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import cutfemx_tpu as cfx
from cutfemx_tpu import fem, stencil
from cutfemx_tpu.forms.dsl import (CellDiameter, FacetNormal,
                                   SpatialCoordinate, TestFunction,
                                   TrialFunction, avg, dot, grad, inner,
                                   jump, pi, sin)
from cutfemx_tpu.forms.measure import Measure

# instrument adoption
orig_adopt = stencil.StencilCutOperator._adopt_cached
orig_store = stencil.StencilCutOperator._store_cached


def adopt(self, stage):
    r = orig_adopt(self, stage)
    entry = self._cache_entry()
    why = ""
    if not r and entry and stage in entry:
        import numpy as _np
        why = " (fp mismatch)" if not _np.array_equal(
            entry["fp"], self._build_inputs_fp()) else " (?)"
    elif not r and entry is None:
        why = " (no entry for key)"
    elif not r:
        why = f" (stage {stage} not stored)"
    print(f"[probe] adopt({stage}) -> {r}{why}", flush=True)
    return r


def store(self, stage, names):
    print(f"[probe] store({stage})", flush=True)
    return orig_store(self, stage, names)


stencil.StencilCutOperator._adopt_cached = adopt
stencil.StencilCutOperator._store_cached = store

n, deg, r, gamma = 16, 2, 0.46, 40.0
mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (n, n, n))
Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
phi = cfx.Function(Vphi, name="phi")
phi.interpolate(lambda x: np.sqrt(x[0]**2 + x[1]**2 + x[2]**2) - r)
V = cfx.functionspace(mesh, ("Lagrange", deg))
_ = mesh.facets


def pipeline():
    cd = cfx.cut(phi)
    inside = cfx.locate_entities(cd, "phi<0")
    vol = cfx.runtime_quadrature(cd, "phi<0", 2 * deg)
    srf = cfx.runtime_quadrature(cd, "phi=0", 2 * deg)
    gp = cfx.ghost_penalty_facets(cd, "phi<0")
    dxo = Measure("dx", domain=mesh, subdomain_data=[inside, vol])
    dxg = Measure("dx", domain=mesh, subdomain_data=srf)
    dSg = Measure("dS", domain=mesh, subdomain_data=gp)
    u, v = TrialFunction(V), TestFunction(V)
    x = SpatialCoordinate(mesh)
    ng = cfx.normal(phi)
    nf = FacetNormal(mesh)
    h = CellDiameter(mesh)
    ue = sin(pi * x[0]) * sin(pi * x[1]) * sin(pi * x[2])
    f = 3 * pi**2 * ue
    a = inner(grad(u), grad(v)) * dxo
    a += (-dot(grad(u), ng) * v - dot(grad(v), ng) * u
          + gamma / h * u * v) * dxg
    a += 0.1 * avg(h) * inner(jump(grad(u), nf), jump(grad(v), nf)) * dSg
    L = f * v * dxo + (-dot(grad(v), ng) * ue + gamma / h * ue * v) * dxg
    af = fem.form(a, dtype=np.float32)
    Lf = fem.form(L, dtype=np.float32)
    dom = fem.active_domain(af)
    b = fem.assemble_vector(Lf)
    op = stencil.StencilCutOperator(af, dom)
    x_, its, res = op.solve_cg(b, rtol=1e-6, maxiter=300, precond="asm")
    x_.block_until_ready()
    return x_, its, res


for p in range(3):
    t0 = time.perf_counter()
    x_, its, res = pipeline()
    print(f"[probe] pass {p}: {time.perf_counter()-t0:.2f}s its={its} "
          f"res={res:.3e}", flush=True)
