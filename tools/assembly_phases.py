"""Phase timing of the steady-state bench pipeline (what's inside
assembly_s). Run on TPU."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (CellDiameter, FacetNormal,
                                   SpatialCoordinate, TestFunction,
                                   TrialFunction, avg, dot, grad, inner,
                                   jump, pi, sin)
from cutfemx_tpu.forms.measure import Measure

n, deg, r = int(sys.argv[1]) if len(sys.argv) > 1 else 48, 2, 0.46
mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (n, n, n))
Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
phi = cfx.Function(Vphi, name="phi")
phi.interpolate(lambda x: np.sqrt(x[0]**2 + x[1]**2 + x[2]**2) - r)
V = cfx.functionspace(mesh, ("Lagrange", deg))


def stamp(label, t0):
    t = time.perf_counter()
    print(f"{label:28s} {t - t0:7.3f} s", flush=True)
    return t


def pipeline(tag):
    print(f"-- {tag} --", flush=True)
    t = time.perf_counter()
    cd = cfx.cut(phi)
    t = stamp("cut/classify", t)
    inside = cfx.locate_entities(cd, "phi<0")
    t = stamp("locate_entities", t)
    vol = cfx.runtime_quadrature(cd, "phi<0", 2 * deg)
    t = stamp("runtime vol rules", t)
    srf = cfx.runtime_quadrature(cd, "phi=0", 2 * deg)
    t = stamp("runtime srf rules", t)
    gp = cfx.ghost_penalty_facets(cd, "phi<0")
    t = stamp("ghost facets", t)
    dxo = Measure("dx", domain=mesh, subdomain_data=[inside, vol])
    dxg = Measure("dx", domain=mesh, subdomain_data=srf)
    dSg = Measure("dS", domain=mesh, subdomain_data=gp)
    u, v = TrialFunction(V), TestFunction(V)
    x_ = SpatialCoordinate(mesh)
    ng = cfx.normal(phi)
    nf = FacetNormal(mesh)
    h = CellDiameter(mesh)
    f = 3.0 * pi * pi * sin(pi * x_[0]) * sin(pi * x_[1])
    a = inner(grad(u), grad(v)) * dxo \
        + (-dot(grad(u), ng) * v - dot(grad(v), ng) * u
           + 40. / h * u * v) * dxg \
        + 0.1 * avg(h) * inner(jump(grad(u), nf),
                               jump(grad(v), nf)) * dSg
    L = f * v * dxo
    af = fem.form(a)
    t = stamp("form(a) build+pad", t)
    Lf = fem.form(L)
    t = stamp("form(L) build+pad", t)
    dom = fem.active_domain(af)
    t = stamp("active_domain", t)
    b = fem.assemble_vector(Lf)
    jax.block_until_ready(b)
    t = stamp("assemble_vector", t)
    op = fem.CutOperator(af, dom)
    jax.block_until_ready(op._mats)
    t = stamp("CutOperator (mats+fold)", t)
    y = op(b)
    jax.block_until_ready(y)
    t = stamp("first apply", t)
    return op, b


pipeline("pass 1 (compile)")
t0 = time.perf_counter()
pipeline("pass 2 (steady)")
print(f"total steady assembly side: {time.perf_counter()-t0:.3f} s")
