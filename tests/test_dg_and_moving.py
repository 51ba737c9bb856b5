"""DG (SIPG) Poisson on the full-mesh skeleton and the moving-domain
re-cut loop — mirrors /root/reference/python/demo/demo_dg_poisson.py and
demo_moving_poisson.py:57-90."""

import numpy as np

import jax.numpy as jnp

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (CellDiameter, CoefficientExpr,
                                   FacetNormal, SpatialCoordinate,
                                   TestFunction, TrialFunction, avg, dot,
                                   grad, inner, jump, pi, sin)
from cutfemx_tpu.forms.measure import Measure, dS, ds, dx
from cutfemx_tpu.la import direct_solve


def solve_dg_poisson(n, degree=1, sigma=10.0):
    mesh = cfx.mesh.create_unit_square(n)
    V = cfx.functionspace(mesh, ("DG", degree))
    u, v = TrialFunction(V), TestFunction(V)
    x = SpatialCoordinate(mesh)
    nf = FacetNormal(mesh)
    h = CellDiameter(mesh)
    u_ex = sin(pi * x[0]) * sin(pi * x[1])
    f = 2 * pi ** 2 * u_ex
    pen = sigma * degree ** 2

    a = inner(grad(u), grad(v)) * dx
    a += (-inner(avg(grad(u)), jump(v, nf))
          - inner(avg(grad(v)), jump(u, nf))
          + pen / avg(h) * inner(jump(u, nf), jump(v, nf))) * dS
    a += (-dot(grad(u), nf) * v - dot(grad(v), nf) * u
          + pen / h * u * v) * ds
    L = f * v * dx
    L += (-dot(grad(v), nf) * u_ex + pen / h * u_ex * v) * ds

    A = fem.assemble_matrix(fem.form(a))
    b = np.array(fem.assemble_vector(fem.form(L)))
    uh = cfx.Function(V)
    uh.x = jnp.asarray(direct_solve(A, b))
    e = CoefficientExpr(uh) - u_ex
    return float(np.sqrt(max(float(fem.assemble_scalar(
        fem.form(e * e * dx))), 0.0)))


def test_dg_poisson_convergence():
    errs = [solve_dg_poisson(n) for n in (8, 16, 32)]
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert errs[-1] < 4e-3
    assert min(rates) > 1.7, (errs, rates)


def test_moving_domain_recut_loop():
    """Re-cut + re-assemble + solve over a moving level set; kernels are
    cached across steps (SURVEY.md §3.6 moving-domain loop)."""
    n, r, gamma = 24, 0.42, 40.0
    mesh = cfx.mesh.create_rectangle((-1.0, -1.0), (1.0, 1.0), (n, n))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    from cutfemx_tpu.forms.compile import _KERNEL_CACHE

    centers = [(0.0, 0.0), (0.1, 0.0), (0.2, 0.05), (0.25, 0.1)]
    errs = []
    cut_data = None
    n_kernels = None
    for step, c in enumerate(centers):
        phi.interpolate(lambda x: np.sqrt((x[0] - c[0]) ** 2
                                          + (x[1] - c[1]) ** 2) - r)
        if cut_data is None:
            cut_data = cfx.cut(phi)
        else:
            cfx.update(cut_data)
        inside = cfx.locate_entities(cut_data, "phi<0")
        vol = cfx.runtime_quadrature(cut_data, "phi<0", 2)
        srf = cfx.runtime_quadrature(cut_data, "phi=0", 2)
        gp = cfx.ghost_penalty_facets(cut_data, "phi<0")
        dxo = Measure("dx", domain=mesh, subdomain_data=[inside, vol])
        dxg = Measure("dx", domain=mesh, subdomain_data=srf)
        dSg = Measure("dS", domain=mesh, subdomain_data=gp)
        u, v = TrialFunction(V), TestFunction(V)
        x = SpatialCoordinate(mesh)
        ng = cfx.normal(phi)
        nf = FacetNormal(mesh)
        h = CellDiameter(mesh)
        ue = sin(pi * x[0]) * sin(pi * x[1])
        f = 2 * pi ** 2 * ue
        a = inner(grad(u), grad(v)) * dxo
        a += (-dot(grad(u), ng) * v - dot(grad(v), ng) * u
              + gamma / h * u * v) * dxg
        a += 0.1 * avg(h) * inner(jump(grad(u), nf),
                                  jump(grad(v), nf)) * dSg
        L = f * v * dxo + (-dot(grad(v), ng) * ue
                           + gamma / h * ue * v) * dxg
        af, Lf = fem.form(a), fem.form(L)
        A = fem.assemble_matrix(af)
        b = np.array(fem.assemble_vector(Lf))
        fem.deactivate_outside(A, b, fem.active_domain(af))
        uh = cfx.Function(V)
        uh.x = jnp.asarray(direct_solve(A, b))
        e = CoefficientExpr(uh) - ue
        errs.append(np.sqrt(max(float(fem.assemble_scalar(
            fem.form(e * e * dxo))), 0.0)))
        if step == 0:
            n_kernels = len(_KERNEL_CACHE)
    # compiled-kernel cache did not grow after the first step
    assert len(_KERNEL_CACHE) == n_kernels
    assert max(errs) < 8e-3, errs


def test_moving_heat_equation():
    """Backward-Euler heat on a translating disk (BASELINE config 5):
    errors stay bounded across re-cut steps."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "demo_moving_heat", "demos/demo_moving_heat.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    errors = mod.run(n=24, steps=5)
    assert max(errors) < 5e-3, errors


def test_bucketed_batches_are_shape_stable():
    """Re-cut steps with slightly different cut-cell counts produce
    identically-shaped kernel inputs (bucket padding), so TPU runs don't
    recompile per step."""
    n, r = 24, 0.42
    mesh = cfx.mesh.create_rectangle((-1.0, -1.0), (1.0, 1.0), (n, n))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    shapes = []
    for cx in (0.0, 0.004):
        phi.interpolate(lambda x: np.sqrt((x[0] - cx) ** 2 + x[1] ** 2)
                        - r)
        cd = cfx.cut(phi)
        inside = cfx.locate_entities(cd, "phi<0")
        vol = cfx.runtime_quadrature(cd, "phi<0", 2)
        dxo = Measure("dx", domain=mesh, subdomain_data=[inside, vol])
        u, v = TrialFunction(V), TestFunction(V)
        af = fem.form(inner(grad(u), grad(v)) * dxo)
        shapes.append(tuple(
            tuple(np.asarray(inst.data["coords"]).shape)
            for inst in af.instances))
        # counts genuinely differ before padding
    assert shapes[0] == shapes[1], shapes
