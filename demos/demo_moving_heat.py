"""Moving-domain heat equation (BASELINE.json config 5): backward-Euler
time stepping on a translating disk — re-cut, re-assemble and solve each
step with cached kernels; manufactured solution
u = exp(-t) sin(pi x) sin(pi y), f = u_t - lap(u) = (2 pi^2 - 1) u.

The interface moves less than one cell per step, so every newly
activated dof lies in the previous step's ghost-penalty band and carries
meaningful history.

Run: python demos/demo_moving_heat.py [--n 32] [--steps 10]
"""

from __future__ import annotations

import argparse

import numpy as np

import jax.numpy as jnp

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (CellDiameter, CoefficientExpr,
                                   FacetNormal, SpatialCoordinate,
                                   TestFunction, TrialFunction, avg, dot,
                                   exp as uexp, grad, inner, jump, pi, sin)
from cutfemx_tpu.forms.measure import Measure
from cutfemx_tpu.la import direct_solve


def run(n=32, steps=10, r=0.42, gamma=40.0, gamma_g=0.1, speed=0.04):
    mesh = cfx.mesh.create_rectangle((-1.0, -1.0), (1.0, 1.0), (n, n))
    h = 2.0 / n
    dt = 0.5 * h / max(speed, 1e-12) * 0.5   # interface moves < h/2 per dt
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    uh = cfx.Function(V, name="u")

    x = SpatialCoordinate(mesh)
    space = sin(pi * x[0]) * sin(pi * x[1])

    def exact_np(t):
        c = V.dof_coordinates
        return np.exp(-t) * np.sin(np.pi * c[:, 0]) * np.sin(
            np.pi * c[:, 1])

    errors = []
    t = 0.0
    cut_data = None
    for step in range(steps + 1):
        cx = -0.2 + speed * t
        phi.interpolate(lambda X: np.sqrt((X[0] - cx) ** 2 + X[1] ** 2)
                        - r)
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

        if step == 0:
            uh.x = jnp.asarray(exact_np(0.0))
            t += dt
            continue

        u, v = TrialFunction(V), TestFunction(V)
        ng = cfx.normal(phi)
        nf = FacetNormal(mesh)
        hc = CellDiameter(mesh)
        t_new = t
        ue = float(np.exp(-t_new)) * space
        f = (2 * pi ** 2 - 1.0) * ue
        un = CoefficientExpr(uh)

        a = (u * v / dt + inner(grad(u), grad(v))) * dxo
        a += (-dot(grad(u), ng) * v - dot(grad(v), ng) * u
              + gamma / hc * u * v) * dxg
        if gp.size:
            a += gamma_g * avg(hc) * inner(jump(grad(u), nf),
                                           jump(grad(v), nf)) * dSg
        L = (f + un / dt) * v * dxo
        L += (-dot(grad(v), ng) * ue + gamma / hc * ue * v) * dxg

        af, Lf = fem.form(a), fem.form(L)
        A = fem.assemble_matrix(af)
        b = np.array(fem.assemble_vector(Lf))
        fem.deactivate_outside(A, b, fem.active_domain(af))
        uh.x = jnp.asarray(direct_solve(A, b))

        e = CoefficientExpr(uh) - ue
        err = np.sqrt(max(float(fem.assemble_scalar(
            fem.form(e * e * dxo))), 0.0))
        errors.append(err)
        yield_info = (step, cx, err)
        print(f"step {step:3d}: t={t_new:.3f} center={cx:+.3f} "
              f"L2 error={err:.3e}")
        t += dt
    return errors


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=32)
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()
    errors = run(args.n, args.steps)
    print(f"max L2 error over {args.steps} steps: {max(errors):.3e}")


if __name__ == "__main__":
    main()
