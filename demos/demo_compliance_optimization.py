"""Level-set compliance (shape) optimization — a compact re-design of
/root/reference/python/demo/demo_compliance_optimization.py exercising the
full moving-interface toolchain:

  per iteration: cut + runtime quadrature -> cut elasticity solve
  (Nitsche traction-free hole boundary, clamped left edge, load on right)
  -> shape derivative (elastic energy density on the interface, volume
  multiplier) -> normal-velocity extension into the bulk
  (distance.extend_normal_velocity) -> Hamilton-Jacobi level-set advection
  -> periodic reinitialization.

The reference adds L-BFGS, SUPG advection and Armijo backtracking; this
version uses plain steepest descent with a fixed CFL step, which is enough
to drive compliance down while conserving the volume target.

Run: python demos/demo_compliance_optimization.py [--n 32] [--iters 10]
"""

from __future__ import annotations

import argparse

import numpy as np

import jax.numpy as jnp

import cutfemx_tpu as cfx
from cutfemx_tpu import distance, fem
from cutfemx_tpu.forms.dsl import (CellDiameter, CoefficientExpr,
                                   FacetNormal, Identity, SpatialCoordinate,
                                   TestFunction, TrialFunction, as_vector,
                                   avg, dot, grad, inner, jump, sym, tr)
from cutfemx_tpu.forms.measure import Measure
from cutfemx_tpu.la import direct_solve


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=32)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    n = args.n
    mu, lam = 1.0, 1.25
    gamma, gamma_g = 60.0, 0.1
    step_cfl = 0.5
    target_volume = 1.8  # domain area is 2.0; keep the holes open

    # structure occupies {phi < 0} inside [0,2]x[0,1]; holes are phi > 0
    mesh = cfx.mesh.create_rectangle((0.0, 0.0), (2.0, 1.0), (2 * n, n))
    h = 1.0 / n
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")

    def init_phi(x):
        # two seed holes
        h1 = 0.18 - np.sqrt((x[0] - 0.7) ** 2 + (x[1] - 0.5) ** 2)
        h2 = 0.18 - np.sqrt((x[0] - 1.4) ** 2 + (x[1] - 0.5) ** 2)
        return np.maximum(h1, h2)

    phi.interpolate(init_phi)
    phi = distance.reinitialize(phi)

    V = cfx.functionspace(mesh, ("Lagrange", 1), shape=(2,))
    x = SpatialCoordinate(mesh)

    def sigma(w):
        e = sym(grad(w))
        return 2 * mu * e + lam * tr(e) * Identity(2)

    lam_vol = 0.0
    print(f"{'it':>3s} {'compliance':>12s} {'volume':>9s} {'|speed|':>9s}")
    for it in range(args.iters):
        cd = cfx.cut(phi)
        inside = cfx.locate_entities(cd, "phi<0")
        vol_rules = cfx.runtime_quadrature(cd, "phi<0", 2)
        srf_rules = cfx.runtime_quadrature(cd, "phi=0", 2)
        gp = cfx.ghost_penalty_facets(cd, "phi<0")

        dxo = Measure("dx", domain=mesh, subdomain_data=[inside, vol_rules])
        dxg = Measure("dx", domain=mesh, subdomain_data=srf_rules)
        dSg = Measure("dS", domain=mesh, subdomain_data=gp)

        u, v = TrialFunction(V), TestFunction(V)
        nf = FacetNormal(mesh)
        hh = CellDiameter(mesh)

        a = inner(sigma(u), sym(grad(v))) * dxo
        if gp.size:
            a += gamma_g * avg(hh) * inner(jump(grad(u), nf),
                                           jump(grad(v), nf)) * dSg
        # clamp left edge (x=0) strongly; hole boundary is traction-free
        ext = mesh.exterior_facets
        mid = mesh.midpoints(mesh.tdim - 1, ext)
        left = ext[np.abs(mid[:, 0]) < 1e-12]
        right = ext[np.abs(mid[:, 0] - 2.0) < 1e-12]
        traction = as_vector([0.0, -0.1])
        ds_right = Measure("ds", domain=mesh, subdomain_data=right)
        L = inner(traction, v) * ds_right

        af, Lf = fem.form(a), fem.form(L)
        bcs = [fem.dirichletbc(
            0.0, fem.locate_dofs_topological(V, mesh.tdim - 1, left), V)]
        A = fem.assemble_matrix(af, bcs=bcs)
        b = np.array(fem.assemble_vector(Lf))
        b = fem.set_bc(b, bcs)
        dom = fem.active_domain(af)
        fem.deactivate_outside(A, b, dom)
        uh = cfx.Function(V)
        uh.x = jnp.asarray(direct_solve(A, b))

        uexpr = CoefficientExpr(uh)
        compliance = float(fem.assemble_scalar(fem.form(
            inner(sigma(uexpr), sym(grad(uexpr))) * dxo)))
        volume = float(fem.assemble_scalar(fem.form(
            (x[0] * 0 + 1.0) * dxo)))

        # shape derivative of compliance w.r.t. normal motion of the hole
        # boundary: dJ = -int_Gamma W V ds with W the energy density;
        # volume multiplier keeps the material amount near the target
        lam_vol += 2.0 * (volume - target_volume)
        energy = inner(sigma(uexpr), sym(grad(uexpr)))
        # boundary speed theta = W - lambda (positive = structure grows)
        speed = cfx.Function(Vphi, name="speed")
        # project the energy density onto P1 via interface lumped masses
        w_mass = fem.assemble_vector(fem.form(TestFunction(Vphi) * dxg))
        w_en = fem.assemble_vector(fem.form(
            energy * TestFunction(Vphi) * dxg))
        dens = np.asarray(w_en) / np.maximum(np.asarray(w_mass), 1e-14)
        speed.x = jnp.asarray(np.clip(dens - lam_vol, -5.0, 5.0))

        res = distance.extend_normal_velocity(phi, speed)
        sext = np.asarray(res.speed.x)
        smax = np.abs(sext).max() + 1e-14
        dt = step_cfl * h / smax
        # HJ advection: phi_t + s |grad phi| = 0, with phi a distance
        # function (|grad phi| = 1): vertex-wise explicit update
        phi.x = phi.x - dt * jnp.asarray(sext)
        if (it + 1) % 3 == 0:
            phi = distance.reinitialize(phi)

        print(f"{it:3d} {compliance:12.5e} {volume:9.4f} {smax:9.3f}")

    print("done: compliance should decrease while volume stays near "
          f"{target_volume}")


if __name__ == "__main__":
    main()
