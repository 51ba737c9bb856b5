"""Prototype: cube-block overlapping additive-Schwarz PCG vs Jacobi PCG
iteration counts on the cut-Poisson P2 system (exact blocks extracted from
the assembled matrix — the ceiling for a device-side ASM preconditioner).

CPU-only experiment; decides whether a grid-native block preconditioner is
worth building into StencilCutOperator.
"""
import sys
import time

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (CellDiameter, FacetNormal,
                                   SpatialCoordinate, TestFunction,
                                   TrialFunction, avg, dot, grad, inner,
                                   jump, pi, sin)
from cutfemx_tpu.forms.measure import Measure

n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
deg, r, gamma = 2, 0.46, 40.0
mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (n, n, n))
Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
phi = cfx.Function(Vphi, name="phi")
phi.interpolate(lambda x: np.sqrt(x[0]**2 + x[1]**2 + x[2]**2) - r)
V = cfx.functionspace(mesh, ("Lagrange", deg))
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
ue = sin(pi*x[0])*sin(pi*x[1])*sin(pi*x[2])
f = 3*pi**2*ue
a = inner(grad(u), grad(v))*dxo + (-dot(grad(u), ng)*v
    - dot(grad(v), ng)*u + gamma/h*u*v)*dxg
a += 0.1*avg(h)*inner(jump(grad(u), nf), jump(grad(v), nf))*dSg
L = f*v*dxo + (-dot(grad(v), ng)*ue + gamma/h*ue*v)*dxg
af, Lf = fem.form(a), fem.form(L)
dom = fem.active_domain(af)
b = np.array(fem.assemble_vector(Lf))
A = fem.assemble_matrix(af)
fem.deactivate_outside(A, b, dom)
A = A.to_scipy().tocsr()
active = np.asarray(dom.active_mask)
print(f"n={n} dofs={V.dim} active={active.sum()}")

rtol = 1e-6
bnorm = np.linalg.norm(b)


def pcg(Minv, label, maxiter=1500):
    it = [0]
    xs, info = spla.cg(A, b, rtol=rtol, maxiter=maxiter,
                       M=spla.LinearOperator(A.shape, Minv),
                       callback=lambda xk: it.__setitem__(0, it[0]+1))
    res = np.linalg.norm(b - A @ xs) / bnorm
    print(f"{label:28s} iters={it[0]:4d} relres={res:.2e}")
    return it[0]


# 1) Jacobi baseline
d = A.diagonal().copy()
d[d == 0] = 1.0
pcg(lambda r_: r_ / d, "jacobi")

# 2) exact cube-block ASM (overlapping, sqrt-multiplicity weighting)
cube_of_cell = np.arange(mesh.num_cells) // 6
bd = V.blocked_dofmap
ncubes = n**3
# dofs per cube = union of its 6 cells' dofs (27 for P2, 8 for P1)
cube_dofs = {}
for c in range(mesh.num_cells):
    q = cube_of_cell[c]
    cube_dofs.setdefault(q, set()).update(bd[c].tolist())
# keep cubes with any active dof
t0 = time.perf_counter()
blocks = {}
mult = np.zeros(V.dim)
for q, ds_ in cube_dofs.items():
    dd = np.fromiter(ds_, int)
    dd = dd[active[dd]]
    if len(dd) == 0:
        continue
    blocks[q] = dd
    mult[dd] += 1.0
w = np.zeros(V.dim)
nz = mult > 0
w[nz] = 1.0 / np.sqrt(mult[nz])
inv_blocks = {}
for q, dd in blocks.items():
    Aq = A[np.ix_(dd, dd)].toarray()
    # SPD clamp
    ew, Q = np.linalg.eigh(0.5*(Aq+Aq.T))
    ew = np.maximum(ew, 1e-10*np.abs(ew).max())
    inv_blocks[q] = (dd, Q @ np.diag(1.0/ew) @ Q.T)
print(f"blocks={len(inv_blocks)} build {time.perf_counter()-t0:.1f}s")


def asm(r_, weighted=True):
    z = np.zeros(len(r_), np.float64)
    rw = (r_ * w if weighted else r_).astype(np.float64)
    for q, (dd, Bi) in inv_blocks.items():
        z[dd] += Bi @ rw[dd]
    if weighted:
        z *= w
    # inactive dofs: identity
    z[~active] = r_[~active]
    return z


pcg(lambda r_: asm(r_, True), "cube-ASM exact (sqrt-mult)")
pcg(lambda r_: asm(r_, False), "cube-ASM exact (unweighted)")

# 3) home-fold + exact diagonal correction (the cheap device variant):
#    block = A[ix(dd,dd)] restricted to HOME-cube couplings only is hard to
#    reproduce from the assembled matrix; approximate the quality loss by
#    zeroing block off-diagonals whose pair of dofs shares no home cell in
#    this cube — skipped here; exact ceiling above decides go/no-go.
