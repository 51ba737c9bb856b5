"""Prototype: full-box lattice V-cycle as preconditioner for the cut-P2
system. Measures PCG iteration counts vs Jacobi on CPU (small n).

The P2 dofs of an n^3 create_box tet mesh sit exactly on the (2n+1)^3
half-step lattice; the preconditioner is a geometric V-cycle for the
7-point Laplacian on that lattice (Dirichlet box boundary), applied to
the residual injected into the grid (inactive dofs zero)."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import cutfemx_tpu as cfx
from cutfemx_tpu import fem
from cutfemx_tpu.forms.dsl import (CellDiameter, FacetNormal, TestFunction,
                                   TrialFunction, avg, dot, grad, inner,
                                   jump)
from cutfemx_tpu.forms.measure import Measure

n, deg, r = int(sys.argv[1]) if len(sys.argv) > 1 else 16, 2, 0.46
mesh = cfx.mesh.create_box((-1, -1, -1), (1, 1, 1), (n, n, n))
V1 = cfx.functionspace(mesh, ("Lagrange", 1))
phi = cfx.Function(V1, name="phi")
phi.interpolate(lambda x: np.sqrt(x[0]**2 + x[1]**2 + x[2]**2) - r)
cd = cfx.cut(phi)
inside = cfx.locate_entities(cd, "phi<0")
vol = cfx.runtime_quadrature(cd, "phi<0", 2 * deg)
srf = cfx.runtime_quadrature(cd, "phi=0", 2 * deg)
gp = cfx.ghost_penalty_facets(cd, "phi<0")
dxo = Measure("dx", domain=mesh, subdomain_data=[inside, vol])
dxg = Measure("dx", domain=mesh, subdomain_data=srf)
dSg = Measure("dS", domain=mesh, subdomain_data=gp)
V = cfx.functionspace(mesh, ("Lagrange", deg))
u, v = TrialFunction(V), TestFunction(V)
ng = cfx.normal(phi)
nf = FacetNormal(mesh)
h = CellDiameter(mesh)
a = inner(grad(u), grad(v)) * dxo \
    + (-dot(grad(u), ng) * v - dot(grad(v), ng) * u + 40. / h * u * v) * dxg \
    + 0.1 * avg(h) * inner(jump(grad(u), nf), jump(grad(v), nf)) * dSg
af = fem.form(a)
dom = fem.active_domain(af)
A = fem.assemble_matrix(af).to_scipy().tocsr()
active = np.asarray(dom.active_mask)
# identity on inactive rows
import scipy.sparse as sps
Aact = A.copy()
d = Aact.diagonal()
d[~active] = 1.0
Aact = Aact.tolil()
rows = np.flatnonzero(~active)
Aact[rows, :] = 0.0
Aact[:, rows] = 0.0
Aact = Aact.tocsr() + sps.coo_matrix(
    (np.ones(len(rows)), (rows, rows)), shape=A.shape).tocsr()
print("n", n, "dofs", A.shape[0], "active", active.sum(), flush=True)

# -- map P2 dofs -> (2n+1)^3 lattice ----------------------------------------
N = 2 * n + 1
hf = 1.0 / n                                   # fine lattice spacing (x2)
# vertex dofs at even lattice sites, edge dofs at odd (midpoints)
lat = np.zeros((V.dim, 3), np.int64)
vcoords = mesh.vertices
lo = vcoords.min(0)
lat_v = np.round((vcoords - lo) / (hf)).astype(np.int64)
lat[:mesh.num_vertices] = lat_v
emid = 0.5 * (vcoords[mesh.edges[:, 0]] + vcoords[mesh.edges[:, 1]])
lat[mesh.num_vertices:] = np.round((emid - lo) / hf).astype(np.int64)
lin = (lat[:, 0] * N + lat[:, 1]) * N + lat[:, 2]
assert len(np.unique(lin)) == V.dim == N**3
perm = np.argsort(lin)            # dof order -> lattice order
iperm = np.empty_like(perm)
iperm[perm] = np.arange(len(perm))

active_g = np.zeros(N**3, bool)
active_g[lin[active]] = True


def lap3(X):
    """7-point Laplacian with Dirichlet outside, spacing s=1 scale."""
    Y = 6.0 * X
    Y[1:] -= X[:-1]; Y[:-1] -= X[1:]
    Y[:, 1:] -= X[:, :-1]; Y[:, :-1] -= X[:, 1:]
    Y[:, :, 1:] -= X[:, :, :-1]; Y[:, :, :-1] -= X[:, :, 1:]
    return Y


def restrict_fw(R):
    """Full weighting (= P^T/8 for trilinear P): (2m+1)->(m+1)."""
    def ax0(A):
        B = 2.0 * A[::2]
        B[:-1] += A[1::2]
        B[1:] += A[1::2]
        return B / 4.0
    w = ax0(R)
    w = np.moveaxis(ax0(np.moveaxis(w, 1, 0)), 0, 1)
    w = np.moveaxis(ax0(np.moveaxis(w, 2, 0)), 0, 2)
    return w


def prolong(Xc, shape):
    Xf = np.zeros(shape)
    Xf[::2, ::2, ::2] = Xc
    Xf[1::2] = 0.5 * (Xf[:-1:2] + Xf[2::2])
    Xf[:, 1::2] = 0.5 * (Xf[:, :-1:2] + Xf[:, 2::2])
    Xf[:, :, 1::2] = 0.5 * (Xf[:, :, :-1:2] + Xf[:, :, 2::2])
    return Xf


def vcycle(R, nu=2):
    """Symmetric geometric V-cycle for lap3 (fixed linear operator)."""
    if min(R.shape) <= 5:
        X = np.zeros_like(R)
        for _ in range(100):
            X += (2.0 / 3.0) / 6.0 * (R - lap3(X))
        return X
    X = np.zeros_like(R)
    for _ in range(nu):
        X += (2.0 / 3.0) / 6.0 * (R - lap3(X))
    rc = restrict_fw(R - lap3(X))
    X += prolong(vcycle(rc, nu) * 4.0, R.shape)
    for _ in range(nu):
        X += (2.0 / 3.0) / 6.0 * (R - lap3(X))
    return X


diagA = Aact.diagonal()


def M_mg(rvec, scale):
    R = np.zeros(N**3)
    R[lin] = rvec
    R[~active_g] = 0.0
    X = vcycle(R.reshape(N, N, N)).reshape(-1) * scale
    X[~active_g] = 0.0
    out = X[lin]
    out[~active] = rvec[~active]
    return out


def pcg(A, b, M, tol=1e-6, maxiter=2000):
    x = np.zeros_like(b)
    r = b - A @ x
    z = M(r)
    p = z.copy()
    rz = r @ z
    b0 = np.linalg.norm(b)
    for k in range(maxiter):
        Ap = A @ p
        alpha = rz / (p @ Ap)
        x += alpha * p
        r -= alpha * Ap
        if np.linalg.norm(r) < tol * b0:
            return x, k + 1
        z = M(r)
        rz2 = r @ z
        p = z + (rz2 / rz) * p
        rz = rz2
    return x, maxiter


rng = np.random.default_rng(0)
b = rng.standard_normal(A.shape[0])
b[~active] = 0.0

_, itj = pcg(Aact, b, lambda r: r / diagA)
print("jacobi PCG its:", itj, flush=True)
# lattice spacing scale: lap3 is h-free; FEM scale ~ h (3D Laplacian
# stiffness ~ h). Try a few scales.
for sc in (0.5 / hf * 0.5, 1.0 / hf * 0.5, 2.0 / hf * 0.5):
    _, itm = pcg(Aact, b, lambda r: M_mg(r, 1.0 / sc))
    print(f"lattice-MG PCG its (scale {sc:.2f}):", itm, flush=True)
# additive combination
for w in (0.5, 1.0):
    sc = 1.0 / hf * 0.5
    _, ita = pcg(Aact, b,
                 lambda r: w * M_mg(r, 1.0 / sc) + r / diagA)
    print(f"additive MG+jacobi (w={w}) its:", ita, flush=True)
