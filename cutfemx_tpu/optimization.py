"""Shape / level-set optimization toolkit.

TPU-native re-design of the machinery inside the reference's compliance
demo (/root/reference/python/demo/demo_compliance_optimization.py):

- ``ProfileWriter`` / ``ConvergenceWriter`` streaming CSVs + ``phase``
  timing contexts (reference :307-379),
- ``LBFGSState`` with curvature-guarded history updates and the two-loop
  inverse-Hessian product (reference :285-296, 1053-1141),
- ``AugmentedLagrangianState`` for volume-type equality constraints
  (reference :274-283, 1409-1473),
- ``AdaptiveGradientStepState`` Barzilai-Borwein step proposals clipped
  by growth + interface-motion CFL caps, and the Armijo acceptance test
  (reference :251-258, 914-989),
- ``RieszVelocitySolver`` — H1 smoothing of interface shape gradients
  onto a background field (reference :217-228, 1230-1299),
- ``LevelSetAdvectionSolver`` — SUPG-stabilized implicit transport,
  explicit nodal Hamilton-Jacobi, and semi-Lagrangian characteristics
  (reference :260-272, 1302-1385, 1973-2112).

The reference builds these on UFL/PETSc/scipy per MPI rank; here the
forms ride the JAX form compiler (structural kernel cache makes the
per-iteration rebuilds cheap) and the small background solves use the
host CSR path. Everything is deliberately solver-agnostic: states hold
plain NumPy arrays so optimizers compose with any state solve.
"""

from __future__ import annotations

import csv
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from . import fem
from .forms.dsl import (CoefficientExpr, TestFunction, TrialFunction, dot,
                        grad, inner, sqrt)
from .forms.measure import Measure
from .functionspace import Function, functionspace

__all__ = [
    "phase", "ProfileWriter", "ConvergenceWriter",
    "LBFGSState", "lbfgs_update", "lbfgs_inverse_hessian_product",
    "lbfgs_direction",
    "AugmentedLagrangianState", "update_augmented_lagrangian",
    "alm_velocity_multiplier", "lagrangian_value",
    "initialise_augmented_lagrangian_scale",
    "AdaptiveGradientStepState", "adaptive_gradient_dt",
    "accept_adaptive_gradient_step", "motion_dt_cap", "armijo_rhs",
    "RieszVelocitySolver", "LevelSetAdvectionSolver",
    "locate_cells", "evaluate_at_points",
    "SolidComponent", "solid_components", "remove_floating_components",
    "reinit_volume_shift",
]


# -- profiling / convergence writers ------------------------------------------


@contextmanager
def phase(row: dict, name: str):
    """Accumulate wall-clock into row['time_<name>'] (reference :307-313)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        key = f"time_{name}"
        row[key] = float(row.get(key, 0.0)) + time.perf_counter() - t0


class _CsvWriter:
    """Streaming CSV writer: header once, flush per row, missing fields
    blank (the reference's ProfileWriter contract, :316-341)."""

    def __init__(self, path, fieldnames):
        self.path = Path(path)
        self.fieldnames = list(fieldnames)
        self._file = None
        self._writer = None

    def __enter__(self):
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._file = self.path.open("w", newline="")
        self._writer = csv.DictWriter(self._file,
                                      fieldnames=self.fieldnames)
        self._writer.writeheader()
        self._file.flush()
        return self

    def write(self, row: dict) -> None:
        if self._writer is None:
            raise RuntimeError(f"{type(self).__name__} is not open")
        self._writer.writerow(
            {f: row.get(f, "") for f in self.fieldnames})
        self._file.flush()

    def __exit__(self, exc_type, exc, tb):
        if self._file is not None:
            self._file.close()
            self._file = None
            self._writer = None


class ProfileWriter(_CsvWriter):
    """Per-iteration phase timings + memory rows."""


class ConvergenceWriter(_CsvWriter):
    """Per-iteration scalar convergence monitoring rows."""


# -- L-BFGS --------------------------------------------------------------------


@dataclass
class LBFGSState:
    """Limited-memory BFGS history over design vectors (reference
    :285-296). Vectors are whatever flattening the caller uses (e.g. the
    interface speed dofs or level-set dofs)."""
    s_vectors: list = field(default_factory=list)
    y_vectors: list = field(default_factory=list)
    rho_values: list = field(default_factory=list)
    previous_x: np.ndarray | None = None
    previous_gradient: np.ndarray | None = None
    last_curvature: float = 0.0
    last_update_accepted: bool = False

    def clear(self):
        self.s_vectors.clear()
        self.y_vectors.clear()
        self.rho_values.clear()
        self.previous_x = None
        self.previous_gradient = None
        self.last_curvature = 0.0
        self.last_update_accepted = False


def lbfgs_update(state: LBFGSState, x, gradient, *, memory: int,
                 curvature_tol: float = 1e-8, inner_product=None) -> None:
    """Push an (s, y) pair if its curvature passes the scaled tolerance
    (reference :1053-1086). ``inner_product(a, b)`` defaults to the
    Euclidean dot; pass an H1/mass-weighted dot to optimize in the metric
    the Riesz solver regularizes in."""
    dotp = inner_product or (lambda a, b: float(np.dot(a, b)))
    state.last_curvature = 0.0
    state.last_update_accepted = False
    x = np.asarray(x, float)
    gradient = np.asarray(gradient, float)
    if state.previous_x is None or state.previous_gradient is None:
        state.previous_x = x.copy()
        state.previous_gradient = gradient.copy()
        return
    s = x - state.previous_x
    y = gradient - state.previous_gradient
    curvature = dotp(s, y)
    state.last_curvature = float(curvature)
    scale = max(np.sqrt(max(dotp(s, s), 0.0))
                * np.sqrt(max(dotp(y, y), 0.0)), 1e-30)
    if memory > 0 and np.isfinite(curvature) \
            and curvature > curvature_tol * scale:
        state.s_vectors.append(s.copy())
        state.y_vectors.append(y.copy())
        state.rho_values.append(1.0 / curvature)
        while len(state.s_vectors) > memory:
            state.s_vectors.pop(0)
            state.y_vectors.pop(0)
            state.rho_values.pop(0)
        state.last_update_accepted = True
    state.previous_x = x.copy()
    state.previous_gradient = gradient.copy()


def lbfgs_inverse_hessian_product(state: LBFGSState, gradient,
                                  inner_product=None) -> np.ndarray:
    """Two-loop recursion H @ g with the standard gamma = s.y/y.y initial
    scaling (reference :1088-1123)."""
    dotp = inner_product or (lambda a, b: float(np.dot(a, b)))
    q = np.asarray(gradient, float).copy()
    if not state.s_vectors:
        return q
    alphas = []
    for s, y, rho in zip(reversed(state.s_vectors),
                         reversed(state.y_vectors),
                         reversed(state.rho_values)):
        alpha = rho * dotp(s, q)
        alphas.append(alpha)
        q -= alpha * y
    y_last, s_last = state.y_vectors[-1], state.s_vectors[-1]
    yy = dotp(y_last, y_last)
    sy = dotp(s_last, y_last)
    gamma = sy / yy if yy > 1e-30 and sy > 0.0 else 1.0
    r = gamma * q
    for s, y, rho, alpha in zip(state.s_vectors, state.y_vectors,
                                state.rho_values, reversed(alphas)):
        beta = rho * dotp(y, r)
        r += s * (alpha - beta)
    return r


def lbfgs_direction(state: LBFGSState, gradient, inner_product=None):
    """-(H g); falls back to steepest descent (and wipes history) if the
    quasi-Newton direction is not a descent direction (reference
    :1125-1141). Returns (direction, <g, d>, n_resets)."""
    dotp = inner_product or (lambda a, b: float(np.dot(a, b)))
    gradient = np.asarray(gradient, float)
    direction = -lbfgs_inverse_hessian_product(state, gradient,
                                               inner_product)
    descent = dotp(gradient, direction)
    if np.isfinite(descent) and descent < 0.0:
        return direction, float(descent), 0
    state.s_vectors.clear()
    state.y_vectors.clear()
    state.rho_values.clear()
    direction = -gradient
    return direction, float(dotp(gradient, direction)), 1


# -- augmented Lagrangian ------------------------------------------------------


@dataclass
class AugmentedLagrangianState:
    """ALM state for one scalar equality constraint c(x)+slack = 0
    (reference :274-283)."""
    lagrange_multiplier: float = 0.0
    penalty: float = 1.0
    penalty_multiplier: float = 1.1
    penalty_limit: float = 1e6
    slack: float = 0.0


def update_augmented_lagrangian(alm: AugmentedLagrangianState,
                                constraint: float) -> None:
    """First-order multiplier update + capped penalty growth
    (reference :1409-1415)."""
    alm.lagrange_multiplier += alm.penalty * (constraint + alm.slack)
    alm.penalty = min(alm.penalty_limit,
                      alm.penalty_multiplier * alm.penalty)


def alm_velocity_multiplier(alm: AugmentedLagrangianState,
                            constraint: float) -> float:
    """The multiplier entering the descent velocity: lambda + rho*c
    (reference :1417-1422)."""
    return alm.lagrange_multiplier + alm.penalty * (constraint + alm.slack)


def lagrangian_value(objective: float, constraint: float,
                     alm: AugmentedLagrangianState) -> float:
    """J + lambda c + rho/2 c^2 — the merit the line search monitors
    (reference :1424-1434)."""
    c = constraint + alm.slack
    return float(objective + alm.lagrange_multiplier * c
                 + 0.5 * alm.penalty * c * c)


def initialise_augmented_lagrangian_scale(alm: AugmentedLagrangianState,
                                          objective: float,
                                          constraint: float) -> None:
    """Scale lambda/rho from the initial objective and violation so the
    two terms start comparable (reference :1456-1473)."""
    if (not np.isfinite(objective) or not np.isfinite(constraint)
            or objective <= 0.0 or abs(constraint) <= 1e-14):
        return
    alm.lagrange_multiplier = objective / constraint
    alm.penalty = objective / (constraint * constraint)
    alm.penalty_limit = max(alm.penalty, 10.0 * alm.penalty)


# -- adaptive step + Armijo ----------------------------------------------------


@dataclass
class AdaptiveGradientStepState:
    """Previous accepted (design, gradient) pair for BB step estimation
    (reference :251-258)."""
    previous_phi: np.ndarray | None = None
    previous_gradient: np.ndarray | None = None
    accepted_dt: float = 0.0


def motion_dt_cap(hmin: float, velocity_max: float,
                  motion_cfl: float) -> float:
    """Largest dt that moves the interface at most motion_cfl cells
    (reference :906-911)."""
    if not np.isfinite(velocity_max) or velocity_max <= 0.0:
        return np.inf
    return float(motion_cfl * hmin / velocity_max)


def adaptive_gradient_dt(state: AdaptiveGradientStepState, phi_values,
                         gradient_values, previous_dt: float, hmin: float,
                         velocity_max: float, motion_cfl: float, *,
                         enabled: bool = True) -> dict:
    """Barzilai-Borwein dt = s.s/s.y, clipped to [0.25, 2] x previous and
    the motion cap (reference :914-966). Returns the reference's
    diagnostics row."""
    previous_dt = float(previous_dt)
    bb_dt, bb_accepted = previous_dt, 0
    if enabled and state.previous_phi is not None \
            and state.previous_gradient is not None:
        s = np.asarray(phi_values, float) - state.previous_phi
        y = np.asarray(gradient_values, float) - state.previous_gradient
        sy = float(np.dot(s, y))
        ss = float(np.dot(s, s))
        if np.isfinite(sy) and sy > 1e-30 and np.isfinite(ss) and ss > 0:
            bb_dt = ss / sy
            bb_accepted = int(np.isfinite(bb_dt) and bb_dt > 0.0)
        if not bb_accepted:
            bb_dt = previous_dt
    if not np.isfinite(bb_dt) or bb_dt <= 0.0:
        bb_dt = previous_dt
    growth_limited = float(np.clip(bb_dt, 0.25 * previous_dt,
                                   2.0 * previous_dt))
    cap = motion_dt_cap(hmin, velocity_max, motion_cfl)
    proposed = min(growth_limited, cap)
    if not np.isfinite(proposed) or proposed <= 0.0:
        proposed = previous_dt
    return {
        "step_dt_previous": previous_dt,
        "step_dt_bb": float(bb_dt),
        "step_dt_motion_cap": float(cap),
        "step_dt_proposed": float(proposed),
        "step_bb_accepted": bb_accepted,
    }


def accept_adaptive_gradient_step(state: AdaptiveGradientStepState,
                                  phi_values, gradient_values,
                                  accepted_dt: float) -> None:
    state.previous_phi = np.asarray(phi_values, float).copy()
    state.previous_gradient = np.asarray(gradient_values, float).copy()
    state.accepted_dt = float(accepted_dt)


def armijo_rhs(current_objective: float, predicted_rate: float, dt: float,
               sufficient_decrease: float) -> float:
    """Acceptance threshold J + c1 * dt * dJ; a tiny relative slack when
    the model predicts no decrease (reference :980-988)."""
    if np.isfinite(predicted_rate) and predicted_rate < 0.0:
        return float(current_objective
                     + sufficient_decrease * dt * predicted_rate)
    return float(current_objective * (1.0 + 1e-10))


# -- topology diagnostics -------------------------------------------------------


@dataclass
class SolidComponent:
    """One connected component of the active (solid) cells (reference
    ActiveSolidComponent :298-305)."""
    cells: np.ndarray
    anchored: bool
    loaded: bool


def solid_components(mesh, active_cells, anchored_cells=None,
                     loaded_cells=None):
    """Connected components of ``active_cells`` under facet adjacency.

    Vectorized min-label propagation (the role of the reference's BFS in
    _active_solid_components, demo :2313-2380). ``anchored_cells`` /
    ``loaded_cells`` mark components that touch supports / loads."""
    active = np.zeros(mesh.num_cells, bool)
    active[np.asarray(active_cells, np.int64)] = True
    fc = np.asarray(mesh.facet_cells)  # (nfacets, 2), -1 on boundary
    interior = (fc[:, 0] >= 0) & (fc[:, 1] >= 0)
    a, b = fc[interior, 0], fc[interior, 1]
    keep = active[a] & active[b]
    a, b = a[keep], b[keep]
    labels = np.where(active, np.arange(mesh.num_cells), -1)
    while True:
        m = np.minimum(labels[a], labels[b])
        new = labels.copy()
        np.minimum.at(new, a, m)
        np.minimum.at(new, b, m)
        if np.array_equal(new, labels):
            break
        labels = new
    anchored = np.zeros(mesh.num_cells, bool)
    loaded = np.zeros(mesh.num_cells, bool)
    if anchored_cells is not None:
        anchored[np.asarray(anchored_cells, np.int64)] = True
    if loaded_cells is not None:
        loaded[np.asarray(loaded_cells, np.int64)] = True
    comps = []
    for lab in np.unique(labels[active]):
        cells = np.flatnonzero(labels == lab)
        comps.append(SolidComponent(
            cells=cells,
            anchored=bool(anchored[cells].any()),
            loaded=bool(loaded[cells].any())))
    return comps


def remove_floating_components(phi: Function, mesh, components,
                               clear_value: float):
    """Void the vertices of components that touch neither supports nor
    loads: phi := max(phi, clear_value) there, protecting vertices shared
    with kept components (reference :2444-2496). Returns the modified
    P1 dofs."""
    floating = [c for c in components if not c.anchored and not c.loaded]
    if not floating:
        return np.empty(0, np.int64)
    cells = np.asarray(mesh.cells)
    protected = set()
    for c in components:
        if c.anchored or c.loaded:
            protected.update(cells[c.cells].ravel().tolist())
    remove = set()
    for c in floating:
        verts = set(cells[c.cells].ravel().tolist())
        local = verts - protected
        remove.update(local if local else verts)
    if not remove:
        return np.empty(0, np.int64)
    dofs = np.asarray(fem.locate_dofs_topological(
        phi.function_space, 0, np.array(sorted(remove), np.int64)))
    vals = np.asarray(phi.x).copy()
    vals[dofs] = np.maximum(vals[dofs], clear_value)
    phi.x = jnp.asarray(vals, phi.x.dtype)
    return dofs


def reinit_volume_shift(current_volume: float, target_volume: float,
                        interface_measure: float,
                        limit: float = 0.0) -> float:
    """Constant level-set shift restoring volume after redistancing:
    dV/dc ~= -|Gamma| for phi<0 solid (reference :1198-1227)."""
    if interface_measure <= 1e-14:
        return 0.0
    shift = (current_volume - target_volume) / interface_measure
    if limit > 0.0:
        shift = float(np.clip(shift, -limit, limit))
    return float(shift)


# -- point location / evaluation ----------------------------------------------


def locate_cells(mesh, points, pad: float = 1e-10):
    """Cells containing each physical point, nearest-midpoint fallback.

    Broad phase: uniform bins over cell AABBs (the role of the reference's
    BoundingBoxTree in _locate_cells_for_points, demo :2035-2058); narrow
    phase: geometry pullback + reference containment. points: (N, gdim).
    """
    from .cells import reference_cell
    from .geometry import pullback

    pts = np.asarray(points, float)
    verts = np.asarray(mesh.vertices)
    cvx = np.asarray(mesh.cell_vertex_coords)  # (nc, nv, gdim)
    lo = cvx.min(axis=1)
    hi = cvx.max(axis=1)
    gdim = verts.shape[1]
    dlo, dhi = verts.min(axis=0), verts.max(axis=0)
    ncells = cvx.shape[0]
    nbins = max(1, int(np.floor(ncells ** (1.0 / gdim))))
    width = np.maximum((dhi - dlo) / nbins, 1e-30)

    def bin_of(x):
        return np.clip(((x - dlo) / width).astype(np.int64), 0, nbins - 1)

    # cell -> bins map (cells may span several bins)
    cell_bins: dict = {}
    blo = bin_of(lo - pad)
    bhi = bin_of(hi + pad)
    for c in range(ncells):
        rngs = [range(blo[c][d], bhi[c][d] + 1) for d in range(gdim)]
        idx = np.stack(np.meshgrid(*rngs, indexing="ij"),
                       axis=-1).reshape(-1, gdim)
        for b in map(tuple, idx):
            cell_bins.setdefault(b, []).append(c)

    cell = reference_cell(mesh.cell_type)
    out = np.full(pts.shape[0], -1, dtype=np.int64)
    for i, x in enumerate(pts):
        cands = cell_bins.get(tuple(bin_of(x)), [])
        cands = [c for c in cands
                 if np.all(lo[c] - pad <= x) and np.all(x <= hi[c] + pad)]
        for c in cands:
            xi = np.asarray(pullback(mesh.cell_type, jnp.asarray(cvx[c]),
                                     jnp.asarray(x[None, :])))[0]
            if cell.is_simplex:
                ok = np.all(xi >= -1e-8) and xi.sum() <= 1.0 + 1e-8
            else:
                ok = np.all(xi >= -1e-8) and np.all(xi <= 1.0 + 1e-8)
            if ok:
                out[i] = c
                break
    missing = np.flatnonzero(out < 0)
    if missing.size:
        mids = cvx.mean(axis=1)
        for i in missing:
            out[i] = int(np.argmin(
                np.sum((mids - pts[i]) ** 2, axis=1)))
    return out


def evaluate_at_points(f: Function, points, cells=None):
    """Evaluate a Function at physical points (N, gdim) -> (N,) or
    (N, bs) (the reference Function.eval role, demo :2061-2068)."""
    V = f.function_space
    mesh = V.mesh
    pts = np.asarray(points, float)
    if cells is None:
        cells = locate_cells(mesh, pts)
    cells = np.asarray(cells, np.int64)
    cvx = np.asarray(mesh.cell_vertex_coords)[cells]  # (N, nv, gdim)
    from .geometry import pullback
    import jax

    def one(cv, x):
        return pullback(mesh.cell_type, cv, x[None, :])[0]

    xi = jax.vmap(one)(jnp.asarray(cvx), jnp.asarray(pts))  # (N, tdim)
    tab = V.element.tabulate(xi)  # pointwise: (N, ndof_cell)
    cdofs = np.asarray(V.dofmap)[cells]  # (N, ndof_cell) scalar dofs
    vals = np.asarray(f.x)
    if V.bs == 1:
        out = np.einsum("nd,nd->n", np.asarray(tab), vals[cdofs])
        return out
    out = np.empty((pts.shape[0], V.bs))
    for b in range(V.bs):
        out[:, b] = np.einsum("nd,nd->n", np.asarray(tab),
                              vals[cdofs * V.bs + b])
    return out


# -- Riesz velocity smoothing ---------------------------------------------------


class RieszVelocitySolver:
    """H1 Riesz representative of interface shape gradients.

    Solves (alpha^2 grad v . grad w + v w) dx = <dJ, w> on the background
    mesh — the reference's RieszVelocitySolver (:217-228, 1230-1265) with
    its factorized scipy solve. Optional homogeneous Dirichlet facets pin
    the velocity at fixed boundaries."""

    def __init__(self, mesh, smoothing_length: float, zero_facets=None,
                 degree: int = 1):
        self.mesh = mesh
        self.space = functionspace(mesh, ("Lagrange", degree))
        u = TrialFunction(self.space)
        w = TestFunction(self.space)
        dx = Measure("dx", domain=mesh)
        a = (smoothing_length ** 2 * inner(grad(u), grad(w))
             + u * w) * dx
        self.bcs = []
        if zero_facets is not None and np.asarray(zero_facets).size:
            dofs = fem.locate_dofs_topological(
                self.space, mesh.tdim - 1, np.asarray(zero_facets))
            self.bcs = [fem.dirichletbc(0.0, dofs, self.space)]
        self.bilinear_form = fem.form(a)
        A = fem.assemble_matrix(self.bilinear_form, bcs=self.bcs)
        from scipy.sparse.linalg import factorized
        self._solve = factorized(A.to_scipy().tocsc())

    def solve(self, rhs_form, name="velocity"):
        """Assemble the rhs CutForm and return (Function, rhs array)."""
        b = np.array(fem.assemble_vector(rhs_form))
        if self.bcs:
            b = fem.apply_lifting(b, [self.bilinear_form], [self.bcs])
            b = fem.set_bc(b, self.bcs)
        v = Function(self.space, name=name)
        v.x = jnp.asarray(self._solve(b), v.x.dtype)
        return v, b

    def interface_forms(self, density_expr, dx_interface):
        """(shape_rhs, volume_rhs) pair over a runtime interface measure
        (reference :1291-1299)."""
        w = TestFunction(self.space)
        shape_rhs = fem.form((density_expr * w) * dx_interface)
        volume_rhs = fem.form((-1.0 * w) * dx_interface)
        return shape_rhs, volume_rhs

    def h1_inner(self, a, b):
        """The (alpha^2 K + M)-inner product of two dof vectors — the
        metric L-BFGS should use when its design variable is the
        smoothed velocity (reference _h1_inner_from_values :793-801)."""
        A = fem.assemble_matrix(self.bilinear_form)
        return float(np.dot(np.asarray(a), A.to_scipy() @ np.asarray(b)))


# -- level-set advection ---------------------------------------------------------


class LevelSetAdvectionSolver:
    """Transport of the level set by an extended normal-speed field.

    Methods (reference :1973-2112):
      'supg'            — implicit Euler + SUPG-stabilized transport
                          solve on the background mesh,
      'nodal'           — explicit Hamilton-Jacobi update with a nodal
                          gradient-norm estimate (cheap diagnostic),
      'characteristics' — serial semi-Lagrangian RK2 along the velocity
                          field.

    ``fixed_facets`` dofs keep their old phi values (inflow clamps)."""

    def __init__(self, V, fixed_facets=None, tau_scale: float = 1.0):
        self.space = V
        self.mesh = V.mesh
        self.tau_scale = float(tau_scale)
        self.fixed_dofs = np.empty(0, np.int64)
        if fixed_facets is not None and np.asarray(fixed_facets).size:
            self.fixed_dofs = np.asarray(fem.locate_dofs_topological(
                V, self.mesh.tdim - 1, np.asarray(fixed_facets)))
        self._nodal_cache = None
        # dt enters the SUPG form as a DG0 coefficient, not a baked
        # Python number, so changing dt reuses the compiled kernels —
        # the role of the reference's fem.Constant dt (:1313).
        self._dt_fn = Function(functionspace(self.mesh, ("DG", 0)),
                               name="dt")

    # --- supg ---------------------------------------------------------------

    def advect_supg(self, phi: Function, speed: Function, dt: float):
        """(phi+ + dt w.grad(phi+)) (v + tau w.grad v) = phi (v + tau
        w.grad v) with w = speed * grad(phi)/|grad(phi)| — the reference's
        bilinear/rhs pair (:1302-1344) assembled fresh each call (the
        structural kernel cache absorbs the rebuild)."""
        V = self.space
        u, v = TrialFunction(V), TestFunction(V)
        dx = Measure("dx", domain=self.mesh)
        self._dt_fn.x = jnp.full_like(self._dt_fn.x, dt)
        dtc = CoefficientExpr(self._dt_fn)
        phie = CoefficientExpr(phi)
        se = CoefficientExpr(speed)
        gnorm = sqrt(inner(grad(phie), grad(phie)) + 1e-14)
        w = [se * grad(phie)[d] / gnorm for d in range(self.mesh.tdim)]
        wnorm = sqrt(sum(wi * wi for wi in w) + 1e-14)
        from .forms.dsl import CellDiameter
        h = CellDiameter(self.mesh)
        tau = self.tau_scale / sqrt((2.0 / dtc) * (2.0 / dtc)
                                    + (2.0 * wnorm / h) ** 2 + 1e-30)

        def transport(q):
            return sum(w[d] * grad(q)[d] for d in range(self.mesh.tdim))

        stream_v = transport(v)
        a = (u * v + dtc * transport(u) * v
             + tau * (u + dtc * transport(u)) * stream_v) * dx
        L = (phie * v + tau * phie * stream_v) * dx
        old = np.asarray(phi.x, float)
        bcs = []
        if self.fixed_dofs.size:
            bcs = [fem.dirichletbc(old[self.fixed_dofs], self.fixed_dofs,
                                   V)]
        af, Lf = fem.form(a), fem.form(L)
        A = fem.assemble_matrix(af, bcs=bcs)
        b = np.array(fem.assemble_vector(Lf))
        if bcs:
            b = fem.apply_lifting(b, [af], [bcs])
            b = fem.set_bc(b, bcs)
        from .la import direct_solve
        phi.x = jnp.asarray(direct_solve(A, b), phi.x.dtype)
        return phi

    # --- nodal ----------------------------------------------------------------

    def _nodal_gradient(self):
        """Per-dof least-squares gradient stencil over edge neighbors
        (the reference's NodalGradientStencil, :1353-1385): for each dof,
        weights W with grad ~= W @ (phi[nbrs] - phi[dof])."""
        if self._nodal_cache is not None:
            return self._nodal_cache
        V = self.space
        coords = np.asarray(V.dof_coordinates)
        nd = coords.shape[0]
        # neighbor graph from cell dof connectivity
        cd = np.asarray(V.dofmap)
        nbrs = [set() for _ in range(nd)]
        for row in cd:
            for a in row:
                nbrs[a].update(row)
        neighbors, weights = [], []
        for dof in range(nd):
            nb = np.array(sorted(nbrs[dof] - {dof}), np.int64)
            if nb.size == 0:
                neighbors.append(nb)
                weights.append(np.zeros((coords.shape[1], 0)))
                continue
            D = coords[nb] - coords[dof]  # (k, gdim)
            W = np.linalg.pinv(D)  # (gdim, k): grad = W @ df
            neighbors.append(nb)
            weights.append(W)
        self._nodal_cache = (neighbors, weights)
        return self._nodal_cache

    def advect_nodal(self, phi: Function, speed: Function, dt: float):
        neighbors, weights = self._nodal_gradient()
        old = np.asarray(phi.x, float).copy()
        sp = np.asarray(speed.x, float)
        gn = np.zeros_like(old)
        for dof, (nb, W) in enumerate(zip(neighbors, weights)):
            if nb.size == 0:
                continue
            gn[dof] = np.linalg.norm(W @ (old[nb] - old[dof]))
        new = old - dt * sp * gn
        if self.fixed_dofs.size:
            new[self.fixed_dofs] = old[self.fixed_dofs]
        phi.x = jnp.asarray(new, phi.x.dtype)
        return phi

    # --- characteristics -------------------------------------------------------

    def advect_characteristics(self, phi: Function, velocity: Function,
                               dt: float):
        """Semi-Lagrangian RK2: midpoint velocity, then pull phi back
        from the departure points (reference :2071-2095). ``velocity``
        is the vector extension field (bs = gdim)."""
        V = self.space
        old = np.asarray(phi.x, float).copy()
        pts = np.asarray(V.dof_coordinates)
        v0 = evaluate_at_points(velocity, pts)
        half = pts - 0.5 * dt * np.atleast_2d(v0)
        vmid = evaluate_at_points(velocity, half)
        dep = pts - dt * np.atleast_2d(vmid)
        # clamp departure points into the mesh bbox (nearest-cell
        # fallback handles the rest)
        lo = np.asarray(V.mesh.vertices).min(axis=0)
        hi = np.asarray(V.mesh.vertices).max(axis=0)
        dep = np.clip(dep, lo, hi)
        new = np.asarray(evaluate_at_points(phi, dep)).reshape(-1)
        if self.fixed_dofs.size:
            new[self.fixed_dofs] = old[self.fixed_dofs]
        phi.x = jnp.asarray(new, phi.x.dtype)
        return phi

    def advect(self, phi, extension, dt, method="supg"):
        """Dispatch (reference :2098-2112). ``extension`` is a
        NormalExtensionResult (or any object with .speed / .velocity)."""
        if method == "supg":
            return self.advect_supg(phi, extension.speed, dt)
        if method == "nodal":
            return self.advect_nodal(phi, extension.speed, dt)
        if method == "characteristics":
            return self.advect_characteristics(phi, extension.velocity,
                                               dt)
        raise ValueError(f"unknown advection method {method!r}")


# -- checkpoint / resume ---------------------------------------------------
# The reference's optimization demo persists per-iteration CSV/plot rows
# only and cannot resume an interrupted run (reference
# demo_compliance_optimization.py:307-379; SURVEY §5). Here the complete
# optimizer state — design (level-set dofs), L-BFGS pair history, ALM
# multipliers, BB step memory — is plain NumPy data, so a restartable
# checkpoint is one atomic .npz file.


def save_checkpoint(path, *, iteration: int, phi=None,
                    lbfgs: LBFGSState | None = None,
                    alm: AugmentedLagrangianState | None = None,
                    step: AdaptiveGradientStepState | None = None,
                    dt: float | None = None,
                    scalars: dict | None = None) -> None:
    """Write an atomic optimizer checkpoint.

    ``phi`` may be a Function (its dof values are stored) or an array.
    ``scalars`` is an optional flat dict of float/int/str metadata
    (e.g. best objective so far). The file is written to a sibling tmp
    path then renamed, so a crash mid-write never corrupts the previous
    checkpoint."""
    import json as _json
    import os as _os

    payload: dict = {"iteration": np.int64(iteration),
                     "version": np.int64(1)}
    if phi is not None:
        vals = getattr(phi, "x", phi)
        payload["phi"] = np.asarray(vals)
    if dt is not None:
        payload["dt"] = np.float64(dt)
    if lbfgs is not None:
        k = len(lbfgs.s_vectors)
        if k:
            payload["lbfgs_s"] = np.stack(
                [np.asarray(s, float) for s in lbfgs.s_vectors])
            payload["lbfgs_y"] = np.stack(
                [np.asarray(y, float) for y in lbfgs.y_vectors])
            payload["lbfgs_rho"] = np.asarray(lbfgs.rho_values, float)
        if lbfgs.previous_x is not None:
            payload["lbfgs_prev_x"] = np.asarray(lbfgs.previous_x, float)
        if lbfgs.previous_gradient is not None:
            payload["lbfgs_prev_g"] = np.asarray(lbfgs.previous_gradient,
                                                 float)
        payload["lbfgs_meta"] = np.asarray(
            [float(lbfgs.last_curvature),
             1.0 if lbfgs.last_update_accepted else 0.0])
    if alm is not None:
        payload["alm"] = np.asarray(
            [alm.lagrange_multiplier, alm.penalty, alm.penalty_multiplier,
             alm.penalty_limit, alm.slack], float)
    if step is not None:
        if step.previous_phi is not None:
            payload["step_prev_phi"] = np.asarray(step.previous_phi, float)
        if step.previous_gradient is not None:
            payload["step_prev_g"] = np.asarray(step.previous_gradient,
                                                float)
        payload["step_dt"] = np.float64(step.accepted_dt)
    if scalars:
        payload["scalars_json"] = np.frombuffer(
            _json.dumps(scalars).encode(), dtype=np.uint8).copy()

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
        f.flush()
        _os.fsync(f.fileno())
    _os.replace(tmp, path)


def load_checkpoint(path, *, phi=None) -> dict:
    """Read a checkpoint written by :func:`save_checkpoint`.

    Returns a dict with keys ``iteration``, and (when present in the
    file) ``phi`` (ndarray), ``dt``, ``lbfgs`` (LBFGSState), ``alm``
    (AugmentedLagrangianState), ``step`` (AdaptiveGradientStepState),
    ``scalars`` (dict). If ``phi`` (a Function) is passed, its dof
    values are restored in place."""
    import json as _json

    with np.load(path, allow_pickle=False) as z:
        out: dict = {"iteration": int(z["iteration"])}
        if "phi" in z:
            out["phi"] = np.asarray(z["phi"])
            if phi is not None:
                target = np.asarray(phi.x)
                if target.shape != out["phi"].shape:
                    raise ValueError(
                        f"checkpoint phi has shape {out['phi'].shape}, "
                        f"target Function has {target.shape}")
                phi.x = jnp.asarray(out["phi"], dtype=target.dtype)
        if "dt" in z:
            out["dt"] = float(z["dt"])
        if "lbfgs_meta" in z:
            st = LBFGSState()
            if "lbfgs_s" in z:
                st.s_vectors = [np.asarray(s) for s in z["lbfgs_s"]]
                st.y_vectors = [np.asarray(y) for y in z["lbfgs_y"]]
                st.rho_values = [float(r) for r in z["lbfgs_rho"]]
            if "lbfgs_prev_x" in z:
                st.previous_x = np.asarray(z["lbfgs_prev_x"])
            if "lbfgs_prev_g" in z:
                st.previous_gradient = np.asarray(z["lbfgs_prev_g"])
            st.last_curvature = float(z["lbfgs_meta"][0])
            st.last_update_accepted = bool(z["lbfgs_meta"][1] > 0.5)
            out["lbfgs"] = st
        if "alm" in z:
            a = z["alm"]
            out["alm"] = AugmentedLagrangianState(
                lagrange_multiplier=float(a[0]), penalty=float(a[1]),
                penalty_multiplier=float(a[2]), penalty_limit=float(a[3]),
                slack=float(a[4]))
        if "step_dt" in z:
            sp = AdaptiveGradientStepState(accepted_dt=float(z["step_dt"]))
            if "step_prev_phi" in z:
                sp.previous_phi = np.asarray(z["step_prev_phi"])
            if "step_prev_g" in z:
                sp.previous_gradient = np.asarray(z["step_prev_g"])
            out["step"] = sp
        if "scalars_json" in z:
            out["scalars"] = _json.loads(bytes(z["scalars_json"]).decode())
    return out
