"""Optimization toolkit tests (the reference validates this machinery
only through its compliance demo; these pin the pieces directly)."""

import csv

import numpy as np
import pytest

import jax.numpy as jnp

import cutfemx_tpu as cfx
from cutfemx_tpu import fem, optimization as opt
from cutfemx_tpu.forms.dsl import TestFunction as DslTest
from cutfemx_tpu.forms.measure import Measure


# -- L-BFGS -------------------------------------------------------------------


def _quadratic(n=6, seed=0):
    rng = np.random.default_rng(seed)
    Q = rng.standard_normal((n, n))
    A = Q @ Q.T + n * np.eye(n)
    b = rng.standard_normal(n)
    return A, b


def test_lbfgs_beats_gradient_descent_on_quadratic():
    A, b = _quadratic()
    x_star = np.linalg.solve(A, b)

    def run(memory):
        state = opt.LBFGSState()
        x = np.zeros_like(b)
        dt = 0.01
        for _ in range(40):
            g = A @ x - b
            opt.lbfgs_update(state, x, g, memory=memory)
            d, descent, _ = opt.lbfgs_direction(state, g)
            assert descent < 0
            x = x + dt * d if memory == 0 else x + d
        return np.linalg.norm(x - x_star)

    err_lbfgs = run(memory=8)
    err_gd = run(memory=0)
    assert err_lbfgs < 1e-6
    assert err_lbfgs < 1e-3 * err_gd


def test_lbfgs_curvature_rejection():
    state = opt.LBFGSState()
    x0, g0 = np.zeros(3), np.ones(3)
    opt.lbfgs_update(state, x0, g0, memory=5)
    # negative-curvature pair: s.y < 0 must be rejected
    opt.lbfgs_update(state, x0 + 1.0, g0 - 1.0, memory=5)
    assert not state.pair_accepted
    assert len(state.s_hist) == 0
    # positive curvature accepted
    opt.lbfgs_update(state, x0 + 2.0, g0 + 5.0, memory=5)
    assert state.pair_accepted
    assert len(state.s_hist) == 1


def test_lbfgs_direction_resets_on_nondescent():
    state = opt.LBFGSState()
    # poison history so H g is an ascent direction
    state.s_hist = [np.array([1.0, 0.0])]
    state.y_hist = [np.array([-1.0, 0.0])]
    state.inv_sy = [-1.0]
    g = np.array([1.0, 0.0])
    d, descent, resets = opt.lbfgs_direction(state, g)
    assert resets == 1
    assert descent < 0
    np.testing.assert_allclose(d, -g)
    assert len(state.s_hist) == 0


def test_lbfgs_weighted_inner_product():
    A, b = _quadratic(4, 1)
    M = np.diag([1.0, 2.0, 3.0, 4.0])

    def minner(u, v):
        return float(u @ M @ v)

    state = opt.LBFGSState()
    x = np.zeros_like(b)
    for _ in range(30):
        g = A @ x - b
        opt.lbfgs_update(state, x, g, memory=6, inner_product=minner)
        d, _, _ = opt.lbfgs_direction(state, g, inner_product=minner)
        x = x + d
    assert np.linalg.norm(A @ x - b) < 1e-6


# -- augmented Lagrangian -------------------------------------------------------


def test_alm_drives_constraint_to_zero():
    # min x^2  s.t.  x - 1 = 0  -> x* = 1, lambda* = -2
    alm = opt.AugmentedLagrangianState(penalty=1.0, rho_growth=1.5,
                                       rho_max=100.0)
    x = 0.0
    for _ in range(50):
        # inner minimization of the augmented Lagrangian (exact)
        lam, rho = alm.multiplier, alm.penalty
        x = (rho - lam) / (2.0 + rho)
        opt.update_augmented_lagrangian(alm, x - 1.0)
    assert abs(x - 1.0) < 1e-6
    assert abs(alm.multiplier + 2.0) < 1e-5
    assert alm.penalty <= 100.0


def test_alm_helpers():
    alm = opt.AugmentedLagrangianState(multiplier=2.0, penalty=4.0)
    assert opt.alm_velocity_multiplier(alm, 0.5) == 2.0 + 4.0 * 0.5
    assert opt.lagrangian_value(1.0, 0.5, alm) == \
        1.0 + 2.0 * 0.5 + 0.5 * 4.0 * 0.25
    opt.initialise_augmented_lagrangian_scale(alm, 10.0, 0.1)
    assert alm.multiplier == pytest.approx(100.0)
    assert alm.penalty == pytest.approx(1000.0)


# -- adaptive step / Armijo ------------------------------------------------------


def test_bb_step_recovers_quadratic_curvature():
    # for g = a*phi, s = dphi, y = a*dphi -> bb = 1/a
    state = opt.AdaptiveGradientStepState()
    a = 4.0
    phi0 = np.array([1.0, 2.0])
    opt.accept_adaptive_gradient_step(state, phi0, a * phi0, 0.1)
    phi1 = np.array([1.5, 2.5])
    row = opt.adaptive_gradient_dt(state, phi1, a * phi1, 0.1, hmin=1.0,
                                   velocity_max=0.0, motion_cfl=0.5)
    assert row["bb_pair_used"] == 1
    assert row["dt_bb_raw"] == pytest.approx(1.0 / a)
    # growth clip: bb 0.25 is > 2 * previous 0.1
    assert row["dt_next"] == pytest.approx(0.2)


def test_motion_cap_and_armijo():
    assert opt.motion_dt_cap(0.1, 2.0, 0.5) == pytest.approx(0.025)
    assert np.isinf(opt.motion_dt_cap(0.1, 0.0, 0.5))
    # predicted decrease: threshold below current objective
    assert opt.armijo_rhs(1.0, -2.0, 0.1, 0.5) == pytest.approx(0.9)
    # no predicted decrease: tiny relative slack
    rhs = opt.armijo_rhs(1.0, 1.0, 0.1, 0.5)
    assert 1.0 < rhs < 1.0 + 1e-9


# -- writers ---------------------------------------------------------------------


def test_profile_writer_roundtrip(tmp_path):
    path = tmp_path / "profile.csv"
    with opt.ProfileWriter(path, ["iteration", "time_solve"]) as w:
        row = {"iteration": 0}
        with opt.phase(row, "solve"):
            pass
        w.write(row)
        w.write({"iteration": 1, "time_solve": 2.5, "ignored": 9})
    rows = list(csv.DictReader(path.open()))
    assert [r["iteration"] for r in rows] == ["0", "1"]
    assert float(rows[0]["time_solve"]) >= 0.0
    assert rows[1]["time_solve"] == "2.5"
    assert "ignored" not in rows[0]


# -- point evaluation -------------------------------------------------------------


def test_evaluate_at_points_exact_for_p2():
    mesh = cfx.mesh.create_rectangle((0, 0), (1, 1), (4, 4))
    V = cfx.functionspace(mesh, ("Lagrange", 2))
    f = cfx.Function(V)
    f.interpolate(lambda x: x[0] ** 2 + 2 * x[1] ** 2 - x[0] * x[1])
    rng = np.random.default_rng(3)
    pts = rng.uniform(0.02, 0.98, size=(40, 2))
    vals = opt.evaluate_at_points(f, pts)
    exact = pts[:, 0] ** 2 + 2 * pts[:, 1] ** 2 - pts[:, 0] * pts[:, 1]
    np.testing.assert_allclose(vals, exact, atol=1e-10)


def test_evaluate_at_points_vector_and_outside_fallback():
    mesh = cfx.mesh.create_rectangle((0, 0), (1, 1), (3, 3))
    V = cfx.functionspace(mesh, ("Lagrange", 1), shape=(2,))
    f = cfx.Function(V)
    f.interpolate(lambda x: np.stack([x[0], -x[1]]))
    pts = np.array([[0.31, 0.77], [1.5, 0.5]])  # second point outside
    vals = opt.evaluate_at_points(f, pts)
    np.testing.assert_allclose(vals[0], [0.31, -0.77], atol=1e-12)
    assert np.all(np.isfinite(vals[1]))


# -- Riesz velocity smoothing ------------------------------------------------------


def test_riesz_solver_matches_direct():
    mesh = cfx.mesh.create_rectangle((0, 0), (1, 1), (8, 8))
    solver = opt.RieszVelocitySolver(mesh, smoothing_length=0.2)
    v = DslTest(solver.space)
    dx = Measure("dx", domain=mesh)
    Lf = fem.form((1.0 * v) * dx)
    vel, b = solver.solve(Lf)
    A = fem.assemble_matrix(solver.bilinear_form).to_scipy()
    np.testing.assert_allclose(A @ np.asarray(vel.x), b, atol=1e-10)
    # rhs of ones against (alpha^2 K + M): solution is the constant 1
    np.testing.assert_allclose(np.asarray(vel.x), 1.0, atol=1e-8)


def test_riesz_solver_zero_facets():
    mesh = cfx.mesh.create_rectangle((0, 0), (1, 1), (6, 6))
    ext = mesh.exterior_facets
    solver = opt.RieszVelocitySolver(mesh, 0.1, zero_facets=ext)
    v = DslTest(solver.space)
    dx = Measure("dx", domain=mesh)
    vel, _ = solver.solve(fem.form((1.0 * v) * dx))
    bdofs = fem.locate_dofs_topological(solver.space, mesh.tdim - 1, ext)
    np.testing.assert_allclose(np.asarray(vel.x)[bdofs], 0.0, atol=1e-12)
    assert np.asarray(vel.x).max() > 0.1


def test_riesz_interface_smoothing_on_cut_circle():
    mesh = cfx.mesh.create_rectangle((-1, -1), (1, 1), (12, 12))
    Vphi = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(Vphi, name="phi")
    phi.interpolate(lambda x: np.sqrt(x[0] ** 2 + x[1] ** 2) - 0.6)
    cd = cfx.cut(phi)
    srf = cfx.runtime_quadrature(cd, "phi=0", 2)
    dxg = Measure("dx", domain=mesh, subdomain_data=srf)
    solver = opt.RieszVelocitySolver(mesh, smoothing_length=0.3)
    shape_rhs, volume_rhs = solver.interface_forms(1.0, dxg)
    vel, _ = solver.solve(shape_rhs)
    vvol, _ = solver.solve(volume_rhs)
    # volume rhs is the negative of the shape rhs for unit density
    np.testing.assert_allclose(np.asarray(vvol.x), -np.asarray(vel.x),
                               atol=1e-10)
    # smoothing spreads interface data into the bulk: center value nonzero
    c = opt.evaluate_at_points(vel, np.array([[0.0, 0.0]]))
    assert c[0] > 1e-4
    # H1 inner product is SPD
    assert solver.h1_inner(np.asarray(vel.x), np.asarray(vel.x)) > 0


# -- level-set advection -----------------------------------------------------------


def _plane_setup(n=24):
    mesh = cfx.mesh.create_rectangle((0, 0), (1, 1), (n, n))
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(V, name="phi")
    phi.interpolate(lambda x: x[0] - 0.4)
    speed = cfx.Function(V, name="speed")
    speed.x = jnp.ones_like(phi.x)
    return mesh, V, phi, speed


def _zero_x(phi, V):
    """Interface x-position: root of phi along y=0.52 row."""
    xs = np.linspace(0.05, 0.95, 181)
    pts = np.stack([xs, np.full_like(xs, 0.52)], axis=1)
    vals = np.asarray(opt.evaluate_at_points(phi, pts))
    i = np.argmin(np.abs(vals))
    return xs[i]


def test_supg_advection_moves_plane_at_speed():
    mesh, V, phi, speed = _plane_setup()
    solver = opt.LevelSetAdvectionSolver(V)
    dt = 0.1
    solver.advect_supg(phi, speed, dt)
    # phi_t + s|grad phi| = 0 with s=1 moves the zero set +0.1 in x
    assert abs(_zero_x(phi, V) - 0.5) < 1.5 / 24


def test_supg_second_dt_reuses_kernels():
    mesh, V, phi, speed = _plane_setup(n=8)
    from cutfemx_tpu.forms.compile import _KERNEL_CACHE
    solver = opt.LevelSetAdvectionSolver(V)
    solver.advect_supg(phi, speed, 0.01)
    n_kernels = len(_KERNEL_CACHE)
    solver.advect_supg(phi, speed, 0.037)  # different dt
    assert len(_KERNEL_CACHE) == n_kernels


def test_nodal_advection_moves_plane():
    mesh, V, phi, speed = _plane_setup()
    solver = opt.LevelSetAdvectionSolver(V)
    for _ in range(4):
        solver.advect_nodal(phi, speed, 0.025)
    assert abs(_zero_x(phi, V) - 0.5) < 1.5 / 24


def test_characteristics_advection_moves_plane():
    mesh, V, phi, _ = _plane_setup()
    Vv = cfx.functionspace(mesh, ("Lagrange", 1), shape=(2,))
    vel = cfx.Function(Vv)
    vel.interpolate(lambda x: np.stack([np.ones_like(x[0]),
                                        np.zeros_like(x[1])]))
    solver = opt.LevelSetAdvectionSolver(V)
    solver.advect_characteristics(phi, vel, 0.1)
    assert abs(_zero_x(phi, V) - 0.5) < 1.5 / 24


def test_fixed_facets_pin_phi():
    mesh, V, phi, speed = _plane_setup(n=10)
    left = mesh.exterior_facets[
        np.abs(mesh.midpoints(mesh.tdim - 1,
                              mesh.exterior_facets)[:, 0]) < 1e-12]
    solver = opt.LevelSetAdvectionSolver(V, fixed_facets=left)
    old = np.asarray(phi.x)[solver.fixed_dofs].copy()
    solver.advect_supg(phi, speed, 0.05)
    np.testing.assert_allclose(np.asarray(phi.x)[solver.fixed_dofs], old,
                               atol=1e-12)


def test_advect_dispatch():
    mesh, V, phi, speed = _plane_setup(n=8)
    Vv = cfx.functionspace(mesh, ("Lagrange", 1), shape=(2,))
    vel = cfx.Function(Vv)

    class Ext:
        pass

    ext = Ext()
    ext.speed, ext.velocity = speed, vel
    solver = opt.LevelSetAdvectionSolver(V)
    for m in ("supg", "nodal", "characteristics"):
        solver.advect(phi.copy(), ext, 0.01, method=m)
    with pytest.raises(ValueError):
        solver.advect(phi, ext, 0.01, method="bogus")


# -- checkpoint / resume ----------------------------------------------------------


def test_checkpoint_roundtrip(tmp_path):
    """save_checkpoint/load_checkpoint restore every optimizer field
    bit-exactly (atomic npz; beyond the reference, whose optimization
    demo cannot resume — SURVEY §5)."""
    rng = np.random.default_rng(3)
    mesh = cfx.mesh.create_rectangle((0.0, 0.0), (1.0, 1.0), (4, 4))
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    phi = cfx.Function(V, name="phi")
    phi.x = jnp.asarray(rng.normal(size=V.dim), phi.x.dtype)

    lb = opt.LBFGSState()
    for _ in range(3):
        opt.lbfgs_update(lb, rng.normal(size=7), rng.normal(size=7),
                         memory=5)
    alm = opt.AugmentedLagrangianState(
        multiplier=2.5, penalty=7.0, rho_growth=1.2,
        rho_max=100.0, slack=0.1)
    st = opt.AdaptiveGradientStepState(
        anchor_phi=rng.normal(size=9),
        anchor_grad=rng.normal(size=9), dt_accepted=0.037)

    path = tmp_path / "ck.npz"
    opt.save_checkpoint(path, iteration=11, phi=phi, lbfgs=lb, alm=alm,
                        step=st, dt=0.02,
                        scalars={"best": 1.5, "tag": "run-a"})

    phi2 = cfx.Function(V, name="phi")
    ck = opt.load_checkpoint(path, phi=phi2)
    assert ck["iteration"] == 11
    assert ck["dt"] == 0.02
    assert ck["scalars"] == {"best": 1.5, "tag": "run-a"}
    np.testing.assert_array_equal(np.asarray(phi2.x), np.asarray(phi.x))
    lb2 = ck["lbfgs"]
    assert len(lb2.s_hist) == len(lb.s_hist)
    for a, b in zip(lb.s_hist + lb.y_hist,
                    lb2.s_hist + lb2.y_hist):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(lb2.inv_sy, lb.inv_sy)
    np.testing.assert_array_equal(lb2.anchor_x, lb.anchor_x)
    assert lb2.pair_accepted == lb.pair_accepted
    a2 = ck["alm"]
    assert (a2.multiplier, a2.penalty, a2.rho_growth,
            a2.rho_max, a2.slack) == (2.5, 7.0, 1.2, 100.0, 0.1)
    st2 = ck["step"]
    np.testing.assert_array_equal(st2.anchor_phi, st.anchor_phi)
    np.testing.assert_array_equal(st2.anchor_grad,
                                  st.anchor_grad)
    assert st2.dt_accepted == st.dt_accepted


def test_checkpoint_partial_states(tmp_path):
    """Fields not passed to save are absent from the load result; an
    empty L-BFGS history round-trips; shape-mismatched phi raises."""
    path = tmp_path / "ck.npz"
    opt.save_checkpoint(path, iteration=0, lbfgs=opt.LBFGSState())
    ck = opt.load_checkpoint(path)
    assert ck["iteration"] == 0
    assert "alm" not in ck and "step" not in ck and "phi" not in ck
    assert len(ck["lbfgs"].s_hist) == 0
    assert ck["lbfgs"].anchor_x is None

    opt.save_checkpoint(path, iteration=1, phi=np.zeros(5))
    mesh = cfx.mesh.create_rectangle((0.0, 0.0), (1.0, 1.0), (3, 3))
    V = cfx.functionspace(mesh, ("Lagrange", 1))
    wrong = cfx.Function(V)
    with pytest.raises(ValueError, match="shape"):
        opt.load_checkpoint(path, phi=wrong)


def test_compliance_demo_resume_matches_straight_run(tmp_path):
    """Interrupt-and-resume reproduces the uninterrupted optimization
    trajectory exactly: 3 straight iterations vs 2 + checkpoint + 1
    resumed give the same final compliance/volume."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "demo_compliance_optimization",
        "demos/demo_compliance_optimization.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    base = ["--n", "8", "--optimizer", "lbfgs", "--quiet",
            "--reinit-every", "2", "--remove-floating-every", "0"]
    straight = mod.run_optimization(mod.parse_args(base + ["--iters", "3"]))

    ck = str(tmp_path / "ck.npz")
    mod.run_optimization(mod.parse_args(
        base + ["--iters", "2", "--checkpoint", ck]))
    resumed = mod.run_optimization(mod.parse_args(
        base + ["--iters", "3", "--checkpoint", ck, "--resume"]))

    assert resumed["history"][-1]["iteration"] == 2
    np.testing.assert_allclose(resumed["final_compliance"],
                               straight["final_compliance"], rtol=1e-9)
    np.testing.assert_allclose(resumed["final_volume"],
                               straight["final_volume"], rtol=1e-9)
