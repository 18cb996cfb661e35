"""Fluid solver tests: Poiseuille physics + truncated cavity + goldens."""

import numpy as np
import pytest

from openifem_tpu.mesh import generators
from openifem_tpu.parameters import AllParameters
from openifem_tpu.solvers.fluid import InsIM

REF = "/root/reference/tests"


def _vmax(solver):
    v = solver.velocity_part().reshape(-1, solver.dim)
    return float(np.abs(v).max())


def test_cavity_few_steps():
    """Truncated fluid_cavity: lid-driven flow sanity after 5 steps."""
    p = AllParameters.from_file(f"{REF}/fluid_cavity/fluid_cavity.prm")
    p.end_time = 0.05  # 5 steps
    p.global_refinements[0] = 3  # 8x8
    mesh = generators.hyper_cube(0.0, 1.0, dim=2)
    f = InsIM(mesh, p)
    f.run(verbose=False)
    u = f.velocity_part().reshape(-1, 2)
    # lid velocity imposed (corner nodes get the side-wall value first, as
    # in deal.II's first-constraint-wins semantics)
    lid = f.u_space.boundary_nodes([3])
    pts = f.u_space.node_points[lid]
    interior_lid = lid[(pts[:, 0] > 1e-12) & (pts[:, 0] < 1 - 1e-12)]
    assert np.allclose(u[interior_lid, 0], 1.0)
    assert np.allclose(u[interior_lid, 1], 0.0)
    # interior flow developed, bounded by lid speed
    assert 0.01 < np.abs(u[:, 0][~np.isin(np.arange(len(u)), lid)]).max() <= 1.0
    # incompressibility: mean divergence residual small
    gradv = np.asarray(f.velocity_gradients(f.present_solution))
    div = gradv[..., 0, 0] + gradv[..., 1, 1]
    JxW = f.cv_u.JxW
    assert abs((div * JxW).sum()) < 1e-8


def test_fluid_pipe_poiseuille():
    """fluid_pipe: inlet velocity 1 -> parabolic profile vmax = 1.5
    (reference: tests/fluid_pipe/fluid_pipe.cpp:43-48), truncated in time and
    coarsened to keep CI fast; the profile is established quickly."""
    p = AllParameters.from_file(f"{REF}/fluid_pipe/fluid_pipe.prm")
    L, D, h = 2.0, 0.2, 0.04
    mesh = generators.subdivided_hyper_rectangle(
        [int(L / h), int(D / h)], [0.0, 0.0], [L, D])
    f = InsIM(mesh, p)
    f.run(verbose=False)
    v = f.velocity_part()
    vmax = float(v.max())
    assert abs(vmax - 1.5) / 1.5 < 1e-2


def test_fluid_gravity_hydrostatic():
    """fluid_gravity: one step, gravity along x -> pressure drop rho*g*L = 20
    (reference: tests/fluid_gravity/fluid_gravity.cpp:35-42, rtol 1e-3)."""
    p = AllParameters.from_file(f"{REF}/fluid_gravity/fluid_gravity.prm")
    mesh = generators.subdivided_hyper_rectangle(
        [100, 10], [0.0, 0.0], [2.0, 0.2])
    f = InsIM(mesh, p)
    f.run(verbose=False)
    pr = f.pressure_part()
    pdiff = float(pr.max() - pr.min())
    assert abs(pdiff - 20.0) / 20.0 < 1e-3


def test_fluid_pressure_driven():
    """fluid_pressure_driven: Neumann inlet pressure 10 -> Poiseuille
    vmax = dP D^2/(8 nu L) = 2.5e-2 (reference:
    tests/fluid_pressure_driven/fluid_pressure_driven.cpp:41-45, rtol 1e-3).
    Run without the extra global refinement: the parabolic solution is in the
    Q2 space on any mesh."""
    p = AllParameters.from_file(
        f"{REF}/fluid_pressure_driven/fluid_pressure_driven.prm")
    p.global_refinements[0] = 0
    mesh = generators.subdivided_hyper_rectangle(
        [100, 10], [0.0, 0.0], [2.0, 0.2])
    f = InsIM(mesh, p)
    f.run(verbose=False)
    vmax = float(f.velocity_part().max())
    assert abs(vmax - 2.5e-2) / 2.5e-2 < 1e-3


def test_insimex_matches_insim_cylinder():
    """IMEX and fully-implicit solvers agree to O(dt) on a truncated Re=20
    cylinder run (the configuration the reference validates IMEX on; lid
    cavity at Re=100 is outside the explicit-convection stability region)."""
    from openifem_tpu.solvers.fluid import InsIMEX
    p = AllParameters.from_file(f"{REF}/fluid_cylinder/fluid_cylinder.prm")
    p.end_time = 0.15
    mesh = generators.flow_around_cylinder(2)
    f1 = InsIM(mesh, p, bc=_cylinder_bv)
    f1.run(verbose=False)
    f2 = InsIMEX(mesh, p, bc=_cylinder_bv)
    f2.run(verbose=False)
    u1 = f1.velocity_part()
    u2 = f2.velocity_part()
    rel_l2 = float(np.linalg.norm(u1 - u2) / np.linalg.norm(u1))
    assert rel_l2 < 0.02


def _cylinder_bv(points, component):
    out = np.zeros(len(points))
    if component == 0:
        m = np.abs(points[:, 0]) < 1e-10
        Umax = 0.3
        out[m] = 4 * Umax * points[m, 1] * (0.41 - points[m, 1]) / 0.41 ** 2
    return out


@pytest.mark.slow
def test_fluid_cylinder_golden():
    """Turek flow-around-cylinder, Re=20: vmax/pmax goldens
    (reference: tests/fluid_cylinder/fluid_cylinder.cpp:83-86, rtol 1e-3;
    we match to ~1e-7)."""
    p = AllParameters.from_file(f"{REF}/fluid_cylinder/fluid_cylinder.prm")
    mesh = generators.flow_around_cylinder(2)
    f = InsIM(mesh, p, bc=_cylinder_bv)
    f.run_on_device(verbose=False)
    vmax = float(f.velocity_part().max())
    pmax = float(f.pressure_part().max())
    assert abs(vmax - 0.4064759) / 0.4064759 < 1e-3
    assert abs(pmax - 0.1539404) / 0.1539404 < 1e-3


@pytest.mark.slow
def test_fluid_cylinder_insimex_golden():
    """IMEX variant (reference: tests/fluid_cylinder_insimex/...cpp:83-84)."""
    from openifem_tpu.solvers.fluid import InsIMEX
    p = AllParameters.from_file(
        f"{REF}/fluid_cylinder_insimex/fluid_cylinder_insimex.prm")
    mesh = generators.flow_around_cylinder(2)
    f = InsIMEX(mesh, p, bc=_cylinder_bv)
    f.run(verbose=False)
    vmax = float(f.velocity_part().max())
    pmax = float(f.pressure_part().max())
    assert abs(vmax - 0.4081072) / 0.4081072 < 1e-3
    assert abs(pmax - 0.1539) / 0.1539 < 1e-3


def _cylinder_bv_t(points, component, time):
    return _cylinder_bv(points, component)


def test_fluid_cylinder_mpi_one_step():
    """One impulsive step on the refine-3 cylinder mesh (reference:
    tests/fluid_cylinder_mpi/...cpp:91-94: vmax=0.374235, pmax=46.5226,
    rtol 1e-3)."""
    p = AllParameters.from_file(
        f"{REF}/fluid_cylinder_mpi/fluid_cylinder_mpi.prm")
    mesh = generators.flow_around_cylinder(2)
    f = InsIM(mesh, p)
    f.add_hard_coded_boundary_condition(0, _cylinder_bv_t)
    f.run(verbose=False)
    vmax = float(f.velocity_part().max())
    pmax = float(f.pressure_part().max())
    assert abs(vmax - 0.374235) / 0.374235 < 1e-3
    assert abs(pmax - 46.5226) / 46.5226 < 1e-3


def test_fluid_cylinder_mpi_insimex_one_step():
    """reference: tests/fluid_cylinder_mpi_insimex/...cpp:92-93:
    vmax=0.374062, pmax=46.5308."""
    from openifem_tpu.solvers.fluid import InsIMEX
    p = AllParameters.from_file(
        f"{REF}/fluid_cylinder_mpi_insimex/fluid_cylinder_mpi_insimex.prm")
    mesh = generators.flow_around_cylinder(2)
    f = InsIMEX(mesh, p)
    f.add_hard_coded_boundary_condition(0, _cylinder_bv_t)
    f.run(verbose=False)
    vmax = float(f.velocity_part().max())
    pmax = float(f.pressure_part().max())
    assert abs(vmax - 0.374062) / 0.374062 < 1e-3
    assert abs(pmax - 46.5308) / 46.5308 < 1e-3


def test_standalone_kelly_amr():
    """Kelly-driven AMR during a standalone fluid run (reference:
    source/insim.cpp:450-453): refinement concentrates near the lid shear
    layer and the run continues stably."""
    p = AllParameters.from_file(f"{REF}/fluid_cavity/fluid_cavity.prm")
    p.end_time = 0.06
    p.refinement_interval = 0.04  # refine after step 4
    p.global_refinements[0] = 2   # level 2 < the reference's max level 3
    mesh = generators.hyper_cube(0.0, 1.0, dim=2)
    f = InsIM(mesh, p)
    f.run(verbose=False)
    assert f.mesh.n_cells > 16          # refinement happened
    assert f.mesh.level.max() == 3
    centers = f.mesh.cell_centers()
    fine = centers[f.mesh.level == 3]
    assert fine[:, 1].mean() > 0.6      # concentrated near the lid
    assert np.isfinite(f.velocity_part()).all()


def test_insim_fast_flags_match_reference_path():
    """The performance flags (f32 Jacobian apply + loose Mp/Sm inner
    tolerance) change only the Krylov path, not the converged Newton
    solution: the f64 assembled residual gates convergence either way."""
    p = AllParameters.from_file(f"{REF}/fluid_cavity/fluid_cavity.prm")
    p.end_time = 0.03
    p.global_refinements[0] = 3

    def run(fast):
        class F(InsIM):
            mixed_precision_precond = fast
            f32_matrix = fast
            mp_sm_rtol = 1e-1 if fast else 1e-6
        mesh = generators.hyper_cube(0.0, 1.0, dim=2)
        f = F(mesh, p)
        f.run(verbose=False)
        return np.asarray(f.present_solution)

    ref = run(False)
    fast = run(True)
    scale = max(1.0, float(np.abs(ref).max()))
    assert np.abs(fast - ref).max() < 1e-7 * scale


def test_insim_f32_outer_matches_reference_path():
    """f32_outer runs the whole outer FGMRES (basis, CGS2, Givens) in f32
    with the solve tolerance clamped to the f32 floor; the f64 assembled
    residual still gates Newton, so the converged solution matches the
    all-f64 path to the Newton tolerance (inexact Newton, same contract
    as f32_matrix)."""
    p = AllParameters.from_file(f"{REF}/fluid_cavity/fluid_cavity.prm")
    p.end_time = 0.03
    p.global_refinements[0] = 3

    def run(fast):
        class F(InsIM):
            mixed_precision_precond = fast
            f32_matrix = fast
            f32_outer = fast
            mp_sm_rtol = 1e-1 if fast else 1e-6
            newton_forcing = (1e-4, 0.5) if fast else None
        mesh = generators.hyper_cube(0.0, 1.0, dim=2)
        f = F(mesh, p)
        f.run(verbose=False)
        return np.asarray(f.present_solution)

    ref = run(False)
    fast = run(True)
    scale = max(1.0, float(np.abs(ref).max()))
    # both solutions satisfy ||r|| <= fluid_tolerance * ||r0||; the
    # iterates may differ by the corresponding solution-error band
    assert np.abs(fast - ref).max() < 5e-5 * scale


def test_insim_dense_precond_matches_reference_path():
    """dense_precond builds the preconditioner's inner operators as exact
    condensed dense matrices (la/dense.py) — the same linear operators the
    element matvec path applies, so the converged solution matches.  The
    locally refined mesh exercises hanging-node condensation (static
    hanging tables)."""
    p = AllParameters.from_file(f"{REF}/fluid_cavity/fluid_cavity.prm")
    p.end_time = 0.03
    p.global_refinements[0] = 2

    n_u = {}

    def run(dense, bf16=False):
        class F(InsIM):
            mixed_precision_precond = True
            f32_matrix = True
            mp_sm_rtol = 1e-1
            dense_precond = dense
            dense_a_bf16 = bf16
        mesh = generators.hyper_cube(0.0, 1.0, dim=2).refine_global(2)
        c = mesh.cell_centers()
        mesh = mesh.refine(c[:, 1] > 0.5)
        f = F(mesh, p)
        f.run(verbose=False)
        n_u["n"] = f.n_u
        return np.asarray(f.present_solution)

    def diff(a, b):
        """Cavity flow has no pressure Dirichlet BC, so p is defined up
        to a constant; different preconditioner trajectories converge to
        different nullspace components (the round-5 stencil path lands
        the default run on one ~2.67 away from the dense run's).
        Compare velocity directly and pressure mean-shifted."""
        n = n_u["n"]
        du = np.abs(a[:n] - b[:n]).max()
        dp = a[n:] - b[n:]
        return max(du, np.abs(dp - dp.mean()).max())

    ref = run(False)
    scale = max(1.0, float(np.abs(ref).max()))
    assert diff(run(True), ref) < 1e-5 * scale
    # bf16 A block: preconditioner-only, so Newton still converges — but a
    # different Krylov trajectory stops at a different point inside the
    # fluid_tolerance band (width ~ tol * kappa(J) * scale), so the
    # comparison is against that band, not f32 round-off
    assert diff(run(True, bf16=True), ref) < 1e-3 * scale
