"""Spalart-Allmaras turbulence model tests.

The reference ships no SA regression test (it is exercised only by the
vocal-fold applications), so these are functional checks: BC handling, wall
distance, decay/production behavior and fluid coupling."""

import numpy as np
import pytest

from openifem_tpu.mesh import generators
from openifem_tpu.parameters import AllParameters
from openifem_tpu.solvers.fluid.supg import SCnsIM, SUPGInsIM
from openifem_tpu.solvers.turbulence import make_turbulence_model

REF = "/root/reference/tests"


def _channel_setup():
    p = AllParameters.from_file(
        f"{REF}/fluid_plane_wall_driven_mpi_insim_supg/"
        "fluid_plane_wall_driven_mpi_insim_supg.prm")
    # SA BCs: bottom wall (2) + moving top wall (3) walls; left (0) inflow
    p.n_spalart_allmaras_model_bcs = 3
    p.spalart_allmaras_model_bcs = {0: 1, 2: 0, 3: 0}
    p.spalart_allmaras_initial_condition_coefficient = 3.0
    mesh = generators.subdivided_hyper_rectangle(
        [20, 16], [0.0, 0.0], [2.0, 0.4])
    return p, mesh


def test_sa_setup_and_step():
    p, mesh = _channel_setup()
    fluid = SUPGInsIM(mesh, p)
    fluid.run_one_step  # noqa: B018 - ensure attribute exists
    fluid.mesh = mesh
    fluid.setup()
    fluid._setup_done = True
    sa = make_turbulence_model("Spalart-Allmaras", fluid)
    sa.setup()

    # wall distance: zero on walls, ~0.2 at channel mid-height
    dmin = np.asarray(sa.fixed_wall_distance)
    pts = fluid.u_space.node_points
    on_wall = (np.abs(pts[:, 1]) < 1e-12) | (np.abs(pts[:, 1] - 0.4) < 1e-12)
    assert np.allclose(dmin[on_wall], 0.0, atol=1e-12)
    mid = np.abs(pts[:, 1] - 0.2) < 1e-9
    assert np.allclose(dmin[mid], 0.2, atol=0.03)

    # initial condition: 3x laminar nu in the interior, BC values on bdry
    lam_nu = p.viscosity / p.fluid_rho
    nu0 = np.asarray(sa.present_solution)
    assert np.allclose(nu0[on_wall], 0.0)
    interior = ~np.asarray(sa.zero_constraints.dirichlet)
    assert np.allclose(nu0[interior], 3.0 * lam_nu)

    # step the fluid then the SA model; eddy viscosity stays finite/positive
    fluid.run_one_step(True, verbose=False)
    sa.run_one_step(True)
    nu = np.asarray(sa.present_solution)
    assert np.isfinite(nu).all()
    mut = np.asarray(sa.eddy_viscosity_nodal)
    assert np.isfinite(mut).all()
    # walls keep nu~ = 0
    assert np.allclose(nu[on_wall], 0.0, atol=1e-12)
    # inflow keeps nu~ = 5 nu_laminar
    inflow = np.abs(pts[:, 0]) < 1e-12
    inflow_interior = inflow & ~on_wall
    assert np.allclose(nu[inflow_interior], 5.0 * lam_nu, atol=1e-10)


def test_sa_coupled_scnsim_runs():
    """SCnsIM consumes the eddy viscosity field without blowing up."""
    p, mesh = _channel_setup()
    p.end_time = 3 * p.time_step
    fluid = SCnsIM(mesh, p)
    fluid.mesh = mesh
    fluid.setup()
    fluid._setup_done = True
    sa = make_turbulence_model("Spalart-Allmaras", fluid)
    sa.setup()
    first = True
    while fluid.time.end() - fluid.time.current() > 1e-12:
        sa.run_one_step(first)
        fluid.run_one_step(first, verbose=False)
        first = False
    u = fluid.velocity_part()
    assert np.isfinite(u).all()
    assert 0 < np.abs(u).max() < 10


def test_sa_shear_velocity_profile():
    """get_shear_velocity solves u_tau * u+(u_tau d / nu) = vel
    (reference: source/mpi_spalart_allmaras.cpp:217-280)."""
    from types import SimpleNamespace
    from openifem_tpu.solvers.turbulence.spalart_allmaras import (
        SpalartAllmaras, _u_plus)

    p, _ = _channel_setup()
    p.wall_function_image_distance = 0.01
    sa = SpalartAllmaras(SimpleNamespace(params=p))
    nu = p.viscosity / p.fluid_rho
    dist = p.wall_function_image_distance

    # viscous sublayer branch: vel*dist/nu < sqrt(5) -> u_tau^2 = vel*nu/d
    vel_v = 0.5 * np.sqrt(5.0) * nu / dist
    ut_v = sa.get_shear_velocity(vel_v, 0.0)[0]
    assert abs(ut_v ** 2 - vel_v * nu / dist) < 1e-12

    # turbulent branch: residual of the analytic profile equation
    vels = np.array([5.0, 20.0, 80.0])
    uts = sa.get_shear_velocity(vels, np.zeros(3))
    res = uts * _u_plus(uts * dist / nu) - vels
    assert np.all(np.abs(res) < 0.05 * vels), (uts, res)

    # zero velocity -> zero shear velocity
    assert sa.get_shear_velocity(0.0, 1.0)[0] == 0.0


def test_sa_moving_wall_distance_and_bc():
    """Point-to-segment moving-wall distance with interpolated y+ and the
    per-step wall-function Dirichlet rows
    (reference: source/mpi_spalart_allmaras.cpp:16-215)."""
    p, mesh = _channel_setup()
    fluid = SUPGInsIM(mesh, p)
    fluid.mesh = mesh
    fluid.setup()
    fluid._setup_done = True
    sa = make_turbulence_model("Spalart-Allmaras", fluid)
    sa.setup()
    nu = p.viscosity / p.fluid_rho

    # one segment hovering above the bottom wall, u_tau 2 -> 4 along it
    verts = np.array([[0.5, 0.1], [1.5, 0.1]])
    faces = np.array([[0, 1]])
    ut = np.array([2e-3, 4e-3])
    sa.update_moving_wall_distance(verts, faces, ut)
    pts = np.asarray(fluid.u_space.node_points)
    mwd = np.asarray(sa.moving_wall_distance)

    # node (1.0, 0.2): foot of perpendicular at (1.0, 0.1), t = 0.5
    i = np.where(np.linalg.norm(pts - [1.0, 0.2], axis=1) < 1e-9)[0][0]
    assert abs(mwd[i] - 0.1) < 1e-12
    assert abs(sa.y_plus[i] - 0.1 * 3e-3 / nu) < 1e-12

    # interior node (0.3, 0.3): beyond the segment -> vertex region of
    # (0.5, 0.1), distance sqrt(0.08)
    j = np.where(np.linalg.norm(pts - [0.3, 0.3], axis=1) < 1e-9)[0][0]
    dj = np.sqrt(0.08)
    assert abs(mwd[j] - dj) < 1e-12
    assert abs(sa.y_plus[j] - dj * 2e-3 / nu) < 1e-12

    # wall-function Dirichlet rows: nu~ = kappa y+ nu within the effective
    # distance, frozen rows accumulate across steps
    p.wall_function_effective_distance = 0.15
    fluid.indicator = np.zeros(fluid.mesh.n_cells)
    sa.update_boundary_condition(first_step=False)
    dmask = np.asarray(sa._step_nonzero.dirichlet)
    vals = np.asarray(sa._step_nonzero.dirichlet_values)
    assert dmask[i] and not dmask[j]
    present = np.asarray(sa.present_solution)
    assert abs(vals[i] - (0.41 * sa.y_plus[i] * nu - present[i])) < 1e-14
    # accumulation quirk: the row stays constrained next step even if far
    sa.update_moving_wall_distance(verts + 100.0, faces, ut)
    sa.update_boundary_condition(first_step=False)
    assert np.asarray(sa._step_zero.dirichlet)[i]
    assert np.asarray(sa._step_nonzero.dirichlet_values)[i] == 0.0


def test_sa_fsi_wall_function_smoke():
    """MPIFSI drives the full wall-function loop: shear velocities at solid
    boundary vertices, moving-wall distance, per-step SA constraints
    (reference: source/mpi_fsi.cpp:655-660, 784-844, 1199-1203)."""
    from openifem_tpu.fsi.mpi_fsi import MPIFSI
    from openifem_tpu.mesh import generators
    from openifem_tpu.solvers.solid.shared import SharedLinearElasticity

    p = AllParameters.from_file(
        f"{REF}/fsi_contact_model_mpi/fsi_contact_model_mpi.prm")
    p.end_time = 3 * p.time_step
    p.n_spalart_allmaras_model_bcs = 3
    p.spalart_allmaras_model_bcs = {0: 1, 2: 0, 3: 0}
    p.spalart_allmaras_initial_condition_coefficient = 3.0
    fluid_mesh = generators.subdivided_hyper_rectangle(
        [20, 10], [0.0, 0.0], [2.0, 1.0])
    solid_mesh = generators.subdivided_hyper_rectangle(
        [4, 4], [0.0, 0.0], [0.5, 0.5])
    solid_mesh.vertices = solid_mesh.vertices + np.array([0.75, 0.25])

    fluid = SCnsIM(fluid_mesh, p)
    sa = make_turbulence_model("Spalart-Allmaras", fluid)
    solid = SharedLinearElasticity(solid_mesh, p)
    fsi = MPIFSI(fluid, solid, p)
    fsi.run(verbose=False)

    assert np.isfinite(fsi.shear_velocities).all()
    mwd = np.asarray(sa.moving_wall_distance)
    assert np.isfinite(mwd).all() and mwd.min() < 0.3
    assert np.isfinite(np.asarray(sa.eddy_viscosity_nodal)).all()
    # the immersed solid produced indicator rows in the SA constraints
    assert sa._accum_mask.any()


def test_sa_fused_device_stepper_matches_host():
    """run_on_device fuses a standalone SA model into the single-dispatch
    time loop (SA Newton before each fluid step on the previous fluid
    solution, the reference alternation source/mpi_supg_solver.cpp:458-468
    as one lax.fori_loop); results match the host run() loop."""
    p, mesh = _channel_setup()
    p.end_time = 3 * p.time_step
    f_host = SCnsIM(mesh, p)
    sa_host = make_turbulence_model("Spalart-Allmaras", f_host)
    f_host.run(verbose=False)

    p2, mesh2 = _channel_setup()
    p2.end_time = 3 * p2.time_step
    f_dev = SCnsIM(mesh2, p2)
    sa_dev = make_turbulence_model("Spalart-Allmaras", f_dev)
    f_dev.run_on_device(verbose=False)

    for a, b, what in ((f_dev.present_solution, f_host.present_solution,
                        "fluid solution"),
                       (sa_dev.present_solution, sa_host.present_solution,
                        "SA nu~"),
                       (sa_dev.eddy_viscosity_nodal,
                        sa_host.eddy_viscosity_nodal, "eddy viscosity")):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, np.abs(b).max())
        assert np.abs(a - b).max() < 1e-8 * scale, \
            f"device {what} diverges from host: {np.abs(a - b).max():.3e}"


def test_sa_attached_run_loop():
    """SUPGFluidSolver.run drives an attached SA model each step
    (reference: source/mpi_supg_solver.cpp:458-468)."""
    p, mesh = _channel_setup()
    p.end_time = 2 * p.time_step
    fluid = SCnsIM(mesh, p)
    sa = make_turbulence_model("Spalart-Allmaras", fluid)
    fluid.run(verbose=False)
    nu = np.asarray(sa.present_solution)
    assert np.isfinite(nu).all()
    mut = np.asarray(sa.eddy_viscosity_nodal)
    assert np.isfinite(mut).all() and mut.max() >= 0
    assert np.isfinite(fluid.velocity_part()).all()
