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
