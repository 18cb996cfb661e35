"""Serial FSI coupling tests (reference: tests/fsi_gravity, tests/fsi_leaflet,
tests/fsi_cavity — smoke tests that must run to completion; we add physics
sanity assertions)."""

import numpy as np
import pytest

from openifem_tpu.fsi import FSI
from openifem_tpu.mesh import generators
from openifem_tpu.parameters import AllParameters
from openifem_tpu.solvers.fluid import InsIM
from openifem_tpu.solvers.solid import HyperElasticity

REF = "/root/reference/tests"


def test_fsi_gravity():
    """Falling sphere in viscous fluid (reference: tests/fsi_gravity, 3
    steps, Dirichlet-BC coupling mode), coarsened for CI."""
    p = AllParameters.from_file(f"{REF}/fsi_gravity/fsi_gravity.prm")
    p.global_refinements = [1, 2]  # reference uses [2, 3]; coarsen for CI
    L, W, H, R, h = 1.0, 2.0, 5.0, 0.125, 0.25

    fluid_mesh = generators.subdivided_hyper_rectangle(
        [int(W / h), int(H / h)], [0.0, 0.0], [W, -H])
    centers = fluid_mesh.cell_centers()
    flags = (centers[:, 0] >= W / 2 - 2 * R) & (centers[:, 0] <= W / 2 + 2 * R)
    fluid_mesh = fluid_mesh.refine(flags)
    fluid = InsIM(fluid_mesh, p)

    solid_mesh = generators.sphere([L, -L], R, dim=2)
    solid = HyperElasticity(solid_mesh, p)

    fsi = FSI(fluid, solid, p, use_dirichlet_bc=True)
    fsi.run(verbose=False)

    d = np.asarray(solid.current_displacement).reshape(-1, 2)
    # the sphere fell: negative y displacement, bounded by free fall
    free_fall = 0.5 * 980.0 * p.end_time ** 2
    assert -1.5 * free_fall < d[:, 1].mean() < -0.05 * free_fall
    # fluid developed a downward flow where the sphere is
    u = fluid.velocity_part().reshape(-1, 2)
    assert np.isfinite(u).all()
    assert u[:, 1].min() < 0


def test_fsi_cavity_truncated():
    """Immersed ball in lid-driven cavity, body-force coupling mode
    (reference: tests/fsi_cavity, use_dirichlet_bc=false), truncated."""
    p = AllParameters.from_file(f"{REF}/fsi_cavity/fsi_cavity.prm")
    p.end_time = 0.1
    p.global_refinements = [4, 2]  # reference [5, 4]; coarsen for CI
    fluid = InsIM(generators.hyper_cube(0.0, 1.0, dim=2), p)
    solid = HyperElasticity(generators.sphere([0.6, 0.6], 0.1, dim=2), p)
    fsi = FSI(fluid, solid, p, use_dirichlet_bc=False)
    fsi.run(verbose=False)
    u = fluid.velocity_part().reshape(-1, 2)
    assert np.isfinite(u).all()
    # some cells must be marked as artificial fluid
    assert float(np.asarray(fluid.indicator).sum()) > 0
    d = np.asarray(solid.current_displacement)
    assert np.isfinite(d).all()
    assert np.abs(d).max() < 0.5


def _leaflet_setup(p):
    L, H, a, b, h, U = 4.0, 1.0, 0.1, 0.4, 0.05, 1.5

    def bv(points, component):
        out = np.zeros(len(points))
        if component == 0:
            m = np.abs(points[:, 0]) < 1e-10
            out[m] = U - 4 * U / (H * H) * (points[m, 1] - H / 2) ** 2
        return out

    fluid_mesh = generators.subdivided_hyper_rectangle(
        [int(L / h), int(H / h)], [0.0, 0.0], [L, H])
    centers = fluid_mesh.cell_centers()
    flags = ((centers[:, 0] >= L / 4 - a) & (centers[:, 0] <= L / 4 + 2 * a) &
             (centers[:, 1] < H / 2))
    fluid_mesh = fluid_mesh.refine(flags)
    fluid = InsIM(fluid_mesh, p, bc=bv)
    solid_mesh = generators.subdivided_hyper_rectangle(
        [int(a / h), int(b / h)], [L / 4, 0.0], [a + L / 4, b])
    solid = HyperElasticity(solid_mesh, p)
    return fluid, solid


def test_fsi_leaflet_truncated():
    """2D flexible leaflet in channel flow (reference: tests/fsi_leaflet,
    hard-coded parabolic inflow, hanging-node fluid mesh, Dirichlet-BC
    coupling), truncated to 10 steps for CI."""
    p = AllParameters.from_file(f"{REF}/fsi_leaflet/fsi_leaflet.prm")
    p.end_time = 0.05
    fluid, solid = _leaflet_setup(p)
    fsi = FSI(fluid, solid, p, use_dirichlet_bc=True)
    fsi.run(verbose=False)
    u = fluid.velocity_part().reshape(-1, 2)
    assert np.isfinite(u).all()
    d = np.asarray(solid.current_displacement).reshape(-1, 2)
    # the leaflet is pushed downstream (+x) by the flow
    assert d[:, 0].max() > 1e-4
    assert d[:, 0].max() < 0.5


@pytest.mark.slow
def test_fsi_leaflet_full():
    """Long fsi_leaflet run (reference smoke test: must complete; truncated
    to 100 of 200 steps to bound suite runtime)."""
    p = AllParameters.from_file(f"{REF}/fsi_leaflet/fsi_leaflet.prm")
    p.end_time = 0.5
    fluid, solid = _leaflet_setup(p)
    fsi = FSI(fluid, solid, p, use_dirichlet_bc=True)
    fsi.run(verbose=False)
    d = np.asarray(solid.current_displacement).reshape(-1, 2)
    assert np.isfinite(d).all()
    assert 0.01 < d[:, 0].max() < 0.5


def test_fsi_interface_refinement():
    """Interface-distance AMR with solution transfer (reference:
    source/fsi.cpp:385-456,499-506): triggered by a refinement interval
    smaller than the end time."""
    p = AllParameters.from_file(f"{REF}/fsi_cavity/fsi_cavity.prm")
    p.end_time = 0.03
    p.refinement_interval = 0.02  # < end time -> initial x2 refinement
    p.global_refinements = [3, 1]
    fluid = InsIM(generators.hyper_cube(0.0, 1.0, dim=2), p)
    solid = HyperElasticity(generators.sphere([0.6, 0.6], 0.1, dim=2), p)
    fsi = FSI(fluid, solid, p, use_dirichlet_bc=False)
    fsi.run(verbose=False)
    # the fluid mesh was refined near the ball
    assert fluid.mesh.n_cells > 64
    assert fluid.mesh.level.max() == 4
    u = fluid.velocity_part()
    assert np.isfinite(u).all()


def test_fsi_3d_smoke():
    """3D immersed coupling smoke test: small sphere falling in a viscous
    box (exercises 3D point location, face normals and coupling kernels)."""
    p = AllParameters.from_file(f"{REF}/fsi_gravity/fsi_gravity.prm")
    p.dimension = 3
    p.gravity = [0.0, 0.0, -980.0]
    p.initial_velocity = [0.0, 0.0, 0.0]
    p.end_time = 2e-3
    p.global_refinements = [0, 0]
    p.fluid_dirichlet_bcs = {i: (7, [0.0, 0.0, 0.0]) for i in range(5)}
    p.solid_dirichlet_bcs = {}

    fluid_mesh = generators.subdivided_hyper_rectangle(
        [6, 6, 10], [0, 0, 0], [1.5, 1.5, -2.5])
    fluid = InsIM(fluid_mesh, p)
    solid_mesh = generators.sphere([0.75, 0.75, -0.75], 0.2, dim=3)
    solid = HyperElasticity(solid_mesh, p)
    fsi = FSI(fluid, solid, p, use_dirichlet_bc=True)
    fsi.run(verbose=False)
    d = np.asarray(solid.current_displacement).reshape(-1, 3)
    assert np.isfinite(d).all()
    assert d[:, 2].mean() < -1e-5  # fell in -z
    assert np.isfinite(fluid.velocity_part()).all()
