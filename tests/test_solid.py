"""Solid solver regression tests against the reference goldens.

Golden values come from /root/reference/tests/solid_* (rtol 1e-3):
 - solid_gravity_linearelastic: free-fall umin = -5.0
 - solid_gravity_hyperelastic:  free-fall umin = -5.0
 - solid_beam_bending_linearelastic: umin = -0.1337 (marked slow)
 - solid_beam_bending_NeoHookean (2D): umin=-0.0616287 umax=0.00867069
"""

import numpy as np
import pytest

from openifem_tpu.mesh import generators
from openifem_tpu.parameters import AllParameters
from openifem_tpu.solvers.solid import HyperElasticity, LinearElasticity

REF = "/root/reference/tests"


def test_solid_gravity_linearelastic():
    p = AllParameters.from_file(
        f"{REF}/solid_gravity_linearelastic/solid_gravity_linearelastic.prm")
    mesh = generators.sphere([0.0, 0.0], 0.25, dim=2)
    solid = LinearElasticity(mesh, p)
    solid.run()
    umin = float(np.min(np.asarray(solid.get_current_solution())))
    assert abs(umin + 5.0) / 5.0 < 1e-3


def test_solid_gravity_hyperelastic():
    p = AllParameters.from_file(
        f"{REF}/solid_gravity_hyperelastic/solid_gravity_hyperelastic.prm")
    mesh = generators.sphere([0.0, 0.0], 0.25, dim=2)
    solid = HyperElasticity(mesh, p)
    solid.run()
    umin = float(np.min(np.asarray(solid.get_current_solution())))
    assert abs(umin + 5.0) / 5.0 < 1e-3


def test_solid_beam_bending_neohookean_2d():
    p = AllParameters.from_file(
        f"{REF}/solid_beam_bending_NeoHookean/"
        "solid_beam_bending_NeoHookean.prm")
    L, H = 10.0, 1.0
    mesh = generators.subdivided_hyper_rectangle([40, 4], [0, 0], [L, H])
    solid = HyperElasticity(mesh, p)
    solid.run()
    u = np.asarray(solid.get_current_solution())
    umin, umax = float(u.min()), float(u.max())
    assert abs((umin + 0.0616287) / 0.0616287) < 1e-3
    assert abs((umax - 0.00867069) / 0.00867069) < 1e-3


@pytest.mark.slow
def test_solid_beam_bending_linearelastic():
    p = AllParameters.from_file(
        f"{REF}/solid_beam_bending_linearelastic/"
        "solid_beam_bending_linearelastic.prm")
    L, H = 8.0, 1.0
    mesh = generators.subdivided_hyper_rectangle([32, 4], [0, 0], [L, H])
    solid = LinearElasticity(mesh, p)
    solid.run()
    u = np.asarray(solid.get_current_solution())
    umin = float(u.min())
    assert abs((umin + 0.1337) / 0.1337) < 1e-3


def test_beam_linear_short_sanity():
    """Truncated beam: static tip deflection direction + magnitude scale."""
    p = AllParameters.from_file(
        f"{REF}/solid_beam_bending_linearelastic/"
        "solid_beam_bending_linearelastic.prm")
    p.end_time = 10.0
    mesh = generators.subdivided_hyper_rectangle([32, 4], [0, 0], [8.0, 1.0])
    solid = LinearElasticity(mesh, p)
    solid.run()
    u = np.asarray(solid.get_current_solution())
    # beam loaded downward -> negative y displacement of the tip
    assert u.min() < -0.003
    solid.update_strain_and_stress()
    assert solid.stress.shape[0] == 2


def test_solid_beam_bending_neohookean_3d():
    """3D hyperelastic cantilever golden (reference:
    tests/solid_beam_bending_NeoHookean/...cpp:59-60: umin=-0.0617214,
    umax=0.00867507, rtol 1e-3)."""
    p = AllParameters.from_file(
        f"{REF}/solid_beam_bending_NeoHookean/"
        "solid_beam_bending_NeoHookean.prm")
    p.dimension = 3
    p.gravity = [0.0, 0.0, 0.0]
    p.solid_neumann_bcs = {3: [0.0, -500.0, 0.0]}
    L, H = 10.0, 1.0
    mesh = generators.subdivided_hyper_rectangle(
        [40, 4, 4], [0, 0, 0], [L, H, H])
    solid = HyperElasticity(mesh, p)
    solid.run()
    u = np.asarray(solid.get_current_solution())
    umin, umax = float(u.min()), float(u.max())
    assert abs((umin + 0.0617214) / 0.0617214) < 1e-3
    assert abs((umax - 0.00867507) / 0.00867507) < 1e-3


def test_hypo_elasticity_free_fall():
    """Meshfree hypo-elastic solver (RKPM stand-in for the reference's
    optional rkpm-rk4 dependency): free fall reproduces u = -g t^2 / 2."""
    from openifem_tpu.solvers.solid.hypo import HypoElasticity
    p = AllParameters.from_file(
        f"{REF}/solid_gravity_linearelastic/solid_gravity_linearelastic.prm")
    p.time_step = 0.05
    p.solid_type = "LinearElastic"
    mesh = generators.subdivided_hyper_rectangle([4, 4], [0, 0], [1.0, 1.0])
    p.global_refinements[1] = 0
    s = HypoElasticity(mesh, p)
    s.run()
    u = np.asarray(s.get_current_solution()).reshape(-1, 2)
    assert abs(u[:, 1].min() + 5.0) / 5.0 < 1e-6
    assert np.allclose(u[:, 1], u[:, 1].mean(), atol=1e-8)


def test_hypo_elasticity_bending_smoke():
    """Clamped beam under downward traction bends down and stays stable
    (reference rkpm-rk4-bending is a smoke test too)."""
    from openifem_tpu.solvers.solid.hypo import HypoElasticity
    p = AllParameters.from_file(
        f"{REF}/solid_beam_bending_linearelastic/"
        "solid_beam_bending_linearelastic.prm")
    p.global_refinements[1] = 0
    p.end_time = 20.0
    p.time_step = 0.05  # explicit stability
    mesh = generators.subdivided_hyper_rectangle([32, 4], [0, 0], [8.0, 1.0])
    s = HypoElasticity(mesh, p)
    s.run()
    u = np.asarray(s.get_current_solution()).reshape(-1, 2)
    assert np.isfinite(u).all()
    assert -0.5 < u[:, 1].min() < -0.005  # bends downward, bounded


def test_solid_rotation_kirchhoff_smoke():
    """Kirchhoff material smoke test (reference: tests/
    solid_rotation_Kirchhoff — traction on one face spins the free block;
    must run stably), truncated."""
    p = AllParameters.from_file(
        f"{REF}/solid_rotation_Kirchhoff/solid_rotation_Kirchhoff.prm")
    p.end_time = 50 * p.time_step
    mesh = generators.subdivided_hyper_rectangle([2, 2], [0, 0], [1.0, 1.0])
    solid = HyperElasticity(mesh, p)
    solid.run()
    u = np.asarray(solid.get_current_solution())
    assert np.isfinite(u).all()
    assert 1e-4 < np.abs(u).max() < 1.0  # moves, stays bounded


def test_shared_linear_beam_golden():
    """SharedLinearElasticity (HHT-alpha) in standalone mode reproduces the
    beam golden (reference: tests/solid_beam_bending_mpi_shared_linearelastic
    umin = -0.1337, rtol 1e-3; damping = 0 makes HHT = Newmark)."""
    from openifem_tpu.solvers.solid.shared import SharedLinearElasticity
    p = AllParameters.from_file(
        f"{REF}/solid_beam_bending_mpi_shared_linearelastic/"
        "solid_beam_bending_mpi_shared_linearelastic.prm")
    mesh = generators.subdivided_hyper_rectangle([32, 4], [0, 0], [8.0, 1.0])
    solid = SharedLinearElasticity(mesh, p)
    solid.run()
    umin = float(np.asarray(solid.get_current_solution()).min())
    assert abs((umin + 0.1337) / 0.1337) < 1e-3


def test_shared_neohookean_beam_golden():
    """SharedHyperElasticity standalone (reference:
    tests/solid_beam_bending_mpi_shared_NeoHookean)."""
    from openifem_tpu.solvers.solid.shared import SharedHyperElasticity
    p = AllParameters.from_file(
        f"{REF}/solid_beam_bending_mpi_shared_NeoHookean/"
        "solid_beam_bending_mpi_shared_NeoHookean.prm")
    mesh = generators.subdivided_hyper_rectangle([40, 4], [0, 0],
                                                 [10.0, 1.0])
    solid = SharedHyperElasticity(mesh, p)
    solid.run()
    u = np.asarray(solid.get_current_solution())
    assert abs((float(u.min()) + 0.0616287) / 0.0616287) < 1e-3


def test_solid_rotation_shared_kirchhoff_smoke():
    """SharedHyperElasticity with the Kirchhoff material (reference:
    tests/solid_rotation_mpi_shared_Kirchhoff — 2x2 unit block spun by a
    boundary traction; smoke test), truncated."""
    from openifem_tpu.solvers.solid.shared import SharedHyperElasticity
    p = AllParameters.from_file(
        f"{REF}/solid_rotation_mpi_shared_Kirchhoff/"
        "solid_rotation_mpi_shared_Kirchhoff.prm")
    p.end_time = 50 * p.time_step
    mesh = generators.subdivided_hyper_rectangle([2, 2], [0, 0], [1.0, 1.0])
    solid = SharedHyperElasticity(mesh, p)
    solid.run()
    u = np.asarray(solid.get_current_solution())
    assert np.isfinite(u).all()
    assert 1e-5 < np.abs(u).max() < 1.0


def test_hypo_elasticity_3d_truncated():
    """3D RKPM beam (reference: tests/rkpm-rk4-3D — clamped 8x1x1 beam,
    downward z traction on the top face, NeoHookean-parameterized
    hypo-elastic rate update), truncated and coarsened: the beam starts
    bending in -z and stays stable."""
    from openifem_tpu.solvers.solid.hypo import HypoElasticity
    p = AllParameters.from_file(f"{REF}/rkpm-rk4-3D/rkpm-rk4-3D.prm")
    p.end_time = 30 * p.time_step
    mesh = generators.subdivided_hyper_rectangle(
        [16, 2, 2], [0, 0, 0], [8.0, 1.0, 1.0])
    s = HypoElasticity(mesh, p)
    s.run()
    u = np.asarray(s.get_current_solution()).reshape(-1, 3)
    assert np.isfinite(u).all()
    assert -0.5 < u[:, 2].min() < -1e-6   # bends down in z, bounded
