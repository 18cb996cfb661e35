"""Output + checkpoint/restart tests."""

import os

import numpy as np
import pytest

from openifem_tpu.mesh import generators
from openifem_tpu.parameters import AllParameters
from openifem_tpu.solvers.fluid import InsIM
from openifem_tpu.solvers.solid import LinearElasticity

REF = "/root/reference/tests"


def test_vtu_pvd_output(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    p = AllParameters.from_file(f"{REF}/fluid_cavity/fluid_cavity.prm")
    p.end_time = 0.02
    p.global_refinements[0] = 2
    f = InsIM(generators.hyper_cube(0.0, 1.0, dim=2), p)
    f.run(verbose=False)
    f.output_results()
    assert os.path.exists("fluid-000002.vtu")
    assert os.path.exists("fluid.pvd")
    txt = open("fluid-000002.vtu").read()
    assert "velocity" in txt and "pressure" in txt and "indicator" in txt


def test_checkpoint_restart_fluid(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    p = AllParameters.from_file(f"{REF}/fluid_cavity/fluid_cavity.prm")
    p.end_time = 0.04
    p.global_refinements[0] = 2
    mesh = generators.hyper_cube(0.0, 1.0, dim=2)
    f1 = InsIM(mesh, p)
    f1.run(verbose=False)
    ref = np.asarray(f1.present_solution)

    # run half, checkpoint, restart, continue
    p2 = AllParameters.from_file(f"{REF}/fluid_cavity/fluid_cavity.prm")
    p2.end_time = 0.04
    p2.global_refinements[0] = 2
    fa = InsIM(mesh, p2)
    fa.mesh = fa.mesh.refine_global(2)
    fa.setup()
    fa.run_one_step(True, verbose=False)
    fa.run_one_step(False, verbose=False)
    fa.save_checkpoint()

    fb = InsIM(generators.hyper_cube(0.0, 1.0, dim=2), p2)
    assert fb.load_checkpoint()
    assert fb.time.get_timestep() == 2
    while fb.time.end() - fb.time.current() > 1e-12:
        fb.run_one_step(False, verbose=False)
    out = np.asarray(fb.present_solution)
    assert np.allclose(out, ref, atol=1e-9)


def test_checkpoint_restart_solid(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    p = AllParameters.from_file(
        f"{REF}/solid_gravity_linearelastic/solid_gravity_linearelastic.prm")
    mesh = generators.sphere([0.0, 0.0], 0.25, dim=2)
    s1 = LinearElasticity(mesh, p)
    s1.run()
    ref = np.asarray(s1.get_current_solution())

    s2 = LinearElasticity(generators.sphere([0.0, 0.0], 0.25, dim=2), p)
    s2.mesh = s2.mesh.refine_global(p.global_refinements[1])
    s2.setup()
    s2.run_one_step(True)
    s2.run_one_step(False)
    s2.save_checkpoint()
    s2.output_results()

    s3 = LinearElasticity(generators.sphere([0.0, 0.0], 0.25, dim=2), p)
    assert s3.load_checkpoint()
    while s3.time.end() - s3.time.current() > 1e-12:
        s3.run_one_step(False)
    out = np.asarray(s3.get_current_solution())
    assert np.allclose(out, ref, atol=1e-10)


def test_checkpoint_restart_after_amr(tmp_path, monkeypatch):
    """A checkpoint saved after Kelly AMR changed the dof layout restores
    the adapted mesh exactly (the reference persists the triangulation,
    mpi_fluid_solver.cpp:581-713)."""
    monkeypatch.chdir(tmp_path)
    p = AllParameters.from_file(f"{REF}/fluid_cavity/fluid_cavity.prm")
    p.end_time = 0.04
    p.global_refinements[0] = 2
    fa = InsIM(generators.hyper_cube(0.0, 1.0, dim=2), p)
    fa.mesh = fa.mesh.refine_global(2)
    fa.setup()
    fa.run_one_step(True, verbose=False)
    fa.refine_mesh(0, 3)
    assert fa.mesh.n_cells != 16  # the layout actually changed
    fa.run_one_step(False, verbose=False)
    fa.save_checkpoint()
    ref = np.asarray(fa.present_solution)

    fb = InsIM(generators.hyper_cube(0.0, 1.0, dim=2), p)
    assert fb.load_checkpoint()
    assert fb.n_dofs == fa.n_dofs
    assert fb.mesh.n_cells == fa.mesh.n_cells
    assert np.array_equal(np.asarray(fb.present_solution), ref)
    # and it can keep stepping on the adapted mesh
    fb.run_one_step(False, verbose=False)
    assert np.isfinite(np.asarray(fb.present_solution)).all()


def test_checkpoint_restart_sa_turbulence(tmp_path, monkeypatch):
    """Restart under an attached Spalart-Allmaras model is exact: nu~ and
    wall state piggyback on the fluid checkpoint (reference:
    source/mpi_spalart_allmaras.cpp:569-591)."""
    from openifem_tpu.solvers.fluid.supg import SUPGInsIM
    from openifem_tpu.solvers.turbulence import make_turbulence_model

    monkeypatch.chdir(tmp_path)

    def build():
        p = AllParameters.from_file(
            f"{REF}/fluid_plane_wall_driven_mpi_insim_supg/"
            "fluid_plane_wall_driven_mpi_insim_supg.prm")
        p.n_spalart_allmaras_model_bcs = 3
        p.spalart_allmaras_model_bcs = {0: 1, 2: 0, 3: 0}
        p.spalart_allmaras_initial_condition_coefficient = 3.0
        mesh = generators.subdivided_hyper_rectangle(
            [10, 8], [0.0, 0.0], [2.0, 0.4])
        fluid = SUPGInsIM(mesh, p)
        fluid.setup()
        fluid._setup_done = True
        sa = make_turbulence_model("Spalart-Allmaras", fluid)
        sa.setup()
        return fluid, sa

    def step(fluid, sa, first):
        sa.update_boundary_condition(first)
        sa.run_one_step(first)
        fluid.run_one_step(first, verbose=False)

    # uninterrupted 4 steps
    f1, sa1 = build()
    for i in range(4):
        step(f1, sa1, i == 0)
    ref_u = np.asarray(f1.present_solution)
    ref_nu = np.asarray(sa1.present_solution)

    # 2 steps, checkpoint, restart, 2 more
    f2, sa2 = build()
    for i in range(2):
        step(f2, sa2, i == 0)
    f2.save_checkpoint()

    f3, sa3 = build()
    assert f3.load_checkpoint()
    assert f3.time.get_timestep() == 2
    assert np.array_equal(np.asarray(sa3.present_solution),
                          np.asarray(sa2.present_solution))
    for _ in range(2):
        step(f3, sa3, False)
    assert np.array_equal(np.asarray(f3.present_solution), ref_u)
    assert np.array_equal(np.asarray(sa3.present_solution), ref_nu)


def test_run_loop_outputs_at_intervals(tmp_path, monkeypatch):
    """Every run loop writes VTU/PVD at `Output interval` like the
    reference solvers do (source/mpi_fluid_solver.cpp:490-579,
    mpi_insim.cpp:481-484) — without the test calling output_results."""
    import glob
    monkeypatch.chdir(tmp_path)
    p = AllParameters.from_file(f"{REF}/fluid_cavity/fluid_cavity.prm")
    dt = p.time_step
    p.end_time = 4 * dt
    p.output_interval = 2 * dt
    p.global_refinements[0] = 2
    f = InsIM(generators.hyper_cube(0.0, 1.0, dim=2), p)
    f.run(verbose=False)
    vtus = sorted(glob.glob("fluid-*.vtu"))
    assert [v for v in vtus] == ["fluid-000002.vtu", "fluid-000004.vtu"]
    assert os.path.exists("fluid.pvd")
    # solid side
    ps = AllParameters.from_file(
        f"{REF}/solid_gravity_linearelastic/solid_gravity_linearelastic.prm")
    ps.end_time = 2 * ps.time_step
    ps.output_interval = ps.time_step
    s = LinearElasticity(generators.sphere([0.0, 0.0], 0.25, dim=2), ps)
    s.run()
    svtus = sorted(glob.glob("solid-*.vtu"))
    assert "solid-000001.vtu" in svtus and "solid-000002.vtu" in svtus
