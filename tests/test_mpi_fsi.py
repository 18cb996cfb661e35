"""MPI-semantics FSI tests (nodal coupling + contact model)."""

import numpy as np
import pytest

from openifem_tpu.fsi.mpi_fsi import MPIFSI
from openifem_tpu.mesh import generators
from openifem_tpu.parameters import AllParameters
from openifem_tpu.solvers.fluid.supg import SCnsIM
from openifem_tpu.solvers.solid.shared import (SharedHyperElasticity,
                                               SharedLinearElasticity)

REF = "/root/reference/tests"


def test_fsi_contact_model():
    """Penalty contact of an elastic block against a wall
    (reference: tests/fsi_contact_model_mpi, golden umin = -0.01999,
    rtol 1e-3)."""
    p = AllParameters.from_file(
        f"{REF}/fsi_contact_model_mpi/fsi_contact_model_mpi.prm")
    fluid_mesh = generators.subdivided_hyper_rectangle(
        [50, 25], [0.0, 0.0], [2.0, 1.0])
    solid_mesh = generators.subdivided_hyper_rectangle(
        [10, 11], [0.0, 0.0], [1.0, 1.02])
    solid_mesh.vertices = solid_mesh.vertices + np.array([0.25, 0.0])

    fluid = SCnsIM(fluid_mesh, p)
    solid = SharedLinearElasticity(solid_mesh, p)

    def penetration(points):
        return points[:, 1] - 1.0

    fsi = MPIFSI(fluid, solid, p)
    fsi.set_penetration_criterion(penetration, np.array([0.0, -1.0]))
    fsi.run(verbose=False)
    u = np.asarray(solid.get_current_solution())
    umin = float(u.min())
    assert abs(umin + 0.01999) / 0.01999 < 1e-3, umin


def test_control_volume_fsi(tmp_path, monkeypatch):
    """ControlVolumeFSI budgets on a channel with an immersed block
    (reference: tests have no CV golden; check conservation-flavored
    sanity: steady-ish Poiseuille inflow/outflow balance)."""
    monkeypatch.chdir(tmp_path)
    from openifem_tpu.fsi.cv_fsi import ControlVolumeFSI
    p = AllParameters.from_file(
        f"{REF}/fsi_contact_model_mpi/fsi_contact_model_mpi.prm")
    p.end_time = 3e-6
    p.fluid_dirichlet_bcs = {0: (1, [1.0]), 2: (3, [0.0, 0.0]),
                             3: (2, [0.0])}
    fluid_mesh = generators.subdivided_hyper_rectangle(
        [30, 10], [0.0, 0.0], [2.0, 1.0])
    solid_mesh = generators.subdivided_hyper_rectangle(
        [4, 4], [0.0, 0.0], [0.3, 0.3])
    solid_mesh.vertices = solid_mesh.vertices + np.array([0.85, 0.0])
    fluid = SCnsIM(fluid_mesh, p)
    solid = SharedLinearElasticity(solid_mesh, p)
    fsi = ControlVolumeFSI(fluid, solid, p)
    fsi.set_control_volume_boundary(0.5, 1.5)
    fsi.set_pressure_probe([0.25, 0.5])
    fsi.run(verbose=False)
    assert len(fsi.cv_history) == 3
    last = fsi.cv_history[-1]
    assert np.isfinite(list(last.values())).all()
    # the sound wave has not yet reached the CV inlet plane at t=3e-6
    # (c ~ 3.3e4, distance 0.5), so fluxes are still tiny transients
    assert abs(last["inlet_volume_flow"]) < 1.0
    assert last["present_KE"] >= 0
    import os
    assert os.path.exists("control_volume_analysis.csv")


def _leaflet_mpi_setup(p):
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
    flags = ((centers[:, 0] >= L / 4 - 2 * a) &
             (centers[:, 0] <= L / 4 + 3 * a) & (centers[:, 1] < H / 2))
    fluid_mesh = fluid_mesh.refine(flags)
    fluid = SCnsIM(fluid_mesh, p, bc=bv)
    solid_mesh = generators.subdivided_hyper_rectangle(
        [int(a / h), int(b / h)], [L / 4, 0.0], [a + L / 4, b])
    solid = SharedHyperElasticity(solid_mesh, p)
    return fluid, solid


def test_fsi_leaflet_mpi_truncated():
    """MPI-semantics leaflet (reference: tests/fsi_leaflet_mpi: SCnsIM Q1/Q1
    + SharedHyperElasticity, Dirichlet coupling, hanging-node fluid mesh),
    truncated for CI; reference asserts completion only."""
    p = AllParameters.from_file(
        f"{REF}/fsi_leaflet_mpi/fsi_leaflet_mpi.prm")
    p.end_time = 0.02
    fluid, solid = _leaflet_mpi_setup(p)
    fsi = MPIFSI(fluid, solid, p, use_dirichlet_bc=True)
    fsi.run(verbose=False)
    d = np.asarray(solid.current_displacement).reshape(-1, 2)
    assert np.isfinite(d).all()
    # the leaflet bends downstream
    assert 1e-5 < d[:, 0].max() < 0.5
    assert np.isfinite(fluid.velocity_part()).all()


def test_fsi_gravity_mpi_truncated():
    """MPI-semantics falling sphere with the InsIM + SharedHyperElasticity
    combination of tests/fsi_gravity_mpi (that test is 3D/500 steps; we run
    its 2D analog configuration for CI)."""
    from openifem_tpu.solvers.fluid import InsIM
    p = AllParameters.from_file(f"{REF}/fsi_gravity/fsi_gravity.prm")
    p.global_refinements = [1, 2]
    W, H, R, L = 2.0, 5.0, 0.125, 1.0
    fluid_mesh = generators.subdivided_hyper_rectangle(
        [8, 20], [0.0, 0.0], [W, -H])
    fluid = InsIM(fluid_mesh, p)
    solid = SharedHyperElasticity(generators.sphere([L, -L], R, dim=2), p)
    fsi = MPIFSI(fluid, solid, p, use_dirichlet_bc=True)
    fsi.run(verbose=False)
    d = np.asarray(solid.current_displacement).reshape(-1, 2)
    free_fall = 0.5 * 980.0 * p.end_time ** 2
    assert -1.5 * free_fall < d[:, 1].mean() < -0.05 * free_fall
    assert np.isfinite(fluid.velocity_part()).all()


def test_cv_surface_cutting_exact(tmp_path, monkeypatch):
    """The SurfaceCutter analog is exact for linear fields: cut planes that
    fall strictly inside cells, trapezoid flux quadrature and polygon
    volume fractions (reference: source/cv_fsi.cpp:6-160, 612-757)."""
    monkeypatch.chdir(tmp_path)
    from openifem_tpu.fsi.cv_fsi import ControlVolumeFSI
    import jax.numpy as jnp
    from openifem_tpu.config import real_dtype

    p = AllParameters.from_file(
        f"{REF}/fsi_contact_model_mpi/fsi_contact_model_mpi.prm")
    fluid_mesh = generators.subdivided_hyper_rectangle(
        [20, 10], [0.0, 0.0], [2.0, 1.0])
    solid_mesh = generators.subdivided_hyper_rectangle(
        [2, 2], [0.0, 0.0], [0.2, 0.2])
    solid_mesh.vertices = solid_mesh.vertices + np.array([0.9, 0.0])
    fluid = SCnsIM(fluid_mesh, p)
    solid = SharedLinearElasticity(solid_mesh, p)
    fsi = ControlVolumeFSI(fluid, solid, p)
    x_in, x_out = 0.37, 1.62   # strictly inside cells of width 0.1
    fsi.set_control_volume_boundary(x_in, x_out)
    solid.mesh = solid.mesh.refine_global(p.global_refinements[1])
    solid.setup()
    fluid.mesh = fluid.mesh.refine_global(p.global_refinements[0])
    fluid.setup()
    fsi._setup_coupling()

    # volume fractions: inlet cell keeps (0.4-0.37)/0.1 of its area
    assert fsi._cut_in is not None and len(fsi._cut_in["cells"]) == 10
    assert np.allclose(fsi._cut_in["frac"], 0.3, atol=1e-12)
    assert np.allclose(fsi._cut_out["frac"], 0.2, atol=1e-12)

    # synthetic linear solution u = (x + 2y, 0), p = 3x
    pts = np.asarray(fluid.u_space.node_points)
    u = np.zeros((len(pts), 2))
    u[:, 0] = pts[:, 0] + 2 * pts[:, 1]
    ppts = np.asarray(fluid.p_space.node_points)
    sol = np.concatenate([u.reshape(-1), 3 * ppts[:, 0]])
    sol = jnp.asarray(sol, dtype=real_dtype())

    ins = fsi._surface_integrals(fsi._cut_in, sol)
    # int_0^1 (x_in + 2y) dy = x_in + 1; int 3 x_in dy = 3 x_in
    assert abs(ins["volume_flow"] - (x_in + 1)) < 1e-12
    assert abs(ins["pressure_force"] - 3 * x_in) < 1e-12
    rho = p.fluid_rho
    # int rho (x+2y)^2 dy at x = x_in; the 2-point trapezoid rule (the
    # reference's cutter support-point quadrature) overestimates the convex
    # quadratic by rho * f'' * h^2 * H / 12 with f'' = 8
    mom = rho * (x_in ** 2 + 2 * x_in + 4.0 / 3.0)
    trap_err = rho * 8 * 0.1 ** 2 / 12
    assert abs(ins["momentum_flux"] - (mom + trap_err)) < 1e-12
    # friction work: mu * du_x/dx * u_x integrated (du_x/dx = 1)
    mu = p.viscosity
    assert abs(ins["rate_friction_work"] - mu * (x_in + 1)) < 1e-12


def test_cv_solid_boundary_trace(tmp_path, monkeypatch):
    """output_solid_boundary_vertices writes one trace file per step with
    deformed vertex positions and interpolated fluid pressure
    (reference: source/cv_fsi.cpp:1594-1634)."""
    monkeypatch.chdir(tmp_path)
    from openifem_tpu.fsi.cv_fsi import ControlVolumeFSI
    p = AllParameters.from_file(
        f"{REF}/fsi_contact_model_mpi/fsi_contact_model_mpi.prm")
    p.end_time = 2e-6
    fluid_mesh = generators.subdivided_hyper_rectangle(
        [20, 10], [0.0, 0.0], [2.0, 1.0])
    solid_mesh = generators.subdivided_hyper_rectangle(
        [2, 2], [0.0, 0.0], [0.3, 0.3])
    solid_mesh.vertices = solid_mesh.vertices + np.array([0.85, 0.2])
    fluid = SCnsIM(fluid_mesh, p)
    solid = SharedLinearElasticity(solid_mesh, p)
    fsi = ControlVolumeFSI(fluid, solid, p)
    fsi.set_control_volume_boundary(0.5, 1.5)
    fsi.set_output_solid_boundary(True)
    fsi.run(verbose=False)
    import os
    files = sorted(os.listdir("solid_trace"))
    assert len(files) == 2
    rows = open(f"solid_trace/{files[0]}").read().strip().split("\n")
    # 2x2 solid: 8 boundary vertices
    assert len(rows) == 8
    assert all(len(r.split()) == 4 for r in rows)


def test_cv_bernoulli_terms(tmp_path, monkeypatch):
    """Bernoulli contraction/jet decomposition along the glottis centerline
    (reference: source/cv_fsi.cpp:1245-1590)."""
    monkeypatch.chdir(tmp_path)
    from openifem_tpu.fsi.cv_fsi import ControlVolumeFSI
    p = AllParameters.from_file(
        f"{REF}/fsi_contact_model_mpi/fsi_contact_model_mpi.prm")
    p.end_time = 2e-6
    p.fluid_dirichlet_bcs = {0: (1, [1.0]), 2: (3, [0.0, 0.0])}
    fluid_mesh = generators.subdivided_hyper_rectangle(
        [20, 10], [0.0, 0.0], [2.0, 1.0])
    # half-space vocal-fold-like geometry: solid rises toward y_top = 1
    solid_mesh = generators.subdivided_hyper_rectangle(
        [3, 4], [0.0, 0.0], [0.3, 0.8])
    solid_mesh.vertices = solid_mesh.vertices + np.array([0.85, 0.0])
    fluid = SCnsIM(fluid_mesh, p)
    solid = SharedLinearElasticity(solid_mesh, p)
    fsi = ControlVolumeFSI(fluid, solid, p)
    fsi.set_control_volume_boundary([0.55, 1.45, 0.0, 1.0])
    fsi.run(verbose=False)
    last = fsi.cv_history[-1]
    # the streamline path follows the top wall; the (slightly deformed)
    # solid tip splits it
    assert 0.80 <= last["contraction_end_x"] <= 1.2
    assert last["contraction_end_x"] <= last["jet_start_x"] <= 1.2
    for k in ("rate_convection", "rate_pressure_grad", "acceleration",
              "rate_density", "rate_friction"):
        assert np.isfinite(last[f"{k}_contraction"])
        assert np.isfinite(last[f"{k}_jet"])
    assert len(fsi._path_cells) > 0


def _wall3d_setup(fluid_reps, solid_reps, n_steps):
    """fsi-wall-3D: 3D SCnsIM + SharedHypoElasticity (RKPM) + MPI::FSI
    (reference: tests/fsi-wall-3D/fsi-wall-3D.cpp:29-60 — channel flow
    driven by a 5e2 Neumann inlet against an elastic wall slab at z=2,
    with local fluid pre-refinement around the wall)."""
    from openifem_tpu.solvers.fluid.supg import SCnsIM
    from openifem_tpu.solvers.solid import SharedHypoElasticity

    p = AllParameters.from_file(f"{REF}/fsi-wall-3D/fsi-wall-3D.prm")
    p.end_time = n_steps * p.time_step
    fm = generators.subdivided_hyper_rectangle(fluid_reps, [0, 0, 0],
                                               [1, 1, 4])
    c = fm.cell_centers()
    fm = fm.refine((c[:, 2] >= 2) & (c[:, 2] <= 2.4))
    sm = generators.subdivided_hyper_rectangle(solid_reps, [0, 0, 0],
                                               [1, 1, 0.4])
    sm.vertices[:, 2] += 2.0
    fluid = SCnsIM(fm, p)
    solid = SharedHypoElasticity(sm, p, dx=1.0 / solid_reps[0], hdx=1.3)
    return MPIFSI(fluid, solid, p), fluid, solid


def test_fsi_wall_3d_truncated():
    """Truncated fsi-wall-3D: all three north-star components coupled in
    3D for 3 steps; fields finite, wall covered by the indicator, solid
    receives fluid traction."""
    fsi, fluid, solid = _wall3d_setup([4, 4, 16], [5, 5, 2], 3)
    fsi.run(verbose=False)
    u = np.asarray(fluid.present_solution)
    assert np.isfinite(u).all()
    assert np.abs(u[:fluid.n_u]).max() > 1.0       # inlet drives flow
    assert np.asarray(fluid.indicator).sum() > 0   # wall covered
    assert np.isfinite(np.asarray(solid.current_displacement)).all()
    assert np.abs(np.asarray(solid.fsi_stress_rows)).max() > 0


@pytest.mark.slow
def test_fsi_wall_3d_smoke():
    """fsi-wall-3D at half the reference resolution, 10 steps."""
    fsi, fluid, solid = _wall3d_setup([5, 5, 20], [10, 10, 4], 10)
    fsi.run(verbose=False)
    u = np.asarray(fluid.present_solution)
    assert np.isfinite(u).all()
    assert np.isfinite(np.asarray(solid.current_displacement)).all()
    assert np.asarray(fluid.indicator).sum() > 0


def test_mpi_fsi_restart_exactness():
    """MPIFSI.run loads the latest coordinated checkpoints at start and
    saves at `Save interval` (reference: source/mpi_fsi.cpp:1127-1133,
    1221-1225): a run interrupted at the save point and re-launched
    reproduces the uninterrupted run exactly."""
    def build(n_steps, p0=None):
        p = AllParameters.from_file(
            f"{REF}/fsi_contact_model_mpi/fsi_contact_model_mpi.prm")
        dt = p.time_step
        p.end_time = n_steps * dt
        p.save_interval = 2 * dt
        fluid_mesh = generators.subdivided_hyper_rectangle(
            [20, 10], [0.0, 0.0], [2.0, 1.0])
        solid_mesh = generators.subdivided_hyper_rectangle(
            [5, 5], [0.0, 0.0], [1.0, 1.02])
        solid_mesh.vertices = solid_mesh.vertices + np.array([0.25, 0.0])
        fluid = SCnsIM(fluid_mesh, p)
        solid = SharedLinearElasticity(solid_mesh, p)
        return MPIFSI(fluid, solid, p), fluid, solid

    fsi, fluid, solid = build(4)
    fsi.run(verbose=False)
    ref_u = np.asarray(fluid.present_solution)
    ref_d = np.asarray(solid.current_displacement)

    # interrupted: 2 steps (checkpoint saved at step 2), then restart
    import glob, os
    for f in glob.glob("*.checkpoint.npz"):
        os.remove(f)
    fsi1, fluid1, solid1 = build(2)
    fsi1.run(verbose=False)
    assert glob.glob("fluid-*.checkpoint.npz"), "no checkpoint saved"

    fsi2, fluid2, solid2 = build(4)
    fsi2.run(verbose=False)
    assert fsi2.time.get_timestep() == 4
    assert np.allclose(np.asarray(fluid2.present_solution), ref_u,
                       atol=1e-12)
    assert np.allclose(np.asarray(solid2.current_displacement), ref_d,
                       atol=1e-12)


def test_mpi_fsi_refine_during_run():
    """MPIFSI interface refinement at `Refinement interval` with solution
    transfer and coupling-table rebuild (reference:
    source/mpi_fsi.cpp:1024-1117, 1215-1220)."""
    p = AllParameters.from_file(
        f"{REF}/fsi_contact_model_mpi/fsi_contact_model_mpi.prm")
    dt = p.time_step
    p.end_time = 3 * dt
    p.refinement_interval = 2 * dt
    fluid_mesh = generators.subdivided_hyper_rectangle(
        [20, 10], [0.0, 0.0], [2.0, 1.0])
    solid_mesh = generators.subdivided_hyper_rectangle(
        [5, 5], [0.0, 0.0], [1.0, 1.02])
    solid_mesh.vertices = solid_mesh.vertices + np.array([0.25, 0.0])
    fluid = SCnsIM(fluid_mesh, p)
    solid = SharedLinearElasticity(solid_mesh, p)
    fsi = MPIFSI(fluid, solid, p)
    fsi.run(verbose=False)
    # initial x2 + interval refinement happened and the run survived them
    assert fluid.mesh.n_cells > 200          # refined beyond 20x10
    assert (np.asarray(fluid.mesh.level) > 0).any()
    u = np.asarray(fluid.present_solution)
    assert np.isfinite(u).all()
    assert np.asarray(fluid.indicator).sum() > 0  # coupling tables rebuilt


def test_fsi_rkpm_2d_truncated():
    """fsi-rkpm-rk4 (2D): SCnsIM + SharedHypoElasticity (RKPM) + MPI::FSI
    (reference: tests/fsi-rkpm-rk4/fsi-rkpm-rk4.cpp:107-144 — a 0.5 x 2
    elastic wall at x=2 in a 5 x 2 channel; the reference constructs the
    solver with dx=0.05, hdx=1.3 and runs with PML/body-force disabled),
    coarsened and truncated to 3 steps."""
    from openifem_tpu.solvers.fluid.supg import SCnsIM
    from openifem_tpu.solvers.solid import SharedHypoElasticity

    p = AllParameters.from_file(f"{REF}/fsi-rkpm-rk4/fsi-rkpm-rk4.prm")
    p.end_time = 3 * p.time_step
    fm = generators.subdivided_hyper_rectangle([30, 8], [0, 0], [5.0, 2.0])
    sm = generators.subdivided_hyper_rectangle([3, 12], [0, 0], [0.5, 2.0])
    sm.vertices[:, 0] += 2.0
    fluid = SCnsIM(fm, p)
    solid = SharedHypoElasticity(sm, p, dx=0.5 / 3, hdx=1.3)
    fsi = MPIFSI(fluid, solid, p)
    fsi.run(verbose=False)
    u = np.asarray(fluid.present_solution)
    assert np.isfinite(u).all()
    assert np.asarray(fluid.indicator).sum() > 0      # wall covered
    assert np.isfinite(np.asarray(solid.current_displacement)).all()


def test_mpi_fsi_restart_with_solid_refinement():
    """Restart when `Global refinements` includes a solid level: the solid
    mesh must be refined exactly once (load_checkpoint applies it), not
    once by run() and again by the load — previously the checkpoint
    vectors landed on a doubly-refined mesh."""
    def build(n_steps):
        p = AllParameters.from_file(
            f"{REF}/fsi_contact_model_mpi/fsi_contact_model_mpi.prm")
        dt = p.time_step
        p.end_time = n_steps * dt
        p.save_interval = 2 * dt
        p.global_refinements = [0, 1]
        fluid_mesh = generators.subdivided_hyper_rectangle(
            [20, 10], [0.0, 0.0], [2.0, 1.0])
        solid_mesh = generators.subdivided_hyper_rectangle(
            [3, 3], [0.0, 0.0], [1.0, 1.02])
        solid_mesh.vertices = solid_mesh.vertices + np.array([0.25, 0.0])
        fluid = SCnsIM(fluid_mesh, p)
        solid = SharedLinearElasticity(solid_mesh, p)
        return MPIFSI(fluid, solid, p), fluid, solid

    import glob
    import os
    for f in glob.glob("*.checkpoint.npz"):
        os.remove(f)
    fsi, fluid, solid = build(4)
    fsi.run(verbose=False)
    ref_d = np.asarray(solid.current_displacement)

    # interrupted at the step-2 save, then restarted
    for f in glob.glob("*.checkpoint.npz"):
        os.remove(f)
    fsi1, _, _ = build(2)
    fsi1.run(verbose=False)
    fsi2, fluid2, solid2 = build(4)
    fsi2.run(verbose=False)
    d2 = np.asarray(solid2.current_displacement)
    assert d2.shape == ref_d.shape
    assert np.abs(d2 - ref_d).max() < 1e-10 * max(1.0, np.abs(ref_d).max())


def test_mpi_fsi_partial_restart_is_loud():
    """A lone solid checkpoint without its fluid twin aborts (reference:
    unconditional AssertThrow, source/mpi_fsi.cpp:1130-1134) instead of
    silently starting fresh with advanced solid state."""
    import glob
    import os
    p = AllParameters.from_file(
        f"{REF}/fsi_contact_model_mpi/fsi_contact_model_mpi.prm")
    p.end_time = 2 * p.time_step
    p.save_interval = p.time_step
    fluid_mesh = generators.subdivided_hyper_rectangle(
        [10, 5], [0.0, 0.0], [2.0, 1.0])
    solid_mesh = generators.subdivided_hyper_rectangle(
        [3, 3], [0.0, 0.0], [1.0, 1.02])
    fluid = SCnsIM(fluid_mesh, p)
    solid = SharedLinearElasticity(solid_mesh, p)
    fsi = MPIFSI(fluid, solid, p)
    fsi.run(verbose=False)
    for f in glob.glob("fluid-*.checkpoint.npz"):
        os.remove(f)
    fluid2 = SCnsIM(generators.subdivided_hyper_rectangle(
        [10, 5], [0.0, 0.0], [2.0, 1.0]), p)
    solid2 = SharedLinearElasticity(generators.subdivided_hyper_rectangle(
        [3, 3], [0.0, 0.0], [1.0, 1.02]), p)
    fsi2 = MPIFSI(fluid2, solid2, p)
    with pytest.raises(RuntimeError, match="Inconsistent restart"):
        fsi2.run(verbose=False)
