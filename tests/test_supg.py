"""SUPG/SCnsIM solver regression tests against reference goldens."""

import numpy as np
import pytest

from openifem_tpu.mesh import generators
from openifem_tpu.parameters import AllParameters
from openifem_tpu.solvers.fluid.supg import SCnsIM, SUPGInsIM

REF = "/root/reference/tests"


def test_plane_wall_driven_supg():
    """Impulsively started moving wall, Q1/Q1 SUPG: ||v||_2 = 4.7112
    (reference: tests/fluid_plane_wall_driven_mpi_insim_supg/...cpp:46-50,
    rtol 1e-3; we match to ~4e-7)."""
    p = AllParameters.from_file(
        f"{REF}/fluid_plane_wall_driven_mpi_insim_supg/"
        "fluid_plane_wall_driven_mpi_insim_supg.prm")
    L, D, d, l = 2.0, 0.4, 0.025, 0.1
    mesh = generators.subdivided_hyper_rectangle(
        [int(L / l), int(D / d)], [0.0, 0.0], [L, D])
    f = SUPGInsIM(mesh, p)
    f.run(verbose=False)
    l2 = float(np.linalg.norm(f.velocity_part()))
    assert abs(l2 - 4.7112) / 4.7112 < 1e-3


@pytest.mark.slow
def test_pressure_driven_supg():
    """Poiseuille with Q1/Q1 SUPG: vmax within 2e-2, 30th-largest velocity
    dof within 1e-3 of 2.5e-2 (reference:
    tests/fluid_pressure_driven_mpi_insim_supg/...cpp:40-57)."""
    p = AllParameters.from_file(
        f"{REF}/fluid_pressure_driven_mpi_insim_supg/"
        "fluid_pressure_driven_mpi_insim_supg.prm")
    mesh = generators.subdivided_hyper_rectangle(
        [100, 10], [0.0, 0.0], [2.0, 0.2])
    f = SUPGInsIM(mesh, p)
    f.run(verbose=False)
    v = np.sort(f.velocity_part())
    assert abs(v[-1] - 2.5e-2) / 2.5e-2 < 2e-2
    assert abs(v[-30] - 2.5e-2) / 2.5e-2 < 1e-3


def test_scnsim_f32_matrix_matches_reference_path():
    """The f32 Jacobian-apply flag leaves the converged SUPG Newton
    solution unchanged (the f64 assembled residual gates convergence)."""
    import numpy as np
    from openifem_tpu.mesh import generators
    from openifem_tpu.parameters import AllParameters
    from openifem_tpu.solvers.fluid.supg import SCnsIM

    p = AllParameters.from_file(
        "/root/reference/tests/fluid_plane_wall_driven_mpi_insim_supg/"
        "fluid_plane_wall_driven_mpi_insim_supg.prm")
    p.end_time = 3 * p.time_step

    def run(fast):
        class F(SCnsIM):
            mixed_precision_precond = fast
            f32_matrix = fast
        mesh = generators.subdivided_hyper_rectangle(
            [10, 8], [0.0, 0.0], [2.0, 0.4])
        f = F(mesh, p)
        f.run(verbose=False)
        return np.asarray(f.present_solution)

    ref = run(False)
    fast = run(True)
    scale = max(1.0, float(np.abs(ref).max()))
    assert np.abs(fast - ref).max() < 1e-6 * scale
