"""ShellSolidSolver (flat shell, dim=2 / spacedim=3) validation.

The reference's shell solver (include/shell_solid_solver.h, an optional
libMesh wrapper exercised by tests/solid_shell_plate) is a STATIC flat-shell
solve.  We validate the native Mindlin membrane+plate formulation against
closed-form plate/bar solutions instead of the library goldens:
 - clamped square plate, uniform pressure: Kirchhoff center deflection
   w_c = 0.00126 q a^4 / D, D = E t^3 / (12 (1 - nu^2))
 - axial bar (nu=0): tip displacement u = f a^2 / (2 E t)
"""

import numpy as np

from openifem_tpu.mesh import generators
from openifem_tpu.parameters import AllParameters
from openifem_tpu.solvers.solid import ShellSolidSolver


def _params(E, nu, bcs):
    p = AllParameters()
    p.E = [E]
    p.nu = [nu]
    p.solid_degree = 1
    p.solid_dirichlet_bcs = bcs
    return p


def test_shell_clamped_plate_uniform_pressure():
    E, nu, t, a, q = 1.0e4, 0.3, 0.02, 1.0, 1.0
    mesh = generators.subdivided_hyper_rectangle([16, 16], [0, 0], [a, a])
    # clamp all four edges (flag 7 = all components)
    p = _params(E, nu, {0: 7, 1: 7, 2: 7, 3: 7})
    shell = ShellSolidSolver(mesh, p, thickness=t)
    shell.set_surface_load(lambda pts: np.tile([0.0, 0.0, q], (len(pts), 1)))
    shell.run()
    disp = np.asarray(shell.get_current_solution()).reshape(-1, 3)
    w_c = disp[:, 2].max()
    D = E * t ** 3 / (12 * (1 - nu ** 2))
    w_ref = 0.00126 * q * a ** 4 / D
    assert abs(w_c - w_ref) / w_ref < 0.04, (w_c, w_ref)
    # in-plane displacements vanish for pure bending of a flat plate
    assert np.abs(disp[:, :2]).max() < 1e-10 * w_c + 1e-14


def test_shell_membrane_axial_bar():
    # nu = 0 decouples plane stress into 1D: E t u'' = -f, u(0)=0, free tip:
    # u(a) = f a^2 / (2 E t)
    E, nu, t, a, f = 1.0e4, 0.0, 0.05, 1.0, 2.0
    mesh = generators.subdivided_hyper_rectangle([16, 4], [0, 0], [a, 0.25])
    p = _params(E, nu, {0: 7})  # clamp left edge only
    shell = ShellSolidSolver(mesh, p, thickness=t)
    shell.set_surface_load(lambda pts: np.tile([f, 0.0, 0.0], (len(pts), 1)))
    shell.run()
    disp = np.asarray(shell.get_current_solution()).reshape(-1, 3)
    u_tip = disp[:, 0].max()
    u_ref = f * a ** 2 / (2 * E * t)
    assert abs(u_tip - u_ref) / u_ref < 0.02, (u_tip, u_ref)
    assert np.abs(disp[:, 2]).max() < 1e-10 * u_tip + 1e-14
