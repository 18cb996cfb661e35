"""Vocal-fold-style turbulent control-volume FSI (half-space model).

The reference's flagship application (SURVEY.md section 2.6): a slightly
compressible SUPG fluid (SCnsIM) with a Spalart-Allmaras RANS model and
wall functions, coupled to a linear-elastic fold via the MPI-semantics
immersed coupler, with per-step control-volume budgets (exact surface
cutting), Bernoulli contraction/jet decomposition along the glottis
centerline, penalty contact against the centerline, and the solid
boundary trace dump.

Run: python examples/vocal_fold_cv.py [n_steps]
"""

import sys

import numpy as np

from openifem_tpu.fsi.cv_fsi import ControlVolumeFSI
from openifem_tpu.mesh import generators
from openifem_tpu.parameters import AllParameters
from openifem_tpu.solvers.fluid import SCnsIM
from openifem_tpu.solvers.solid.shared import SharedLinearElasticity
from openifem_tpu.solvers.turbulence import make_turbulence_model

n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3

p = AllParameters.from_file(
    "/root/reference/tests/fsi_contact_model_mpi/fsi_contact_model_mpi.prm")
p.end_time = n_steps * p.time_step
p.fluid_dirichlet_bcs = {0: (1, [5.0]), 2: (3, [0.0, 0.0])}
p.n_spalart_allmaras_model_bcs = 3
p.spalart_allmaras_model_bcs = {0: 1, 2: 0, 3: 0}
p.spalart_allmaras_initial_condition_coefficient = 3.0

L, H = 2.0, 1.0  # half-glottis channel; y = H is the symmetry centerline
fluid_mesh = generators.subdivided_hyper_rectangle(
    [40, 20], [0.0, 0.0], [L, H])
# the fold: rises from the bottom wall toward the centerline
solid_mesh = generators.subdivided_hyper_rectangle(
    [4, 8], [0.0, 0.0], [0.3, 0.9])
solid_mesh.vertices = solid_mesh.vertices + np.array([0.85, 0.0])

fluid = SCnsIM(fluid_mesh, p)
sa = make_turbulence_model("Spalart-Allmaras", fluid)
solid = SharedLinearElasticity(solid_mesh, p)

fsi = ControlVolumeFSI(fluid, solid, p)
fsi.set_control_volume_boundary([0.55, 1.45, 0.0, H])
fsi.set_pressure_probe([0.25, 0.5])
fsi.set_output_solid_boundary(True)
# contact against the centerline (penalty redo, reference semantics)
fsi.set_penetration_criterion(lambda pts: pts[:, 1] - H,
                              np.array([0.0, -1.0]))
fsi.run(verbose=True)

last = fsi.cv_history[-1]
print("\ncontrol-volume summary at t =", last["time"])
for k in ("inlet_volume_flow", "outlet_volume_flow", "present_KE",
          "rate_dissipation", "rate_turbulence", "gap_volume_flow",
          "contraction_end_x", "jet_start_x", "probed_pressure"):
    print(f"  {k:24s} {last.get(k, float('nan')): .6e}")
print("shear velocities: max", float(np.max(fsi.shear_velocities)))
print("wrote control_volume_analysis.csv and solid_trace/")
