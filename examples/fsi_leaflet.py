"""Runnable demo: the fsi_leaflet benchmark (2D flexible leaflet in channel
flow), mirroring the reference application main
(reference: tests/fsi_leaflet/fsi_leaflet.cpp).

Usage: python examples/fsi_leaflet.py [parameters.prm] [--steps N]
Outputs fluid-*.vtu / solid-*.vtu + .pvd collections for ParaView.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from openifem_tpu.fsi import FSI
from openifem_tpu.mesh import generators
from openifem_tpu.parameters import AllParameters
from openifem_tpu.solvers.fluid import InsIM
from openifem_tpu.solvers.solid import HyperElasticity

L, H, a, b, h, U = 4.0, 1.0, 0.1, 0.4, 0.05, 1.5


def inflow(points, component):
    out = np.zeros(len(points))
    if component == 0:
        m = np.abs(points[:, 0]) < 1e-10
        out[m] = U - 4 * U / (H * H) * (points[m, 1] - H / 2) ** 2
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prm", nargs="?", default=
                    "/root/reference/tests/fsi_leaflet/fsi_leaflet.prm")
    ap.add_argument("--steps", type=int, default=None)
    args = ap.parse_args()

    params = AllParameters.from_file(args.prm)
    if args.steps:
        params.end_time = args.steps * params.time_step

    fluid_mesh = generators.subdivided_hyper_rectangle(
        [int(L / h), int(H / h)], [0.0, 0.0], [L, H])
    centers = fluid_mesh.cell_centers()
    flags = ((centers[:, 0] >= L / 4 - a) & (centers[:, 0] <= L / 4 + 2 * a)
             & (centers[:, 1] < H / 2))
    fluid_mesh = fluid_mesh.refine(flags)

    fluid = InsIM(fluid_mesh, params, bc=inflow)
    solid = HyperElasticity(
        generators.subdivided_hyper_rectangle(
            [int(a / h), int(b / h)], [L / 4, 0.0], [a + L / 4, b]), params)
    fsi = FSI(fluid, solid, params, use_dirichlet_bc=True)
    fsi.run(verbose=True)
    fluid.output_results()
    solid.update_strain_and_stress()
    solid.output_results()
    fsi.timer.print_summary()
    fluid.timer.print_summary()
    d = np.asarray(solid.current_displacement).reshape(-1, 2)
    print(f"leaflet tip deflection: {d[:, 0].max():.5f}")


if __name__ == "__main__":
    main()
