"""Decompose the full-res fsi-wall-3D coupled-step wall time on the TPU.

Same decomposition idea as profile_leaflet_tpu.py, for the 3D stack:
SCnsIM (SUPG family) fluid + SharedHypoElasticity (RKPM) solid + MPIFSI
fused coupled step (bench.py::bench_fsi_wall_3d configuration).

Usage: PYTHONPATH=. python examples/profile_wall3d_tpu.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from openifem_tpu.fsi.mpi_fsi import MPIFSI
from openifem_tpu.mesh import generators
from openifem_tpu.parameters import AllParameters
from openifem_tpu.solvers.fluid.supg import SCnsIM
from openifem_tpu.solvers.solid import SharedHypoElasticity
from openifem_tpu.config import real_dtype


import os


class BenchSCnsIM(SCnsIM):
    mixed_precision_precond = True
    f32_matrix = True
    newton_forcing = (1e-4, 0.5)
    f32_outer = os.environ.get("PROF_F32_OUTER", "0") == "1"
    dense_precond = os.environ.get("PROF_DENSE", "0") == "1"


class BenchHypo(SharedHypoElasticity):
    f32_rates = os.environ.get("PROF_F32_RATES", "0") == "1"


def build():
    p = AllParameters.from_file(
        "/root/reference/tests/fsi-wall-3D/fsi-wall-3D.prm")
    p.output_interval = 1e9
    p.end_time = 1e9
    fluid_reps, solid_reps, dx = [10, 10, 40], [20, 20, 8], 0.05
    base = generators.subdivided_hyper_rectangle(
        [r // 2 for r in fluid_reps], [0, 0, 0], [1, 1, 4])
    fm = generators.subdivided_hyper_rectangle(fluid_reps, [0, 0, 0],
                                               [1, 1, 4])
    c = fm.cell_centers()
    fm = fm.refine((c[:, 2] >= 2) & (c[:, 2] <= 2.4))
    sm = generators.subdivided_hyper_rectangle(solid_reps, [0, 0, 0],
                                               [1, 1, 0.4])
    sm.vertices[:, 2] += 2.0
    fluid = BenchSCnsIM(fm, p)
    solid = BenchHypo(sm, p, dx=dx, hdx=1.3)
    fsi = MPIFSI(fluid, solid, p)
    if os.environ.get("PROF_DENSE", "0") != "1":
        fsi.fluid_mg_base = [base]
    return fsi, fluid, solid


def timeit(label, fn, n=3):
    jax.block_until_ready(fn())   # compile/warm
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1e3
    print(f"{label:44s} {dt:10.2f} ms", flush=True)
    return dt


def main():
    t0 = time.time()
    fsi, fluid, solid = build()

    # setup as MPIFSI.run does (global refinements are 0,0 in the prm)
    solid.setup()
    fluid.setup()
    fsi._enable_fluid_mg()
    fsi._setup_coupling()
    print(f"build+setup: {time.time()-t0:.1f} s  fluid dofs={fluid.n_dofs} "
          f"cells={fluid.mesh.n_cells} solid dofs={solid.n_dofs}",
          flush=True)

    # first step on the host path, then fused steps
    t0 = time.time()
    fsi.find_solid_bc()
    solid.run_one_step(True)
    fsi.update_solid_box_and_indicator()
    zero_ext, nonzero_ext = fsi.find_fluid_bc(True)
    fsi._run_fluid_step(zero_ext, nonzero_ext, False)
    fsi.time.increment()
    print(f"first (host) step: {time.time()-t0:.1f} s", flush=True)

    for i in range(2):
        t0 = time.time()
        fsi.run_one_coupled_step(verbose=False)
        fsi.time.increment()
        print(f"coupled step {i}: {time.time()-t0:.1f} s", flush=True)

    step_fn = fsi._coupled_step
    args = (solid.x, solid.v, solid.sigma, fluid.present_solution,
            fluid.stress_device)
    timeit("coupled step (device dispatch)", lambda: step_fn(*args), n=2)

    k = fsi._mpi_kernels
    s_disp = (solid.x - jnp.asarray(solid.mesh.vertices,
                                    dtype=real_dtype())).reshape(-1)
    timeit("  solid_bc_rows", lambda: k.solid_bc_rows(
        s_disp, fluid.present_solution, fluid.stress_device))
    rows, _, _ = k.solid_bc_rows(s_disp, fluid.present_solution,
                                 fluid.stress_device)
    dev = jax.jit(solid._device_step_impl)
    timeit("  solid RKPM RK4 step", lambda: dev(
        solid.x, solid.v, solid.sigma, rows.astype(real_dtype())))
    x2, v2, sig2, a2 = dev(solid.x, solid.v, solid.sigma,
                           rows.astype(real_dtype()))
    timeit("  indicator_all_vertices", lambda: k.indicator_all_vertices(x2))
    indicator = k.indicator_all_vertices(x2).astype(real_dtype())
    nstress = jax.jit(solid._nodal_stress_impl)
    timeit("  solid nodal stress", lambda: nstress(sig2))
    ssn = nstress(sig2)
    timeit("  fsi_stress_nodal", lambda: k.fsi_stress_nodal(
        x2, fluid.stress_device, ssn, indicator))
    fsn = k.fsi_stress_nodal(x2, fluid.stress_device, ssn, indicator)
    timeit("  fsi_acc_nodal", lambda: k.fsi_acc_nodal(
        x2, fluid.present_solution, v2.reshape(-1), a2.reshape(-1),
        indicator))
    fan = k.fsi_acc_nodal(x2, fluid.present_solution, v2.reshape(-1),
                          a2.reshape(-1), indicator)

    # fluid: full Newton loop
    ffn = fluid.make_fsi_step()
    eddy = jnp.zeros(fluid.u_space.n_nodes, dtype=real_dtype())
    zc = fluid.zero_constraints
    fargs = (fluid.present_solution, indicator, fan, fsn,
             fluid.stress_device, eddy, zc, zc, fluid.u_constraints,
             fluid.p_constraints)
    timeit("fluid SUPG Newton loop (make_fsi_step)",
           lambda: ffn(*fargs), n=2)

    # single Newton iteration + assembly + precond apply
    ev = fluid.present_solution
    ni = jax.jit(fluid._newton_iter_impl)
    timeit("  one Newton iter", lambda: ni(
        ev, fluid.present_solution, indicator, fan, fsn,
        fluid.stress_device, eddy, zc, fluid.u_constraints,
        fluid.p_constraints), n=2)
    asm = jax.jit(fluid._assemble)
    timeit("  assembly", lambda: asm(
        ev, fluid.present_solution, indicator, fan, fsn,
        fluid.stress_device, eddy))
    A_loc, rhs = asm(ev, fluid.present_solution, indicator, fan, fsn,
                     fluid.stress_device, eddy)

    @jax.jit
    def papply(A_loc, b):
        pre = fluid._make_preconditioner(A_loc, fluid.u_constraints,
                                         fluid.p_constraints)
        return pre(b)

    b = zc.condense_rhs(rhs)
    timeit("  Tpp preconditioner apply (1 vmult)", lambda: papply(A_loc, b))

    # iteration telemetry
    pre = fluid._make_preconditioner(A_loc, fluid.u_constraints,
                                     fluid.p_constraints)
    _, stats = pre.stats(b / jnp.linalg.norm(b))
    print("  precond inner iters (one apply):",
          [int(s) for s in stats], flush=True)
    du, rn, outer, _ = ni(ev, fluid.present_solution, indicator, fan, fsn,
                          fluid.stress_device, eddy, zc,
                          fluid.u_constraints, fluid.p_constraints)
    print(f"  outer fgmres iters: {int(outer)}", flush=True)


if __name__ == "__main__":
    main()
