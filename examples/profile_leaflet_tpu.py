"""Decompose where the fsi_leaflet coupled-step wall time goes on the TPU.

Builds the exact bench configuration (bench.py::bench_fsi_leaflet), runs a
few coupled steps, then times each jitted piece in isolation:
  coupled step | fluid Newton loop | one Newton iter | assembly |
  preconditioner apply | A-block matvec | solid Newton | coupling kernels.

Usage: PYTHONPATH=. python examples/profile_leaflet_tpu.py [n_timed]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from openifem_tpu.fsi.fsi import FSI
from openifem_tpu.mesh import generators
from openifem_tpu.parameters import AllParameters
from openifem_tpu.solvers.fluid import InsIM
from openifem_tpu.solvers.solid import HyperElasticity


import os


class BenchInsIM(InsIM):
    mixed_precision_precond = True
    mp_sm_rtol = 1e-1
    f32_matrix = True
    newton_forcing = (1e-4, 0.5)
    a_inner_rtol = float(os.environ.get("PROF_A_RTOL", "1e-2"))
    f32_outer = os.environ.get("PROF_F32_OUTER", "0") == "1"
    dense_precond = os.environ.get("PROF_DENSE", "0") == "1"
    dense_a_bf16 = os.environ.get("PROF_DENSE_BF16", "0") == "1"


def build():
    p = AllParameters.from_file(
        "/root/reference/tests/fsi_leaflet/fsi_leaflet.prm")
    L, H, a, b, h, U = 4.0, 1.0, 0.1, 0.4, 0.05, 1.5

    def bv(points, component):
        out = np.zeros(len(points))
        if component == 0:
            m = np.abs(points[:, 0]) < 1e-10
            out[m] = U - 4 * U / (H * H) * (points[m, 1] - H / 2) ** 2
        return out

    p.output_interval = 1e9
    fluid_mesh = generators.subdivided_hyper_rectangle(
        [int(L / h), int(H / h)], [0.0, 0.0], [L, H])
    centers = fluid_mesh.cell_centers()
    flags = ((centers[:, 0] >= L / 4 - a) & (centers[:, 0] <= L / 4 + 2 * a)
             & (centers[:, 1] < H / 2))
    fluid_mesh = fluid_mesh.refine(flags)
    fluid = BenchInsIM(fluid_mesh, p, bc=bv)
    solid_mesh = generators.subdivided_hyper_rectangle(
        [int(a / h), int(b / h)], [L / 4, 0.0], [a + L / 4, b])
    solid = HyperElasticity(solid_mesh, p)
    p.end_time = 100.0
    fsi = FSI(fluid, solid, p, use_dirichlet_bc=True)
    solid.mesh = solid.mesh.refine_global(p.global_refinements[1])
    solid.setup()
    fluid.mesh = fluid.mesh.refine_global(p.global_refinements[0])
    fluid.setup()
    fsi._setup_coupling()
    return fsi, fluid, solid


def timeit(label, fn, n=5):
    fn()  # compile / warm
    jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1e3
    print(f"{label:42s} {dt:10.2f} ms", flush=True)
    return dt


def main():
    fsi, fluid, solid = build()
    print(f"fluid dofs={fluid.n_dofs} cells={fluid.mesh.n_cells} "
          f"solid dofs={solid.n_dofs}", flush=True)

    # advance a few steps through the real loop so the state is typical
    first = True
    for step in range(3):
        t0 = time.time()
        if first:
            fsi.find_solid_bc()
            solid.run_one_step(True)
            fsi.update_solid_box_and_indicator()
            zero_ext, nonzero_ext = fsi.find_fluid_bc(True)
            fsi._run_fluid_step(zero_ext, nonzero_ext, verbose=False)
            first = False
        else:
            fsi.run_one_coupled_step(verbose=False)
        fsi.time.increment()
        print(f"step {step}: {time.time() - t0:.2f} s", flush=True)

    # timed coupled steps (post-compile)
    t0 = time.time()
    n_timed = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    for _ in range(n_timed):
        fsi.run_one_coupled_step(verbose=False)
        fsi.time.increment()
    per = (time.time() - t0) / n_timed * 1e3
    print(f"coupled step (end-to-end incl host)      {per:10.2f} ms",
          flush=True)

    # --- pieces ---
    step_fn = fsi._coupled_step
    stress_nodal = jnp.zeros((fluid.u_space.n_nodes, fluid.dim, fluid.dim),
                             dtype=fluid.present_solution.dtype)
    args = (solid.current_displacement, solid.current_velocity,
            solid.current_acceleration, fluid.present_solution,
            fluid.stress_device, stress_nodal)
    timeit("coupled step (device dispatch only)", lambda: step_fn(*args),
           n=3)

    k = fsi._kernels
    moved = fsi._solid_moved_verts()
    timeit("  solid_traction kernel", lambda: k.solid_traction(
        moved, fluid.present_solution, fluid.stress_device))
    trhs = solid._fsi_traction_rhs_impl(k.solid_traction(
        moved, fluid.present_solution, fluid.stress_device))
    dev_step = jax.jit(solid._device_step_impl)
    timeit("  solid Newton (device_step_impl)", lambda: dev_step(
        solid.current_displacement, solid.current_velocity,
        solid.current_acceleration, trhs))
    timeit("  indicator kernel", lambda: k.indicator(moved))
    timeit("  dirichlet_bc kernel", lambda: k.dirichlet_bc(
        moved, solid.current_velocity))

    # fluid: one full Newton solve loop via make_fsi_step
    if getattr(fsi, "_fluid_step_mesh", None) is not fluid.mesh:
        fsi._fluid_step_fn = fluid.make_fsi_step()
        fsi._fluid_step_mesh = fluid.mesh
    ffn = fsi._fluid_step_fn
    indicator = fluid.indicator
    acc_nodal = jnp.zeros((fluid.u_space.n_nodes, fluid.dim),
                          dtype=fluid.present_solution.dtype)
    zc = fluid.zero_constraints
    fluid_args = (fluid.present_solution, indicator,
                  jnp.zeros((fluid.mesh.n_cells, fluid.dim),
                            dtype=fluid.present_solution.dtype),
                  jnp.zeros_like(fluid.fsi_stress_cell), acc_nodal,
                  zc, zc, fluid.u_constraints, fluid.p_constraints)
    timeit("fluid Newton loop (make_fsi_step)",
           lambda: ffn(*fluid_args), n=3)

    # single Newton iteration
    ev = fluid.present_solution
    timeit("  one Newton iter (jit _newton_iter)", lambda: fluid._newton_iter(
        ev, fluid.present_solution, indicator, fluid.fsi_acceleration,
        fluid.fsi_stress_cell, acc_nodal, zc, fluid.u_constraints,
        fluid.p_constraints), n=3)

    # assembly only
    asm = jax.jit(fluid._assemble)
    timeit("  assembly", lambda: asm(
        ev, fluid.present_solution, indicator, fluid.fsi_acceleration,
        fluid.fsi_stress_cell, acc_nodal))

    A_loc, rhs = asm(ev, fluid.present_solution, indicator,
                     fluid.fsi_acceleration, fluid.fsi_stress_cell,
                     acc_nodal)

    # one preconditioner apply
    @jax.jit
    def papply(A_loc, b):
        pre = fluid._make_preconditioner(A_loc, fluid.u_constraints,
                                         fluid.p_constraints)
        return pre(b)

    b = zc.condense_rhs(rhs)
    timeit("  preconditioner apply (1 vmult)", lambda: papply(A_loc, b))


    # decompose one preconditioner apply: Mp CG / Sm CG / A-inner FGMRES
    pb = (b / jnp.linalg.norm(b)).astype(jnp.float32)

    @jax.jit
    def stats(A_loc, v):
        pre = fluid._make_preconditioner(A_loc, fluid.u_constraints,
                                         fluid.p_constraints)
        return pre.stats(v)

    out, (mp_i, sm_i, a_i) = stats(A_loc, pb)
    print(f"    inner iters: mp={int(mp_i)} sm={int(sm_i)} a={int(a_i)}",
          flush=True)

    @jax.jit
    def papply2(A_loc, v):
        pre = fluid._make_preconditioner(A_loc, fluid.u_constraints,
                                         fluid.p_constraints)
        return pre(pre(v))

    t1 = timeit("  precond build+1 apply", lambda: papply(A_loc, b), n=5)
    t2 = timeit("  precond build+2 applies", lambda: papply2(A_loc, pb), n=5)
    print(f"    -> apply-only ~{t2 - t1:.1f} ms, build-only "
          f"~{2 * t1 - t2:.1f} ms", flush=True)

    # one A-block matvec
    from openifem_tpu.la.operators import element_matvec_nodeblock
    d = fluid.dim
    nlu = fluid.nu_loc // d
    Auu = A_loc[:, :fluid.nu_loc, :fluid.nu_loc].astype(jnp.float32)
    Auu_b = Auu.reshape(fluid.mesh.n_cells, nlu, d, nlu, d)
    xu = jnp.asarray(np.random.rand(fluid.n_u), dtype=jnp.float32)

    @jax.jit
    def amv(x):
        return element_matvec_nodeblock(Auu_b, fluid.cell_nodes_u,
                                        fluid.n_u // d, x)

    timeit("  A-block matvec (f32 nodeblock)", lambda: amv(xu), n=20)

    # full-system matvec in f64
    A64 = A_loc
    from openifem_tpu.la.operators import element_matvec_taylor_hood

    @jax.jit
    def fmv(x):
        return element_matvec_taylor_hood(
            A64, fluid.cell_nodes_u, fluid.cell_dofs_p, nlu, d,
            fluid.n_u, fluid.n_p, x)

    xf = jnp.asarray(np.random.rand(fluid.n_dofs))
    timeit("  full system matvec (f64)", lambda: fmv(xf), n=20)


if __name__ == "__main__":
    main()
