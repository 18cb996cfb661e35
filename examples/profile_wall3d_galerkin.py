"""Wall3d Tpp preconditioner with GalerkinMG vs frozen-Laplacian vs diag:
vmult time + inner iteration count + one full Newton iteration.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u examples/profile_wall3d_galerkin.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from openifem_tpu.mesh import generators
from openifem_tpu.parameters import AllParameters
from openifem_tpu.solvers.fluid.supg import SCnsIM
from openifem_tpu.config import real_dtype


class BenchSCnsIM(SCnsIM):
    mixed_precision_precond = True
    f32_matrix = True
    newton_forcing = (1e-4, 0.5)


def main():
    p = AllParameters.from_file(
        "/root/reference/tests/fsi-wall-3D/fsi-wall-3D.prm")
    p.output_interval = 1e9
    p.end_time = 1e9
    fluid_reps = [10, 10, 40]
    base = generators.subdivided_hyper_rectangle(
        [r // 2 for r in fluid_reps], [0, 0, 0], [1, 1, 4])
    mid = generators.subdivided_hyper_rectangle(fluid_reps, [0, 0, 0],
                                                [1, 1, 4])
    c = mid.cell_centers()
    fm = mid.refine((c[:, 2] >= 2) & (c[:, 2] <= 2.4))
    fluid = BenchSCnsIM(fm, p)
    t0 = time.time()
    fluid.setup()
    print(f"setup {time.time()-t0:.0f} s dofs={fluid.n_dofs}", flush=True)

    rdt = real_dtype()
    eddy = jnp.zeros(fluid.u_space.n_nodes, dtype=rdt)
    fan = jnp.zeros((fluid.u_space.n_nodes, fluid.dim), dtype=rdt)
    fsn = jnp.zeros((fluid.u_space.n_nodes, fluid.dim, fluid.dim),
                    dtype=rdt)
    ev = fluid.nonzero_constraints.apply_increment(fluid.present_solution)
    asm = jax.jit(fluid._assemble)
    args = (ev, fluid.present_solution, fluid.indicator, fan, fsn,
            fluid.stress_device, eddy)
    A_loc, rhs = asm(*args)
    jax.block_until_ready(A_loc)
    b = fluid.zero_constraints.condense_rhs(rhs)
    bn = b / jnp.linalg.norm(b)

    def probe(label):
        pre = fluid._make_preconditioner(A_loc, fluid.u_constraints,
                                         fluid.p_constraints)
        ps = jax.jit(pre.stats)
        out, it = ps(bn)
        jax.block_until_ready(out)
        t0 = time.time()
        out, it = ps(bn)
        jax.block_until_ready(out)
        dt = (time.time() - t0) * 1e3
        print(f"{label:40s} vmult {dt:8.1f} ms  inner {int(it)}",
              flush=True)
        # full Newton iteration
        ni = jax.jit(fluid._newton_iter_impl)
        nargs = args + (fluid.zero_constraints, fluid.u_constraints,
                        fluid.p_constraints)
        du, rn, outer, gres = ni(*nargs)
        jax.block_until_ready(du)
        t0 = time.time()
        du, rn, outer, gres = jax.block_until_ready(ni(*nargs))[:4]
        dt = (time.time() - t0)
        print(f"  newton iter {dt:6.2f} s outer {int(outer)} "
              f"gres {float(gres):.2e}", flush=True)

    t0 = time.time()
    fluid.enable_pressure_mg([base, mid, fm], galerkin=True)
    print(f"galerkin mg setup {time.time()-t0:.1f} s", flush=True)
    probe("GalerkinMG [base, mid, fm]")

    t0 = time.time()
    fluid.enable_pressure_mg([base, fm], galerkin=True)
    print(f"galerkin mg setup {time.time()-t0:.1f} s", flush=True)
    probe("GalerkinMG [base, fm]")

    fluid.enable_pressure_mg([base, mid, fm], galerkin=False,
                             fixed_prefix=False)
    probe("Laplacian GeometricMG [base, mid, fm]")

    fluid._pressure_mg = None
    probe("B2pp diagonal")


if __name__ == "__main__":
    main()
