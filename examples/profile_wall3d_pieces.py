"""Time the wall3d SUPG preconditioner INTERNALS on TPU at the initial
state (no warmup steps needed for cost structure): V-cycle apply, Tpp
matvec, inner-fgmres solve, full vmult, plus the inner iteration count.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u examples/profile_wall3d_pieces.py
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
from openifem_tpu.la.krylov import fgmres


class BenchSCnsIM(SCnsIM):
    mixed_precision_precond = True
    f32_matrix = True
    newton_forcing = (1e-4, 0.5)


def timeit(label, fn, n=5):
    jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1e3
    print(f"{label:44s} {dt:10.3f} ms", flush=True)
    return dt


def main():
    p = AllParameters.from_file(
        "/root/reference/tests/fsi-wall-3D/fsi-wall-3D.prm")
    p.output_interval = 1e9
    p.end_time = 1e9
    fluid_reps = [10, 10, 40]
    base = generators.subdivided_hyper_rectangle(
        [r // 2 for r in fluid_reps], [0, 0, 0], [1, 1, 4])
    fm = generators.subdivided_hyper_rectangle(fluid_reps, [0, 0, 0],
                                               [1, 1, 4])
    c = fm.cell_centers()
    fm = fm.refine((c[:, 2] >= 2) & (c[:, 2] <= 2.4))
    fluid = BenchSCnsIM(fm, p)
    t0 = time.time()
    fluid.setup()
    fluid.enable_pressure_mg([base, fm], fixed_prefix=False)
    print(f"fluid setup: {time.time()-t0:.1f} s  dofs={fluid.n_dofs} "
          f"n_u={fluid.n_u} n_p={fluid.n_p} cells={fm.n_cells}", flush=True)

    rdt = real_dtype()
    eddy = jnp.zeros(fluid.u_space.n_nodes, dtype=rdt)
    fan = jnp.zeros((fluid.u_space.n_nodes, fluid.dim), dtype=rdt)
    fsn = jnp.zeros((fluid.u_space.n_nodes, fluid.dim, fluid.dim),
                    dtype=rdt)
    ev = fluid.nonzero_constraints.apply_increment(fluid.present_solution)
    asm = jax.jit(fluid._assemble)
    args = (ev, fluid.present_solution, fluid.indicator, fan, fsn,
            fluid.stress_device, eddy)
    timeit("assembly", lambda: asm(*args), n=3)
    A_loc, rhs = asm(*args)
    b = fluid.zero_constraints.condense_rhs(rhs)
    bn = b / jnp.linalg.norm(b)

    pre = fluid._make_preconditioner(A_loc, fluid.u_constraints,
                                     fluid.p_constraints)
    papply = jax.jit(pre)
    timeit("preconditioner vmult", lambda: papply(bn))
    pstats = jax.jit(pre.stats)
    _, tpp_iters = pstats(bn)
    print(f"  tpp inner gmres iters (one apply): {int(tpp_iters)}",
          flush=True)

    # pieces: rebuild the same closures the preconditioner uses
    pdt = jnp.float32
    mg = fluid._pressure_mg
    vp = bn[fluid.n_u:].astype(pdt)
    vcycle = jax.jit(mg.vcycle)
    timeit("  pressure V-cycle apply", lambda: vcycle(vp), n=10)

    # Tpp matvec = App + Apv Pvv^-1 Avp
    from openifem_tpu.la.operators import (element_matvec,
                                           element_matvec_rect)
    A32 = A_loc.astype(pdt)
    App = A32[:, fluid.nu_loc:, fluid.nu_loc:]
    op_App = jax.jit(lambda x: element_matvec(
        App, fluid.cell_dofs_p, fluid.n_p, x))
    timeit("  App matvec (p->p)", lambda: op_App(vp), n=10)

    Avp = A32[:, :fluid.nu_loc, fluid.nu_loc:]
    op_Avp = jax.jit(lambda x: element_matvec_rect(
        Avp, fluid.cell_dofs_u, fluid.cell_dofs_p, fluid.n_u, x))
    timeit("  Avp matvec (p->u)", lambda: op_Avp(vp), n=10)

    vu = bn[:fluid.n_u].astype(pdt)
    Apv = A32[:, fluid.nu_loc:, :fluid.nu_loc]
    op_Apv = jax.jit(lambda x: element_matvec_rect(
        Apv, fluid.cell_dofs_p, fluid.cell_dofs_u, fluid.n_p, x))
    timeit("  Apv matvec (u->p)", lambda: op_Apv(vu), n=10)

    # inner fgmres alone at the same tolerance
    @jax.jit
    def inner_solve(vp):
        def Tpp(xp):
            y = op_App(xp) - op_Apv(op_Avp(xp))   # structure-only timing
            return y
        atol = 1e-3 * jnp.linalg.norm(vp)
        r = fgmres(Tpp, vp, M=mg.vcycle, atol=atol, restart=200,
                   max_restarts=2)
        return r.x, r.iters

    x, it = inner_solve(vp)
    jax.block_until_ready(x)
    timeit("  inner fgmres (structure-only Tpp)",
           lambda: inner_solve(vp)[0], n=3)
    print(f"  structure-only inner iters: {int(it)}", flush=True)

    # full-system matvec (outer cost per iteration)
    from openifem_tpu.la.operators import element_matvec_taylor_hood
    nlu = fluid.nu_loc // fluid.dim
    xf = jnp.asarray(np.random.rand(fluid.n_dofs))

    @jax.jit
    def fmv(x):
        y = element_matvec_taylor_hood(
            A32, fluid.cell_nodes_u, fluid.cell_dofs_p, nlu, fluid.dim,
            fluid.n_u, fluid.n_p, x.astype(jnp.float32))
        return y.astype(x.dtype)

    timeit("full system matvec (f32, f64 io)", lambda: fmv(xf), n=10)


if __name__ == "__main__":
    main()
