"""Device-true per-op costs for the wall3d SUPG stack: batch each op in a
lax.fori_loop(100) inside ONE dispatch so the ~5 ms axon relay latency
amortizes away.  Also: outer FGMRES iters per Newton and inner-iteration
scaling vs hierarchy depth / smoothing.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u examples/profile_wall3d_pieces2.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from openifem_tpu.mesh import generators
from openifem_tpu.parameters import AllParameters
from openifem_tpu.solvers.fluid.supg import SCnsIM
from openifem_tpu.config import real_dtype
from openifem_tpu.la.operators import (element_matvec, element_matvec_rect,
                                       element_matvec_taylor_hood)


class BenchSCnsIM(SCnsIM):
    mixed_precision_precond = True
    f32_matrix = True
    newton_forcing = (1e-4, 0.5)


def timeloop(label, fn, x, n=100):
    looped = jax.jit(lambda v: lax.fori_loop(
        0, n, lambda i, a: fn(a) * (1.0 + 0e0 * i), v))
    jax.block_until_ready(looped(x))
    t0 = time.time()
    out = looped(x)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1e3
    print(f"{label:46s} {dt:10.4f} ms/op (x{n})", flush=True)
    return dt


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

    pdt = jnp.float32
    A32 = A_loc.astype(pdt)
    App = A32[:, fluid.nu_loc:, fluid.nu_loc:]
    Avp = A32[:, :fluid.nu_loc, fluid.nu_loc:]
    Apv = A32[:, fluid.nu_loc:, :fluid.nu_loc]
    vp = (b[fluid.n_u:] / jnp.linalg.norm(b)).astype(pdt)
    xf = jnp.asarray(np.random.rand(fluid.n_dofs))

    timeloop("App matvec (p->p) f32", lambda x: element_matvec(
        App, fluid.cell_dofs_p, fluid.n_p, x), vp)

    # p->u->p chain (the Tpp product's rectangular part)
    def chain(x):
        y = element_matvec_rect(Avp, fluid.cell_dofs_u, fluid.cell_dofs_p,
                                fluid.n_u, x)
        return element_matvec_rect(Apv, fluid.cell_dofs_p,
                                   fluid.cell_dofs_u, fluid.n_p, y)

    timeloop("Apv Avp chain (p->u->p) f32", chain, vp)

    nlu = fluid.nu_loc // fluid.dim

    def fmv(x):
        return element_matvec_taylor_hood(
            A32, fluid.cell_nodes_u, fluid.cell_dofs_p, nlu, fluid.dim,
            fluid.n_u, fluid.n_p, x.astype(pdt)).astype(x.dtype)

    timeloop("full system matvec f32 (f64 io)", fmv, xf, n=50)

    # V-cycle at 2 and 3 levels, n_smooth 2 and 3
    from openifem_tpu.la.multigrid import make_pressure_mg
    fixed = np.asarray(fluid.p_constraints.fixed)
    for label, meshes, ns in (
            ("V-cycle [base, fm] ns=2", [base, fm], 2),
            ("V-cycle [base, mid, fm] ns=2", [base, mid, fm], 2),
            ("V-cycle [base, mid, fm] ns=3", [base, mid, fm], 3)):
        mg = make_pressure_mg(meshes, fixed, ns, pdt, fixed_prefix=False)
        timeloop(label, mg.vcycle, vp, n=20)

        fluid._pressure_mg = mg
        pre = fluid._make_preconditioner(A_loc, fluid.u_constraints,
                                         fluid.p_constraints)
        t0 = time.time()
        out, tpp_iters = jax.jit(pre.stats)(b / jnp.linalg.norm(b))
        jax.block_until_ready(out)
        t_first = time.time() - t0
        t0 = time.time()
        out, tpp_iters = jax.jit(pre.stats)(b / jnp.linalg.norm(b))
        jax.block_until_ready(out)
        print(f"  -> vmult {1e3*(time.time()-t0):.1f} ms, inner iters "
              f"{int(tpp_iters)}", flush=True)

    # one full Newton iteration: outer iters with the 3-level ns=2 mg
    mg = make_pressure_mg([base, mid, fm], fixed, 2, pdt,
                          fixed_prefix=False)
    fluid._pressure_mg = mg
    ni = jax.jit(fluid._newton_iter_impl)
    du, rn, outer, gres = ni(ev, fluid.present_solution, fluid.indicator,
                             fan, fsn, fluid.stress_device, eddy,
                             fluid.zero_constraints, fluid.u_constraints,
                             fluid.p_constraints)
    jax.block_until_ready(du)
    t0 = time.time()
    du, rn, outer, gres = ni(ev, fluid.present_solution, fluid.indicator,
                             fan, fsn, fluid.stress_device, eddy,
                             fluid.zero_constraints, fluid.u_constraints,
                             fluid.p_constraints)
    jax.block_until_ready(du)
    print(f"newton iter: {1e3*(time.time()-t0):.0f} ms, outer iters "
          f"{int(outer)}, gmres res {float(gres):.2e}", flush=True)


if __name__ == "__main__":
    main()
