"""Profile the fsi_leaflet_r2 FLUID solve pieces on the TPU: assembly,
W build, stencil matvec, one inner iteration, one precond apply, one
Newton iteration.  Mirrors bench.py::bench_fsi_leaflet(extra_refine=2).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from openifem_tpu.mesh import generators
from openifem_tpu.parameters import AllParameters
from openifem_tpu.solvers.fluid import InsIM


def t(f, *a, n=5):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time() - t0) / n * 1e3


def main():
    extra = 2
    p = AllParameters.from_file(
        "/root/reference/tests/fsi_leaflet/fsi_leaflet.prm")
    L, H, h = 4.0, 1.0, 0.05

    class B(InsIM):
        mixed_precision_precond = True
        mp_sm_rtol = 1e-1
        f32_matrix = True
        newton_forcing = (1e-4, 0.5)
        a_inner_rtol = 1e-2
        f32_outer = True
        mg_direct = True

    base = generators.subdivided_hyper_rectangle(
        [int(L / h), int(H / h)], [0.0, 0.0], [L, H])
    f = B(base, p)
    meshes = [f.mesh]
    for _ in range(p.global_refinements[0] + extra):
        meshes.append(meshes[-1].refine_global(1))
    f.mesh = meshes[-1]
    f.setup()
    f.enable_pressure_mg(meshes)
    print("n_dofs", f.n_dofs, "cells", f.mesh.n_cells,
          "stencil", f._u_stencil is not None)
    st = f._u_stencil
    print("n_p", st.n_p, "Gi", st.Gi, "Gj", st.Gj, "M", st.M, "slots", st.n_slots,
          "shared", st.n_shared)

    sol = f.present_solution
    asm = jax.jit(lambda s: f._assemble(s, s, f.indicator,
                                        f.fsi_acceleration,
                                        f.fsi_stress_cell,
                                        f.fsi_acc_nodal))
    A_loc, rhs = asm(sol)
    print("assembly            %8.1f ms" % t(asm, sol))

    Auu = A_loc.astype(jnp.float32)[:, :f.nu_loc, :f.nu_loc]
    nlu = f.nu_loc // 2
    Ab = Auu.reshape(f.mesh.n_cells, nlu, 2, nlu, 2)
    bw = jax.jit(st.build_weights)
    W = bw(Ab)
    print("W build             %8.1f ms" % t(bw, Ab))

    x = st.spread(jnp.ones(f.n_u, jnp.float32))
    fix = st.spread_mask(f.u_constraints.fixed)
    mv = jax.jit(lambda v: st.condensed_matvec(W, fix, v))
    print("stencil matvec      %8.1f ms" % t(mv, x, n=20))

    pre = f._make_preconditioner(A_loc, f.u_constraints, f.p_constraints)
    b = f.zero_constraints.condense_rhs(rhs)
    bn = b / jnp.linalg.norm(b)
    pj = jax.jit(pre)
    print("precond apply       %8.1f ms" % t(pj, bn, n=3))
    _, (mp_i, sm_i, a_i) = pre.stats(bn)
    print("   iters: mp", int(mp_i), "sm", int(sm_i), "a", int(a_i))

    nw = jax.jit(lambda s: f._newton_iter(
        s, s, f.indicator, f.fsi_acceleration, f.fsi_stress_cell,
        f.fsi_acc_nodal, f.zero_constraints, f.u_constraints,
        f.p_constraints))
    r = nw(sol)
    print("newton iter         %8.1f ms  (outer %d)"
          % (t(nw, sol, n=3), int(r[2])))


if __name__ == "__main__":
    main()
