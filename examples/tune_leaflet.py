"""Rank InsIM preconditioner configs for the fsi_leaflet bench by total
A-block matvec work per step (TPU cost proxy: the step is latency-bound,
cost ~ #velocity-block matvecs).

For each config: run `n_steps` coupled leaflet steps (host Newton path so
per-iteration telemetry is visible), and for every Newton iteration record
outer FGMRES iters plus one preconditioner stats() apply (mp/sm/a inner
counts).  Proxy cost per Newton = outer * (a_inner + 1).

Usage: JAX_PLATFORMS=cpu PYTHONPATH=. python examples/tune_leaflet.py
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

from openifem_tpu.fsi.fsi import FSI
from openifem_tpu.mesh import generators
from openifem_tpu.parameters import AllParameters
from openifem_tpu.solvers.fluid import InsIM
from openifem_tpu.solvers.solid import HyperElasticity


def build(cls, h=0.05):
    p = AllParameters.from_file(
        "/root/reference/tests/fsi_leaflet/fsi_leaflet.prm")
    L, H, a, b, U = 4.0, 1.0, 0.1, 0.4, 1.5

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
    fluid = cls(fluid_mesh, p, bc=bv)
    solid_mesh = generators.subdivided_hyper_rectangle(
        [int(a / h), int(b / h)], [L / 4, 0.0], [a + L / 4, b])
    solid = HyperElasticity(solid_mesh, p)
    p.end_time = 1.0
    fsi = FSI(fluid, solid, p, use_dirichlet_bc=True)
    fsi.device_fluid_stepping = False
    solid.mesh = solid.mesh.refine_global(p.global_refinements[1])
    solid.setup()
    fluid.mesh = fluid.mesh.refine_global(p.global_refinements[0])
    fluid.setup()
    fsi._setup_coupling()
    return fsi, fluid, solid


def run_config(name, cls, n_steps=4):
    fsi, fluid, solid = build(cls)
    tel = []   # (step, newton_iter, outer, mp, sm, a)

    orig = fluid._newton_iter

    def instrumented(eval_pt, present, indicator, fsi_acc, fsi_stress,
                     fsi_acc_nodal, cons, ucons, pcons, res0=None):
        du, res_norm, outer, gres = orig(
            eval_pt, present, indicator, fsi_acc, fsi_stress,
            fsi_acc_nodal, cons, ucons, pcons, res0)
        A_loc, rhs = fluid._assemble(eval_pt, present, indicator, fsi_acc,
                                     fsi_stress, fsi_acc_nodal)
        b = cons.condense_rhs(rhs)
        pre = fluid._make_preconditioner(A_loc, ucons, pcons)
        nb = jnp.linalg.norm(b)
        _, (mp_i, sm_i, a_i) = pre.stats(b / jnp.where(nb > 0, nb, 1.0))
        tel.append((int(outer), int(mp_i), int(sm_i), int(a_i)))
        return du, res_norm, outer, gres

    fluid._newton_iter = instrumented

    first = True
    step = 0
    while step < n_steps:
        fsi.find_solid_bc()
        solid.run_one_step(first)
        fsi.update_solid_box_and_indicator()
        zero_ext, nonzero_ext = fsi.find_fluid_bc(first)
        fsi._run_fluid_step(zero_ext, nonzero_ext, verbose=False)
        first = False
        fsi.time.increment()
        step += 1

    total = sum(o * (a + 1) for (o, m, s, a) in tel)
    n_newton = len(tel)
    print(f"{name:32s} newtons={n_newton:2d} "
          f"outer={[t[0] for t in tel]} "
          f"a_per_apply={[t[3] for t in tel]} "
          f"proxy_matvecs/step={total / n_steps:.0f}", flush=True)
    return total / n_steps


class Base(InsIM):
    mixed_precision_precond = True
    mp_sm_rtol = 1e-1
    f32_matrix = True
    newton_forcing = (1e-4, 0.5)


if __name__ == "__main__":
    cases = {}

    class C0(Base):
        pass

    class C1(Base):
        a_inner_rtol = 1e-2

    class C2(Base):
        a_inner_rtol = 1e-1

    class C3(Base):
        a_inner_rtol = 1e-1
        a_block_jacobi = True

    class C4(Base):
        a_inner_rtol = 1e-2
        a_block_jacobi = True

    class C5(Base):
        a_inner_rtol = 1e-3
        a_block_jacobi = True

    for name, cls in [("baseline rtol=1e-3", C0),
                      ("a_rtol=1e-2", C1),
                      ("a_rtol=1e-1", C2),
                      ("a_rtol=1e-1 +blockJacobi", C3),
                      ("a_rtol=1e-2 +blockJacobi", C4),
                      ("a_rtol=1e-3 +blockJacobi", C5)]:
        t0 = time.time()
        try:
            run_config(name, cls)
        except Exception as e:
            print(f"{name}: FAILED {e}")
        print(f"  ({time.time() - t0:.0f}s)", flush=True)
