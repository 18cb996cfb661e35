"""Diagnose the fsi_leaflet outer-FGMRES degradation under FSI
Dirichlet-mode velocity constraints (VERDICT r2 weak #3).

Runs a few coupled leaflet steps on CPU in both coupling modes and
records, per Newton iteration: outer FGMRES iters + the preconditioner's
inner (Mp-CG, Sm-CG, A-FGMRES) counts; plus a conditioning probe of the
mass-Schur operator Sm = B diag(Mu)^-1 B^T under the FSI-extended
velocity constraint set (covered pressure rows lose their whole velocity
stencil -> near-zero Sm rows).

Usage: JAX_PLATFORMS=cpu python examples/diag_leaflet_schur.py [h]
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

from openifem_tpu.fsi.fsi import FSI
from openifem_tpu.mesh import generators
from openifem_tpu.parameters import AllParameters
from openifem_tpu.solvers.fluid import InsIM
from openifem_tpu.solvers.solid import HyperElasticity
from openifem_tpu.la.krylov import cg


def build(h, dirichlet):
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
    fluid = InsIM(fluid_mesh, p, bc=bv)
    solid_mesh = generators.subdivided_hyper_rectangle(
        [int(a / h), int(b / h)], [L / 4, 0.0], [a + L / 4, b])
    solid = HyperElasticity(solid_mesh, p)
    p.end_time = 6 * p.time_step
    fsi = FSI(fluid, solid, p, use_dirichlet_bc=dirichlet)
    fsi.device_fluid_stepping = False  # host Newton loop: per-iter telemetry
    solid.mesh = solid.mesh.refine_global(p.global_refinements[1])
    solid.setup()
    fluid.mesh = fluid.mesh.refine_global(p.global_refinements[0])
    fluid.setup()
    fsi._setup_coupling()
    return fsi, fluid, solid


def run_mode(h, dirichlet, n_steps=4):
    fsi, fluid, solid = build(h, dirichlet)
    print(f"=== mode dirichlet={dirichlet} fluid_dofs={fluid.n_dofs} ===",
          flush=True)
    first = True
    step = 0
    while fsi.time.end() - fsi.time.current() > 1e-12 and step < n_steps:
        fsi.find_solid_bc()
        solid.run_one_step(first)
        fsi.update_solid_box_and_indicator()
        zero_ext, nonzero_ext = fsi.find_fluid_bc(first)
        if dirichlet:
            nfix = int(jnp.sum(zero_ext.dirichlet)
                       - jnp.sum(fluid.zero_constraints.dirichlet))
            print(f"step {step}: extra fsi-dirichlet u-dofs = {nfix}")
            probe_sm(fluid, zero_ext)
            probe_iters(fluid, zero_ext)
        else:
            probe_iters(fluid, fluid.zero_constraints)
        fsi._run_fluid_step(zero_ext, nonzero_ext, verbose=True)
        first = False
        fsi.time.increment()
        step += 1


def probe_iters(fluid, zero_ext):
    """One Newton solve on the current state with full inner telemetry
    (same pattern as bench.py cylinder telemetry)."""
    A_loc, rhs = fluid._assemble(
        fluid.present_solution, fluid.present_solution, fluid.indicator,
        fluid.fsi_acceleration, fluid.fsi_stress_cell, fluid.fsi_acc_nodal)
    b = zero_ext.condense_rhs(rhs)
    ucons = fluid._u_cons_of(zero_ext)
    pre = fluid._make_preconditioner(A_loc, ucons, fluid.p_constraints)
    _, (mp_i, sm_i, a_i) = pre.stats(b / jnp.linalg.norm(b))
    du, rn, outer, _ = fluid._newton_iter(
        fluid.present_solution, fluid.present_solution, fluid.indicator,
        fluid.fsi_acceleration, fluid.fsi_stress_cell, fluid.fsi_acc_nodal,
        zero_ext, ucons, fluid.p_constraints)
    print(f"  telemetry: outer={int(outer)} per-apply inner: "
          f"mp_cg={int(mp_i)} sm_cg={int(sm_i)} a_fgmres={int(a_i)}",
          flush=True)


def probe_sm(fluid, zero_ext):
    """Report the spread of the Sm diagonal under the extended ucons and
    the base ucons: near-zero rows = covered pressure dofs."""
    from openifem_tpu.la import scatter_add
    for name, cons in (("base", fluid.zero_constraints),
                       ("fsi-ext", zero_ext)):
        ucons = fluid._u_cons_of(cons)
        # recompute sm diag with fixed u-dofs masked out, mirroring
        # op_Sm's condensation
        Apu = fluid._A_cache[:, fluid.nu_loc:, :fluid.nu_loc] \
            if getattr(fluid, "_A_cache", None) is not None else None
        if Apu is None:
            # assemble once at the present solution just for the probe
            A_loc, _ = fluid._assemble(
                fluid.present_solution, fluid.present_solution,
                fluid.indicator, fluid.fsi_acceleration,
                fluid.fsi_stress_cell, fluid.fsi_acc_nodal)
            Apu = A_loc[:, fluid.nu_loc:, :fluid.nu_loc]
        mu_inv = jnp.where(fluid.Mu_diag != 0, 1.0 / fluid.Mu_diag, 1.0)
        free = (~ucons.fixed).astype(Apu.dtype)
        w = (mu_inv * free)[fluid.cell_dofs_u]
        diag_loc = jnp.einsum("cnk,ck,cnk->cn", Apu, w, Apu)
        diag = scatter_add(fluid.n_p, fluid.cell_dofs_p, diag_loc)
        pcons = fluid.p_constraints
        dfree = np.asarray(jnp.where(pcons.fixed, jnp.nan, diag))
        dfree = dfree[~np.isnan(dfree)]
        med = np.median(dfree)
        print(f"  Sm diag [{name}]: med={med:.3e} min={dfree.min():.3e} "
              f"n<1e-6*med={int((dfree < 1e-6 * med).sum())} "
              f"n<1e-2*med={int((dfree < 1e-2 * med).sum())} "
              f"of {len(dfree)}")


if __name__ == "__main__":
    h = float(sys.argv[1]) if len(sys.argv) > 1 else 0.05
    run_mode(h, True)
    run_mode(h, False)
