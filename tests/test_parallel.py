"""Multi-chip sharding tests (8 virtual CPU devices via conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_graft_entry_and_dryrun():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft", "/root/repo/__graft_entry__.py")
    g = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(g)
    fn, args = g.entry()
    du, res = jax.jit(fn)(*args)
    assert np.isfinite(float(res))
    g.dryrun_multichip(len(jax.devices()))


def test_sharded_matvec_matches_single_device():
    """Element-sharded assembly+solve gives the same answer as unsharded."""
    from openifem_tpu.mesh import generators
    from openifem_tpu.parameters import AllParameters
    from openifem_tpu.parallel import make_cell_mesh, shard_fluid_solver
    from openifem_tpu.solvers.fluid import InsIM

    p = AllParameters.from_file(
        "/root/reference/tests/fluid_cavity/fluid_cavity.prm")
    p.end_time = 0.02
    p.global_refinements[0] = 3
    mesh = generators.hyper_cube(0.0, 1.0, dim=2)

    f1 = InsIM(mesh, p)
    f1.run(verbose=False)
    ref = np.asarray(f1.present_solution)

    f2 = InsIM(mesh, p)
    f2.mesh = f2.mesh.refine_global(3)
    f2.setup()
    f2._setup_done = True
    shard_fluid_solver(f2, make_cell_mesh(len(jax.devices())))
    f2.run_one_step(True, verbose=False)
    f2.run_one_step(False, verbose=False)
    out = np.asarray(f2.present_solution)
    assert np.allclose(out, ref, atol=1e-10)


def test_dof_sharded_cg_matches_unsharded():
    """Dof-range-sharded CG (padded layout) reproduces the unsharded solid
    solve to machine precision on the 8-device mesh."""
    from openifem_tpu.mesh import generators
    from openifem_tpu.parameters import AllParameters
    from openifem_tpu.parallel import make_cell_mesh, shard_solid_solver
    from openifem_tpu.solvers.solid import LinearElasticity

    p = AllParameters.from_file(
        "/root/reference/tests/solid_gravity_linearelastic/"
        "solid_gravity_linearelastic.prm")
    p.end_time = 2 * p.time_step

    def make(shard):
        mesh = generators.subdivided_hyper_rectangle(
            [5, 3], [0.0, 0.0], [1.0, 0.6])
        solid = LinearElasticity(mesh, p)
        solid.setup()
        if shard:
            shard_solid_solver(solid, make_cell_mesh())
        solid.run_one_step(True)
        solid.run_one_step(False)
        return np.asarray(solid.get_current_solution())

    u_ref = make(False)
    u_sh = make(True)
    # n_dofs = 48 (not divisible by 8) and n_cells = 15: both get padded
    assert np.abs(u_sh - u_ref).max() < 1e-10 * max(1.0, np.abs(u_ref).max())


def test_dof_sharded_insim_newton_matches_unsharded():
    """The fully dof-range-sharded InsIM Newton iteration (padded [u|p]
    blocks, original block-Schur preconditioner on a padded proxy) solves
    the same condensed system as the unsharded path on the 8-device mesh."""
    from openifem_tpu.mesh import generators
    from openifem_tpu.parameters import AllParameters
    from openifem_tpu.parallel import make_cell_mesh, shard_fluid_solver
    from openifem_tpu.parallel.shard import sharded_insim_newton
    from openifem_tpu.solvers.fluid import InsIM

    p = AllParameters.from_file(
        "/root/reference/tests/fluid_cavity/fluid_cavity.prm")
    mesh = generators.hyper_cube(0.0, 1.0, dim=2).refine_global(3)
    solver = InsIM(mesh, p)
    solver.setup()
    solver._setup_done = True
    # n_u = 578, n_p = 81, n_cells = 64: u/p blocks need padding on 8 devs
    assert solver.n_u % 8 != 0 and solver.n_p % 8 != 0

    eval_pt = solver.nonzero_constraints.apply_increment(
        solver.present_solution)
    args = (eval_pt, solver.present_solution, solver.indicator,
            solver.fsi_acceleration, solver.fsi_stress_cell,
            solver.fsi_acc_nodal)
    du_ref, rn_ref, _, _ = solver._newton_iter(
        *args, solver.zero_constraints, solver.u_constraints,
        solver.p_constraints)

    dmesh = make_cell_mesh()
    shard_fluid_solver(solver, dmesh)
    newton = sharded_insim_newton(solver, dmesh)
    du_sh, rn_sh, iters, resid = newton(*args)

    assert abs(float(rn_sh) - float(rn_ref)) < 1e-10 * max(1.0,
                                                           float(rn_ref))
    scale = max(1.0, float(np.abs(du_ref).max()))
    # both solve to atol 1e-8*|b|; allow the combined solver slack
    assert np.abs(np.asarray(du_sh) - np.asarray(du_ref)).max() < 1e-5 * \
        scale
    assert np.isfinite(float(resid))


def test_sharded_stepper_matches_unsharded():
    """The fully sharded on-device stepper reproduces the unsharded
    stepper over multiple time steps on the 8-device mesh."""
    from openifem_tpu.mesh import generators
    from openifem_tpu.parameters import AllParameters
    from openifem_tpu.parallel import make_cell_mesh, shard_fluid_solver
    from openifem_tpu.parallel.shard import make_sharded_stepper
    from openifem_tpu.solvers.fluid import InsIM

    p = AllParameters.from_file(
        "/root/reference/tests/fluid_cavity/fluid_cavity.prm")

    def build():
        mesh = generators.hyper_cube(0.0, 1.0, dim=2).refine_global(3)
        s = InsIM(mesh, p)
        s.setup()
        s._setup_done = True
        s.run_one_step(True, verbose=False)  # apply BCs once
        return s

    s_ref = build()
    stepper = s_ref.make_on_device_stepper()
    u_ref, rel_ref, it_ref = stepper(s_ref.present_solution, 3)
    u_ref = np.asarray(u_ref)
    assert float(rel_ref) < s_ref.params.fluid_tolerance

    s_sh = build()
    dmesh = make_cell_mesh()
    shard_fluid_solver(s_sh, dmesh)
    sh_stepper = make_sharded_stepper(s_sh, dmesh)
    u_sh, rel_sh, it_sh = sh_stepper(s_sh.present_solution, 3)
    u_sh = np.asarray(u_sh)
    assert float(rel_sh) < s_sh.params.fluid_tolerance

    scale = max(1.0, np.abs(u_ref).max())
    assert np.abs(u_sh - u_ref).max() < 1e-5 * scale


def test_dof_sharded_supg_newton_matches_unsharded():
    """The dof-range-sharded SUPG (SCnsIM) Newton iteration matches the
    unsharded path on the 8-device mesh."""
    import jax.numpy as jnp
    from openifem_tpu.config import real_dtype
    from openifem_tpu.mesh import generators
    from openifem_tpu.parameters import AllParameters
    from openifem_tpu.parallel import make_cell_mesh, shard_fluid_solver
    from openifem_tpu.parallel.shard import sharded_supg_newton
    from openifem_tpu.solvers.fluid.supg import SCnsIM

    p = AllParameters.from_file(
        "/root/reference/tests/fluid_plane_wall_driven_mpi_insim_supg/"
        "fluid_plane_wall_driven_mpi_insim_supg.prm")
    mesh = generators.subdivided_hyper_rectangle(
        [10, 6], [0.0, 0.0], [2.0, 0.4])
    solver = SCnsIM(mesh, p)
    solver.setup()
    solver._setup_done = True
    assert solver.n_u % 8 != 0  # padding exercised

    eval_pt = solver.nonzero_constraints.apply_increment(
        solver.present_solution)
    eddy = jnp.zeros(solver.u_space.n_nodes, dtype=real_dtype())
    args = (eval_pt, solver.present_solution, solver.indicator,
            solver.fsi_acc_nodal, solver.fsi_stress_nodal,
            solver.stress_device, eddy)
    du_ref, rn_ref, _, _ = solver._newton_iter(
        *args, solver.zero_constraints, solver.u_constraints,
        solver.p_constraints)

    dmesh = make_cell_mesh()
    shard_fluid_solver(solver, dmesh)
    newton = sharded_supg_newton(solver, dmesh)
    du_sh, rn_sh, _, _ = newton(*args)

    assert abs(float(rn_sh) - float(rn_ref)) < 1e-10 * max(1.0,
                                                           float(rn_ref))
    scale = max(1.0, float(np.abs(np.asarray(du_ref)).max()))
    assert np.abs(np.asarray(du_sh) - np.asarray(du_ref)).max() < 1e-5 * \
        scale


def test_fluid_pipe_sharded_stepper():
    """fluid_pipe_mpi analog (reference: tests/fluid_pipe_mpi — the same
    Poiseuille pipe on the distributed MPI::InsIM): the fully sharded
    on-device stepper on the 8-device mesh reproduces the host path and
    drives the profile toward the parabolic vmax = 1.5."""
    from openifem_tpu.mesh import generators
    from openifem_tpu.parameters import AllParameters
    from openifem_tpu.parallel import make_cell_mesh, shard_fluid_solver
    from openifem_tpu.parallel.shard import make_sharded_stepper
    from openifem_tpu.solvers.fluid import InsIM

    p = AllParameters.from_file(
        "/root/reference/tests/fluid_pipe_mpi/fluid_pipe_mpi.prm")
    L, D, h = 2.0, 0.2, 0.04

    def build():
        mesh = generators.subdivided_hyper_rectangle(
            [int(L / h), int(D / h)], [0.0, 0.0], [L, D])
        s = InsIM(mesh, p)
        s.setup()
        s._setup_done = True
        s.run_one_step(True, verbose=False)
        return s

    s_ref = build()
    for _ in range(3):
        s_ref.run_one_step(False, verbose=False)
    u_ref = np.asarray(s_ref.present_solution)

    s_sh = build()
    dmesh = make_cell_mesh()
    shard_fluid_solver(s_sh, dmesh)
    stepper = make_sharded_stepper(s_sh, dmesh)
    u_sh, rel, _ = stepper(s_sh.present_solution, 3)
    assert float(rel) < p.fluid_tolerance
    u_sh = np.asarray(u_sh)
    scale = max(1.0, np.abs(u_ref).max())
    assert np.abs(u_sh - u_ref).max() < 1e-5 * scale
    # profile develops toward vmax = 1.5 (hit exactly at the full 20 steps,
    # asserted by the serial fluid_pipe golden in test_fluid.py)
    vmax = np.abs(u_sh[:s_sh.n_u]).max()
    assert 1.0 < vmax < 1.6


def test_solid_beam_sharded_matches_serial():
    """solid_beam_bending_mpi_linearelastic analog (reference:
    tests/solid_beam_bending_mpi_linearelastic — distributed standalone
    solid): the dof-range-sharded CG beam matches the serial beam."""
    from openifem_tpu.mesh import generators
    from openifem_tpu.parameters import AllParameters
    from openifem_tpu.parallel import make_cell_mesh, shard_solid_solver
    from openifem_tpu.solvers.solid import LinearElasticity

    p = AllParameters.from_file(
        "/root/reference/tests/solid_beam_bending_mpi_linearelastic/"
        "solid_beam_bending_mpi_linearelastic.prm")
    p.end_time = 3 * p.time_step

    def make(shard):
        mesh = generators.subdivided_hyper_rectangle(
            [16, 2], [0.0, 0.0], [8.0, 1.0])
        solid = LinearElasticity(mesh, p)
        solid.setup()
        if shard:
            shard_solid_solver(solid, make_cell_mesh())
        solid.run()
        return np.asarray(solid.get_current_solution())

    u_ref = make(False)
    u_sh = make(True)
    assert np.abs(u_sh - u_ref).max() < 1e-10 * max(1.0, np.abs(u_ref).max())
    assert u_sh.min() < -1e-4  # bends downward


def test_geometric_mg_preconditioners_match_plain():
    """Pressure + velocity V-cycles (la/multigrid.py) are preconditioner
    choices only: the converged InsIM solution is unchanged, and the inner
    iteration counts drop (the TPU-native replacement for the reference's
    MUMPS A-block + ILU, source/mpi_insim.cpp:122-127)."""
    import jax.numpy as jnp
    from openifem_tpu.mesh import generators
    from openifem_tpu.parameters import AllParameters
    from openifem_tpu.solvers.fluid import InsIM

    p = AllParameters.from_file(
        "/root/reference/tests/fluid_cylinder/fluid_cylinder.prm")

    def bv(points, component):
        out = np.zeros(len(points))
        if component == 0:
            m = np.abs(points[:, 0]) < 1e-10
            out[m] = 4 * 0.3 * points[m, 1] * (0.41 - points[m, 1]) / 0.41**2
        return out

    base = generators.flow_around_cylinder(2)
    meshes = [base, base.refine_global(1)]

    def run(mg):
        s = InsIM(meshes[-1], p, bc=bv)
        s.setup()
        s._setup_done = True
        if mg:
            s.enable_pressure_mg(meshes)
            s.enable_velocity_mg(meshes)
        s.run_one_step(True, verbose=False)
        s.run_one_step(False, verbose=False)
        # stats: inner iteration counts on the current residual
        A_loc, rhs = s._assemble(s.present_solution, s.present_solution,
                                 s.indicator, s.fsi_acceleration,
                                 s.fsi_stress_cell, s.fsi_acc_nodal)
        b = s.zero_constraints.condense_rhs(rhs)
        pre = s._make_preconditioner(A_loc, s.u_constraints,
                                     s.p_constraints)
        _, (mp_i, sm_i, a_i) = pre.stats(b / jnp.linalg.norm(b))
        return np.asarray(s.present_solution), int(sm_i), int(a_i)

    u0, sm0, a0 = run(False)
    u1, sm1, a1 = run(True)
    scale = max(1.0, np.abs(u0).max())
    assert np.abs(u1 - u0).max() < 1e-6 * scale
    assert a1 < a0      # velocity V-cycle beats Jacobi
    assert sm1 <= sm0   # pressure V-cycle beats diagonal scaling


def test_geometric_mg_on_locally_refined_mesh():
    """The V-cycle's geometric prolongation fallback handles hanging-node
    (locally refined) hierarchies: MG-preconditioned CG on the pressure
    Laplacian of a leaflet-style mesh converges in far fewer iterations
    than Jacobi and to the same solution."""
    import jax.numpy as jnp
    from openifem_tpu.fe.space import FESpace
    from openifem_tpu.la.krylov import cg
    from openifem_tpu.la.multigrid import GeometricMG, laplacian_levels
    from openifem_tpu.mesh import generators

    base = generators.subdivided_hyper_rectangle(
        [16, 8], [0.0, 0.0], [2.0, 1.0])
    c = base.cell_centers()
    fine = base.refine((c[:, 0] > 0.5) & (c[:, 0] < 1.0))
    sp = FESpace(fine, 1)
    fixed = np.zeros(sp.n_nodes, dtype=bool)
    for nodes in sp.boundary_node_map().values():
        fixed[nodes] = True
    # hanging nodes are identity rows too (as in the condensed operator)
    for slave, _, _ in sp.hanging:
        fixed[slave] = True

    levels = laplacian_levels([base, fine], 1, fixed, dtype=jnp.float64)
    mg = GeometricMG(levels, n_smooth=2, dtype=jnp.float64)
    lv = levels[-1]
    rng = np.random.default_rng(3)
    b = jnp.asarray(np.where(fixed, 0.0, rng.standard_normal(sp.n_nodes)))
    res_j = cg(lv.matvec, b, M=lambda r: r * lv.dinv, atol=1e-10,
               maxiter=2000)
    res_m = cg(lv.matvec, b, M=mg.vcycle, atol=1e-10, maxiter=2000)
    assert int(res_m.iters) < int(res_j.iters) // 2
    scale = max(1.0, float(jnp.abs(res_j.x).max()))
    assert float(jnp.abs(res_m.x - res_j.x).max()) < 1e-8 * scale


def test_sharded_stencil_matches_replicated():
    """Plane-sharded stencil apply + weighted inner A-solve (VERDICT r4
    #4, parallel/shard.py ShardedStencil): the matvec must equal the
    replicated stencil apply exactly (same W entries, same per-plane
    sums) and the sharded weighted-FGMRES A-solve must converge to the
    same solution in essentially the same iterations as the flat solve."""
    from openifem_tpu.la.krylov import fgmres
    from openifem_tpu.la.operators import element_diag
    from openifem_tpu.la.stencil import PatchGrid, StencilOperator
    from openifem_tpu.mesh import generators
    from openifem_tpu.parameters import AllParameters
    from openifem_tpu.parallel import make_cell_mesh
    from openifem_tpu.parallel.shard import (ShardedStencil,
                                             sharded_stencil_asolve)
    from openifem_tpu.solvers.fluid import InsIM

    p = AllParameters.from_file(
        "/root/reference/tests/fluid_cavity/fluid_cavity.prm")
    p.global_refinements[0] = 4
    mesh = generators.hyper_cube(0.0, 1.0, dim=2).refine_global(4)
    f = InsIM(mesh, p)
    f.setup()
    st = f._u_stencil
    assert st is not None and st.n_shared == 0
    dmesh = make_cell_mesh()
    sst = ShardedStencil(st, dmesh)

    # real Newton velocity block at the initial state
    ev = f.nonzero_constraints.apply_increment(f.present_solution)
    A_loc, _ = f._assemble(ev, f.present_solution, f.indicator,
                           f.fsi_acceleration, f.fsi_stress_cell,
                           f.fsi_acc_nodal)
    Auu = A_loc[:, :f.nu_loc, :f.nu_loc]
    n_c, nlu, d = int(f.mesh.n_cells), f.nlu, f.dim
    Ws = st.build_weights(Auu.reshape(n_c, nlu, d, nlu, d))

    rng = np.random.default_rng(41)
    x = jnp.asarray(rng.standard_normal(f.n_u))

    # raw apply equality: sharded == replicated == element
    y_rep = st.unspread(st.matvec(Ws, st.spread(x)))
    y_sh = sst.unspread(jax.jit(sst.matvec)(sst.shard_weights(Ws),
                                            sst.spread(x)))
    scale = float(jnp.abs(y_rep).max())
    assert float(jnp.abs(y_sh - y_rep).max()) < 1e-12 * scale

    # inner A-solve equality (the production fast path): flat reference
    ucons = f.u_constraints
    b = jnp.asarray(np.where(np.asarray(ucons.fixed), 0.0,
                             rng.standard_normal(f.n_u)))
    atol = 1e-8 * float(jnp.linalg.norm(b))
    diag = jnp.where(ucons.fixed, 1.0,
                     element_diag(Auu, f.cell_dofs_u, f.n_u))
    dinv = jnp.where(diag != 0, 1.0 / diag, 1.0)
    fix_st = st.spread_mask(ucons.fixed)
    ref = fgmres(lambda v: st.condensed_matvec(Ws, fix_st, v),
                 st.spread(b), M=lambda r: r * st.spread(dinv),
                 atol=atol, restart=f.a_inner_restart,
                 max_restarts=f.a_inner_restarts,
                 weight=st.weight(b.dtype))
    x_ref = st.unspread(ref.x)
    res = sharded_stencil_asolve(f, dmesh)(Auu, b, atol)
    xs = max(1.0, float(jnp.abs(x_ref).max()))
    assert float(jnp.abs(res.x - x_ref).max()) < 1e-8 * xs
    assert abs(int(res.iters) - int(ref.iters)) <= 2
