"""Fluid solver base: Taylor-Hood spaces, BCs, stress projection.

Reference: include/fluid_solver.h:63-171, source/fluid_solver.cpp.
Global dof vector = [u (node-major, component fastest), p]; deal.II's block
renumbering becomes two index ranges of one flat vector.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...config import real_dtype
from ...fe.fevalues import cell_values, face_values
from ...fe.shapes import gauss_quadrature
from ...fe.space import FESpace, SystemSpace
from ...la.constraints import Constraints
from ...parameters import (AllParameters, component_flag_to_mask,
                           component_flag_values)
from ...utils.timectl import Time


class FluidSolverBase:
    # Newton-target-aware forcing for the outer FGMRES.  None keeps each
    # family's reference-parity tolerance (serial InsIM: atol = max(1e-8 *
    # ||rhs||, 1e-10), source/insim.cpp:353-354; SUPG family: outer_rtol *
    # ||rhs||, source/mpi_supg_solver.cpp:311-312).  A pair (eta, theta)
    # solves each Newton linear system only to
    #   atol = max(eta * ||r_k||, theta * fluid_tolerance * ||r_0||)
    # — inexact Newton: eta bounds the per-iteration linear error relative
    # to the CURRENT nonlinear residual, while the theta floor stops
    # refining the update below what the Newton convergence target
    # (fluid_tolerance, relative to the step's initial residual r_0) can
    # observe.  A converged iterate (||r_k|| <= fluid_tolerance * ||r_0||)
    # skips the solve outright (atol = inf -> FGMRES exits after the
    # initial residual check with 0 iterations), which turns the final
    # convergence-check Newton iteration into one assemble + one matvec.
    # The Newton loop converges to the same fluid_tolerance either way;
    # only the (unobservable) extra digits of each linear solve differ.
    newton_forcing = None
    # Run the outer FGMRES (Krylov basis, CGS2 orthogonalization, Givens
    # updates) in f32.  TPU f64 is software-emulated, so the outer shell's
    # V@w matmuls and axpys carry a large constant factor; with the
    # Jacobian apply already f32 (f32_matrix) the f64 shell is pure
    # overhead.  Inexact-Newton safe: the assembled f64 residual still
    # gates Newton convergence, and the solve tolerance is clamped to the
    # f32-achievable floor (~2e-6 relative), which Newton self-corrects —
    # same mechanism as f32_matrix.  Combine with f32_matrix=True.
    f32_outer = False
    f32_outer_floor = 2e-6

    def _outer_solve(self, op, b, precond, atol):
        """Dispatch the outer FGMRES, optionally with an f32 Krylov basis
        (f32_outer).  Returns (x_in_b_dtype, iters, residual)."""
        import jax.numpy as jnp

        from ...la.krylov import fgmres
        if self.f32_outer:
            atol = jnp.maximum(jnp.asarray(atol, b.dtype),
                               self.f32_outer_floor * jnp.linalg.norm(b))
            op32 = lambda x: op(x).astype(jnp.float32)  # noqa: E731
            res = fgmres(op32, b.astype(jnp.float32), M=precond,
                         atol=atol.astype(jnp.float32),
                         restart=self.outer_restart,
                         max_restarts=self.outer_max_restarts)
            return (res.x.astype(b.dtype), res.iters,
                    res.residual.astype(b.dtype))
        res = fgmres(op, b, M=precond, atol=atol,
                     restart=self.outer_restart,
                     max_restarts=self.outer_max_restarts)
        return res.x, res.iters, res.residual

    def _outer_atol(self, res_norm, res0, parity_atol):
        """Outer-FGMRES absolute tolerance for one Newton iteration.
        res0: the step's initial nonlinear residual, or None / non-finite
        when unknown (first iteration of a step)."""
        import jax.numpy as jnp
        if self.newton_forcing is None:
            return parity_atol
        eta, theta = self.newton_forcing
        tol = self.params.fluid_tolerance
        if res0 is None:
            r0 = res_norm
        else:
            r0 = jnp.where(jnp.isfinite(res0), res0, res_norm)
        atol = jnp.maximum(jnp.maximum(eta * res_norm, theta * tol * r0),
                           1e-10)
        converged = res_norm <= jnp.maximum(tol * r0, 1e-11)
        return jnp.where(converged, jnp.inf, atol)

    def __init__(self, mesh, params: AllParameters,
                 bc: Optional[Callable] = None):
        """bc: hard-coded boundary-value function f(points (n,dim), component)
        -> (n,) used when params.use_hard_coded_values (reference:
        source/fluid_solver.cpp:132-143)."""
        self.mesh = mesh
        self.params = params
        self.dim = mesh.dim
        self.boundary_values = bc
        self.time = Time(params.end_time, params.time_step,
                         params.output_interval, params.refinement_interval,
                         params.save_interval)
        from ...utils.timer import Timer
        self.timer = Timer(type(self).__name__)
        self._setup_done = False
        self.body_force = None          # set_body_force analog
        self.initial_condition = None   # set_initial_condition analog
        # time-dependent hard-coded BCs: bid -> fn(points, component, time)
        # (reference: source/mpi_fluid_solver.cpp:65-79)
        self.hard_coded_bcs = {}
        self.bc_time = 0.0

    def add_hard_coded_boundary_condition(self, bid: int, fn):
        """fn(points (n,dim), component, time) -> (n,) boundary values for
        the components constrained on boundary `bid` in the parameters."""
        self.hard_coded_bcs[bid] = fn

    # ------------------------------------------------------------------
    def set_body_force(self, fn: Callable):
        """fn(points (n,dim)) -> (n,dim) body acceleration (reference:
        source/mpi_fluid_solver.cpp:81-91)."""
        self.body_force = fn

    def set_initial_condition(self, fn: Callable):
        """fn(points (n,dim), component) -> (n,) initial field values
        (reference: source/mpi_fluid_solver.cpp:105-113)."""
        self.initial_condition = fn

    # ------------------------------------------------------------------
    def setup(self):
        params, mesh = self.params, self.mesh
        dim = self.dim
        vdeg = params.fluid_velocity_degree
        pdeg = params.fluid_pressure_degree
        self.u_space = FESpace(mesh, vdeg)
        self.p_space = FESpace(mesh, pdeg)
        self.sys = SystemSpace([(self.u_space, dim), (self.p_space, 1)])
        self.n_dofs = self.sys.n_dofs
        self.n_u = self.u_space.n_nodes * dim
        self.n_p = self.p_space.n_nodes

        nq = vdeg + 1
        self.cv_u = cell_values(self.u_space, nq)
        self.cv_p = cell_values(self.p_space, nq)
        self.fv_u = face_values(self.u_space, nq)

        self._make_constraints()
        self._setup_stress_projection()

        rdt = real_dtype()
        self.present_solution = jnp.zeros(self.n_dofs, dtype=rdt)
        self.solution_increment = jnp.zeros(self.n_dofs, dtype=rdt)
        if self.initial_condition is not None:
            self._apply_initial_condition()

        n_c = mesh.n_cells
        self.indicator = jnp.zeros(n_c, dtype=rdt)
        self.fsi_acceleration = jnp.zeros((n_c, dim), dtype=rdt)
        self.fsi_stress_cell = jnp.zeros((n_c, dim, dim), dtype=rdt)
        # MPI-style nodal FSI fields (reference: include/mpi_fluid_solver.h:208-212)
        self.fsi_acc_nodal = jnp.zeros((self.u_space.n_nodes, dim), dtype=rdt)
        self.fsi_stress_nodal = jnp.zeros((self.u_space.n_nodes, dim, dim),
                                          dtype=rdt)
        # nodal viscous stress, device-resident (n_scalar_nodes, dim, dim)
        self.stress_device = jnp.zeros((self.u_space.n_nodes, dim, dim),
                                       dtype=rdt)
        self._setup_done = True

    # ------------------------------------------------------------------
    def _make_constraints(self):
        """Dirichlet constraint masks + values on the velocity block
        (reference: source/fluid_solver.cpp:66-163)."""
        params, dim = self.params, self.dim
        dmask = np.zeros(self.n_dofs, dtype=bool)
        dvals = np.zeros(self.n_dofs)
        bmap = self.u_space.boundary_node_map()
        # deal.II's AffineConstraints keeps the FIRST constraint added for a
        # dof; boundaries are processed in ascending id order (std::map), so
        # at corner nodes the lower boundary id wins.
        for bid in sorted(params.fluid_dirichlet_bcs):
            flag, vals = params.fluid_dirichlet_bcs[bid]
            if bid not in bmap:
                continue
            nodes = bmap[bid]
            mask = component_flag_to_mask(flag, dim)
            per_axis = component_flag_values(flag, vals, dim)
            pts = self.u_space.node_points[nodes]
            for d in range(dim):
                if not mask[d]:
                    continue
                gd = nodes * dim + d
                fresh = ~dmask[gd]
                if params.use_hard_coded_values and bid in self.hard_coded_bcs:
                    v = np.asarray(self.hard_coded_bcs[bid](pts, d,
                                                            self.bc_time))
                elif params.use_hard_coded_values and \
                        self.boundary_values is not None:
                    v = np.asarray(self.boundary_values(pts, d))
                else:
                    v = np.full(len(nodes), per_axis[d])
                dvals[gd[fresh]] = v[fresh]
                dmask[gd] = True
        hidx, hw, hmask = self.sys.hanging_tables()
        self.zero_constraints = Constraints(self.n_dofs, hidx, hw, hmask,
                                            dirichlet_mask=dmask)
        self.nonzero_constraints = Constraints(self.n_dofs, hidx, hw, hmask,
                                               dirichlet_mask=dmask,
                                               dirichlet_values=dvals)
        # per-block constraints for the Schur preconditioner sub-operators
        usys = SystemSpace([(self.u_space, self.dim)])
        uh_idx, uh_w, uh_mask = usys.hanging_tables()
        self.u_constraints = Constraints(self.n_u, uh_idx, uh_w, uh_mask,
                                         dirichlet_mask=dmask[:self.n_u])
        psys = SystemSpace([(self.p_space, 1)])
        ph_idx, ph_w, ph_mask = psys.hanging_tables()
        self.p_constraints = Constraints(self.n_p, ph_idx, ph_w, ph_mask)

    def _u_cons_of(self, cons):
        """Velocity-block constraints matching a (possibly FSI-extended)
        full-vector constraint set."""
        if cons is self.zero_constraints:
            return self.u_constraints
        return self.u_constraints.with_extra_dirichlet(
            cons.dirichlet[:self.n_u],
            jnp.zeros(self.n_u, dtype=real_dtype()))

    def _apply_initial_condition(self):
        """reference: source/mpi_fluid_solver.cpp:367-414."""
        x = np.zeros(self.n_dofs)
        for d in range(self.dim):
            x[d:self.n_u:self.dim] = np.asarray(
                self.initial_condition(self.u_space.node_points, d))
        x[self.n_u:] = np.asarray(
            self.initial_condition(self.p_space.node_points, self.dim))
        self.present_solution = jnp.asarray(x, dtype=real_dtype())

    # ------------------------------------------------------------------
    def _setup_stress_projection(self):
        k = self.params.fluid_velocity_degree
        qp, qw = gauss_quadrature(k + 1, self.dim)
        N, _ = self.u_space.shapes.evaluate(qp)
        Mref = np.einsum("qi,qj,q->ij", N, N, qw)
        Q = (N * qw[:, None]).T
        self.qpt_to_dof = np.linalg.solve(Mref, Q)
        counts = np.zeros(self.u_space.n_nodes)
        np.add.at(counts, self.u_space.cell_dofs.ravel(), 1.0)
        self._scalar_counts = counts
        self._qpt_to_dof_j = jnp.asarray(self.qpt_to_dof,
                                         dtype=real_dtype())
        self._scalar_counts_j = jnp.asarray(counts, dtype=real_dtype())

    def velocity_gradients(self, solution):
        """(n_c, n_q, dim, dim) velocity gradients at volume q points."""
        d = self.dim
        u = solution[:self.n_u].reshape(-1, d)
        ul = u[self.u_space.cell_dofs]
        return jnp.einsum("cqlx,cla->cqax", jnp.asarray(self.cv_u.grad), ul)

    def _update_stress_impl(self, solution):
        mu = self.params.viscosity
        gradv = self.velocity_gradients(solution)
        tau = mu * (gradv + jnp.swapaxes(gradv, 2, 3))
        # project each component
        cellwise = jnp.einsum("iq,cqab->ciab", self._qpt_to_dof_j, tau)
        n_nodes = self.u_space.n_nodes
        d = self.dim
        out = jnp.zeros((n_nodes, d, d), dtype=tau.dtype).at[
            jnp.asarray(self.u_space.cell_dofs).reshape(-1)].add(
            cellwise.reshape(-1, d, d))
        return out / self._scalar_counts_j[:, None, None]

    def update_stress(self):
        """Nodal viscous stress tau = 2 mu grad^s(v), projected
        quadrature->nodes and averaged (reference:
        source/fluid_solver.cpp:324-414).  Kept on device; use `stress` for
        a host copy in the reference's (dim, dim, n_nodes) layout."""
        if not hasattr(self, "_update_stress_jit"):
            self._update_stress_jit = jax.jit(self._update_stress_impl)
        self.stress_device = self._update_stress_jit(self.present_solution)

    @property
    def stress(self):
        return np.asarray(self.stress_device).transpose(1, 2, 0)

    def get_current_solution(self):
        return self.present_solution

    # ------------------------------------------------------------------
    def refine_mesh(self, min_level: int, max_level: int,
                    verbose: bool = False):
        """Kelly-driven standalone AMR with solution transfer
        (reference: source/fluid_solver.cpp:215-265,
        refine_and_coarsen_fixed_fraction(0.6, 0.4))."""
        from ...fe.kelly import (coarsen_fraction_flags, kelly_estimate,
                                 refine_fraction_flags)
        from ...fe.transfer import transfer_nodal_field
        eta = kelly_estimate(self.u_space, np.asarray(self.present_solution),
                             n_components=self.dim, component_offset=0)
        flags = refine_fraction_flags(eta, 0.6)
        flags &= self.mesh.level < max_level
        cflags = coarsen_fraction_flags(eta, 0.4) & ~flags
        if not flags.any() and not cflags.any():
            return
        old_mesh, old_u, old_p = self.mesh, self.u_space, self.p_space
        old_solution = self.present_solution
        n_u_old = self.n_u
        mesh2, old_to_new = self.mesh.coarsen(cflags, min_level)
        rflags = np.zeros(mesh2.n_cells, dtype=bool)
        rflags[old_to_new[flags]] = True
        self.mesh = mesh2.refine(rflags)
        self.setup()
        if verbose:
            print(f"Kelly refine: {old_mesh.n_cells} -> "
                  f"{self.mesh.n_cells} cells")
        u_new = transfer_nodal_field(
            old_mesh, old_u, old_solution[:n_u_old].reshape(-1, self.dim),
            self.u_space.node_points)
        p_new = transfer_nodal_field(old_mesh, old_p, old_solution[n_u_old:],
                                     self.p_space.node_points)
        sol = jnp.concatenate([u_new.reshape(-1), p_new])
        self.present_solution = self.nonzero_constraints.distribute(sol)
        self.update_stress()

    def output_results(self, step: Optional[int] = None,
                       prefix: str = "fluid"):
        """VTU output with velocity/pressure/indicator/stress
        (reference: source/mpi_fluid_solver.cpp:490-579)."""
        from ...io.vtk import write_vtu
        from ...utils.pvd import PVDWriter
        if step is None:
            step = self.time.get_timestep()
        n_vert = self.mesh.n_vertices
        d = self.dim
        u = np.asarray(self.present_solution[:self.n_u]).reshape(-1, d)
        p = np.asarray(self.present_solution[self.n_u:])
        tau = np.asarray(self.stress_device)
        point_data = {"velocity": u[:n_vert], "pressure": p[:n_vert]}
        for i in range(d):
            for j in range(i, d):
                point_data[f"tau_{i}{j}"] = tau[:n_vert, i, j]
        # FSI body force and eddy viscosity, when active
        # (reference writes fsi_force / eddy_viscosity fields,
        # source/mpi_fluid_solver.cpp:500-556)
        fsi_acc = getattr(self, "fsi_acc_nodal", None)
        if fsi_acc is not None and np.any(np.asarray(fsi_acc)):
            point_data["fsi_force"] = np.asarray(fsi_acc)[:n_vert]
        eddy = getattr(self, "eddy_viscosity_nodal", None)
        if eddy is not None:
            point_data["eddy_viscosity"] = np.asarray(eddy)[:n_vert]
        write_vtu(f"{prefix}-{step:06d}.vtu", self.mesh,
                  point_data=point_data,
                  cell_data={"indicator": np.asarray(self.indicator)})
        if not hasattr(self, "_pvd"):
            self._pvd = PVDWriter(self.time, f"{prefix}.pvd")
        self._pvd.write_current_timestep(f"{prefix}-", 6)

    _MESH_CKPT_FIELDS = ("vertices", "cells", "material_id", "boundary_id",
                         "face_manifold", "cell_manifold", "level",
                         "tfi_coarse", "tfi_rect", "family", "child_index")

    def save_checkpoint(self, step: Optional[int] = None,
                        prefix: str = "fluid"):
        """reference: source/mpi_fluid_solver.cpp:581-636.

        Persists the mesh arrays alongside the solution — the reference
        serializes the triangulation itself — so a restart after AMR changed
        the dof layout rebuilds the adapted mesh rather than silently
        restoring onto a wrong-sized global refinement."""
        from ...io.checkpoint import save_checkpoint
        if step is None:
            step = self.time.get_timestep()
        arrays = {
            "present_solution": np.asarray(self.present_solution),
            "time_current": self.time.current(),
        }
        for f in self._MESH_CKPT_FIELDS:
            arrays["mesh_" + f] = np.asarray(getattr(self.mesh, f))
        # attached turbulence model piggybacks its state on the fluid
        # checkpoint (reference: source/mpi_spalart_allmaras.cpp:569-591)
        tm = getattr(self, "turbulence_model", None)
        if tm is not None:
            arrays["sa_nu_tilde"] = np.asarray(tm.present_solution)
            arrays["sa_moving_wall_distance"] = np.asarray(
                tm.moving_wall_distance)
            arrays["sa_y_plus"] = np.asarray(tm.y_plus)
            arrays["sa_accum_mask"] = np.asarray(tm._accum_mask)
        save_checkpoint(prefix, step, arrays)

    def load_checkpoint(self, prefix: str = "fluid") -> bool:
        """reference: source/mpi_fluid_solver.cpp:638-713."""
        from ...io.checkpoint import load_latest_checkpoint
        data = load_latest_checkpoint(prefix)
        if data is None:
            return False
        if "mesh_vertices" in data:
            # Rebuild the (possibly AMR-adapted) mesh recorded at save time.
            # Manifold / TFI chart objects are not serializable; their ids
            # are stable across refinement, so carry them over from the
            # current (coarse or already-set-up) mesh.
            from ...mesh.mesh import Mesh
            kw = {f: data["mesh_" + f] for f in self._MESH_CKPT_FIELDS}
            self.mesh = Mesh(dim=self.dim, manifolds=self.mesh.manifolds,
                             tfi=self.mesh.tfi, **kw)
            self.setup()
        elif not self._setup_done:
            self.mesh = self.mesh.refine_global(
                self.params.global_refinements[0])
            self.setup()
        if data["present_solution"].shape != (self.n_dofs,):
            raise ValueError(
                f"checkpoint '{prefix}' has {data['present_solution'].shape}"
                f" dofs but the mesh yields {self.n_dofs}; the checkpoint "
                "was saved on a different mesh")
        self.present_solution = jnp.asarray(data["present_solution"],
                                            dtype=real_dtype())
        tm = getattr(self, "turbulence_model", None)
        if tm is not None and "sa_nu_tilde" in data:
            if not hasattr(tm, "space"):
                tm.setup()
            tm.present_solution = jnp.asarray(data["sa_nu_tilde"],
                                              dtype=real_dtype())
            tm.moving_wall_distance = jnp.asarray(
                data["sa_moving_wall_distance"], dtype=real_dtype())
            tm.y_plus = np.asarray(data["sa_y_plus"])
            tm._accum_mask = np.asarray(data["sa_accum_mask"])
            tm.update_eddy_viscosity()
        while self.time.get_timestep() < data["__step__"]:
            self.time.increment()
        self.update_stress()
        return True

    def _end_of_step_io(self, refine_levels=None):
        """run_one_step epilogue shared by every fluid solver (reference:
        source/mpi_insim.cpp:475-489, source/mpi_supg_solver.cpp:400-424):
        VTU/PVD output at `time_to_output` (also inside FSI runs), and —
        standalone runs only — checkpoint at `time_to_save` and Kelly AMR
        at `time_to_refine` with the given (min, max) levels."""
        standalone = self.params.simulation_type == "Fluid"
        if standalone and self.time.time_to_save():
            self.save_checkpoint()
        if self.time.time_to_output():
            self.output_results()
        if standalone and self.time.time_to_refine():
            if refine_levels is None:
                gr = self.params.global_refinements[0]
                refine_levels = (gr, gr + 3)
            self.refine_mesh(*refine_levels)

    def velocity_part(self, solution=None):
        s = self.present_solution if solution is None else solution
        return np.asarray(s[:self.n_u])

    def pressure_part(self, solution=None):
        s = self.present_solution if solution is None else solution
        return np.asarray(s[self.n_u:])
