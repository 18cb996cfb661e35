"""Immersed FSI coupling driver (serial semantics).

Reference: include/fsi.h, source/fsi.cpp.  The mIFEM loop per step:
  1. find_solid_bc: interpolate fluid stress -> solid boundary traction
  2. advance the solid
  3. update solid box + indicator field (fluid cells covered by solid)
  4. find_fluid_bc: FSI body force (and/or Dirichlet velocity constraints
     interpolated from the solid) on the artificial fluid
  5. advance the fluid
All geometric queries are batched JAX kernels (fsi/interp.py) instead of the
reference's per-point cell walks."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import real_dtype
from ..parameters import AllParameters
from ..utils.timectl import Time
from .interp import interpolate_nodal, make_cell_hash, plan_cell_hash


class FSI:
    def __init__(self, fluid, solid, params: AllParameters,
                 use_dirichlet_bc: bool = False):
        self.fluid = fluid
        self.solid = solid
        self.params = params
        self.use_dirichlet_bc = use_dirichlet_bc
        self.time = Time(params.end_time, params.time_step,
                         params.output_interval, params.refinement_interval,
                         params.save_interval)
        # optional nested coarse-mesh list (coarsest first, all geometrically
        # nested under the fluid mesh) for the fluid pressure V-cycle; when
        # set, the hierarchy [bases..., current fluid mesh] is (re)attached
        # after every fluid setup — including AMR rebuilds, where the
        # adapted mesh still nests under the original base grid
        self.fluid_mg_base = None

    def _enable_fluid_mg(self):
        fl = self.fluid
        if (self.fluid_mg_base and hasattr(fl, "enable_pressure_mg")
                and fl.params.fluid_pressure_degree == 1):
            bases = [m for m in self.fluid_mg_base
                     if m.n_cells < fl.mesh.n_cells]
            if bases:
                fl.enable_pressure_mg(bases + [fl.mesh],
                      fixed_prefix=False)

    # ------------------------------------------------------------------
    def _setup_coupling(self):
        """Precompute static coupling tables (device arrays)."""
        fluid, solid = self.fluid, self.solid
        d = fluid.dim
        smesh = solid.mesh
        self._solid_cells = jnp.asarray(smesh.cells, dtype=jnp.int32)
        self._solid_ref_verts = jnp.asarray(smesh.vertices,
                                            dtype=real_dtype())
        self._n_sv = smesh.n_vertices

        # fluid cell centers (vertex average, = deal.II cell->center())
        self._fluid_centers = jnp.asarray(fluid.mesh.cell_centers(),
                                          dtype=real_dtype())
        self._fluid_u_points = jnp.asarray(fluid.u_space.node_points,
                                           dtype=real_dtype())

        # velocity support points eligible for FSI Dirichlet constraints:
        # the reference constrains support points that lie on a zero-unit-
        # coordinate face of some cell (reference: source/fsi.cpp:262-276),
        # i.e. all vertex/edge nodes except cell bubbles and nodes only on
        # the domain's +x/+y boundaries.
        eligible = np.zeros(fluid.u_space.n_nodes, dtype=bool)
        unit = fluid.u_space.shapes.local_nodes()
        has_zero = (np.abs(unit) < 1e-5).any(axis=1)
        for l in range(unit.shape[0]):
            if has_zero[l]:
                eligible[fluid.u_space.cell_dofs[:, l]] = True
        self._u_node_eligible = jnp.asarray(eligible)

        # solid boundary faces: endpoints (vertex ids) for moved-face
        # geometry, aligned with solid.fv entries
        fv = solid.fv
        from ..mesh.mesh import FACE_VERTICES
        face_verts = []
        for c, f in zip(np.asarray(fv.cells), np.asarray(fv.faces)):
            face_verts.append([int(smesh.cells[c, v])
                               for v in FACE_VERTICES[d][f]])
        self._solid_bface_verts = jnp.asarray(np.array(face_verts),
                                              dtype=jnp.int32)
        self._solid_bface_cells = jnp.asarray(np.asarray(fv.cells),
                                              dtype=jnp.int32)

        # fluid geometry for locating points (fluid mesh is static)
        fverts = fluid.mesh.vertices
        fcells = fluid.mesh.cells
        self._fluid_cell_verts = jnp.asarray(fverts[fcells],
                                             dtype=real_dtype())
        self._fluid_bbox_lo = jnp.asarray(fverts[fcells].min(axis=1))
        self._fluid_bbox_hi = jnp.asarray(fverts[fcells].max(axis=1))

        # grid-hash locators (candidate-list point location; O(n_p * K)
        # instead of the all-pairs O(n_p * n_c)).  Fluid mesh is static:
        # built once.  Solid moves: the build closure is called inside the
        # jitted kernels on the deformed configuration each step; planned
        # on the reference config with 2x headroom.
        fdims, fspan, fK = plan_cell_hash(fverts[fcells])
        fbuild, self._fluid_locate = make_cell_hash(
            fluid.mesh.n_cells, fdims, fspan, fK)
        self._fluid_hash_state = fbuild(self._fluid_cell_verts)
        sdims, sspan, sK = plan_cell_hash(smesh.vertices[smesh.cells],
                                          safety=2.0)
        self._solid_hash = make_cell_hash(smesh.n_cells, sdims, sspan, sK)
        self._solid_hash_plan = (sdims, sspan, sK)

        self._kernels = _FSIKernels(self)

    # ------------------------------------------------------------------
    def _solid_moved_verts(self):
        d = self.solid.dim
        disp = self.solid.current_displacement[:self._n_sv * d].reshape(
            self._n_sv, d)
        return self._solid_ref_verts + disp

    def update_solid_box_and_indicator(self):
        """reference: source/fsi.cpp:64-165."""
        k = self._kernels
        moved = self._solid_moved_verts()
        self._check_solid_hash_capacity(moved)
        indicator = k.indicator(moved)
        self.fluid.indicator = indicator.astype(real_dtype())

    # ------------------------------------------------------------------
    # fluid advance: fused single-dispatch device step when the solver
    # provides one (make_fsi_step); set device_fluid_stepping = False for
    # the instrumented host path (same converged solution either way)
    device_fluid_stepping = True
    # whole-step fusion (make_coupled_step): solid + coupling + fluid in
    # ONE dispatch per time step for non-first steps, when both solvers
    # support it; False falls back to the per-phase loop
    fused_coupled_stepping = True

    def _can_fuse_step(self):
        return (self.fused_coupled_stepping
                and hasattr(self.fluid, "make_fsi_step")
                and hasattr(self.solid, "_device_step_impl")
                and getattr(self.fluid, "turbulence_model", None) is None)

    def _run_fluid_step(self, zero_ext, nonzero_ext, verbose):
        fluid = self.fluid
        # body-force mode passes (None, None): the solver defaults apply,
        # matching run_one_step's `zero_cons or self.zero_constraints`
        zero_ext = zero_ext if zero_ext is not None else \
            fluid.zero_constraints
        nonzero_ext = nonzero_ext if nonzero_ext is not None else \
            fluid.nonzero_constraints
        fn = None
        if self.device_fluid_stepping and hasattr(fluid, "make_fsi_step"):
            # key on the mesh OBJECT (kept alive by the reference), not
            # id(): after AMR replaces fluid.mesh a freed mesh's address
            # can be reused and an id() key would silently match stale
            # jitted shape tables
            if getattr(self, "_fluid_step_mesh", None) is not fluid.mesh:
                self._fluid_step_fn = fluid.make_fsi_step()
                self._fluid_step_mesh = fluid.mesh
            fn = self._fluid_step_fn
        if fn is None:
            fluid.run_one_step(True, verbose=verbose, zero_cons=zero_ext,
                               nonzero_cons=nonzero_ext)
            return
        from ..solvers.fluid.supg import SUPGFluidSolver
        fluid.time.increment()
        if verbose:
            print(f"*** Time step = {fluid.time.get_timestep()}, "
                  f"at t = {fluid.time.current():.6e} (device step)")
        ucons = fluid._u_cons_of(zero_ext)
        if isinstance(fluid, SUPGFluidSolver):
            eddy = getattr(fluid, "eddy_viscosity_nodal", None)
            if eddy is None:
                eddy = jnp.zeros(fluid.u_space.n_nodes, dtype=real_dtype())
            sol, stress, rel, its = fn(
                fluid.present_solution, fluid.indicator,
                fluid.fsi_acc_nodal, fluid.fsi_stress_nodal,
                fluid.stress_device, eddy, zero_ext, nonzero_ext, ucons,
                fluid.p_constraints)
        else:
            sol, stress, rel, its = fn(
                fluid.present_solution, fluid.indicator,
                fluid.fsi_acceleration, fluid.fsi_stress_cell,
                fluid.fsi_acc_nodal, zero_ext, nonzero_ext, ucons,
                fluid.p_constraints)
        if float(rel) > self.params.fluid_tolerance:
            raise RuntimeError("Too many Newton iterations!")
        fluid.solution_increment = sol - fluid.present_solution
        fluid.present_solution = sol
        fluid.stress_device = stress
        fluid.newton_iters = int(its)
        fluid._end_of_step_io()


    # ------------------------------------------------------------------
    # fully-fused coupled step: solid traction -> solid Newton -> indicator
    # -> FSI fluid constraints -> fluid Newton, ONE jitted dispatch per
    # time step (the reference loop makes the same sequence of calls per
    # step, source/fsi.cpp:484-506; here the host only does time/IO
    # bookkeeping).  Requires a fluid solver with make_fsi_step and a
    # solid solver with _device_step_impl; non-first steps only (the
    # first step applies inflow inhomogeneities and the solid initial-
    # acceleration mass solve on the host path).
    def make_coupled_step(self):
        fluid, solid = self.fluid, self.solid
        k = self._kernels
        fluid_step = fluid.make_fsi_step()
        dirichlet = self.use_dirichlet_bc
        n_sv, d = self._n_sv, fluid.dim
        rdt = real_dtype()
        from ..solvers.fluid.supg import SUPGFluidSolver
        is_supg = isinstance(fluid, SUPGFluidSolver)

        @jax.jit
        def step(s_disp, s_vel, s_acc, f_sol, f_stress, fsi_stress_nodal):
            moved = self._solid_ref_verts + s_disp[:n_sv * d].reshape(
                n_sv, d)
            traction = k.solid_traction(moved, f_sol, f_stress)
            trhs = solid._fsi_traction_rhs_impl(traction)
            disp2, v2, a2, s_it = solid._device_step_impl(
                s_disp, s_vel, s_acc, trhs)
            moved2 = self._solid_ref_verts + disp2[:n_sv * d].reshape(
                n_sv, d)
            indicator = k.indicator(moved2).astype(rdt)

            n = fluid.n_dofs
            acc_nodal = jnp.zeros(fluid.n_u, dtype=rdt).reshape(-1, d)
            if dirichlet:
                fsi_acc = jnp.zeros((fluid.mesh.n_cells, d), dtype=rdt)
                mask_u, vals_u = k.dirichlet_bc(moved2, v2)
                mask = jnp.zeros(n, dtype=bool).at[:fluid.n_u].set(
                    mask_u.reshape(-1))
                vals = jnp.zeros(n, dtype=rdt).at[:fluid.n_u].set(
                    vals_u.reshape(-1))
                vals = vals - jnp.where(mask, f_sol, 0.0)
                zero_ext = fluid.zero_constraints.with_extra_dirichlet(
                    mask, jnp.zeros_like(vals))
                nonzero_ext = fluid.zero_constraints.with_extra_dirichlet(
                    mask, vals)
            else:
                fsi_acc = k.fsi_acceleration(moved2, a2, indicator)
                zero_ext = fluid.zero_constraints
                nonzero_ext = fluid.zero_constraints
            ucons = fluid._u_cons_of(zero_ext)
            if is_supg:
                eddy = jnp.zeros(fluid.u_space.n_nodes, dtype=rdt)
                sol2, stress2, rel, f_it = fluid_step(
                    f_sol, indicator, acc_nodal, fsi_stress_nodal,
                    f_stress, eddy, zero_ext, nonzero_ext, ucons,
                    fluid.p_constraints)
            else:
                stress_cell = jnp.zeros_like(fluid.fsi_stress_cell)
                sol2, stress2, rel, f_it = fluid_step(
                    f_sol, indicator, fsi_acc, stress_cell, acc_nodal,
                    zero_ext, nonzero_ext, ucons, fluid.p_constraints)
            return (disp2, v2, a2, sol2, stress2, indicator, rel, f_it,
                    s_it, traction)

        return step

    def run_one_coupled_step(self, verbose: bool = False):
        """Advance one (non-first) FSI step through the fused dispatch and
        update both solvers' host-side state + IO epilogues."""
        fluid, solid = self.fluid, self.solid
        if getattr(self, "_coupled_step_mesh", None) is not fluid.mesh:
            self._coupled_step = self.make_coupled_step()
            self._coupled_step_mesh = fluid.mesh
        self._check_solid_hash_capacity(self._solid_moved_verts())
        stress_nodal = getattr(fluid, "fsi_stress_nodal", None)
        if stress_nodal is None:
            stress_nodal = jnp.zeros((fluid.u_space.n_nodes, fluid.dim,
                                      fluid.dim), dtype=real_dtype())
        (disp2, v2, a2, sol2, stress2, indicator, rel, f_it, s_it,
         traction) = self._coupled_step(
            solid.current_displacement, solid.current_velocity,
            solid.current_acceleration, fluid.present_solution,
            fluid.stress_device, stress_nodal)
        if int(s_it) >= self.params.solid_max_iterations or \
                float(rel) > self.params.fluid_tolerance:
            raise RuntimeError("Too many Newton iterations!")
        solid.fsi_traction = traction
        solid.current_displacement = solid.previous_displacement = disp2
        solid.current_velocity = solid.previous_velocity = v2
        solid.current_acceleration = solid.previous_acceleration = a2
        solid.newton_iters = int(s_it)
        solid.time.increment()
        fluid.indicator = indicator
        fluid.solution_increment = sol2 - fluid.present_solution
        fluid.present_solution = sol2
        fluid.stress_device = stress2
        fluid.newton_iters = int(f_it)
        fluid.time.increment()
        if verbose:
            print(f"*** Time step = {fluid.time.get_timestep()}, at t = "
                  f"{fluid.time.current():.6e} (coupled device step): "
                  f"solid {int(s_it)} / fluid {int(f_it)} Newton iters")
        solid._end_of_step_io(False)
        fluid._end_of_step_io()

    def _check_solid_hash_capacity(self, moved):
        """The solid hash was planned on the reference config with 2x
        headroom; verify the DEFORMED config still fits the static
        (span, K) so the in-kernel locator cannot silently drop cells."""
        from .interp import check_cell_hash_capacity
        sdims, sspan, sK = self._solid_hash_plan
        cv = np.asarray(moved)[np.asarray(self.solid.mesh.cells)]
        check_cell_hash_capacity(cv, sdims, sspan, sK,
                                 context=" (deformed solid)")

    def find_fluid_bc(self, first_step: bool = True):
        """reference: source/fsi.cpp:168-310.  The FSI Dirichlet
        inhomogeneity is the velocity DELTA (v_solid - present), and after
        the first step the boundary-BC inhomogeneities are zeroed
        (nonzero_constraints.copy_from(zero_constraints), reference:
        source/fsi.cpp:478-484)."""
        fluid, solid = self.fluid, self.solid
        d = fluid.dim
        k = self._kernels
        moved = self._solid_moved_verts()

        if not self.use_dirichlet_bc:
            acc = k.fsi_acceleration(moved, solid.current_acceleration,
                                     fluid.indicator)
            fluid.fsi_acceleration = acc
            fluid.fsi_stress_cell = jnp.zeros_like(fluid.fsi_stress_cell)
            # after the first step the reference REPLACES the nonzero
            # constraint set with the zero one (fsi.cpp:494-499), so the
            # boundary inhomogeneities are applied exactly once — without
            # this, apply_increment would re-add the inflow value every
            # step in body-force mode
            return None, (fluid.nonzero_constraints if first_step
                          else fluid.zero_constraints)
        else:
            fluid.fsi_acceleration = jnp.zeros_like(fluid.fsi_acceleration)
            fluid.fsi_stress_cell = jnp.zeros_like(fluid.fsi_stress_cell)
            mask_u, vals_u = k.dirichlet_bc(moved, solid.current_velocity)
            n = fluid.n_dofs
            mask = jnp.zeros(n, dtype=bool).at[:fluid.n_u].set(
                mask_u.reshape(-1))
            vals = jnp.zeros(n, dtype=real_dtype()).at[:fluid.n_u].set(
                vals_u.reshape(-1))
            # the constraint value is the velocity delta
            vals = vals - jnp.where(mask, fluid.present_solution, 0.0)
            base = fluid.nonzero_constraints if first_step else \
                fluid.zero_constraints
            zero_ext = fluid.zero_constraints.with_extra_dirichlet(
                mask, jnp.zeros_like(vals))
            nonzero_ext = base.with_extra_dirichlet(mask, vals)
            return zero_ext, nonzero_ext

    def find_solid_bc(self):
        """Fluid stress -> solid boundary traction
        (reference: source/fsi.cpp:313-382)."""
        k = self._kernels
        moved = self._solid_moved_verts()
        traction = k.solid_traction(
            moved, self.fluid.present_solution, self.fluid.stress_device)
        self.solid.fsi_traction = traction

    # ------------------------------------------------------------------
    def save_checkpoint(self):
        """Coordinated solid+fluid checkpoint
        (reference: source/mpi_fsi.cpp:1221-1225)."""
        self.solid.save_checkpoint(self.time.get_timestep())
        self.fluid.save_checkpoint(self.time.get_timestep())

    def load_checkpoint(self) -> bool:
        """reference: source/mpi_fsi.cpp:1127-1133 (asserts equal times)."""
        ok = self.solid.load_checkpoint() and self.fluid.load_checkpoint()
        if not ok:
            return False
        assert abs(self.solid.time.current() - self.fluid.time.current()) \
            < 1e-12, ("Solid and fluid restart files have different time "
                      "steps!")
        while self.time.get_timestep() < self.solid.time.get_timestep():
            self.time.increment()
        return True

    # ------------------------------------------------------------------
    def refine_mesh(self, min_level: int, max_level: int,
                    verbose: bool = False):
        """Refine fluid cells within one diameter of the moved solid
        boundary and coarsen the rest (sibling families only, capped at
        min_level), with solution transfer
        (reference: source/fsi.cpp:385-456)."""
        import numpy as np
        from ..fe.transfer import transfer_nodal_field
        fluid, solid = self.fluid, self.solid
        moved = np.asarray(self._solid_moved_verts())
        # solid boundary face centers on the moved configuration
        fv = solid.fv
        from ..mesh.mesh import FACE_VERTICES
        centers = []
        for c, f in zip(np.asarray(fv.cells), np.asarray(fv.faces)):
            vs = [int(solid.mesh.cells[c, v])
                  for v in FACE_VERTICES[solid.dim][f]]
            centers.append(moved[vs].mean(axis=0))
        bpts = np.array(centers)

        fmesh = fluid.mesh
        fc = fmesh.cell_centers()
        diam = fmesh.cell_diameters()
        dist = np.linalg.norm(fc[:, None, :] - bpts[None, :, :],
                              axis=-1).min(axis=1)
        near = dist < diam
        flags = near & (fmesh.level < max_level)
        cflags = ~near
        mesh2, old_to_new = fmesh.coarsen(cflags, min_level)
        if not flags.any() and mesh2.n_cells == fmesh.n_cells:
            return
        old_mesh = fmesh
        old_u_space, old_p_space = fluid.u_space, fluid.p_space
        old_solution = fluid.present_solution
        n_u_old = fluid.n_u

        rflags = np.zeros(mesh2.n_cells, dtype=bool)
        rflags[old_to_new[flags]] = True
        fluid.mesh = mesh2.refine(rflags)
        fluid.setup()
        self._enable_fluid_mg()
        if verbose:
            print(f"FSI refine: {old_mesh.n_cells} -> "
                  f"{fluid.mesh.n_cells} fluid cells")
        u_old = old_solution[:n_u_old].reshape(-1, fluid.dim)
        u_new = transfer_nodal_field(old_mesh, old_u_space, u_old,
                                     fluid.u_space.node_points)
        p_new = transfer_nodal_field(old_mesh, old_p_space,
                                     old_solution[n_u_old:],
                                     fluid.p_space.node_points)
        sol = jnp.concatenate([u_new.reshape(-1), p_new])
        fluid.present_solution = fluid.nonzero_constraints.distribute(sol)
        fluid.update_stress()
        # attached turbulence model: transfer nu~ and rebuild its tables on
        # the refined mesh (reference pre/post_refine_mesh,
        # source/mpi_fsi.cpp:1092-1117)
        tm = getattr(fluid, "turbulence_model", None)
        if tm is not None and hasattr(tm, "space"):
            nu_old = tm.present_solution
            tm.setup()
            tm.present_solution = transfer_nodal_field(
                old_mesh, old_u_space, nu_old, fluid.u_space.node_points)
            tm.update_eddy_viscosity()
        self._setup_coupling()

    # ------------------------------------------------------------------
    def run(self, verbose: bool = True):
        """reference: source/fsi.cpp:459-516."""
        params = self.params
        self.solid.mesh = self.solid.mesh.refine_global(
            params.global_refinements[1])
        self.solid.setup()
        self.fluid.mesh = self.fluid.mesh.refine_global(
            params.global_refinements[0])
        self.fluid.setup()
        self._enable_fluid_mg()
        self._setup_coupling()

        if params.refinement_interval < params.end_time:
            # initial interface refinement x2 (reference: fsi.cpp:499-506)
            gr = params.global_refinements[0]
            self.refine_mesh(gr, gr + 1, verbose=verbose)
            self.refine_mesh(gr, gr + 1, verbose=verbose)

        if verbose:
            print(f"FSI: fluid cells/dofs [{self.fluid.mesh.n_cells}, "
                  f"{self.fluid.n_dofs}], solid cells/dofs "
                  f"[{self.solid.mesh.n_cells}, {self.solid.n_dofs}]")

        from ..utils.timer import Timer
        self.timer = Timer("FSI")
        first_step = True
        while self.time.end() - self.time.current() > 1e-12:
            if not first_step and self._can_fuse_step():
                with self.timer.scope("Coupled device step"):
                    self.run_one_coupled_step(verbose)
                self.time.increment()
                if self.time.time_to_refine():
                    gr = params.global_refinements[0]
                    self.refine_mesh(gr, gr + 1, verbose=verbose)
                if self.time.time_to_save():
                    self.save_checkpoint()
                continue
            with self.timer.scope("Find solid BC"):
                self.find_solid_bc()
            with self.timer.scope("Run solid solver"):
                self.solid.run_one_step(first_step)
            with self.timer.scope("Update indicator"):
                self.update_solid_box_and_indicator()
            with self.timer.scope("Find fluid BC"):
                zero_ext, nonzero_ext = self.find_fluid_bc(first_step)
            with self.timer.scope("Run fluid solver"):
                self._run_fluid_step(zero_ext, nonzero_ext, verbose)
            first_step = False
            self.time.increment()
            if self.time.time_to_refine():
                gr = params.global_refinements[0]
                self.refine_mesh(gr, gr + 1, verbose=verbose)
            if self.time.time_to_save():
                self.save_checkpoint()


class _FSIKernels:
    """Jitted coupling kernels bound to static mesh tables."""

    def __init__(self, fsi: FSI):
        fluid, solid = fsi.fluid, fsi.solid
        d = fluid.dim
        scell = fsi._solid_cells
        sdeg = solid.params.solid_degree
        s_space_dofs = jnp.asarray(solid.space.cell_dofs, dtype=jnp.int32)
        u_space_dofs = jnp.asarray(fluid.u_space.cell_dofs, dtype=jnp.int32)
        n_sv = fsi._n_sv

        s_build, s_locate = fsi._solid_hash

        def points_in_solid(points, moved):
            cv = moved[scell]
            state = s_build(cv)  # rebuilt on the deformed config in-kernel
            idx, unit, found = s_locate(state, points)
            box_lo = moved.min(axis=0)
            box_hi = moved.max(axis=0)
            inbox = jnp.all((points >= box_lo) & (points <= box_hi), axis=-1)
            return idx, unit, found & inbox

        @jax.jit
        def indicator(moved):
            _, _, found = points_in_solid(fsi._fluid_centers, moved)
            return found

        @jax.jit
        def fsi_acceleration(moved, solid_acc, indicator_field):
            """(rho_s - rho_f)(g - a_s) at covered fluid cell centers
            (reference: source/fsi.cpp:241-251)."""
            idx, unit, found = points_in_solid(fsi._fluid_centers, moved)
            acc_nodes = solid_acc.reshape(-1, d)
            a_s = interpolate_nodal(acc_nodes, s_space_dofs, idx, unit,
                                    sdeg, found)
            g = jnp.zeros(d, dtype=moved.dtype)
            g = g.at[:len(fsi.params.gravity)].set(
                jnp.asarray(fsi.params.gravity[:d], dtype=moved.dtype))
            acc = (fsi.params.solid_rho - fsi.params.fluid_rho) * (g - a_s)
            return acc * indicator_field[:, None]

        @jax.jit
        def dirichlet_bc(moved, solid_vel):
            """FSI velocity constraints at covered fluid support points
            (reference: source/fsi.cpp:252-297)."""
            pts = fsi._fluid_u_points
            idx, unit, found = points_in_solid(pts, moved)
            inside = found & fsi._u_node_eligible
            v_nodes = solid_vel.reshape(-1, d)
            v_s = interpolate_nodal(v_nodes, s_space_dofs, idx, unit, sdeg,
                                    found)
            mask = jnp.broadcast_to(inside[:, None], v_s.shape)
            return mask, jnp.where(mask, v_s, 0.0)

        fdeg = fluid.params.fluid_velocity_degree
        bface = fsi._solid_bface_verts  # (n_bf, 2**(d-1)) vertex ids

        @jax.jit
        def solid_traction(moved, fluid_solution, fluid_stress_nodes):
            """traction = (-p I + tau) n at moved solid boundary face
            centers (reference: source/fsi.cpp:313-382).
            fluid_stress_nodes: (n_scalar_nodes, d, d)."""
            fverts = moved[bface]              # (n_bf, nfv, d)
            centers = fverts.mean(axis=1)
            # locate in the (static) fluid mesh via the grid hash
            idx, unit, found = fsi._fluid_locate(fsi._fluid_hash_state,
                                                 centers)
            u_nodes = fluid_solution[:fluid.n_u].reshape(-1, d)
            p_nodes = fluid_solution[fluid.n_u:]
            p_cell_dofs = jnp.asarray(fluid.p_space.cell_dofs,
                                      dtype=jnp.int32)
            p_val = interpolate_nodal(p_nodes, p_cell_dofs, idx, unit,
                                      fluid.params.fluid_pressure_degree,
                                      found)
            tau = interpolate_nodal(fluid_stress_nodes, u_space_dofs, idx,
                                    unit, fdeg, found)
            I = jnp.eye(d, dtype=moved.dtype)
            sigma = -p_val[:, None, None] * I + tau
            # outward normal of the moved face
            if d == 2:
                t = fverts[:, 1] - fverts[:, 0]
                n = jnp.stack([t[:, 1], -t[:, 0]], axis=-1)
            else:
                t1 = fverts[:, 1] - fverts[:, 0]
                t2 = fverts[:, 2] - fverts[:, 0]
                n = jnp.cross(t1, t2)
            n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
            # orient outward: away from the moved cell center
            ccenters = moved[scell[fsi._solid_bface_cells]].mean(axis=1)
            sign = jnp.sign(jnp.einsum("fd,fd->f", n, centers - ccenters))
            n = n * jnp.where(sign == 0, 1.0, sign)[:, None]
            return jnp.einsum("fab,fb->fa", sigma, n)

        self.indicator = indicator
        self.fsi_acceleration = fsi_acceleration
        self.dirichlet_bc = dirichlet_bc
        self.solid_traction = solid_traction
