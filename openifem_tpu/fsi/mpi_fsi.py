"""MPI-semantics immersed FSI coupler (nodal coupling fields).

Reference: include/mpi_fsi.h, source/mpi_fsi.cpp.  Differences from the
serial coupler (fsi.py):
 - indicator: a fluid cell is artificial only if ALL its vertices are inside
   the solid (reference: source/mpi_fsi.cpp:292-319)
 - find_fluid_bc (body-force mode): NODAL fields — at velocity support
   points of artificial cells inside the solid,
     fsi_acc = (v_s - v_f)/dt + (grad v_f) v_f - a_s
   and at scalar support points, fsi_stress = fluid nodal viscous stress -
   interpolated solid nodal stress (reference: source/mpi_fsi.cpp:323-663)
 - find_solid_bc: fluid (p, tau) interpolated at MOVED solid boundary
   vertices into the replicated nodal field fsi_stress_rows
   (reference: source/mpi_fsi.cpp:666-867)
 - penalty contact model: redo the solid step with incremented contact
   traction until penetration < 1e-5 (reference: source/mpi_fsi.cpp:870-969)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import real_dtype
from ..mesh.mesh import FACE_VERTICES
from .fsi import FSI
from .interp import interpolate_nodal


class MPIFSI(FSI):
    def __init__(self, fluid, solid, params, use_dirichlet_bc: bool = False):
        super().__init__(fluid, solid, params, use_dirichlet_bc)
        self.penetration_criterion = None
        self.penetration_direction = None

    def _can_fuse_step(self):
        # fused MPI coupled step: body-force mode with an RKPM solid
        # (SharedHypoElasticity, the fsi-wall-3D stack) and a fluid with a
        # device FSI step; contact / turbulence / Dirichlet mode use the
        # per-phase host loop
        return (self.fused_coupled_stepping
                and not self.use_dirichlet_bc
                and self.penetration_criterion is None
                and getattr(self, "_tm", None) is None
                and hasattr(self.fluid, "make_fsi_step")
                and hasattr(self.solid, "_rk4_step_impl")
                and hasattr(self.solid, "_nodal_stress_impl"))

    def make_coupled_step(self):
        """fsi-wall-3D per-step sequence as ONE jitted dispatch
        (reference loop: source/mpi_fsi.cpp:1180-1213): solid_bc_rows ->
        RKPM RK4 step -> all-vertices indicator -> nodal fsi_stress /
        fsi_acc fields -> SUPG-family fluid Newton."""
        fluid, solid = self.fluid, self.solid
        k = self._mpi_kernels
        fluid_step = fluid.make_fsi_step()
        rdt = real_dtype()
        d = fluid.dim
        ref_verts = jnp.asarray(solid.mesh.vertices, dtype=rdt)
        from ..solvers.fluid.supg import SUPGFluidSolver
        assert isinstance(fluid, SUPGFluidSolver), \
            "fused MPI step currently supports the SUPG family fluid"

        @jax.jit
        def step(s_x, s_v, s_sigma, f_sol, f_stress):
            s_disp = (s_x - ref_verts).reshape(-1)
            rows, p_nodal, u_nodal = k.solid_bc_rows(s_disp, f_sol,
                                                     f_stress)
            x2, v2, sig2, a2 = solid._device_step_impl(
                s_x, s_v, s_sigma, rows.astype(rdt))
            indicator = k.indicator_all_vertices(x2).astype(rdt)
            solid_stress_nodal = solid._nodal_stress_impl(sig2)
            fsi_stress_nodal = k.fsi_stress_nodal(
                x2, f_stress, solid_stress_nodal, indicator)
            fsi_acc_nodal = k.fsi_acc_nodal(
                x2, f_sol, v2.reshape(-1), a2.reshape(-1), indicator)
            eddy = jnp.zeros(fluid.u_space.n_nodes, dtype=rdt)
            zc = fluid.zero_constraints
            sol2, f_stress2, rel, f_it = fluid_step(
                f_sol, indicator, fsi_acc_nodal, fsi_stress_nodal,
                f_stress, eddy, zc, zc, fluid.u_constraints,
                fluid.p_constraints)
            return (x2, v2, sig2, a2, sol2, f_stress2, indicator,
                    fsi_stress_nodal, fsi_acc_nodal, rel, f_it,
                    rows, p_nodal, u_nodal)

        return step

    def run_one_coupled_step(self, verbose: bool = False):
        fluid, solid = self.fluid, self.solid
        if getattr(self, "_coupled_step_mesh", None) is not fluid.mesh:
            self._coupled_step = self.make_coupled_step()
            self._coupled_step_mesh = fluid.mesh
        self._check_solid_hash_capacity(solid.moved_vertex_coords())
        (x2, v2, sig2, a2, sol2, f_stress2, indicator, fsi_stress_nodal,
         fsi_acc_nodal, rel, f_it, rows, p_nodal,
         u_nodal) = self._coupled_step(
            solid.x, solid.v, solid.sigma, fluid.present_solution,
            fluid.stress_device)
        if float(rel) > self.params.fluid_tolerance:
            raise RuntimeError("Too many Newton iterations!")
        # keep the host mirrors of find_solid_bc's outputs current (the
        # reference stores these on the solid for CV analysis, checkpoints
        # and the regression asserts, source/mpi_fsi.cpp:770-781)
        solid.fsi_stress_rows = rows
        solid.fluid_pressure_nodal = p_nodal
        solid.fluid_velocity_nodal = u_nodal
        solid.x, solid.v, solid.sigma, solid._acc = x2, v2, sig2, a2
        solid._sync()
        solid.time.increment()
        fluid.indicator = indicator
        fluid.fsi_stress_nodal = fsi_stress_nodal
        fluid.fsi_acc_nodal = fsi_acc_nodal
        fluid.solution_increment = sol2 - fluid.present_solution
        fluid.present_solution = sol2
        fluid.stress_device = f_stress2
        fluid.newton_iters = int(f_it)
        fluid.time.increment()
        if verbose:
            print(f"*** Time step = {fluid.time.get_timestep()}, at t = "
                  f"{fluid.time.current():.6e} (coupled device step): "
                  f"fluid {int(f_it)} Newton iters")
        solid._end_of_step_io(False)
        fluid._end_of_step_io()

    def set_penetration_criterion(self, criterion, direction):
        """criterion(points (n,dim)) -> (n,) penetration depth; direction:
        contact force direction (reference: source/mpi_fsi.cpp:1229-1237)."""
        self.penetration_criterion = criterion
        self.penetration_direction = np.asarray(direction, dtype=np.float64)

    # ------------------------------------------------------------------
    def _setup_coupling(self):
        super()._setup_coupling()
        fluid, solid = self.fluid, self.solid
        d = fluid.dim

        # eligibility for Dirichlet constraints / nodal acceleration:
        # non-cell-interior support points (reference skips points whose
        # unit coordinates are all strictly inside (0,1),
        # source/mpi_fsi.cpp:589-602)
        unit = fluid.u_space.shapes.local_nodes()
        strict_inside = ((unit > 1e-5) & (unit < 1 - 1e-5)).all(axis=1)
        eligible = np.zeros(fluid.u_space.n_nodes, dtype=bool)
        for l in range(unit.shape[0]):
            if not strict_inside[l]:
                eligible[fluid.u_space.cell_dofs[:, l]] = True
        self._u_node_eligible = jnp.asarray(eligible)

        # fluid cell vertices (for the all-vertices indicator)
        self._fluid_cell_vert_coords = jnp.asarray(
            fluid.mesh.vertices[fluid.mesh.cells], dtype=real_dtype())

        # per-node owner cell = smallest cell index containing the node
        owner = np.full(fluid.u_space.n_nodes, 2 ** 31 - 1, dtype=np.int64)
        for c in range(fluid.mesh.n_cells - 1, -1, -1):
            owner[fluid.u_space.cell_dofs[c]] = c
        self._u_node_owner = jnp.asarray(owner, dtype=jnp.int32)

        # physical shape gradients of the u space at its unit support points
        from ..fe.fevalues import _geometry_jacobians
        N, dN = fluid.u_space.shapes.evaluate(unit)
        _, Jinv, _, _ = _geometry_jacobians(fluid.mesh, unit)
        gsup = np.einsum("sld,csdx->cslx", dN, Jinv)  # (c, n_sup, nl, d)
        self._gsup = jnp.asarray(gsup, dtype=real_dtype())

        # solid boundary nodes (on non-fully-fixed faces) for find_solid_bc
        smesh = solid.mesh
        fixed_flag = (1 << d) - 1
        bnodes = set()
        for c in range(smesh.n_cells):
            for f in range(2 * d):
                bid = int(smesh.boundary_id[c, f])
                if bid < 0:
                    continue
                if self.params.solid_dirichlet_bcs.get(bid) == fixed_flag:
                    continue
                for l in solid.space.face_local_nodes[f]:
                    bnodes.add(int(solid.space.cell_dofs[c, l]))
        self._solid_bnodes = jnp.asarray(sorted(bnodes), dtype=jnp.int32)

        # turbulence-model wall functions: solid boundary vertex/face tables
        # (reference: collect_solid_boundaries/_boundary_vertices,
        # source/mpi_fsi.cpp:78-120)
        self._tm = getattr(fluid, "turbulence_model", None)
        if self._tm is not None:
            bfv = np.asarray(solid._bface_verts)        # (n_f, nfv) vert ids
            vids = np.unique(bfv)
            vindex = {int(v): i for i, v in enumerate(vids)}
            self._sb_vids = vids
            self._sb_face_vidx = np.vectorize(vindex.get)(bfv)
            adj = [[] for _ in vids]
            for fi, row in enumerate(self._sb_face_vidx):
                for vi in sorted(set(int(x) for x in row)):
                    adj[vi].append(fi)
            self._sb_vertex_faces = adj
            self.shear_velocities = np.zeros(len(vids))

        self._mpi_kernels = _MPIKernels(self)

    # ------------------------------------------------------------------
    def update_solid_box_and_indicator(self):
        k = self._mpi_kernels
        moved = self._solid_moved_verts()
        self._check_solid_hash_capacity(moved)
        self.fluid.indicator = k.indicator_all_vertices(moved).astype(
            real_dtype())

    def find_fluid_bc(self, first_step: bool = True):
        fluid, solid = self.fluid, self.solid
        k = self._mpi_kernels
        moved = self._solid_moved_verts()
        solid.update_strain_and_stress()
        solid_stress_nodal = jnp.asarray(
            solid.stress.transpose(2, 0, 1), dtype=real_dtype())

        # nodal fsi_stress difference (both modes set it; reference computes
        # it before the acceleration loop)
        fluid.fsi_stress_nodal = k.fsi_stress_nodal(
            moved, fluid.stress_device, solid_stress_nodal, fluid.indicator)

        if self._tm is not None:
            # update the SA moving-wall distance from the deformed solid
            # boundary (reference: source/mpi_fsi.cpp:655-660)
            mv = np.asarray(solid.moved_vertex_coords())
            self._tm.update_moving_wall_distance(
                mv[self._sb_vids], self._sb_face_vidx,
                self.shear_velocities)

        if not self.use_dirichlet_bc:
            fluid.fsi_acc_nodal = k.fsi_acc_nodal(
                moved, fluid.present_solution, solid.current_velocity,
                solid.current_acceleration, fluid.indicator)
            fluid.fsi_acceleration = jnp.zeros_like(fluid.fsi_acceleration)
            # nonzero inhomogeneities apply exactly once (the reference
            # copies zero_constraints over nonzero_constraints after the
            # first step, mpi_fsi.cpp:1193-1197)
            return None, (fluid.nonzero_constraints if first_step
                          else fluid.zero_constraints)
        else:
            fluid.fsi_acc_nodal = jnp.zeros_like(fluid.fsi_acc_nodal)
            mask_u, vals_u = k.dirichlet_bc_mpi(moved, solid.current_velocity)
            n = fluid.n_dofs
            mask = jnp.zeros(n, dtype=bool).at[:fluid.n_u].set(
                mask_u.reshape(-1))
            vals = jnp.zeros(n, dtype=real_dtype()).at[:fluid.n_u].set(
                vals_u.reshape(-1))
            vals = vals - jnp.where(mask, fluid.present_solution, 0.0)
            base = fluid.nonzero_constraints if first_step else \
                fluid.zero_constraints
            zero_ext = fluid.zero_constraints.with_extra_dirichlet(
                mask, jnp.zeros_like(vals))
            nonzero_ext = base.with_extra_dirichlet(mask, vals)
            return zero_ext, nonzero_ext

    def find_solid_bc(self):
        k = self._mpi_kernels
        (self.solid.fsi_stress_rows, self.solid.fluid_pressure_nodal,
         self.solid.fluid_velocity_nodal) = k.solid_bc_rows(
            self.solid.current_displacement, self.fluid.present_solution,
            self.fluid.stress_device)
        if self._tm is not None:
            self._update_shear_velocities()

    def _update_shear_velocities(self):
        """Shear velocity u_tau at each solid boundary vertex for the
        turbulence wall function (reference: source/mpi_fsi.cpp:784-844).
        The vertex normal is the UN-normalized mean of the adjacent deformed
        face unit normals (:795-800); the reference computes an image point
        but samples the fluid velocity AT the wall vertex itself (:805-814)
        — replicated literally."""
        fluid, solid = self.fluid, self.solid
        d = fluid.dim
        moved = solid.moved_vertex_coords()
        _, fn = solid._face_geometry(moved)
        fn = np.asarray(fn * solid._face_orient[:, None, None])[:, 0, :]
        vn = np.zeros((len(self._sb_vids), d))
        for vi, fl in enumerate(self._sb_vertex_faces):
            vn[vi] = fn[fl].mean(axis=0)
        pts = np.asarray(moved)[self._sb_vids]
        idx, unit, found = self._fluid_locate(
            self._fluid_hash_state, jnp.asarray(pts, dtype=real_dtype()))
        u = fluid.present_solution[:fluid.n_u].reshape(-1, d)
        u_cell_dofs = jnp.asarray(fluid.u_space.cell_dofs, dtype=jnp.int32)
        uv = np.asarray(interpolate_nodal(
            u, u_cell_dofs, idx, unit,
            fluid.params.fluid_velocity_degree, found))
        normal_part = (uv * vn).sum(axis=-1)[:, None] * vn
        tangential = np.linalg.norm(uv - normal_part, axis=-1)
        ut = self._tm.get_shear_velocity(tangential, self.shear_velocities)
        self.shear_velocities = np.where(np.asarray(found), ut, 0.0)

    # ------------------------------------------------------------------
    def apply_contact_model(self, first_step: bool):
        """reference: source/mpi_fsi.cpp:870-969."""
        solid = self.solid
        d = solid.dim
        force_increment = self.params.contact_force_multiplier
        cache = (solid.current_acceleration, solid.current_velocity,
                 solid.current_displacement, solid.previous_acceleration,
                 solid.previous_velocity, solid.previous_displacement)
        direction = self.penetration_direction
        dirn = direction / np.linalg.norm(direction)

        # all boundary faces participate (the reference loop does not skip
        # Dirichlet faces here); each (face, vertex) OCCURRENCE adds its own
        # contribution, so vertices shared by two boundary faces accumulate
        # twice — replicated exactly (reference: source/mpi_fsi.cpp:903-954).
        # Batched: verts (P,) / normals (P, d) flat pair tables, penetration
        # and traction accumulation as one masked scatter-add per retry.
        # Tables + kernel are mesh-only, cached across time steps (a fresh
        # @jax.jit closure per call would retrace every step).
        # key on the mesh OBJECT (kept alive by the reference), not id():
        # a freed mesh's address can be reused after AMR.  force_increment
        # and dirn are runtime kernel args, so changing either between
        # steps takes effect without invalidating the cache.
        if getattr(self, "_contact_cache_mesh", None) is not solid.mesh:
            fv = solid.fv
            smesh = np.asarray(solid.mesh.cells)
            fvidx = np.asarray(FACE_VERTICES[d])[np.asarray(fv.faces)]
            verts = smesh[np.asarray(fv.cells)[:, None], fvidx].reshape(-1)
            normals0 = np.asarray(fv.normals)[:, 0, :]              # (F,d)
            nrm = jnp.asarray(np.repeat(normals0, fvidx.shape[1], axis=0))
            verts_j = jnp.asarray(verts, dtype=jnp.int32)

            @jax.jit
            def _add_contact_traction(rows, pen, force_inc, dirn_j):
                # extra[p, :, d-1] = force * pen[p] * dirn / nrm[p] where
                # the normal component is usable (mpi_fsi.cpp:929-948)
                active = pen > 1e-5
                traction = (force_inc * pen[:, None] *
                            dirn_j[None, :])
                col = jnp.where(nrm > 1e-5, traction / jnp.where(
                    nrm > 1e-5, nrm, 1.0), 0.0)      # (P, d)
                col = jnp.where(active[:, None], col, 0.0)
                extra = jnp.zeros(col.shape + (d,),
                                  dtype=rows.dtype).at[..., d - 1].set(col)
                return rows.at[verts_j].add(extra), jnp.any(active)

            self._contact_cache_mesh = solid.mesh
            self._contact_verts = verts
            self._contact_kernel = _add_contact_traction
        verts = self._contact_verts
        _add_contact_traction = self._contact_kernel
        dirn_j = jnp.asarray(dirn, dtype=real_dtype())

        while True:
            solid.run_one_step(first_step)
            moved = solid.moved_vertex_coords()
            pen = jnp.asarray(self.penetration_criterion(
                np.asarray(moved)[verts]), dtype=real_dtype())
            rows, any_active = _add_contact_traction(
                jnp.asarray(solid.fsi_stress_rows, dtype=real_dtype()), pen,
                real_dtype()(force_increment), dirn_j)
            if not bool(any_active):
                break
            solid.fsi_stress_rows = rows
            (solid.current_acceleration, solid.current_velocity,
             solid.current_displacement, solid.previous_acceleration,
             solid.previous_velocity, solid.previous_displacement) = cache
            solid.time.decrement()

    # ------------------------------------------------------------------
    def run(self, verbose: bool = True):
        """reference: source/mpi_fsi.cpp:1119-1227: try restart from the
        latest checkpoints first; initial solid-interface refinement x2;
        per-step loop; interface refinement at `Refinement interval` and
        coordinated checkpoints at `Save interval`."""
        params = self.params
        # Try load from previous computation (mpi_fsi.cpp:1127-1133).
        # solid.load_checkpoint applies the solid global refinement itself
        # (solid/base.py load path), so do NOT pre-refine here.  A partial
        # pair (one checkpoint present, the other missing/mismatched) is a
        # loud error, matching the reference's unconditional AssertThrow
        # (mpi_fsi.cpp:1130-1134) — silently falling back to a fresh start
        # would leave the loaded solver's time/state advanced.
        solid_loaded = self.solid.load_checkpoint()
        fluid_loaded = self.fluid.load_checkpoint()
        if solid_loaded != fluid_loaded:
            raise RuntimeError(
                "Inconsistent restart files: solid checkpoint "
                f"{'found' if solid_loaded else 'missing'} but fluid "
                f"checkpoint {'found' if fluid_loaded else 'missing'}. "
                "Check and remove inconsistent restart files!")
        success_load = solid_loaded
        if success_load:
            assert abs(self.solid.time.current() -
                       self.fluid.time.current()) < 1e-12, (
                "Solid and fluid restart files have different time steps. "
                "Check and remove inconsistent restart files!")
            while self.time.get_timestep() < self.solid.time.get_timestep():
                self.time.increment()
        else:
            self.solid.mesh = self.solid.mesh.refine_global(
                params.global_refinements[1])
            self.solid.setup()
            self.fluid.mesh = self.fluid.mesh.refine_global(
                params.global_refinements[0])
            self.fluid.setup()
        self._enable_fluid_mg()
        tm = getattr(self.fluid, "turbulence_model", None)
        if tm is not None and not hasattr(tm, "space"):
            tm.setup()
        self._setup_coupling()

        gr = params.global_refinements[0]
        if params.refinement_interval < params.end_time:
            # initial interface refinement x2 (mpi_fsi.cpp:1164-1171)
            self.refine_mesh(gr, gr + 3, verbose=verbose)
            self.refine_mesh(gr, gr + 3, verbose=verbose)

        if verbose:
            print(f"MPIFSI: fluid cells/dofs [{self.fluid.mesh.n_cells}, "
                  f"{self.fluid.n_dofs}], solid cells/dofs "
                  f"[{self.solid.mesh.n_cells}, {self.solid.n_dofs}]")

        from ..utils.timer import Timer
        self.timer = getattr(self, "timer", None) or Timer("MPIFSI")
        first_step = not success_load
        while self.time.end() - self.time.current() > 1e-12:
            if not first_step and self._can_fuse_step():
                with self.timer.scope("Coupled device step"):
                    self.run_one_coupled_step(verbose)
                self.time.increment()
                if self.time.time_to_refine():
                    self.refine_mesh(gr, gr + 3, verbose=verbose)
                if self.time.time_to_save():
                    self.save_checkpoint()
                continue
            with self.timer.scope("Find solid BC"):
                self.find_solid_bc()
            with self.timer.scope("Run solid solver"):
                if self.penetration_criterion is not None:
                    self.apply_contact_model(first_step)
                else:
                    self.solid.run_one_step(first_step)
            with self.timer.scope("Update indicator"):
                self.update_solid_box_and_indicator()
            if self._tm is not None:
                # per-step SA Dirichlet rows from last step's wall distances
                # (reference: source/mpi_fsi.cpp:1199-1203)
                self._tm.update_boundary_condition(first_step)
            with self.timer.scope("Find fluid BC"):
                zero_ext, nonzero_ext = self.find_fluid_bc(first_step)
            if self._tm is not None:
                with self.timer.scope("Run turbulence model"):
                    self._tm.run_one_step(True)
            with self.timer.scope("Run fluid solver"):
                self._run_fluid_step(zero_ext, nonzero_ext, verbose)
            first_step = False
            self.time.increment()
            if self.time.time_to_refine():
                # solid-interface-distance refinement + coupling rebuild
                # (mpi_fsi.cpp:1215-1220)
                self.refine_mesh(gr, gr + 3, verbose=verbose)
            if self.time.time_to_save():
                # coordinated checkpoints (mpi_fsi.cpp:1221-1225)
                self.save_checkpoint()


class _MPIKernels:
    def __init__(self, fsi: MPIFSI):
        fluid, solid = fsi.fluid, fsi.solid
        d = fluid.dim
        scell = fsi._solid_cells
        sdeg = solid.params.solid_degree
        s_space_dofs = jnp.asarray(solid.space.cell_dofs, dtype=jnp.int32)
        u_cell_dofs = jnp.asarray(fluid.u_space.cell_dofs, dtype=jnp.int32)
        dt = fsi.params.time_step

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
        def indicator_all_vertices(moved):
            """all cell vertices inside -> artificial
            (reference: source/mpi_fsi.cpp:292-319)."""
            verts = fsi._fluid_cell_vert_coords  # (n_c, nv, d)
            n_c, nv, _ = verts.shape
            _, _, found = points_in_solid(verts.reshape(-1, d), moved)
            return found.reshape(n_c, nv).all(axis=1)

        @jax.jit
        def fsi_stress_nodal(moved, fluid_stress, solid_stress, indicator):
            """fluid nodal stress - interpolated solid nodal stress on
            covered scalar dofs (reference: source/mpi_fsi.cpp:411-476)."""
            pts = fsi._fluid_u_points
            # node is considered if it belongs to ANY indicator cell
            node_in_ind_cell = jnp.zeros(fluid.u_space.n_nodes,
                                         dtype=bool).at[
                u_cell_dofs.reshape(-1)].max(
                jnp.broadcast_to(indicator[:, None] > 0,
                                 u_cell_dofs.shape).reshape(-1))
            idx, unit, found = points_in_solid(pts, moved)
            s_scalar = interpolate_nodal(solid_stress, s_space_dofs, idx,
                                         unit, sdeg, found)
            active = node_in_ind_cell & found
            diff = fluid_stress - s_scalar
            return jnp.where(active[:, None, None], diff, 0.0)

        @jax.jit
        def fsi_acc_nodal(moved, fluid_solution, solid_vel, solid_acc,
                          indicator):
            """(v_s - v_f)/dt + (grad v_f) v_f - a_s at velocity support
            points (reference: source/mpi_fsi.cpp:478-566)."""
            pts = fsi._fluid_u_points
            u = fluid_solution[:fluid.n_u].reshape(-1, d)
            ul = u[u_cell_dofs]                        # (c, nl, d)
            # gradient at each cell's support points
            gv = jnp.einsum("cslx,cla->csax", fsi._gsup, ul)
            # per-node gradient from the owner cell
            owner = fsi._u_node_owner
            n_nodes = fluid.u_space.n_nodes
            grad_at_node = jnp.zeros((n_nodes, d, d),
                                     dtype=fluid_solution.dtype)
            # scatter: node s of cell c contributes if owner[node]==c
            flat_nodes = u_cell_dofs.reshape(-1)
            c_ids = jnp.repeat(jnp.arange(u_cell_dofs.shape[0],
                                          dtype=jnp.int32),
                               u_cell_dofs.shape[1])
            sel = (owner[flat_nodes] == c_ids).astype(fluid_solution.dtype)
            grad_at_node = grad_at_node.at[flat_nodes].add(
                gv.reshape(-1, d, d) * sel[:, None, None])

            idx, unit, found = points_in_solid(pts, moved)
            vs = interpolate_nodal(solid_vel.reshape(-1, d), s_space_dofs,
                                   idx, unit, sdeg, found)
            a_s = interpolate_nodal(solid_acc.reshape(-1, d), s_space_dofs,
                                    idx, unit, sdeg, found)
            node_in_ind_cell = jnp.zeros(n_nodes, dtype=bool).at[
                u_cell_dofs.reshape(-1)].max(
                jnp.broadcast_to(indicator[:, None] > 0,
                                 u_cell_dofs.shape).reshape(-1))
            fluid_acc = (vs - u) / dt + jnp.einsum("nab,nb->na",
                                                   grad_at_node, u)
            val = fluid_acc - a_s
            # NOTE: unlike the Dirichlet branch (mpi_fsi.cpp:590-602), the
            # body-force branch sets fsi_acceleration at ALL velocity
            # support points, including cell-interior ones
            # (mpi_fsi.cpp:478-566) — no _u_node_eligible mask here.
            active = node_in_ind_cell & found
            return jnp.where(active[:, None], val, 0.0)

        @jax.jit
        def dirichlet_bc_mpi(moved, solid_vel):
            pts = fsi._fluid_u_points
            idx, unit, found = points_in_solid(pts, moved)
            inside = found & fsi._u_node_eligible
            v_s = interpolate_nodal(solid_vel.reshape(-1, d), s_space_dofs,
                                    idx, unit, sdeg, found)
            mask = jnp.broadcast_to(inside[:, None], v_s.shape)
            return mask, jnp.where(mask, v_s, 0.0)

        bnodes = fsi._solid_bnodes
        fdeg = fluid.params.fluid_velocity_degree
        p_cell_dofs = jnp.asarray(fluid.p_space.cell_dofs, dtype=jnp.int32)
        s_node_ref = jnp.asarray(solid.space.node_points,
                                 dtype=real_dtype())
        n_sv = fsi._n_sv

        @jax.jit
        def solid_bc_rows(solid_disp, fluid_solution, fluid_stress):
            """sigma = -p I + tau at moved solid boundary nodes
            (reference: source/mpi_fsi.cpp:666-867)."""
            d_full = solid_disp.reshape(-1, d)
            pts = s_node_ref[bnodes] + d_full[bnodes]
            idx, unit, found = fsi._fluid_locate(fsi._fluid_hash_state,
                                                 pts)
            p_nodes = fluid_solution[fluid.n_u:]
            p_val = interpolate_nodal(p_nodes, p_cell_dofs, idx, unit,
                                      fluid.params.fluid_pressure_degree,
                                      found)
            tau = interpolate_nodal(fluid_stress, u_cell_dofs, idx, unit,
                                    fdeg, found)
            I = jnp.eye(d, dtype=fluid_solution.dtype)
            sigma = -p_val[:, None, None] * I + tau
            rows = jnp.zeros((solid.space.n_nodes, d, d),
                             dtype=fluid_solution.dtype)
            # fluid pressure / velocity at the boundary vertices (reference
            # stores them on the solid for CV drag / friction work and the
            # boundary trace, source/mpi_fsi.cpp:770-781)
            u = fluid_solution[:fluid.n_u].reshape(-1, d)
            u_val = interpolate_nodal(u, u_cell_dofs, idx, unit, fdeg, found)
            p_nodal = jnp.zeros(solid.space.n_nodes,
                                dtype=fluid_solution.dtype
                                ).at[bnodes].set(p_val)
            u_nodal = jnp.zeros((solid.space.n_nodes, d),
                                dtype=fluid_solution.dtype
                                ).at[bnodes].set(u_val)
            return rows.at[bnodes].set(sigma), p_nodal, u_nodal

        self.indicator_all_vertices = indicator_all_vertices
        self.fsi_stress_nodal = fsi_stress_nodal
        self.fsi_acc_nodal = fsi_acc_nodal
        self.dirichlet_bc_mpi = dirichlet_bc_mpi
        self.solid_bc_rows = solid_bc_rows
