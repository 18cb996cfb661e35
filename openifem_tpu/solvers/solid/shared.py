"""FSI-side ("shared") solid solvers.

Reference: include/mpi_shared_solid_solver.h, source/mpi_shared_solid_solver.cpp
(base: replicated mesh — trivially satisfied here since solid state is
replicated on every chip), source/mpi_shared_linear_elasticity.cpp (HHT-alpha
viscoelastic), source/mpi_shared_hyper_elasticity.cpp (Newmark hyperelastic).

Differences from the standalone solvers:
 - FSI traction is a replicated NODAL stress field `fsi_stress_rows`
   (n_nodes, dim, dim) interpolated on the displacement-MOVED boundary faces
   with current-configuration JxW and normals
   (reference: source/mpi_shared_linear_elasticity.cpp:196-257).
 - initial velocity from the parameter file
   (reference: source/mpi_shared_solid_solver.cpp:156-196).
 - SharedLinearElasticity integrates with HHT-alpha: alpha = -damping,
   gamma = 0.5 - alpha, beta_assemble = (1+alpha)^2/4 in the system matrix
   but beta_run = (1-alpha)^2/4 in the update formulas — the reference uses
   both literally and we replicate it exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...config import real_dtype
from ...fe.shapes import gauss_quadrature
from ...la.operators import element_diag, element_matvec
from ...mesh.mesh import FACE_VERTICES
from .base import SolidSolverBase
from .hyper import HyperElasticity
from .materials import linear_elasticity_tensor, viscosity_tensor


class SharedSolidMixin:
    """Nodal fsi_stress_rows + moved-face traction + initial velocity."""

    def _setup_shared_faces(self):
        """Face tables for fsi_stress_rows traction on moved faces; needs
        only self.{dim, space, fv, mesh, params} (no FE constraints), so
        the meshfree SharedHypoElasticity reuses it."""
        d = self.dim
        rdt = real_dtype()
        self.fsi_stress_rows = jnp.zeros((self.space.n_nodes, d, d),
                                         dtype=rdt)
        fv = self.fv
        mesh = self.mesh
        # face vertex ids + reference outward orientation signs
        bverts = []
        for c, f in zip(np.asarray(fv.cells), np.asarray(fv.faces)):
            bverts.append([int(mesh.cells[c, v])
                           for v in FACE_VERTICES[d][f]])
        self._bface_verts = jnp.asarray(np.array(bverts), dtype=jnp.int32)
        # face-local geometry shapes at face quadrature points
        qp_f, qw_f = gauss_quadrature(self.params.solid_degree + 1, d - 1)
        self._face_qw = jnp.asarray(qw_f, dtype=rdt)
        if d == 2:
            self._face_Ng = None  # segment: handled in closed form
        else:
            from ...fe.shapes import QkShapes
            Ng, dNg = QkShapes(1, 2).evaluate(qp_f)
            self._face_Ng = jnp.asarray(Ng, dtype=rdt)       # (nq, 4)
            self._face_dNg = jnp.asarray(dNg, dtype=rdt)     # (nq, 4, 2)
        # orientation: match the reference-configuration outward normals
        ref_geom = self._face_geometry(jnp.asarray(mesh.vertices,
                                                   dtype=rdt))
        ref_n = np.asarray(fv.normals)  # outward on reference mesh
        dots = np.einsum("fqa,fqa->f", np.asarray(ref_geom[1]), ref_n)
        self._face_orient = jnp.asarray(np.sign(dots), dtype=rdt)
        self._n_sv = mesh.n_vertices

    def _setup_shared(self):
        d = self.dim
        rdt = real_dtype()
        self._setup_shared_faces()

        # initial velocity (reference: mpi_shared_solid_solver.cpp:156-196)
        iv = np.zeros(d)
        iv[:len(self.params.initial_velocity)] = \
            self.params.initial_velocity[:d]
        if np.any(iv != 0):
            v0 = np.tile(iv, self.space.n_nodes)
            v0j = self.constraints.distribute(
                jnp.asarray(v0, dtype=rdt))
            self.previous_velocity = v0j
            self.current_velocity = v0j

    def _face_geometry(self, vert_coords):
        """(JxW (n_f, n_q), unit normals (n_f, n_q, d)) of the boundary
        faces at given vertex coordinates (unoriented; multiply normals by
        self._face_orient after setup)."""
        d = self.dim
        coords = vert_coords[self._bface_verts]  # (n_f, nfv, d)
        n_q = len(self._face_qw)
        if d == 2:
            t = coords[:, 1] - coords[:, 0]              # (n_f, 2)
            length = jnp.linalg.norm(t, axis=-1)
            n = jnp.stack([t[:, 1], -t[:, 0]], axis=-1) / length[:, None]
            JxW = length[:, None] * self._face_qw[None, :]
            normals = jnp.broadcast_to(n[:, None, :], (len(t), n_q, 2))
            return JxW, normals
        Pxi = jnp.einsum("qvx,fvd->fqxd", self._face_dNg, coords)
        nvec = jnp.cross(Pxi[:, :, 0, :], Pxi[:, :, 1, :])
        mag = jnp.linalg.norm(nvec, axis=-1)
        normals = nvec / mag[..., None]
        JxW = mag * self._face_qw[None, :]
        return JxW, normals

    def moved_vertex_coords(self):
        d = self.dim
        disp = self.current_displacement[:self._n_sv * d].reshape(-1, d)
        return jnp.asarray(self.mesh.vertices,
                           dtype=real_dtype()) + disp

    def _fsi_traction_rhs(self):
        """Traction from nodal fsi_stress_rows on MOVED faces."""
        fv = self.fv
        d = self.dim
        JxW, normals = self._face_geometry(self.moved_vertex_coords())
        normals = normals * self._face_orient[:, None, None]
        # interpolate nodal stress rows at face q points (volume shapes)
        cell_nodes = self.space.cell_dofs[np.asarray(fv.cells)]
        rows = self.fsi_stress_rows[jnp.asarray(cell_nodes)]  # (f, nl, d, d)
        sig_q = jnp.einsum("fql,flab->fqab", jnp.asarray(fv.N), rows)
        t_q = jnp.einsum("fqab,fqb->fqa", sig_q, normals)
        # rhs[(l,a)] += N_l t_a JxW(moved)
        rl = jnp.einsum("fqi,fqa,fq->fia", jnp.asarray(fv.N), t_q, JxW)
        n_f = rl.shape[0]
        face_cell_dofs = self.sys.cell_dofs[np.asarray(fv.cells)]
        return jnp.zeros(self.n_dofs, dtype=real_dtype()).at[
            face_cell_dofs.reshape(-1)].add(rl.reshape(n_f, -1).reshape(-1))


class SharedLinearElasticity(SharedSolidMixin, SolidSolverBase):
    """HHT-alpha linear viscoelasticity
    (reference: source/mpi_shared_linear_elasticity.cpp)."""

    def _assemble_constant(self):
        params = self.params
        d = self.dim
        cv = self.cv
        n_c, n_q, nl, _ = cv.grad.shape
        rho = params.solid_rho
        rdt = real_dtype()

        alpha = -params.damping
        gamma = 0.5 - alpha
        beta_a = (1 + alpha) ** 2 / 4
        beta_r = (1 - alpha) ** 2 / 4
        self._alpha, self._gamma = alpha, gamma
        self._beta_a, self._beta_r = beta_a, beta_r
        dt = self.time.get_delta_t()

        C_parts = np.stack([
            linear_elasticity_tensor(params.E[i], params.nu[i], d)
            for i in range(params.n_solid_parts)])
        V_parts = np.stack([viscosity_tensor(params.eta[i], d)
                            for i in range(params.n_solid_parts)])
        mat = np.asarray(self.mesh.material_id)
        if params.n_solid_parts == 1:
            mat = np.ones_like(mat)
        C_cells = C_parts[mat - 1]
        V_cells = V_parts[mat - 1]

        K = np.einsum("cqlx,caxby,cqmy,cq->clamb", cv.grad, C_cells, cv.grad,
                      cv.JxW, optimize=True).reshape(n_c, nl * d, nl * d)
        Cd = np.einsum("cqlx,caxby,cqmy,cq->clamb", cv.grad, V_cells,
                       cv.grad, cv.JxW, optimize=True).reshape(
            n_c, nl * d, nl * d)
        Ms = np.einsum("qi,qj,cq->cij", cv.N, cv.N, cv.JxW)
        Mv = np.einsum("cij,ab->ciajb", Ms, np.eye(d)).reshape(
            n_c, nl * d, nl * d) * rho

        self.K_loc = jnp.asarray(K, dtype=rdt)
        self.C_loc = jnp.asarray(Cd, dtype=rdt)
        self.M_loc = jnp.asarray(Mv, dtype=rdt)
        self.A_loc = (self.M_loc + ((1 + alpha) * gamma * dt) * self.C_loc +
                      ((1 + alpha) * beta_a * dt * dt) * self.K_loc)
        self.cell_dofs = jnp.asarray(self.sys.cell_dofs, dtype=jnp.int32)

        g = np.zeros(d)
        g[:len(params.gravity)] = params.gravity[:d]
        rl = np.einsum("qi,cq,a->cia", cv.N, cv.JxW, g).reshape(n_c, -1) * rho
        rhs_g = np.zeros(self.n_dofs)
        np.add.at(rhs_g, self.sys.cell_dofs.ravel(), rl.ravel())
        self.gravity_rhs = jnp.asarray(rhs_g, dtype=rdt)
        self._standalone_traction = self._standalone_face_traction(
            skip_dirichlet_faces=False)

        cons = self.constraints
        op_A = cons.wrap_operator(lambda x: element_matvec(
            self.A_loc, self.cell_dofs, self.n_dofs, x))
        op_M = cons.wrap_operator(lambda x: element_matvec(
            self.M_loc, self.cell_dofs, self.n_dofs, x))
        self._apply_K = jax.jit(lambda x: element_matvec(
            self.K_loc, self.cell_dofs, self.n_dofs, x))
        self._apply_C = jax.jit(lambda x: element_matvec(
            self.C_loc, self.cell_dofs, self.n_dofs, x))
        diag_A = jnp.where(cons.fixed, 1.0, element_diag(
            self.A_loc, self.cell_dofs, self.n_dofs))
        diag_M = jnp.where(cons.fixed, 1.0, element_diag(
            self.M_loc, self.cell_dofs, self.n_dofs))
        self._solve_A = self.make_cg_solver(op_A, diag_A)
        self._solve_M = self.make_cg_solver(op_M, diag_M)
        self._setup_shared()

    def assemble_rhs(self):
        if self.params.simulation_type == "FSI":
            return self.gravity_rhs + self._fsi_traction_rhs()
        return self.gravity_rhs + self.traction_rhs(self._standalone_traction)

    def run_one_step(self, first_step: bool):
        params = self.params
        dt = self.time.get_delta_t()
        alpha, gamma = self._alpha, self._gamma
        beta_r = self._beta_r
        cons = self.constraints

        if first_step:
            rhs = self.assemble_rhs()
            b = cons.condense_rhs(rhs)
            res = self._solve_M(b, 1e-6 * jnp.linalg.norm(b))
            self.previous_acceleration = cons.distribute(res.x)

        self.time.increment()

        rhs = self.assemble_rhs()
        d_pred = (self.previous_displacement +
                  (1 + alpha) * dt * self.previous_velocity +
                  (0.5 - beta_r) * dt * dt * (1 + alpha) *
                  self.previous_acceleration)
        v_pred = (self.previous_velocity +
                  (1 + alpha) * (1 - gamma) * dt * self.previous_acceleration)
        rhs = rhs - self._apply_K(d_pred) - self._apply_C(v_pred)
        b = cons.condense_rhs(rhs)
        res = self._solve_A(b, 1e-6 * jnp.linalg.norm(b))
        a_new = cons.distribute(res.x)

        v_new = (self.previous_velocity + dt * (1 - gamma) *
                 self.previous_acceleration + dt * gamma * a_new)
        d_new = (self.previous_displacement + dt * self.previous_velocity +
                 dt * dt * (0.5 - beta_r) * self.previous_acceleration +
                 dt * dt * beta_r * a_new)
        self.current_acceleration = a_new
        self.current_velocity = v_new
        self.current_displacement = d_new
        self.previous_acceleration = a_new
        self.previous_velocity = v_new
        self.previous_displacement = d_new
        self.lin_iters = int(res.iters)
        # reference: source/mpi_shared_linear_elasticity.cpp:378-398
        # (refine/save guarded by simulation type there)
        self._end_of_step_io(first_step, refine_levels=(1, 4))

    def _stress_from_strain(self, eps, gradu):
        params = self.params
        C_parts = np.stack([
            linear_elasticity_tensor(params.E[i], params.nu[i], self.dim)
            for i in range(params.n_solid_parts)])
        mat = np.asarray(self.mesh.material_id)
        if params.n_solid_parts == 1:
            mat = np.ones_like(mat)
        return np.einsum("cijkl,cqkl->cqij", C_parts[mat - 1], eps)


class SharedHyperElasticity(SharedSolidMixin, HyperElasticity):
    """Newmark hyperelastic FSI-side solid
    (reference: source/mpi_shared_hyper_elasticity.cpp)."""

    def _assemble_constant(self):
        super()._assemble_constant()
        self._setup_shared()

    def _external_traction_rhs(self):
        if self.params.simulation_type == "FSI":
            return self._fsi_traction_rhs()
        return self.traction_rhs(self._standalone_traction)
