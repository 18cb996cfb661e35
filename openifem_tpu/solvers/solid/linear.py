"""Linear (visco)elastic solid with Newmark-beta time stepping.

Reference: include/linear_elasticity.h, source/linear_elasticity.cpp.
Scheme (solving for acceleration):
  (rho M + beta dt^2 K) a_{n+1} = F - K (d_n + dt v_n + (0.5-beta) dt^2 a_n)
  v_{n+1} = v_n + dt ((1-gamma) a_n + gamma a_{n+1})
  d_{n+1} = d_n + dt v_n + dt^2 ((0.5-beta) a_n + beta a_{n+1})
with gamma = 0.5 + damping, beta = gamma/2
(reference: source/linear_elasticity.cpp:28-30,245-320).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ...config import real_dtype
from ...la.operators import element_diag, element_matvec
from .base import SolidSolverBase
from .materials import linear_elasticity_tensor


class LinearElasticity(SolidSolverBase):
    fsi_skip_dirichlet_faces = True
    def _assemble_constant(self):
        params = self.params
        d = self.dim
        cv = self.cv
        n_c, n_q, nl, _ = cv.grad.shape
        rho = params.solid_rho

        # per-cell elasticity tensor by material part
        C_parts = np.stack([
            linear_elasticity_tensor(params.E[i], params.nu[i], d)
            for i in range(params.n_solid_parts)])
        mat = np.asarray(self.mesh.material_id)
        if params.n_solid_parts == 1:
            mat = np.ones_like(mat)
        C_cells = C_parts[mat - 1]  # (n_c, d,d,d,d)

        # stiffness K[(l,a),(m,b)] = sum_q JxW g_lx C_axby g_my
        K = np.einsum("cqlx,caxby,cqmy,cq->clamb", cv.grad, C_cells, cv.grad,
                      cv.JxW, optimize=True)
        K = K.reshape(n_c, nl * d, nl * d)
        # scalar mass -> vector mass (rho included, reference
        # source/linear_elasticity.cpp:106-112)
        Ms = np.einsum("qi,qj,cq->cij", cv.N, cv.N, cv.JxW)
        Mv = np.einsum("cij,ab->ciajb", Ms, np.eye(d)).reshape(
            n_c, nl * d, nl * d) * rho

        dt = self.time.get_delta_t()
        gamma = 0.5 + params.damping
        beta = gamma / 2
        self._gamma, self._beta = gamma, beta

        rdt = real_dtype()
        self.K_loc = jnp.asarray(K, dtype=rdt)
        self.M_loc = jnp.asarray(Mv, dtype=rdt)
        self.A_loc = self.M_loc + (beta * dt * dt) * self.K_loc
        self.cell_dofs = jnp.asarray(self.sys.cell_dofs, dtype=jnp.int32)

        # gravity rhs (constant): rho * g . phi
        g = np.zeros(d)
        g[:len(params.gravity)] = params.gravity[:d]
        rl = np.einsum("qi,cq,a->cia", cv.N, cv.JxW, g).reshape(n_c, -1) * rho
        rhs_g = np.zeros(self.n_dofs)
        np.add.at(rhs_g, self.sys.cell_dofs.ravel(), rl.ravel())
        self.gravity_rhs = jnp.asarray(rhs_g, dtype=rdt)

        self._standalone_traction = self._standalone_face_traction(
            skip_dirichlet_faces=True)

        cons = self.constraints
        op_A = cons.wrap_operator(
            lambda x: element_matvec(self.A_loc, self.cell_dofs, self.n_dofs,
                                     x))
        op_M = cons.wrap_operator(
            lambda x: element_matvec(self.M_loc, self.cell_dofs, self.n_dofs,
                                     x))
        self._apply_K = jax.jit(
            lambda x: element_matvec(self.K_loc, self.cell_dofs, self.n_dofs,
                                     x))
        diag_A = jnp.where(cons.fixed, 1.0,
                           element_diag(self.A_loc, self.cell_dofs,
                                        self.n_dofs))
        diag_M = jnp.where(cons.fixed, 1.0,
                           element_diag(self.M_loc, self.cell_dofs,
                                        self.n_dofs))
        self._solve_A = self.make_cg_solver(op_A, diag_A)
        self._solve_M = self.make_cg_solver(op_M, diag_M)

    # ------------------------------------------------------------------
    def assemble_rhs(self):
        """External force F: gravity + traction (prescribed or FSI)."""
        if self.params.simulation_type == "FSI":
            rhs = self.gravity_rhs + self._fsi_traction_rhs_impl(
                self.fsi_traction)
        else:
            rhs = self.gravity_rhs + self.traction_rhs(
                self._standalone_traction)
        return rhs

    def run_one_step(self, first_step: bool):
        params = self.params
        dt = self.time.get_delta_t()
        gamma, beta = self._gamma, self._beta
        cons = self.constraints

        if first_step:
            rhs = self.assemble_rhs()
            b = cons.condense_rhs(rhs)
            res = self._solve_M(b, 1e-6 * jnp.linalg.norm(b))
            self.previous_acceleration = cons.distribute(res.x)

        self.time.increment()

        rhs = self.assemble_rhs()
        # rhs -= K (d + dt v + (0.5-beta) dt^2 a)
        d_pred = (self.previous_displacement + dt * self.previous_velocity +
                  (0.5 - beta) * dt * dt * self.previous_acceleration)
        rhs = rhs - self._apply_K(d_pred)
        b = cons.condense_rhs(rhs)
        res = self._solve_A(b, 1e-6 * jnp.linalg.norm(b))
        a_new = cons.distribute(res.x)

        v_new = (self.previous_velocity + dt * (1 - gamma) *
                 self.previous_acceleration + dt * gamma * a_new)
        d_new = (self.previous_displacement + dt * self.previous_velocity +
                 dt * dt * (0.5 - beta) * self.previous_acceleration +
                 dt * dt * beta * a_new)

        self.current_acceleration = a_new
        self.current_velocity = v_new
        self.current_displacement = d_new
        self.previous_acceleration = a_new
        self.previous_velocity = v_new
        self.previous_displacement = d_new
        self.lin_iters = int(res.iters)
        # reference: source/linear_elasticity.cpp:255-320 (refine is NOT
        # guarded by simulation type there)
        self._end_of_step_io(first_step, refine_levels=(1, 4),
                             guard_refine=False)

    def _stress_from_strain(self, eps, gradu):
        params = self.params
        C_parts = np.stack([
            linear_elasticity_tensor(params.E[i], params.nu[i], self.dim)
            for i in range(params.n_solid_parts)])
        mat = np.asarray(self.mesh.material_id)
        if params.n_solid_parts == 1:
            mat = np.ones_like(mat)
        C_cells = C_parts[mat - 1]
        return np.einsum("cijkl,cqkl->cqij", C_cells, eps)
