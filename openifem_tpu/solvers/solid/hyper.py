"""Finite-strain hyperelastic solid (Neo-Hookean / St.Venant-Kirchhoff)
with Newmark time integration and Newton iterations.

Reference: include/hyper_elasticity.h, source/hyper_elasticity.cpp (a
dynamic variant of deal.II step-44).  The per-quadrature-point history
(F_inv, tau, Jc) of the reference becomes a stateless batched recomputation
from the current displacement inside one jitted assemble+solve kernel: on
TPU the (n_cells, n_q) batch of tensor algebra vectorizes and fuses, so
storing history would only add HBM traffic.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...config import real_dtype
from ...la.krylov import cg
from ...la.smalltensor import inv as _inv
from ...la.operators import element_diag, element_matvec
from .base import SolidSolverBase
from .materials import kirchhoff_state, neo_hookean_state


class HyperElasticity(SolidSolverBase):
    def _assemble_constant(self):
        params = self.params
        d = self.dim
        cv = self.cv
        n_c, n_q, nl, _ = cv.grad.shape
        rho = params.solid_rho
        rdt = real_dtype()

        Ms = np.einsum("qi,qj,cq->cij", cv.N, cv.N, cv.JxW)
        Mv = np.einsum("cij,ab->ciajb", Ms, np.eye(d)).reshape(
            n_c, nl * d, nl * d) * rho
        self.M_loc = jnp.asarray(Mv, dtype=rdt)
        self.cell_dofs = jnp.asarray(self.sys.cell_dofs, dtype=jnp.int32)
        self.dN = jnp.asarray(cv.grad, dtype=rdt)       # (c,q,l,X) ref grads
        self.JxW = jnp.asarray(cv.JxW, dtype=rdt)
        self.Nq = jnp.asarray(cv.N, dtype=rdt)

        gamma = 0.5 + params.damping
        beta = gamma / 2
        self._gamma, self._beta = gamma, beta

        g = np.zeros(d)
        g[:len(params.gravity)] = params.gravity[:d]
        rl = np.einsum("qi,cq,a->cia", cv.N, cv.JxW, g).reshape(n_c, -1) * rho
        rhs_g = np.zeros(self.n_dofs)
        np.add.at(rhs_g, self.sys.cell_dofs.ravel(), rl.ravel())
        self.gravity_rhs = jnp.asarray(rhs_g, dtype=rdt)

        # hyper assembly does NOT skip Dirichlet faces
        # (reference: source/hyper_elasticity.cpp:445-462)
        self._standalone_traction = self._standalone_face_traction(
            skip_dirichlet_faces=False)

        if params.solid_type == "NeoHookean":
            c1, kappa = params.C[0][0], params.C[0][1]
            self._material = partial(neo_hookean_state, c1=c1, kappa=kappa)
        elif params.solid_type == "Kirchhoff":
            self._material = partial(kirchhoff_state, E_mod=params.E[0],
                                     nu=params.nu[0])
        else:
            raise ValueError(f"unknown solid type {params.solid_type}")

        cons = self.constraints
        op_M = cons.wrap_operator(
            lambda x: element_matvec(self.M_loc, self.cell_dofs, self.n_dofs,
                                     x))
        diag_M = jnp.where(
            cons.fixed, 1.0,
            element_diag(self.M_loc, self.cell_dofs, self.n_dofs))
        self._solve_M = self.make_cg_solver(op_M, diag_M)
        self._newton_step = jax.jit(self._newton_step_impl)

    # ------------------------------------------------------------------
    def _assemble(self, disp):
        """Batched tangent + internal-force assembly at displacement state.

        Returns (A_loc (c, nd, nd), rhs (n_dofs,)) where nd = nl*dim.
        reference: source/hyper_elasticity.cpp:378-431."""
        d = self.dim
        dN, JxW = self.dN, self.JxW
        n_c, n_q, nl, _ = dN.shape
        ul = disp[self.cell_dofs].reshape(n_c, nl, d)
        Grad_u = jnp.einsum("cqlX,cla->cqaX", dN, ul)
        I = jnp.eye(d, dtype=disp.dtype)
        F = Grad_u + I
        Finv = _inv(F)
        # spatial gradients of scalar shapes
        g = jnp.einsum("cqlX,cqXx->cqlx", dN, Finv)
        tau, Jc = self._material(F)

        Kmat = jnp.einsum("cqlx,cqaxby,cqmy,cq->clamb", g, Jc, g, JxW)
        Kgeo = jnp.einsum("cqlx,cqxy,cqmy,cq->clm", g, tau, g, JxW)
        Kgeo = jnp.einsum("clm,ab->clamb", Kgeo, I)
        A_loc = (Kmat + Kgeo).reshape(n_c, nl * d, nl * d)

        rl = -jnp.einsum("cqlx,cqax,cq->cla", g, tau, JxW).reshape(n_c, -1)
        rhs = jnp.zeros(self.n_dofs, dtype=disp.dtype).at[
            self.cell_dofs.reshape(-1)].add(rl.reshape(-1))
        return A_loc, rhs + self.gravity_rhs

    def _external_traction_rhs(self):
        if self.params.simulation_type == "FSI":
            return self._fsi_traction_rhs_impl(self.fsi_traction)
        return self.traction_rhs(self._standalone_traction)

    def _newton_step_impl(self, disp, d_pred, v_prev, a_prev, traction_rhs):
        """One Newton iteration: returns (newton_update, res_F, cg_iters)."""
        params = self.params
        dt = self.time.get_delta_t()
        beta = self._beta
        cons = self.constraints

        a_cur = (disp - d_pred) / (beta * dt * dt)
        A_loc, rhs = self._assemble(disp)
        rhs = rhs + traction_rhs
        rhs = rhs - element_matvec(self.M_loc, self.cell_dofs, self.n_dofs,
                                   a_cur)
        b = cons.condense_rhs(rhs)
        res_F = jnp.linalg.norm(b)

        dt2inv = 1.0 / (beta * dt * dt)
        A_full = A_loc + self.M_loc * dt2inv
        if self.n_dofs <= self.dense_solve_max and not cons.any_hanging:
            # small system: dense f32 LU + f64 refinement beats hundreds
            # of latency-bound CG matvecs (see SolidSolver._dense_solve)
            x = self._dense_solve(A_full, self.cell_dofs, cons, b)
            du = cons.distribute(x)
            return du, res_F, jnp.zeros((), jnp.int32)
        diag = element_diag(A_full, self.cell_dofs, self.n_dofs)
        diag = jnp.where(cons.fixed, 1.0, diag)
        dinv = jnp.where(diag != 0, 1.0 / diag, 1.0)
        op = cons.wrap_operator(
            lambda x: element_matvec(A_full, self.cell_dofs, self.n_dofs, x))
        res = cg(op, b, M=lambda r: r * dinv,
                 atol=1e-6 * res_F, maxiter=self.n_dofs)
        du = cons.distribute(res.x)
        return du, res_F, res.iters

    # ------------------------------------------------------------------
    def _device_step_impl(self, disp0, v_prev, a_prev, traction_rhs):
        """One Newmark time step with the Newton loop as a lax.while_loop —
        the fused-device twin of run_one_step's host loop (identical
        tolerances and stopping rules, reference:
        source/hyper_elasticity.cpp:84-202).  Returns
        (disp, vel, acc, newton_iters); callers must check
        newton_iters < solid_max_iterations (the host loop raises)."""
        from jax import lax
        params = self.params
        dt = self.time.get_delta_t()
        gamma, beta = self._gamma, self._beta
        cons = self.constraints
        tol_d, tol_f = params.tol_d, params.tol_f
        max_it = params.solid_max_iterations

        d_pred = (disp0 + dt * v_prev + (0.5 - beta) * dt * dt * a_prev)

        one = jnp.ones((), dtype=disp0.dtype)

        def cond(s):
            disp, it, norm_res, norm_upd, init_res, init_upd, \
                err_res, err_upd = s
            return (((norm_upd > tol_d) | (norm_res > tol_f)) &
                    (err_res > 1e-12) & (err_upd > 1e-12) & (it < max_it))

        def body(s):
            disp, it, norm_res, norm_upd, init_res, init_upd, \
                err_res, err_upd = s
            du, res_F, _ = self._newton_step_impl(
                disp, d_pred, v_prev, a_prev, traction_rhs)
            err_res = res_F
            err_upd = jnp.linalg.norm(cons.set_zero(du))
            init_res = jnp.where(it == 0, jnp.maximum(err_res, 1e-300),
                                 init_res)
            init_upd = jnp.where(it == 0, jnp.maximum(err_upd, 1e-300),
                                 init_upd)
            disp = cons.distribute(disp + du)
            return (disp, it + 1, err_res / init_res, err_upd / init_upd,
                    init_res, init_upd, err_res, err_upd)

        disp, it, *_ = lax.while_loop(
            cond, body, (disp0, 0, one, one, one, one, one, one))

        a_new = (disp - d_pred) / (beta * dt * dt)
        v_new = v_prev + dt * ((1 - gamma) * a_prev + gamma * a_new)
        return disp, v_new, a_new, it

    def run_one_step(self, first_step: bool):
        params = self.params
        dt = self.time.get_delta_t()
        gamma, beta = self._gamma, self._beta
        cons = self.constraints

        traction_rhs = self._external_traction_rhs()

        if first_step:
            # initial acceleration M a0 = F (internal force is zero at rest
            # for NeoHookean/Kirchhoff with F=I)
            _, rhs = self._assemble(self.current_displacement)
            rhs = rhs + traction_rhs
            b = cons.condense_rhs(rhs)
            res = self._solve_M(b, 1e-6 * jnp.linalg.norm(b))
            self.previous_acceleration = cons.distribute(res.x)

        self.time.increment()

        d_pred = (self.previous_displacement + dt * self.previous_velocity +
                  (0.5 - beta) * dt * dt * self.previous_acceleration)
        disp = self.current_displacement

        err_res = err_upd = 1.0
        init_res = init_upd = 1.0
        norm_res = norm_upd = 1.0
        it = 0
        while ((norm_upd > params.tol_d or norm_res > params.tol_f)
               and err_res > 1e-12 and err_upd > 1e-12):
            if it >= params.solid_max_iterations:
                raise RuntimeError("Too many Newton iterations!")
            du, res_F, cg_iters = self._newton_step(
                disp, d_pred, self.previous_velocity,
                self.previous_acceleration, traction_rhs)
            err_res = float(res_F)
            err_upd = float(jnp.linalg.norm(cons.set_zero(du)))
            if it == 0:
                init_res = max(err_res, 1e-300)
                init_upd = max(err_upd, 1e-300)
            norm_res = err_res / init_res
            norm_upd = err_upd / init_upd
            disp = cons.distribute(disp + du)
            it += 1
        self.newton_iters = it

        a_new = (disp - d_pred) / (beta * dt * dt)
        v_new = (self.previous_velocity + dt * (1 - gamma) *
                 self.previous_acceleration + dt * gamma * a_new)
        self.current_displacement = disp
        self.current_acceleration = a_new
        self.current_velocity = v_new
        self.previous_displacement = disp
        self.previous_acceleration = a_new
        self.previous_velocity = v_new
        # reference: source/hyper_elasticity.cpp:84-202
        self._end_of_step_io(first_step)

    def _stress_from_strain(self, eps, gradu):
        """Kirchhoff stress at quadrature points for output."""
        import numpy as np
        d = self.dim
        F = gradu + np.eye(d)[None, None]
        tau, _ = self._material(jnp.asarray(F))
        return np.asarray(tau)
