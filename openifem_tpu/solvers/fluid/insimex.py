"""Incompressible NS with implicit-explicit (IMEX) splitting.

Reference: include/insimex.h, source/insimex.cpp.  Convection is treated
explicitly, so the system matrix is symmetric, constant in time (assembled
at steps < 2 only), and each time step costs ONE linear solve for the
increment d(u,p):
  LHS = nu K + grad-div + M_u rho/dt - B^T - B
  RHS = -(residual of present solution with explicit convection)
(reference weak form: source/insimex.cpp:228-256).

The block-Schur preconditioner is the same as InsIM but the A-block solve is
an (iterative) CG — the reference does exactly this (CG + identity,
source/insimex.cpp:96-108), so TPU parity is direct: no direct solver
involved anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...config import real_dtype
from ...la.krylov import cg, fgmres
from ...la.operators import (element_diag, element_matvec,
                             element_matvec_rect, scatter_add)
from .base import FluidSolverBase


class InsIMEX(FluidSolverBase):
    mp_cg_maxiter = 200
    schur_cg_maxiter = 400
    a_cg_maxiter = 1000
    mixed_precision_precond = False  # f32 preconditioner (see InsIM)
    outer_restart = 30
    outer_max_restarts = 40

    def setup(self):
        assert (self.params.fluid_velocity_degree -
                self.params.fluid_pressure_degree) == 1
        super().setup()
        self._precompute()

    # ------------------------------------------------------------------
    def _precompute(self):
        params = self.params
        d = self.dim
        rdt = real_dtype()
        cvu, cvp = self.cv_u, self.cv_p
        n_c, n_q, nlu, _ = cvu.grad.shape
        nlp = cvp.N.shape[1]
        self.nlu, self.nlp = nlu, nlp
        self.nu_loc = nlu * d

        self.Nu = jnp.asarray(cvu.N, dtype=rdt)
        self.Np = jnp.asarray(cvp.N, dtype=rdt)
        self.gu = jnp.asarray(cvu.grad, dtype=rdt)
        self.JxW = jnp.asarray(cvu.JxW, dtype=rdt)

        cd = self.sys.cell_dofs
        self.cell_dofs = jnp.asarray(cd, dtype=jnp.int32)
        self.cell_dofs_u = jnp.asarray(cd[:, :self.nu_loc], dtype=jnp.int32)
        self.cell_dofs_p = jnp.asarray(cd[:, self.nu_loc:] - self.n_u,
                                       dtype=jnp.int32)

        Mu_s = np.einsum("qi,qj,cq->cij", cvu.N, cvu.N, cvu.JxW)
        diag_mu = np.zeros(self.n_u)
        dloc = np.einsum("cii->ci", Mu_s)
        for a in range(d):
            np.add.at(diag_mu, self.u_space.cell_dofs.ravel() * d + a,
                      dloc.ravel())
        self.Mu_diag = jnp.asarray(diag_mu, dtype=rdt)
        Mp_loc = np.einsum("qi,qj,cq->cij", cvp.N, cvp.N, cvp.JxW)
        self.Mp_loc = jnp.asarray(Mp_loc, dtype=rdt)
        diag_mp = np.zeros(self.n_p)
        np.add.at(diag_mp, self.p_space.cell_dofs.ravel(),
                  np.einsum("cii->ci", Mp_loc).ravel())
        self.Mp_diag = jnp.asarray(diag_mp, dtype=rdt)

        g = np.zeros(d)
        g[:len(params.gravity)] = params.gravity[:d]
        if self.body_force is not None:
            xq = cvu.xq.reshape(-1, d)
            bf = np.asarray(self.body_force(xq)).reshape(n_c, n_q, d)
            self.gravity_q = jnp.asarray(bf + g, dtype=rdt)
        else:
            self.gravity_q = jnp.asarray(
                np.broadcast_to(g, (n_c, n_q, d)).copy(), dtype=rdt)

        self._neumann_rhs_const = self._assemble_neumann()
        self._build_matrix()
        self._step = jax.jit(self._step_impl)

    def _assemble_neumann(self):
        params = self.params
        fv = self.fv_u
        rhs = np.zeros(self.n_dofs)
        if fv is None or params.n_fluid_neumann_bcs == 0:
            return jnp.asarray(rhs, dtype=real_dtype())
        for i in range(len(fv.cells)):
            bid = int(fv.boundary_id[i])
            if bid not in params.fluid_neumann_bcs:
                continue
            pbc = params.fluid_neumann_bcs[bid]
            rl = -np.einsum("qi,qa,q->ia", fv.N[i], fv.normals[i],
                            fv.JxW[i]) * pbc
            c = int(fv.cells[i])
            np.add.at(rhs, self.sys.cell_dofs[c][:self.nu_loc],
                      rl.reshape(-1))
        return jnp.asarray(rhs, dtype=real_dtype())

    def _build_matrix(self):
        """Constant IMEX system matrix (reference:
        source/insimex.cpp:228-243)."""
        params = self.params
        d = self.dim
        nu_visc, gamma, rho = (params.viscosity, params.grad_div,
                               params.fluid_rho)
        dt = self.time.get_delta_t()
        Nu, Np, gu, JxW = self.Nu, self.Np, self.gu, self.JxW
        n_c = gu.shape[0]
        I = jnp.eye(d, dtype=real_dtype())

        NN = jnp.einsum("ql,qm,cq->clm", Nu, Nu, JxW)
        gg = jnp.einsum("cqlx,cqmx,cq->clm", gu, gu, JxW)
        Auu = jnp.einsum("clm,ab->clamb", nu_visc * gg + (rho / dt) * NN, I)
        Auu = Auu + (gamma * rho) * jnp.einsum("cqla,cqmb,cq->clamb",
                                               gu, gu, JxW)
        Auu = Auu.reshape(n_c, self.nu_loc, self.nu_loc)
        Aup = -jnp.einsum("cqla,qn,cq->clan", gu, Np, JxW).reshape(
            n_c, self.nu_loc, self.nlp)
        Apu = -jnp.einsum("qn,cqmb,cq->cnmb", Np, gu, JxW).reshape(
            n_c, self.nlp, self.nu_loc)
        App = jnp.zeros((n_c, self.nlp, self.nlp), dtype=real_dtype())
        self.A_loc = jnp.concatenate([
            jnp.concatenate([Auu, Aup], axis=2),
            jnp.concatenate([Apu, App], axis=2)], axis=1)
        self.Auu = Auu
        self.Aup = Aup
        self.Apu = Apu

    # ------------------------------------------------------------------
    def _assemble_rhs(self, present, indicator, fsi_acc, fsi_stress):
        """Incremental residual RHS (reference: source/insimex.cpp:244-262)."""
        params = self.params
        d = self.dim
        nu_visc, gamma, rho = (params.viscosity, params.grad_div,
                               params.fluid_rho)
        Nu, Np, gu, JxW = self.Nu, self.Np, self.gu, self.JxW
        n_c = gu.shape[0]

        u = present[:self.n_u].reshape(-1, d)
        ul = u[self.u_space.cell_dofs]
        pl = present[self.n_u:][self.p_space.cell_dofs]
        uc = jnp.einsum("ql,cla->cqa", Nu, ul)
        guc = jnp.einsum("cqlx,cla->cqax", gu, ul)
        pc = jnp.einsum("qn,cn->cq", Np, pl)
        divu = jnp.trace(guc, axis1=2, axis2=3)
        conv = jnp.einsum("cqax,cqx->cqa", guc, uc)

        r_u = -(nu_visc * jnp.einsum("cqax,cqlx,cq->cla", guc, gu, JxW)
                - jnp.einsum("cq,cqla,cq->cla", pc, gu, JxW)
                + (gamma * rho) * jnp.einsum("cq,cqla,cq->cla", divu, gu, JxW)
                + rho * jnp.einsum("ql,cqa,cq->cla", Nu, conv, JxW)
                - rho * jnp.einsum("ql,cqa,cq->cla", Nu, self.gravity_q, JxW))
        # FSI force (note the extra rho on fsi_acceleration vs InsIM;
        # reference: source/insimex.cpp:252-259)
        r_u = r_u + indicator[:, None, None] * (
            jnp.einsum("cqla,cab,cq->clb", gu, fsi_stress, JxW) +
            rho * jnp.einsum("ql,ca,cq->cla", Nu, fsi_acc, JxW))
        r_p = jnp.einsum("cq,qn,cq->cn", divu, Np, JxW)
        r_loc = jnp.concatenate([r_u.reshape(n_c, -1), r_p], axis=1)
        rhs = scatter_add(self.n_dofs, self.cell_dofs, r_loc)
        return rhs + self._neumann_rhs_const

    def _make_preconditioner(self):
        params = self.params
        gamma, rho = params.grad_div, params.fluid_rho
        nu_visc = params.viscosity
        dt = self.time.get_delta_t()
        ucons, pcons = self.u_constraints, self.p_constraints
        pdt = jnp.float32 if self.mixed_precision_precond else \
            self.Auu.dtype
        Auu = self.Auu.astype(pdt)
        Aup = self.Aup.astype(pdt)
        Apu = self.Apu.astype(pdt)

        op_A = ucons.wrap_operator(lambda x: element_matvec(
            Auu, self.cell_dofs_u, self.n_u, x))
        diag_A = jnp.where(ucons.fixed, 1.0, element_diag(
            Auu, self.cell_dofs_u, self.n_u))
        dinv_A = jnp.where(diag_A != 0, 1.0 / diag_A, 1.0)

        def apply_B(xu):
            xu = ucons.expand(xu)
            y = element_matvec_rect(Apu, self.cell_dofs_p, self.cell_dofs_u,
                                    self.n_p, xu)
            return pcons.restrict(y) if pcons.any_hanging else y

        def apply_BT(xp):
            xp = pcons.expand(xp) if pcons.any_hanging else xp
            y = element_matvec_rect(Aup, self.cell_dofs_u, self.cell_dofs_p,
                                    self.n_u, xp)
            return ucons.restrict(y)

        mu_inv = jnp.where(self.Mu_diag != 0, 1.0 / self.Mu_diag,
                           1.0).astype(pdt)

        def op_Sm(xp):
            y = apply_B(mu_inv * apply_BT(xp))
            return jnp.where(pcons.fixed, xp, y)

        Mp_loc = self.Mp_loc.astype(pdt)
        op_Mp = pcons.wrap_operator(lambda x: element_matvec(
            Mp_loc, self.cell_dofs_p, self.n_p, x))
        mp_dinv = jnp.where(self.Mp_diag != 0, 1.0 / self.Mp_diag,
                            1.0).astype(pdt)

        def precond(v):
            out_dtype = v.dtype
            v = v.astype(pdt)
            vu, vp = v[:self.n_u], v[self.n_u:]
            atol_p = 1e-6 * jnp.linalg.norm(vp)
            tmp = cg(op_Mp, vp, M=lambda r: r * mp_dinv, atol=atol_p,
                     maxiter=self.mp_cg_maxiter).x
            tmp = tmp * (-(nu_visc + gamma * rho))
            sm = cg(op_Sm, vp, atol=atol_p, maxiter=self.schur_cg_maxiter).x
            dst_p = sm * (-rho / dt) + tmp
            utmp = vu - apply_BT(dst_p)
            # reference: CG tol relative to the incoming velocity block
            atol_u = 1e-6 * jnp.linalg.norm(vu)
            dst_u = cg(op_A, utmp, M=lambda r: r * dinv_A, atol=atol_u,
                       maxiter=self.a_cg_maxiter).x
            return jnp.concatenate([dst_u, dst_p]).astype(out_dtype)

        return precond

    # ------------------------------------------------------------------
    def _step_impl(self, present, indicator, fsi_acc, fsi_stress):
        cons = self.zero_constraints
        rhs = self._assemble_rhs(present, indicator, fsi_acc, fsi_stress)
        b = cons.condense_rhs(rhs)
        res_norm = jnp.linalg.norm(b)
        op = cons.wrap_operator(lambda x: element_matvec(
            self.A_loc, self.cell_dofs, self.n_dofs, x))
        precond = self._make_preconditioner()
        atol = jnp.minimum(1e-9, 1e-8 * res_norm)
        res = fgmres(op, b, M=precond, atol=atol,
                     restart=self.outer_restart,
                     max_restarts=self.outer_max_restarts)
        du = cons.distribute(res.x)
        return du, res_norm, res.iters, res.residual

    def run_one_step(self, apply_nonzero_constraints: bool,
                     assemble_system: bool = True, verbose: bool = True):
        """reference: source/insimex.cpp:355-393."""
        self.time.increment()
        if verbose:
            print(f"*** Time step = {self.time.get_timestep()}, "
                  f"at t = {self.time.current():.6e}")

        present = self.present_solution
        if apply_nonzero_constraints:
            # fold the inhomogeneous BC values into the increment
            present = self.nonzero_constraints.apply_increment(present)
        bc_shift = present - self.present_solution

        du, res_norm, iters, gres = self._step(
            present, self.indicator, self.fsi_acceleration,
            self.fsi_stress_cell)
        self.solution_increment = du + bc_shift
        self.present_solution = self.present_solution + \
            self.solution_increment
        if verbose:
            print(f" GMRES_ITR = {int(iters)} GMRES_RES = {float(gres):.6e}")
        self.update_stress()
        # reference: source/insimex.cpp:378-388, source/mpi_insimex.cpp:433-444
        self._end_of_step_io(refine_levels=(1, 3))

    def run(self, verbose: bool = True):
        if not self._setup_done:
            self.mesh = self.mesh.refine_global(
                self.params.global_refinements[0])
            self.setup()
        while self.time.end() - self.time.current() > 1e-12:
            self.run_one_step(self.time.get_timestep() == 0,
                              self.time.get_timestep() < 2, verbose=verbose)
