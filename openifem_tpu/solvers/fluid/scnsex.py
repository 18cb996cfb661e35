"""Explicit slightly-compressible solver (SCnsEX).

Reference: include/mpi_scnsex.h, source/mpi_scnsex.cpp.  Velocity and
pressure are decoupled; each fixed-point iteration does two mass+diffusion
CG solves (reference uses CG+BoomerAMG; here CG+Jacobi — the systems are
mass-dominated):
  (rho M/dt + nu K + rho sigma M) u = rho M u_n/dt - rho (u.grad)u - grad p
                                      + rho(g + bf)              [velocity]
  ((1/dt + sigma) Mp)/atm p = [-cp/cv (atm+p) div u + p_n/dt - u.grad p]/atm
                                                                [pressure]
iterated until the solution increment converges
(reference: source/mpi_scnsex.cpp:429-520).  The constant matrices are
assembled once (the reference caches local matrices for the same reason,
include/mpi_scnsex.h:97-107).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...config import real_dtype
from ...la.krylov import cg
from ...la.operators import element_diag, element_matvec, scatter_add
from .base import FluidSolverBase
from .supg import ATM, CP_TO_CV


class SCnsEX(FluidSolverBase):
    cg_maxiter = 2000

    def setup(self):
        super().setup()
        self._precompute()

    def set_sigma_pml_field(self, fn):
        self.sigma_pml_field = fn

    def set_hard_coded_boundary_condition_time(self, bid: int, t_limit):
        """Expire a hard-coded BC after t_limit
        (reference: source/mpi_scnsex.cpp:84-97)."""
        if not hasattr(self, "bc_time_limits"):
            self.bc_time_limits = {}
        self.bc_time_limits[bid] = t_limit

    # ------------------------------------------------------------------
    def _precompute(self):
        params = self.params
        d = self.dim
        rdt = real_dtype()
        cvu, cvp = self.cv_u, self.cv_p
        n_c, n_q, nlu, _ = cvu.grad.shape
        nlp = cvp.N.shape[1]
        self.nlu, self.nlp = nlu, nlp
        rho, mu = params.fluid_rho, params.viscosity
        dt = self.time.get_delta_t()

        self.Nu = jnp.asarray(cvu.N, dtype=rdt)
        self.Np = jnp.asarray(cvp.N, dtype=rdt)
        self.gu = jnp.asarray(cvu.grad, dtype=rdt)
        self.gp = jnp.asarray(cvp.grad, dtype=rdt)
        self.JxW = jnp.asarray(cvu.JxW, dtype=rdt)
        self.cell_dofs_u = jnp.asarray(
            (self.u_space.cell_dofs[:, :, None] * d +
             np.arange(d)[None, None, :]).reshape(n_c, -1), dtype=jnp.int32)
        self.cell_dofs_p = jnp.asarray(self.p_space.cell_dofs,
                                       dtype=jnp.int32)

        g = np.zeros(d)
        g[:len(params.gravity)] = params.gravity[:d]
        if self.body_force is not None:
            xq = cvu.xq.reshape(-1, d)
            bf = np.asarray(self.body_force(xq)).reshape(n_c, n_q, d)
            self.gravity_q = jnp.asarray(bf + g, dtype=rdt)
        else:
            self.gravity_q = jnp.asarray(
                np.broadcast_to(g, (n_c, n_q, d)).copy(), dtype=rdt)

        if getattr(self, "sigma_pml_field", None) is not None:
            xq = cvu.xq.reshape(-1, d)
            s = np.asarray(self.sigma_pml_field(xq)).reshape(n_c, n_q)
            sig = jnp.asarray(s, dtype=rdt)
        else:
            sig = jnp.zeros((n_c, n_q), dtype=rdt)
        self.sigma_pml_q = sig

        I = jnp.eye(d, dtype=rdt)
        gg = jnp.einsum("cqlx,cqmx,cq->clm", self.gu, self.gu, self.JxW)
        NNs = jnp.einsum("cq,ql,qm->clm", (rho / dt + rho * sig) * self.JxW,
                         self.Nu, self.Nu)
        Av = jnp.einsum("clm,ab->clamb", mu * gg + NNs, I).reshape(
            n_c, nlu * d, nlu * d)
        self.Av_loc = Av
        Ap = jnp.einsum("cq,qn,qo->cno", (1.0 / dt + sig) / ATM * self.JxW,
                        self.Np, self.Np)
        self.Ap_loc = Ap

        ucons, pcons = self.u_constraints, self.p_constraints
        self._op_v = ucons.wrap_operator(lambda x: element_matvec(
            self.Av_loc, self.cell_dofs_u, self.n_u, x))
        dv = jnp.where(ucons.fixed, 1.0, element_diag(
            self.Av_loc, self.cell_dofs_u, self.n_u))
        self._dinv_v = jnp.where(dv != 0, 1.0 / dv, 1.0)
        self._op_p = pcons.wrap_operator(lambda x: element_matvec(
            self.Ap_loc, self.cell_dofs_p, self.n_p, x))
        dp = jnp.where(pcons.fixed, 1.0, element_diag(
            self.Ap_loc, self.cell_dofs_p, self.n_p))
        self._dinv_p = jnp.where(dp != 0, 1.0 / dp, 1.0)

        # raw (uncondensed) applications, for the Dirichlet lift
        self._raw_v = lambda x: element_matvec(self.Av_loc, self.cell_dofs_u,
                                               self.n_u, x)
        self._neumann_rhs_u = self._neumann_rhs_velocity()
        self._iterate = jax.jit(self._iterate_impl)

    def _neumann_rhs_velocity(self):
        params = self.params
        fv = self.fv_u
        rhs = np.zeros(self.n_u)
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
            dofs = (self.u_space.cell_dofs[c][:, None] * self.dim +
                    np.arange(self.dim)[None, :]).reshape(-1)
            np.add.at(rhs, dofs, rl.reshape(-1))
        return jnp.asarray(rhs, dtype=real_dtype())

    # ------------------------------------------------------------------
    def _iterate_impl(self, eval_pt, present, bc_vals_u):
        """One velocity+pressure fixed-point sweep; returns new (u, p)."""
        params = self.params
        d = self.dim
        rho, mu = params.fluid_rho, params.viscosity
        dt = self.time.get_delta_t()
        Nu, Np, gu, gp, JxW = self.Nu, self.Np, self.gu, self.gp, self.JxW
        sig = self.sigma_pml_q
        ucons, pcons = self.u_constraints, self.p_constraints

        ul = eval_pt[:self.n_u].reshape(-1, d)[self.u_space.cell_dofs]
        pl = eval_pt[self.n_u:][self.p_space.cell_dofs]
        unl = present[:self.n_u].reshape(-1, d)[self.u_space.cell_dofs]
        pnl = present[self.n_u:][self.p_space.cell_dofs]
        uc = jnp.einsum("ql,cla->cqa", Nu, ul)
        G = jnp.einsum("cqlx,cla->cqax", gu, ul)
        gpc = jnp.einsum("cqnx,cn->cqx", gp, pl)
        un = jnp.einsum("ql,cla->cqa", Nu, unl)
        pn = jnp.einsum("qn,cn->cq", Np, pnl)
        Gu = jnp.einsum("cqax,cqx->cqa", G, uc)

        # velocity rhs
        r_u = (rho * jnp.einsum("cq,ql,cqa->cla", JxW / dt, Nu, un)
               - rho * jnp.einsum("cq,ql,cqa->cla", JxW, Nu, Gu)
               - jnp.einsum("cq,ql,cqa->cla", JxW, Nu, gpc)
               + rho * jnp.einsum("cq,ql,cqa->cla", JxW, Nu, self.gravity_q))
        rhs_u = scatter_add(self.n_u, self.cell_dofs_u,
                            r_u.reshape(r_u.shape[0], -1))
        rhs_u = rhs_u + self._neumann_rhs_u
        # Dirichlet lift: solve for the interior with BC values imposed
        gvec = jnp.where(ucons.dirichlet, bc_vals_u, 0.0)
        b = ucons.condense_rhs(rhs_u - self._raw_v(gvec))
        res_v = cg(self._op_v, b, M=lambda r: r * self._dinv_v,
                   atol=1e-6 * jnp.linalg.norm(b), maxiter=self.cg_maxiter)
        u_new = ucons.distribute_with_values(res_v.x, bc_vals_u)

        # pressure rhs (using the JUST UPDATED velocity, reference
        # :475-481 does velocity solve then pressure assembly at the new u)
        ul2 = u_new.reshape(-1, d)[self.u_space.cell_dofs]
        uc2 = jnp.einsum("ql,cla->cqa", Nu, ul2)
        G2 = jnp.einsum("cqlx,cla->cqax", gu, ul2)
        divu2 = jnp.trace(G2, axis1=2, axis2=3)
        pc = jnp.einsum("qn,cn->cq", Np, pl)
        r_p = (-jnp.einsum("cq,qn->cn",
                           CP_TO_CV * (ATM + pc) * divu2 / ATM * JxW, Np)
               + jnp.einsum("cq,qn->cn", pn / dt / ATM * JxW, Np)
               - jnp.einsum("cq,qn->cn",
                            jnp.einsum("cqx,cqx->cq", uc2, gpc) / ATM * JxW,
                            Np))
        rhs_p = scatter_add(self.n_p, self.cell_dofs_p, r_p)
        bp = pcons.condense_rhs(rhs_p)
        res_p = cg(self._op_p, bp, M=lambda r: r * self._dinv_p,
                   atol=1e-6 * jnp.linalg.norm(bp), maxiter=self.cg_maxiter)
        p_new = pcons.distribute(res_p.x)

        new_sol = jnp.concatenate([u_new, p_new])
        return new_sol, res_v.iters, res_p.iters

    # ------------------------------------------------------------------
    def run_one_step(self, apply_nonzero_constraints: bool = True,
                     assemble_system: bool = True, verbose: bool = True):
        params = self.params
        self.time.increment()
        if verbose:
            print(f"*** Time step = {self.time.get_timestep()}, "
                  f"at t = {self.time.current():.6e}")

        bc_vals_u = self.nonzero_constraints.dirichlet_values[:self.n_u]
        eval_pt = self.present_solution
        last = None
        current_res = 1.0
        initial_res = 1.0
        rel_res = 1.0
        it = 0
        while rel_res > params.fluid_tolerance and current_res > 1e-12:
            if it >= params.fluid_max_iterations:
                raise RuntimeError("Too many iterations!")
            new_sol, it_v, it_p = self._iterate(eval_pt, self.present_solution,
                                                bc_vals_u)
            if last is not None:
                current_res = float(jnp.linalg.norm(new_sol - last))
            if it == 0:
                initial_res = max(float(jnp.linalg.norm(new_sol)), 1e-300)
                current_res = float(jnp.linalg.norm(new_sol)) \
                    if last is None else current_res
            rel_res = current_res / initial_res
            if verbose:
                print(f" ITR = {it} ABS_RES = {current_res:.6e} "
                      f"REL_RES = {rel_res:.6e} VEL_ITR = {int(it_v)} "
                      f"PRE_ITR = {int(it_p)}")
            last = new_sol
            eval_pt = new_sol
            it += 1
        self.solution_increment = eval_pt - self.present_solution
        self.present_solution = eval_pt
        self.update_stress()
        # reference: source/mpi_scnsex.cpp:505-519
        self._end_of_step_io()

    def bc_value_table(self, n_steps: int):
        """Per-step Dirichlet velocity values for the next n_steps,
        replicating run()'s loop exactly: per-boundary BC expiry checked
        against the running time, then the BC clock advance + constraint
        rebuild (reference: source/mpi_scnsex.cpp:540-596).  Expiry only
        changes VALUES — the Dirichlet mask is static — so one table
        covers the whole window (and, like the reference, an expired BC
        keeps its last rebuilt values until another rebuild happens).
        Mutates the solver's bc state exactly as running n_steps of run()
        would; call right before make_on_device_stepper."""
        dt = self.time.get_delta_t()
        limits = getattr(self, "bc_time_limits", {})
        t = self.time.current()
        vals = []
        for _ in range(n_steps):
            for bid in list(limits):
                if limits[bid] < t:
                    self.hard_coded_bcs.pop(bid, None)
                    limits.pop(bid)
            if self.hard_coded_bcs:
                self.bc_time += dt
                self._make_constraints()
            vals.append(np.asarray(
                self.nonzero_constraints.dirichlet_values[:self.n_u]))
            t += dt
        return jnp.asarray(np.stack(vals), dtype=real_dtype())

    def make_on_device_stepper(self, bc_values_u):
        """Fully on-device explicit time stepping: lax.fori_loop over steps
        with the velocity/pressure fixed-point sweep as a lax.while_loop —
        zero host round-trips per step (the SUPG-family pattern,
        supg.py::make_on_device_stepper).

        bc_values_u: (n_steps, n_u) table from bc_value_table.  Returns
        fn(present, n_steps) -> (present, max_rel_res, max_iters)."""
        import jax.lax as lax
        params = self.params
        tol = params.fluid_tolerance
        max_it = params.fluid_max_iterations

        def one_step(present, bc_vals):
            new0, _, _ = self._iterate_impl(present, present, bc_vals)
            init = jnp.maximum(jnp.linalg.norm(new0), 1e-300)

            def cond(s):
                sol, it, cur = s
                return (cur / init > tol) & (cur > 1e-12) & (it < max_it)

            def body(s):
                sol, it, cur = s
                new, _, _ = self._iterate_impl(sol, present, bc_vals)
                return (new, it + 1, jnp.linalg.norm(new - sol))

            sol, it, cur = lax.while_loop(cond, body, (new0, 1, init))
            return sol, cur / init, it

        @jax.jit
        def run_n(present, n_steps):
            def body(i, s):
                p, worst_rel, worst_it = s
                p2, rel, it = one_step(p, bc_values_u[i])
                return (p2, jnp.maximum(worst_rel, rel),
                        jnp.maximum(worst_it, it))

            return lax.fori_loop(0, n_steps, body,
                                 (present, jnp.zeros((), present.dtype), 0))

        return run_n

    def run_on_device(self, verbose: bool = True):
        """run() with all steps as ONE device dispatch; the per-step
        VTU/PVD/checkpoint writes of run_one_step are skipped (only the
        final state lands on the host) and solution_increment holds the
        whole-window delta.  The production/benchmark path for standalone
        SCnsEX runs (see test_acoustics.py for host-path equality)."""
        if not self._setup_done:
            if self.hard_coded_bcs:
                self.bc_time += self.time.get_delta_t()
            self.mesh = self.mesh.refine_global(
                self.params.global_refinements[0])
            self.setup()
        dt = self.time.get_delta_t()
        n = int(round((self.time.end() - self.time.current()) / dt))
        if n <= 0:
            return
        table = self.bc_value_table(n)
        stepper = self.make_on_device_stepper(table)
        sol, rel, its = stepper(self.present_solution, n)
        if float(rel) > self.params.fluid_tolerance:
            raise RuntimeError("Too many iterations!")
        self.solution_increment = sol - self.present_solution
        self.present_solution = sol
        for _ in range(n):
            self.time.increment()
        self.update_stress()
        if verbose:
            print(f"run_on_device: {n} steps, worst rel_res "
                  f"{float(rel):.3e}, max fixed-point iters {int(its)}")

    def run(self, verbose: bool = True):
        """reference: source/mpi_scnsex.cpp:540-596.  Note the BC clock is
        advanced once before setup AND once per loop iteration, so the first
        step sees t_bc = 2*dt (replicating the reference exactly)."""
        if not self._setup_done:
            if self.hard_coded_bcs:
                self.bc_time += self.time.get_delta_t()
            self.mesh = self.mesh.refine_global(
                self.params.global_refinements[0])
            self.setup()
        limits = getattr(self, "bc_time_limits", {})
        while self.time.end() - self.time.current() > 1e-12:
            for bid in list(limits):
                if limits[bid] < self.time.current():
                    self.hard_coded_bcs.pop(bid, None)
                    limits.pop(bid)
            if self.hard_coded_bcs:
                self.bc_time += self.time.get_delta_t()
                self._make_constraints()
            self.run_one_step(True, verbose=verbose)
