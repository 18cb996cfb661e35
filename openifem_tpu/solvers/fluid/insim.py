"""Implicit incompressible Navier-Stokes with Grad-Div stabilization (InsIM).

Reference: include/insim.h, source/insim.cpp (serial) and
include/mpi_insim.h, source/mpi_insim.cpp (weak form at
source/mpi_insim.cpp:263-304).

Scheme: backward Euler + Newton on (du, dp); each Newton system is solved by
FGMRES with the Grad-Div block-Schur right preconditioner
  P^-1 = [[A~^-1, -A~^-1 B^T S~^-1], [0, S~^-1]],
  S~^-1 = -(nu + gamma rho) Mp^-1 - (rho/dt) (B diag(Mu)^-1 B^T)^-1
(reference: source/insim.cpp:13-120).  The reference inverts the A-block
with a sparse direct solver (UMFPACK/MUMPS); direct factorization has no
efficient TPU mapping, so here A~^-1 is an inner Jacobi-preconditioned
FGMRES run to a loose tolerance — the flexible outer Krylov absorbs the
inexactness.  All operator applications are matrix-free batched element
matmuls (MXU path); inner CG/FGMRES loops are lax.while_loops inside one
jitted Newton-iteration kernel.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ...config import real_dtype
from ...la.krylov import cg, fgmres
from ...la.operators import (element_diag, element_matvec,
                             element_matvec_nodeblock,
                             element_matvec_p_to_u_nodeblock,
                             element_matvec_rect,
                             element_matvec_u_to_p_nodeblock,
                             element_matvec_taylor_hood, scatter_add)
from .base import FluidSolverBase


class InsIM(FluidSolverBase):
    # inner-solver knobs (see class docstring; tuned for parity with the
    # reference's preconditioner quality)
    schur_cg_maxiter = 400
    mp_cg_maxiter = 200
    a_inner_restart = 50
    a_inner_restarts = 4
    a_inner_rtol = 1e-3
    # Mp/Sm CG relative tolerance inside the preconditioner.  The outer
    # solve is FLEXIBLE GMRES, so preconditioner tolerances only trade
    # inner vs outer iteration counts — the converged Newton update is
    # unchanged (reference uses 1e-6, source/insim.cpp:26-52)
    mp_sm_rtol = 1e-6
    # nodal d x d block-Jacobi for the inner A-solve instead of pointwise
    # Jacobi (preconditioner choice only; converged update unchanged)
    a_block_jacobi = False
    # f32 Jacobian apply in the outer FGMRES (inexact Newton); the f64
    # assembled residual still gates Newton convergence
    f32_matrix = False
    outer_restart = 30
    outer_max_restarts = 40
    # with geometric multigrid enabled (enable_pressure_mg /
    # enable_velocity_mg), optionally apply the V-cycles DIRECTLY as the
    # inner approximate solves instead of preconditioning the inner Krylov
    # loops.  Measured on CPU+TPU: the Krylov-wrapped cycles win (the
    # direct one-cycle A-solve is too weak and outer/Newton counts grow),
    # so the default keeps the cycles inside CG/FGMRES.
    mg_direct = False
    a_mg_cycles = 1
    # with mg_direct + velocity MG: keep the A block as an MG-
    # PRECONDITIONED inner FGMRES instead of raw cycles (raw cycles
    # diverge on grad_div-dominated operators — grad-div near-kernel)
    a_mg_precond = False
    # run the inner A-block FGMRES in the structured-patch stencil
    # layout when the mesh supports it (la/stencil.py): same condensed
    # operator, same iteration counts (ownership-weighted inner
    # products), ~10x cheaper matvecs at refine>=3 sizes
    a_stencil = True
    # polynomial (damped-Jacobi Richardson) preconditioner for the inner
    # A-solve: a_poly > 1 wraps a_poly Jacobi sweeps into each FGMRES
    # preconditioner apply.  Preconditioner-shape change only (flexible
    # inner + f64 Newton gate unchanged); it amortizes the per-iteration
    # CGS2 orthogonalization — which projects against the full static
    # (restart+1, n) basis under lax.while_loop and costs ~2x a stencil
    # matvec at refine=4 — over a_poly matvecs.
    a_poly = 1
    a_poly_omega = 0.8
    # dense condensed inner operators for the whole preconditioner
    # (la/dense.py): the TPU-native layout below ~25k dofs per block,
    # where element gather/scatter latency dominates a GEMV.  Exact same
    # operators — iteration counts unchanged.  dense_a_bf16 additionally
    # stores the (largest) A block in bfloat16: preconditioner-only, the
    # flexible outer and f64 Newton residual are unaffected.
    dense_precond = False
    dense_a_bf16 = False
    # run the whole block-Schur preconditioner in float32: the outer FGMRES
    # is flexible, so an approximate (low-precision) preconditioner changes
    # only iteration counts, never the converged f64 solution.  On TPU the
    # preconditioner is where nearly all flops are, and f32 hits the MXU
    # natively while f64 is emulated.
    mixed_precision_precond = False

    def setup(self):
        assert (self.params.fluid_velocity_degree -
                self.params.fluid_pressure_degree) == 1, \
            "Velocity degree must be one higher than pressure (Taylor-Hood)"
        # attached V-cycles are built against the OLD mesh's shape tables;
        # drop them (re-enable with a fresh hierarchy after setup)
        self._pressure_mg = None
        self._velocity_mg = None
        super().setup()
        self._precompute()

    # ------------------------------------------------------------------
    def enable_pressure_mg(self, meshes, n_smooth: int = 2,
                       fixed_prefix: bool = True, galerkin: bool = False):
        """Attach a V-cycle (la/multigrid.py) as the inner preconditioner
        of the mass-Schur CG.  `meshes` is the nested hierarchy,
        coarsest first, finest == self.mesh.

        The reference's Sm solve is mesh-independent because its A-block
        uses MUMPS/UMFPACK (source/mpi_insim.cpp:122-127); this restores
        mesh-independent Sm iteration counts with TPU-friendly batched
        matvecs.  galerkin=False (default) uses the frozen pressure-
        Laplacian cycle — the mass-Schur IS spectrally a Laplacian, and
        the measured inner counts beat the GalerkinMG alternative (the
        element-LOCAL Sm surrogate blocks under-represent the true global
        product: 13 vs 55 CG iters on the Turek cylinder).  galerkin=True
        coarsens those local blocks anyway (for experimentation).
        Preconditioner-only: the converged solution is unchanged."""
        from ...la.multigrid import GalerkinMG, make_pressure_mg
        assert meshes[-1].n_cells == self.mesh.n_cells, \
            "finest hierarchy level must be the solver mesh"
        assert self.params.fluid_pressure_degree == 1, (
            "pressure V-cycle assumes a Q1 pressure space (node-id-prefix "
            "mask restriction); got degree "
            f"{self.params.fluid_pressure_degree}")
        pdt = jnp.float32 if self.mixed_precision_precond else real_dtype()
        fixed = np.asarray(self.p_constraints.fixed)
        if galerkin:
            from ...fe.space import FESpace
            spaces = [FESpace(m, 1) for m in meshes[:-1]] + [self.p_space]
            self._pressure_mg = GalerkinMG(
                spaces, self.p_space.cell_dofs, None, fixed,
                n_smooth=n_smooth, dtype=pdt)
        else:
            self._pressure_mg = make_pressure_mg(
                meshes, fixed, n_smooth, pdt, fixed_prefix=fixed_prefix)
        self._newton_iter = jax.jit(self._newton_iter_impl)

    def enable_velocity_mg(self, meshes, n_smooth: int = 2,
                           galerkin: bool = True):
        """Attach a vector V-cycle as the preconditioner of the inner
        A-block FGMRES — the TPU-native replacement for the reference's
        MUMPS/UMFPACK direct A-solve (source/mpi_insim.cpp:122-127,
        include/insim.h:217).

        galerkin=True (default) coarsens the TRUE per-Newton velocity
        block (convection INCLUDED) via GalerkinMG — works on hanging-
        node meshes (geometric tables, no node-injection masks).
        galerkin=False keeps the frozen symmetric cycle
        (rho/dt M + mu K + gamma rho G), full refinements only."""
        from ...la.multigrid import GalerkinMG, make_velocity_mg
        assert meshes[-1].n_cells == self.mesh.n_cells
        params = self.params
        pdt = jnp.float32 if self.mixed_precision_precond else real_dtype()
        fixed = np.asarray(self.u_constraints.fixed)
        if galerkin:
            from ...fe.space import FESpace
            deg = params.fluid_velocity_degree
            spaces = [FESpace(m, deg) for m in meshes[:-1]] + \
                [self.u_space]
            self._velocity_mg = GalerkinMG(
                spaces, self.u_space.cell_dofs, None, fixed,
                n_smooth=n_smooth, dtype=pdt, ncomp=self.dim)
        else:
            self._velocity_mg = make_velocity_mg(
                meshes, params.fluid_velocity_degree, self.dim,
                params.fluid_rho, params.viscosity, params.grad_div,
                float(self.time.get_delta_t()), fixed, n_smooth, pdt)
        self._newton_iter = jax.jit(self._newton_iter_impl)

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

        self.Nu = jnp.asarray(cvu.N, dtype=rdt)          # (q, nlu)
        self.Np = jnp.asarray(cvp.N, dtype=rdt)          # (q, nlp)
        self.gu = jnp.asarray(cvu.grad, dtype=rdt)       # (c,q,nlu,d)
        self.JxW = jnp.asarray(cvu.JxW, dtype=rdt)       # (c,q)

        cd = self.sys.cell_dofs
        self.cell_dofs = jnp.asarray(cd, dtype=jnp.int32)
        self.cell_dofs_u = jnp.asarray(cd[:, :self.nu_loc], dtype=jnp.int32)
        self.cell_dofs_p = jnp.asarray(cd[:, self.nu_loc:] - self.n_u,
                                       dtype=jnp.int32)
        # velocity NODE table for the node-block matvec layout
        self.cell_nodes_u = jnp.asarray(self.u_space.cell_dofs,
                                        dtype=jnp.int32)

        # structured-patch stencil for the inner A-block solve
        # (la/stencil.py): available when the mesh is brick-structured —
        # uniformly refine_global'd patches (any dim) OR a locally
        # refined lattice-brick mesh (round 5); _make_preconditioner
        # falls back to the element matvec otherwise.  On hanging-node
        # meshes the inner solve runs flat through the constraint wrap
        # (flat_matvec); on conforming meshes it runs fully in the
        # duplicated patch layout.  Perf-only: the stencil apply IS the
        # condensed element operator (tests/test_stencil.py).
        self._u_stencil = None
        if self.a_stencil:
            from ...la.stencil import PatchGrid, StencilOperator
            pgrid = PatchGrid.build(self.mesh)
            if pgrid is not None:
                self._u_stencil = StencilOperator(pgrid, self.u_space,
                                                  d=d)

        # mass matrices for the preconditioner (no rho; reference
        # source/insim.cpp:255-257)
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

        # gravity / body force at q points
        g = np.zeros(d)
        g[:len(params.gravity)] = params.gravity[:d]
        if self.body_force is not None:
            xq = cvu.xq.reshape(-1, d)
            bf = np.asarray(self.body_force(xq)).reshape(n_c, n_q, d)
            self.gravity_q = jnp.asarray(bf + g, dtype=rdt)
        else:
            self.gravity_q = jnp.asarray(
                np.broadcast_to(g, (n_c, n_q, d)).copy(), dtype=rdt)

        # Neumann (pressure) boundary faces (reference:
        # source/insim.cpp:288-319)
        self._neumann_rhs_const = self._neumann_rhs()

        # constant (linearization-independent) part of the Newton matrix:
        # viscous + grad-div + mass/dt + B/B^T blocks.  Only the two
        # convection terms change per iteration.
        nu_visc, gamma, rho = params.viscosity, params.grad_div, \
            params.fluid_rho
        dt = self.time.get_delta_t()
        I_np = np.eye(d)
        NN = np.einsum("ql,qm,cq->clm", cvu.N, cvu.N, cvu.JxW)
        gg = np.einsum("cqlx,cqmx,cq->clm", cvu.grad, cvu.grad, cvu.JxW)
        Auu_c = np.einsum("clm,ab->clamb", nu_visc * gg + (rho / dt) * NN,
                          I_np)
        Auu_c = Auu_c + (gamma * rho) * np.einsum(
            "cqla,cqmb,cq->clamb", cvu.grad, cvu.grad, cvu.JxW)
        Auu_c = Auu_c.reshape(n_c, self.nu_loc, self.nu_loc)
        Aup = -np.einsum("cqla,qn,cq->clan", cvu.grad, cvp.N,
                         cvu.JxW).reshape(n_c, self.nu_loc, nlp)
        Apu = -np.einsum("qn,cqmb,cq->cnmb", cvp.N, cvu.grad,
                         cvu.JxW).reshape(n_c, nlp, self.nu_loc)
        nl = self.nu_loc + nlp
        A_const = np.zeros((n_c, nl, nl))
        A_const[:, :self.nu_loc, :self.nu_loc] = Auu_c
        A_const[:, :self.nu_loc, self.nu_loc:] = Aup
        A_const[:, self.nu_loc:, :self.nu_loc] = Apu
        self._mdt = jnp.float32 if self.f32_matrix else rdt
        self._A_const = jnp.asarray(A_const, dtype=self._mdt)
        self._Nu_m = jnp.asarray(cvu.N, dtype=self._mdt)
        self._gu_m = jnp.asarray(cvu.grad, dtype=self._mdt)
        self._JxW_m = jnp.asarray(cvu.JxW, dtype=self._mdt)

        self._newton_iter = jax.jit(self._newton_iter_impl)

    def _neumann_rhs(self):
        params = self.params
        fv = self.fv_u
        rhs = np.zeros(self.n_dofs)
        if fv is None or params.n_fluid_neumann_bcs == 0:
            return jnp.asarray(rhs, dtype=real_dtype())
        d = self.dim
        for i in range(len(fv.cells)):
            bid = int(fv.boundary_id[i])
            if bid not in params.fluid_neumann_bcs:
                continue
            pbc = params.fluid_neumann_bcs[bid]
            # rhs[(l,a)] -= N_l n_a p_bc JxW
            rl = -np.einsum("qi,qa,q->ia", fv.N[i], fv.normals[i],
                            fv.JxW[i]) * pbc
            c = int(fv.cells[i])
            np.add.at(rhs, self.sys.cell_dofs[c][:self.nu_loc],
                      rl.reshape(-1))
        return jnp.asarray(rhs, dtype=real_dtype())

    # ------------------------------------------------------------------
    def _assemble(self, eval_pt, present, indicator, fsi_acc, fsi_stress,
                  fsi_acc_nodal):
        """Element Newton matrix + rhs at evaluation point.

        Weak form: reference source/mpi_insim.cpp:263-304."""
        params = self.params
        d = self.dim
        nu_visc = params.viscosity
        gamma = params.grad_div
        rho = params.fluid_rho
        dt = self.time.get_delta_t()
        Nu, Np, gu, JxW = self.Nu, self.Np, self.gu, self.JxW
        n_c = gu.shape[0]

        u_eval = eval_pt[:self.n_u].reshape(-1, d)
        ul = u_eval[self.u_space.cell_dofs]                  # (c,nlu,d)
        p_eval = eval_pt[self.n_u:][self.p_space.cell_dofs]  # (c,nlp)
        u_pres = present[:self.n_u].reshape(-1, d)
        unl = u_pres[self.u_space.cell_dofs]

        uc = jnp.einsum("ql,cla->cqa", Nu, ul)
        guc = jnp.einsum("cqlx,cla->cqax", gu, ul)
        pc = jnp.einsum("qn,cn->cq", Np, p_eval)
        un = jnp.einsum("ql,cla->cqa", Nu, unl)
        divu = jnp.trace(guc, axis1=2, axis2=3)

        # matrix: constant part precomputed at setup; only the two
        # convection terms are linearization-dependent.  In f32_matrix mode
        # both are built in f32 (the operator and preconditioner consume the
        # matrix in f32 anyway; the f64 rhs below gates Newton convergence).
        mdt = self._mdt
        I_m = jnp.eye(d, dtype=mdt)
        Nu_m, gu_m, JxW_m = self._Nu_m, self._gu_m, self._JxW_m
        uc_m = uc.astype(mdt)
        guc_m = guc.astype(mdt)
        g_uc = jnp.einsum("cqmx,cqx->cqm", gu_m, uc_m)
        conv2 = jnp.einsum("ql,cqm,cq->clm", Nu_m, g_uc, JxW_m)
        conv = jnp.einsum("clm,ab->clamb", rho * conv2, I_m)
        conv = conv + rho * jnp.einsum("ql,qm,cqab,cq->clamb", Nu_m, Nu_m,
                                       guc_m, JxW_m)
        conv = conv.reshape(n_c, self.nu_loc, self.nu_loc)
        A_loc = self._A_const.at[:, :self.nu_loc, :self.nu_loc].add(conv)
        nlp = self.nlp

        # RHS (negative residual)
        conv_c = jnp.einsum("cqax,cqx->cqa", guc, uc)
        r_u = (-nu_visc * jnp.einsum("cqax,cqlx,cq->cla", guc, gu, JxW)
               - rho * jnp.einsum("ql,cqa,cq->cla", Nu, conv_c, JxW)
               + jnp.einsum("cq,cqla,cq->cla", pc, gu, JxW)
               - (gamma * rho) * jnp.einsum("cq,cqla,cq->cla", divu, gu, JxW)
               - (rho / dt) * jnp.einsum("ql,cqa,cq->cla", Nu, uc - un, JxW)
               + rho * jnp.einsum("ql,cqa,cq->cla", Nu, self.gravity_q, JxW))
        # FSI body force on artificial-fluid cells (reference:
        # source/insim.cpp:277-284): grad(phi):sigma_fsi + a_fsi . phi
        r_u = r_u + indicator[:, None, None] * (
            jnp.einsum("cqla,cab,cq->clb", gu, fsi_stress, JxW) +
            jnp.einsum("ql,ca,cq->cla", Nu, fsi_acc, JxW))
        # MPI-style nodal FSI acceleration field (reference:
        # source/mpi_insim.cpp:298-304, note the extra rho)
        acc_q = jnp.einsum("ql,cla->cqa", Nu,
                           fsi_acc_nodal[self.u_space.cell_dofs])
        r_u = r_u + (rho * indicator[:, None, None]) * jnp.einsum(
            "ql,cqa,cq->cla", Nu, acc_q, JxW)
        r_p = jnp.einsum("cq,qn,cq->cn", divu, Np, JxW)

        r_loc = jnp.concatenate([r_u.reshape(n_c, -1), r_p], axis=1)
        rhs = scatter_add(self.n_dofs, self.cell_dofs, r_loc)
        rhs = rhs + self._neumann_rhs_const
        return A_loc, rhs

    # ------------------------------------------------------------------
    def _make_preconditioner(self, A_loc, ucons, pcons):
        """Grad-Div block-Schur right preconditioner (reference:
        source/insim.cpp:55-120)."""
        params = self.params
        d = self.dim
        gamma, rho = params.grad_div, params.fluid_rho
        nu_visc = params.viscosity
        dt = self.time.get_delta_t()

        pdt = jnp.float32 if self.mixed_precision_precond else A_loc.dtype
        A_loc = A_loc.astype(pdt)
        Mp_loc = self.Mp_loc.astype(pdt)
        Mu_diag = self.Mu_diag.astype(pdt)
        Mp_diag = self.Mp_diag.astype(pdt)

        Auu = A_loc[:, :self.nu_loc, :self.nu_loc]
        Aup = A_loc[:, :self.nu_loc, self.nu_loc:]
        Apu = A_loc[:, self.nu_loc:, :self.nu_loc]

        # node-block layout when the solver carries a velocity node table
        # (the padded dof-sharded proxy in parallel/shard.py does not and
        # falls back to the flat layout)
        cn_u = getattr(self, "cell_nodes_u", None)
        n_c = Auu.shape[0]
        nlu = self.nu_loc // d
        if cn_u is not None:
            Auu_b = Auu.reshape(n_c, nlu, d, nlu, d)
            op_A = ucons.wrap_operator(lambda x: element_matvec_nodeblock(
                Auu_b, cn_u, self.n_u // d, x))
        else:
            op_A = ucons.wrap_operator(lambda x: element_matvec(
                Auu, self.cell_dofs_u, self.n_u, x))
        if self.a_block_jacobi:
            # nodal d x d block-Jacobi: the grad-div term couples velocity
            # components, which pointwise Jacobi ignores
            from ...la.smalltensor import inv as small_inv
            d = self.dim
            nlu = self.nu_loc // d
            n_c = Auu.shape[0]
            blocks = Auu.reshape(n_c, nlu, d, nlu, d)
            diag_blocks = blocks[:, jnp.arange(nlu), :, jnp.arange(nlu), :]
            # ^ (nlu, n_c, d, d) after fancy indexing; move cells first
            diag_blocks = jnp.swapaxes(diag_blocks, 0, 1)
            nodes = self.cell_dofs_u.reshape(n_c, nlu, d)[:, :, 0] // d
            n_nodes = self.n_u // d
            D = jnp.zeros((n_nodes, d, d), dtype=pdt).at[
                nodes.reshape(-1)].add(diag_blocks.reshape(-1, d, d))
            fixed = ucons.fixed.reshape(n_nodes, d)
            I_d = jnp.eye(d, dtype=pdt)
            fi = fixed[:, :, None] | fixed[:, None, :]
            D = jnp.where(fi, I_d[None], D)
            Dinv = small_inv(D)

            def apply_dinv_A(r):
                return jnp.einsum(
                    "nab,nb->na", Dinv, r.reshape(n_nodes, d),
                    preferred_element_type=pdt).reshape(-1)
        else:
            diag_A = jnp.where(ucons.fixed, 1.0, element_diag(
                Auu, self.cell_dofs_u, self.n_u))
            dinv_A = jnp.where(diag_A != 0, 1.0 / diag_A, 1.0)

            def apply_dinv_A(r):
                return r * dinv_A

        if cn_u is not None:
            nlp = Apu.shape[1]
            Apu_b = Apu.reshape(n_c, nlp, nlu, d)
            Aup_b = Aup.reshape(n_c, nlu, d, nlp)

            def apply_B(xu):   # u -> p   (condensed)
                xu = ucons.expand(xu)
                y = element_matvec_u_to_p_nodeblock(
                    Apu_b, cn_u, self.cell_dofs_p, self.n_p, xu)
                return pcons.restrict(y) if pcons.any_hanging else y

            def apply_BT(xp):  # p -> u   (condensed)
                xp = pcons.expand(xp) if pcons.any_hanging else xp
                y = element_matvec_p_to_u_nodeblock(
                    Aup_b, cn_u, self.cell_dofs_p, self.n_u // d, xp)
                return ucons.restrict(y)
        else:
            def apply_B(xu):   # u -> p   (condensed)
                xu = ucons.expand(xu)
                y = element_matvec_rect(Apu, self.cell_dofs_p,
                                        self.cell_dofs_u, self.n_p, xu)
                return pcons.restrict(y) if pcons.any_hanging else y

            def apply_BT(xp):  # p -> u   (condensed)
                xp = pcons.expand(xp) if pcons.any_hanging else xp
                y = element_matvec_rect(Aup, self.cell_dofs_u,
                                        self.cell_dofs_p, self.n_u, xp)
                return ucons.restrict(y)

        mu_inv = jnp.where(Mu_diag != 0, 1.0 / Mu_diag, 1.0)

        def op_Sm(xp):
            y = apply_B(mu_inv * apply_BT(xp))
            return jnp.where(pcons.fixed, xp, y)

        # Jacobi preconditioner for the mass-Schur CG from the cell-local
        # diagonal of B diag(Mu)^-1 B^T (the reference uses identity,
        # source/insim.cpp:93-101; a diagonal scaling changes only the
        # iteration count, not the converged application)
        sm_diag_loc = jnp.einsum("cnk,ck,cnk->cn", Apu,
                                 mu_inv[self.cell_dofs_u], Apu)
        sm_diag = scatter_add(self.n_p, self.cell_dofs_p, sm_diag_loc)
        sm_dinv = jnp.where(sm_diag > 0, 1.0 / jnp.where(sm_diag > 0,
                                                         sm_diag, 1.0), 1.0)

        op_Mp = pcons.wrap_operator(lambda x: element_matvec(
            Mp_loc, self.cell_dofs_p, self.n_p, x))
        mp_dinv = jnp.where(Mp_diag != 0, 1.0 / Mp_diag, 1.0)

        # getattr: the dof-sharded proxy (parallel/shard.py) calls this
        # unbound with a SimpleNamespace and uses the flat matvec layout
        if getattr(self, "dense_precond", False):
            # Dense condensed inner operators (la/dense.py): at <~25k dofs
            # per block the batched element matvec is gather/scatter
            # latency-bound (~2 ms fixed on v5e) while a dense GEMV is
            # bandwidth-bound (~0.1-1 ms).  The operators are EXACTLY the
            # condensed matvecs (R A E + fixed identity) — iteration
            # counts are unchanged, only the cost per iteration drops.
            # The explicit Sm = B diag(Mu)^-1 B^T mirrors the reference's
            # explicit mass_schur assembly (source/mpi_insim.cpp:36-50).
            from ...la.dense import (add_unit_diag, condensed_dense, gemv,
                                     hanging_tables)
            cdu, cdp = self.cell_dofs_u, self.cell_dofs_p
            # static hanging structure from the solver's own (concrete)
            # constraints — runtime-extended variants share it
            uht = hanging_tables(self.u_constraints)
            pht = hanging_tables(self.p_constraints)
            Ad = condensed_dense(Auu, cdu, cdu, self.n_u, self.n_u,
                                 ucons, ucons, uht, uht,
                                 unit_fixed_diag=True)
            Bd = condensed_dense(Apu, cdp, cdu, self.n_p, self.n_u,
                                 pcons, ucons, pht, uht)
            Btd = condensed_dense(Aup, cdu, cdp, self.n_u, self.n_p,
                                  ucons, pcons, uht, pht)
            Sd = add_unit_diag(Bd @ (mu_inv[:, None] * Btd), pcons.fixed)
            Mpd = condensed_dense(Mp_loc, cdp, cdp, self.n_p, self.n_p,
                                  pcons, pcons, pht, pht,
                                  unit_fixed_diag=True)
            A_mv = Ad.astype(jnp.bfloat16) if getattr(
                self, "dense_a_bf16", False) else Ad
            op_A = lambda x: gemv(A_mv, x)           # noqa: E731
            apply_BT = lambda xp: gemv(Btd, xp)      # noqa: E731
            op_Sm = lambda xp: gemv(Sd, xp)          # noqa: E731
            op_Mp = lambda x: gemv(Mpd, x)           # noqa: E731
            dA = jnp.diag(Ad)
            dinv_A = jnp.where(dA != 0, 1.0 / dA, 1.0)
            apply_dinv_A = lambda r: r * dinv_A      # noqa: E731
            dS = jnp.diag(Sd)
            sm_dinv = jnp.where(dS > 0, 1.0 / jnp.where(dS > 0, dS, 1.0),
                                1.0)

        from ...la.multigrid import GalerkinMG
        mg = getattr(self, "_pressure_mg", None)
        if isinstance(mg, GalerkinMG):
            # cell-local mass-Schur blocks of THIS Newton matrix (the
            # reference rebuilds mass_schur = B diag(Mu)^-1 B^T explicitly
            # every step, source/mpi_insim.cpp:36-50)
            sm_loc = jnp.einsum("cik,ck,cjk->cij", Apu,
                                mu_inv[self.cell_dofs_u], Apu,
                                preferred_element_type=pdt)
            fixp = pcons.fixed[self.cell_dofs_p]
            sm_loc = jnp.where(fixp[:, None, :] | fixp[:, :, None], 0.0,
                               sm_loc)
            sm_M = mg.build(sm_loc)
        elif mg is not None:
            sm_M = mg.vcycle
        else:
            sm_M = lambda r: r * sm_dinv
        vmg = getattr(self, "_velocity_mg", None)
        if isinstance(vmg, GalerkinMG):
            # TRUE velocity block (convection included), fixed rows/cols
            # projected out
            fixu = ucons.fixed[self.cell_dofs_u]
            Auu_m = jnp.where(fixu[:, None, :] | fixu[:, :, None], 0.0,
                              Auu)
            a_M = vmg.build(Auu_m)
        elif vmg is not None:
            a_M = vmg.vcycle
        else:
            a_M = apply_dinv_A

        # structured-patch stencil inner A-solve (la/stencil.py): the
        # whole inner FGMRES runs in the duplicated patch layout with
        # ownership-weighted inner products — exactly the same condensed
        # solve (tests/test_stencil.py), matvecs as shifted contiguous
        # windowed einsums instead of the index-traffic-bound element
        # gather/scatter.  Element path retained for dense/velocity-MG
        # configs and the dof-sharded proxy.
        st = getattr(self, "_u_stencil", None)
        if getattr(self, "dense_precond", False) or vmg is not None:
            st = None
        def _poly_wrap(base_M, op):
            """a_poly damped-Jacobi Richardson sweeps as one preconditioner
            apply (class docstring at a_poly): z0 = w M r;
            z_{i+1} = z_i + w M (r - A z_i)."""
            # getattr: the dof-sharded proxy (parallel/shard.py) calls
            # this unbound with a SimpleNamespace
            k_p = getattr(self, "a_poly", 1)
            omega = getattr(self, "a_poly_omega", 0.8)
            if k_p <= 1:
                return base_M

            def M(r):
                z = omega * base_M(r)
                for _ in range(k_p - 1):
                    z = z + omega * base_M(r - op(z))
                return z
            return M

        st_flat = st is not None and ucons.any_hanging
        if st is not None and not st_flat:
            W_st = st.build_weights(Auu.reshape(n_c, nlu, d, nlu, d))
            fix_st = st.spread_mask(ucons.fixed)
            w_st = st.weight(pdt)
            if self.a_block_jacobi:
                a_M_st = st.spread_blockdiag(Dinv)
            else:
                dinv_st = st.spread(dinv_A)
                a_M_st = lambda r: r * dinv_st     # noqa: E731
            a_M_st = _poly_wrap(
                a_M_st, lambda x: st.condensed_matvec(W_st, fix_st, x))
        elif st_flat:
            # hanging-node brick meshes (round 5): the constraint
            # projection P/P^T stays outside the operator, so the inner
            # FGMRES runs FLAT with the stencil replacing only the raw
            # element matvec inside the wrap — same condensed operator,
            # same iterations, gather/scatter traffic gone
            W_st = st.build_weights(Auu.reshape(n_c, nlu, d, nlu, d))
            op_A = ucons.wrap_operator(lambda x: st.flat_matvec(W_st, x))
            a_M = _poly_wrap(a_M, op_A)
        elif vmg is None:
            a_M = _poly_wrap(a_M, op_A)

        def _apply(v, with_stats):
            out_dtype = v.dtype
            v = v.astype(pdt)
            vu, vp = v[:self.n_u], v[self.n_u:]
            np_norm = jnp.linalg.norm(vp)
            atol_p = jnp.maximum(self.mp_sm_rtol * np_norm, 1e-10)
            mp = cg(op_Mp, vp, M=lambda r: r * mp_dinv, atol=atol_p,
                    maxiter=self.mp_cg_maxiter)
            tmp = mp.x * (-(nu_visc + gamma * rho))
            if mg is not None and self.mg_direct:
                # one V-cycle IS the approximate Sm^-1: the outer solver is
                # FLEXIBLE, so a fixed inexact inner apply only trades
                # inner for outer iterations (Washio Tpp does the same
                # with one ILU sweep, source/mpi_supg_solver.cpp:56-133)
                sm_x, sm_it = sm_M(vp), jnp.zeros((), jnp.int32)
            else:
                r = cg(op_Sm, vp, M=sm_M, atol=atol_p,
                       maxiter=self.schur_cg_maxiter)
                sm_x, sm_it = r.x, r.iters
            dst_p = sm_x * (-rho / dt) + tmp
            utmp = vu - apply_BT(dst_p)
            if vmg is not None and self.mg_direct and \
                    not self.a_mg_precond:
                # a_mg_cycles V-cycles of the frozen symmetric velocity
                # operator replace the inner FGMRES A-solve (reference:
                # one exact MUMPS solve, source/mpi_insim.cpp:122-127)
                au_x = a_M(utmp)
                for _ in range(self.a_mg_cycles - 1):
                    au_x = au_x + a_M(utmp - op_A(au_x))
                au_it = jnp.zeros((), jnp.int32)
            elif st is not None and not st_flat:
                # stencil-layout inner FGMRES: spread -> weighted solve ->
                # read back the owning copies.  The weighted inner product
                # makes this iteration-for-iteration identical to the flat
                # element-path solve (la/stencil.py docstring).
                atol_u = self.a_inner_rtol * jnp.linalg.norm(utmp)
                ut_st = st.spread(utmp)
                au = fgmres(
                    lambda x: st.condensed_matvec(W_st, fix_st, x),
                    ut_st, M=a_M_st, atol=atol_u,
                    restart=self.a_inner_restart,
                    max_restarts=self.a_inner_restarts, weight=w_st)
                au_x, au_it = st.unspread(au.x), au.iters
            else:
                atol_u = self.a_inner_rtol * jnp.linalg.norm(utmp)
                au = fgmres(op_A, utmp, M=a_M,
                            atol=atol_u, restart=self.a_inner_restart,
                            max_restarts=self.a_inner_restarts)
                au_x, au_it = au.x, au.iters
            out = jnp.concatenate([au_x, dst_p]).astype(out_dtype)
            if with_stats:
                return out, (mp.iters, sm_it, au_it)
            return out

        def precond(v):
            return _apply(v, False)

        # telemetry twin: one apply -> (result, (mp_iters, sm_iters,
        # a_iters)); used by the iteration-parity report in bench.py
        precond.stats = lambda v: _apply(v, True)
        return precond

    # ------------------------------------------------------------------
    def _newton_iter_impl(self, eval_pt, present, indicator, fsi_acc,
                          fsi_stress, fsi_acc_nodal, cons, ucons, pcons,
                          res0=None):
        A_loc, rhs = self._assemble(eval_pt, present, indicator, fsi_acc,
                                    fsi_stress, fsi_acc_nodal)
        b = cons.condense_rhs(rhs)
        res_norm = jnp.linalg.norm(b)
        atol = self._outer_atol(res_norm, res0,
                                jnp.maximum(1e-8 * res_norm, 1e-10))

        nlu = self.nu_loc // self.dim
        if self.f32_matrix:
            # inexact Newton: the Jacobian apply runs in f32 (MXU-native)
            # while the assembled residual, Newton criterion and update
            # accumulation stay f64 — Newton self-corrects the update error
            A_op = A_loc.astype(jnp.float32)

            def apply_A(x):
                y = element_matvec_taylor_hood(
                    A_op, self.cell_nodes_u, self.cell_dofs_p, nlu,
                    self.dim, self.n_u, self.n_p, x.astype(jnp.float32))
                return y.astype(x.dtype)
        else:
            def apply_A(x):
                return element_matvec_taylor_hood(
                    A_loc, self.cell_nodes_u, self.cell_dofs_p, nlu,
                    self.dim, self.n_u, self.n_p, x)

        op = cons.wrap_operator(apply_A)
        precond = self._make_preconditioner(A_loc, ucons, pcons)
        x, iters, residual = self._outer_solve(op, b, precond, atol)
        du = cons.distribute(x)
        return du, res_norm, iters, residual

    # ------------------------------------------------------------------
    def make_on_device_stepper(self):
        """Fully on-device time stepping: lax.fori_loop over steps with the
        Newton loop as a lax.while_loop — zero host round-trips per step.
        This is the production/benchmark path; run_one_step remains the
        instrumented path.  Returns fn(present, n_steps) ->
        (present, max_rel_res, max_newton_iters): the worst final Newton
        relative residual and largest iteration count over the window, so
        callers can detect a silently non-converged step (the host path
        raises 'Too many Newton iterations!' instead)."""
        import jax.lax as lax
        params = self.params
        cons = self.zero_constraints
        ucons = self.u_constraints
        pcons = self.p_constraints
        tol = params.fluid_tolerance
        max_it = params.fluid_max_iterations

        def newton_once(eval_pt, present, res0=None):
            du, rn, its, _ = self._newton_iter_impl(
                eval_pt, present, self.indicator, self.fsi_acceleration,
                self.fsi_stress_cell, self.fsi_acc_nodal, cons, ucons, pcons,
                res0=res0)
            return eval_pt + du, rn, its

        def one_step(present):
            eval_pt, res0, its0 = newton_once(present, present)
            inf = jnp.asarray(jnp.inf, dtype=res0.dtype)

            def stagnated(res, prev, last_its):
                # host-path parity (run_one_step): a 0-iteration Krylov
                # solve with a non-decreasing residual is machine-level
                # stagnation -> stop and treat the step as converged
                return (last_its == 0) & (res >= prev * (1 - 1e-12))

            def cond(s):
                eval_pt, it, res, prev, last_its = s
                return ((res / res0 > tol) & (res > 1e-11) &
                        (it < max_it) & ~stagnated(res, prev, last_its))

            def body(s):
                eval_pt, it, res, prev, last_its = s
                eval_new, rn, its = newton_once(eval_pt, present, res0)
                return (eval_new, it + 1, rn, res, its)

            eval_pt, it, res, prev, last_its = lax.while_loop(
                cond, body, (eval_pt, 1, res0, inf, its0))
            rel = jnp.where(res0 > 1e-11, res / jnp.maximum(res0, 1e-300),
                            0.0)
            rel = jnp.where(stagnated(res, prev, last_its), 0.0, rel)
            return eval_pt, rel, it

        @jax.jit
        def run_n(present, n_steps):
            def body(i, s):
                p, worst_rel, worst_it = s
                p2, rel, it = one_step(p)
                return (p2, jnp.maximum(worst_rel, rel),
                        jnp.maximum(worst_it, it))

            return lax.fori_loop(0, n_steps, body,
                                 (present, jnp.zeros((), present.dtype), 0))

        return run_n

    def make_fsi_step(self):
        """One coupled-run time step as a SINGLE jitted call: Newton as a
        lax.while_loop with the per-step FSI fields and (extended)
        constraint sets as runtime pytree arguments, nodal-stress update
        fused in.  The FSI drivers use this instead of the host Newton
        loop of run_one_step — same converged solution (flexible Krylov,
        same tolerances), one dispatch per fluid step.

        Returns fn(present, indicator, fsi_acc, fsi_stress, fsi_acc_nodal,
        zero_cons, nonzero_cons, ucons, pcons) ->
        (present, stress_nodal, rel_res, newton_iters)."""
        import jax.lax as lax
        params = self.params
        tol = params.fluid_tolerance
        max_it = params.fluid_max_iterations

        @jax.jit
        def step(present, indicator, fsi_acc, fsi_stress, fsi_acc_nodal,
                 zero_cons, nonzero_cons, ucons, pcons):
            def newton_once(eval_pt, res0=None):
                du, rn, its, _ = self._newton_iter_impl(
                    eval_pt, present, indicator, fsi_acc, fsi_stress,
                    fsi_acc_nodal, zero_cons, ucons, pcons, res0=res0)
                return eval_pt + du, rn, its

            eval_pt = nonzero_cons.apply_increment(present)
            eval_pt, res0, its0 = newton_once(eval_pt)
            inf = jnp.asarray(jnp.inf, dtype=res0.dtype)

            def stagnated(res, prev, last_its):
                # host-path parity: see make_on_device_stepper
                return (last_its == 0) & (res >= prev * (1 - 1e-12))

            def cond(s):
                e, it, res, prev, last_its = s
                return ((res / jnp.maximum(res0, 1e-300) > tol) &
                        (res > 1e-11) & (it < max_it) &
                        ~stagnated(res, prev, last_its))

            def body(s):
                e, it, res, prev, last_its = s
                e2, rn, its = newton_once(e, res0)
                return (e2, it + 1, rn, res, its)

            eval_pt, it, res, prev, last_its = lax.while_loop(
                cond, body, (eval_pt, 1, res0, inf, its0))
            rel = jnp.where(res0 > 1e-11,
                            res / jnp.maximum(res0, 1e-300), 0.0)
            rel = jnp.where(stagnated(res, prev, last_its), 0.0, rel)
            return eval_pt, self._update_stress_impl(eval_pt), rel, it

        return step

    def run_one_step(self, apply_nonzero_constraints: bool,
                     assemble_system: bool = True, verbose: bool = True,
                     zero_cons=None, nonzero_cons=None):
        """reference: source/insim.cpp:370-459."""
        params = self.params
        zero_cons = zero_cons or self.zero_constraints
        nonzero_cons = nonzero_cons or self.nonzero_constraints
        self.time.increment()
        if verbose:
            print(f"*** Time step = {self.time.get_timestep()}, "
                  f"at t = {self.time.current():.6e}")

        eval_pt = self.present_solution
        if apply_nonzero_constraints:
            eval_pt = nonzero_cons.apply_increment(eval_pt)

        current_res = 1.0
        initial_res = 1.0
        rel_res = 1.0
        prev_res = None
        it = 0
        while rel_res > params.fluid_tolerance and current_res > 1e-11:
            if it >= params.fluid_max_iterations:
                raise RuntimeError("Too many Newton iterations!")
            with self.timer.scope("Assemble + solve (Newton iter)"):
                r0 = jnp.asarray(initial_res if it > 0 else jnp.inf,
                                 dtype=real_dtype())
                du, res_norm, gmres_iters, gmres_res = self._newton_iter(
                    eval_pt, self.present_solution, self.indicator,
                    self.fsi_acceleration, self.fsi_stress_cell,
                    self.fsi_acc_nodal, zero_cons,
                    self._u_cons_of(zero_cons), self.p_constraints,
                    res0=r0)
                current_res = float(res_norm)
            if (prev_res is not None and int(gmres_iters) == 0
                    and current_res >= prev_res * (1 - 1e-12)):
                # fully stagnated at machine-level residual
                break
            prev_res = current_res
            eval_pt = eval_pt + du
            if it == 0:
                initial_res = max(current_res, 1e-300)
            rel_res = current_res / initial_res
            if verbose:
                print(f" ITR = {it} ABS_RES = {current_res:.6e} "
                      f"REL_RES = {rel_res:.6e} "
                      f"GMRES_ITR = {int(gmres_iters)} "
                      f"GMRES_RES = {float(gmres_res):.6e}")
            it += 1
        self.newton_iters = it
        self.solution_increment = eval_pt - self.present_solution
        self.present_solution = eval_pt
        with self.timer.scope("Update stress", sync=self.present_solution):
            self.update_stress()
        # output / checkpoint / standalone Kelly AMR
        # (reference: source/insim.cpp:436-446, source/mpi_insim.cpp:475-489)
        self._end_of_step_io(refine_levels=(1, 3))

    def run(self, verbose: bool = True):
        """reference: source/insim.cpp:445-459."""
        if not self._setup_done:
            self.mesh = self.mesh.refine_global(
                self.params.global_refinements[0])
            self.setup()
        self.run_one_step(True, verbose=verbose)
        while self.time.end() - self.time.current() > 1e-12:
            self.run_one_step(False, verbose=verbose)

    def run_on_device(self, verbose: bool = True):
        """run() with all steps after the first as ONE device dispatch
        (make_on_device_stepper); static-BC configurations only (the
        stepper applies zero-increment constraints; time-dependent
        hard-coded BCs need the SUPG-style per-step table)."""
        assert not self.hard_coded_bcs, \
            "run_on_device(InsIM) supports static BCs only"
        if not self._setup_done:
            self.mesh = self.mesh.refine_global(
                self.params.global_refinements[0])
            self.setup()
        self.run_one_step(True, verbose=verbose)
        dt = self.time.get_delta_t()
        n = int(round((self.time.end() - self.time.current()) / dt))
        if n <= 0:
            return
        stepper = self.make_on_device_stepper()
        sol, rel, its = stepper(self.present_solution, n)
        if float(rel) > self.params.fluid_tolerance:
            raise RuntimeError("Too many Newton iterations!")
        self.solution_increment = sol - self.present_solution
        self.present_solution = sol
        self.newton_iters = int(its)
        for _ in range(n):
            self.time.increment()
        self.update_stress()
        if verbose:
            print(f"run_on_device: {n} steps, worst rel_res "
                  f"{float(rel):.3e}, max newton iters {int(its)}")
