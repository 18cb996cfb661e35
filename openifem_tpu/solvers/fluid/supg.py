"""SUPG/PSPG/LSIC-stabilized fluid solvers: SUPGInsIM and SCnsIM.

Reference: include/mpi_supg_solver.h, source/mpi_supg_solver.cpp (Newton
driver + Washio incomplete-Schur preconditioner, citing Washio et al. CMAME
194 (2005) 4027), source/mpi_insim_supg.cpp (incompressible SUPG assembly),
source/mpi_scnsim.cpp (slightly-compressible assembly with isentropic
continuity, PML attenuation and artificial-solid handling).

Equal-order-friendly stabilization with Tezduyar UGN parameters:
  h = 2|u| / sum_a |u . grad N_a|   (over the reference's first
      dofs_per_cell / dofs_per_vertex system shape functions)
  tau_SUPG = ((2/dt)^2 + (2|u|/h)^2 + (4 nu/h^2)^2)^(-1/2)
  tau_PSPG = tau_SUPG / rho,  tau_LSIC = (h/2)|u| z(Re_local)

Preconditioner (BlockIncompSchurPreconditioner): Pvv = ILU(0) of Avv in the
reference -> Jacobi here (pointwise, TPU-native); Tpp = App - Apv Pvv^-1 Avp
applied matrix-free; Tpp^-1 by inner GMRES(200) at rtol 1e-3 preconditioned
with (diagonal of) B2pp = App - Apv rowsum(|Avv|)^-1 Avp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...config import real_dtype
from ...la.krylov import fgmres
from ...la.operators import (element_diag, element_matvec,
                             element_matvec_p_to_u_nodeblock,
                             element_matvec_rect,
                             element_matvec_u_to_p_nodeblock,
                             element_matvec_taylor_hood, scatter_add)
from .base import FluidSolverBase

CP_TO_CV = 1.4          # reference: source/mpi_scnsim.cpp:124
ATM = 1013250.0         # reference: source/mpi_scnsim.cpp:125
KAPPA_S = 1e4           # reference: source/mpi_scnsim.cpp:126


class SUPGFluidSolver(FluidSolverBase):
    """Shared Newton loop + incomplete-Schur solve for the SUPG family."""

    tpp_restart = 200
    tpp_max_restarts = 2
    outer_restart = 30
    outer_max_restarts = 40
    # outer FGMRES relative tolerance (MPI family: 1e-6,
    # source/mpi_supg_solver.cpp:311-327; serial SCnsIM overrides 1e-8)
    outer_rtol = 1e-6
    # f32 preconditioner inside the f64 flexible outer solve (see InsIM)
    mixed_precision_precond = False
    # f32 Jacobian apply in the outer FGMRES (inexact Newton); the f64
    # assembled residual still gates Newton convergence (see InsIM)
    f32_matrix = False
    # dense condensed p-coupled blocks + explicit dense Tpp in the
    # preconditioner (la/dense.py; see _make_preconditioner).  Exact same
    # operators as the element matvec path — iteration counts unchanged,
    # per-iteration gather/scatter latency gone.  Needs n_p * n_u * 4 B
    # of HBM (rectangular blocks only — no dense Avv).
    dense_precond = False
    # coupled-node stencil (round 5, la/stencil.py): the Q1/Q1 equal-order
    # SUPG family admits ONE (dim+1)-component (2k+1)^dim-point stencil
    # for the coupled system matrix on brick-structured meshes (uniform
    # OR locally refined — e.g. fsi-wall-3D's z-band).  The outer Jacobian
    # apply and the Tpp preconditioner pieces (Avp/Apv/App as component
    # slices of the same tensor) become shifted contiguous multiply-adds
    # instead of element gather/scatters.  Exact same operator
    # (reassociated sums only): converged solutions and iteration counts
    # unchanged (tests/test_supg.py).  Auto-disabled on non-brick meshes
    # or unequal FE degrees.
    coupled_stencil = True
    # hybrid (r5): keep the stencil for the OUTER Jacobian apply but let
    # dense_precond own the Tpp pieces.  On multi-brick 3D lattices the
    # Tpp inner GMRES issues O(1e3) component-slice stencil applies per
    # step, each latency-bound across brick shape groups, where one dense
    # GEMV wins (measured on fsi-wall-3D: 4026 ms/step all-stencil vs
    # 2428 all-dense); the outer apply is one full-tensor apply per
    # Krylov iteration and keeps the stencil's bandwidth advantage.
    stencil_outer_only = False

    def setup(self):
        # a previously attached V-cycle is built against the OLD mesh's
        # shape tables; drop it (re-enable with a fresh hierarchy after)
        self._pressure_mg = None
        super().setup()
        self._precompute()

    def _refine_setup_with_mg(self):
        """Apply the prm's global refinement, keeping the intermediate
        meshes as the V-cycle hierarchy for the Tpp preconditioner (see
        enable_pressure_mg; pure preconditioner, converged solutions
        unchanged).  Shared by run()/run_on_device()."""
        gr = self.params.global_refinements[0]
        meshes = [self.mesh]
        for _ in range(gr):
            meshes.append(meshes[-1].refine_global(1))
        self.mesh = meshes[-1]
        if self.hard_coded_bcs:
            self.bc_time += self.time.get_delta_t()
        self.setup()
        if gr >= 1 and self.params.fluid_pressure_degree == 1:
            self.enable_pressure_mg(meshes)

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
        self.gp = jnp.asarray(cvp.grad, dtype=rdt)
        self.JxW = jnp.asarray(cvu.JxW, dtype=rdt)

        cd = self.sys.cell_dofs
        self.cell_dofs = jnp.asarray(cd, dtype=jnp.int32)
        self.cell_dofs_u = jnp.asarray(cd[:, :self.nu_loc], dtype=jnp.int32)
        self.cell_dofs_p = jnp.asarray(cd[:, self.nu_loc:] - self.n_u,
                                       dtype=jnp.int32)
        # velocity NODE table for the node-block matvec layout
        self.cell_nodes_u = jnp.asarray(self.u_space.cell_dofs,
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

        # PML attenuation field at q points (set_sigma_pml_field analog,
        # reference: source/mpi_fluid_solver.cpp:93-103)
        if getattr(self, "sigma_pml_field", None) is not None:
            xq = cvu.xq.reshape(-1, d)
            s = np.asarray(self.sigma_pml_field(xq)).reshape(n_c, n_q)
            self.sigma_pml_q = jnp.asarray(s, dtype=rdt)
        else:
            self.sigma_pml_q = jnp.zeros((n_c, n_q), dtype=rdt)

        self._neumann_rhs_const = self._neumann_rhs()

        # vertex shape-gradient selection for the reference's h heuristic:
        # the sum runs over the first dofs_per_cell/dofs_per_vertex SYSTEM
        # shape functions in deal.II local order (vertex-major, per vertex
        # [u_x .. u_z, p]) (reference: source/mpi_insim_supg.cpp:130-141)
        def vertex_local_index(degree, v):
            k, n1 = degree, degree + 1
            bits = [(v >> b) & 1 for b in range(d)]
            return sum(bits[b] * k * n1 ** b for b in range(d))

        dofs_per_cell = nlu * d + nlp
        dofs_per_vertex = d + 1
        K = dofs_per_cell // dofs_per_vertex
        seq = []
        for v in range(2 ** d):
            lu = vertex_local_index(params.fluid_velocity_degree, v)
            lp = vertex_local_index(params.fluid_pressure_degree, v)
            seq.extend([(lu, "u")] * d)
            seq.append((lp, "p"))
        from collections import Counter
        cnt = Counter(seq[:K])
        self._h_terms = [(l, float(w), kind) for (l, kind), w in cnt.items()]

        # coupled-node stencil for the Q1/Q1 system (class docstring at
        # coupled_stencil): one StencilOperator on the shared node grid
        # serves the outer matvec AND the Tpp sub-blocks via component
        # slices
        self._sys_stencil = None
        if (self.coupled_stencil
                and params.fluid_velocity_degree ==
                params.fluid_pressure_degree
                and self.u_space.n_nodes == self.p_space.n_nodes):
            from ...la.stencil import PatchGrid, StencilOperator
            pgrid = PatchGrid.build(self.mesh)
            if pgrid is not None:
                self._sys_stencil = StencilOperator(pgrid, self.p_space,
                                                    d=d + 1)

        self._newton_iter = jax.jit(self._newton_iter_impl)

    # -- coupled-stencil layout maps -------------------------------------
    def _sys_to_nodal(self, x):
        """System flat [u (n_nodes*d), p (n_nodes)] -> node-major
        (n_nodes*(d+1)) with per-node components [u_0..u_{d-1}, p]."""
        d = self.dim
        u = x[:self.n_u].reshape(-1, d)
        p = x[self.n_u:]
        return jnp.concatenate([u, p[:, None]], axis=1).reshape(-1)

    def _nodal_to_sys(self, y):
        d = self.dim
        Y = y.reshape(-1, d + 1)
        return jnp.concatenate([Y[:, :d].reshape(-1), Y[:, d]])

    def _sys_node_blocks(self, A_loc):
        """Cell system blocks (n_c, nl*d+nl, nl*d+nl) -> coupled node
        blocks (n_c, nl, d+1, nl, d+1) for the equal-order stencil."""
        d = self.dim
        n_c = A_loc.shape[0]
        nl = self.nlu
        nu = self.nu_loc
        Auu = A_loc[:, :nu, :nu].reshape(n_c, nl, d, nl, d)
        Aup = A_loc[:, :nu, nu:].reshape(n_c, nl, d, nl)
        Apu = A_loc[:, nu:, :nu].reshape(n_c, nl, nl, d)
        App = A_loc[:, nu:, nu:]
        top = jnp.concatenate([Auu, Aup[..., None]], axis=4)
        bot = jnp.concatenate([Apu[:, :, None], App[:, :, None, :, None]],
                              axis=4)
        return jnp.concatenate([top, bot], axis=2)

    def set_sigma_pml_field(self, fn):
        """reference: source/mpi_fluid_solver.cpp:93-103 (must be called
        before setup)."""
        self.sigma_pml_field = fn

    def enable_pressure_mg(self, meshes, n_smooth: int = 2,
                       fixed_prefix: bool = True, galerkin: bool = True):
        """Attach a geometric V-cycle as the preconditioner of the Tpp
        inner GMRES, replacing the cell-local B2pp diagonal surrogate.

        Tpp = App - Apv Pvv^-1 Avp is spectrally a pressure Laplacian
        (PSPG tau_p grad q . grad p plus the mass-scaled Schur product),
        which a diagonal cannot precondition mesh-independently: measured
        at fluid_cylinder_mpi_scnsim refine=3, the first Newton's Tpp
        GMRES hits its 400-iteration cap with the diagonal vs O(10) with
        the V-cycle.  The reference gets the same effect from ILU(0) of
        the assembled B2pp (source/mpi_supg_solver.cpp:56-133), which has
        no TPU mapping.  Preconditioner-only: the outer solve is flexible,
        so the converged solution is unchanged.

        `meshes`: nested hierarchy, coarsest first, finest == self.mesh
        (locally refined finest levels use the geometric-prolongation
        fallback in la/multigrid.py).

        galerkin=True (default) coarsens the TRUE per-Newton B2pp element
        blocks (GalerkinMG) — the faithful TPU analog of the reference's
        per-step ILU(0) of the reassembled B2pp.  The frozen Laplacian
        cycle (galerkin=False) mis-preconditions mass-dominated Tpp
        operators (measured: 34 inner iters at fsi-wall-3D full res vs
        O(10) expected)."""
        from ...la.multigrid import GalerkinMG, make_pressure_mg
        assert meshes[-1].n_cells == self.mesh.n_cells, \
            "finest hierarchy level must be the solver mesh"
        assert self.params.fluid_pressure_degree == 1, \
            "pressure V-cycle assumes a Q1 pressure space"
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
        # fresh jit so a trace cached before enabling cannot keep the
        # diagonal-surrogate path baked in
        self._newton_iter = jax.jit(self._newton_iter_impl)

    def _neumann_rhs(self):
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

    # ------------------------------------------------------------------
    def _stab_parameters(self, un, viscosity_q, rho_q):
        """tau_SUPG/PSPG/LSIC at q points from the present velocity."""
        dt = self.time.get_delta_t()
        h_sum = 0.0
        for (l, w, kind) in self._h_terms:
            gq = self.gu[:, :, l, :] if kind == "u" else self.gp[:, :, l, :]
            h_sum = h_sum + w * jnp.abs(jnp.einsum("cqx,cqx->cq", un, gq))
        v_norm = jnp.linalg.norm(un, axis=-1)
        h = jnp.where(h_sum > 0, 2 * v_norm / jnp.where(h_sum > 0, h_sum,
                                                        1.0), 0.0)
        nu = viscosity_q / rho_q
        safe_h = jnp.where(h > 0, h, 1.0)
        tau = 1.0 / jnp.sqrt((2 / dt) ** 2 + (2 * v_norm / safe_h) ** 2 +
                             (4 * nu / safe_h ** 2) ** 2)
        tau_supg = jnp.where(h > 0, tau, dt / 2)
        tau_pspg = tau_supg / rho_q
        local_re = v_norm * h / (2 * nu)
        z = jnp.where(local_re <= 3, local_re / 3, 1.0)
        tau_lsic = h / 2 * v_norm * z
        return tau_supg, tau_pspg, tau_lsic

    # ------------------------------------------------------------------
    def _make_preconditioner(self, A_loc, ucons, pcons, sys_W=None):
        """Washio incomplete-Schur ("Tpp") preconditioner
        (reference: source/mpi_supg_solver.cpp:7-198).

        sys_W: optional prebuilt coupled stencil tensors (coupled_stencil
        path) — Avp/Apv/App become component slices of it; built here
        from A_loc when the solver has a stencil but no tensor was
        passed (bench telemetry probes)."""
        pdt = jnp.float32 if self.mixed_precision_precond else A_loc.dtype
        A_loc = A_loc.astype(pdt)
        Avv = A_loc[:, :self.nu_loc, :self.nu_loc]
        Avp = A_loc[:, :self.nu_loc, self.nu_loc:]
        Apv = A_loc[:, self.nu_loc:, :self.nu_loc]
        App = A_loc[:, self.nu_loc:, self.nu_loc:]

        diag_Avv = jnp.where(ucons.fixed, 1.0, element_diag(
            Avv, self.cell_dofs_u, self.n_u))
        pvv_inv = jnp.where(diag_Avv != 0, 1.0 / diag_Avv, 1.0)

        def Pvv_inverse(x):
            return x * pvv_inv

        st = getattr(self, "_sys_stencil", None)
        if (st is not None and getattr(self, "dense_precond", False)
                and getattr(self, "stencil_outer_only", False)):
            # hybrid mode (class docstring at stencil_outer_only): the
            # outer apply keeps the coupled stencil, the preconditioner
            # falls through to the dense condensed Tpp below
            st = None
        # node-block layout when the solver carries a velocity node table
        # (the padded dof-sharded proxy in parallel/shard.py does not and
        # falls back to the flat layout)
        cn_u = getattr(self, "cell_nodes_u", None)
        if st is not None:
            if sys_W is None:
                sys_W = st.build_weights(self._sys_node_blocks(A_loc))
            sys_W = tuple(w.astype(pdt) for w in sys_W)
            d = self.dim
            W_avp = st.slice_weights(sys_W, slice(0, d), slice(d, d + 1))
            W_apv = st.slice_weights(sys_W, slice(d, d + 1), slice(0, d))
            W_app = st.slice_weights(sys_W, slice(d, d + 1),
                                     slice(d, d + 1))

            def apply_Avp(xp):
                xp = pcons.expand(xp) if pcons.any_hanging else xp
                y = st.unspread(st.matvec(W_avp, st.spread(xp)))
                return ucons.restrict(y)

            def apply_Apv(xu):
                xu = ucons.expand(xu)
                y = st.unspread(st.matvec(W_apv, st.spread(xu)))
                return pcons.restrict(y) if pcons.any_hanging else y

            def raw_App(xp):
                return st.unspread(st.matvec(W_app, st.spread(xp)))

            op_App = pcons.wrap_operator(raw_App)
        elif cn_u is not None:
            d = self.dim
            n_c = Avv.shape[0]
            nlu = self.nu_loc // d
            nlp = Apv.shape[1]
            Avp_b = Avp.reshape(n_c, nlu, d, nlp)
            Apv_b = Apv.reshape(n_c, nlp, nlu, d)

            def apply_Avp(xp):
                xp = pcons.expand(xp) if pcons.any_hanging else xp
                y = element_matvec_p_to_u_nodeblock(
                    Avp_b, cn_u, self.cell_dofs_p, self.n_u // d, xp)
                return ucons.restrict(y)

            def apply_Apv(xu):
                xu = ucons.expand(xu)
                y = element_matvec_u_to_p_nodeblock(
                    Apv_b, cn_u, self.cell_dofs_p, self.n_p, xu)
                return pcons.restrict(y) if pcons.any_hanging else y
        else:
            def apply_Avp(xp):
                xp = pcons.expand(xp) if pcons.any_hanging else xp
                y = element_matvec_rect(Avp, self.cell_dofs_u,
                                        self.cell_dofs_p, self.n_u, xp)
                return ucons.restrict(y)

            def apply_Apv(xu):
                xu = ucons.expand(xu)
                y = element_matvec_rect(Apv, self.cell_dofs_p,
                                        self.cell_dofs_u, self.n_p, xu)
                return pcons.restrict(y) if pcons.any_hanging else y

        if st is None:
            op_App = pcons.wrap_operator(lambda x: element_matvec(
                App, self.cell_dofs_p, self.n_p, x))

        def Tpp(xp):
            y = op_App(xp) - apply_Apv(Pvv_inverse(apply_Avp(xp)))
            return jnp.where(pcons.fixed, xp, y)

        # Jacobi approximation of B2pp = App - Apv rowsum(|Avv|)^-1 Avp:
        # cell-local contribution to the product's diagonal (the reference
        # builds the full matrix and takes ILU(0); a diagonal surrogate is
        # the TPU-native analog)
        rowsum_loc = jnp.abs(Avv).sum(axis=2)
        rowsum = scatter_add(self.n_u, self.cell_dofs_u, rowsum_loc)
        rinv = jnp.where(rowsum != 0, 1.0 / rowsum, 1.0)
        rinv_loc = rinv[self.cell_dofs_u]
        prod_diag_loc = jnp.einsum("cnk,ck,ckn->cn", Apv, rinv_loc, Avp)
        diag_App = element_diag(App, self.cell_dofs_p, self.n_p)
        b2pp_diag = diag_App - scatter_add(self.n_p, self.cell_dofs_p,
                                           prod_diag_loc)
        b2pp_diag = jnp.where(pcons.fixed, 1.0, b2pp_diag)
        b2pp_inv = jnp.where(jnp.abs(b2pp_diag) > 1e-300, 1.0 / b2pp_diag,
                             1.0)
        # the coupled stencil supersedes the dense condensed blocks when
        # both are enabled (same algebra, less HBM traffic, no n_p x n_u
        # dense storage)
        dense = getattr(self, "dense_precond", False) and st is None
        if dense:
            # Dense condensed rectangular blocks + EXPLICIT dense Tpp
            # (la/dense.py): the SUPG preconditioner never iterates on the
            # (large) Avv block, so dense mode only needs the p-coupled
            # blocks — n_p x n_u — and works at much larger sizes than the
            # InsIM dense mode.  The explicit Tpp = App - Apv Pvv^-1 Avp
            # mirrors the reference's explicit B2pp assembly
            # (source/mpi_supg_solver.cpp:56-133); each Tpp matvec becomes
            # one small GEMV instead of three element gather/scatters, so
            # the inner GMRES runs fine with just the diagonal
            # preconditioner — no V-cycle needed.
            from ...la.dense import condensed_dense, gemv, hanging_tables
            cdu, cdp = self.cell_dofs_u, self.cell_dofs_p
            uht = hanging_tables(self.u_constraints)
            pht = hanging_tables(self.p_constraints)
            Avp_d = condensed_dense(Avp, cdu, cdp, self.n_u, self.n_p,
                                    ucons, pcons, uht, pht)
            Apv_d = condensed_dense(Apv, cdp, cdu, self.n_p, self.n_u,
                                    pcons, ucons, pht, uht)
            App_d = condensed_dense(App, cdp, cdp, self.n_p, self.n_p,
                                    pcons, pcons, pht, pht,
                                    unit_fixed_diag=True)
            apply_Avp = lambda xp: gemv(Avp_d, xp)      # noqa: E731
            apply_Apv = lambda xu: gemv(Apv_d, xu)      # noqa: E731
            op_App = lambda x: gemv(App_d, x)           # noqa: E731
            Tpp_d = App_d - Apv_d @ (pvv_inv[:, None] * Avp_d)
            Tpp = lambda xp: gemv(Tpp_d, xp)            # noqa: E731

        # B2pp preconditioner when a hierarchy is attached
        # (enable_pressure_mg); diagonal surrogate otherwise.  GalerkinMG
        # coarsens the TRUE cell-local B2pp blocks of THIS Newton matrix
        # (reference rebuilds + ILU(0)-factors B2pp the same way every
        # step, source/mpi_supg_solver.cpp:56-133)
        mg = getattr(self, "_pressure_mg", None)
        from ...la.multigrid import GalerkinMG
        if isinstance(mg, GalerkinMG):
            b2pp_loc = App - jnp.einsum("cik,ck,ckj->cij", Apv, rinv_loc,
                                        Avp, preferred_element_type=pdt)
            fixp = pcons.fixed[self.cell_dofs_p]
            b2pp_loc = jnp.where(fixp[:, None, :] | fixp[:, :, None],
                                 0.0, b2pp_loc)
            tpp_M = mg.build(b2pp_loc)
        elif mg is not None:
            tpp_M = mg.vcycle
        else:
            tpp_M = lambda r: r * b2pp_inv

        def _apply(v, with_stats):
            out_dtype = v.dtype
            v = v.astype(pdt)
            vu, vp = v[:self.n_u], v[self.n_u:]
            ptmp = vp - apply_Apv(Pvv_inverse(vu))
            # initial guess (reference: source/mpi_supg_solver.cpp:163-171)
            c = ptmp
            Sc = Tpp(c)
            denom = jnp.vdot(Sc, c)
            alpha = jnp.where(denom != 0, jnp.vdot(ptmp, c) / denom, 0.0)
            x0 = alpha * c
            atol = 1e-3 * jnp.linalg.norm(ptmp)
            tpp = fgmres(Tpp, ptmp, x0=x0, M=tpp_M,
                         atol=atol, restart=self.tpp_restart,
                         max_restarts=self.tpp_max_restarts)
            dst_p = tpp.x
            dst_u = Pvv_inverse(vu) - Pvv_inverse(apply_Avp(dst_p))
            out = jnp.concatenate([dst_u, dst_p]).astype(out_dtype)
            if with_stats:
                return out, tpp.iters
            return out

        def precond(v):
            return _apply(v, False)

        # telemetry twin: (result, tpp_gmres_iters) per apply — the
        # reference prints the same count per outer iteration
        # (source/mpi_supg_solver.cpp:184-190)
        precond.stats = lambda v: _apply(v, True)
        return precond

    # ------------------------------------------------------------------
    def _newton_iter_impl(self, eval_pt, present, indicator, fsi_acc_nodal,
                          fsi_stress_nodal, stress_nodal, eddy_nu, cons,
                          ucons, pcons, res0=None):
        A_loc, rhs = self._assemble(eval_pt, present, indicator,
                                    fsi_acc_nodal, fsi_stress_nodal,
                                    stress_nodal, eddy_nu)
        b = cons.condense_rhs(rhs)
        res_norm = jnp.linalg.norm(b)
        nlu = self.nu_loc // self.dim
        st = getattr(self, "_sys_stencil", None)
        sys_W = None
        if st is not None:
            # coupled-node stencil outer apply (class docstring at
            # coupled_stencil): one (dim+1)-component stencil tensor built
            # per Newton iteration, shared with the Tpp preconditioner
            A_op = A_loc.astype(jnp.float32) if self.f32_matrix else A_loc
            sys_W = st.build_weights(self._sys_node_blocks(A_op))

            def apply_A(x):
                xs = x.astype(A_op.dtype)
                y = self._nodal_to_sys(
                    st.flat_matvec(sys_W, self._sys_to_nodal(xs)))
                return y.astype(x.dtype)
        elif self.f32_matrix:
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
        precond = self._make_preconditioner(A_loc, ucons, pcons,
                                            sys_W=sys_W)
        atol = self._outer_atol(res_norm, res0, self.outer_rtol * res_norm)
        x, iters, residual = self._outer_solve(op, b, precond, atol)
        du = cons.distribute(x)
        return du, res_norm, iters, residual

    # ------------------------------------------------------------------
    def bc_value_table(self, n_steps: int):
        """Per-step hard-coded Dirichlet inhomogeneities for the next
        n_steps, replicating the run loop's bc_time advance + constraint
        rebuild (reference: source/mpi_supg_solver.cpp:427-486).  Build
        this BEFORE make_on_device_stepper (it restores the solver's
        constraints afterwards)."""
        dt = self.time.get_delta_t()
        t0 = self.bc_time
        vals = []
        for i in range(n_steps):
            # table[0] = what run_one_step would apply right now; each
            # further step advances the BC clock by dt (run loop order:
            # bc_time += dt, make_constraints, run_one_step)
            self.bc_time = t0 + i * dt
            self._make_constraints()
            vals.append(np.asarray(
                self.nonzero_constraints.dirichlet_values))
        self.bc_time = t0
        self._make_constraints()
        return jnp.asarray(np.stack(vals), dtype=real_dtype())

    def make_on_device_stepper(self, bc_values=None, turbulence=None):
        """Fully on-device SUPG time stepping: lax.fori_loop over steps
        with the Newton loop as a lax.while_loop and the nodal-stress
        update fused per step — zero host round-trips per step (see
        InsIM.make_on_device_stepper).

        bc_values: optional (n_steps, n_dofs) table from bc_value_table
        for time-dependent hard-coded BCs (the reference run loop
        reapplies nonzero constraints every step); None = zero-increment
        stepping (BCs already in the state).  Returns fn(present, stress,
        n_steps) -> (present, stress, max_rel_res, max_newton_iters).

        turbulence: optional SpalartAllmaras model (standalone runs):
        its device step runs BEFORE each fluid step on the previous
        fluid solution — the reference alternation
        (source/mpi_supg_solver.cpp:458-468) fused into one dispatch.
        The returned fn then has signature fn(present, stress, nu,
        n_steps, start) -> (present, stress, nu, max_rel_res,
        max_newton_iters, max_sa_rel_res)."""
        import jax.lax as lax
        params = self.params
        cons = self.zero_constraints
        ucons = self.u_constraints
        pcons = self.p_constraints
        tol = params.fluid_tolerance
        max_it = params.fluid_max_iterations
        eddy0 = getattr(self, "eddy_viscosity_nodal", None)
        if eddy0 is None:
            eddy0 = jnp.zeros(self.u_space.n_nodes, dtype=real_dtype())
        nz = self.nonzero_constraints
        sa_step = turbulence.make_device_step() if turbulence is not None \
            else None

        def newton_once(eval_pt, present, stress_nodal, res0=None,
                        eddy=eddy0):
            du, rn, its, _ = self._newton_iter_impl(
                eval_pt, present, self.indicator, self.fsi_acc_nodal,
                self.fsi_stress_nodal, stress_nodal, eddy, cons, ucons,
                pcons, res0=res0)
            return eval_pt + du, rn, its

        def one_step(present, stress_nodal, bc_delta, eddy=eddy0):
            if bc_delta is not None:
                eval_pt = nz.apply_increment_with(present, bc_delta)
            else:
                eval_pt = present
            eval_pt, res0, its0 = newton_once(eval_pt, present,
                                              stress_nodal, eddy=eddy)
            inf = jnp.asarray(jnp.inf, dtype=res0.dtype)

            def stagnated(res, prev, last_its):
                # host-path parity (run_one_step): a 0-iteration Krylov
                # solve with a non-decreasing residual is machine-level
                # stagnation -> stop and treat the step as converged
                return (last_its == 0) & (res >= prev * (1 - 1e-12))

            def cond(s):
                e, it, res, prev, last_its = s
                return ((res / jnp.maximum(res0, 1e-300) > tol) &
                        (res > 1e-14) & (it < max_it) &
                        ~stagnated(res, prev, last_its))

            def body(s):
                e, it, res, prev, last_its = s
                e2, rn, its = newton_once(e, present, stress_nodal, res0,
                                          eddy=eddy)
                return (e2, it + 1, rn, res, its)

            eval_pt, it, res, prev, last_its = lax.while_loop(
                cond, body, (eval_pt, 1, res0, inf, its0))
            rel = jnp.where(res0 > 1e-14,
                            res / jnp.maximum(res0, 1e-300), 0.0)
            rel = jnp.where(stagnated(res, prev, last_its), 0.0, rel)
            return eval_pt, self._update_stress_impl(eval_pt), rel, it

        if sa_step is not None:
            @jax.jit
            def run_n_sa(present, stress_nodal, nu, n_steps, start=0):
                def body(i, s):
                    p, st, nu_, worst_rel, worst_it, worst_sa = s
                    bc = bc_values[start + i] if bc_values is not None \
                        else None
                    # nonzero SA constraints are ADDITIVE increments:
                    # apply exactly once, at the very first step (the
                    # host loop's run_one_step(True) then (False))
                    nu2, eddy, sa_rel, _ = sa_step(nu_, p,
                                                   (start + i) == 0)
                    p2, st2, rel, it = one_step(p, st, bc, eddy)
                    return (p2, st2, nu2, jnp.maximum(worst_rel, rel),
                            jnp.maximum(worst_it, it),
                            jnp.maximum(worst_sa, sa_rel))

                z = jnp.zeros((), present.dtype)
                return lax.fori_loop(0, n_steps, body,
                                     (present, stress_nodal, nu, z, 0, z))

            return run_n_sa

        @jax.jit
        def run_n(present, stress_nodal, n_steps, start=0):
            # start: offset into the BC table — lets callers split a long
            # window into several dispatches (the axon relay caps single
            # executions around ~50 s) without replaying BC rows
            def body(i, s):
                p, st, worst_rel, worst_it = s
                bc = bc_values[start + i] if bc_values is not None else None
                p2, st2, rel, it = one_step(p, st, bc)
                return (p2, st2, jnp.maximum(worst_rel, rel),
                        jnp.maximum(worst_it, it))

            return lax.fori_loop(0, n_steps, body,
                                 (present, stress_nodal,
                                  jnp.zeros((), present.dtype), 0))

        return run_n

    def make_fsi_step(self):
        """One coupled-run time step as a SINGLE jitted call (see
        InsIM.make_fsi_step): Newton as lax.while_loop, per-step FSI
        fields + (extended) constraint sets as runtime pytree args, nodal
        stress update fused.  Returns fn(present, indicator,
        fsi_acc_nodal, fsi_stress_nodal, stress_nodal, eddy_nu,
        zero_cons, nonzero_cons, ucons, pcons) ->
        (present, stress_nodal, rel_res, newton_iters)."""
        import jax.lax as lax
        params = self.params
        tol = params.fluid_tolerance
        max_it = params.fluid_max_iterations

        @jax.jit
        def step(present, indicator, fsi_acc_nodal, fsi_stress_nodal,
                 stress_nodal, eddy_nu, zero_cons, nonzero_cons, ucons,
                 pcons):
            def newton_once(eval_pt, res0=None):
                du, rn, its, _ = self._newton_iter_impl(
                    eval_pt, present, indicator, fsi_acc_nodal,
                    fsi_stress_nodal, stress_nodal, eddy_nu, zero_cons,
                    ucons, pcons, res0=res0)
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
                        (res > 1e-14) & (it < max_it) &
                        ~stagnated(res, prev, last_its))

            def body(s):
                e, it, res, prev, last_its = s
                e2, rn, its = newton_once(e, res0)
                return (e2, it + 1, rn, res, its)

            eval_pt, it, res, prev, last_its = lax.while_loop(
                cond, body, (eval_pt, 1, res0, inf, its0))
            rel = jnp.where(res0 > 1e-14,
                            res / jnp.maximum(res0, 1e-300), 0.0)
            rel = jnp.where(stagnated(res, prev, last_its), 0.0, rel)
            return eval_pt, self._update_stress_impl(eval_pt), rel, it

        return step

    def run_on_device(self, verbose: bool = True):
        """run() with the whole time loop as ONE device dispatch
        (make_on_device_stepper); results match the host run() bit-exactly
        (tests/test_supg.py::test_supg_on_device_stepper_matches_host).
        The production/benchmark path for standalone SUPG runs.

        A standalone Spalart-Allmaras model is FUSED into the dispatch
        (make_on_device_stepper(turbulence=...)): the SA Newton solve
        steps before each fluid step on the previous fluid solution,
        exactly the reference alternation.  Only the FSI wall-function
        mode (per-step moving-wall distances + Dirichlet row updates,
        driven by MPIFSI.run) falls back to run().  Per-step
        VTU/PVD/checkpoint writes are also skipped here (only the final
        state lands on the host); chunk the dispatch at save intervals
        if those artifacts are needed."""
        if not self._setup_done:
            self._refine_setup_with_mg()
            self._setup_done = True
        tm = getattr(self, "turbulence_model", None)
        if tm is not None and not hasattr(tm, "space"):
            tm.setup()
        if tm is not None and (tm._step_zero is not None or
                               tm._step_nonzero is not None):
            # FSI wall-function mode: host loop (per-step host updates)
            return self.run(verbose=verbose)
        dt = self.time.get_delta_t()
        n = int(round((self.time.end() - self.time.current()) / dt))
        if n <= 0:
            return
        if self.hard_coded_bcs:
            table = self.bc_value_table(n)
        else:
            # reference run loop: nonzero constraints at the first step
            # only, zero increments afterwards
            table = jnp.zeros((n, self.n_dofs), dtype=real_dtype()).at[
                0].set(self.nonzero_constraints.dirichlet_values)
        stepper = self.make_on_device_stepper(table, turbulence=tm)
        if tm is not None:
            sol, stress, nu, rel, its, sa_rel = stepper(
                self.present_solution, self.stress_device,
                tm.present_solution, n)
            if float(sa_rel) > self.params.fluid_tolerance:
                raise RuntimeError("Too many Newton iterations!")
            tm.present_solution = nu
            tm.update_eddy_viscosity()
        else:
            sol, stress, rel, its = stepper(self.present_solution,
                                            self.stress_device, n)
        if float(rel) > self.params.fluid_tolerance:
            raise RuntimeError("Too many Newton iterations!")
        self.present_solution = sol
        self.stress_device = stress
        self.newton_iters = int(its)
        for _ in range(n):
            self.time.increment()
        if verbose:
            print(f"run_on_device: {n} steps, worst rel_res "
                  f"{float(rel):.3e}, max newton iters {int(its)}")

    def run_one_step(self, apply_nonzero_constraints: bool,
                     assemble_system: bool = True, verbose: bool = True,
                     zero_cons=None, nonzero_cons=None):
        """reference: source/mpi_supg_solver.cpp:330-425."""
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

        eddy = getattr(self, "eddy_viscosity_nodal", None)
        if eddy is None:
            eddy = jnp.zeros(self.u_space.n_nodes, dtype=real_dtype())

        current_res = 1.0
        initial_res = 1.0
        rel_res = 1.0
        prev_res = None
        it = 0
        while rel_res > params.fluid_tolerance and current_res > 1e-14:
            if it >= params.fluid_max_iterations:
                raise RuntimeError("Too many Newton iterations!")
            r0 = jnp.asarray(initial_res if it > 0 else jnp.inf,
                             dtype=real_dtype())
            du, res_norm, iters, gres = self._newton_iter(
                eval_pt, self.present_solution, self.indicator,
                self.fsi_acc_nodal, self.fsi_stress_nodal,
                self.stress_device, eddy, zero_cons,
                self._u_cons_of(zero_cons), self.p_constraints, res0=r0)
            current_res = float(res_norm)
            if (prev_res is not None and int(iters) == 0
                    and current_res >= prev_res * (1 - 1e-12)):
                break
            prev_res = current_res
            eval_pt = eval_pt + du
            if it == 0:
                initial_res = max(current_res, 1e-300)
            rel_res = current_res / initial_res
            if verbose:
                print(f" ITR = {it} ABS_RES = {current_res:.6e} "
                      f"REL_RES = {rel_res:.6e} GMRES_ITR = {int(iters)} "
                      f"GMRES_RES = {float(gres):.6e}")
            it += 1
        self.newton_iters = it
        self.solution_increment = eval_pt - self.present_solution
        self.present_solution = eval_pt
        self.update_stress()
        # reference: source/mpi_supg_solver.cpp:400-424
        self._end_of_step_io()

    def run(self, verbose: bool = True):
        """reference: source/mpi_supg_solver.cpp:427-486 (time-dependent
        hard-coded BCs advance their own clock and reapply nonzero
        constraints every step; an attached turbulence model steps before
        the fluid, :458-468)."""
        if not self._setup_done:
            self._refine_setup_with_mg()
        tm = getattr(self, "turbulence_model", None)
        if tm is not None and not hasattr(tm, "space"):
            tm.setup()
        if tm is not None:
            tm.run_one_step(True)
        self.run_one_step(True, verbose=verbose)
        while self.time.end() - self.time.current() > 1e-12:
            if tm is not None:
                tm.run_one_step(False)
            if self.hard_coded_bcs:
                self.bc_time += self.time.get_delta_t()
                self._make_constraints()
                self.run_one_step(True, verbose=verbose)
            else:
                self.run_one_step(False, verbose=verbose)

    # ------------------------------------------------------------------
    def _fields_at_q(self, eval_pt, present):
        d = self.dim
        Nu, Np, gu, gp = self.Nu, self.Np, self.gu, self.gp
        ul = eval_pt[:self.n_u].reshape(-1, d)[self.u_space.cell_dofs]
        pl = eval_pt[self.n_u:][self.p_space.cell_dofs]
        unl = present[:self.n_u].reshape(-1, d)[self.u_space.cell_dofs]
        pnl = present[self.n_u:][self.p_space.cell_dofs]
        uc = jnp.einsum("ql,cla->cqa", Nu, ul)
        G = jnp.einsum("cqlx,cla->cqax", gu, ul)
        pc = jnp.einsum("qn,cn->cq", Np, pl)
        gpc = jnp.einsum("cqnx,cn->cqx", gp, pl)
        un = jnp.einsum("ql,cla->cqa", Nu, unl)
        pn = jnp.einsum("qn,cn->cq", Np, pnl)
        return uc, G, pc, gpc, un, pn


class SUPGInsIM(SUPGFluidSolver):
    """Incompressible SUPG/PSPG/LSIC solver
    (reference: source/mpi_insim_supg.cpp:14-330)."""

    def _assemble(self, eval_pt, present, indicator, fsi_acc_nodal,
                  fsi_stress_nodal, stress_nodal, eddy_nu):
        params = self.params
        d = self.dim
        rho = params.fluid_rho
        mu = params.viscosity
        dt = self.time.get_delta_t()
        Nu, Np, gu, gp, JxW = self.Nu, self.Np, self.gu, self.gp, self.JxW
        n_c, n_q = JxW.shape
        nlu, nlp = self.nlu, self.nlp
        I = jnp.eye(d, dtype=eval_pt.dtype)

        uc, G, pc, gpc, un, pn = self._fields_at_q(eval_pt, present)
        divu = jnp.trace(G, axis1=2, axis2=3)
        bf = self.gravity_q  # gravity + body force

        ones = jnp.ones((n_c, n_q), dtype=eval_pt.dtype)
        tau_s, tau_p, tau_l = self._stab_parameters(un, mu * ones, rho * ones)

        # NOTE deal.II tensor conventions (replicated verbatim from the
        # reference):
        #   u * grad_phi_u[i]  contracts the COMPONENT index ->  u[a] grad N_l
        #   u * G (in the SUPG residual) = (grad u)^T u,
        # while the Galerkin convection uses G * u = (u . grad) u.
        ug = jnp.einsum("cqx,cqlx->cql", uc, gu)     # grad N_l . u
        uTG = jnp.einsum("cqa,cqax->cqx", uc, G)     # (grad u)^T u
        Gu = jnp.einsum("cqax,cqx->cqa", G, uc)      # (u . grad) u
        glgm = jnp.einsum("cqlx,cqmx->cqlm", gu, gu)
        accel = (uc - un) / dt
        w_s = tau_s * JxW
        w_p = tau_p * JxW

        # ---------------- Auu -------------------------------------------
        gg = jnp.einsum("cqlx,cqmx,cq->clm", gu, gu, JxW)
        NN = jnp.einsum("ql,qm,cq->clm", Nu, Nu, JxW)
        conv2 = jnp.einsum("ql,cqm,cq->clm", Nu, ug, JxW)
        Auu = jnp.einsum("clm,ab->clamb",
                         mu * gg + rho * conv2 + (rho / dt) * NN, I)
        Auu = Auu + rho * jnp.einsum("ql,qm,cqab,cq->clamb", Nu, Nu, G, JxW)
        # SUPG: test vector u[a] grad N_l
        Auu = Auu + rho * jnp.einsum("cq,cqa,qm,cqlx,cqbx->clamb", w_s, uc,
                                     Nu, gu, G)
        Auu = Auu + rho * jnp.einsum("cq,cqa,cqb,cqlm->clamb", w_s, uc, uc,
                                     glgm)
        Auu = Auu + rho * jnp.einsum("cq,qm,cqlx,cqx,ab->clamb", w_s, Nu, gu,
                                     uTG, I)
        Auu = Auu + (rho / dt) * jnp.einsum("cq,cqa,cqlb,qm->clamb", w_s, uc,
                                            gu, Nu)
        Auu = Auu + (rho / dt) * jnp.einsum("cq,qm,cqlx,cqx,ab->clamb", w_s,
                                            Nu, gu, uc - un, I)
        Auu = Auu + jnp.einsum("cq,qm,cqlx,cqx,ab->clamb", w_s, Nu, gu, gpc,
                               I)
        Auu = Auu - rho * jnp.einsum("cq,qm,cqlx,cqx,ab->clamb", w_s, Nu, gu,
                                     bf, I)
        # LSIC
        Auu = Auu + rho * jnp.einsum("cq,cqla,cqmb->clamb", tau_l * JxW, gu,
                                     gu)
        Auu = Auu.reshape(n_c, self.nu_loc, self.nu_loc)

        # ---------------- Aup -------------------------------------------
        Aup = -jnp.einsum("cqla,qn,cq->clan", gu, Np, JxW)
        Aup = Aup + jnp.einsum("cq,cqa,cqlx,cqnx->clan", w_s, uc, gu, gp)
        Aup = Aup.reshape(n_c, self.nu_loc, nlp)

        # ---------------- Apu -------------------------------------------
        Apu = jnp.einsum("qn,cqmb,cq->cnmb", Np, gu, JxW)  # +continuity
        Apu = Apu + rho * jnp.einsum("cq,cqnx,qm,cqbx->cnmb", w_p, gp, Nu, G)
        Apu = Apu + rho * jnp.einsum("cq,cqb,cqnx,cqmx->cnmb", w_p, uc, gp,
                                     gu)
        Apu = Apu + (rho / dt) * jnp.einsum("cq,cqnb,qm->cnmb", w_p, gp, Nu)
        Apu = Apu.reshape(n_c, nlp, self.nu_loc)

        # ---------------- App -------------------------------------------
        App = jnp.einsum("cq,cqnx,cqox->cno", w_p, gp, gp)

        A_loc = jnp.concatenate([
            jnp.concatenate([Auu, Aup], axis=2),
            jnp.concatenate([Apu, App], axis=2)], axis=1)

        # ---------------- RHS -------------------------------------------
        mom_res = rho * (accel + uTG) + gpc - rho * bf  # SUPG strong residual
        r_u = (-mu * jnp.einsum("cqax,cqlx,cq->cla", G, gu, JxW)
               - rho * jnp.einsum("ql,cqa,cq->cla", Nu, Gu, JxW)
               + jnp.einsum("cq,cqla,cq->cla", pc, gu, JxW)
               - rho * jnp.einsum("ql,cqa,cq->cla", Nu, accel, JxW)
               + rho * jnp.einsum("ql,cqa,cq->cla", Nu, bf, JxW))
        r_u = r_u - jnp.einsum("cq,cqa,cqlx,cqx->cla", w_s, uc, gu, mom_res)
        r_u = r_u - rho * jnp.einsum("cq,cqla,cq->cla", tau_l * JxW, gu,
                                     divu)
        r_p = -jnp.einsum("cq,qn,cq->cn", divu, Np, JxW)
        r_p = r_p - jnp.einsum("cq,cqnx,cqx->cn", w_p, gp, mom_res)

        r_loc = jnp.concatenate([r_u.reshape(n_c, -1), r_p], axis=1)
        rhs = scatter_add(self.n_dofs, self.cell_dofs, r_loc)
        return A_loc, rhs + self._neumann_rhs_const


class SCnsIM(SUPGFluidSolver):
    """Slightly-compressible SUPG solver with isentropic continuity, PML
    attenuation, artificial-solid handling and nodal-stress-divergence
    stabilization (reference: source/mpi_scnsim.cpp:15-568)."""

    def _assemble(self, eval_pt, present, indicator, fsi_acc_nodal,
                  fsi_stress_nodal, stress_nodal, eddy_nu):
        params = self.params
        d = self.dim
        dt = self.time.get_delta_t()
        Nu, Np, gu, gp, JxW = self.Nu, self.Np, self.gu, self.gp, self.JxW
        n_c, n_q = JxW.shape
        nlu, nlp = self.nlu, self.nlp
        I = jnp.eye(d, dtype=eval_pt.dtype)

        uc, G, pc, gpc, un, pn = self._fields_at_q(eval_pt, present)
        divu = jnp.trace(G, axis1=2, axis2=3)
        bf = self.gravity_q
        sig = self.sigma_pml_q                     # (c, q)
        ind = indicator[:, None]                   # (c, 1) -> broadcast q
        nf = 1.0 - ind                             # "not solid" factor

        # local density/viscosity (reference: source/mpi_scnsim.cpp:210-216)
        rho_q = params.fluid_rho * (1 + pn / ATM) * nf + ind * params.solid_rho
        cd_u = self.u_space.cell_dofs
        eddy_q = jnp.einsum("ql,cl->cq", Nu, eddy_nu[cd_u])
        visc_q = (ind * 1.0 + nf * params.viscosity) + jnp.maximum(eddy_q,
                                                                   0.0)

        tau_s, tau_p, tau_l = self._stab_parameters(un, visc_q, rho_q)
        w_s = tau_s * JxW
        w_p = tau_p * JxW
        w_l = tau_l * JxW

        # divergence of the projected nodal viscous stress, rescaled by the
        # local viscosity (reference: source/mpi_scnsim.cpp:278-289)
        sl = stress_nodal[cd_u]                    # (c, nlu, d, d)
        div_sigma = jnp.einsum("cqlx,clax->cqa", gu, sl)
        div_sigma = div_sigma * (visc_q / params.viscosity)[..., None]

        fsi_acc_q = jnp.einsum("ql,cla->cqa", Nu, fsi_acc_nodal[cd_u])
        fsi_sig_q = jnp.einsum("ql,clab->cqab", Nu, fsi_stress_nodal[cd_u])

        # see SUPGInsIM for the deal.II tensor-contraction conventions
        uTG = jnp.einsum("cqa,cqax->cqx", uc, G)     # (grad u)^T u
        Gu = jnp.einsum("cqax,cqx->cqa", G, uc)      # (u . grad) u
        accel = (uc - un) / dt
        rJ = rho_q * JxW

        # Matrix block in f32 when f32_matrix: the Jacobian is already
        # applied/preconditioned in f32 (inexact Newton) and f64 einsums
        # are EMULATED on TPU — measured 1032 -> 22 ms at fsi-wall-3D
        # full resolution.  The residual below stays f64.
        mdt = jnp.float32 if self.f32_matrix else eval_pt.dtype
        c_ = (lambda a: a.astype(mdt))
        Nu_, Np_, gu_, gp_ = c_(Nu), c_(Np), c_(gu), c_(gp)
        JxW_, rJ_, sig_ = c_(JxW), c_(rJ), c_(sig)
        uc_, G_, un_, gpc_ = c_(uc), c_(G), c_(un), c_(gpc)
        rho_, ws_, wp_, wl_ = c_(rho_q), c_(w_s), c_(w_p), c_(w_l)
        pc_, nf_, ind_, divu_ = c_(pc), c_(nf), c_(ind), c_(divu)
        visc_, dsig_, bf_ = c_(visc_q), c_(div_sigma), c_(bf)
        facc_ = c_(fsi_acc_q)
        I_ = jnp.eye(d, dtype=mdt)
        ug_ = jnp.einsum("cqx,cqlx->cql", uc_, gu_)   # grad N_l . u
        uTG_ = c_(uTG)
        glgm_ = jnp.einsum("cqlx,cqmx->cqlm", gu_, gu_)

        # ---------------- Auu -------------------------------------------
        gg_v = jnp.einsum("cq,cqlx,cqmx->clm", visc_ * JxW_, gu_, gu_)
        NN_r = jnp.einsum("cq,ql,qm->clm", rJ_, Nu_, Nu_)
        conv2 = jnp.einsum("cq,ql,cqm->clm", rJ_, Nu_, ug_)
        Auu = jnp.einsum("clm,ab->clamb",
                         gg_v + conv2 + NN_r / dt
                         + jnp.einsum("cq,ql,qm->clm", rJ_ * sig_, Nu_,
                                      Nu_), I_)
        Auu = Auu + jnp.einsum("cq,ql,qm,cqab->clamb", rJ_, Nu_, Nu_, G_)
        # SUPG (test vector u[a] grad N_l)
        Auu = Auu + jnp.einsum("cq,cqa,qm,cqlx,cqbx->clamb", rho_ * ws_,
                               uc_, Nu_, gu_, G_)
        Auu = Auu + jnp.einsum("cq,cqa,cqb,cqlm->clamb", rho_ * ws_, uc_,
                               uc_, glgm_)
        Auu = Auu + jnp.einsum("cq,qm,cqlx,cqx,ab->clamb", rho_ * ws_, Nu_,
                               gu_, uTG_, I_)
        Auu = Auu + jnp.einsum("cq,cqa,cqlb,qm->clamb", rho_ * ws_ / dt,
                               uc_, gu_, Nu_)
        Auu = Auu + jnp.einsum("cq,qm,cqlx,cqx,ab->clamb", rho_ * ws_ / dt,
                               Nu_, gu_, uc_ - un_, I_)
        Auu = Auu + jnp.einsum("cq,qm,cqlx,cqx,ab->clamb", ws_, Nu_, gu_,
                               gpc_, I_)
        Auu = Auu - jnp.einsum("cq,qm,cqlx,cqx,ab->clamb", ws_, Nu_, gu_,
                               dsig_, I_)
        Auu = Auu - jnp.einsum("cq,qm,cqlx,cqx,ab->clamb", rho_ * ws_, Nu_,
                               gu_, bf_, I_)
        # SUPG PML
        Auu = Auu + jnp.einsum("cq,cqa,cqlb,qm->clamb", rho_ * ws_ * sig_,
                               uc_, gu_, Nu_)
        Auu = Auu + jnp.einsum("cq,qm,cqlx,cqx,ab->clamb",
                               rho_ * ws_ * sig_, Nu_, gu_, uc_, I_)
        # SUPG FSI acceleration (artificial fluid)
        Auu = Auu - jnp.einsum("cq,qm,cqlx,cqx,ab->clamb",
                               ws_ * ind_ * rho_, Nu_, gu_, facc_, I_)
        # LSIC velocity divergence (+ compressible corrections)
        Auu = Auu + jnp.einsum("cq,cqla,cqmb->clamb",
                               rho_ * wl_ * CP_TO_CV *
                               (1 + pc_ * nf_ / ATM), gu_, gu_)
        # LSIC pressure-gradient coupling (u-trial part)
        Auu = Auu + jnp.einsum("cq,cqla,qm,cqb->clamb",
                               rho_ * wl_ * nf_ / ATM, gu_, Nu_, gpc_)
        Auu = Auu.reshape(n_c, self.nu_loc, self.nu_loc)

        # ---------------- Aup -------------------------------------------
        Aup = -jnp.einsum("cqla,qn,cq->clan", gu_, Np_, JxW_)
        Aup = Aup + jnp.einsum("cq,cqa,cqlx,cqnx->clan", ws_, uc_, gu_,
                               gp_)
        # LSIC acceleration terms (fluid + artificial-solid bulk)
        Aup = Aup + jnp.einsum("cq,cqla,qn->clan",
                               rho_ * wl_ / dt *
                               (nf_ / ATM + ind_ / KAPPA_S), gu_, Np_)
        # LSIC velocity-divergence cross term
        Aup = Aup + jnp.einsum("cq,cqla,qn->clan",
                               rho_ * wl_ * CP_TO_CV * nf_ * divu_ / ATM,
                               gu_, Np_)
        # LSIC pressure gradient (p-trial part)
        Aup = Aup + jnp.einsum("cq,cqla,cqnx,cqx->clan",
                               rho_ * wl_ * nf_ / ATM, gu_, gp_, uc_)
        Aup = Aup.reshape(n_c, self.nu_loc, nlp)

        # ---------------- Apu -------------------------------------------
        # isentropic continuity (reference: source/mpi_scnsim.cpp:395-414)
        Apu = jnp.einsum("cq,qn,cqmb->cnmb",
                         CP_TO_CV * (ATM + pc_ * nf_) / ATM * JxW_, Np_,
                         gu_)
        Apu = Apu + jnp.einsum("cq,qn,qm,cqb->cnmb", nf_ / ATM * JxW_,
                               Np_, Nu_, gpc_)
        # PSPG
        Apu = Apu + jnp.einsum("cq,cqnx,qm,cqbx->cnmb", rho_ * wp_, gp_,
                               Nu_, G_)
        Apu = Apu + jnp.einsum("cq,cqb,cqnx,cqmx->cnmb", rho_ * wp_, uc_,
                               gp_, gu_)
        Apu = Apu + jnp.einsum("cq,cqnb,qm->cnmb", rho_ * wp_ / dt, gp_,
                               Nu_)
        Apu = Apu + jnp.einsum("cq,cqnb,qm->cnmb", rho_ * wp_ * sig_, gp_,
                               Nu_)
        Apu = Apu.reshape(n_c, nlp, self.nu_loc)

        # ---------------- App -------------------------------------------
        App = jnp.einsum("cq,qn,qo->cno", sig_ / ATM * JxW_, Np_, Np_)
        App = App + jnp.einsum("cq,qn,cqox,cqx->cno", nf_ / ATM * JxW_,
                               Np_, gp_, uc_)
        App = App + jnp.einsum("cq,qn,qo,cq->cno", JxW_ / ATM, Np_, Np_,
                               divu_ * nf_)
        App = App + jnp.einsum("cq,qn,qo->cno",
                               (nf_ / ATM + ind_ / KAPPA_S) / dt * JxW_,
                               Np_, Np_)
        App = App + jnp.einsum("cq,cqnx,cqox->cno", wp_, gp_, gp_)

        A_loc = jnp.concatenate([
            jnp.concatenate([Auu, Aup], axis=2),
            jnp.concatenate([Apu, App], axis=2)], axis=1)

        # ---------------- RHS -------------------------------------------
        mom_res = (rho_q[..., None] * (accel + uTG) + gpc - div_sigma -
                   rho_q[..., None] * bf +
                   (rho_q * sig)[..., None] * uc)
        r_u = (-jnp.einsum("cq,cqax,cqlx->cla", visc_q * JxW, G, gu)
               - jnp.einsum("cq,ql,cqa->cla", rJ, Nu, Gu)
               + jnp.einsum("cq,cqla->cla", pc * JxW, gu)
               - jnp.einsum("cq,ql,cqa->cla", rJ / dt, Nu, uc - un)
               + jnp.einsum("cq,ql,cqa->cla", rJ, Nu, bf)
               - jnp.einsum("cq,ql,cqa->cla", rJ * sig, Nu, uc))
        r_u = r_u - jnp.einsum("cq,cqa,cqlx,cqx->cla", w_s, uc, gu, mom_res)
        # LSIC rhs
        lsic_res = ((pc - pn) / dt * nf / ATM +
                    CP_TO_CV * divu * (1 + pc * nf / ATM) +
                    jnp.einsum("cqx,cqx->cq", uc, gpc) * nf / ATM +
                    (pc - pn) / dt * ind / KAPPA_S)
        r_u = r_u - jnp.einsum("cq,cqla->cla", rho_q * w_l * lsic_res, gu)
        # FSI (artificial fluid)
        r_u = r_u + ind[..., None] * (
            jnp.einsum("cqla,cqab,cq->clb", gu, fsi_sig_q, JxW) +
            jnp.einsum("cq,ql,cqa->cla", rJ, Nu, fsi_acc_q) +
            jnp.einsum("cq,cqa,cqlx,cqx->cla", w_s * rho_q, uc, gu,
                       fsi_acc_q))

        cont_res = (CP_TO_CV * (ATM + pc * nf) * divu +
                    jnp.einsum("cqx,cqx->cq", uc, gpc) * nf +
                    (pc - pn) / dt * nf) / ATM + \
            (pc - pn) / dt * ind / KAPPA_S
        r_p = (-jnp.einsum("cq,qn->cn", cont_res * JxW, Np)
               - jnp.einsum("cq,qn->cn", sig * pc / ATM * JxW, Np))
        r_p = r_p - jnp.einsum("cq,cqnx,cqx->cn", w_p, gp, mom_res)
        r_p = r_p + jnp.einsum("cq,cqnx,cqx->cn", w_p * rho_q * ind, gp,
                               fsi_acc_q)

        r_loc = jnp.concatenate([r_u.reshape(n_c, -1), r_p], axis=1)
        rhs = scatter_add(self.n_dofs, self.cell_dofs, r_loc)
        return A_loc, rhs + self._neumann_rhs_const


class SerialSCnsIM(SUPGFluidSolver):
    """Serial-variant slightly-compressible SUPG solver
    (reference: source/scnsim.cpp:198-658, include/scnsim.h:36-236).

    Differs from the MPI variant (SCnsIM above):
     - constant per-cell density rho_f + ind*(rho_s - rho_f) and constant
       laminar viscosity (scnsim.cpp:262-264; no compressible density or
       artificial-fluid viscosity override)
     - continuity equation and PML pressure terms scaled by
       1/(cp/cv * atm) instead of 1/atm (scnsim.cpp:352, 404-413, 432-442)
     - no LSIC stabilization, no nodal-stress divergence and no gravity in
       the SUPG/PSPG residual (scnsim.cpp:355-397, 449-461)
     - Galerkin-only FSI force (scnsim.cpp:462-469)
     - outer FGMRES rtol 1e-8 (scnsim.cpp:533-535)
    The nodal FSI fields stand in for the reference's per-cell
    CellProperty (constant over a covered cell in the reference)."""

    outer_rtol = 1e-8

    def _assemble(self, eval_pt, present, indicator, fsi_acc_nodal,
                  fsi_stress_nodal, stress_nodal, eddy_nu):
        params = self.params
        d = self.dim
        dt = self.time.get_delta_t()
        Nu, Np, gu, gp, JxW = self.Nu, self.Np, self.gu, self.gp, self.JxW
        n_c, n_q = JxW.shape
        nlp = self.nlp
        I = jnp.eye(d, dtype=eval_pt.dtype)

        uc, G, pc, gpc, un, pn = self._fields_at_q(eval_pt, present)
        divu = jnp.trace(G, axis1=2, axis2=3)
        bf = self.gravity_q
        sig = self.sigma_pml_q
        ind = indicator[:, None]
        nf = 1.0 - ind
        CA = CP_TO_CV * ATM

        mu = params.viscosity
        ones = jnp.ones((n_c, n_q), dtype=eval_pt.dtype)
        rho_q = (params.fluid_rho +
                 ind * (params.solid_rho - params.fluid_rho)) * ones

        tau_s, tau_p, _ = self._stab_parameters(un, mu * ones, rho_q)
        w_s = tau_s * JxW
        w_p = tau_p * JxW

        cd_u = self.u_space.cell_dofs
        fsi_acc_q = jnp.einsum("ql,cla->cqa", Nu, fsi_acc_nodal[cd_u])
        fsi_sig_q = jnp.einsum("ql,clab->cqab", Nu, fsi_stress_nodal[cd_u])

        # deal.II tensor conventions: see SUPGInsIM
        uTG = jnp.einsum("cqa,cqax->cqx", uc, G)
        Gu = jnp.einsum("cqax,cqx->cqa", G, uc)
        accel = (uc - un) / dt
        rJ = rho_q * JxW

        # Matrix block in f32 when f32_matrix: the Jacobian is already
        # applied/preconditioned in f32 (inexact Newton, _newton_iter_impl)
        # and f64 einsums are EMULATED on TPU — measured 1032 -> 22 ms at
        # fsi-wall-3D full res.  The residual below stays f64.
        mdt = jnp.float32 if self.f32_matrix else eval_pt.dtype
        c_ = (lambda a: a.astype(mdt))
        m_Nu, m_Np, m_gu, m_gp = c_(Nu), c_(Np), c_(gu), c_(gp)
        m_JxW, m_rJ, m_sig = c_(JxW), c_(rJ), c_(sig)
        m_uc, m_G, m_un, m_gpc = c_(uc), c_(G), c_(un), c_(gpc)
        m_rho, m_ws, m_wp = c_(rho_q), c_(w_s), c_(w_p)
        m_pc, m_nf, m_ind, m_divu = c_(pc), c_(nf), c_(ind), c_(divu)
        m_I = jnp.eye(d, dtype=mdt)
        m_ug = jnp.einsum("cqx,cqlx->cql", m_uc, m_gu)
        m_uTG = c_(uTG)
        m_glgm = jnp.einsum("cqlx,cqmx->cqlm", m_gu, m_gu)

        # ---------------- Auu (scnsim.cpp:338-397) -----------------------
        gg = jnp.einsum("cqlx,cqmx,cq->clm", m_gu, m_gu, m_JxW)
        NN_r = jnp.einsum("cq,ql,qm->clm", m_rJ, m_Nu, m_Nu)
        conv2 = jnp.einsum("cq,ql,cqm->clm", m_rJ, m_Nu, m_ug)
        Auu = jnp.einsum("clm,ab->clamb",
                         mu * gg + conv2 + NN_r / dt
                         + jnp.einsum("cq,ql,qm->clm", m_rJ * m_sig, m_Nu,
                                      m_Nu), m_I)
        Auu = Auu + jnp.einsum("cq,ql,qm,cqab->clamb", m_rJ, m_Nu, m_Nu,
                               m_G)
        # SUPG (test vector u[a] grad N_l)
        Auu = Auu + jnp.einsum("cq,cqa,qm,cqlx,cqbx->clamb", m_rho * m_ws,
                               m_uc, m_Nu, m_gu, m_G)
        Auu = Auu + jnp.einsum("cq,cqa,cqb,cqlm->clamb", m_rho * m_ws,
                               m_uc, m_uc, m_glgm)
        Auu = Auu + jnp.einsum("cq,qm,cqlx,cqx,ab->clamb", m_rho * m_ws,
                               m_Nu, m_gu, m_uTG, m_I)
        Auu = Auu + jnp.einsum("cq,cqa,cqlb,qm->clamb", m_rho * m_ws / dt,
                               m_uc, m_gu, m_Nu)
        Auu = Auu + jnp.einsum("cq,qm,cqlx,cqx,ab->clamb",
                               m_rho * m_ws / dt, m_Nu, m_gu, m_uc - m_un,
                               m_I)
        Auu = Auu + jnp.einsum("cq,qm,cqlx,cqx,ab->clamb", m_ws, m_Nu,
                               m_gu, m_gpc, m_I)
        # SUPG PML
        Auu = Auu + jnp.einsum("cq,cqa,cqlb,qm->clamb",
                               m_rho * m_ws * m_sig, m_uc, m_gu, m_Nu)
        Auu = Auu + jnp.einsum("cq,qm,cqlx,cqx,ab->clamb",
                               m_rho * m_ws * m_sig, m_Nu, m_gu, m_uc, m_I)
        Auu = Auu.reshape(n_c, self.nu_loc, self.nu_loc)

        # ---------------- Aup --------------------------------------------
        Aup = -jnp.einsum("cqla,qn,cq->clan", m_gu, m_Np, m_JxW)
        Aup = Aup + jnp.einsum("cq,cqa,cqlx,cqnx->clan", m_ws, m_uc, m_gu,
                               m_gp)
        Aup = Aup.reshape(n_c, self.nu_loc, nlp)

        # ---------------- Apu (continuity, scnsim.cpp:400-413) -----------
        Apu = jnp.einsum("cq,qn,cqmb->cnmb",
                         (ATM + m_pc) / ATM * m_JxW, m_Np, m_gu)
        Apu = Apu + jnp.einsum("cq,qn,qm,cqb->cnmb", m_JxW / CA, m_Np,
                               m_Nu, m_gpc)
        # PSPG
        Apu = Apu + jnp.einsum("cq,cqnx,qm,cqbx->cnmb", m_rho * m_wp, m_gp,
                               m_Nu, m_G)
        Apu = Apu + jnp.einsum("cq,cqb,cqnx,cqmx->cnmb", m_rho * m_wp,
                               m_uc, m_gp, m_gu)
        Apu = Apu + jnp.einsum("cq,cqnb,qm->cnmb", m_rho * m_wp / dt, m_gp,
                               m_Nu)
        Apu = Apu + jnp.einsum("cq,cqnb,qm->cnmb", m_rho * m_wp * m_sig,
                               m_gp, m_Nu)
        Apu = Apu.reshape(n_c, nlp, self.nu_loc)

        # ---------------- App --------------------------------------------
        App = jnp.einsum("cq,qn,qo->cno", m_sig / CA * m_JxW, m_Np, m_Np)
        App = App + jnp.einsum("cq,qn,qo,cq->cno",
                               CP_TO_CV * m_nf / CA * m_JxW, m_Np, m_Np,
                               m_divu)
        App = App + jnp.einsum("cq,qn,cqox,cqx->cno", m_nf / CA * m_JxW,
                               m_Np, m_gp, m_uc)
        App = App + jnp.einsum("cq,qn,qo->cno",
                               (m_nf / CA + m_ind / KAPPA_S) / dt * m_JxW,
                               m_Np, m_Np)
        App = App + jnp.einsum("cq,cqnx,cqox->cno", m_wp, m_gp, m_gp)

        A_loc = jnp.concatenate([
            jnp.concatenate([Auu, Aup], axis=2),
            jnp.concatenate([Apu, App], axis=2)], axis=1)

        # ---------------- RHS (scnsim.cpp:428-469) -----------------------
        mom_res = (rho_q[..., None] * (accel + uTG) + gpc +
                   (rho_q * sig)[..., None] * uc)
        r_u = (-mu * jnp.einsum("cqax,cqlx,cq->cla", G, gu, JxW)
               - jnp.einsum("cq,ql,cqa->cla", rJ, Nu, Gu)
               + jnp.einsum("cq,cqla->cla", pc * JxW, gu)
               - jnp.einsum("cq,ql,cqa->cla", rJ / dt, Nu, uc - un)
               + jnp.einsum("cq,ql,cqa->cla", rJ, Nu, bf)
               - jnp.einsum("cq,ql,cqa->cla", rJ * sig, Nu, uc))
        r_u = r_u - jnp.einsum("cq,cqa,cqlx,cqx->cla", w_s, uc, gu, mom_res)
        r_u = r_u + ind[..., None] * (
            jnp.einsum("cqla,cqab,cq->clb", gu, fsi_sig_q, JxW) +
            jnp.einsum("cq,ql,cqa->cla", rJ, Nu, fsi_acc_q))

        cont_res = (CP_TO_CV * (ATM + pc) * divu +
                    jnp.einsum("cqx,cqx->cq", uc, gpc) * nf +
                    (pc - pn) / dt * (nf + CA / KAPPA_S * ind)) / CA
        r_p = (-jnp.einsum("cq,qn->cn", cont_res * JxW, Np)
               - jnp.einsum("cq,qn->cn", sig * pc / CA * JxW, Np))
        r_p = r_p - jnp.einsum("cq,cqnx,cqx->cn", w_p, gp, mom_res)

        r_loc = jnp.concatenate([r_u.reshape(n_c, -1), r_p], axis=1)
        rhs = scatter_add(self.n_dofs, self.cell_dofs, r_loc)
        return A_loc, rhs + self._neumann_rhs_const
