"""Spalart-Allmaras (negative-SA variant) RANS turbulence model.

Reference: include/mpi_spalart_allmaras.h, source/mpi_spalart_allmaras.cpp,
include/mpi_turbulence_model.h (factory at
source/mpi_turbulence_model.cpp:12-26).

The scalar working viscosity nu~ lives on the fluid's scalar (velocity-
degree) space; each fluid step is preceded by a Newton solve of the SA
transport equation; the eddy viscosity mu_t = rho f_v1 nu~ feeds back into
the fluid assembly (consumed by SCnsIM via `eddy_viscosity_nodal`).

Notes on parity:
 - the reference's `r` parameter computation drops the result of std::min
   (an uninitialized-variable bug, source/mpi_spalart_allmaras.cpp:757-769);
   we implement the evidently intended r = min(nu~/(S~ k^2 d^2), 10).
 - fixed-wall distance replicates the reference's brute-force minimum over
   the wall boundary VERTEX cloud (source/mpi_spalart_allmaras.cpp:408-539)
   as one batched distance matrix.
 - FSI wall functions: moving-wall distance is point-to-segment against the
   deformed solid boundary (2D; vertex cloud in 3D) with y+ from linearly
   interpolated shear velocities (source/mpi_spalart_allmaras.cpp:16-127);
   shear velocity solves the analytic u+(y+) profile by Newton (:217-280);
   `update_boundary_condition` adds per-step Dirichlet rows nu~ = kappa y+ nu
   near the moving wall and nu~ = 0 inside the solid (:129-215).  The
   reference merges these rows into its PERSISTENT zero constraints, so once
   constrained a dof stays frozen in later steps — replicated deliberately.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...config import real_dtype
from ...la.constraints import Constraints
from ...la.krylov import fgmres
from ...la.operators import element_diag, element_matvec, scatter_add
from ...parameters import AllParameters

CV1, CV2, CV3 = 7.1, 0.7, 0.9
CB1, CB2, CT3, CT4, KAPPA = 0.1355, 0.622, 1.2, 0.5, 0.41
CW2, CW3, CN1 = 0.3, 2.0, 16.0
SIGMA = 2.0 / 3.0
CW1 = CB1 / (KAPPA * KAPPA) + (1.0 + CB2) / SIGMA

# analytic wall-velocity-profile constants
# (reference: source/mpi_spalart_allmaras.cpp:237-246)
WF_B, WF_A1, WF_A2 = 5.03339088, 8.14822158, -6.92870938
WF_B1, WF_B2 = 7.46008761, 7.46814579
WF_C1, WF_C2, WF_C3, WF_C4 = 2.54967735, 1.33016516, 3.59945911, 3.63975319


def _u_plus(yp):
    return (WF_B + WF_C1 * np.log((yp + WF_A1) ** 2 + WF_B1 ** 2)
            - WF_C2 * np.log((yp + WF_A2) ** 2 + WF_B2 ** 2)
            - WF_C3 * np.arctan2(WF_B1, yp + WF_A1)
            - WF_C4 * np.arctan2(WF_B2, yp + WF_A2))


def _dup_dyp(yp):
    k3 = KAPPA ** 3
    return k3 * yp ** 3 / (CV1 ** 3 + k3 * yp ** 3)


def make_turbulence_model(name: str, fluid):
    """TurbulenceModelFactory analog
    (reference: source/mpi_turbulence_model.cpp:12-26)."""
    if name == "Spalart-Allmaras":
        model = SpalartAllmaras(fluid)
        # attach to the fluid solver (reference: attach_turbulence_model,
        # source/mpi_fluid_solver.cpp:53-63)
        fluid.turbulence_model = model
        return model
    raise ValueError(f"Unknown turbulence model: {name}")


class SpalartAllmaras:
    outer_restart = 30
    outer_max_restarts = 20

    def __init__(self, fluid):
        self.fluid = fluid
        self.params: AllParameters = fluid.params

    # ------------------------------------------------------------------
    def setup(self):
        """Build the scalar system on the fluid's velocity-degree space."""
        fluid = self.fluid
        params = self.params
        space = fluid.u_space
        self.space = space
        self.n = space.n_nodes
        rdt = real_dtype()
        d = fluid.dim

        # BCs: type 0 wall -> 0; type 1 inflow -> 5 nu_laminar
        # (reference: source/mpi_spalart_allmaras.cpp:347-406)
        dmask = np.zeros(self.n, dtype=bool)
        dvals = np.zeros(self.n)
        bmap = space.boundary_node_map()
        lam_nu = params.viscosity / params.fluid_rho
        wall_ids = []
        for bid, typ in params.spalart_allmaras_model_bcs.items():
            if bid not in bmap:
                continue
            nodes = bmap[bid]
            dmask[nodes] = True
            dvals[nodes] = 0.0 if typ == 0 else 5.0 * lam_nu
            if typ == 0:
                wall_ids.append(bid)
        from ...fe.space import SystemSpace
        ssys = SystemSpace([(space, 1)])
        hidx, hw, hmask = ssys.hanging_tables()
        self._hang = (hidx, hw, hmask)
        self._base_dirichlet = dmask
        self._base_values = dvals
        self._accum_mask = np.zeros(self.n, dtype=bool)
        self._step_zero = None
        self._step_nonzero = None
        self.zero_constraints = Constraints(self.n, hidx, hw, hmask,
                                            dirichlet_mask=dmask)
        self.nonzero_constraints = Constraints(self.n, hidx, hw, hmask,
                                               dirichlet_mask=dmask,
                                               dirichlet_values=dvals)

        # fixed wall distance: min distance from each support point to the
        # wall boundary vertex cloud
        if wall_ids:
            wnodes = space.boundary_nodes(wall_ids)
            # the reference uses only mesh VERTICES of wall faces
            wall_pts = fluid.mesh.vertices[
                np.asarray([n for n in wnodes if n < fluid.mesh.n_vertices])]
            dists = np.linalg.norm(
                space.node_points[:, None, :] - wall_pts[None, :, :], axis=-1)
            fixed_d = dists.min(axis=1)
        else:
            fixed_d = np.full(self.n, 1e10)
        self.fixed_wall_distance = jnp.asarray(fixed_d, dtype=rdt)
        self.moving_wall_distance = jnp.full(self.n, np.inf, dtype=rdt)
        self.y_plus = np.zeros(self.n)

        # initial condition: coeff * laminar nu with zero-constraint rows
        # zeroed; the inflow value enters as the first step's constraint
        # increment (reference: source/mpi_spalart_allmaras.cpp:559-565)
        ic = (params.spalart_allmaras_initial_condition_coefficient * lam_nu)
        self.present_solution = self.zero_constraints.distribute(
            jnp.full(self.n, ic, dtype=rdt))
        self.eddy_viscosity_nodal = jnp.zeros(self.n, dtype=rdt)
        self.update_eddy_viscosity()

        self.cell_dofs = jnp.asarray(space.cell_dofs, dtype=jnp.int32)
        self.Nq = jnp.asarray(fluid.cv_u.N, dtype=rdt)
        self.gq = jnp.asarray(fluid.cv_u.grad, dtype=rdt)
        self.JxW = jnp.asarray(fluid.cv_u.JxW, dtype=rdt)
        self._newton_iter = jax.jit(self._newton_iter_impl)

    # ------------------------------------------------------------------
    def _assemble(self, eval_pt, present, fluid_solution, wall_d,
                  indicator):
        """SA Newton matrix + rhs
        (reference: source/mpi_spalart_allmaras.cpp:619-860)."""
        fluid = self.fluid
        params = self.params
        d = fluid.dim
        dt = fluid.time.get_delta_t()
        N, g, JxW = self.Nq, self.gq, self.JxW
        cd = self.cell_dofs
        n_c, n_q, nl, _ = g.shape

        lam_nu_f = params.viscosity / params.fluid_rho
        lam_nu_s = 1.0 / params.fluid_rho  # artificial fluid (mu = 1)
        lam_nu = (indicator[:, None] * lam_nu_s +
                  (1 - indicator[:, None]) * lam_nu_f)

        u = fluid_solution[:fluid.n_u].reshape(-1, d)
        ul = u[np.asarray(fluid.u_space.cell_dofs)]
        uq = jnp.einsum("ql,cla->cqa", N, ul)
        Gq = jnp.einsum("cqlx,cla->cqax", g, ul)
        # vorticity magnitude |curl u|
        if d == 2:
            S = jnp.abs(Gq[..., 1, 0] - Gq[..., 0, 1])
        else:
            wx = Gq[..., 2, 1] - Gq[..., 1, 2]
            wy = Gq[..., 0, 2] - Gq[..., 2, 0]
            wz = Gq[..., 1, 0] - Gq[..., 0, 1]
            S = jnp.sqrt(wx ** 2 + wy ** 2 + wz ** 2)

        nu_p = jnp.einsum("ql,cl->cq", N, present[cd])      # nu~ at t_n
        nu_c = jnp.einsum("ql,cl->cq", N, eval_pt[cd])
        gnu_c = jnp.einsum("cqlx,cl->cqx", g, eval_pt[cd])
        dq = jnp.einsum("ql,cl->cq", N, wall_d[cd])
        dq = jnp.maximum(dq, 1e-12)

        chi = nu_p / lam_nu
        ft2 = CT3 * jnp.exp(-CT4 * chi * chi)
        fv1 = chi ** 3 / (chi ** 3 + CV1 ** 3)
        fv2 = 1.0 - chi / (1.0 + chi * fv1)
        S_bar = nu_p / (KAPPA ** 2 * dq ** 2) * fv2
        S_tilde = jnp.where(
            S_bar >= -CV2 * S, S + S_bar,
            S + S * (CV2 ** 2 * S - CV3 * S_bar) /
            ((CV3 - 2 * CV2) * S - S_bar))
        r = jnp.where(jnp.abs(S_tilde) > 1e-8,
                      jnp.minimum(nu_p / (jnp.where(
                          jnp.abs(S_tilde) > 1e-8, S_tilde, 1.0) *
                          KAPPA ** 2 * dq ** 2), 10.0), 10.0)
        gg = r + CW2 * (r ** 6 - r)
        fw = gg * ((1 + CW3 ** 6) / (gg ** 6 + CW3 ** 6)) ** (1.0 / 6.0)

        P = jnp.where(nu_p >= 0, CB1 * (1 - ft2) * S_tilde,
                      CB1 * (1 - CT3) * S)
        D = jnp.where(nu_p >= 0,
                      (CW1 * fw - CB1 / KAPPA ** 2 * ft2) / dq ** 2,
                      -CW1 / dq ** 2)
        fn = jnp.where(nu_p >= 0, 1.0,
                       (CN1 + chi ** 3) / (CN1 - chi ** 3))

        diff = lam_nu + fn * nu_p
        ugj = jnp.einsum("cqa,cqja->cqj", uq, g)   # u . grad N_j

        A = (jnp.einsum("cq,qi,qj->cij", JxW / dt, N, N)
             + jnp.einsum("cq,qi,cqj->cij", JxW, N, ugj)
             + jnp.einsum("cq,cqix,cqjx->cij", JxW * diff / SIGMA, g, g)
             - (2 * CB2 / SIGMA) * jnp.einsum(
                 "cq,qi,cqjx,cqx->cij", JxW, N, g, gnu_c)
             - jnp.einsum("cq,qi,qj->cij", JxW * P, N, N)
             + 2 * jnp.einsum("cq,qi,qj->cij", JxW * D * nu_c, N, N))

        ug_nu = jnp.einsum("cqa,cqa->cq", uq, gnu_c)
        res = ((nu_c - nu_p) / dt + ug_nu - P * nu_c + D * nu_c * nu_c)
        r_i = -(jnp.einsum("cq,qi->ci", JxW * res, N)
                + jnp.einsum("cq,cqix,cqx->ci", JxW * diff / SIGMA, g, gnu_c)
                - (CB2 / SIGMA) * jnp.einsum(
                    "cq,qi->ci", JxW * jnp.einsum("cqx,cqx->cq", gnu_c,
                                                  gnu_c), N))
        rhs = scatter_add(self.n, cd, r_i)
        return A, rhs

    def _newton_iter_impl(self, eval_pt, present, fluid_solution, wall_d,
                          indicator, cons):
        A_loc, rhs = self._assemble(eval_pt, present, fluid_solution, wall_d,
                                    indicator)
        b = cons.condense_rhs(rhs)
        res_norm = jnp.linalg.norm(b)
        op = cons.wrap_operator(
            lambda x: element_matvec(A_loc, self.cell_dofs, self.n, x))
        diag = jnp.where(cons.fixed, 1.0,
                         element_diag(A_loc, self.cell_dofs, self.n))
        dinv = jnp.where(diag != 0, 1.0 / diag, 1.0)
        res = fgmres(op, b, M=lambda r_: r_ * dinv,
                     atol=jnp.maximum(1e-8 * res_norm, 1e-12),
                     restart=self.outer_restart,
                     max_restarts=self.outer_max_restarts)
        du = cons.distribute(res.x)
        return du, res_norm, res.iters

    # ------------------------------------------------------------------
    def run_one_step(self, apply_nonzero_constraints: bool,
                     verbose: bool = False):
        """Newton loop (reference: source/mpi_spalart_allmaras.cpp:282-345).
        Couples to the fluid's present solution and indicator field."""
        params = self.params
        fluid = self.fluid
        wall_d = jnp.minimum(self.fixed_wall_distance,
                             self.moving_wall_distance)
        zero_cons = self._step_zero if self._step_zero is not None \
            else self.zero_constraints
        nonzero_cons = self._step_nonzero if self._step_nonzero is not None \
            else self.nonzero_constraints
        eval_pt = self.present_solution
        if apply_nonzero_constraints:
            eval_pt = nonzero_cons.apply_increment(eval_pt)

        current_res = 1.0
        initial_res = 1.0
        rel = 1.0
        it = 0
        while rel > params.fluid_tolerance and current_res > 1e-14:
            if it >= params.fluid_max_iterations:
                raise RuntimeError("Too many Newton iterations!")
            du, rn, iters = self._newton_iter(
                eval_pt, self.present_solution, fluid.present_solution,
                wall_d, fluid.indicator, zero_cons)
            current_res = float(rn)
            eval_pt = eval_pt + du
            if it == 0:
                initial_res = max(current_res, 1e-300)
            rel = current_res / initial_res
            if verbose:
                print(f" SA ITR = {it} ABS_RES = {current_res:.6e} "
                      f"GMRES_ITR = {int(iters)}")
            it += 1
        self.present_solution = eval_pt
        self.update_eddy_viscosity()

    def make_device_step(self):
        """One SA time step (Newton lax.while_loop + eddy-viscosity
        update) as a pure jittable function for STANDALONE runs (static
        wall distances, constraints and indicator; the FSI wall-function
        path keeps the host loop — moving-wall distances update per step
        there).  Returns fn(nu_present, fluid_solution, apply_nonzero) ->
        (nu_new, eddy_nodal, rel_res, newton_iters).  apply_nonzero (a
        traced bool is fine) adds the nonzero-constraint inhomogeneity to
        the evaluation point — deal.II INCREMENT semantics, so it must be
        True exactly once (the first step of a run), matching
        run_one_step(True) then run_one_step(False) afterwards."""
        import jax.lax as lax
        params = self.params
        cons = self.zero_constraints
        nz = self.nonzero_constraints
        wall_d = jnp.minimum(self.fixed_wall_distance,
                             self.moving_wall_distance)
        indicator = self.fluid.indicator
        tol = params.fluid_tolerance
        max_it = params.fluid_max_iterations
        lam_nu = params.viscosity / params.fluid_rho

        def step(nu, fluid_sol, apply_nonzero):
            def newton_once(e):
                du, rn, _ = self._newton_iter_impl(
                    e, nu, fluid_sol, wall_d, indicator, cons)
                return e + du, rn

            eval_pt, res0 = newton_once(
                jnp.where(apply_nonzero, nz.apply_increment(nu), nu))

            def cond(s):
                e, it, res = s
                return ((res / jnp.maximum(res0, 1e-300) > tol) &
                        (res > 1e-14) & (it < max_it))

            def body(s):
                e, it, res = s
                e2, rn = newton_once(e)
                return (e2, it + 1, rn)

            eval_pt, it, res = lax.while_loop(cond, body,
                                              (eval_pt, 1, res0))
            chi = eval_pt / lam_nu
            fv1 = chi ** 3 / (chi ** 3 + CV1 ** 3)
            eddy = fv1 * eval_pt * params.fluid_rho
            return (eval_pt, eddy,
                    res / jnp.maximum(res0, 1e-300), it)

        return step

    def update_eddy_viscosity(self):
        """mu_t = rho f_v1 nu~
        (reference: source/mpi_spalart_allmaras.cpp:891-914)."""
        params = self.params
        lam_nu = params.viscosity / params.fluid_rho
        chi = self.present_solution / lam_nu
        fv1 = chi ** 3 / (chi ** 3 + CV1 ** 3)
        self.eddy_viscosity_nodal = (fv1 * self.present_solution *
                                     params.fluid_rho)
        # feed back into the fluid solver (SCnsIM consumes this)
        self.fluid.eddy_viscosity_nodal = self.eddy_viscosity_nodal

    # ------------------------------------------------------------------
    # FSI wall-function machinery
    # ------------------------------------------------------------------
    def get_shear_velocity(self, vel, init_guess):
        """Shear velocity u_tau from the analytic wall-velocity profile by
        Newton iteration, vectorized over points
        (reference: source/mpi_spalart_allmaras.cpp:217-280)."""
        params = self.params
        vel = np.atleast_1d(np.asarray(vel, dtype=np.float64))
        init = np.broadcast_to(
            np.asarray(init_guess, dtype=np.float64), vel.shape).copy()
        nu = params.viscosity / params.fluid_rho
        dist = params.wall_function_image_distance
        out = np.zeros_like(vel)
        small = np.abs(vel) < 1e-10
        # viscous sublayer shortcut (y+ < 5: u+ = y+)
        visc = (~small) & (vel * dist / nu < np.sqrt(5.0))
        out[visc] = vel[visc] / np.sqrt(vel[visc] * dist / nu)
        newton = ~(small | visc)
        if np.any(newton):
            v = vel[newton]
            ut = np.maximum(init[newton], 5.0 * nu / dist)
            active = np.ones(ut.shape, dtype=bool)
            for _ in range(30):
                yp = ut * dist / nu
                up = _u_plus(yp)
                ut_next = ut - (ut * up - v) / (up + yp * _dup_dyp(yp))
                conv = np.abs(ut_next - ut) < 1e-2 * np.abs(ut)
                ut = np.where(active, ut_next, ut)
                active &= ~conv
                if not active.any():
                    break
            out[newton] = ut
        return out

    def update_moving_wall_distance(self, vertex_pts, faces,
                                    shear_velocities):
        """FSI hook: per-support-point distance to the DEFORMED solid
        boundary, plus y+ from the nearest point's shear velocity
        (reference: source/mpi_spalart_allmaras.cpp:16-127).

        vertex_pts: (m, d) deformed solid boundary vertex positions;
        faces: (k, nfv) indices into vertex_pts (2D: segment endpoints);
        shear_velocities: (m,) u_tau per boundary vertex."""
        params = self.params
        P = np.asarray(self.space.node_points, dtype=np.float64)
        V = np.asarray(vertex_pts, dtype=np.float64)
        ut = np.asarray(shear_velocities, dtype=np.float64)
        nu = params.viscosity / params.fluid_rho
        n = len(P)

        # vertex-cloud distances (checked AFTER edges in the reference, with
        # strict <, so edges win exact ties: concatenate edges first)
        dv = np.linalg.norm(P[:, None, :] - V[None, :, :], axis=-1)  # (n, m)
        uv = np.broadcast_to(ut[None, :], dv.shape)
        cand_d, cand_u = [dv], [uv]
        faces = np.asarray(faces)
        if self.fluid.dim == 2 and len(faces):
            A, B = V[faces[:, 0]], V[faces[:, 1]]
            e = B - A                                    # (k, d)
            L2 = np.maximum((e * e).sum(-1), 1e-30)
            w = P[:, None, :] - A[None, :, :]            # (n, k, d)
            t = np.einsum("nkd,kd->nk", w, e) / L2
            foot = A[None] + t[..., None] * e[None]
            de = np.linalg.norm(P[:, None, :] - foot, axis=-1)
            inside = (t > 0) & (t < 1)
            de = np.where(inside, de, np.inf)
            ue = ut[faces[:, 0]][None] + t * (ut[faces[:, 1]] -
                                              ut[faces[:, 0]])[None]
            cand_d, cand_u = [de, dv], [ue, uv]
        D = np.concatenate(cand_d, axis=1)
        U = np.concatenate(cand_u, axis=1)
        best = np.argmin(D, axis=1)
        min_d = D[np.arange(n), best]
        best_u = U[np.arange(n), best]
        self.moving_wall_distance = jnp.asarray(min_d, dtype=real_dtype())
        self.y_plus = min_d * best_u / nu

    def update_boundary_condition(self, first_step: bool):
        """Per-step extra Dirichlet rows (reference:
        source/mpi_spalart_allmaras.cpp:129-215): nu~ set to 0 on dofs of
        fully-covered (indicator==1) cells and to kappa*y+*nu on support
        points within the wall-function distance of the moving wall with
        y+ < 200.  First-touch-wins over the cell loop; the inner zero rows
        are merged into the persistent zero constraints (the reference never
        rebuilds them, so rows accumulate across steps — replicated)."""
        params = self.params
        n = self.n
        cd = np.asarray(self.space.cell_dofs)
        n_c, nl = cd.shape
        ind = np.asarray(self.fluid.indicator) == 1
        INF = n_c + 1

        first_ind = np.full(n, INF, dtype=np.int64)
        first_wall = np.full(n, INF, dtype=np.int64)
        cell_ids = np.arange(n_c, dtype=np.int64)
        if ind.any():
            np.minimum.at(first_ind, cd[ind].ravel(),
                          np.repeat(cell_ids[ind], nl))
        mwd = np.asarray(self.moving_wall_distance)
        yp = np.asarray(self.y_plus)
        wall_ok = (mwd < params.wall_function_effective_distance) & \
            (yp < 200.0)
        if (~ind).any():
            np.minimum.at(first_wall, cd[~ind].ravel(),
                          np.repeat(cell_ids[~ind], nl))
        first_wall = np.where(wall_ok, first_wall, INF)
        is_ind = (first_ind < INF) & (first_ind < first_wall)
        is_wall = (first_wall < INF) & (first_wall < first_ind)
        new_mask = is_ind | is_wall
        self._accum_mask |= new_mask

        nu_lam = params.viscosity / params.fluid_rho
        present = np.asarray(self.present_solution)
        target = np.where(is_ind, 0.0, KAPPA * yp * nu_lam)
        zero_mask = self._base_dirichlet | self._accum_mask
        base_vals = self._base_values if first_step else np.zeros(n)
        vals = np.where(new_mask, target - present,
                        np.where(self._accum_mask, 0.0, base_vals))
        hidx, hw, hmask = self._hang
        self._step_zero = Constraints(n, hidx, hw, hmask,
                                      dirichlet_mask=zero_mask)
        self._step_nonzero = Constraints(n, hidx, hw, hmask,
                                         dirichlet_mask=zero_mask,
                                         dirichlet_values=vals)
