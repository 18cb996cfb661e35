"""Control-volume FSI analytics (vocal-fold application driver).

Reference: include/cv_fsi.h, source/cv_fsi.cpp.  Runs the MPI-semantics FSI
loop and, after each step, evaluates momentum/energy control-volume budgets
and appends them to a CSV file (the reference writes a long-header text
file, source/cv_fsi.cpp:1637-1825).

Implemented budget terms (definitions follow CVValues,
include/cv_fsi.h:119-213): inlet/outlet volume flow, pressure force and
pressure work, momentum fluxes and momentum rate, VF drag/friction and
friction work, kinetic energy and its rate, viscous dissipation,
compression work, pressure convection, convective KE, max velocity and a
pressure probe.

Deviations from the reference (documented): the inlet/outlet planes snap to
mesh face planes instead of cutting cells with embedded (dim-1)
triangulations (SurfaceCutter, include/cv_fsi.h:219-231), and the
stabilization/turbulence-efflux correction terms are not included.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import real_dtype
from ..fe.fevalues import face_values
from ..mesh.mesh import FACE_VERTICES
from .interp import interpolate_nodal, locate_points
from .mpi_fsi import MPIFSI


class ControlVolumeFSI(MPIFSI):
    def __init__(self, fluid, solid, params, use_dirichlet_bc: bool = False):
        super().__init__(fluid, solid, params, use_dirichlet_bc)
        self._cv_bounds = None
        self._probe_point = None
        self.output_solid_boundary = False
        self.cv_history = []

    # -- reference API (include/cv_fsi.h:40-108) -----------------------
    def set_control_volume_boundary(self, x_in: float, x_out: float):
        self._cv_bounds = (x_in, x_out)

    def set_pressure_probe(self, point):
        self._probe_point = np.asarray(point, dtype=np.float64)

    def set_output_solid_boundary(self, flag: bool = True):
        self.output_solid_boundary = flag

    # ------------------------------------------------------------------
    def _setup_coupling(self):
        super()._setup_coupling()
        if self._cv_bounds is not None:
            self._setup_cv()

    def _setup_cv(self):
        fluid = self.fluid
        mesh = fluid.mesh
        x_in, x_out = self._cv_bounds
        centers = mesh.cell_centers()
        # snap planes to the nearest mesh face plane
        xs = np.unique(np.round(mesh.vertices[:, 0], 10))
        self._x_in = xs[np.argmin(np.abs(xs - x_in))]
        self._x_out = xs[np.argmin(np.abs(xs - x_out))]
        self._cv_cells = np.where((centers[:, 0] > self._x_in) &
                                  (centers[:, 0] < self._x_out))[0]

        # inlet faces: -x faces of CV cells lying on the inlet plane;
        # outlet: +x faces on the outlet plane
        inlet, outlet = [], []
        for c in self._cv_cells:
            for f, plane, out in ((0, self._x_in, inlet),
                                  (1, self._x_out, outlet)):
                vs = [int(mesh.cells[c, v]) for v in FACE_VERTICES[mesh.dim][f]]
                if np.allclose(mesh.vertices[vs][:, 0], plane, atol=1e-10):
                    out.append((int(c), f))
        nq = self.params.fluid_velocity_degree + 1
        self._fv_in = face_values(fluid.u_space, nq, inlet)
        self._fv_out = face_values(fluid.u_space, nq, outlet)
        self._fv_in_p = face_values(fluid.p_space, nq, inlet)
        self._fv_out_p = face_values(fluid.p_space, nq, outlet)
        self._prev_KE = 0.0
        self._prev_momentum = 0.0

        if self._probe_point is not None:
            self._probe_jnp = jnp.asarray(self._probe_point[None, :],
                                          dtype=real_dtype())

    # ------------------------------------------------------------------
    def _surface_integrals(self, fv_u, fv_p, sol):
        """(volume flow, pressure force, momentum flux, pressure work,
        KE flux) over a face set; n1 taken as +1 (x-direction planes)."""
        fluid = self.fluid
        d = fluid.dim
        rho = self.params.fluid_rho
        u = np.asarray(sol[:fluid.n_u]).reshape(-1, d)
        p = np.asarray(sol[fluid.n_u:])
        ul = u[fluid.u_space.cell_dofs[np.asarray(fv_u.cells)]]
        uq = np.einsum("fqi,fia->fqa", fv_u.N, ul)
        pl = p[fluid.p_space.cell_dofs[np.asarray(fv_p.cells)]]
        pq = np.einsum("fqi,fi->fq", fv_p.N, pl)
        w = fv_u.JxW
        u1 = uq[..., 0]
        vol_flow = float((u1 * w).sum())
        p_force = float((pq * w).sum())
        mom_flux = float(rho * (u1 * u1 * w).sum())
        p_work = float((pq * u1 * w).sum())
        ke_flux = float(0.5 * rho * (u1 * (uq ** 2).sum(-1) * w).sum())
        return vol_flow, p_force, mom_flux, p_work, ke_flux

    def control_volume_analysis(self):
        """reference: source/cv_fsi.cpp:549-1591 (subset, see module doc)."""
        fluid, solid = self.fluid, self.solid
        params = self.params
        d = fluid.dim
        rho = params.fluid_rho
        mu = params.viscosity
        dt = self.time.get_delta_t()
        sol = fluid.present_solution

        out = {}
        (out["inlet_volume_flow"], out["inlet_pressure_force"],
         out["momentum_inlet_flux"], out["inlet_pressure_work"],
         out["energy_inlet_flux"]) = self._surface_integrals(
            self._fv_in, self._fv_in_p, sol)
        (out["outlet_volume_flow"], out["outlet_pressure_force"],
         out["momentum_outlet_flux"], out["outlet_pressure_work"],
         out["energy_outlet_flux"]) = self._surface_integrals(
            self._fv_out, self._fv_out_p, sol)

        # volume integrals over CV cells
        cv = self._cv_cells
        u = np.asarray(sol[:fluid.n_u]).reshape(-1, d)
        p = np.asarray(sol[fluid.n_u:])
        ul = u[fluid.u_space.cell_dofs[cv]]
        pl = p[fluid.p_space.cell_dofs[cv]]
        N = fluid.cv_u.N
        g = fluid.cv_u.grad[cv]
        Np = fluid.cv_p.N
        gp = fluid.cv_p.grad[cv]
        JxW = fluid.cv_u.JxW[cv]
        uq = np.einsum("ql,cla->cqa", N, ul)
        G = np.einsum("cqlx,cla->cqax", g, ul)
        pq = np.einsum("qn,cn->cq", Np, pl)
        gpq = np.einsum("cqnx,cn->cqx", gp, pl)
        divu = np.trace(G, axis1=2, axis2=3)

        out["max_velocity"] = float(np.linalg.norm(uq, axis=-1).max()) \
            if len(cv) else 0.0
        momentum_x = float(rho * (uq[..., 0] * JxW).sum())
        out["rate_momentum"] = (momentum_x - self._prev_momentum) / dt
        self._prev_momentum = momentum_x

        KE = float(0.5 * rho * ((uq ** 2).sum(-1) * JxW).sum())
        out["present_KE"] = KE
        out["rate_kinetic_energy"] = (KE - self._prev_KE) / dt
        self._prev_KE = KE
        out["rate_dissipation"] = float(
            mu * ((G ** 2).sum((2, 3)) * JxW +
                  np.einsum("cqij,cqji->cq", G, G) * JxW).sum())
        out["rate_compression_work"] = float((pq * divu * JxW).sum())
        out["pressure_convection"] = float(
            (np.einsum("cqx,cqx->cq", gpq, uq) * JxW).sum())
        Gu = np.einsum("cqax,cqx->cqa", G, uq)
        out["convective_KE"] = float(
            rho * (np.einsum("cqa,cqa->cq", Gu, uq) * JxW).sum())
        out["VF_volume"] = float(
            (np.asarray(fluid.indicator)[cv][:, None] * JxW).sum())

        # interface (VF) integrals on the moved solid boundary
        if hasattr(solid, "_face_geometry"):
            JxWf, normals = solid._face_geometry(solid.moved_vertex_coords())
            normals = np.asarray(normals * solid._face_orient[:, None, None])
            JxWf = np.asarray(JxWf)
            # fluid p/tau/u at moved face quadrature points
            fvs = solid.fv
            moved = np.asarray(solid.moved_vertex_coords())
            fq = np.einsum(
                "fqv,fvd->fqd",
                self._solid_face_geo_N(), moved[np.asarray(
                    self._solid_bface_verts)])
            pts = jnp.asarray(fq.reshape(-1, d), dtype=real_dtype())
            idx, unit, found = locate_points(
                pts, self._fluid_cell_verts, self._fluid_bbox_lo,
                self._fluid_bbox_hi)
            p_at = np.asarray(interpolate_nodal(
                sol[fluid.n_u:], jnp.asarray(fluid.p_space.cell_dofs,
                                             dtype=jnp.int32),
                idx, unit, params.fluid_pressure_degree, found)).reshape(
                JxWf.shape)
            tau_at = np.asarray(interpolate_nodal(
                fluid.stress_device, jnp.asarray(fluid.u_space.cell_dofs,
                                                 dtype=jnp.int32),
                idx, unit, params.fluid_velocity_degree, found)).reshape(
                JxWf.shape + (d, d))
            u_at = np.asarray(interpolate_nodal(
                jnp.asarray(u), jnp.asarray(fluid.u_space.cell_dofs,
                                            dtype=jnp.int32),
                idx, unit, params.fluid_velocity_degree, found)).reshape(
                JxWf.shape + (d,))
            out["VF_drag"] = float((p_at * normals[..., 0] * JxWf).sum())
            fric = np.einsum("fqij,fqj->fqi", tau_at, normals)
            out["VF_friction"] = float((fric[..., 0] * JxWf).sum())
            out["rate_friction_work"] = float(
                (np.einsum("fqi,fqi->fq", fric, u_at) * JxWf).sum())
            out["rate_vf_work"] = float(
                (p_at * np.einsum("fqi,fqi->fq", u_at, normals) *
                 JxWf).sum())

        if self._probe_point is not None:
            idx, unit, found = locate_points(
                self._probe_jnp, self._fluid_cell_verts,
                self._fluid_bbox_lo, self._fluid_bbox_hi)
            out["probed_pressure"] = float(interpolate_nodal(
                sol[fluid.n_u:], jnp.asarray(fluid.p_space.cell_dofs,
                                             dtype=jnp.int32),
                idx, unit, params.fluid_pressure_degree, found)[0])

        out["time"] = self.time.current()
        self.cv_history.append(out)
        self._write_cv_output(out)
        return out

    def _solid_face_geo_N(self):
        """Bilinear geometry shape values at solid face quadrature points."""
        if not hasattr(self, "_sfN"):
            from ..fe.shapes import QkShapes, gauss_quadrature
            d = self.solid.dim
            qp, _ = gauss_quadrature(self.params.solid_degree + 1, d - 1)
            if d == 2:
                N = np.stack([1 - qp[:, 0], qp[:, 0]], axis=1)
            else:
                N, _ = QkShapes(1, 2).evaluate(qp)
            nf = len(self.solid.fv.cells)
            self._sfN = np.broadcast_to(N, (nf,) + N.shape)
        return self._sfN

    def _write_cv_output(self, out):
        import os
        fname = "control_volume_analysis.csv"
        new = not os.path.exists(fname) or self.time.get_timestep() <= 1
        mode = "w" if new else "a"
        keys = sorted(k for k in out if k != "time")
        with open(fname, mode) as f:
            if new:
                f.write("time," + ",".join(keys) + "\n")
            f.write(f"{out['time']:.10g}," +
                    ",".join(f"{out.get(k, 0.0):.10g}" for k in keys) + "\n")

    # ------------------------------------------------------------------
    def run(self, verbose: bool = True):
        """reference: source/cv_fsi.cpp:160-281 (run loop + per-step
        control_volume_analysis)."""
        params = self.params
        self.solid.mesh = self.solid.mesh.refine_global(
            params.global_refinements[1])
        self.solid.setup()
        self.fluid.mesh = self.fluid.mesh.refine_global(
            params.global_refinements[0])
        self.fluid.setup()
        self._setup_coupling()

        first_step = True
        while self.time.end() - self.time.current() > 1e-12:
            self.find_solid_bc()
            if self.penetration_criterion is not None:
                self.apply_contact_model(first_step)
            else:
                self.solid.run_one_step(first_step)
            self.update_solid_box_and_indicator()
            zero_ext, nonzero_ext = self.find_fluid_bc(first_step)
            self.fluid.run_one_step(True, verbose=verbose,
                                    zero_cons=zero_ext,
                                    nonzero_cons=nonzero_ext)
            first_step = False
            self.time.increment()
            if self._cv_bounds is not None:
                self.control_volume_analysis()
