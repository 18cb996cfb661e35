"""Control-volume FSI analytics (vocal-fold application driver).

Reference: include/cv_fsi.h, source/cv_fsi.cpp.  Runs the MPI-semantics FSI
loop and, after each step, evaluates momentum/energy control-volume budgets
and appends them to a CSV file (the reference writes a long-header text
file, source/cv_fsi.cpp:1637-1825).

Surface fluxes use exact sub-cell cutting: each fluid cell straddling an
inlet/outlet plane x = const is cut (the SurfaceCutter analog,
source/cv_fsi.cpp:6-58, 368-546); flux integrands are evaluated at the two
cut-segment endpoints with trapezoidal weights (matching the reference's
cutter support-point quadrature) and the cut cell's volume integrals are
weighted by the kept volume fraction (Gauss-theorem area in the reference;
shoelace polygon area here, source/cv_fsi.cpp:61-160).

Budget terms (CVValues, include/cv_fsi.h:119-213): inlet/outlet volume
flow, pressure force/work, momentum and KE fluxes, friction work and
turbulence efflux at the cuts, rate of momentum / kinetic energy (direct
and finite-difference), convective KE, pressure convection, dissipation,
compression work, SUPG/LSIC stabilization rate, turbulence dissipation
rate, gap volume flow at the solid tip, deformed VF volume, max velocity,
pressure probe, VF drag/friction/work on the moved interface.

Also implemented: the Bernoulli contraction/jet head decomposition along
the glottis streamline path (source/cv_fsi.cpp:1243-1591, `_bernoulli_terms`
below) and the per-step solid-boundary trace for POD post-processing
(source/cv_fsi.cpp:1594-1634, `output_solid_boundary_vertices` below).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import real_dtype
from ..mesh.mesh import FACE_VERTICES
from .interp import interpolate_nodal, invert_bilinear
from .mpi_fsi import MPIFSI

# boundary edges of a z-order quad cell (vertex-index pairs)
_QUAD_EDGES = [(0, 1), (1, 3), (3, 2), (2, 0)]


def _polygon_area(pts):
    """Shoelace area of points ordered around their centroid."""
    if len(pts) < 3:
        return 0.0
    c = pts.mean(axis=0)
    ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
    p = pts[np.argsort(ang)]
    x, y = p[:, 0], p[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


class ControlVolumeFSI(MPIFSI):
    def __init__(self, fluid, solid, params, use_dirichlet_bc: bool = False):
        super().__init__(fluid, solid, params, use_dirichlet_bc)
        self._cv_bounds = None
        self._probe_point = None
        self.output_solid_boundary = False
        self.cv_history = []

    # -- reference API (include/cv_fsi.h:19-21) ------------------------
    def set_control_volume_boundary(self, x_in, x_out=None,
                                    y_low=None, y_top=None):
        """Accepts (x_in, x_out[, y_low, y_top]) or a single 4-list
        (reference passes [x_in, x_out, y_low, y_top]; boundaries[3] is the
        glottis centerline used for the solid tip, cv_fsi.cpp:1252)."""
        if x_out is None:
            x_in, x_out, y_low, y_top = x_in
        self._cv_bounds = (float(x_in), float(x_out))
        self._centerline_y = float(y_top) if y_top is not None else None

    def set_pressure_probe(self, point):
        self._probe_point = np.asarray(point, dtype=np.float64)

    def set_output_solid_boundary(self, flag: bool = True):
        self.output_solid_boundary = flag

    # ------------------------------------------------------------------
    def _setup_coupling(self):
        super()._setup_coupling()
        if self._cv_bounds is not None:
            self._setup_cv()

    def _cut_plane(self, x_plane, keep):
        """Cut all fluid cells straddling x = x_plane.

        Returns dict with cells (k,), endpoint unit coords + static
        interpolation tables, trapezoid weights (k,2) and kept volume
        fractions (k,) (keep='right' for the inlet cut, 'left' for the
        outlet; reference: compute_cut_points/compute_volume_fraction,
        source/cv_fsi.cpp:6-160)."""
        fluid = self.fluid
        mesh = fluid.mesh
        V = mesh.vertices
        cells = []
        segs = []
        fracs = []
        for c in range(mesh.n_cells):
            vx = V[mesh.cells[c], 0]
            left = vx <= x_plane
            if left.all() or (~left).all():
                continue
            cv = V[mesh.cells[c]]
            pts = []
            for a, b in _QUAD_EDGES:
                if left[a] != left[b]:
                    t = (x_plane - cv[a, 0]) / (cv[b, 0] - cv[a, 0])
                    pts.append(cv[a] + t * (cv[b] - cv[a]))
            if len(pts) != 2:
                continue
            pts = np.array(sorted(pts, key=lambda p: p[1]))
            keep_mask = (cv[:, 0] > x_plane) if keep == "right" else \
                (cv[:, 0] <= x_plane)
            poly = np.concatenate([cv[keep_mask], pts], axis=0)
            area = _polygon_area(cv)
            frac = _polygon_area(poly) / area if area > 0 else 0.0
            cells.append(c)
            segs.append(pts)
            fracs.append(frac)
        cells = np.asarray(cells, dtype=np.int64)
        if len(cells) == 0:
            return None
        segs = np.asarray(segs)                      # (k, 2, d)
        L = np.linalg.norm(segs[:, 1] - segs[:, 0], axis=-1)
        w = np.stack([L / 2, L / 2], axis=1)         # trapezoid

        # unit coordinates of the endpoints in their parent cells
        cv_all = jnp.asarray(V[mesh.cells[cells]].repeat(2, axis=0),
                             dtype=real_dtype())
        unit = np.asarray(invert_bilinear(
            jnp.asarray(segs.reshape(-1, 2), dtype=real_dtype()), cv_all))
        u_sh = fluid.u_space.shapes
        p_sh = fluid.p_space.shapes
        Nu, dNu = u_sh.evaluate(unit)                # (2k, nlu), (2k, nlu, d)
        Np_, _ = p_sh.evaluate(unit)
        # physical gradients via the geometry Jacobian at each endpoint
        from ..fe.shapes import QkShapes
        Ng, dNg = QkShapes(1, mesh.dim).evaluate(unit)
        J = np.einsum("nvd,nvx->ndx", dNg, np.asarray(cv_all))
        Jinv = np.linalg.inv(J)
        gu = np.einsum("nld,ndx->nlx", dNu, Jinv)
        k = len(cells)
        return dict(cells=cells, w=w, frac=np.asarray(fracs),
                    Nu=Nu.reshape(k, 2, -1), Np=Np_.reshape(k, 2, -1),
                    gu=gu.reshape(k, 2, gu.shape[1], -1))

    def _setup_cv(self):
        fluid = self.fluid
        mesh = fluid.mesh
        x_in, x_out = self._cv_bounds
        self._x_in, self._x_out = x_in, x_out

        # CV cells: ALL vertices strictly inside (x_in, x_out]
        # (reference: source/cv_fsi.cpp:315-341)
        vx = mesh.vertices[mesh.cells, 0]            # (n_c, nv)
        self._cv_cells = np.where(
            ((vx > x_in) & (vx <= x_out)).all(axis=1))[0]

        self._cut_in = self._cut_plane(x_in, keep="right")
        self._cut_out = self._cut_plane(x_out, keep="left")

        # Bernoulli streamline path: CV boundary cells hugging the glottis
        # centerline y_top (reference: source/cv_fsi.cpp:341-365, 436-500)
        self._path_cells = np.zeros(0, dtype=np.int64)
        self._bernoulli_ends = []
        if self._centerline_y is not None:
            cy = self._centerline_y
            centers = mesh.cell_centers()
            diam = mesh.cell_diameters()
            at_bdry = (mesh.boundary_id >= 0).any(axis=1)
            near = np.abs(centers[:, 1] - cy) < diam

            def bface_len(c):
                for f in range(2 * mesh.dim):
                    if mesh.boundary_id[c, f] >= 0:
                        vs = [int(mesh.cells[c, v])
                              for v in FACE_VERTICES[mesh.dim][f]]
                        return float(np.linalg.norm(
                            mesh.vertices[vs[1]] - mesh.vertices[vs[0]]))
                return 0.0

            sel = self._cv_cells[(at_bdry & near)[self._cv_cells]]
            self._path_cells = sel
            self._path_area_fraction = np.array(
                [bface_len(c) / _polygon_area(mesh.vertices[mesh.cells[c]])
                 for c in sel])
            # partially-cut start/end cells at the CV planes
            for cut, plane, kind in ((self._cut_in, x_in, "contraction"),
                                     (self._cut_out, x_out, "jet")):
                if cut is None:
                    continue
                for i, c in enumerate(cut["cells"]):
                    if not (at_bdry[c] and near[c]):
                        continue
                    vx = mesh.vertices[mesh.cells[c], 0]
                    left, right = vx.min(), vx.max()
                    frac = (right - plane) / (right - left) \
                        if kind == "contraction" else \
                        (plane - left) / (right - left)
                    af = bface_len(c) / _polygon_area(
                        mesh.vertices[mesh.cells[c]])
                    self._bernoulli_ends.append((int(c), frac * af, kind))

        if self._probe_point is not None:
            self._probe_jnp = jnp.asarray(self._probe_point[None, :],
                                          dtype=real_dtype())

    # ------------------------------------------------------------------
    def _cut_fields(self, cut, sol):
        """vel (k,2,d), pre (k,2), vel_grad (k,2,d,d), eddy (k,2) at the
        cut-segment endpoints."""
        fluid = self.fluid
        d = fluid.dim
        u = np.asarray(sol[:fluid.n_u]).reshape(-1, d)
        p = np.asarray(sol[fluid.n_u:])
        cu = fluid.u_space.cell_dofs[cut["cells"]]
        cp = fluid.p_space.cell_dofs[cut["cells"]]
        ul = u[cu]                                   # (k, nlu, d)
        vel = np.einsum("kel,kla->kea", cut["Nu"], ul)
        pre = np.einsum("kel,kl->ke", cut["Np"], p[cp])
        grad = np.einsum("kelx,kla->keax", cut["gu"], ul)
        tm = self._tm
        if tm is not None:
            ev = np.asarray(tm.eddy_viscosity_nodal)[cu]
            eddy = np.einsum("kel,kl->ke", cut["Nu"], ev)
        else:
            eddy = np.zeros(pre.shape)
        return vel, pre, grad, eddy

    def _surface_integrals(self, cut, sol):
        """Flux integrals over one cut plane (reference integrands:
        source/cv_fsi.cpp:627-653)."""
        rho = self.params.fluid_rho
        mu = self.params.viscosity
        if cut is None:
            return dict(volume_flow=0.0, pressure_force=0.0,
                        momentum_flux=0.0, KE_flux=0.0,
                        rate_pressure_work=0.0, rate_friction_work=0.0,
                        rate_turbulence_efflux=0.0)
        vel, pre, grad, eddy = self._cut_fields(cut, sol)
        w = cut["w"]
        u1 = vel[..., 0]

        def integ(q):
            return float((q * w).sum())

        return dict(
            volume_flow=integ(u1),
            pressure_force=integ(pre),
            momentum_flux=integ(rho * u1 * u1),
            KE_flux=integ(0.5 * rho * u1 * (vel ** 2).sum(-1)),
            rate_pressure_work=integ(pre * u1),
            rate_friction_work=integ(
                mu * np.einsum("kea,kea->ke", grad[..., 0], vel)),
            rate_turbulence_efflux=integ(
                eddy * np.einsum("kea,kea->ke", grad[..., 0], vel)))

    # ------------------------------------------------------------------
    def _volume_fields(self, cells, sol, prev):
        fluid = self.fluid
        d = fluid.dim
        u = np.asarray(sol[:fluid.n_u]).reshape(-1, d)
        up = np.asarray(prev[:fluid.n_u]).reshape(-1, d)
        p = np.asarray(sol[fluid.n_u:])
        pp = np.asarray(prev[fluid.n_u:])
        cu = fluid.u_space.cell_dofs[cells]
        cpd = fluid.p_space.cell_dofs[cells]
        N = fluid.cv_u.N
        g = fluid.cv_u.grad[cells]
        Np = fluid.cv_p.N
        gp = fluid.cv_p.grad[cells]
        JxW = fluid.cv_u.JxW[cells]
        F = dict(
            uq=np.einsum("ql,cla->cqa", N, u[cu]),
            uq_prev=np.einsum("ql,cla->cqa", N, up[cu]),
            G=np.einsum("cqlx,cla->cqax", g, u[cu]),
            pq=np.einsum("qn,cn->cq", Np, p[cpd]),
            pq_prev=np.einsum("qn,cn->cq", Np, pp[cpd]),
            gpq=np.einsum("cqnx,cn->cqx", gp, p[cpd]),
            JxW=JxW)
        # nodal-stress divergence (for the stabilization residual,
        # reference: source/cv_fsi.cpp:941-959)
        sl = np.asarray(self.fluid.stress_device)[cu]     # (c, nlu, d, d)
        F["stress_div"] = np.einsum("cqlx,clax->cqa", g, sl)
        if self._tm is not None:
            ev = np.asarray(self._tm.eddy_viscosity_nodal)[cu]
            F["eddy"] = np.einsum("ql,cl->cq", N, ev)
        else:
            F["eddy"] = np.zeros(JxW.shape)
        return F

    def _volume_integrals(self, cells, fracs, sol, prev, out):
        """reference integrands: source/cv_fsi.cpp:797-1015."""
        if len(cells) == 0:
            return
        fluid = self.fluid
        params = self.params
        rho, mu = params.fluid_rho, params.viscosity
        dt = self.time.get_delta_t()
        F = self._volume_fields(cells, sol, prev)
        uq, up, G, pq, pqp, gpq, JxW = (F["uq"], F["uq_prev"], F["G"],
                                        F["pq"], F["pq_prev"], F["gpq"],
                                        F["JxW"])
        eddy = F["eddy"]
        divu = np.trace(G, axis1=2, axis2=3)
        fr = np.asarray(fracs)[:, None]

        def integ(q):
            return float((q * JxW * fr).sum())

        out["rate_momentum"] += integ(rho * (uq[..., 0] - up[..., 0]) / dt)
        out["previous_KE"] += integ(0.5 * rho * (up ** 2).sum(-1))
        out["present_KE"] += integ(0.5 * rho * (uq ** 2).sum(-1))
        out["rate_kinetic_energy_direct"] += integ(
            rho * np.einsum("cqa,cqa->cq", (uq - up) / dt, uq))
        # deal.II convention: vel_grad * u * u = ((grad u)^T u) . u
        uTG = np.einsum("cqa,cqax->cqx", uq, G)
        out["convective_KE"] += integ(
            rho * np.einsum("cqx,cqx->cq", uTG, uq))
        out["pressure_convection"] += integ(
            np.einsum("cqx,cqx->cq", gpq, uq))
        out["rate_dissipation"] += integ(mu * (G ** 2).sum((2, 3)))
        out["rate_compression_work"] += integ(pq * divu)
        out["rate_turbulence"] += integ(eddy * (G ** 2).sum((2, 3)))

        # SUPG/LSIC stabilization rate (reference: cv_fsi.cpp:846-938);
        # uses the solver's h heuristic on the CURRENT velocity
        if hasattr(fluid, "_h_terms"):
            h_sum = 0.0
            for (l, w_, kind) in fluid._h_terms:
                gq = (np.asarray(fluid.gu)[cells][:, :, l, :] if kind == "u"
                      else np.asarray(fluid.gp)[cells][:, :, l, :])
                h_sum = h_sum + w_ * np.abs(
                    np.einsum("cqx,cqx->cq", uq, gq))
            v_norm = np.linalg.norm(uq, axis=-1)
            nu_eff = (mu + eddy) / rho
            with np.errstate(divide="ignore", invalid="ignore"):
                h = np.where(h_sum > 0, 2 * v_norm / h_sum, 0.0)
                tau_s = np.where(
                    h > 0,
                    1.0 / np.sqrt((2 / dt) ** 2 + (2 * v_norm /
                                                   np.where(h > 0, h, 1)) ** 2
                                  + (4 * nu_eff /
                                     np.where(h > 0, h, 1) ** 2) ** 2),
                    dt / 2)
                re_loc = v_norm * h / (2 * nu_eff)
            z = np.where(re_loc <= 3, re_loc / 3, 1.0)
            tau_l = h / 2 * v_norm * z
            sdiv = F["stress_div"] * ((mu + eddy) / mu)[..., None]
            mom_res = (rho * ((uq - up) / dt + uTG) + gpq - sdiv)
            from ..solvers.fluid.supg import ATM, CP_TO_CV
            cont_res = ((pq - pqp) / dt + CP_TO_CV * (ATM + pq) * divu +
                        np.einsum("cqx,cqx->cq", uq, gpq)) / ATM
            # tau_SUPG * (u . grad-row of the test) . mom_res with the
            # deal.II contraction u * G = (grad u)^T u
            supg = tau_s * np.einsum("cqx,cqx->cq",
                                     np.einsum("cqa,cqax->cqx", uq, G),
                                     mom_res)
            out["rate_stabilization"] += integ(
                supg + tau_l * rho * divu * cont_res)

        out["max_velocity"] = max(
            out.get("max_velocity", 0.0),
            float(np.linalg.norm(uq, axis=-1).max()))

        # gap volume flow at the solid tip (reference: cv_fsi.cpp:983-1007)
        tip = out.get("_solid_tip_x")
        if tip is not None:
            mesh = fluid.mesh
            vxs = mesh.vertices[mesh.cells[cells], 0]
            strad = (vxs.min(axis=1) <= tip) & (vxs.max(axis=1) > tip)
            if strad.any():
                xdist = vxs.max(axis=1) - vxs.min(axis=1)
                flow = (uq[..., 0] * JxW).sum(axis=1)
                out["gap_volume_flow"] += float(
                    (flow[strad] / xdist[strad]).sum())

    # ------------------------------------------------------------------
    def control_volume_analysis(self):
        """reference: source/cv_fsi.cpp:549-1015 (see module doc)."""
        fluid, solid = self.fluid, self.solid
        params = self.params
        d = fluid.dim
        dt = self.time.get_delta_t()
        sol = fluid.present_solution
        prev = sol - fluid.solution_increment

        out = {"rate_momentum": 0.0, "previous_KE": 0.0, "present_KE": 0.0,
               "rate_kinetic_energy_direct": 0.0, "convective_KE": 0.0,
               "pressure_convection": 0.0, "rate_dissipation": 0.0,
               "rate_compression_work": 0.0, "rate_stabilization": 0.0,
               "rate_turbulence": 0.0, "gap_volume_flow": 0.0,
               "rate_friction_work": 0.0, "rate_turbulence_efflux": 0.0}

        ins = self._surface_integrals(self._cut_in, sol)
        outs = self._surface_integrals(self._cut_out, sol)
        out["inlet_volume_flow"] = ins["volume_flow"]
        out["inlet_pressure_force"] = ins["pressure_force"]
        out["momentum_inlet_flux"] = ins["momentum_flux"]
        out["energy_inlet_flux"] = ins["KE_flux"]
        out["inlet_pressure_work"] = ins["rate_pressure_work"]
        out["outlet_volume_flow"] = outs["volume_flow"]
        out["outlet_pressure_force"] = outs["pressure_force"]
        out["momentum_outlet_flux"] = outs["momentum_flux"]
        out["energy_outlet_flux"] = outs["KE_flux"]
        out["outlet_pressure_work"] = outs["rate_pressure_work"]
        # friction work / turbulence efflux: -inlet +outlet
        # (reference: source/cv_fsi.cpp:728-748)
        out["rate_friction_work"] += (outs["rate_friction_work"] -
                                      ins["rate_friction_work"])
        out["rate_turbulence_efflux"] += (outs["rate_turbulence_efflux"] -
                                          ins["rate_turbulence_efflux"])

        # solid tip (for the gap flow; reference: cv_fsi.cpp:1252-1274)
        moved = np.asarray(solid.moved_vertex_coords())
        if self._centerline_y is not None:
            tip_i = np.argmin(np.abs(moved[:, 1] - self._centerline_y))
            out["_solid_tip_x"] = float(moved[tip_i, 0])
        else:
            out["_solid_tip_x"] = None

        # volume integrals: full CV cells + fraction-weighted cut cells,
        # skipping artificial (indicator != 0) cells
        # (reference: source/cv_fsi.cpp:1034-1066)
        indic = np.asarray(fluid.indicator)
        cvc = self._cv_cells[indic[self._cv_cells] == 0]
        self._volume_integrals(cvc, np.ones(len(cvc)), sol, prev, out)
        for cut in (self._cut_in, self._cut_out):
            if cut is None:
                continue
            keep = indic[cut["cells"]] == 0
            self._volume_integrals(cut["cells"][keep], cut["frac"][keep],
                                   sol, prev, out)
        out["rate_kinetic_energy"] = (out["present_KE"] -
                                      out["previous_KE"]) / dt

        # deformed solid (VF) volume (reference: cv_fsi.cpp:1068-1078)
        sv = moved[solid.mesh.cells]                  # (n_c, 4, d)
        x1, y1 = sv[:, 0, 0], sv[:, 0, 1]
        areas = []
        for c in range(len(sv)):
            areas.append(_polygon_area(sv[c]))
        out["VF_volume"] = float(np.sum(areas))

        # interface (VF) integrals on the moved solid boundary
        if hasattr(solid, "_face_geometry"):
            JxWf, normals = solid._face_geometry(solid.moved_vertex_coords())
            normals = np.asarray(normals * solid._face_orient[:, None, None])
            JxWf = np.asarray(JxWf)
            fq = np.einsum(
                "fqv,fvd->fqd",
                self._solid_face_geo_N(), moved[np.asarray(
                    self._solid_bface_verts)])
            pts = jnp.asarray(fq.reshape(-1, d), dtype=real_dtype())
            idx, unit, found = self._fluid_locate(self._fluid_hash_state,
                                                  pts)
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
            u_nodal = np.asarray(sol[:fluid.n_u]).reshape(-1, d)
            u_at = np.asarray(interpolate_nodal(
                jnp.asarray(u_nodal), jnp.asarray(fluid.u_space.cell_dofs,
                                                  dtype=jnp.int32),
                idx, unit, params.fluid_velocity_degree, found)).reshape(
                JxWf.shape + (d,))
            out["VF_drag"] = float((p_at * normals[..., 0] * JxWf).sum())
            fric = np.einsum("fqij,fqj->fqi", tau_at, normals)
            out["VF_friction"] = float((fric[..., 0] * JxWf).sum())
            out["rate_friction_work"] += float(
                (np.einsum("fqi,fqi->fq", fric, u_at) * JxWf).sum())
            out["rate_vf_work"] = float(
                (p_at * np.einsum("fqi,fqi->fq", u_at, normals) *
                 JxWf).sum())

        if self._probe_point is not None:
            idx, unit, found = self._fluid_locate(self._fluid_hash_state,
                                                  self._probe_jnp)
            out["probed_pressure"] = float(interpolate_nodal(
                sol[fluid.n_u:], jnp.asarray(fluid.p_space.cell_dofs,
                                             dtype=jnp.int32),
                idx, unit, params.fluid_pressure_degree, found)[0])

        if self._centerline_y is not None:
            self._bernoulli_terms(out, sol, prev, moved)

        out.pop("_solid_tip_x", None)
        out["time"] = self.time.current()
        self.cv_history.append(out)
        self._write_cv_output(out)
        return out

    def _bernoulli_terms(self, out, sol, prev, moved):
        """Bernoulli head decomposition along the glottis streamline path
        (reference: source/cv_fsi.cpp:1245-1590; 'half space' assumption).
        Contraction/jet regions split at the solid tip; per-cell volume
        integrals are converted to line averages by the boundary-face /
        cell-area fraction and the gap_tolerance = 0.0045 is the
        reference's hard-coded value."""
        fluid, params = self.fluid, self.params
        rho, mu = params.fluid_rho, params.viscosity
        dt = self.time.get_delta_t()
        cy = self._centerline_y
        gap_tol = 0.0045
        from ..solvers.fluid.supg import ATM

        i_high = int(np.argmin(np.abs(moved[:, 1] - cy)))
        highest_y = moved[i_high, 1]
        high = moved[np.abs(moved[:, 1] - highest_y) < gap_tol]
        if abs(highest_y - cy) < gap_tol:
            ce_x = float(high[:, 0].min())
            js_x = float(high[:, 0].max())
        else:
            ce_x = js_x = float(moved[i_high, 0])
        out["contraction_end_x"] = ce_x
        out["jet_start_x"] = js_x
        keys = ["rate_convection", "rate_pressure_grad", "acceleration",
                "rate_density", "rate_friction"]
        for k in keys:
            out[f"{k}_contraction"] = 0.0
            out[f"{k}_jet"] = 0.0
        if len(self._path_cells) == 0 and not self._bernoulli_ends:
            return

        mesh = fluid.mesh

        def cell_heads(cells):
            """Per-cell integrals of the five head terms (n_cells,)."""
            if len(cells) == 0:
                return np.zeros((5, 0))
            F = self._volume_fields(cells, sol, prev)
            uq, up, pq, gpq, JxW = (F["uq"], F["uq_prev"], F["pq"],
                                    F["gpq"], F["JxW"])
            eddy = F["eddy"]
            d = fluid.dim
            cu = fluid.u_space.cell_dofs[cells]
            g = fluid.cv_u.grad[cells]
            # gradient of the PREVIOUS velocity (cv_fsi.cpp:1460-1461)
            upn = np.asarray(prev[:fluid.n_u]).reshape(-1, d)
            Gp = np.einsum("cqlx,cla->cqax", g, upn[cu])
            # nodal-stress gradients
            sl = np.asarray(fluid.stress_device)[cu]
            gS = np.einsum("cqlx,clab->cqabx", g, sl)
            conv = np.einsum("cqa,cqa->cq", uq, Gp[:, :, 0, :])
            acc = (uq[..., 0] - up[..., 0]) / dt
            phead = gpq[..., 0] / rho
            dens = pq / rho / (ATM + 2 * pq) * gpq[..., 0]
            scale = (mu + eddy) / (rho * mu)
            fric = (sum(gS[:, :, 0, dd, dd] for dd in range(d))
                    - gS[:, :, 1, 1, 0]) * scale
            if d == 3:
                fric = fric - gS[:, :, 2, 2, 0] * scale
            return np.stack([
                (conv * JxW).sum(1), (phead * JxW).sum(1),
                (acc * JxW).sum(1), (dens * JxW).sum(1),
                (fric * JxW).sum(1)])

        cells = self._path_cells
        if len(cells):
            vx = mesh.vertices[mesh.cells[cells], 0]
            in_c = (vx <= ce_x).all(axis=1)
            in_j = (vx > js_x).all(axis=1)
            heads = cell_heads(cells) * self._path_area_fraction[None, :]
            for region, mask in (("contraction", in_c), ("jet", in_j)):
                for k, key in enumerate(keys):
                    out[f"{key}_{region}"] += float(heads[k][mask].sum())
        for c, weight, kind in self._bernoulli_ends:
            h = cell_heads(np.array([c]))[:, 0] * weight
            region = "contraction" if kind == "contraction" else "jet"
            for k, key in enumerate(keys):
                out[f"{key}_{region}"] += float(h[k])

    def output_solid_boundary_vertices(self):
        """Per-step boundary trace for POD post-processing: one file per
        step with 'vertex-id  deformed-position  fluid-pressure' lines
        (reference: source/cv_fsi.cpp:1594-1634)."""
        import os
        solid = self.solid
        os.makedirs("solid_trace", exist_ok=True)
        moved = np.asarray(solid.moved_vertex_coords())
        bfv = np.asarray(solid._bface_verts)
        vids = np.unique(bfv)
        pn = np.asarray(getattr(solid, "fluid_pressure_nodal",
                                np.zeros(len(moved))))
        fname = f"solid_trace/BoundaryTrace-{self.time.get_timestep():06d}"
        with open(fname, "w") as f:
            for v in vids:
                pos = " ".join(f"{x:.10g}" for x in moved[v])
                f.write(f"{v} {pos} {pn[v]:.10g}\n")

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
        tm = getattr(self.fluid, "turbulence_model", None)
        if tm is not None and not hasattr(tm, "space"):
            tm.setup()
        self._setup_coupling()

        first_step = True
        while self.time.end() - self.time.current() > 1e-12:
            self.find_solid_bc()
            if self.penetration_criterion is not None:
                self.apply_contact_model(first_step)
            else:
                self.solid.run_one_step(first_step)
            self.update_solid_box_and_indicator()
            if self._tm is not None:
                self._tm.update_boundary_condition(first_step)
            zero_ext, nonzero_ext = self.find_fluid_bc(first_step)
            if self._tm is not None:
                self._tm.run_one_step(True)
            self._run_fluid_step(zero_ext, nonzero_ext, verbose)
            first_step = False
            self.time.increment()
            if self._cv_bounds is not None:
                self.control_volume_analysis()
            if self.output_solid_boundary:
                self.output_solid_boundary_vertices()
            if self.time.time_to_refine():
                # interface refinement; _setup_coupling (called inside)
                # rebuilds the CV cell lists and surface cutters on the new
                # mesh (reference: source/cv_fsi.cpp:269-273)
                gr = params.global_refinements[0]
                self.refine_mesh(gr, gr + 3, verbose=verbose)
            if self.time.time_to_save():
                self.save_checkpoint()  # reference: cv_fsi.cpp:275-279
