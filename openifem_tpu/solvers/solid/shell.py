"""Flat-shell solid solver (static membrane + Mindlin plate).

Reference: include/shell_solid_solver.h, source/shell_solid_solver.cpp — a
wrapper over the external optional `shell-element` (libMesh) flat-shell
library (OPENIFEM_WITH_shell-element, off by default).  This is a native
replacement with the same role: a STATIC flat-shell solve on a 2D
triangulation embedded in 3D (dim=2, spacedim=3), exposing a 3-component
nodal displacement field like SolidSolver<2,3>.

Formulation: for a planar mesh, the flat shell decouples into
 - membrane: plane stress on the in-plane displacements (u1, u2)
 - bending: Mindlin-Reissner plate (w, beta1, beta2) with full 2x2
   integration of bending and reduced 1x1 integration of transverse shear
   (the standard selective-reduced-integration cure for shear locking).
Five local dofs per node; rotations stay internal and the public field is
the global displacement u = u1 e1 + u2 e2 + w n (the reference's libMesh
wrapper likewise keeps drilling/rotation dofs private,
include/shell_solid_solver.h:91-99).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ...config import real_dtype
from ...fe.fevalues import cell_values
from ...fe.space import FESpace
from ...la.constraints import Constraints
from ...la.krylov import cg
from ...la.operators import element_diag, element_matvec
from ...mesh.mesh import Mesh
from ...parameters import AllParameters, component_flag_to_mask


class ShellSolidSolver:
    shear_correction = 5.0 / 6.0

    def __init__(self, mesh3d, params: AllParameters, thickness: float = 0.1):
        """mesh3d: a Mesh with dim=2 cells whose vertices carry 3D
        coordinates lying in a plane (the reference converts the deal.II
        Triangulation<2,3> the same way, source/shell_solid_solver.cpp:83-131).
        """
        self.mesh3d = mesh3d
        self.params = params
        self.thickness = thickness
        self.surface_load = None
        self._setup_done = False

    def set_surface_load(self, fn: Callable):
        """fn(points (n,3)) -> (n,3) force per unit area."""
        self.surface_load = fn

    # ------------------------------------------------------------------
    def setup(self):
        params = self.params
        V3 = np.asarray(self.mesh3d.vertices, dtype=np.float64)
        if V3.shape[1] == 2:
            V3 = np.concatenate([V3, np.zeros((len(V3), 1))], axis=1)
        # plane frame from the first cell
        c0 = self.mesh3d.cells[0]
        e1 = V3[c0[1]] - V3[c0[0]]
        e1 /= np.linalg.norm(e1)
        t2 = V3[c0[2]] - V3[c0[0]]
        n = np.cross(e1, t2)
        n /= np.linalg.norm(n)
        e2 = np.cross(n, e1)
        self.frame = np.stack([e1, e2, n])  # rows: local axes
        origin = V3[c0[0]]
        local = (V3 - origin) @ self.frame.T
        assert np.abs(local[:, 2]).max() < 1e-9 * (1 + np.abs(local).max()), \
            "shell mesh must be planar"
        self._origin = origin
        self._V3 = V3

        mesh2 = Mesh(dim=2, vertices=local[:, :2],
                     cells=self.mesh3d.cells,
                     material_id=self.mesh3d.material_id,
                     boundary_id=self.mesh3d.boundary_id)
        self.mesh2 = mesh2
        self.space = FESpace(mesh2, params.solid_degree)
        self.cv = cell_values(self.space, params.solid_degree + 1)
        self.cv1 = cell_values(self.space, 1)  # reduced (1-point) rule
        n_nodes = self.space.n_nodes
        self.n_nodes = n_nodes
        ndof = 5 * n_nodes
        self.n_dofs = ndof

        E, nu = params.E[0], params.nu[0]
        t = self.thickness
        # plane-stress matrix (Voigt: xx, yy, xy)
        C = (E / (1 - nu ** 2)) * np.array(
            [[1, nu, 0], [nu, 1, 0], [0, 0, (1 - nu) / 2]])
        G = E / (2 * (1 + nu))
        Db = C * t ** 3 / 12.0
        Cm = C * t
        ks = self.shear_correction * G * t

        cvf, cvr = self.cv, self.cv1
        n_c, n_q, nl, _ = cvf.grad.shape

        # local dof layout per node: [u1, u2, w, b1, b2]
        def B_membrane(g):
            # Voigt strain from (u1,u2): rows 3, cols nl*5
            nloc = g.shape[2]
            B = np.zeros(g.shape[:2] + (3, nloc * 5))
            B[:, :, 0, 0::5] = g[..., 0]
            B[:, :, 1, 1::5] = g[..., 1]
            B[:, :, 2, 0::5] = g[..., 1]
            B[:, :, 2, 1::5] = g[..., 0]
            return B

        def B_bending(g):
            nloc = g.shape[2]
            B = np.zeros(g.shape[:2] + (3, nloc * 5))
            B[:, :, 0, 3::5] = g[..., 0]     # b1,1
            B[:, :, 1, 4::5] = g[..., 1]     # b2,2
            B[:, :, 2, 3::5] = g[..., 1]
            B[:, :, 2, 4::5] = g[..., 0]
            return B

        def B_shear(g, N):
            nloc = g.shape[2]
            B = np.zeros(g.shape[:2] + (2, nloc * 5))
            B[:, :, 0, 2::5] = g[..., 0]     # w,1
            B[:, :, 0, 3::5] = -N[None, :, :]
            B[:, :, 1, 2::5] = g[..., 1]     # w,2
            B[:, :, 1, 4::5] = -N[None, :, :]
            return B

        Bm = B_membrane(cvf.grad)
        Bb = B_bending(cvf.grad)
        K = (np.einsum("cqia,ij,cqjb,cq->cab", Bm, Cm, Bm, cvf.JxW,
                       optimize=True) +
             np.einsum("cqia,ij,cqjb,cq->cab", Bb, Db, Bb, cvf.JxW,
                       optimize=True))
        Bs = B_shear(cvr.grad, cvr.N)
        K = K + ks * np.einsum("cqia,cqib,cq->cab", Bs, Bs, cvr.JxW,
                               optimize=True)
        self.K_loc = jnp.asarray(K, dtype=real_dtype())

        cd = self.space.cell_dofs
        self.cell_dofs = jnp.asarray(
            (cd[:, :, None] * 5 + np.arange(5)[None, None, :]).reshape(
                n_c, -1), dtype=jnp.int32)

        # Dirichlet: translation flags map through the frame; any constrained
        # translation also clamps the rotations (flat-plate convention)
        dmask = np.zeros(ndof, dtype=bool)
        bmap = self.space.boundary_node_map()
        for bid, flag in params.solid_dirichlet_bcs.items():
            if bid not in bmap:
                continue
            gmask = np.array(component_flag_to_mask(flag, 3))
            # local translation directions affected
            lmask = (np.abs(self.frame) @ gmask.astype(float)) > 1e-12
            for nd in bmap[bid]:
                base = nd * 5
                if lmask[0]:
                    dmask[base + 0] = True
                if lmask[1]:
                    dmask[base + 1] = True
                if lmask[2]:
                    dmask[base + 2] = True
                    dmask[base + 3] = True
                    dmask[base + 4] = True
        self.constraints = Constraints(ndof, dirichlet_mask=dmask)

        # rhs: surface load (and prm Neumann pressure as transverse load)
        rhs = np.zeros(ndof)
        load = np.zeros((n_c, n_q, 3))
        if self.surface_load is not None:
            pts3 = (cvf.xq.reshape(-1, 2) @ self.frame[:2] + self._origin)
            load = np.asarray(self.surface_load(pts3)).reshape(n_c, n_q, 3)
        # project to local frame
        lload = np.einsum("cqg,lg->cql", load, self.frame)
        for k, comp in enumerate((0, 1, 2)):
            rl = np.einsum("qi,cq,cq->ci", cvf.N, lload[..., k], cvf.JxW)
            np.add.at(rhs, self.space.cell_dofs.ravel() * 5 + comp,
                      rl.ravel())
        self.rhs = jnp.asarray(rhs, dtype=real_dtype())

        cons = self.constraints
        op = cons.wrap_operator(lambda x: element_matvec(
            self.K_loc, self.cell_dofs, ndof, x))
        diag = jnp.where(cons.fixed, 1.0, element_diag(
            self.K_loc, self.cell_dofs, ndof))
        dinv = jnp.where(diag != 0, 1.0 / diag, 1.0)
        self._solve = jax.jit(lambda b, atol: cg(
            op, b, M=lambda r: r * dinv, atol=atol, maxiter=20 * ndof))
        self._setup_done = True

    # ------------------------------------------------------------------
    def run(self):
        """Static solve (the reference's shell solver is static,
        run_one_step is empty: source/shell_solid_solver.cpp:81)."""
        if not self._setup_done:
            self.setup()
        cons = self.constraints
        b = cons.condense_rhs(self.rhs)
        res = self._solve(b, 1e-10 * jnp.linalg.norm(b))
        d = cons.distribute(res.x)
        self.local_solution = d
        dl = np.asarray(d).reshape(-1, 5)
        # global displacement field (3 comps/node)
        ug = dl[:, 0:1] * self.frame[0][None, :] + \
            dl[:, 1:2] * self.frame[1][None, :] + \
            dl[:, 2:3] * self.frame[2][None, :]
        self.current_displacement = jnp.asarray(ug.reshape(-1),
                                                dtype=real_dtype())
        self.rotations = dl[:, 3:5]
        return self.current_displacement

    def get_current_solution(self):
        return self.current_displacement
