"""Geometric multigrid V-cycle preconditioner on refine_global hierarchies.

The reference preconditions its pressure mass-Schur and velocity blocks with
ILU / direct factorizations (source/insim.cpp:69-127, MUMPS/UMFPACK) whose
iteration counts are mesh-independent; the TPU build replaces those with
Krylov inner solves whose iteration counts grow ~1/h under refinement
(measured: Sm-CG 117 -> 253 iterations from refine=2 -> 3 on the Turek
cylinder).  This module restores mesh-independence the TPU-native way:

- a geometric V-cycle over the nested meshes produced by
  ``Mesh.refine_global`` (children are emitted per parent with ``family`` /
  ``child_index`` recorded, so prolongation tables are exact topology, no
  geometric search);
- Chebyshev(k) smoothing on the Jacobi-scaled operator — no dot products,
  so every smoothing sweep is a fixed chain of element-batched matvecs
  (gather -> (n_c, nl, nl) einsum -> scatter-add), the shape XLA fuses and
  the MXU likes;
- a dense coarse solve: the level-0 matrix is assembled and inverted on the
  host at setup (a few hundred dofs) and applied as one small matmul.

Everything the V-cycle closes over is a static array, so the whole cycle
jits into the surrounding Krylov loop.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..fe.fevalues import cell_values
from ..fe.space import FESpace
from ..la.operators import element_matvec, element_matvec_nodeblock


# ----------------------------------------------------------------------
# prolongation tables
# ----------------------------------------------------------------------

def prolongation_table(coarse_space: FESpace, fine_space: FESpace):
    """Interpolation table from coarse nodes to fine nodes.

    Requires fine_space.mesh = coarse_space.mesh.refine_global(1) (children
    carry family = parent cell id and child_index = z-order quadrant).

    Returns (cells (n_fine,), weights (n_fine, nl_coarse)): fine node value
    = sum_l weights[f, l] * x_coarse[coarse_cell_dofs[cells[f], l]].  Exact
    for nested Q1/Q2 spaces (unit-space embedding)."""
    fm, cm = fine_space.mesh, coarse_space.mesh
    dim = fm.dim
    assert np.all(fm.family >= 0) and np.all(fm.child_index >= 0), \
        "fine mesh must be a full refinement recording parents"
    # A PARTIAL refine() of a mesh whose cells all already carry family
    # records would pass the check above but map unrefined cells to wrong
    # parents below.  Require an actual full refinement: exact cell count
    # and every parent covered by exactly 2**dim children.
    assert fm.n_cells == cm.n_cells * 2 ** dim, \
        "fine mesh is not a full refinement of the coarse mesh"
    counts = np.bincount((fm.family - fm.family.min()).astype(np.int64),
                         minlength=cm.n_cells)
    assert len(counts) == cm.n_cells and np.all(counts == 2 ** dim), \
        "fine mesh families do not cover every coarse cell 2**dim times"
    n_fine = fine_space.n_nodes
    nl = fine_space.cell_dofs.shape[1]
    local = fine_space.shapes.local_nodes()          # (nl, dim) unit coords

    # first (cell, local) occurrence of each fine node
    cell_of = np.zeros(n_fine, dtype=np.int64)
    loc_of = np.zeros(n_fine, dtype=np.int64)
    flat = fine_space.cell_dofs.reshape(-1)
    order = np.arange(len(flat) - 1, -1, -1)         # reversed: first wins
    cell_of[flat[order]] = order // nl
    loc_of[flat[order]] = order % nl

    # z-order child offset within the parent unit cell
    ci = fm.child_index[cell_of].astype(np.int64)    # (n_fine,)
    offs = np.stack([(ci >> d) & 1 for d in range(dim)], axis=-1)
    unit_parent = (offs + local[loc_of]) * 0.5       # (n_fine, dim)

    # family id = fam_base + parent index for a full refine
    # (mesh.py:_refine_2d/_refine_3d assign fam_base + c to cell c's
    # children), so subtracting the minimum recovers the parent index
    parent = (fm.family[cell_of] - fm.family.min()).astype(np.int64)
    assert parent.max() < cm.n_cells
    # W[i, l] = N_l(unit_parent[i]) — evaluate() is per-row in points
    W, _ = coarse_space.shapes.evaluate(unit_parent)
    return parent, W


def geometric_prolongation_table(coarse_space: FESpace,
                                 fine_space: FESpace, tol: float = 1e-9):
    """(cells, W) like prolongation_table, but located geometrically via
    the uniform-grid cell hash — valid for ANY coarse/fine mesh pair whose
    fine nodes lie inside the coarse mesh, e.g. locally refined
    (hanging-node) meshes where the exact-topology tables don't apply."""
    import jax.numpy as jnp_  # local: host-side setup only

    from ..config import real_dtype
    from ..fsi.interp import make_cell_hash, plan_cell_hash

    cm = coarse_space.mesh
    verts = cm.vertices[cm.cells]
    dims, span, K = plan_cell_hash(verts, tol=tol)
    build, locate = make_cell_hash(cm.n_cells, dims, span, K, tol=tol)
    pts = jnp_.asarray(fine_space.node_points, dtype=real_dtype())
    idx, unit, found = locate(build(jnp_.asarray(verts,
                                                 dtype=real_dtype())), pts)
    assert bool(jnp_.all(found)), \
        "fine node outside the coarse mesh (non-nested hierarchy)"
    W, _ = coarse_space.shapes.evaluate(np.asarray(unit))
    return np.asarray(idx, dtype=np.int64), W


def node_injection_table(coarse_space: FESpace, fine_space: FESpace):
    """For each coarse node, the fine node at the same support point.

    Valid for nested refine_global levels of the same Q_k space: every
    coarse support point (vertex, edge midpoint, cell center) is a fine
    node.  Used to restrict fixed-dof masks (and nodal fields) exactly."""
    cm, fm = coarse_space.mesh, fine_space.mesh
    dim = cm.dim
    nchild = 2 ** dim
    parent = (fm.family - fm.family.min()).astype(np.int64)
    child_cell = np.full((cm.n_cells, nchild), -1, dtype=np.int64)
    child_cell[parent, fm.child_index.astype(np.int64)] = \
        np.arange(fm.n_cells)
    assert (child_cell >= 0).all()

    local = coarse_space.shapes.local_nodes()        # (nl, dim)
    flocal = fine_space.shapes.local_nodes()
    inj = np.full(coarse_space.n_nodes, -1, dtype=np.int64)
    for l, u in enumerate(local):
        offs = (u > 0.5).astype(np.int64)            # child quadrant bits
        k = int(sum(offs[d] << d for d in range(dim)))
        uc = 2.0 * u - offs                          # unit coords in child
        fl = int(np.argmin(np.abs(flocal - uc).sum(axis=1)))
        assert np.abs(flocal[fl] - uc).max() < 1e-12
        inj[coarse_space.cell_dofs[:, l]] = \
            fine_space.cell_dofs[child_cell[:, k], fl]
    assert (inj >= 0).all()
    return inj


# ----------------------------------------------------------------------
# levels
# ----------------------------------------------------------------------

class MGLevel:
    """One level: element operator blocks + smoother data."""

    def __init__(self, space: FESpace, A_loc: np.ndarray,
                 fixed: np.ndarray, dtype, cell_dofs=None, ncomp: int = 1):
        self.space = space
        cd_np = np.asarray(cell_dofs if cell_dofs is not None
                           else space.cell_dofs)
        self.n = len(np.asarray(fixed))
        self.ncomp = ncomp
        self.cell_dofs = jnp.asarray(cd_np, dtype=jnp.int32)
        if ncomp > 1:   # node-block layout (half/third the index traffic)
            nl = cd_np.shape[1] // ncomp
            self.cell_nodes = jnp.asarray(space.cell_dofs, dtype=jnp.int32)
            self.A_block = jnp.asarray(
                np.asarray(A_loc).reshape(-1, nl, ncomp, nl, ncomp),
                dtype=dtype)
        fixed = np.asarray(fixed, dtype=bool)
        self.fixed = jnp.asarray(fixed)
        # keep a HOST copy for setup-time work (_host_matvec power
        # iteration, coarse assembly): np.asarray on a device array would
        # round-trip device->host on every use
        self._A_np = np.asarray(A_loc, dtype=np.float64)
        self._fixed_np = fixed
        # identity rows/cols on fixed dofs (matches the wrapped fine op)
        self.A_loc = jnp.asarray(A_loc, dtype=dtype)
        self._cd_np = cd_np

        # Jacobi diagonal
        diag = np.zeros(self.n)
        nl = cd_np.shape[1]
        dloc = self._A_np[:, np.arange(nl), np.arange(nl)]
        np.add.at(diag, cd_np.reshape(-1), dloc.reshape(-1))
        diag[fixed] = 1.0
        diag[diag == 0] = 1.0
        self.dinv = jnp.asarray(1.0 / diag, dtype=dtype)

        # lambda_max(D^-1 A) by power iteration (host, setup-time)
        x = np.random.default_rng(0).standard_normal(self.n)
        x[fixed] = 0.0
        lam = 1.0
        for _ in range(15):
            nrm = np.linalg.norm(x)
            if nrm == 0.0:       # degenerate (all dofs fixed) level
                lam = 1.0
                break
            x = x / nrm
            y = self._host_matvec(x)
            y = y / diag
            y[fixed] = 0.0
            lam = float(x @ y)
            x = y
        self.lam_max = 1.1 * max(lam, 1e-12)

    def _host_matvec(self, x):
        cd = self._cd_np
        xl = x[cd]                                   # (n_c, nl)
        yl = np.einsum("clm,cm->cl", self._A_np, xl)
        y = np.zeros(self.n)
        np.add.at(y, cd.reshape(-1), yl.reshape(-1))
        y[self._fixed_np] = x[self._fixed_np]
        return y

    def matvec(self, x):
        if self.ncomp > 1:
            y = element_matvec_nodeblock(self.A_block, self.cell_nodes,
                                         self.n // self.ncomp, x)
        else:
            y = element_matvec(self.A_loc, self.cell_dofs, self.n, x)
        return jnp.where(self.fixed, x, y)

    def chebyshev(self, b, x, degree: int, x_is_zero: bool = False):
        """degree Chebyshev iterations on D^-1 A targeting
        [lam_max/4, lam_max] (the smoothing range); no dot products.
        x_is_zero skips the initial residual matvec (pre-smoothing)."""
        lmax = self.lam_max
        lmin = lmax / 4.0
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)
        sigma = theta / delta
        rho = 1.0 / sigma
        r = b if x_is_zero else b - self.matvec(x)
        z = self.dinv * r
        d = z / theta
        for _ in range(degree):
            x = x + d
            r = b - self.matvec(x)
            z = self.dinv * r
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = rho_new * rho * d + (2.0 * rho_new / delta) * z
            rho = rho_new
        return x


class GeometricMG:
    """V-cycle over a refine_global hierarchy; jittable linear operator.

    levels[0] is the coarsest.  The returned vcycle(b) approximates A^-1 b
    for the finest-level operator and is symmetric (equal pre/post
    Chebyshev smoothing), so it is a valid CG preconditioner."""

    def __init__(self, levels: List[MGLevel], n_smooth: int = 2,
                 dtype=jnp.float32, ncomp: int = 1):
        self.levels = levels
        self.n_smooth = n_smooth
        self.ncomp = ncomp
        L = len(levels)
        self.P = []           # (coarse node table (n_f, nlc), weights) / gap
        for i in range(L - 1):
            try:
                cells, W = prolongation_table(levels[i].space,
                                              levels[i + 1].space)
            except AssertionError:
                # non-full refinement (local/hanging-node meshes): locate
                # fine nodes in the coarse mesh geometrically
                cells, W = geometric_prolongation_table(
                    levels[i].space, levels[i + 1].space)
            cd = np.asarray(levels[i].space.cell_dofs)[cells]  # (n_f, nlc)
            self.P.append((jnp.asarray(cd, dtype=jnp.int32),
                           jnp.asarray(W, dtype=dtype)))

        # dense coarse inverse (host, f64), with identity fixed rows
        lv0 = levels[0]
        n0 = lv0.n
        A0 = np.zeros((n0, n0))
        cdofs = lv0._cd_np
        Al = lv0._A_np
        for c in range(len(cdofs)):
            A0[np.ix_(cdofs[c], cdofs[c])] += Al[c]
        f0 = lv0._fixed_np
        A0[f0, :] = 0.0
        A0[:, f0] = 0.0
        A0[f0, f0] = 1.0
        # pseudo-inverse: the pure-Neumann pressure Laplacian is singular
        # (constant null space); pinv gives the minimum-norm coarse
        # correction, which is exactly the deflated solve MG wants
        self.A0_inv = jnp.asarray(np.linalg.pinv(A0, rcond=1e-10),
                                  dtype=dtype)

    def _prolong(self, i, xc):
        cd, W = self.P[i]
        k = self.ncomp
        if k == 1:
            return jnp.einsum("fl,fl->f", W, xc[cd],
                              preferred_element_type=xc.dtype)
        xn = xc.reshape(-1, k)
        out = jnp.einsum("fl,flk->fk", W, xn[cd],
                         preferred_element_type=xc.dtype)
        return out.reshape(-1)

    def _restrict(self, i, rf):
        cd, W = self.P[i]
        k = self.ncomp
        nc_nodes = self.levels[i].n // k
        if k == 1:
            contrib = W * rf[:, None]
            return jnp.zeros(nc_nodes, dtype=rf.dtype).at[
                cd.reshape(-1)].add(contrib.reshape(-1))
        rn = rf.reshape(-1, k)
        contrib = W[:, :, None] * rn[:, None, :]     # (n_f, nlc, k)
        out = jnp.zeros((nc_nodes, k), dtype=rf.dtype).at[
            cd.reshape(-1)].add(contrib.reshape(-1, k))
        return out.reshape(-1)

    def vcycle(self, b):
        L = len(self.levels)
        dtype = self.levels[-1].A_loc.dtype
        b = b.astype(dtype)

        def cycle(i, bi):
            lv = self.levels[i]
            if i == 0:
                return self.A0_inv @ bi
            x = lv.chebyshev(bi, jnp.zeros_like(bi), self.n_smooth,
                             x_is_zero=True)
            r = bi - lv.matvec(x)
            r = jnp.where(lv.fixed, 0.0, r)
            bc = self._restrict(i - 1, r)
            bc = jnp.where(self.levels[i - 1].fixed, 0.0, bc)
            xc = cycle(i - 1, bc)
            x = x + self._prolong(i - 1, xc)
            return lv.chebyshev(bi, x, self.n_smooth)

        return cycle(L - 1, b)


# ----------------------------------------------------------------------
# builders
# ----------------------------------------------------------------------

def laplacian_levels(meshes: Sequence, degree: int,
                     fixed_fine: Optional[np.ndarray] = None,
                     dtype=jnp.float32,
                     n_q1d: Optional[int] = None,
                     fixed_prefix: bool = True) -> List[MGLevel]:
    """MGLevel list for the scalar Q_degree Laplacian on nested meshes.

    fixed_fine: fine-level fixed-dof mask.  With fixed_prefix=True the
    coarser masks are its node-id prefix (valid because refine_global
    appends nodes, so coarse node i is fine node i for the same Q_k
    numbering of the shared entities — exact for Q1 vertex dofs, where
    node ids ARE vertex ids).  Pass fixed_prefix=False for hierarchies
    that are geometrically nested but NOT built by refine_global (e.g.
    FSI base grids + a locally refined fine mesh): only the finest level
    gets the mask, coarser levels run unmasked — a preconditioner-quality
    choice only."""
    spaces = [FESpace(m, degree) for m in meshes]
    if degree != 1 and fixed_fine is not None and np.any(fixed_fine):
        raise NotImplementedError(
            "prefix fixed-mask restriction is only valid for Q1")
    levels = []
    for s in spaces:
        cv = cell_values(s, n_q1d or degree + 1)
        K = np.einsum("cqlx,cqmx,cq->clm", cv.grad, cv.grad, cv.JxW)
        if fixed_fine is not None and (fixed_prefix
                                       or s is spaces[-1]):
            fx = np.asarray(fixed_fine)[:s.n_nodes]
        else:
            fx = np.zeros(s.n_nodes, dtype=bool)
        # zero fixed columns so the operator stays symmetric with identity
        # fixed rows (matvec handles the rows)
        cd = s.cell_dofs
        colfix = fx[cd]                              # (n_c, nl)
        K = np.where(colfix[:, None, :] | colfix[:, :, None], 0.0, K)
        levels.append(MGLevel(s, K, fx, dtype))
    return levels


def make_pressure_mg(meshes: Sequence, fixed_fine=None, n_smooth: int = 2,
                     dtype=jnp.float32,
                     fixed_prefix: bool = True) -> GeometricMG:
    """V-cycle for the pressure Schur complement B diag(Mu)^-1 B^T (and
    the SUPG family's Tpp), which is spectrally a pressure Laplacian (the
    constant scaling is absorbed by the per-level Chebyshev eigenvalue
    estimates).  fixed_prefix: see laplacian_levels."""
    return GeometricMG(laplacian_levels(meshes, 1, fixed_fine, dtype,
                                        fixed_prefix=fixed_prefix),
                       n_smooth=n_smooth, dtype=dtype)


def velocity_levels(meshes: Sequence, degree: int, d: int,
                    rho: float, mu: float, gamma: float, dt: float,
                    fixed_fine: Optional[np.ndarray] = None,
                    dtype=jnp.float32) -> List[MGLevel]:
    """MGLevel list for the velocity block of the Grad-Div Newton matrix:
    A ~ (rho/dt) M + mu K + (gamma rho) G with G the grad-div operator
    (reference weak form source/mpi_insim.cpp:263-277).  Convection is
    deliberately left out — the V-cycle is a preconditioner inside a
    flexible Krylov solve at loose tolerance, and the symmetric part
    carries the mesh-dependent conditioning (the gamma dt / h^2 grad-div
    stiffness that Jacobi cannot damp).

    fixed_fine: (n_nodes*d,) interleaved fixed mask on the finest level;
    coarser masks are restricted exactly via node injection."""
    spaces = [FESpace(m, degree) for m in meshes]
    # restrict the fixed mask down the hierarchy by node injection
    masks = [None] * len(spaces)
    if fixed_fine is not None:
        masks[-1] = np.asarray(fixed_fine).reshape(-1, d)
        for i in range(len(spaces) - 2, -1, -1):
            inj = node_injection_table(spaces[i], spaces[i + 1])
            masks[i] = masks[i + 1][inj]
    levels = []
    for i, s in enumerate(spaces):
        cv = cell_values(s, degree + 1)
        nl = cv.N.shape[1]
        NN = np.einsum("qi,qj,cq->cij", cv.N, cv.N, cv.JxW)
        KK = np.einsum("cqix,cqjx,cq->cij", cv.grad, cv.grad, cv.JxW)
        I_d = np.eye(d)
        A = np.einsum("cij,ab->ciajb", (rho / dt) * NN + mu * KK, I_d)
        A = A + (gamma * rho) * np.einsum("cqia,cqjb,cq->ciajb",
                                          cv.grad, cv.grad, cv.JxW)
        A = A.reshape(-1, nl * d, nl * d)
        cd = (np.repeat(s.cell_dofs * d, d, axis=1) +
              np.tile(np.arange(d), nl))             # interleaved
        if masks[i] is not None:
            fx = masks[i].reshape(-1)
        else:
            fx = np.zeros(s.n_nodes * d, dtype=bool)
        colfix = fx[cd]
        A = np.where(colfix[:, None, :] | colfix[:, :, None], 0.0, A)
        levels.append(MGLevel(s, A, fx, dtype, cell_dofs=cd, ncomp=d))
    return levels


def make_velocity_mg(meshes: Sequence, degree: int, d: int,
                     rho: float, mu: float, gamma: float, dt: float,
                     fixed_fine=None, n_smooth: int = 2,
                     dtype=jnp.float32) -> GeometricMG:
    return GeometricMG(
        velocity_levels(meshes, degree, d, rho, mu, gamma, dt,
                        fixed_fine, dtype),
        n_smooth=n_smooth, dtype=dtype, ncomp=d)
