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
    import contextlib

    import jax as jax_
    import jax.numpy as jnp_  # local: host-side setup only

    from ..config import real_dtype
    from ..fsi.interp import make_cell_hash, plan_cell_hash

    # setup-time locate: jit on the CPU backend (a remote-TPU compile of
    # this one-shot kernel costs minutes)
    try:
        ctx = jax_.default_device(jax_.devices("cpu")[0])
    except Exception:
        ctx = contextlib.nullcontext()
    with ctx:
        cm = coarse_space.mesh
        verts = cm.vertices[cm.cells]
        dims, span, K = plan_cell_hash(verts, tol=tol)
        build, locate = make_cell_hash(cm.n_cells, dims, span, K, tol=tol)
        pts = jnp_.asarray(fine_space.node_points, dtype=real_dtype())
        idx, unit, found = locate(
            build(jnp_.asarray(verts, dtype=real_dtype())), pts)
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
        for j in range(degree):
            x = x + d
            if j == degree - 1:
                break   # the final residual/direction would be dead work
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


# ----------------------------------------------------------------------
# Galerkin multigrid: coarse operators from the ACTUAL fine element
# blocks (A_c = W^T A_f W), rebuilt inside jit each Newton iteration.
#
# The reference preconditions its Schur surrogates with ILU(0)/direct
# factorizations of explicitly (re)assembled matrices every Newton step
# (B2pp: source/mpi_supg_solver.cpp:56-133; mass_schur:
# source/mpi_insim.cpp:36-50).  The frozen-Laplacian GeometricMG above
# preconditions a FIXED spectrally-similar operator instead, which fails
# when the true operator is mass- or convection-dominated (measured:
# SCnsIM Tpp inner GMRES 34 iters at fsi-wall-3D full res with the
# Laplacian V-cycle).  GalerkinMG coarsens the true blocks: the W tables
# and parent maps are static (host setup), the per-level block
# construction is three batched einsums + one segment scatter — jittable
# and cheap relative to one Krylov iteration.
# ----------------------------------------------------------------------

def galerkin_table(coarse_space: FESpace, fine_space: FESpace,
                   tol: float = 1e-9):
    """Per-FINE-CELL parent coarse cell + interpolation weights.

    Returns (parent (n_fc,) int, W (n_fc, nl_f, nl_c) float64) with
    W[f, l, m] = N^coarse_m(xi of fine node l in parent cell).  Valid for
    any nested pair (full, local/hanging refinements, or coarser base
    grids of the same domain)."""
    import jax.numpy as jnp_

    from ..config import real_dtype
    from ..fsi.interp import make_cell_hash, plan_cell_hash

    import contextlib

    import jax as jax_

    cm, fm = coarse_space.mesh, fine_space.mesh
    # setup-time host work: jit these small locates on the CPU backend
    # (compiling them for the remote TPU costs minutes for nothing)
    try:
        ctx = jax_.default_device(jax_.devices("cpu")[0])
    except Exception:
        ctx = contextlib.nullcontext()
    with ctx:
        verts = cm.vertices[cm.cells]
        dims, span, K = plan_cell_hash(verts, tol=tol)
        build, locate = make_cell_hash(cm.n_cells, dims, span, K, tol=tol)
        state = build(jnp_.asarray(verts, dtype=real_dtype()))
        centers = jnp_.asarray(fm.cell_centers(), dtype=real_dtype())
        parent, _, found = locate(state, centers)
        assert bool(found.all()), \
            "fine cell center outside the coarse mesh"
        parent = np.asarray(parent, dtype=np.int64)

        # unit coords of every fine-cell node inside the parent cell
        from ..fsi.interp import invert_bilinear
        geo = fine_space.shapes
        Ng, _ = QkShapes_geo(fm.dim).evaluate(geo.local_nodes())
        node_xyz = np.einsum("lv,cvd->cld", Ng, fm.vertices[fm.cells])
        pverts = jnp_.asarray(cm.vertices[cm.cells][parent],
                              dtype=real_dtype())       # (n_fc, 2**d, d)
        xi = invert_bilinear(jnp_.asarray(node_xyz, dtype=real_dtype()),
                             pverts[:, None, :, :])
        xi = np.clip(np.asarray(xi), 0.0, 1.0)
    n_fc, nl_f, d = xi.shape
    W, _ = coarse_space.shapes.evaluate(xi.reshape(-1, d))
    return parent, W.reshape(n_fc, nl_f, -1)


def QkShapes_geo(dim):
    from ..fe.shapes import QkShapes
    return QkShapes(1, dim)


class GalerkinMG:
    """V-cycle whose level operators are Galerkin products of the fine
    element blocks, built per call (jittable).

    spaces: [coarsest ... finest] scalar FESpaces of the SAME degree as
    the fine blocks' dof map; ncomp > 1 treats blocks as node-block
    vector operators (n_c, nl, d, nl, d).

    Usage:
        mg = GalerkinMG(spaces, fine_cell_dofs, rep_blocks, fixed_fine)
        vcycle = mg.build(A_loc)     # inside jit, per Newton iteration
    The Chebyshev eigenvalue estimates are frozen at setup from
    representative blocks (rep_blocks) and reused; smoothing targets
    [lam/4, lam], so modest spectrum drift is absorbed."""

    dense_coarse_max = 3000   # dofs; above this the coarse solve falls
    # back to Chebyshev sweeps (dense LU would blow VMEM)

    def __init__(self, spaces, fine_cell_dofs, rep_blocks, fixed_fine,
                 n_smooth: int = 2, dtype=jnp.float32, ncomp: int = 1,
                 lam_safety: float = 1.15):
        self.n_smooth = n_smooth
        self.dtype = dtype
        self.ncomp = ncomp
        L = len(spaces)
        k = ncomp

        # static tables per level-pair
        self.parent = []     # (n_f_cells,) parent coarse cell
        self.Wt = []         # (n_f_cells, nl_f, nl_c)
        for i in range(L - 1):
            p, W = galerkin_table(spaces[i], spaces[i + 1])
            self.parent.append(jnp.asarray(p, dtype=jnp.int32))
            self.Wt.append(jnp.asarray(W, dtype=dtype))

        # per-level dof maps + sizes (level i uses spaces[i].cell_dofs
        # indexed per COARSE cell after sibling aggregation)
        self.cell_dofs = [jnp.asarray(s.cell_dofs, dtype=jnp.int32)
                          for s in spaces]
        self.n_nodes = [s.n_nodes for s in spaces]
        fcd = np.asarray(fine_cell_dofs)
        assert fcd.shape[0] == spaces[-1].mesh.n_cells
        self.fine_cell_dofs = jnp.asarray(fcd, dtype=jnp.int32)

        fixed_fine = np.asarray(fixed_fine, dtype=bool)
        self.fixed_fine = jnp.asarray(fixed_fine)

        # node-interpolation prolongation per level-pair (same tables as
        # GeometricMG): fine NODE value from coarse cell shapes
        self.P = []
        for i in range(L - 1):
            try:
                cells, W = prolongation_table(spaces[i], spaces[i + 1])
            except AssertionError:
                cells, W = geometric_prolongation_table(spaces[i],
                                                        spaces[i + 1])
            cd = np.asarray(spaces[i].cell_dofs)[cells]
            self.P.append((jnp.asarray(cd, dtype=jnp.int32),
                           jnp.asarray(W, dtype=dtype)))

        # Chebyshev lambda_max: frozen at setup from representative
        # blocks when given, else estimated per build() by a fixed-trip
        # power iteration inside jit (dynamic — tracks the Newton matrix)
        self.lam_safety = lam_safety
        if rep_blocks is None:
            self.lam = None
        else:
            levels = self._level_blocks_host(np.asarray(rep_blocks,
                                                        dtype=np.float64))
            self.lam = []
            rng = np.random.default_rng(0)
            for i, (blocks, cd, n) in enumerate(levels):
                diag = np.zeros(n)
                nl = cd.shape[1] * k
                cdk = self._expand_dofs_np(cd, k)
                dloc = blocks.reshape(len(blocks), nl, nl)[
                    :, np.arange(nl), np.arange(nl)]
                np.add.at(diag, cdk.reshape(-1), dloc.reshape(-1))
                diag[diag == 0] = 1.0
                if i == L - 1 and fixed_fine.any():
                    diag[fixed_fine] = 1.0
                x = rng.standard_normal(n)
                lam = 1.0
                for _ in range(12):
                    nrm = np.linalg.norm(x)
                    if nrm == 0:
                        break
                    x = x / nrm
                    xl = x[cdk]
                    yl = np.einsum("clm,cm->cl",
                                   blocks.reshape(len(blocks), nl, nl), xl)
                    y = np.zeros(n)
                    np.add.at(y, cdk.reshape(-1), yl.reshape(-1))
                    y = y / diag
                    lam = float(x @ y)
                    x = y
                self.lam.append(lam_safety * max(lam, 1e-12))

        # dense coarse solve operator shape (built per call from blocks)
        self.n0 = self.n_nodes[0] * k

    # -- helpers -------------------------------------------------------
    @staticmethod
    def _expand_dofs_np(cd, k):
        if k == 1:
            return cd
        nl = cd.shape[1]
        return (np.repeat(cd * k, k, axis=1) +
                np.tile(np.arange(k), nl))

    def _level_blocks_host(self, fine_blocks):
        """[(blocks (n_cells_i, nl*k, nl*k), cell_dofs_i, n_dofs_i)]
        coarsest first, numpy (setup only)."""
        k = self.ncomp
        out = []
        blocks = fine_blocks
        cd = np.asarray(self.fine_cell_dofs)
        for i in range(len(self.cell_dofs) - 1, 0, -1):
            out.append((blocks, cd, self.n_nodes[i] * k))
            W = np.asarray(self.Wt[i - 1])
            parent = np.asarray(self.parent[i - 1])
            nl_f, nl_c = W.shape[1], W.shape[2]
            n_cc = len(np.asarray(self.cell_dofs[i - 1]))
            if k == 1:
                contrib = np.einsum("fim,fij,fjn->fmn", W,
                                    blocks.reshape(-1, nl_f, nl_f), W)
            else:
                B = blocks.reshape(-1, nl_f, k, nl_f, k)
                contrib = np.einsum("fim,fiajb,fjn->fmanb", W, B, W
                                    ).reshape(-1, nl_c * k, nl_c * k)
            agg = np.zeros((n_cc, nl_c * k, nl_c * k))
            np.add.at(agg, parent, contrib)
            blocks = agg
            cd = np.asarray(self.cell_dofs[i - 1])
        out.append((blocks, cd, self.n_nodes[0] * k))
        return out[::-1]

    # -- jittable build ------------------------------------------------
    def build(self, fine_blocks):
        """Closure vcycle(b) over level blocks derived from fine_blocks
        (n_fine_cells, nl*k, nl*k) — call inside jit."""
        k = self.ncomp
        dtype = self.dtype
        fine_blocks = fine_blocks.astype(dtype)
        L = len(self.cell_dofs)

        level_blocks = [None] * L
        level_blocks[L - 1] = fine_blocks
        for i in range(L - 1, 0, -1):
            W = self.Wt[i - 1]
            parent = self.parent[i - 1]
            nl_f, nl_c = W.shape[1], W.shape[2]
            blocks = level_blocks[i]
            if k == 1:
                contrib = jnp.einsum(
                    "fim,fij,fjn->fmn", W,
                    blocks.reshape(-1, nl_f, nl_f), W,
                    preferred_element_type=dtype)
            else:
                B = blocks.reshape(-1, nl_f, k, nl_f, k)
                contrib = jnp.einsum(
                    "fim,fiajb,fjn->fmanb", W, B, W,
                    preferred_element_type=dtype
                ).reshape(-1, nl_c * k, nl_c * k)
            n_cc = self.cell_dofs[i - 1].shape[0]
            level_blocks[i - 1] = jnp.zeros(
                (n_cc, nl_c * k, nl_c * k), dtype=dtype
            ).at[parent].add(contrib)

        # per-level matvec/diag closures
        def level_ops(i):
            blocks = level_blocks[i]
            cd = self.cell_dofs[i] if i < L - 1 else self.fine_cell_dofs
            n = self.n_nodes[i] * k
            if k == 1:
                cdk = cd
            else:
                nl = cd.shape[1]
                cdk = (jnp.repeat(cd * k, k, axis=1) +
                       jnp.tile(jnp.arange(k, dtype=cd.dtype), nl))
            fixed = self.fixed_fine if i == L - 1 else None

            def mv(x):
                y = element_matvec(blocks, cdk, n, x)
                if fixed is not None:
                    y = jnp.where(fixed, x, y)
                return y

            nl_tot = blocks.shape[1]
            dloc = blocks[:, jnp.arange(nl_tot), jnp.arange(nl_tot)]
            diag = jnp.zeros(n, dtype=dtype).at[cdk.reshape(-1)].add(
                dloc.reshape(-1))
            if fixed is not None:
                diag = jnp.where(fixed, 1.0, diag)
            diag = jnp.where(diag == 0, 1.0, diag)
            dinv = 1.0 / diag
            return mv, dinv, fixed

        ops = [level_ops(i) for i in range(L)]

        # dense coarse inverse with a fixed small Tikhonov deflation
        # (pinv is not jittable cheaply; the coarse op may be singular
        # only for pure-Neumann problems — the shift makes the solve a
        # bounded coarse correction, fine for a preconditioner).  For a
        # LARGE coarsest level (shallow hierarchies) the dense inverse
        # would blow VMEM — fall back to extra Chebyshev sweeps there.
        n0 = self.n0
        if n0 <= self.dense_coarse_max:
            blocks0 = level_blocks[0]
            cd0 = self.cell_dofs[0]
            if k != 1:
                nl0 = cd0.shape[1]
                cd0 = (jnp.repeat(cd0 * k, k, axis=1) +
                       jnp.tile(jnp.arange(k, dtype=cd0.dtype), nl0))
            A0 = jnp.zeros((n0, n0), dtype=dtype)
            A0 = A0.at[cd0[:, :, None], cd0[:, None, :]].add(blocks0)
            tr = jnp.trace(A0) / n0
            A0 = A0 + (1e-6 * tr) * jnp.eye(n0, dtype=dtype)
            # Newton-Schulz inverse: pure MXU matmuls (an in-graph LU
            # custom-call faults the TPU worker under the VMEM pressure
            # of the surrounding Krylov program).  X0 = A^T/(|A|_1 |A|_inf)
            # guarantees convergence; 30 doublings cover cond <~ 1e8,
            # plenty for an MG coarse CORRECTION.
            A32 = A0.astype(jnp.float32)
            norm1 = jnp.max(jnp.sum(jnp.abs(A32), axis=0))
            norminf = jnp.max(jnp.sum(jnp.abs(A32), axis=1))
            X = A32.T / (norm1 * norminf)
            I0 = jnp.eye(n0, dtype=jnp.float32)
            for _ in range(30):
                X = X @ (2.0 * I0 - A32 @ X)
            A0_inv = X.astype(dtype)
        else:
            A0_inv = None

        n_smooth = self.n_smooth
        if self.lam is not None:
            lam = self.lam
        else:
            # dynamic lambda_max(D^-1 A) per level: fixed-trip power
            # iteration with a deterministic start (jit-safe, no RNG)
            lam = []
            for i in range(L):
                mv, dinv, _ = ops[i]
                n = self.n_nodes[i] * k
                x = jnp.sin(jnp.arange(1, n + 1, dtype=dtype))
                lam_i = jnp.asarray(1.0, dtype=dtype)
                for _ in range(8):
                    x = x / jnp.maximum(jnp.linalg.norm(x), 1e-30)
                    y = dinv * mv(x)
                    lam_i = jnp.vdot(x, y)
                    x = y
                lam.append(self.lam_safety *
                           jnp.maximum(jnp.real(lam_i), 1e-12))

        def chebyshev(i, b, x, x_is_zero=False):
            mv, dinv, _ = ops[i]
            lmax = lam[i]
            lmin = lmax / 4.0
            theta = 0.5 * (lmax + lmin)
            delta = 0.5 * (lmax - lmin)
            sigma = theta / delta
            rho = 1.0 / sigma
            r = b if x_is_zero else b - mv(x)
            z = dinv * r
            d_vec = z / theta
            for j in range(n_smooth):
                x = x + d_vec
                if j == n_smooth - 1:
                    break   # final residual/direction would be dead work
                r = b - mv(x)
                z = dinv * r
                rho_new = 1.0 / (2.0 * sigma - rho)
                d_vec = rho_new * rho * d_vec + (2.0 * rho_new / delta) * z
                rho = rho_new
            return x

        def prolong(i, xc):
            cdp, W = self.P[i]
            if k == 1:
                return jnp.einsum("fl,fl->f", W, xc[cdp],
                                  preferred_element_type=dtype)
            xn = xc.reshape(-1, k)
            return jnp.einsum("fl,flk->fk", W, xn[cdp],
                              preferred_element_type=dtype).reshape(-1)

        def restrict(i, rf):
            cdp, W = self.P[i]
            nc = self.n_nodes[i] * k
            if k == 1:
                contrib = W * rf[:, None]
                return jnp.zeros(nc, dtype=dtype).at[
                    cdp.reshape(-1)].add(contrib.reshape(-1))
            rn = rf.reshape(-1, k)
            contrib = W[:, :, None] * rn[:, None, :]
            out = jnp.zeros((nc // k, k), dtype=dtype).at[
                cdp.reshape(-1)].add(contrib.reshape(-1, k))
            return out.reshape(-1)

        def vcycle(b):
            out_dtype = b.dtype
            b = b.astype(dtype)

            def cycle(i, bi):
                if i == 0:
                    if A0_inv is not None:
                        return A0_inv @ bi
                    return chebyshev(0, bi, jnp.zeros_like(bi),
                                     x_is_zero=True)
                mv, dinv, fixed = ops[i]
                x = chebyshev(i, bi, jnp.zeros_like(bi), x_is_zero=True)
                r = bi - mv(x)
                if fixed is not None:
                    r = jnp.where(fixed, 0.0, r)
                bc = restrict(i - 1, r)
                xc = cycle(i - 1, bc)
                x = x + prolong(i - 1, xc)
                return chebyshev(i, bi, x)

            return cycle(L - 1, b).astype(out_dtype)

        return vcycle
