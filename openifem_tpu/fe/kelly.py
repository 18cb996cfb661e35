r"""Kelly error estimator (deal.II KellyErrorEstimator analog).

Reference use: standalone mesh adaptivity
(source/fluid_solver.cpp:215-265, source/solid_solver.cpp:209-268):
  eta_K^2 = sum_{faces F of K} (h_F / 24) \int_F [d u_h / d n]^2 ds
with the jump evaluated across interior conforming faces.  Face quadrature
points of one side are pulled back into the neighbor with the batched
bilinear inversion, so the jump is sampled at identical physical points.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import real_dtype
from ..fsi.interp import invert_bilinear
from .fevalues import face_values
from .shapes import QkShapes


def kelly_estimate(space, solution, n_components: int = 1,
                   component_offset: int = 0):
    """Per-cell error indicators for (a component block of) a nodal field.

    solution: flat dof vector laid out node-major with `n_components`
    per node starting at `component_offset` (e.g. the velocity block of a
    fluid solution).  Returns (n_cells,) numpy indicators."""
    mesh = space.mesh
    dim = mesh.dim

    # interior conforming face pairs
    fmap = mesh._face_map()
    pairs = [lst for lst in fmap.values() if len(lst) == 2]
    side_a = [p[0] for p in pairs]
    cells_b_list = [p[1][0] for p in pairs]

    # nonconforming (hanging) faces on adapted meshes: integrate the jump
    # over each FINE subface against the coarse neighbor, as deal.II's
    # KellyErrorEstimator does — skipping them underestimates the error
    # exactly where AMR just refined.  A fine subface appears in the face
    # map with no partner (its key contains mid-edge vertices) but is not
    # on the boundary; its coarse neighbor is found geometrically.
    orphans = [lst[0] for lst in fmap.values()
               if len(lst) == 1 and mesh.boundary_id[lst[0][0],
                                                     lst[0][1]] < 0]
    if orphans:
        from ..mesh.mesh import FACE_VERTICES
        fv_tab = FACE_VERTICES[dim]
        centers = mesh.cell_centers()
        lev = mesh.level
        orphan_cells = np.array(sorted({c for c, _ in orphans}))
        orph_c = np.array([c for c, _ in orphans])
        fverts = mesh.vertices[
            mesh.cells[orph_c[:, None],
                       np.array([list(fv_tab[f]) for _, f in orphans])]]
        x = fverts.mean(axis=1)                       # (n_o, dim)
        probes = x + 0.1 * (x - centers[orph_c])
        # candidate filter (bbox + strictly coarser + not self), then ONE
        # batched bilinear inversion over all surviving (probe, cell)
        # pairs instead of a device call per pair
        v2 = mesh.vertices[mesh.cells[orphan_cells]]  # (n_cand, 2^d, d)
        lo, hi = v2.min(axis=1), v2.max(axis=1)
        inbox = ((probes[:, None, :] >= lo[None] - 1e-12).all(-1) &
                 (probes[:, None, :] <= hi[None] + 1e-12).all(-1))
        mask = (inbox & (lev[orphan_cells][None, :] < lev[orph_c][:, None])
                & (orphan_cells[None, :] != orph_c[:, None]))
        oi, cj = np.nonzero(mask)
        if len(oi):
            unit = np.asarray(invert_bilinear(
                jnp.asarray(probes[oi], dtype=real_dtype()),
                jnp.asarray(v2[cj], dtype=real_dtype())))
            ok = ((unit > -1e-8).all(-1) & (unit < 1 + 1e-8).all(-1))
            taken = set()
            for t in np.nonzero(ok)[0]:
                o = int(oi[t])
                if o in taken:
                    continue
                taken.add(o)
                side_a.append(orphans[o])
                cells_b_list.append(int(orphan_cells[cj[t]]))

    if not side_a:
        return np.zeros(mesh.n_cells)

    nq = space.degree + 1
    fva = face_values(space, nq, side_a)

    # physical q points from side A; pull back into side B cells
    xq = jnp.asarray(fva.xq.reshape(-1, dim), dtype=real_dtype())
    cells_b = np.array(cells_b_list)
    vb = jnp.asarray(mesh.vertices[mesh.cells[cells_b]], dtype=real_dtype())
    n_f, n_q = fva.JxW.shape
    vb_rep = jnp.repeat(vb, n_q, axis=0)
    unit_b = invert_bilinear(xq, vb_rep)

    # shape gradients of side B at those unit points
    _, dN = space.shapes.evaluate(np.asarray(unit_b))
    geo = QkShapes(1, dim)
    _, dNg = geo.evaluate(np.asarray(unit_b))
    Jb = np.einsum("pvd,pvx->pxd", dNg, np.asarray(vb_rep))
    Jinv_b = np.linalg.inv(Jb)
    grad_b_shapes = np.einsum("pld,pdx->plx", dN, Jinv_b)

    sol = np.asarray(solution)
    eta2 = np.zeros(mesh.n_cells)
    # node-major extraction: component comp of node i lives at
    # component_offset + i * n_components + comp
    n_nodes = space.n_nodes
    for comp in range(n_components):
        idx = component_offset + np.arange(n_nodes) * n_components + comp
        field = sol[idx]
        la = field[space.cell_dofs[np.array([c for c, _ in side_a])]]
        grad_a = np.einsum("fqlx,fl->fqx", np.asarray(fva.grad), la)
        lb = field[space.cell_dofs[cells_b]].reshape(n_f, -1)
        grad_b = np.einsum("plx,pl->px",
                           grad_b_shapes,
                           np.repeat(lb, n_q, axis=0)).reshape(n_f, n_q, dim)
        jump = np.einsum("fqx,fqx->fq", grad_a - grad_b,
                         np.asarray(fva.normals))
        h_f = np.asarray(fva.JxW).sum(axis=1)  # face measure ~ h_F
        contrib = (h_f / 24.0) * (jump ** 2 * np.asarray(fva.JxW)).sum(axis=1)
        for i, (ca, _) in enumerate(side_a):
            eta2[ca] += contrib[i]
            eta2[cells_b[i]] += contrib[i]
    return np.sqrt(eta2)


def refine_fraction_flags(indicators: np.ndarray, top_fraction: float = 0.6):
    """deal.II refine_and_coarsen_fixed_fraction's refinement half: flag the
    largest-error cells accounting for `top_fraction` of the total error."""
    order = np.argsort(indicators)[::-1]
    err = indicators[order] ** 2
    csum = np.cumsum(err)
    total = csum[-1] if len(csum) else 0.0
    flags = np.zeros(len(indicators), dtype=bool)
    if total <= 0:
        return flags
    k = int(np.searchsorted(csum, top_fraction * total)) + 1
    flags[order[:k]] = True
    return flags


def coarsen_fraction_flags(indicators: np.ndarray,
                           bottom_fraction: float = 0.4):
    """deal.II refine_and_coarsen_fixed_fraction's coarsening half: flag the
    smallest-error cells accounting for `bottom_fraction` of the total."""
    order = np.argsort(indicators)
    err = indicators[order] ** 2
    csum = np.cumsum(err)
    total = csum[-1] if len(csum) else 0.0
    flags = np.zeros(len(indicators), dtype=bool)
    if total <= 0:
        return flags
    k = int(np.searchsorted(csum, bottom_fraction * total, side="right"))
    flags[order[:k]] = True
    return flags
