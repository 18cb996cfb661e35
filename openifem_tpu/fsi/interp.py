"""Cross-mesh interpolation kernels for the immersed FSI coupling.

TPU-native replacements for Utils::GridInterpolator / CellLocator /
point-in-cell (reference: source/utilities.cpp:192-341, source/fsi.cpp:92-109):
instead of per-point BFS cell walks, every query point is tested against all
candidate cells at once (bbox-masked) with a batched Newton inversion of the
bilinear map — a dense (n_points, n_cells) problem that vectorizes onto the
VPU/MXU instead of branchy host code.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..la.smalltensor import inv as _inv


def shape_values_jax(degree: int, dim: int, pts):
    """Q_k shape values at traced unit points. pts: (..., dim) ->
    (..., (degree+1)**dim), local ordering = lexicographic (x fastest),
    matching fe.shapes.QkShapes."""
    n1 = degree + 1
    nodes = jnp.linspace(0.0, 1.0, n1)

    def lag1d(x):  # (...,) -> (..., n1)
        vals = []
        for i in range(n1):
            v = jnp.ones_like(x)
            for j in range(n1):
                if j == i:
                    continue
                v = v * (x - nodes[j]) / (nodes[i] - nodes[j])
            vals.append(v)
        return jnp.stack(vals, axis=-1)

    per_axis = [lag1d(pts[..., d]) for d in range(dim)]
    # local index l = i0 + n1*i1 + ... (x fastest)
    shape = []
    for l in range(n1 ** dim):
        rem = l
        v = None
        for d in range(dim):
            i = rem % n1
            rem //= n1
            t = per_axis[d][..., i]
            v = t if v is None else v * t
        shape.append(v)
    return jnp.stack(shape, axis=-1)


def invert_bilinear(points, cell_verts, n_iter: int = 6):
    """Invert the (bi/tri)linear map for batches of (point, cell) pairs.

    points: (..., dim); cell_verts: (..., 2**dim, dim) in z-order.
    Returns unit coords (..., dim).  Newton with a fixed trip count
    (compiler-friendly; 6 iterations converge to machine precision for
    non-degenerate cells)."""
    dim = points.shape[-1]
    xi = jnp.full_like(points, 0.5)

    def geo(xi):
        # bilinear shape values/grads at xi (z-order corners)
        if dim == 2:
            x, y = xi[..., 0], xi[..., 1]
            N = jnp.stack([(1 - x) * (1 - y), x * (1 - y),
                           (1 - x) * y, x * y], axis=-1)
            dN = jnp.stack([
                jnp.stack([-(1 - y), -(1 - x)], axis=-1),
                jnp.stack([(1 - y), -x], axis=-1),
                jnp.stack([-y, (1 - x)], axis=-1),
                jnp.stack([y, x], axis=-1)], axis=-2)  # (...,4,dim)
        else:
            x, y, z = xi[..., 0], xi[..., 1], xi[..., 2]
            xs = [(1 - x), x]
            ys = [(1 - y), y]
            zs = [(1 - z), z]
            dxs = [-jnp.ones_like(x), jnp.ones_like(x)]
            Ns, dNs = [], []
            for k in range(2):
                for j in range(2):
                    for i in range(2):
                        Ns.append(xs[i] * ys[j] * zs[k])
                        dNs.append(jnp.stack([
                            dxs[i] * ys[j] * zs[k],
                            xs[i] * dxs[j] * zs[k],
                            xs[i] * ys[j] * dxs[k]], axis=-1))
            N = jnp.stack(Ns, axis=-1)
            dN = jnp.stack(dNs, axis=-2)
        return N, dN

    for _ in range(n_iter):
        N, dN = geo(xi)
        X = jnp.einsum("...v,...vd->...d", N, cell_verts)
        # A[d, x] = dX_d/dxi_x ; Newton solve A dxi = (p - X)
        A = jnp.einsum("...vx,...vd->...dx", dN, cell_verts)
        r = points - X
        dxi = jnp.einsum("...xd,...d->...x", _inv(A), r)
        xi = xi + dxi
    return xi


@partial(jax.jit, static_argnames=("tol",))
def locate_points(points, cell_verts, cell_bbox_lo, cell_bbox_hi,
                  tol: float = 1e-10):
    """Find for each point the containing cell among candidates.

    points: (n_p, dim); cell_verts: (n_c, 2**dim, dim);
    cell_bbox_lo/hi: (n_c, dim) bounding boxes (pre-inflated by caller).
    Returns (cell_idx (n_p,) int32 [-1 if none], unit (n_p, dim), found).
    """
    n_p, dim = points.shape
    n_c = cell_verts.shape[0]
    inb = jnp.all((points[:, None, :] >= cell_bbox_lo[None, :, :] - tol) &
                  (points[:, None, :] <= cell_bbox_hi[None, :, :] + tol),
                  axis=-1)  # (n_p, n_c)
    xi = invert_bilinear(points[:, None, :].repeat(n_c, axis=1),
                         cell_verts[None, :, :, :].repeat(n_p, axis=0))
    inside = jnp.all((xi >= -1e-8) & (xi <= 1 + 1e-8), axis=-1) & inb
    # pick the first containing cell
    idx = jnp.argmax(inside, axis=1).astype(jnp.int32)
    found = jnp.any(inside, axis=1)
    unit = jnp.take_along_axis(xi, idx[:, None, None].astype(jnp.int64),
                               axis=1)[:, 0, :]
    unit = jnp.clip(unit, 0.0, 1.0)
    return jnp.where(found, idx, -1), unit, found


def interpolate_nodal(field, cell_dofs, cell_idx, unit, degree: int,
                      found=None):
    """Evaluate a nodal field at located points.

    field: (n_nodes, ...) nodal values; cell_dofs: (n_c, nl);
    cell_idx (n_p,), unit (n_p, dim). Points not found give 0."""
    dim = unit.shape[-1]
    N = shape_values_jax(degree, dim, unit)          # (n_p, nl)
    dofs = cell_dofs[jnp.clip(cell_idx, 0, None)]    # (n_p, nl)
    vals = field[dofs]                               # (n_p, nl, ...)
    extra_dims = vals.ndim - 2
    out = jnp.einsum("pl...,pl->p...", vals, N)
    if found is not None:
        shape = (len(cell_idx),) + (1,) * extra_dims
        out = out * found.reshape(shape)
    return out


def sph_interpolate(targets, centers, diameters, values):
    """SPH cubic-spline-kernel interpolation from cell centers
    (Utils::SPHInterpolator, reference: source/utilities.cpp:83-190).

    targets: (n_t, d); centers: (n_c, d); diameters: (n_c,) smoothing
    lengths h (the reference uses the cell diameter); values: (n_c, ...)
    cell-centered data.  Returns kernel-weighted averages at the targets."""
    d = targets.shape[1]
    rel = targets[:, None, :] - centers[None, :, :]
    q = jnp.linalg.norm(rel, axis=-1) / diameters[None, :]
    coef = jnp.where(
        d == 2, 10.0 / (7.0 * jnp.pi * diameters ** 2),
        1.0 / (jnp.pi * diameters ** 3))[None, :]
    w = jnp.where(
        q < 1.0, 1.0 - 1.5 * q ** 2 + 0.75 * q ** 3,
        jnp.where(q < 2.0, 0.25 * (2.0 - q) ** 3, 0.0)) * coef
    wsum = w.sum(axis=1)
    wsum = jnp.where(wsum > 0, wsum, 1.0)
    out = jnp.einsum("tc,c...->t...", w, values)
    return out / wsum.reshape((-1,) + (1,) * (values.ndim - 1))
