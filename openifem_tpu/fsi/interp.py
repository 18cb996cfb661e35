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


def _solve_small_cw(A, r):
    """Solve the dim x dim system A dxi = r per flat-batch element.

    A: nested list A[d][x] of (N,) arrays (dX_d/dxi_x), r: list[d] of (N,).
    Returns dxi as list[dim] of (N,).  Cramer/cofactor form keeps every
    live array 1-D."""
    dim = len(r)
    if dim == 2:
        det = A[0][0] * A[1][1] - A[0][1] * A[1][0]
        inv_det = 1.0 / det
        return [(A[1][1] * r[0] - A[0][1] * r[1]) * inv_det,
                (A[0][0] * r[1] - A[1][0] * r[0]) * inv_det]
    c00 = A[1][1] * A[2][2] - A[1][2] * A[2][1]
    c01 = A[1][2] * A[2][0] - A[1][0] * A[2][2]
    c02 = A[1][0] * A[2][1] - A[1][1] * A[2][0]
    c10 = A[0][2] * A[2][1] - A[0][1] * A[2][2]
    c11 = A[0][0] * A[2][2] - A[0][2] * A[2][0]
    c12 = A[0][1] * A[2][0] - A[0][0] * A[2][1]
    c20 = A[0][1] * A[1][2] - A[0][2] * A[1][1]
    c21 = A[0][2] * A[1][0] - A[0][0] * A[1][2]
    c22 = A[0][0] * A[1][1] - A[0][1] * A[1][0]
    inv_det = 1.0 / (A[0][0] * c00 + A[0][1] * c01 + A[0][2] * c02)
    return [(c00 * r[0] + c10 * r[1] + c20 * r[2]) * inv_det,
            (c01 * r[0] + c11 * r[1] + c21 * r[2]) * inv_det,
            (c02 * r[0] + c12 * r[1] + c22 * r[2]) * inv_det]


def invert_bilinear_cw(px, vx, n_iter: int = 6):
    """Component-wise Newton inversion of the (bi/tri)linear geometric map
    on a flat batch.

    px: list[dim] of (N,) point coordinates; vx: nested list vx[v][d] of
    (N,) corner coordinates (z-order corners, i fastest).  Returns xi as a
    list[dim] of (N,) unit coordinates.

    Same math as invert_bilinear, but every live array is 1-D: TPU tiling
    pads only the single minor dim to 128, whereas the (..., v, d) batched
    layout tiles (8, 3) -> (8, 128) etc., a 16-42x memory inflation that
    blew HBM on fsi-wall-3D's indicator kernel (f32[8,54400,20,3,3] padded
    to 17.8 GB).  This is the production locate path."""
    dim = len(px)
    xi = [jnp.full_like(px[0], 0.5) for _ in range(dim)]
    corners = [tuple((v >> a) & 1 for a in range(dim))
               for v in range(2 ** dim)]
    for _ in range(n_iter):
        f = [[1.0 - xi[a], xi[a]] for a in range(dim)]
        X = [None] * dim
        A = [[None] * dim for _ in range(dim)]
        for v, bits in enumerate(corners):
            N_v = None
            for a in range(dim):
                t = f[a][bits[a]]
                N_v = t if N_v is None else N_v * t
            for d in range(dim):
                t = N_v * vx[v][d]
                X[d] = t if X[d] is None else X[d] + t
            for ax in range(dim):
                # dN_v/dxi_ax = (+-1) * prod_{a != ax} f[a][bits[a]]
                g = None
                for a in range(dim):
                    if a == ax:
                        continue
                    t = f[a][bits[a]]
                    g = t if g is None else g * t
                sign = 1.0 if bits[ax] else -1.0
                for d in range(dim):
                    t = (sign * g) * vx[v][d]
                    A[d][ax] = t if A[d][ax] is None else A[d][ax] + t
        r = [px[d] - X[d] for d in range(dim)]
        dxi = _solve_small_cw(A, r)
        xi = [xi[a] + dxi[a] for a in range(dim)]
    return xi


def plan_cell_hash(cell_verts_np, safety: float = 1.0,
                   tol: float = 1e-10, max_dims_per_axis: int = 4096):
    """Host-side planning of a uniform-grid cell hash: pick static grid
    dims, per-cell bin span and query candidate count K from the geometry.

    cell_verts_np: (n_c, 2**dim, dim) numpy vertices of a REPRESENTATIVE
    configuration (for a moving mesh, the reference config; pass safety>1
    to leave headroom for deformation).  Returns (dims, span, K) python
    ints usable as static arguments to make_cell_hash.

    The binning arithmetic (including the +-tol bbox inflation) must match
    make_cell_hash's build exactly, otherwise span/K undercount on grid-
    aligned meshes — pass the same tol to both."""
    import numpy as np

    cv = np.asarray(cell_verts_np)
    dim = cv.shape[-1]
    lo_c, hi_c = cv.min(axis=1) - tol, cv.max(axis=1) + tol
    dom_lo, dom_hi = lo_c.min(axis=0), hi_c.max(axis=0)
    ext = np.maximum(dom_hi - dom_lo, 1e-300)
    cell_ext = np.maximum((hi_c - lo_c).max(axis=0), 1e-300)
    dims = tuple(int(np.clip(np.floor(ext[a] / cell_ext[a]), 1,
                             max_dims_per_axis)) for a in range(dim))
    inv_bin = np.asarray(dims) / ext
    b0 = np.clip(np.floor((lo_c - dom_lo) * inv_bin).astype(np.int64), 0,
                 np.asarray(dims) - 1)
    b1 = np.clip(np.floor((hi_c - dom_lo) * inv_bin).astype(np.int64), 0,
                 np.asarray(dims) - 1)
    span = int((b1 - b0 + 1).max())
    # exact bin occupancy with these dims
    strides = np.cumprod((1,) + dims[:-1])
    ids = []
    from itertools import product
    for off in product(*(range(span) for _ in range(dim))):
        b = b0 + np.asarray(off)
        ok = (b <= b1).all(axis=1)
        ids.append((b[ok] * strides).sum(axis=1))
    _, counts = np.unique(np.concatenate(ids), return_counts=True)
    K = int(np.ceil(counts.max() * safety)) + (4 if safety > 1 else 0)
    span = span + (1 if safety > 1 else 0)
    return dims, span, K


def check_cell_hash_capacity(cell_verts_np, dims, span: int, K: int,
                             tol: float = 1e-10, context: str = ""):
    """Host-side check that a (deformed) configuration still fits the
    statically planned (dims, span, K) of make_cell_hash: build only
    enumerates span offsets per axis and locate reads K candidates per
    bin, so an over-stretched cell or over-crowded bin would silently
    drop candidates.  Mirrors build's binning arithmetic (static dims,
    current domain extents).  Raises RuntimeError on overflow."""
    import numpy as np
    from itertools import product

    cv = np.asarray(cell_verts_np)
    dim = cv.shape[-1]
    lo_c, hi_c = cv.min(axis=1) - tol, cv.max(axis=1) + tol
    dom_lo, dom_hi = lo_c.min(axis=0), hi_c.max(axis=0)
    inv_bin = np.asarray(dims) / np.maximum(dom_hi - dom_lo, 1e-300)
    b0 = np.clip(np.floor((lo_c - dom_lo) * inv_bin).astype(np.int64), 0,
                 np.asarray(dims) - 1)
    b1 = np.clip(np.floor((hi_c - dom_lo) * inv_bin).astype(np.int64), 0,
                 np.asarray(dims) - 1)
    need_span = int((b1 - b0 + 1).max())
    if need_span > span:
        raise RuntimeError(
            f"cell hash overflow{context}: a deformed cell spans "
            f"{need_span} bins but the static plan enumerates {span}; "
            "point location would silently miss cells.  Re-plan the hash "
            "(plan_cell_hash with a larger safety factor).")
    strides = np.cumprod((1,) + tuple(dims)[:-1])
    ids = []
    for off in product(*(range(span) for _ in range(dim))):
        b = b0 + np.asarray(off)
        ok = (b <= b1).all(axis=1)
        ids.append((b[ok] * strides).sum(axis=1))
    _, counts = np.unique(np.concatenate(ids), return_counts=True)
    need_K = int(counts.max())
    if need_K > K:
        raise RuntimeError(
            f"cell hash overflow{context}: a bin holds {need_K} cells but "
            f"the static plan reads K={K} candidates; point location "
            "would silently truncate.  Re-plan the hash with a larger "
            "safety factor.")


def make_cell_hash(n_cells: int, dims, span: int, K: int,
                   tol: float = 1e-10):
    """Uniform-grid spatial hash with fully static shapes (the TPU-native
    replacement for deal.II's CellLocator BFS, and the scalable successor
    of the all-pairs locate_points): build is a sort of n_c*span**dim keys,
    query gathers K candidate cells per point and runs the batched Newton
    inversion on (n_p, K) only — memory linear in n_p.

    Returns (build, locate): build(cell_verts) -> state (pure JAX, callable
    inside jit every step for a moving mesh); locate(state, points) ->
    (cell_idx, unit, found) with locate_points semantics (lowest containing
    cell id wins)."""
    from itertools import product

    dims = tuple(int(x) for x in dims)
    dim = len(dims)
    n_bins = 1
    strides = []
    for a in range(dim):
        strides.append(n_bins)
        n_bins *= dims[a]
    strides = jnp.asarray(strides, dtype=jnp.int64)
    dims_arr = jnp.asarray(dims, dtype=jnp.int64)
    BIG = jnp.int64(n_bins) * n_cells + n_cells  # > any valid key
    offsets = jnp.asarray(list(product(*(range(span) for _ in range(dim)))),
                          dtype=jnp.int64)  # (span**dim, dim)

    def build(cell_verts):
        lo_c = cell_verts.min(axis=1) - tol
        hi_c = cell_verts.max(axis=1) + tol
        dom_lo = lo_c.min(axis=0)
        dom_hi = hi_c.max(axis=0)
        inv_bin = dims_arr / jnp.maximum(dom_hi - dom_lo, 1e-300)
        b0 = jnp.clip(jnp.floor((lo_c - dom_lo) * inv_bin), 0,
                      dims_arr - 1).astype(jnp.int64)
        b1 = jnp.clip(jnp.floor((hi_c - dom_lo) * inv_bin), 0,
                      dims_arr - 1).astype(jnp.int64)
        b = b0[:, None, :] + offsets[None, :, :]      # (n_c, span**d, d)
        valid = jnp.all(b <= b1[:, None, :], axis=-1)
        # multiply+sum, NOT einsum/@: an s64 dot_general has no TPU
        # lowering (XLA X64 rewriting is unimplemented for integer dots)
        bin_id = (b * strides[None, None, :]).sum(axis=-1)
        cell_id = jnp.arange(n_cells, dtype=jnp.int64)[:, None]
        keys = jnp.where(valid, bin_id * n_cells + cell_id, BIG)
        sorted_keys = jnp.sort(keys.reshape(-1))
        return (sorted_keys, cell_verts, lo_c, hi_c, dom_lo, inv_bin)

    def locate(state, points):
        sorted_keys, cell_verts, lo_c, hi_c, dom_lo, inv_bin = state
        n_p = points.shape[0]
        pb = jnp.clip(jnp.floor((points - dom_lo) * inv_bin), 0,
                      dims_arr - 1).astype(jnp.int64)
        pid = (pb * strides[None, :]).sum(axis=-1)           # (n_p,)
        start = jnp.searchsorted(sorted_keys, pid * n_cells, side="left")
        take = jnp.clip(start[:, None] + jnp.arange(K), 0,
                        sorted_keys.shape[0] - 1)
        k_keys = sorted_keys[take]                           # (n_p, K)
        cand_ok = k_keys < (pid[:, None] + 1) * n_cells
        cand = jnp.where(cand_ok, k_keys - pid[:, None] * n_cells, 0)
        cand = jnp.clip(cand, 0, n_cells - 1).astype(jnp.int32)
        # Component-wise flat-batch Newton: all arrays (n_p*K,) so the
        # TPU tile padding stays O(1) (see invert_bilinear_cw docstring).
        cf = cand.reshape(-1)
        px = [jnp.broadcast_to(points[:, a, None], (n_p, K)).reshape(-1)
              for a in range(dim)]
        vx = [[cell_verts[:, v, a][cf] for a in range(dim)]
              for v in range(2 ** dim)]
        inbb = cand_ok.reshape(-1)
        for a in range(dim):
            inbb = inbb & (px[a] >= lo_c[:, a][cf]) & \
                (px[a] <= hi_c[:, a][cf])
        xi = invert_bilinear_cw(px, vx)
        inside = inbb
        for a in range(dim):
            inside = inside & (xi[a] >= -1e-8) & (xi[a] <= 1 + 1e-8)
        inside = inside.reshape(n_p, K)
        first = jnp.argmax(inside, axis=1)
        found = jnp.any(inside, axis=1)
        rows = jnp.arange(n_p)
        idx = jnp.where(found, cand[rows, first], -1)
        unit = jnp.stack(
            [jnp.clip(x.reshape(n_p, K)[rows, first], 0.0, 1.0)
             for x in xi], axis=-1)
        return idx, unit, found

    return build, locate


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
