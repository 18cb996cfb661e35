"""Structured-patch stencil SpMV: the TPU speed-of-light path.

Every production mesh in this framework is `refine_global(r)` of a small
coarse quad mesh (the reference does the same through deal.II
GridGenerator + global refinement, e.g. tests/fluid_cylinder/*.prm
"Global refinements").  That makes the fine mesh BLOCK-STRUCTURED: each
coarse cell is an m x m patch (m = 2^r) of cells laid out in z-order,
and a Q_k FEM operator restricted to a patch is a dense (2k+1)^2-point
stencil on a regular (k*m+1)^2 node grid.

The element-block SpMV (la/operators.py) is index-traffic bound on TPU
(measured ~50-70x off the bandwidth roofline at cylinder sizes — see
la/pallas_ops.py and BENCH_DETAILS.json round 4: ~2.9 ms per velocity
matvec at refine=4 vs a ~0.1 ms floor).  This module removes the
gather/scatter entirely for the structured bulk:

  y[p, i, j] = sum_{|di|,|dj| <= k}  W[p, i, j, di, dj] @ x[p, i+di, j+dj]

— shifted CONTIGUOUS reads of a dense weight tensor, pure VPU/MXU work.
Nodes shared between patches are stored once per incident patch
(duplicated copies); each patch's stencil carries only own-patch
contributions, and a small combine (gather over ~4G slots/patch +
sorted segment-sum + unique-index scatter) sums the partial results of
the copies after every apply.  Patch connectivity can be arbitrary
(irregular coarse vertices, curved manifolds): the combine is purely
node-identity based.

Krylov solves run directly in the duplicated patch layout with
OWNERSHIP-WEIGHTED inner products (each physical node counted once),
which keeps CG/FGMRES exactly equivalent to the flat solve in exact
arithmetic (la/krylov.py `weight=`).

Build cost: the per-Newton element->stencil transform is (k+1)^4 strided
slice-adds (dense, no scatter), amortized over the O(100) matvecs of an
inner Krylov solve.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class PatchGrid:
    """Structured-patch view of a uniformly refine_global'd mesh.

    cell_of[p, i, j] = fine-cell index of patch p at patch coords (i, j),
    with i along the coarse cell's local x (v0->v1) and j along y
    (v0->v2).  Built by z-order digit decoding of the refinement history
    (children are appended 4-per-cell in deal.II z-order by
    mesh._refine_2d) and VERIFIED topologically; returns None from
    `build` when the mesh is not patch-structured (mixed levels, or the
    decode fails verification).
    """

    def __init__(self, m: int, cell_of: np.ndarray):
        self.m = m
        self.n_patches = cell_of.shape[0]
        self.cell_of = cell_of

    @staticmethod
    def build(mesh) -> Optional["PatchGrid"]:
        if mesh.dim != 2 or mesh.n_cells == 0:
            return None
        lev = np.asarray(mesh.level)
        r = int(lev[0])
        if r < 0 or np.any(lev != r):
            return None
        m = 1 << r
        if mesh.n_cells % (m * m):
            return None
        n_p = mesh.n_cells // (m * m)
        # z-order decode: q's base-4 digits, most-significant = first
        # refinement round; each digit's bit0 -> x, bit1 -> y
        q = np.arange(m * m)
        i = np.zeros(m * m, dtype=np.int64)
        j = np.zeros(m * m, dtype=np.int64)
        for t in range(r):
            z = (q >> (2 * (r - 1 - t))) & 3
            i = (i << 1) | (z & 1)
            j = (j << 1) | ((z >> 1) & 1)
        cell_of = np.zeros((n_p, m, m), dtype=np.int64)
        cell_of[:, i, j] = (np.arange(n_p)[:, None] * (m * m) + q[None, :])
        # topological verification: neighbors in the patch grid must share
        # the matching vertex pairs (z-order cell vertex convention)
        cells = np.asarray(mesh.cells)
        a = cell_of[:, :-1, :].reshape(-1)
        b = cell_of[:, 1:, :].reshape(-1)
        if a.size and not (np.array_equal(cells[a][:, 1], cells[b][:, 0])
                           and np.array_equal(cells[a][:, 3],
                                              cells[b][:, 2])):
            return None
        a = cell_of[:, :, :-1].reshape(-1)
        b = cell_of[:, :, 1:].reshape(-1)
        if a.size and not (np.array_equal(cells[a][:, 2], cells[b][:, 0])
                           and np.array_equal(cells[a][:, 3],
                                              cells[b][:, 1])):
            return None
        return PatchGrid(m, cell_of)


class StencilOperator:
    """Q_k stencil operator on a PatchGrid for d-vector nodal fields.

    Host-built static tables; `build_weights` (jit-safe) turns per-Newton
    element node-blocks into the stencil tensor; `matvec` applies it.

    Layout: patch vectors are (n_p, G, G, d) with G = k*m + 1, flattened
    to 1D for the Krylov drivers.  `spread`/`unspread` convert to/from
    flat global node vectors; `weight` is the ownership mask for
    weighted inner products.
    """

    def __init__(self, grid: PatchGrid, space, d: int = 1):
        k = space.degree
        m = grid.m
        G = k * m + 1
        n_p = grid.n_patches
        nl = (k + 1) ** 2
        cd = np.asarray(space.cell_dofs)
        if cd.shape[1] != nl:
            raise ValueError("space/degree mismatch")

        # node grid: (p, gi, gj) -> global node id.  Local Q_k node l at
        # (a, b) with l = b*(k+1)+a (lexicographic, x fastest; fe/space.py)
        node_grid = np.full((n_p, G, G), -1, dtype=np.int64)
        aa, bb = np.meshgrid(np.arange(k + 1), np.arange(k + 1),
                             indexing="ij")
        ll = (bb * (k + 1) + aa).reshape(-1)
        for ci in range(m):
            for cj in range(m):
                cells = grid.cell_of[:, ci, cj]
                sub = cd[cells][:, ll].reshape(n_p, k + 1, k + 1)
                tgt = node_grid[:, k * ci:k * ci + k + 1,
                                k * cj:k * cj + k + 1]
                filled = tgt >= 0
                if not np.array_equal(tgt[filled],
                                      sub[filled]):
                    raise AssertionError("inconsistent patch node grid")
                node_grid[:, k * ci:k * ci + k + 1,
                          k * cj:k * cj + k + 1] = sub
        assert (node_grid >= 0).all()

        flat = node_grid.reshape(-1)
        n_nodes = space.n_nodes
        # ownership: first occurrence of each node
        first = np.zeros(n_nodes, dtype=np.int64)
        seen = np.zeros(n_nodes, dtype=bool)
        own = np.zeros(flat.shape[0], dtype=bool)
        order = np.arange(flat.shape[0])
        # vectorized first-occurrence
        uniq, first_idx = np.unique(flat, return_index=True)
        assert uniq.size == n_nodes, "grid does not cover all nodes"
        own[first_idx] = True
        first[uniq] = first_idx
        seen = None  # noqa: F841

        counts = np.bincount(flat, minlength=n_nodes)
        dup_nodes = np.where(counts > 1)[0]
        # duplicated slots, grouped by node (sorted segment ids)
        dup_mask = counts[flat] > 1
        dup_slots = np.where(dup_mask)[0]
        o = np.argsort(flat[dup_slots], kind="stable")
        dup_slots = dup_slots[o]
        seg_ids = np.searchsorted(dup_nodes, flat[dup_slots])

        self.space = space
        self.grid = grid
        self.k, self.m, self.G, self.d = k, m, G, d
        self.n_p = n_p
        self.n_nodes = n_nodes
        self.node_grid = jnp.asarray(node_grid, dtype=jnp.int32)
        self.own_np = own.reshape(n_p, G, G)
        self.first_slot = jnp.asarray(first, dtype=jnp.int32)
        self.dup_slots = jnp.asarray(dup_slots, dtype=jnp.int32)
        self.dup_seg = jnp.asarray(seg_ids, dtype=jnp.int32)
        self.n_shared = int(dup_nodes.size)
        self.perm_cells = jnp.asarray(grid.cell_of, dtype=jnp.int32)
        self.n_slots = n_p * G * G * d

    # -- layout maps ----------------------------------------------------
    def weight(self, dtype=jnp.float32):
        """Ownership weights (1 owned / 0 duplicate), flat (n_slots,)."""
        w = jnp.asarray(self.own_np, dtype=dtype)
        return jnp.broadcast_to(w[..., None],
                                (*w.shape, self.d)).reshape(-1)

    def spread(self, x):
        """Global flat (n_nodes*d,) -> patch flat (n_slots,)."""
        v = x.reshape(self.n_nodes, self.d)
        return v[self.node_grid.reshape(-1)].reshape(-1)

    def spread_mask(self, mask):
        """Boolean/float per-dof mask -> patch layout (non-flattened d)."""
        v = mask.reshape(self.n_nodes, self.d)
        return v[self.node_grid.reshape(-1)].reshape(
            self.n_p, self.G, self.G, self.d)

    def unspread(self, X):
        """Patch flat -> global flat, reading the owning copy."""
        v = X.reshape(-1, self.d)
        return v[self.first_slot].reshape(-1)

    # -- per-Newton weight build ----------------------------------------
    def build_weights(self, Ab):
        """Element node-blocks (n_c, nl, d, nl, d) -> stencil tensor
        (n_p, G, G, 2k+1, 2k+1, d, d), own-patch contributions only.
        jit-safe: (k+1)^4 strided slice-adds, no scatter."""
        k, m, G, d, n_p = self.k, self.m, self.G, self.d, self.n_p
        S = 2 * k + 1
        Ec = Ab[self.perm_cells.reshape(-1)].reshape(
            n_p, m, m, (k + 1) ** 2, d, (k + 1) ** 2, d)
        W = jnp.zeros((n_p, G, G, S, S, d, d), dtype=Ab.dtype)
        for a in range(k + 1):
            si = slice(a, k * (m - 1) + a + 1, k)
            for b in range(k + 1):
                sj = slice(b, k * (m - 1) + b + 1, k)
                l1 = b * (k + 1) + a
                for a2 in range(k + 1):
                    for b2 in range(k + 1):
                        l2 = b2 * (k + 1) + a2
                        W = W.at[:, si, sj, a2 - a + k, b2 - b + k].add(
                            Ec[:, :, :, l1, :, l2, :])
        return W

    # -- apply ------------------------------------------------------------
    def combine(self, Y):
        """Sum duplicated copies of shared nodes and write the total back
        into every copy.  Y: (n_slots,) flat patch vector."""
        v = Y.reshape(-1, self.d)
        vals = v[self.dup_slots]
        sums = jax.ops.segment_sum(vals, self.dup_seg,
                                   num_segments=self.n_shared,
                                   indices_are_sorted=True)
        v = v.at[self.dup_slots].set(sums[self.dup_seg],
                                     unique_indices=True)
        return v.reshape(-1)

    def matvec(self, W, x):
        """y = A x in patch layout (both flat (n_slots,))."""
        k, G, d, n_p = self.k, self.G, self.d, self.n_p
        S = 2 * k + 1
        X = x.reshape(n_p, G, G, d)
        Xp = jnp.pad(X, ((0, 0), (k, k), (k, k), (0, 0)))
        # windows: (n_p, G, G, S*S, d) contiguous slices
        win = jnp.stack([Xp[:, oi:oi + G, oj:oj + G]
                         for oi in range(S) for oj in range(S)], axis=3)
        Y = jnp.einsum("pijoab,pijob->pija",
                       W.reshape(n_p, G, G, S * S, d, d), win,
                       preferred_element_type=x.dtype)
        return self.combine(Y.reshape(-1))

    def condensed_matvec(self, W, fixed_patch, x):
        """Constraint-condensed apply (Dirichlet-only meshes): identity on
        fixed dofs, fixed columns zeroed — matches
        Constraints.wrap_operator for any_hanging == False.
        fixed_patch: (n_p, G, G, d) bool (spread_mask of cons.fixed)."""
        xz = jnp.where(fixed_patch.reshape(-1), 0.0, x)
        y = self.matvec(W, xz)
        return jnp.where(fixed_patch.reshape(-1), x, y)
