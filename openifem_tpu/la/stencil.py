"""Structured-patch stencil SpMV: the TPU speed-of-light path.

Every production mesh in this framework is `refine_global(r)` of a small
coarse quad mesh (the reference does the same through deal.II
GridGenerator + global refinement, e.g. tests/fluid_cylinder/*.prm
"Global refinements").  That makes the fine mesh BLOCK-STRUCTURED: each
coarse cell is an m x m patch (m = 2^r) of cells laid out in z-order,
and a Q_k FEM operator restricted to a patch is a dense (2k+1)^2-point
stencil on a regular (k*m+1)^2 node grid.

The element-block SpMV (la/operators.py) is index-traffic bound on TPU
(measured ~5 ms per velocity matvec at cylinder refine=4 vs a ~0.1 ms
bandwidth floor).  This module removes the gather/scatter entirely for
the structured bulk.  Measured on v5e at refine=4 (Q2, d=2, 23.5k
cells): element 5.1 ms -> 2.3 ms full stencil apply.

TPU-first layout (all shapes chosen for the (8, 128) VREG tiling):

 * Patch vectors are (d, n_p, M) with M = Gp*Gp, Gp = G + 2k the
   zero-BORDERED node grid, flattened per patch.  The large M axis sits
   on the lanes; the tiny d axis is OUTERMOST (a d-last layout wastes
   126 of 128 lanes — measured 3x slower).
 * The stencil tensor is W[(2k+1)^2, d, d, n_p, M]; an apply is S^2
   shifted CONTIGUOUS slices of a front/back-guarded copy of x, each
   fused into a (d x d) multiply-add over the whole (n_p, M) plane —
   pure VPU work, no gather, no scatter:

       y[a, p, m] = sum_{s, b}  W[s, a, b, p, m] * xg[b, p, m + off(s)]

   Entries that would reach outside a patch are structurally ZERO in W
   (only own-patch contributions are accumulated), so the guard reads
   contribute nothing.
 * Nodes shared between patches are stored once per incident patch;
   after an apply, a GATHER-ONLY combine sums the copies: a fixed-width
   duplicate table (n_shared, max_copies) -> row-sum -> select
   write-back through a seg-of-slot map.  No scatter: TPU scatters
   serialize (the scatter-based combine alone measured 2.1 ms — as much
   as the whole matvec).

Krylov solves run directly in the duplicated patch layout with
OWNERSHIP-WEIGHTED inner products (each physical node counted once,
duplicates and pad slots weighted 0), which keeps CG/FGMRES exactly
equivalent to the flat solve in exact arithmetic (la/krylov.py
`weight=`).

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
    (v0->v2); patches may be RECTANGULAR (mi x mj cells).  Built by
    z-order digit decoding of the refinement history (children are
    appended 4-per-cell in deal.II z-order by mesh._refine_2d) and
    VERIFIED topologically; returns None from `build` when the mesh is
    not patch-structured (mixed levels, or the decode fails
    verification).

    When the coarse cells themselves form one rectangular grid (every
    `subdivided_hyper_rectangle` / `hyper_cube` mesh), the patches are
    MERGED into a single global super-patch: no shared nodes, no
    duplication, combine-free stencil applies (the combine gathers cost
    as much as the matvec itself in the many-small-patches regime).
    The merge is discovered from patch adjacency and re-verified, so an
    irregular coarse topology (e.g. the Turek cylinder grid) silently
    keeps the multi-patch layout.
    """

    def __init__(self, mi: int, mj: int, cell_of: np.ndarray):
        self.mi = mi
        self.mj = mj
        self.n_patches = cell_of.shape[0]
        self.cell_of = cell_of

    @staticmethod
    def _verify(cells, cell_of) -> bool:
        """Neighbors in the patch grid must share the matching vertex
        pairs (z-order cell vertex convention)."""
        a = cell_of[:, :-1, :].reshape(-1)
        b = cell_of[:, 1:, :].reshape(-1)
        if a.size and not (np.array_equal(cells[a][:, 1], cells[b][:, 0])
                           and np.array_equal(cells[a][:, 3],
                                              cells[b][:, 2])):
            return False
        a = cell_of[:, :, :-1].reshape(-1)
        b = cell_of[:, :, 1:].reshape(-1)
        if a.size and not (np.array_equal(cells[a][:, 2], cells[b][:, 0])
                           and np.array_equal(cells[a][:, 3],
                                              cells[b][:, 1])):
            return False
        return True

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
        cells = np.asarray(mesh.cells)
        if not PatchGrid._verify(cells, cell_of):
            return None
        merged = PatchGrid._try_merge(cells, cell_of, m)
        if merged is not None:
            return merged
        return PatchGrid(m, m, cell_of)

    @staticmethod
    def _try_merge(cells, cell_of, m) -> Optional["PatchGrid"]:
        """Arrange the patches into one rectangular super-patch if their
        adjacency forms a perfect grid with consistent orientation."""
        n_p = cell_of.shape[0]
        if n_p == 1:
            return PatchGrid(m, m, cell_of)
        # +x neighbor: q whose left-edge first cell shares p's right-edge
        # first cell's (v1, v3) as its (v0, v2); +y via (v2, v3)/(v0, v1)
        left_key = {}
        bot_key = {}
        for p in range(n_p):
            c = cells[cell_of[p, 0, 0]]
            left_key[(c[0], c[2])] = p
            bot_key[(c[0], c[1])] = p
        px = np.full(n_p, -1, np.int64)
        py = np.full(n_p, -1, np.int64)
        for p in range(n_p):
            c = cells[cell_of[p, -1, 0]]
            px[p] = left_key.get((c[1], c[3]), -1)
            c = cells[cell_of[p, 0, -1]]
            py[p] = bot_key.get((c[2], c[3]), -1)
        starts = [p for p in range(n_p)
                  if p not in set(px[px >= 0]) and p not in set(py[py >= 0])]
        if len(starts) != 1:
            return None
        # walk the grid
        rows = []
        row_start = starts[0]
        seen = set()
        while row_start != -1:
            row = []
            p = row_start
            while p != -1:
                if p in seen:
                    return None
                seen.add(p)
                row.append(p)
                p = px[p]
            rows.append(row)
            row_start = py[row_start]
        if len(seen) != n_p or any(len(r) != len(rows[0]) for r in rows):
            return None
        nx, ny = len(rows[0]), len(rows)
        pos = np.array(rows, dtype=np.int64)        # (ny, nx)
        mc = np.zeros((1, nx * m, ny * m), dtype=np.int64)
        for iy in range(ny):
            for ix in range(nx):
                mc[0, ix * m:(ix + 1) * m, iy * m:(iy + 1) * m] = \
                    cell_of[pos[iy, ix]]
        if not PatchGrid._verify(cells, mc):
            return None
        return PatchGrid(nx * m, ny * m, mc)


class StencilOperator:
    """Q_k stencil operator on a PatchGrid for d-vector nodal fields.

    Host-built static tables; `build_weights` (jit-safe) turns per-Newton
    element node-blocks into the stencil tensor; `matvec` applies it.

    Patch vectors are flat (d * n_p * M) in the d-first bordered layout
    (module docstring).  `spread`/`unspread` convert to/from flat global
    node vectors; `weight` is the ownership mask for weighted inner
    products; `spread_blockdiag` lifts a nodal (d x d) block-Jacobi into
    the layout.
    """

    def __init__(self, grid: PatchGrid, space, d: int = 1):
        k = space.degree
        mi, mj = grid.mi, grid.mj
        Gi, Gj = k * mi + 1, k * mj + 1
        n_p = grid.n_patches
        nl = (k + 1) ** 2
        cd = np.asarray(space.cell_dofs)
        if cd.shape[1] != nl:
            raise ValueError("space/degree mismatch")

        # node grid: (p, gi, gj) -> global node id.  Local Q_k node l at
        # (a, b) with l = b*(k+1)+a (lexicographic, x fastest; fe/space.py)
        node_grid = np.full((n_p, Gi, Gj), -1, dtype=np.int64)
        aa, bb = np.meshgrid(np.arange(k + 1), np.arange(k + 1),
                             indexing="ij")
        ll = (bb * (k + 1) + aa).reshape(-1)
        for ci in range(mi):
            for cj in range(mj):
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

        Gpi, Gpj = Gi + 2 * k, Gj + 2 * k
        M = Gpi * Gpj
        Np = n_p * M
        n_nodes = space.n_nodes

        # interior slot index (into the per-patch bordered M grid) of
        # node (p, i, j): m = (i+k)*Gpj + (j+k)
        pm = ((np.arange(Gi)[:, None] + k) * Gpj
              + (np.arange(Gj)[None, :] + k))
        slot_of = (np.arange(n_p)[:, None, None] * M
                   + pm[None]).reshape(-1)          # (n_p*Gi*Gj,)
        flat_nodes = node_grid.reshape(-1)

        # pad_node: (n_p, M) node id per slot, sentinel n_nodes at borders
        pad_node = np.full(Np, n_nodes, dtype=np.int64)
        pad_node[slot_of] = flat_nodes

        # ownership: first occurrence of each node (among interior slots)
        uniq, first_idx = np.unique(flat_nodes, return_index=True)
        assert uniq.size == n_nodes, "grid does not cover all nodes"
        first_slot = np.zeros(n_nodes, dtype=np.int64)
        first_slot[uniq] = slot_of[first_idx]
        own = np.zeros(Np, dtype=bool)
        own[slot_of[first_idx]] = True

        # gather-only combine tables: fixed-width duplicate list + a
        # seg-of-slot select map (no scatter — TPU scatters serialize)
        counts = np.bincount(flat_nodes, minlength=n_nodes)
        dup_nodes = np.where(counts > 1)[0]
        n_sh = dup_nodes.size
        maxc = int(counts.max()) if n_sh else 1
        node_to_seg = np.full(n_nodes, -1, np.int64)
        node_to_seg[dup_nodes] = np.arange(n_sh)
        # tab padded with slot 0 — always a border slot (k >= 1), which a
        # matvec leaves exactly zero (W has no entries on border rows)
        tab = np.zeros((max(n_sh, 1), maxc), np.int64)
        fill = np.zeros(max(n_sh, 1), np.int64)
        segs = node_to_seg[flat_nodes]
        for s_i, g in zip(slot_of, segs):
            if g >= 0:
                tab[g, fill[g]] = s_i
                fill[g] += 1
        seg_of = np.zeros(Np, np.int64)
        is_dup = np.zeros(Np, bool)
        md = segs >= 0
        seg_of[slot_of[md]] = segs[md]
        is_dup[slot_of[md]] = True

        self.space = space
        self.grid = grid
        self.k, self.d = k, d
        self.mi, self.mj = mi, mj
        self.Gi, self.Gj = Gi, Gj
        self.Gpi, self.Gpj, self.M = Gpi, Gpj, M
        self.n_p = n_p
        self.n_nodes = n_nodes
        self.n_slots = d * Np
        self.node_grid = jnp.asarray(node_grid, dtype=jnp.int32)
        self._own = own
        self.pad_node = jnp.asarray(pad_node, dtype=jnp.int32)
        self.first_slot = jnp.asarray(first_slot, dtype=jnp.int32)
        self.comb_tab = jnp.asarray(tab, dtype=jnp.int32)
        self.comb_seg = jnp.asarray(seg_of, dtype=jnp.int32)
        self.comb_dup = jnp.asarray(is_dup)
        self.n_shared = n_sh
        self.perm_cells = jnp.asarray(grid.cell_of, dtype=jnp.int32)
        # guard width so slice s starts at si*Gpj + sj and reads the
        # (i + si - k, j + sj - k) neighbor of every output node
        self.F = k * Gpj + k

    # -- layout maps ----------------------------------------------------
    def weight(self, dtype=jnp.float32):
        """Ownership weights (1 owned / 0 duplicate or pad), flat
        (n_slots,)."""
        w = jnp.asarray(self._own, dtype=dtype)
        return jnp.broadcast_to(w[None], (self.d, w.shape[0])).reshape(-1)

    def spread(self, x):
        """Global flat (n_nodes*d,) -> patch flat (n_slots,)."""
        v = x.reshape(self.n_nodes, self.d).T          # (d, n_nodes)
        v = jnp.concatenate(
            [v, jnp.zeros((self.d, 1), v.dtype)], axis=1)
        return v[:, self.pad_node].reshape(-1)

    def spread_mask(self, mask):
        """Boolean/float per-dof mask -> flat patch layout (n_slots,);
        pad slots get 0/False."""
        return self.spread(mask)

    def unspread(self, X):
        """Patch flat -> global flat, reading the owning copy."""
        v = X.reshape(self.d, -1)[:, self.first_slot]  # (d, n_nodes)
        return v.T.reshape(-1)

    def spread_blockdiag(self, D):
        """Nodal (n_nodes, d, d) block-Jacobi -> apply closure on flat
        patch vectors (pad slots pass through zero inputs unchanged)."""
        d = self.d
        Dp = jnp.concatenate(
            [D, jnp.eye(d, dtype=D.dtype)[None]], axis=0)
        Dt = Dp[self.pad_node].transpose(2, 3, 0, 1)   # (d, d, Np)

        def apply(r):
            R = r.reshape(d, -1)
            y = jnp.einsum("abn,bn->an", Dt, R,
                           preferred_element_type=r.dtype)
            return y.reshape(-1)
        return apply

    # -- per-Newton weight build ----------------------------------------
    def build_weights(self, Ab):
        """Element node-blocks (n_c, nl, d, nl, d) -> stencil tensor
        (S*S, d, d, n_p, M), own-patch contributions only, zero on the
        k-wide border rows.

        jit-safe and scatter-free: accumulation happens in PHASE-MAJOR
        coordinates (node i = k*ci + a stored at [a % k, ci + a // k]),
        where every one of the (k+1)^4 slice-adds is CONTIGUOUS (the
        grid-layout build needed stride-k slice writes, which XLA lowers
        to scatters — 5x slower on a merged super-patch and heavy enough
        to crash the remote compiler inside a fused solver graph); one
        dense transpose/reshape interleaves the phases back to the
        bordered grid layout at the end."""
        k, d, n_p = self.k, self.d, self.n_p
        mi, mj, Gi, Gj = self.mi, self.mj, self.Gi, self.Gj
        S = 2 * k + 1
        Ec = Ab[self.perm_cells.reshape(-1)].reshape(
            n_p, mi, mj, (k + 1) ** 2, d, (k + 1) ** 2, d)
        Wph = jnp.zeros((S, S, d, d, n_p, k, mi + 1, k, mj + 1),
                        dtype=Ab.dtype)
        for a in range(k + 1):
            ai, ao = a % k, a // k       # phase row, cell offset
            for b in range(k + 1):
                bi, bo = b % k, b // k
                l1 = b * (k + 1) + a
                for a2 in range(k + 1):
                    for b2 in range(k + 1):
                        l2 = b2 * (k + 1) + a2
                        blk = Ec[:, :, :, l1, :, l2, :]  # (np,mi,mj,d,d)
                        Wph = Wph.at[a2 - a + k, b2 - b + k, :, :, :,
                                     ai, ao:ao + mi, bi,
                                     bo:bo + mj].add(
                            blk.transpose(3, 4, 0, 1, 2))
        # interleave phases -> grid rows i = k*ci' + a' (ci' major),
        # trim the phase padding to (Gi, Gj), add the k-wide border
        Wg = Wph.transpose(0, 1, 2, 3, 4, 6, 5, 8, 7).reshape(
            S, S, d, d, n_p, k * (mi + 1), k * (mj + 1))[..., :Gi, :Gj]
        Wg = jnp.pad(Wg, ((0, 0),) * 5 + ((k, k), (k, k)))
        return Wg.reshape(S * S, d, d, n_p, self.M)

    # -- apply ------------------------------------------------------------
    def combine(self, Y):
        """Sum duplicated copies of shared nodes and write the total back
        into every copy.  Y: (n_slots,) flat patch vector.  Gather-only:
        fixed-width duplicate table row-sum + seg-of-slot select.
        Identity for a merged single-patch grid (no shared nodes)."""
        if self.n_shared == 0:
            return Y
        v = Y.reshape(self.d, -1)
        tot = v[:, self.comb_tab].sum(axis=2)          # (d, n_shared)
        out = jnp.where(self.comb_dup[None], tot[:, self.comb_seg], v)
        return out.reshape(-1)

    def matvec(self, W, x):
        """y = A x in patch layout (both flat (n_slots,))."""
        k, Gpj, M, d, n_p = self.k, self.Gpj, self.M, self.d, self.n_p
        S = 2 * k + 1
        X = x.reshape(d, n_p, M)
        Xg = jnp.pad(X, ((0, 0), (0, 0), (self.F, self.F)))
        y = jnp.zeros((d, n_p, M), x.dtype)
        for si in range(S):
            for sj in range(S):
                win = jax.lax.dynamic_slice_in_dim(
                    Xg, si * Gpj + sj, M, axis=2)
                y = y + jnp.einsum("abpm,bpm->apm", W[si * S + sj], win,
                                   preferred_element_type=x.dtype)
        return self.combine(y.reshape(-1))

    def condensed_matvec(self, W, fixed_patch, x):
        """Constraint-condensed apply (Dirichlet-only meshes): identity on
        fixed dofs, fixed columns zeroed — matches
        Constraints.wrap_operator for any_hanging == False.
        fixed_patch: flat (n_slots,) bool (spread_mask of cons.fixed)."""
        xz = jnp.where(fixed_patch, 0.0, x)
        y = self.matvec(W, xz)
        return jnp.where(fixed_patch, x, y)
