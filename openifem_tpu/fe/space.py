"""Scalar Q_k FE spaces and mixed systems on a Mesh.

Replaces deal.II DoFHandler/FESystem (reference: source/fluid_solver.cpp:39-64,
source/solid_solver.cpp:36-86).  Nodes are topological entities (vertices,
edge/face/cell interior nodes); per-cell dof index arrays feed the batched
assembly kernels.  Hanging-node constraints on 1-irregular meshes are built
geometrically and exported as (master-indices, weights) tables consumed by the
constraint projection operators in la/constraints.py.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..mesh.mesh import FACE_VERTICES, Mesh
from .shapes import QkShapes


def _lagrange_1d_uniform(k: int):
    """lag(i, x): the i-th 1D Lagrange basis on uniform nodes {j/k},
    evaluated at x — degree-generic (hanging-node interpolation weights
    for any Q_k)."""
    nodes = np.arange(k + 1) / k if k > 0 else np.zeros(1)

    def lag(i: int, x: float) -> float:
        w = 1.0
        for j in range(k + 1):
            if j != i:
                w *= (x - nodes[j]) / (nodes[i] - nodes[j])
        return w

    return lag


class FESpace:
    """Scalar continuous Q_k space, degree-generic (the reference's FE
    degree is a free parameter, include/parameters.h FluidFESystem /
    SolidFESystem).  k > 2 uses canonically oriented shared-entity
    numbering (edge: min->max vertex id; face: min-id corner origin,
    s-axis toward its smaller-id neighbor).  Hanging-node constraints on
    1-irregular meshes are degree-generic too: fine nodes on a
    nonconforming coarse edge/face interpolate the coarse entity's own
    nodes with uniform-node Lagrange weights (deal.II:
    DoFTools::make_hanging_node_constraints)."""

    def __init__(self, mesh: Mesh, degree: int):
        assert degree >= 1
        self.mesh = mesh
        self.degree = degree
        self.dim = mesh.dim
        self.shapes = QkShapes(degree, mesh.dim)
        self._build_nodes()
        self._build_hanging_constraints()

    # ------------------------------------------------------------------
    def _build_nodes(self):
        mesh, k, dim = self.mesh, self.degree, self.dim
        n1 = k + 1
        nl = n1 ** dim
        n_c = mesh.n_cells

        # fast path: native C++ dof numbering (openifem_tpu/native)
        from ..native import build_cell_dofs as _native_cell_dofs
        native = _native_cell_dofs(mesh.cells, dim, k, mesh.n_vertices)
        if native is not None:
            self.cell_dofs, self.n_nodes = native
            self._finish_nodes()
            return

        # entity tables
        edge_ids: Dict[Tuple[int, int], int] = {}
        face_ids: Dict[frozenset, int] = {}
        n_nodes = mesh.n_vertices  # vertex nodes first, same ids as vertices
        cell_dofs = np.zeros((n_c, nl), dtype=np.int64)
        local_unit = self.shapes.local_nodes()  # (nl, dim)

        # classify each local node once
        local_kind = []  # (kind, data) per local index
        for l in range(nl):
            idx = []
            rem = l
            for _ in range(dim):
                idx.append(rem % n1)
                rem //= n1
            interior_axes = [d for d in range(dim) if 0 < idx[d] < k]
            local_kind.append((idx, interior_axes))

        def vertex_local(idx):
            # which cell vertex (z-order bit) for an endpoint lattice index
            b = 0
            for d in range(dim):
                if idx[d] == k:
                    b |= (1 << d)
            return b

        per_edge = k - 1
        per_face = per_edge * per_edge
        per_cell = per_edge ** dim
        if k >= 2:
            # allocate edge (and 3D face) node BASES; entities with more
            # than one interior node (k > 2) are ordered in a canonical
            # frame from global vertex ids so neighbor cells agree
            for c in range(n_c):
                v = mesh.cells[c]
                for l, (idx, inter) in enumerate(local_kind):
                    if len(inter) == 1:
                        d = inter[0]
                        lo = list(idx)
                        hi = list(idx)
                        lo[d], hi[d] = 0, k
                        a = int(v[vertex_local(lo)])
                        b = int(v[vertex_local(hi)])
                        key = (min(a, b), max(a, b))
                        if key not in edge_ids:
                            edge_ids[key] = n_nodes
                            n_nodes += per_edge
            if dim == 3:
                for c in range(n_c):
                    v = mesh.cells[c]
                    for f in range(6):
                        key = frozenset(int(v[x]) for x in FACE_VERTICES[3][f])
                        if key not in face_ids:
                            face_ids[key] = n_nodes
                            n_nodes += per_face
            cell_interior_start = n_nodes
            n_nodes += n_c * per_cell

        # fill cell_dofs
        for c in range(n_c):
            v = mesh.cells[c]
            for l, (idx, inter) in enumerate(local_kind):
                if len(inter) == 0:
                    cell_dofs[c, l] = v[vertex_local(idx)]
                elif len(inter) == 1:
                    d = inter[0]
                    lo = list(idx)
                    hi = list(idx)
                    lo[d], hi[d] = 0, k
                    a = int(v[vertex_local(lo)])
                    b = int(v[vertex_local(hi)])
                    pos = idx[d] if a < b else k - idx[d]
                    cell_dofs[c, l] = \
                        edge_ids[(min(a, b), max(a, b))] + pos - 1
                elif len(inter) == 2 and dim == 3:
                    d1, d2 = inter
                    d_fix = 3 - d1 - d2
                    f = 2 * d_fix + (1 if idx[d_fix] == k else 0)
                    key = frozenset(int(v[x]) for x in FACE_VERTICES[3][f])
                    # face corners in local (u=axis d1, w=axis d2) coords
                    cu, cw = (0, k, 0, k), (0, 0, k, k)
                    cid = []
                    for q in range(4):
                        ii = list(idx)
                        ii[d1], ii[d2] = cu[q], cw[q]
                        cid.append(int(v[vertex_local(ii)]))
                    nbr = ((1, 2), (0, 3), (3, 0), (2, 1))
                    o = int(np.argmin(cid))
                    sn, tn = nbr[o]
                    if cid[sn] > cid[tn]:
                        sn, tn = tn, sn
                    pu, pw = idx[d1], idx[d2]
                    s = ((pu - cu[o]) * (cu[sn] - cu[o]) +
                         (pw - cw[o]) * (cw[sn] - cw[o])) // k
                    t = ((pu - cu[o]) * (cu[tn] - cu[o]) +
                         (pw - cw[o]) * (cw[tn] - cw[o])) // k
                    cell_dofs[c, l] = face_ids[key] + \
                        (s - 1) + per_edge * (t - 1)
                else:
                    off, stride = 0, 1
                    for d in inter:
                        off += stride * (idx[d] - 1)
                        stride *= per_edge
                    cell_dofs[c, l] = cell_interior_start + \
                        c * per_cell + off

        self.n_nodes = n_nodes
        self.cell_dofs = cell_dofs
        self._finish_nodes()

    def _finish_nodes(self):
        mesh, k, dim = self.mesh, self.degree, self.dim
        n1 = k + 1
        nl = n1 ** dim
        cell_dofs = self.cell_dofs
        n_nodes = self.n_nodes
        local_unit = self.shapes.local_nodes()
        local_kind = []
        for l in range(nl):
            idx = []
            rem = l
            for _ in range(dim):
                idx.append(rem % n1)
                rem //= n1
            interior_axes = [d for d in range(dim) if 0 < idx[d] < k]
            local_kind.append((idx, interior_axes))

        # node physical positions via the (bi/tri)linear geometry map
        geo = QkShapes(1, dim)
        Ng, _ = geo.evaluate(local_unit)  # (nl, 2**dim)
        pos = np.zeros((n_nodes, dim))
        cv = mesh.vertices[mesh.cells]  # (n_c, 2**dim, dim)
        cell_node_pos = np.einsum("lv,cvd->cld", Ng, cv)
        pos[cell_dofs.ravel()] = cell_node_pos.reshape(-1, dim)
        self.node_points = pos

        # boundary structure: for each boundary face, the local node indices
        face_local_nodes = []
        for f in range(2 * dim):
            d_fix = f // 2
            val = 0 if f % 2 == 0 else k
            lset = [l for l, (idx, _) in enumerate(local_kind)
                    if idx[d_fix] == val]
            face_local_nodes.append(lset)
        self.face_local_nodes = face_local_nodes

    def boundary_nodes(self, ids) -> np.ndarray:
        """Global node ids whose support point lies on boundary faces with
        the given boundary ids."""
        mesh = self.mesh
        out = set()
        for c in range(mesh.n_cells):
            for f in range(2 * mesh.dim):
                if mesh.boundary_id[c, f] in ids:
                    for l in self.face_local_nodes[f]:
                        out.add(int(self.cell_dofs[c, l]))
        return np.array(sorted(out), dtype=np.int64)

    def boundary_node_map(self) -> Dict[int, np.ndarray]:
        """boundary id -> node ids."""
        mesh = self.mesh
        tmp: Dict[int, set] = {}
        for c in range(mesh.n_cells):
            for f in range(2 * mesh.dim):
                b = int(mesh.boundary_id[c, f])
                if b >= 0:
                    s = tmp.setdefault(b, set())
                    for l in self.face_local_nodes[f]:
                        s.add(int(self.cell_dofs[c, l]))
        return {b: np.array(sorted(s), dtype=np.int64)
                for b, s in tmp.items()}

    # ------------------------------------------------------------------
    def _build_hanging_constraints(self):
        """Geometric hanging-node constraints for 1-irregular 2D meshes.

        Each constrained node value = sum_i w_i * value(master_i).
        deal.II equivalent: DoFTools::make_hanging_node_constraints
        (reference: source/fluid_solver.cpp:70-71)."""
        mesh, k = self.mesh, self.degree
        self.hanging: List[Tuple[int, List[int], List[float]]] = []
        if mesh.level.max() == mesh.level.min():
            return  # conforming
        if mesh.dim == 3:
            self._build_hanging_constraints_3d()
            return

        # Degree-generic 2D (VERDICT r3 #8, the 1D analog of the 3D face
        # interpolation below): every fine node on the fine side of a
        # nonconforming coarse EDGE is constrained by the coarse edge's
        # own k+1 nodes with 1D uniform-node Lagrange weights at the fine
        # node's parameter along the edge.
        vkey = {tuple(np.round(p, 12)): i
                for i, p in enumerate(mesh.vertices)}
        fm = mesh._face_map()
        single = [(c, f) for key, lst in fm.items() if len(lst) == 1
                  for c, f in lst if mesh.boundary_id[c, f] < 0]
        lag = _lagrange_1d_uniform(k)
        done = set()
        for c, f in single:
            a, b = [int(mesh.cells[c, v]) for v in FACE_VERTICES[2][f]]
            pa, pb = mesh.vertices[a], mesh.vertices[b]
            pm = tuple(np.round(0.5 * (pa + pb), 12))
            if pm not in vkey:
                continue  # not the coarse side (or not actually hanging)
            masters = [int(self.cell_dofs[c, l])
                       for l in self.face_local_nodes[f]]
            ab = pb - pa
            L2 = float(ab @ ab)
            # master lattice positions along a->b (exact integers 0..k)
            mt = [int(round(float((self.node_points[m] - pa) @ ab) / L2
                            * k)) for m in masters]
            tol = 1e-9 * np.sqrt(L2)
            for c2, f2 in single:
                if (c2, f2) == (c, f):
                    continue
                va, vb = [int(mesh.cells[c2, v])
                          for v in FACE_VERTICES[2][f2]]
                # both endpoints of the candidate fine edge on [pa, pb]
                ok = True
                for v in (va, vb):
                    pv = mesh.vertices[v]
                    t = float((pv - pa) @ ab) / L2
                    if t < -1e-12 or t > 1 + 1e-12 or \
                            np.linalg.norm(pa + t * ab - pv) > tol:
                        ok = False
                        break
                if not ok:
                    continue
                for l in self.face_local_nodes[f2]:
                    slave = int(self.cell_dofs[c2, l])
                    if slave in masters or slave in done:
                        continue
                    t = float((self.node_points[slave] - pa) @ ab) / L2
                    ms, ws = [], []
                    for mi, it_ in zip(masters, mt):
                        w = lag(it_, t)
                        if abs(w) > 1e-12:
                            ms.append(mi)
                            ws.append(float(w))
                    done.add(slave)
                    self.hanging.append((slave, ms, ws))

    def _build_hanging_constraints_3d(self):
        """3D hanging-node constraints by face interpolation: every fine
        node on a nonconforming coarse face is constrained by the coarse
        face's own nodes, with weights = the coarse FACE shape functions
        (tensor Lagrange) at the node's (s, t) face coordinates.  Edge
        hangings fall out as the boundary-restriction of the same formula.
        deal.II equivalent: DoFTools::make_hanging_node_constraints for
        hexahedra (1-irregular meshes)."""
        mesh, k = self.mesh, self.degree
        fm = mesh._face_map()
        vkey = {tuple(np.round(p, 12)): i
                for i, p in enumerate(mesh.vertices)}
        single = [(key, c, f) for key, lst in fm.items() if len(lst) == 1
                  for c, f in lst if mesh.boundary_id[c, f] < 0]
        if not single:
            return

        def face_corners(c, f):
            return [int(mesh.cells[c, v]) for v in FACE_VERTICES[3][f]]

        def invert(corners_xyz, p):
            """(s, t) of point p on the bilinear patch (z-order corners)."""
            A, B, C, D = corners_xyz  # s-fast: A=(0,0) B=(1,0) C=(0,1) D=(1,1)
            st = np.array([0.5, 0.5])
            for _ in range(30):
                s, t = st
                X = (1-s)*(1-t)*A + s*(1-t)*B + (1-s)*t*C + s*t*D
                r = X - p
                Xs = -(1-t)*A + (1-t)*B - t*C + t*D
                Xt = -(1-s)*A - s*B + (1-s)*C + s*D
                J = np.array([[Xs @ Xs, Xs @ Xt], [Xs @ Xt, Xt @ Xt]])
                g = np.array([Xs @ r, Xt @ r])
                try:
                    dst = np.linalg.solve(J, g)
                except np.linalg.LinAlgError:
                    break
                st = st - dst
                if np.abs(dst).max() < 1e-14:
                    break
            s, t = st
            X = (1-s)*(1-t)*A + s*(1-t)*B + (1-s)*t*C + s*t*D
            return st, float(np.linalg.norm(X - p))

        lag1d = _lagrange_1d_uniform(k)   # degree-generic weights

        done = set()
        for key, c, f in single:
            corners = face_corners(c, f)
            pts = [mesh.vertices[v] for v in corners]
            center = tuple(np.round(np.mean(pts, axis=0), 12))
            if center not in vkey:
                continue  # conforming from this side (or the finer side)
            # this is the COARSE side of a nonconforming face
            masters = [int(self.cell_dofs[c, l])
                       for l in self.face_local_nodes[f]]
            mpos = self.node_points[masters]
            mst = []
            for mp in mpos:
                st, res = invert(pts, mp)
                mst.append(np.round(st * k).astype(int))
            diam = max(np.linalg.norm(pts[0] - pts[3]),
                       np.linalg.norm(pts[1] - pts[2]))
            tol = 1e-9 * diam
            # candidate slaves: nodes of other single faces whose corners
            # all lie on this patch
            lo = np.min(pts, axis=0) - tol
            hi = np.max(pts, axis=0) + tol
            for key2, c2, f2 in single:
                if (c2, f2) == (c, f):
                    continue
                cor2 = face_corners(c2, f2)
                cp2 = mesh.vertices[cor2]
                if ((cp2 < lo) | (cp2 > hi)).any():
                    continue
                on = all(invert(pts, mesh.vertices[v])[1] < tol
                         for v in cor2)
                if not on:
                    continue
                for l in self.face_local_nodes[f2]:
                    slave = int(self.cell_dofs[c2, l])
                    if slave in masters or slave in done:
                        continue
                    st, res = invert(pts, self.node_points[slave])
                    if res > tol:
                        continue
                    s, t = st
                    ms, ws = [], []
                    for mi, (is_, it_) in zip(masters, mst):
                        w = lag1d(int(is_), s) * lag1d(int(it_), t)
                        if abs(w) > 1e-12:
                            ms.append(mi)
                            ws.append(float(w))
                    done.add(slave)
                    self.hanging.append((slave, ms, ws))


class SystemSpace:
    """Mixed system of (FESpace, n_components) blocks in one global vector.

    For the fluid: [(Q2, dim), (Q1, 1)] -> dofs [u interleaved, p];
    deal.II equivalent: FESystem + block renumbering
    (reference: source/fluid_solver.cpp:44-56)."""

    def __init__(self, blocks: List[Tuple[FESpace, int]]):
        self.blocks = blocks
        self.offsets = []
        off = 0
        for sp, nc in blocks:
            self.offsets.append(off)
            off += sp.n_nodes * nc
        self.n_dofs = off
        # combined per-cell dof array
        n_c = blocks[0][0].mesh.n_cells
        parts = []
        for (sp, nc), off in zip(blocks, self.offsets):
            cd = sp.cell_dofs  # (n_c, nl)
            if nc == 1:
                parts.append(off + cd)
            else:
                comp = np.arange(nc)
                parts.append(off + (cd[:, :, None] * nc +
                                    comp[None, None, :]).reshape(n_c, -1))
        self.cell_dofs = np.concatenate(parts, axis=1)
        self.block_slices = []
        for (sp, nc), off in zip(blocks, self.offsets):
            self.block_slices.append(slice(off, off + sp.n_nodes * nc))

    def block_dofs(self, b: int) -> slice:
        return self.block_slices[b]

    def hanging_tables(self, max_masters: int = 3):
        """Constraint tables over the global dof vector.

        Returns (idx (n_dofs, K) int, w (n_dofs, K) float, is_hanging(bool)):
        row i reconstructs dof i from masters; identity for unconstrained."""
        n = self.n_dofs
        need = max((len(m) for (sp, _) in self.blocks
                    for (_, m, _) in sp.hanging), default=1)
        K = max(max_masters, need)
        idx = np.tile(np.arange(n, dtype=np.int64)[:, None], (1, K))
        w = np.zeros((n, K))
        w[:, 0] = 1.0
        is_h = np.zeros(n, dtype=bool)
        for (sp, nc), off in zip(self.blocks, self.offsets):
            for (node, masters, weights) in sp.hanging:
                for comp in range(nc):
                    gi = off + node * nc + comp
                    is_h[gi] = True
                    w[gi, :] = 0.0
                    for j, (mnode, mw) in enumerate(zip(masters, weights)):
                        idx[gi, j] = off + mnode * nc + comp
                        w[gi, j] = mw
        return idx, w, is_h
