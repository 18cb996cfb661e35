"""Matrix-free element-block operators.

The PETSc sparse-matrix layer of the reference is replaced by batched
element matrices (n_cells, nl, nl) applied as gather -> batched matmul (MXU)
-> scatter-add.  This is the TPU-native SpMV: the per-cell matmul batch maps
onto the MXU and the scatter-add is a single segment-sum.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def scatter_add(n_dofs: int, idx, vals):
    """y[idx] += vals over flattened index/value arrays."""
    return jnp.zeros(n_dofs, dtype=vals.dtype).at[idx.reshape(-1)].add(
        vals.reshape(-1))


def element_matvec(A_loc, cell_dofs, n_dofs: int, x):
    """y = A x with A given by element blocks.

    A_loc: (n_c, nl, nl); cell_dofs: (n_c, nl) int; x: (n_dofs,)."""
    xl = x[cell_dofs]
    yl = jnp.einsum("cij,cj->ci", A_loc, xl,
                    preferred_element_type=x.dtype)
    return scatter_add(n_dofs, cell_dofs, yl)


def element_matvec_rect(A_loc, row_dofs, col_dofs, n_rows: int, x):
    """Rectangular block apply: rows/cols indexed by different dof maps."""
    xl = x[col_dofs]
    yl = jnp.einsum("cij,cj->ci", A_loc, xl,
                    preferred_element_type=x.dtype)
    return scatter_add(n_rows, row_dofs, yl)


def element_matvec_nodeblock(Ab, cell_nodes, n_nodes: int, x):
    """y = A x for vector-valued blocks in node-block layout.

    Ab: (n_c, nl, d, nl, d) element blocks; cell_nodes: (n_c, nl) NODE
    indices; x: (n_nodes*d,) interleaved [node0_x, node0_y, ...].

    Same result as element_matvec with interleaved dof tables, but gathers
    and scatters node rows of d components instead of scalar dofs — half
    (2D) or a third (3D) of the index traffic.  Measured 2.2x faster than
    the flat scatter on TPU v5e at Turek refine=3 sizes."""
    d = Ab.shape[2]
    v2 = x.reshape(-1, d)
    xl = v2[cell_nodes]                              # (n_c, nl, d)
    yl = jnp.einsum("ciajb,cjb->cia", Ab, xl,
                    preferred_element_type=x.dtype)
    y = jnp.zeros((n_nodes, d), dtype=x.dtype).at[
        cell_nodes.reshape(-1)].add(yl.reshape(-1, d))
    return y.reshape(-1)


def element_matvec_p_to_u_nodeblock(Aup_b, u_nodes, p_dofs,
                                    n_u_nodes: int, xp):
    """y_u = Aup x_p with the velocity side in node-block layout.
    Aup_b: (n_c, nlu, d, nlp); returns the flat interleaved u vector."""
    d = Aup_b.shape[2]
    xlp = xp[p_dofs]
    ylu = jnp.einsum("ciak,ck->cia", Aup_b, xlp,
                     preferred_element_type=xp.dtype)
    y = jnp.zeros((n_u_nodes, d), dtype=xp.dtype).at[
        u_nodes.reshape(-1)].add(ylu.reshape(-1, d))
    return y.reshape(-1)


def element_matvec_u_to_p_nodeblock(Apu_b, u_nodes, p_dofs, n_p: int, xu):
    """y_p = Apu x_u with the velocity side in node-block layout.
    Apu_b: (n_c, nlp, nlu, d); xu: flat interleaved u vector."""
    d = Apu_b.shape[3]
    xlu = xu.reshape(-1, d)[u_nodes]
    ylp = jnp.einsum("ckjb,cjb->ck", Apu_b, xlu,
                     preferred_element_type=xu.dtype)
    return jnp.zeros(n_p, dtype=xu.dtype).at[p_dofs.reshape(-1)].add(
        ylp.reshape(-1))


def element_matvec_taylor_hood(A_loc, u_nodes, p_dofs, nlu: int, d: int,
                               n_u: int, n_p: int, x):
    """Full coupled [u | p] matvec with the velocity part in node-block
    layout.  A_loc: (n_c, nlu*d + nlp, nlu*d + nlp) with the local
    velocity dofs interleaved (node-major, component-minor) followed by
    the pressure dofs; u_nodes: (n_c, nlu) velocity NODE indices;
    p_dofs: (n_c, nlp) pressure dof indices (0-based in the p block);
    x: (n_u + n_p,) global [u | p] vector."""
    n_c = A_loc.shape[0]
    nu = nlu * d
    Auu = A_loc[:, :nu, :nu].reshape(n_c, nlu, d, nlu, d)
    Aup = A_loc[:, :nu, nu:].reshape(n_c, nlu, d, -1)
    Apu = A_loc[:, nu:, :nu].reshape(n_c, -1, nlu, d)
    App = A_loc[:, nu:, nu:]

    xu = x[:n_u].reshape(-1, d)
    xp = x[n_u:]
    xlu = xu[u_nodes]                                # (n_c, nlu, d)
    xlp = xp[p_dofs]                                 # (n_c, nlp)

    ylu = (jnp.einsum("ciajb,cjb->cia", Auu, xlu,
                      preferred_element_type=x.dtype) +
           jnp.einsum("ciak,ck->cia", Aup, xlp,
                      preferred_element_type=x.dtype))
    ylp = (jnp.einsum("ckjb,cjb->ck", Apu, xlu,
                      preferred_element_type=x.dtype) +
           jnp.einsum("ckl,cl->ck", App, xlp,
                      preferred_element_type=x.dtype))

    yu = jnp.zeros((n_u // d, d), dtype=x.dtype).at[
        u_nodes.reshape(-1)].add(ylu.reshape(-1, d))
    yp = jnp.zeros(n_p, dtype=x.dtype).at[p_dofs.reshape(-1)].add(
        ylp.reshape(-1))
    return jnp.concatenate([yu.reshape(-1), yp])


def make_gather_plan(cell_dofs, n_dofs: int):
    """Per-dof incidence table turning the matvec scatter-add into a
    static-shape gather + sum.

    TPU scatters with duplicate indices serialize (sort-based lowering);
    the transpose layout — for each dof, the (<= K) flat (cell, local)
    positions that contribute to it, padded with a sentinel slot — makes
    the reduction a dense (n_dofs, K) gather + row sum, which XLA lowers
    to vectorized loads.  Built once per dof map on the host.

    Returns (incidence (n_dofs, K) int32) indexing into the flattened
    (n_c * nl + 1,) local-result array whose last slot is zero padding."""
    cd = np.asarray(cell_dofs).reshape(-1)
    n_flat = cd.shape[0]
    order = np.argsort(cd, kind="stable")
    sorted_dofs = cd[order]
    counts = np.bincount(cd, minlength=n_dofs)
    K = int(counts.max()) if n_flat else 1
    inc = np.full((n_dofs, K), n_flat, dtype=np.int64)  # pad slot
    starts = np.zeros(n_dofs + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    ar = np.arange(n_flat)
    inc[sorted_dofs, ar - starts[sorted_dofs]] = order
    return jnp.asarray(inc, dtype=jnp.int32)


def element_matvec_gather(A_loc, cell_dofs, plan, x):
    """y = A x via the gather plan (same result as element_matvec)."""
    xl = x[cell_dofs]
    yl = jnp.einsum("cij,cj->ci", A_loc, xl,
                    preferred_element_type=x.dtype)
    ylp = jnp.concatenate([yl.reshape(-1),
                           jnp.zeros((1,), dtype=yl.dtype)])
    return ylp[plan].sum(axis=1)


def element_matvec_rect_gather(A_loc, col_dofs, row_plan, x):
    """Rectangular block apply via a row-dof gather plan."""
    xl = x[col_dofs]
    yl = jnp.einsum("cij,cj->ci", A_loc, xl,
                    preferred_element_type=x.dtype)
    ylp = jnp.concatenate([yl.reshape(-1),
                           jnp.zeros((1,), dtype=yl.dtype)])
    return ylp[row_plan].sum(axis=1)


def element_diag(A_loc, cell_dofs, n_dofs: int):
    nl = A_loc.shape[1]
    d = A_loc[:, jnp.arange(nl), jnp.arange(nl)]
    return scatter_add(n_dofs, cell_dofs, d)


class ElementOperator:
    """Bundles element blocks + dof map into a linear operator."""

    def __init__(self, cell_dofs, n_dofs: int):
        self.cell_dofs = jnp.asarray(cell_dofs, dtype=jnp.int32)
        self.n_dofs = n_dofs

    def matvec(self, A_loc, x):
        return element_matvec(A_loc, self.cell_dofs, self.n_dofs, x)

    def diag(self, A_loc):
        return element_diag(A_loc, self.cell_dofs, self.n_dofs)
