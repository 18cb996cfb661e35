"""Matrix-free element-block operators.

The PETSc sparse-matrix layer of the reference is replaced by batched
element matrices (n_cells, nl, nl) applied as gather -> batched matmul (MXU)
-> scatter-add.  This is the TPU-native SpMV: the per-cell matmul batch maps
onto the MXU and the scatter-add is a single segment-sum.
"""

from __future__ import annotations

import jax
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
