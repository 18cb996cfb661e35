"""Dense condensed operator blocks for small/medium problems.

On TPU the batched element matvec (gather -> block einsum -> scatter-add)
carries a ~2 ms fixed latency regardless of problem size (the XLA
gather/scatter kernels are latency-bound at small sizes; measured on v5e:
1.9 ms at 17k dofs, 2.2 ms at 54k dofs).  Below ~25k dofs per block, the
dense matrix fits comfortably in HBM and a dense GEMV inside the solve
graph costs ~0.1-0.5 ms with no gather/scatter at all — so the TPU-native
layout for the preconditioner's inner operators at these sizes is DENSE,
not sparse.  (The reference reaches for the opposite tool at this size:
exact sparse direct solves, source/mpi_insim.cpp:122-127.)

These helpers build the exact CONDENSED dense matrix of the constrained
operators used throughout the solvers:

    wrap_operator(apply_A)(x) == where(fixed, x, R A E x)

where E = Constraints.expand (zero Dirichlet, hanging from masters) and
R = Constraints.restrict.  R == E^T (restrict accumulates hanging rows
into masters and zeroes fixed — the transpose of the expand map), so the
condensed dense block is

    M = R_row A E_col + diag(fixed)

The hanging-node structure is mesh-static (runtime constraint extensions
only add Dirichlet rows), so condensation uses STATIC hanging-row index
lists: a (n_h, k) row gather, a tiny weighted scatter-add into the master
rows, and a fixed-row mask — O(n_h * k) work instead of a vmapped scatter
over the full matrix (measured 94 ms -> ~3 ms on the 888 MB leaflet A
block).  The result is EXACTLY the same linear operator the matvec path
applies — iteration counts are unchanged; only the per-iteration cost
drops.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp


class HangingTables(NamedTuple):
    """Static hanging-node structure of one Constraints object (the
    runtime-varying parts of Constraints — the Dirichlet set — do not
    touch these)."""
    rows: np.ndarray      # (n_h,) hanging dof ids
    masters: np.ndarray   # (n_h, m) master dof ids
    weights: np.ndarray   # (n_h, m) weights


def hanging_tables(cons) -> Optional[HangingTables]:
    """Extract the static hanging structure from a CONCRETE (host-side)
    Constraints object.  Call at setup/trace time on the solver's own
    constraints — extended runtime variants share the same structure."""
    if not cons.any_hanging:
        return None
    hanging = np.asarray(cons.hanging)
    rows = np.where(hanging)[0]
    if len(rows) == 0:
        return None
    return HangingTables(rows,
                         np.asarray(cons.hang_idx)[rows],
                         np.asarray(cons.hang_w)[rows])


def dense_from_elements(blocks, row_dofs, col_dofs, n_rows: int,
                        n_cols: int, dtype=None):
    """Assemble element blocks (n_c, nl_r, nl_c) into a dense
    (n_rows, n_cols) matrix (duplicate dofs accumulate)."""
    if dtype is None:
        dtype = blocks.dtype
    M = jnp.zeros((n_rows, n_cols), dtype=dtype)
    return M.at[row_dofs[:, :, None], col_dofs[:, None, :]].add(
        blocks.astype(dtype))


def condense_left(M, fixed, ht: Optional[HangingTables]):
    """R M: accumulate hanging rows into their master rows, then zero
    fixed rows.  `fixed` may be traced (runtime Dirichlet extensions);
    `ht` must be static."""
    if ht is not None:
        w = jnp.asarray(ht.weights, dtype=M.dtype)
        Mh = M[ht.rows]                                   # (n_h, k)
        add = w[:, :, None] * Mh[:, None, :]              # (n_h, m, k)
        M = M.at[ht.masters.reshape(-1)].add(
            add.reshape(-1, M.shape[1]))
    return jnp.where(fixed[:, None], 0.0, M)


def condense_right(M, fixed, ht: Optional[HangingTables]):
    """M E = (R M^T)^T: distribute hanging columns into master columns,
    then zero fixed columns."""
    if ht is not None:
        w = jnp.asarray(ht.weights, dtype=M.dtype)
        Mh = M[:, ht.rows]                                # (k, n_h)
        add = Mh[:, :, None] * w[None, :, :]              # (k, n_h, m)
        M = M.at[:, ht.masters.reshape(-1)].add(
            add.reshape(M.shape[0], -1))
    return jnp.where(fixed[None, :], 0.0, M)


def add_unit_diag(M, mask):
    """M + diag(mask) without materializing a second dense matrix."""
    n = M.shape[0]
    idx = jnp.arange(n)
    return M.at[idx, idx].add(mask.astype(M.dtype))


def condensed_dense(blocks, row_dofs, col_dofs, n_rows: int, n_cols: int,
                    rcons, ccons, rht: Optional[HangingTables],
                    cht: Optional[HangingTables],
                    unit_fixed_diag: bool = False, dtype=None):
    """Dense condensed operator R A E (+ optional identity on fixed rows,
    making `M @ x` match `cons.wrap_operator(apply_A)(x)` exactly for the
    square case).  rht/cht: static hanging tables of rcons/ccons (from
    hanging_tables(), computed on the solver's concrete constraints)."""
    M = dense_from_elements(blocks, row_dofs, col_dofs, n_rows, n_cols,
                            dtype)
    M = condense_right(condense_left(M, rcons.fixed, rht),
                       ccons.fixed, cht)
    if unit_fixed_diag:
        assert n_rows == n_cols
        M = add_unit_diag(M, rcons.fixed)
    return M


def gemv(M, x):
    """Dense matvec preserving x's dtype (M may be lower precision)."""
    y = M @ x.astype(M.dtype)
    return y.astype(x.dtype)
