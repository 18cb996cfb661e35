"""Closed-form determinant/inverse for batched 2x2 and 3x3 matrices.

TPU f64 has no LU decomposition (jnp.linalg.inv/det lower to LU), and for
the (n_cells, n_q) batches of tiny Jacobians closed forms are faster and
fuse into the surrounding elementwise work anyway.
"""

from __future__ import annotations

import jax.numpy as jnp


def det(A):
    """Determinant of (..., d, d) for d in {1, 2, 3}."""
    d = A.shape[-1]
    if d == 1:
        return A[..., 0, 0]
    if d == 2:
        return A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
    if d == 3:
        return (A[..., 0, 0] * (A[..., 1, 1] * A[..., 2, 2] -
                                A[..., 1, 2] * A[..., 2, 1]) -
                A[..., 0, 1] * (A[..., 1, 0] * A[..., 2, 2] -
                                A[..., 1, 2] * A[..., 2, 0]) +
                A[..., 0, 2] * (A[..., 1, 0] * A[..., 2, 1] -
                                A[..., 1, 1] * A[..., 2, 0]))
    raise NotImplementedError(f"det for d={d}")


def inv(A):
    """Inverse of (..., d, d) for d in {1, 2, 3}."""
    d = A.shape[-1]
    detA = det(A)
    if d == 1:
        return 1.0 / A
    if d == 2:
        row0 = jnp.stack([A[..., 1, 1], -A[..., 0, 1]], axis=-1)
        row1 = jnp.stack([-A[..., 1, 0], A[..., 0, 0]], axis=-1)
        adj = jnp.stack([row0, row1], axis=-2)
        return adj / detA[..., None, None]
    if d == 3:
        c00 = A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1]
        c01 = A[..., 0, 2] * A[..., 2, 1] - A[..., 0, 1] * A[..., 2, 2]
        c02 = A[..., 0, 1] * A[..., 1, 2] - A[..., 0, 2] * A[..., 1, 1]
        c10 = A[..., 1, 2] * A[..., 2, 0] - A[..., 1, 0] * A[..., 2, 2]
        c11 = A[..., 0, 0] * A[..., 2, 2] - A[..., 0, 2] * A[..., 2, 0]
        c12 = A[..., 0, 2] * A[..., 1, 0] - A[..., 0, 0] * A[..., 1, 2]
        c20 = A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0]
        c21 = A[..., 0, 1] * A[..., 2, 0] - A[..., 0, 0] * A[..., 2, 1]
        c22 = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
        adj = jnp.stack([
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c10, c11, c12], axis=-1),
            jnp.stack([c20, c21, c22], axis=-1),
        ], axis=-2)
        return adj / detA[..., None, None]
    raise NotImplementedError(f"inv for d={d}")
