"""Constraint handling (Dirichlet + hanging nodes) for global dof vectors.

TPU-native replacement for deal.II AffineConstraints: constraints are dense
(n_dofs, K) gather tables applied inside jit, instead of sparse row surgery.
Semantics mirror distribute_local_to_global + distribute
(reference: source/insim.cpp:322-332, source/fluid_solver.cpp:66-163):
constrained rows/cols are condensed out of the operator, the Krylov system
keeps identity rows there, and `distribute` writes the constrained values
back into the solution vector.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class Constraints:
    def __init__(self, n_dofs: int, hang_idx=None, hang_w=None,
                 hanging_mask=None, dirichlet_mask=None,
                 dirichlet_values=None):
        self.n_dofs = n_dofs
        if hang_idx is None:
            hang_idx = np.tile(np.arange(n_dofs)[:, None], (1, 1))
            hang_w = np.ones((n_dofs, 1))
            hanging_mask = np.zeros(n_dofs, dtype=bool)
        self.hang_idx = jnp.asarray(hang_idx, dtype=jnp.int32)
        self.hang_w = jnp.asarray(hang_w)
        self.hanging = jnp.asarray(hanging_mask)
        if dirichlet_mask is None:
            dirichlet_mask = np.zeros(n_dofs, dtype=bool)
        if dirichlet_values is None:
            dirichlet_values = np.zeros(n_dofs)
        self.dirichlet = jnp.asarray(dirichlet_mask)
        self.dirichlet_values = jnp.asarray(dirichlet_values)
        self.fixed = self.dirichlet | self.hanging
        self.any_hanging = bool(np.any(np.asarray(hanging_mask)))

    # -- solution-space maps ------------------------------------------
    def distribute(self, x):
        """Set Dirichlet dofs to their BC values, then hanging dofs from
        masters (deal.II AffineConstraints::distribute)."""
        x = jnp.where(self.dirichlet, self.dirichlet_values, x)
        if self.any_hanging:
            xm = (x[self.hang_idx] * self.hang_w).sum(axis=1)
            x = jnp.where(self.hanging, xm, x)
        return x

    def set_zero(self, x):
        """Zero all constrained dofs."""
        return jnp.where(self.fixed, 0.0, x)

    def apply_increment(self, x):
        """deal.II Newton-constraint semantics: the inhomogeneity is ADDED
        to the evaluation point at the first Newton iteration (the
        constrained newton_update equals the inhomogeneity and
        eval += update; reference: source/insim.cpp:409-449)."""
        x = jnp.where(self.dirichlet, x + self.dirichlet_values, x)
        if self.any_hanging:
            xm = (x[self.hang_idx] * self.hang_w).sum(axis=1)
            x = jnp.where(self.hanging, xm, x)
        return x

    def apply_increment_with(self, x, values):
        """apply_increment with caller-supplied inhomogeneities (the
        on-device steppers feed per-step hard-coded BC tables)."""
        x = jnp.where(self.dirichlet, x + values, x)
        if self.any_hanging:
            w = self.hang_w.astype(x.dtype)
            xm = (x[self.hang_idx] * w).sum(axis=1)
            x = jnp.where(self.hanging, xm, x)
        return x

    def distribute_with_values(self, x, dirichlet_values):
        """distribute() with caller-supplied Dirichlet values."""
        x = jnp.where(self.dirichlet, dirichlet_values, x)
        if self.any_hanging:
            xm = (x[self.hang_idx] * self.hang_w).sum(axis=1)
            x = jnp.where(self.hanging, xm, x)
        return x

    def expand(self, x):
        """Homogeneous prolongation P x: hanging dofs from masters, Dirichlet
        dofs zeroed (used inside the condensed operator).  Dtype-preserving
        (hang_w is f64; the mixed-precision preconditioner passes f32)."""
        x = jnp.where(self.dirichlet, 0.0, x)
        if self.any_hanging:
            w = self.hang_w.astype(x.dtype)
            xm = (x[self.hang_idx] * w).sum(axis=1)
            x = jnp.where(self.hanging, xm, x)
        return x

    def restrict(self, y):
        """P^T y: accumulate hanging rows into masters, zero constrained.
        Dtype-preserving."""
        if self.any_hanging:
            w = self.hang_w.astype(y.dtype)
            contrib = jnp.where(self.hanging, y, 0.0)
            add = jnp.zeros_like(y).at[self.hang_idx.reshape(-1)].add(
                (contrib[:, None] * w).reshape(-1))
            y = y + add
        return jnp.where(self.fixed, 0.0, y)

    # -- operator / rhs wrappers --------------------------------------
    def wrap_operator(self, apply_A):
        """Condensed operator: identity on constrained dofs."""
        def op(x):
            y = self.restrict(apply_A(self.expand(x)))
            return jnp.where(self.fixed, x, y)
        return op

    def condense_rhs(self, r):
        r = self.restrict(r)
        return jnp.where(self.fixed, 0.0, r)

    # -- pytree protocol (so Constraints can be a jit argument: FSI updates
    # the Dirichlet set every step without retracing) -------------------
    def tree_flatten(self):
        children = (self.hang_idx, self.hang_w, self.hanging, self.dirichlet,
                    self.dirichlet_values, self.fixed)
        aux = (self.n_dofs, self.any_hanging)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.hang_idx, obj.hang_w, obj.hanging, obj.dirichlet,
         obj.dirichlet_values, obj.fixed) = children
        obj.n_dofs, obj.any_hanging = aux
        return obj

    def with_extra_dirichlet(self, mask, values):
        """New Constraints with additional Dirichlet rows merged in; existing
        constraints win (deal.II MergeConflictBehavior::left_object_wins,
        reference: source/fsi.cpp:297-305)."""
        mask = jnp.asarray(mask)
        add = mask & ~self.fixed
        new = Constraints.__new__(Constraints)
        new.n_dofs = self.n_dofs
        new.any_hanging = self.any_hanging
        new.hang_idx = self.hang_idx
        new.hang_w = self.hang_w
        new.hanging = self.hanging
        new.dirichlet = self.dirichlet | add
        new.dirichlet_values = jnp.where(add, jnp.asarray(values),
                                         self.dirichlet_values)
        new.fixed = self.fixed | add
        return new


jax.tree_util.register_pytree_node(
    Constraints, lambda c: c.tree_flatten(),
    Constraints.tree_unflatten)
