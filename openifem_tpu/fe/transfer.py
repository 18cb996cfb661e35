"""Solution transfer between meshes (deal.II SolutionTransfer analog).

Used on mesh adaptation (reference: source/fsi.cpp:443-456,
source/fluid_solver.cpp:215-265): nodal fields of the old FE space are
evaluated at the new space's support points by batched point location +
interpolation — no hierarchy walk needed, and refinement preserves the FE
space so the transfer is exact."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import real_dtype
from ..fsi.interp import interpolate_nodal, make_cell_hash, plan_cell_hash


def transfer_nodal_field(old_mesh, old_space, old_field, new_points,
                         pad: float = 1e-9):
    """Evaluate a nodal field of old_space at new_points.

    old_field: (n_old_nodes,) or (n_old_nodes, k) jnp/np array.
    Returns (n_new, ...) jnp array.  Point location goes through the
    grid-hash candidate lists, so memory is linear in len(new_points)
    rather than len(new_points) x n_old_cells."""
    verts = old_mesh.vertices[old_mesh.cells]
    cell_verts = jnp.asarray(verts, dtype=real_dtype())
    pts = jnp.asarray(new_points, dtype=real_dtype())
    dims, span, K = plan_cell_hash(verts, tol=pad)
    build, locate = make_cell_hash(old_mesh.n_cells, dims, span, K,
                                   tol=pad)
    idx, unit, found = locate(build(cell_verts), pts)
    field = jnp.asarray(old_field)
    vals = interpolate_nodal(field, jnp.asarray(old_space.cell_dofs,
                                                dtype=jnp.int32),
                             idx, unit, old_space.degree, found)
    return vals
