"""Multi-chip sharding: element-block domain decomposition over a device mesh.

The reference parallelizes by domain decomposition: p4est partitions fluid
cells across MPI ranks, assembly is rank-local, and PETSc reduces the halo
(SURVEY.md section 1).  The TPU-native equivalent here: the batched element
arrays (quadrature data, element matrices, cell->dof maps) are sharded along
the cell axis of a jax.sharding.Mesh, dof vectors stay replicated, and XLA's
SPMD partitioner turns the per-element einsums into purely local work plus
an all-reduce (psum) for the scatter-add — exactly the assemble+compress(add)
pattern of the reference (source/mpi_scnsim.cpp:553-567) with the collective
riding ICI.

Krylov solves then run replicated on the dof vectors with the matvec sharded
by cells; dot products need no extra collectives because the vectors are
replicated.  (Sharding the dof vectors themselves with halo exchange is the
next scaling step; element sharding already parallelizes the dominant
assembly + SpMV cost.)
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_cell_mesh(n_devices: Optional[int] = None, axis: str = "cells"
                   ) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_fluid_solver(solver, mesh: Mesh, axis: str = "cells"):
    """Shard a fluid solver's element-batch arrays over the device mesh.

    Subsequent jitted assembly/matvec calls are SPMD-partitioned by XLA:
    cell-indexed einsums run device-local; dof-vector scatter-adds become
    psum collectives."""
    cell_sharded = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    def put_cells(x):
        return jax.device_put(x, cell_sharded)

    for name in ("gu", "JxW", "Nu_cellwise", "cell_dofs", "cell_dofs_u",
                 "cell_dofs_p", "Mp_loc", "A_loc", "Auu", "Aup", "Apu",
                 "gravity_q"):
        if hasattr(solver, name):
            arr = getattr(solver, name)
            if arr is not None and getattr(arr, "ndim", 0) >= 1:
                setattr(solver, name, put_cells(arr))

    # dof vectors stay replicated: the element scatter-add then reduces to
    # one psum per matvec (halo-free domain decomposition).  Range-
    # partitioned dof vectors (memory scaling + reduce-scatter pattern)
    # require padded vector layouts and are the next scaling step.
    for name in ("present_solution", "solution_increment", "Mu_diag",
                 "Mp_diag"):
        if hasattr(solver, name):
            arr = getattr(solver, name)
            if arr is not None:
                setattr(solver, name, jax.device_put(arr, replicated))
    return solver
