"""openifem_tpu: a TPU-native immersed finite-element FSI framework.

A from-scratch JAX/XLA re-design of the capabilities of OpenIFEM
(https://github.com/OpenIFEM/OpenIFEM): immersed FEM fluid-structure
interaction with incompressible / slightly-compressible Navier-Stokes fluid
solvers, linear/hyper-elastic solid solvers, Spalart-Allmaras turbulence and
the mIFEM coupling scheme.

Design: meshes and dof maps are built host-side (numpy); all per-timestep
compute (batched element assembly, matrix-free Krylov solves, FSI coupling
kernels) runs as jitted JAX on TPU, sharded over element blocks via
jax.sharding for multi-chip runs.
"""

from . import config  # noqa: F401  (enables x64 before anything else)
from .parameters import AllParameters

__all__ = ["AllParameters"]
__version__ = "0.1.0"
