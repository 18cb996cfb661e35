from .linear import LinearElasticity
from .hyper import HyperElasticity
from .shell import ShellSolidSolver

__all__ = ["LinearElasticity", "HyperElasticity", "ShellSolidSolver"]
