from .linear import LinearElasticity
from .hyper import HyperElasticity

__all__ = ["LinearElasticity", "HyperElasticity"]
