"""Incompressible NS, implicit-explicit splitting (placeholder — see insim).

Reference: include/insimex.h, source/insimex.cpp. Implemented after InsIM.
"""

from .base import FluidSolverBase


class InsIMEX(FluidSolverBase):
    def setup(self):  # pragma: no cover - placeholder
        raise NotImplementedError("InsIMEX lands after InsIM is validated")
