from .fsi import FSI
from .mpi_fsi import MPIFSI
from .cv_fsi import ControlVolumeFSI

__all__ = ["FSI", "MPIFSI", "ControlVolumeFSI"]
