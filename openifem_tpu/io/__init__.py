from .vtk import write_vtu
from .checkpoint import save_checkpoint, load_latest_checkpoint

__all__ = ["write_vtu", "save_checkpoint", "load_latest_checkpoint"]
