"""Checkpoint save/restore.

Reference: fluid side via SolutionTransfer + triangulation.save
(source/mpi_fluid_solver.cpp:581-713); solid side via rank-0 block_write of
d/v/a (source/mpi_shared_solid_solver.cpp:452-571).  TPU-native analog:
one npz per solver with the state vectors + time bookkeeping; only the
latest checkpoint is kept (matching the reference)."""

from __future__ import annotations

import glob
import os
from typing import Dict, Optional

import numpy as np


def save_checkpoint(prefix: str, step: int, arrays: Dict[str, np.ndarray],
                    keep_only_latest: bool = True):
    """Write <prefix>-<step>.checkpoint.npz; remove older ones."""
    if keep_only_latest:
        for old in glob.glob(f"{prefix}-*.checkpoint.npz"):
            os.remove(old)
    path = f"{prefix}-{step:06d}.checkpoint.npz"
    np.savez(path, **{k: np.asarray(v) for k, v in arrays.items()})
    return path


def load_latest_checkpoint(prefix: str) -> Optional[Dict[str, np.ndarray]]:
    """Load the lexicographically-latest <prefix>-*.checkpoint.npz."""
    files = sorted(glob.glob(f"{prefix}-*.checkpoint.npz"))
    if not files:
        return None
    data = np.load(files[-1])
    out = {k: data[k] for k in data.files}
    out["__step__"] = int(files[-1].split("-")[-1].split(".")[0])
    return out
