"""Global numerical configuration for openifem_tpu.

The reference (OpenIFEM, deal.II/PETSc) runs entirely in float64. To hit the
regression goldens (rtol 1e-3 asserted against deal.II results, see
/root/reference/tests) we default to float64, which JAX supports on both CPU
and TPU (on TPU f64 is emulated; the benchmark path can switch to f32).

Set the environment variable OPENIFEM_X64=0 before importing to run in f32.
"""

import os

import jax

_X64 = os.environ.get("OPENIFEM_X64", "1") != "0"
if _X64:
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def real_dtype():
    """The floating dtype used for all solver state."""
    return jnp.float64 if _X64 else jnp.float32


def np_real_dtype():
    return np.float64 if _X64 else np.float32


def index_dtype():
    return jnp.int32
