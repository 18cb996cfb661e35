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

# Persistent on-disk compilation cache: TPU compiles of the fused Newton
# steppers run 30-200 s; caching them makes restarts / repeated benches and
# AMR-triggered re-setups at previously seen shapes near-instant.  Override
# the location with OPENIFEM_COMPILE_CACHE (empty string disables).
_CACHE = os.environ.get("OPENIFEM_COMPILE_CACHE",
                        os.path.expanduser("~/.cache/openifem_tpu_xla"))
if _CACHE:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def real_dtype():
    """The floating dtype used for all solver state."""
    return jnp.float64 if _X64 else jnp.float32


def np_real_dtype():
    return np.float64 if _X64 else np.float32


def index_dtype():
    return jnp.int32
