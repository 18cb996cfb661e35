import os

# Run the test suite on CPU with a virtual 8-device mesh so sharded paths are
# exercised without TPU hardware.  Note: the axon TPU plugin (if present)
# overrides JAX_PLATFORMS programmatically, so we must also update the jax
# config after import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("OPENIFEM_TEST_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import openifem_tpu  # noqa: E402,F401  (enables x64)

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _isolated_cwd(tmp_path, monkeypatch):
    """Run every test in its own temp directory: run loops now write
    VTU/PVD/checkpoint artifacts at the configured intervals (matching the
    reference), and those must not land in the repo."""
    monkeypatch.chdir(tmp_path)
