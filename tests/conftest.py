import os

# Run the test suite on CPU with a virtual 8-device mesh so sharded paths are
# exercised without TPU hardware.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import openifem_tpu  # noqa: E402,F401  (enables x64)
