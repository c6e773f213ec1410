import os

# Tests run on the CPU backend with a virtual 8-device mesh so sharding tests
# work without TPU hardware; the codec code is backend-agnostic.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import vc2tpu  # noqa: E402,F401  (enables x64 before any jax use)
