import os

# Tests run on the CPU backend with a virtual 8-device mesh so sharding tests
# work without TPU hardware; the codec code is backend-agnostic. The image's
# axon TPU plugin overrides JAX_PLATFORMS, so force the platform through
# jax.config (set VC2TPU_TEST_TPU=1 to run the suite on the real chip).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not os.environ.get("VC2TPU_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import vc2tpu  # noqa: E402,F401  (enables x64 before any jax use)
