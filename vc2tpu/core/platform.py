"""Backend-selection shim shared by the CLIs.

The image's axon TPU plugin overrides JAX_PLATFORMS at import time; an
explicit platform request (e.g. JAX_PLATFORMS=cpu with a virtual device
mesh) must be re-asserted through jax.config before first device use.
"""

from __future__ import annotations

import os


def honour_jax_platforms() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            import jax

            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
