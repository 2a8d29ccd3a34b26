"""Host runtime helpers: platform selection.

Some out-of-tree JAX device plugins (notably the hosted single-chip "axon"
TPU tunnel) register themselves unconditionally and ignore the JAX_PLATFORMS
environment variable. `apply_env_platform()` re-applies the env var through
the config API — which every plugin does respect — so CLI tools and
subprocess-driven tests can select a platform the standard way. Must be
called before the first JAX backend initializes.
"""

from __future__ import annotations

import os


def apply_env_platform() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    jax.config.update("jax_platforms", plat)
