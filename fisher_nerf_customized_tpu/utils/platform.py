"""Backend platform pinning that cannot hang on a dead TPU tunnel.

`FNC_PLATFORM=cpu|tpu` (+ optional `FNC_HOST_DEVICES=N` virtual CPU
devices) pins the JAX platform via `jax.config` BEFORE any backend
initializes.  The `JAX_PLATFORMS` env var is NOT equivalent in this
container: its sitecustomize force-registers the axon TPU plugin, and
with only the env var set the plugin is still probed during backend
discovery — which blocks indefinitely when the TPU tunnel is
unreachable.  The config route skips the probe (same recipe as
tests/conftest.py).

Call `pin_platform_from_env()` first thing in every CLI entry point.
"""
from __future__ import annotations

import os


def pin_platform_from_env() -> str | None:
    """Apply FNC_PLATFORM/FNC_HOST_DEVICES if set; returns the platform
    pinned (or None).  Must run before any JAX backend initializes."""
    plat = os.environ.get("FNC_PLATFORM")
    if not plat:
        return None
    n = os.environ.get("FNC_HOST_DEVICES")
    if n and "xla_force_host_platform_device_count" not in \
            os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={int(n)}").strip()
    import jax
    jax.config.update("jax_platforms", plat)
    return plat
