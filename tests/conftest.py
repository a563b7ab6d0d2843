"""Test env: force CPU with 8 virtual devices (multi-chip sharding tests
run on a simulated mesh; SURVEY.md §4 'Implication for the TPU build').

The container's sitecustomize force-registers the axon TPU plugin before
any env-var override can act, so the platform is pinned via jax.config
(which wins as long as no backend has been initialized yet).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NOTE: no persistent compilation cache — the container migrates between
# hosts with different CPU feature sets and XLA:CPU AOT artifacts are not
# machine-portable ("could lead to execution errors such as SIGILL").
