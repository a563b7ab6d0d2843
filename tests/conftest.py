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
# Persistent compilation cache, keyed by a CPU-feature fingerprint:
# XLA:CPU AOT artifacts are not machine-portable (SIGILL on a host with
# different ISA extensions), so the cache directory embeds a hash of the
# host's cpuinfo flags — a migrated container gets a fresh cache instead
# of a poisoned one.  Cuts repeat full-suite runs from ~20 min to the
# actual test compute.
def _cpu_fingerprint():
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            flags = [ln for ln in f if ln.startswith("flags")][:1]
        # jax/jaxlib versions join the key: an upgraded wheel can change
        # XLA's chosen target features (e.g. +prefer-no-gather) even on
        # identical cpuinfo, and a stale AOT artifact then warns/SIGILLs
        import jaxlib
        tag = "".join(flags) + jax.__version__ + \
            getattr(jaxlib, "__version__", "")
        return hashlib.sha1(tag.encode()).hexdigest()[:12]
    except Exception:
        return "nofp"


_cache_dir = f"/tmp/fnc_jax_test_cache_{_cpu_fingerprint()}"
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
