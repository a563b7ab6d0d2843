"""Persistent XLA compilation cache (TPU paths).

The framework's fused programs (mapping phase, pose eval, path eval) take
minutes to compile cold; on TPU the compiled artifacts are
target-consistent (one chip generation), so a persistent cache is sound
there.  NOT enabled for CPU runs: XLA:CPU AOT artifacts bake host CPU
features and are not machine-portable (observed 'SIGILL' warnings when the
container migrates hosts).
"""
from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 0.0):
    # min_compile_secs=0: jax's default 1.0 skips sub-second compiles, and
    # an episode dispatches ~30 such small programs (profiled: 11 s of a
    # 61 s episode was re-compiling sub-second kernels every run)
    import jax
    try:
        platform = jax.default_backend()
    except Exception:
        platform = "unknown"
    if platform == "cpu":
        return False
    cache_dir = cache_dir or os.environ.get(
        "FNC_JAX_CACHE_DIR", "/tmp/fnc_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return True
