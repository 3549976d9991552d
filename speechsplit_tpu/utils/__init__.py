"""Utilities: profiling, metrics, misc host helpers."""

import os

from speechsplit_tpu.utils.profiling import StepTimer, profile_trace


def enable_compile_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    Full-geometry TPU compiles take minutes; every CLI entry point calls
    this so repeat invocations (train -> resume -> convert) reuse
    compiled programs. Override the location with SPEECHSPLIT_JAX_CACHE
    or the ``path`` argument; set it empty to disable.
    """
    import jax

    path = path if path is not None else os.environ.get(
        "SPEECHSPLIT_JAX_CACHE", "/tmp/jax_cache"
    )
    if not path:
        return
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


__all__ = ["StepTimer", "profile_trace", "enable_compile_cache"]
