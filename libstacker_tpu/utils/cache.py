"""Persistent XLA compilation cache helper.

The Mosaic/XLA compile tail for the 4K kernels runs tens of seconds on
a remote TPU; the persistent cache makes every later process start
warm.  Applications opt in with one call (the example CLI and bench.py
do) — the library never mutates global JAX config on import.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "LIBSTACKER_CACHE_DIR", "/tmp/libstacker_jax_cache"
)


def enable_compilation_cache(path: str = _DEFAULT_DIR) -> str:
    """Point JAX's persistent compilation cache at ``path`` (created on
    demand).  Safe to call more than once; returns the directory."""
    import jax

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return os.environ["JAX_COMPILATION_CACHE_DIR"]
