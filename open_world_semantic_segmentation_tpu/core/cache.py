"""Persistent XLA compilation cache.

The tunneled TPU backend remote-compiles over HTTP and takes minutes even
for small programs; the persistent cache makes every repeated invocation
(bench re-runs, eval with the same pyramid shapes, resumed training) skip
compilation entirely. Call :func:`enable` early — it is idempotent and safe
on any backend.
"""

from __future__ import annotations

import os


def enable(cache_dir: str = None):
    import jax

    cache_dir = cache_dir or os.environ.get(
        "OWSS_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    return cache_dir
