"""Persistent XLA compilation cache.

The tunneled TPU backend remote-compiles over HTTP and takes minutes even
for small programs; the persistent cache makes every repeated invocation
(bench re-runs, eval with the same pyramid shapes, resumed training) skip
compilation entirely. Call :func:`enable` early — it is idempotent and safe
on any backend.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _host_fingerprint() -> str:
    """Microarch key for the cache path. XLA:CPU stores AOT machine code
    keyed only by program+options — NOT by host machine features — and
    loading an entry compiled on a different microarch both warns
    (cpu_aot_loader 'Compile machine features ... vs host') and produces
    float results a couple of ulps off fresh codegen, which breaks
    bitwise-parity tests. Splitting the cache per CPU-flags fingerprint
    makes a cache populated on one host invisible to a different one."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return platform.machine() or "unknown"


def enable(cache_dir: str = None):
    """Point JAX's persistent compilation cache at ``cache_dir`` (argument,
    else $OWSS_JAX_CACHE, else ``<repo>/.jax_cache``).

    Layout note: a per-host CPU-microarch fingerprint subdirectory is
    ALWAYS appended — including to explicitly user-provided paths — because
    sharing XLA:CPU AOT entries across microarchs is numerically unsafe
    (see _host_fingerprint). Consequences for pre-existing caches: entries
    written at the top level by older versions are orphaned (safe to
    delete), and a cache path shared by heterogeneous hosts accumulates one
    subdirectory per distinct CPU-flags set (each is independently valid;
    prune stale ones manually if disk matters)."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "OWSS_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    cache_dir = os.path.join(cache_dir, _host_fingerprint())
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    return cache_dir
