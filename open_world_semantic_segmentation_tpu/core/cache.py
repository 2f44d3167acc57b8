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
    (cpu_aot_loader 'Compile machine features ... vs host') and at best
    produces float results a couple of ulps off fresh codegen (breaking
    bitwise-parity tests), at worst ABORTS mid-run (observed: entries
    carrying ``+prefer-no-gather``/``+amx-*`` loaded on a later host
    whose LLVM detection lacked them -> SIGABRT inside a training loop).

    The flags line alone proved insufficient: two VM hosts reported an
    identical ``flags`` line while LLVM (which reads CPUID directly, and
    whose own version picks tuning features like ``prefer-no-gather``)
    produced different target machines. So the key hashes every stable
    CPU-identity line (model name / family / model / stepping /
    microcode / flags — volatile lines like ``cpu MHz`` excluded) PLUS
    the jax+jaxlib versions, covering both hardware rotation and
    toolchain bumps. A cache populated under any other combination is
    simply invisible (orphaned, safe to prune)."""
    ident = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features", "model name",
                                    "cpu family", "model\t", "model :",
                                    "stepping", "microcode")):
                    ident.append(line.strip())
                if len(ident) >= 12:  # lines repeat per core; one is enough
                    break
    except OSError:
        pass
    try:
        import jax
        import jaxlib

        ident.append(f"jax={jax.__version__} jaxlib={jaxlib.__version__}")
    except Exception:
        pass
    if not ident:
        return platform.machine() or "unknown"
    return hashlib.sha1("\n".join(sorted(set(ident))).encode()) \
        .hexdigest()[:10]


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
