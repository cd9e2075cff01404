"""
Persistent XLA compilation cache setup.

Fresh processes in this environment pay multi-minute remote compiles (the
tunnel's compile cache is per-session — CLAUDE.md); JAX's persistent
compilation cache cuts a cold HRNet-W32 start from ~150s to ~27s. Call
:func:`enable_compilation_cache` before the first jit execution (bench.py,
__graft_entry__.py, and the CLI scripts do).
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None):
    import jax

    cache_dir = cache_dir or os.environ.get("STLPOSE_JAX_CACHE",
                                            DEFAULT_CACHE_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization, never a requirement
    return cache_dir
