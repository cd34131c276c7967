"""JAX environment knobs shared by library, tests and bench.

The axon TPU tunnel makes every fresh compile expensive (each XLA compile
round-trips the tunnel), so a persistent compilation cache is essential.
"""

from __future__ import annotations

import os

_DONE = False


def ensure_compile_cache(path: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    import jax

    cache = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older/newer jax without these flags
    _DONE = True
