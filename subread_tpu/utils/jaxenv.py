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
    # Keep XLA_FLAGS identical across pytest (which needs the 8-device CPU
    # mesh) and CLI/bench runs: the flag string participates in the
    # persistent-cache key, so a mismatch splits the cache into two
    # universes that each recompile everything (~10min/graph via tunnel).
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
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
