"""Process-level runtime setup shared by the CLI entry points."""

from __future__ import annotations

import os


def setup_compile_cache(path: str = os.path.expanduser("~/.jax_cache")) -> None:
    """Enable JAX's persistent compilation cache (all entries, no size/time
    floor).  Used by bench.py and the multi-host worker: remote TPU compiles
    through the axon tunnel are erratic (seconds to minutes for the same
    program), and on a contended host a cold compile can outlast a peer's
    collective timeout — a warm cache makes dispatch immediate."""
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these keys: run uncached
