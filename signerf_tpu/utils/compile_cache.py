"""Persistent XLA compilation cache setup.

Sheet-scale SDXL programs take minutes to compile (measured: ~39 min of
one-time compiles in a cold reference-scale edit pass over the dev tunnel);
with the persistent cache enabled, every later process reuses them. bench.py
has always enabled this — entry points (train/render/eval CLIs, examples)
call this helper so interactive runs get the same behavior.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    """Point JAX's persistent compilation cache at `path` (default
    ~/.jax_cache, honoring JAX_COMPILATION_CACHE_DIR if already set).
    Call BEFORE the first jit dispatch; safe to call repeatedly."""
    cache_dir = os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        path or os.path.expanduser("~/.jax_cache"),
    )
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Only persist programs worth the disk/serialization cost.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
