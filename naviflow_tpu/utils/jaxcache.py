"""Persistent XLA compilation cache setup.

Large fused solver programs (SIMPLE outer loop x multigrid hierarchy) can
take minutes to compile through the TPU compile service; the persistent
cache makes that a once-per-machine cost instead of once-per-process.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def enable_persistent_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get("NAVIFLOW_JAX_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax versions
        pass
    return path
