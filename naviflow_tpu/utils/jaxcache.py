"""Persistent XLA compilation cache setup.

Large fused solver programs (SIMPLE outer loop x multigrid hierarchy) can
take minutes to compile through the TPU compile service; the persistent
cache makes that a once-per-machine cost instead of once-per-process.

The cache directory is keyed by a HOST FINGERPRINT (machine-id + CPU model
hash).  Sessions on this runtime migrate across hosts whose /proc/cpuinfo
flags are near-identical but whose XLA:CPU target features differ
(+prefer-no-gather/+prefer-no-scatter); XLA loads a stale AOT entry from
another host with only a warning ("could lead to execution errors such as
SIGILL") and the miscompiled program silently returns NaN fields — this
was observed, not hypothesized.  Per-host cache directories make
cross-host loads impossible while keeping the within-host benefit.
"""

from __future__ import annotations

import hashlib
import os

_BASE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def _host_fingerprint() -> str:
    parts = []
    try:
        with open("/etc/machine-id") as f:
            parts.append(f.read().strip())
    except OSError:
        parts.append(os.uname().nodename)
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    parts.append(line.strip())
                    if len(parts) >= 3:
                        break
    except OSError:
        pass
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def enable_persistent_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get("NAVIFLOW_JAX_CACHE")
    if path is None:
        path = os.path.join(_BASE_DIR, f"host-{_host_fingerprint()}")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax versions
        pass
    return path
