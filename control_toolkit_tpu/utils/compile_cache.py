"""Persistent XLA compilation cache for serving restarts.

The reference pays TensorFlow retracing on every process start and carries
no cache.  On TPU the stakes are higher: a fused controller build costs
seconds-to-minutes of XLA compile (2-250 s observed through this tunnel),
paid again on every serving restart, config rollout, or crash recovery.
JAX ships a persistent compilation cache keyed by (program, compile flags,
backend); enabling it turns restart compiles into disk reads.

Opt-in: call ``enable_persistent_cache()`` before building controllers, or
pass ``--compile-cache[=DIR]`` to the serving CLIs.  Safe to enable in
every process that shares the directory — entries are content-addressed
and writes are atomic (JAX writes via temp+rename).
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

DEFAULT_DIR = os.environ.get(
    "CONTROL_TOOLKIT_COMPILE_CACHE",
    str(Path.home() / ".cache" / "control_toolkit_tpu" / "xla"),
)


def enable_persistent_cache(
    path: Optional[str] = None,
    min_compile_time_secs: float = 0.5,
) -> str:
    """Point JAX's persistent compilation cache at ``path`` (created if
    missing) and lower the entry threshold so sub-second controller
    programs cache too.  Returns the cache directory.  Call BEFORE the
    first jit compile; enabling later only affects subsequent compiles.
    """
    import jax

    cache_dir = str(Path(path or DEFAULT_DIR).expanduser())
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_time_secs)
    )
    # Cache every program regardless of serialized size (default threshold
    # can skip the small per-tick programs that dominate serving restarts).
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir


def cache_entry_count(path: Optional[str] = None) -> int:
    """Number of cached executables under the cache dir (0 if absent)."""
    root = Path(path or DEFAULT_DIR).expanduser()
    if not root.is_dir():
        return 0
    return sum(1 for p in root.rglob("*") if p.is_file())
