"""Device pinning for controllers/optimizers.

The reference pins a controller's compute via ``lib.set_device`` driven by
the controller config's ``device`` key (/root/reference/Controllers/
__init__.py:72-78).  The JAX-native equivalent: resolve the key to a
``jax.Device`` and run the controller's jitted work inside
``jax.default_device``.

Why this matters on TPU: latency-bound tiny-op programs (single-start iLQR:
sequential H-step line-search/rollout scans of 5x5 matrices) run ~3x faster
pinned to the host CPU, while batch work (multi-start, sampling optimizers)
belongs on the TPU.  docs/TUNING.md rule 6 carries the measured numbers and
the selection rule (single source of truth — refreshed with each
bench_scale run).
"""
from __future__ import annotations

from contextlib import nullcontext
from typing import Optional

from control_toolkit_tpu.utils.logging_util import get_logger

logger = get_logger(__name__)


def resolve_device(spec) -> Optional[object]:
    """Resolve a config ``device`` value to a jax.Device (None = default).

    Accepts ``"cpu"``, ``"tpu"``, ``"gpu"``, ``"tpu:1"``, and TF-style
    strings like ``"/physical_device:GPU:0"`` for config compatibility.
    Unavailable platforms log a warning and fall back to the default device
    (mirroring the reference's tf.device graceful behavior).
    """
    if spec in (None, "", "default"):
        return None
    import jax

    try:
        s = str(spec).strip().lower()
        s = s.replace("/physical_device:", "").lstrip("/")
        parts = [p for p in s.split(":") if p != ""]
        kind = parts[0]
        idx = int(parts[1]) if len(parts) > 1 else 0
        return jax.devices(kind)[idx]
    except (RuntimeError, IndexError, ValueError):
        # Malformed specs fall back too — a controller must not fail to
        # construct over a config typo (the reference's tf.device is
        # likewise non-fatal).
        logger.warning(
            f"device {spec!r} not available or malformed "
            f"(backends: {jax.default_backend()}); using the default device"
        )
        return None


def device_scope(device):
    """Context manager placing jitted work on ``device`` (no-op for None)."""
    if device is None:
        return nullcontext()
    import jax

    return jax.default_device(device)
