"""Device pinning for controllers/optimizers.

The reference pins a controller's compute via ``lib.set_device`` driven by
the controller config's ``device`` key (/root/reference/Controllers/
__init__.py:72-78).  The JAX-native equivalent: resolve the key to a
``jax.Device`` and run the controller's jitted work inside
``jax.default_device``.

Why this matters on TPU: latency-bound tiny-op programs (single-start iLQR:
sequential H-step Riccati/rollout scans of 5x5 matrices) run ~2x FASTER on
the host CPU device than on the accelerator (measured v5e, H=50, 30 iters:
34 ms CPU vs 66 ms TPU), while batch work (multi-start, sampling
optimizers) belongs on the TPU (8-start iLQR: 38 ms TPU vs 122 ms CPU).
docs/TUNING.md carries the selection rule.
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
    s = str(spec).strip().lower()
    s = s.replace("/physical_device:", "").lstrip("/")
    parts = [p for p in s.split(":") if p != ""]
    kind = parts[0]
    idx = int(parts[1]) if len(parts) > 1 else 0
    import jax

    try:
        return jax.devices(kind)[idx]
    except (RuntimeError, IndexError):
        logger.warning(
            f"device {spec!r} not available "
            f"(backends: {jax.default_backend()}); using the default device"
        )
        return None


def device_scope(device):
    """Context manager placing jitted work on ``device`` (no-op for None)."""
    if device is None:
        return nullcontext()
    import jax

    return jax.default_device(device)
