"""Seed handling.

Replaces the reference's three backend-specific generators
(/root/reference/others/globals_and_utils.py:61-99) with a single JAX PRNG-key
source.  Seed ``None`` derives a seed from the current datetime at the Python
edge only (same policy as globals_and_utils.py:87-91); inside jitted programs
keys are threaded explicitly through optimizer state.
"""
from __future__ import annotations

from datetime import datetime
from typing import Optional

import jax

from control_toolkit_tpu.utils.logging_util import get_logger

logger = get_logger(__name__)


def derive_seed(seed: Optional[int], context: str = "") -> int:
    if seed is not None:
        return int(seed)
    # Datetime-derived seed, matching the reference policy of "null => now".
    now = datetime.now()
    derived = int((now.timestamp() * 1e6) % (2**31 - 1))
    logger.info(f"{context}: seed=None, derived seed {derived} from datetime")
    return derived


def make_key(seed: Optional[int], context: str = "") -> jax.Array:
    return jax.random.PRNGKey(derive_seed(seed, context))
