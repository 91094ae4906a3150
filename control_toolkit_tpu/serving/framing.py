"""Shared ZeroMQ DEALER/ROUTER framing helper.

The wire contract (reference controller_server.py:57-64): a request arrives
as ``[identity, payload]`` or ``[identity, b"", payload]`` depending on the
client library; replies must mirror the framing they came in with.
"""
from __future__ import annotations

from typing import List, Optional, Tuple


def parse_dealer_frames(
    parts: List[bytes],
) -> Optional[Tuple[bytes, bytes, bool]]:
    """Return ``(identity, payload, framing3)`` or None for malformed
    framing (the caller skips the message — silence-on-error contract)."""
    if len(parts) == 2:
        return parts[0], parts[1], False
    if len(parts) == 3 and parts[1] == b"":
        return parts[0], parts[2], True
    return None
