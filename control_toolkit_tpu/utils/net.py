"""Small networking helpers shared by serving, tests, and examples."""
from __future__ import annotations

import socket


def free_port() -> int:
    """Ephemeral OS-assigned TCP port.

    Fixed test/demo ports collide with TIME_WAIT sockets from a previous
    (or concurrent) run and fail the bind — always ask the OS instead
    (CLAUDE.md ephemeral-port rule).
    """
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]
