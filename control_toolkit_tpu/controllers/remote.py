"""Remote controller — ZeroMQ DEALER proxy.

Capability parity with the reference controller_remote
(/root/reference/Controllers/controller_remote.py:14-124): monotonically
increasing request id, 50 ms receive timeout, stale-reply dropping (replies
whose rid != the latest request's are discarded), inbound-queue purge on
timeout, and fallback to a local controller or zero control.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from control_toolkit_tpu.controllers.base import Controller
from control_toolkit_tpu.utils import registry
from control_toolkit_tpu.utils.logging_util import get_logger

logger = get_logger(__name__)

DEFAULT_RCVTIMEO_MS = 50


@registry.controllers.register("remote")
class RemoteController(Controller):
    def configure(self, **kwargs) -> None:
        import zmq

        self._zmq = zmq
        host = self.config_controller.get("host", "localhost")
        port = self.config_controller.get("port", 5555)
        self.endpoint = self.config_controller.get(
            "remote_endpoint", f"tcp://{host}:{port}"
        )
        timeout = int(self.config_controller.get("timeout_ms", DEFAULT_RCVTIMEO_MS))
        if timeout <= 0:
            # ZMQ's default RCVTIMEO is -1 (block forever): accepting 0 or
            # a negative here would make the first step against a dead
            # server hang the loop — the opposite of this controller's
            # fall-back-to-local deadline contract.
            raise ValueError(
                f"timeout_ms must be positive, got {timeout} "
                f"(default {DEFAULT_RCVTIMEO_MS})"
            )

        self._ctx = zmq.Context.instance()
        self._sock = self._ctx.socket(zmq.DEALER)
        self._sock.connect(self.endpoint)
        self._sock.setsockopt(zmq.RCVTIMEO, timeout)
        self._next_rid = 0
        logger.info(f"remote controller connected to {self.endpoint}")

        fallback = self.config_controller.get(
            "fallback_controller", self.config_controller.get("fallback_controller_name")
        )
        self._fallback = None
        if fallback:
            FallbackCls = registry.import_controller_by_name(fallback)
            self._fallback = FallbackCls(
                self.environment_name, self.control_limits,
                dict(self.variable_parameters),
            )
            self._fallback.configure()

    def _fallback_u(self, s, time, updated_attributes):
        if self._fallback is not None:
            return self._fallback.step(s, time=time, updated_attributes=updated_attributes)
        return np.zeros_like(np.atleast_1d(self.action_low), dtype=np.float32)

    def step(self, s: np.ndarray, time=None, updated_attributes: Optional[Dict] = None):
        zmq = self._zmq
        updated_attributes = updated_attributes or {}
        rid = self._next_rid
        self._next_rid += 1

        self._sock.send_json({
            "rid": rid,
            "state": np.asarray(s, dtype=np.float32).tolist(),
            # numpy scalars (np.float32 loop time) are not JSON
            # serializable; a raw `time` would TypeError out of the very
            # controller meant to degrade gracefully.
            "time": None if time is None else float(time),
            "updated_attributes": {
                k: (np.asarray(v).tolist() if hasattr(v, "tolist") else v)
                for k, v in updated_attributes.items()
            },
        })

        try:
            resp = self._sock.recv_json()
        except zmq.error.Again:
            self._purge_stale()
            return self._fallback_u(s, time, updated_attributes)

        # Drop stale replies until the current rid arrives (reference :92-101).
        while resp.get("rid") != rid:
            try:
                resp = self._sock.recv_json()
            except zmq.error.Again:
                return self._fallback_u(s, time, updated_attributes)

        if "error" in resp:
            raise RuntimeError(f"Remote controller error: {resp['error']}")
        return np.asarray(resp["Q"], dtype=np.float32)

    def _purge_stale(self) -> None:
        zmq = self._zmq
        while True:
            try:
                self._sock.recv(flags=zmq.DONTWAIT)
            except zmq.error.Again:
                break

    def controller_reset(self) -> None:
        """Server keeps the optimizer state; nothing to reset locally."""
