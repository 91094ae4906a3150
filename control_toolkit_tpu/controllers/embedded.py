"""Embedded controller — control computed on an external SoC over UART.

Capability parity with the reference controller_embedded
(/root/reference/Controllers/controller_embedded.py:20-98): GET_SPEC
handshake adopts the chip-declared input wire order and output count;
each step assembles the float32 input vector by name with precedence
updated_attributes > state > variable_parameters > 0.0 ("time" comes from
the host clock argument and is required if declared); outputs are
nan-guarded and reshaped to [1, 1, U]; a cookie-triggered spec refresh is
adopted at the next step.  The framing/CRC transport is the C++ core
(native/uart_core.cpp) instead of pyserial.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from control_toolkit_tpu.controllers.base import Controller
from control_toolkit_tpu.models.dynamics import state_indices
from control_toolkit_tpu.utils import registry
from control_toolkit_tpu.utils.logging_util import get_logger

logger = get_logger(__name__)


@registry.controllers.register("embedded")
class EmbeddedController(Controller):
    def configure(self, interface=None, **kwargs) -> None:
        from control_toolkit_tpu.native.uart_interface import UartInterface

        if interface is not None:
            # Test hook: pre-opened interface (e.g. wrapping a pty fd).
            self.interface = interface
        else:
            from control_toolkit_tpu.serial_helper import (
                get_serial_port, set_ftdi_latency_timer,
            )
            port = get_serial_port(self.config_controller.get("port"))
            baud = int(self.config_controller.get("baudrate", 115200))
            set_ftdi_latency_timer(port)
            self.interface = UartInterface()
            self.interface.open(port, baud)

        self.spec_version, self.input_names, self.n_outputs = self.interface.get_spec()
        self._state_idx = state_indices(self.environment_name)
        self.just_restarted = True
        logger.info(
            f"configured SoC controller spec v{self.spec_version}: "
            f"{len(self.input_names)} inputs -> {self.n_outputs} outputs"
        )

    def _assemble_inputs(self, s, time, updated_attributes) -> np.ndarray:
        from control_toolkit_tpu.controllers.base import resolve_named_inputs

        return resolve_named_inputs(
            self.input_names, self._state_idx, s, updated_attributes,
            self.variable_parameters, time=time,
        )

    def step(self, s: np.ndarray, time=None, updated_attributes: Optional[Dict] = None):
        self.just_restarted = False
        updated_attributes = updated_attributes or {}
        self.update_attributes(updated_attributes)

        arr = self._assemble_inputs(s, time, updated_attributes)
        self.interface.send_controller_input(arr)
        out = self.interface.receive_controller_output(self.n_outputs)

        if self.interface.pending_spec is not None:
            self.spec_version, self.input_names, self.n_outputs = self.interface.pending_spec
            self.interface.pending_spec = None
            logger.info(
                f"refreshed SoC spec (v{self.spec_version}): "
                f"{len(self.input_names)} inputs, {self.n_outputs} outputs"
            )

        out = np.nan_to_num(
            np.asarray(out, np.float32), nan=0.0, posinf=0.0, neginf=0.0
        )
        return out[np.newaxis, np.newaxis, :]

    def controller_reset(self) -> None:
        if not self.just_restarted:
            self.configure(interface=self.interface)
