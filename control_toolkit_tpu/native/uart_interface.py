"""Python interface over the C++ UART protocol core.

Mirrors the reference ``Interface`` class surface
(/root/reference/Controllers/controller_embedded.py:113-346): open/close,
ping, get_spec (with retries and the hardcoded 7-input cartpole fallback),
send_controller_input, receive_controller_output, pending_spec adoption —
but all framing/CRC/IO runs in the native core (uart_core.cpp).
"""
from __future__ import annotations

import ctypes
from typing import List, Optional, Tuple

import numpy as np

from control_toolkit_tpu.native.build import load_uart_lib
from control_toolkit_tpu.utils.logging_util import get_logger

logger = get_logger(__name__)

# Fallback spec used when the chip never answers GET_SPEC
# (reference :242-250).
HARDCODED_SPEC: Tuple[int, List[str], int] = (
    1,
    ["angleD", "angle_cos", "angle_sin", "position", "positionD",
     "target_equilibrium", "target_position"],
    1,
)

NAMES_CAP = 4096


class UartInterface:
    def __init__(self):
        self._lib = load_uart_lib()
        self._h: Optional[int] = None
        self.pending_spec: Optional[Tuple[int, List[str], int]] = None
        self._port: Optional[str] = None
        self._baud: Optional[int] = None

    # ---- lifecycle --------------------------------------------------------
    def open(self, port: str, baud: int) -> None:
        if self._h:
            # Re-opening without closing leaks the native Uart struct and
            # its fd (which can keep the tty claimed -> EBUSY on retry).
            self.close()
        h = self._lib.ctt_uart_open(port.encode(), int(baud))
        if not h:
            raise IOError(f"cannot open serial device {port}")
        self._h = h
        self._port, self._baud = port, int(baud)

    def reconnect(self) -> bool:
        """Reopen the serial device after an IO failure (reference
        auto-reconnect loop, controller_embedded.py:294-302).  Only possible
        for port-opened interfaces, not wrapped fds."""
        if self._port is None:
            return False
        logger.warning(f"reconnecting serial device {self._port}")
        self.close()
        try:
            self.open(self._port, self._baud)
            return True
        except IOError:
            return False

    def open_fd(self, fd: int) -> None:
        """Attach to an existing file descriptor (pty fakes in tests)."""
        h = self._lib.ctt_uart_from_fd(int(fd))
        if not h:
            raise IOError("cannot wrap fd")
        self._h = h

    def close(self) -> None:
        if self._h:
            self._lib.ctt_uart_close(self._h)
            self._h = None

    def _handle(self) -> int:
        # The C entry points dereference the handle unconditionally: a
        # NULL from close()/failed reconnect() must surface as a Python
        # IOError, not a SIGSEGV of the control process.
        if not self._h:
            raise IOError("serial interface is not open (call open())")
        return self._h

    # ---- protocol ---------------------------------------------------------
    def ping(self, timeout_s: float = 1.0) -> bool:
        return bool(self._lib.ctt_uart_ping(self._handle(),
                                            int(timeout_s * 1000)))

    def crc8(self, data: bytes) -> int:
        buf = (ctypes.c_ubyte * len(data)).from_buffer_copy(data)
        return int(self._lib.ctt_uart_crc8(buf, len(data)))

    def get_spec(self, timeout_s: float = 2.0, max_retries: int = 3):
        version = ctypes.c_int()
        n_in = ctypes.c_int()
        n_out = ctypes.c_int()
        names_buf = ctypes.create_string_buffer(NAMES_CAP)
        ok = self._lib.ctt_uart_get_spec(
            self._handle(), ctypes.byref(version), names_buf, NAMES_CAP,
            ctypes.byref(n_in), ctypes.byref(n_out),
            int(timeout_s * 1000), int(max_retries),
        )
        if not ok:
            logger.warning("GET_SPEC failed; using hardcoded cartpole spec")
            return HARDCODED_SPEC
        names = names_buf.value.decode("ascii", errors="replace").split(",")
        return int(version.value), names, int(n_out.value)

    def send_controller_input(self, controller_input: np.ndarray) -> None:
        arr = np.ascontiguousarray(controller_input, dtype=np.float32)
        ptr = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        if not self._lib.ctt_uart_send_state(self._handle(), ptr, arr.size):
            raise IOError("send_controller_input failed")

    def receive_controller_output(self, n_outputs: int, timeout_s: float = 1.0) -> np.ndarray:
        out = np.empty(n_outputs, dtype=np.float32)
        ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        ok = self._lib.ctt_uart_receive_outputs(
            self._handle(), ptr, n_outputs, int(timeout_s * 1000)
        )
        if not ok and self.reconnect():
            ok = self._lib.ctt_uart_receive_outputs(
                self._handle(), ptr, n_outputs, int(timeout_s * 1000)
            )
        if not ok:
            raise IOError(
                f"receive_controller_output: expected {n_outputs * 4} bytes"
            )
        self._poll_pending_spec()
        return out

    def _poll_pending_spec(self) -> None:
        if self._lib.ctt_uart_has_pending_spec(self._handle()):
            version = ctypes.c_int()
            n_in = ctypes.c_int()
            n_out = ctypes.c_int()
            names_buf = ctypes.create_string_buffer(NAMES_CAP)
            if self._lib.ctt_uart_take_pending_spec(
                self._handle(), ctypes.byref(version), names_buf, NAMES_CAP,
                ctypes.byref(n_in), ctypes.byref(n_out),
            ):
                names = names_buf.value.decode("ascii", errors="replace").split(",")
                self.pending_spec = (int(version.value), names, int(n_out.value))

    def drain(self) -> None:
        self._lib.ctt_uart_drain(self._handle())
