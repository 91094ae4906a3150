"""Pty-based fake SoC firmware implementing the framed UART protocol.

Independent Python implementation of the wire format (SOF 0xAA, msg types
0x01-0x04, CRC-8 poly 0x8C, GET_SPEC payload with 24-byte name tokens) used
to round-trip test the C++ UART core without hardware.
"""
from __future__ import annotations

import os
import struct
import threading
from typing import List, Optional

SOF = 0xAA
MSG_STATE = 0x01
MSG_GET_SPEC = 0x02
MSG_PING = 0x03
MSG_SPEC_COOKIE = 0x04
TOKEN_LEN = 24


def crc8(data) -> int:
    crc = 0
    for val in data:
        for _ in range(8):
            mix = (crc ^ val) & 1
            crc >>= 1
            if mix:
                crc ^= 0x8C
            val >>= 1
    return crc


class FakeFirmware:
    """Runs a policy `outputs = f(inputs)` behind the protocol on a pty."""

    def __init__(self, input_names: List[str], n_outputs: int = 1,
                 version: int = 1, policy=None):
        self.input_names = input_names
        self.n_outputs = n_outputs
        self.version = version
        self.policy = policy or (lambda x: [-0.5 * x[0]] * n_outputs)
        self.master_fd, self.slave_fd = os.openpty()
        import tty
        tty.setraw(self.master_fd)
        tty.setraw(self.slave_fd)
        self.slave_name = os.ttyname(self.slave_fd)
        self._stop = threading.Event()
        self.announce_new_spec: Optional[tuple] = None  # set to trigger cookie
        self.requests_served = 0
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _spec_payload(self) -> bytes:
        hdr = bytes([self.version, len(self.input_names), self.n_outputs, TOKEN_LEN])
        toks = b"".join(
            name.encode("ascii").ljust(TOKEN_LEN, b"\x00") for name in self.input_names
        )
        return hdr + toks

    def _run(self):
        buf = bytearray()
        while not self._stop.is_set():
            try:
                data = os.read(self.master_fd, 256)
            except OSError:
                break
            if not data:
                break
            buf.extend(data)
            while len(buf) >= 4:
                if buf[0] != SOF:
                    del buf[0]
                    continue
                msg_type = buf[1]
                length = buf[2]
                if len(buf) < length:
                    break
                frame = bytes(buf[:length])
                del buf[:length]
                if crc8(frame[:-1]) != frame[-1]:
                    continue
                self._handle(msg_type, frame)

    def _handle(self, msg_type: int, frame: bytes):
        if msg_type == MSG_PING:
            reply = bytes([SOF, MSG_PING, 4])
            os.write(self.master_fd, reply + bytes([crc8(reply)]))
        elif msg_type == MSG_GET_SPEC:
            os.write(self.master_fd, self._spec_payload())
        elif msg_type == MSG_STATE:
            self.requests_served += 1
            floats = struct.unpack(f"<{(len(frame) - 4) // 4}f", frame[3:-1])
            outs = self.policy(list(floats))
            if self.announce_new_spec is not None:
                # Cookie frame, then the new spec payload, then the outputs.
                version, names, n_outputs = self.announce_new_spec
                self.version, self.input_names, self.n_outputs = version, names, n_outputs
                cookie = bytes([SOF, MSG_SPEC_COOKIE, 4])
                os.write(self.master_fd, cookie + bytes([crc8(cookie)]))
                os.write(self.master_fd, self._spec_payload())
                self.announce_new_spec = None
                outs = outs[: self.n_outputs] + [0.0] * max(0, self.n_outputs - len(outs))
            os.write(self.master_fd, struct.pack(f"<{len(outs)}f", *outs))

    def stop(self):
        self._stop.set()
        os.close(self.master_fd)
