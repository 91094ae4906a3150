"""Serial-port discovery and FTDI latency tuning.

Capability parity with the reference serial_interface_helper
(/root/reference/serial_interface_helper.py:9-105): locate the USB-serial
device for an STM or ZYNQ board by its USB descriptor strings, and lower the
FTDI latency timer to 1 ms via sysfs (sudo escalation when not writable).
Implemented over /sys + /dev/serial/by-id so no pyserial dependency is
needed (the transport itself is the C++ core).
"""
from __future__ import annotations

import os
import subprocess
from pathlib import Path
from typing import List, Optional

from control_toolkit_tpu.utils.logging_util import get_logger

logger = get_logger(__name__)

# USB descriptor substrings identifying the supported boards.
BOARD_DESCRIPTORS = {
    "stm": ["STM", "STLink", "STMicroelectronics"],
    "zynq": ["Digilent", "Zynq", "FT2232"],
}

# Filesystem roots — module constants so tests can point them at a fake
# tree (no hardware, no sudo).
DEV_DIR = "/dev"
BY_ID_DIR = "/dev/serial/by-id"
SYSFS_LATENCY_FMT = "/sys/bus/usb-serial/devices/{dev}/latency_timer"


def list_serial_ports() -> List[str]:
    """Enumerate candidate serial devices, stable by-id paths first."""
    ports: List[str] = []
    by_id = Path(BY_ID_DIR)
    if by_id.is_dir():
        ports += sorted(str(p) for p in by_id.iterdir())
    for pattern in ("ttyUSB", "ttyACM"):
        ports += sorted(
            f"{DEV_DIR}/{d}" for d in os.listdir(DEV_DIR) if d.startswith(pattern)
        )
    return ports


def get_serial_port(serial_port_number: Optional[str] = None,
                    chip_type: Optional[str] = None) -> str:
    """Resolve the serial device path.

    Explicit path wins; otherwise search by USB descriptor for the chip
    type; otherwise the first available port.
    """
    if serial_port_number:
        return str(serial_port_number)

    ports = list_serial_ports()
    if not ports:
        raise IOError("no serial ports found")

    if chip_type:
        needles = BOARD_DESCRIPTORS.get(chip_type.lower(), [chip_type])
        for p in ports:
            if any(n.lower() in p.lower() for n in needles):
                return p
        logger.warning(f"no port matched {chip_type!r}; using {ports[0]}")
    return ports[0]


def set_ftdi_latency_timer(serial_port: str, latency_ms: int = 1) -> None:
    """Set the FTDI latency timer (default 16 ms -> 1 ms) via sysfs.

    Reference behavior (serial_interface_helper.py:74-105): write the sysfs
    knob directly, escalate with sudo when it isn't writable; a failure is
    logged, not fatal.
    """
    dev = os.path.basename(os.path.realpath(serial_port))
    sysfs = Path(SYSFS_LATENCY_FMT.format(dev=dev))
    if not sysfs.exists():
        logger.debug(f"{sysfs} not present (not an FTDI device?); skipping")
        return
    try:
        current = sysfs.read_text().strip()
        if current == str(latency_ms):
            return
        try:
            sysfs.write_text(str(latency_ms))
        except PermissionError:
            subprocess.run(
                ["sudo", "sh", "-c", f"echo {latency_ms} > {sysfs}"],
                check=True, capture_output=True,
            )
        logger.info(f"FTDI latency timer on {dev}: {current} -> {latency_ms} ms")
    except Exception as e:
        logger.warning(f"could not set FTDI latency timer: {e}")
