"""UART fault injection + serial_helper unit tests (VERDICT r2 item 5).

Fault injection drives the C++ core's sliding-window resync (the
reference's _receive_reply loop, controller_embedded.py:289-333): garbage
preambles, corrupted CRCs, and truncated frames must be skipped, not
fatal.  serial_helper is exercised against a fake /dev + sysfs tree.
"""
import os
import struct

import numpy as np
import pytest

from fake_firmware import FakeFirmware, SOF, MSG_PING, crc8 as py_crc8

from control_toolkit_tpu.native.uart_interface import UartInterface
from control_toolkit_tpu import serial_helper


@pytest.fixture
def firmware():
    fw = FakeFirmware(
        input_names=["a", "b"], n_outputs=1, policy=lambda x: [x[0] + x[1]]
    )
    yield fw
    fw.stop()


def open_iface(fw):
    iface = UartInterface()
    iface.open_fd(fw.slave_fd)
    return iface


# ---------------------------------------------------------------- faults
def test_ping_resyncs_through_garbage_preamble(firmware):
    """Line noise before the pong: the scanner drops bytes until the valid
    frame aligns."""
    iface = open_iface(firmware)
    os.write(firmware.master_fd, b"\x13\x37\xde\xad\xbe\xef" * 3)
    assert iface.ping(timeout_s=2.0)


def test_ping_resyncs_through_corrupted_crc_frame(firmware):
    """A pong-shaped frame with a bad CRC is rejected; the real pong that
    follows is accepted."""
    iface = open_iface(firmware)
    bad = bytes([SOF, MSG_PING, 4, 0x00])  # CRC wrong (real crc != 0)
    assert py_crc8(bad[:3]) != 0x00
    os.write(firmware.master_fd, bad)
    assert iface.ping(timeout_s=2.0)


def test_ping_resyncs_through_truncated_frame(firmware):
    """A truncated frame head (SOF + type, then nothing valid) must not
    wedge the scanner."""
    iface = open_iface(firmware)
    os.write(firmware.master_fd, bytes([SOF, MSG_PING]))  # truncated
    assert iface.ping(timeout_s=2.0)


def test_ping_times_out_on_silence():
    master, slave = os.openpty()
    iface = UartInterface()
    iface.open_fd(slave)
    assert not iface.ping(timeout_s=0.2)
    os.close(master)


def test_ping_rejects_pure_garbage_then_times_out():
    master, slave = os.openpty()
    iface = UartInterface()
    iface.open_fd(slave)
    os.write(master, b"\x55" * 64)
    assert not iface.ping(timeout_s=0.3)
    os.close(master)


def test_truncated_output_raises_ioerror(firmware):
    """Reference contract: a short output read is an IOError
    (controller_embedded.py:276-279), not silent zeros."""
    iface = open_iface(firmware)
    iface.get_spec()
    # Ask for MORE outputs than the firmware sends -> short read.
    iface.send_controller_input(np.array([0.1, 0.2], np.float32))
    with pytest.raises(IOError, match="expected"):
        iface.receive_controller_output(3, timeout_s=0.3)


def test_spec_retry_through_garbage(firmware):
    """First GET_SPEC attempt poisoned by noise; the retry drains and
    succeeds (reference 3-retry semantics)."""
    iface = open_iface(firmware)
    os.write(firmware.master_fd, b"\x00\xff\x00\xff")
    version, names, n_out = iface.get_spec(timeout_s=1.0, max_retries=3)
    assert (version, names, n_out) == (1, ["a", "b"], 1)


def test_state_round_trip_after_fault_recovery(firmware):
    """After all the noise, the data path still works."""
    iface = open_iface(firmware)
    os.write(firmware.master_fd, b"\x99" * 7)
    assert iface.ping(timeout_s=2.0)
    iface.drain()
    iface.send_controller_input(np.array([0.25, 0.5], np.float32))
    out = iface.receive_controller_output(1, timeout_s=2.0)
    np.testing.assert_allclose(out, [0.75], rtol=1e-6)


# ---------------------------------------------------------- serial_helper
@pytest.fixture
def fake_tree(tmp_path, monkeypatch):
    dev = tmp_path / "dev"
    by_id = dev / "serial" / "by-id"
    by_id.mkdir(parents=True)
    sys_root = tmp_path / "sys"
    monkeypatch.setattr(serial_helper, "DEV_DIR", str(dev))
    monkeypatch.setattr(serial_helper, "BY_ID_DIR", str(by_id))
    monkeypatch.setattr(
        serial_helper, "SYSFS_LATENCY_FMT",
        str(sys_root / "bus" / "usb-serial" / "devices" / "{dev}" / "latency_timer"),
    )
    return dev, by_id, sys_root


def test_list_serial_ports_orders_by_id_first(fake_tree):
    dev, by_id, _ = fake_tree
    (dev / "ttyUSB0").touch()
    (dev / "ttyACM1").touch()
    (by_id / "usb-STMicroelectronics_STLink_066-if02").symlink_to(dev / "ttyUSB0")
    ports = serial_helper.list_serial_ports()
    assert ports[0].endswith("usb-STMicroelectronics_STLink_066-if02")
    assert any(p.endswith("ttyACM1") for p in ports)
    assert any(p.endswith("ttyUSB0") for p in ports)


def test_get_serial_port_explicit_wins(fake_tree):
    assert serial_helper.get_serial_port("/dev/ttyS9") == "/dev/ttyS9"


def test_get_serial_port_by_descriptor(fake_tree):
    dev, by_id, _ = fake_tree
    (dev / "ttyUSB0").touch()
    (dev / "ttyUSB1").touch()
    (by_id / "usb-Digilent_JTAG-SMT2-if01").symlink_to(dev / "ttyUSB1")
    (by_id / "usb-STMicroelectronics_STLink-if02").symlink_to(dev / "ttyUSB0")
    assert "Digilent" in serial_helper.get_serial_port(chip_type="zynq")
    assert "STMicroelectronics" in serial_helper.get_serial_port(chip_type="stm")


def test_get_serial_port_no_match_falls_back_to_first(fake_tree):
    dev, _, _ = fake_tree
    (dev / "ttyUSB7").touch()
    p = serial_helper.get_serial_port(chip_type="stm")
    assert p.endswith("ttyUSB7")


def test_get_serial_port_raises_when_empty(fake_tree):
    with pytest.raises(IOError, match="no serial ports"):
        serial_helper.get_serial_port()


def test_ftdi_latency_timer_write(fake_tree):
    dev, by_id, sys_root = fake_tree
    tty = dev / "ttyUSB0"
    tty.touch()
    knob_dir = sys_root / "bus" / "usb-serial" / "devices" / "ttyUSB0"
    knob_dir.mkdir(parents=True)
    knob = knob_dir / "latency_timer"
    knob.write_text("16")
    serial_helper.set_ftdi_latency_timer(str(tty), 1)
    assert knob.read_text().strip() == "1"
    # Already-set value: second call is a no-op (no error, unchanged).
    serial_helper.set_ftdi_latency_timer(str(tty), 1)
    assert knob.read_text().strip() == "1"


def test_ftdi_latency_timer_missing_sysfs_is_noop(fake_tree):
    dev, _, _ = fake_tree
    tty = dev / "ttyACM0"
    tty.touch()
    serial_helper.set_ftdi_latency_timer(str(tty), 1)  # must not raise


def test_pipelined_reply_after_pong_not_lost():
    """Review r3 regression: bytes the resync scanner over-reads past the
    matched frame must survive for the next read (pipelined replies)."""
    import struct

    master, slave = os.openpty()
    import tty
    tty.setraw(master); tty.setraw(slave)
    iface = UartInterface()
    iface.open_fd(slave)
    pong = bytes([SOF, MSG_PING, 4])
    pong += bytes([py_crc8(pong)])
    payload = struct.pack("<f", 0.625)
    # One contiguous write: pong immediately followed by an output frame.
    os.write(master, pong + payload)
    assert iface.ping(timeout_s=2.0)
    out = iface.receive_controller_output(1, timeout_s=1.0)
    np.testing.assert_allclose(out, [0.625], rtol=1e-6)
    os.close(master)


def test_uart_interface_guards_null_handle(tmp_path):
    """Protocol methods on a closed interface raise IOError instead of
    passing NULL into the C core (SIGSEGV; review r5)."""
    import numpy as np
    import pytest

    from control_toolkit_tpu.native.uart_interface import UartInterface

    iface = UartInterface()
    assert iface._h is None
    with pytest.raises(IOError, match="not open"):
        iface.send_controller_input(np.zeros(4, np.float32))
    with pytest.raises(IOError, match="not open"):
        iface.receive_controller_output(1)
    with pytest.raises(IOError, match="not open"):
        iface.drain()
    with pytest.raises(IOError, match="not open"):
        iface.ping()
