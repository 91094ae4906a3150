"""C++ UART core + embedded controller vs the pty fake firmware."""
import numpy as np
import pytest

from fake_firmware import FakeFirmware, crc8 as py_crc8

from control_toolkit_tpu.controllers.embedded import EmbeddedController
from control_toolkit_tpu.native.uart_interface import HARDCODED_SPEC, UartInterface


@pytest.fixture
def firmware():
    fw = FakeFirmware(
        input_names=["angleD", "angle", "position", "positionD", "target_position"],
        n_outputs=1,
        policy=lambda x: [-0.5 * x[1] - 0.1 * x[0]],
    )
    yield fw
    fw.stop()


def open_iface(fw):
    iface = UartInterface()
    iface.open_fd(fw.slave_fd)
    return iface


def test_crc8_matches_python_reference():
    iface = UartInterface()  # loads/builds the native lib
    for msg in (b"", b"\xaa\x01\x08", b"hello world", bytes(range(256))):
        assert iface.crc8(msg) == py_crc8(msg)


def test_ping_and_spec_handshake(firmware):
    iface = open_iface(firmware)
    assert iface.ping(timeout_s=2.0)
    version, names, n_out = iface.get_spec()
    assert version == 1
    assert names == ["angleD", "angle", "position", "positionD", "target_position"]
    assert n_out == 1


def test_state_round_trip(firmware):
    iface = open_iface(firmware)
    iface.get_spec()
    x = np.array([0.2, 0.4, 0.0, 0.0, 0.0], np.float32)
    iface.send_controller_input(x)
    out = iface.receive_controller_output(1, timeout_s=2.0)
    np.testing.assert_allclose(out, [-0.5 * 0.4 - 0.1 * 0.2], rtol=1e-6)


def test_get_spec_fallback_without_firmware():
    """Dead line: after retries the hardcoded cartpole spec applies."""
    import os
    master, slave = os.openpty()
    iface = UartInterface()
    iface.open_fd(slave)
    spec = iface.get_spec(timeout_s=0.1, max_retries=2)
    assert spec == HARDCODED_SPEC
    os.close(master)


def test_embedded_controller_closed_loop(firmware):
    ctrl = EmbeddedController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"controller_logging": False},
    )
    ctrl.configure(interface=open_iface(firmware))
    assert ctrl.input_names[0] == "angleD"

    s = np.array([0.1, 0.0, 0.3, 0.2], np.float32)  # [pos, posD, angle, angleD]
    Q = ctrl.step(s, time=0.0)
    assert Q.shape == (1, 1, 1)
    # wire order: angleD=0.2, angle=0.3 -> -0.5*0.3 - 0.1*0.2
    np.testing.assert_allclose(Q[0, 0], [-0.5 * 0.3 - 0.1 * 0.2], rtol=1e-6)


def test_embedded_cookie_respec(firmware):
    ctrl = EmbeddedController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={},
        config={"controller_logging": False},
    )
    ctrl.configure(interface=open_iface(firmware))

    s = np.array([0.1, 0.0, 0.3, 0.2], np.float32)
    firmware.announce_new_spec = (2, ["angle", "angleD"], 2)
    Q = ctrl.step(s, time=0.0)           # cookie consumed on this step
    assert Q.shape[-1] == 1              # old spec still in force for this reply
    assert ctrl.spec_version == 2        # adopted for the NEXT step
    assert ctrl.input_names == ["angle", "angleD"]
    Q2 = ctrl.step(s, time=0.1)
    assert Q2.shape == (1, 1, 2)


def test_updated_attribute_precedence(firmware):
    ctrl = EmbeddedController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 1.0},
        config={"controller_logging": False},
    )
    ctrl.configure(interface=open_iface(firmware))
    s = np.zeros(4, np.float32)
    arr = ctrl._assemble_inputs(s, 0.0, {"angle": 9.0})
    assert arr[1] == 9.0                      # updated_attributes beats state
    arr2 = ctrl._assemble_inputs(s, 0.0, {})
    assert arr2[4] == 1.0                     # variable_parameters fallback
