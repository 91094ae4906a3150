"""Native-to-native end-to-end: C firmware binary <-> C++ UART core.

Compiles the reference SoC firmware main loop (soc_main.c + lqr.c) with gcc,
runs it as a process attached to a pty slave, and drives it through the
EmbeddedController / C++ UART core on the master side — the full embedded
path with zero Python in the protocol loop.
"""
import os
import subprocess
import time
from pathlib import Path

import numpy as np
import pytest

from control_toolkit_tpu.controllers.embedded import EmbeddedController
from control_toolkit_tpu.environments.cartpole import CartpoleEnv
from control_toolkit_tpu.native.uart_interface import UartInterface

NATIVE = Path("/root/repo/control_toolkit_tpu/native")


@pytest.fixture(scope="module")
def firmware_proc(tmp_path_factory):
    build = tmp_path_factory.mktemp("fw_build")
    binary = build / "soc_firmware"
    cmd = [
        "gcc", "-O2", "-o", str(binary),
        str(NATIVE / "firmware" / "soc_main.c"),
        str(NATIVE / "cwrapper" / "firmware" / "lqr.c"),
        "-I", str(NATIVE / "cwrapper"),
        "-lm",
    ]
    res = subprocess.run(cmd, capture_output=True, text=True)
    assert res.returncode == 0, f"firmware build failed: {res.stderr}"

    import tty
    master, slave = os.openpty()
    tty.setraw(master)
    tty.setraw(slave)
    slave_name = os.ttyname(slave)
    proc = subprocess.Popen([str(binary), slave_name])
    time.sleep(0.2)
    assert proc.poll() is None, "firmware exited prematurely"
    yield master, proc
    proc.terminate()
    proc.wait(timeout=5)
    os.close(master)
    os.close(slave)


def test_ping_and_spec_against_real_firmware(firmware_proc):
    master, _ = firmware_proc
    iface = UartInterface()
    iface.open_fd(master)
    assert iface.ping(timeout_s=2.0)
    version, names, n_out = iface.get_spec()
    assert version == 1
    assert names == ["position", "positionD", "angle", "angleD"]
    assert n_out == 1


def test_embedded_controller_stabilizes_with_c_firmware(firmware_proc):
    master, _ = firmware_proc
    iface = UartInterface()
    iface.open_fd(master)

    ctrl = EmbeddedController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={},
        config={"controller_logging": False},
    )
    ctrl.configure(interface=iface)

    env = CartpoleEnv(batch_size=1, dt=0.02, seed=21)
    s, _ = env.reset()
    for t in range(150):
        Q = ctrl.step(s[0], time=t * 0.02)
        s, *_ = env.step(Q[0, 0])
    assert abs(float(s[0, 2])) < 0.05, f"C firmware LQR failed to stabilize: {s[0]}"
