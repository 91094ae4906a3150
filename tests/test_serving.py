"""ZMQ server + remote controller round trip (in-process, tcp://127.0.0.1)."""
import json
import sys
import threading
import time

import numpy as np
import pytest

zmq = pytest.importorskip("zmq")

from control_toolkit_tpu.controllers.remote import RemoteController
from control_toolkit_tpu.serving.server import build_controller, serve

def _free_port() -> int:
    from control_toolkit_tpu.utils.net import free_port

    return free_port()


PORT = _free_port()
ENDPOINT_BIND = f"tcp://127.0.0.1:{PORT}"


@pytest.fixture(scope="module")
def server_thread():
    ctrl = build_controller(
        "mpc", "random-action-tf", environment_name="cartpole",
        initial_attributes={"target_position": 0.0},
        optimizer_config={"seed": 0, "mpc_timestep": 0.02,
                          "mpc_horizon": 8, "num_rollouts": 16},
    )
    t = threading.Thread(
        target=serve,
        kwargs={"ctrl": ctrl, "endpoint": ENDPOINT_BIND,
                "warmup_state": np.zeros(4, np.float32), "max_requests": 50},
        daemon=True,
    )
    t.start()
    time.sleep(1.0)
    yield t


def test_raw_protocol_round_trip(server_thread):
    ctx = zmq.Context.instance()
    sock = ctx.socket(zmq.DEALER)
    sock.connect(f"tcp://127.0.0.1:{PORT}")
    sock.setsockopt(zmq.RCVTIMEO, 10000)

    sock.send_json({"rid": 1, "state": [0.0, 0.0, 0.1, 0.0], "time": 0.0,
                    "updated_attributes": {"target_position": 0.5}})
    resp = sock.recv_json()
    assert resp["rid"] == 1
    q = np.asarray(resp["Q"], np.float32)
    assert q.shape == (1,)
    assert -1.0 <= float(q[0]) <= 1.0
    sock.close(0)


def test_malformed_request_gets_no_reply(server_thread):
    """Server contract: exceptions produce silence, not an error reply."""
    ctx = zmq.Context.instance()
    sock = ctx.socket(zmq.DEALER)
    sock.connect(f"tcp://127.0.0.1:{PORT}")
    sock.setsockopt(zmq.RCVTIMEO, 300)

    sock.send(b"this is not json")
    with pytest.raises(zmq.error.Again):
        sock.recv_json()
    # server still alive for valid requests
    sock.setsockopt(zmq.RCVTIMEO, 10000)
    sock.send_json({"rid": 2, "state": [0, 0, 0, 0], "time": None,
                    "updated_attributes": {}})
    assert sock.recv_json()["rid"] == 2
    sock.close(0)


def test_remote_controller_round_trip(server_thread):
    ctrl = RemoteController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={},
        config={"host": "127.0.0.1", "port": PORT, "timeout_ms": 10000,
                "fallback_controller": None, "controller_logging": False},
    )
    ctrl.configure()
    u = ctrl.step(np.array([0.0, 0.0, 0.1, 0.0], np.float32))
    assert u.shape == (1,)
    # numpy scalar time must serialize (raw np.float32 is not JSON
    # serializable and used to crash the very controller meant to degrade
    # gracefully — review r5).
    u = ctrl.step(np.array([0.0, 0.0, 0.1, 0.0], np.float32),
                  time=np.float32(0.75))
    assert u.shape == (1,)


def test_remote_rejects_nonpositive_timeout():
    import pytest

    ctrl = RemoteController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={},
        config={"host": "127.0.0.1", "port": 59998, "timeout_ms": 0,
                "fallback_controller": None, "controller_logging": False},
    )
    with pytest.raises(ValueError, match="timeout_ms"):
        ctrl.configure()  # 0 would mean ZMQ's block-forever default


def test_remote_timeout_falls_back_to_zero():
    """No server on this port: timeout path returns zero control."""
    ctrl = RemoteController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={},
        config={"host": "127.0.0.1", "port": 59999, "timeout_ms": 30,
                "fallback_controller": None, "controller_logging": False},
    )
    ctrl.configure()
    u = ctrl.step(np.zeros(4, np.float32))
    np.testing.assert_allclose(u, np.zeros(1, np.float32))


def test_remote_timeout_uses_fallback_controller():
    """Dead server + configured fallback: control comes from the local
    fallback controller chain (reference :82-89)."""
    ctrl = RemoteController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={},
        config={"host": "127.0.0.1", "port": 59998, "timeout_ms": 30,
                "fallback_controller": "c", "controller_logging": False},
    )
    # fallback 'c' controller compiles the bundled LQR firmware
    import control_toolkit_tpu.utils.config as cfgmod
    ctrl.configure()
    u = ctrl.step(np.array([0.0, 0.0, 0.2, 0.0], np.float32))
    # LQR responds to the tilted pole — nonzero control proves the fallback ran
    assert abs(float(np.asarray(u).reshape(-1)[0])) > 1e-3


def test_concurrent_clients_get_their_own_replies(server_thread):
    """ROUTER identity routing: interleaved requests from two DEALER clients
    each receive replies with their own rids."""
    ctx = zmq.Context.instance()
    socks = []
    for _ in range(2):
        s = ctx.socket(zmq.DEALER)
        s.connect(f"tcp://127.0.0.1:{PORT}")
        s.setsockopt(zmq.RCVTIMEO, 10000)
        socks.append(s)

    # interleave sends with disjoint rid ranges
    for i in range(3):
        socks[0].send_json({"rid": 100 + i, "state": [0, 0, 0.1, 0], "time": None,
                            "updated_attributes": {}})
        socks[1].send_json({"rid": 200 + i, "state": [0, 0, -0.1, 0], "time": None,
                            "updated_attributes": {}})
    rids0 = sorted(socks[0].recv_json()["rid"] for _ in range(3))
    rids1 = sorted(socks[1].recv_json()["rid"] for _ in range(3))
    assert rids0 == [100, 101, 102]
    assert rids1 == [200, 201, 202]
    for s in socks:
        s.close(0)


# ---------------------------------------------------------------- GUI chooser
def test_terminal_chooser_accepts_index_name_and_default(monkeypatch):
    """The terminal-fallback picker (serving/gui.py): numeric index, literal
    name, and empty input (default) must all resolve."""
    from control_toolkit_tpu.serving import gui

    answers = iter(["1", "", "neural-imitator", "0"])
    monkeypatch.setattr("builtins.input", lambda prompt="": next(answers))

    controllers = ["mpc", "neural-imitator"]
    optimizers = ["cem-tf", "mppi", "rpgd-tf"]
    # index + default
    c, o = gui._choose_terminal(controllers, optimizers, "mpc", "rpgd-tf")
    assert c == "neural-imitator" and o == "rpgd-tf"
    # literal name + index
    c, o = gui._choose_terminal(controllers, optimizers, None, None)
    assert c == "neural-imitator" and o == "cem-tf"


def test_chooser_falls_back_to_defaults_when_headless(monkeypatch):
    """No DISPLAY and no tty -> defaults, never blocks (reference Qt dialog
    has no headless path; ours must)."""
    from control_toolkit_tpu.serving import gui

    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.setattr("sys.platform", "linux")
    monkeypatch.setattr("sys.stdin", type("S", (), {"isatty": staticmethod(lambda: False)})())
    c, o = gui.choose_controller_and_optimizer()
    assert c == "mpc" and o == "mppi"


def test_terminal_chooser_out_of_range_falls_back(monkeypatch):
    from control_toolkit_tpu.serving import gui

    answers = iter(["99", "1"])
    monkeypatch.setattr("builtins.input", lambda prompt="": next(answers))
    c, o = gui._choose_terminal(["mpc", "neural-imitator"],
                                ["cem-tf", "mppi"], "mpc", None)
    assert c == "mpc"        # out-of-range index -> default
    assert o == "mppi"


def _install_fake_pyqt6(monkeypatch, exec_result=1, on_exec=None):
    """Install a minimal fake PyQt6.QtWidgets into sys.modules so the Qt
    branch of serving/gui.py runs headlessly.  ``on_exec(groups)`` may
    mutate the radio-button selection before the dialog 'returns'."""
    import types

    state = {"groups": []}

    class _Signal:
        def connect(self, fn):
            self.fn = fn

    class QRadioButton:
        def __init__(self, text):
            self._text, self._checked = text, False

        def setChecked(self, v):
            self._checked = bool(v)

        def text(self):
            return self._text

    class QButtonGroup:
        def __init__(self, parent=None):
            self._buttons = []
            state["groups"].append(self)

        def addButton(self, b):
            self._buttons.append(b)

        def buttons(self):
            return self._buttons

        def checkedButton(self):
            for b in self._buttons:
                if b._checked:
                    return b
            return None

    class QDialog:
        class DialogCode:
            Accepted, Rejected = 1, 0

        def setWindowTitle(self, t):
            pass

        def accept(self):
            pass

        def reject(self):
            pass

        def exec(self):
            if on_exec is not None:
                on_exec(state["groups"])
            return exec_result

    class QDialogButtonBox:
        class StandardButton:
            Ok, Cancel = 1, 2

        def __init__(self, flags):
            self.accepted, self.rejected = _Signal(), _Signal()

    class _Layout:
        def __init__(self, parent=None):
            pass

        def addWidget(self, w):
            pass

    class QGroupBox:
        def __init__(self, title):
            pass

    class QApplication:
        _inst = None

        def __init__(self, argv):
            QApplication._inst = self

        @classmethod
        def instance(cls):
            return cls._inst

    widgets = types.ModuleType("PyQt6.QtWidgets")
    for cls in (QApplication, QButtonGroup, QDialog, QDialogButtonBox,
                QGroupBox, QRadioButton):
        setattr(widgets, cls.__name__, cls)
    widgets.QHBoxLayout = _Layout
    widgets.QVBoxLayout = _Layout
    pkg = types.ModuleType("PyQt6")
    pkg.QtWidgets = widgets
    monkeypatch.setitem(sys.modules, "PyQt6", pkg)
    monkeypatch.setitem(sys.modules, "PyQt6.QtWidgets", widgets)
    return state


def test_qt_chooser_accepts_defaults(monkeypatch):
    """Qt branch (reference controller_server/gui.py:19-89): with a display
    and PyQt6 present, accepting the dialog returns the pre-checked
    defaults."""
    from control_toolkit_tpu.serving import gui

    _install_fake_pyqt6(monkeypatch)
    monkeypatch.setenv("DISPLAY", ":0")
    c, o = gui.choose_controller_and_optimizer()
    assert c == "mpc" and o == "mppi"


def test_qt_chooser_returns_user_selection(monkeypatch):
    """Flipping radio buttons before OK returns the user's picks (group 0 =
    controllers, group 1 = optimizers)."""
    from control_toolkit_tpu.serving import gui

    def pick(groups):
        for g, want in zip(groups, ("neural-imitator", "cem-tf")):
            for b in g.buttons():
                b.setChecked(b.text() == want)

    _install_fake_pyqt6(monkeypatch, on_exec=pick)
    monkeypatch.setenv("DISPLAY", ":0")
    c, o = gui.choose_controller_and_optimizer()
    assert c == "neural-imitator" and o == "cem-tf"


def test_qt_chooser_cancel_raises_system_exit(monkeypatch):
    """Cancel aborts server startup (reference dialog rejection kills the
    picker) — SystemExit must NOT be swallowed by the fallback chain."""
    import pytest

    from control_toolkit_tpu.serving import gui

    _install_fake_pyqt6(monkeypatch, exec_result=0)
    monkeypatch.setenv("DISPLAY", ":0")
    with pytest.raises(SystemExit):
        gui.choose_controller_and_optimizer()


def test_qt_chooser_error_falls_back(monkeypatch):
    """A Qt platform error (stale DISPLAY) degrades to terminal/defaults
    instead of killing startup."""
    import types

    from control_toolkit_tpu.serving import gui

    widgets = types.ModuleType("PyQt6.QtWidgets")

    def boom(*a, **k):
        raise RuntimeError("could not connect to display")

    for name in ("QApplication", "QButtonGroup", "QDialog", "QDialogButtonBox",
                 "QGroupBox", "QHBoxLayout", "QRadioButton", "QVBoxLayout"):
        setattr(widgets, name, boom)
    pkg = types.ModuleType("PyQt6")
    pkg.QtWidgets = widgets
    monkeypatch.setitem(sys.modules, "PyQt6", pkg)
    monkeypatch.setenv("DISPLAY", ":0")
    monkeypatch.setattr(
        "sys.stdin", type("S", (), {"isatty": staticmethod(lambda: False)})()
    )
    c, o = gui.choose_controller_and_optimizer()
    assert c == "mpc" and o == "mppi"


def test_reference_readme_client_snippet(server_thread):
    """The EXACT client from the reference README (README.md:138-146): a
    REQ socket with a STRING rid and no updated_attributes — wire
    compatibility means that snippet works against this server verbatim
    (string rid echoed untouched, REQ's strict framing accepted)."""
    ctx = zmq.Context.instance()
    socket = ctx.socket(zmq.REQ)
    socket.setsockopt(zmq.RCVTIMEO, 10000)
    socket.connect(f"tcp://127.0.0.1:{PORT}")
    socket.send_json({"rid": "1", "state": [0.1, 0.2, 0.0, 0.0], "time": 0.0})
    resp = socket.recv_json()
    assert resp["rid"] == "1"
    control = np.asarray(resp["Q"], np.float32)
    assert np.all(np.isfinite(control))
    socket.close(0)
