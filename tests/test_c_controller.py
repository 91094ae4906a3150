"""C controller: compile the bundled LQR firmware, drive it closed loop."""
import numpy as np
import pytest

from control_toolkit_tpu.controllers.c_controller import CController
from control_toolkit_tpu.environments.cartpole import CartpoleEnv


def make():
    ctrl = CController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={},
        config={"controller_file": "lqr.c", "controller_logging": False},
    )
    ctrl.configure()
    return ctrl


def test_compile_spec_and_evaluate():
    ctrl = make()
    assert ctrl.spec_version == 1
    assert ctrl.input_names == ["position", "positionD", "angle", "angleD"]
    assert ctrl.n_outputs == 1
    Q = ctrl.step(np.array([0.0, 0.0, 0.1, 0.0], np.float32))
    assert Q.shape == (1, 1, 1)
    assert -1.0 <= float(Q[0, 0, 0]) <= 1.0


def test_lqr_closed_loop_stabilizes():
    ctrl = make()
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=11)
    s, _ = env.reset()
    for _ in range(150):
        Q = ctrl.step(s[0])
        s, *_ = env.step(Q[0, 0])
    assert abs(float(s[0, 2])) < 0.05, f"LQR failed to stabilize: {s[0]}"
    assert abs(float(s[0, 0])) < 1.0


def test_unknown_source_raises():
    ctrl = CController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={},
        config={"controller_file": "nope.c", "controller_logging": False},
    )
    with pytest.raises(FileNotFoundError):
        ctrl.configure()
