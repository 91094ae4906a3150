"""Controller device pinning ('device' config key — reference
Controllers/__init__.py:72-78 lib.set_device parity).

Measured rationale (utils/device.py): latency-bound tiny-op programs
(single-start iLQR) run ~2x faster pinned to the host CPU; batch work
belongs on the accelerator.
"""
import types

import numpy as np
import pytest

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.utils.device import resolve_device


def test_resolve_device_grammar():
    import jax

    cpu0 = jax.devices("cpu")[0]
    assert resolve_device(None) is None
    assert resolve_device("") is None
    assert resolve_device("default") is None
    assert resolve_device("cpu") == cpu0
    assert resolve_device("CPU:0") == cpu0
    assert resolve_device("/physical_device:CPU:0") == cpu0


def test_resolve_device_unavailable_falls_back():
    # The test suite pins the CPU platform, so 'gpu' cannot resolve.
    assert resolve_device("gpu") is None


def make_ctrl(device=None, optimizer="mppi"):
    cfg = {"optimizer": optimizer, "controller_logging": False}
    if device is not None:
        cfg["device"] = device
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config=cfg,
    )
    ctrl.configure(optimizer_name=optimizer, optimizer_config={
        "seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 15, "num_rollouts": 64,
        "cc_weight": 1.0, "R": 1.0, "LBD": 100.0, "NU": 1000.0,
        "SQRTRHOINV": 0.03, "period_interpolation_inducing_points": 5,
    })
    return ctrl


def test_pinned_controller_steps_and_places_state():
    import jax

    cpu0 = jax.devices("cpu")[0]
    ctrl = make_ctrl(device="cpu")
    assert ctrl.device == cpu0
    assert ctrl.optimizer._device == cpu0
    u = ctrl.step(np.array([0.0, 0.0, 0.2, 0.0], np.float32))
    assert np.all(np.isfinite(np.asarray(u)))
    # state, attrs and cached params all live on the pinned device
    leaf = jax.tree_util.tree_leaves(ctrl.optimizer.opt_state)[0]
    assert leaf.devices() == {cpu0}
    assert ctrl.variable_parameters["target_position"].devices() == {cpu0}
    # retargeting flows through the same placement
    u2 = ctrl.step(np.array([0.0, 0.0, 0.2, 0.0], np.float32),
                   updated_attributes={"target_position": 0.4})
    assert np.all(np.isfinite(np.asarray(u2)))
    assert ctrl.variable_parameters["target_position"].devices() == {cpu0}


def test_unpinned_controller_unchanged():
    ctrl = make_ctrl()
    assert ctrl.device is None and ctrl.optimizer._device is None
    u = ctrl.step(np.array([0.0, 0.0, 0.2, 0.0], np.float32))
    assert np.all(np.isfinite(np.asarray(u)))


def test_non_tpu_pin_disables_pallas(monkeypatch):
    """A cpu-pinned optimizer must take the scan path even when the process
    default backend is TPU (Mosaic kernels are TPU-only)."""
    import jax

    ctrl = make_ctrl(device="cpu")
    opt = ctrl.optimizer
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert not opt._can_use_pallas()
    # same optimizer un-pinned would pass the device clause
    opt._device = None
    gate_with_default_device = opt._can_use_pallas()
    opt._device = types.SimpleNamespace(platform="tpu")
    assert opt._can_use_pallas() == gate_with_default_device
