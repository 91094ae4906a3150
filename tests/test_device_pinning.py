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


def make_ctrl(device=None, optimizer="mppi", K=64, predictor_spec=None):
    cfg = {"optimizer": optimizer, "controller_logging": False}
    if device is not None:
        cfg["device"] = device
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config=cfg,
    )
    ctrl.configure(optimizer_name=optimizer,
                   predictor_specification=predictor_spec,
                   optimizer_config={
        "seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 15, "num_rollouts": K,
        "cc_weight": 1.0, "R": 1.0, "LBD": 100.0, "NU": 1000.0,
        "SQRTRHOINV": 0.03, "period_interpolation_inducing_points": 5,
    })
    return ctrl


def test_pinned_controller_steps_and_places_state():
    """Pin to cpu:1 — NOT the default device (the suite's virtual mesh has 8
    CPU devices), so a placement assertion can actually fail."""
    import jax

    cpu1 = jax.devices("cpu")[1]
    ctrl = make_ctrl(device="cpu:1")
    assert ctrl.device == cpu1
    assert ctrl.optimizer._device == cpu1
    u = ctrl.step(np.array([0.0, 0.0, 0.2, 0.0], np.float32))
    assert np.all(np.isfinite(np.asarray(u)))
    # state, attrs and cached params all live on the pinned device
    leaf = jax.tree_util.tree_leaves(ctrl.optimizer.opt_state)[0]
    assert leaf.devices() == {cpu1}
    assert ctrl.variable_parameters["target_position"].devices() == {cpu1}
    for p in jax.tree_util.tree_leaves(ctrl._dyn_params):
        assert p.devices() == {cpu1}
    # retargeting flows through the same placement — including an attr value
    # that arrives as a jax array already living on ANOTHER device (asarray
    # alone would leave it there).
    stray = jax.device_put(jnp_f32(0.4), jax.devices("cpu")[0])
    u2 = ctrl.step(np.array([0.0, 0.0, 0.2, 0.0], np.float32),
                   updated_attributes={"target_position": stray})
    assert np.all(np.isfinite(np.asarray(u2)))
    assert ctrl.variable_parameters["target_position"].devices() == {cpu1}


def jnp_f32(v):
    import jax.numpy as jnp

    return jnp.asarray(v, jnp.float32)


def test_pinned_residual_predictor_params_move():
    """Pre-existing jax-array predictor weights (ResidualPredictor MLP,
    created on the default device) must be device_put onto the pin — a
    plain asarray is a no-op on them."""
    import jax

    cpu1 = jax.devices("cpu")[1]
    ctrl = make_ctrl(device="cpu:1", predictor_spec="ODE+res")
    u = ctrl.step(np.array([0.0, 0.0, 0.2, 0.0], np.float32))
    assert np.all(np.isfinite(np.asarray(u)))
    for p in jax.tree_util.tree_leaves(ctrl._dyn_params):
        assert p.devices() == {cpu1}


def test_unpinned_controller_unchanged():
    ctrl = make_ctrl()
    assert ctrl.device is None and ctrl.optimizer._device is None
    u = ctrl.step(np.array([0.0, 0.0, 0.2, 0.0], np.float32))
    assert np.all(np.isfinite(np.asarray(u)))


def test_non_tpu_pin_disables_pallas(monkeypatch):
    """A cpu-pinned optimizer must take the scan path even when the process
    default backend is TPU (Mosaic kernels are TPU-only).  K=2048 satisfies
    the tile-divisibility clause, so with the backend faked to 'tpu' the
    gate is TRUE un-pinned — the cpu pin must be what flips it."""
    import jax

    ctrl = make_ctrl(device="cpu", K=2048)
    opt = ctrl.optimizer
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # un-pinned, the gate passes (proves the test is not vacuous)
    opt._device = None
    assert opt._can_use_pallas()
    opt._device = types.SimpleNamespace(platform="tpu")
    assert opt._can_use_pallas()
    # the cpu pin is the only thing that flips it
    opt._device = ctrl.device
    assert not opt._can_use_pallas()


def test_malformed_device_specs_fall_back():
    assert resolve_device("tpu:abc") is None
    assert resolve_device("/") is None
    assert resolve_device(":::") is None


def test_pinned_controller_compiles_once():
    """The initial state must be COMMITTED to the pin: uncommitted leaves
    would flip the jit cache key between step 0 (uncommitted inputs) and
    step 1 (the jitted step's committed outputs) and force a full recompile
    — the regression behind the phantom ~200 ms/step bench artifact."""
    ctrl = make_ctrl(device="cpu:1")
    s = np.array([0.0, 0.0, 0.2, 0.0], np.float32)
    for _ in range(3):
        ctrl.step(s)
    assert ctrl.optimizer._step_jit._cache_size() == 1, (
        "device-pinned controller recompiled after the first step"
    )


def test_pinned_checkpoint_resume_compiles_once(tmp_path):
    """Checkpoint restore must apply the same placement plan (place_state):
    resuming a pinned controller from uncommitted loaded leaves would pay
    the same one-time recompile."""
    from control_toolkit_tpu.utils import checkpoint

    ctrl = make_ctrl(device="cpu:1")
    s = np.array([0.0, 0.0, 0.2, 0.0], np.float32)
    ctrl.step(s)
    path = tmp_path / "ckpt.npz"
    checkpoint.save_controller(path, ctrl)

    fresh = make_ctrl(device="cpu:1")
    checkpoint.load_controller(path, fresh)
    import jax

    cpu1 = jax.devices("cpu")[1]
    for leaf in jax.tree_util.tree_leaves(fresh.optimizer.opt_state):
        assert leaf.devices() == {cpu1}
    for _ in range(3):
        fresh.step(s)
    assert fresh.optimizer._step_jit._cache_size() == 1, (
        "checkpoint resume on a pinned controller recompiled after step 1"
    )
