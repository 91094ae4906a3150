"""Minimum end-to-end slice (SURVEY §7 stage 2): config -> controller ->
optimizer -> scan rollout -> cost -> argmin -> u, logging contract, reset."""
import numpy as np
import pytest

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.environments.cartpole import CartpoleEnv


def make_controller(optimizer_name="random-action-tf", num_rollouts=64, horizon=15,
                    logging=True, optimizer_overrides=None):
    cfg = {
        "optimizer": optimizer_name,
        "predictor_specification": "ODE",
        "cost_function_specification": "default",
        "controller_logging": logging,
    }
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config=cfg,
    )
    opt_cfg = {
        "seed": 42,
        "mpc_timestep": 0.02,
        "mpc_horizon": horizon,
        "num_rollouts": num_rollouts,
    }
    opt_cfg.update(optimizer_overrides or {})
    ctrl.configure(optimizer_name=optimizer_name, optimizer_config=opt_cfg)
    return ctrl


def test_random_action_step_returns_control_in_bounds():
    ctrl = make_controller()
    s = np.array([0.0, 0.0, 0.1, 0.0], dtype=np.float32)
    u = ctrl.step(s)
    assert u.shape == (1,)
    assert -1.0 <= float(u[0]) <= 1.0


def test_logging_contract_shapes():
    K, H = 32, 10
    ctrl = make_controller(num_rollouts=K, horizon=H)
    s = np.zeros(4, dtype=np.float32)
    for _ in range(3):
        ctrl.step(s)
    out = ctrl.get_outputs()
    assert out["Q_logged"].shape == (3, K, H, 1)
    assert out["J_logged"].shape == (3, K)
    assert out["rollout_trajectories_logged"].shape == (3, K, H + 1, 4)
    assert out["s_logged"].shape == (3, 4)
    assert out["u_logged"].shape == (3, 1)


def test_reset_reproducibility():
    ctrl = make_controller(logging=False)
    s = np.array([0.0, 0.0, 0.2, 0.0], dtype=np.float32)
    u1 = ctrl.step(s)
    ctrl.controller_reset()
    u2 = ctrl.step(s)
    np.testing.assert_allclose(u1, u2, atol=1e-6)


def test_closed_loop_cartpole_stabilizes():
    """Near-upright start + random shooting should keep the pole from falling
    over a short window (sanity check of the whole loop, not of optimality)."""
    ctrl = make_controller(num_rollouts=256, horizon=25, logging=False)
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=0)
    s, _ = env.reset()
    angles = []
    for _ in range(40):
        u = ctrl.step(s[0])
        s, *_ = env.step(u)
        angles.append(abs(float(s[0, 2])))
    assert angles[-1] < 0.5, f"pole fell: final angle {angles[-1]}"


def test_update_attributes_changes_cost_target():
    ctrl = make_controller(num_rollouts=128, horizon=20, logging=False)
    s = np.zeros(4, dtype=np.float32)
    ctrl.step(s, updated_attributes={"target_position": 5.0})
    assert float(ctrl.variable_parameters["target_position"]) == 5.0


def test_realized_cost_logged():
    """The applied control's stage cost fills realized_cost_logged."""
    ctrl = make_controller(num_rollouts=32, horizon=10, logging=True)
    s = np.array([0.5, 0.0, 0.2, 0.0], dtype=np.float32)
    for _ in range(3):
        ctrl.step(s)
    out = ctrl.get_outputs()
    rc = out["realized_cost_logged"]
    assert rc is not None and rc.shape == (3,)
    assert np.all(np.isfinite(rc)) and np.all(rc > 0)  # displaced state costs


def test_reconfigure_invalidates_realized_cost_and_reset_zeroes_u_prev():
    """configure() must retrace the cached realized-cost program (it
    closes over the previous cost function) and controller_reset() must
    zero the stored previous control so the next episode's first
    realized cost doesn't use the last episode's final u (review r5)."""
    ctrl = make_controller(num_rollouts=32, horizon=10, logging=True)
    s = np.array([0.5, 0.0, 0.2, 0.0], dtype=np.float32)
    ctrl.step(s)
    assert hasattr(ctrl, "_realized_cost_jit")
    old_u = np.asarray(ctrl.u).copy()
    assert np.any(old_u != 0.0) or True  # u may legitimately be ~0
    ctrl.configure(optimizer_name="random-action-tf", optimizer_config={
        "seed": 42, "mpc_timestep": 0.02, "mpc_horizon": 10,
        "num_rollouts": 32,
    })
    assert not hasattr(ctrl, "_realized_cost_jit")
    ctrl.step(s)
    ctrl.controller_reset()
    assert np.all(np.asarray(ctrl.u) == 0.0)
