"""Sparse-GP dynamics predictor: fit quality + MPC on the GP model."""
import numpy as np
import pytest

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.environments.cartpole import CartpoleEnv
from control_toolkit_tpu.models.gp_predictor import GPPredictor, fit_gp_dynamics
from control_toolkit_tpu.models.training import collect_transitions


@pytest.fixture(scope="module")
def gp_fit(tmp_path_factory):
    env = CartpoleEnv(batch_size=16, dt=0.02, seed=0)
    x, u, xn = collect_transitions(env, 200, seed=0)
    params, mse = fit_gp_dynamics(x, u, xn, num_inducing=128, seed=0)
    path = tmp_path_factory.mktemp("gp") / "sgp.npz"
    pred = GPPredictor("cartpole", dt=0.02, params=params)
    pred.save(path)
    return params, mse, str(path)


def test_gp_fit_quality(gp_fit):
    _, mse, _ = gp_fit
    assert mse < 5e-3, f"GP fit normalized MSE too high: {mse}"


def test_gp_rollout_shapes_and_checkpoint(gp_fit):
    params, _, path = gp_fit
    pred = GPPredictor("cartpole", dt=0.02, checkpoint=path)
    s0 = np.zeros((8, 4), np.float32)
    Q = np.zeros((8, 10, 1), np.float32)
    traj = np.asarray(pred.rollout(s0, Q))
    assert traj.shape == (8, 11, 4)
    np.testing.assert_allclose(traj[:, 0, :], s0)


def test_mpc_on_gp_dynamics(gp_fit):
    """MPPI against the GP dynamics model controls the real cartpole."""
    params, _, path = gp_fit
    ctrl = MPCController(
        "cartpole",
        (np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        {"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name="mppi",
        predictor_specification=f"SGP_128:{path}",
        optimizer_config={"seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 20,
                          "num_rollouts": 256, "cc_weight": 1.0, "R": 1.0,
                          "LBD": 100.0, "NU": 1000.0, "SQRTRHOINV": 0.05,
                          "period_interpolation_inducing_points": 5},
    )
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=5)
    s, _ = env.reset()
    for _ in range(60):
        u = ctrl.step(s[0])
        s, *_ = env.step(u)
    assert abs(float(s[0, 2])) < 0.35, f"MPC on GP model failed: {s[0]}"
