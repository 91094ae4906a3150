"""End-to-end imitation workflow: MPC expert -> demonstrations -> cloned
policy -> neural-imitator controller stabilizes the real environment.

This is the reference's production pipeline (MPC generates data, SI_Toolkit
trains a net, controller_neural_imitator serves it) entirely in-tree.
"""
import numpy as np
import pytest

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.controllers.neural_imitator import NeuralImitatorController
from control_toolkit_tpu.environments.cartpole import CartpoleEnv
from control_toolkit_tpu.models import networks as nets
from control_toolkit_tpu.models.training import (
    collect_mpc_demonstrations,
    fit_gru_dynamics,
    fit_policy,
)

pytestmark = pytest.mark.slow  # multi-minute training pipeline; slow tier


def test_clone_mpc_into_neural_imitator(tmp_path):
    expert = MPCController(
        "cartpole",
        (np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        {"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    expert.configure(optimizer_config={
        "seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 25, "num_rollouts": 256,
        "cc_weight": 1.0, "R": 1.0, "LBD": 100.0, "NU": 1000.0,
        "SQRTRHOINV": 0.05, "period_interpolation_inducing_points": 5,
    })
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=0)

    states, controls = collect_mpc_demonstrations(expert, env, n_episodes=6,
                                                  episode_len=60, seed=10)
    assert states.shape[0] == 360

    params, mse = fit_policy(states, controls, hiddens=(32, 32), epochs=3000,
                             learning_rate=2e-3, seed=0)
    assert mse < 0.02, f"cloning too lossy: {mse}"

    nets.save_net(
        tmp_path / "mlp-32-32.npz", params,
        meta={"inputs": ["position", "positionD", "angle", "angleD"],
              "outputs": ["Q"], "arch": {"kind": "mlp", "hiddens": [32, 32]}},
    )

    imitator = NeuralImitatorController(
        "cartpole",
        (np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        {},
        config={"net_name": "mlp-32-32", "path_to_models": str(tmp_path),
                "controller_logging": False},
    )
    imitator.configure()

    s, _ = env.reset(seed=99)
    for _ in range(100):
        u = imitator.step(s[0])
        s, *_ = env.step(u)
    assert abs(float(s[0, 2])) < 0.25, f"cloned policy failed: {s[0]}"


def test_gru_dynamics_beats_open_loop_drift():
    """The GRU dynamics model predicts an 8-step rollout with low error."""
    env = CartpoleEnv(batch_size=8, dt=0.02, seed=1)
    rng = np.random.default_rng(0)
    episodes_x, episodes_u = [], []
    for ep in range(6):
        s, _ = env.reset(seed=ep)
        xs = [s.copy()]
        us = []
        for _ in range(40):
            u = rng.uniform(-1, 1, size=(8, 1)).astype(np.float32)
            s, *_ = env.step(u)
            xs.append(s.copy())
            us.append(u)
        episodes_x.append(np.stack(xs, 1))   # [8, 41, 4]
        episodes_u.append(np.stack(us, 1))   # [8, 40, 1]
    x_seqs = np.concatenate(episodes_x)      # [48, 41, 4]
    u_seqs = np.concatenate(episodes_u)

    params, loss = fit_gru_dynamics(x_seqs, u_seqs, hiddens=(32,),
                                    epochs=800, rollout_len=8, seed=0)
    assert loss < 0.05, f"GRU dynamics rollout loss too high: {loss}"
