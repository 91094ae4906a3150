"""EnvironmentBatched.predictor attachment (reference parity:
/root/reference/others/environment.py:20-33 — roll an environment with a
learned predictor in place of its true dynamics)."""
import numpy as np
import pytest

from control_toolkit_tpu.environments.cartpole import CartpoleEnv
from control_toolkit_tpu.models.predictors import PredictorWrapper


def _predictor(**param_overrides):
    pw = PredictorWrapper()
    pw.configure(
        batch_size=1, horizon=5, dt=0.02,
        predictor_specification="ODE", environment_name="cartpole",
    )
    return pw


def test_getter_raises_until_set():
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=0)
    with pytest.raises(ValueError, match="Predictor not set"):
        env.predictor
    env.predictor = _predictor()
    assert env.predictor is not None


def test_env_rolls_with_attached_predictor():
    """With matching dynamics params the predictor-driven env tracks the
    true-dynamics env; with a perturbed pole length it diverges — i.e. the
    attached model really drives the plant."""
    s0 = np.array([[0.0, 0.0, 0.1, 0.0]], np.float32)
    u = np.array([[0.3]], np.float32)

    env_true = CartpoleEnv(batch_size=1, dt=0.02, seed=0)
    env_true.state = s0
    env_pred = CartpoleEnv(batch_size=1, dt=0.02, seed=0)
    env_pred.state = s0
    env_pred.predictor = _predictor()

    for _ in range(5):
        s_true, *_ = env_true.step(u)
        s_pred, *_ = env_pred.step(u)
    np.testing.assert_allclose(s_pred, s_true, atol=1e-4, rtol=0)

    # Perturb the model: parameter updates flow through default_params()
    # as jit arguments — no recompile, immediate effect.
    env_div = CartpoleEnv(batch_size=1, dt=0.02, seed=0)
    env_div.state = s0
    pred = _predictor()
    params = pred.default_params()
    key = "pole_length" if "pole_length" in params else sorted(params)[0]
    pred.predictor._defaults[key] = np.float32(params[key] * 3.0)
    env_div.predictor = pred
    for _ in range(5):
        s_div, *_ = env_div.step(u)
    assert not np.allclose(s_div, s_true, atol=1e-4)
