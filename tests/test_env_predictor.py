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


def test_stateful_predictor_recurs_through_env_steps():
    """Review r3: an attached GRU predictor must advance its hidden with
    each applied control — same state+action twice must NOT produce the
    same next state (the plant recurs)."""
    pw = PredictorWrapper()
    pw.configure(batch_size=1, horizon=5, dt=0.02,
                 predictor_specification="GRU-5IN-8H1-4OUT",
                 environment_name="cartpole")
    assert pw.is_stateful

    env = CartpoleEnv(batch_size=1, dt=0.02, seed=0)
    env.state = np.array([[0.0, 0.0, 0.1, 0.0]], np.float32)
    env.predictor = pw
    u = np.array([[0.3]], np.float32)

    s1, *_ = env.step(u)
    h1 = np.asarray(pw.predictor.hidden[0]).copy()
    env.state = np.array([[0.0, 0.0, 0.1, 0.0]], np.float32)  # same state
    s2, *_ = env.step(u)
    h2 = np.asarray(pw.predictor.hidden[0]).copy()
    assert not np.allclose(h1, h2), "hidden not advanced by env.step"
    assert not np.allclose(s1, s2), "recurrence invisible in the dynamics"
