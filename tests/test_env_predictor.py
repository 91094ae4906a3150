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


def test_env_params_mutation_retraces():
    """env.params / actuator_noise are read at trace time inside the
    jitted step: mutating them must retrace, not silently keep the frozen
    constants (review r5)."""
    import numpy as np

    from control_toolkit_tpu.environments.cartpole import CartpoleEnv

    env = CartpoleEnv(batch_size=1, dt=0.02, seed=0)
    env.reset(seed=1)
    s0 = np.asarray(env.state).copy()
    u = np.array([0.7], np.float32)
    s_a, *_ = env.step(u)

    env.state = np.asarray(s0)
    env.params["L"] = env.params["L"] * 3.0
    s_b, *_ = env.step(u)
    assert not np.allclose(s_a, s_b), "mutated plant constants were frozen"

    # Noise toggle also retraces (same key stream; nonzero noise changes u).
    env.state = np.asarray(s0)
    env2 = CartpoleEnv(batch_size=1, dt=0.02, seed=0)
    env2.reset(seed=1)
    env2.step(u)
    env2.state = np.asarray(s0)
    env2.actuator_noise = 0.5
    s_c, *_ = env2.step(u)
    env3 = CartpoleEnv(batch_size=1, dt=0.02, seed=0, actuator_noise=0.5)
    env3.reset(seed=1)
    env3.step(u)
    env3.state = np.asarray(s0)
    s_d, *_ = env3.step(u)
    np.testing.assert_allclose(s_c, s_d, atol=1e-6)


def test_env_reset_clears_stateful_predictor_hidden():
    """reset() must not carry the previous episode's terminal hidden into
    the next one (review r5)."""
    import numpy as np

    from control_toolkit_tpu.environments.cartpole import CartpoleEnv
    from control_toolkit_tpu.models.neural_predictor import NeuralPredictor

    env = CartpoleEnv(batch_size=1, dt=0.02, seed=0)
    pred = NeuralPredictor(environment_name="cartpole", dt=0.02,
                           net_name="GRU-5IN-8H1-4OUT", seed=2)
    env.predictor = pred
    env.reset(seed=3)
    u = np.array([0.5], np.float32)
    traj1 = [np.asarray(env.step(u)[0]).copy() for _ in range(4)]
    h_end = [np.asarray(h).copy() for h in pred.hidden]
    assert any(np.abs(h).max() > 0 for h in h_end)

    env.reset(seed=3)
    for h in pred.hidden:
        assert np.abs(np.asarray(h)).max() == 0.0, "hidden not reset"
    traj2 = [np.asarray(env.step(u)[0]).copy() for _ in range(4)]
    np.testing.assert_allclose(np.stack(traj1), np.stack(traj2), atol=1e-6)


def test_env_stateful_hidden_advances_with_applied_action():
    """With actuator noise, the hidden must track the NOISED+CLIPPED
    control that produced the state, not the raw command (review r5)."""
    import numpy as np

    from control_toolkit_tpu.environments.cartpole import CartpoleEnv
    from control_toolkit_tpu.models.neural_predictor import NeuralPredictor

    env = CartpoleEnv(batch_size=1, dt=0.02, seed=0, actuator_noise=0.4)
    pred = NeuralPredictor(environment_name="cartpole", dt=0.02,
                           net_name="GRU-5IN-8H1-4OUT", seed=2)
    env.predictor = pred
    env.reset(seed=3)
    u = np.array([0.9], np.float32)
    env.step(u)
    h_noised = [np.asarray(h).copy() for h in pred.hidden]

    # Replay the identical episode with noise OFF: the applied action now
    # differs, so the hidden must differ too (pre-fix both advanced with
    # the raw command and were identical).
    env2 = CartpoleEnv(batch_size=1, dt=0.02, seed=0, actuator_noise=0.0)
    pred2 = NeuralPredictor(environment_name="cartpole", dt=0.02,
                            net_name="GRU-5IN-8H1-4OUT", seed=2)
    env2.predictor = pred2
    env2.reset(seed=3)
    env2.step(u)
    h_clean = [np.asarray(h).copy() for h in pred2.hidden]
    assert any(not np.allclose(a, b) for a, b in zip(h_noised, h_clean))


def test_ode_spec_forwards_predictor_config():
    """The 'ODE' spec branch must forward predictor_config kwargs (e.g.
    params= overrides) like every other branch (review r5)."""
    import numpy as np

    from control_toolkit_tpu.models.predictors import PredictorWrapper

    w = PredictorWrapper()
    w.configure(dt=0.02, predictor_specification="ODE",
                environment_name="cartpole", params={"L": 0.9})
    assert float(w.predictor.default_params()["L"]) == 0.9
    s = np.zeros((1, 4), np.float32)
    u = np.ones((1, 1), np.float32)
    a = w.predictor.single_step(s, u, w.predictor.default_params())
    w2 = PredictorWrapper()
    w2.configure(dt=0.02, predictor_specification="ODE",
                 environment_name="cartpole")
    b = w2.predictor.single_step(s, u, w2.predictor.default_params())
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_cost_wrapper_copy_binds_same_cost():
    """copy() must yield a usable wrapper bound to the SAME cost name,
    not the config default (review r5)."""
    from control_toolkit_tpu.costs.wrapper import CostFunctionWrapper

    w = CostFunctionWrapper()
    w.configure(batch_size=8, horizon=10, environment_name="pointmass",
                cost_function_specification="obstacles", watch_config=False)
    c = w.copy()
    assert c.cost_function is not None
    assert type(c.cost_function) is type(w.cost_function)
    assert c.cost_function_name == w.cost_function_name


def test_neural_predictor_partial_dims():
    """Explicit num_control_inputs must survive; num_states alone must
    not crash on int(None) (review r5)."""
    from control_toolkit_tpu.models.neural_predictor import NeuralPredictor

    p = NeuralPredictor(environment_name="cartpole", dt=0.02,
                        net_name="mlp-8", num_control_inputs=2, seed=0)
    assert p.num_control_inputs == 2 and p.num_states == 4
    p2 = NeuralPredictor(environment_name="cartpole", dt=0.02,
                         net_name="mlp-8", num_states=4, seed=0)
    assert p2.num_control_inputs == 1
