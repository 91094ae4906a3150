"""Neural predictor: shapes, RNN state, system-id -> MPC closed loop."""
import jax
import numpy as np
import pytest

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.environments.cartpole import CartpoleEnv
from control_toolkit_tpu.models.neural_predictor import NeuralPredictor
from control_toolkit_tpu.models import networks as nets
from control_toolkit_tpu.models.training import collect_transitions, fit_mlp_dynamics


def test_mlp_predictor_rollout_shapes():
    pred = NeuralPredictor("cartpole", dt=0.02, net_name="mlp-16-16", seed=1)
    s0 = np.zeros((8, 4), np.float32)
    Q = np.zeros((8, 10, 1), np.float32)
    traj = np.asarray(pred.rollout(s0, Q))
    assert traj.shape == (8, 11, 4)
    np.testing.assert_allclose(traj[:, 0, :], s0)


def test_gru_predictor_update_changes_rollout():
    pred = NeuralPredictor("cartpole", dt=0.02, net_name="GRU-5IN-8H1-4OUT", seed=1)
    s0 = np.zeros((4, 4), np.float32)
    Q = 0.5 * np.ones((4, 6, 1), np.float32)
    t1 = np.asarray(pred.rollout(s0, Q))
    pred.update(np.zeros((1, 4), np.float32), np.ones((1, 1, 1), np.float32))
    t2 = np.asarray(pred.rollout(s0, Q))
    assert not np.allclose(t1, t2), "hidden-state advance must affect rollouts"
    pred.reset_state()
    t3 = np.asarray(pred.rollout(s0, Q))
    np.testing.assert_allclose(t1, t3, atol=1e-6)


def test_bf16_rollout_tracks_f32():
    """bf16 compute (MXU-native) with f32 state residuals must track the
    f32 rollout; trajectories stay f32 for downstream costs."""
    f32 = NeuralPredictor("cartpole", dt=0.02, net_name="mlp-32-32", seed=11)
    bf16 = NeuralPredictor("cartpole", dt=0.02, net_name="mlp-32-32", seed=11,
                           compute_dtype="bf16", params=f32.net_params)
    s0 = 0.2 * np.ones((8, 4), np.float32)
    Q = np.linspace(-1, 1, 8 * 20).reshape(8, 20, 1).astype(np.float32)
    # One-step prediction: bf16 matmul error only (no compounding).
    a1 = np.asarray(f32.rollout(s0, Q[:, :1]))
    b1 = np.asarray(bf16.rollout(s0, Q[:, :1]))
    np.testing.assert_allclose(a1, b1, atol=7e-3)
    # Full horizon: error compounds through the (random, chaotic) net but
    # stays bounded; trajectories remain f32 for downstream costs.
    a = np.asarray(f32.rollout(s0, Q))
    b_jax = bf16.rollout(s0, Q)
    assert b_jax.dtype == np.float32
    b = np.asarray(b_jax)
    np.testing.assert_allclose(a, b, atol=0.2)
    assert not np.array_equal(a, b)

    # GRU variant
    g32 = NeuralPredictor("cartpole", dt=0.02, net_name="GRU-5IN-8H1-4OUT", seed=2)
    gbf = NeuralPredictor("cartpole", dt=0.02, net_name="GRU-5IN-8H1-4OUT", seed=2,
                          compute_dtype="bf16", params=g32.net_params)
    ta = np.asarray(g32.rollout(s0, Q[:, :6]))
    tb = np.asarray(gbf.rollout(s0, Q[:, :6]))
    assert tb.dtype == np.float32
    np.testing.assert_allclose(ta, tb, atol=0.1)


def test_bf16_spec_grammar():
    from control_toolkit_tpu.models.predictors import PredictorWrapper
    import jax.numpy as jnp

    w = PredictorWrapper()
    w.configure(dt=0.02, predictor_specification="neural:mlp-16-16:bf16",
                environment_name="cartpole")
    assert w.predictor.compute_dtype == jnp.bfloat16


def test_gru_checkpoint_round_trip(tmp_path):
    """save_net/load_net must round-trip NESTED GRU params (cell dicts) —
    regression for the pickled-object-array bug where np.load refused the
    checkpoint entirely (ADVICE round 1)."""
    pred = NeuralPredictor("cartpole", dt=0.02, net_name="GRU-5IN-8H1-8H2-4OUT",
                           seed=7)
    ckpt = tmp_path / "GRU-5IN-8H1-8H2-4OUT.npz"
    nets.save_net(ckpt, pred.net_params, meta={"predict_delta": True})

    loaded = NeuralPredictor("cartpole", dt=0.02, net_name="GRU-5IN-8H1-8H2-4OUT",
                             path_to_models=str(tmp_path), seed=99)
    # Identical param trees leaf-for-leaf...
    orig_leaves = jax.tree_util.tree_leaves_with_path(pred.net_params)
    new_leaves = jax.tree_util.tree_leaves_with_path(loaded.net_params)
    assert len(orig_leaves) == len(new_leaves)
    for (p0, v0), (p1, v1) in zip(orig_leaves, new_leaves):
        assert p0 == p1
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    # ...and identical rollouts through the loaded net.
    s0 = 0.1 * np.ones((4, 4), np.float32)
    Q = 0.5 * np.ones((4, 6, 1), np.float32)
    np.testing.assert_allclose(
        np.asarray(pred.rollout(s0, Q)), np.asarray(loaded.rollout(s0, Q)),
        atol=1e-7,
    )


@pytest.mark.slow
def test_system_id_then_mpc(tmp_path):
    """Fit an MLP dynamics model on random cartpole transitions, then run
    MPPI against the LEARNED model in the real env closed loop."""
    env = CartpoleEnv(batch_size=16, dt=0.02, seed=0)
    x, u, xn = collect_transitions(env, 400, seed=0)
    params, mse = fit_mlp_dynamics(x, u, xn, hiddens=(64, 64), epochs=3000,
                                   batch_size=4096, learning_rate=3e-3, seed=0)
    assert mse < 3e-4, f"dynamics fit too poor (normalized MSE): {mse}"
    nets.save_net(tmp_path / "mlp-64-64.npz", params, meta={"predict_delta": True})

    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name="mppi",
        predictor_specification=f"neural:mlp-64-64:{tmp_path}",
        optimizer_config={"seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 20,
                          "num_rollouts": 512, "cc_weight": 1.0, "R": 1.0,
                          "LBD": 100.0, "NU": 1000.0, "SQRTRHOINV": 0.05,
                          "period_interpolation_inducing_points": 5},
    )
    real_env = CartpoleEnv(batch_size=1, dt=0.02, seed=5)
    s, _ = real_env.reset()
    for _ in range(60):
        uc = ctrl.step(s[0])
        s, *_ = real_env.step(uc)
    assert abs(float(s[0, 2])) < 0.35, f"MPC on learned model failed: {s[0]}"


def test_lstm_predictor_and_checkpoint_roundtrip(tmp_path):
    """LSTM names build true LSTM cells (forget-gate-biased, (h,c) state)
    — previously parsed silently as GRUs — and round-trip through npz."""
    pred = NeuralPredictor("cartpole", dt=0.02, net_name="LSTM-5IN-8H1-4OUT", seed=3)
    assert "wi" in pred.net_params["cell0"]
    assert pred.net_params["cell0"]["wi"].shape == (5, 32)  # 4 gates x 8
    assert pred.hidden[0].shape == (1, 16)                  # h|c concatenated

    s0 = np.zeros((4, 4), np.float32)
    Q = 0.5 * np.ones((4, 6, 1), np.float32)
    t1 = np.asarray(pred.rollout(s0, Q))
    assert t1.shape == (4, 7, 4)

    ckpt = tmp_path / "LSTM-5IN-8H1-4OUT.npz"
    nets.save_net(ckpt, pred.net_params, meta={"predict_delta": True})
    loaded = NeuralPredictor("cartpole", dt=0.02, net_name="LSTM-5IN-8H1-4OUT",
                             path_to_models=str(tmp_path), seed=99)
    np.testing.assert_allclose(t1, np.asarray(loaded.rollout(s0, Q)), atol=1e-7)

    # hidden-state advance + reset semantics match the GRU contract
    pred.update(np.zeros((1, 4), np.float32), np.ones((1, 1, 1), np.float32))
    t2 = np.asarray(pred.rollout(s0, Q))
    assert not np.allclose(t1, t2)
    pred.reset_state()
    np.testing.assert_allclose(t1, np.asarray(pred.rollout(s0, Q)), atol=1e-6)
