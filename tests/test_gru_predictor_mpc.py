"""GRU dynamics predictor inside the jitted MPC loop: the hidden state must
flow through params (not be baked in at trace time)."""
import numpy as np

from control_toolkit_tpu.controllers.mpc import MPCController


def test_gru_hidden_state_affects_jitted_mpc_step():
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "random-action-tf", "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name="random-action-tf",
        predictor_specification="GRU-5IN-8H1-4OUT",
        optimizer_config={"seed": 4, "mpc_timestep": 0.02,
                          "mpc_horizon": 8, "num_rollouts": 16},
    )
    pred = ctrl.predictor.predictor
    assert pred.recurrent and ctrl.predictor.is_stateful

    s = np.array([0.0, 0.0, 0.1, 0.0], np.float32)
    u1 = ctrl.step(s)
    h_after_1 = np.asarray(pred.hidden[0]).copy()
    u2 = ctrl.step(s)
    h_after_2 = np.asarray(pred.hidden[0]).copy()
    # _post_step advanced the hidden state between steps
    assert not np.allclose(h_after_1, h_after_2)

    # Same optimizer RNG + same state, but different hidden => the jitted
    # step must see the new hidden through params. Build a fresh controller,
    # replay step 1, then overwrite the hidden and confirm divergence.
    ctrl2 = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "random-action-tf", "controller_logging": False},
    )
    ctrl2.configure(
        optimizer_name="random-action-tf",
        predictor_specification="GRU-5IN-8H1-4OUT",
        optimizer_config={"seed": 4, "mpc_timestep": 0.02,
                          "mpc_horizon": 8, "num_rollouts": 16},
    )
    ctrl2.step(s)  # same trace + same first step
    import jax.numpy as jnp
    pred2 = ctrl2.predictor.predictor
    pred2.hidden = tuple(jnp.ones_like(h) * 5.0 for h in pred2.hidden)
    u2_perturbed = ctrl2.step(s)
    assert not np.allclose(u2, u2_perturbed), (
        "hidden-state change did not reach the jitted step (stale closure)"
    )


def test_recurrent_checkpoint_swap_reaches_step():
    """Review r3 regression: the stateful param fast path must notice a
    weight SWAP (not just hidden advance) — stale weights in the jitted
    step would silently optimize against the old model."""
    import jax

    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "random-action-tf", "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name="random-action-tf",
        predictor_specification="GRU-5IN-8H1-4OUT",
        optimizer_config={"seed": 4, "mpc_timestep": 0.02,
                          "mpc_horizon": 8, "num_rollouts": 16},
    )
    s = np.array([0.0, 0.0, 0.1, 0.0], np.float32)
    ctrl.step(s)
    u1 = ctrl.step(s)

    pred = ctrl.predictor.predictor
    pred.net_params = jax.tree_util.tree_map(lambda w: w * 1.5, pred.net_params)
    u2 = ctrl.step(s)
    assert not np.allclose(u1, u2), (
        "weight swap did not reach the compiled step (stale _dyn_params)"
    )
