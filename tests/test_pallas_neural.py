"""Fused neural-dynamics rollout+cost kernel (ops/pallas_neural.py):
interpret-mode correctness vs the fused scan over the SAME MLP predictor,
plus sharded execution on the virtual mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_toolkit_tpu.controllers.mpc import MPCController


def make_neural_mppi(K=256, H=20, env="cartpole", net="mlp-32-32",
                     mesh=None, **pred_kwargs):
    ctrl = MPCController(
        environment_name=env,
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.3},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name="mppi",
        predictor_specification=f"neural:{net}",
        optimizer_config={
            "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H,
            "num_rollouts": K, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
            "NU": 1000.0, "SQRTRHOINV": 0.05,
            "period_interpolation_inducing_points": 5,
        },
        mesh=mesh,
    )
    return ctrl


def _inputs(ctrl, K, H, seed=0):
    key = jax.random.PRNGKey(seed)
    s_tiled = jnp.tile(jnp.array([[0.1, -0.2, 0.3, 0.05]], jnp.float32), (K, 1))
    Q = jax.random.uniform(key, (K, H, 1), minval=-1.0, maxval=1.0)
    u_prev = jnp.array([0.25], jnp.float32)
    return s_tiled, Q, u_prev, ctrl._assemble_params()


@pytest.mark.parametrize("net", ["mlp-32-32", "mlp-16"])
def test_neural_kernel_matches_scan(net):
    K, H = 256, 20
    ctrl = make_neural_mppi(K, H, net=net)
    opt = ctrl.optimizer
    kernel_cost = opt._build_pallas_neural_cost(interpret=True, tile_k=128)
    s_tiled, Q, u_prev, params = _inputs(ctrl, K, H)
    ref = opt._fused_cost(s_tiled, Q, u_prev, params)
    out = kernel_cost(s_tiled, Q, u_prev, params)
    # random-init delta nets can blow the state up to O(1e3); matmul
    # reassociation then shows up as ~3e-5 relative — tolerance reflects
    # conditioning, not semantics.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_neural_kernel_with_normalization_and_absolute_form():
    """Checkpoint-style nets carry norm_in/out stats; predict_delta=False
    takes the absolute next-state path."""
    K, H = 128, 10
    ctrl = make_neural_mppi(K, H)
    opt = ctrl.optimizer
    pred = opt.predictor.predictor
    pred.predict_delta = False
    in_dim = pred.num_states + pred.num_control_inputs
    key = jax.random.PRNGKey(9)
    pred.net_params = dict(pred.net_params)
    pred.net_params["norm_in_mean"] = 0.1 * jax.random.normal(key, (in_dim,))
    pred.net_params["norm_in_std"] = jnp.full((in_dim,), 1.3, jnp.float32)
    pred.net_params["norm_out_mean"] = jnp.full((pred.num_states,), 0.02, jnp.float32)
    pred.net_params["norm_out_std"] = jnp.full((pred.num_states,), 0.9, jnp.float32)

    kernel_cost = opt._build_pallas_neural_cost(interpret=True, tile_k=128)
    s_tiled, Q, u_prev, params = _inputs(ctrl, K, H, seed=4)
    ref = opt._fused_cost(s_tiled, Q, u_prev, params)
    out = kernel_cost(s_tiled, Q, u_prev, params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=1e-4)


def test_neural_kernel_sharded():
    """shard_map'd kernel over the 8-device mesh: weights replicated,
    population sharded; equals unsharded to fp tolerance."""
    from control_toolkit_tpu.parallel.mesh import make_rollout_mesh

    K, H = 1024, 10
    mesh = make_rollout_mesh(jax.devices())
    ctrl = make_neural_mppi(K, H, mesh=mesh)
    opt = ctrl.optimizer
    kernel_cost = opt._build_pallas_neural_cost(interpret=True, tile_k=128)

    ctrl_ref = make_neural_mppi(K, H)
    # same nets (seeded identically) -> same weights
    s_tiled, Q, u_prev, params = _inputs(ctrl, K, H, seed=2)
    ref = ctrl_ref.optimizer._fused_cost(s_tiled, Q, u_prev,
                                         ctrl_ref._assemble_params())
    out = kernel_cost(s_tiled, Q, u_prev, params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=1e-4)


def test_weight_update_flows_without_rebuild():
    """Perturbing the net weights changes the kernel's output on the next
    call (weights are operands, not trace-time constants)."""
    K, H = 128, 10
    ctrl = make_neural_mppi(K, H)
    opt = ctrl.optimizer
    kernel_cost = opt._build_pallas_neural_cost(interpret=True, tile_k=128)
    s_tiled, Q, u_prev, params = _inputs(ctrl, K, H)
    out1 = kernel_cost(s_tiled, Q, u_prev, params)

    import copy
    params2 = dict(params)
    params2["dyn"] = jax.tree_util.tree_map(lambda x: x, params["dyn"])
    params2["dyn"]["net"] = dict(params["dyn"]["net"])
    params2["dyn"]["net"]["w0"] = params["dyn"]["net"]["w0"] * 1.5
    out2 = kernel_cost(s_tiled, Q, u_prev, params2)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    # and it matches the scan with the same perturbed weights
    ref2 = opt._fused_cost(s_tiled, Q, u_prev, params2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=3e-5, atol=1e-4)


@pytest.mark.parametrize("net,kind", [
    ("GRU-5IN-16H1-4OUT", "gru"),
    ("LSTM-5IN-16H1-4OUT", "lstm"),
    ("GRU-5IN-16H1-16H2-4OUT", "gru"),
])
def test_recurrent_kernel_matches_rollout(net, kind):
    """Stacked-GRU/LSTM fused kernel vs the scan rollout + trajectory cost,
    including a non-zero live hidden state threaded as an operand."""
    K, H = 128, 12
    ctrl = make_neural_mppi(K, H, net=net)
    opt = ctrl.optimizer
    pred = opt.predictor.predictor
    assert pred.recurrent and pred.arch["kind"] == kind

    # advance the persistent hidden so the kernel must honor a real state
    pred.update(jnp.array([[0.1, -0.2, 0.3, 0.05]], jnp.float32),
                jnp.array([[[0.4]]], jnp.float32))

    kernel_cost = opt._build_pallas_neural_cost(interpret=True, tile_k=64)
    s_tiled, Q, u_prev, params = _inputs(ctrl, K, H, seed=6)
    ref = opt._rollout_and_cost(s_tiled, Q, u_prev, params)[0]
    out = kernel_cost(s_tiled, Q, u_prev, params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_recurrent_kernel_hidden_is_operand():
    """Advancing the hidden between calls changes the kernel's output with
    no rebuild (live-state operand, not a trace-time constant)."""
    K, H = 128, 10
    ctrl = make_neural_mppi(K, H, net="GRU-5IN-16H1-4OUT")
    opt = ctrl.optimizer
    pred = opt.predictor.predictor
    kernel_cost = opt._build_pallas_neural_cost(interpret=True, tile_k=64)
    s_tiled, Q, u_prev, params = _inputs(ctrl, K, H, seed=1)
    out1 = kernel_cost(s_tiled, Q, u_prev, params)
    for _ in range(3):
        pred.update(jnp.array([[0.5, 0.1, -0.4, 0.2]], jnp.float32),
                    jnp.array([[[0.9]]], jnp.float32))
    params2 = ctrl._assemble_params()
    out2 = kernel_cost(s_tiled, Q, u_prev, params2)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    ref2 = opt._rollout_and_cost(s_tiled, Q, u_prev, params2)[0]
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=1e-4, atol=1e-4)


def test_recurrent_kernel_sharded():
    """GRU kernel under shard_map: population sharded, weights AND live
    hidden replicated; equals unsharded."""
    from control_toolkit_tpu.parallel.mesh import make_rollout_mesh

    K, H = 512, 8
    mesh = make_rollout_mesh(jax.devices())
    ctrl = make_neural_mppi(K, H, net="GRU-5IN-16H1-4OUT", mesh=mesh)
    opt = ctrl.optimizer
    kernel_cost = opt._build_pallas_neural_cost(interpret=True, tile_k=64)

    ctrl_ref = make_neural_mppi(K, H, net="GRU-5IN-16H1-4OUT")
    s_tiled, Q, u_prev, params = _inputs(ctrl, K, H, seed=3)
    ref = ctrl_ref.optimizer._rollout_and_cost(
        s_tiled, Q, u_prev, ctrl_ref._assemble_params()
    )[0]
    out = kernel_cost(s_tiled, Q, u_prev, params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------- ensemble
def make_ensemble_mppi(K=256, H=20, E=4, net="mlp-16"):
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.3},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name="mppi",
        predictor_specification=f"ensemble:{net}:{E}",
        optimizer_config={
            "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H,
            "num_rollouts": K, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
            "NU": 1000.0, "SQRTRHOINV": 0.05,
            "period_interpolation_inducing_points": 5,
        },
    )
    return ctrl


def test_ensemble_kernel_matches_member_vmapped_scan():
    """Ensemble form of the neural kernel (stacked weights, per-tile member
    block) vs the predictor's blockwise fused scan."""
    K, H, E = 256, 20, 4
    ctrl = make_ensemble_mppi(K, H, E)
    opt = ctrl.optimizer
    kernel_cost = opt._build_pallas_ensemble_cost(interpret=True, tile_k=32)
    s_tiled, Q, u_prev, params = _inputs(ctrl, K, H)
    ref = opt._fused_cost(s_tiled, Q, u_prev, params)
    out = kernel_cost(s_tiled, Q, u_prev, params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_ensemble_kernel_norm_and_absolute_form():
    K, H, E = 128, 10, 2
    ctrl = make_ensemble_mppi(K, H, E)
    opt = ctrl.optimizer
    pred = opt.predictor.predictor
    pred.predict_delta = False
    in_dim = pred.num_states + pred.num_control_inputs
    key = jax.random.PRNGKey(9)
    pred.net_params = dict(pred.net_params)
    pred.net_params["norm_in_mean"] = 0.1 * jax.random.normal(key, (E, in_dim))
    pred.net_params["norm_in_std"] = jnp.full((E, in_dim), 1.3, jnp.float32)
    pred.net_params["norm_out_mean"] = jnp.full((E, pred.num_states), 0.02, jnp.float32)
    pred.net_params["norm_out_std"] = jnp.full((E, pred.num_states), 0.9, jnp.float32)

    kernel_cost = opt._build_pallas_ensemble_cost(interpret=True, tile_k=32)
    s_tiled, Q, u_prev, params = _inputs(ctrl, K, H, seed=4)
    ref = opt._fused_cost(s_tiled, Q, u_prev, params)
    out = kernel_cost(s_tiled, Q, u_prev, params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=1e-4)


def test_ensemble_tile_for_arithmetic():
    from control_toolkit_tpu.ops.pallas_neural import ensemble_tile_for

    assert ensemble_tile_for(16384, 4) == 4096
    assert ensemble_tile_for(32768, 4) == 8192
    # Sharded: composes when member blocks nest inside device shards
    # (E % D == 0); the tile still keys off the per-member block.
    assert ensemble_tile_for(16384, 4, n_shard_devices=2) == 4096
    assert ensemble_tile_for(16384, 4, n_shard_devices=8) == 0  # 4 % 8
    assert ensemble_tile_for(1 << 20, 8, n_shard_devices=8) == 8192
    assert ensemble_tile_for(16384, 3) == 0   # K % E != 0
    assert ensemble_tile_for(4096, 4) == 0    # per-member 1024 < min tile


def test_ensemble_kernel_sharded_matches_unsharded():
    """Member blocks nest inside device shards: the stacked weights shard
    on the member axis, each device runs a local E/D-member kernel, and
    the result equals the unsharded kernel and the member-vmapped scan."""
    from control_toolkit_tpu.parallel.mesh import make_rollout_mesh

    K, H, E = 256, 10, 8
    ctrl_a = make_ensemble_mppi(K, H, E)
    opt_a = ctrl_a.optimizer
    unsharded = opt_a._build_pallas_ensemble_cost(interpret=True, tile_k=32)

    ctrl_b = make_ensemble_mppi(K, H, E)
    # Same weights on both controllers (independent random inits otherwise).
    ctrl_b.optimizer.predictor.predictor.net_params = \
        opt_a.predictor.predictor.net_params
    opt_b = ctrl_b.optimizer
    opt_b.plan_sharding(make_rollout_mesh())
    sharded = opt_b._build_pallas_ensemble_cost(interpret=True, tile_k=32)

    s_tiled, Q, u_prev, params = _inputs(ctrl_a, K, H, seed=6)
    a = unsharded(s_tiled, Q, u_prev, params)
    b = sharded(s_tiled, Q, u_prev, ctrl_b._assemble_params())
    ref = opt_a._fused_cost(s_tiled, Q, u_prev, params)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(b), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)
