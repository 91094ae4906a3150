"""Fused NEURAL gradient kernel (ops/pallas_grad.py
build_neural_grad_cost_rollout_kernel): interpret-mode correctness of
(cost, dQ) against jax.value_and_grad through the fused scan over the SAME
MLP predictor — the gradient-path twin of test_pallas_neural.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_toolkit_tpu.controllers.mpc import MPCController


def make_neural_rpgd(K=128, H=12, env="cartpole", net="mlp-32-32"):
    ctrl = MPCController(
        environment_name=env,
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.3},
        config={"optimizer": "rpgd-tf", "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name="rpgd-tf",
        predictor_specification=f"neural:{net}",
        optimizer_config={
            "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H,
            "num_rollouts": K, "outer_its": 1,
            "SAMPLING_DISTRIBUTION": "uniform",
            "period_interpolation_inducing_points": 5,
            "learning_rate": 0.05, "gradmax_clip": 5,
            "opt_keep_k_ratio": 0.25, "resamp_per": 10,
            "sample_stdev": 0.5, "warmup": False, "warmup_iterations": 2,
        },
    )
    return ctrl


def _inputs(ctrl, K, H, seed=0):
    key = jax.random.PRNGKey(seed)
    s_tiled = jnp.tile(jnp.array([[0.1, -0.2, 0.3, 0.05]], jnp.float32), (K, 1))
    Q = jax.random.uniform(key, (K, H, 1), minval=-0.8, maxval=0.8)
    u_prev = jnp.array([0.25], jnp.float32)
    return s_tiled, Q, u_prev, ctrl._assemble_params()


@pytest.mark.parametrize("net", ["mlp-32-32", "mlp-16"])
def test_neural_grad_kernel_matches_xla_ad(net):
    K, H = 128, 12
    ctrl = make_neural_rpgd(K, H, net=net)
    opt = ctrl.optimizer
    grad_fn = opt._build_pallas_neural_grad(interpret=True, tile_k=64)
    s_tiled, Q, u_prev, params = _inputs(ctrl, K, H)

    ref_costs = opt._fused_cost(s_tiled, Q, u_prev, params)
    ref_grad = jax.grad(
        lambda q: jnp.sum(opt._fused_cost(s_tiled, q, u_prev, params))
    )(Q)

    cost, dQ = grad_fn(s_tiled, Q, u_prev, params)
    np.testing.assert_allclose(np.asarray(cost), np.asarray(ref_costs),
                               rtol=1e-4, atol=1e-4)
    # Random-init delta nets blow the rollout (and so the gradient) up to
    # O(1e5); matmul/accumulation reassociation between the kernel and the
    # XLA-AD scan then shows up as ~5e-4 relative at the extremes (q99 is
    # 1.3e-4) — the tolerance reflects conditioning, not semantics.
    np.testing.assert_allclose(np.asarray(dQ), np.asarray(ref_grad),
                               rtol=1e-3, atol=5e-4)


def test_neural_grad_kernel_norm_and_absolute_form():
    """Checkpoint-style nets carry norm_in/out stats; predict_delta=False
    takes the absolute next-state path.  Also turns the control-change term
    up so the backward gprev carry (u_h entering stage h+1) is exercised."""
    K, H = 64, 10
    ctrl = make_neural_rpgd(K, H)
    opt = ctrl.optimizer
    pred = opt.predictor.predictor
    pred.predict_delta = False
    in_dim = pred.num_states + pred.num_control_inputs
    key = jax.random.PRNGKey(9)
    pred.net_params = dict(pred.net_params)
    pred.net_params["norm_in_mean"] = 0.1 * jax.random.normal(key, (in_dim,))
    pred.net_params["norm_in_std"] = jnp.full((in_dim,), 1.3, jnp.float32)
    pred.net_params["norm_out_mean"] = jnp.full(
        (pred.num_states,), 0.02, jnp.float32)
    pred.net_params["norm_out_std"] = jnp.full(
        (pred.num_states,), 0.9, jnp.float32)

    grad_fn = opt._build_pallas_neural_grad(interpret=True, tile_k=64)
    s_tiled, Q, u_prev, params = _inputs(ctrl, K, H, seed=4)
    if "ccrc_weight" in params["cost"]:
        params = dict(params)
        params["cost"] = dict(params["cost"], ccrc_weight=5.0)

    ref_costs = opt._fused_cost(s_tiled, Q, u_prev, params)
    ref_grad = jax.grad(
        lambda q: jnp.sum(opt._fused_cost(s_tiled, q, u_prev, params))
    )(Q)
    cost, dQ = grad_fn(s_tiled, Q, u_prev, params)
    np.testing.assert_allclose(np.asarray(cost), np.asarray(ref_costs),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dQ), np.asarray(ref_grad),
                               rtol=2e-4, atol=5e-4)


def test_neural_grad_kernel_weight_update_no_retrace(monkeypatch):
    """Weights are operands: swapping in new net params must flow through
    the SAME compiled kernel (sysid installs / checkpoint swaps), and the
    gradient must track the new weights."""
    K, H = 64, 8
    ctrl = make_neural_rpgd(K, H)
    opt = ctrl.optimizer
    grad_fn = opt._build_pallas_neural_grad(interpret=True, tile_k=64)
    s_tiled, Q, u_prev, params = _inputs(ctrl, K, H)

    _, dQ_a = grad_fn(s_tiled, Q, u_prev, params)
    params_b = jax.tree_util.tree_map(lambda x: x * 1.05, params)
    ref_b = jax.grad(
        lambda q: jnp.sum(opt._fused_cost(s_tiled, q, u_prev, params_b))
    )(Q)
    _, dQ_b = grad_fn(s_tiled, Q, u_prev, params_b)
    assert not np.allclose(np.asarray(dQ_a), np.asarray(dQ_b))
    np.testing.assert_allclose(np.asarray(dQ_b), np.asarray(ref_b),
                               rtol=2e-4, atol=5e-4)


def test_neural_grad_kernel_sharded_matches_unsharded():
    """shard_map-wrapped neural gradient kernel on the virtual mesh equals
    the unsharded kernel exactly (no cross-K collective)."""
    from control_toolkit_tpu.parallel.mesh import make_rollout_mesh

    K, H, tile = 256, 8, 32
    ctrl = make_neural_rpgd(K, H)
    opt = ctrl.optimizer
    unsharded = opt._build_pallas_neural_grad(interpret=True, tile_k=tile)
    opt.plan_sharding(make_rollout_mesh())
    sharded = opt._build_pallas_neural_grad(interpret=True, tile_k=tile)

    s_tiled, Q, u_prev, params = _inputs(ctrl, K, H, seed=1)
    c_a, g_a = unsharded(s_tiled, Q, u_prev, params)
    c_b, g_b = jax.jit(sharded)(s_tiled, Q, u_prev, params)
    np.testing.assert_array_equal(np.asarray(c_a), np.asarray(c_b))
    np.testing.assert_array_equal(np.asarray(g_a), np.asarray(g_b))


# ---- batched-session (columns) neural gradient paths -----------------------
def _stacked_states(opt, B, key_seed=0):
    keys = jnp.stack(
        [jax.random.fold_in(jax.random.PRNGKey(key_seed), i) for i in range(B)]
    )
    return jax.vmap(opt._init_state)(keys)


@pytest.mark.slow
def test_batched_rpgd_neural_matches_single_session():
    """Batched RPGD over a neural MLP predictor (columns-mode NEURAL
    gradient+cost kernels, weights as shared operands) == the
    single-session step_fn per session (XLA-AD scan on CPU), through BOTH
    surgery branches (tick 0 resamples, tick 1 keeps)."""
    B, K, H, tile = 2, 32, 10, 64
    ctrl = make_neural_rpgd(K, H)
    opt = ctrl.optimizer
    opt.resamp_per = 2
    kstep = opt._make_batched_rpgd_step(B, interpret=True, tile_k=tile)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    states = _stacked_states(opt, B)
    rng = np.random.default_rng(19)
    s_b = jnp.asarray(rng.uniform(-0.2, 0.2, size=(B, 1, 4)), jnp.float32)
    attrs_vec = jnp.asarray(np.linspace(-0.3, 0.3, B), jnp.float32)

    step_fn = opt._make_step_fn()
    for tick in range(2):
        u, new_states, costs = kstep(
            states, s_b, params["dyn"], params["cost"],
            {"target_position": attrs_vec},
        )
        for b in range(B):
            st_b = jax.tree_util.tree_map(lambda x: x[b], states)
            p_b = {
                "dyn": params["dyn"], "cost": params["cost"],
                "attrs": {"target_position": attrs_vec[b]},
            }
            u_ref, new_ref, diag = step_fn(st_b, s_b[b], p_b)
            np.testing.assert_allclose(
                np.asarray(u)[b], np.asarray(u_ref), atol=5e-4, rtol=5e-4
            )
            np.testing.assert_allclose(
                np.asarray(costs)[b], np.asarray(diag["J_logged"]),
                atol=5e-4, rtol=5e-4,
            )
            np.testing.assert_allclose(
                np.asarray(new_states.Q)[b], np.asarray(new_ref.Q),
                atol=5e-4, rtol=5e-4,
            )
            np.testing.assert_array_equal(
                np.asarray(new_states.trajectory_ages)[b],
                np.asarray(new_ref.trajectory_ages),
            )
        states = new_states


def test_batched_gradient_neural_matches_single_session():
    """Batched gradient-tf over a neural MLP predictor == the
    single-session step_fn per session (XLA-AD scan on CPU)."""
    from control_toolkit_tpu.controllers.mpc import MPCController

    B, K, H, tile = 2, 32, 10, 64
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "gradient-tf", "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name="gradient-tf",
        predictor_specification="neural:mlp-16",
        optimizer_config={
            "seed": 9, "mpc_timestep": 0.02, "mpc_horizon": H,
            "num_rollouts": K, "gradient_steps": 2, "learning_rate": 0.05,
            "gradmax_clip": 5.0, "warmup": False,
        },
    )
    opt = ctrl.optimizer
    kstep = opt._make_batched_gradient_step(B, interpret=True, tile_k=tile)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    states = _stacked_states(opt, B)
    rng = np.random.default_rng(31)
    s_b = jnp.asarray(rng.uniform(-0.2, 0.2, size=(B, 1, 4)), jnp.float32)
    attrs_vec = jnp.asarray(np.linspace(-0.3, 0.3, B), jnp.float32)

    step_fn = opt._make_step_fn()
    for tick in range(2):
        u, new_states, costs = kstep(
            states, s_b, params["dyn"], params["cost"],
            {"target_position": attrs_vec},
        )
        for b in range(B):
            st_b = jax.tree_util.tree_map(lambda x: x[b], states)
            p_b = {
                "dyn": params["dyn"], "cost": params["cost"],
                "attrs": {"target_position": attrs_vec[b]},
            }
            u_ref, new_ref, diag = step_fn(st_b, s_b[b], p_b)
            np.testing.assert_allclose(
                np.asarray(u)[b], np.asarray(u_ref), atol=5e-4, rtol=5e-4
            )
            np.testing.assert_allclose(
                np.asarray(new_states.Q)[b], np.asarray(new_ref.Q),
                atol=5e-4, rtol=5e-4,
            )
        states = new_states


def test_batched_neural_grad_rejects_per_slot_dyn():
    """Heterogeneous-fleet models need scalar SMEM dyn rows; neural weights
    are shared VMEM operands, so per-slot dyn must be refused loudly."""
    ctrl = make_neural_rpgd(32, 10)
    opt = ctrl.optimizer
    with pytest.raises(ValueError, match="ODE predictor"):
        opt._make_batched_rpgd_step(
            2, interpret=True, tile_k=64, per_slot_dyn=("net",)
        )


def test_kernel_sweep_neural_rpgd_dispatch_and_parity():
    """Monte-Carlo sweep over an RPGD controller with a NEURAL predictor:
    _build_kernel_sweep dispatches to the batched RPGD step (which binds
    the neural gradient kernels) and matches the eager per-tick loop."""
    from control_toolkit_tpu.environments.cartpole import CartpoleEnv
    from control_toolkit_tpu.evaluation import ClosedLoop

    N, K, H, tile, T = 2, 32, 8, 32, 3
    ctrl = make_neural_rpgd(K, H)
    opt = ctrl.optimizer
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=0)
    loop = ClosedLoop(ctrl, env, actuator_noise=0.0)
    assert not loop._kernel_sweep_eligible(N)   # CPU backend -> vmap path
    sweep = loop._build_kernel_sweep(N, interpret=True, tile_k=tile)

    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    states0 = _stacked_states(opt, N)
    rng = np.random.default_rng(5)
    s0s = jnp.asarray(rng.uniform(-0.2, 0.2, size=(N, 4)), jnp.float32)
    sub = jax.random.PRNGKey(23)
    noise_keys = jax.random.split(sub, N * T).reshape((N, T) + sub.shape)
    _, sT, ss, us, stage, _ = sweep(states0, s0s, params, noise_keys, T)

    kstep = opt._make_batched_rpgd_step(N, interpret=True, tile_k=tile)
    s, st = s0s, states0
    for t in range(T):
        u, st, _ = kstep(st, s[:, None, :], params["dyn"], params["cost"],
                         params["attrs"])
        u = jnp.clip(u, -1.0, 1.0)
        np.testing.assert_allclose(np.asarray(us)[:, t], np.asarray(u),
                                   atol=1e-5, rtol=1e-5)
        s = env.step_dynamics(s, u, env.dt)
    np.testing.assert_allclose(np.asarray(sT), np.asarray(s),
                               atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------- ensemble
def make_ensemble_rpgd(K=128, H=12, E=4, net="mlp-16"):
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.3},
        config={"optimizer": "rpgd-tf", "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name="rpgd-tf",
        predictor_specification=f"ensemble:{net}:{E}",
        optimizer_config={
            "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H,
            "num_rollouts": K, "outer_its": 1,
            "SAMPLING_DISTRIBUTION": "uniform",
            "period_interpolation_inducing_points": 5,
            "learning_rate": 0.05, "gradmax_clip": 5,
            "opt_keep_k_ratio": 0.25, "resamp_per": 10,
            "sample_stdev": 0.5, "warmup": False, "warmup_iterations": 2,
        },
    )
    return ctrl


def test_ensemble_grad_kernel_matches_xla_ad():
    """Ensemble form of the gradient kernel (stacked member weights,
    per-tile member block) vs jax.grad through the blockwise fused scan."""
    K, H, E = 128, 12, 4
    ctrl = make_ensemble_rpgd(K, H, E)
    opt = ctrl.optimizer
    grad_fn = opt._build_pallas_ensemble_grad(interpret=True, tile_k=16)
    s_tiled, Q, u_prev, params = _inputs(ctrl, K, H)

    ref_costs = opt._fused_cost(s_tiled, Q, u_prev, params)
    ref_grad = jax.grad(
        lambda q: jnp.sum(opt._fused_cost(s_tiled, q, u_prev, params))
    )(Q)

    cost, dQ = grad_fn(s_tiled, Q, u_prev, params)
    np.testing.assert_allclose(np.asarray(cost), np.asarray(ref_costs),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dQ), np.asarray(ref_grad),
                               rtol=1e-3, atol=5e-4)


def test_ensemble_grad_gate_excludes_risk_weight(tmp_path):
    """risk_weight produces a penalty gradient the kernel can't see — the
    gate must route risk-averse gradient planning to AD-through-scan."""
    ctrl = make_ensemble_rpgd(64, 10, 2)
    opt = ctrl.optimizer
    opt.risk_weight = 1.0
    assert not opt._can_use_pallas_ensemble_grad()
    opt.risk_weight = 0.0
    # Grad tile must divide K/E; K=64, E=2 -> per-member 32 < 256 min tile.
    assert opt._ensemble_grad_tile() == 0 or opt.num_rollouts // 2 >= 256
