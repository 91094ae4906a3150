"""Fused gradient kernel (ops/pallas_grad.py): interpret-mode correctness of
(cost, dQ/dQ) against jax.value_and_grad through the fused scan path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_toolkit_tpu.controllers.mpc import MPCController

ENV_ATTRS = {
    "cartpole": {"target_position": 0.3},
    "pointmass": {"target_x": 0.5, "target_y": -0.5},
    "quadrotor3d": {"target_x": 0.0, "target_y": 0.0, "target_z": 1.0},
}


def make_ctrl(env, K=128, H=15, predictor_spec=None):
    ctrl = MPCController(
        environment_name=env,
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes=dict(ENV_ATTRS[env]),
        config={"optimizer": "rpgd-tf", "controller_logging": False},
    )
    kw = {}
    if predictor_spec:
        kw["predictor_specification"] = predictor_spec
    ctrl.configure(optimizer_name="rpgd-tf", optimizer_config={
        "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H, "num_rollouts": K,
        "outer_its": 1, "SAMPLING_DISTRIBUTION": "uniform",
        "period_interpolation_inducing_points": 5, "learning_rate": 0.05,
        "gradmax_clip": 5, "opt_keep_k_ratio": 0.25, "resamp_per": 10,
        "sample_stdev": 0.5, "warmup": False, "warmup_iterations": 2,
    }, **kw)
    return ctrl


@pytest.mark.parametrize("env,spec", [
    ("cartpole", None), ("pointmass", None),
    # euler on a chain plant: the round-5 Mosaic layout anchor lives in
    # the euler backward carry (pallas_grad) — keep its math parity pinned
    ("pointmass", "ODE:euler"),
    pytest.param("quadrotor3d", None, marks=pytest.mark.slow),
])
def test_grad_kernel_matches_xla_ad(env, spec):
    K, H = 128, 15
    ctrl = make_ctrl(env, K, H, predictor_spec=spec)
    opt = ctrl.optimizer
    S, U = opt.num_states, opt.num_control_inputs

    grad_fn = opt._build_pallas_grad(interpret=True, tile_k=64)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    s_tiled = jnp.tile(
        jax.random.uniform(k1, (1, S), minval=-0.4, maxval=0.4), (K, 1)
    )
    Q = jax.random.uniform(k2, (K, H, U), minval=-0.8, maxval=0.8)
    u_prev = 0.1 * jnp.ones((U,), jnp.float32)
    params = ctrl._assemble_params()

    ref_cost, ref_grad = jax.value_and_grad(
        lambda q: jnp.sum(opt._fused_cost(s_tiled, q, u_prev, params))
    )(Q)
    # per-rollout reference costs for the cost output comparison
    ref_costs = opt._fused_cost(s_tiled, Q, u_prev, params)

    cost, dQ = grad_fn(s_tiled, Q, u_prev, params)
    np.testing.assert_allclose(np.asarray(cost), np.asarray(ref_costs),
                               rtol=3e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dQ), np.asarray(ref_grad),
                               rtol=1e-4, atol=2e-4)


@pytest.mark.parametrize("mesh_kind", [
    "1d", pytest.param("multislice", marks=pytest.mark.slow),
])
def test_grad_kernel_sharded_matches_unsharded(mesh_kind):
    """The shard_map-wrapped gradient kernel on an 8-device mesh must equal
    the unsharded kernel exactly (per-rollout gradients have no cross-K
    collective) and XLA AD to float tolerance."""
    from control_toolkit_tpu.parallel.mesh import (
        make_multislice_mesh, make_rollout_mesh,
    )

    K, H, tile = 256, 12, 32
    ctrl = make_ctrl("cartpole", K, H)
    opt = ctrl.optimizer
    unsharded = opt._build_pallas_grad(interpret=True, tile_k=tile)

    mesh = make_rollout_mesh() if mesh_kind == "1d" else make_multislice_mesh(2)
    opt.plan_sharding(mesh)
    sharded = opt._build_pallas_grad(interpret=True, tile_k=tile)

    key = jax.random.PRNGKey(1)
    s_tiled = jnp.tile(jnp.array([[0.1, -0.2, 0.3, 0.05]], jnp.float32), (K, 1))
    Q = jax.random.uniform(key, (K, H, 1), minval=-1.0, maxval=1.0)
    u_prev = jnp.array([0.25], jnp.float32)
    params = ctrl._assemble_params()

    c_a, g_a = unsharded(s_tiled, Q, u_prev, params)
    c_b, g_b = jax.jit(sharded)(s_tiled, Q, u_prev, params)
    np.testing.assert_array_equal(np.asarray(c_a), np.asarray(c_b))
    np.testing.assert_array_equal(np.asarray(g_a), np.asarray(g_b))

    ref_grad = jax.grad(
        lambda q: jnp.sum(opt._fused_cost(s_tiled, q, u_prev, params))
    )(Q)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(ref_grad),
                               rtol=1e-4, atol=2e-4)


def test_grad_kernel_control_change_coupling():
    """The ccrc term couples u_h to stage h+1 (prev_us); finite differences
    on a single rollout confirm the backward carry handles it."""
    ctrl = make_ctrl("cartpole", K=64, H=8)
    opt = ctrl.optimizer
    grad_fn = opt._build_pallas_grad(interpret=True, tile_k=64)
    params = ctrl._assemble_params()
    # make the control-change term dominant if the cost exposes it
    if "ccrc_weight" in params["cost"]:
        params = dict(params)
        params["cost"] = dict(params["cost"], ccrc_weight=5.0)

    K, H, U = 64, 8, 1
    s_tiled = jnp.tile(jnp.array([[0.1, 0.0, 0.2, 0.0]], jnp.float32), (K, 1))
    Q = 0.3 * jnp.ones((K, H, U), jnp.float32)
    Q = Q.at[0, 3, 0].set(-0.2)
    u_prev = jnp.array([0.25], jnp.float32)

    _, dQ = grad_fn(s_tiled, Q, u_prev, params)

    eps = 1e-3
    for h in (0, 3, H - 1):
        Qp = Q.at[0, h, 0].add(eps)
        Qm = Q.at[0, h, 0].add(-eps)
        cp = opt._fused_cost(s_tiled, Qp, u_prev, params)[0]
        cm = opt._fused_cost(s_tiled, Qm, u_prev, params)[0]
        fd = float((cp - cm) / (2 * eps))
        np.testing.assert_allclose(float(dQ[0, h, 0]), fd, rtol=2e-2, atol=2e-3)
