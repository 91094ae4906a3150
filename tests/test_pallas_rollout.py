"""Pallas fused rollout+cost kernel: interpret-mode correctness vs scan."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_toolkit_tpu.controllers.mpc import MPCController


ENV_ATTRS = {
    "cartpole": {"target_position": 0.3},
    "pendulum": {},
    "acrobot": {},
    "pointmass": {"target_x": 0.5, "target_y": -0.5},
    "quadrotor2d": {"target_x": 0.0, "target_z": 1.0},
    "quadrotor3d": {"target_x": 0.0, "target_y": 0.0, "target_z": 1.0},
    "car": {"target_x": 1.0, "target_y": 0.5},
}


def make_mppi_ctrl(K=256, H=20, env="cartpole"):
    ctrl = MPCController(
        environment_name=env,
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes=dict(ENV_ATTRS[env]),
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="mppi", optimizer_config={
        "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H, "num_rollouts": K,
        "cc_weight": 1.0, "R": 1.0, "LBD": 100.0, "NU": 1000.0,
        "SQRTRHOINV": 0.05, "period_interpolation_inducing_points": 5,
    })
    return ctrl


@pytest.mark.parametrize("integrator", ["rk4", "euler"])
def test_pallas_kernel_matches_scan(integrator):
    K, H = 256, 20
    ctrl = make_mppi_ctrl(K, H)
    opt = ctrl.optimizer
    # force integrator choice
    pred = opt.predictor.predictor
    pred.integrator = integrator
    from control_toolkit_tpu.models.predictors import make_ode_rollout
    pred.rollout_fn = make_ode_rollout(pred.dynamics, pred.dt, integrator, 1)

    pallas_cost = opt._build_pallas_cost(interpret=True, tile_k=128)

    key = jax.random.PRNGKey(0)
    s_tiled = jnp.tile(jnp.array([[0.1, -0.2, 0.3, 0.05]], jnp.float32), (K, 1))
    Q = jax.random.uniform(key, (K, H, 1), minval=-1.0, maxval=1.0)
    u_prev = jnp.array([0.25], jnp.float32)
    params = ctrl._assemble_params()

    ref = opt._fused_cost(s_tiled, Q, u_prev, params)
    out = pallas_cost(s_tiled, Q, u_prev, params)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5, atol=1e-4)


@pytest.mark.parametrize(
    "env", ["pendulum", "acrobot", "pointmass", "quadrotor2d", "quadrotor3d",
            "car"]
)
def test_pallas_kernel_matches_scan_all_envs(env):
    """Every built-in model family flows through the cost kernel: SOA
    dynamics + cost primitives agree with the scan path."""
    K, H = 128, 15
    ctrl = make_mppi_ctrl(K, H, env=env)
    opt = ctrl.optimizer
    S = opt.num_states
    U = opt.num_control_inputs
    pallas_cost = opt._build_pallas_cost(interpret=True, tile_k=64)

    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    s_tiled = jnp.tile(
        jax.random.uniform(k1, (1, S), minval=-0.5, maxval=0.5), (K, 1)
    )
    Q = jax.random.uniform(k2, (K, H, U), minval=-1.0, maxval=1.0)
    u_prev = 0.1 * jnp.ones((U,), jnp.float32)
    params = ctrl._assemble_params()

    ref = opt._fused_cost(s_tiled, Q, u_prev, params)
    out = pallas_cost(s_tiled, Q, u_prev, params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5, atol=1e-4)


@pytest.mark.parametrize("mesh_kind", ["1d", "multislice"])
def test_pallas_kernel_sharded_matches_unsharded(mesh_kind):
    """The shard_map-wrapped cost kernel on an 8-device mesh must equal the
    unsharded kernel AND the fused-scan reference (each device runs its
    local K tiles; no cross-K collective exists in the cost rollout)."""
    from control_toolkit_tpu.parallel.mesh import (
        make_multislice_mesh, make_rollout_mesh,
    )

    K, H, tile = 256, 12, 32
    ctrl = make_mppi_ctrl(K, H)
    opt = ctrl.optimizer
    unsharded_cost = opt._build_pallas_cost(interpret=True, tile_k=tile)

    mesh = make_rollout_mesh() if mesh_kind == "1d" else make_multislice_mesh(2)
    opt.plan_sharding(mesh)
    assert opt._mesh is mesh and opt._n_shard_devices() == 8
    sharded_cost = opt._build_pallas_cost(interpret=True, tile_k=tile)

    key = jax.random.PRNGKey(1)
    s_tiled = jnp.tile(jnp.array([[0.1, -0.2, 0.3, 0.05]], jnp.float32), (K, 1))
    Q = jax.random.uniform(key, (K, H, 1), minval=-1.0, maxval=1.0)
    u_prev = jnp.array([0.25], jnp.float32)
    params = ctrl._assemble_params()

    ref = np.asarray(opt._fused_cost(s_tiled, Q, u_prev, params))
    a = np.asarray(unsharded_cost(s_tiled, Q, u_prev, params))
    b = np.asarray(jax.jit(sharded_cost)(s_tiled, Q, u_prev, params))

    np.testing.assert_array_equal(a, b)  # same kernel math, exact
    np.testing.assert_allclose(b, ref, rtol=3e-5, atol=1e-4)


def test_pallas_respects_dynamic_params():
    """Changing cost weights/attrs must flow through the SMEM vector without
    rebuilding the kernel."""
    K, H = 128, 10
    ctrl = make_mppi_ctrl(K, H)
    opt = ctrl.optimizer
    pallas_cost = opt._build_pallas_cost(interpret=True, tile_k=128)

    s_tiled = jnp.zeros((K, 4), jnp.float32)
    Q = jnp.zeros((K, H, 1), jnp.float32)
    u_prev = jnp.zeros((1,), jnp.float32)
    params = ctrl._assemble_params()

    c0 = np.asarray(pallas_cost(s_tiled, Q, u_prev, params))

    params2 = dict(params)
    params2["attrs"] = {"target_position": jnp.float32(2.0)}
    c1 = np.asarray(pallas_cost(s_tiled, Q, u_prev, params2))

    # target moved 0.3 -> 2 with the state pinned at the origin:
    # dd delta = dd_weight * (2^2 - 0.3^2) per stage, averaged over H+1.
    expected_delta = 120.0 * (4.0 - 0.09) * H / (H + 1)
    np.testing.assert_allclose(c1 - c0, expected_delta, rtol=1e-5)
