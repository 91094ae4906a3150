"""Fused (cost-only) rollout must agree exactly with the trajectory path."""
import jax
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.costs.cartpole import CartpoleQuadraticCost
from control_toolkit_tpu.models.predictors import ODEPredictor
from control_toolkit_tpu.ops.rollout import scan_cost_rollout


def test_scan_cost_rollout_matches_trajectory_cost():
    K, H = 64, 20
    pred = ODEPredictor("cartpole", dt=0.02)
    cf = CartpoleQuadraticCost()
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    s0 = jnp.tile(jnp.array([[0.1, 0.0, 0.2, -0.1]], jnp.float32), (K, 1))
    Q = jax.random.uniform(k1, (K, H, 1), minval=-1.0, maxval=1.0)
    u_prev = jnp.array([0.3], jnp.float32)

    dyn_params = {k: jnp.float32(v) for k, v in pred.default_params().items()}
    cost_params = cf.current_params({"target_position": jnp.float32(0.5)})

    # Reference path: full trajectory then block cost.
    traj = pred.rollout(s0, Q, dyn_params)
    ref_cost = cf.get_trajectory_cost(traj, Q, u_prev, cost_params)

    # Fused path.
    step = pred.single_step
    fused_cost, x_final = scan_cost_rollout(
        lambda x, u, p: step(x, u, p["dyn"]),
        lambda x, u, up, p: cf.stage_cost_step(x, u, up, cost_params),
        lambda x, p: cf.get_terminal_cost(x, cost_params),
        s0, Q, u_prev, {"dyn": dyn_params},
    )

    np.testing.assert_allclose(np.asarray(fused_cost), np.asarray(ref_cost), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(x_final), np.asarray(traj[:, -1, :]), rtol=1e-5)


def test_mppi_fused_equals_unfused():
    """Same seed: MPPI with logging on (trajectory path) and off (fused path)
    must produce identical controls."""
    import sys
    sys.path.insert(0, "tests")
    from test_mppi import make_mppi

    a = make_mppi(logging=True, num_rollouts=128, mpc_horizon=15)
    b = make_mppi(logging=False, num_rollouts=128, mpc_horizon=15)
    assert b.optimizer._can_fuse_rollout()
    s = np.array([0.0, 0.0, 0.2, 0.0], np.float32)
    for _ in range(3):
        ua = a.step(s)
        ub = b.step(s)
    np.testing.assert_allclose(ua, ub, atol=1e-5)


import pytest


# Heavy gradient-family params live in the slow tier: the fused-vs-logging
# equivalence is structural, so cem-tf + random-action-tf keep the property
# covered per path family in the default tier (re-tier, round 4).
@pytest.mark.parametrize("name", [
    "cem-tf",
    pytest.param("cem-naive-grad-tf", marks=pytest.mark.slow),
    pytest.param("cem-gmm-tf", marks=pytest.mark.slow),
    pytest.param("cem-grad-bharadhwaj-tf", marks=pytest.mark.slow),
    pytest.param("gradient-tf", marks=pytest.mark.slow),
    pytest.param("rpgd-tf", marks=pytest.mark.slow),
    "random-action-tf",
])
def test_fused_path_equals_trajectory_path(name):
    """Logging on (trajectory path) vs off (fused cost-only path) must yield
    identical controls for every optimizer."""
    from test_optimizer_zoo import make

    a = make(name, logging=True)
    b = make(name, logging=False)
    s = np.array([0.0, 0.0, 0.25, -0.1], np.float32)
    for _ in range(3):
        ua = a.step(s)
        ub = b.step(s)
        np.testing.assert_allclose(ua, ub, atol=2e-5)


def test_remat_gradients_match():
    """remat=True must not change gradient values (only memory profile)."""
    from test_optimizer_zoo import make

    a = make("rpgd-tf", logging=False)
    b = make("rpgd-tf", logging=False, remat=True)
    assert b.optimizer.remat
    s = np.array([0.0, 0.0, 0.3, -0.1], np.float32)
    for _ in range(3):
        ua = a.step(s)
        ub = b.step(s)
        np.testing.assert_allclose(ua, ub, atol=1e-6)
