"""Numerical parity vs a TensorFlow implementation of the reference math.

The reference is TF-based; bitwise RNG equality is impossible across
frameworks (TF Philox vs JAX Threefry — SURVEY §7 hard part 3), so parity is
checked on the deterministic core: identical control sequences fed through
both frameworks' rollout + trajectory-cost + MPPI-update math must agree to
float tolerance, and elite selection must pick identical indices.
"""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from control_toolkit_tpu.costs.cartpole import CartpoleQuadraticCost
from control_toolkit_tpu.models.dynamics import CARTPOLE_DEFAULTS
from control_toolkit_tpu.models.predictors import ODEPredictor
from control_toolkit_tpu.ops.common import elite_indices

DT = 0.02
P = dict(CARTPOLE_DEFAULTS)
W = CartpoleQuadraticCost.DEFAULTS


def tf_dynamics(x, u):
    pos_d = x[:, 1]
    theta = x[:, 2]
    theta_d = x[:, 3]
    force = u[:, 0] * P["u_max"]
    sin_t, cos_t = tf.sin(theta), tf.cos(theta)
    total_m = P["m_cart"] + P["m_pole"]
    temp = (force + P["m_pole"] * P["L"] * theta_d**2 * sin_t) / total_m
    theta_dd = (P["g"] * sin_t - cos_t * temp) / (
        P["L"] * (4.0 / 3.0 - P["m_pole"] * cos_t**2 / total_m)
    )
    pos_dd = temp - P["m_pole"] * P["L"] * theta_dd * cos_t / total_m
    return tf.stack([pos_d, pos_dd, theta_d, theta_dd], axis=1)


def tf_rk4(x, u):
    k1 = tf_dynamics(x, u)
    k2 = tf_dynamics(x + 0.5 * DT * k1, u)
    k3 = tf_dynamics(x + 0.5 * DT * k2, u)
    k4 = tf_dynamics(x + DT * k3, u)
    return x + DT / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)


def tf_rollout(s0, Q):
    """[K,S], [K,H,U] -> [K,H+1,S] — mirrors predict_core."""
    x = tf.convert_to_tensor(s0)
    traj = [x]
    for h in range(Q.shape[1]):
        x = tf_rk4(x, tf.convert_to_tensor(Q[:, h, :]))
        traj.append(x)
    return tf.stack(traj, axis=1)


def tf_trajectory_cost(traj, Q, u_prev, target):
    """Mean over H stage costs + terminal (reference semantics)."""
    states = traj[:, :-1, :]
    pos, angle, angle_d = states[:, :, 0], states[:, :, 2], states[:, :, 3]
    dd = W["dd_weight"] * (pos - target) ** 2
    ep = W["ep_weight"] * 0.25 * (1.0 - tf.cos(angle)) ** 2
    ekp = W["ekp_weight"] * (angle_d / (2.0 * np.pi)) ** 2
    cc = W["cc_weight"] * W["R"] * tf.reduce_sum(Q**2, axis=-1)
    prev = tf.concat([tf.fill((Q.shape[0], 1, Q.shape[2]), u_prev), Q[:, :-1, :]], axis=1)
    ccrc = W["ccrc_weight"] * tf.reduce_sum((Q - prev) ** 2, axis=-1)
    stage = dd + ep + ekp + cc + ccrc
    t_angle = traj[:, -1, 2]
    t_angle_d = traj[:, -1, 3]
    terminal = 1.0e4 * (1.0 - tf.cos(t_angle)) ** 2 + 10.0 * t_angle_d**2
    total = tf.concat([stage, terminal[:, None]], axis=1)
    return tf.reduce_mean(total, axis=1)


@pytest.fixture(scope="module")
def shared_inputs():
    rng = np.random.default_rng(42)
    K, H = 64, 25
    s0 = np.tile(np.array([[0.15, -0.1, 0.25, 0.3]], np.float32), (K, 1))
    Q = rng.uniform(-1, 1, size=(K, H, 1)).astype(np.float32)
    return s0, Q


def test_rollout_parity(shared_inputs):
    s0, Q = shared_inputs
    pred = ODEPredictor("cartpole", dt=DT)
    jax_traj = np.asarray(pred.rollout(jnp.asarray(s0), jnp.asarray(Q)))
    tf_traj = tf_rollout(s0, Q).numpy()
    np.testing.assert_allclose(jax_traj, tf_traj, rtol=2e-4, atol=2e-4)


def test_trajectory_cost_and_elite_parity(shared_inputs):
    s0, Q = shared_inputs
    pred = ODEPredictor("cartpole", dt=DT)
    cf = CartpoleQuadraticCost()
    params = cf.current_params({"target_position": jnp.float32(0.2)})
    u_prev = jnp.asarray([0.1], jnp.float32)

    jax_traj = pred.rollout(jnp.asarray(s0), jnp.asarray(Q))
    jax_cost = np.asarray(cf.get_trajectory_cost(jax_traj, jnp.asarray(Q), u_prev, params))

    tf_traj = tf_rollout(s0, Q)
    tf_cost = tf_trajectory_cost(tf_traj, tf.convert_to_tensor(Q), 0.1, 0.2).numpy()

    np.testing.assert_allclose(jax_cost, tf_cost, rtol=5e-4, atol=5e-3)
    # Elite selection must pick the same rollouts in the same order.
    k = 8
    jax_elites = np.asarray(elite_indices(jnp.asarray(jax_cost), k))
    tf_elites = tf.argsort(tf_cost)[:k].numpy()
    np.testing.assert_array_equal(jax_elites, tf_elites)


def test_mppi_update_parity(shared_inputs):
    """Softmax-weighted average + nominal update on identical inputs."""
    s0, Q = shared_inputs
    K, H, U = Q.shape
    rng = np.random.default_rng(3)
    S_costs = rng.uniform(0, 500, size=K).astype(np.float32)
    delta_u = rng.normal(size=(K, H, U)).astype(np.float32)
    LBD = 100.0

    # JAX (as in MPPIOptimizer.reward_weighted_average)
    Sj = jnp.asarray(S_costs)
    rho = jnp.min(Sj, axis=0)
    wj = jnp.exp(-1.0 / LBD * (Sj - rho))
    bj = np.asarray(jnp.sum(wj[:, None, None] * jnp.asarray(delta_u), axis=0) / jnp.sum(wj))

    # TF (reference optimizer_mppi.py:163-168)
    St = tf.convert_to_tensor(S_costs)
    rho_t = tf.reduce_min(St, axis=0)
    wt = tf.exp(-1.0 / LBD * (St - rho_t))
    bt = (tf.reduce_sum(wt[:, None, None] * tf.convert_to_tensor(delta_u), axis=0)
          / tf.reduce_sum(wt)).numpy()

    np.testing.assert_allclose(bj, bt, rtol=1e-5, atol=1e-6)
