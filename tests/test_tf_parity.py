"""Numerical parity vs RECORDED TensorFlow golden fixtures.

The reference is TF-based; bitwise RNG equality is impossible across
frameworks (TF Philox vs JAX Threefry — SURVEY §7 hard part 3), so parity is
checked on the deterministic core: identical inputs fed through both
frameworks' rollout + trajectory-cost + optimizer-update math must agree to
float tolerance, and elite selection must pick identical indices.

The TF side is NOT re-derived here — tests load committed fixture arrays
(tests/golden/cartpole_golden.npz) recorded by a real TensorFlow run
(tests/golden/generate_golden.py), so the parity source of truth is
independent of this repo's math and TF need not be installed to run them.
"""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_toolkit_tpu.costs.cartpole import CartpoleQuadraticCost
from control_toolkit_tpu.models.predictors import ODEPredictor
from control_toolkit_tpu.ops.common import (
    adam_init, adam_update, clip_by_norm, elite_indices,
)

GOLDEN = Path(__file__).parent / "golden" / "cartpole_golden.npz"


@pytest.fixture(scope="module")
def g():
    assert GOLDEN.is_file(), (
        "golden fixtures missing — run tests/golden/generate_golden.py "
        "in a TF-equipped environment and commit the npz"
    )
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def cost_setup(g):
    cf = CartpoleQuadraticCost()
    params = cf.current_params(
        {"target_position": jnp.float32(float(g["target"]))}
    )
    u_prev = jnp.asarray([float(g["u_prev"])], jnp.float32)
    return cf, params, u_prev


def test_rollout_parity(g):
    pred = ODEPredictor("cartpole", dt=float(g["dt"]))
    jax_traj = np.asarray(pred.rollout(jnp.asarray(g["s0"]), jnp.asarray(g["Q"])))
    np.testing.assert_allclose(jax_traj, g["traj"], rtol=2e-4, atol=2e-4)


def test_trajectory_cost_and_elite_parity(g, cost_setup):
    cf, params, u_prev = cost_setup
    pred = ODEPredictor("cartpole", dt=float(g["dt"]))
    jax_traj = pred.rollout(jnp.asarray(g["s0"]), jnp.asarray(g["Q"]))
    jax_cost = np.asarray(
        cf.get_trajectory_cost(jax_traj, jnp.asarray(g["Q"]), u_prev, params)
    )
    np.testing.assert_allclose(jax_cost, g["costs"], rtol=5e-4, atol=5e-3)
    # Elite selection must pick the same rollouts in the same order.
    k = int(g["elite_k"])
    jax_elites = np.asarray(elite_indices(jnp.asarray(jax_cost), k))
    np.testing.assert_array_equal(jax_elites, g["elites"])


def test_cem_refit_parity(g):
    """Elite mean/std refit (reference optimizer_cem_tf.py:73-78, TF
    reduce_mean/reduce_std population semantics)."""
    elite_Q = jnp.asarray(g["Q"])[jnp.asarray(g["elites"])]
    mean = np.asarray(jnp.mean(elite_Q, axis=0))
    std = np.asarray(jnp.std(elite_Q, axis=0))
    np.testing.assert_allclose(mean, g["cem_mean"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(std, g["cem_std"], rtol=1e-4, atol=1e-6)


def test_mppi_update_parity(g):
    """Softmax-weighted average (reference optimizer_mppi.py:163-168)."""
    S = jnp.asarray(g["S_costs"])
    delta_u = jnp.asarray(g["delta_u"])
    lbd = float(g["lbd"])
    rho = jnp.min(S, axis=0)
    w = jnp.exp(-1.0 / lbd * (S - rho))
    b = np.asarray(jnp.sum(w[:, None, None] * delta_u, axis=0) / jnp.sum(w))
    np.testing.assert_allclose(b, g["mppi_b"], rtol=1e-5, atol=1e-6)


def test_gradient_clip_adam_parity(g, cost_setup):
    """AD through the rollout + per-rollout clip_by_norm + one Adam step
    must match TF GradientTape + tf.clip_by_norm(axes=[1,2]) + keras Adam
    (the RPGD core, reference optimizer_rpgd.py:310-317)."""
    cf, params, u_prev = cost_setup
    pred = ODEPredictor("cartpole", dt=float(g["dt"]))
    s0 = jnp.asarray(g["s0"])

    def total_cost(Q):
        traj = pred.rollout(s0, Q)
        return jnp.sum(cf.get_trajectory_cost(traj, Q, u_prev, params))

    grad = jax.grad(total_cost)(jnp.asarray(g["Q"]))
    np.testing.assert_allclose(
        np.asarray(grad), g["grad"], rtol=2e-3, atol=2e-3
    )

    clipped = clip_by_norm(grad, float(g["grad_clip"]), axes=(1, 2))
    np.testing.assert_allclose(
        np.asarray(clipped), g["grad_clipped"], rtol=2e-3, atol=2e-3
    )

    # One explicit-Adam step from zero moments == one keras-Adam step.
    state = adam_init(g["Q"].shape)
    state, delta = adam_update(
        state, jnp.asarray(g["grad_clipped"]), float(g["learning_rate"]),
        0.9, 0.999, 1e-8,
    )
    q_after = np.asarray(jnp.asarray(g["Q"]) - delta)
    np.testing.assert_allclose(q_after, g["q_after_adam"], rtol=1e-4, atol=1e-5)


def test_rpgd_surgery_parity(g):
    """Resample-tick population + Adam moment surgery must match the
    reference's eager TF weight surgery recorded on fixed inputs
    (optimizer_rpgd.py:449-513)."""
    from control_toolkit_tpu.optimizers.rpgd import (
        rpgd_keep_surgery, rpgd_resample_surgery,
    )

    best_idx = np.asarray(elite_indices(jnp.asarray(g["rpgd_costs"]),
                                        int(g["rpgd_keep_k"])))
    np.testing.assert_array_equal(best_idx, g["rpgd_best_idx"])

    Q_new, m_new, v_new, ages_new = rpgd_resample_surgery(
        jnp.asarray(g["rpgd_Qn"]), jnp.asarray(g["rpgd_m"]),
        jnp.asarray(g["rpgd_v"]), jnp.asarray(g["rpgd_ages"]),
        jnp.asarray(best_idx), jnp.asarray(g["rpgd_Qres"]),
    )
    np.testing.assert_array_equal(np.asarray(Q_new), g["rpgd_Q_after"])
    np.testing.assert_array_equal(np.asarray(ages_new), g["rpgd_ages_after"])
    np.testing.assert_array_equal(np.asarray(m_new), g["rpgd_m_after"])
    np.testing.assert_array_equal(np.asarray(v_new), g["rpgd_v_after"])

    m_s, v_s = rpgd_keep_surgery(jnp.asarray(g["rpgd_m"]), jnp.asarray(g["rpgd_v"]))
    np.testing.assert_array_equal(np.asarray(m_s), g["rpgd_m_shift"])
    np.testing.assert_array_equal(np.asarray(v_s), g["rpgd_v_shift"])


def test_cem_gmm_clustering_parity(g):
    """Elite clustering to the Frobenius-nearest of the top-2 + component
    refit must match the reference's tfp-based path recorded on fixed
    elites (optimizer_cem_gmm_tf.py:73-90)."""
    from control_toolkit_tpu.optimizers.cem_gmm import gmm_cluster_refit

    mue, std, probs = gmm_cluster_refit(
        jnp.asarray(g["gmm_elites"]), float(g["gmm_std_min"])
    )
    np.testing.assert_allclose(np.asarray(mue), g["gmm_mue"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(std), g["gmm_std"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(probs[0]), float(g["gmm_prob1"]), atol=1e-6)


# ---------------------------------------------------------- closed loop
CL_GOLDEN = Path(__file__).parent / "golden" / "cartpole_closed_loop_golden.npz"


def test_closed_loop_trace_parity():
    """T-step closed-loop MPPI vs the recorded TF loop (SURVEY §7 hard
    part 3): identical injected noise -> the full loop composition (shift ->
    interpolate -> rollout+cost+correction -> softmax update -> plant
    advance) must reproduce the TF state/control trace."""
    from control_toolkit_tpu.ops.interpolation import Interpolator
    from control_toolkit_tpu.optimizers.mppi import (
        make_correction_cost, make_reward_weighted_average,
    )

    assert CL_GOLDEN.is_file(), (
        "closed-loop golden missing — run "
        "tests/golden/generate_closed_loop_golden.py with TF and commit"
    )
    g = np.load(CL_GOLDEN)
    eps = jnp.asarray(g["eps"])                      # [T, K, P, U]
    T, K, P, U = eps.shape
    H = int(g["horizon"])
    dt = float(g["dt"])

    pred = ODEPredictor("cartpole", dt=dt)
    cf = CartpoleQuadraticCost()
    params = cf.current_params({"target_position": jnp.float32(float(g["target"]))})
    interp = Interpolator.build(H, int(g["period"]))
    correction = make_correction_cost(float(g["cc_weight"]), float(g["R"]),
                                      float(g["NU"]))
    rwa = make_reward_weighted_average(float(g["lbd"]))

    s = jnp.asarray(g["s0"])
    u_nom = jnp.zeros((H, U), jnp.float32)
    u_prev = jnp.zeros((U,), jnp.float32)
    states, controls = [], []
    for t in range(T):
        u_nom = jnp.concatenate([u_nom[1:], u_nom[-1:]], axis=0)
        delta = interp.interpolate(eps[t])           # [K, H, U]
        u_run = jnp.clip(u_nom[None] + delta, -1.0, 1.0)
        traj = pred.rollout(jnp.tile(s[None], (K, 1)), u_run)
        total = cf.get_trajectory_cost(traj, u_run, u_prev, params) \
            + correction(u_run, delta)
        u_nom = jnp.clip(u_nom + rwa(total, delta), -1.0, 1.0)
        u = u_nom[0]
        states.append(np.asarray(s))
        controls.append(np.asarray(u))
        s = pred.rollout(s[None], u[None, None, :])[0, 1]
        u_prev = u

    np.testing.assert_allclose(np.stack(states), g["states"],
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.stack(controls), g["controls"],
                               rtol=2e-3, atol=2e-3)


# ------------------------------------------------------- Keras net parity
NET_GOLDEN = Path(__file__).parent / "golden" / "net_golden.npz"


def test_gru_cell_matches_keras():
    """Our GRU cell computes the SAME function as the reference's Keras GRU
    (reset_after=True v2 semantics — gate order remapped in the fixture)."""
    from control_toolkit_tpu.models import networks as nets

    g = np.load(NET_GOLDEN)
    params = {"cell0": {k: jnp.asarray(g[f"gru_{k}"]) for k in
                        ("wi", "wh", "bi", "bh")},
              "wo": jnp.eye(g["gru_wh"].shape[0], dtype=jnp.float32),
              "bo": jnp.zeros((g["gru_wh"].shape[0],), jnp.float32)}
    x_seq = jnp.asarray(g["x_seq"])          # [B, T, I]
    B, T, _ = x_seq.shape
    H = g["gru_wh"].shape[0]
    hs = (jnp.zeros((B, H), jnp.float32),)
    outs = []
    for t in range(T):
        h, hs = nets.gru_apply(params, x_seq[:, t, :], hs)
        outs.append(h)
    ours = np.stack([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(ours, g["gru_h_seq"], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(hs[0]), g["gru_h_last"],
                               rtol=2e-5, atol=2e-5)


def test_lstm_cell_matches_keras():
    from control_toolkit_tpu.models import networks as nets

    g = np.load(NET_GOLDEN)
    H = g["lstm_wh"].shape[0]
    params = {"cell0": {k: jnp.asarray(g[f"lstm_{k}"]) for k in
                        ("wi", "wh", "bi", "bh")},
              "wo": jnp.eye(H, dtype=jnp.float32),
              "bo": jnp.zeros((H,), jnp.float32)}
    x_seq = jnp.asarray(g["x_seq"])
    B, T, _ = x_seq.shape
    hs = (jnp.zeros((B, 2 * H), jnp.float32),)
    outs = []
    for t in range(T):
        h, hs = nets.lstm_apply(params, x_seq[:, t, :], hs)
        outs.append(h)
    ours = np.stack([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(ours, g["lstm_h_seq"], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(hs[0][:, :H]), g["lstm_h_last"],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(hs[0][:, H:]), g["lstm_c_last"],
                               rtol=2e-5, atol=2e-5)


def test_mlp_matches_keras_dense():
    from control_toolkit_tpu.models import networks as nets

    g = np.load(NET_GOLDEN)
    params = {k[len("mlp_"):]: jnp.asarray(g[k]) for k in g.files
              if k.startswith("mlp_")}
    out = nets.mlp_apply(params, jnp.asarray(g["x_flat"]))
    np.testing.assert_allclose(np.asarray(out), g["mlp_out"],
                               rtol=2e-5, atol=2e-5)
