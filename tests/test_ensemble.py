"""Probabilistic-ensemble predictor (PETS-style): training, trajectory
sampling semantics, and MPC over the learned ensemble."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.environments.cartpole import CartpoleEnv
from control_toolkit_tpu.models import networks as nets
from control_toolkit_tpu.models.ensemble_predictor import (
    EnsemblePredictor,
    ensemble_checkpoint_name,
)
from control_toolkit_tpu.models.neural_predictor import NeuralPredictor
from control_toolkit_tpu.models.training import (
    collect_transitions,
    fit_ensemble_mlp_dynamics,
)


def _constant_members(consts, S=2, U=1):
    """Hand-built ensemble params: member e predicts x_{t+1} = x + c_e
    (zero weights, output bias c_e)."""
    E = len(consts)
    sizes = [S + U, 4, S]
    params = {}
    for i, (fi, fo) in enumerate(zip(sizes[:-1], sizes[1:])):
        params[f"w{i}"] = jnp.zeros((E, fi, fo), jnp.float32)
        params[f"b{i}"] = jnp.zeros((E, fo), jnp.float32)
    params["b1"] = jnp.stack(
        [jnp.full((S,), c, jnp.float32) for c in consts]
    )
    return params


@pytest.fixture(scope="module")
def ens_fit(tmp_path_factory):
    env = CartpoleEnv(batch_size=16, dt=0.02, seed=0)
    x, u, xn = collect_transitions(env, 400, seed=0)
    params, mses = fit_ensemble_mlp_dynamics(
        x, u, xn, n_members=4, hiddens=(32, 32), epochs=2500, seed=0
    )
    d = tmp_path_factory.mktemp("ens")
    path = d / ensemble_checkpoint_name("mlp-32-32", 4)
    nets.save_net(path, params, meta={"predict_delta": True, "n_members": 4})
    return params, mses, str(d)


def test_ensemble_fit_quality_and_diversity(ens_fit):
    params, mses, _ = ens_fit
    assert mses.shape == (4,)
    assert np.all(mses < 5e-2), f"ensemble members fit poorly: {mses}"
    # Bootstrap + independent inits must produce distinct members.
    w0 = np.asarray(params["w0"])
    for e in range(1, 4):
        assert not np.allclose(w0[0], w0[e]), "members collapsed to one net"


def test_e1_matches_single_neural_predictor():
    """An E=1 ensemble is exactly the single-net predictor."""
    single = NeuralPredictor(
        "cartpole", dt=0.02, net_name="mlp-16", seed=3, predict_delta=True
    )
    stacked = jax.tree_util.tree_map(lambda w: w[None], single.net_params)
    ens = EnsemblePredictor(
        "cartpole", dt=0.02, net_name="mlp-16", n_members=1, params=stacked
    )
    s0 = np.random.default_rng(0).normal(size=(8, 4)).astype(np.float32)
    Q = np.random.default_rng(1).normal(size=(8, 12, 1)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ens.rollout(s0, Q)),
        np.asarray(single.rollout(s0, Q)),
        rtol=1e-6, atol=1e-6,
    )


def test_tsinf_blockwise_assignment():
    """K divisible by E: block e of K/E rollouts scans under member e."""
    params = _constant_members([1.0, -2.0])
    ens = EnsemblePredictor(
        net_name="mlp-4", n_members=2, num_states=2, num_control_inputs=1,
        params=params,
    )
    s0 = np.zeros((4, 2), np.float32)
    Q = np.zeros((4, 3, 1), np.float32)
    traj = np.asarray(ens.rollout(s0, Q))
    # First block: +1 per step; second block: -2 per step.
    np.testing.assert_allclose(traj[0], traj[1])
    np.testing.assert_allclose(traj[2], traj[3])
    np.testing.assert_allclose(traj[0, -1], np.full(2, 3.0), atol=1e-6)
    np.testing.assert_allclose(traj[2, -1], np.full(2, -6.0), atol=1e-6)


def test_mean_fallback_for_odd_batches():
    """Batch sizes that don't split over members (incl. the batch-1 nominal
    replay) use the ensemble-mean dynamics."""
    params = _constant_members([1.0, -2.0])
    ens = EnsemblePredictor(
        net_name="mlp-4", n_members=2, num_states=2, num_control_inputs=1,
        params=params,
    )
    for K in (1, 3):
        traj = np.asarray(
            ens.rollout(np.zeros((K, 2), np.float32), np.zeros((K, 3, 1), np.float32))
        )
        np.testing.assert_allclose(
            traj[:, -1], np.full((K, 2), 3 * (1.0 - 2.0) / 2), atol=1e-6
        )


def test_ts1_mixes_members_deterministically():
    params = _constant_members([1.0, -2.0])
    ens = EnsemblePredictor(
        net_name="mlp-4", n_members=2, num_states=2, num_control_inputs=1,
        params=params, ts="1",
    )
    s0 = np.zeros((4, 2), np.float32)
    Q = np.zeros((4, 8, 1), np.float32)
    traj = np.asarray(ens.rollout(s0, Q))
    incs = np.diff(traj[:, :, 0], axis=1)  # per-step increments, [K, H]
    # Every step uses one of the two members...
    assert np.all(np.isclose(incs, 1.0, atol=1e-5) | np.isclose(incs, -2.0, atol=1e-5))
    # ...and the hash actually mixes them across (rollout, step).
    assert np.any(np.isclose(incs, 1.0, atol=1e-5))
    assert np.any(np.isclose(incs, -2.0, atol=1e-5))
    # Deterministic: same inputs -> same trajectory.
    np.testing.assert_allclose(traj, np.asarray(ens.rollout(s0, Q)))


def test_disagreement_orders_uncertainty():
    """Identical members -> zero disagreement; distinct members -> positive."""
    same = _constant_members([0.5, 0.5])
    diff = _constant_members([1.0, -2.0])
    s0 = np.zeros((4, 2), np.float32)
    Q = np.zeros((4, 5, 1), np.float32)
    kw = dict(net_name="mlp-4", n_members=2, num_states=2, num_control_inputs=1)
    d_same = np.asarray(EnsemblePredictor(params=same, **kw).disagreement(s0, Q))
    d_diff = np.asarray(EnsemblePredictor(params=diff, **kw).disagreement(s0, Q))
    assert d_same.shape == (4,)
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    assert np.all(d_diff > 0.1)


def test_checkpoint_roundtrip_via_spec(ens_fit):
    params, _, d = ens_fit
    from control_toolkit_tpu.models.predictors import PredictorWrapper

    pw = PredictorWrapper()
    pw.configure(
        dt=0.02, environment_name="cartpole",
        predictor_specification=f"ensemble:mlp-32-32:4:{d}",
    )
    assert isinstance(pw.predictor, EnsemblePredictor)
    assert pw.num_states == 4 and pw.num_control_inputs == 1
    direct = EnsemblePredictor("cartpole", dt=0.02, net_name="mlp-32-32",
                               n_members=4, params=params)
    s0 = np.random.default_rng(2).normal(size=(8, 4)).astype(np.float32) * 0.1
    Q = np.random.default_rng(3).normal(size=(8, 10, 1)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(pw.rollout(s0, Q)), np.asarray(direct.rollout(s0, Q)),
        rtol=1e-6, atol=1e-6,
    )


def test_pets_mpc_stabilizes_cartpole(ens_fit):
    """PETS = CEM planning over the bootstrap ensemble with trajectory
    sampling: the learned model controls the real cartpole."""
    _, _, d = ens_fit
    ctrl = MPCController(
        "cartpole",
        (np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        {"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name="mppi",
        predictor_specification=f"ensemble:mlp-32-32:4:{d}",
        optimizer_config={"seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 20,
                          "num_rollouts": 256, "cc_weight": 1.0, "R": 1.0,
                          "LBD": 100.0, "NU": 1000.0, "SQRTRHOINV": 0.05,
                          "period_interpolation_inducing_points": 5},
    )
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=5)
    s, _ = env.reset()
    for _ in range(60):
        u = ctrl.step(s[0])
        s, *_ = env.step(u)
    assert abs(float(s[0, 2])) < 0.35, f"PETS-style MPC failed: {s[0]}"


def test_gradient_optimizer_over_ensemble(ens_fit):
    """AD flows through the member-vmapped fused scan: RPGD plans over the
    ensemble and returns finite controls."""
    _, _, d = ens_fit
    ctrl = MPCController(
        "cartpole",
        (np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        {"target_position": 0.0},
        config={"optimizer": "rpgd-tf", "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name="rpgd-tf",
        predictor_specification=f"ensemble:mlp-32-32:4:{d}",
        optimizer_config={"seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 15,
                          "num_rollouts": 16, "outer_its": 2,
                          "sample_stdev": 0.3, "sample_mean": 0.0,
                          "sample_whole_control_space": False,
                          "uniform_dist_min": -1.0, "uniform_dist_max": 1.0,
                          "resamp_per": 5, "opt_keep_k_ratio": 0.25,
                          "learning_rate": 0.05, "gradmax_clip": 5.0,
                          "period_interpolation_inducing_points": 5,
                          "SAMPLING_DISTRIBUTION": "normal",
                          "warmup": False, "warmup_iterations": 0},
    )
    s = np.array([0.0, 0.0, 0.05, 0.0], np.float32)
    for _ in range(3):
        u = ctrl.step(s)
        assert np.all(np.isfinite(u))


def _mk_mppi_ens(d, risk_weight=0.0, logging=True, seed=1):
    ctrl = MPCController(
        "cartpole",
        (np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        {"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": logging},
    )
    ctrl.configure(
        optimizer_name="mppi",
        predictor_specification=f"ensemble:mlp-32-32:4:{d}",
        optimizer_config={"seed": seed, "mpc_timestep": 0.02, "mpc_horizon": 12,
                          "num_rollouts": 64, "cc_weight": 1.0, "R": 1.0,
                          "LBD": 100.0, "NU": 1000.0, "SQRTRHOINV": 0.05,
                          "period_interpolation_inducing_points": 4,
                          "risk_weight": risk_weight},
    )
    return ctrl


def test_risk_weight_adds_disagreement_penalty(ens_fit):
    """J under risk_weight=w equals J under w=0 plus w * disagreement of the
    SAME sampled plans (same seed, first step from reset)."""
    _, _, d = ens_fit
    s = np.array([0.1, 0.0, 0.15, 0.0], np.float32)
    c0 = _mk_mppi_ens(d, risk_weight=0.0)
    c2 = _mk_mppi_ens(d, risk_weight=2.0)
    c0.step(s); c2.step(s)
    J0 = np.asarray(c0.optimizer.logging_values["J_logged"])
    J2 = np.asarray(c2.optimizer.logging_values["J_logged"])
    Q0 = np.asarray(c0.optimizer.logging_values["Q_logged"])
    Q2 = np.asarray(c2.optimizer.logging_values["Q_logged"])
    np.testing.assert_allclose(Q0, Q2, atol=1e-6)  # same seed, same samples
    ens = c0.predictor.predictor
    s_tiled = np.tile(s[None], (Q0.shape[0], 1))
    dis = np.asarray(ens.disagreement(s_tiled, Q0))
    np.testing.assert_allclose(J2 - J0, 2.0 * dis, rtol=2e-4, atol=2e-5)


def test_risk_weight_requires_disagreement():
    ctrl = MPCController(
        "cartpole",
        (np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        {"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    with pytest.raises(ValueError, match="disagreement"):
        ctrl.configure(
            optimizer_name="mppi",
            predictor_specification="ODE",
            optimizer_config={"seed": 1, "mpc_timestep": 0.02,
                              "mpc_horizon": 10, "num_rollouts": 32,
                              "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
                              "NU": 1000.0, "SQRTRHOINV": 0.1,
                              "period_interpolation_inducing_points": 5,
                              "risk_weight": 1.0},
        )


def test_risk_weight_gradient_path(ens_fit):
    """Gradient optimizers descend the (differentiable) disagreement
    penalty too: RPGD with risk_weight returns finite controls."""
    _, _, d = ens_fit
    ctrl = MPCController(
        "cartpole",
        (np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        {"target_position": 0.0},
        config={"optimizer": "rpgd-tf", "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name="rpgd-tf",
        predictor_specification=f"ensemble:mlp-32-32:4:{d}",
        optimizer_config={"seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 12,
                          "num_rollouts": 16, "outer_its": 2,
                          "sample_stdev": 0.3, "sample_mean": 0.0,
                          "sample_whole_control_space": False,
                          "uniform_dist_min": -1.0, "uniform_dist_max": 1.0,
                          "resamp_per": 5, "opt_keep_k_ratio": 0.25,
                          "learning_rate": 0.05, "gradmax_clip": 5.0,
                          "period_interpolation_inducing_points": 4,
                          "SAMPLING_DISTRIBUTION": "normal",
                          "warmup": False, "warmup_iterations": 0,
                          "risk_weight": 0.5},
    )
    s = np.array([0.0, 0.0, 0.05, 0.0], np.float32)
    for _ in range(3):
        u = ctrl.step(s)
        assert np.all(np.isfinite(u))


@pytest.mark.slow
def test_closed_loop_harness_over_ensemble(ens_fit):
    """The on-device closed-loop harness (one jitted scan) composes with
    the ensemble predictor: run + run_batch produce finite, stabilizing
    episodes (generic scan path — the predictor is an opaque rollout)."""
    from control_toolkit_tpu.evaluation import ClosedLoop

    _, _, d = ens_fit
    ctrl = MPCController(
        "cartpole",
        (np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        {"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name="mppi",
        predictor_specification=f"ensemble:mlp-32-32:4:{d}",
        optimizer_config={"seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 20,
                          "num_rollouts": 256, "cc_weight": 1.0, "R": 1.0,
                          "LBD": 100.0, "NU": 1000.0, "SQRTRHOINV": 0.05,
                          "period_interpolation_inducing_points": 5},
    )
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=3)
    loop = ClosedLoop(ctrl, env)
    out = loop.run(np.array([0.0, 0.0, 0.15, 0.0], np.float32), ticks=30)
    states = np.asarray(out["states"])
    assert np.all(np.isfinite(states))
    assert abs(float(states[-1, 2])) < 0.4

    s0s = np.tile(np.array([0.0, 0.0, 0.12, 0.0], np.float32), (4, 1))
    batch = loop.run_batch(s0s, ticks=20)
    assert np.asarray(batch["final_states"]).shape == (4, 4)
    assert np.all(np.isfinite(np.asarray(batch["final_states"])))
    assert np.all(np.isfinite(np.asarray(batch["mean_costs"])))


@pytest.mark.slow
def test_icem_over_ensemble_is_pets(ens_fit):
    """iCEM + bootstrap ensemble + TS-inf = the canonical PETS planner;
    rides the same _make_cost_only path (ensemble kernel on TPU)."""
    _, _, d = ens_fit
    ctrl = MPCController(
        "cartpole",
        (np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        {"target_position": 0.0},
        config={"optimizer": "icem", "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name="icem",
        predictor_specification=f"ensemble:mlp-32-32:4:{d}",
        optimizer_config={"seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 20,
                          "num_rollouts": 128, "cem_outer_it": 2,
                          "cem_best_k": 16,
                          "icem_colored_noise_beta": 2.0,
                          "icem_keep_elites_frac": 0.3},
    )
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=5)
    s, _ = env.reset()
    for _ in range(50):
        u = ctrl.step(s[0])
        assert np.all(np.isfinite(u))
        s, *_ = env.step(u)
    assert abs(float(s[0, 2])) < 0.4, f"iCEM-PETS failed: {s[0]}"


def test_batched_sessions_over_ensemble(ens_fit):
    """BatchedMPC fleets compose with the ensemble predictor through the
    generic vmapped path: slot == scalar controller with the slot's key."""
    from control_toolkit_tpu.controllers.batched_mpc import BatchedMPCController

    _, _, d = ens_fit
    cfg = {"seed": 11, "mpc_timestep": 0.02, "mpc_horizon": 8,
           "num_rollouts": 32, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
           "NU": 1000.0, "SQRTRHOINV": 0.05,
           "period_interpolation_inducing_points": 4}
    limits = (np.array([-1.0], np.float32), np.array([1.0], np.float32))
    spec = f"ensemble:mlp-32-32:4:{d}"
    B = 3

    batched = BatchedMPCController(
        environment_name="cartpole", control_limits=limits,
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    batched.configure(optimizer_name="mppi", optimizer_config=cfg,
                      predictor_specification=spec, num_slots=B)

    single = MPCController(
        environment_name="cartpole", control_limits=limits,
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    scfg = dict(cfg); scfg["force_scan"] = True
    single.configure(optimizer_name="mppi", optimizer_config=scfg,
                     predictor_specification=spec)
    slot = 1
    single.optimizer.opt_state = single.optimizer._init_state(
        batched.slot_key(slot)
    )

    s = np.array([0.1, 0.0, 0.2, -0.1], np.float32)
    s_batch = np.tile(s, (B, 1))
    for _ in range(3):
        u_b = batched.step_batch(s_batch)
        u_s = single.step(s)
        np.testing.assert_allclose(
            np.asarray(u_b[slot]).ravel(), np.asarray(u_s).ravel(),
            rtol=2e-5, atol=2e-6,
        )
        assert np.all(np.isfinite(np.asarray(u_b)))


# ------------------------------------------------------- probabilistic (PE)
def _constant_prob_members(mean_consts, lv_raw, S=2, U=1):
    """Members with zero weights, output bias = [mean_c..., lv_raw...]:
    predict delta-mean c and a constant raw log-variance head."""
    E = len(mean_consts)
    sizes = [S + U, 4, 2 * S]
    params = {}
    for i, (fi, fo) in enumerate(zip(sizes[:-1], sizes[1:])):
        params[f"w{i}"] = jnp.zeros((E, fi, fo), jnp.float32)
        params[f"b{i}"] = jnp.zeros((E, fo), jnp.float32)
    params["b1"] = jnp.stack([
        jnp.concatenate([jnp.full((S,), c, jnp.float32),
                         jnp.full((S,), lv_raw, jnp.float32)])
        for c in mean_consts
    ])
    return params


def test_bound_logvar_band():
    from control_toolkit_tpu.models.ensemble_predictor import bound_logvar

    raw = jnp.linspace(-50.0, 50.0, 101)
    lv = np.asarray(bound_logvar(raw))
    assert np.all(lv > -8.001) and np.all(lv < 2.001)
    assert np.all(np.diff(lv) >= 0)  # monotone squash
    # Near-identity in the interior (softplus squash costs ~0.13 at 0).
    np.testing.assert_allclose(
        np.asarray(bound_logvar(jnp.zeros(1))), 0.0, atol=0.2
    )


def test_counter_normal_is_standard_normal_and_deterministic():
    from control_toolkit_tpu.models.ensemble_predictor import counter_normal

    rows = jnp.arange(8192)
    z = np.asarray(counter_normal(rows, 3, 4, seed=0))
    assert z.shape == (8192, 4)
    assert abs(z.mean()) < 0.03
    assert abs(z.std() - 1.0) < 0.03
    z2 = np.asarray(counter_normal(rows, 3, 4, seed=0))
    np.testing.assert_array_equal(z, z2)
    z3 = np.asarray(counter_normal(rows, 4, 4, seed=0))
    assert not np.allclose(z, z3)  # step decorrelates


def test_probabilistic_rollout_propagates_aleatoric_noise():
    """Constant Gaussian heads: one-step increments across many rollouts
    have the head's mean and std (TS-inf blockwise)."""
    from control_toolkit_tpu.models.ensemble_predictor import bound_logvar

    lv_raw = -2.0
    params = _constant_prob_members([0.3, 0.3], lv_raw)
    ens = EnsemblePredictor(
        net_name="mlp-4", n_members=2, num_states=2, num_control_inputs=1,
        params=params, probabilistic=True,
    )
    assert ens.single_step is None  # cost paths must take the noisy rollout
    K, H = 1024, 8
    traj = np.asarray(ens.rollout(np.zeros((K, 2), np.float32),
                                  np.zeros((K, H, 1), np.float32)))
    incs = np.diff(traj, axis=1)  # [K, H, S]
    want_std = float(np.exp(0.5 * np.asarray(bound_logvar(jnp.array(lv_raw)))))
    assert abs(incs.mean() - 0.3) < 0.01
    assert abs(incs.std() - want_std) < 0.02
    # Deterministic: same inputs -> same sampled trajectories.
    np.testing.assert_array_equal(
        traj, np.asarray(ens.rollout(np.zeros((K, 2), np.float32),
                                     np.zeros((K, H, 1), np.float32))))
    # Batch-1 replay: noise-free expected model.
    one = np.asarray(ens.rollout(np.zeros((1, 2), np.float32),
                                 np.zeros((1, 4, 1), np.float32)))
    np.testing.assert_allclose(np.diff(one, axis=1), 0.3, atol=1e-6)


@pytest.mark.slow
def test_nll_fit_learns_heteroscedastic_noise():
    """NLL training recovers input-dependent noise: the learned std is
    much larger in the high-noise input regime."""
    from control_toolkit_tpu.models.training import fit_ensemble_mlp_dynamics

    rng = np.random.default_rng(0)
    n = 4000
    x = rng.uniform(-1, 1, (n, 1)).astype(np.float32)
    u = rng.uniform(-1, 1, (n, 1)).astype(np.float32)
    noise_std = np.where(u > 0, 0.5, 0.02).astype(np.float32)
    x_next = x + 0.1 * u + noise_std * rng.standard_normal((n, 1)).astype(np.float32)

    params, mses = fit_ensemble_mlp_dynamics(
        x, u, x_next, n_members=2, hiddens=(16,), epochs=2000, seed=0,
        probabilistic=True,
    )
    ens = EnsemblePredictor(
        net_name="mlp-16", n_members=2, num_states=1, num_control_inputs=1,
        params=params, probabilistic=True,
    )
    net0 = jax.tree_util.tree_map(lambda w: w[0], params)
    xq = jnp.zeros((64, 1), jnp.float32)
    _, std_hi = ens._member_heads(net0, xq, jnp.full((64, 1), 0.8, jnp.float32))
    _, std_lo = ens._member_heads(net0, xq, jnp.full((64, 1), -0.8, jnp.float32))
    hi, lo = float(np.mean(np.asarray(std_hi))), float(np.mean(np.asarray(std_lo)))
    assert hi > 3 * lo, f"heteroscedastic std not learned: hi={hi} lo={lo}"
    assert hi > 0.25 and lo < 0.15


@pytest.mark.slow
def test_pe_mpc_stabilizes_cartpole():
    """MPC over a probabilistic (PE-TS) ensemble controls the real plant;
    the kernel gate routes the noisy rollout to the scan path."""
    from control_toolkit_tpu.models.training import (
        collect_transitions as _ct,
        fit_ensemble_mlp_dynamics as _fit,
    )

    env = CartpoleEnv(batch_size=16, dt=0.02, seed=0)
    x, u, xn = _ct(env, 400, seed=0)
    params, _ = _fit(x, u, xn, n_members=2, hiddens=(32, 32), epochs=2500,
                     seed=0, probabilistic=True)
    ctrl = MPCController(
        "cartpole",
        (np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        {"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name="mppi",
        predictor_specification="ensemble:mlp-32-32:2:prob",
        predictor_config={"params": params},
        optimizer_config={"seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 20,
                          "num_rollouts": 256, "cc_weight": 1.0, "R": 1.0,
                          "LBD": 100.0, "NU": 1000.0, "SQRTRHOINV": 0.05,
                          "period_interpolation_inducing_points": 5},
    )
    opt = ctrl.optimizer
    assert opt.predictor.predictor.probabilistic
    assert not opt._pallas_ensemble_compatible_model() or \
        __import__("jax").default_backend() != "tpu"
    plant = CartpoleEnv(batch_size=1, dt=0.02, seed=5)
    s, _ = plant.reset()
    for _ in range(60):
        uu = ctrl.step(s[0])
        s, *_ = plant.step(uu)
    assert abs(float(s[0, 2])) < 0.35, f"PE-TS MPC failed: {s[0]}"


# ---------------------------------------------------------- robust_eval
def test_robust_aggregation_matches_manual():
    """_robust_aggregate arithmetic: mean / elementwise-worst / cvar
    fraction over the member axis."""
    from control_toolkit_tpu.optimizers.random_action import (
        RandomActionOptimizer,
    )

    ens = EnsemblePredictor(
        net_name="mlp-4", n_members=4, num_states=2, num_control_inputs=1,
        params=_constant_members([1.0, -2.0, 0.5, -0.5]),
    )

    def mk(mode):
        return RandomActionOptimizer(
            predictor=ens, cost_function=None,
            control_limits=(np.array([-1.0], np.float32),
                            np.array([1.0], np.float32)),
            num_rollouts=8, mpc_horizon=5, seed=0, robust_eval=mode,
        )

    mc = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(mk("mean")._robust_aggregate(mc)), np.asarray(mc).mean(0),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mk("worst")._robust_aggregate(mc)),
        np.asarray(mc).max(0), rtol=1e-6)
    # cvar:0.5 with E=4 -> mean of the worst 2 per plan
    arr = np.sort(np.asarray(mc), axis=0)[-2:].mean(0)
    np.testing.assert_allclose(
        np.asarray(mk("cvar:0.5")._robust_aggregate(mc)), arr, rtol=1e-6)


def test_robust_eval_requires_ensemble_and_validates_mode(ens_fit):
    _, _, d = ens_fit
    ctrl = MPCController(
        "cartpole",
        (np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        {"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    with pytest.raises(ValueError, match="rollout_all_members"):
        ctrl.configure(
            optimizer_name="mppi", predictor_specification="ODE",
            optimizer_config={"seed": 1, "mpc_timestep": 0.02,
                              "mpc_horizon": 10, "num_rollouts": 32,
                              "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
                              "NU": 1000.0, "SQRTRHOINV": 0.1,
                              "period_interpolation_inducing_points": 5,
                              "robust_eval": "worst"},
        )
    with pytest.raises(ValueError, match="robust_eval"):
        MPCController(
            "cartpole",
            (np.array([-1.0], np.float32), np.array([1.0], np.float32)),
            {"target_position": 0.0},
            config={"optimizer": "mppi", "controller_logging": False},
        ).configure(
            optimizer_name="mppi",
            predictor_specification=f"ensemble:mlp-32-32:4:{d}",
            optimizer_config={"seed": 1, "mpc_timestep": 0.02,
                              "mpc_horizon": 10, "num_rollouts": 32,
                              "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
                              "NU": 1000.0, "SQRTRHOINV": 0.1,
                              "period_interpolation_inducing_points": 5,
                              "robust_eval": "median"},
        )


@pytest.mark.slow
def test_robust_mpc_closed_loop_and_cost_ordering(ens_fit):
    """Min-max robust MPC over the learned ensemble stabilizes the real
    plant, and per-plan 'worst' J dominates 'mean' J on identical plans."""
    _, _, d = ens_fit

    def mk(mode):
        ctrl = MPCController(
            "cartpole",
            (np.array([-1.0], np.float32), np.array([1.0], np.float32)),
            {"target_position": 0.0},
            config={"optimizer": "mppi", "controller_logging": True},
        )
        ctrl.configure(
            optimizer_name="mppi",
            predictor_specification=f"ensemble:mlp-32-32:4:{d}",
            optimizer_config={"seed": 1, "mpc_timestep": 0.02,
                              "mpc_horizon": 20, "num_rollouts": 128,
                              "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
                              "NU": 1000.0, "SQRTRHOINV": 0.05,
                              "period_interpolation_inducing_points": 5,
                              "robust_eval": mode},
        )
        return ctrl

    s = np.array([0.0, 0.0, 0.12, 0.0], np.float32)
    c_mean, c_worst = mk("mean"), mk("worst")
    c_mean.step(s); c_worst.step(s)
    J_mean = np.asarray(c_mean.optimizer.logging_values["J_logged"])
    J_worst = np.asarray(c_worst.optimizer.logging_values["J_logged"])
    Q1 = np.asarray(c_mean.optimizer.logging_values["Q_logged"])
    Q2 = np.asarray(c_worst.optimizer.logging_values["Q_logged"])
    np.testing.assert_allclose(Q1, Q2, atol=1e-6)  # same seed -> same plans
    assert np.all(J_worst >= J_mean - 1e-5)

    env = CartpoleEnv(batch_size=1, dt=0.02, seed=5)
    s_run, _ = env.reset()
    ctrl = mk("worst")
    for _ in range(60):
        u = ctrl.step(s_run[0])
        s_run, *_ = env.step(u)
    assert abs(float(s_run[0, 2])) < 0.35, f"robust MPC failed: {s_run[0]}"


# ----------------------------------------------------- review regressions
def test_ts1_excluded_from_fused_cost_paths(ens_fit):
    """ts='1' predictors must not expose single_step: the fused scan would
    silently plan under TS-inf/mean semantics (review finding)."""
    _, _, d = ens_fit
    ctrl = MPCController(
        "cartpole",
        (np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        {"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name="mppi",
        predictor_specification=f"ensemble:mlp-32-32:4:{d}:ts1",
        optimizer_config={"seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 10,
                          "num_rollouts": 64, "cc_weight": 1.0, "R": 1.0,
                          "LBD": 100.0, "NU": 1000.0, "SQRTRHOINV": 0.05,
                          "period_interpolation_inducing_points": 5},
    )
    opt = ctrl.optimizer
    assert opt.predictor.predictor.ts == "1"
    assert opt.predictor.single_step is None
    assert opt._make_cost_only() is None  # trajectory path carries TS-1
    u = ctrl.step(np.array([0.0, 0.0, 0.1, 0.0], np.float32))
    assert np.all(np.isfinite(u))


def test_configure_rejects_indivisible_population(ens_fit):
    """K % E != 0 used to silently degrade the whole population to the
    ensemble-MEAN dynamics at E x the FLOPs (review finding)."""
    _, _, d = ens_fit
    ctrl = MPCController(
        "cartpole",
        (np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        {"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    with pytest.raises(ValueError, match="divide"):
        ctrl.configure(
            optimizer_name="mppi",
            predictor_specification=f"ensemble:mlp-32-32:4:{d}",
            optimizer_config={"seed": 1, "mpc_timestep": 0.02,
                              "mpc_horizon": 10, "num_rollouts": 50,
                              "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
                              "NU": 1000.0, "SQRTRHOINV": 0.05,
                              "period_interpolation_inducing_points": 5},
        )


def test_ts1_member_hash_is_not_round_robin():
    """Power-of-two E must still mix: without the _mix32 finalizer the
    member pattern degenerated to (k XOR t) mod E (review finding)."""
    params = _constant_members([1.0, 2.0, 3.0, 4.0], S=2)
    ens = EnsemblePredictor(
        net_name="mlp-4", n_members=4, num_states=2, num_control_inputs=1,
        params=params, ts="1",
    )
    K, H = 8, 16
    traj = np.asarray(ens.rollout(np.zeros((K, 2), np.float32),
                                  np.zeros((K, H, 1), np.float32)))
    members = np.rint(np.diff(traj[:, :, 0], axis=1)).astype(int)  # [K, H]
    # Not E-periodic in time for at least one rollout...
    assert any(
        not np.array_equal(members[k, :4], members[k, 4:8]) for k in range(K)
    ), "TS-1 member sequence is a rigid period-E round-robin"
    # ...and rollouts k and k+E see different member sequences.
    assert any(
        not np.array_equal(members[k], members[k + 4]) for k in range(4)
    ), "rollouts k and k+E share identical member sequences"
