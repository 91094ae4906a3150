"""Contract tests across the optimizer zoo + algorithm-specific checks."""
import numpy as np
import pytest

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.environments.cartpole import CartpoleEnv

BASE = {"seed": 11, "mpc_timestep": 0.02, "mpc_horizon": 12, "num_rollouts": 32}

OPTIMIZER_CONFIGS = {
    "random-action-tf": {},
    "cem-tf": {"cem_outer_it": 2, "cem_initial_action_stdev": 0.5,
               "cem_stdev_min": 0.01, "cem_best_k": 8,
               "warmup": False, "warmup_iterations": 5},
    "cem-naive-grad-tf": {"cem_outer_it": 1, "cem_initial_action_stdev": 0.5,
                          "cem_stdev_min": 0.1, "cem_best_k": 8,
                          "learning_rate": 0.1, "gradmax_clip": 10},
    "cem-gmm-tf": {"cem_outer_it": 2, "cem_initial_action_stdev": 0.5,
                   "cem_stdev_min": 0.01, "cem_best_k": 8},
    "icem-tf": {"cem_outer_it": 2, "cem_initial_action_stdev": 0.5,
                "cem_stdev_min": 0.01, "cem_best_k": 8,
                "icem_colored_noise_beta": 2.0,
                "icem_keep_elites_frac": 0.3,
                "icem_add_mean_sample": True},
    "cma-es-tf": {"cma_outer_it": 2, "cma_mu": 8,
                  "cma_initial_step_size": 0.3,
                  "cma_step_size_min": 0.01,
                  "cma_add_mean_sample": True},
    "cem-grad-bharadhwaj-tf": {"cem_outer_it": 2, "cem_best_k": 8,
                               "cem_initial_action_stdev": 2.0,
                               "cem_stdev_min": 1e-6, "learning_rate": 0.05,
                               "adam_beta_1": 0.9, "adam_beta_2": 0.999,
                               "adam_epsilon": 1e-8, "gradmax_clip": 5,
                               "warmup": False, "warmup_iterations": 5},
    "gradient-tf": {"gradient_steps": 3, "initial_action_stdev": 0.5,
                    "learning_rate": 0.05, "adam_beta_1": 0.9,
                    "adam_beta_2": 0.999, "adam_epsilon": 1e-7,
                    "gradmax_clip": 5, "rtol": 1e-3,
                    "warmup": False, "warmup_iterations": 5},
    "mppi": {"cc_weight": 1.0, "R": 1.0, "LBD": 100.0, "NU": 1000.0,
             "SQRTRHOINV": 0.03, "period_interpolation_inducing_points": 4},
    "mppi-var-tf": {"cc_weight": 1.0, "R": 1.0, "LBD_mc": 100.0,
                    "NU_mc": 1000.0, "SQRTRHOINV_mc": 0.03, "LR": 0.5,
                    "STDEV_min": 0.01, "STDEV_max": 10.0,
                    "max_grad_norm": 1000.0,
                    "period_interpolation_inducing_points": 4},
    "rpgd-tf": {"outer_its": 2, "SAMPLING_DISTRIBUTION": "uniform",
                "period_interpolation_inducing_points": 4,
                "learning_rate": 0.05, "adam_beta_1": 0.9, "adam_beta_2": 0.999,
                "adam_epsilon": 1e-8, "gradmax_clip": 5, "rtol": 1e-3,
                "opt_keep_k_ratio": 0.25, "resamp_per": 3,
                "sample_stdev": 0.5, "sample_mean": 0.0,
                "sample_whole_control_space": True,
                "uniform_dist_min": -1.0, "uniform_dist_max": 1.0,
                "shift_previous": 1, "warmup": False, "warmup_iterations": 5},
}


def make(name, logging=True, **extra):
    cfg = dict(BASE)
    cfg.update(OPTIMIZER_CONFIGS[name])
    cfg.update(extra)
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": name, "controller_logging": logging},
    )
    ctrl.configure(optimizer_name=name, optimizer_config=cfg)
    return ctrl


@pytest.mark.parametrize("name", sorted(OPTIMIZER_CONFIGS))
def test_step_contract(name):
    """Every optimizer: u in bounds, logging keys and shapes correct."""
    ctrl = make(name)
    s = np.array([0.0, 0.0, 0.15, 0.0], np.float32)
    for _ in range(2):
        u = ctrl.step(s)
    K, H = 32, 12
    assert u.shape == (1,)
    assert -1.0 - 1e-6 <= float(u[0]) <= 1.0 + 1e-6
    lv = ctrl.optimizer.logging_values
    assert lv["Q_logged"].shape == (K, H, 1)
    assert lv["J_logged"].shape == (K,)
    assert lv["rollout_trajectories_logged"].shape == (K, H + 1, 4)
    assert np.all(np.isfinite(lv["J_logged"]))
    assert np.all(np.isfinite(lv["Q_logged"]))


# The four heaviest gradient-family determinism params are slow-tier; the
# remaining zoo keeps seeded determinism covered by default (re-tier, r4).
_SLOW_DETERMINISM = {"cem-grad-bharadhwaj-tf", "cem-naive-grad-tf",
                     "gradient-tf", "rpgd-tf"}


@pytest.mark.parametrize("name", [
    pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_DETERMINISM else n
    for n in sorted(OPTIMIZER_CONFIGS)
])
def test_seeded_determinism(name):
    ctrl_a = make(name, logging=False)
    ctrl_b = make(name, logging=False)
    s = np.array([0.0, 0.0, -0.2, 0.1], np.float32)
    for _ in range(3):
        ua = ctrl_a.step(s)
        ub = ctrl_b.step(s)
    np.testing.assert_allclose(ua, ub, atol=1e-6)


@pytest.mark.parametrize("name", ["cem-tf", "gradient-tf", "rpgd-tf"])
def test_closed_loop_stabilization(name):
    """Optimizing methods hold the pole up from a small perturbation."""
    extra = {"num_rollouts": 64, "mpc_horizon": 20}
    # Vanilla CEM needs the reference's full default budget and is still the
    # weakest baseline (u = first action of a single sampled elite), so it
    # gets a looser bound.
    tol = 0.3
    if name == "cem-tf":
        extra.update({"num_rollouts": 200, "mpc_horizon": 35,
                      "cem_best_k": 40, "cem_outer_it": 3})
        tol = 0.45
    elif name == "gradient-tf":
        # reference default budget + warmup
        extra.update({"num_rollouts": 40, "mpc_horizon": 35,
                      "gradient_steps": 5, "warmup": True,
                      "warmup_iterations": 50})
    elif name == "rpgd-tf":
        extra.update({"mpc_horizon": 35, "outer_its": 3, "warmup": True,
                      "warmup_iterations": 50})
    ctrl = make(name, logging=False, **extra)
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=5)
    s, _ = env.reset()
    for _ in range(60):
        u = ctrl.step(s[0])
        s, *_ = env.step(u)
    assert abs(float(s[0, 2])) < tol, f"{name} failed to stabilize: {s[0]}"


def test_rpgd_trajectory_ages_and_resampling():
    ctrl = make("rpgd-tf")
    s = np.array([0.0, 0.0, 0.1, 0.0], np.float32)
    ages_seq = []
    for _ in range(7):
        ctrl.step(s)
        ages_seq.append(ctrl.optimizer.logging_values["trajectory_ages_logged"].copy())
    # step 0 logs the initial ages (all zero)
    assert np.all(ages_seq[0] == 0)
    # resamp_per=3: after steps at count 0 and 3, non-elite rows have been
    # reset, so logged ages at step 4 contain zeros+ones pattern
    K = 32
    keep_k = max(int(K * 0.25), 1)
    a4 = ages_seq[4]  # logged before increment at count=4; resample at count=3
    assert np.sum(a4 == 1.0) >= K - keep_k, f"expected resampled rows with age 1, got {a4}"
    # elites survive: some rows strictly older
    assert np.max(a4) > 1.0


def test_rpgd_elites_improve_cost():
    """The Adam steps must reduce the best trajectory cost over ticks."""
    ctrl = make("rpgd-tf", num_rollouts=64, mpc_horizon=20)
    s = np.array([0.0, 0.0, 0.3, 0.0], np.float32)
    first = None
    last = None
    for i in range(6):
        ctrl.step(s)
        J = ctrl.optimizer.logging_values["J_logged"]
        if i == 0:
            first = J.min()
        last = J.min()
    assert last <= first + 1e-3, f"RPGD did not improve: {first} -> {last}"


def test_gradient_adam_moments_shift():
    ctrl = make("gradient-tf")
    s = np.array([0.0, 0.0, 0.1, 0.0], np.float32)
    ctrl.step(s)
    st = ctrl.optimizer.opt_state
    # after one step the last horizon slot of m/v must be zero (shifted)
    assert np.allclose(np.asarray(st.adam.m)[:, -1, :], 0.0)
    assert np.allclose(np.asarray(st.adam.v)[:, -1, :], 0.0)
    assert int(st.adam.step) == 3  # gradient_steps per tick


def test_ilqr_step_contract():
    """iLQR is single-trajectory (K forced to 1) but honors the same
    logging-key contract."""
    cfg = {"seed": 3, "mpc_timestep": 0.02, "mpc_horizon": 12, "num_rollouts": 1,
           "max_iterations": 5, "tol": 1e-7, "regularization_init": 1.0,
           "regularization_max": 1e8, "line_search_steps": 4}
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "ilqr", "controller_logging": True},
    )
    ctrl.configure(optimizer_name="ilqr", optimizer_config=cfg)
    u = ctrl.step(np.array([0.0, 0.0, 0.15, 0.0], np.float32))
    assert ctrl.optimizer.num_rollouts == 1
    lv = ctrl.optimizer.logging_values
    assert lv["Q_logged"].shape == (1, 12, 1)
    assert lv["J_logged"].shape == (1,)
    assert lv["rollout_trajectories_logged"].shape == (1, 13, 4)
    assert -1.0 <= float(u[0]) <= 1.0


@pytest.mark.parametrize("name", ["mppi", "rpgd-tf"])
def test_calculate_optimal_trajectory(name):
    """The optional nominal-plan replay surfaces as optimal_trajectory
    (reference optimizer_mppi.py:199-202, optimizer_rpgd.py:518-521)."""
    cfg = dict(BASE)
    cfg.update(OPTIMIZER_CONFIGS[name])
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": name, "controller_logging": False,
                "calculate_optimal_trajectory": True},
    )
    ctrl.configure(optimizer_name=name, optimizer_config=cfg)
    ctrl.step(np.array([0.0, 0.0, 0.1, 0.0], np.float32))
    opt = ctrl.optimizer
    assert opt.optimal_trajectory is not None
    assert opt.optimal_trajectory.shape == (1, 13, 4)  # [1, H+1, S]
    if name == "rpgd-tf":
        assert opt.summed_stage_cost is not None
