"""Heuristic-policy warm start for the sampling/gradient zoo.

Reference FORCES seeds its NLP solve from a policy rollout
(optimizer_nlp_forces.py:261-279); the repo generalizes the same hook to
the sampling optimizers via ``Optimizer(initial_guess_policy=...)`` +
per-class ``_apply_policy_guess`` (optimizers/base.py).  iLQR keeps its
own richer mechanism (tests/test_ilqr.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_toolkit_tpu.models.dynamics import soa_to_aos
from control_toolkit_tpu.models.predictors import ODEPredictor
from control_toolkit_tpu.optimizers.cem import CEMOptimizer
from control_toolkit_tpu.optimizers.cem_gmm import CEMGMMOptimizer
from control_toolkit_tpu.optimizers.cma_es import CMAESOptimizer
from control_toolkit_tpu.optimizers.gradient import GradientOptimizer
from control_toolkit_tpu.optimizers.icem import ICEMOptimizer
from control_toolkit_tpu.optimizers.mppi import MPPIOptimizer
from control_toolkit_tpu.optimizers.rpgd import RPGDOptimizer

from tests.test_ilqr import QuadCost, make_double_integrator

H = 12


def lqr_policy(x, params):
    return jnp.asarray([-1.2 * x[0] - 1.9 * x[1]])


OPT_CONFIGS = {
    "mppi": (MPPIOptimizer, {
        "cc_weight": 1.0, "R": 1.0, "LBD": 100.0, "NU": 1000.0,
        "SQRTRHOINV": 0.1, "period_interpolation_inducing_points": 1,
    }),
    "cem": (CEMOptimizer, {
        "cem_outer_it": 2, "cem_initial_action_stdev": 0.5,
        "cem_stdev_min": 0.01, "cem_best_k": 8,
        "warmup": False, "warmup_iterations": 5,
    }),
    "icem": (ICEMOptimizer, {
        "cem_outer_it": 2, "cem_initial_action_stdev": 0.5,
        "cem_stdev_min": 0.01, "cem_best_k": 8,
        "icem_colored_noise_beta": 2.0, "icem_keep_elites_frac": 0.3,
        "icem_add_mean_sample": True,
    }),
    "cem-gmm": (CEMGMMOptimizer, {
        "cem_outer_it": 2, "cem_initial_action_stdev": 0.5,
        "cem_stdev_min": 0.01, "cem_best_k": 8,
    }),
    "cma": (CMAESOptimizer, {
        "cma_outer_it": 2, "cma_mu": 8, "cma_initial_step_size": 0.3,
        "cma_add_mean_sample": True,
    }),
    "rpgd": (RPGDOptimizer, {
        "outer_its": 2, "SAMPLING_DISTRIBUTION": "uniform",
        "period_interpolation_inducing_points": 1, "learning_rate": 0.05,
        "adam_beta_1": 0.9, "adam_beta_2": 0.999, "adam_epsilon": 1e-8,
        "gradmax_clip": 5, "rtol": 1e-3, "opt_keep_k_ratio": 0.25,
        "resamp_per": 3, "sample_stdev": 0.5, "sample_mean": 0.0,
        "sample_whole_control_space": True, "uniform_dist_min": -1.0,
        "uniform_dist_max": 1.0, "shift_previous": 1,
        "warmup": False, "warmup_iterations": 5,
    }),
    "gradient": (GradientOptimizer, {
        "gradient_steps": 3, "initial_action_stdev": 0.5,
        "learning_rate": 0.05, "adam_beta_1": 0.9, "adam_beta_2": 0.999,
        "adam_epsilon": 1e-7, "gradmax_clip": 5, "rtol": 1e-3,
        "warmup": False, "warmup_iterations": 5,
    }),
}


def build(name, policy):
    cls, cfg = OPT_CONFIGS[name]
    pred = make_double_integrator(0.1)
    opt = cls(
        predictor=pred, cost_function=QuadCost(),
        control_limits=(np.array([-5.0], np.float32),
                        np.array([5.0], np.float32)),
        optimizer_logging=False, seed=7, mpc_horizon=H, num_rollouts=32,
        initial_guess_policy=policy, **cfg,
    )
    opt.configure(num_states=2, num_control_inputs=1, dt=pred.dt)
    return opt


def expected_plan(opt, s):
    """Closed-loop policy rollout through the predictor, clipped — the
    plan _policy_plan must produce."""
    params = opt.default_params()
    x = jnp.asarray(s, jnp.float32)[None]
    us = []
    for _ in range(H):
        u = jnp.clip(jnp.reshape(lqr_policy(x[0], params), (1,)), -5.0, 5.0)
        us.append(u)
        x = opt.predictor.single_step(x, u[None], params["dyn"])
    return jnp.stack(us)


S0 = np.array([1.5, -0.5], np.float32)


@pytest.mark.parametrize("name", sorted(OPT_CONFIGS))
def test_guess_seeds_state_exactly(name):
    """The hook writes the policy rollout into the optimizer's warm-start
    slot (u_nom / dist_mue / population row 0) verbatim."""
    opt = build(name, lqr_policy)
    assert opt._policy_seed_pending
    params = opt.default_params()
    plan = opt._policy_plan()(jnp.asarray(S0)[None], params)
    np.testing.assert_allclose(
        np.asarray(plan), np.asarray(expected_plan(opt, S0)),
        rtol=1e-6, atol=1e-6,
    )
    seeded = opt._apply_policy_guess(opt.opt_state, plan)
    if name == "mppi":
        np.testing.assert_array_equal(np.asarray(seeded.u_nom[0]), np.asarray(plan))
    elif name == "cma":
        np.testing.assert_array_equal(
            np.asarray(seeded.mean.reshape(H, 1)), np.asarray(plan))
    elif name == "cem-gmm":
        np.testing.assert_array_equal(
            np.asarray(seeded.comp_mue),
            np.broadcast_to(np.asarray(plan), seeded.comp_mue.shape))
    elif name in ("cem", "icem"):
        np.testing.assert_array_equal(
            np.asarray(seeded.dist_mue[0]), np.asarray(plan))
        if name == "icem":
            np.testing.assert_array_equal(
                np.asarray(seeded.elites),
                np.broadcast_to(np.asarray(plan), seeded.elites.shape))
    else:  # rpgd / gradient: population row 0 + zeroed Adam moments
        np.testing.assert_array_equal(np.asarray(seeded.Q[0]), np.asarray(plan))
        assert float(jnp.abs(seeded.adam.m[0]).max()) == 0.0
        assert float(jnp.abs(seeded.adam.v[0]).max()) == 0.0
        np.testing.assert_array_equal(
            np.asarray(seeded.Q[1:]), np.asarray(opt.opt_state.Q[1:]))
        if name == "rpgd":
            assert float(seeded.trajectory_ages[0]) == 0.0


@pytest.mark.parametrize("name", sorted(OPT_CONFIGS))
def test_guess_changes_first_step_and_rearms(name):
    """Behavioral: the first post-reset step differs from the unseeded
    build (same seed), stays finite/bounded, and a reset re-arms the
    seeding for the next step."""
    opt_pol = build(name, lqr_policy)
    opt_mid = build(name, None)
    assert not opt_mid._policy_seed_pending

    u_pol = opt_pol.step(S0)
    u_mid = opt_mid.step(S0)
    assert not opt_pol._policy_seed_pending  # consumed
    assert np.all(np.isfinite(u_pol)) and np.all(np.isfinite(u_mid))
    assert np.all(np.abs(u_pol) <= 5.0 + 1e-6)
    assert not np.allclose(u_pol, u_mid)

    # Reset (as the NaN guard would) re-arms the warm start.
    opt_pol.optimizer_reset()
    assert opt_pol._policy_seed_pending
    u2 = opt_pol.step(S0)
    assert np.all(np.isfinite(u2))


def test_guess_requires_single_step_predictor():
    class NoStep:
        single_step = None
        is_stateful = False

        def default_params(self):
            return {}

    opt = build("mppi", lqr_policy)
    opt.predictor = NoStep()
    opt._policy_plan_fn = None
    with pytest.raises(ValueError, match="single_step"):
        opt._policy_plan()


def test_cem_gmm_best_k_guard():
    """Same loud construction-time guard as CEM/iCEM: defaults pair
    best_k=40 with K=200, but the base default K=32 would explode inside
    lax.top_k on step 1 (review r5)."""
    pred = make_double_integrator(0.1)
    with pytest.raises(ValueError, match="cem_best_k"):
        CEMGMMOptimizer(
            predictor=pred, cost_function=QuadCost(),
            control_limits=(np.array([-5.0], np.float32),
                            np.array([5.0], np.float32)),
            optimizer_logging=False, seed=7, mpc_horizon=H,
            num_rollouts=32, cem_best_k=40,
        )
