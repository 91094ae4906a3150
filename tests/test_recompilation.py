"""Recompilation discipline: dynamic values must NOT retrace the step.

SURVEY §7 hard part 5: targets, cost weights, hot-reloaded params flow as
jit arguments; only shape changes may recompile.
"""
import sys

import numpy as np

sys.path.insert(0, "tests")
from test_optimizer_zoo import make


def cache_size(ctrl):
    return ctrl.optimizer._step_jit._cache_size()


def test_attribute_and_weight_changes_do_not_retrace():
    ctrl = make("mppi", logging=False)
    s = np.zeros(4, np.float32)
    ctrl.step(s)
    assert cache_size(ctrl) == 1

    # moving target every step
    for t in range(5):
        ctrl.step(s, updated_attributes={"target_position": float(t)})
    assert cache_size(ctrl) == 1, "attribute update caused a retrace"

    # cost-weight hot reload (simulate the updater's effect)
    ctrl.cost_function.cost_function.config["dd_weight"] = 999.0
    ctrl.cost_function.cost_function.reload_cost_parameters_from_config_flag = True
    ctrl.step(s)
    assert cache_size(ctrl) == 1, "cost hot-reload caused a retrace"

    # dynamics params changes (e.g. online system-id update)
    ctrl._dyn_params = None
    ctrl.predictor.predictor._defaults["m_pole"] = 0.2
    ctrl.step(s)
    assert cache_size(ctrl) == 1, "dynamics param change caused a retrace"


def test_rpgd_resample_boundary_does_not_retrace():
    ctrl = make("rpgd-tf", logging=False)
    s = np.zeros(4, np.float32)
    for _ in range(5):  # crosses the resamp_per=3 lax.cond boundary
        ctrl.step(s)
    assert cache_size(ctrl) == 1


def test_stateless_weight_hot_swap_reaches_the_step():
    """Swapping a STATELESS predictor's weights (checkpoint load, online-
    sysid install, PETS re-fit) must reach the next jitted step without
    poking ``ctrl._dyn_params`` and without a retrace.  Regression: the
    dyn-param cache used to pin trace-time weights forever for stateless
    predictors, so ``pred.net_params = new`` silently kept planning on the
    old model."""
    import jax
    import numpy as np

    from control_toolkit_tpu.controllers.mpc import MPCController

    ctrl = MPCController(
        "cartpole",
        (np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        {"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name="mppi",
        predictor_specification="mlp-16",  # random init is fine here
        optimizer_config={"seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 10,
                          "num_rollouts": 32, "cc_weight": 1.0, "R": 1.0,
                          "LBD": 100.0, "NU": 1000.0, "SQRTRHOINV": 0.1,
                          "period_interpolation_inducing_points": 5},
    )
    s = np.array([0.1, 0.0, 0.2, 0.0], np.float32)
    ctrl.step(s)  # compile + place the cache
    ctrl.controller_reset()
    u_before = np.asarray(ctrl.step(s)).copy()

    pred = ctrl.predictor.predictor
    pred.net_params = jax.tree_util.tree_map(lambda w: w * 1.7, pred.net_params)
    ctrl.controller_reset()  # identical PRNG path; only the weights differ
    u_after = np.asarray(ctrl.step(s)).copy()

    assert not np.allclose(u_before, u_after), (
        "weight hot-swap did not reach the jitted step"
    )
    assert cache_size(ctrl) == 1, "weight hot-swap caused a retrace"
