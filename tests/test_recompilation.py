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
