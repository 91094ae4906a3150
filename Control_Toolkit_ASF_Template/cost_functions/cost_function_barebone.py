"""Barebone custom cost function (parity with the reference
Control_Toolkit_ASF_Template/Cost_Functions/EnvironmentName/
cost_function_barebone.py:23-57).

Implement the struct-of-arrays primitives to get the fused scan rollout and
the Pallas kernel for free; register under "<environment>/<name>".
"""
from __future__ import annotations

import jax.numpy as jnp

from control_toolkit_tpu.costs.base import CostFunction
from control_toolkit_tpu.utils import registry


@registry.cost_functions.register("environment_name/barebone", asf=True)
class BareboneCost(CostFunction):
    # YAML entries listed here become jit arguments (hot-reloadable without
    # recompilation); everything else in the config dict is static.
    dynamic_config_keys = ("state_weight", "control_weight")
    # Environment attributes this cost reads from params["attrs"].
    attr_keys = ()

    DEFAULTS = {"state_weight": 1.0, "control_weight": 0.1}

    def __init__(self, config=None):
        merged = dict(self.DEFAULTS)
        merged.update(config or {})
        super().__init__(merged)

    def _stage_cost_core_soa(self, xs, us, params):
        w = params["cost"]
        return (
            w["state_weight"] * sum(x * x for x in xs)
            + w["control_weight"] * sum(u * u for u in us)
        )

    def terminal_cost_soa(self, xs, params):
        # Default is zero; override for a terminal penalty.
        return jnp.zeros_like(xs[0])
