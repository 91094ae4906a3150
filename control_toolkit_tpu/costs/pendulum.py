"""Built-in pendulum cost function. State: [angle, angleD], angle 0 upright."""
from __future__ import annotations

import jax.numpy as jnp

from control_toolkit_tpu.costs.base import CostFunction
from control_toolkit_tpu.utils import registry


@registry.cost_functions.register("pendulum/default")
@registry.cost_functions.register("pendulum/quadratic")
class PendulumQuadraticCost(CostFunction):
    dynamic_config_keys = ("angle_weight", "velocity_weight", "control_weight")

    DEFAULTS = {"angle_weight": 10.0, "velocity_weight": 0.1, "control_weight": 0.01}

    def __init__(self, config=None):
        merged = dict(self.DEFAULTS)
        merged.update(config or {})
        super().__init__(merged)

    def _get_stage_cost(self, states, inputs, previous_input, params):
        w = params["cost"]
        angle = states[..., 0]
        angle_d = states[..., 1]
        # Wrap-invariant angle error via (1 - cos).
        return (
            w["angle_weight"] * (1.0 - jnp.cos(angle))
            + w["velocity_weight"] * angle_d**2
            + w["control_weight"] * jnp.sum(inputs**2, axis=-1)
        )
