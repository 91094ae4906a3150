"""Point-mass cost: quadratic position tracking with per-input control cost.

State [x, y, xD, yD]; two inputs.  ``target_x``/``target_y`` are variable
attributes (params['attrs']) so the setpoint moves without recompiling.
Implements the SOA primitives, so the fused scan and both Pallas paths work
for the multi-input family too.
"""
from __future__ import annotations

import jax.numpy as jnp

from control_toolkit_tpu.costs.base import CostFunction
from control_toolkit_tpu.utils import registry


@registry.cost_functions.register("pointmass/default")
@registry.cost_functions.register("pointmass/quadratic")
class PointMassQuadraticCost(CostFunction):
    dynamic_config_keys = (
        "pos_weight", "vel_weight", "cc_weight", "ccrc_weight", "R",
    )
    attr_keys = ("target_x", "target_y")
    attr_defaults = {"target_x": 0.0, "target_y": 0.0}

    DEFAULTS = {
        "pos_weight": 20.0,
        "vel_weight": 1.0,
        "cc_weight": 0.1,
        "ccrc_weight": 0.1,
        "R": 1.0,
    }

    def __init__(self, config=None):
        merged = dict(self.DEFAULTS)
        merged.update(config or {})
        super().__init__(merged)

    def _stage_cost_core_soa(self, xs, us, params):
        w = params["cost"]
        attrs = params["attrs"]
        tx = attrs.get("target_x", jnp.float32(0.0))
        ty = attrs.get("target_y", jnp.float32(0.0))
        x, y, vx, vy = xs
        pos = w["pos_weight"] * ((x - tx) ** 2 + (y - ty) ** 2)
        vel = w["vel_weight"] * (vx**2 + vy**2)
        cc = w["cc_weight"] * w["R"] * sum(u * u for u in us)
        return pos + vel + cc

    def terminal_cost_soa(self, xs, params):
        w = params["cost"]
        attrs = params["attrs"]
        tx = attrs.get("target_x", jnp.float32(0.0))
        ty = attrs.get("target_y", jnp.float32(0.0))
        x, y, vx, vy = xs
        return 10.0 * w["pos_weight"] * ((x - tx) ** 2 + (y - ty) ** 2) + (
            w["vel_weight"] * (vx**2 + vy**2)
        )

    def cost_components(self, states, inputs, previous_input=None, params=None):
        params = params if params is not None else self.current_params()
        w = params["cost"]
        tx = params["attrs"].get("target_x", jnp.float32(0.0))
        ty = params["attrs"].get("target_y", jnp.float32(0.0))
        return {
            "pos": w["pos_weight"] * ((states[..., 0] - tx) ** 2
                                      + (states[..., 1] - ty) ** 2),
            "vel": w["vel_weight"] * (states[..., 2] ** 2 + states[..., 3] ** 2),
            "cc": w["cc_weight"] * w["R"] * jnp.sum(inputs**2, axis=-1),
        }
