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


N_OBSTACLES = 3


@registry.cost_functions.register("pointmass/obstacles")
class PointMassObstacleCost(PointMassQuadraticCost):
    """Waypoint tracking through a field of circular obstacles.

    Demonstrates the cost-extension contract for navigation-style
    objectives: each of the ``N_OBSTACLES`` obstacles is three SCALAR
    attributes (obs<i>_x, obs<i>_y, obs<i>_r) so positions and radii move
    at runtime through the same attrs pipeline as targets — and, because
    every attribute is a scalar, the cost stays eligible for the fused
    Pallas kernels (attrs ride the SMEM parameter vector).

    Penalty: smooth hinge ``obstacle_weight * max(0, 1 - d^2/r_margin^2)^2``
    per obstacle, where r_margin = r + clearance — zero outside the margin,
    quadratic ramp inside, C1-continuous (sampling- and gradient-optimizer
    friendly).  Inactive obstacles: set r to 0 (margin shrinks to
    clearance) or park them far away.
    """

    dynamic_config_keys = PointMassQuadraticCost.dynamic_config_keys + (
        "obstacle_weight", "clearance",
    )
    attr_keys = PointMassQuadraticCost.attr_keys + tuple(
        f"obs{i}_{c}" for i in range(N_OBSTACLES) for c in ("x", "y", "r")
    )
    attr_defaults = dict(PointMassQuadraticCost.attr_defaults)
    for _i in range(N_OBSTACLES):
        attr_defaults.update(
            {f"obs{_i}_x": 1e6, f"obs{_i}_y": 1e6, f"obs{_i}_r": 0.0}
        )
    del _i

    DEFAULTS = dict(PointMassQuadraticCost.DEFAULTS)
    DEFAULTS.update({"obstacle_weight": 200.0, "clearance": 0.15})

    def _obstacle_penalty_soa(self, x, y, params):
        w = params["cost"]
        attrs = params["attrs"]
        pen = 0.0
        for i in range(N_OBSTACLES):
            ox = attrs.get(f"obs{i}_x", jnp.float32(1e6))
            oy = attrs.get(f"obs{i}_y", jnp.float32(1e6))
            orr = attrs.get(f"obs{i}_r", jnp.float32(0.0))
            margin = orr + w["clearance"]
            d2 = (x - ox) ** 2 + (y - oy) ** 2
            h = jnp.maximum(0.0, 1.0 - d2 / (margin * margin))
            pen = pen + h * h
        return w["obstacle_weight"] * pen

    def _stage_cost_core_soa(self, xs, us, params):
        base = super()._stage_cost_core_soa(xs, us, params)
        return base + self._obstacle_penalty_soa(xs[0], xs[1], params)

    def terminal_cost_soa(self, xs, params):
        base = super().terminal_cost_soa(xs, params)
        return base + self._obstacle_penalty_soa(xs[0], xs[1], params)

    def cost_components(self, states, inputs, previous_input=None, params=None):
        params = params if params is not None else self.current_params()
        comps = super().cost_components(states, inputs, previous_input, params)
        comps["obstacles"] = self._obstacle_penalty_soa(
            states[..., 0], states[..., 1], params
        )
        return comps
