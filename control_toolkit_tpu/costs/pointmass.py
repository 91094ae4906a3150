"""Point-mass cost: quadratic position tracking with per-input control cost.

State [x, y, xD, yD]; two inputs.  ``target_x``/``target_y`` are variable
attributes (params['attrs']) so the setpoint moves without recompiling.
Implements the SOA primitives, so the fused scan and both Pallas paths work
for the multi-input family too.
"""
from __future__ import annotations

import jax.numpy as jnp

from control_toolkit_tpu.costs import obstacles as obst
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
        super().__init__(self._init_merged(config))

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


@registry.cost_functions.register("pointmass/trajectory")
class PointMassTrajectoryCost(CostFunction):
    """Track a TIME-VARYING reference trajectory over the horizon.

    ``ref_x``/``ref_y`` are ARRAY-valued attributes of shape [H+1] (the
    reference position at each rollout step, terminal included), updated
    through the same ``updated_attributes`` pipeline as scalar targets —
    parity with the reference's VariableParameters, which holds tensors.
    Stage h tracks ref[h], the terminal state tracks ref[H], so the
    optimizer plans along the path rather than toward one point.

    Overrides ``_get_stage_cost`` directly (the time index must reach the
    cost), which automatically excludes this cost from the fused/Pallas
    paths via the ``supports_fused_rollout`` contract; array attributes keep
    it on the scan path regardless (Optimizer._can_use_pallas).
    """

    dynamic_config_keys = ("pos_weight", "vel_weight", "cc_weight", "R")

    DEFAULTS = {
        "pos_weight": 20.0,
        "vel_weight": 0.2,
        "cc_weight": 0.1,
        "R": 1.0,
    }

    def __init__(self, config=None):
        super().__init__(self._init_merged(config))

    def configure(self, batch_size, horizon, **kwargs):
        super().configure(batch_size, horizon, **kwargs)
        # Defaults depend on the horizon: hold position at the origin.
        self.attr_keys = ("ref_x", "ref_y")
        self.attr_defaults = {
            "ref_x": jnp.zeros((horizon + 1,), jnp.float32),
            "ref_y": jnp.zeros((horizon + 1,), jnp.float32),
        }

    def _refs(self, params, H):
        attrs = params["attrs"]
        ref_x = jnp.asarray(
            attrs.get("ref_x", jnp.zeros((H + 1,), jnp.float32)), jnp.float32
        )
        ref_y = jnp.asarray(
            attrs.get("ref_y", jnp.zeros((H + 1,), jnp.float32)), jnp.float32
        )
        return ref_x, ref_y

    def _get_stage_cost(self, states, inputs, previous_input, params):
        w = params["cost"]
        H = inputs.shape[1]
        ref_x, ref_y = self._refs(params, H)
        pos = w["pos_weight"] * (
            (states[..., 0] - ref_x[:H]) ** 2 + (states[..., 1] - ref_y[:H]) ** 2
        )
        vel = w["vel_weight"] * (states[..., 2] ** 2 + states[..., 3] ** 2)
        cc = w["cc_weight"] * w["R"] * jnp.sum(inputs**2, axis=-1)
        return pos + vel + cc

    def get_terminal_cost(self, terminal_states, params):
        w = params["cost"]
        ref_x, ref_y = self._refs(params, self.horizon or 1)
        return 10.0 * w["pos_weight"] * (
            (terminal_states[..., 0] - ref_x[-1]) ** 2
            + (terminal_states[..., 1] - ref_y[-1]) ** 2
        )


@registry.cost_functions.register("pointmass/obstacles")
class PointMassObstacleCost(PointMassQuadraticCost):
    """Waypoint tracking through a field of circular obstacles —
    the cost-extension pattern for navigation objectives; penalty,
    attribute layout and kernel-eligibility rationale in
    costs/obstacles.py (shared with car/obstacles)."""

    dynamic_config_keys = (
        PointMassQuadraticCost.dynamic_config_keys + obst.OBSTACLE_CONFIG_KEYS
    )
    attr_keys = PointMassQuadraticCost.attr_keys + obst.OBSTACLE_ATTR_KEYS
    attr_defaults = {
        **PointMassQuadraticCost.attr_defaults, **obst.OBSTACLE_ATTR_DEFAULTS,
    }
    DEFAULTS = {
        **PointMassQuadraticCost.DEFAULTS, **obst.OBSTACLE_CONFIG_DEFAULTS,
    }

    def _stage_cost_core_soa(self, xs, us, params):
        base = super()._stage_cost_core_soa(xs, us, params)
        return base + obst.obstacle_penalty(xs[0], xs[1], params)

    def terminal_cost_soa(self, xs, params):
        base = super().terminal_cost_soa(xs, params)
        return base + obst.obstacle_penalty(xs[0], xs[1], params)

    def cost_components(self, states, inputs, previous_input=None, params=None):
        params = params if params is not None else self.current_params()
        comps = super().cost_components(states, inputs, previous_input, params)
        comps["obstacles"] = obst.obstacle_penalty(
            states[..., 0], states[..., 1], params
        )
        return comps
