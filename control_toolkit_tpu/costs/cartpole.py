"""Built-in cartpole cost functions.

The reference ships cost functions as app-side ASF plugins (e.g.
``quadratic_boundary_grad`` documented in
/root/reference/Control_Toolkit_ASF_Template/config_cost_function.yml:9-17,
with weights dd_weight/ep_weight/ekp_weight/cc_weight/ccrc_weight/R).  These
built-ins provide the same capability for the in-tree cartpole environment.

State: [position, positionD, angle, angleD]; angle 0 == pole upright.
"""
from __future__ import annotations

import jax.numpy as jnp

from control_toolkit_tpu.costs.base import CostFunction
from control_toolkit_tpu.utils import registry


@registry.cost_functions.register("cartpole/default")
@registry.cost_functions.register("cartpole/quadratic")
class CartpoleQuadraticCost(CostFunction):
    """Swing-up/stabilization cost with target-position tracking.

    Weight names mirror the reference ASF example (dd=distance, ep=pole
    potential, ekp=pole kinetic, cc=control cost, ccrc=control-change cost).
    ``target_position`` is a variable attribute (params['attrs']) so the host
    can move the setpoint every tick without recompiling.
    """

    dynamic_config_keys = (
        "dd_weight", "ep_weight", "ekp_weight", "cc_weight", "ccrc_weight", "R",
    )
    attr_keys = ("target_position",)
    attr_defaults = {"target_position": 0.0}

    DEFAULTS = {
        "dd_weight": 120.0,
        "ep_weight": 10000.0,
        "ekp_weight": 10.0,
        "cc_weight": 1.0,
        "ccrc_weight": 1.0,
        "R": 1.0,
    }

    def __init__(self, config=None):
        super().__init__(self._init_merged(config))

    def _stage_cost_core_soa(self, xs, us, params):
        w = params["cost"]
        attrs = params["attrs"]
        target = attrs.get("target_position", jnp.float32(0.0))

        pos, _, angle, angle_d = xs

        dd = w["dd_weight"] * (pos - target) ** 2
        ep = w["ep_weight"] * 0.25 * (1.0 - jnp.cos(angle)) ** 2
        ekp = w["ekp_weight"] * (angle_d / (2.0 * jnp.pi)) ** 2
        cc = w["cc_weight"] * w["R"] * sum(u * u for u in us)
        return dd + ep + ekp + cc

    def cost_components(self, states, inputs, previous_input=None, params=None):
        """Named stage-cost terms for the CostFunctionTester."""
        params = params if params is not None else self.current_params()
        w = params["cost"]
        target = params["attrs"].get("target_position", jnp.float32(0.0))
        pos = states[..., 0]
        angle = states[..., 2]
        angle_d = states[..., 3]
        return {
            "dd": w["dd_weight"] * (pos - target) ** 2,
            "ep": w["ep_weight"] * 0.25 * (1.0 - jnp.cos(angle)) ** 2,
            "ekp": w["ekp_weight"] * (angle_d / (2.0 * jnp.pi)) ** 2,
            "cc": w["cc_weight"] * w["R"] * jnp.sum(inputs**2, axis=-1),
        }

    def terminal_cost_soa(self, xs, params):
        # Penalize terminal pole-down configurations; keeps swing-up honest
        # at short horizons.
        _, _, angle, angle_d = xs
        return 1.0e4 * (1.0 - jnp.cos(angle)) ** 2 + 10.0 * angle_d**2
