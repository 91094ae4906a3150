"""Acrobot swing-up cost: tip-height shaping + damping near the top."""
from __future__ import annotations

import jax.numpy as jnp

from control_toolkit_tpu.costs.base import CostFunction
from control_toolkit_tpu.utils import registry


@registry.cost_functions.register("acrobot/default")
class AcrobotSwingupCost(CostFunction):
    """Stage cost on the pendulum tip height.

    tip_height = -l1*cos(t1) - l2*cos(t1+t2); max = l1+l2 (both links up).
    Velocity damping is gated to near-the-top so the swing itself isn't
    punished (same shaping strategy as the pendulum cost).
    """

    dynamic_config_keys = (
        "height_weight", "velocity_weight", "control_weight", "l1", "l2",
    )

    DEFAULTS = {
        "height_weight": 10.0,
        "velocity_weight": 0.3,
        "control_weight": 0.01,
        "l1": 1.0,
        "l2": 1.0,
    }

    mirrored_dynamics_keys = ("l1", "l2")

    def __init__(self, config=None):
        super().__init__(self._init_merged(config))

    def _stage_cost_core_soa(self, xs, us, params):
        w = params["cost"]
        t1, t1d, t2, t2d = xs
        l1, l2 = w["l1"], w["l2"]
        height = -l1 * jnp.cos(t1) - l2 * jnp.cos(t1 + t2)
        max_h = l1 + l2
        near_top = jnp.maximum(height / max_h, 0.0) ** 2
        return (
            w["height_weight"] * (max_h - height)
            + w["velocity_weight"] * near_top * (t1d**2 + t2d**2)
            + w["control_weight"] * sum(u * u for u in us)
        )
