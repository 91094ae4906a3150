"""Built-in pendulum cost function. State: [angle, angleD], angle 0 upright."""
from __future__ import annotations

import jax.numpy as jnp

from control_toolkit_tpu.costs.base import CostFunction
from control_toolkit_tpu.utils import registry


@registry.cost_functions.register("pendulum/default")
@registry.cost_functions.register("pendulum/quadratic")
class PendulumQuadraticCost(CostFunction):
    """Swing-up cost with energy shaping.

    A pure quadratic cost cannot see the swing-up payoff within a short
    horizon (pumping first moves the cost the wrong way), so the stage cost
    combines a wrap-invariant angle error with an energy-error term
    ``(E - E_upright)^2`` that rewards resonant pumping from any phase.
    ``m``/``L``/``g`` default to the built-in pendulum dynamics constants.
    """

    dynamic_config_keys = (
        "angle_weight", "velocity_weight", "control_weight", "energy_weight",
        "m", "L", "g",
    )

    DEFAULTS = {
        "angle_weight": 50.0,
        "velocity_weight": 5.0,
        "control_weight": 0.01,
        "energy_weight": 0.05,
        "m": 1.0,
        "L": 1.0,
        "g": 9.81,
    }

    mirrored_dynamics_keys = ("m", "L", "g")

    def __init__(self, config=None):
        super().__init__(self._init_merged(config))

    def _stage_cost_core_soa(self, xs, us, params):
        w = params["cost"]
        angle, angle_d = xs
        # Total mechanical energy; upright-at-rest has E = m*g*L.
        m, L, g = w["m"], w["L"], w["g"]
        energy = 0.5 * m * L**2 * angle_d**2 + m * g * L * jnp.cos(angle)
        energy_err = (energy - m * g * L) ** 2
        # Gate the velocity penalty to near-upright so it damps the catch
        # without punishing the swing itself.
        near_top = 0.5 * (1.0 + jnp.cos(angle))
        return (
            w["angle_weight"] * (1.0 - jnp.cos(angle))
            + w["energy_weight"] * energy_err
            + w["velocity_weight"] * near_top * angle_d**2
            + w["control_weight"] * sum(u * u for u in us)
        )
