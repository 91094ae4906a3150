"""Continuous-time dynamics functions for built-in environments.

The reference delegates dynamics to the external SI_Toolkit predictor zoo
(ODE integrators, neural nets, GPs — see
/root/reference/Control_Toolkit_ASF_Template/config_controllers.yml:8).  Here
dynamics are pure JAX functions ``f(x, u, p) -> dx/dt`` over batched state
``x: [..., S]`` and control ``u: [..., U]``, with parameters passed as a dict
so targets/attributes can change without recompilation.

State conventions:
  cartpole: [position, positionD, angle, angleD]; u in [-1, 1] scaled by u_max.
  pendulum: [angle, angleD]; angle == 0 is upright; u is torque.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

DynamicsFn = Callable[[jnp.ndarray, jnp.ndarray, Dict], jnp.ndarray]

CARTPOLE_DEFAULTS = {
    "m_cart": 1.0,       # cart mass [kg]
    "m_pole": 0.1,       # pole mass [kg]
    "L": 0.5,            # half pole length [m]
    "g": 9.81,
    "u_max": 10.0,       # force scale: u in [-1,1] -> force [N]
    "friction_cart": 0.0,
    "friction_pole": 0.0,
}

PENDULUM_DEFAULTS = {
    "m": 1.0,
    "L": 1.0,
    "g": 9.81,
    "u_max": 6.0,   # underactuated (< m*g*L) but swing-up feasible in ~2 s
    "damping": 0.0,
}


def cartpole_dynamics(x: jnp.ndarray, u: jnp.ndarray, p: Dict) -> jnp.ndarray:
    """Cart-pole ODE (pole balancing upward at angle=0).

    Standard underactuated cart-pole equations of motion; x: [..., 4],
    u: [..., 1] normalized to [-1, 1].
    """
    pos_d = x[..., 1]
    theta = x[..., 2]
    theta_d = x[..., 3]
    force = u[..., 0] * p["u_max"]

    m_c, m_p, L, g = p["m_cart"], p["m_pole"], p["L"], p["g"]
    sin_t = jnp.sin(theta)
    cos_t = jnp.cos(theta)
    total_m = m_c + m_p

    # Equations of motion (pole pivoting on cart, angle measured from upright).
    temp = (force + m_p * L * theta_d**2 * sin_t - p["friction_cart"] * pos_d) / total_m
    theta_dd = (g * sin_t - cos_t * temp - p["friction_pole"] * theta_d / (m_p * L)) / (
        L * (4.0 / 3.0 - m_p * cos_t**2 / total_m)
    )
    pos_dd = temp - m_p * L * theta_dd * cos_t / total_m

    return jnp.stack([pos_d, pos_dd, theta_d, theta_dd], axis=-1)


def pendulum_dynamics(x: jnp.ndarray, u: jnp.ndarray, p: Dict) -> jnp.ndarray:
    """Inverted pendulum ODE; angle = 0 is upright, torque-actuated."""
    theta = x[..., 0]
    theta_d = x[..., 1]
    torque = u[..., 0] * p["u_max"]
    theta_dd = (
        p["g"] / p["L"] * jnp.sin(theta)
        + torque / (p["m"] * p["L"] ** 2)
        - p["damping"] * theta_d
    )
    return jnp.stack([theta_d, theta_dd], axis=-1)


DYNAMICS = {
    "cartpole": (cartpole_dynamics, CARTPOLE_DEFAULTS, 4, 1),
    "pendulum": (pendulum_dynamics, PENDULUM_DEFAULTS, 2, 1),
}
