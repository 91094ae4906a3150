"""Batched full 3-D quadrotor environment.

Twelve states, four one-sided thrust inputs in [0, 1]: the framework's
largest built-in model family (multi-input, trig-heavy, coupled rotational
dynamics).  Hover requires all four rotors at m*g/(4*u_max).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.environments.base import EnvironmentBatched
from control_toolkit_tpu.models.dynamics import (
    QUADROTOR3D_DEFAULTS,
    quadrotor3d_dynamics,
)
from control_toolkit_tpu.models.predictors import rk4_step
from control_toolkit_tpu.utils import registry


@registry.environments.register("quadrotor3d")
class Quadrotor3DEnv(EnvironmentBatched):
    num_states = 12
    num_actions = 4
    action_low = np.zeros(4, dtype=np.float32)
    action_high = np.ones(4, dtype=np.float32)

    def __init__(self, batch_size: int = 1, dt: float = 0.02, seed=None,
                 actuator_noise: float = 0.0, params=None):
        super().__init__(batch_size, dt, seed, actuator_noise)
        self.params = dict(QUADROTOR3D_DEFAULTS)
        if params:
            self.params.update(params)

    def step_dynamics(self, state, action, dt):
        return rk4_step(quadrotor3d_dynamics, state, action, dt, self.params)

    def get_reward(self, state, action):
        pos2 = (state[..., 0] ** 2 + state[..., 1] ** 2
                + (state[..., 2] - 1.0) ** 2)
        tilt = state[..., 6] ** 2 + state[..., 7] ** 2
        return -pos2 - 0.1 * tilt - 0.01 * jnp.sum(action**2, -1)

    def is_done(self, state):
        return (
            (jnp.abs(state[..., 0]) > 10.0)
            | (jnp.abs(state[..., 1]) > 10.0)
            | (jnp.abs(state[..., 2]) > 10.0)
            | (jnp.abs(state[..., 6]) > jnp.pi / 2)
            | (jnp.abs(state[..., 7]) > jnp.pi / 2)
        )

    def _sample_initial_state(self, key):
        # near-hover around (0, 0, 1), slightly perturbed
        base = jnp.array([0.0, 0.0, 1.0] + [0.0] * 9)
        noise = jnp.array([0.3, 0.3, 0.3, 0.1, 0.1, 0.1,
                           0.05, 0.05, 0.1, 0.05, 0.05, 0.05])
        return base + noise * jax.random.normal(key, (self.batch_size, 12))
