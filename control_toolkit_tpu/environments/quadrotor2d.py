"""Batched planar quadrotor (birotor) environment.

Six states, two thrust inputs in [0, 1] (one-sided actuation — rotors can't
push down), trig-heavy underactuated dynamics: the hardest built-in test
bench. Hover requires t1 = t2 = m*g/(2*u_max).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.environments.base import EnvironmentBatched
from control_toolkit_tpu.models.dynamics import (
    QUADROTOR2D_DEFAULTS,
    quadrotor2d_dynamics,
)
from control_toolkit_tpu.models.predictors import rk4_step
from control_toolkit_tpu.utils import registry


@registry.environments.register("quadrotor2d")
class Quadrotor2DEnv(EnvironmentBatched):
    num_states = 6
    num_actions = 2
    action_low = np.array([0.0, 0.0], dtype=np.float32)
    action_high = np.array([1.0, 1.0], dtype=np.float32)

    def __init__(self, batch_size: int = 1, dt: float = 0.02, seed=None,
                 actuator_noise: float = 0.0, params=None):
        super().__init__(batch_size, dt, seed, actuator_noise)
        self.params = dict(QUADROTOR2D_DEFAULTS)
        if params:
            self.params.update(params)

    def step_dynamics(self, state, action, dt):
        return rk4_step(quadrotor2d_dynamics, state, action, dt, self.params)

    def get_reward(self, state, action):
        pos2 = state[..., 0] ** 2 + (state[..., 1] - 1.0) ** 2
        return -pos2 - 0.1 * state[..., 4] ** 2 - 0.01 * jnp.sum(action**2, -1)

    def is_done(self, state):
        return (
            (jnp.abs(state[..., 0]) > 10.0)
            | (jnp.abs(state[..., 1]) > 10.0)
            | (jnp.abs(state[..., 4]) > jnp.pi / 2)
        )

    def _sample_initial_state(self, key):
        # near-hover around (0, 1), slightly perturbed
        base = jnp.array([0.0, 1.0, 0.0, 0.0, 0.0, 0.0])
        noise = jnp.array([0.3, 0.3, 0.1, 0.1, 0.1, 0.1])
        return base + noise * jax.random.normal(key, (self.batch_size, 6))
