"""Batched pendulum environment."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.environments.base import EnvironmentBatched
from control_toolkit_tpu.models.dynamics import PENDULUM_DEFAULTS, pendulum_dynamics
from control_toolkit_tpu.models.predictors import rk4_step
from control_toolkit_tpu.utils import registry


@registry.environments.register("pendulum")
class PendulumEnv(EnvironmentBatched):
    num_states = 2
    num_actions = 1
    action_low = np.array([-1.0], dtype=np.float32)
    action_high = np.array([1.0], dtype=np.float32)

    def __init__(self, batch_size: int = 1, dt: float = 0.02, seed=None,
                 actuator_noise: float = 0.0, params=None, start_upright: bool = False):
        super().__init__(batch_size, dt, seed, actuator_noise)
        self.params = dict(PENDULUM_DEFAULTS)
        if params:
            self.params.update(params)
        self.start_upright = start_upright

    def step_dynamics(self, state, action, dt):
        return rk4_step(pendulum_dynamics, state, action, dt, self.params)

    def get_reward(self, state, action):
        return -(1.0 - jnp.cos(state[..., 0])) - 0.01 * jnp.sum(action**2, -1)

    def _sample_initial_state(self, key):
        base = jnp.zeros(2) if self.start_upright else jnp.array([jnp.pi, 0.0])
        return base + 0.05 * jax.random.normal(key, (self.batch_size, 2))
