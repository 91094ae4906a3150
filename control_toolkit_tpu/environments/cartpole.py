"""Batched cartpole environment (swing-up / stabilization test bench)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.environments.base import EnvironmentBatched
from control_toolkit_tpu.models.dynamics import CARTPOLE_DEFAULTS, cartpole_dynamics
from control_toolkit_tpu.models.predictors import rk4_step
from control_toolkit_tpu.utils import registry


@registry.environments.register("cartpole")
class CartpoleEnv(EnvironmentBatched):
    num_states = 4
    num_actions = 1
    action_low = np.array([-1.0], dtype=np.float32)
    action_high = np.array([1.0], dtype=np.float32)

    def __init__(self, batch_size: int = 1, dt: float = 0.02, seed=None,
                 actuator_noise: float = 0.0, params=None, start_upright: bool = True):
        super().__init__(batch_size, dt, seed, actuator_noise)
        self.params = dict(CARTPOLE_DEFAULTS)
        if params:
            self.params.update(params)
        self.start_upright = start_upright

    def step_dynamics(self, state, action, dt):
        return rk4_step(cartpole_dynamics, state, action, dt, self.params)

    def get_reward(self, state, action):
        # reward = -cost convention (reference cost shifting, Cost_Functions/__init__.py:12-15)
        angle = state[..., 2]
        pos = state[..., 0]
        return -(1.0 - jnp.cos(angle)) - 0.01 * pos**2 - 0.01 * jnp.sum(action**2, -1)

    def is_done(self, state):
        return jnp.abs(state[..., 0]) > 10.0

    def _sample_initial_state(self, key):
        if self.start_upright:
            noise = 0.05 * jax.random.normal(key, (self.batch_size, 4))
            return noise
        # hanging-down start for swing-up experiments
        base = jnp.array([0.0, 0.0, jnp.pi, 0.0])
        return base + 0.05 * jax.random.normal(key, (self.batch_size, 4))
