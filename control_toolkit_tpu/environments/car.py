"""Batched kinematic-bicycle car environment (f1tenth-class scale).

Four states [x, y, yaw, v]; two inputs [steer_cmd, accel_cmd] in [-1, 1].
The ground-vehicle model family: nonholonomic (can't move sideways), so
waypoint reaching requires coordinated steering + speed plans.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.environments.base import EnvironmentBatched
from control_toolkit_tpu.models.dynamics import CAR_DEFAULTS, car_dynamics
from control_toolkit_tpu.models.predictors import rk4_step
from control_toolkit_tpu.utils import registry


@registry.environments.register("car")
class CarEnv(EnvironmentBatched):
    num_states = 4
    num_actions = 2
    action_low = np.array([-1.0, -1.0], dtype=np.float32)
    action_high = np.array([1.0, 1.0], dtype=np.float32)

    def __init__(self, batch_size: int = 1, dt: float = 0.02, seed=None,
                 actuator_noise: float = 0.0, params=None):
        super().__init__(batch_size, dt, seed, actuator_noise)
        self.params = dict(CAR_DEFAULTS)
        if params:
            self.params.update(params)

    def step_dynamics(self, state, action, dt):
        return rk4_step(car_dynamics, state, action, dt, self.params)

    def get_reward(self, state, action):
        pos2 = state[..., 0] ** 2 + state[..., 1] ** 2
        return -pos2 - 0.01 * jnp.sum(action**2, -1)

    def is_done(self, state):
        return (jnp.abs(state[..., 0]) > 20.0) | (jnp.abs(state[..., 1]) > 20.0)

    def _sample_initial_state(self, key):
        base = jnp.array([0.0, 0.0, 0.0, 0.0])
        noise = jnp.array([0.5, 0.5, 0.3, 0.2])
        return base + noise * jax.random.normal(key, (self.batch_size, 4))
