"""Batched planar point-mass environment — the multi-input test bench.

Two force inputs with (possibly asymmetric) per-input limits; used to
exercise every multi-control code path end to end: per-input action bounds
in the Pallas kernels, U>1 interpolation, iLQR with U>1, and the embedded/
serving wire formats.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.environments.base import EnvironmentBatched
from control_toolkit_tpu.models.dynamics import POINTMASS_DEFAULTS, pointmass_dynamics
from control_toolkit_tpu.models.predictors import rk4_step
from control_toolkit_tpu.utils import registry


@registry.environments.register("pointmass")
class PointMassEnv(EnvironmentBatched):
    num_states = 4
    num_actions = 2
    action_low = np.array([-1.0, -1.0], dtype=np.float32)
    action_high = np.array([1.0, 1.0], dtype=np.float32)

    def __init__(self, batch_size: int = 1, dt: float = 0.02, seed=None,
                 actuator_noise: float = 0.0, params=None):
        super().__init__(batch_size, dt, seed, actuator_noise)
        self.params = dict(POINTMASS_DEFAULTS)
        if params:
            self.params.update(params)

    def step_dynamics(self, state, action, dt):
        return rk4_step(pointmass_dynamics, state, action, dt, self.params)

    def get_reward(self, state, action):
        pos2 = state[..., 0] ** 2 + state[..., 1] ** 2
        return -pos2 - 0.01 * jnp.sum(action**2, -1)

    def is_done(self, state):
        return (jnp.abs(state[..., 0]) > 20.0) | (jnp.abs(state[..., 1]) > 20.0)

    def _sample_initial_state(self, key):
        # random position in [-2, 2]^2, at rest
        pos = jax.random.uniform(key, (self.batch_size, 2), minval=-2.0, maxval=2.0)
        return jnp.concatenate([pos, jnp.zeros((self.batch_size, 2))], axis=1)
