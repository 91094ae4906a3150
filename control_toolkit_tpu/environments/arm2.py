"""Batched two-link manipulator environment (end-effector reaching bench).

The fully-actuated sibling of the acrobot: torques on both joints, viscous
damping, gravity.  Reward = negative end-effector distance to the target —
the nonconvex kinematics (elbow-up/elbow-down solutions) make this the
multi-modal test bench for the sampling optimizers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.environments.base import EnvironmentBatched
from control_toolkit_tpu.models.dynamics import (
    ARM2_DEFAULTS,
    arm2_dynamics,
    arm2_end_effector,
)
from control_toolkit_tpu.models.predictors import rk4_step
from control_toolkit_tpu.utils import registry


@registry.environments.register("arm2")
class Arm2Env(EnvironmentBatched):
    num_states = 4
    num_actions = 2
    action_low = np.array([-1.0, -1.0], dtype=np.float32)
    action_high = np.array([1.0, 1.0], dtype=np.float32)

    def __init__(self, batch_size: int = 1, dt: float = 0.02, seed=None,
                 actuator_noise: float = 0.0, params=None, target=(0.6, 0.4)):
        super().__init__(batch_size, dt, seed, actuator_noise)
        self.params = dict(ARM2_DEFAULTS)
        if params:
            self.params.update(params)
        self.target = np.asarray(target, np.float32)

    def _trace_token(self):
        # get_reward reads self.target at trace time: retarget must
        # retrace like the base's params/noise/dt (base contract).
        return super()._trace_token() + (self.target.tobytes(),)

    def step_dynamics(self, state, action, dt):
        return rk4_step(arm2_dynamics, state, action, dt, self.params)

    def end_effector(self, state):
        return arm2_end_effector(
            state[..., 0], state[..., 2],
            self.params["l1"], self.params["l2"],
        )

    def get_reward(self, state, action):
        x, y = self.end_effector(state)
        d2 = (x - self.target[0]) ** 2 + (y - self.target[1]) ** 2
        return -d2 - 0.01 * jnp.sum(action**2, -1)

    def _sample_initial_state(self, key):
        # hanging down with small noise
        return 0.05 * jax.random.normal(key, (self.batch_size, 4))
