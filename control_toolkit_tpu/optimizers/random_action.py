"""Random-shooting baseline optimizer.

Capability parity with the reference optimizer_random_action_tf
(/root/reference/Optimizers/optimizer_random_action_tf.py:12-86): sample K
uniform random control sequences within the action bounds, roll them out,
and apply the first action of the argmin-cost rollout.

One jitted pure step: sample -> scan-rollout -> trajectory cost -> argmin.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from control_toolkit_tpu.optimizers.base import Optimizer
from control_toolkit_tpu.utils import registry


class RandomActionState(NamedTuple):
    key: jax.Array
    u_prev: jax.Array  # [U] last applied control (enters the cost's ccrc term)


@registry.optimizers.register("random-action-tf")
@registry.optimizers.register("random-action")
class RandomActionOptimizer(Optimizer):
    def _init_state(self, key):
        return RandomActionState(
            key=key, u_prev=jnp.zeros((self.num_control_inputs,), jnp.float32)
        )

    def _make_step_fn(self):
        K, H, U = self.num_rollouts, self.mpc_horizon, self.num_control_inputs
        low, high = self.action_low, self.action_high

        cost_only = None if self.optimizer_logging else self._make_cost_only()

        def step_fn(state: RandomActionState, s, params):
            key, sample_key = jax.random.split(state.key)
            s_tiled = jnp.tile(s[:1], (K, 1))
            Q = jax.random.uniform(
                sample_key, (K, H, U), minval=low, maxval=high, dtype=jnp.float32
            )
            if cost_only is not None:
                cost = cost_only(s_tiled, Q, state.u_prev, params)
                traj = None
            else:
                cost, traj = self._rollout_and_cost(s_tiled, Q, state.u_prev, params)
            best = jnp.argmin(cost)
            u = Q[best, 0, :]
            # Diag gated like the rest of the zoo: an unread [K,H,U]
            # Q_logged output is ~52 MB of pure HBM traffic per tick at
            # K=262k (cem.py documents the identical gate).
            diag = (
                {"Q_logged": Q, "J_logged": cost}
                if self.optimizer_logging else {}
            )
            if traj is not None:
                diag["rollout_trajectories_logged"] = traj
            return u, RandomActionState(key=key, u_prev=u), diag

        return step_fn
