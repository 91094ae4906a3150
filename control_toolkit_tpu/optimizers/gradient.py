"""Gradient (Adam) trajectory optimizer.

Capability parity with the reference optimizer_gradient_tf
(/root/reference/Optimizers/optimizer_gradient_tf.py:12-185): a persistent
population of K random control sequences optimized with Adam through the
rollout for ``gradient_steps`` iterations per control step (warmup more on
the first), per-rollout gradient norm clipping over axes [1,2], action-bound
clipping after every update; u = first action of the argmin-cost rollout.
Warm start: population shifted one step with a fresh uniform random tail
column, and the Adam moments shifted left zero-padded (reference :139-167).

TPU-native redesign: the Adam state is explicit (ops.common.AdamState) so the
"shift optimizer weights" surgery is two concats inside the jitted step.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from control_toolkit_tpu.ops.common import (
    AdamState,
    adam_init,
    adam_update,
    clip_by_norm,
    shift_adam_moments,
)
from control_toolkit_tpu.optimizers.base import Optimizer
from control_toolkit_tpu.utils import registry


class GradientState(NamedTuple):
    key: jax.Array
    Q: jax.Array        # [K, H, U] persistent population
    adam: AdamState     # over [K, H, U]
    count: jax.Array
    u_prev: jax.Array


@registry.optimizers.register("gradient-tf")
@registry.optimizers.register("gradient")
class GradientOptimizer(Optimizer):
    def __init__(
        self,
        *,
        gradient_steps: int = 5,
        initial_action_stdev: float = 0.5,
        learning_rate: float = 0.05,
        adam_beta_1: float = 0.9,
        adam_beta_2: float = 0.999,
        adam_epsilon: float = 1e-7,
        gradmax_clip: float = 5.0,
        rtol: float = 1e-3,
        warmup: bool = False,
        warmup_iterations: int = 250,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.gradient_steps = int(gradient_steps)
        self.initial_action_stdev = float(initial_action_stdev)
        self.learning_rate = float(learning_rate)
        self.adam_beta_1 = float(adam_beta_1)
        self.adam_beta_2 = float(adam_beta_2)
        self.adam_epsilon = float(adam_epsilon)
        self.gradmax_clip = float(gradmax_clip)
        self.rtol = float(rtol)
        self.warmup = bool(warmup)
        self.warmup_iterations = int(warmup_iterations)

    def _init_state(self, key):
        K, H, U = self.num_rollouts, self.mpc_horizon, self.num_control_inputs
        key, sub = jax.random.split(key)
        Q = jax.random.uniform(
            sub, (K, H, U), minval=self.action_low, maxval=self.action_high,
            dtype=jnp.float32,
        )
        return GradientState(
            key=key, Q=Q, adam=adam_init((K, H, U)),
            count=jnp.zeros((), jnp.int32),
            u_prev=jnp.zeros((U,), jnp.float32),
        )

    def _make_step_fn(self):
        K, H, U = self.num_rollouts, self.mpc_horizon, self.num_control_inputs
        low, high = self.action_low, self.action_high
        lr, b1, b2, eps = self.learning_rate, self.adam_beta_1, self.adam_beta_2, self.adam_epsilon
        gclip = self.gradmax_clip

        # Fused Pallas gradient kernel on TPU; jax.grad via scan otherwise.
        grad_fn, cost_only = self._make_grad_and_cost_only()

        def grad_iter(carry, s_tiled, u_prev, params):
            Q, adam = carry
            dQ = grad_fn(Q, s_tiled, u_prev, params)
            dQ = clip_by_norm(dQ, gclip, axes=(1, 2))
            adam, delta = adam_update(adam, dQ, lr, b1, b2, eps)
            Q = jnp.clip(Q - delta, low, high)
            return Q, adam

        def step_fn(state: GradientState, s, params):
            s_tiled = jnp.tile(s[:1], (K, 1))
            # Static trip count when warmup is off: lets XLA lower a
            # fixed-bound loop (unrollable) instead of a while_loop.
            if self.warmup:
                iterations = jnp.where(
                    state.count == 0, self.warmup_iterations, self.gradient_steps
                )
            else:
                iterations = self.gradient_steps
            Q, adam = jax.lax.fori_loop(
                0, iterations,
                lambda i, c: grad_iter(c, s_tiled, state.u_prev, params),
                (state.Q, state.adam),
            )

            if cost_only is not None:
                cost = cost_only(s_tiled, Q, state.u_prev, params)
                traj = None
            else:
                cost, traj = self._rollout_and_cost(s_tiled, Q, state.u_prev, params)
            best = jnp.argmin(cost)
            u = Q[best, 0, :]

            # Warm start: shift population left with a fresh random tail
            # column, shift Adam moments (reference :139-167).
            key, sub = jax.random.split(state.key)
            tail = jax.random.uniform(
                sub, (K, 1, U), minval=low, maxval=high, dtype=jnp.float32
            )
            Q_shifted = jnp.concatenate([Q[:, 1:, :], tail], axis=1)
            adam = shift_adam_moments(adam)

            diag = {
                "J_logged": cost,
                "u_nom": Q[best][None],
            }
            if self.optimizer_logging:
                diag["Q_logged"] = Q
            if traj is not None:
                diag["rollout_trajectories_logged"] = traj
            new_state = GradientState(
                key=key, Q=Q_shifted, adam=adam,
                count=state.count + 1, u_prev=u,
            )
            return u, new_state, diag

        return step_fn
