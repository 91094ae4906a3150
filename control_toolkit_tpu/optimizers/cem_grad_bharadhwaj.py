"""CEM + Adam gradient refinement (Bharadhwaj et al. 2020, full variant).

Capability parity with the reference optimizer_cem_grad_bharadhwaj_tf
(/root/reference/Optimizers/optimizer_cem_grad_bharadhwaj_tf.py:16-185): each
outer iteration keeps the current elites, resamples K-k sequences from the
CEM Gaussian, takes ONE Adam step on all K through the rollout (per-rollout
norm-clipped gradients), re-rolls, re-elects elites and refits the Gaussian;
after the loop u = first action of the best elite and the distribution is
time-shifted (apply_time_delta, :134-146).  The Adam moments persist across
control steps, as in the reference (optim is a long-lived member).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from control_toolkit_tpu.ops.common import AdamState, adam_init, adam_update, clip_by_norm, elite_indices
from control_toolkit_tpu.optimizers.base import Optimizer
from control_toolkit_tpu.utils import registry


class CEMGradState(NamedTuple):
    key: jax.Array
    dist_mue: jax.Array  # [1, H, U]
    stdev: jax.Array     # [1, H, U]
    adam: AdamState      # over [K, H, U]
    count: jax.Array
    u_prev: jax.Array


@registry.optimizers.register("cem-grad-bharadhwaj-tf")
@registry.optimizers.register("cem-grad-bharadhwaj")
class CEMGradBharadhwajOptimizer(Optimizer):
    def __init__(
        self,
        *,
        cem_outer_it: int = 2,
        cem_initial_action_stdev: float = 2.0,
        cem_stdev_min: float = 1e-6,
        cem_best_k: int = 8,
        learning_rate: float = 0.05,
        adam_beta_1: float = 0.9,
        adam_beta_2: float = 0.999,
        adam_epsilon: float = 1e-8,
        gradmax_clip: float = 5.0,
        warmup: bool = False,
        warmup_iterations: int = 250,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.cem_outer_it = int(cem_outer_it)
        self.cem_initial_action_stdev = float(cem_initial_action_stdev)
        self.cem_stdev_min = float(cem_stdev_min)
        self.cem_best_k = int(cem_best_k)
        if self.cem_best_k > self.num_rollouts:
            # Fail loudly at construction, not inside lax.top_k at trace
            # time (the reference default best_k=40 pairs with K=200; the
            # base-class default K=32 would otherwise explode on step 1).
            raise ValueError(
                f"cem_best_k={self.cem_best_k} exceeds num_rollouts="
                f"{self.num_rollouts}"
            )
        self.learning_rate = float(learning_rate)
        self.adam_beta_1 = float(adam_beta_1)
        self.adam_beta_2 = float(adam_beta_2)
        self.adam_epsilon = float(adam_epsilon)
        self.gradmax_clip = float(gradmax_clip)
        self.warmup = bool(warmup)
        self.warmup_iterations = int(warmup_iterations)

    def _init_state(self, key):
        K, H, U = self.num_rollouts, self.mpc_horizon, self.num_control_inputs
        u_mid = 0.5 * (self.action_low + self.action_high)
        return CEMGradState(
            key=key,
            dist_mue=jnp.broadcast_to(u_mid, (1, H, U)).astype(jnp.float32),
            stdev=jnp.full((1, H, U), self.cem_initial_action_stdev, jnp.float32),
            adam=adam_init((K, H, U)),
            count=jnp.zeros((), jnp.int32),
            u_prev=jnp.zeros((U,), jnp.float32),
        )

    def _make_step_fn(self):
        K, H, U = self.num_rollouts, self.mpc_horizon, self.num_control_inputs
        S = self.num_states
        low, high = self.action_low, self.action_high
        best_k = self.cem_best_k
        lr, b1, b2, eps = self.learning_rate, self.adam_beta_1, self.adam_beta_2, self.adam_epsilon
        gclip = self.gradmax_clip
        u_mid = 0.5 * (self.action_low + self.action_high)

        # Fused Pallas gradient kernel on TPU; jax.grad via scan otherwise.
        grad_fn, cost_only = self._make_grad_and_cost_only()
        # [K,H,U] population in carry/diag only when logging reads it.
        want_Q = self.optimizer_logging

        def outer_iter(carry, s_tiled, u_prev, params):
            key, sub = jax.random.split(carry["key"])
            resampled = carry["mue"] + carry["std"] * jax.random.normal(
                sub, (K - best_k, H, U), jnp.float32
            )
            Q = jnp.concatenate([carry["elite_Q"], resampled], axis=0)
            Q = jnp.clip(Q, low, high)

            dQ = grad_fn(Q, s_tiled, u_prev, params)
            dQ = clip_by_norm(dQ, gclip, axes=(1, 2))
            adam, delta = adam_update(carry["adam"], dQ, lr, b1, b2, eps)
            Qn = jnp.clip(Q - delta, low, high)

            if cost_only is not None:
                cost = cost_only(s_tiled, Qn, u_prev, params)
            else:
                cost, traj = self._rollout_and_cost(s_tiled, Qn, u_prev, params)
            idx = elite_indices(cost, best_k)
            elite_Q = Qn[idx]
            out = {
                "key": key, "adam": adam,
                "mue": jnp.mean(elite_Q, axis=0, keepdims=True),
                "std": jnp.std(elite_Q, axis=0, keepdims=True),
                "elite_Q": elite_Q, "cost": cost,
            }
            if want_Q:
                out["Q"] = Qn
            if cost_only is None:
                out["traj"] = traj
            return out

        def step_fn(state: CEMGradState, s, params):
            s_tiled = jnp.tile(s[:1], (K, 1))
            key, sub = jax.random.split(state.key)
            # Fresh elite seed sample each control step (reference :163).
            elite_seed = state.dist_mue + state.stdev * jax.random.normal(
                sub, (best_k, H, U), jnp.float32
            )
            # Static trip count when warmup is off: lets XLA lower a
            # fixed-bound loop (unrollable) instead of a while_loop.
            if self.warmup:
                iterations = jnp.where(
                    state.count == 0, self.warmup_iterations, self.cem_outer_it
                )
            else:
                iterations = self.cem_outer_it
            carry = {
                "key": key, "adam": state.adam,
                "mue": state.dist_mue, "std": state.stdev,
                "elite_Q": elite_seed,
                "cost": jnp.zeros((K,), jnp.float32),
            }
            if want_Q:
                carry["Q"] = jnp.zeros((K, H, U), jnp.float32)
            if cost_only is None:
                carry["traj"] = jnp.zeros((K, H + 1, S), jnp.float32)
            carry = jax.lax.fori_loop(
                0, iterations,
                lambda i, c: outer_iter(c, s_tiled, state.u_prev, params),
                carry,
            )

            u = carry["elite_Q"][0, 0, :]

            # apply_time_delta (reference :134-146); the 10.0 upper clip is
            # REFERENCE-faithful (optimizer_cem_grad_bharadhwaj_tf.py:140).
            std = jnp.clip(carry["std"], self.cem_stdev_min, 10.0)
            std = jnp.concatenate(
                [std[:, 1:, :],
                 jnp.full((1, 1, U), self.cem_initial_action_stdev, jnp.float32)],
                axis=1,
            )
            mue = jnp.concatenate(
                [carry["mue"][:, 1:, :],
                 jnp.broadcast_to(u_mid, (1, 1, U)).astype(jnp.float32)],
                axis=1,
            )

            diag = {
                "J_logged": carry["cost"],
                "u_nom": carry["elite_Q"][:1],
            }
            if want_Q:
                diag["Q_logged"] = carry["Q"]
            if cost_only is None:
                diag["rollout_trajectories_logged"] = carry["traj"]
            new_state = CEMGradState(
                key=carry["key"], dist_mue=mue, stdev=std, adam=carry["adam"],
                count=state.count + 1, u_prev=u,
            )
            return u, new_state, diag

        return step_fn
