"""CEM with a 2-component Gaussian-mixture sampling distribution.

Capability parity with the reference optimizer_cem_gmm_tf
(/root/reference/Optimizers/optimizer_cem_gmm_tf.py:14-138): sample K
sequences from a 2-component GMM, select top-k elites, cluster the elites to
the nearest of the top-2 by Frobenius distance, refit each component to its
cluster, set the mixture weight to the cluster fraction, and time-shift both
component means/stds each control step.

TPU-native redesign: tensorflow_probability's MixtureSameFamily is replaced
by explicit categorical + normal sampling, and the dynamic-size elite
clustering (boolean_mask in the reference :76-78) becomes fully static
masked means/stds so everything stays inside one jitted step.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from control_toolkit_tpu.ops.common import elite_indices
from control_toolkit_tpu.optimizers.base import Optimizer
from control_toolkit_tpu.utils import registry


class CEMGMMState(NamedTuple):
    key: jax.Array
    comp_mue: jax.Array   # [2, H, U]
    comp_std: jax.Array   # [2, H, U]
    mix_probs: jax.Array  # [2]
    u_prev: jax.Array     # [U]


def _masked_moments(x, mask):
    """Mean/std of x[i] where mask[i], guarding the empty-cluster case.

    x: [k, H, U], mask: [k] boolean.  Returns ([H,U], [H,U]).
    """
    w = mask.astype(jnp.float32)
    count = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.einsum("k,khu->hu", w, x) / count
    var = jnp.einsum("k,khu->hu", w, (x - mean) ** 2) / count
    return mean, jnp.sqrt(var)


def gmm_cluster_refit(elite_Q, std_min):
    """Cluster elites to the nearest of the top-2 by Frobenius distance and
    refit both mixture components (reference optimizer_cem_gmm_tf.py:73-90):
    elite 0 seeds cluster 0, elite 1 seeds cluster 1, ties go to cluster 0
    (tf.argmin first-index semantics); the mixture weight is the cluster
    fraction.  Static shapes via masked moments.

    elite_Q: [k, H, U] sorted best-first. Returns (mue [2,H,U],
    std [2,H,U], probs [2]).
    """
    best_k = elite_Q.shape[0]
    d0 = jnp.sqrt(jnp.sum((elite_Q - elite_Q[0]) ** 2, axis=(1, 2)))
    d1 = jnp.sqrt(jnp.sum((elite_Q - elite_Q[1]) ** 2, axis=(1, 2)))
    to_c1 = d1 < d0
    to_c1 = to_c1.at[0].set(False).at[1].set(True)

    m0, s0 = _masked_moments(elite_Q, ~to_c1)
    m1, s1 = _masked_moments(elite_Q, to_c1)
    n0 = jnp.sum((~to_c1).astype(jnp.float32))
    prob0 = n0 / best_k
    mue = jnp.stack([m0, m1])
    std = jnp.stack([
        jnp.clip(s0, std_min, 1.0e4),
        jnp.clip(s1, std_min, 1.0e4),
    ])
    return mue, std, jnp.stack([prob0, 1.0 - prob0])


@registry.optimizers.register("cem-gmm-tf")
@registry.optimizers.register("cem-gmm")
class CEMGMMOptimizer(Optimizer):
    def __init__(
        self,
        *,
        cem_outer_it: int = 3,
        cem_initial_action_stdev: float = 0.5,
        cem_stdev_min: float = 0.01,
        cem_best_k: int = 40,
        **kwargs,
    ):
        super().__init__(**kwargs)
        if cem_best_k < 2:
            raise ValueError("cem-gmm needs cem_best_k >= 2 (two cluster seeds)")
        self.cem_outer_it = int(cem_outer_it)
        self.cem_initial_action_stdev = float(cem_initial_action_stdev)
        self.cem_stdev_min = float(cem_stdev_min)
        self.cem_best_k = int(cem_best_k)
        if self.cem_best_k > self.num_rollouts:
            # Same loud construction-time guard as CEM/iCEM: the reference
            # default best_k=40 pairs with K=200; the base-class default
            # K=32 would otherwise explode inside lax.top_k on step 1.
            raise ValueError(
                f"cem_best_k={self.cem_best_k} exceeds num_rollouts="
                f"{self.num_rollouts}"
            )

    def _apply_policy_guess(self, state, plan):
        """Center BOTH mixture components on the heuristic-policy rollout
        (base Optimizer ``initial_guess_policy``) — the CEM analogue
        (cem.py) seeds dist_mue; stdev keeps its reset width so the first
        elite clustering can still move away."""
        mue = jnp.broadcast_to(
            plan[None], state.comp_mue.shape
        ).astype(state.comp_mue.dtype)
        return state._replace(comp_mue=mue)

    def _init_state(self, key):
        H, U = self.mpc_horizon, self.num_control_inputs
        u_mid = 0.5 * (self.action_low + self.action_high)
        mue = jnp.broadcast_to(u_mid, (2, H, U)).astype(jnp.float32)
        std = jnp.full((2, H, U), self.cem_initial_action_stdev, jnp.float32)
        return CEMGMMState(
            key=key, comp_mue=mue, comp_std=std,
            mix_probs=jnp.array([0.5, 0.5], jnp.float32),
            u_prev=jnp.zeros((U,), jnp.float32),
        )

    def _make_step_fn(self):
        K, H, U = self.num_rollouts, self.mpc_horizon, self.num_control_inputs
        S = self.num_states
        low, high = self.action_low, self.action_high
        best_k = self.cem_best_k
        std_min = self.cem_stdev_min
        cost_only = None if self.optimizer_logging else self._make_cost_only()
        # [K,H,U] population in carry/diag only when logging reads it.
        want_Q = self.optimizer_logging

        def outer_iter(carry, s_tiled, u_prev, params):
            key, k_comp, k_norm = jax.random.split(carry["key"], 3)
            # GMM sampling: component index per rollout, then the component's
            # diagonal normal.
            comp = jax.random.categorical(
                k_comp, jnp.log(carry["probs"] + 1e-9), shape=(K,)
            )
            eps = jax.random.normal(k_norm, (K, H, U), jnp.float32)
            Q = carry["mue"][comp] + eps * carry["std"][comp]
            Q = jnp.clip(Q, low, high)

            if cost_only is not None:
                cost = cost_only(s_tiled, Q, u_prev, params)
            else:
                cost, traj = self._rollout_and_cost(s_tiled, Q, u_prev, params)
            idx = elite_indices(cost, best_k)
            elite_Q = Q[idx]  # [k, H, U], best first

            mue, std, probs = gmm_cluster_refit(elite_Q, std_min)

            out = {
                "key": key,
                "mue": mue,
                "std": std,
                "probs": probs,
                "elite0": elite_Q[0], "cost": cost,
            }
            if want_Q:
                out["Q"] = Q
            if cost_only is None:
                out["traj"] = traj
            return out

        def step_fn(state: CEMGMMState, s, params):
            s_tiled = jnp.tile(s[:1], (K, 1))
            carry = {
                "key": state.key, "mue": state.comp_mue, "std": state.comp_std,
                "probs": state.mix_probs,
                "elite0": jnp.zeros((H, U), jnp.float32),
                "cost": jnp.zeros((K,), jnp.float32),
            }
            if want_Q:
                carry["Q"] = jnp.zeros((K, H, U), jnp.float32)
            if cost_only is None:
                carry["traj"] = jnp.zeros((K, H + 1, S), jnp.float32)
            carry = jax.lax.fori_loop(
                0, self.cem_outer_it,
                lambda i, c: outer_iter(c, s_tiled, state.u_prev, params),
                carry,
            )

            u = carry["elite0"][0, :]

            # Time-shift both components (reference :113-122).
            mue = jnp.concatenate([carry["mue"][:, 1:, :], carry["mue"][:, -1:, :]], axis=1)
            std = jnp.concatenate([carry["std"][:, 1:, :], carry["std"][:, -1:, :]], axis=1)

            diag = {
                "J_logged": carry["cost"],
                "u_nom": carry["elite0"][None],
            }
            if want_Q:
                diag["Q_logged"] = carry["Q"]
            if cost_only is None:
                diag["rollout_trajectories_logged"] = carry["traj"]
            new_state = CEMGMMState(
                key=carry["key"], comp_mue=mue, comp_std=std,
                mix_probs=carry["probs"], u_prev=u,
            )
            return u, new_state, diag

        return step_fn
