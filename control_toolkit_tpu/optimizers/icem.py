"""iCEM — improved Cross-Entropy Method planner.

Beyond-the-reference optimizer (the reference zoo stops at vanilla CEM,
/root/reference/Optimizers/optimizer_cem_tf.py): implements Pinneri et al.,
"Sample-efficient Cross-Entropy Method for Real-time Planning" (CoRL 2020),
the de-facto modern sampling MPC baseline.  Differences from vanilla CEM:

* **Colored-noise sampling**: perturbations are drawn with a power-law
  spectrum ``(1/f)^beta`` over the horizon (``ops/colored_noise.py``), so
  candidate action sequences are temporally correlated — far better
  exploration on underactuated tasks than white noise.
* **Elite buffer across iterations AND control steps**: a fraction of the
  previous elite set is re-injected into every population (shifted one
  step at the control-step boundary), so good solutions survive refits.
* **Mean candidate**: the current distribution mean itself is evaluated as
  one population member, guaranteeing the executed plan is never worse
  than the mean (the paper's "add mean" trick).
* Executes the first action of the best elite, like vanilla CEM.

Deliberately NOT ported: the paper's per-iteration population decay
(K_i = max(K * gamma^-i, 2k)) exists to save CPU time on small batches;
under XLA a static K is one compiled program and the extra samples are
statistically free on the TPU's batch dimension, so every iteration uses
the full K (documented TPU-first deviation).

Shared semantics with vanilla CEM (sigma clip + one-step time shift of mu
and sigma, warmup trip count) follow the reference optimizer_cem_tf.py
:92-104 so the optimizer drops into the same controller contract.  The
population is assembled in XLA and evaluated through ``_make_cost_only``,
i.e. it rides the modular Pallas rollout kernel on TPU.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from control_toolkit_tpu.ops.colored_noise import powerlaw_psd_gaussian
from control_toolkit_tpu.ops.common import elite_indices
from control_toolkit_tpu.optimizers.base import Optimizer
from control_toolkit_tpu.optimizers.cem import (
    cem_base_carry,
    cem_diag,
    cem_shift_distribution,
    cem_trip_count,
)
from control_toolkit_tpu.utils import registry


class ICEMState(NamedTuple):
    key: jax.Array
    dist_mue: jax.Array   # [1, H, U]
    stdev: jax.Array      # [1, H, U]
    elites: jax.Array     # [n_keep, H, U] elite buffer (already time-shifted)
    count: jax.Array      # scalar int32 control-step counter
    u_prev: jax.Array     # [U]


@registry.optimizers.register("icem-tf")
@registry.optimizers.register("icem")
class ICEMOptimizer(Optimizer):
    def __init__(
        self,
        *,
        cem_outer_it: int = 3,
        cem_initial_action_stdev: float = 0.5,
        cem_stdev_min: float = 0.01,
        cem_best_k: int = 40,
        icem_colored_noise_beta: float = 2.0,
        icem_keep_elites_frac: float = 0.3,
        icem_add_mean_sample: bool = True,
        warmup: bool = False,
        warmup_iterations: int = 100,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.cem_outer_it = int(cem_outer_it)
        self.cem_initial_action_stdev = float(cem_initial_action_stdev)
        self.cem_stdev_min = float(cem_stdev_min)
        self.cem_best_k = int(cem_best_k)
        self.beta = float(icem_colored_noise_beta)
        self.n_keep = max(0, int(round(
            float(icem_keep_elites_frac) * self.cem_best_k
        )))
        self.add_mean = bool(icem_add_mean_sample)
        self.warmup = bool(warmup)
        self.warmup_iterations = int(warmup_iterations)
        if self.cem_best_k > self.num_rollouts:
            raise ValueError(
                f"cem_best_k={self.cem_best_k} exceeds num_rollouts="
                f"{self.num_rollouts}"
            )
        if self.n_keep > self.cem_best_k:
            # The elite buffer refills from the top-best_k rows each outer
            # iteration; a larger buffer would fail at trace time with an
            # opaque fori_loop carry-structure error.
            raise ValueError(
                f"icem_keep_elites_frac={icem_keep_elites_frac} keeps "
                f"{self.n_keep} elites but only cem_best_k={self.cem_best_k} "
                "are selected (frac must be <= 1)"
            )
        self._n_fresh = self.num_rollouts - self.n_keep - int(self.add_mean)
        if self._n_fresh <= 0:
            raise ValueError(
                f"num_rollouts={self.num_rollouts} leaves no room for fresh "
                f"samples after {self.n_keep} kept elites"
                f"{' + the mean candidate' if self.add_mean else ''}"
            )

    def _init_state(self, key):
        H, U = self.mpc_horizon, self.num_control_inputs
        u_mid = 0.5 * (self.action_low + self.action_high)
        mue = jnp.broadcast_to(u_mid, (1, H, U)).astype(jnp.float32)
        return ICEMState(
            key=key,
            dist_mue=mue,
            stdev=jnp.full((1, H, U), self.cem_initial_action_stdev,
                           jnp.float32),
            elites=jnp.broadcast_to(u_mid, (self.n_keep, H, U)).astype(
                jnp.float32
            ),
            count=jnp.zeros((), jnp.int32),
            u_prev=jnp.zeros((U,), jnp.float32),
        )

    def _apply_policy_guess(self, state, plan):
        """Center the sampling distribution AND the elite buffer on a
        heuristic-policy rollout (base Optimizer ``initial_guess_policy``):
        iCEM re-injects elites into every population, so a stale mid-range
        elite row would otherwise compete with the seeded mean."""
        plan = plan.astype(state.dist_mue.dtype)
        return state._replace(
            dist_mue=plan[None],
            elites=jnp.broadcast_to(plan, state.elites.shape),
        )

    def _make_step_fn(self):
        K, H, U = self.num_rollouts, self.mpc_horizon, self.num_control_inputs
        low, high = self.action_low, self.action_high
        best_k, n_keep, n_fresh = self.cem_best_k, self.n_keep, self._n_fresh
        add_mean, beta = self.add_mean, self.beta
        u_mid = 0.5 * (low + high)
        cost_only = None if self.optimizer_logging else self._make_cost_only()
        want_Q = self.optimizer_logging

        def outer_iter(carry, s_tiled, u_prev, params):
            key, mue, std, buf = (
                carry["key"], carry["mue"], carry["std"], carry["buf"]
            )
            key, sub = jax.random.split(key)
            # Colored noise correlates along the horizon axis: draw
            # [n_fresh, U, H] so the FFT runs over H, then transpose.
            noise = powerlaw_psd_gaussian(
                sub, beta, H, (n_fresh, U)
            ).transpose(0, 2, 1)                             # [n_fresh, H, U]
            rows = [mue + noise * std]
            if n_keep:
                rows.append(buf)
            if add_mean:
                rows.append(mue)
            Q = jnp.clip(jnp.concatenate(rows, axis=0), low, high)  # [K,H,U]
            if cost_only is not None:
                cost = cost_only(s_tiled, Q, u_prev, params)
            else:
                cost, traj = self._rollout_and_cost(s_tiled, Q, u_prev, params)
            idx = elite_indices(cost, best_k)
            elite_Q = Q[idx]
            out = {
                "key": key,
                "mue": jnp.mean(elite_Q, axis=0, keepdims=True),
                "std": jnp.std(elite_Q, axis=0, keepdims=True),
                "buf": elite_Q[:n_keep],
                "elite0": elite_Q[0],
                "cost": cost,
            }
            if want_Q:
                out["Q"] = Q
            if cost_only is None:
                out["traj"] = traj
            return out

        def step_fn(state: ICEMState, s, params):
            s_tiled = jnp.tile(s[:1], (K, 1))
            iterations = cem_trip_count(self, state.count)
            carry = cem_base_carry(
                state.key, state.dist_mue, state.stdev,
                K, H, U, self.num_states, want_Q, cost_only is None,
            )
            carry["buf"] = state.elites
            carry = jax.lax.fori_loop(
                0, iterations,
                lambda i, c: outer_iter(c, s_tiled, state.u_prev, params),
                carry,
            )

            u = carry["elite0"][0, :]
            mue, std = cem_shift_distribution(
                carry["mue"], carry["std"], u_mid,
                self.cem_stdev_min, self.cem_initial_action_stdev, U,
            )
            # Elite buffer shifts with time too (iCEM "shift elites"): the
            # tail repeats each elite's final action, so the re-injected
            # plans stay aligned with the new horizon window.
            buf = jnp.concatenate(
                [carry["buf"][:, 1:, :], carry["buf"][:, -1:, :]], axis=1
            )
            diag = cem_diag(carry, want_Q, cost_only is None)
            new_state = ICEMState(
                key=carry["key"], dist_mue=mue, stdev=std, elites=buf,
                count=state.count + 1, u_prev=u,
            )
            return u, new_state, diag

        return step_fn
