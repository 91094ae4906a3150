"""MPPI-var — MPPI with adaptive sampling variance.

The reference *documents* this optimizer's full hyperparameter schema
(/root/reference/Control_Toolkit_ASF_Template/config_optimizers.yml:188-201:
``LBD_mc``, ``SQRTRHOINV_mc``, ``NU_mc``, ``LR`` "learning rate for adaption
of variance, set to 0 to retrieve a mppi version in accordance with mppi
paper", ``STDEV_min``, ``STDEV_max``, ``max_grad_norm``) but does not ship
its implementation in-tree.  This module is a principled reconstruction of
the documented semantics, NOT a translation of unseen code:

* the sampling stdev is a per-control-input *state variable* ``sigma`` (one
  scalar per input, initialized at ``SQRTRHOINV_mc/sqrt(dt)`` — the same
  scaling standard MPPI applies to its fixed stdev — clamped into the
  documented bounds),
* each tick runs a standard MPPI update (perturbations at inducing points,
  linear interpolation, correction cost with ``NU_mc``/``R``/``cc_weight``,
  softmax weights ``exp(-(S-rho)/LBD_mc)``) using the *current* sigma,
* sigma then takes one gradient step on the expected trajectory cost under
  the sampling distribution, estimated score-function style (REINFORCE with
  the population-mean baseline):

      d E[S] / d sigma_j  ~=  mean_k [ (S_k - mean S) * d log p(eps_k)/d sigma_j ]
      d log p / d sigma_j  =  sum_p (eps_{kpj}^2 - 1) / sigma_j

  (eps are the standard-normal draws at the P inducing points), the gradient
  vector is norm-clipped to ``max_grad_norm``, and sigma is clamped to
  ``[STDEV_min, STDEV_max]``.

With ``LR = 0`` the sigma update is a no-op and every remaining operation is
the reference MPPI step — verified bitwise against MPPIOptimizer's scan path
in tests/test_mppi_var.py.

TPU notes: subclasses MPPIOptimizer, so it inherits the semi-fused execution
mode (jax.random draws at inducing points streamed into the fused
interp+clip+rollout+cost kernel, ops/pallas_mppi.py make_run.external); the
per-input sigma scales the tile-layout draws in XLA and the variance
gradient is one einsum over the same tiles.  Falls back to the scan path
(with the Pallas cost-only kernel) exactly like MPPI.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from control_toolkit_tpu.optimizers.mppi import (
    MPPIOptimizer,
    make_correction_cost,
    make_reward_weighted_average,
)
from control_toolkit_tpu.utils import registry
from control_toolkit_tpu.utils.logging_util import get_logger

logger = get_logger(__name__)


class MPPIVarState(NamedTuple):
    key: jax.Array
    u_nom: jax.Array   # [1, H, U] nominal plan
    u_prev: jax.Array  # [U] last applied control
    stdev: jax.Array   # [U] adaptive per-input sampling stdev


@registry.optimizers.register("mppi-var-tf")
@registry.optimizers.register("mppi-var")
class MPPIVarOptimizer(MPPIOptimizer):
    def __init__(
        self,
        *,
        cc_weight: float = 1.0,
        R: float = 1.0,
        LBD_mc: float = 10.0,
        SQRTRHOINV_mc: float = 0.002,
        NU_mc: float = 20.0,
        LR: float = 1000.0,
        STDEV_min: float = 0.01,
        STDEV_max: float = 10.0,
        max_grad_norm: float = 100000.0,
        period_interpolation_inducing_points: int = 10,
        **kwargs,
    ):
        # mppi-var's documented schema carries the MPPI knobs with the _mc
        # suffix; plain-MPPI keys would collide with the hard-wired
        # forwarding below (duplicate-keyword TypeError), and the fused
        # update / Adam-refinement options don't exist in the mppi-var step
        # paths — drop all of them loudly instead of crashing or silently
        # accepting an inert option.
        for k in ("LBD", "NU", "SQRTRHOINV", "fully_fused",
                  "optim_steps", "bounded_update"):
            if k in kwargs:
                logger.warning(
                    f"mppi-var ignores config key {k!r} "
                    "(use the _mc-suffixed schema; optim_steps/bounded_update/"
                    "fully_fused are plain-MPPI options)"
                )
                kwargs.pop(k)
        super().__init__(
            cc_weight=cc_weight, R=R, LBD=LBD_mc, NU=NU_mc,
            SQRTRHOINV=SQRTRHOINV_mc,
            period_interpolation_inducing_points=period_interpolation_inducing_points,
            fully_fused=False,  # the two-pass kernel's update is plain MPPI
            **kwargs,
        )
        self.LR = float(LR)
        self.STDEV_min = float(STDEV_min)
        self.STDEV_max = float(STDEV_max)
        self.max_grad_norm = float(max_grad_norm)

    def _init_state(self, key):
        u_mid = 0.5 * (self.action_low + self.action_high)
        u_nom = jnp.broadcast_to(
            u_mid, (1, self.mpc_horizon, self.num_control_inputs)
        ).astype(jnp.float32)
        return MPPIVarState(
            key=key,
            u_nom=u_nom,
            u_prev=jnp.zeros((self.num_control_inputs,), jnp.float32),
            # The documented [STDEV_min, STDEV_max] contract holds from the
            # very first sample, not just after the first adaptation step.
            stdev=jnp.clip(
                jnp.full(
                    (self.num_control_inputs,), self.SQRTRHODTINV, jnp.float32
                ),
                self.STDEV_min, self.STDEV_max,
            ),
        )

    def _apply_stdev_update(self, stdev, grad):
        """Shared tail of the sigma update: norm-clip the raw gradient, take
        the LR step, clamp into [STDEV_min, STDEV_max].  Both execution
        modes (scan and semi-fused) MUST route through this so a change to
        the clipping rule can never diverge between them."""
        gnorm = jnp.sqrt(jnp.sum(grad**2))
        grad = grad * jnp.minimum(
            1.0, self.max_grad_norm / jnp.maximum(gnorm, 1e-12)
        )
        return jnp.clip(stdev - self.LR * grad, self.STDEV_min, self.STDEV_max)

    def _stdev_step(self, stdev, advantage, sq_sum, P):
        """One clipped score-function step on sigma; LR = 0 is a no-op.

        advantage: [K]; sq_sum: [K, U] = sum_p eps_raw_{kpj}^2 over the P
        inducing points (eps_raw = standard-normal draws).
        """
        grad = jnp.mean(advantage[:, None] * (sq_sum - P) / stdev, axis=0)
        return self._apply_stdev_update(stdev, grad)

    def _make_batched_var_step(self, num_slots: int, interpret: bool = False,
                               tile_k: int = None,
                               per_slot_dyn=(), per_slot_cost=()):
        """B-session mppi-var step for BatchedMPC (columnwise kernel path).

        Reuses the batched semi-fused MPPI machinery
        (MPPIOptimizer._make_batched_semi_fused_step ``update_from_eps`` —
        one columnwise rollout+cost launch for all B sessions) with two
        mppi-var-specific pieces in XLA: the raw per-session draws are
        scaled by each session's adaptive ``stdev [U]`` before entering
        the kernel, and the per-session score-function variance adaptation
        (the einsum of _make_step_fn's semi-fused path, per session) runs
        on the same reshaped blocks.  Per-session PRNG streams as in the
        base batched step; with ``LR = 0`` the step is bitwise the batched
        MPPI step (sigma frozen at its initial clamp).

        Returns ``step(states, s [B,1,S], dyn, cost, attrs) ->
        (u [B,U], states', costs [B,K])`` over the stacked MPPIVarState.
        """
        from control_toolkit_tpu.ops.pallas_mppi import DEFAULT_TILE_K, ROWS

        B, K = int(num_slots), self.num_rollouts
        U = self.num_control_inputs
        P = self.interp.number_of_interpolation_inducing_points
        tile = tile_k or DEFAULT_TILE_K
        cps = K // ROWS
        T = (B * K) // tile
        C = tile // ROWS
        _, update_from_eps = self._make_batched_semi_fused_step(
            B, interpret=interpret, tile_k=tile,
            per_slot_dyn=per_slot_dyn, per_slot_cost=per_slot_cost,
        )

        def step(states, s, dyn, cost, attrs):
            keys = jax.vmap(lambda k: jax.random.split(k))(states.key)
            new_keys, sample_keys = keys[:, 0], keys[:, 1]
            eps_raw = jax.vmap(
                lambda k: jax.random.normal(
                    k, (U, P * ROWS, cps), dtype=jnp.float32
                )
            )(sample_keys)                                  # [B,U,PR,cps]
            eps_slots = eps_raw * states.stdev[:, :, None, None]
            eps = (
                eps_slots.transpose(1, 2, 0, 3)
                .reshape(U, P * ROWS, T, C)
                .transpose(2, 0, 1, 3)
            )                                               # [T,U,PR,C]
            u_nom_new, costs = update_from_eps(
                states, s, dyn, cost, attrs, eps
            )                                               # costs [B,K]
            u = u_nom_new[:, 0, :]

            # Per-session variance adaptation (k = r*cps + cw layout).
            adv = costs - jnp.mean(costs, axis=1, keepdims=True)
            adv3 = adv.reshape(B, ROWS, cps)
            raw5 = eps_raw.reshape(B, U, P, ROWS, cps)
            sq = jnp.einsum("brc,buprc->bu", adv3, raw5**2)
            grad = (
                sq / K - jnp.mean(adv, axis=1)[:, None] * P
            ) / states.stdev
            stdev = jax.vmap(self._apply_stdev_update)(states.stdev, grad)

            new_states = MPPIVarState(
                key=new_keys, u_nom=u_nom_new[:, None], u_prev=u, stdev=stdev
            )
            return u, new_states, costs

        return step

    def _make_step_fn(self):
        K, H, U = self.num_rollouts, self.mpc_horizon, self.num_control_inputs
        P = self.interp.number_of_interpolation_inducing_points
        low, high = self.action_low, self.action_high
        LBD = self.LBD
        interp = self.interp
        want_opt_traj = self.calculate_optimal_trajectory

        correction_cost = make_correction_cost(self.cc_weight, self.R, self.NU)
        reward_weighted_average = make_reward_weighted_average(
            LBD, self.weighting)

        # ---- semi-fused TPU path (mirrors MPPIOptimizer's, plus the sigma
        # scaling of the raw draws and the variance-adaptation einsum) ------
        from control_toolkit_tpu.ops.pallas_mppi import (
            DEFAULT_TILE_K, ROWS,
        )

        # Same explicit tile guard as MPPIOptimizer._make_step_fn:
        # _can_use_pallas checks pallas_rollout's tile constant, this path
        # tiles with pallas_mppi's (independent knobs that agree today).
        semi_fused_tiles_ok = (
            K % (DEFAULT_TILE_K * max(1, self._n_shard_devices())) == 0
        )
        if (self.semi_fused and not self.optimizer_logging
                and not want_opt_traj and self._can_use_pallas()
                and semi_fused_tiles_ok):

            _, pack, make_run = self._build_fused_mppi(build_step=False)
            # Learned value terminal rides the same emit_terminal + post
            # machinery as plain MPPI (see optimizers/mppi.py).
            post = self._post_terminal_fn()
            if self._mesh is not None:
                cost_kernel = make_run.external(
                    K, mesh=self._mesh, axis=self._shard_axes,
                    emit_terminal=post is not None,
                )
            else:
                cost_kernel = make_run.external(
                    K, emit_terminal=post is not None
                )
            T = K // DEFAULT_TILE_K
            C = DEFAULT_TILE_K // ROWS
            W_mat = jnp.asarray(self.interp.matrix, jnp.float32)  # [P, H]
            from control_toolkit_tpu.optimizers.mppi import (
                make_semi_fused_update,
            )
            sf_update = make_semi_fused_update(
                cost_kernel, pack, W_mat, LBD, low, high, ROWS, T, C, P, U,
                post=post, cost_params=self._cost_params,
                horizon=self.mpc_horizon, weighting=self.weighting,
            )

            def semi_fused_step_fn(state: MPPIVarState, s, params):
                key, sample_key = jax.random.split(state.key)
                u_nom = jnp.concatenate(
                    [state.u_nom[:, 1:, :], state.u_nom[:, -1:, :]], axis=1
                )
                eps_raw = jax.random.normal(
                    sample_key, (T, U, P * ROWS, C), dtype=jnp.float32
                )
                eps = eps_raw * state.stdev[None, :, None, None]
                # Shared MPPI update body (optimizers/mppi.py) — only the
                # sigma scaling above and the adaptation below are ours.
                u_nom, costs2d = sf_update(s, u_nom, state.u_prev, params, eps)
                u = u_nom[0, 0, :]

                # variance adaptation on the same tiles
                adv3 = (costs2d - jnp.mean(costs2d)).reshape(ROWS, T, C)
                raw5 = eps_raw.reshape(T, U, P, ROWS, C)
                # sum_k adv_k * sum_p eps_raw^2  per input j:
                sq = jnp.einsum("rtc,tuprc->u", adv3, raw5**2)
                grad = (sq / K - jnp.mean(adv3) * P) / state.stdev
                stdev = self._apply_stdev_update(state.stdev, grad)

                diag = {"u_nom": u_nom, "stdev_logged": stdev,
                        "J_logged": costs2d.reshape(-1)}
                return u, MPPIVarState(
                    key=key, u_nom=u_nom, u_prev=u, stdev=stdev
                ), diag

            return semi_fused_step_fn

        # ---- scan path (CPU / logging / small K) ---------------------------
        cost_only = None if self.optimizer_logging else self._make_cost_only()
        fuse = cost_only is not None

        def step_fn(state: MPPIVarState, s, params):
            key, sample_key = jax.random.split(state.key)
            s_tiled = jnp.tile(s[:1], (K, 1))

            u_nom = jnp.concatenate(
                [state.u_nom[:, 1:, :], state.u_nom[:, -1:, :]], axis=1
            )

            eps = jax.random.normal(sample_key, (K, P, U), dtype=jnp.float32)
            delta_u = interp.interpolate(eps * state.stdev)
            u_run = jnp.clip(u_nom + delta_u, low, high)

            if fuse:
                base_cost = cost_only(s_tiled, u_run, state.u_prev, params)
                traj = None
            else:
                base_cost, traj = self._rollout_and_cost(
                    s_tiled, u_run, state.u_prev, params
                )
            S = base_cost + correction_cost(u_run, delta_u)

            u_nom = jnp.clip(
                u_nom + reward_weighted_average(S, delta_u)[None], low, high
            )
            u = u_nom[0, 0, :]

            # --- variance adaptation (see module docstring) -----------------
            advantage = S - jnp.mean(S, axis=0)                    # [K]
            sq_sum = jnp.sum(eps**2, axis=1)                       # [K, U]
            stdev = self._stdev_step(state.stdev, advantage, sq_sum, P)

            diag = {"u_nom": u_nom, "stdev_logged": stdev}
            if not fuse:
                diag.update({
                    "Q_logged": u_run,
                    "J_logged": S,
                    "rollout_trajectories_logged": traj,
                })
            if want_opt_traj:
                diag["optimal_trajectory"] = self.predictor.rollout(
                    s[:1], u_nom, params["dyn"]
                )
            return u, MPPIVarState(
                key=key, u_nom=u_nom, u_prev=u, stdev=stdev
            ), diag

        return step_fn
