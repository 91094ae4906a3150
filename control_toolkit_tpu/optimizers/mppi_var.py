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
  scaling standard MPPI applies to its fixed stdev),
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

TPU notes: the whole tick is one jitted pure function; cost evaluation uses
the fused Pallas rollout+cost kernel when available (the variance gradient
needs only the costs and the eps draws, both of which live in XLA).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.ops.interpolation import Interpolator
from control_toolkit_tpu.optimizers.base import Optimizer
from control_toolkit_tpu.optimizers.mppi import (
    make_correction_cost,
    make_reward_weighted_average,
)
from control_toolkit_tpu.utils import registry


class MPPIVarState(NamedTuple):
    key: jax.Array
    u_nom: jax.Array   # [1, H, U] nominal plan
    u_prev: jax.Array  # [U] last applied control
    stdev: jax.Array   # [U] adaptive per-input sampling stdev


@registry.optimizers.register("mppi-var-tf")
@registry.optimizers.register("mppi-var")
class MPPIVarOptimizer(Optimizer):
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
        super().__init__(**kwargs)
        self.cc_weight = float(cc_weight)
        self.R = float(R)
        self.LBD = float(LBD_mc)
        self.NU = float(NU_mc)
        self._SQRTRHOINV = float(SQRTRHOINV_mc)
        self.LR = float(LR)
        self.STDEV_min = float(STDEV_min)
        self.STDEV_max = float(STDEV_max)
        self.max_grad_norm = float(max_grad_norm)
        self.period_interpolation_inducing_points = int(
            period_interpolation_inducing_points
        )

    def configure(self, num_states, num_control_inputs, dt=None, **kwargs):
        if dt is None:
            raise ValueError("MPPI-var requires dt (mpc_timestep)")
        self.SQRTRHODTINV = self._SQRTRHOINV / float(np.sqrt(dt))
        self.interp = Interpolator.build(
            self.mpc_horizon, self.period_interpolation_inducing_points
        )
        super().configure(num_states, num_control_inputs, dt=dt, **kwargs)

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

    def _make_step_fn(self):
        K, H, U = self.num_rollouts, self.mpc_horizon, self.num_control_inputs
        P = self.interp.number_of_interpolation_inducing_points
        low, high = self.action_low, self.action_high
        cc_weight, R, LBD, NU = self.cc_weight, self.R, self.LBD, self.NU
        LR = self.LR
        smin, smax = self.STDEV_min, self.STDEV_max
        gmax = self.max_grad_norm
        interp = self.interp
        want_opt_traj = self.calculate_optimal_trajectory

        cost_only = None if self.optimizer_logging else self._make_cost_only()
        fuse = cost_only is not None

        # Same update math as MPPI's scan path (shared helpers keep the
        # LR=0 bitwise-parity contract maintainable), with the
        # "mathematically correct" parameter set.
        correction_cost = make_correction_cost(cc_weight, R, NU)
        reward_weighted_average = make_reward_weighted_average(LBD)

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
                traj = self.predictor.rollout(s_tiled, u_run, params["dyn"])
                base_cost = self.cost_function.get_trajectory_cost(
                    traj, u_run, state.u_prev, self._cost_params(params)
                )
            S = base_cost + correction_cost(u_run, delta_u)

            u_nom = jnp.clip(
                u_nom + reward_weighted_average(S, delta_u)[None], low, high
            )
            u = u_nom[0, 0, :]

            # --- variance adaptation (see module docstring) -----------------
            # Score-function gradient of E[S] w.r.t. sigma with the
            # population-mean baseline; LR = 0 makes the whole block a no-op
            # multiply, preserving paper-MPPI semantics exactly.
            advantage = S - jnp.mean(S, axis=0)                    # [K]
            score = jnp.sum(eps**2 - 1.0, axis=1) / state.stdev    # [K, U]
            grad = jnp.mean(advantage[:, None] * score, axis=0)    # [U]
            gnorm = jnp.sqrt(jnp.sum(grad**2))
            grad = grad * jnp.minimum(1.0, gmax / jnp.maximum(gnorm, 1e-12))
            stdev = jnp.clip(state.stdev - LR * grad, smin, smax)

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
