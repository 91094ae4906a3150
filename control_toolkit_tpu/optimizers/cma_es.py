"""CMA-ES — Covariance Matrix Adaptation Evolution Strategy planner.

Beyond-the-reference optimizer (the reference zoo's sampling methods stop at
diagonal-Gaussian CEM, /root/reference/Optimizers/optimizer_cem_tf.py):
implements Hansen's CMA-ES ("The CMA Evolution Strategy: A Tutorial",
arXiv:1604.00772) over the flattened decision vector ``x = Q.reshape(H*U)``.
Unlike CEM's per-(h,u) independent refit, CMA-ES adapts a FULL covariance
over the whole plan, so it learns temporal correlations between actions
(the thing iCEM approximates with a fixed colored-noise prior) and cross-
input couplings, plus a cumulative step-size control that CEM lacks.

Implemented per the tutorial's default parameterization:

* rank-mu update from the ``mu`` best of ``K = num_rollouts`` samples with
  log-linear positive weights;
* rank-1 update from the evolution path ``p_c`` (with the ``h_sigma`` stall
  guard);
* cumulative step-size adaptation via the conjugate path ``p_sigma``
  measured in the ``C^{-1/2}`` metric;
* optional ``cma_diagonal`` (sep-CMA-ES, Ros & Hansen 2008): covariance
  restricted to the diagonal with learning rates scaled by ``(N+2)/3`` —
  O(N) per generation, the right choice for very long horizons.

TPU-first shape: each generation is one batched rollout of K plans through
``_make_cost_only`` (i.e. it rides the fused Pallas rollout kernels when
eligible), and the eigendecomposition of the [N,N] covariance (N = H*U,
tens of dims) is a trivially small ``jnp.linalg.eigh`` between the huge
batched rollouts.  All mutable quantities (mean, sigma, C, paths,
generation counter) live in the explicit state pytree; generations run
under ``lax.fori_loop`` so warmup can lengthen the first control step
without recompiling.

MPC plumbing follows the zoo conventions: bound handling by repair
(samples are clipped for evaluation and the clipped displacement feeds the
updates), the executed control is the first action of the best EVALUATED
member of the final generation (never an unevaluated mean — the optional
mean candidate row makes the mean itself compete), and at the control-step
boundary the mean time-shifts one step (reference warm-start semantics,
optimizer_cem_tf.py:99-104) while sigma, C and the paths carry over.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from control_toolkit_tpu.ops.common import elite_indices
from control_toolkit_tpu.optimizers.base import Optimizer
from control_toolkit_tpu.utils import registry


class CMAESState(NamedTuple):
    key: jax.Array
    mean: jax.Array      # [N] flattened plan, N = H*U
    sigma: jax.Array     # scalar step size
    C: jax.Array         # [N,N] covariance (or [N] diagonal in sep-CMA mode)
    p_sigma: jax.Array   # [N] conjugate evolution path
    p_c: jax.Array       # [N] covariance evolution path
    gen: jax.Array       # scalar int32: total generations since reset
    count: jax.Array     # scalar int32: control-step counter
    u_prev: jax.Array    # [U]


@registry.optimizers.register("cma-es-tf")
@registry.optimizers.register("cma-es")
class CMAESOptimizer(Optimizer):
    def __init__(
        self,
        *,
        cma_outer_it: int = 3,
        cma_mu: Optional[int] = None,
        cma_initial_step_size: float = 0.3,
        cma_step_size_min: float = 0.01,
        cma_step_size_max: float = 1.0e8,
        cma_diagonal: bool = False,
        cma_add_mean_sample: bool = True,
        warmup: bool = False,
        warmup_iterations: int = 50,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.cma_outer_it = int(cma_outer_it)
        self.sigma0 = float(cma_initial_step_size)
        self.sigma_min = float(cma_step_size_min)
        self.sigma_max = float(cma_step_size_max)
        self.diag = bool(cma_diagonal)
        self.add_mean = bool(cma_add_mean_sample)
        self.warmup = bool(warmup)
        self.warmup_iterations = int(warmup_iterations)
        self.mu = int(cma_mu) if cma_mu is not None else self.num_rollouts // 2
        if not (1 <= self.mu <= self.num_rollouts):
            raise ValueError(
                f"cma_mu={self.mu} must be in [1, num_rollouts="
                f"{self.num_rollouts}]"
            )
        if self.num_rollouts - int(self.add_mean) < 1:
            raise ValueError("num_rollouts leaves no room for fresh samples")

    # ---- strategy constants (need N = H*U, known after configure) ---------
    def _constants(self):
        N = self.mpc_horizon * self.num_control_inputs
        mu = self.mu
        w = jnp.asarray(
            [math.log(mu + 0.5) - math.log(i + 1.0) for i in range(mu)],
            jnp.float32,
        )
        w = w / jnp.sum(w)
        mu_eff = float(1.0 / jnp.sum(w * w))
        c_s = (mu_eff + 2.0) / (N + mu_eff + 5.0)
        d_s = (
            1.0
            + 2.0 * max(0.0, math.sqrt((mu_eff - 1.0) / (N + 1.0)) - 1.0)
            + c_s
        )
        c_c = (4.0 + mu_eff / N) / (N + 4.0 + 2.0 * mu_eff / N)
        c_1 = 2.0 / ((N + 1.3) ** 2 + mu_eff)
        c_mu = min(
            1.0 - c_1,
            2.0 * (mu_eff - 2.0 + 1.0 / mu_eff) / ((N + 2.0) ** 2 + mu_eff),
        )
        if self.diag:
            # sep-CMA (Ros & Hansen 2008): diagonal model learns N (not
            # N(N+1)/2) parameters, so the learning rates speed up ~(N+2)/3.
            scale = (N + 2.0) / 3.0
            c_1 = min(1.0, c_1 * scale)
            c_mu = min(1.0 - c_1, c_mu * scale)
        chiN = math.sqrt(N) * (1.0 - 1.0 / (4.0 * N) + 1.0 / (21.0 * N * N))
        return N, w, mu_eff, c_s, d_s, c_c, c_1, c_mu, chiN

    def _init_state(self, key):
        H, U = self.mpc_horizon, self.num_control_inputs
        N = H * U
        u_mid = 0.5 * (self.action_low + self.action_high)
        mean = jnp.tile(u_mid.astype(jnp.float32), (H,)).reshape(N)
        C = jnp.ones((N,), jnp.float32) if self.diag else jnp.eye(N, dtype=jnp.float32)
        return CMAESState(
            key=key,
            mean=mean,
            sigma=jnp.asarray(self.sigma0, jnp.float32),
            C=C,
            p_sigma=jnp.zeros((N,), jnp.float32),
            p_c=jnp.zeros((N,), jnp.float32),
            gen=jnp.zeros((), jnp.int32),
            count=jnp.zeros((), jnp.int32),
            u_prev=jnp.zeros((U,), jnp.float32),
        )

    def _apply_policy_guess(self, state, plan):
        """Center the search distribution on a heuristic-policy rollout
        (base Optimizer ``initial_guess_policy``)."""
        return state._replace(mean=plan.astype(jnp.float32).reshape(-1))

    def _make_step_fn(self):
        K, H, U = self.num_rollouts, self.mpc_horizon, self.num_control_inputs
        N, w, mu_eff, c_s, d_s, c_c, c_1, c_mu, chiN = self._constants()
        mu, add_mean, diag = self.mu, self.add_mean, self.diag
        n_fresh = K - int(add_mean)
        low_n = jnp.tile(self.action_low.astype(jnp.float32), (H,))
        high_n = jnp.tile(self.action_high.astype(jnp.float32), (H,))
        cost_only = None if self.optimizer_logging else self._make_cost_only()
        want_Q = self.optimizer_logging

        def generation(carry, s_tiled, u_prev, params):
            key, k1 = jax.random.split(carry["key"])
            mean, sigma, C = carry["mean"], carry["sigma"], carry["C"]
            z = jax.random.normal(k1, (n_fresh, N), jnp.float32)
            if diag:
                sqrtC = jnp.sqrt(C)
                y = z * sqrtC                              # [n_fresh, N]
            else:
                # C = B diag(evals) B^T; y_i = B D z_i  <=>  Y = (Z*D) @ B^T
                evals, B = jnp.linalg.eigh(0.5 * (C + C.T))
                D = jnp.sqrt(jnp.clip(evals, 1e-12, None))
                y = (z * D) @ B.T
            x = mean + sigma * y
            if add_mean:
                x = jnp.concatenate([x, mean[None]], axis=0)
            X = jnp.clip(x, low_n, high_n)                 # [K, N] (repair)
            Q = X.reshape(K, H, U)
            if cost_only is not None:
                cost = cost_only(s_tiled, Q, u_prev, params)
            else:
                cost, traj = self._rollout_and_cost(s_tiled, Q, u_prev, params)

            idx = elite_indices(cost, mu)                  # ascending cost
            Ysel = (X[idx] - mean) / sigma                 # repaired steps
            y_w = w @ Ysel                                 # [N]
            mean_new = mean + sigma * y_w

            if diag:
                invsqrt_yw = y_w / sqrtC
            else:
                invsqrt_yw = B @ ((B.T @ y_w) / D)
            ps = (
                (1.0 - c_s) * carry["p_sigma"]
                + math.sqrt(c_s * (2.0 - c_s) * mu_eff) * invsqrt_yw
            )
            gen1 = carry["gen"] + 1
            ps_norm = jnp.linalg.norm(ps)
            # h_sigma stall guard: freeze the rank-1 path while the step-size
            # path is still growing fast (tutorial eq. 45).
            expo = 2.0 * gen1.astype(jnp.float32)
            debias = jnp.sqrt(1.0 - (1.0 - c_s) ** expo)
            hsig = (
                ps_norm / jnp.maximum(debias, 1e-12) / chiN
                < 1.4 + 2.0 / (N + 1.0)
            ).astype(jnp.float32)
            pc = (
                (1.0 - c_c) * carry["p_c"]
                + hsig * math.sqrt(c_c * (2.0 - c_c) * mu_eff) * y_w
            )
            if diag:
                rank1 = pc * pc
                rankmu = w @ (Ysel * Ysel)
            else:
                rank1 = jnp.outer(pc, pc)
                rankmu = Ysel.T @ (w[:, None] * Ysel)
            C_new = (
                (1.0 - c_1 - c_mu) * C
                + c_1 * (rank1 + (1.0 - hsig) * c_c * (2.0 - c_c) * C)
                + c_mu * rankmu
            )
            if diag:
                C_new = jnp.clip(C_new, 1e-12, None)
            sigma_new = jnp.clip(
                sigma * jnp.exp((c_s / d_s) * (ps_norm / chiN - 1.0)),
                self.sigma_min, self.sigma_max,
            )

            out = {
                "key": key,
                "mean": mean_new,
                "sigma": sigma_new,
                "C": C_new,
                "p_sigma": ps,
                "p_c": pc,
                "gen": gen1,
                "best": X[idx[0]].reshape(H, U),
                "cost": cost,
            }
            if want_Q:
                out["Q"] = Q
            if cost_only is None:
                out["traj"] = traj
            return out

        def step_fn(state: CMAESState, s, params):
            s_tiled = jnp.tile(s[:1], (K, 1))
            if self.warmup:
                iterations = jnp.where(
                    state.count == 0, self.warmup_iterations, self.cma_outer_it
                )
            else:
                iterations = self.cma_outer_it

            carry = {
                "key": state.key,
                "mean": state.mean,
                "sigma": state.sigma,
                "C": state.C,
                "p_sigma": state.p_sigma,
                "p_c": state.p_c,
                "gen": state.gen,
                "best": jnp.zeros((H, U), jnp.float32),
                "cost": jnp.zeros((K,), jnp.float32),
            }
            if want_Q:
                carry["Q"] = jnp.zeros((K, H, U), jnp.float32)
            if cost_only is None:
                carry["traj"] = jnp.zeros(
                    (K, H + 1, self.num_states), jnp.float32
                )
            carry = jax.lax.fori_loop(
                0, iterations,
                lambda i, c: generation(c, s_tiled, state.u_prev, params),
                carry,
            )

            u = carry["best"][0, :]

            # Warm start: shift the mean plan one step, repeating the final
            # action; sigma/C/paths describe plan-local geometry and carry
            # over unchanged (reference time-shift semantics,
            # optimizer_cem_tf.py:99-104, adapted to the flattened vector).
            m2 = carry["mean"].reshape(H, U)
            mean = jnp.concatenate([m2[1:], m2[-1:]], axis=0).reshape(N)

            diag_out = {
                "J_logged": carry["cost"],
                "u_nom": carry["best"][None],
            }
            if want_Q:
                diag_out["Q_logged"] = carry["Q"]
            if cost_only is None:
                diag_out["rollout_trajectories_logged"] = carry["traj"]
            new_state = CMAESState(
                key=carry["key"], mean=mean, sigma=carry["sigma"],
                C=carry["C"], p_sigma=carry["p_sigma"], p_c=carry["p_c"],
                gen=carry["gen"], count=state.count + 1, u_prev=u,
            )
            return u, new_state, diag_out

        return step_fn
