"""iLQR trajectory optimizer — the NLP-solver slot.

Replaces the reference's FORCES Pro NLP path (optimizer_nlp_forces,
/root/reference/Optimizers/optimizer_nlp_forces.py:35-399 — proprietary
generated C solver, K forced to 1 (:61), warm start from the shifted previous
open-loop solution (:289-296)) with an on-device iLQR solver:

* dynamics linearized along the current trajectory with ``jax.jacfwd``
  (exact Jacobians through the same single-step integrator the sampling
  optimizers use — no hand-coded derivatives),
* quadratic cost expansions via ``jax.grad``/``jax.hessian``,
* Riccati backward pass with Levenberg-Marquardt regularization,
* forward pass with a **vmapped parallel line search** (all step sizes
  rolled out simultaneously — the TPU-native replacement for a sequential
  Armijo loop) and box constraints enforced by clamping,
* warm start: accepted control trajectory shifted one step per tick.

The whole solve (fixed iteration count, regularization adaptation via
lax.cond) is ONE jitted program.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from control_toolkit_tpu.optimizers.base import Optimizer
from control_toolkit_tpu.utils import registry


class ILQRState(NamedTuple):
    u_traj: jax.Array  # [H, U] current open-loop plan
    u_prev: jax.Array  # [U]
    count: jax.Array


@registry.optimizers.register("ilqr")
@registry.optimizers.register("nlp-ilqr")
class ILQROptimizer(Optimizer):
    def __init__(
        self,
        *,
        max_iterations: int = 50,
        tol: float = 1e-6,
        regularization_init: float = 1.0,
        regularization_max: float = 1e8,
        line_search_steps: int = 8,
        **kwargs,
    ):
        kwargs["num_rollouts"] = 1  # NLP path is single-trajectory (reference :61)
        super().__init__(**kwargs)
        self.max_iterations = int(max_iterations)
        self.tol = float(tol)
        self.reg_init = float(regularization_init)
        self.reg_max = float(regularization_max)
        self.alphas = jnp.asarray(
            [0.5**i for i in range(int(line_search_steps))], jnp.float32
        )

    def _init_state(self, key):
        H, U = self.mpc_horizon, self.num_control_inputs
        u_mid = 0.5 * (self.action_low + self.action_high)
        return ILQRState(
            u_traj=jnp.broadcast_to(u_mid, (H, U)).astype(jnp.float32),
            u_prev=jnp.zeros((U,), jnp.float32),
            count=jnp.zeros((), jnp.int32),
        )

    def _make_step_fn(self):
        H, U, S = self.mpc_horizon, self.num_control_inputs, self.num_states
        low, high = self.action_low, self.action_high
        cf = getattr(self.cost_function, "cost_function", self.cost_function)
        step = self.predictor.single_step
        alphas = self.alphas

        def dyn(x, u, params):
            # single-sample step: [S], [U] -> [S]
            return step(x[None], u[None], params["dyn"])[0]

        def stage_l(x, u, params):
            # iLQR stage cost without the cross-step control-change coupling.
            cp = {"cost": params["cost"], "attrs": params["attrs"]}
            return cf.stage_cost_step(x[None], u[None], None, cp)[0]

        def term_l(x, params):
            cp = {"cost": params["cost"], "attrs": params["attrs"]}
            return cf.get_terminal_cost(x[None], cp)[0]

        def rollout_open_loop(x0, u_traj, params):
            def body(x, u):
                xn = dyn(x, u, params)
                return xn, x
            x_final, xs = jax.lax.scan(body, x0, u_traj)
            return jnp.concatenate([xs, x_final[None]], axis=0)  # [H+1, S]

        def total_cost(x0, u_traj, params):
            xs = rollout_open_loop(x0, u_traj, params)
            stages = jax.vmap(lambda x, u: stage_l(x, u, params))(xs[:-1], u_traj)
            return jnp.sum(stages) + term_l(xs[-1], params)

        def backward_pass(xs, us, reg, params):
            A = jax.vmap(lambda x, u: jax.jacfwd(dyn, 0)(x, u, params))(xs[:-1], us)
            B = jax.vmap(lambda x, u: jax.jacfwd(dyn, 1)(x, u, params))(xs[:-1], us)
            lx = jax.vmap(lambda x, u: jax.grad(stage_l, 0)(x, u, params))(xs[:-1], us)
            lu = jax.vmap(lambda x, u: jax.grad(stage_l, 1)(x, u, params))(xs[:-1], us)
            lxx = jax.vmap(lambda x, u: jax.hessian(stage_l, 0)(x, u, params))(xs[:-1], us)
            luu = jax.vmap(lambda x, u: jax.hessian(stage_l, 1)(x, u, params))(xs[:-1], us)
            lux = jax.vmap(
                lambda x, u: jax.jacfwd(jax.grad(stage_l, 1), 0)(x, u, params)
            )(xs[:-1], us)

            Vx = jax.grad(term_l, 0)(xs[-1], params)
            Vxx = jax.hessian(term_l, 0)(xs[-1], params)

            def bw(carry, inp):
                Vx, Vxx = carry
                A_h, B_h, lx_h, lu_h, lxx_h, luu_h, lux_h = inp
                Qx = lx_h + A_h.T @ Vx
                Qu = lu_h + B_h.T @ Vx
                Qxx = lxx_h + A_h.T @ Vxx @ A_h
                Quu = luu_h + B_h.T @ Vxx @ B_h + reg * jnp.eye(U)
                Qux = lux_h + B_h.T @ Vxx @ A_h
                Quu_inv = jnp.linalg.inv(Quu)
                k = -Quu_inv @ Qu
                Kg = -Quu_inv @ Qux
                Vx_new = Qx + Kg.T @ Quu @ k + Kg.T @ Qu + Qux.T @ k
                Vxx_new = Qxx + Kg.T @ Quu @ Kg + Kg.T @ Qux + Qux.T @ Kg
                Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
                return (Vx_new, Vxx_new), (k, Kg)

            (_, _), (ks, Ks) = jax.lax.scan(
                bw, (Vx, Vxx),
                (A, B, lx, lu, lxx, luu, lux),
                reverse=True,
            )
            return ks, Ks  # [H, U], [H, U, S]

        def forward_pass(x0, xs_nom, us_nom, ks, Ks, alpha, params):
            def body(carry, inp):
                x, acc = carry
                x_nom, u_nom, k, Kg = inp
                u = jnp.clip(u_nom + alpha * k + Kg @ (x - x_nom), low, high)
                acc = acc + stage_l(x, u, params)
                xn = dyn(x, u, params)
                return (xn, acc), u
            (x_final, acc), us = jax.lax.scan(
                body, (x0, 0.0), (xs_nom[:-1], us_nom, ks, Ks)
            )
            return acc + term_l(x_final, params), us

        def solve_iter(carry, _, x0, params):
            us, cost, reg = carry
            xs = rollout_open_loop(x0, us, params)
            ks, Ks = backward_pass(xs, us, reg, params)
            # Parallel line search over all alphas at once.
            costs, us_cands = jax.vmap(
                lambda a: forward_pass(x0, xs, us, ks, Ks, a, params)
            )(alphas)
            best = jnp.argmin(costs)
            best_cost = costs[best]
            improved = best_cost < cost - self.tol

            us_new = jnp.where(improved, us_cands[best], us)
            cost_new = jnp.where(improved, best_cost, cost)
            reg_new = jnp.where(
                improved,
                jnp.maximum(reg * 0.5, 1e-6),
                jnp.minimum(reg * 10.0, self.reg_max),
            )
            return (us_new, cost_new, reg_new), None

        def step_fn(state: ILQRState, s, params):
            x0 = s[0]
            us0 = state.u_traj
            cost0 = total_cost(x0, us0, params)
            (us, cost, _), _ = jax.lax.scan(
                lambda c, x: solve_iter(c, x, x0, params),
                (us0, cost0, jnp.float32(self.reg_init)),
                None, length=self.max_iterations,
            )

            u = us[0]
            # Warm start: shift the accepted plan (reference :289-296).
            us_shifted = jnp.concatenate([us[1:], us[-1:]], axis=0)

            xs = rollout_open_loop(x0, us, params)
            diag = {
                "Q_logged": us[None],                       # [1, H, U]
                "J_logged": (cost / (H + 1))[None],         # trajectory-mean convention
                "rollout_trajectories_logged": xs[None],    # [1, H+1, S]
                "u_nom": us[None],
            }
            new_state = ILQRState(
                u_traj=us_shifted, u_prev=u, count=state.count + 1
            )
            return u, new_state, diag

        return step_fn
