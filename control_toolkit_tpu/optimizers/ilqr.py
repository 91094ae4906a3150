"""iLQR trajectory optimizer — the NLP-solver slot.

Replaces the reference's FORCES Pro NLP path (optimizer_nlp_forces,
/root/reference/Optimizers/optimizer_nlp_forces.py:35-399 — proprietary
generated C solver, K forced to 1 (:61), warm start from the shifted previous
open-loop solution (:289-296)) with an on-device iLQR solver matching the
FORCES feature set:

* dynamics linearized along the current trajectory with ``jax.jacfwd``
  (exact Jacobians through the same single-step integrator the sampling
  optimizers use — no hand-coded derivatives),
* quadratic cost expansions via ``jax.grad``/``jax.hessian``,
* Riccati backward pass with Levenberg-Marquardt regularization,
* forward pass with a **vmapped parallel line search** (all step sizes
  rolled out simultaneously — the TPU-native replacement for a sequential
  Armijo loop) and control box constraints enforced by clamping,
* **state box constraints** (``state_max``, symmetric per reference
  optimizer_nlp_forces.py:100-106 ``xmin = -xmax``, 'inf'/null = unbounded)
  and a **terminal set** (``terminal_set_width`` box around a target on
  ``idx_terminal_set`` state indices, reference :299-306) via an augmented
  Lagrangian (PHR) outer loop — multipliers and penalty updated a fixed
  number of times, the whole thing one jitted program,
* the **control-change cost** coupling u_h with u_{h-1} (dropped in round 1)
  included by augmenting the solver state with the previous control,
* **solver-failure fallback** reproducing FORCES exitflag<0 semantics
  (reference :315-342): on a non-finite solve the optimizer replays the last
  good open-loop plan, stepping an index j through it; on recovery (or plan
  exhaustion) it re-adopts/reinitializes,
* warm start: accepted control trajectory shifted one step per tick.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.optimizers.base import Optimizer
from control_toolkit_tpu.utils import registry


class ILQRState(NamedTuple):
    u_traj: jax.Array  # [H, U] warm-start plan for the next solve
    u_prev: jax.Array  # [U] last applied control
    plan: jax.Array    # [H, U] last GOOD open-loop solution (failure replay)
    j: jax.Array       # replay index into ``plan`` (0 = fresh solve adopted)
    count: jax.Array
    key: jax.Array     # PRNG for multi-start initialization draws


@registry.optimizers.register("ilqr")
@registry.optimizers.register("nlp-ilqr")
@registry.optimizers.register("nlp-forces")  # drop-in slot for the reference name
class ILQROptimizer(Optimizer):
    def __init__(
        self,
        *,
        max_iterations: int = 50,
        tol: float = 1e-6,
        regularization_init: float = 1.0,
        regularization_max: float = 1e8,
        line_search_steps: int = 8,
        state_max: Optional[Sequence] = None,
        terminal_set_width: float = 0.0,
        idx_terminal_set: Sequence[int] = (),
        terminal_set_center: Sequence = (),
        al_iterations: int = 4,
        mu_init: float = 10.0,
        mu_growth: float = 10.0,
        include_control_change_cost: bool = True,
        n_starts: int = 1,
        riccati: str = "sequential",
        initial_guess_policy=None,
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
        # Symmetric state box (reference: xmax from config, xmin = -xmax;
        # 'inf'/None entries unbounded).
        if state_max is not None:
            self.state_max = np.asarray(
                [np.inf if v in (None, "inf") else float(v) for v in state_max],
                np.float32,
            )
        else:
            self.state_max = None
        self.terminal_set_width = float(terminal_set_width)
        self.idx_terminal_set = tuple(int(i) for i in idx_terminal_set)
        # Each center entry is a float or the NAME of an environment attribute
        # (resolved from params['attrs'] at step time, like the reference's
        # target_function building the target from controller attributes).
        self.terminal_set_center = tuple(terminal_set_center)
        self.al_iterations = int(al_iterations)
        self.mu_init = float(mu_init)
        self.mu_growth = float(mu_growth)
        self.include_control_change_cost = bool(include_control_change_cost)
        # Multi-start: iLQR is a local method; planning problems with
        # multiple basins (swing-up) are solved from n_starts diverse
        # initializations as ONE vmapped batch of solves (the TPU-native
        # robustification of the single-trajectory NLP slot) and the
        # lowest-true-cost plan wins.
        self.n_starts = max(1, int(n_starts))
        # Backward-pass structure: "sequential" = classic H-step Riccati
        # scan; "parallel" = log-depth associative scan over conditional-
        # value-function elements (Särkkä & García-Fernández temporal
        # parallelization of LQR).  Bitwise-equivalent math: the LM
        # regularizer folds into the stage control cost (R + reg*I), which
        # makes the parallel solution of the MODIFIED LQR identical to the
        # regularized sequential recursion.  Pays on accelerators where the
        # sequential scan of tiny matrix ops is latency-bound.
        if riccati not in ("sequential", "parallel"):
            raise ValueError(f"riccati must be sequential|parallel, got {riccati!r}")
        self.riccati = riccati
        # Heuristic-policy initial guess (reference FORCES
        # initial_trajectory_guess, optimizer_nlp_forces.py:261-279): a pure
        # fn (x [S], params) -> u [U] rolled through the dynamics to build
        # the first plan, the post-replay reinitialization, and (with
        # n_starts > 1) one extra start.  None keeps the mid-range default.
        self.initial_guess_policy = initial_guess_policy

    def _init_state(self, key):
        H, U = self.mpc_horizon, self.num_control_inputs
        u_mid = 0.5 * (self.action_low + self.action_high)
        plan0 = jnp.broadcast_to(u_mid, (H, U)).astype(jnp.float32)
        return ILQRState(
            u_traj=plan0,
            u_prev=jnp.zeros((U,), jnp.float32),
            plan=plan0,
            j=jnp.zeros((), jnp.int32),
            count=jnp.zeros((), jnp.int32),
            key=self._initial_key,
        )

    def _make_step_fn(self):
        H, U, S = self.mpc_horizon, self.num_control_inputs, self.num_states
        low, high = self.action_low, self.action_high
        cf = getattr(self.cost_function, "cost_function", self.cost_function)
        step = self.predictor.single_step
        alphas = self.alphas

        # ---- static constraint setup --------------------------------------
        if self.state_max is not None:
            box_idx = tuple(
                i for i in range(min(S, len(self.state_max)))
                if np.isfinite(self.state_max[i])
            )
            box_max = jnp.asarray(
                [self.state_max[i] for i in box_idx], jnp.float32
            )
        else:
            box_idx, box_max = (), jnp.zeros((0,), jnp.float32)
        has_box = len(box_idx) > 0
        term_idx = self.idx_terminal_set
        has_term = self.terminal_set_width > 0.0 and len(term_idx) > 0
        width = jnp.float32(self.terminal_set_width)
        constrained = has_box or has_term
        n_al = self.al_iterations if constrained else 1
        inner_iters = max(1, -(-self.max_iterations // n_al))  # ceil div
        n_box = 2 * len(box_idx)
        n_term = 2 * len(term_idx)

        # Solver state is augmented with the previous control so the
        # control-change cost (a coupling between consecutive controls)
        # stays a per-stage function the Riccati pass can expand.
        use_ccrc = self.include_control_change_cost
        Z = S + U if use_ccrc else S  # augmented state size

        def dyn(z, u, params):
            x = z[:S]
            xn = step(x[None], u[None], params["dyn"])[0]
            if use_ccrc:
                return jnp.concatenate([xn, u])
            return xn

        def box_violation(z):
            if not has_box:
                return jnp.zeros((0,), jnp.float32)
            xb = jnp.stack([z[i] for i in box_idx])
            return jnp.concatenate([xb - box_max, -box_max - xb])

        def term_violation(z, center):
            if not has_term:
                return jnp.zeros((0,), jnp.float32)
            d = jnp.stack([z[i] for i in term_idx]) - center
            return jnp.concatenate([d - width, -d - width])

        def al_penalty(c, lam, mu):
            """PHR augmented-Lagrangian term for c(x) <= 0."""
            if c.shape[0] == 0:
                return jnp.float32(0.0)
            t = jnp.maximum(0.0, lam + mu * c)
            return jnp.sum(t * t - lam * lam) / (2.0 * mu)

        def stage_l(z, u, params):
            cp = {"cost": params["cost"], "attrs": params["attrs"]}
            if use_ccrc:
                return cf.stage_cost_step(
                    z[None, :S], u[None], z[None, S:], cp
                )[0]
            return cf.stage_cost_step(z[None, :S], u[None], None, cp)[0]

        def term_l(z, params):
            cp = {"cost": params["cost"], "attrs": params["attrs"]}
            return cf.get_terminal_cost(z[None, :S], cp)[0]

        def stage_l_al(z, u, lam_h, mu, params):
            return stage_l(z, u, params) + al_penalty(box_violation(z), lam_h, mu)

        def term_l_al(z, lam_h, lam_t, mu, center, params):
            c = term_l(z, params) + al_penalty(box_violation(z), lam_h, mu)
            return c + al_penalty(term_violation(z, center), lam_t, mu)

        def rollout_open_loop(z0, u_traj, params):
            def body(z, u):
                zn = dyn(z, u, params)
                return zn, z
            z_final, zs = jax.lax.scan(body, z0, u_traj)
            return jnp.concatenate([zs, z_final[None]], axis=0)  # [H+1, Z]

        def total_cost_al_from(zs, u_traj, lam, lam_t, mu, center, params):
            """AL cost of an ALREADY-rolled trajectory (no H-scan)."""
            stages = jax.vmap(
                lambda z, u, l: stage_l_al(z, u, l, mu, params)
            )(zs[:-1], u_traj, lam[:-1])
            return jnp.sum(stages) + term_l_al(
                zs[-1], lam[-1], lam_t, mu, center, params
            )

        def total_cost_true(z0, u_traj, params):
            zs = rollout_open_loop(z0, u_traj, params)
            stages = jax.vmap(lambda z, u: stage_l(z, u, params))(zs[:-1], u_traj)
            return jnp.sum(stages) + term_l(zs[-1], params)

        has_constraints = has_box or has_term

        def total_violation(z0, u_traj, center, params):
            """Summed positive constraint violation of an open-loop plan
            (stage box along the trajectory + terminal set): the
            feasibility half of the multi-start selection metric — ranking
            by unconstrained cost alone would let an infeasible random
            start beat a feasible one (the AL penalty shapes the SOLVES,
            not the selection)."""
            zs = rollout_open_loop(z0, u_traj, params)
            v = jnp.float32(0.0)
            if has_box:
                v = v + jnp.sum(jax.vmap(
                    lambda z: jnp.sum(jnp.maximum(0.0, box_violation(z)))
                )(zs))
            if has_term:
                v = v + jnp.sum(
                    jnp.maximum(0.0, term_violation(zs[-1], center))
                )
            return v

        guess_policy = self.initial_guess_policy

        def policy_guess(z0, params):
            """Roll the heuristic policy through the dynamics to build an
            initial plan (reference initial_trajectory_guess,
            optimizer_nlp_forces.py:261-279)."""
            def body(z, _):
                u = jnp.clip(
                    jnp.reshape(
                        jnp.asarray(guess_policy(z[:S], params), jnp.float32),
                        (U,),
                    ),
                    low, high,
                )
                return dyn(z, u, params), u
            _, us = jax.lax.scan(body, z0, None, length=H)
            return us

        def linearize(zs, us, lam, lam_t, mu, center, params):
            """Stage-wise quadratic model along the trajectory (all vmapped,
            shared by both Riccati structures)."""
            A = jax.vmap(lambda z, u: jax.jacfwd(dyn, 0)(z, u, params))(zs[:-1], us)
            B = jax.vmap(lambda z, u: jax.jacfwd(dyn, 1)(z, u, params))(zs[:-1], us)
            sl = lambda z, u, l: stage_l_al(z, u, l, mu, params)
            lx = jax.vmap(lambda z, u, l: jax.grad(sl, 0)(z, u, l))(zs[:-1], us, lam[:-1])
            lu = jax.vmap(lambda z, u, l: jax.grad(sl, 1)(z, u, l))(zs[:-1], us, lam[:-1])
            lxx = jax.vmap(lambda z, u, l: jax.hessian(sl, 0)(z, u, l))(zs[:-1], us, lam[:-1])
            luu = jax.vmap(lambda z, u, l: jax.hessian(sl, 1)(z, u, l))(zs[:-1], us, lam[:-1])
            lux = jax.vmap(
                lambda z, u, l: jax.jacfwd(jax.grad(sl, 1), 0)(z, u, l)
            )(zs[:-1], us, lam[:-1])

            tl = lambda z: term_l_al(z, lam[-1], lam_t, mu, center, params)
            Vx = jax.grad(tl)(zs[-1])
            Vxx = jax.hessian(tl)(zs[-1])
            return A, B, lx, lu, lxx, luu, lux, Vx, Vxx

        def backward_pass(zs, us, lam, lam_t, mu, center, reg, params):
            A, B, lx, lu, lxx, luu, lux, Vx, Vxx = linearize(
                zs, us, lam, lam_t, mu, center, params
            )

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
            return ks, Ks  # [H, U], [H, U, Z]

        def backward_pass_parallel(zs, us, lam, lam_t, mu, center, reg, params):
            """Log-depth Riccati: associative scan over conditional-value-
            function elements (Särkkä & García-Fernández, temporal
            parallelization of LQR/LQT).

            Element for a segment [i, j):
                E(x, z) = 1/2 x'Jx - eta'x + 1/2 (z - Ax - b)' C^+ (z - Ax - b)
            = the optimal cost from x_i = x to x_j = z.  Composition
            (min over the junction state) is associative, so the suffix
            value functions V_h come out of one ``lax.associative_scan``
            instead of an H-step sequential recursion.  The LM regularizer
            is folded into the stage control cost (R + reg*I), which makes
            this EXACTLY the regularized sequential recursion (the DP
            identities of the modified LQR) — asserted in tests.
            """
            A, B, lx, lu, lxx, luu, lux, Vx, Vxx = linearize(
                zs, us, lam, lam_t, mu, center, params
            )
            I_z = jnp.eye(Z, dtype=jnp.float32)
            Rr = luu + reg * jnp.eye(U, dtype=jnp.float32)[None]   # [H, U, U]
            Rinv = jnp.linalg.inv(Rr)
            BRi = B @ Rinv                                         # [H, Z, U]
            luxT = jnp.swapaxes(lux, 1, 2)                         # [H, Z, U]
            # Stage elements (complete the square in u):
            Ae = A - BRi @ lux
            be = -(BRi @ lu[..., None])[..., 0]
            Ce = BRi @ jnp.swapaxes(B, 1, 2)
            Je = lxx - luxT @ Rinv @ lux
            ee = -(lx - (luxT @ (Rinv @ lu[..., None]))[..., 0])
            # Terminal element: pins z (A=b=C=0) and carries V_T.
            elems = (
                jnp.concatenate([Ae, jnp.zeros((1, Z, Z), jnp.float32)]),
                jnp.concatenate([be, jnp.zeros((1, Z), jnp.float32)]),
                jnp.concatenate([Ce, jnp.zeros((1, Z, Z), jnp.float32)]),
                jnp.concatenate([ee, -Vx[None]]),
                jnp.concatenate([Je, Vxx[None]]),
            )

            def combine(earlier, later):
                A1, b1, C1, e1, J1 = earlier
                A2, b2, C2, e2, J2 = later
                # (I + C1 J2)^{-1} applied via solves; (I + J2 C1) is its
                # transpose (C, J symmetric).
                L = I_z + C1 @ J2
                LT = jnp.swapaxes(L, -1, -2)
                sA = jnp.linalg.solve(L, A1)
                sb = jnp.linalg.solve(
                    L, (b1 + (C1 @ e2[..., None])[..., 0])[..., None]
                )[..., 0]
                sC = jnp.linalg.solve(L, C1)
                A1T = jnp.swapaxes(A1, -1, -2)
                A_n = A2 @ sA
                b_n = (A2 @ sb[..., None])[..., 0] + b2
                C_n = A2 @ sC @ jnp.swapaxes(A2, -1, -2) + C2
                e_n = (A1T @ jnp.linalg.solve(
                    LT, (e2 - (J2 @ b1[..., None])[..., 0])[..., None]
                ))[..., 0] + e1
                J_n = A1T @ jnp.linalg.solve(LT, J2) @ A1 + J1
                C_n = 0.5 * (C_n + jnp.swapaxes(C_n, -1, -2))
                J_n = 0.5 * (J_n + jnp.swapaxes(J_n, -1, -2))
                return A_n, b_n, C_n, e_n, J_n

            # reverse=True hands fn (later-combination, earlier) — swap into
            # combine's (earlier, later) convention.
            suffix = jax.lax.associative_scan(
                lambda a, b: combine(b, a), elems, reverse=True
            )
            Vxx_next = suffix[4][1:]                               # [H, Z, Z]
            Vx_next = -suffix[3][1:]                               # [H, Z]

            # Gains, fully parallel over h (same formulas as the scan body).
            BT = jnp.swapaxes(B, 1, 2)
            Qu = lu + (BT @ Vx_next[..., None])[..., 0]
            Quu = Rr + BT @ Vxx_next @ B
            Qux = lux + BT @ Vxx_next @ A
            ks = -jnp.linalg.solve(Quu, Qu[..., None])[..., 0]
            Ks = -jnp.linalg.solve(Quu, Qux)
            return ks, Ks

        def forward_pass(z0, zs_nom, us_nom, ks, Ks, alpha, lam, lam_t, mu,
                         center, params):
            def body(carry, inp):
                z, acc, h = carry
                z_nom, u_nom, k, Kg = inp
                u = jnp.clip(u_nom + alpha * k + Kg @ (z - z_nom), low, high)
                acc = acc + stage_l_al(z, u, lam[h], mu, params)
                zn = dyn(z, u, params)
                return (zn, acc, h + 1), (u, z)
            (z_final, acc, _), (us, zs_head) = jax.lax.scan(
                body, (z0, 0.0, 0), (zs_nom[:-1], us_nom, ks, Ks)
            )
            total = acc + term_l_al(z_final, lam[-1], lam_t, mu, center, params)
            # Return the candidate's own trajectory too: the accepted one is
            # carried into the next iteration, replacing a full re-rollout
            # (one of the ~3 sequential H-scans per iteration — measured
            # ~20% off the solve on TPU).
            zs = jnp.concatenate([zs_head, z_final[None]], axis=0)
            return total, us, zs

        backward = (
            backward_pass_parallel if self.riccati == "parallel"
            else backward_pass
        )
        # Exposed for the structure-equivalence tests (sequential vs
        # parallel gains on identical linearization inputs).
        self._debug_backward_pair = (backward_pass, backward_pass_parallel)
        self._debug_rollout = rollout_open_loop

        def inner_iter(carry, _, z0, lam, lam_t, mu, center, params):
            us, zs, cost, reg = carry
            ks, Ks = backward(zs, us, lam, lam_t, mu, center, reg, params)
            costs, us_cands, zs_cands = jax.vmap(
                lambda a: forward_pass(
                    z0, zs, us, ks, Ks, a, lam, lam_t, mu, center, params
                )
            )(alphas)
            best = jnp.argmin(costs)
            best_cost = costs[best]
            improved = best_cost < cost - self.tol

            us_new = jnp.where(improved, us_cands[best], us)
            zs_new = jnp.where(improved, zs_cands[best], zs)
            cost_new = jnp.where(improved, best_cost, cost)
            reg_new = jnp.where(
                improved,
                jnp.maximum(reg * 0.5, 1e-6),
                jnp.minimum(reg * 10.0, self.reg_max),
            )
            return (us_new, zs_new, cost_new, reg_new), None

        def solve(z0, us0, center, params):
            """AL outer loop around the iLQR inner loop (single jit)."""
            lam0 = jnp.zeros((H + 1, n_box), jnp.float32)
            lam_t0 = jnp.zeros((n_term,), jnp.float32)

            def al_iter(carry, _):
                us, lam, lam_t, mu = carry
                zs0 = rollout_open_loop(z0, us, params)
                cost0 = total_cost_al_from(zs0, us, lam, lam_t, mu, center, params)
                (us, zs, _, _), _ = jax.lax.scan(
                    lambda c, x: inner_iter(c, x, z0, lam, lam_t, mu, center, params),
                    (us, zs0, cost0, jnp.float32(self.reg_init)),
                    None, length=inner_iters,
                )
                # First-order multiplier update along the accepted trajectory
                # (carried out of the scan — no re-rollout).
                if has_box:
                    c_box = jax.vmap(box_violation)(zs)          # [H+1, n_box]
                    lam = jnp.maximum(0.0, lam + mu * c_box)
                if has_term:
                    lam_t = jnp.maximum(
                        0.0, lam_t + mu * term_violation(zs[-1], center)
                    )
                return (us, lam, lam_t, mu * self.mu_growth), None

            mu0 = jnp.float32(self.mu_init if constrained else 0.0)
            if constrained:
                (us, lam, lam_t, _), _ = jax.lax.scan(
                    al_iter, (us0, lam0, lam_t0, mu0), None, length=n_al
                )
            else:
                zs0 = rollout_open_loop(z0, us0, params)
                cost0 = total_cost_al_from(zs0, us0, lam0, lam_t0, mu0, center, params)
                (us, _, _, _), _ = jax.lax.scan(
                    lambda c, x: inner_iter(
                        c, x, z0, lam0, lam_t0, mu0, center, params
                    ),
                    (us0, zs0, cost0, jnp.float32(self.reg_init)),
                    None, length=inner_iters,
                )
            return us

        # Terminal-set center: static floats and/or attribute names resolved
        # per step (the reference builds its target from controller attrs,
        # optimizer_nlp_forces.py:299-306).
        center_spec = self.terminal_set_center

        def resolve_center(params):
            if not has_term:
                return jnp.zeros((0,), jnp.float32)
            vals = []
            for e in center_spec:
                if isinstance(e, str):
                    vals.append(jnp.asarray(params["attrs"].get(e, 0.0), jnp.float32))
                else:
                    vals.append(jnp.float32(e))
            if len(vals) < len(term_idx):
                vals += [jnp.float32(0.0)] * (len(term_idx) - len(vals))
            return jnp.stack(vals[: len(term_idx)])

        n_starts = self.n_starts

        def step_fn(state: ILQRState, s, params):
            x0 = s[0]
            z0 = jnp.concatenate([x0, state.u_prev]) if use_ccrc else x0
            center = resolve_center(params)

            # Heuristic-policy warm start: on the very first tick the stored
            # plan is the uninformative mid-range default — replace it with
            # the policy rollout (reference builds x0 from the heuristic
            # whenever no previous solution exists, :289-296).  lax.cond so
            # the H-scan policy rollout only RUNS on the ticks that need it.
            u_warm = state.u_traj
            if guess_policy is not None:
                u_warm = jax.lax.cond(
                    state.count == 0,
                    lambda: policy_guess(z0, params),
                    lambda: state.u_traj,
                )

            if n_starts == 1:
                us = solve(z0, u_warm, center, params)
                cost = total_cost_true(z0, us, params)
                key = state.key
            else:
                # Start 0 = warm start (+ policy-guess start when a policy
                # is configured); the rest drawn uniformly in the box each
                # tick.  All solves run as one vmapped batch.
                key, sub = jax.random.split(state.key)
                n_extra = 2 if guess_policy is not None else 1
                # Draw one spare row: on tick 0 the warm start IS the policy
                # guess, so the dedicated policy start would be a duplicate
                # — substitute a random draw there to keep the starts diverse
                # exactly when diversity matters most (no warm start yet).
                rand = jax.random.uniform(
                    sub, (max(n_starts - n_extra, 0) + 1, H, U),
                    minval=low, maxval=high, dtype=jnp.float32,
                )
                heads = [u_warm[None]]
                if guess_policy is not None and n_starts > 1:
                    # cond, not where: the H-scan policy rollout only RUNS
                    # after tick 0 (where would evaluate it every tick —
                    # the single-start path's cond exists for this).
                    heads.append(
                        jax.lax.cond(
                            state.count == 0,
                            lambda: rand[-1],
                            lambda: policy_guess(z0, params),
                        )[None]
                    )
                us0 = jnp.concatenate(heads + [rand[:-1]], axis=0)[:n_starts]
                us_all = jax.vmap(
                    lambda u0: solve(z0, u0, center, params)
                )(us0)
                costs_all = jax.vmap(
                    lambda u_: total_cost_true(z0, u_, params)
                )(us_all)
                # non-finite solves must not win the argmin
                costs_all = jnp.where(
                    jnp.isfinite(costs_all), costs_all, jnp.inf
                )
                if has_constraints:
                    # Feasible-first selection: among feasible solves take
                    # the cheapest; with none feasible, the least-violating
                    # (its solve carried the AL penalty furthest).
                    viol_all = jax.vmap(
                        lambda u_: total_violation(z0, u_, center, params)
                    )(us_all)
                    viol_all = jnp.where(
                        jnp.isfinite(costs_all), viol_all, jnp.inf
                    )
                    feasible = viol_all <= 1e-5
                    best = jnp.where(
                        jnp.any(feasible),
                        jnp.argmin(jnp.where(feasible, costs_all, jnp.inf)),
                        jnp.argmin(viol_all),
                    )
                else:
                    best = jnp.argmin(costs_all)
                us = us_all[best]
                cost = costs_all[best]

            # FORCES exitflag semantics (reference :315-342): a failed solve
            # replays the last good open-loop plan index-by-index; a good
            # solve is adopted with the replay index reset.
            ok = jnp.isfinite(cost) & jnp.all(jnp.isfinite(us))
            j_new = jnp.where(ok, 0, jnp.minimum(state.j + 1, H - 1))
            plan_new = jnp.where(ok, us, state.plan)
            u = jnp.where(ok, us[0], state.plan[j_new])

            # Warm start: shift the adopted plan; when replaying, line the
            # remaining plan up so its next index comes first (tail-padded).
            shift = jnp.where(ok, 1, j_new + 1)
            idx = jnp.clip(jnp.arange(H) + shift, 0, H - 1)
            us_shifted = plan_new[idx]
            u_mid = jnp.broadcast_to(
                0.5 * (low + high), (H, U)
            ).astype(jnp.float32)
            if guess_policy is not None:
                # Reference semantics (optimizer_nlp_forces.py:289-296): the
                # next warm start is the REMAINING open-loop solution
                # extended by heuristic-policy rollouts — not last-action
                # repeats.  One H-scan, run only on failure ticks (cond).
                n_valid = H - shift  # entries of us_shifted still from plan

                def extend_tail(us):
                    def body(z, i):
                        u_i = jnp.where(
                            i < n_valid, us[i],
                            jnp.clip(
                                jnp.reshape(
                                    jnp.asarray(
                                        guess_policy(z[:S], params),
                                        jnp.float32,
                                    ), (U,),
                                ),
                                low, high,
                            ),
                        )
                        return dyn(z, u_i, params), u_i
                    _, us2 = jax.lax.scan(body, z0, jnp.arange(H))
                    return us2

                us_shifted = jax.lax.cond(
                    ok, lambda us: us, extend_tail, us_shifted
                )
            else:
                us_shifted = jnp.where(j_new >= H - 1, u_mid, us_shifted)

            # Diagnostics describe the plan actually APPLIED from the
            # CURRENT state: on a replay tick that is the REMAINING plan
            # (plan[j_new:], tail-clamped) — rolling the whole retained
            # plan would re-apply already-consumed controls from the wrong
            # state.  On good ticks j_new == 0, so this is the full plan.
            diag_idx = jnp.clip(jnp.arange(H) + j_new, 0, H - 1)
            plan_diag = plan_new[diag_idx]
            zs_plan = rollout_open_loop(z0, plan_diag, params)
            xs = zs_plan[:, :S]
            # J_logged reports the cost of the applied plan: on a failed
            # solve that is the replayed remainder, not the rejected
            # solve's inf/NaN (computed from the zs_plan rollout already
            # needed for the trajectory diag).
            plan_stages = jax.vmap(
                lambda z, u_: stage_l(z, u_, params)
            )(zs_plan[:-1], plan_diag)
            cost_applied = jnp.where(
                ok, cost,
                jnp.sum(plan_stages) + term_l(zs_plan[-1], params),
            )
            diag = {
                "Q_logged": plan_diag[None],                # [1, H, U]
                "J_logged": (cost_applied / (H + 1))[None], # trajectory-mean convention
                "rollout_trajectories_logged": xs[None],    # [1, H+1, S]
                "u_nom": plan_new[None],
                "solver_ok": ok,
            }
            new_state = ILQRState(
                u_traj=us_shifted, u_prev=u, plan=plan_new, j=j_new,
                count=state.count + 1,
                key=key,
            )
            return u, new_state, diag

        return step_fn
