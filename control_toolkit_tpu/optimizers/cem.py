"""CEM — Cross-Entropy Method optimizer.

Capability parity with the reference optimizer_cem_tf
(/root/reference/Optimizers/optimizer_cem_tf.py:13-117):

* per outer iteration: sample K sequences from a diagonal Gaussian (mu,
  sigma per horizon step and input), clip to bounds, rollout + cost,
  top-``cem_best_k`` elites, refit mu/sigma to the elites (:62-80),
* warmup: more iterations on the first control step (:92),
* after the iterations: clip sigma to [stdev_min, 1e8], time-shift mu and
  sigma one step padding with defaults, u = first action of the best elite
  (:99-104).

TPU-native redesign: the outer iterations are a ``lax.fori_loop`` inside ONE
jitted step (warmup handled with a traced trip count), elite selection is
``lax.top_k``, and the whole state (mu, sigma, PRNG key, step count) is an
explicit pytree.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from control_toolkit_tpu.ops.common import elite_indices
from control_toolkit_tpu.optimizers.base import Optimizer, split_slot_keys
from control_toolkit_tpu.utils import registry


def cem_trip_count(opt, count):
    """Outer-iteration trip count shared by the CEM family: static when
    warmup is off (XLA lowers a fixed-bound, unrollable loop), traced
    count==0 switch otherwise (reference warmup semantics)."""
    if opt.warmup:
        return jnp.where(count == 0, opt.warmup_iterations, opt.cem_outer_it)
    return opt.cem_outer_it


def cem_base_carry(key, mue, std, K, H, U, S, want_Q, want_traj):
    """Common fori_loop carry of the CEM-family step functions (variants
    add their own entries, e.g. iCEM's elite buffer)."""
    carry = {
        "key": key, "mue": mue, "std": std,
        "elite0": jnp.zeros((H, U), jnp.float32),
        "cost": jnp.zeros((K,), jnp.float32),
    }
    if want_Q:
        carry["Q"] = jnp.zeros((K, H, U), jnp.float32)
    if want_traj:
        carry["traj"] = jnp.zeros((K, H + 1, S), jnp.float32)
    return carry


def cem_shift_distribution(mue, std, u_mid, stdev_min, init_stdev, U):
    """Control-step boundary shift shared by CEM/iCEM (reference
    optimizer_cem_tf.py:99-104): clip sigma, shift mu and sigma one step,
    pad tails with the initial defaults.  (cem_naive_grad / bharadhwaj
    keep their own reference-faithful 10.0 sigma cap.)"""
    std = jnp.clip(std, stdev_min, 1.0e8)
    std = jnp.concatenate(
        [std[:, 1:, :],
         jnp.full((1, 1, U), init_stdev, jnp.float32)],
        axis=1,
    )
    mue = jnp.concatenate(
        [mue[:, 1:, :],
         jnp.broadcast_to(u_mid, (1, 1, U)).astype(jnp.float32)],
        axis=1,
    )
    return mue, std


def cem_diag(carry, want_Q, want_traj):
    """Logging-contract diag assembly shared by the CEM family."""
    diag = {
        "J_logged": carry["cost"],
        "u_nom": carry["elite0"][None],
    }
    if want_Q:
        diag["Q_logged"] = carry["Q"]
    if want_traj:
        diag["rollout_trajectories_logged"] = carry["traj"]
    return diag


class CEMState(NamedTuple):
    key: jax.Array
    dist_mue: jax.Array  # [1, H, U]
    stdev: jax.Array     # [1, H, U]
    count: jax.Array     # scalar int32 control-step counter
    u_prev: jax.Array    # [U]


@registry.optimizers.register("cem-tf")
@registry.optimizers.register("cem")
class CEMOptimizer(Optimizer):
    def __init__(
        self,
        *,
        cem_outer_it: int = 3,
        cem_initial_action_stdev: float = 0.5,
        cem_stdev_min: float = 0.01,
        cem_best_k: int = 40,
        warmup: bool = False,
        warmup_iterations: int = 250,
        fully_fused: bool = False,
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
        self.warmup = bool(warmup)
        self.warmup_iterations = int(warmup_iterations)
        # Opt-in max-perf mode: sample+rollout+cost as ONE Pallas kernel
        # with in-kernel counter-PRNG sampling; elites regenerated in XLA
        # from the same counters (ops/pallas_cem.py).  Counter PRNG is not
        # bit-compatible with jax.random, hence opt-in.
        self.fully_fused = bool(fully_fused)

    def _init_state(self, key):
        H, U = self.mpc_horizon, self.num_control_inputs
        u_mid = 0.5 * (self.action_low + self.action_high)
        return CEMState(
            key=key,
            dist_mue=jnp.broadcast_to(u_mid, (1, H, U)).astype(jnp.float32),
            stdev=jnp.full((1, H, U), self.cem_initial_action_stdev, jnp.float32),
            count=jnp.zeros((), jnp.int32),
            u_prev=jnp.zeros((U,), jnp.float32),
        )

    def _apply_policy_guess(self, state, plan):
        """Center the sampling distribution on a heuristic-policy rollout
        (base Optimizer ``initial_guess_policy``); stdev keeps its reset
        width so the first elite selection can still move away."""
        return state._replace(dist_mue=plan[None].astype(state.dist_mue.dtype))

    def _can_fully_fuse(self) -> bool:
        return (
            self.fully_fused
            and not self.optimizer_logging
            # No shard_map path yet: under a mesh the plain pallas_call
            # would run the FULL tile grid replicated on every device (8x
            # the work for zero speedup).  Sharded CEM keeps the modular
            # kernel, which does split across devices.
            and self._mesh is None
            and self._can_use_pallas()
            # The fused CEM kernel evaluates cost fully in-body (no
            # terminal-state output): a post-terminal hook (learned value
            # terminal) keeps the modular path, whose cost kernel emits
            # x_H for V evaluated outside (_build_pallas_cost).
            and self._post_terminal_fn() is None
        )

    def _build_fused_cem(self, interpret: bool = False, tile_k: int = None):
        from control_toolkit_tpu.ops.pallas_cem import (
            DEFAULT_TILE_K, build_fused_cem,
        )

        param_keys, pack, derivs, stage_soa, terminal_soa, pred = (
            self._soa_bindings()
        )
        make_run, regen = build_fused_cem(
            derivs, stage_soa, terminal_soa,
            num_states=self.num_states,
            num_controls=self.num_control_inputs,
            horizon=self.mpc_horizon,
            param_keys=param_keys,
            action_low=self.action_low, action_high=self.action_high,
            integrator=pred.integrator,
            intermediate_steps=pred.intermediate_steps,
            tile_k=tile_k or DEFAULT_TILE_K,
            interpret=interpret,
            fast_sampling=bool(getattr(pred, "fast_math", False)),
        )
        return make_run(self.num_rollouts, pred.dt), regen, pack

    def _make_batched_cem_step(self, num_slots: int, interpret: bool = False,
                               tile_k: int = None,
                               per_slot_dyn=(), per_slot_cost=()):
        """B-session CEM step for BatchedMPC (columnwise kernel path).

        All B sessions' K rollouts evaluate through ONE Pallas launch per
        outer iteration (ops/pallas_rollout.py ``slot_keys`` form): s0 and
        Q are per-rollout operands, so sessions pack by concatenation
        along K; per-session attrs and u_prev ride as a per-lane
        ``pslot [n_sk, B*K]`` VMEM operand.  Sampling, the per-session
        top-k elite selection and the mu/sigma refit stay in XLA on the
        reshaped ``[B, K]`` blocks.  Per-session PRNG streams match the
        single-session step bitwise (same split + ``normal(sub, (K,H,U))``
        draw from each session's own key), so a session's results don't
        depend on B.

        Requires ``warmup=False`` (the outer-loop trip count is shared
        across sessions; per-session warmup needs the vmapped path) and
        returns ``(step, refit_from_Q)``: ``step(states, s [B,1,S], dyn,
        cost, attrs) -> (u [B,U], states', costs [B,K])`` over the stacked
        (vmap-layout) CEMState, and ``refit_from_Q(states, s, dyn, cost,
        attrs, Q_b [B,K,H,U])`` exposes the deterministic evaluate+refit
        for testing with an injected population.
        """
        from control_toolkit_tpu.ops.pallas_rollout import (
            DEFAULT_TILE_K, build_cost_rollout_kernel,
        )

        if self.warmup:
            raise NotImplementedError(
                "batched CEM kernel path requires warmup=False (shared "
                "outer-loop trip count); warmup sessions take the vmapped "
                "scan path"
            )
        if self._post_terminal_fn() is not None:
            # The callers' eligibility gates route valued CEM to the
            # vmapped path; a DIRECT composition must fail loudly rather
            # than silently optimize without the learned value terminal.
            raise NotImplementedError(
                "batched CEM steps do not evaluate a learned value "
                "terminal; use the vmapped path for valued CEM sessions"
            )
        B, K = int(num_slots), self.num_rollouts
        H, U, S = self.mpc_horizon, self.num_control_inputs, self.num_states
        tk = tile_k or DEFAULT_TILE_K
        if (B * K) % tk != 0:
            raise ValueError(
                f"batched CEM kernel needs B*K % {tk} == 0; got B={B}, K={K}"
            )

        param_keys, _, derivs, stage_soa, terminal_soa, pred = (
            self._soa_bindings()
        )
        shared_keys, slot_keys = split_slot_keys(
            param_keys, per_slot_dyn, per_slot_cost
        )
        kernel = build_cost_rollout_kernel(
            derivs, stage_soa, terminal_soa,
            num_states=S, num_controls=U, horizon=H, dt=pred.dt,
            param_keys=param_keys, integrator=pred.integrator,
            intermediate_steps=pred.intermediate_steps,
            tile_k=tk, interpret=interpret, slot_keys=slot_keys,
        )

        low, high = self.action_low, self.action_high
        best_k, iterations = self.cem_best_k, self.cem_outer_it
        u_mid = 0.5 * (low + high)
        cf = getattr(self.cost_function, "cost_function", self.cost_function)
        from control_toolkit_tpu.optimizers.base import make_slot_packer

        _pack = make_slot_packer(
            shared_keys, slot_keys, getattr(cf, "attr_defaults", {}), B, K
        )

        def pack_operands(states, dyn, cost, attrs):
            return _pack(states.u_prev, dyn, cost, attrs)

        def evaluate_and_refit(s0flat, Q_b, pvec, pslot):
            costs = kernel(
                s0flat, Q_b.reshape(B * K, H, U), pvec, pslot
            ).reshape(B, K)
            idx = jax.vmap(lambda c: elite_indices(c, best_k))(costs)
            elite = jnp.take_along_axis(
                Q_b, idx[:, :, None, None], axis=1
            )                                               # [B, best_k, H, U]
            new_mue = jnp.mean(elite, axis=1, keepdims=True)
            new_std = jnp.std(elite, axis=1, keepdims=True)
            return new_mue, new_std, elite[:, 0], costs

        def refit_from_Q(states, s, dyn, cost, attrs, Q_b):
            pvec, pslot = pack_operands(states, dyn, cost, attrs)
            s0flat = jnp.repeat(s[:, 0, :], K, axis=0)          # [B*K, S]
            return evaluate_and_refit(s0flat, Q_b, pvec, pslot)

        def step(states, s, dyn, cost, attrs):
            pvec, pslot = pack_operands(states, dyn, cost, attrs)
            s0flat = jnp.repeat(s[:, 0, :], K, axis=0)

            def outer(i, carry):
                key, mue, std, _, _ = carry
                keys = jax.vmap(lambda k: jax.random.split(k))(key)
                key, subs = keys[:, 0], keys[:, 1]
                noise = jax.vmap(
                    lambda k: jax.random.normal(k, (K, H, U), jnp.float32)
                )(subs)
                Q_b = jnp.clip(mue + noise * std, low, high)    # [B,K,H,U]
                mue, std, e0, costs = evaluate_and_refit(
                    s0flat, Q_b, pvec, pslot
                )
                return key, mue, std, e0, costs

            carry = (
                states.key, states.dist_mue, states.stdev,
                jnp.zeros((B, H, U), jnp.float32),
                jnp.zeros((B, K), jnp.float32),
            )
            key, mue, std, e0, costs = jax.lax.fori_loop(
                0, iterations, outer, carry
            )
            u = e0[:, 0, :]

            # Post-loop distribution shift (reference optimizer_cem_tf.py
            # :99-104), per session: clip sigma, shift both one step, pad
            # tails with the initial defaults.
            std = jnp.clip(std, self.cem_stdev_min, 1.0e8)
            std = jnp.concatenate(
                [std[:, :, 1:, :],
                 jnp.full((B, 1, 1, U), self.cem_initial_action_stdev,
                          jnp.float32)],
                axis=2,
            )
            mue = jnp.concatenate(
                [mue[:, :, 1:, :],
                 jnp.broadcast_to(u_mid, (B, 1, 1, U)).astype(jnp.float32)],
                axis=2,
            )
            new_states = CEMState(
                key=key, dist_mue=mue, stdev=std,
                count=states.count + 1, u_prev=u,
            )
            return u, new_states, costs

        return step, refit_from_Q

    def _make_batched_fused_cem_step(self, num_slots: int,
                                     interpret: bool = False,
                                     tile_k: int = None,
                                     per_slot_dyn=(), per_slot_cost=()):
        """B-session FULLY-FUSED CEM step for BatchedMPC.

        The columns-mode fused CEM kernel (ops/pallas_cem.py
        ``build_fused_cem_cols``) samples every session's population from
        a counter PRNG IN VMEM, rolls it out and writes only the [B*K]
        costs — zero population bytes in HBM per outer iteration, which
        is exactly what makes the materialize+transpose-bound modular
        columns path a negative result (docs/KERNELS.md).  Elite rows are
        regenerated per session in XLA from the same counters (bit-exact)
        for the mu/sigma refit.

        Counter PRNG semantics (not bit-compatible with jax.random) are
        opt-in via the same ``fully_fused`` flag as the single-session
        path; per-session seeds derive from each session's CEMState key,
        so a session's results don't depend on B.  Requires
        ``warmup=False``.  Returns ``step(states, s [B,1,S], dyn, cost,
        attrs) -> (u [B,U], states', costs [B,K])``.
        """
        from control_toolkit_tpu.ops.pallas_cem import build_fused_cem_cols
        from control_toolkit_tpu.ops.pallas_mppi import DEFAULT_TILE_K, ROWS
        from control_toolkit_tpu.optimizers.base import make_slot_packer

        if self.warmup:
            raise NotImplementedError(
                "batched fused CEM requires warmup=False (shared outer-loop "
                "trip count)"
            )
        if self._post_terminal_fn() is not None:
            # Same loud refusal as the modular batched step: the fused
            # kernel writes costs only — a learned value terminal would be
            # silently dropped for every session.
            raise NotImplementedError(
                "batched fused CEM does not evaluate a learned value "
                "terminal; use the vmapped path for valued CEM sessions"
            )
        B, K = int(num_slots), self.num_rollouts
        H, U, S = self.mpc_horizon, self.num_control_inputs, self.num_states
        tk = tile_k or DEFAULT_TILE_K
        if K % ROWS != 0 or (B * K) % tk != 0:
            raise ValueError(
                f"batched fused CEM needs K % {ROWS} == 0 and B*K % {tk} "
                f"== 0; got B={B}, K={K}"
            )
        cps = K // ROWS
        C = tk // ROWS
        T = (B * K) // tk

        param_keys, _, derivs, stage_soa, terminal_soa, pred = (
            self._soa_bindings()
        )
        # Per-slot dynamics constants / cost weights join the attrs+u_prev
        # pslot rows (heterogeneous fleets / kernel-path parameter grids)
        # exactly as in the semi-fused MPPI columns step.
        shared_keys, slot_keys = split_slot_keys(
            param_keys, per_slot_dyn, per_slot_cost
        )
        make_run_cols, regen_cols = build_fused_cem_cols(
            derivs, stage_soa, terminal_soa,
            num_states=S, num_controls=U, horizon=H,
            param_keys=param_keys, slot_keys=slot_keys,
            action_low=self.action_low, action_high=self.action_high,
            k_per_session=K, integrator=pred.integrator,
            intermediate_steps=pred.intermediate_steps,
            tile_k=tk, interpret=interpret,
            fast_sampling=bool(getattr(pred, "fast_math", False)),
        )
        run = make_run_cols(B * K, pred.dt)
        cf = getattr(self.cost_function, "cost_function", self.cost_function)
        slot_pack = make_slot_packer(
            shared_keys, slot_keys, getattr(cf, "attr_defaults", {}), B
        )

        low, high = self.action_low, self.action_high
        best_k, iterations = self.cem_best_k, self.cem_outer_it
        u_mid = 0.5 * (low + high)
        cw_static = jnp.tile(jnp.arange(cps, dtype=jnp.int32), B)  # [B*cps]

        def expand_cols(vals):          # [B, n] -> [T, n, C]
            n = vals.shape[1]
            cols = jnp.repeat(vals, cps, axis=0)               # [B*cps, n]
            return cols.reshape(T, C, n).transpose(0, 2, 1)

        def step(states, s, dyn, cost, attrs):
            pvec, rows = slot_pack(states.u_prev, dyn, cost, attrs)
            pslot_cols = expand_cols(rows)                     # [T, n_sk, C]
            s0_cols = expand_cols(s[:, 0, :])                  # [T, S, C]

            def outer(i, carry):
                key, mue, std, _, _ = carry                    # mue [B,1,H,U]
                keys = jax.vmap(lambda k: jax.random.split(k))(key)
                key, subs = keys[:, 0], keys[:, 1]
                seed_b = jax.vmap(
                    lambda k: jax.random.randint(
                        k, (), 0, 2**31 - 1, jnp.int32
                    )
                )(subs)                                        # [B]
                mue_cols = expand_cols(mue[:, 0].reshape(B, H * U))
                std_cols = expand_cols(std[:, 0].reshape(B, H * U))
                seedcw = jnp.stack(
                    [jnp.repeat(seed_b, cps), cw_static], axis=1
                ).reshape(T, C, 2).transpose(0, 2, 1)          # [T, 2, C]
                costs2d = run(
                    pvec, s0_cols, mue_cols, std_cols, pslot_cols, seedcw
                )                                              # [ROWS, B*cps]
                costs = (
                    costs2d.reshape(ROWS, B, cps)
                    .transpose(1, 0, 2).reshape(B, K)
                )                                              # k = r*cps+cw
                idx = jax.vmap(lambda c: elite_indices(c, best_k))(costs)
                elite = jax.vmap(regen_cols)(
                    seed_b, idx, mue[:, 0], std[:, 0]
                )                                              # [B,bk,H,U]
                new_mue = jnp.mean(elite, axis=1, keepdims=True)
                new_std = jnp.std(elite, axis=1, keepdims=True)
                return key, new_mue, new_std, elite[:, 0], costs

            carry = (
                states.key, states.dist_mue, states.stdev,
                jnp.zeros((B, H, U), jnp.float32),
                jnp.zeros((B, K), jnp.float32),
            )
            key, mue, std, e0, costs = jax.lax.fori_loop(
                0, iterations, outer, carry
            )
            u = e0[:, 0, :]

            std = jnp.clip(std, self.cem_stdev_min, 1.0e8)
            std = jnp.concatenate(
                [std[:, :, 1:, :],
                 jnp.full((B, 1, 1, U), self.cem_initial_action_stdev,
                          jnp.float32)],
                axis=2,
            )
            mue = jnp.concatenate(
                [mue[:, :, 1:, :],
                 jnp.broadcast_to(u_mid, (B, 1, 1, U)).astype(jnp.float32)],
                axis=2,
            )
            new_states = CEMState(
                key=key, dist_mue=mue, stdev=std,
                count=states.count + 1, u_prev=u,
            )
            return u, new_states, costs

        return step

    def _make_step_fn(self):
        K, H, U = self.num_rollouts, self.mpc_horizon, self.num_control_inputs
        low, high = self.action_low, self.action_high
        best_k = self.cem_best_k
        u_mid = 0.5 * (self.action_low + self.action_high)
        # Logging needs the trajectories; otherwise evaluate costs through the
        # fused/Pallas path and keep the loop carry trajectory-free.
        cost_only = None if self.optimizer_logging else self._make_cost_only()
        fused = self._build_fused_cem() if self._can_fully_fuse() else None
        # The [K,H,U] population rides the loop carry / diag ONLY when
        # logging wants it — with logging off that's ~200 MB of pure HBM
        # output traffic per step at K=262k (MPPI gates identically).
        want_Q = self.optimizer_logging and fused is None

        def outer_iter(carry, s_tiled, u_prev, params):
            key, mue, std = carry["key"], carry["mue"], carry["std"]
            key, sub = jax.random.split(key)
            if fused is not None:
                run, regen, pack = fused
                seed = jax.random.randint(sub, (1,), 0, 2**31 - 1, jnp.int32)
                seed2 = jnp.concatenate([seed, jnp.zeros(1, jnp.int32)])
                pvec = pack(params, u_prev)
                costs2d = run(s_tiled[0], mue[0], std[0], pvec, seed2)
                cost = costs2d.reshape(-1)
                idx = elite_indices(cost, best_k)
                # Only the elite rows are ever materialized — regenerated in
                # XLA from the kernel's noise counters, bit-exactly.
                elite_Q = regen(seed2, idx, mue[0], std[0], K)
                new_mue = jnp.mean(elite_Q, axis=0, keepdims=True)
                new_std = jnp.std(elite_Q, axis=0, keepdims=True)
                return {
                    "key": key, "mue": new_mue, "std": new_std,
                    "elite0": elite_Q[0], "cost": cost,
                }
            Q = mue + jax.random.normal(sub, (K, H, U), jnp.float32) * std
            Q = jnp.clip(Q, low, high)
            if cost_only is not None:
                cost = cost_only(s_tiled, Q, u_prev, params)
            else:
                cost, traj = self._rollout_and_cost(s_tiled, Q, u_prev, params)
            idx = elite_indices(cost, best_k)
            elite_Q = Q[idx]
            new_mue = jnp.mean(elite_Q, axis=0, keepdims=True)
            new_std = jnp.std(elite_Q, axis=0, keepdims=True)
            out = {
                "key": key, "mue": new_mue, "std": new_std,
                "elite0": elite_Q[0], "cost": cost,
            }
            if want_Q:
                out["Q"] = Q
            if cost_only is None:
                out["traj"] = traj
            return out

        def step_fn(state: CEMState, s, params):
            s_tiled = jnp.tile(s[:1], (K, 1))
            iterations = cem_trip_count(self, state.count)
            carry = cem_base_carry(
                state.key, state.dist_mue, state.stdev,
                K, H, U, self.num_states, want_Q, cost_only is None,
            )
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
            diag = cem_diag(carry, want_Q, cost_only is None)
            new_state = CEMState(
                key=carry["key"], dist_mue=mue, stdev=std,
                count=state.count + 1, u_prev=u,
            )
            return u, new_state, diag

        return step_fn
