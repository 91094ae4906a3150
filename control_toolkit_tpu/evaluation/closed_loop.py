"""On-device closed-loop evaluation: controller + plant in ONE program.

The reference runs its closed loops host-side — eager Python alternating
``controller.step`` and ``env.step`` (README.md:199-204 points at downstream
sims).  On TPU through a tunnel that pays a ~25-30 ms program-launch per
tick, which swamps a sub-ms controller step (BENCH_r02's 31.2 ms host-loop
p50 was almost pure dispatch).  TPU-native answer: fuse the whole loop —
optimizer step, plant advance, realized stage cost — into one jitted
``lax.scan`` over T ticks.  One launch per EPISODE, so the measured ms/tick
is real device time, and the same harness doubles as a fast eval bench for
zoo tests (VERDICT r2 item 3).

Restrictions (by construction, not policy):
- the optimizer must expose the pure ``step(state, s, params)`` contract
  (every optimizer in this framework does);
- the predictor must be stateless (RNN hidden advance is a host-side hook,
  ``Optimizer._post_step``; threading it through the scan is possible but
  out of scope while no stateful family needs closed-loop eval).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ClosedLoop:
    """Fused controller+plant loop for one optimizer and one environment.

    ``run(s0, ticks)`` executes the episode on device and returns host
    arrays; ``run_device(opt_state, s0, params, ticks)`` is the raw jitted
    program for benchmarking (callers time two tick-lengths and take the
    slope — see bench.py's dispatch-free measurement rule).
    """

    def __init__(self, controller, env, actuator_noise: Optional[float] = None,
                 noise_seed: int = 0):
        # Default to the ENVIRONMENT's own actuator noise so the fused loop
        # replicates `env.step` semantics unless explicitly overridden.
        if actuator_noise is None:
            actuator_noise = getattr(env, "actuator_noise", 0.0)
        opt = controller.optimizer
        if opt.predictor is not None and getattr(opt.predictor, "is_stateful", False):
            raise ValueError(
                "ClosedLoop supports stateless predictors only (RNN hidden "
                "advance is a host-side hook; run the Python loop instead)"
            )
        self.controller = controller
        self.optimizer = opt
        self.env = env
        self.actuator_noise = float(actuator_noise)
        self._noise_key = jax.random.PRNGKey(noise_seed)

        step_fn = opt._make_step_fn()
        cf = controller.cost_function.cost_function
        env_step = env.step_dynamics
        env_dt = env.dt
        a_low = jnp.asarray(env.action_low, jnp.float32)
        a_high = jnp.asarray(env.action_high, jnp.float32)
        noise_scale = self.actuator_noise

        @partial(jax.jit, static_argnames=("ticks",))
        def run_device(opt_state, s0, params, noise_keys, ticks: int):
            def body(carry, key):
                opt_state, s, u_prev = carry
                u, opt_state, _ = step_fn(opt_state, s[None, :], params)
                u_applied = u
                if noise_scale > 0.0:
                    u_applied = u + noise_scale * jax.random.normal(key, u.shape)
                u_applied = jnp.clip(u_applied, a_low, a_high)
                stage = cf.stage_cost_step(
                    s[None, :], u_applied[None, :], u_prev[None, :],
                    {"cost": params["cost"], "attrs": params["attrs"]},
                )[0]
                s_next = env_step(s[None, :], u_applied[None, :], env_dt)[0]
                return (opt_state, s_next, u_applied), (s, u_applied, stage)

            u0 = jnp.zeros((opt.num_control_inputs,), jnp.float32)
            (opt_state, sT, _), (ss, us, stage) = jax.lax.scan(
                body, (opt_state, s0, u0), noise_keys, length=ticks
            )
            return opt_state, sT, ss, us, stage

        self._run_device = run_device

    def run_device(self, opt_state, s0, params, ticks: int):
        """Raw device program (for slope benchmarking): one launch, ``ticks``
        control steps.  Advances the noise key per call (like ``run``) so
        successive episodes draw independent actuator noise."""
        self._noise_key, sub = jax.random.split(self._noise_key)
        keys = jax.random.split(sub, ticks)
        return self._run_device(opt_state, s0, params, keys, ticks)

    def run(self, s0: np.ndarray, ticks: int, reset: bool = True
            ) -> Dict[str, np.ndarray]:
        """Run one episode; returns {'states' [T,S], 'controls' [T,U],
        'stage_costs' [T], 'final_state' [S], 'mean_cost' scalar}."""
        if reset:
            self.optimizer.optimizer_reset()
        self._noise_key, sub = jax.random.split(self._noise_key)
        keys = jax.random.split(sub, ticks)
        params = self.controller._assemble_params()
        s0 = jnp.asarray(np.reshape(s0, (-1,)), jnp.float32)
        opt_state, sT, ss, us, stage = self._run_device(
            self.optimizer.opt_state, s0, params, keys, ticks
        )
        self.optimizer.opt_state = opt_state
        return {
            "states": np.asarray(ss),
            "controls": np.asarray(us),
            "stage_costs": np.asarray(stage),
            "final_state": np.asarray(sT),
            "mean_cost": float(np.mean(np.asarray(stage))),
        }
