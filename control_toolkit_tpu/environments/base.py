"""Batched gym-style environment base.

Capability parity with the reference EnvironmentBatched
(/root/reference/others/environment.py:13-136): gymnasium>=0.26 5-tuple step
API, a pure ``step_dynamics(state, action, dt)`` hook, batched actuator
noise, and batch-dim expansion.  Environments double as closed-loop test
benches for the controllers.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.utils.rng import make_key


class EnvironmentBatched:
    num_states: int
    num_actions: int
    action_low: np.ndarray
    action_high: np.ndarray

    def __init__(self, batch_size: int = 1, dt: float = 0.02, seed: Optional[int] = None,
                 actuator_noise: float = 0.0):
        self.batch_size = batch_size
        self.dt = float(dt)
        self._key = make_key(seed, context=self.__class__.__name__)
        self.actuator_noise = float(actuator_noise)
        self.state: Optional[jnp.ndarray] = None
        self._predictor = None
        self._step_jit = jax.jit(self._step_impl)

    # ---- predictor attachment ---------------------------------------------
    # Reference parity: /root/reference/others/environment.py:20-33 — an
    # environment can roll with a LEARNED predictor in place of its true
    # dynamics (e.g. to evaluate a trained model closed-loop).  The setter
    # re-jits the step so the predictor path is traced in; the predictor's
    # parameters remain a jit ARGUMENT (re-read every step), so an online-
    # sysid update to the model is picked up without recompiling.
    @property
    def predictor(self):
        if self._predictor is None:
            raise ValueError("Predictor not set for this environment yet")
        return self._predictor

    @predictor.setter
    def predictor(self, p) -> None:
        self._predictor = p
        self._step_jit = jax.jit(self._step_impl)

    def _dynamics_step(self, state, action, pred_params):
        if self._predictor is None:
            return self.step_dynamics(state, action, self.dt)
        single = getattr(self._predictor, "single_step", None)
        if single is not None:
            return single(state, action, pred_params)
        # Horizon-1 predict: [B,1,U] -> [B,2,S], take the advanced state.
        return self._predictor.predict_core(state, action[:, None, :], pred_params)[:, 1]

    # ---- to implement ------------------------------------------------------
    def step_dynamics(self, state: jnp.ndarray, action: jnp.ndarray, dt: float) -> jnp.ndarray:
        """Pure dynamics advance: [B,S],[B,U] -> [B,S]."""
        raise NotImplementedError

    def get_reward(self, state: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def is_done(self, state: jnp.ndarray) -> jnp.ndarray:
        return jnp.zeros(state.shape[:-1], dtype=bool)

    def _sample_initial_state(self, key: jax.Array) -> jnp.ndarray:
        raise NotImplementedError

    # ---- gym-style API -----------------------------------------------------
    def reset(self, seed: Optional[int] = None) -> Tuple[np.ndarray, Dict]:
        if seed is not None:
            self._key = make_key(seed, context=self.__class__.__name__)
        self._key, sub = jax.random.split(self._key)
        self.state = self._sample_initial_state(sub)
        # A stateful (RNN) attached predictor must not carry the previous
        # episode's terminal hidden into the new one — cross-episode
        # correlation even under fixed seeds.
        reset_state = getattr(self._predictor, "reset_state", None)
        if reset_state is not None and getattr(
            self._predictor, "is_stateful", False
        ):
            reset_state()
        return np.asarray(self.state), {}

    def _trace_token(self):
        """Everything ``_step_impl`` reads off ``self`` at trace time (the
        plant's true constants, the noise scale, dt): mutating any of
        these must retrace, not silently keep the frozen values
        (CLAUDE.md: never read self.<mutable> inside a jitted step)."""
        p = getattr(self, "params", None)
        ptok = None if p is None else tuple(
            sorted((k, np.asarray(v, np.float64).tobytes()) for k, v in p.items())
        )
        return (ptok, float(self.actuator_noise), float(self.dt))

    def _step_impl(self, state, action, key, pred_params):
        if self.actuator_noise > 0.0:
            action = action + self.actuator_noise * jax.random.normal(key, action.shape)
        action = jnp.clip(action, jnp.asarray(self.action_low), jnp.asarray(self.action_high))
        next_state = self._dynamics_step(state, action, pred_params)
        reward = self.get_reward(next_state, action)
        terminated = self.is_done(next_state)
        # The APPLIED action is returned so the caller can advance any
        # stateful predictor with the same control that produced
        # next_state (raw-vs-applied divergence review r5).
        return next_state, reward, terminated, action

    def step(self, action) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, Dict]:
        action = self._expand_batch(jnp.asarray(action, jnp.float32), self.num_actions)
        self._key, sub = jax.random.split(self._key)
        pred_params = (
            self._predictor.default_params() if self._predictor is not None else {}
        )
        token = self._trace_token()
        if token != getattr(self, "_traced_token", token):
            self._step_jit = jax.jit(self._step_impl)  # constants changed
        self._traced_token = token
        prev_state = self.state
        self.state, reward, terminated, applied = self._step_jit(
            self.state, action, sub, pred_params
        )
        if self._predictor is not None and getattr(
            self._predictor, "is_stateful", False
        ):
            # Recurrent learned plant: advance the predictor's persistent
            # hidden with the APPLIED (noised+clipped) control — the one
            # that produced self.state — so the env really recurs along
            # its own trajectory.
            if self.batch_size == 1:
                self._predictor.update(prev_state[:1], applied[:1, None, :])
            else:
                import warnings

                warnings.warn(
                    "stateful predictor attached to a batch>1 environment: "
                    "the batch-1 hidden cannot track multiple plants; "
                    "hidden state NOT advanced", stacklevel=2,
                )
        truncated = jnp.zeros_like(terminated)
        return (
            np.asarray(self.state),
            np.asarray(reward),
            np.asarray(terminated),
            np.asarray(truncated),
            {},
        )

    def _expand_batch(self, arr: jnp.ndarray, last_dim: int) -> jnp.ndarray:
        arr = jnp.atleast_1d(arr)
        if arr.ndim == 1:
            arr = arr.reshape(1, -1) if arr.shape[0] == last_dim else arr[:, None]
        if arr.shape[0] != self.batch_size:
            arr = jnp.broadcast_to(arr, (self.batch_size, arr.shape[-1]))
        return arr
