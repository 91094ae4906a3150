"""Online system identification: adapt the residual dynamics model while
the controller runs.

Closes the model-mismatch loop that the reference leaves to offline
SI_Toolkit retraining: an ``OnlineSysId`` attached to an MPC controller
whose predictor is a ``ResidualPredictor`` (spec ``"ODE+res"``) records the
transitions the plant actually produced and periodically fits the MLP
residual to the base model's one-step error.  Because the residual weights
are part of the ``params["dyn"]`` jit-argument pytree, installing new
weights is a cache invalidation, not a recompile — the control loop never
stalls on XLA.

Typical loop::

    sysid = OnlineSysId(ctrl)
    for t in range(T):
        u = ctrl.step(s)
        s_next = plant(s, u)
        sysid.observe(s, u, s_next)
        if t % 25 == 24:
            sysid.fit_and_apply(steps=200)
        s = s_next
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from control_toolkit_tpu.models.residual_predictor import ResidualPredictor
from control_toolkit_tpu.utils.logging_util import get_logger

logger = get_logger(__name__)


class OnlineSysId:
    """Ring buffer of observed transitions + jitted residual fitting.

    ``controller`` is an MPCController whose predictor resolves to a
    ResidualPredictor; alternatively pass ``predictor=`` directly.
    """

    def __init__(
        self,
        controller=None,
        predictor: Optional[ResidualPredictor] = None,
        capacity: int = 4096,
        batch_size: int = 256,
        learning_rate: float = 1e-3,
        seed: int = 0,
    ):
        if predictor is None:
            if controller is None:
                raise ValueError("need a controller or a predictor")
            predictor = getattr(controller.predictor, "predictor",
                                controller.predictor)
        if not isinstance(predictor, ResidualPredictor):
            raise TypeError(
                "OnlineSysId needs a ResidualPredictor (predictor spec "
                f"'ODE+res'); got {type(predictor).__name__}"
            )
        self.controller = controller
        self.predictor = predictor
        S, U = predictor.num_states, predictor.num_control_inputs
        self.capacity = int(capacity)
        self.batch_size = int(batch_size)
        self._s = np.zeros((self.capacity, S), np.float32)
        self._u = np.zeros((self.capacity, U), np.float32)
        self._sn = np.zeros((self.capacity, S), np.float32)
        self._head = 0
        self._count = 0
        self._key = jax.random.PRNGKey(seed)

        self._tx = optax.adam(learning_rate)
        # Adam state persists across fit->apply->fit cycles (the weights
        # continue from where they left off); it is DROPPED when a fit's
        # result was discarded, so stale moments from an abandoned weight
        # trajectory can't steer the next fit.
        self._opt_state = None
        self._pending = False   # last fit produced weights not yet applied
        self._fit_jit = None    # built per static step count

    # ---- data -------------------------------------------------------------
    def observe(self, s, u, s_next) -> None:
        """Record one observed plant transition."""
        i = self._head
        self._s[i] = np.reshape(np.asarray(s, np.float32), (-1,))
        self._u[i] = np.reshape(np.asarray(u, np.float32), (-1,))
        self._sn[i] = np.reshape(np.asarray(s_next, np.float32), (-1,))
        self._head = (i + 1) % self.capacity
        self._count = min(self._count + 1, self.capacity)

    def __len__(self) -> int:
        return self._count

    # ---- fitting ----------------------------------------------------------
    def _build_fit(self, steps: int):
        base_step = self.predictor.base.single_step
        tx = self._tx
        batch = self.batch_size

        from control_toolkit_tpu.models.networks import mlp_apply

        def loss_fn(res, bp, xs, us, sn):
            pred = base_step(xs, us, bp) + mlp_apply(
                res, jnp.concatenate([xs, us], axis=-1)
            )
            return jnp.mean((pred - sn) ** 2)

        def masked_loss(res, bp, xs, us, sn, count):
            # Diagnostic loss over the VALID ring-buffer prefix only (the
            # buffer is a fixed-capacity jit argument; unwritten rows are
            # masked, not sliced, to keep shapes static).
            pred = base_step(xs, us, bp) + mlp_apply(
                res, jnp.concatenate([xs, us], axis=-1)
            )
            w = (jnp.arange(xs.shape[0]) < count).astype(jnp.float32)
            per_row = jnp.mean((pred - sn) ** 2, axis=-1)
            return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)

        @jax.jit
        def fit(res, opt_state, key, bp, s_buf, u_buf, sn_buf, count):
            def body(i, carry):
                res, opt_state, key, loss = carry
                key, sub = jax.random.split(key)
                idx = jax.random.randint(sub, (batch,), 0, count)
                loss, grads = jax.value_and_grad(loss_fn)(
                    res, bp, s_buf[idx], u_buf[idx], sn_buf[idx]
                )
                updates, opt_state = tx.update(grads, opt_state)
                res = optax.apply_updates(res, updates)
                return res, opt_state, key, loss

            init_loss = masked_loss(res, bp, s_buf, u_buf, sn_buf, count)
            res, opt_state, key, loss = jax.lax.fori_loop(
                0, steps, body, (res, opt_state, key, init_loss)
            )
            final_loss = masked_loss(res, bp, s_buf, u_buf, sn_buf, count)
            return res, opt_state, key, init_loss, final_loss

        return fit

    def fit(self, steps: int = 200) -> Dict[str, float]:
        """Run ``steps`` Adam steps on the residual; returns diagnostics.

        Does NOT install the weights — call ``apply()`` (or use
        ``fit_and_apply``) so callers control when the controller sees the
        new model.
        """
        if self._count < self.batch_size:
            return {"fitted": 0.0, "count": float(self._count)}
        res = jax.tree_util.tree_map(
            lambda v: jnp.asarray(v, jnp.float32), self.predictor._res
        )
        if self._pending:
            # The previous fit was discarded: this fit restarts from the
            # installed weights, so its Adam moments no longer apply.
            self._opt_state = None
        if self._opt_state is None:
            self._opt_state = self._tx.init(res)
        if self._fit_jit is None or self._fit_steps != steps:
            self._fit_jit = self._build_fit(steps)
            self._fit_steps = steps
        bp = jax.tree_util.tree_map(
            lambda v: jnp.asarray(v, jnp.float32),
            self.predictor.base.default_params(),
        )
        res, self._opt_state, self._key, l0, l1 = self._fit_jit(
            res, self._opt_state, self._key, bp,
            jnp.asarray(self._s), jnp.asarray(self._u), jnp.asarray(self._sn),
            jnp.int32(self._count),
        )
        self._fitted_res = res
        self._pending = True
        return {
            "fitted": 1.0, "count": float(self._count),
            "loss_before": float(l0), "loss_after": float(l1),
        }

    def apply(self) -> None:
        """Install the last fitted residual into the live predictor (and
        invalidate the controller's cached dyn params)."""
        res = getattr(self, "_fitted_res", None)
        if res is None:
            return
        self.predictor.set_residual(res)
        self._pending = False
        # One-shot: a later bare apply() must not re-install this (by
        # then possibly stale) fit over weights set by other means, e.g.
        # a checkpoint restored via load_residual.
        self._fitted_res = None
        if self.controller is not None:
            self.controller._dyn_params = None

    def fit_and_apply(self, steps: int = 200) -> Dict[str, float]:
        diag = self.fit(steps)
        if diag.get("fitted"):
            self.apply()
        return diag

    # ---- evaluation -------------------------------------------------------
    def one_step_mse(self, use_residual: bool = True) -> float:
        """Mean one-step prediction error over the recorded transitions."""
        n = self._count
        if n == 0:
            return float("nan")
        xs = jnp.asarray(self._s[:n])
        us = jnp.asarray(self._u[:n])
        sn = jnp.asarray(self._sn[:n])
        if use_residual:
            pred = self.predictor.single_step(
                xs, us, self.predictor.default_params()
            )
        else:
            pred = self.predictor.base.single_step(
                xs, us, self.predictor.base.default_params()
            )
        return float(jnp.mean((pred - sn) ** 2))
