"""Cost function base: stage/terminal/trajectory cost contract.

Capability parity with the reference cost_function_base
(/root/reference/Cost_Functions/__init__.py:9-104), preserving the exact
reduction semantics the optimizers rely on:

* ``get_stage_cost`` shifts ``_get_stage_cost`` by ``-MAX_COST`` so costs are
  <= 0 when MAX_COST bounds the raw cost (reference :63-64).
* ``get_trajectory_cost`` is the **mean** over the concatenation of H stage
  costs and 1 terminal cost — i.e. mean over H+1 entries (reference :74-93).
* ``get_summed_stage_cost`` is the sum over stage costs (reference :71-72).

TPU-native redesign: all methods are pure in ``(arrays, params)``; mutable
config lives in a dict that is passed *through jit as an argument* so cost
hot-reload never triggers recompilation.  ``variable_parameters`` (targets
etc.) arrive in the same way under ``params['attrs']``.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp


class CostFunction:
    MIN_COST = -1.0
    MAX_COST = 0.0

    # Names of numeric config entries that become jit arguments.  Subclasses
    # list their tunable weights here; everything else in the YAML entry is
    # treated as static.
    dynamic_config_keys: tuple = ()
    # Names of environment attributes (variable_parameters) this cost reads;
    # declared so the Pallas kernel can pack them into its scalar vector.
    attr_keys: tuple = ()
    # Default value per attr when the host never set it.  The SINGLE source
    # of truth for both the dict path (attrs.get in the cost code must use
    # these values) and the packed-kernel path (Optimizer._soa_bindings
    # fills missing attrs from here) — a mismatch makes the TPU kernel and
    # the scan path optimize different objectives.
    attr_defaults: dict = {}

    def __init__(self, config: Optional[Dict] = None):
        self.config: Dict = dict(config or {})
        self.batch_size: Optional[int] = None
        self.horizon: Optional[int] = None
        self.logged_attributes: Dict = {}

    def configure(self, batch_size: int, horizon: int, **kwargs) -> None:
        self.batch_size = batch_size
        self.horizon = horizon

    # Cost-config keys that MIRROR dynamics constants (FK link lengths,
    # masses for energy shaping, ...).  Subclasses declare them; configure
    # then seeds unset values from the predictor and warns on explicit
    # mismatches — the optimizer must never score a phantom mechanism.
    mirrored_dynamics_keys: Tuple[str, ...] = ()

    def _init_merged(self, config: Optional[Dict]) -> Dict:
        """DEFAULTS+config merge that also records which keys the USER set
        explicitly (needed by sync_with_dynamics' seed-vs-warn decision)."""
        merged = dict(getattr(self, "DEFAULTS", {}))
        merged.update(config or {})
        self._explicit_keys = set(config or {})
        return merged

    def sync_with_dynamics(self, dyn_params: Dict) -> None:
        """Reconcile cost-side copies of dynamics constants with the
        predictor's parameters (called by MPCController.configure after
        both sides exist): keys in ``mirrored_dynamics_keys`` the user did
        NOT set explicitly are seeded from the dynamics; explicitly-set
        values that disagree get a loud warning."""
        if not self.mirrored_dynamics_keys or not isinstance(dyn_params, dict):
            return
        # Residual predictors ('ODE+res') nest the ODE constants: look there.
        if "base" in dyn_params and isinstance(dyn_params["base"], dict):
            dyn_params = dyn_params["base"]
        from control_toolkit_tpu.utils.logging_util import get_logger

        logger = get_logger(type(self).__module__)
        explicit = getattr(self, "_explicit_keys", set())
        for k in self.mirrored_dynamics_keys:
            if k not in dyn_params:
                continue
            dyn_v = float(dyn_params[k])
            if k in explicit:
                if abs(float(self.config[k]) - dyn_v) > 1e-9:
                    logger.warning(
                        f"{type(self).__name__}: cost {k}={self.config[k]} "
                        f"differs from the dynamics {k}={dyn_v} — the cost "
                        "will score a different mechanism than the rollouts "
                        "simulate"
                    )
            else:
                self.config[k] = dyn_v

    # ---- pure cost API ----------------------------------------------------
    # Subclasses implement the struct-of-arrays primitives (xs/us are tuples
    # of same-shaped component arrays), which unlock both the fused scan
    # rollout and the Pallas rollout kernel; or they override _get_stage_cost
    # directly for full control (losing fusion).

    def _stage_cost_core_soa(self, xs, us, params) -> jnp.ndarray:
        """Component-form stage cost sans control-change term."""
        raise NotImplementedError

    def control_change_cost_soa(self, us, prev_us, params) -> jnp.ndarray:
        """Component-form penalty on u_h - u_{h-1}.

        Default: ``ccrc_weight * sum((u - prev)^2)`` when the cost config
        declares a ``ccrc_weight`` (the convention every built-in cost
        shares), else zero."""
        w = params["cost"].get("ccrc_weight")
        if w is None:
            return jnp.zeros_like(us[0])
        return w * sum((u - pu) ** 2 for u, pu in zip(us, prev_us))

    def terminal_cost_soa(self, xs, params) -> jnp.ndarray:
        """Component-form terminal cost. Default 0 (reference :38-47)."""
        return jnp.zeros_like(xs[0])

    # Extra terminal cost evaluated OUTSIDE the Pallas kernels on the
    # kernel-emitted terminal states: ``post_terminal_cost(x_term [K,S],
    # params) -> [K]`` (un-normalized — the caller divides by H+1).  None
    # for plain costs; ValueTerminalCost overrides it with the value net
    # so learned-terminal MPC rides the kernel fast paths (the kernels'
    # in-body cost takes scalar operands only).
    post_terminal_cost = None

    def kernel_terminal_soa(self, xs, params) -> jnp.ndarray:
        """Terminal cost evaluated INSIDE the Pallas kernels (the
        scalar-operand part).  Costs with a non-scalar terminal component
        override this to the scalar part and expose the remainder via
        ``post_terminal_cost``; for everything else it IS the terminal."""
        return self.terminal_cost_soa(xs, params)

    # ---- array-of-structs forms (derived) ---------------------------------
    def _stage_cost_core(self, states, inputs, params) -> jnp.ndarray:
        """[..., S], [..., U] -> [...]: stage cost sans control-change term."""
        xs = tuple(states[..., i] for i in range(states.shape[-1]))
        us = tuple(inputs[..., j] for j in range(inputs.shape[-1]))
        return self._stage_cost_core_soa(xs, us, params)

    def control_change_cost(self, inputs, prev_inputs, params) -> jnp.ndarray:
        """[..., U], [..., U] -> [...]: penalty on u_h - u_{h-1}."""
        us = tuple(inputs[..., j] for j in range(inputs.shape[-1]))
        pus = tuple(prev_inputs[..., j] for j in range(prev_inputs.shape[-1]))
        return self.control_change_cost_soa(us, pus, params)

    @property
    def supports_fused_rollout(self) -> bool:
        cls = type(self)
        return cls._get_stage_cost is CostFunction._get_stage_cost

    def _get_stage_cost(self, states, inputs, previous_input, params) -> jnp.ndarray:
        """[B,H,S],[B,H,U],prev_u,params -> [B,H].

        Default: assembled from the per-step primitives; the control-change
        term compares each input with its predecessor along the horizon,
        seeded with the actually-applied previous control.
        """
        cost = self._stage_cost_core(states, inputs, params)
        if previous_input is not None:
            U = inputs.shape[-1]
            prev = jnp.asarray(previous_input, dtype=inputs.dtype)
            if prev.ndim == 3 and prev.shape[1] == 1:
                prev = prev[:, 0, :]  # [B, 1, U] -> [B, U]
            if prev.ndim == 2:
                # per-rollout previous control [B, U]
                prev = jnp.broadcast_to(prev[:, None, :], inputs[:, :1, :].shape)
            else:
                if prev.size != U:
                    raise ValueError(
                        f"previous_input must be [U], [B,U] or [B,1,U]; got "
                        f"shape {prev.shape} for U={U}"
                    )
                prev = jnp.broadcast_to(
                    jnp.reshape(prev, (-1,)), inputs[:, :1, :].shape
                )
            shifted = jnp.concatenate([prev, inputs[:, :-1, :]], axis=1)
            cost = cost + self.control_change_cost(inputs, shifted, params)
        return cost

    def stage_cost_step(self, x, u, u_prev, params) -> jnp.ndarray:
        """Single-horizon-step stage cost for the fused rollout:
        [B,S],[B,U],[B,U] -> [B] (includes the MAX_COST shift)."""
        cost = self._stage_cost_core(x, u, params)
        if u_prev is not None:
            cost = cost + self.control_change_cost(u, u_prev, params)
        return cost - self.MAX_COST

    def get_terminal_cost(self, terminal_states, params) -> jnp.ndarray:
        """[B,S] -> [B]. Derived from terminal_cost_soa (default zero)."""
        xs = tuple(terminal_states[..., i] for i in range(terminal_states.shape[-1]))
        return self.terminal_cost_soa(xs, params)

    def get_stage_cost(self, states, inputs, previous_input, params) -> jnp.ndarray:
        return self._get_stage_cost(states, inputs, previous_input, params) - self.MAX_COST

    def get_trajectory_cost(self, state_horizon, inputs, previous_input=None, params=None) -> jnp.ndarray:
        """[B,H+1,S],[B,H,U] -> [B]: mean over (H stage costs + terminal)."""
        params = params if params is not None else self.current_params()
        stage = self.get_stage_cost(state_horizon[:, :-1, :], inputs, previous_input, params)
        terminal = self.get_terminal_cost(state_horizon[:, -1, :], params)
        total = jnp.concatenate([stage, terminal[:, None]], axis=1)
        return jnp.mean(total, axis=1)

    def get_summed_stage_cost(self, state_horizon, inputs, previous_input=None, params=None) -> jnp.ndarray:
        params = params if params is not None else self.current_params()
        return jnp.sum(
            self.get_stage_cost(state_horizon[:, :-1, :], inputs, previous_input, params),
            axis=1,
        )

    # ---- parameter plumbing ----------------------------------------------
    def current_params(self, attrs: Optional[Dict] = None) -> Dict:
        """Assemble the jit-argument params pytree from current config."""
        cost = {
            k: jnp.asarray(self.config[k], dtype=jnp.float32)
            for k in self.dynamic_config_keys
            if k in self.config
        }
        return {"cost": cost, "attrs": dict(attrs or {})}

    def reload_cost_parameters_from_config(self) -> None:
        """Hook invoked after the config dict was hot-reloaded."""

    def set_logged_attributes(self, logged: Dict) -> None:
        self.logged_attributes = logged
