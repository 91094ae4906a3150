"""Learned terminal value function as a cost-function wrapper.

Beyond-the-reference capability (the reference's cost contract has a
zero-default terminal cost, /root/reference/Cost_Functions/__init__.py:38-47,
and no way to learn one): wrap ANY cost function so its terminal cost adds a
trained value net ``V(x_terminal)`` estimating the cost-to-go beyond the
horizon — the MBVE / TD-MPC recipe that lets a SHORT planning horizon act
with LONG-horizon foresight.  Shorter horizons shrink the sequential
``lax.scan`` (the one axis the TPU cannot parallelize), so amortizing
horizon into a value net is a throughput lever, not just a quality one.

Workflow (all pieces in-tree):

1. run a long-horizon expert (or any data-collection policy) and record
   per-tick realized stage costs (``MPCController`` fills
   ``realized_cost_logged``);
2. ``models.training.discounted_cost_to_go`` turns episode stage costs into
   value targets; ``models.training.fit_value_mlp`` fits ``V``;
3. ``attach_value_terminal(ctrl, value_params)`` wraps the controller's
   cost in-place (re-jits the optimizer step once);
4. re-fits hot-swap through ``update_value_params`` — the net's weights are
   jit ARGUMENTS (they ride ``params["cost"]``), so no recompile.

Kernel fast path: the Pallas cost kernels evaluate the scalar-operand part
of the cost in-body and EMIT the terminal states ``x_H`` ([K, S]); the
optimizer then adds ``scale * V(x_H) / (H+1)`` outside the kernel as one
MXU matmul chain (``post_terminal_cost`` hook, costs/base.py).  So MPPI/CEM
/iCEM/CMA-ES with a learned terminal keep the kernel path whenever the BASE
cost is kernel-eligible (``pallas_eligible`` delegates).  The GRADIENT
kernels keep their fast path too: a plain-MLP V rides IN-KERNEL as
flatten_mlp_weights VMEM operands (value-scale folded into the last layer
per call, so re-fits/scale changes never recompile) and the terminal
``jax.vjp`` seeds the backward sweep with ``dV/dx_H`` — RPGD/gradient-tf
get exact ``dV/dQ`` at kernel speed (``value_spec``, ops/pallas_grad.py;
eligibility: ``_value_grad_spec``, optimizers/base.py).

Trajectory-cost semantics are unchanged (mean over H stage costs +
terminal, costs/base.py): with ``value_scale=1`` the optimizer ranks plans
by ``sum(stage) + V(x_H)`` — the Bellman-consistent objective.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from control_toolkit_tpu.costs.base import CostFunction
from control_toolkit_tpu.models import networks as nets


class ValueTerminalCost(CostFunction):
    """Wrap ``base`` so ``terminal_cost = base_terminal + scale * V(x)``.

    ``value_params`` is an ``mlp_init``-style pytree mapping the state
    vector to a single cost-to-go scalar.  The params travel in
    ``params["cost"]["_value_net"]`` (a jit argument), so re-assigning
    ``self.value_params`` after a re-fit reaches the next step without
    recompiling.

    Delegation covers the FULL cost surface — both the SOA primitives and
    the AoS methods — so a base cost that overrides ``_get_stage_cost`` /
    ``get_terminal_cost`` directly (e.g. the pointmass obstacle costs)
    keeps its custom behavior under the wrapper (ADVICE r3).
    """

    def __init__(self, base: CostFunction, value_params: Dict,
                 value_scale: float = 1.0):
        if isinstance(base, ValueTerminalCost):
            raise ValueError(
                "refusing to nest ValueTerminalCost wrappers (V would apply "
                "twice); use attach_value_terminal, which updates an "
                "existing wrapper in place"
            )
        self.base = base
        self.value_params = value_params
        self.value_scale = float(value_scale)
        # Share the base's mutable config dict so YAML hot-reload keeps
        # working through the wrapper.
        self.config = base.config
        self.attr_defaults = dict(getattr(base, "attr_defaults", {}))
        self.dynamic_config_keys = tuple(
            getattr(base, "dynamic_config_keys", ())
        )
        self.logged_attributes = getattr(base, "logged_attributes", {})
        self.attr_keys = tuple(getattr(base, "attr_keys", ()))
        self.mirrored_dynamics_keys = tuple(
            getattr(base, "mirrored_dynamics_keys", ())
        )
        self.MAX_COST = base.MAX_COST
        self.MIN_COST = base.MIN_COST
        self.batch_size = base.batch_size
        self.horizon = base.horizon

    def __getattr__(self, name):
        # Fires only for attributes NOT found on the wrapper: duck-typed
        # extras a base cost exposes (e.g. ``cost_components`` for the
        # CostFunctionTester) delegate instead of breaking consumers that
        # feature-detect on the wrapped cost.
        base = self.__dict__.get("base")
        if base is None:
            raise AttributeError(name)
        return getattr(base, name)

    # The YAML hot-reload watcher (costs/updater.py) registered the BASE
    # cost before this wrapper existed and raises the flag there; the
    # CostFunctionWrapper reads the flag off its CURRENT (wrapped) cost —
    # delegate both directions so a reload signaled on the base is seen
    # (and consumed) through the wrapper.
    @property
    def reload_cost_parameters_from_config_flag(self) -> bool:
        return getattr(self.base, "reload_cost_parameters_from_config_flag",
                       False)

    @reload_cost_parameters_from_config_flag.setter
    def reload_cost_parameters_from_config_flag(self, v: bool) -> None:
        self.base.reload_cost_parameters_from_config_flag = v

    # ---- the value term ----------------------------------------------------
    def _value(self, x, params):
        """V on stacked states: [..., S] -> [...] (scaled)."""
        v = nets.mlp_apply(params["cost"]["_value_net"], x)[..., 0]
        return params["cost"]["_value_scale"] * v

    # ---- delegation: lifecycle ----------------------------------------------
    def configure(self, batch_size: int, horizon: int, **kwargs) -> None:
        self.base.configure(batch_size=batch_size, horizon=horizon, **kwargs)
        self.batch_size = batch_size
        self.horizon = horizon

    def sync_with_dynamics(self, dyn_params: Dict) -> None:
        self.base.sync_with_dynamics(dyn_params)

    def reload_cost_parameters_from_config(self) -> None:
        self.base.reload_cost_parameters_from_config()

    # ---- delegation: SOA primitives -----------------------------------------
    def _stage_cost_core_soa(self, xs, us, params):
        return self.base._stage_cost_core_soa(xs, us, params)

    def control_change_cost_soa(self, us, prev_us, params):
        return self.base.control_change_cost_soa(us, prev_us, params)

    def terminal_cost_soa(self, xs, params):
        x = jnp.stack(xs, axis=-1)
        return self.base.terminal_cost_soa(xs, params) + self._value(x, params)

    def kernel_terminal_soa(self, xs, params):
        # The scalar-operand part evaluated INSIDE the Pallas kernels; the
        # value net is added outside via post_terminal_cost.
        return self.base.kernel_terminal_soa(xs, params)

    def post_terminal_cost(self, x_term, params):
        """[K, S] kernel-emitted terminal states -> [K] value term."""
        base_post = getattr(self.base, "post_terminal_cost", None)
        v = self._value(x_term, params)
        return v if base_post is None else v + base_post(x_term, params)

    # ---- delegation: AoS surface (bases may override these directly) --------
    def _get_stage_cost(self, states, inputs, previous_input, params):
        return self.base._get_stage_cost(states, inputs, previous_input, params)

    def get_stage_cost(self, states, inputs, previous_input, params):
        return self.base.get_stage_cost(states, inputs, previous_input, params)

    def stage_cost_step(self, x, u, u_prev, params):
        return self.base.stage_cost_step(x, u, u_prev, params)

    def get_terminal_cost(self, terminal_states, params):
        return (
            self.base.get_terminal_cost(terminal_states, params)
            + self._value(terminal_states, params)
        )

    @property
    def supports_fused_rollout(self) -> bool:
        return self.base.supports_fused_rollout

    @property
    def pallas_eligible(self) -> bool:
        # Kernel-eligible whenever the base is: the kernels evaluate the
        # base terminal in-body and the value net rides post_terminal_cost.
        return getattr(self.base, "pallas_eligible", True)

    def current_params(self, attrs: Optional[Dict] = None) -> Dict:
        p = self.base.current_params(attrs)
        p["cost"] = dict(p["cost"])
        p["cost"]["_value_net"] = self.value_params
        p["cost"]["_value_scale"] = jnp.asarray(self.value_scale, jnp.float32)
        return p


def attach_value_terminal(ctrl, value_params: Dict,
                          value_scale: float = 1.0) -> ValueTerminalCost:
    """Wrap an ``MPCController``'s cost with a learned terminal value,
    in place.  Re-jits the optimizer step (the traced cost changed) and
    invalidates the controller's cached cost params; returns the wrapper
    for later ``update_value_params`` hot-swaps.  Calling it again on an
    already-wrapped controller UPDATES the existing wrapper (same pytree
    structure -> zero recompiles) instead of nesting a second V."""
    wrapper = ctrl.cost_function  # the CostFunctionWrapper
    inner = getattr(wrapper, "cost_function", None)
    if inner is None:
        raise ValueError(
            "attach_value_terminal expects a controller whose cost_function "
            "is a CostFunctionWrapper (MPCController); got "
            f"{type(wrapper).__name__}"
        )
    # Live value state: the persistent wrap hook and update_value_params
    # read/write THIS dict, so a later configure() (which recreates the
    # cost and re-applies the hook) re-wraps with the CURRENT net, never a
    # stale attach-time closure.
    holder = getattr(ctrl, "_value_holder", None)
    if holder is None:
        holder = {}
        ctrl._value_holder = holder
    holder["params"] = value_params
    holder["scale"] = float(value_scale)

    def hook(inner_cost):
        h = ctrl._value_holder
        if isinstance(inner_cost, ValueTerminalCost):
            inner_cost.value_params = h["params"]
            inner_cost.value_scale = h["scale"]
            return inner_cost
        return ValueTerminalCost(inner_cost, h["params"], h["scale"])

    # Install on BOTH controller kinds: configure() recreates the cost
    # wrapper, so without the hook any later configure would silently drop
    # the value terminal (MPCController applies the hook at mpc.py:96).
    ctrl._cost_wrap_hook = hook

    if isinstance(inner, ValueTerminalCost):
        inner.value_params = value_params
        inner.value_scale = float(value_scale)
        ctrl._cost_params = None
        return inner
    if hasattr(ctrl, "step_batch") and getattr(ctrl, "num_slots", 0):
        # BatchedMPCController: its batched program was traced against the
        # unwrapped cost — re-run configure from the stashed call so the
        # rebuilt program traces against V (the MPPI/mppi-var columns
        # kernels keep their kernel path via emit_terminal).  Slot states
        # reset (the objective changed); slot attrs/dyn re-init too.
        stash_args, stash_kwargs = ctrl._configure_stash
        ctrl.configure(*stash_args, **stash_kwargs)
        return ctrl.cost_function.cost_function
    vt = ValueTerminalCost(inner, value_params, value_scale)
    wrapper.cost_function = vt
    ctrl._cost_params = None
    if hasattr(ctrl, "_realized_cost_jit"):
        del ctrl._realized_cost_jit  # retrace against the wrapped cost
    ctrl.optimizer._build()
    ctrl.optimizer._log_kernel_path()  # the path may have changed; re-announce
    return vt


def update_value_params(ctrl, value_params: Dict) -> None:
    """Hot-swap a re-fit value net into a wrapped controller: the params
    pytree structure is unchanged, so the next step picks the new weights
    up as jit arguments with zero recompiles."""
    cf = getattr(ctrl.cost_function, "cost_function", None)
    if not isinstance(cf, ValueTerminalCost):
        raise ValueError("controller's cost is not a ValueTerminalCost; "
                         "call attach_value_terminal first")
    cf.value_params = value_params
    h = getattr(ctrl, "_value_holder", None)
    if h is not None:
        h["params"] = value_params  # keep the configure-time wrap hook live
    ctrl._cost_params = None  # re-assemble from the new leaves
