"""MPC controller: optimizer + predictor + cost function composition.

Capability parity with the reference controller_mpc
(/root/reference/Controllers/controller_mpc.py:21-109), including the
two-phase init that resolves the chicken-and-egg dependency (optimizer knows
K/H -> predictor configure needs K/dt -> predictor knows state dims ->
optimizer configure needs dims; reference :45-53) and the step sequence
(hot-reload check -> update_attributes -> optimizer.step -> update_logs).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from control_toolkit_tpu.controllers.base import Controller
from control_toolkit_tpu.costs.wrapper import CostFunctionWrapper
from control_toolkit_tpu.models.predictors import PredictorWrapper
from control_toolkit_tpu.utils import registry
from control_toolkit_tpu.utils.config import load_optimizer_config
from control_toolkit_tpu.utils.logging_util import get_logger

logger = get_logger(__name__)


@registry.controllers.register("mpc")
class MPCController(Controller):
    _has_optimizer = True

    def configure(
        self,
        optimizer_name: Optional[str] = None,
        predictor_specification: Optional[str] = None,
        optimizer_config: Optional[Dict] = None,
        mesh=None,
        predictor_config: Optional[Dict] = None,
    ) -> None:
        """``predictor_config`` forwards extra kwargs to the resolved
        predictor's constructor (e.g. pre-fitted ``params`` for a neural /
        ensemble predictor, ``predict_delta``, ``ts``) — the reference's
        PredictorWrapper.configure likewise passes model kwargs through
        (controller_mpc.py:67-73)."""
        if not optimizer_name:
            optimizer_name = str(self.config_controller["optimizer"])
            logger.info(f"Using optimizer {optimizer_name!r} from controller config")
        if not predictor_specification:
            predictor_specification = self.config_controller.get("predictor_specification", "ODE")

        if optimizer_config is None:
            optimizer_config = load_optimizer_config(optimizer_name)
        config_optimizer = dict(optimizer_config)

        cost_function_specification = self.config_controller.get("cost_function_specification", None)
        self.cost_function = CostFunctionWrapper()
        self.predictor = PredictorWrapper()

        OptimizerCls = registry.import_optimizer_by_name(optimizer_name)
        self.optimizer = OptimizerCls(
            predictor=self.predictor,
            cost_function=self.cost_function,
            control_limits=self.control_limits,
            optimizer_logging=self.controller_logging,
            logging_lazy=self.logging_lazy,
            calculate_optimal_trajectory=self.config_controller.get(
                "calculate_optimal_trajectory", False
            ),
            **config_optimizer,
        )
        # Device pin must be installed before optimizer.configure() below:
        # it decides kernel eligibility and where the initial state lands.
        self.optimizer._device = self.device

        dt = config_optimizer.get("mpc_timestep", 0.02)
        self.predictor.configure(
            batch_size=self.optimizer.num_rollouts,
            horizon=self.optimizer.mpc_horizon,
            dt=dt,
            predictor_specification=predictor_specification,
            environment_name=self.environment_name,
            variable_parameters=self.variable_parameters,
            **(predictor_config or {}),
        )

        self.cost_function.configure(
            batch_size=self.optimizer.num_rollouts,
            horizon=self.optimizer.mpc_horizon,
            environment_name=self.environment_name,
            cost_function_specification=cost_function_specification,
            variable_parameters=self.variable_parameters,
        )

        # A persistent cost transform (e.g. attach_value_terminal on a
        # batched controller) re-applies across re-configures — configure
        # recreates the CostFunctionWrapper, so a plain post-configure wrap
        # would be silently dropped by the next configure() call.
        if getattr(self, "_cost_wrap_hook", None) is not None:
            self.cost_function.cost_function = self._cost_wrap_hook(
                self.cost_function.cost_function
            )

        # Costs that mirror dynamics geometry (e.g. arm2 FK link lengths)
        # reconcile with the predictor's parameters before the step compiles.
        self.cost_function.cost_function.sync_with_dynamics(
            self.predictor.default_params()
        )

        self.optimizer.configure(
            dt=dt,
            predictor_specification=predictor_specification,
            num_states=self.predictor.num_states,
            num_control_inputs=self.predictor.num_control_inputs,
        )

        if mesh is not None:
            self.optimizer.plan_sharding(mesh)

        self._dyn_params = None
        self._dyn_net_raw = None
        self._cost_params = None
        if hasattr(self, "_realized_cost_jit"):
            # The cached realized-cost program closes over the PREVIOUS
            # cost function; a re-configure (possibly with a different
            # cost spec) must retrace it like attach_value_terminal does.
            del self._realized_cost_jit
        self.controller_data_for_csv = self.cost_function.cost_function.logged_attributes

        from control_toolkit_tpu.utils.profiling import LatencyTracker
        self.latency = LatencyTracker() if self.config_controller.get(
            "profile_latency", False
        ) else None

    def _assemble_params(self) -> Dict:
        """Build the jit-argument params pytree.

        Hot-path note: leaves are cached as device arrays so a control step
        transfers nothing but the state vector; cost params are rebuilt only
        when the YAML hot-reload flag fires, attrs only when updated.
        """
        import jax
        import jax.numpy as jnp

        from control_toolkit_tpu.utils.device import device_scope

        with device_scope(self.device):
            # Every step re-reads the predictor's CURRENT params and
            # identity-compares the non-hidden leaves against what was
            # placed last tick (a few 'is' checks — microseconds).  Same
            # objects -> reuse the placed cache (re-placing only the RNN
            # hidden for stateful predictors, ADVICE r2); any swapped leaf
            # (checkpoint load, online-sysid install, hand hot-swap like
            # ``pred.net_params = new``) -> full re-place, so weight swaps
            # reach the jitted step WITHOUT poking ``_dyn_params = None``.
            # jnp.asarray is a no-op on EXISTING jax arrays (residual/NN
            # weights, RNN hidden live on the default device), so a pin
            # must device_put explicitly or the step would silently
            # bounce those leaves through the interconnect every call.
            conv = (
                (lambda v: jax.device_put(
                    jnp.asarray(v, dtype=jnp.float32), self.device))
                if self.device is not None
                else (lambda v: jnp.asarray(v, dtype=jnp.float32))
            )
            fresh = self.predictor.default_params()
            static = (
                {k: v for k, v in fresh.items() if k != "hidden"}
                if isinstance(fresh, dict) else fresh
            )
            static_leaves = jax.tree_util.tree_leaves(static)
            cache_ok = (
                self._dyn_params is not None
                and self._dyn_net_raw is not None
                and len(self._dyn_net_raw) == len(static_leaves)
                and all(
                    a is b for a, b in zip(self._dyn_net_raw, static_leaves)
                )
            )
            if cache_ok:
                if isinstance(fresh, dict) and "hidden" in fresh:
                    # Stateful re-assembly: only the hidden-state leaves
                    # changed since last step — re-place just those instead
                    # of tree_map+device_put over the whole weight tree
                    # every control tick.
                    placed = dict(self._dyn_params)
                    placed["hidden"] = jax.tree_util.tree_map(
                        conv, fresh["hidden"]
                    )
                    self._dyn_params = placed
            else:
                self._dyn_params = jax.tree_util.tree_map(conv, fresh)
                self._dyn_net_raw = static_leaves
            if self._cost_params is None:
                self._cost_params = self.cost_function.current_params()["cost"]
                if self.device is not None:
                    self._cost_params = jax.tree_util.tree_map(
                        lambda v: jax.device_put(jnp.asarray(v), self.device),
                        self._cost_params,
                    )
        return {
            "dyn": self._dyn_params,
            "cost": self._cost_params,
            "attrs": self.variable_parameters,
        }

    def step(self, s: np.ndarray, time=None, updated_attributes: Optional[Dict] = None):
        if self.cost_function.update_cost_parameters_from_config():
            self._cost_params = None  # re-device the reloaded weights
        self.update_attributes(updated_attributes)
        if self.latency is not None:
            with self.latency.measure():
                u = self.optimizer.step(s, time, params=self._assemble_params())
        else:
            u = self.optimizer.step(s, time, params=self._assemble_params())
        if self.controller_logging:
            # Stage cost actually incurred by the applied control — fills the
            # realized_cost_logged slot of the 7-key contract (the reference
            # declares it but never produces it).
            self.optimizer.logging_values["realized_cost_logged"] = (
                self._realized_cost(s, u)
            )
        self.update_logs(self.optimizer.logging_values)
        self.u = u
        return u

    def _realized_cost(self, s, u) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        if not hasattr(self, "_realized_cost_jit"):
            cf = self.cost_function.cost_function

            @jax.jit
            def rc(s_, u_, u_prev, params):
                cp = {"cost": params["cost"], "attrs": params["attrs"]}
                return cf.stage_cost_step(s_[None], u_[None], u_prev[None], cp)[0]

            self._realized_cost_jit = rc
        from control_toolkit_tpu.utils.device import device_scope

        with device_scope(self.device):
            u_prev = jnp.asarray(
                np.reshape(np.asarray(self.u if np.ndim(self.u) else [self.u]), (-1,)),
                jnp.float32,
            )
            out = self._realized_cost_jit(
                jnp.asarray(s, jnp.float32), jnp.asarray(u, jnp.float32),
                u_prev, self._assemble_params(),
            )
        return np.asarray(out)

    def controller_report(self) -> None:
        if self.latency is not None and len(self.latency):
            logger.info(self.latency.report())
        else:
            super().controller_report()

    def controller_reset(self) -> None:
        self.optimizer.optimizer_reset()
        # Fresh-start previous control: the first realized-cost log of the
        # new episode must not use the last episode's final u as u_prev
        # (the reference's optimizer_reset zeroes u likewise).
        if getattr(self, "u", None) is not None:
            self.u = np.zeros_like(np.asarray(self.u))
        # Stateful (RNN) predictors carry a persistent hidden state that a
        # controller reset must also clear.
        reset = getattr(
            getattr(self.predictor, "predictor", self.predictor),
            "reset_state", None,
        )
        if reset is not None:
            reset()
