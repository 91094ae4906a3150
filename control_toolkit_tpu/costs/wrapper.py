"""Deferred-binding cost function wrapper.

Capability parity with the reference CostFunctionWrapper
(/root/reference/Cost_Functions/cost_function_wrapper.py:16-115): resolve a
cost function by ``(environment_name, cost_function_specification)`` with the
default name coming from config_cost_function.yml, bind a hot-reload updater,
and proxy the four cost methods.  Resolution goes through the registry
(``"<env>/<name>"`` keys) instead of dynamic module import.
"""
from __future__ import annotations

from typing import Dict, Optional

from control_toolkit_tpu.costs.base import CostFunction
from control_toolkit_tpu.costs.updater import CostFunctionUpdater
from control_toolkit_tpu.utils import registry
from control_toolkit_tpu.utils.config import (
    CONFIG_COST_FUNCTION,
    load_cost_config,
    resolve_config_path,
)
from control_toolkit_tpu.utils.logging_util import get_logger

logger = get_logger(__name__)


class CostFunctionWrapper:
    def __init__(self):
        self.cost_function: Optional[CostFunction] = None
        self.cost_function_name: Optional[str] = None
        self.environment_name: Optional[str] = None
        self._updater: Optional[CostFunctionUpdater] = None

    def configure(
        self,
        batch_size: int,
        horizon: int,
        environment_name: str = "cartpole",
        cost_function_specification: Optional[str] = None,
        variable_parameters=None,
        watch_config: bool = True,
        **kwargs,
    ) -> None:
        cost_config = {}
        try:
            full_cfg = load_cost_config()
        except FileNotFoundError:
            full_cfg = {}
        # Spec precedence: explicit arg > name this wrapper is already
        # bound to (a copy() carries it — the copy must configure to the
        # SAME cost, not the config default) > config default.
        name = (cost_function_specification or self.cost_function_name
                or full_cfg.get("cost_function_name_default", "default"))

        env_cfg = full_cfg.get(environment_name, {}) or {}
        cost_config = dict(env_cfg.get(name, {}) or {})

        registry._load_builtins()
        key = f"{environment_name}/{name}"
        if key in registry.cost_functions:
            cls = registry.cost_functions.get(key)
        elif name in registry.cost_functions:
            cls = registry.cost_functions.get(name)
        else:
            raise KeyError(
                f"No cost function {name!r} for environment {environment_name!r} "
                f"(tried {key!r}); available: {list(registry.cost_functions.names())}"
            )

        self.cost_function = cls(cost_config)
        self.cost_function.reload_cost_parameters_from_config_flag = False
        self.cost_function.configure(batch_size=batch_size, horizon=horizon)
        self.cost_function_name = name
        self.environment_name = environment_name

        if watch_config:
            try:
                path = resolve_config_path(CONFIG_COST_FUNCTION)
                self._updater = CostFunctionUpdater.ensure_watching(
                    self.cost_function, environment_name, name, path
                )
            except FileNotFoundError:
                logger.debug("no cost config file found; hot-reload disabled")

    def update_cost_parameters_from_config(self) -> bool:
        """Consume the hot-reload flag; returns True if params changed."""
        cf = self.cost_function
        if cf is not None and getattr(cf, "reload_cost_parameters_from_config_flag", False):
            cf.reload_cost_parameters_from_config_flag = False
            cf.reload_cost_parameters_from_config()
            return True
        return False

    # ---- proxied cost API (reference :76-106) ------------------------------
    def get_stage_cost(self, states, inputs, previous_input, params=None):
        return self.cost_function.get_stage_cost(
            states, inputs, previous_input,
            params if params is not None else self.cost_function.current_params(),
        )

    def get_terminal_cost(self, terminal_states, params=None):
        return self.cost_function.get_terminal_cost(
            terminal_states,
            params if params is not None else self.cost_function.current_params(),
        )

    def get_trajectory_cost(self, state_horizon, inputs, previous_input=None, params=None):
        return self.cost_function.get_trajectory_cost(state_horizon, inputs, previous_input, params)

    def get_summed_stage_cost(self, state_horizon, inputs, previous_input=None, params=None):
        return self.cost_function.get_summed_stage_cost(state_horizon, inputs, previous_input, params)

    def current_params(self, attrs: Optional[Dict] = None) -> Dict:
        return self.cost_function.current_params(attrs)

    def copy(self) -> "CostFunctionWrapper":
        """Fresh UNCONFIGURED wrapper bound to the same cost name
        (reference :108-115): call ``configure(batch_size, horizon,
        environment_name=...)`` on the copy before use — it resolves to
        the stored name, not the config default.  When this wrapper is
        already configured, the copy's cost is instantiated immediately
        so its proxied methods work without an explicit configure."""
        new = CostFunctionWrapper()
        new.cost_function_name = self.cost_function_name
        new.environment_name = self.environment_name
        if self.cost_function is not None:
            new.configure(
                batch_size=self.cost_function.batch_size,
                horizon=self.cost_function.horizon,
                environment_name=self.environment_name,
                cost_function_specification=self.cost_function_name,
                watch_config=False,
            )
        return new
