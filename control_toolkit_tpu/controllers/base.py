"""Controller base class.

Capability parity with the reference template_controller
(/root/reference/Controllers/__init__.py:27-178): per-controller YAML config
loading, control limits, environment attributes as mutable named tensors, the
7-key logging contract (Q_logged, J_logged, s_logged, u_logged,
realized_cost_logged, trajectory_ages_logged, rollout_trajectories_logged)
with ``get_outputs()`` stacking each log along axis 0, ``update_attributes``,
``controller_report``/``controller_reset`` and the name property.

Redesign notes: the ComputationLibrary resolution block (reference :46-64)
disappears — JAX is the only backend; the ``computation_library`` YAML key is
accepted and ignored for config compatibility.  VariableParameters becomes a
plain dict of device arrays handed to jitted steps as arguments.
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.utils.config import load_controller_config
from control_toolkit_tpu.utils.logging_util import get_logger

logger = get_logger(__name__)

SAVE_VARS = [
    "Q_logged",
    "J_logged",
    "s_logged",
    "u_logged",
    "realized_cost_logged",
    "trajectory_ages_logged",
    "rollout_trajectories_logged",
]


def resolve_named_inputs(input_names, state_index, s, updated_attributes,
                         variable_parameters, time=None,
                         allow_time: bool = True) -> np.ndarray:
    """Shared name→value resolution for the hardware-edge controllers
    (embedded SoC, runtime-gcc C, neural imitator).  Precedence:
    ``time`` (when the controller supports it) > updated_attributes >
    state component > variable_parameters > 0.0.  ONE implementation so
    the precedence cannot drift between the three controllers (it
    already had: the imitator copy lacked 'time' — that difference is
    now the explicit ``allow_time`` flag)."""
    arr = np.zeros(len(input_names), np.float32)
    for i, name in enumerate(input_names):
        if allow_time and name == "time":
            if time is None:
                raise ValueError(
                    "controller input 'time' required but not provided"
                )
            arr[i] = float(time)
        elif name in updated_attributes:
            arr[i] = float(np.asarray(updated_attributes[name]).reshape(-1)[0])
        elif name in state_index:
            arr[i] = float(np.asarray(s).reshape(-1)[state_index[name]])
        elif name in variable_parameters:
            arr[i] = float(
                np.asarray(variable_parameters[name]).reshape(-1)[0]
            )
        else:
            arr[i] = 0.0
    return arr


class Controller(ABC):
    _has_optimizer = False
    registered_name: str = "template"

    def __init__(
        self,
        environment_name: str,
        control_limits: Tuple[np.ndarray, np.ndarray],
        initial_environment_attributes: Optional[Dict] = None,
        config: Optional[Dict] = None,
    ):
        if config is not None:
            self.config_controller = dict(config)
        else:
            self.config_controller = load_controller_config(self.controller_name)

        self.environment_name = environment_name
        self.control_limits = control_limits
        self.action_low, self.action_high = control_limits

        # Optional device pinning (reference lib.set_device driven by the
        # 'device' config key, Controllers/__init__.py:72-78).  None =
        # process default.  See utils/device.py for the measured CPU/TPU
        # selection rule.
        from control_toolkit_tpu.utils.device import resolve_device
        self.device = resolve_device(self.config_controller.get("device"))

        # Mutable named environment attributes (targets etc.) — the
        # VariableParameters analogue; values live on device, keys are stable
        # so jitted steps never retrace on updates.
        self.variable_parameters: Dict[str, jnp.ndarray] = {}
        self.update_attributes(initial_environment_attributes or {})

        self.u: np.ndarray | float = 0.0

        self.controller_logging = bool(self.config_controller.get("controller_logging", False))
        # Lazy logging keeps per-step diagnostics as DEVICE arrays and
        # defers every device->host transfer to get_outputs(), so logging
        # stops costing a [K,H+1,S] sync in the control hot loop (the
        # reference pays that copy eagerly, optimizer_mppi.py:214-218).
        # Trade-off: the buffers live in device memory until fetched — at
        # big K call flush_logs() periodically (or get_outputs() at episode
        # end) to move them to host before HBM fills.
        self.logging_lazy = bool(self.config_controller.get("logging_lazy", False))
        self.save_vars = list(SAVE_VARS)
        self.logs: Dict[str, List[np.ndarray]] = {v: [] for v in self.save_vars}
        self.controller_data_for_csv: Dict = {}

    def configure(self, **kwargs) -> None:
        """Additional initialization; override in subclasses."""

    def update_attributes(self, updated_attributes: Optional[Dict]) -> None:
        if not updated_attributes:
            return
        from control_toolkit_tpu.utils.device import device_scope
        with device_scope(self.device):
            for k, v in updated_attributes.items():
                v = jnp.asarray(v, dtype=jnp.float32)
                if self.device is not None:
                    # asarray is a no-op on existing jax arrays; a pin must
                    # move them explicitly.
                    import jax
                    v = jax.device_put(v, self.device)
                self.variable_parameters[k] = v

    @abstractmethod
    def step(self, s: np.ndarray, time=None, updated_attributes: Optional[Dict] = None):
        ...

    def controller_report(self) -> None:
        logger.info("No controller report implemented for this controller.")

    def controller_reset(self) -> None:
        raise NotImplementedError

    @property
    def controller_name(self) -> str:
        return self.registered_name

    @property
    def has_optimizer(self) -> bool:
        return self._has_optimizer

    def get_outputs(self) -> Dict[str, Optional[np.ndarray]]:
        """Stack per-step logs along axis 0 (reference :159-168).

        Under lazy logging this is where the deferred device->host
        transfers happen (one batched fetch per variable).
        """
        self.flush_logs()
        return {
            name: np.stack(v, axis=0) if len(v) > 0 else None
            for name, v in self.logs.items()
        }

    def flush_logs(self) -> None:
        """Move any device-resident log entries to host (one batched
        jax.device_get per variable).  Call periodically during long
        lazy-logging runs to bound device-memory growth."""
        import jax

        for name, v in self.logs.items():
            if any(not isinstance(x, np.ndarray) for x in v):
                self.logs[name] = [
                    np.asarray(x) for x in jax.device_get(v)
                ]

    def update_logs(self, logging_values: Dict) -> None:
        if not self.controller_logging:
            return
        for name in self.save_vars:
            var = logging_values.get(name)
            if var is not None:
                if self.logging_lazy and not isinstance(var, np.ndarray):
                    # jax arrays are immutable — safe to hold without copy.
                    self.logs[name].append(var)
                else:
                    self.logs[name].append(np.asarray(var).copy())
