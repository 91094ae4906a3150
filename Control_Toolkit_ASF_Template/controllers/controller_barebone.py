"""Barebone custom controller (parity with the reference
Control_Toolkit_ASF_Template/Controllers/controller_barebone.py:20-45).

Shows the minimal contract: subclass Controller, register with ``asf=True``,
implement ``configure`` and ``step(s, time, updated_attributes) -> u``.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from control_toolkit_tpu.controllers.base import Controller
from control_toolkit_tpu.utils import registry


@registry.controllers.register("barebone", asf=True)
class BareboneController(Controller):
    def configure(self, **kwargs) -> None:
        # One-time setup: read hyperparameters from self.config_controller,
        # build jitted functions, load models, ...
        self.gain = float(self.config_controller.get("gain", 1.0))

    def step(self, s: np.ndarray, time=None, updated_attributes: Optional[Dict] = None):
        # Update mutable environment attributes (targets etc.) first:
        self.update_attributes(updated_attributes)
        # Any computation producing a control within the action bounds:
        u = np.clip(
            -self.gain * np.atleast_1d(np.asarray(s, np.float32))[:1],
            self.action_low, self.action_high,
        )
        # Populate the logging contract if controller_logging is on:
        self.update_logs({"u_logged": u, "s_logged": np.asarray(s)})
        return u

    def controller_reset(self) -> None:
        pass
