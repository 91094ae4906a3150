"""Neural-imitator controller: a trained network policy as a controller.

Capability parity with the reference controller_neural_imitator
(/root/reference/Controllers/controller_neural_imitator.py:15-159):

* input vector assembled by mapping the network's declared input names to
  state indices or variable parameters, with precedence
  updated_attributes > state > variable_parameters > 0.0 (:49-62,79-106),
* optional output clipping to [-1, 1] (:74-75),
* hls4ml/FPGA emulation mode (:44-45,109-113) — emulated here by a full
  fixed-point datapath (quantized weights, inputs, activations and
  accumulators; models/networks.py *_apply_fixed),
* recurrent (GRU) hidden-state logging for CSV export (:37-38,116-159).

The evaluator is a pure-JAX network (models/networks.py) jitted once; the
hidden state for recurrent nets threads explicitly through the controller.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.controllers.base import Controller
from control_toolkit_tpu.models.dynamics import state_indices
from control_toolkit_tpu.models import networks as nets
from control_toolkit_tpu.utils import registry
from control_toolkit_tpu.utils.logging_util import get_logger
from control_toolkit_tpu.utils.rng import make_key

logger = get_logger(__name__)


@registry.controllers.register("neural-imitator")
class NeuralImitatorController(Controller):
    def configure(self, **kwargs) -> None:
        cfg = self.config_controller
        self.net_name = str(cfg.get("net_name", "mlp-32-32"))
        self.path_to_models = Path(cfg.get("path_to_models", "./models"))
        self.input_at_input = bool(cfg.get("input_at_input", False))
        self.hls4ml = bool(cfg.get("hls4ml", False))
        self.clip_output = bool(cfg.get("clip_output", True))

        ckpt = self.path_to_models / f"{self.net_name}.npz"
        sidx = state_indices(self.environment_name)

        if ckpt.is_file():
            self.params, meta = nets.load_net(ckpt)
            self.input_names = meta.get("inputs", list(sidx))
            self.output_names = meta.get("outputs", ["Q"])
            arch = meta.get("arch") or nets.parse_net_name(self.net_name)
            logger.info(f"loaded network {self.net_name} from {ckpt}")
        else:
            # No checkpoint: random-initialized net with env-default wiring.
            arch = nets.parse_net_name(self.net_name)
            self.input_names = list(sidx)
            self.output_names = ["Q"]
            key = make_key(cfg.get("seed", 0), "neural_imitator")
            if arch["kind"] == "mlp":
                sizes = [len(self.input_names)] + list(arch["hiddens"]) + [len(self.output_names)]
                self.params = nets.mlp_init(key, sizes)
            else:
                rnn_init = nets.RECURRENT_FNS[arch["kind"]][0]
                self.params = rnn_init(
                    key, len(self.input_names), arch["hiddens"], len(self.output_names)
                )
            logger.warning(
                f"no checkpoint at {ckpt}; using randomly initialized {arch['kind']}"
            )
        self.arch = arch

        if self.hls4ml:
            self.params = nets.quantize_params(self.params)
            logger.info(
                "hls4ml mode: fixed-point datapath (ap_fixed<16,6> weights/"
                "activations, ap_fixed<32,12> accumulators)"
            )

        self._state_index = sidx
        self.recurrent = arch["kind"] in nets.RECURRENT_FNS
        if self.recurrent:
            _, rnn_apply, rnn_state0 = nets.RECURRENT_FNS[arch["kind"]]
            self._rnn_state0 = rnn_state0
            self._hidden = rnn_state0(arch["hiddens"], 1)
            # hls4ml-converted models run the ENTIRE datapath in fixed point
            # (reference controller_neural_imitator.py:109-113 evaluates an
            # hls4ml model): emulate with quantized input/activation/
            # accumulator forward passes, not just quantized weights.
            if self.hls4ml:
                rnn_apply = (
                    nets.gru_apply_fixed if arch["kind"] == "gru"
                    else nets.lstm_apply_fixed
                )
            self._apply = jax.jit(lambda p, x, h: rnn_apply(p, x, h))
        else:
            mlp_fwd = nets.mlp_apply_fixed if self.hls4ml else nets.mlp_apply
            self._apply = jax.jit(lambda p, x: mlp_fwd(p, x))

        # CSV logging of hidden states (reference :116-159).
        self.controller_data_for_csv = {}

    def _assemble_input(self, s: np.ndarray, updated_attributes: Dict) -> np.ndarray:
        """Precedence: updated_attributes > state > variable_parameters > 0
        (no 'time' input — reference imitator nets take state/attr features
        only)."""
        from control_toolkit_tpu.controllers.base import resolve_named_inputs

        return resolve_named_inputs(
            self.input_names, self._state_index, s, updated_attributes,
            self.variable_parameters, allow_time=False,
        )

    def step(self, s: np.ndarray, time=None, updated_attributes: Optional[Dict] = None):
        updated_attributes = updated_attributes or {}
        if self.input_at_input:
            # Caller passes the PRE-COMPOSED network input vector as ``s``
            # (reference controller_neural_imitator.py:66-67).
            x = jnp.asarray(np.asarray(s, np.float32).reshape(-1))[None]
            out = (
                self._apply(self.params, x, self._hidden) if self.recurrent
                else (self._apply(self.params, x), None)
            )
            if self.recurrent:
                out, self._hidden = out
            else:
                out = out[0]
            u = np.asarray(out[0], np.float32)
            if self.clip_output:
                u = np.clip(u, -1.0, 1.0)
            self.u = u
            return u
        self.update_attributes(updated_attributes)
        x = jnp.asarray(self._assemble_input(np.asarray(s, np.float32), updated_attributes))[None]

        if self.recurrent:
            out, self._hidden = self._apply(self.params, x, self._hidden)
            for li, h in enumerate(self._hidden):
                h_np = np.asarray(h[0])
                for ui, val in enumerate(h_np):
                    self.controller_data_for_csv[f"{self.arch['kind']}_{li}_state_{ui}"] = float(val)
        else:
            out = self._apply(self.params, x)

        u = np.asarray(out[0], np.float32)
        if self.clip_output:
            u = np.clip(u, -1.0, 1.0)
        self.u = u
        if self.controller_logging:
            self.update_logs({"u_logged": u, "s_logged": np.asarray(s)})
        return u

    def controller_reset(self) -> None:
        if self.recurrent:
            self._hidden = self._rnn_state0(self.arch["hiddens"], 1)
