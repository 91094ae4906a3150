"""Learned-dynamics predictors (MLP / GRU networks).

Capability parity with SI_Toolkit's neural predictors, which the reference
selects by network name in ``predictor_specification`` (e.g.
'GRU-6IN-32H1-32H2-5OUT-0', Control_Toolkit_ASF_Template/
config_controllers.yml:8) and drives through predict_core/update (the RNN
internal-state advance used by MPPI, optimizer_mppi.py:195-197).

TPU-native design: the network weights ARE the predictor params pytree, so
they flow through the optimizer's jitted step like any other dynamics
parameter (swap checkpoints without recompiling).  MLP predictors model
``x_{t+1} = x_t + net(x_t, u_t)`` (delta form) or ``x_{t+1} = net(x_t,
u_t)``; GRU predictors carry a persistent batch-1 hidden state advanced by
``update`` with the actually-applied control, broadcast to the K rollouts at
rollout start.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from control_toolkit_tpu.models import networks as nets
from control_toolkit_tpu.models.predictors import Predictor
from control_toolkit_tpu.utils import registry
from control_toolkit_tpu.utils.logging_util import get_logger
from control_toolkit_tpu.utils.rng import make_key

logger = get_logger(__name__)


@registry.predictors.register("neural")
class NeuralPredictor(Predictor):
    def __init__(
        self,
        environment_name: str = "cartpole",
        dt: float = 0.02,
        net_name: str = "mlp-64-64",
        num_states: Optional[int] = None,
        num_control_inputs: Optional[int] = None,
        path_to_models: Optional[str] = None,
        predict_delta: bool = True,
        seed: int = 0,
        params: Optional[Dict] = None,
        compute_dtype: str = "float32",
        **kwargs,
    ):
        from control_toolkit_tpu.models.dynamics import DYNAMICS

        # Fill ONLY the Nones from the env defaults: an explicit
        # num_control_inputs must not be clobbered, and num_states alone
        # must not crash on int(None).
        if num_states is None or num_control_inputs is None:
            _, _, s_def, u_def = DYNAMICS[environment_name.lower()]
            num_states = s_def if num_states is None else num_states
            num_control_inputs = (
                u_def if num_control_inputs is None else num_control_inputs
            )
        self.num_states = int(num_states)
        self.num_control_inputs = int(num_control_inputs)
        self.dt = float(dt)
        self.net_name = net_name
        self.predict_delta = bool(predict_delta)
        self.arch = nets.parse_net_name(net_name)
        self.recurrent = self.arch["kind"] in nets.RECURRENT_FNS
        if self.recurrent:
            self._rnn_init, self._rnn_apply, self._rnn_state0 = (
                nets.RECURRENT_FNS[self.arch["kind"]]
            )
        # bf16 rollouts: halves the activation footprint (VMEM/HBM) for
        # big-K neural rollouts.  Measured roughly neutral on TPU v5e
        # latency at mlp-64..256 widths — XLA's default f32 matmul already
        # runs bf16 MXU passes — so this is a memory lever, not a speed
        # default.  The residual/delta accumulation x + net(x,u) stays f32
        # so state error doesn't compound at bf16 resolution.
        if compute_dtype in ("float32", "f32"):
            self.compute_dtype = jnp.float32
        elif compute_dtype in ("bfloat16", "bf16"):
            self.compute_dtype = jnp.bfloat16
        else:
            raise ValueError(f"unsupported compute_dtype {compute_dtype!r}")

        in_dim = self.num_states + self.num_control_inputs
        if params is not None:
            self.net_params = params
        else:
            ckpt = Path(path_to_models or ".") / f"{net_name}.npz"
            if ckpt.is_file():
                self.net_params, meta = nets.load_net(ckpt)
                self.predict_delta = bool(meta.get("predict_delta", predict_delta))
                logger.info(f"loaded dynamics net {net_name} from {ckpt}")
            else:
                key = make_key(seed, "neural_predictor")
                if self.recurrent:
                    self.net_params = self._rnn_init(
                        key, in_dim, self.arch["hiddens"], self.num_states
                    )
                else:
                    sizes = [in_dim] + list(self.arch["hiddens"]) + [self.num_states]
                    self.net_params = nets.mlp_init(key, sizes)
                logger.warning(
                    f"no checkpoint for dynamics net {net_name}; random init"
                )
        if self.recurrent:
            self.hidden = self._rnn_state0(self.arch["hiddens"], 1)

    @property
    def is_stateful(self) -> bool:
        return self.recurrent

    def default_params(self) -> Dict:
        # The RNN hidden state is part of the params pytree so jitted
        # optimizer steps see the CURRENT hidden, not a trace-time constant.
        if self.recurrent:
            return {"net": self.net_params, "hidden": self.hidden}
        return {"net": self.net_params}

    # ---- single transition (MLP only) -------------------------------------
    @property
    def single_step(self):
        if self.recurrent:
            return None  # hidden state threading excludes the fused paths

        cdt = self.compute_dtype

        def step(x, u, p):
            net = p["net"]
            inp = jnp.concatenate([x, u], axis=-1)
            if "norm_in_mean" in net:
                inp = (inp - net["norm_in_mean"]) / net["norm_in_std"]
            core = {k: v for k, v in net.items() if not k.startswith("norm_")}
            if cdt != jnp.float32:
                # bf16 network evaluation; the state residual stays f32
                # (loop-invariant casts are hoisted out of the scan by XLA).
                core = jax.tree_util.tree_map(lambda w: w.astype(cdt), core)
                inp = inp.astype(cdt)
            out = nets.mlp_apply(core, inp).astype(jnp.float32)
            if "norm_out_mean" in net:
                out = out * net["norm_out_std"] + net["norm_out_mean"]
            return x + out if self.predict_delta else out

        return step

    def rollout(self, s0, Q, params=None):
        p = self.default_params() if params is None else params

        if not self.recurrent:
            from control_toolkit_tpu.models.predictors import scan_rollout

            return scan_rollout(self.single_step, s0, Q, p)
        # Recurrent nets keep their own scan: the hidden rides the carry.
        Q_t = jnp.swapaxes(Q, 0, 1)  # [H, B, U]
        B = s0.shape[0]
        # The hidden MUST arrive through params (p["hidden"]): falling
        # back to self.hidden here would freeze the live state at trace
        # time under jit (CLAUDE.md invariant; the GRU regression).  A
        # KeyError is the correct loud failure for a malformed params
        # dict.
        hidden = p["hidden"]
        cdt = self.compute_dtype
        net = p["net"]
        if cdt != jnp.float32:
            net = jax.tree_util.tree_map(lambda w: w.astype(cdt), net)
            hidden = tuple(h.astype(cdt) for h in hidden)
        h0 = tuple(jnp.broadcast_to(h, (B, h.shape[-1])) for h in hidden)

        rnn_apply = self._rnn_apply

        def body(carry, u):
            x, hs = carry
            inp = jnp.concatenate([x, u], -1).astype(cdt)
            out, hs = rnn_apply(net, inp, hs)
            out = out.astype(jnp.float32)
            xn = x + out if self.predict_delta else out
            return (xn, hs), xn

        (_, _), traj = jax.lax.scan(body, (s0, h0), Q_t)
        traj = jnp.swapaxes(traj, 0, 1)
        return jnp.concatenate([s0[:, None, :], traj], axis=1)

    def update(self, s, Q0, params=None) -> None:
        """Advance the persistent RNN hidden state with the applied control
        (reference predictor.update semantics)."""
        if not self.recurrent:
            return
        p = {"net": self.net_params} if params is None else params
        x = jnp.asarray(s)[:1]
        u = jnp.asarray(Q0).reshape(1, -1)[:, : self.num_control_inputs]
        _, self.hidden = self._rnn_apply(
            p["net"], jnp.concatenate([x, u], -1), self.hidden
        )

    def reset_state(self) -> None:
        if self.recurrent:
            self.hidden = self._rnn_state0(self.arch["hiddens"], 1)

    def copy(self) -> "NeuralPredictor":
        new = NeuralPredictor(
            dt=self.dt, net_name=self.net_name,
            num_states=self.num_states,
            num_control_inputs=self.num_control_inputs,
            predict_delta=self.predict_delta, params=self.net_params,
            compute_dtype="bfloat16" if self.compute_dtype == jnp.bfloat16 else "float32",
        )
        if self.recurrent:
            # A copy made mid-run (e.g. the optimal-trajectory replay
            # predictor) must see the SAME accumulated hidden state, not
            # fresh zeros.
            new.hidden = self.hidden
        return new
