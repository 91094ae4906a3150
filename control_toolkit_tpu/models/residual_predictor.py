"""Residual dynamics predictor: analytic ODE base + learned MLP correction.

The adaptive-MPC composition: ``x_{h+1} = ode_step(x, u) + mlp([x, u])``.
The MLP's output layer is zero-initialized, so a fresh residual predictor is
EXACTLY the base ODE predictor; online system identification
(models/online_sysid.py) then fits the correction to observed transitions
while the controller keeps running — all residual weights live in the
``params["dyn"]`` pytree, so updating them is a jit-argument change, never a
recompile (the same mechanism the reference reserves for cost-YAML
hot-reload, CostFunctionUpdater.py:65-68, extended here to the model).

The reference delegates model mismatch entirely to offline SI_Toolkit
retraining; this module closes the loop online.  Supports AD, so every
optimizer family (sampling and gradient) runs on top of it; on TPU the
fused residual kernels (ops/pallas_neural.build_residual_cost_rollout_kernel
and its gradient twin in ops/pallas_grad.py) keep the whole rollout in VMEM
— base constants in SMEM, residual weights as VMEM operands, so sysid
installs never recompile the compiled hot path either.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from control_toolkit_tpu.models.networks import mlp_apply, mlp_init
from control_toolkit_tpu.models.predictors import ODEPredictor, Predictor
from control_toolkit_tpu.utils import registry


@registry.predictors.register("ODE+res")
class ResidualPredictor(Predictor):
    """ODE base + additive next-state MLP residual.

    Params pytree: ``{"base": <ode constants>, "res": <mlp weights>}`` —
    both live, per-step jit arguments.
    """

    def __init__(
        self,
        environment_name: str = "cartpole",
        dt: float = 0.02,
        integrator: str = "rk4",
        intermediate_steps: int = 1,
        fast_math: bool = False,
        hiddens: Sequence[int] = (32, 32),
        seed: int = 0,
        base_params: Optional[Dict] = None,
    ):
        self.base = ODEPredictor(
            environment_name=environment_name, dt=dt, integrator=integrator,
            intermediate_steps=intermediate_steps, params=base_params,
            fast_math=fast_math,
        )
        S, U = self.base.num_states, self.base.num_control_inputs
        self.num_states, self.num_control_inputs = S, U
        self.dt = self.base.dt
        self.integrator = integrator
        self.intermediate_steps = int(intermediate_steps)
        self.fast_math = bool(fast_math)
        self.hiddens = tuple(int(h) for h in hiddens)

        res = mlp_init(jax.random.PRNGKey(seed), [S + U, *self.hiddens, S])
        n_layers = len(self.hiddens)
        # Zero output layer: residual == 0 until fitted.
        res[f"w{n_layers}"] = jnp.zeros_like(res[f"w{n_layers}"])
        self._res = res

        base_step = self.base.single_step

        def single_step(x, u, params):
            xb = base_step(x, u, params["base"])
            return xb + mlp_apply(params["res"], jnp.concatenate([x, u], axis=-1))

        self._single_step = single_step

    def set_residual(self, res: Dict) -> None:
        """Install fitted residual weights (device or host arrays).

        Callers holding an MPCController must also drop its cached dyn
        params (``ctrl._dyn_params = None``) — OnlineSysId.apply does both.
        """
        self._res = jax.tree_util.tree_map(
            lambda v: jnp.asarray(v, jnp.float32), res
        )

    def save_residual(self, path) -> None:
        """Persist the fitted residual weights (networks.save_net format)."""
        from control_toolkit_tpu.models.networks import save_net

        save_net(path, self._res, meta={
            "kind": "residual", "hiddens": list(self.hiddens),
            "num_states": self.num_states,
            "num_control_inputs": self.num_control_inputs,
        })

    def load_residual(self, path) -> None:
        """Load residual weights saved by save_residual.  A controller
        holding this predictor must drop its cached dyn params afterwards
        (``ctrl._dyn_params = None``) for the load to reach the next step."""
        from control_toolkit_tpu.models.networks import load_net

        params, meta = load_net(path)
        for field, have in (("num_states", self.num_states),
                            ("num_control_inputs", self.num_control_inputs)):
            if int(meta.get(field, have)) != have:
                raise ValueError(
                    f"residual checkpoint is for {field}="
                    f"{meta.get(field)}, predictor has {have}"
                )
        # The checkpoint's weights define the architecture; adopt its hidden
        # sizes so a later save_residual writes truthful metadata.
        if "hiddens" in meta:
            self.hiddens = tuple(int(h) for h in meta["hiddens"])
        self.set_residual(params)

    def default_params(self) -> Dict:
        return {"base": self.base.default_params(), "res": self._res}

    @property
    def single_step(self):
        return self._single_step

    def rollout(self, s0, Q, params=None):
        from control_toolkit_tpu.models.predictors import scan_rollout

        p = self.default_params() if params is None else params
        return scan_rollout(self._single_step, s0, Q, p)

    def copy(self) -> "ResidualPredictor":
        new = ResidualPredictor.__new__(ResidualPredictor)
        new.__dict__.update(self.__dict__)
        return new
