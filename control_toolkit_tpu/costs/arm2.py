"""Two-link-manipulator cost: end-effector reaching.

State [theta1, theta1D, theta2, theta2D]; inputs [tau1, tau2].
``target_x``/``target_y`` (workspace coordinates of the fingertip) are
variable attributes, so the reach target moves at runtime without
recompiles.  The cost is nonconvex through the forward kinematics (elbow-up
and elbow-down both reach most targets) — a multi-modal objective the
population optimizers handle natively and iLQR needs multi-start for.

SOA primitives throughout (the trig lowers in both XLA and Mosaic), so the
fused scan and all Pallas paths apply.
"""
from __future__ import annotations

import jax.numpy as jnp

from control_toolkit_tpu.costs.base import CostFunction
from control_toolkit_tpu.utils import registry


@registry.cost_functions.register("arm2/default")
@registry.cost_functions.register("arm2/reach")
class Arm2ReachCost(CostFunction):
    dynamic_config_keys = (
        "pos_weight", "vel_weight", "cc_weight", "ccrc_weight", "R",
        "l1", "l2",
    )
    attr_keys = ("target_x", "target_y")
    attr_defaults = {"target_x": 0.6, "target_y": 0.4}

    DEFAULTS = {
        "pos_weight": 30.0,
        "vel_weight": 0.15,
        "cc_weight": 0.05,
        "ccrc_weight": 0.05,
        "R": 1.0,
        # Link lengths for the cost's forward kinematics.  They default to
        # ARM2_DEFAULTS but are an INDEPENDENT copy (costs see only cost
        # config + attrs, by design — the kernels' SMEM param packing keys
        # the two namespaces separately): if you override the dynamics
        # l1/l2 (predictor/env params), set the same values here or the
        # optimizer will score a phantom arm.  Both are live jit args, so
        # changing them never recompiles.
        "l1": 0.5,
        "l2": 0.5,
    }

    # FK link lengths mirror the dynamics (base sync_with_dynamics seeds
    # unset values from the predictor and warns on explicit mismatches).
    mirrored_dynamics_keys = ("l1", "l2")

    def __init__(self, config=None):
        super().__init__(self._init_merged(config))

    def _ee(self, t1, t2, w):
        from control_toolkit_tpu.models.dynamics import arm2_end_effector

        return arm2_end_effector(t1, t2, w["l1"], w["l2"])

    def _stage_cost_core_soa(self, xs, us, params):
        w = params["cost"]
        attrs = params["attrs"]
        tx = attrs.get("target_x", jnp.float32(0.6))
        ty = attrs.get("target_y", jnp.float32(0.4))
        t1, t1d, t2, t2d = xs
        x, y = self._ee(t1, t2, w)
        pos = w["pos_weight"] * ((x - tx) ** 2 + (y - ty) ** 2)
        vel = w["vel_weight"] * (t1d**2 + t2d**2)
        cc = w["cc_weight"] * w["R"] * sum(u * u for u in us)
        return pos + vel + cc

    def terminal_cost_soa(self, xs, params):
        w = params["cost"]
        attrs = params["attrs"]
        tx = attrs.get("target_x", jnp.float32(0.6))
        ty = attrs.get("target_y", jnp.float32(0.4))
        t1, t1d, t2, t2d = xs
        x, y = self._ee(t1, t2, w)
        return 10.0 * w["pos_weight"] * ((x - tx) ** 2 + (y - ty) ** 2) + (
            w["vel_weight"] * (t1d**2 + t2d**2)
        )

    def cost_components(self, states, inputs, previous_input=None, params=None):
        params = params if params is not None else self.current_params()
        w = params["cost"]
        tx = params["attrs"].get("target_x", jnp.float32(0.6))
        ty = params["attrs"].get("target_y", jnp.float32(0.4))
        t1, t2 = states[..., 0], states[..., 2]
        x, y = self._ee(t1, t2, w)
        return {
            "pos": w["pos_weight"] * ((x - tx) ** 2 + (y - ty) ** 2),
            "vel": w["vel_weight"] * (states[..., 1] ** 2 + states[..., 3] ** 2),
            "cc": w["cc_weight"] * w["R"] * jnp.sum(inputs**2, axis=-1),
        }
