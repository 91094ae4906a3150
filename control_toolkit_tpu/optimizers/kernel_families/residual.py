"""Residual ('ODE+res') kernel family: analytic SOA base + learned MLP
correction.  Base scalar constants in SMEM (hot-reload / per-slot dyn
rows supported), residual MLP weights as VMEM operands (online-sysid
installs never recompile)."""
from __future__ import annotations

import numpy as np

name = "residual"


def compatible_model(opt) -> bool:
    """Backend + model/cost eligibility for the fused residual kernels
    (analytic SOA base + MLP correction) — same contract as
    neural.compatible_model."""
    import jax

    from control_toolkit_tpu.models.residual_predictor import (
        ResidualPredictor,
    )

    cf = getattr(opt.cost_function, "cost_function", opt.cost_function)
    pred = getattr(opt.predictor, "predictor", opt.predictor)
    return (
        jax.default_backend() == "tpu"
        and (opt._device is None or opt._device.platform == "tpu")
        and isinstance(pred, ResidualPredictor)
        and getattr(pred.base.dynamics, "soa", None) is not None
        and cf is not None
        and getattr(cf, "supports_fused_rollout", False)
        # Costs carrying non-scalar learned params in the STAGE cost
        # evaluate in XLA only — the kernels' cost bodies take scalar
        # operands.  (A learned value terminal is eligible via the
        # emit_terminal + post_terminal_cost hook.)
        and getattr(cf, "pallas_eligible", True)
        and all(
            np.ndim(v) == 0
            for v in getattr(cf, "attr_defaults", {}).values()
        )
    )


def can_use_cost(opt, tile_k: int = None) -> bool:
    from control_toolkit_tpu.ops.pallas_neural import neural_tile_for

    tile = tile_k or neural_tile_for(
        opt.num_rollouts, opt._n_shard_devices()
    )
    return (
        tile > 0
        and not opt.force_scan
        and compatible_model(opt)
        and opt.num_rollouts % (tile * opt._n_shard_devices()) == 0
    )


def kernel_bits(opt):
    """(n_layers, flatten) shared by the residual builders: the MLP
    weight operands come from ``params['dyn']['res']``."""
    from control_toolkit_tpu.ops.pallas_neural import (
        flatten_mlp_weights,
        mlp_layer_count,
    )

    pred = getattr(opt.predictor, "predictor", opt.predictor)
    n_layers = mlp_layer_count(pred._res)

    def flatten(params):
        return flatten_mlp_weights(params["dyn"]["res"])

    return n_layers, flatten


def build_cost(opt, interpret: bool = False, tile_k: int = None):
    """Bind a ResidualPredictor + cost into the fused residual
    rollout+cost kernel: base constants in SMEM (hot-reloadable), MLP
    weights as VMEM operands (online-sysid installs never recompile)."""
    from control_toolkit_tpu.ops.pallas_neural import (
        build_residual_cost_rollout_kernel,
        neural_tile_for,
    )

    param_keys, pack, derivs, stage_soa, terminal_soa, pred = (
        opt._soa_bindings()
    )
    post = opt._post_terminal_fn()
    n_layers, flatten = kernel_bits(opt)
    kernel = build_residual_cost_rollout_kernel(
        derivs, stage_soa, terminal_soa,
        num_states=opt.num_states,
        num_controls=opt.num_control_inputs,
        horizon=opt.mpc_horizon, dt=pred.dt,
        param_keys=param_keys, n_layers=n_layers,
        integrator=pred.integrator,
        intermediate_steps=pred.intermediate_steps,
        tile_k=tile_k or neural_tile_for(
            opt.num_rollouts, opt._n_shard_devices()
        ),
        interpret=interpret,
        emit_terminal=post is not None,
    )
    if opt._mesh is not None:
        kernel = opt._shard_map_kernel(
            kernel, opt._cost_out_specs(post),
            n_replicated_extra=2 * n_layers,
        )

    def raw_call(s_tiled, Q, u_prev, params):
        return kernel(s_tiled, Q, pack(params, u_prev), *flatten(params))

    return opt._finalize_cost_kernel(raw_call, post)


def can_use_grad(opt) -> bool:
    from control_toolkit_tpu.ops.pallas_grad import grad_tile_for

    tile = grad_tile_for(opt.num_states, opt.mpc_horizon)
    return (
        tile > 0
        and not opt.force_scan
        and compatible_model(opt)
        # plain-MLP value terminals ride in-kernel; other post hooks
        # need AD (see ode.can_use_grad)
        and (opt._post_terminal_fn() is None
             or opt._value_grad_spec() is not None)
        and opt.num_rollouts % (tile * opt._n_shard_devices()) == 0
    )


def build_grad(opt, interpret: bool = False, tile_k: int = None):
    """Gradient twin: ``fn(s_tiled, Q, u_prev, params) -> (cost, dQ)``
    for the residual predictor (cf. build_cost)."""
    from control_toolkit_tpu.ops.pallas_grad import (
        build_residual_grad_cost_rollout_kernel,
        grad_tile_for,
    )

    param_keys, pack, derivs, stage_soa, terminal_soa, pred = (
        opt._soa_bindings()
    )
    n_layers, flatten = kernel_bits(opt)
    vspec = opt._value_grad_spec()
    kernel = build_residual_grad_cost_rollout_kernel(
        derivs, stage_soa, terminal_soa,
        num_states=opt.num_states,
        num_controls=opt.num_control_inputs,
        horizon=opt.mpc_horizon, dt=pred.dt,
        param_keys=param_keys, n_layers=n_layers,
        integrator=pred.integrator,
        intermediate_steps=pred.intermediate_steps,
        tile_k=tile_k or grad_tile_for(opt.num_states, opt.mpc_horizon),
        interpret=interpret,
        value_spec=vspec,
    )
    if opt._mesh is not None:
        kernel = opt._shard_map_kernel(
            kernel,
            lambda PS, first: (PS(first), PS(first, None, None)),
            n_replicated_extra=2 * n_layers + (
                2 * vspec["n_layers"] if vspec else 0),
        )

    if vspec:
        def grad_fn(s_tiled, Q, u_prev, params):
            return kernel(s_tiled, Q, pack(params, u_prev),
                          *flatten(params),
                          *opt._flatten_value_ops(params))
    else:
        def grad_fn(s_tiled, Q, u_prev, params):
            return kernel(s_tiled, Q, pack(params, u_prev),
                          *flatten(params))

    return grad_fn


def batched_kernels(opt, *, tk, slot_keys, vspec, interpret,
                    param_keys, derivs, stage_soa, terminal_soa, pred):
    """Columns-mode (gkernel, ckernel, extra_ops): base scalar constants
    in SMEM (per-slot dyn rows SUPPORTED — heterogeneous fleets of
    sysid'd base constants), residual MLP weights shared VMEM operands
    from ``dyn['res']``."""
    from control_toolkit_tpu.ops.pallas_grad import (
        build_residual_grad_cost_rollout_kernel,
    )
    from control_toolkit_tpu.ops.pallas_neural import (
        build_residual_cost_rollout_kernel,
        flatten_mlp_weights,
    )

    n_layers, _ = kernel_bits(opt)
    rkargs = dict(
        num_states=opt.num_states, num_controls=opt.num_control_inputs,
        horizon=opt.mpc_horizon, dt=pred.dt,
        param_keys=param_keys, n_layers=n_layers,
        integrator=pred.integrator,
        intermediate_steps=pred.intermediate_steps,
        tile_k=tk, interpret=interpret, slot_keys=slot_keys,
    )
    gkernel = build_residual_grad_cost_rollout_kernel(
        derivs, stage_soa, terminal_soa, value_spec=vspec, **rkargs
    )
    ckernel = build_residual_cost_rollout_kernel(
        derivs, stage_soa, terminal_soa,
        emit_terminal=vspec is not None, **rkargs
    )

    def extra_ops(dyn):
        return tuple(flatten_mlp_weights(dyn["res"]))

    return gkernel, ckernel, extra_ops
