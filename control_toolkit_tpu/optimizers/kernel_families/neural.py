"""Learned-dynamics (NeuralPredictor) kernel family: fused MLP /
stacked-GRU/LSTM rollout+cost kernels (ops/pallas_neural.py), the MLP
gradient twin (ops/pallas_grad.py), and the columns-mode batched pair.
Net weights (and live RNN hidden) ride as VMEM operands per call —
online-sysid updates, checkpoint swaps and hidden advances never
recompile."""
from __future__ import annotations

import numpy as np

name = "neural"


def compatible_model(opt) -> bool:
    """Backend + model/cost eligibility for the fused NEURAL kernels
    (ops/pallas_neural.py), independent of population-size divisibility
    and the force_scan override — the batched-session caller adds its
    own tiling checks (cf. ode.compatible_model)."""
    import jax
    import jax.numpy as jnp

    from control_toolkit_tpu.models.neural_predictor import NeuralPredictor

    cf = getattr(opt.cost_function, "cost_function", opt.cost_function)
    pred = getattr(opt.predictor, "predictor", opt.predictor)
    return (
        jax.default_backend() == "tpu"
        and (opt._device is None or opt._device.platform == "tpu")
        and isinstance(pred, NeuralPredictor)
        # The kernels compute in f32; a bf16-mode predictor keeps the
        # scan path so kernel and scan never disagree numerically.
        and pred.compute_dtype == jnp.float32
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
    """Kernel eligibility for learned-dynamics rollouts
    (ops/pallas_neural.py): TPU backend, MLP or stacked-GRU/LSTM
    NeuralPredictor in f32, SOA-capable cost with scalar attrs,
    shard-even K."""
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


def build_cost(opt, interpret: bool = False, tile_k: int = None):
    """Bind a NeuralPredictor (MLP or stacked GRU/LSTM) + cost function
    into the fused neural rollout+cost kernel.  Same contract as
    ``ode.build_cost``: ``cost_fn(s_tiled, Q, u_prev, params) -> [K]``;
    net weights (and, for recurrent nets, the live hidden state) flow as
    VMEM array operands read from ``params['dyn']`` every call — online-
    sysid updates, checkpoint swaps and hidden advances need no
    recompile."""
    from control_toolkit_tpu.ops.pallas_neural import (
        build_neural_cost_rollout_kernel,
        build_recurrent_cost_rollout_kernel,
        flatten_mlp_weights,
        flatten_rnn_weights,
        mlp_layer_count,
        neural_tile_for,
    )

    param_keys, pack, _, stage_soa, terminal_soa, pred = opt._soa_bindings(
        include_dyn=False
    )
    post = opt._post_terminal_fn()
    net = pred.net_params
    tk = tile_k or neural_tile_for(opt.num_rollouts, opt._n_shard_devices())

    if pred.recurrent:
        kind = pred.arch["kind"]
        kernel = build_recurrent_cost_rollout_kernel(
            stage_soa, terminal_soa,
            num_states=opt.num_states,
            num_controls=opt.num_control_inputs,
            horizon=opt.mpc_horizon,
            param_keys=param_keys,
            hiddens=tuple(pred.arch["hiddens"]),
            kind=kind,
            predict_delta=pred.predict_delta,
            tile_k=tk, interpret=interpret,
            emit_terminal=post is not None,
        )
        n_w = len(flatten_rnn_weights(net, pred.hidden))

        def flatten(params):
            return flatten_rnn_weights(
                params["dyn"]["net"], params["dyn"]["hidden"]
            )
    else:
        kernel = build_neural_cost_rollout_kernel(
            stage_soa, terminal_soa,
            num_states=opt.num_states,
            num_controls=opt.num_control_inputs,
            horizon=opt.mpc_horizon,
            param_keys=param_keys,
            n_layers=mlp_layer_count(net),
            predict_delta=pred.predict_delta,
            has_norm_in="norm_in_mean" in net,
            has_norm_out="norm_out_mean" in net,
            tile_k=tk, interpret=interpret,
            emit_terminal=post is not None,
        )
        n_w = len(flatten_mlp_weights(net))

        def flatten(params):
            return flatten_mlp_weights(params["dyn"]["net"])

    if opt._mesh is not None:
        kernel = opt._shard_map_kernel(
            kernel, opt._cost_out_specs(post), n_replicated_extra=n_w
        )

    def raw_call(s_tiled, Q, u_prev, params):
        return kernel(s_tiled, Q, pack(params, u_prev), *flatten(params))

    return opt._finalize_cost_kernel(raw_call, post)


def can_use_grad(opt) -> bool:
    """Eligibility for the fused neural gradient kernel
    (ops/pallas_grad.py build_neural_grad_cost_rollout_kernel): MLP
    NeuralPredictor (recurrent nets keep the XLA-AD scan — their
    backward needs the per-step hidden history too) with a
    VMEM-feasible state-history tile."""
    from control_toolkit_tpu.ops.pallas_grad import grad_tile_for

    pred = getattr(opt.predictor, "predictor", opt.predictor)
    tile = grad_tile_for(opt.num_states, opt.mpc_horizon)
    return (
        tile > 0
        and not opt.force_scan
        and compatible_model(opt)
        and not getattr(pred, "recurrent", False)
        # plain-MLP value terminals ride in-kernel; other post hooks
        # need AD (see ode.can_use_grad)
        and (opt._post_terminal_fn() is None
             or opt._value_grad_spec() is not None)
        and opt.num_rollouts % (tile * opt._n_shard_devices()) == 0
    )


def build_grad(opt, interpret: bool = False, tile_k: int = None):
    """Bind an MLP NeuralPredictor + cost into the fused neural gradient
    kernel: ``fn(s_tiled, Q, u_prev, params) -> (cost [K], dQ [K,H,U])``.
    Net weights flow as VMEM operands read from ``params['dyn']['net']``
    every call — online-sysid updates and checkpoint swaps never
    recompile (cf. build_cost)."""
    from control_toolkit_tpu.ops.pallas_grad import (
        build_neural_grad_cost_rollout_kernel,
        grad_tile_for,
    )
    from control_toolkit_tpu.ops.pallas_neural import (
        flatten_mlp_weights,
        mlp_layer_count,
    )

    param_keys, pack, _, stage_soa, terminal_soa, pred = opt._soa_bindings(
        include_dyn=False
    )
    net = pred.net_params
    vspec = opt._value_grad_spec()
    kernel = build_neural_grad_cost_rollout_kernel(
        stage_soa, terminal_soa,
        num_states=opt.num_states,
        num_controls=opt.num_control_inputs,
        horizon=opt.mpc_horizon,
        param_keys=param_keys,
        n_layers=mlp_layer_count(net),
        predict_delta=pred.predict_delta,
        has_norm_in="norm_in_mean" in net,
        has_norm_out="norm_out_mean" in net,
        tile_k=tile_k or grad_tile_for(opt.num_states, opt.mpc_horizon),
        interpret=interpret,
        value_spec=vspec,
    )
    n_w = len(flatten_mlp_weights(net))
    n_vw = 2 * vspec["n_layers"] if vspec else 0
    if opt._mesh is not None:
        kernel = opt._shard_map_kernel(
            kernel,
            lambda PS, first: (PS(first), PS(first, None, None)),
            n_replicated_extra=n_w + n_vw,
        )

    if vspec:
        def grad_fn(s_tiled, Q, u_prev, params):
            return kernel(s_tiled, Q, pack(params, u_prev),
                          *flatten_mlp_weights(params["dyn"]["net"]),
                          *opt._flatten_value_ops(params))
    else:
        def grad_fn(s_tiled, Q, u_prev, params):
            return kernel(s_tiled, Q, pack(params, u_prev),
                          *flatten_mlp_weights(params["dyn"]["net"]))

    return grad_fn


def batched_kernels(opt, *, tk, slot_keys, vspec, interpret,
                    param_keys, derivs, stage_soa, terminal_soa, pred):
    """Columns-mode (gkernel, ckernel, extra_ops): weights as shared VMEM
    operands appended per call from ``dyn['net']`` (per-session sysid
    installs / checkpoint swaps never recompile; per-slot DYNAMICS are
    unsupported — weights are shared across sessions)."""
    from control_toolkit_tpu.ops.pallas_grad import (
        build_neural_grad_cost_rollout_kernel,
    )
    from control_toolkit_tpu.ops.pallas_neural import (
        build_neural_cost_rollout_kernel,
        flatten_mlp_weights,
        mlp_layer_count,
    )

    net = pred.net_params
    nkargs = dict(
        num_states=opt.num_states, num_controls=opt.num_control_inputs,
        horizon=opt.mpc_horizon,
        param_keys=param_keys,
        n_layers=mlp_layer_count(net),
        predict_delta=pred.predict_delta,
        has_norm_in="norm_in_mean" in net,
        has_norm_out="norm_out_mean" in net,
        tile_k=tk, interpret=interpret, slot_keys=slot_keys,
    )
    gkernel = build_neural_grad_cost_rollout_kernel(
        stage_soa, terminal_soa, value_spec=vspec, **nkargs
    )
    ckernel = build_neural_cost_rollout_kernel(
        stage_soa, terminal_soa, emit_terminal=vspec is not None, **nkargs
    )

    def extra_ops(dyn):
        return tuple(flatten_mlp_weights(dyn["net"]))

    return gkernel, ckernel, extra_ops
