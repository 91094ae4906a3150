"""PETS ensemble kernel family: the ensemble form of the fused neural
kernel (stacked member weights, per-tile member blocks — an E-member
TS-inf rollout at one net's FLOPs) and its gradient twin.  No batched
columns form (fleets of ensembles keep the vmapped path)."""
from __future__ import annotations

import numpy as np

name = "ensemble"


def compatible_model(opt) -> bool:
    """Ensemble form of the neural kernel: TPU backend, TS-inf
    EnsemblePredictor (blockwise member assignment — exactly the
    kernel's tile->member mapping), SOA-capable cost with scalar attrs.
    Sharded meshes compose when member blocks nest inside device shards
    (E % n_dev == 0 — ensemble_tile_for returns 0 otherwise)."""
    import jax

    from control_toolkit_tpu.models.ensemble_predictor import (
        EnsemblePredictor,
    )

    cf = getattr(opt.cost_function, "cost_function", opt.cost_function)
    pred = getattr(opt.predictor, "predictor", opt.predictor)
    return (
        jax.default_backend() == "tpu"
        and (opt._device is None or opt._device.platform == "tpu")
        and isinstance(pred, EnsemblePredictor)
        and pred.ts == "inf"
        # Probabilistic members propagate per-(rollout, step) aleatoric
        # noise the kernel doesn't generate — they keep the full
        # rollout path so the sampling semantics survive.
        and not pred.probabilistic
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
    if not compatible_model(opt):
        return False
    from control_toolkit_tpu.ops.pallas_neural import ensemble_tile_for

    pred = getattr(opt.predictor, "predictor", opt.predictor)
    tile = tile_k or ensemble_tile_for(
        opt.num_rollouts, pred.n_members, opt._n_shard_devices()
    )
    return tile > 0 and not opt.force_scan


def build_cost(opt, interpret: bool = False, tile_k: int = None):
    """Bind an EnsemblePredictor + cost function into the ensemble form
    of the fused neural kernel: stacked member weights ride as one
    leading-axis VMEM operand set and each grid tile computes under its
    block's member — an E-member PETS rollout costs one net's FLOPs.
    Weights flow from ``params['dyn']['net']`` every call, so PETS
    re-fits hot-swap with zero recompiles."""
    from control_toolkit_tpu.ops.pallas_neural import (
        build_neural_cost_rollout_kernel,
        ensemble_tile_for,
        flatten_ensemble_mlp_weights,
        mlp_layer_count,
    )

    param_keys, pack, _, stage_soa, terminal_soa, pred = opt._soa_bindings(
        include_dyn=False
    )
    post = opt._post_terminal_fn()
    net = pred.net_params
    E = pred.n_members
    D = opt._n_shard_devices()
    tk = tile_k or ensemble_tile_for(opt.num_rollouts, E, D)
    n_w = 2 * mlp_layer_count(net) \
        + 2 * ("norm_in_mean" in net) + 2 * ("norm_out_mean" in net)
    # Under a mesh each device runs a LOCAL E/D-member kernel over its
    # K/D rollouts: member blocks nest inside device shards
    # (ensemble_tile_for guarantees E % D == 0), and the stacked
    # weight operands shard on their member axis so device d holds
    # exactly its members' weights.
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
        n_members=E // D,
        emit_terminal=post is not None,
    )
    if opt._mesh is not None:
        kernel = opt._shard_map_kernel(
            kernel, opt._cost_out_specs(post),
            n_member_sharded_extra=n_w,
        )

    def raw_call(s_tiled, Q, u_prev, params):
        return kernel(
            s_tiled, Q, pack(params, u_prev),
            *flatten_ensemble_mlp_weights(params["dyn"]["net"]),
        )

    return opt._finalize_cost_kernel(raw_call, post)


def grad_tile(opt) -> int:
    """Grad tile for the ensemble gradient kernel: VMEM-feasible AND
    dividing the per-member block K/E (so every tile sees one member).
    0 when infeasible (caller keeps the AD-through-scan path)."""
    from control_toolkit_tpu.ops.pallas_grad import grad_tile_dividing

    pred = getattr(opt.predictor, "predictor", opt.predictor)
    E = pred.n_members
    if opt.num_rollouts % E:
        return 0
    return grad_tile_dividing(
        opt.num_states, opt.mpc_horizon, opt.num_rollouts // E
    )


def can_use_grad(opt) -> bool:
    """Gradient twin of the ensemble kernel: same model gate as the
    forward form, a feasible member-dividing grad tile, and NO
    risk_weight (the kernel's dQ excludes the disagreement penalty;
    risk-averse gradient planning keeps AD through the scan)."""
    return (
        compatible_model(opt)
        and not opt.force_scan
        and not opt.risk_weight
        and not opt.robust_eval
        # plain-MLP value terminals ride in-kernel; other post hooks
        # need AD (see ode.can_use_grad)
        and (opt._post_terminal_fn() is None
             or opt._value_grad_spec() is not None)
        and opt._n_shard_devices() == 1
        and grad_tile(opt) > 0
    )


def build_grad(opt, interpret: bool = False, tile_k: int = None):
    """Bind an EnsemblePredictor + cost into the ensemble form of the
    fused neural gradient kernel: ``fn(s_tiled, Q, u_prev, params) ->
    (cost [K], dQ [K,H,U])`` — RPGD/gradient-tf over a PETS ensemble at
    one net's backward cost; stacked weights are per-call operands, so
    PETS re-fits never recompile."""
    from control_toolkit_tpu.ops.pallas_grad import (
        build_neural_grad_cost_rollout_kernel,
    )
    from control_toolkit_tpu.ops.pallas_neural import (
        flatten_ensemble_mlp_weights,
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
        tile_k=tile_k or grad_tile(opt),
        interpret=interpret,
        n_members=pred.n_members,
        value_spec=vspec,
    )

    if vspec:
        def fn(s_tiled, Q, u_prev, params):
            return kernel(
                s_tiled, Q, pack(params, u_prev),
                *flatten_ensemble_mlp_weights(params["dyn"]["net"]),
                *opt._flatten_value_ops(params),
            )
    else:
        def fn(s_tiled, Q, u_prev, params):
            return kernel(
                s_tiled, Q, pack(params, u_prev),
                *flatten_ensemble_mlp_weights(params["dyn"]["net"]),
            )

    return fn
