"""Sparse-GP kernel family: fused GP rollout+cost kernel (per-step
[K, M] RBF blocks in VMEM — two MXU matmuls + VPU exp), gradient twin,
and the columns-mode batched pair.  GP parameters ride as VMEM operands
from ``params['dyn']['gp']`` — posterior re-fits never recompile."""
from __future__ import annotations

import numpy as np

name = "gp"


def compatible_model(opt) -> bool:
    """Backend + model/cost eligibility for the fused sparse-GP kernel
    (ops/pallas_neural.py build_gp_cost_rollout_kernel) — same contract
    as neural.compatible_model."""
    import jax

    from control_toolkit_tpu.models.gp_predictor import GPPredictor

    cf = getattr(opt.cost_function, "cost_function", opt.cost_function)
    pred = getattr(opt.predictor, "predictor", opt.predictor)
    return (
        jax.default_backend() == "tpu"
        and (opt._device is None or opt._device.platform == "tpu")
        and isinstance(pred, GPPredictor)
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


def num_inducing(opt) -> int:
    pred = getattr(opt.predictor, "predictor", opt.predictor)
    return int(pred.gp_params["Z"].shape[0])


def can_use_cost(opt, tile_k: int = None) -> bool:
    if not compatible_model(opt):
        return False
    from control_toolkit_tpu.ops.pallas_neural import gp_tile_for

    tile = tile_k or gp_tile_for(
        opt.num_rollouts, opt._n_shard_devices(), num_inducing(opt)
    )
    return (
        tile > 0
        and not opt.force_scan
        and opt.num_rollouts % (tile * opt._n_shard_devices()) == 0
    )


def build_cost(opt, interpret: bool = False, tile_k: int = None):
    """Bind a GPPredictor + cost function into the fused GP rollout+cost
    kernel.  Same contract as ``neural.build_cost``: the GP parameters
    (inducing inputs, posterior weights, kernel hypers) flow as VMEM
    operands read from ``params['dyn']['gp']`` every call, so a GP
    re-fit swaps in without recompiling."""
    from control_toolkit_tpu.ops.pallas_neural import (
        GP_N_OPERANDS,
        build_gp_cost_rollout_kernel,
        flatten_gp_weights,
        gp_tile_for,
    )

    param_keys, pack, _, stage_soa, terminal_soa, pred = opt._soa_bindings(
        include_dyn=False
    )
    post = opt._post_terminal_fn()
    tk = tile_k or gp_tile_for(
        opt.num_rollouts, opt._n_shard_devices(), num_inducing(opt)
    )
    kernel = build_gp_cost_rollout_kernel(
        stage_soa, terminal_soa,
        num_states=opt.num_states,
        num_controls=opt.num_control_inputs,
        horizon=opt.mpc_horizon,
        param_keys=param_keys,
        tile_k=tk, interpret=interpret,
        emit_terminal=post is not None,
    )
    if opt._mesh is not None:
        kernel = opt._shard_map_kernel(
            kernel, opt._cost_out_specs(post),
            n_replicated_extra=GP_N_OPERANDS,
        )

    def raw_call(s_tiled, Q, u_prev, params):
        return kernel(s_tiled, Q, pack(params, u_prev),
                      *flatten_gp_weights(params["dyn"]["gp"]))

    return opt._finalize_cost_kernel(raw_call, post)


def can_use_grad(opt) -> bool:
    """Eligibility for the fused GP gradient kernel: sparse-GP
    predictor with a VMEM-feasible tile (state-history scratch + [M,T]
    RBF blocks)."""
    from control_toolkit_tpu.ops.pallas_grad import gp_grad_tile_for

    if not compatible_model(opt) or opt.force_scan:
        return False
    if (opt._post_terminal_fn() is not None
            and opt._value_grad_spec() is None):
        return False  # non-MLP post hook: dV/dQ needs AD
        # (plain-MLP value terminals ride in-kernel, _value_grad_spec)
    tile = gp_grad_tile_for(
        opt.num_states, opt.mpc_horizon, num_inducing(opt)
    )
    return (
        tile > 0
        and opt.num_rollouts % (tile * opt._n_shard_devices()) == 0
    )


def build_grad(opt, interpret: bool = False, tile_k: int = None):
    """Bind a GPPredictor + cost into the fused GP gradient kernel:
    ``fn(s_tiled, Q, u_prev, params) -> (cost [K], dQ [K,H,U])``.  GP
    parameters flow as VMEM operands from ``params['dyn']['gp']`` —
    posterior re-fits never recompile (cf. build_cost)."""
    from control_toolkit_tpu.ops.pallas_grad import (
        build_gp_grad_cost_rollout_kernel,
        gp_grad_tile_for,
    )
    from control_toolkit_tpu.ops.pallas_neural import (
        GP_N_OPERANDS,
        flatten_gp_weights,
    )

    param_keys, pack, _, stage_soa, terminal_soa, pred = opt._soa_bindings(
        include_dyn=False
    )
    vspec = opt._value_grad_spec()
    kernel = build_gp_grad_cost_rollout_kernel(
        stage_soa, terminal_soa,
        num_states=opt.num_states,
        num_controls=opt.num_control_inputs,
        horizon=opt.mpc_horizon,
        param_keys=param_keys,
        tile_k=tile_k or gp_grad_tile_for(
            opt.num_states, opt.mpc_horizon, num_inducing(opt)
        ),
        interpret=interpret,
        value_spec=vspec,
    )
    if opt._mesh is not None:
        kernel = opt._shard_map_kernel(
            kernel,
            lambda PS, first: (PS(first), PS(first, None, None)),
            n_replicated_extra=GP_N_OPERANDS + (
                2 * vspec["n_layers"] if vspec else 0),
        )

    if vspec:
        def grad_fn(s_tiled, Q, u_prev, params):
            return kernel(s_tiled, Q, pack(params, u_prev),
                          *flatten_gp_weights(params["dyn"]["gp"]),
                          *opt._flatten_value_ops(params))
    else:
        def grad_fn(s_tiled, Q, u_prev, params):
            return kernel(s_tiled, Q, pack(params, u_prev),
                          *flatten_gp_weights(params["dyn"]["gp"]))

    return grad_fn


def batched_kernels(opt, *, tk, slot_keys, vspec, interpret,
                    param_keys, derivs, stage_soa, terminal_soa, pred,
                    B, K):
    """Columns-mode (gkernel, ckernel, extra_ops): the GP backward
    also holds [M, tile] RBF blocks in VMEM, so the tile shrinks below
    the grad default when M is large (the adjusted tile is baked into
    the returned kernels; callers never see it)."""
    from control_toolkit_tpu.ops.pallas_grad import (
        build_gp_grad_cost_rollout_kernel,
    )
    from control_toolkit_tpu.ops.pallas_neural import (
        build_gp_cost_rollout_kernel,
        flatten_gp_weights,
    )

    M = int(pred.gp_params["Z"].shape[0])
    while tk > 256 and (M * tk * 4 > 4 * 2**20 or (B * K) % tk != 0):
        tk //= 2
    if M * tk * 4 > 4 * 2**20 or (B * K) % tk != 0:
        raise ValueError(
            f"no VMEM-feasible GP grad tile divides B*K "
            f"(B={B}, K={K}, M={M})"
        )
    gkargs = dict(
        num_states=opt.num_states, num_controls=opt.num_control_inputs,
        horizon=opt.mpc_horizon,
        param_keys=param_keys,
        tile_k=tk, interpret=interpret, slot_keys=slot_keys,
    )
    gkernel = build_gp_grad_cost_rollout_kernel(
        stage_soa, terminal_soa, value_spec=vspec, **gkargs
    )
    ckernel = build_gp_cost_rollout_kernel(
        stage_soa, terminal_soa, emit_terminal=vspec is not None, **gkargs
    )

    def extra_ops(dyn):
        return tuple(flatten_gp_weights(dyn["gp"]))

    return gkernel, ckernel, extra_ops
