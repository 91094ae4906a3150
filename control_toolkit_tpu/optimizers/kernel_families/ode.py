"""Analytic SOA-ODE kernel family: fused rollout+cost
(ops/pallas_rollout.py), gradient twin (ops/pallas_grad.py), and the
columns-mode batched pair.  Dynamics constants ride as SMEM scalars
(hot-reload / per-slot dyn rows without recompiles)."""
from __future__ import annotations

import numpy as np

name = "ode"


def compatible_model(opt) -> bool:
    """Backend + model/cost eligibility for the fused SOA kernels,
    independent of population-size divisibility and the force_scan
    override (callers with different tiling geometries — e.g. the
    batched-session kernel — add their own divisibility checks)."""
    import jax

    from control_toolkit_tpu.models.predictors import ODEPredictor

    cf = getattr(opt.cost_function, "cost_function", opt.cost_function)
    pred = getattr(opt.predictor, "predictor", opt.predictor)

    return (
        jax.default_backend() == "tpu"
        # A controller pinned to a non-TPU device (config 'device: cpu')
        # must take the scan paths — Mosaic kernels are TPU-only.
        and (opt._device is None or opt._device.platform == "tpu")
        and isinstance(pred, ODEPredictor)
        and getattr(pred.dynamics, "soa", None) is not None
        # (Round-4 gated euler off the kernels for a Mosaic "Invalid
        # relayout" crash; round 5 fixed the root cause — a replicated
        # splat-init layout diverging through the fori_loop carry — with
        # a full-layout zero anchor in soa_integrators.euler, so euler
        # configs ride the kernels again.)
        and cf is not None
        and getattr(cf, "supports_fused_rollout", False)
        # The kernels carry attributes as SMEM scalars; a cost declaring
        # array-valued attr defaults (e.g. a reference trajectory) or
        # non-scalar learned cost params (pallas_eligible=False) stays
        # on the scan path, which handles array-valued cost params
        # natively.  (A learned value TERMINAL is eligible: the kernels
        # emit x_H and V rides post_terminal_cost outside the kernel.)
        and getattr(cf, "pallas_eligible", True)
        and all(
            np.ndim(v) == 0
            for v in getattr(cf, "attr_defaults", {}).values()
        )
    )


def can_use_cost(opt, tile_k: int = None) -> bool:
    from control_toolkit_tpu.ops.pallas_rollout import DEFAULT_TILE_K

    return (
        not opt.force_scan
        and compatible_model(opt)
        # Under sharding each device runs its LOCAL tiles through the
        # kernel via shard_map, so the per-device shard must tile evenly.
        and opt.num_rollouts
        % ((tile_k or DEFAULT_TILE_K) * opt._n_shard_devices()) == 0
    )


def build_cost(opt, interpret: bool = False, tile_k: int = None):
    """Bind predictor dynamics + cost function into the fused Pallas
    rollout+cost kernel (ops/pallas_rollout.py).

    Returns ``cost_fn(s_tiled, Q, u_prev, params) -> [K]`` with the same
    semantics as ``Optimizer._fused_cost``; all scalar parameters are
    packed into the kernel's SMEM prefetch vector per call, so weight
    hot-reloads and attribute updates need no recompilation."""
    from control_toolkit_tpu.ops.pallas_rollout import (
        DEFAULT_TILE_K,
        build_cost_rollout_kernel,
    )

    param_keys, pack, derivs, stage_soa, terminal_soa, pred = (
        opt._soa_bindings()
    )
    post = opt._post_terminal_fn()

    kernel = build_cost_rollout_kernel(
        derivs, stage_soa, terminal_soa,
        num_states=opt.num_states, num_controls=opt.num_control_inputs,
        horizon=opt.mpc_horizon, dt=pred.dt,
        param_keys=param_keys,
        integrator=pred.integrator,
        intermediate_steps=pred.intermediate_steps,
        tile_k=tile_k or DEFAULT_TILE_K,
        interpret=interpret,
        emit_terminal=post is not None,
    )

    if opt._mesh is not None:
        kernel = opt._shard_map_kernel(kernel, opt._cost_out_specs(post))

    def raw_call(s_tiled, Q, u_prev, params):
        return kernel(s_tiled, Q, pack(params, u_prev))

    return opt._finalize_cost_kernel(raw_call, post)


def can_use_grad(opt) -> bool:
    from control_toolkit_tpu.ops.pallas_grad import grad_tile_for

    tile = grad_tile_for(opt.num_states, opt.mpc_horizon)
    return (
        tile > 0  # 0 = state-history scratch cannot fit VMEM at any tile
        and can_use_cost(opt)
        # A learned value terminal (plain-MLP V) rides IN-KERNEL: the
        # terminal jax.vjp seeds the backward sweep with dV/dx_H
        # (value_spec, ops/pallas_grad.py).  Any OTHER post-terminal
        # hook keeps XLA-AD — the kernel would silently drop its dQ.
        and (opt._post_terminal_fn() is None
             or opt._value_grad_spec() is not None)
        and opt.num_rollouts % (tile * opt._n_shard_devices()) == 0
    )


def build_grad(opt, interpret: bool = False, tile_k: int = None):
    """Bind predictor dynamics + cost into the fused gradient kernel
    (ops/pallas_grad.py): ``fn(s_tiled, Q, u_prev, params) -> (cost [K],
    dQ [K,H,U])`` with d(sum_k cost_k)/dQ semantics — what the
    population gradient optimizers consume.  Same SMEM parameter packing
    as the cost kernel (no recompiles on weight/attr changes)."""
    from control_toolkit_tpu.ops.pallas_grad import (
        build_grad_cost_rollout_kernel,
        grad_tile_for,
    )

    param_keys, pack, derivs, stage_soa, terminal_soa, pred = (
        opt._soa_bindings()
    )
    vspec = opt._value_grad_spec()

    kernel = build_grad_cost_rollout_kernel(
        derivs, stage_soa, terminal_soa,
        num_states=opt.num_states, num_controls=opt.num_control_inputs,
        horizon=opt.mpc_horizon, dt=pred.dt,
        param_keys=param_keys,
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
            n_replicated_extra=2 * vspec["n_layers"] if vspec else 0,
        )

    if vspec:
        def grad_fn(s_tiled, Q, u_prev, params):
            return kernel(s_tiled, Q, pack(params, u_prev),
                          *opt._flatten_value_ops(params))
    else:
        def grad_fn(s_tiled, Q, u_prev, params):
            return kernel(s_tiled, Q, pack(params, u_prev))

    return grad_fn


def batched_kernels(opt, *, tk, slot_keys, vspec, interpret,
                    param_keys, derivs, stage_soa, terminal_soa, pred):
    """Columns-mode (gkernel, ckernel, extra_ops) for the batched
    gradient optimizers (see base._bind_batched_grad_kernels)."""
    from control_toolkit_tpu.ops.pallas_grad import (
        build_grad_cost_rollout_kernel,
    )
    from control_toolkit_tpu.ops.pallas_rollout import (
        build_cost_rollout_kernel,
    )

    kargs = dict(
        num_states=opt.num_states, num_controls=opt.num_control_inputs,
        horizon=opt.mpc_horizon, dt=pred.dt,
        param_keys=param_keys, integrator=pred.integrator,
        intermediate_steps=pred.intermediate_steps,
        tile_k=tk, interpret=interpret, slot_keys=slot_keys,
    )
    gkernel = build_grad_cost_rollout_kernel(
        derivs, stage_soa, terminal_soa, value_spec=vspec, **kargs
    )
    ckernel = build_cost_rollout_kernel(
        derivs, stage_soa, terminal_soa,
        emit_terminal=vspec is not None, **kargs
    )

    def extra_ops(dyn):
        return ()

    return gkernel, ckernel, extra_ops
