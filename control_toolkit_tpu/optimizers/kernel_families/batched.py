"""Columns-mode batched gradient-kernel binding.

Shared preamble of the columnwise batched gradient-optimizer steps
(RPGD / gradient-tf in BatchedMPC and the ClosedLoop sweeps): binds the
predictor + cost into columns-mode gradient and cost kernels plus the
slot packer, dispatching on the predictor family via the per-family
``batched_kernels`` providers in this package.
"""

from __future__ import annotations


def bind_batched_grad_kernels(opt, num_slots: int, tile_k: int = None,
                              per_slot_dyn=(), per_slot_cost=(),
                              interpret: bool = False):
    """Bind columns-mode (``slot_keys``) gradient and cost kernels and
    the slot packer for a B-session fleet, dispatching on the predictor
    family —

    * SOA ODE dynamics → ops/pallas_grad.py + ops/pallas_rollout.py
      (dynamics constants in the SMEM vector; per-slot dyn rows
      supported);
    * neural MLP dynamics → the neural twins (weights as shared VMEM
      operands appended per call from ``dyn['net']``, so per-session
      sysid installs/checkpoint swaps never recompile — but per-slot
      DYNAMICS are unsupported: weights are shared across sessions);
    * sparse-GP dynamics → the GP twins (same operand treatment, from
      ``dyn['gp']``);
    * residual ('ODE+res') dynamics → the residual twins: base scalar
      constants in SMEM (per-slot dyn rows SUPPORTED — heterogeneous
      fleets of sysid'd base constants), residual MLP weights shared
      VMEM operands from ``dyn['res']``.

    A learned value terminal (plain-MLP V, ``_value_grad_spec``) keeps
    this path: the gradient kernels evaluate V in-kernel (the
    session-SHARED value net rides as trailing VMEM operands read from
    ``cost['_value_net']`` per call — re-fits never recompile) and the
    cost kernels emit terminal states with V added outside as one XLA
    matmul chain, like the single-session emit_terminal path.

    Returns ``(gcall, ccall, pack)`` where
    ``gcall(s0flat, Qflat, pvec, pslot, dyn, cost) -> (cost [B*K],
    dQ)`` and ``ccall(...) -> cost [B*K]``."""
    from control_toolkit_tpu.models.gp_predictor import GPPredictor
    from control_toolkit_tpu.models.neural_predictor import NeuralPredictor
    from control_toolkit_tpu.models.residual_predictor import (
        ResidualPredictor,
    )
    from control_toolkit_tpu.ops.pallas_grad import grad_tile_dividing
    from control_toolkit_tpu.optimizers import kernel_families as kf
    from control_toolkit_tpu.optimizers.base import (
        make_slot_packer,
        split_slot_keys,
    )
    B, K = int(num_slots), opt.num_rollouts
    H, U, S = opt.mpc_horizon, opt.num_control_inputs, opt.num_states
    tk = tile_k or grad_tile_dividing(S, H, B * K)
    if tk == 0 or (B * K) % tk != 0:
        raise ValueError(
            f"batched gradient kernel needs a grad tile dividing B*K; "
            f"got B={B}, K={K}, tile={tk}"
        )

    pred0 = getattr(opt.predictor, "predictor", opt.predictor)
    vspec = opt._value_grad_spec()
    neural = isinstance(pred0, NeuralPredictor)
    gp = isinstance(pred0, GPPredictor)
    residual = isinstance(pred0, ResidualPredictor)
    if neural or gp:
        if per_slot_dyn:
            raise ValueError(
                "per-slot dynamics require an ODE predictor: learned-"
                "model parameters ride as shared VMEM operands"
            )
        if neural and pred0.recurrent:
            raise ValueError(
                "recurrent predictors keep the vmapped scan path "
                "(their backward needs the per-step hidden history)"
            )
        param_keys, _, derivs, stage_soa, terminal_soa, pred = (
            opt._soa_bindings(include_dyn=False)
        )  # derivs is None: weights ride as VMEM operands
    else:
        param_keys, _, derivs, stage_soa, terminal_soa, pred = (
            opt._soa_bindings()
        )

    shared_keys, slot_keys = split_slot_keys(
        param_keys, per_slot_dyn, per_slot_cost
    )

    common = dict(tk=tk, slot_keys=slot_keys, vspec=vspec,
                  interpret=interpret, param_keys=param_keys,
                  derivs=derivs, stage_soa=stage_soa,
                  terminal_soa=terminal_soa, pred=pred)
    if neural:
        gkernel, ckernel, extra_ops = kf.neural.batched_kernels(
            opt, **common
        )
    elif gp:
        gkernel, ckernel, extra_ops = kf.gp.batched_kernels(
            opt, **common, B=B, K=K
        )
    elif residual:
        gkernel, ckernel, extra_ops = kf.residual.batched_kernels(
            opt, **common
        )
    else:
        gkernel, ckernel, extra_ops = kf.ode.batched_kernels(
            opt, **common
        )

    cf = getattr(opt.cost_function, "cost_function", opt.cost_function)
    pack = make_slot_packer(
        shared_keys, slot_keys, getattr(cf, "attr_defaults", {}), B, K
    )
    if residual:
        # The packer reads scalar dyn leaves; the residual's live as
        # the 'base' subtree (the 'res' weights go via extra_ops).
        inner_pack = pack

        def pack(u_prev_b, dyn, cost, attrs):
            return inner_pack(u_prev_b, dyn["base"], cost, attrs)

    if vspec is None:
        def gcall(s0flat, Qflat, pvec, pslot, dyn, cost):
            return gkernel(s0flat, Qflat, pvec, pslot, *extra_ops(dyn))

        def ccall(s0flat, Qflat, pvec, pslot, dyn, cost):
            return ckernel(s0flat, Qflat, pvec, pslot, *extra_ops(dyn))
    else:
        from control_toolkit_tpu.models.networks import mlp_apply
        from control_toolkit_tpu.ops.pallas_neural import (
            flatten_mlp_weights,
        )

        inv_h1 = 1.0 / (H + 1)

        def value_ops(cost):
            ops = flatten_mlp_weights(cost["_value_net"])
            sc = cost["_value_scale"]
            return tuple(ops[:-2]) + (ops[-2] * sc, ops[-1] * sc)

        def gcall(s0flat, Qflat, pvec, pslot, dyn, cost):
            return gkernel(s0flat, Qflat, pvec, pslot,
                           *extra_ops(dyn), *value_ops(cost))

        def ccall(s0flat, Qflat, pvec, pslot, dyn, cost):
            costs, x_T = ckernel(s0flat, Qflat, pvec, pslot,
                                 *extra_ops(dyn))
            v = mlp_apply(cost["_value_net"], x_T)[..., 0]
            return costs + cost["_value_scale"] * v * inv_h1

    return gcall, ccall, pack
