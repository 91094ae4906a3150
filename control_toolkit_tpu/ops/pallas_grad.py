"""Pallas TPU kernels: fused rollout + cost + GRADIENT over the K-batch.

The gradient-based optimizers (RPGD, gradient-tf, cem-naive-grad,
mppi-optimize refinement) differentiate the trajectory cost through the
H-step rollout.  XLA's AD of the scan path streams every step's residuals
through HBM (forward) and back (backward) — at K=16k, H=50 that is hundreds
of [K]-sized tensors of round-trip traffic per gradient.  These kernels keep
the whole thing in VMEM for a tile of rollouts:

* forward sweep: advance the dynamics, store the per-step state components
  in a VMEM scratch buffer ([H*S_pad, TILE_K] — e.g. 1.6 MB for cartpole at
  H=50, TILE_K=2048), accumulate stage costs;
* backward sweep: one step at a time, re-linearize the step and the stage
  cost at the stored state with ``jax.vjp`` (trace-time transposition — the
  transposed ops are ordinary VPU/MXU work) and propagate the state adjoint;
  the control-change coupling (u_h also enters stage h+1 as ``prev_us``) is
  carried between iterations.

Two step families share this structure:

* ``build_grad_cost_rollout_kernel`` — analytic ODE dynamics (SOA derivs +
  rk4/euler integrator); the transposed integrator is elementwise VPU work.
* ``build_neural_grad_cost_rollout_kernel`` — LEARNED (MLP) next-state
  models; the forward recompute and the transposed layers are MXU matmuls
  with the weights resident in VMEM as operands (sysid updates / checkpoint
  swaps never recompile) — the gradient-path twin of
  ops/pallas_neural.build_neural_cost_rollout_kernel.

Outputs per rollout k: the trajectory cost J_k (same semantics as
ops/pallas_rollout.py — mean over H stage costs + terminal, reference
Cost_Functions/__init__.py:74-93) and dJ_k/dQ_k.  Since rollouts are
independent, these per-rollout gradients ARE the gradient of sum_k J_k, which
is exactly what the population optimizers consume.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from control_toolkit_tpu.ops.soa_integrators import make_soa_stepper, tadd

# Default tile: as large as the state-history scratch allows.  Measured on
# v5e (RPGD K=16k, H=50, cartpole): tile 2048 -> 3.93 ms, 1024 -> 4.25,
# 512 -> 5.12; larger tiles win until the scratch ([H*S_pad, T]) plus the
# double-buffered Q/dQ blocks crowd VMEM.
DEFAULT_GRAD_TILE_K = 2048


def grad_tile_dividing(num_states: int, horizon: int, total_k: int) -> int:
    """Largest VMEM-feasible grad tile (power of two, >= 256) that also
    divides ``total_k`` — used by the batched-session (columns) caller,
    whose B*K can be smaller than the default tile.  Returns 0 when no
    such tile exists (caller falls back to the vmapped scan path)."""
    tile = grad_tile_for(num_states, horizon)
    while tile >= 256 and total_k % tile != 0:
        tile //= 2
    return tile if tile >= 256 and total_k % tile == 0 else 0


def grad_tile_for(num_states: int, horizon: int) -> int:
    """Largest supported tile whose state-history scratch stays under ~4 MB
    (leaves room for the pipelined [H,U,T] Q and dQ blocks).  Returns 0 when
    even the smallest tile (256 lanes) blows the budget — the caller must
    fall back to the XLA-AD scan path rather than fail at Mosaic compile."""
    s_pad = -(-num_states // 8) * 8
    tile = DEFAULT_GRAD_TILE_K
    while tile > 256 and horizon * s_pad * tile * 4 > 4 * 2**20:
        tile //= 2
    if horizon * s_pad * tile * 4 > 4 * 2**20:
        return 0
    return tile


def gp_grad_tile_dividing(num_states: int, horizon: int, num_inducing: int,
                          total_k: int) -> int:
    """GP-aware ``grad_tile_dividing``: the GP backward also holds [M, tile]
    RBF blocks in VMEM, so large inducing sets shrink the tile further.
    Power-of-two halving preserves divisibility.  Returns 0 when no tile
    >= 256 both fits and divides ``total_k`` (caller falls back to the
    vmapped scan path instead of failing inside the binder)."""
    tile = grad_tile_dividing(num_states, horizon, total_k)
    while tile >= 256 and num_inducing * tile * 4 > 4 * 2**20:
        tile //= 2
    if tile < 256 or num_inducing * tile * 4 > 4 * 2**20:
        return 0
    return tile


def gp_grad_tile_for(num_states: int, horizon: int, num_inducing: int) -> int:
    """Grad tile for the GP gradient kernel: the state-history budget of
    ``grad_tile_for`` plus the transient [M, T] RBF blocks (forward
    recompute + transpose live at once in the backward) capped at ~4 MB.
    Returns 0 when no tile >= 256 fits both."""
    tile = grad_tile_for(num_states, horizon)
    while tile > 256 and num_inducing * tile * 4 > 4 * 2**20:
        tile //= 2
    if tile < 256 or num_inducing * tile * 4 > 4 * 2**20:
        return 0
    return tile


def _make_fwd_bwd_kernel(
    make_step: Callable,          # (p, ws) -> step(xs, us) -> xs'
    stage_cost_soa: Callable,     # (xs, us, prev_us, p) -> [1, T]
    terminal_cost_soa: Callable,  # (xs, p) -> [1, T]
    S: int,
    U: int,
    H: int,
    tile_k: int,
    shared_keys: Sequence[str],
    slot_keys: Sequence[str],
    n_w: int,
    ensemble: bool = False,
    value_spec: dict = None,
):
    """Shared forward-store / backward-sweep kernel body.

    ``ensemble``: weight refs carry a leading member axis of extent 1 (the
    runner's per-tile member index_map already selected this tile's
    block) — read ``r[0]`` instead of ``r[:]``.

    ``value_spec``: a LEARNED terminal value V(x) evaluated in-kernel
    (``{"n_layers": L}``, tanh MLP on the terminal state rows).  Its
    ``2*L`` flatten_mlp_weights operands (value-scale pre-folded into the
    last layer by the caller) follow the dynamics weights, and because the
    terminal is differentiated with ``jax.vjp`` the backward sweep's
    adjoint seed carries dV/dx_H — RPGD / gradient-tf over a
    ValueTerminalCost keep the fused kernel with exact dV/dQ (the
    transposed value MLP is MXU work on the stored terminal states).

    Operand order (after the pvec scalar prefetch): s0 [S,T], q [H,U,T],
    then ``pslot [n_slot, T]`` when slot_keys are used, then ``n_w``
    whole-array weight operands, then the value-net operands, then
    outputs (cost, dq) and the state-history scratch."""
    n_slot = len(slot_keys)
    n_vw = 2 * value_spec["n_layers"] if value_spec else 0
    # Dynamic sublane offsets into the state-history scratch must be
    # 8-aligned on TPU (Mosaic vector_store constraint), so each step's
    # state block is padded to a multiple of 8 rows.
    S_pad = -(-S // 8) * 8
    inv_h1 = 1.0 / (H + 1)

    def kernel(pvec_ref, s0_ref, q_ref, *rest):
        if n_slot:
            pslot_ref, rest = rest[0], rest[1:]
        w_refs = rest[:n_w]
        vw_refs = rest[n_w : n_w + n_vw]
        cost_ref, dq_ref, xhist_ref = rest[n_w + n_vw :]
        p = {k: pvec_ref[i] for i, k in enumerate(shared_keys)}
        for i, k in enumerate(slot_keys):
            p[k] = pslot_ref[i : i + 1, :]                    # [1, T] row
        ws = [(r[0] if ensemble else r[:]) for r in w_refs]
        vws = [r[:] for r in vw_refs]  # value net is member-shared
        one_step = make_step(p, ws)
        xs0 = tuple(s0_ref[i : i + 1, :] for i in range(S))
        u_prev0 = tuple(
            p[f"__u_prev_{j}"] if f"__u_prev_{j}" in slot_keys
            else jnp.full((1, tile_k), p[f"__u_prev_{j}"]) for j in range(U)
        )

        # ---- forward sweep: store states, accumulate stage costs ----------
        pad_rows = jnp.zeros((S_pad - S, tile_k), jnp.float32) if S_pad > S else None

        def fwd(h, carry):
            xs, prev_us, acc = carry
            block = jnp.concatenate(xs, axis=0)
            if pad_rows is not None:
                block = jnp.concatenate([block, pad_rows], axis=0)
            xhist_ref[pl.ds(h * S_pad, S_pad), :] = block
            u_slab = q_ref[h]                                    # [U, T]
            us = tuple(u_slab[j : j + 1, :] for j in range(U))
            acc = acc + stage_cost_soa(xs, us, prev_us, p)
            xs = one_step(xs, us)
            return xs, us, acc

        # Loop-structure note (measured, v5e, K=16k H=50 cartpole): a fully
        # Python-unrolled straight-line version of both sweeps ran at the
        # same speed (1.69 vs 1.60 ms/call) with a 6-minute compile, and
        # lax.fori_loop(unroll>1) does not lower inside pallas — the kernel
        # is VPU-compute-bound (transposed-rk4 arithmetic), not
        # loop-overhead-bound.  Keep the plain fori_loop.
        xs_H, _, acc = jax.lax.fori_loop(
            0, H, fwd, (xs0, u_prev0, jnp.zeros((1, tile_k), jnp.float32))
        )

        if n_vw:
            from control_toolkit_tpu.ops.pallas_neural import mlp_rows

            def term_fn(xs):
                a = jnp.concatenate(xs, axis=0)               # [S, T]
                v = mlp_rows(vws, a, value_spec["n_layers"],
                             value_spec.get("activation", jnp.tanh))
                return terminal_cost_soa(xs, p) + v
        else:
            def term_fn(xs):
                return terminal_cost_soa(xs, p)

        tc, t_vjp = jax.vjp(term_fn, xs_H)
        cost_ref[0:1, :] = (acc + tc) * inv_h1
        ones_ct = jnp.full((1, tile_k), inv_h1)
        lam0 = t_vjp(ones_ct)[0]                                 # tuple of S rows

        # ---- backward sweep ------------------------------------------------
        zeros_u = tuple(jnp.zeros((1, tile_k), jnp.float32) for _ in range(U))

        def bwd(i, carry):
            lam, gprev = carry                 # state adjoint; d(stage_{h+1})/d(u_h)
            h = H - 1 - i
            xh = xhist_ref[pl.ds(h * S_pad, S_pad), :]
            xs_h = tuple(xh[j : j + 1, :] for j in range(S))
            u_slab = q_ref[h]
            us_h = tuple(u_slab[j : j + 1, :] for j in range(U))
            hm1 = jnp.maximum(h - 1, 0)
            pm_slab = q_ref[hm1]
            prev_us = tuple(
                jnp.where(h == 0, u_prev0[j], pm_slab[j : j + 1, :])
                for j in range(U)
            )

            _, step_vjp = jax.vjp(lambda a, b: one_step(a, b), xs_h, us_h)
            dxs_dyn, dus_dyn = step_vjp(lam)
            _, stage_vjp = jax.vjp(
                lambda a, b, c: stage_cost_soa(a, b, c, p), xs_h, us_h, prev_us
            )
            gx, gu, gp = stage_vjp(ones_ct)

            dq_h = tadd(tadd(dus_dyn, gu), gprev)
            dq_ref[pl.ds(h, 1)] = jnp.stack(dq_h, axis=1)        # [1, U, T]
            # Mosaic layout anchor (same bug class as soa_integrators.euler):
            # the adjoint seed lam0 comes from a SPLAT cotangent, and on
            # chain plants under euler a component can take 2+ iterations to
            # pick up full layout through the carry (lam_vel only via
            # dt*lam_pos), which outruns Mosaic's one-pass layout join and
            # dies with "Invalid relayout ... replicated in destination but
            # not in source".  us_h loads from VMEM (always full layout);
            # x + 0.0*u is bitwise x.
            anchor = us_h[0] * 0.0
            lam_out = tuple(x + anchor for x in tadd(dxs_dyn, gx))
            return lam_out, gp

        jax.lax.fori_loop(0, H, bwd, (lam0, zeros_u))

    return kernel, S_pad


def _make_grad_runner(kernel, S, U, H, S_pad, tile_k, interpret, n_slot, n_w,
                      n_members=None, n_vw=0):
    """pallas_call wrapper shared by the gradient kernels:
    ``run(s0 [K,S], Q [K,H,U], pvec, [pslot [n_slot,K]], *weights)
    -> (cost [K], dQ [K,H,U])``.  The trailing ``n_vw`` of the weight
    operands are the (member-shared) value-net operands — whole-array
    replicated even in the ensemble form."""

    @partial(jax.jit, static_argnames=())
    def run(s0: jnp.ndarray, Q: jnp.ndarray, pvec: jnp.ndarray,
            *rest: jnp.ndarray):
        K = s0.shape[0]
        assert K % tile_k == 0, f"K={K} not divisible by tile_k={tile_k}"
        n_tiles = K // tile_k
        s0_t = s0.T                          # [S, K]
        q_t = jnp.transpose(Q, (1, 2, 0))    # [H, U, K]
        if n_slot:
            slot_ops, weights = (rest[0],), rest[1:]
            assert slot_ops[0].shape == (n_slot, K), (slot_ops[0].shape, K)
            slot_specs = [
                pl.BlockSpec((n_slot, tile_k), lambda i, pv: (0, i),
                             memory_space=pltpu.VMEM)
            ]
        else:
            weights, slot_ops, slot_specs = rest, (), []
        assert len(weights) == n_w + n_vw, (len(weights), n_w, n_vw)
        dyn_ws, value_ws = weights[:n_w], weights[n_w:]
        if n_members:
            # Ensemble form: stacked member weights, tile i fetches member
            # block i // tiles_per_member (cf. ops/pallas_neural._make_runner).
            assert K % n_members == 0 and (K // n_members) % tile_k == 0, (
                f"ensemble grad kernel needs (K/E) % tile == 0; K={K}, "
                f"E={n_members}, tile={tile_k}")
            tpm = (K // n_members) // tile_k
            w_specs = [
                pl.BlockSpec(
                    (1,) + w.shape[1:],
                    (lambda i, pv, _nd=w.ndim: (i // tpm,) + (0,) * (_nd - 1)),
                    memory_space=pltpu.VMEM)
                for w in dyn_ws
            ]
        else:
            w_specs = [
                pl.BlockSpec(w.shape, (lambda i, pv, _nd=w.ndim: (0,) * _nd),
                             memory_space=pltpu.VMEM)
                for w in dyn_ws
            ]
        w_specs += [
            pl.BlockSpec(w.shape, (lambda i, pv, _nd=w.ndim: (0,) * _nd),
                         memory_space=pltpu.VMEM)
            for w in value_ws
        ]

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((S, tile_k), lambda i, pv: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, U, tile_k), lambda i, pv: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ] + slot_specs + w_specs,
            out_specs=[
                pl.BlockSpec((1, tile_k), lambda i, pv: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, U, tile_k), lambda i, pv: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((H * S_pad, tile_k), jnp.float32)],
        )
        cost, dq_t = pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((1, K), jnp.float32),
                jax.ShapeDtypeStruct((H, U, K), jnp.float32),
            ],
            grid_spec=gs,
            interpret=interpret,
        )(pvec, s0_t, q_t, *slot_ops, *weights)
        return cost[0], jnp.transpose(dq_t, (2, 0, 1))           # [K, H, U]

    return run


def build_grad_cost_rollout_kernel(
    derivs_soa: Callable,
    stage_cost_soa: Callable,    # (xs, us, prev_us, p) -> [1, T]
    terminal_cost_soa: Callable,  # (xs, p) -> [1, T]
    num_states: int,
    num_controls: int,
    horizon: int,
    dt: float,
    param_keys: Sequence[str],
    integrator: str = "rk4",
    intermediate_steps: int = 1,
    tile_k: int = None,
    interpret: bool = False,
    slot_keys: Sequence[str] = (),
    value_spec: dict = None,
):
    """Build ``fn(s0 [K,S], Q [K,H,U], pvec [N]) -> (cost [K], dQ [K,H,U])``
    for analytic (SOA ODE) dynamics.

    ``value_spec``: in-kernel learned terminal value — see
    ``_make_fwd_bwd_kernel``; its flatten_mlp_weights operands (scale
    pre-folded) trail the call.

    ``slot_keys`` switches to the batched-session ("columns") form used by
    the batched RPGD step (optimizers/rpgd.py): the listed params (attrs /
    u_prev) leave the shared SMEM vector and arrive per-LANE as one extra
    VMEM operand ``pslot [n_slot, K]`` after pvec — s0 and Q are
    per-rollout already, so B sessions pack by concatenation along K
    (cf. ops/pallas_rollout.py).
    """
    if tile_k is None:
        tile_k = grad_tile_for(num_states, horizon)
    slot_keys = tuple(slot_keys)
    shared_keys = [k for k in param_keys if k not in slot_keys]

    ode_step = make_soa_stepper(derivs_soa, integrator, dt, intermediate_steps)

    def make_step(p, ws):
        return lambda xs, us: ode_step(xs, us, p)

    kernel, S_pad = _make_fwd_bwd_kernel(
        make_step, stage_cost_soa, terminal_cost_soa,
        num_states, num_controls, horizon, tile_k, shared_keys, slot_keys,
        n_w=0, value_spec=value_spec,
    )
    return _make_grad_runner(
        kernel, num_states, num_controls, horizon, S_pad, tile_k, interpret,
        len(slot_keys), n_w=0,
        n_vw=2 * value_spec["n_layers"] if value_spec else 0,
    )


def build_neural_grad_cost_rollout_kernel(
    stage_cost_soa: Callable,
    terminal_cost_soa: Callable,
    num_states: int,
    num_controls: int,
    horizon: int,
    param_keys: Sequence[str],
    n_layers: int,
    predict_delta: bool = True,
    has_norm_in: bool = False,
    has_norm_out: bool = False,
    activation: Callable = jnp.tanh,
    tile_k: int = None,
    interpret: bool = False,
    slot_keys: Sequence[str] = (),
    n_members: int = None,
    value_spec: dict = None,
):
    """Build ``fn(s0, Q, pvec, [pslot], *weights) -> (cost [K], dQ [K,H,U])``
    for an MLP next-state model ``x' = x + net([x,u])`` (or absolute form).

    ``n_members``: ensemble form — stacked member weights
    (flatten_ensemble_mlp_weights), per-tile member block selection; the
    gradient twin of the forward ensemble kernel (docs/KERNELS.md §7a).
    Gradient MPC (RPGD) over a PETS ensemble at one net's backward cost.

    ``weights`` is the ops/pallas_neural.flatten_mlp_weights operand list —
    the same resident-VMEM layout as the forward neural kernel, so online
    sysid / checkpoint swaps never recompile.  Forward semantics match
    NeuralPredictor.single_step composed with the reference trajectory-cost
    reduction; the backward sweep re-linearizes each step with ``jax.vjp``
    (the primal MLP recompute and the transposed layers are MXU matmuls).
    Only dJ/dQ is produced — the population optimizers treat the weights as
    constants (reference optimizer_rpgd.py:306-320 differentiates w.r.t. the
    control population only).
    """
    if tile_k is None:
        tile_k = grad_tile_for(num_states, horizon)
    S = num_states
    slot_keys = tuple(slot_keys)
    shared_keys = [k for k in param_keys if k not in slot_keys]
    n_w = 2 * n_layers + (2 if has_norm_in else 0) + (2 if has_norm_out else 0)

    def make_step(p, ws):
        from control_toolkit_tpu.ops.pallas_neural import mlp_rows

        idx = 2 * n_layers
        norm_in = ws[idx : idx + 2] if has_norm_in else None
        idx += 2 if has_norm_in else 0
        norm_out = ws[idx : idx + 2] if has_norm_out else None

        def net_step(xs, us):
            a = mlp_rows(ws, jnp.concatenate(xs + us, axis=0), n_layers,
                         activation, norm_in=norm_in, norm_out=norm_out)
            if predict_delta:
                return tuple(xs[i] + a[i : i + 1, :] for i in range(S))
            return tuple(a[i : i + 1, :] for i in range(S))

        return net_step

    kernel, S_pad = _make_fwd_bwd_kernel(
        make_step, stage_cost_soa, terminal_cost_soa,
        num_states, num_controls, horizon, tile_k, shared_keys, slot_keys,
        n_w=n_w, ensemble=bool(n_members), value_spec=value_spec,
    )
    return _make_grad_runner(
        kernel, num_states, num_controls, horizon, S_pad, tile_k, interpret,
        len(slot_keys), n_w=n_w, n_members=n_members,
        n_vw=2 * value_spec["n_layers"] if value_spec else 0,
    )


def build_residual_grad_cost_rollout_kernel(
    derivs_soa: Callable,
    stage_cost_soa: Callable,
    terminal_cost_soa: Callable,
    num_states: int,
    num_controls: int,
    horizon: int,
    dt: float,
    param_keys: Sequence[str],
    n_layers: int,
    integrator: str = "rk4",
    intermediate_steps: int = 1,
    activation: Callable = jnp.tanh,
    tile_k: int = None,
    interpret: bool = False,
    slot_keys: Sequence[str] = (),
    value_spec: dict = None,
):
    """Gradient twin of ops/pallas_neural.build_residual_cost_rollout_kernel
    ('ODE+res' adaptive-MPC predictor): ``x' = ode_step(x,u) + mlp([x,u])``
    with the base's scalar constants in SMEM and the residual weights as
    VMEM operands — online-sysid installs never recompile the gradient
    path either.  The vjp re-linearization transposes both the integrator
    (VPU) and the MLP (MXU)."""
    if tile_k is None:
        tile_k = grad_tile_for(num_states, horizon)
    S = num_states
    slot_keys = tuple(slot_keys)
    shared_keys = [k for k in param_keys if k not in slot_keys]
    n_w = 2 * n_layers
    one_step_ode = make_soa_stepper(derivs_soa, integrator, dt,
                                    intermediate_steps)

    def make_step(p, ws):
        from control_toolkit_tpu.ops.pallas_neural import mlp_rows

        def res_step(xs, us):
            xb = one_step_ode(xs, us, p)
            a = mlp_rows(ws, jnp.concatenate(xs + us, axis=0), n_layers,
                         activation)
            return tuple(xb[i] + a[i : i + 1, :] for i in range(S))

        return res_step

    kernel, S_pad = _make_fwd_bwd_kernel(
        make_step, stage_cost_soa, terminal_cost_soa,
        num_states, num_controls, horizon, tile_k, shared_keys, slot_keys,
        n_w=n_w, value_spec=value_spec,
    )
    return _make_grad_runner(
        kernel, num_states, num_controls, horizon, S_pad, tile_k, interpret,
        len(slot_keys), n_w=n_w,
        n_vw=2 * value_spec["n_layers"] if value_spec else 0,
    )


def build_gp_grad_cost_rollout_kernel(
    stage_cost_soa: Callable,
    terminal_cost_soa: Callable,
    num_states: int,
    num_controls: int,
    horizon: int,
    param_keys: Sequence[str],
    tile_k: int = None,
    interpret: bool = False,
    slot_keys: Sequence[str] = (),
    value_spec: dict = None,
):
    """Gradient twin of ops/pallas_neural.build_gp_cost_rollout_kernel:
    ``fn(s0, Q, pvec, [pslot], *gp_ops) -> (cost [K], dQ [K,H,U])`` for
    sparse-GP dynamics ``x' = x + GP([x,u])``.

    ``gp_ops`` is the ops/pallas_neural.flatten_gp_weights operand list, so
    posterior re-fits flow in without recompiling.  The ``jax.vjp``
    re-linearization recomputes the per-step [M, T] RBF block in VMEM (two
    MXU matmuls + VPU exp) and transposes it (two more matmuls); only dJ/dQ
    is produced."""
    if tile_k is None:
        tile_k = grad_tile_for(num_states, horizon)
    S = num_states
    slot_keys = tuple(slot_keys)
    shared_keys = [k for k in param_keys if k not in slot_keys]
    from control_toolkit_tpu.ops.pallas_neural import GP_N_OPERANDS

    def make_step(p, ws):
        Zs, zn2, alphaT, in_mean, inv_in, out_mean, out_std, var = ws
        var_s = var[0, 0]

        def gp_step(xs, us):
            a = jnp.concatenate(xs + us, axis=0)           # [D, T]
            an = (a - in_mean) * inv_in
            g = jax.lax.dot_general(
                Zs, an, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [M, T]
            an2 = jnp.sum(an * an, axis=0, keepdims=True)  # [1, T]
            d2 = jnp.maximum(an2 - 2.0 * g + zn2, 0.0)
            kmat = var_s * jnp.exp(-0.5 * d2)              # [M, T]
            delta = jax.lax.dot_general(
                alphaT, kmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * out_std + out_mean
            return tuple(xs[i] + delta[i : i + 1, :] for i in range(S))

        return gp_step

    kernel, S_pad = _make_fwd_bwd_kernel(
        make_step, stage_cost_soa, terminal_cost_soa,
        num_states, num_controls, horizon, tile_k, shared_keys, slot_keys,
        n_w=GP_N_OPERANDS, value_spec=value_spec,
    )
    return _make_grad_runner(
        kernel, num_states, num_controls, horizon, S_pad, tile_k, interpret,
        len(slot_keys), n_w=GP_N_OPERANDS,
        n_vw=2 * value_spec["n_layers"] if value_spec else 0,
    )
