"""Pallas TPU kernel: fused rollout + cost + GRADIENT over the K-batch.

The gradient-based optimizers (RPGD, gradient-tf, cem-naive-grad,
mppi-optimize refinement) differentiate the trajectory cost through the
H-step rollout.  XLA's AD of the scan path streams every step's residuals
through HBM (forward) and back (backward) — at K=16k, H=50 that is hundreds
of [K]-sized tensors of round-trip traffic per gradient.  This kernel keeps
the whole thing in VMEM for a tile of rollouts:

* forward sweep: integrate the ODE, store the per-step state components in a
  VMEM scratch buffer ([H*S, TILE_K] — e.g. 1.6 MB for cartpole at H=50,
  TILE_K=2048), accumulate stage costs;
* backward sweep: one step at a time, re-linearize the integrator and the
  stage cost at the stored state with ``jax.vjp`` (trace-time transposition
  — the transposed ops are ordinary elementwise VPU work) and propagate the
  state adjoint; the control-change coupling (u_h also enters stage h+1 as
  ``prev_us``) is carried between iterations.

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
):
    """Build ``fn(s0 [K,S], Q [K,H,U], pvec [N]) -> (cost [K], dQ [K,H,U])``.

    ``slot_keys`` switches to the batched-session ("columns") form used by
    the batched RPGD step (optimizers/rpgd.py): the listed params (attrs /
    u_prev) leave the shared SMEM vector and arrive per-LANE as one extra
    VMEM operand ``pslot [n_slot, K]`` after pvec — s0 and Q are
    per-rollout already, so B sessions pack by concatenation along K
    (cf. ops/pallas_rollout.py).
    """
    if tile_k is None:
        tile_k = grad_tile_for(num_states, horizon)
    S, U, H = num_states, num_controls, horizon
    slot_keys = tuple(slot_keys)
    n_slot = len(slot_keys)
    shared_keys = [k for k in param_keys if k not in slot_keys]
    # Dynamic sublane offsets into the state-history scratch must be
    # 8-aligned on TPU (Mosaic vector_store constraint), so each step's
    # state block is padded to a multiple of 8 rows.
    S_pad = -(-S // 8) * 8
    inv_h1 = 1.0 / (H + 1)

    one_step = make_soa_stepper(derivs_soa, integrator, dt, intermediate_steps)

    def kernel(pvec_ref, s0_ref, q_ref, *rest):
        if n_slot:
            pslot_ref, rest = rest[0], rest[1:]
        cost_ref, dq_ref, xhist_ref = rest
        p = {k: pvec_ref[i] for i, k in enumerate(shared_keys)}
        for i, k in enumerate(slot_keys):
            p[k] = pslot_ref[i : i + 1, :]                    # [1, T] row
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
            xs = one_step(xs, us, p)
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

        tc, t_vjp = jax.vjp(lambda xs: terminal_cost_soa(xs, p), xs_H)
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

            _, step_vjp = jax.vjp(lambda a, b: one_step(a, b, p), xs_h, us_h)
            dxs_dyn, dus_dyn = step_vjp(lam)
            _, stage_vjp = jax.vjp(
                lambda a, b, c: stage_cost_soa(a, b, c, p), xs_h, us_h, prev_us
            )
            gx, gu, gp = stage_vjp(ones_ct)

            dq_h = tadd(tadd(dus_dyn, gu), gprev)
            dq_ref[pl.ds(h, 1)] = jnp.stack(dq_h, axis=1)        # [1, U, T]
            return tadd(dxs_dyn, gx), gp

        jax.lax.fori_loop(0, H, bwd, (lam0, zeros_u))

    @partial(jax.jit, static_argnames=())
    def run(s0: jnp.ndarray, Q: jnp.ndarray, pvec: jnp.ndarray,
            *slot_ops: jnp.ndarray):
        K = s0.shape[0]
        assert K % tile_k == 0, f"K={K} not divisible by tile_k={tile_k}"
        n_tiles = K // tile_k
        s0_t = s0.T                          # [S, K]
        q_t = jnp.transpose(Q, (1, 2, 0))    # [H, U, K]
        if n_slot:
            assert len(slot_ops) == 1 and slot_ops[0].shape == (n_slot, K)
            slot_specs = [
                pl.BlockSpec((n_slot, tile_k), lambda i, pv: (0, i),
                             memory_space=pltpu.VMEM)
            ]
        else:
            assert not slot_ops
            slot_specs = []

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((S, tile_k), lambda i, pv: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, U, tile_k), lambda i, pv: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ] + slot_specs,
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
        )(pvec, s0_t, q_t, *slot_ops)
        return cost[0], jnp.transpose(dq_t, (2, 0, 1))           # [K, H, U]

    return run
