"""Pallas TPU kernel: fused rollout + trajectory cost over the K-batch.

The framework's hottest loop (BASELINE.json north star): K control sequences
rolled through an ODE dynamics model for H steps and scored.  The lax.scan
path round-trips the [K,S] carry (and, when logged, the [K,H+1,S] trajectory)
through HBM every horizon step; this kernel keeps the whole integration state
in VMEM for a tile of rollouts and writes only the final [K] cost vector.

Layout (see /opt/skills/guides/pallas_guide.md): state components are SOA
rows of shape [1, TILE_K] — the lane dimension is the rollout batch, fully
utilized; the sublane dimension is not wasted on the tiny state size.  The
control tensor arrives pre-transposed as [H, U, K] and is block-sliced to
[H, U, TILE_K] per grid step.  Scalar parameters (dynamics constants, cost
weights, attributes, previous control) ride in SMEM via scalar prefetch, so
hot-reloaded weights and moving targets never trigger recompilation.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from control_toolkit_tpu.ops.soa_integrators import make_soa_stepper

# Tile of rollouts processed per grid step. 2048 f32 lanes x (H*U + S) rows
# keeps VMEM usage far under budget while saturating the VPU.
DEFAULT_TILE_K = 2048


def build_cost_rollout_kernel(
    derivs_soa: Callable,       # (xs, us, p) -> dxs  (component form)
    stage_cost_soa: Callable,   # (xs, us, prev_us, pvec_dict) -> [1, T]
    terminal_cost_soa: Callable,  # (xs, pvec_dict) -> [1, T]
    num_states: int,
    num_controls: int,
    horizon: int,
    dt: float,
    param_keys: Sequence[str],  # ordering of the packed scalar params
    integrator: str = "rk4",
    intermediate_steps: int = 1,
    tile_k: int = DEFAULT_TILE_K,
    interpret: bool = False,
    slot_keys: Sequence[str] = (),
    emit_terminal: bool = False,
):
    """Build ``fn(s0 [K,S], Q [K,H,U], pvec [N]) -> cost [K]``.

    ``pvec`` packs all scalar parameters in ``param_keys`` order; the SOA
    callbacks receive them as a dict.  K must be a multiple of ``tile_k``
    (the caller pads or falls back to the scan path otherwise).

    ``emit_terminal=True`` adds a second output: the terminal states
    ``x_H [K, S]`` — what a learned terminal value (costs/value_terminal.py
    ``post_terminal_cost``) is evaluated on outside the kernel.

    ``slot_keys`` switches to the batched-session ("columns") form used by
    the batched CEM step (optimizers/cem.py): the listed params (attrs /
    u_prev — anything varying per MPC session) leave the shared SMEM
    vector and arrive per-LANE as one extra VMEM operand
    ``pslot [n_slot, K]`` after pvec: ``fn(s0, Q, pvec_shared, pslot)``.
    s0 and Q are per-rollout already, so B sessions pack by concatenation
    along K — only ``(B*K) % tile_k == 0`` is required.
    """
    S, U, H = num_states, num_controls, horizon
    slot_keys = tuple(slot_keys)
    n_slot = len(slot_keys)
    shared_keys = [k for k in param_keys if k not in slot_keys]

    one_step = make_soa_stepper(derivs_soa, integrator, dt, intermediate_steps)

    def kernel(pvec_ref, s0_ref, q_ref, *rest):
        if n_slot:
            pslot_ref, rest = rest[0], rest[1:]
        cost_ref = rest[0]
        xterm_ref = rest[1] if emit_terminal else None
        p = {k: pvec_ref[i] for i, k in enumerate(shared_keys)}
        for i, k in enumerate(slot_keys):
            p[k] = pslot_ref[i : i + 1, :]                    # [1, T] row
        xs = tuple(s0_ref[i : i + 1, :] for i in range(S))          # [1, T] rows
        prev_us = tuple(
            p[f"__u_prev_{j}"] if f"__u_prev_{j}" in slot_keys
            else jnp.full((1, tile_k), p[f"__u_prev_{j}"]) for j in range(U)
        )
        acc = jnp.zeros((1, tile_k), jnp.float32)

        def body(h, carry):
            xs, prev_us, acc = carry
            u_slab = q_ref[h]                                        # [U, T]
            us = tuple(u_slab[j : j + 1, :] for j in range(U))
            acc = acc + stage_cost_soa(xs, us, prev_us, p)
            xs = one_step(xs, us, p)  # stepper applies the substeps itself
            return xs, us, acc

        xs, _, acc = jax.lax.fori_loop(0, H, body, (xs, prev_us, acc))
        cost_ref[0:1, :] = (acc + terminal_cost_soa(xs, p)) / (H + 1)
        if emit_terminal:
            for i in range(S):
                xterm_ref[i : i + 1, :] = xs[i]

    @partial(jax.jit, static_argnames=())
    def run(s0: jnp.ndarray, Q: jnp.ndarray, pvec: jnp.ndarray,
            *slot_ops: jnp.ndarray) -> jnp.ndarray:
        K = s0.shape[0]
        assert K % tile_k == 0, f"K={K} not divisible by tile_k={tile_k}"
        n_tiles = K // tile_k
        s0_t = s0.T                      # [S, K]
        q_t = jnp.transpose(Q, (1, 2, 0))  # [H, U, K]
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
            ] + ([
                pl.BlockSpec((S, tile_k), lambda i, pv: (0, i),
                             memory_space=pltpu.VMEM),
            ] if emit_terminal else []),
        )
        out_shape = [jax.ShapeDtypeStruct((1, K), jnp.float32)]
        if emit_terminal:
            out_shape.append(jax.ShapeDtypeStruct((S, K), jnp.float32))
        out = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid_spec=gs,
            interpret=interpret,
        )(pvec, s0_t, q_t, *slot_ops)
        if emit_terminal:
            return out[0][0], out[1].T
        return out[0][0]

    return run


def pack_params(param_keys: Sequence[str], values: Dict) -> jnp.ndarray:
    """Pack a {key: scalar} dict into the kernel's pvec in key order."""
    return jnp.stack([jnp.asarray(values[k], jnp.float32) for k in param_keys])
