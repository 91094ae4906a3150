"""Fused rollout+cost evaluation.

The reference hot loop materializes the full trajectory tensor [K, H+1, S]
and then scores it (predict_core + get_trajectory_cost,
/root/reference/Optimizers/optimizer_mppi.py:188-189).  For sampling
optimizers that only need per-rollout costs, that tensor is pure HBM traffic.

``scan_cost_rollout`` fuses the stage-cost accumulation into the horizon scan
so only the [K] cost vector (and final state) leave the loop; the stage cost
is evaluated on the *pre-step* state paired with the applied control,
matching the reference semantics exactly (stage costs over s_0..s_{H-1},
terminal on s_H, trajectory cost = mean over the H+1 entries —
Cost_Functions/__init__.py:74-93).

A Pallas TPU kernel with the same contract lives in ops/pallas_rollout.py;
optimizers pick it on TPU backends when trajectories aren't needed.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def scan_cost_rollout(
    step_fn: Callable,          # (x [B,S], u [B,U], params) -> x_next
    stage_cost_fn: Callable,    # (x [B,S], u [B,U], u_prev [B,U], params) -> [B]
    terminal_cost_fn: Callable, # (x [B,S], params) -> [B]
    s0: jnp.ndarray,            # [B, S]
    Q: jnp.ndarray,             # [B, H, U]
    u_prev: jnp.ndarray,        # [U] or [B, U]: the actually applied control
    params: Dict,
    remat: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (trajectory_cost [B], final_state [B,S]).

    trajectory_cost = (sum_h stage(s_h, u_h, u_{h-1}) + terminal(s_H)) / (H+1)
    with u_{-1} = u_prev (seeds the control-change penalty).

    ``remat=True`` rematerializes each scan step under reverse-mode AD: the
    backward pass recomputes per-step activations instead of storing [H]
    residual slices — trades FLOPs for memory at large K*H.
    """
    B, H, U = Q.shape
    Q_t = jnp.swapaxes(Q, 0, 1)  # [H, B, U]
    if u_prev is None:
        u_prev_b = jnp.zeros((B, U), Q.dtype)
    else:
        up = jnp.asarray(u_prev, Q.dtype)
        if up.ndim == 2:
            u_prev_b = jnp.broadcast_to(up, (B, U))  # per-rollout previous
        else:
            if up.size not in (1, U):
                # A [B] per-rollout vector or a flattened plan here would
                # silently seed every rollout with the first U values and
                # bias the stage-0 control-change cost — reject instead
                # (a scalar still broadcasts to every input).
                raise ValueError(
                    f"1-D u_prev must have exactly U={U} elements (or be "
                    f"scalar), got shape {up.shape}; pass [B, U] for "
                    "per-rollout values"
                )
            u_prev_b = jnp.broadcast_to(jnp.reshape(up, (-1,)), (B, U))

    def body(carry, u):
        x, up, acc = carry
        acc = acc + stage_cost_fn(x, u, up, params)
        x = step_fn(x, u, params)
        return (x, u, acc), None

    if remat:
        body = jax.checkpoint(body)

    (x_final, _, acc), _ = jax.lax.scan(
        body, (s0, u_prev_b, jnp.zeros(s0.shape[0], s0.dtype)), Q_t
    )
    total = (acc + terminal_cost_fn(x_final, params)) / (H + 1)
    return total, x_final
