"""Shared numerical ops used across optimizers."""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def clip_by_norm(t: jnp.ndarray, clip_norm: float, axes: Tuple[int, ...]) -> jnp.ndarray:
    """Per-slice norm clipping with TF ``clip_by_norm`` semantics.

    Scales each slice (over ``axes``) to have L2 norm at most ``clip_norm``:
    ``t * clip_norm / max(||t||, clip_norm)``.  Used by the gradient-based
    optimizers to bound each rollout's gradient over axes [1, 2]
    (reference optimizer_rpgd.py:315, optimizer_cem_naive_grad_tf.py:76).
    """
    l2 = jnp.sqrt(jnp.sum(t * t, axis=axes, keepdims=True))
    return t * (clip_norm / jnp.maximum(l2, clip_norm))


def elite_indices(costs: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the k lowest costs, ordered best-first.

    ``lax.top_k`` on negated costs — O(K log k) and shardable — instead of a
    full argsort (the reference's argsort+slice, optimizer_cem_tf.py:73-75).
    """
    _, idx = jax.lax.top_k(-costs, k)
    return idx


class AdamState(NamedTuple):
    """Explicit Adam state so optimizers can do 'moment surgery' (time-shift,
    elite gather, zero-reset) as pure array ops inside jit — replacing the
    reference's eager get_weights/set_weights round-trip
    (optimizer_rpgd.py:443-513)."""

    step: jnp.ndarray  # scalar int32
    m: jnp.ndarray
    v: jnp.ndarray


def adam_init(shape, dtype=jnp.float32) -> AdamState:
    return AdamState(
        step=jnp.zeros((), jnp.int32),
        m=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
    )


def adam_update(
    state: AdamState,
    grad: jnp.ndarray,
    lr: float,
    beta_1: float = 0.9,
    beta_2: float = 0.999,
    epsilon: float = 1e-8,
) -> Tuple[AdamState, jnp.ndarray]:
    """One Adam step with TF/Keras semantics, EXACTLY as the reference's
    tf.keras.optimizers.Adam applies it:

        lr_t  = lr * sqrt(1 - b2^t) / (1 - b1^t)
        delta = lr_t * m / (sqrt(v) + eps)

    i.e. epsilon is added to the UN-bias-corrected sqrt(v) — not the
    Algorithm-1 form ``m_hat / (sqrt(v_hat) + eps)``, whose effective
    epsilon differs by sqrt(1 - b2^t) (~31x at t=1 for b2=0.999) and
    diverges from Keras whenever sqrt(v) is comparable to eps.

    Returns (new_state, delta) with delta to be *subtracted* from params.
    """
    step = state.step + 1
    m = beta_1 * state.m + (1.0 - beta_1) * grad
    v = beta_2 * state.v + (1.0 - beta_2) * grad * grad
    t = step.astype(jnp.float32)
    lr_t = lr * jnp.sqrt(1.0 - beta_2**t) / (1.0 - beta_1**t)
    delta = lr_t * m / (jnp.sqrt(v) + epsilon)
    return AdamState(step=step, m=m, v=v), delta


def shift_adam_moments(state: AdamState) -> AdamState:
    """Warm-start shift: move m, v one step left along the horizon axis
    (axis 1 of [K, H, U]), zero-padding the tail — reference
    optimizer_gradient_tf.py:150-167 / optimizer_rpgd.py:497-513."""
    zeros_tail = jnp.zeros_like(state.m[:, :1, :])
    return AdamState(
        step=state.step,
        m=jnp.concatenate([state.m[:, 1:, :], zeros_tail], axis=1),
        v=jnp.concatenate([state.v[:, 1:, :], zeros_tail], axis=1),
    )
