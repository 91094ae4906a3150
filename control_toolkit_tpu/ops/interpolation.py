"""Inducing-point control-sequence interpolation.

Capability parity with the reference Interpolator
(/root/reference/others/Interpolator.py:7-106): control sequences are sampled
at inducing points spaced ``period`` steps apart and linearly upsampled to the
full MPC horizon.  TPU-native redesign: the interpolation is a single
precomputed ``[P, H]`` matrix applied with one einsum — a clean MXU matmul
batched over rollouts and control channels, with no per-channel matrix copy
(the reference materializes a [P,H,U] tensor and permutes twice).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np


def num_inducing_points(horizon: int, period: int) -> int:
    """Number of inducing points covering a horizon.

    Same formula as the reference (Interpolator.py:79-84):
    ``ceil((H-1)/p) + 1`` so the first point sits at step 0 and points are
    spaced ``p`` steps apart, covering at least the full horizon.
    """
    return int(math.ceil((horizon - 1) / period)) + 1


def interpolation_matrix(horizon: int, period: int) -> np.ndarray:
    """Build the ``[P, H]`` linear-interpolation matrix.

    Row p holds the weight of inducing point p for every horizon step h:
    step h lies between inducing points ``h // period`` and ``h // period + 1``
    with fractional position ``(h % period) / period``.
    """
    p_count = num_inducing_points(horizon, period)
    mat = np.zeros((p_count, horizon), dtype=np.float32)
    for h in range(horizon):
        left = h // period
        frac = (h % period) / period
        if left + 1 < p_count:
            mat[left, h] = 1.0 - frac
            mat[left + 1, h] = frac
        else:
            mat[left, h] = 1.0
    return mat


@dataclass(frozen=True)
class Interpolator:
    """Precomputed inducing-point upsampler.

    ``interpolate`` maps ``[K, P, U] -> [K, H, U]``.  With ``period == 1``
    it is the identity (reference Interpolator.py:31-33).
    """

    horizon: int
    period: int
    matrix: jnp.ndarray = field(repr=False)  # [P, H]

    @classmethod
    def build(cls, horizon: int, period: int) -> "Interpolator":
        if period < 1:
            raise ValueError("period_interpolation_inducing_points must be >= 1")
        mat = jnp.asarray(interpolation_matrix(horizon, period))
        return cls(horizon=horizon, period=period, matrix=mat)

    @property
    def number_of_interpolation_inducing_points(self) -> int:
        return self.matrix.shape[0]

    def interpolate(self, y: jnp.ndarray) -> jnp.ndarray:
        """Upsample inducing-point controls to the full horizon.

        y: [..., P, U] -> [..., H, U].  One contraction over P — XLA maps it
        onto the MXU; for period==1 this is skipped entirely.
        """
        if self.period == 1:
            return y
        return jnp.einsum("...pu,ph->...hu", y, self.matrix)
